#!/bin/bash
# Round-5g: measure the logits optimization_barrier (engine.py loss_fn) on
# the chip. The round-5e/f traces showed the fast cell paying 7.4 ms (10%)
# in a CE tail whose tensors XLA had re-shaped to 6-D [B,H/2,W/2,2,2,C] on
# T(2,128) tiling by propagating the head's depth-to-space reshape into the
# loss; the barrier pins logits to their natural (B,H,W,C) layout.
# Jobs: patched train_bench on the fast cell (b16+b32 bf16), the exact cell
# (b16 bf16, neutrality check), and a patched fast-cell trace to confirm
# the tail shrank.
# Usage: nohup bash benchmarks/round5g_tpu_jobs.sh > benchmarks/traces_r5/round5g.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p benchmarks/traces_r5
export TMPDIR=/root/repo/benchmarks/traces_r5
log() { echo "[$(date +%H:%M:%S)] $*"; }

run() { # run <tag> <cmd...>
  local tag=$1; shift
  log "start $tag"
  if "$@" 2>&1 | tee benchmarks/traces_r5/${tag}.out; then
    log "done $tag"
  else
    log "FAILED $tag (rc=$?)"
  fi
}

run barrier_fast_b16 python benchmarks/train_bench.py unet-fast-ca 16 512 bf16
run barrier_fast_b32 python benchmarks/train_bench.py unet-fast-ca 32 512 bf16
run barrier_exact_b16 python benchmarks/train_bench.py unet 16 512 bf16
run barrier_trace_fast python benchmarks/trace_tools.py --graph train \
    --batch 16 --iters 3 --bf16 --model unet-fast

log "round5g done"
