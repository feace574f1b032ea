#!/bin/bash
# Round-5h: measure stop_bias_grad (layers.py Conv2d / blocks.py DoubleConv)
# stacked on the loss-boundary optimization_barrier. The round-5g combined
# fast-cell trace measured 74.0 -> 61.3 ms/iter device time (loss tail
# 7.4 -> 2.2 ms from the barrier, bwd grad reduces 12.5 -> 5.8 ms from the
# analytic-zero bias grads). Jobs: wall-clock train_bench on every train
# cell README reports, plus a confirming exact-cell trace.
# Usage: nohup bash benchmarks/round5h_tpu_jobs.sh > benchmarks/traces_r5/round5h.log 2>&1 &
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

run biasstop_exact_b16_bf16 python benchmarks/train_bench.py unet-channelattention 16 512 bf16
run biasstop_exact_b32_bf16 python benchmarks/train_bench.py unet-channelattention 32 512 bf16
run biasstop_fast_b16_bf16 python benchmarks/train_bench.py unet-fast-ca 16 512 bf16
run biasstop_fast_b32_bf16 python benchmarks/train_bench.py unet-fast-ca 32 512 bf16
run biasstop_exact_b16_f32 python benchmarks/train_bench.py unet-channelattention 16 512
run biasstop_128_b128_f32 python benchmarks/train_bench.py unet-channelattention 128 128
run biasstop_trace_exact python benchmarks/trace_tools.py --graph train \
    --batch 16 --iters 3 --bf16 --model unet

log "round5h done"
