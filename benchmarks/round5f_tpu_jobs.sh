#!/bin/bash
# Round-5f: the round-5e train-step traces (tuple-shape HLO join fix),
# re-launched after a host restart wiped /tmp (the round-5e outputs and the
# client-side compile cache). Programs are still server-cached from
# round-5d; outputs now persist under benchmarks/traces_r5/ (TMPDIR) so a
# second restart cannot lose them again.
# Usage: nohup bash benchmarks/round5f_tpu_jobs.sh > benchmarks/traces_r5/round5f.log 2>&1 &
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

run trace2_train_f32 python benchmarks/trace_tools.py --graph train \
    --batch 16 --iters 3
run trace2_train_bf16 python benchmarks/trace_tools.py --graph train \
    --batch 16 --iters 3 --bf16
run trace2_train_bf16_b32 python benchmarks/trace_tools.py --graph train \
    --batch 32 --iters 3 --bf16
run trace2_train_fast_bf16 python benchmarks/trace_tools.py --graph train \
    --batch 16 --iters 3 --bf16 --model unet-fast

log "round5f done"
