#!/bin/bash
# Round-5e: re-run the four train-step traces with the tuple-shape HLO join
# fix in trace_tools.analyze (multi-output BN-stat/grad reduction fusions
# were '?' rows in round-5d). Programs are server-cached from round-5d, so
# these runs are trace+analyze only.
# Usage: nohup bash benchmarks/round5e_tpu_jobs.sh > /tmp/round5e_tpu.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
log() { echo "[$(date +%H:%M:%S)] $*"; }

run() { # run <tag> <cmd...>
  local tag=$1; shift
  log "start $tag"
  if "$@" 2>&1 | tee /tmp/round5_${tag}.out; then
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

log "round5e done"
