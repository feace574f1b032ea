#!/bin/bash
# Round-5d: (1) train-step traces with the FIXED HLO join (trace_tools now
# lowers the inner jitted step, so fusion names match and the per-op table
# fills in); (2) stream serve retry at b64 (b128 bf16 serve engine OOMs HBM:
# 22.06G > 15.75G, round5c); (3) in-memory batched 8192^2 reference at
# chunk 64 (chunk 128 OOMs by 1.54G at this scene size).
# Usage: nohup bash benchmarks/round5d_tpu_jobs.sh > /tmp/round5d_tpu.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=/tmp/round5_results.jsonl
log() { echo "[$(date +%H:%M:%S)] $*"; }

run() { # run <tag> <cmd...>
  local tag=$1; shift
  log "start $tag"
  if "$@" 2>&1 | tee /tmp/round5_${tag}.out; then
    grep -h '^{' /tmp/round5_${tag}.out | tail -n 40 >> "$OUT" || true
    log "done $tag"
  else
    log "FAILED $tag (rc=$?)"
  fi
}

# apples-to-apples batched in-memory reference for the stream path
run scene_8192_int8_b64 python benchmarks/scene_bench.py 8192 512 64 int8 1 64

# bf16 serve engine streaming, b64 (engine batch that fits HBM)
run stream_serve_argmax_b64 python benchmarks/stream_bench.py --engine serve \
    --emit argmax --batch 64

# train-step speed-of-light traces (VERDICT #3), fixed metadata join
run trace_train_f32 python benchmarks/trace_tools.py --graph train \
    --batch 16 --iters 3
run trace_train_bf16 python benchmarks/trace_tools.py --graph train \
    --batch 16 --iters 3 --bf16
run trace_train_bf16_b32 python benchmarks/trace_tools.py --graph train \
    --batch 32 --iters 3 --bf16
run trace_train_fast_bf16 python benchmarks/trace_tools.py --graph train \
    --batch 16 --iters 3 --bf16 --model unet-fast

log "round5d done"
