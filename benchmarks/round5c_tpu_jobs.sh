#!/bin/bash
# Round-5c: verify + measure the redesigned device-stitch streaming path
# (engine no longer inlined into the stitch program; emit=argmax device
# class rows). Also the apples-to-apples in-memory batched rate at 8192^2.
# Usage: nohup bash benchmarks/round5c_tpu_jobs.sh > /tmp/round5c_tpu.log 2>&1 &
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

# the CLI predict --stream configuration: uint8 class rows cross the link
run stream_int8_argmax python benchmarks/stream_bench.py --engine int8 \
    --emit argmax
# f32 logits output: transfer-bound; the redesign's 3-program pipeline
run stream_int8_logits_v2 python benchmarks/stream_bench.py --engine int8
# bf16 serve engine: the config whose inlined compile CRASHED before
run stream_serve_argmax python benchmarks/stream_bench.py --engine serve \
    --emit argmax
# fast cell, argmax
run stream_fast_argmax python benchmarks/stream_bench.py --engine int8 \
    --model unet-fast --emit argmax
# in-memory batched path on the same scene size (logits stay on device):
# the compute-side reference the stream path is judged against
run scene_8192_int8 python benchmarks/scene_bench.py 8192 512 64 int8 1 128

log "round5c done"
