#!/bin/bash
# Round-4 chip measurements, run sequentially (one TPU client at a time —
# concurrent clients contend on the axon tunnel). Usage:
#   nohup bash benchmarks/round4_tpu_jobs.sh > /tmp/round4_tpu.log 2>&1 &
# Each stage appends one JSON line to /tmp/round4_results.jsonl.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=/tmp/round4_results.jsonl
log() { echo "[$(date +%H:%M:%S)] $*"; }

run() { # run <tag> <cmd...>
  local tag=$1; shift
  log "start $tag"
  if "$@" | tee /tmp/round4_${tag}.out; then
    tail -n 1 /tmp/round4_${tag}.out >> "$OUT"
    log "done $tag"
  else
    log "FAILED $tag (rc=$?)"
  fi
}

# 1. official bench record (retry-hardened bench.py)
run bench python bench.py

# 2. batched full-scene sweeps (round-3 verdict #2): fill the chip
#    (>=64-tile dispatches) for 1024^2 and 2048^2 x {serve, int8};
#    single-scene rows re-measured for the dispatch-floor comparison
run scene1024_int8_s1   python benchmarks/scene_bench.py 1024 512 64 int8  1
run scene1024_int8_s8   python benchmarks/scene_bench.py 1024 512 64 int8  8 72
run scene1024_serve_s8  python benchmarks/scene_bench.py 1024 512 64 serve 8 72
run scene2048_int8_s1   python benchmarks/scene_bench.py 2048 512 64 int8  1
run scene2048_int8_s4   python benchmarks/scene_bench.py 2048 512 64 int8  4 100
run scene2048_serve_s4  python benchmarks/scene_bench.py 2048 512 64 serve 4 50
run scene1024_module_s8 python benchmarks/scene_bench.py 1024 512 64 module 8 72

log "all stages done"
