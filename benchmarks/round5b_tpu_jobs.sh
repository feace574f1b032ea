#!/bin/bash
# Round-5 follow-on chip measurements. Waits for round5_tpu_jobs.sh (pid in
# /tmp/round5_jobs.pid) to finish, then runs:
#   - preset_sweep for the pspnet-true extension cell (verdict #4: the
#     11-cell E2E CLI sweep — the other 10 cells are the round-3 table)
#   - the host-rolling-stitcher streaming run (device_stitch=False, with
#     channel-major fetch) so README can give the 3-way comparison
#     device-stitch vs host vs host-nocmf
# Usage: nohup bash benchmarks/round5b_tpu_jobs.sh > /tmp/round5b_tpu.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=/tmp/round5_results.jsonl
log() { echo "[$(date +%H:%M:%S)] $*"; }

if [ -f /tmp/round5_jobs.pid ]; then
  MAIN_PID=$(cat /tmp/round5_jobs.pid)
  while kill -0 "$MAIN_PID" 2>/dev/null; do sleep 60; done
fi
log "main round5 job done; starting follow-on"

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

run sweep_pspnet_true python benchmarks/preset_sweep.py \
    --presets pspnet-true --workdir /tmp/preset_sweep_r5

run stream_int8_hostcmf python benchmarks/stream_bench.py --engine int8 \
    --no-device-stitch --iters 2

log "follow-on done"
