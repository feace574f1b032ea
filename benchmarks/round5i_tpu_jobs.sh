#!/bin/bash
# Round-5i: (1) multi-seed the D4-augment accuracy claim — the +2.1 pt
# README line is seed 0 only, while the augment-OFF baselines at seeds 1/2
# already exist as the hard-grid unet-ca cells (same protocol, same
# per-seed datasets: make_task_root == hard_grid's make_synthetic_voc
# call). Two augment-ON runs complete a 3-seed on/off table.
# (2) fresh-VM sanity run of bench.py (also re-warms the server-side
# compile cache for the driver's end-of-round run).
# Usage: nohup bash benchmarks/round5i_tpu_jobs.sh > /tmp/round5i.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
log() { echo "[$(date +%H:%M:%S)] $*"; }

run() { # run <tag> <cmd...>
  local tag=$1; shift
  log "start $tag"
  if "$@" 2>&1 | tee /tmp/round5i_${tag}.out; then
    log "done $tag"
  else
    log "FAILED $tag (rc=$?)"
  fi
}

run d4_on_s12 python benchmarks/fast_vs_ca_synthetic.py \
    --size 64 --n-train 192 --n-val 64 --epochs 15 --batch 8 \
    --seeds 1 2 --cells unet-channelattention \
    --workdir /tmp/d4_on --augment

run bench python bench.py

log "round5i done"
