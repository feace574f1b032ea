#!/bin/bash
# Round-5 chip measurements, run sequentially (one TPU client at a time —
# concurrent clients contend on the axon tunnel). Usage:
#   nohup bash benchmarks/round5_tpu_jobs.sh > /tmp/round5_tpu.log 2>&1 &
# Stages (round-4 verdict items):
#   #1 multi-seed hard grid (seeds 1, 2 full; seed 0 extension cells only —
#      the 9+1 seed-0 cells were measured in round 4, README table)
#   #7 D4 augmentation on/off on the hard task (1 seed)
#   #2 streaming >RAM scene path measured (int8 / fast / serve + the
#      narrow-lane fetch penalty probe)
#   #3 train-step traces (exact/fast x f32/bf16) for the speed-of-light
#      section
#   official bench record last.
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

GRID="--n-train 192 --n-val 64 --size 64 --epochs 15 --batch 8"

# 1. hard grid: new extension cell at seed 0, then full grids at seeds 1, 2
run hg_s0_ext python benchmarks/hard_grid.py $GRID --seed 0 \
    --workdir /tmp/hard_grid_s0 --cells pspnet-true
run hg_s1 python benchmarks/hard_grid.py $GRID --seed 1 \
    --workdir /tmp/hard_grid_s1
run hg_s2 python benchmarks/hard_grid.py $GRID --seed 2 \
    --workdir /tmp/hard_grid_s2

# 1b. calib-split QA (verdict #6): score the trained seed-1 unet-ca cell
#     with int8 calibration drawn from val (self-referential bound) vs
#     train (deployment number) — the two mIoUs should agree
CKPT=/tmp/hard_grid_s1/unet_channelattention_s1/best
VOC=/tmp/hard_grid_s1/voc_hard_64_192_s1
for SPLIT in val train; do
  run calib_${SPLIT} python -m insarseg.cli eval --preset unet-channelattention \
      --image-size 64 --batch-size 8 --voc-root "$VOC" --split val \
      --checkpoint "$CKPT" --engine int8 --calib-split $SPLIT --calib-batches 4
done

# 2. D4 augmentation accuracy evidence (verdict #7): unet-ca on the hard
#    task, augment off vs on, same seed/protocol as the grid
FVC="--size 64 --n-train 192 --n-val 64 --epochs 15 --batch 8 --seeds 0 --cells unet-channelattention"
run d4_off python benchmarks/fast_vs_ca_synthetic.py $FVC --workdir /tmp/d4_off
run d4_on  python benchmarks/fast_vs_ca_synthetic.py $FVC --workdir /tmp/d4_on --augment

# 3. streaming >RAM scene path (verdict #2): 8192^2 memmapped uint8 scene
run stream_int8      python benchmarks/stream_bench.py --engine int8
run stream_fast_int8 python benchmarks/stream_bench.py --engine int8 --model unet-fast
run stream_serve     python benchmarks/stream_bench.py --engine serve
# narrow-lane fetch penalty probe (small batch: the padded relayout is 64x)
run stream_nocmf python benchmarks/stream_bench.py --engine int8 --batch 32 \
    --no-channel-major --iters 1

# 4. train-step traces (verdict #3) — per-op tables for BASELINE.md
run trace_train_f32       python -m benchmarks.trace_tools --graph train --tile 512 --batch 16
run trace_train_bf16      python -m benchmarks.trace_tools --graph train --tile 512 --batch 16 --bf16
run trace_train_bf16_b32  python -m benchmarks.trace_tools --graph train --tile 512 --batch 32 --bf16
run trace_train_fast_bf16 python -m benchmarks.trace_tools --graph train --tile 512 --batch 32 --bf16 --model unet-fast

# 5. official bench record
run bench python bench.py

log "all stages done"
