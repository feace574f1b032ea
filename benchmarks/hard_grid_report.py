"""Aggregate multi-seed hard-grid runs into the README ordering table.

Round-4 verdict #1: the hard-grid ordering (the repo's central accuracy
claim vs /root/reference/Readme.md:18-29) was a single seed with no error
bar. This reads the per-seed ``results.jsonl`` files written by
``benchmarks/hard_grid.py`` and reports, per cell, the per-seed module
mIoUs, mean and spread (half-range), the per-seed Spearman rank
correlation vs the published table, and whether the within-family pairs
that flipped at seed 0 (unet vs unet-sa, deeplabv3 vs deeplabv3-sa) are
inside the measured cross-seed spread.

Seed 0 was measured in round 4 (README "Hard-grid ordering"); those
recorded numbers are embedded below as the fallback for workdirs whose
/tmp results did not survive the VM, and are superseded by any cell found
in the seed-0 results.jsonl (e.g. the pspnet-true extension added in
round 5).

Usage:
  python benchmarks/hard_grid_report.py \
      [--workdirs /tmp/hard_grid_s0 /tmp/hard_grid_s1 /tmp/hard_grid_s2]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

# published mIoU (%), /root/reference/Readme.md:21-29
PUBLISHED = {
    "unet": 74.03,
    "unet-channelattention": 76.09,
    "unet-spatialattention": 75.15,
    "deeplabv3": 67.40,
    "deeplabv3-channelattention": 66.90,
    "deeplabv3-spatialattention": 67.48,
    "pspnet": 66.51,
    "pspnet-channelattention": 66.54,
    "pspnet-spatialattention": 65.72,
}

# round-4 chip run, seed 0 (README "Hard-grid ordering" table) — the /tmp
# results.jsonl did not survive the VM; protocol identical to hard_grid.py
# defaults (64^2, 192 train tiles, 15 ep, Adam 1e-4, batch 8).
SEED0_RECORDED = {
    "unet": {"miou_module": 0.8835, "miou_int8": 0.8838},
    "unet-channelattention": {"miou_module": 0.8868, "miou_int8": 0.8867},
    "unet-spatialattention": {"miou_module": 0.8821, "miou_int8": 0.8820},
    "deeplabv3": {"miou_module": 0.5121, "miou_int8": 0.5135},
    "deeplabv3-channelattention": {"miou_module": 0.4880,
                                   "miou_int8": 0.4876},
    "deeplabv3-spatialattention": {"miou_module": 0.5100,
                                   "miou_int8": 0.5070},
    "pspnet": {"miou_module": 0.5083, "miou_int8": 0.5085},
    "pspnet-channelattention": {"miou_module": 0.5180, "miou_int8": 0.5160},
    "pspnet-spatialattention": {"miou_module": 0.4812, "miou_int8": 0.4850},
    "unet-fast-ca": {"miou_module": 0.8511, "miou_int8": 0.8497},
}


def spearman(xs, ys) -> float:
    def ranks(v):
        order = np.argsort(v)
        r = np.empty(len(v))
        r[order] = np.arange(len(v), dtype=float)
        return r

    rx, ry = ranks(np.asarray(xs)), ranks(np.asarray(ys))
    rx -= rx.mean()
    ry -= ry.mean()
    denom = float(np.sqrt((rx ** 2).sum() * (ry ** 2).sum()))
    return float((rx * ry).sum() / denom) if denom else 0.0


def load_seed(workdir: str, seed: int) -> dict:
    cells = dict(SEED0_RECORDED) if seed == 0 else {}
    path = os.path.join(workdir, "results.jsonl")
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                r = json.loads(line)
                cells[r["cell"]] = r
    return cells


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdirs", nargs="*",
                    default=[f"/tmp/hard_grid_s{s}" for s in range(3)])
    ap.add_argument("--seeds", type=int, nargs="*", default=[0, 1, 2])
    args = ap.parse_args()

    per_seed = {s: load_seed(w, s)
                for w, s in zip(args.workdirs, args.seeds)}

    all_cells = list(PUBLISHED) + ["unet-fast-ca", "pspnet-true"]
    table = []
    for cell in all_cells:
        vals = [per_seed[s][cell]["miou_module"]
                for s in args.seeds if cell in per_seed[s]]
        i8 = [per_seed[s][cell]["miou_int8"]
              for s in args.seeds if cell in per_seed[s]]
        if not vals:
            continue
        row = {
            "cell": cell,
            "per_seed": [round(v, 4) for v in vals],
            "mean": round(float(np.mean(vals)), 4),
            "spread": round((max(vals) - min(vals)) / 2, 4),
            "int8_max_delta": round(max(abs(a - b)
                                        for a, b in zip(i8, vals)), 4),
            "published": PUBLISHED.get(cell),
        }
        table.append(row)
        print(json.dumps(row), flush=True)

    # per-seed Spearman over the 9 published cells
    spearmans = {}
    for s in args.seeds:
        cells = per_seed[s]
        if all(c in cells for c in PUBLISHED):
            spearmans[s] = round(spearman(
                [cells[c]["miou_module"] for c in PUBLISHED],
                [PUBLISHED[c] for c in PUBLISHED]), 4)

    # ordering of the seed-MEAN mIoUs vs the published table (the
    # aggregate claim: noise-averaged ranks)
    means = {r["cell"]: r["mean"] for r in table if r["cell"] in PUBLISHED}
    spearman_means = (round(spearman([means[c] for c in PUBLISHED],
                                     [PUBLISHED[c] for c in PUBLISHED]), 4)
                      if all(c in means for c in PUBLISHED) else None)

    # the two pairs that flipped at seed 0: is |mean gap| inside the
    # combined cross-seed spread of the pair?
    flips = {}
    for a, b in (("unet-spatialattention", "unet"),
                 ("deeplabv3-spatialattention", "deeplabv3")):
        ra = next((r for r in table if r["cell"] == a), None)
        rb = next((r for r in table if r["cell"] == b), None)
        if ra and rb and len(ra["per_seed"]) > 1:
            gaps = [x - y for x, y in zip(ra["per_seed"], rb["per_seed"])]
            flips[f"{a}_minus_{b}"] = {
                "per_seed_gap": [round(g, 4) for g in gaps],
                "mean_gap": round(float(np.mean(gaps)), 4),
                "pair_spread": round(ra["spread"] + rb["spread"], 4),
                "inside_spread": bool(
                    abs(float(np.mean(gaps))) <= ra["spread"] + rb["spread"]),
                "published_gap_pct_pts": round(
                    PUBLISHED[a] - PUBLISHED[b], 2),
            }

    # structural claims, per seed
    struct = {}
    for s in args.seeds:
        cells = per_seed[s]
        unet = [v["miou_module"] for c, v in cells.items()
                if c in PUBLISHED and c.startswith("unet")]
        other = [v["miou_module"] for c, v in cells.items()
                 if c in PUBLISHED and not c.startswith("unet")]
        if unet and other:
            struct[s] = {
                "unet_above_others": bool(min(unet) > max(other)),
                "ca_best_unet": bool(
                    cells.get("unet-channelattention",
                              {}).get("miou_module", -1) >= max(unet)),
                "worst_cell": min(
                    (c for c in cells if c in PUBLISHED),
                    key=lambda c: cells[c]["miou_module"]),
            }

    print(json.dumps({"summary": "hard_grid_multiseed",
                      "spearman_per_seed": spearmans,
                      "spearman_of_means": spearman_means,
                      "flipped_pairs": flips,
                      "structure_per_seed": struct}, indent=2))


if __name__ == "__main__":
    main()
