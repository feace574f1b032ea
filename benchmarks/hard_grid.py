"""Hard-task preset grid: reproduce the published table's ORDERING.

The reference's results table (/root/reference/Readme.md:18-29) cannot be
reproduced numerically — the Arctic dataset is Google-Drive-only, no
egress. The strongest achievable substitute (round-3 verdict #3): train
all 9 reference cells (plus the fast extension) with one identical
protocol on the HARD synthetic task (heavy noise, low-contrast thin
bands — the fast_vs_ca protocol), long enough that cells spread out
instead of saturating at 0.99, and compare the RELATIVE ordering against
the published table:

- UNet family well above DeepLabV3/FCN (published: 74-76 vs 65.7-67.5);
- channel attention the best UNet cell (published: 76.09 CA > 75.15 SA >
  74.03 plain).

Resumable: per-cell results persist to <workdir>/results.jsonl, so a
tunnel drop resumes where it stopped. Prints one JSON line per
(cell, engine) eval, a 10-row table, and an ordering-analysis summary.
Results land in README.md / BASELINE.md.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/hard_grid.py \
      [--size 64] [--n-train 192] [--epochs 15] [--batch 8] \
      [--workdir /tmp/hard_grid]
"""

from __future__ import annotations

import argparse
import json
import os

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/insarseg_jax_cache")

import numpy as np  # noqa: E402

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
# no published twins; reported, unranked (pspnet-true is the real PPM head
# the reference's "PSPNet" falsely claims — SURVEY.md §0)
EXTENSION_CELLS = ("unet-fast-ca", "pspnet-true")


def spearman(xs, ys) -> float:
    """Spearman rank correlation (no scipy in the image)."""
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


def main() -> None:
    # benchmarks/ is not a package; load the sibling module by path
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "fast_vs_ca_synthetic",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "fast_vs_ca_synthetic.py"))
    fvc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(fvc)
    run_cell = fvc.run_cell

    ap = argparse.ArgumentParser()
    ap.add_argument("--n-train", type=int, default=192)
    ap.add_argument("--n-val", type=int, default=64)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--calib-batches", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--workdir", default="/tmp/hard_grid")
    ap.add_argument("--cells", nargs="*",
                    default=list(PUBLISHED) + list(EXTENSION_CELLS))
    args = ap.parse_args()

    from insarseg.data.synthetic import make_synthetic_voc

    os.makedirs(args.workdir, exist_ok=True)
    root = os.path.join(args.workdir,
                        f"voc_hard_{args.size}_{args.n_train}_s{args.seed}")
    if not os.path.exists(os.path.join(root, "ImageSets")):
        make_synthetic_voc(root, n_train=args.n_train, n_val=args.n_val,
                           size=args.size, seed=args.seed,
                           noise=0.6, contrast=0.2, band_width=(0.01, 0.03))

    done_path = os.path.join(args.workdir, "results.jsonl")
    done = {}
    if os.path.exists(done_path):
        with open(done_path) as f:
            for line in f:
                r = json.loads(line)
                done[r["cell"]] = r

    results = []
    for c in args.cells:
        if c in done:
            results.append(done[c])
            continue
        r = run_cell(c, root, args, args.workdir, seed=args.seed)
        with open(done_path, "a") as f:
            f.write(json.dumps(r) + "\n")
        results.append(r)

    # 10-row table
    for r in results:
        print(json.dumps({"cell": r["cell"],
                          "miou_module": r["miou_module"],
                          "miou_int8": r["miou_int8"],
                          "published_miou": PUBLISHED.get(r["cell"])}),
              flush=True)

    ranked = [r for r in results if r["cell"] in PUBLISHED]
    if not ranked:  # extension-cells-only invocation: nothing to rank
        return
    ours = [r["miou_module"] for r in ranked]
    pub = [PUBLISHED[r["cell"]] for r in ranked]
    by_ours = sorted(ranked, key=lambda r: -r["miou_module"])

    def fam(cell):
        return cell.split("-")[0]

    unet_mious = [r["miou_module"] for r in ranked if fam(r["cell"]) == "unet"]
    other_mious = [r["miou_module"] for r in ranked
                   if fam(r["cell"]) != "unet"]
    unet_cells = {r["cell"]: r["miou_module"] for r in ranked
                  if fam(r["cell"]) == "unet"}
    both_fams = bool(unet_mious and other_mious)
    print(json.dumps({
        "summary": "hard_grid_ordering",
        "seed": args.seed,
        "spearman_vs_published": round(spearman(ours, pub), 4),
        "order_ours": [r["cell"] for r in by_ours],
        "order_published": sorted(PUBLISHED, key=lambda c: -PUBLISHED[c]),
        "unet_family_above_others": bool(
            both_fams and min(unet_mious) > max(other_mious)),
        "ca_best_unet_cell": bool(
            unet_cells
            and unet_cells.get("unet-channelattention", -1)
            >= max(unet_cells.values())),
        "unet_family_min": round(min(unet_mious), 5) if unet_mious else None,
        "others_max": round(max(other_mious), 5) if other_mious else None,
    }), flush=True)


if __name__ == "__main__":
    main()
