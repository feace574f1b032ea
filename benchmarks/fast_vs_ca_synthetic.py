"""Head-to-head accuracy validation: unet-ca vs unet-fast-ca.

The fast variant (insarseg/models/unet_stem.py) is the only engine cell
that beats the reference's throughput target (1633 tiles/s int8 at 512^2,
BASELINE.md) — but it is an architecture change ("retrain to use"), so its
throughput only counts as a capability once a head-to-head training run
shows the accuracy cost. The real Arctic dataset is Google-Drive-only
(/root/reference/Readme.md:31-38, no egress); this script is the strongest
offline substitute: identical-protocol training of both presets on the same
synthetic interferogram set (insarseg/data/synthetic.py), same seeds, same
epochs/optimizer/batch, then module/serve/int8 evaluation of both.

Round-4 protocol (round-3 verdict #5): the HARD task is the default — the
easy task saturates both cells at ~0.997 mIoU where a -0.09 pt delta is
noise — and the head-to-head runs at several seeds (data + init + shuffle
all varied per seed), reporting mean +/- spread of Delta(fast - exact).
``--easy`` restores the old saturating task for comparison.

Prints one JSON line per (cell, engine, seed) eval plus a final summary
line with the per-seed deltas. Results are recorded in README.md
("fast-variant accuracy").

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/fast_vs_ca_synthetic.py \
      [--n-train 256] [--n-val 64] [--size 512] [--epochs 30] [--batch 8] \
      [--seeds 0 1 2] [--workdir /tmp/fast_vs_ca]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/insarseg_jax_cache")

import numpy as np  # noqa: E402


def run_cell(preset: str, root: str, args, workdir: str,
             seed: int = 0) -> dict:
    from insarseg.config import get_preset
    from insarseg.data.voc import BatchLoader, VOCSegDataset
    from insarseg.engines import make_engine
    from insarseg.models.registry import build_model
    from insarseg.train import engine
    from insarseg.train.checkpoint import Checkpointer

    cell_dir = os.path.join(workdir, f"{preset.replace('-', '_')}_s{seed}")
    os.makedirs(cell_dir, exist_ok=True)
    cfg = get_preset(
        preset, voc_root=root, image_size=args.size, batch_size=args.batch,
        num_epochs=args.epochs, seed=seed,
        augment=getattr(args, "augment", False),
        model_save_path=os.path.join(cell_dir, "best.ckpt"),
        metrics_save_path=os.path.join(cell_dir, "history.json"),
    )
    train_loader = BatchLoader(
        VOCSegDataset(root, args.size, "train"), cfg.batch_size, shuffle=True,
        seed=seed, num_workers=2)
    val_loader = BatchLoader(
        VOCSegDataset(root, args.size, "val"), cfg.batch_size)

    model = build_model(cfg)
    ckpt = Checkpointer(os.path.splitext(cfg.model_save_path)[0])
    t0 = time.time()
    history = engine.fit(model, cfg, train_loader, val_loader,
                         checkpointer=ckpt)
    train_s = time.time() - t0

    # score the BEST checkpoint (the artifact a user would serve), not the
    # last epoch — same contract as the reference's torch.save-on-best
    restored = ckpt.restore_best()
    variables = {"params": restored["params"],
                 "batch_stats": restored["batch_stats"]}

    # multi-batch int8 calibration: N val batches, not 1 (shared helper —
    # same contract as the CLI)
    from insarseg.engines import collect_calib_batches

    calib = collect_calib_batches(val_loader, args.calib_batches,
                                  cfg.normalize_mean, cfg.normalize_std)

    out = {"cell": preset, "seed": seed, "train_s": round(train_s, 1),
           "best_val_miou": max(h.get("val_miou", 0.0) for h in history),
           "epochs": len(history)}
    for engine_name in ("module", "serve", "int8"):
        predict = make_engine(
            cfg.model, cfg.attention, model, variables, engine_name,
            calib_batches=calib if engine_name == "int8" else None)
        eval_step = engine.make_engine_eval_step(
            predict, cfg.num_classes, cfg.ignore_index,
            normalize=(cfg.normalize_mean, cfg.normalize_std))
        res = engine.evaluate(eval_step, variables["params"],
                              variables["batch_stats"], val_loader,
                              cfg.metrics_version, cfg.metrics_mode,
                              verbose=False)
        row = {"cell": preset, "seed": seed, "engine": engine_name,
               "val_miou": round(float(res["val_miou"]), 5),
               "val_acc": round(float(res["val_acc"]), 5)}
        print(json.dumps(row), flush=True)
        out[f"miou_{engine_name}"] = row["val_miou"]
    return out


def make_task_root(args, seed: int) -> str:
    """Synthetic VOC tree for one seed (data varies with the seed so the
    spread covers data draw + init + shuffle, not init alone)."""
    from insarseg.data.synthetic import make_synthetic_voc

    hard_kw = dict(noise=0.6, contrast=0.2, band_width=(0.01, 0.03)) \
        if args.hard else {}
    tag = "hard_" if args.hard else "easy_"
    root = os.path.join(args.workdir,
                        f"voc_{tag}{args.size}_{args.n_train}_s{seed}")
    if not os.path.exists(os.path.join(root, "ImageSets")):
        make_synthetic_voc(root, n_train=args.n_train, n_val=args.n_val,
                           size=args.size, seed=seed, **hard_kw)
    return root


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-train", type=int, default=256)
    ap.add_argument("--n-val", type=int, default=64)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--calib-batches", type=int, default=4)
    ap.add_argument("--seeds", type=int, nargs="*", default=[0, 1, 2])
    ap.add_argument("--workdir", default="/tmp/fast_vs_ca")
    ap.add_argument("--cells", nargs="*",
                    default=["unet-channelattention", "unet-fast-ca"])
    ap.add_argument("--hard", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="harder task (heavy noise, low-contrast thin "
                         "bands) so trained models land in a range where "
                         "architecture deltas are measurable instead of "
                         "saturating at 0.99 — the DEFAULT since round 4; "
                         "--no-hard (or --easy) restores the old task")
    ap.add_argument("--easy", dest="hard", action="store_false")
    ap.add_argument("--augment", action="store_true",
                    help="train with on-device D4 augmentation "
                         "(Config.augment) — use a separate --workdir from "
                         "the no-augment run, cell dirs are keyed by "
                         "(cell, seed) only")
    args = ap.parse_args()

    # Warm the backend through the transient-tunnel retry BEFORE any cell
    # runs: a cold axon tunnel can throw UNAVAILABLE at first device touch
    # (this killed the round-5i D4 job at jax.devices()-time); bench.py
    # established the pattern.
    from insarseg.utils.retry import retry_transient

    retry_transient(lambda: len(jax.devices()), what="jax.devices()",
                    retries=4, sleep_s=15.0, backoff=1.6)

    os.makedirs(args.workdir, exist_ok=True)
    # resumable: completed (cell, seed) results persist across tunnel drops
    done_path = os.path.join(args.workdir, "results.jsonl")
    done = {}
    if os.path.exists(done_path):
        with open(done_path) as f:
            for line in f:
                r = json.loads(line)
                done[(r["cell"], r["seed"])] = r

    results = []
    for seed in args.seeds:
        root = make_task_root(args, seed)
        for c in args.cells:
            if (c, seed) in done:
                results.append(done[(c, seed)])
                continue
            # each cell is minutes of work; retry it whole on a transient
            # tunnel drop (resumable via results.jsonl either way)
            r = retry_transient(
                lambda: run_cell(c, root, args, args.workdir, seed=seed),
                what=f"run_cell({c}, seed={seed})",
                retries=2, sleep_s=30.0, backoff=2.0)
            with open(done_path, "a") as f:
                f.write(json.dumps(r) + "\n")
            results.append(r)
    for r in results:
        print(json.dumps(r), flush=True)

    if len(args.cells) == 2:
        a_name, b_name = args.cells
        deltas = []
        for seed in args.seeds:
            a = next(r for r in results
                     if r["cell"] == a_name and r["seed"] == seed)
            b = next(r for r in results
                     if r["cell"] == b_name and r["seed"] == seed)
            deltas.append({
                "seed": seed,
                "miou_delta_module": round(
                    b["miou_module"] - a["miou_module"], 5),
                "miou_delta_int8": round(b["miou_int8"] - a["miou_int8"], 5),
                "int8_drop_ca": round(a["miou_int8"] - a["miou_module"], 5),
                "int8_drop_fast": round(b["miou_int8"] - b["miou_module"], 5),
            })
        dm = np.asarray([d["miou_delta_module"] for d in deltas])
        print(json.dumps({
            "summary": "fast_vs_ca",
            "task": "hard" if args.hard else "easy",
            "seeds": args.seeds,
            "delta_module_mean": round(float(dm.mean()), 5),
            "delta_module_min": round(float(dm.min()), 5),
            "delta_module_max": round(float(dm.max()), 5),
            "per_seed": deltas,
        }), flush=True)


if __name__ == "__main__":
    main()
