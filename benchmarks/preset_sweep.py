"""Full-grid E2E sweep: every preset through the real CLI.

The reference is 9 monolithic scripts, one experiment each
(/root/reference/Readme.md:6-16). This sweep runs each preset through the
actual `insarseg` CLI — `train` → `eval` (module + int8) → `predict` — on a
synthetic VOC tree (the Arctic set is Google-Drive-only) and asserts the
full artifact contract:

- training writes the history JSON (reference key contract) and the
  best/latest Orbax checkpoints;
- every preset LEARNS: best val mIoU must improve on the first epoch's;
- eval restores the best checkpoint and scores both engines;
- predict writes a scene PNG through the sliding-window stitcher.

Prints one JSON line per preset plus a summary line. Results table lives
in README.md ("preset sweep").

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/preset_sweep.py \
      [--epochs 5] [--n-train 128] [--size 64] [--batch 8] \
      [--workdir /tmp/preset_sweep] [--presets unet deeplabv3 ...]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ALL_PRESETS = (
    "unet", "unet-channelattention", "unet-spatialattention",
    "deeplabv3", "deeplabv3-channelattention", "deeplabv3-spatialattention",
    "pspnet", "pspnet-channelattention", "pspnet-spatialattention",
    # extension cells (no reference twin); pspnet-true = the real
    # pyramid-pooling head the reference's "PSPNet" falsely claims
    "unet-fast-ca",
    "pspnet-true",
)


_TRANSIENT = ("FAILED_PRECONDITION", "TPU backend error", "DEADLINE_EXCEEDED",
              "UNAVAILABLE")


def run_cli(args_list, env, retries: int = 2):
    # the axon TPU tunnel occasionally drops a call with a transient
    # backend error — retry those (and only those: a deterministic
    # failure like a bad path would just waste 3 full training runs)
    for attempt in range(retries + 1):
        r = subprocess.run([sys.executable, "-m", "insarseg.cli"] + args_list,
                           env=env, capture_output=True, text=True)
        if r.returncode == 0:
            return r.stdout
        print(r.stdout[-2000:], file=sys.stderr)
        print(r.stderr[-3000:], file=sys.stderr)
        transient = any(m in r.stderr for m in _TRANSIENT)
        if attempt < retries and transient:
            print(f"transient backend error — retrying "
                  f"({attempt + 1}/{retries}): {' '.join(args_list[:2])}",
                  file=sys.stderr)
            time.sleep(30)
            continue
        break
    raise RuntimeError(f"CLI failed: {' '.join(args_list[:2])}")


def sweep_one(preset: str, root: str, scene: str, args, env) -> dict:
    cell = os.path.join(args.workdir, preset.replace("-", "_"))
    os.makedirs(cell, exist_ok=True)
    model_path = os.path.join(cell, "model.ckpt")
    hist_path = os.path.join(cell, "history.json")
    common = ["--preset", preset, "--voc-root", root,
              "--image-size", str(args.size), "--batch-size", str(args.batch),
              "--model-save-path", model_path,
              "--metrics-save-path", hist_path,
              "--learning-rate", "1e-3"]

    t0 = time.time()
    run_cli(["train", *common, "--num-epochs", str(args.epochs)], env)
    train_s = time.time() - t0

    # artifact contract: history JSON + best checkpoint
    with open(hist_path) as f:
        history = json.load(f)
    assert len(history) == args.epochs, (preset, len(history))
    ckpt_dir = os.path.splitext(model_path)[0]
    assert os.path.isdir(os.path.join(ckpt_dir, "best")), preset
    first = history[0]["val_miou"]
    best = max(h["val_miou"] for h in history)

    mious = {}
    for eng in ("module", "int8"):
        out = run_cli(["eval", *common, "--checkpoint", ckpt_dir,
                       "--engine", eng, "--calib-batches", "2"], env)
        mious[eng] = float(out.rsplit("'val_miou': ", 1)[1].split(",")[0]
                           .rstrip("}\n"))

    pred_png = os.path.join(cell, "scene_pred.png")
    run_cli(["predict", *common, "--checkpoint", ckpt_dir,
             "--input", scene, "--output", pred_png,
             "--tile", str(args.size), "--overlap", str(args.size // 4)], env)
    assert os.path.exists(pred_png), preset

    row = {
        "preset": preset,
        "epochs": args.epochs,
        "val_miou_epoch1": round(first, 4),
        "val_miou_best": round(best, 4),
        "learned": best > first + 0.01,
        "eval_miou_module": round(mious["module"], 4),
        "eval_miou_int8": round(mious["int8"], 4),
        "predict_ok": True,
        "train_s": round(train_s, 1),
    }
    print(json.dumps(row), flush=True)
    return row


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--n-train", type=int, default=128)
    ap.add_argument("--n-val", type=int, default=32)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--workdir", default="/tmp/preset_sweep")
    ap.add_argument("--presets", nargs="*", default=list(ALL_PRESETS))
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from insarseg.data.synthetic import make_synthetic_voc

    os.makedirs(args.workdir, exist_ok=True)
    root = os.path.join(args.workdir, f"voc_{args.size}_{args.n_train}")
    if not os.path.exists(os.path.join(root, "ImageSets")):
        make_synthetic_voc(root, n_train=args.n_train, n_val=args.n_val,
                           size=args.size, seed=0)
    # a scene 3x the tile in one dim exercises the stitcher
    scene = os.path.join(args.workdir, "scene.png")
    if not os.path.exists(scene):
        import numpy as np
        from PIL import Image

        rng = np.random.default_rng(7)
        Image.fromarray(
            (rng.random((args.size * 2, args.size * 3)) * 255)
            .astype(np.uint8), "L").save(scene)

    env = dict(os.environ)
    env["PYTHONPATH"] = ("/root/repo" + os.pathsep +
                         env.get("PYTHONPATH", "")).rstrip(os.pathsep)

    # resume support: completed rows persist in results.jsonl; a rerun
    # (e.g. after a tunnel drop) skips them
    results_path = os.path.join(args.workdir, "results.jsonl")
    done = {}
    if os.path.exists(results_path):
        with open(results_path) as f:
            for line in f:
                row = json.loads(line)
                done[row["preset"]] = row
    rows = []
    with open(results_path, "a") as f:
        for p in args.presets:
            if p in done:
                print(json.dumps(done[p]), flush=True)
                rows.append(done[p])
                continue
            row = sweep_one(p, root, scene, args, env)
            f.write(json.dumps(row) + "\n")
            f.flush()
            rows.append(row)
    n_learned = sum(r["learned"] for r in rows)
    print(json.dumps({"summary": "preset_sweep", "presets": len(rows),
                      "learned": n_learned}), flush=True)


if __name__ == "__main__":
    main()
