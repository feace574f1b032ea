"""CLI entry points (L7): train / eval / predict.

The reference has no CLI at all — users edit module-level constants marked
``TODO 【重要】`` and run each script (/root/reference/Unet.py:17,29;
SURVEY.md §2.2.25). Here: ``python -m insarseg.cli train --preset
unet-channelattention --voc-root ... [--override ...]`` with every Config
field overridable, plus torch-checkpoint import for parity workflows.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np


def _add_config_overrides(p: argparse.ArgumentParser) -> None:
    from insarseg.config import Config

    for f in dataclasses.fields(Config):
        flag = "--" + f.name.replace("_", "-")
        if f.type == "bool" or isinstance(f.default, bool):
            p.add_argument(flag, type=lambda s: s.lower() in ("1", "true", "yes"),
                           default=None)
        else:
            p.add_argument(flag, type=type(f.default), default=None)


def _build_cfg(args):
    from insarseg.config import Config, get_preset

    overrides = {}
    for f in dataclasses.fields(Config):
        v = getattr(args, f.name, None)
        if v is not None:
            overrides[f.name] = v
    if args.preset:
        return get_preset(args.preset, **overrides)
    return Config(**overrides)


def cmd_train(args) -> int:
    from insarseg.data.voc import BatchLoader, VOCSegDataset
    from insarseg.models.registry import build_model
    from insarseg.train import engine
    from insarseg.train.checkpoint import Checkpointer
    from insarseg.utils.history import save_history

    if args.debug_nans:
        from insarseg.utils.profiling import enable_nan_debugging

        enable_nan_debugging(True)
    cfg = _build_cfg(args)
    if not os.path.isdir(os.path.join(cfg.voc_root, "JPEGImages")):
        print(f"error: dataset not found under {cfg.voc_root!r} "
              "(expected VOC layout with JPEGImages/)", file=sys.stderr)
        return 2

    kw = dict(
        mask_contract=cfg.mask_contract, normalize_mean=cfg.normalize_mean,
        normalize_std=cfg.normalize_std, ignore_index=cfg.ignore_index,
        raw_u8=args.raw_u8,
    )
    ds_cls = VOCSegDataset
    if args.native:
        from insarseg.data.native_loader import NativeVOCSegDataset

        ds_cls = NativeVOCSegDataset
    train_ds = ds_cls(cfg.voc_root, cfg.image_size, "train", **kw)
    val_ds = ds_cls(cfg.voc_root, cfg.image_size, "val", **kw)
    train_loader = BatchLoader(train_ds, cfg.batch_size, shuffle=True,
                               seed=cfg.seed, ignore_index=cfg.ignore_index,
                               drop_last=cfg.drop_last,
                               num_workers=args.num_workers)
    val_loader = BatchLoader(val_ds, cfg.batch_size,
                             ignore_index=cfg.ignore_index,
                             num_workers=args.num_workers)
    if args.native:
        from insarseg.data.native_loader import PrefetchLoader

        train_loader = PrefetchLoader(train_loader)
        val_loader = PrefetchLoader(val_loader)
    model = build_model(cfg)
    # per-run checkpoint directory derived from the preset's save path
    # (model_save_path minus extension): presets must not clobber each
    # other's best/latest, and --resume must never restore another preset's
    # state. Pass this directory to eval/predict --checkpoint.
    ckpt_dir = os.path.splitext(cfg.model_save_path)[0] or "."
    ckpt = Checkpointer(ckpt_dir)
    print(f"checkpoints -> {ckpt_dir}/{{best,latest}}")
    if args.resume and not ckpt.has_latest():
        old_dir = os.path.dirname(cfg.model_save_path) or "."
        print(f"warning: --resume found no latest checkpoint under "
              f"{ckpt_dir!r}; training starts from step 0. Checkpoints from "
              f"runs before the per-preset layout lived under {old_dir!r} — "
              "move them into the per-preset dir to resume from them.",
              file=sys.stderr)
    history = engine.fit(model, cfg, train_loader, val_loader, checkpointer=ckpt,
                         resume=args.resume)
    if args.resume and os.path.exists(cfg.metrics_save_path):
        # merge: keep the crashed run's completed epochs, replace any the
        # resumed run re-trained, append the new ones
        from insarseg.utils.history import load_history

        redone = {h["epoch"] for h in history}
        history = [h for h in load_history(cfg.metrics_save_path)
                   if h["epoch"] not in redone] + history
        history.sort(key=lambda h: h["epoch"])
    save_history(history, cfg.metrics_save_path)
    print(f"history saved to {cfg.metrics_save_path}")
    return 0


def _resolve_calib_flags(args) -> bool:
    """Fill in the calibration-flag defaults; returns True when the user
    passed either flag explicitly (so the artifact path can warn that they
    are baked into the artifact and ignored)."""
    explicit = (getattr(args, "calib_batches", None) is not None
                or getattr(args, "calib_stat", None) is not None)
    if getattr(args, "calib_batches", None) is None:
        args.calib_batches = 4
    if getattr(args, "calib_stat", None) is None:
        args.calib_stat = "absmax"
    return explicit


def _check_artifact_vs_cfg(art, cfg, args, explicit_calib: bool) -> None:
    """--engine-artifact serves a prebuilt engine; the CLI config must
    agree with what the artifact was packed from, or metrics come out
    silently wrong (e.g. a different class count makes JAX drop
    out-of-range confusion-count indices instead of erroring)."""
    mismatches = []
    if art.get("model") != cfg.model:
        mismatches.append(f"model: artifact={art.get('model')!r} "
                          f"config={cfg.model!r}")
    if art.get("attention") != cfg.attention:
        mismatches.append(f"attention: artifact={art.get('attention')!r} "
                          f"config={cfg.attention!r}")
    art_nc = (art.get("meta") or {}).get("num_classes")
    if art_nc is not None and int(art_nc) != cfg.num_classes:
        mismatches.append(f"num_classes: artifact={art_nc} "
                          f"config={cfg.num_classes}")
    if mismatches:
        raise SystemExit(
            "--engine-artifact does not match the CLI config ("
            + "; ".join(mismatches)
            + "); pass the preset the artifact was packed from")
    engine_name = getattr(args, "engine", "module") or "module"
    if engine_name != "module" and engine_name != art.get("engine"):
        raise SystemExit(
            f"--engine {engine_name} conflicts with --engine-artifact "
            f"(the artifact is a packed {art.get('engine')!r} engine); "
            "drop --engine when serving an artifact")
    if explicit_calib and art.get("engine") == "int8":
        print("warning: --calib-batches/--calib-stat are ignored with "
              "--engine-artifact (the int8 scales were calibrated at pack "
              "time and are baked into the artifact)", file=sys.stderr)


def _eval_mesh(cfg):
    """Mesh for engine-scored evaluation: shard the (static, padded) eval
    batch over the data axis — every chip on every code path, exactly as
    predict does (round-3 verdict: eval --engine idled n-1 chips)."""
    n = len(jax.devices())
    if n <= 1:
        return None
    from insarseg.parallel import make_mesh

    # the data axis must divide the loader's static batch
    data = max(d for d in range(1, n + 1) if cfg.batch_size % d == 0)
    return make_mesh(data=data, spatial=1) if data > 1 else None


def cmd_eval(args) -> int:
    from insarseg.data.voc import BatchLoader, VOCSegDataset
    from insarseg.models.registry import build_model
    from insarseg.train import engine
    from insarseg.train.checkpoint import Checkpointer

    cfg = _build_cfg(args)
    model = build_model(cfg)
    ds_cls = VOCSegDataset
    if args.native:
        from insarseg.data.native_loader import NativeVOCSegDataset

        ds_cls = NativeVOCSegDataset
    ds = ds_cls(cfg.voc_root, cfg.image_size, args.split,
                mask_contract=cfg.mask_contract,
                normalize_mean=cfg.normalize_mean,
                normalize_std=cfg.normalize_std,
                ignore_index=cfg.ignore_index,
                raw_u8=args.raw_u8)
    loader = BatchLoader(ds, cfg.batch_size, ignore_index=cfg.ignore_index,
                         num_workers=args.num_workers)
    if args.native:
        from insarseg.data.native_loader import PrefetchLoader

        loader = PrefetchLoader(loader)

    explicit_calib = _resolve_calib_flags(args)
    engine_name = getattr(args, "engine", "module") or "module"
    mesh = None
    if getattr(args, "engine_artifact", None):
        # serve a prebuilt artifact: no checkpoint, no calibration
        from insarseg.engines import engine_from_artifact
        from insarseg.engines_io import load_artifact

        art = load_artifact(args.engine_artifact)
        _check_artifact_vs_cfg(art, cfg, args, explicit_calib)
        mesh = _eval_mesh(cfg)
        predict = engine_from_artifact(art, mesh=mesh)
        eval_step = engine.make_engine_eval_step(
            predict, cfg.num_classes, cfg.ignore_index,
            normalize=(cfg.normalize_mean, cfg.normalize_std))
        variables = {"params": None, "batch_stats": None}
    elif engine_name != "module":
        from insarseg.engines import supported

        variables = _load_variables(args, cfg, model)
        if not supported(cfg.model, cfg.attention, engine_name):
            raise SystemExit(
                f"--engine {engine_name} does not support "
                f"({cfg.model}, {cfg.attention}); use --engine module")
        calib = None
        if engine_name == "int8":
            # calibrate on the first N batches (real data) — single-batch
            # absmax is fragile to outlier activations. Default source is
            # the scored split (calibration-QA bound); --calib-split train
            # keeps calibration disjoint from scoring (deployment number).
            from insarseg.engines import collect_calib_batches

            calib_split = getattr(args, "calib_split", None)
            calib_loader = loader
            if calib_split and calib_split != args.split:
                calib_ds = ds_cls(
                    cfg.voc_root, cfg.image_size, calib_split,
                    mask_contract=cfg.mask_contract,
                    normalize_mean=cfg.normalize_mean,
                    normalize_std=cfg.normalize_std,
                    ignore_index=cfg.ignore_index, raw_u8=args.raw_u8)
                calib_loader = BatchLoader(
                    calib_ds, cfg.batch_size, ignore_index=cfg.ignore_index,
                    num_workers=args.num_workers)
            calib = collect_calib_batches(calib_loader, args.calib_batches,
                                          cfg.normalize_mean,
                                          cfg.normalize_std)
        mesh = _eval_mesh(cfg)
        predict = _build_engine_maybe_save(args, cfg, model, variables,
                                           engine_name, calib, mesh=mesh)
        eval_step = engine.make_engine_eval_step(
            predict, cfg.num_classes, cfg.ignore_index,
            normalize=(cfg.normalize_mean, cfg.normalize_std))
    else:
        if getattr(args, "save_engine", None):
            raise SystemExit(
                "--save-engine needs a packed engine: pass --engine serve "
                "or --engine int8 (the module engine is the live Flax "
                "graph and has no artifact form)")
        variables = _load_variables(args, cfg, model)
        eval_step = engine.make_eval_step(
            model, cfg.num_classes, cfg.ignore_index,
            normalize=(cfg.normalize_mean, cfg.normalize_std))
    place = None
    if mesh is not None:
        from insarseg.parallel import shard_batch

        place = lambda batch: shard_batch(batch, mesh)  # noqa: E731
    res = engine.evaluate(eval_step, variables["params"],
                          variables["batch_stats"], loader,
                          cfg.metrics_version, cfg.metrics_mode,
                          place=place)
    print(res)
    return 0


def _build_engine_maybe_save(args, cfg, model, variables, engine_name,
                             calib, mesh):
    """The one save-engine flow shared by eval and predict: pack (+save
    the artifact when --save-engine is set) or build the live engine."""
    from insarseg.engines import make_engine

    if getattr(args, "save_engine", None):
        from insarseg.engines import engine_from_artifact, pack_engine
        from insarseg.engines_io import save_artifact

        art = pack_engine(cfg.model, cfg.attention, model, variables,
                          engine_name, calib_batches=calib,
                          calib_stat=args.calib_stat)
        print(f"engine artifact written to "
              f"{save_artifact(args.save_engine, art)}")
        return engine_from_artifact(art, mesh=mesh)
    return make_engine(cfg.model, cfg.attention, model, variables,
                       engine_name, calib_batches=calib, mesh=mesh,
                       calib_stat=args.calib_stat)


def cmd_predict(args) -> int:
    """Full-scene sliding-window inference on grayscale scene image(s).

    With several ``--input`` scenes, same-shaped scenes share one tile
    plan and stream through fixed-shape batched forward chunks
    (``data/stitch.py::sliding_window_inference_batched``) — the serving
    configuration that saturates the chip (2.5x the single-scene
    dispatch rate at 1024^2, BASELINE.md "Round 4")."""
    from PIL import Image

    from insarseg.models.registry import build_model
    from insarseg.parallel import make_mesh

    cfg = _build_cfg(args)
    explicit_calib = _resolve_calib_flags(args)
    if getattr(args, "stream", False):
        return _predict_stream(args, cfg, explicit_calib)
    model = build_model(cfg)
    scenes = []
    for path in args.input:
        img = Image.open(path).convert("L")
        x = np.asarray(img, np.float32) / 255.0
        x = (x - cfg.normalize_mean) / cfg.normalize_std
        scenes.append(jnp.asarray(x[..., None]))
    # int8 self-calibration samples tiles from the first scene (scenes in
    # one predict call are assumed statistically alike; calibrate offline
    # via eval --save-engine when they are not)
    scene = scenes[0]

    n = len(jax.devices())
    mesh = make_mesh(data=n) if n > 1 else None

    from insarseg.engines import supported

    engine_name = getattr(args, "engine", "module") or "module"
    if not supported(cfg.model, cfg.attention, engine_name):
        raise SystemExit(
            f"--engine {engine_name} does not support "
            f"({cfg.model}, {cfg.attention})")

    if getattr(args, "engine_artifact", None):
        # prebuilt serving artifact: no checkpoint load, no calibration
        from insarseg.engines import engine_from_artifact
        from insarseg.engines_io import load_artifact

        art = load_artifact(args.engine_artifact)
        _check_artifact_vs_cfg(art, cfg, args, explicit_calib)
        eng = engine_from_artifact(art, mesh=mesh)
        return _predict_scenes(args, cfg, scenes, eng, mesh)

    variables = _load_variables(args, cfg, model)

    def _scene_calib():
        # --calib-batches groups of 4 tiles spread across the scene (not
        # just the top-left corner, whose statistics may be unrepresentative).
        # Groups are kept a uniform 4 tiles: the calibration replay is
        # jitted, and a ragged last group would force a second multi-minute
        # remote compile for negligible extra signal.
        from insarseg.data.stitch import extract_tiles, plan_tiles

        h, w = scene.shape[:2]
        pos = plan_tiles(max(h, args.tile), max(w, args.tile), args.tile,
                         args.overlap)
        n = min(len(pos), 4 * max(args.calib_batches, 1))
        if n > 4:
            n -= n % 4
        stride = max(len(pos) // n, 1)
        pos = pos[::stride][:n]
        pad_h, pad_w = max(0, args.tile - h), max(0, args.tile - w)
        padded = jnp.pad(scene, ((0, pad_h), (0, pad_w), (0, 0)))
        group = min(4, len(pos))
        return [np.asarray(extract_tiles(padded, pos[i:i + group], args.tile))
                for i in range(0, len(pos) - group + 1, group)]

    if getattr(args, "save_engine", None) and engine_name == "module":
        raise SystemExit(
            "--save-engine needs a packed engine: pass --engine serve or "
            "--engine int8 (the module engine is the live Flax graph and "
            "has no artifact form)")
    calib = _scene_calib() if engine_name == "int8" else None
    # every engine (module/serve/int8) is mesh-shardable: the tile batch
    # shards over the 'data' axis, weights replicate over ICI
    eng = _build_engine_maybe_save(args, cfg, model, variables, engine_name,
                                   calib, mesh)
    return _predict_scenes(args, cfg, scenes, eng, mesh)


def _tile_batch_for(args, n_total_tiles: int, mesh) -> "int | None":
    """Forward-chunk size: an explicit --tile-batch is honored (rounded up
    to the mesh size under sharding); the DEFAULT is 128 tiles/chip — the
    measured batch sweet spot for every engine (int8 613 t/s at b128 vs
    508 at b72, `benchmarks/int8_batch_sweep.py`; the bf16 serve graph
    411 at b128 vs 318 at b64) and a bound on chunk memory."""
    tile_batch = args.tile_batch
    if mesh is None:
        return tile_batch or min(n_total_tiles, 128)
    # the sharded tile batch must be a multiple of the mesh; partial
    # chunks are padded to the batch size inside the stitch helpers
    import math

    n = len(jax.devices())
    per = tile_batch if tile_batch else min(n_total_tiles, 128)
    return n * math.ceil(per / n)


def _output_paths(args) -> "dict[str, str]":
    """Output path per --input scene. Joining only the basename into
    --output would silently overwrite when two --input scenes from
    different directories share a filename (round-4 advisor) — later
    duplicates get a numeric suffix."""
    out_names: "dict[str, str]" = {}
    taken: "set[str]" = set()
    for p in args.input:
        base = os.path.splitext(os.path.basename(p))[0] + "_pred.png"
        name, k = base, 1
        while name in taken:
            k += 1
            name = base[: -len(".png")] + f"_{k}.png"
        taken.add(name)
        out_names[p] = name

    def _one(path: str) -> str:
        if not args.output:
            return os.path.splitext(path)[0] + "_pred.png"
        if len(args.input) == 1:
            return args.output
        return os.path.join(args.output, out_names[path])

    return {p: _one(p) for p in args.input}


def _predict_stream(args, cfg, explicit_calib) -> int:
    """Bounded-memory predict: each scene streams band-by-band through the
    device-stitch serving path (``data/serve.py::stream_scene_inference``)
    and finalized rows are argmaxed straight into a uint8 prediction.

    Resident memory is one input row band + one device call of tiles + the
    (H, W) uint8 prediction — never the (H, W, C) f32 logits the in-memory
    path accumulates on device (8x larger at C=2: 2 GB at 16384^2).
    ``.npy`` inputs open memmapped, so >RAM strips never materialize on
    host; uint8 input normalizes ON DEVICE (4x less host->device traffic).
    f32 ``.npy`` scenes must be pre-normalized. Single-chip path — one
    compiled band program per scene shape; for many moderate scenes on a
    mesh, the default batched path is the throughput configuration.
    """
    from PIL import Image

    from insarseg.data.serve import stream_scene_inference
    from insarseg.engines import supported
    from insarseg.models.registry import build_model

    engine_name = getattr(args, "engine", "module") or "module"
    if not supported(cfg.model, cfg.attention, engine_name):
        raise SystemExit(
            f"--engine {engine_name} does not support "
            f"({cfg.model}, {cfg.attention})")

    def open_scene(path: str) -> np.ndarray:
        if path.endswith(".npy"):
            arr = np.load(path, mmap_mode="r")
            if arr.ndim == 3 and arr.shape[-1] == 1:
                arr = arr[..., 0]
            if arr.ndim != 2 or arr.dtype not in (np.uint8, np.float32):
                raise SystemExit(
                    f"--stream .npy scene must be 2D uint8 or f32 "
                    f"(pre-normalized), got {arr.shape} {arr.dtype}: {path}")
            return arr
        return np.asarray(Image.open(path).convert("L"), np.uint8)

    scenes = {p: open_scene(p) for p in args.input}
    for p, arr in scenes.items():
        if min(arr.shape) < args.tile:
            raise SystemExit(
                f"--stream needs scenes >= tile ({args.tile}); {p} is "
                f"{arr.shape} — drop --stream or lower --tile")

    norm = (cfg.normalize_mean, cfg.normalize_std)
    model = build_model(cfg)
    if getattr(args, "engine_artifact", None):
        from insarseg.engines import engine_from_artifact
        from insarseg.engines_io import load_artifact

        art = load_artifact(args.engine_artifact)
        _check_artifact_vs_cfg(art, cfg, args, explicit_calib)
        eng = engine_from_artifact(art, mesh=None)
    else:
        variables = _load_variables(args, cfg, model)
        calib = None
        if engine_name == "int8":
            calib = _stream_calib(next(iter(scenes.values())), args, norm)
        eng = _build_engine_maybe_save(args, cfg, model, variables,
                                       engine_name, calib, None)

    if args.output and len(args.input) > 1:
        os.makedirs(args.output, exist_ok=True)
    out_paths = _output_paths(args)
    gray_step = max(255 // max(cfg.num_classes - 1, 1), 1)
    for path, arr in scenes.items():
        h, w = arr.shape
        # emit="argmax": the class map is computed on device and crosses
        # to the host as uint8 rows — 8x less fetch than f32 logits, the
        # measured stream-path bottleneck (benchmarks/stream_bench.py)
        pred = np.empty((h, w), np.uint8)
        stream_scene_inference(
            eng, arr, (h, w), cfg.num_classes, tile=args.tile,
            overlap=args.overlap, batch_size=args.tile_batch or 128,
            normalize=norm if arr.dtype == np.uint8 else None,
            writer=pred, emit="argmax")
        Image.fromarray(pred * np.uint8(gray_step), "L").save(out_paths[path])
        print(f"prediction written to {out_paths[path]}")
    return 0


def _stream_calib(arr, args, norm):
    """int8 calibration groups (4 tiles each) spread across the first
    --stream scene, normalized on host — the calibration replay consumes
    normalized f32 tiles even though the stream path itself normalizes on
    device."""
    from insarseg.data.stitch import plan_tiles

    h, w = arr.shape
    pos = plan_tiles(h, w, args.tile, args.overlap)
    n = min(len(pos), 4 * max(args.calib_batches or 4, 1))
    if n > 4:
        n -= n % 4
    stride = max(len(pos) // n, 1)
    pos = pos[::stride][:n]
    mean, std = norm
    group = min(4, len(pos))
    groups = []
    for i in range(0, len(pos) - group + 1, group):
        tiles = np.stack([
            np.asarray(arr[r : r + args.tile, c : c + args.tile], np.float32)
            for r, c in pos[i : i + group]])[..., None]
        if arr.dtype == np.uint8:
            tiles = (tiles / 255.0 - mean) / std
        groups.append(tiles)
    return groups


def _predict_scenes(args, cfg, scenes, eng, mesh) -> int:
    """Write one ``*_pred.png`` per input scene. Same-shaped scenes share
    one tile plan and run through the batched multi-scene pipeline — one
    stream of fixed-shape forward chunks fills the chip(s) regardless of
    per-scene tile counts (2.5x the 1-scene dispatch rate at 1024^2,
    measured on the v5e — BASELINE.md "Round 4")."""
    from PIL import Image

    from insarseg.data.stitch import (
        plan_tiles,
        sliding_window_inference,
        sliding_window_inference_batched,
    )

    if args.output and len(args.input) > 1:
        os.makedirs(args.output, exist_ok=True)
    out_paths = _output_paths(args)

    def _out_path(path: str) -> str:
        return out_paths[path]

    # group inputs by scene shape: one tile plan (and one compiled stitch
    # program) per distinct shape, batched within each group
    groups: "dict[tuple, list[int]]" = {}
    for i, sc in enumerate(scenes):
        groups.setdefault(sc.shape, []).append(i)

    gray_step = max(255 // max(cfg.num_classes - 1, 1), 1)
    for shape, idxs in groups.items():
        h, w = shape[:2]
        n_tiles = len(plan_tiles(max(h, args.tile), max(w, args.tile),
                                 args.tile, args.overlap))
        tile_batch = _tile_batch_for(args, n_tiles * len(idxs), mesh)
        if len(idxs) == 1:
            logits = sliding_window_inference(
                eng, scenes[idxs[0]], tile=args.tile, overlap=args.overlap,
                batch_size=tile_batch)[None]
        else:
            logits = sliding_window_inference_batched(
                eng, jnp.stack([scenes[i] for i in idxs]),
                tile=args.tile, overlap=args.overlap,
                batch_size=tile_batch)
        preds = np.asarray(jnp.argmax(logits, -1)).astype(np.uint8)
        for pred, i in zip(preds, idxs):
            out = _out_path(args.input[i])
            # spread class labels over the gray range without uint8
            # wraparound (255 only works for the binary case; class 2 of 3
            # would wrap to 254)
            Image.fromarray(pred * np.uint8(gray_step), "L").save(out)
            print(f"prediction written to {out}")
    return 0


def _load_variables(args, cfg, model):
    from insarseg.train.checkpoint import Checkpointer

    if getattr(args, "torch_checkpoint", None):
        from insarseg.compat.torch_io import (
            load_torch_state_dict,
            segmentation_variables_from_torch,
            unet_variables_from_torch,
        )

        sd = load_torch_state_dict(args.torch_checkpoint)
        if cfg.model == "unet":
            return unet_variables_from_torch(
                sd, use_se=cfg.attention == "channel",
                use_sa=cfg.attention == "spatial",
            )
        return segmentation_variables_from_torch(sd, cfg.model, cfg.attention)
    if getattr(args, "checkpoint", None):
        ckpt = Checkpointer(args.checkpoint)
        x = jnp.zeros((1, cfg.image_size, cfg.image_size, cfg.in_channels))
        abstract = model.init(jax.random.key(0), x)
        restored = ckpt.restore_best(
            {
                "params": abstract["params"],
                "batch_stats": abstract.get("batch_stats", {}),
                "miou": jnp.zeros(()),
            }
        )
        return {"params": restored["params"],
                "batch_stats": restored["batch_stats"]}
    # fresh init (useful for smoke runs)
    x = jnp.zeros((1, cfg.image_size, cfg.image_size, cfg.in_channels))
    return model.init(jax.random.key(cfg.seed), x)


def cmd_export_torch(args) -> int:
    """Export a trained checkpoint (any family) as a reference-compatible
    ``.pth`` state_dict (inverse of --torch-checkpoint import): hand-rolled
    UNet naming, or torchvision naming for deeplabv3/fcn."""
    import torch

    from insarseg.compat.torch_io import (
        segmentation_variables_to_torch,
        unet_variables_to_torch,
    )
    from insarseg.models.registry import build_model

    cfg = _build_cfg(args)
    model = build_model(cfg)
    variables = _load_variables(args, cfg, model)
    if cfg.model == "unet":
        sd = unet_variables_to_torch(
            variables, use_se=cfg.attention == "channel",
            use_sa=cfg.attention == "spatial",
        )
    elif cfg.model in ("deeplabv3", "fcn"):
        sd = segmentation_variables_to_torch(
            variables, cfg.model, cfg.attention, backbone=cfg.backbone,
        )
    else:
        print(f"error: export-torch has no reference naming for "
              f"{cfg.model!r} (the true-PSPNet extension has no torch twin)",
              file=sys.stderr)
        return 2
    tensors = {k: torch.from_numpy(np.ascontiguousarray(v))
               if getattr(v, "ndim", 0) else torch.tensor(v)
               for k, v in sd.items()}
    torch.save(tensors, args.output)
    print(f"exported {len(tensors)} tensors to {args.output}")
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="insarseg")
    sub = parser.add_subparsers(dest="command", required=True)

    for name, fn in (("train", cmd_train), ("eval", cmd_eval),
                     ("predict", cmd_predict), ("export-torch", cmd_export_torch)):
        p = sub.add_parser(name)
        p.add_argument("--preset", default=None)
        p.add_argument("--num-workers", type=int, default=0)
        p.add_argument("--native", action="store_true",
                       help="C++ preprocessing kernels + prefetch thread")
        p.add_argument("--debug-nans", action="store_true",
                       help="raise on any NaN/Inf produced inside jit")
        p.add_argument("--raw-u8", action="store_true",
                       help="ship uint8 tiles to the device and normalize "
                            "on-device (4x less host->device transfer)")
        p.add_argument("--resume", action="store_true",
                       help="restore the latest TrainState (params, optimizer, "
                            "step) from the checkpoint dir and continue the "
                            "epoch count — crash recovery")
        p.add_argument("--checkpoint", default=None,
                       help="Orbax checkpoint directory")
        p.add_argument("--torch-checkpoint", default=None,
                       help="reference .pth state_dict to import")
        _add_config_overrides(p)
        if name == "eval":
            p.add_argument("--split", default="val")
            p.add_argument("--engine", default="module",
                           choices=["module", "serve", "int8"],
                           help="score a serving engine instead of the "
                                "module graph — int8 self-calibrates on "
                                "the first --calib-batches val batches "
                                "(calibration QA)")
            p.add_argument("--calib-split", default=None,
                           choices=["train", "val"],
                           help="int8 engine: dataset split to draw "
                                "calibration batches from (default: the "
                                "--split being scored, a calibration-QA "
                                "bound; pass 'train' for an honest "
                                "deployment number — calibration never "
                                "sees the scored split)")
        if name in ("eval", "predict"):
            # defaults are None so the artifact path can tell an explicit
            # flag apart (they resolve to 4/'absmax' in _resolve_calib_flags)
            p.add_argument("--calib-batches", type=int, default=None,
                           help="int8 engine: number of batches to "
                                "calibrate activation scales on (absmax "
                                "from one batch is outlier-fragile; "
                                "default 4)")
            p.add_argument("--calib-stat", default=None,
                           help="int8 activation-scale statistic: 'absmax' "
                                "(default) or a percentile like 'p99.9' "
                                "(clips outliers for finer inlier "
                                "resolution)")
            p.add_argument("--save-engine", default=None,
                           help="after packing (+ int8 calibration), save "
                                "the serving-engine artifact to this .npz "
                                "— serve it later with --engine-artifact "
                                "(no checkpoint or calibration data "
                                "needed)")
            p.add_argument("--engine-artifact", default=None,
                           help="serve a prebuilt engine artifact "
                                "(insarseg.engines_io) instead of packing "
                                "from a checkpoint")
        if name == "predict":
            p.add_argument("--input", required=True, nargs="+",
                           help="grayscale scene image(s); same-sized "
                                "scenes share one tile plan and stream "
                                "through batched forward chunks (2.5x the "
                                "single-scene dispatch rate, measured — "
                                "BASELINE.md 'Round 4')")
            p.add_argument("--output", default=None,
                           help="output path (single input) or directory "
                                "(multiple inputs); default: "
                                "<input>_pred.png beside each scene")
            p.add_argument("--tile", type=int, default=512)
            p.add_argument("--overlap", type=int, default=64)
            p.add_argument("--tile-batch", type=int, default=None)
            p.add_argument("--stream", action="store_true",
                           help="bounded-memory streaming inference for "
                                "scenes too large to hold logits in RAM: "
                                "reads .npy (memmapped, uint8 or "
                                "pre-normalized f32) or image inputs band-"
                                "by-band, stitches on device "
                                "(data/serve.py), argmaxes rows straight "
                                "into the uint8 prediction; single-chip")
            p.add_argument("--engine", default="module",
                           choices=["module", "serve", "int8"],
                           help="inference engine: 'module' (parity graph, "
                                "any model/mesh), 'serve' (BN-folded exact "
                                "graph: UNet none/channel, unet-fast, "
                                "deeplabv3/fcn/pspnet), 'int8' (PTQ, "
                                "self-calibrated on the scene, same models)")
        if name == "export-torch":
            p.add_argument("--output", required=True)
        p.set_defaults(fn=fn)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
