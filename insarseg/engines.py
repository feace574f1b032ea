"""Unified inference-engine factory.

One entry point over the per-family serving graphs:

- ``module`` — the parity Flax graph (`model.apply(train=False)`), every
  model/attention cell; the default, bit-matches training eval.
- ``serve``  — BN-folded exact serving graph: all UNet cells
  (insarseg/models/unet_serve.py — SE gates deferred to fusible
  consumers, SA per-pixel gates in place), the space-to-depth fast
  variant (unet_stem.py), and all DeepLabV3/FCN/PSPNet cells
  (resnet_serve.py). Same math up to float reassociation.
- ``int8``   — opt-in post-training quantization (needs calibration
  batches): UNet none/channel via the H-s2d graph (unet_int8.py), the
  fast variant, and all DeepLabV3/FCN/PSPNet cells (resnet_int8.py).
  Not parity-preserving.

Every engine is mesh-shardable: pass ``mesh`` (a ('data','spatial') mesh
from insarseg.parallel.make_mesh) and the packed predict jits with the
image batch sharded over the ``data`` axis and the packed weights
replicated — embarrassingly parallel over ICI, proven 8-way == 1-way in
tests/test_engines_mesh.py. The reference is single-device only
(/root/reference/Unet-ChannalAttention.py:32 pins one GPU).

UNet-SA routes through the folded STANDARD-layout graphs for both fast
engines (its per-pixel gates are meaningless across s2d parity lanes).
Measured note: SA int8 is functional but SLOWER than its module graph
(733 vs 982 tiles/s at 256^2 — 64-lane L1 int8 convs + full-res gate
passes); prefer ``serve`` for SA unless the 4x activation-memory saving
matters. Every (model, attention, engine) cell is covered.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

ENGINES = ("module", "serve", "int8")
KNOWN_MODELS = ("unet", "unet-fast", "deeplabv3", "fcn", "pspnet")


def supported(model_name: str, attention: str, engine: str) -> bool:
    """Whether (model, attention) runs on ``engine``."""
    model_name = model_name.lower().replace("_", "-")
    if engine not in ENGINES or model_name not in KNOWN_MODELS:
        return False
    # every cell of every known model runs on every engine: UNet-SA
    # serves/quantizes via the folded STANDARD-layout graph (per-pixel
    # gates are meaningless across s2d parity lanes)
    return True


def check_hw(shape: Tuple[int, ...], hdiv: int, wdiv: int,
             engine: str, model: str) -> None:
    """Trace-time guard for the packed engines' shape envelope.

    The serve/int8 graphs hand-unroll the 5-level pooling pyramid with
    static shapes (and omit the CA variant's bilinear ``shape_fix`` resize,
    /root/reference/Unet-ChannalAttention.py:138-157 — with the divisibility
    below every level is even, so the resize path never triggers and the
    omission is exact). Non-conforming sizes would fail deep inside lax
    with an opaque shape error; reject them here with a pointer at the
    envelope-free module graph.
    """
    if len(shape) != 4:
        raise ValueError(
            f"engine {engine!r} ({model}) expects NHWC images, got shape "
            f"{tuple(shape)}")
    _, h, w, _ = shape
    if h % hdiv or w % wdiv:
        raise ValueError(
            f"engine {engine!r} ({model}) requires H divisible by {hdiv} "
            f"and W divisible by {wdiv}; got H={h}, W={w}. Pad the input "
            "or use --engine module (no shape envelope).")


def make_engine(
    model_name: str,
    attention: str,
    model: Any,
    variables: Dict[str, Any],
    engine: str = "serve",
    calib_batches: Optional[List[jnp.ndarray]] = None,
    argmax: bool = False,
    input_dtype: Optional[Any] = None,
    mesh: Optional[Any] = None,
    calib_stat: str = "absmax",
):
    """Build a jitted ``predict(images) -> logits | int32 class map``.

    ``calib_batches`` (normalized f32 input batches) is required for
    ``engine='int8'``. With ``mesh``, the predict is jitted with the image
    batch sharded over the mesh's ``data`` axis (weights replicated).
    ``calib_stat``: activation-scale statistic for int8 PTQ — 'absmax'
    (exact, outlier-fragile) or 'p<digits>' percentile clipping (e.g.
    'p99.9'; insarseg/ops/quant.py::calib_stat_fn).
    """
    model_name = model_name.lower().replace("_", "-")
    if not supported(model_name, attention, engine):
        if engine not in ENGINES:
            raise ValueError(
                f"unknown engine {engine!r}; choose from {ENGINES}")
        if model_name not in KNOWN_MODELS:
            raise ValueError(
                f"unknown model {model_name!r}; known models: "
                f"{KNOWN_MODELS}")
        raise ValueError(
            f"engine {engine!r} does not support ({model_name}, "
            f"{attention}); use --engine module")

    if engine == "module":
        from insarseg.parallel.inference import make_predict_fn

        predict_v = make_predict_fn(model, mesh=mesh, argmax=argmax,
                                    input_dtype=input_dtype)
        if mesh is not None:
            from insarseg.parallel.mesh import replicate

            variables = replicate(variables, mesh)
        return lambda images: predict_v(variables, images)

    if engine == "int8" and not calib_batches:
        raise ValueError(
            "engine='int8' needs at least one calibration batch "
            "(calib_batches was "
            f"{'None' if calib_batches is None else 'empty'}); collect "
            "them with insarseg.engines.collect_calib_batches")

    if model_name == "unet-fast":
        from insarseg.models.unet_stem import (
            make_fast_int8_predict_fn,
            make_fast_serve_predict_fn,
        )

        if engine == "serve":
            return make_fast_serve_predict_fn(model, variables, argmax=argmax,
                                              input_dtype=input_dtype,
                                              mesh=mesh)
        return make_fast_int8_predict_fn(model, variables, calib_batches,
                                         argmax=argmax, mesh=mesh,
                                         calib_stat=calib_stat)
    if model_name == "unet":
        if engine == "serve":
            from insarseg.models.unet_serve import make_serve_predict_fn

            return make_serve_predict_fn(model, variables, argmax=argmax,
                                         input_dtype=input_dtype, mesh=mesh)
        from insarseg.models.unet_int8 import make_int8_predict_fn

        return make_int8_predict_fn(variables, calib_batches, argmax=argmax,
                                    s2d=attention != "spatial", mesh=mesh,
                                    calib_stat=calib_stat)

    if engine == "serve":
        from insarseg.models.resnet_serve import make_resnet_serve_predict_fn

        return make_resnet_serve_predict_fn(variables, argmax=argmax,
                                            input_dtype=input_dtype,
                                            mesh=mesh)
    from insarseg.models.resnet_int8 import make_resnet_int8_predict_fn

    return make_resnet_int8_predict_fn(variables, calib_batches,
                                       argmax=argmax, mesh=mesh,
                                       calib_stat=calib_stat)


def pack_engine(
    model_name: str,
    attention: str,
    model: Any,
    variables: Dict[str, Any],
    engine: str,
    calib_batches: Optional[List[Any]] = None,
    calib_stat: str = "absmax",
) -> Dict[str, Any]:
    """Pack (and for int8: calibrate) a serving engine into a portable
    artifact dict — build once, ``insarseg.engines_io.save_artifact`` it,
    and serve it anywhere via :func:`engine_from_artifact` without the
    original variables or calibration data. ``engine='module'`` has no
    packed form (it is the live Flax graph)."""
    model_name = model_name.lower().replace("_", "-")
    if engine == "module":
        raise ValueError("the module engine is the live Flax graph; "
                         "artifacts exist for 'serve' and 'int8' only")
    if not supported(model_name, attention, engine):
        raise ValueError(f"({model_name}, {attention}, {engine}) unsupported")
    if engine == "int8" and not calib_batches:
        raise ValueError("engine='int8' needs calibration batches")

    meta: Dict[str, Any] = {}
    if model_name == "unet-fast":
        from insarseg.models.unet_stem import (
            _inner_variables,
            space_to_depth,
        )

        f = model.factor
        meta = {"factor": f, "num_classes": model.num_classes}
        inner = _inner_variables(variables)
        if engine == "serve":
            from insarseg.models.unet_serve import pack_unet_serve

            tree = pack_unet_serve(inner)
        else:
            import numpy as np

            from insarseg.models.unet_int8 import pack_unet_int8

            calib = [np.asarray(space_to_depth(jnp.asarray(b, jnp.float32),
                                               f)) for b in calib_batches]
            tree = pack_unet_int8(inner, calib, s2d=False,
                                  calib_stat=calib_stat)
    elif model_name == "unet":
        if engine == "serve":
            from insarseg.models.unet_serve import pack_unet_serve

            tree = pack_unet_serve(variables)
        else:
            from insarseg.models.unet_int8 import pack_unet_int8

            tree = pack_unet_int8(variables, calib_batches,
                                  s2d=attention != "spatial",
                                  calib_stat=calib_stat)
    else:
        if engine == "serve":
            from insarseg.models.resnet_serve import pack_resnet_serve

            tree = pack_resnet_serve(variables)
        else:
            from insarseg.models.resnet_int8 import pack_resnet_int8

            tree = pack_resnet_int8(variables, calib_batches,
                                    calib_stat=calib_stat)
    # recorded so serving can cross-check an artifact against the CLI
    # config (an artifact with a different class count would otherwise
    # yield silently wrong metrics); absent in pre-round-4 artifacts,
    # validators must tolerate None
    nc = getattr(model, "num_classes", None)
    meta.setdefault("num_classes", int(nc) if nc is not None else None)
    return {"format": 1, "model": model_name, "attention": attention,
            "engine": engine, "meta": meta, "tree": tree}


def engine_from_artifact(
    artifact: Dict[str, Any],
    argmax: bool = False,
    input_dtype: Optional[Any] = None,
    mesh: Optional[Any] = None,
):
    """Rebuild the jitted ``predict(images)`` from a :func:`pack_engine`
    artifact (in-memory or loaded via insarseg.engines_io.load_artifact).
    Bit-exact vs the predict ``make_engine`` builds from the original
    variables (tests/test_engine_artifacts.py)."""
    model_name, engine = artifact.get("model"), artifact.get("engine")
    if artifact.get("format") != 1:
        raise ValueError(
            f"unsupported engine-artifact format {artifact.get('format')!r}"
            " (this build reads format 1)")
    if model_name not in KNOWN_MODELS or engine not in ("serve", "int8"):
        raise ValueError(
            f"bad engine artifact: model={model_name!r}, engine={engine!r}"
            f" (known models: {KNOWN_MODELS})")
    packed = mesh_replicate_packed(artifact["tree"], mesh)

    if model_name == "unet-fast":
        from insarseg.models.unet_stem import depth_to_space, space_to_depth

        f = int(artifact["meta"]["factor"])
        nc = int(artifact["meta"]["num_classes"])
        if engine == "serve":
            from insarseg.models.unet_serve import unet_serve_apply as apply
        else:
            from insarseg.models.unet_int8 import unet_int8_apply as apply

        def predict(images):
            check_hw(images.shape, 16 * f, 16 * f, engine, "unet-fast")
            if engine == "serve" and input_dtype is not None:
                images = images.astype(input_dtype)
            y = apply(packed, space_to_depth(images, f))
            if argmax:
                b, h, w, _ = y.shape
                cls = jnp.argmax(y.reshape(b, h, w, f * f, nc), -1)
                return depth_to_space(cls.astype(jnp.int32), f)[..., 0]
            return depth_to_space(y, f)
    elif model_name == "unet":
        if engine == "serve":
            from insarseg.models.unet_serve import unet_serve_apply

            def predict(images):
                check_hw(images.shape, 16, 16, "serve", "unet")
                if input_dtype is not None:
                    images = images.astype(input_dtype)
                return unet_serve_apply(packed, images, argmax=argmax)
        else:
            from insarseg.models.unet_int8 import unet_int8_apply

            hdiv = 32 if packed.get("s2d", True) else 16

            def predict(images):
                check_hw(images.shape, hdiv, 16, "int8", "unet")
                return unet_int8_apply(packed, images, argmax=argmax)
    else:
        if engine == "serve":
            from insarseg.models.resnet_serve import resnet_serve_apply

            def predict(images):
                if input_dtype is not None:
                    images = images.astype(input_dtype)
                return resnet_serve_apply(packed, images, argmax=argmax)
        else:
            from insarseg.models.resnet_int8 import resnet_int8_apply

            def predict(images):
                return resnet_int8_apply(packed, images, argmax=argmax)

    return jit_engine(predict, mesh)


def collect_calib_batches(loader, n: int, normalize_mean: float = 0.5,
                          normalize_std: float = 0.5) -> List[Any]:
    """Peek the first ``n`` batches off a loader as normalized f32 arrays —
    THE way to collect int8 calibration data from a data loader (one
    definition shared by the CLI and the benchmarks, so the uint8
    renormalization and the iterator-close contract can't drift).

    Raises if the loader yields nothing (an empty calibration set would
    otherwise surface as an opaque KeyError deep inside packing)."""
    import numpy as np

    peek = iter(loader)
    calib: List[Any] = []
    for _ in range(max(n, 1)):
        try:
            b = next(peek)
        except StopIteration:
            break
        img = np.asarray(b["image"], np.float32)
        if b["image"].dtype == np.uint8:
            img = (img / 255.0 - normalize_mean) / normalize_std
        calib.append(img)
    if hasattr(peek, "close"):
        peek.close()
    if not calib:
        raise ValueError("loader yielded no batches to calibrate on")
    return calib


def jit_engine(predict, mesh: Optional[Any]):
    """jit a packed ``predict(images)`` — plain on one device, or with the
    batch sharded over the mesh's ``data`` axis (the packed weights are
    closure constants; `mesh_replicate_packed` places them replicated)."""
    if mesh is None:
        return jax.jit(predict)
    from insarseg.parallel.mesh import batch_sharding

    return jax.jit(predict,
                   in_shardings=(batch_sharding(mesh, spatial_axis=None),))


def mesh_replicate_packed(packed: Any, mesh: Optional[Any]) -> Any:
    """Replicate a packed engine tree's array leaves over the mesh; Python
    scalars/None stay untouched (they drive trace-time branching)."""
    if mesh is None:
        return packed
    from insarseg.parallel.mesh import replicate_arrays

    return replicate_arrays(packed, mesh)
