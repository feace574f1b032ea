"""Batched, mesh-sharded inference — the TPU replacement for the reference's
single-GPU eval loop (/root/reference/Unet.py:200-239).

``make_predict_fn`` builds one jitted function: NHWC batch in (sharded
batch-over-'data'), logits or class-map out, optionally bf16 compute with
f32 parity mode. Throughput path for the north-star metric
(512^2 tiles/sec/chip, BASELINE.md)."""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from insarseg.parallel.mesh import batch_sharding


def make_predict_fn(
    model,
    mesh: Optional[Mesh] = None,
    argmax: bool = False,
    input_dtype: Optional[Any] = None,
) -> Callable:
    """Returns ``predict(variables, images) -> logits`` jitted over the mesh.

    With a mesh, inputs are constrained batch-sharded and params replicated —
    embarrassingly parallel over ICI (no collectives in the forward graph).
    """

    def forward(variables, images):
        if input_dtype is not None:
            images = images.astype(input_dtype)
        if mesh is not None:
            images = jax.lax.with_sharding_constraint(
                images, batch_sharding(mesh)
            )
        logits = model.apply(variables, images, train=False)
        if argmax:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return logits

    if mesh is None:
        return jax.jit(forward)
    return jax.jit(
        forward,
        in_shardings=(NamedSharding(mesh, P()), batch_sharding(mesh)),
    )
