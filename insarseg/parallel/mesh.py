"""Device mesh + sharding helpers.

The reference has no distributed execution at all — each of the 9 scripts
pins one GPU (`GPU_INDEX`/`GPU_ID`, /root/reference/Unet-ChannalAttention.py:32,
PSPNet-SpatialAttention.py:37) and the only parallelism is running scripts
concurrently. The TPU-native replacement (SURVEY.md §2.4) is GSPMD over an
ICI mesh:

- axis ``data``    — batch sharding (data parallelism). Gradients all-reduce
  and BatchNorm moments sync automatically: the train step is written with
  global-batch reductions, XLA partitions them into psums over ICI.
- axis ``spatial`` — optional sharding of the image H axis (spatial/context
  parallelism for large scenes). XLA inserts the halo exchanges that the
  3x3/7x7 convolutions need; nothing in the model code changes.

TP/PP/EP are documented out of scope: the largest model is ~66M params
(DeepLabV3-ResNet50) and replicates trivially (SURVEY.md §2.4).

No pmap, no axis_name plumbing: the engine's step functions are
mesh-agnostic; placement of the inputs alone decides the distribution.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = -1,
    spatial: int = 1,
    devices: Optional[Sequence[Any]] = None,
) -> Mesh:
    """Build a 2-D ('data', 'spatial') mesh. ``data=-1`` uses all remaining
    devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % spatial == 0, (n, spatial)
        data = n // spatial
    assert data * spatial <= n, (data, spatial, n)
    devs = np.asarray(devices[: data * spatial]).reshape(data, spatial)
    return Mesh(devs, ("data", "spatial"))


def batch_sharding(mesh: Mesh, spatial_axis: Optional[int] = 1) -> NamedSharding:
    """Sharding for an NHWC batch: batch over 'data', H over 'spatial'."""
    spec = [None, None, None, None]
    spec[0] = "data"
    if spatial_axis is not None and mesh.shape["spatial"] > 1:
        spec[spatial_axis] = "spatial"
    return NamedSharding(mesh, P(*spec))


def mask_sharding(mesh: Mesh) -> NamedSharding:
    spec = ["data", None, None]
    if mesh.shape["spatial"] > 1:
        spec[1] = "spatial"
    return NamedSharding(mesh, P(*spec))


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a host batch dict onto the mesh (image: B/data, H/spatial;
    mask alike). Non-array entries pass through."""
    out = dict(batch)
    out["image"] = jax.device_put(batch["image"], batch_sharding(mesh))
    if "mask" in batch:
        out["mask"] = jax.device_put(batch["mask"], mask_sharding(mesh))
    return out


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (params/optimizer state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def replicate_arrays(tree: Any, mesh: Mesh) -> Any:
    """Replicate only the ARRAY leaves of a tree over the mesh.

    The packed serving trees (engines 'serve'/'int8') mix device arrays
    with Python floats/bools/None that drive trace-time branching
    (e.g. ``blk['out_s'] is None``, ``packed['s2d']``); those must stay
    host scalars, so plain ``device_put`` of the whole tree is wrong.
    """
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding)
        if isinstance(x, (jax.Array, np.ndarray)) else x,
        tree,
    )
