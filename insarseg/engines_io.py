"""Serving-engine artifacts: pack/calibrate once, save, serve many times.

The packed serve/int8 trees (insarseg/models/{unet_serve,unet_int8,
resnet_serve,resnet_int8}.py) are plain pytrees of device arrays plus
Python scalars/None/strings that drive trace-time branching. A production
deployment wants to build them ONCE — BN folding is cheap but int8
calibration needs representative data that a serving replica may not have
— and ship the artifact to every replica. This module is the disk format:

- one ``.npz`` file; array leaves are stored as raw bytes + (dtype, shape)
  tags so int8 and bfloat16 survive the round trip bit-exactly;
- the tree structure and non-array leaves ride a JSON manifest inside the
  same file (floats round-trip exactly through JSON's repr semantics);
- the artifact records (model, attention, engine, meta) so
  ``insarseg.engines.engine_from_artifact`` can rebuild the jitted predict
  without the original model object or calibration data.

The reference has no serving story at all (each script re-instantiates
the torch module and loads a .pth, /root/reference/Unet.py:304-309).
"""

from __future__ import annotations

import json
from typing import Any, Dict, List

import numpy as np


def _encode(node: Any, arrays: List[np.ndarray]) -> Any:
    import jax

    if node is None or isinstance(node, (bool, int, float, str)):
        return {"k": "v", "v": node}
    if isinstance(node, (jax.Array, np.ndarray, np.generic)):
        arrays.append(np.asarray(node))
        return {"k": "a", "i": len(arrays) - 1}
    if isinstance(node, dict):
        return {"k": "d", "v": {k: _encode(v, arrays) for k, v in node.items()}}
    if isinstance(node, tuple):
        return {"k": "t", "v": [_encode(v, arrays) for v in node]}
    if isinstance(node, list):
        return {"k": "l", "v": [_encode(v, arrays) for v in node]}
    raise TypeError(f"cannot serialize engine-tree leaf of type {type(node)}")


def _decode(spec: Any, arrays: Dict[str, np.ndarray]) -> Any:
    k = spec["k"]
    if k == "v":
        return spec["v"]
    if k == "a":
        return arrays[f"arr_{spec['i']}"]
    if k == "d":
        return {key: _decode(v, arrays) for key, v in spec["v"].items()}
    if k == "t":
        return tuple(_decode(v, arrays) for v in spec["v"])
    if k == "l":
        return [_decode(v, arrays) for v in spec["v"]]
    raise ValueError(f"bad node kind {k!r}")


def save_artifact(path: str, artifact: Dict[str, Any]) -> str:
    """Write an engine artifact (dict with 'tree' + metadata) to ``path``
    (.npz appended if missing). Returns the path written."""
    arrays: List[np.ndarray] = []
    spec = _encode(artifact, arrays)
    payload = {"manifest": np.frombuffer(
        json.dumps(spec).encode("utf-8"), np.uint8)}
    dtypes = []
    for i, a in enumerate(arrays):
        a = np.ascontiguousarray(a)
        dtypes.append({"dtype": str(a.dtype), "shape": list(a.shape)})
        # raw bytes: survives dtypes numpy can't savez natively (bfloat16)
        payload[f"arr_{i}"] = a.reshape(-1).view(np.uint8)
    payload["arrmeta"] = np.frombuffer(
        json.dumps(dtypes).encode("utf-8"), np.uint8)
    if not path.endswith(".npz"):
        path += ".npz"
    with open(path, "wb") as f:
        np.savez(f, **payload)
    return path


def _np_dtype(name: str) -> np.dtype:
    try:
        return np.dtype(name)
    except TypeError:
        import ml_dtypes  # bfloat16 etc. (always present next to jax)

        return np.dtype(getattr(ml_dtypes, name))


def load_artifact(path: str) -> Dict[str, Any]:
    """Read an artifact written by :func:`save_artifact`.

    The embedded manifest is validated against the stored bytes: a
    truncated or tampered file raises a clear ``ValueError`` naming it
    instead of failing deep inside a numpy reshape."""
    if not path.endswith(".npz"):
        path += ".npz"
    try:
        with np.load(path) as z:
            spec = json.loads(bytes(z["manifest"]).decode("utf-8"))
            arrmeta = json.loads(bytes(z["arrmeta"]).decode("utf-8"))
            arrays = {}
            for i, m in enumerate(arrmeta):
                if f"arr_{i}" not in z:
                    raise ValueError(
                        f"manifest lists {len(arrmeta)} arrays but arr_{i} "
                        "is missing")
                raw = z[f"arr_{i}"]
                dtype = _np_dtype(m["dtype"])
                want = int(np.prod(m["shape"], dtype=np.int64)) * dtype.itemsize
                if raw.nbytes != want:
                    raise ValueError(
                        f"arr_{i} holds {raw.nbytes} bytes but the manifest "
                        f"says {m['dtype']}{tuple(m['shape'])} = {want} bytes")
                arrays[f"arr_{i}"] = raw.view(dtype).reshape(m["shape"])
            return _decode(spec, arrays)
    except ValueError as e:
        raise ValueError(f"corrupt engine artifact {path!r}: {e}") from e
    except (KeyError, json.JSONDecodeError) as e:
        raise ValueError(
            f"corrupt engine artifact {path!r}: {type(e).__name__}: {e}"
        ) from e
