"""Training-history JSON contract.

Preserves the reference's persistence format (/root/reference/Unet.py:375-389
with the tensor->float sanitization of Unet-ChannalAttention.py:477-478): a
JSON list of per-epoch dicts keyed ``epoch``, ``train_loss``, ``train_acc``,
``train_miou`` (+ ``train_mpa``/``train_mf1`` under metrics v2) and the
``val_*`` twins — so plotting scripts written against the reference work
unchanged.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List

import numpy as np


def _to_py(v: Any) -> Any:
    if isinstance(v, (np.generic,)):
        return v.item()
    if hasattr(v, "item") and getattr(v, "ndim", None) == 0:  # jax/np scalars
        return float(v.item()) if not isinstance(v.item(), int) else v.item()
    return v


def sanitize_history(history: List[Dict[str, Any]]) -> List[Dict[str, Any]]:
    return [{k: _to_py(v) for k, v in epoch.items()} for epoch in history]


def save_history(history: List[Dict[str, Any]], path: str) -> None:
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    with open(path, "w") as f:
        json.dump(sanitize_history(history), f, indent=4)


def load_history(path: str) -> List[Dict[str, Any]]:
    with open(path) as f:
        return json.load(f)
