"""On-device segmentation metrics — both reference variants, bit-compatible.

The reference computes metrics on the host every step (``outputs.detach()
.cpu()`` at /root/reference/Unet.py:274 — a device-sync anti-pattern). Here
the per-batch confusion counts (TP/FP/FN per class + correct/valid totals)
are computed inside the jitted step on the TPU; only tiny count vectors ever
reach the host.

Two metric variants exist in the reference and both are preserved exactly:

- v1 (``metrics_v1``): pixel-accuracy = correct/valid, plus mIoU over classes
  with union>0 (/root/reference/Unet.py:162-196, DeepLabV3.py:154-190).
- v2 (``metrics_v2``): {acc, miou, mpa, mf1}
  (/root/reference/Unet-ChannalAttention.py:215-269). Quirk preserved: its
  "OA" denominator is TP+FP+FN summed over classes, i.e. each wrong pixel is
  counted once as FP and once as FN, so OA = correct/(correct + 2*wrong) —
  NOT true pixel accuracy (SURVEY.md §2.2.20).

Averaging semantics: the reference averages *per-batch* metrics weighted by
batch size (mIoU of dataset != mean of batch mIoUs). ``merge_counts`` +
computing once at the end gives the corrected global-confusion mode; the
engine implements the reference's batch-mean mode for parity
(``Config.metrics_mode``).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


def confusion_counts(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    num_classes: int,
    ignore_index: int = 255,
) -> Dict[str, jnp.ndarray]:
    """Per-class TP/FP/FN + correct/valid totals, all on-device.

    Args:
      logits: (B, H, W, C) float (argmax is taken over the last axis), or an
        integer (B, H, W) prediction map.
      labels: (B, H, W) integer class ids.
    Returns dict of float32 arrays: tp/fp/fn (C,), correct/valid scalars.
    """
    if logits.ndim == labels.ndim + 1:
        preds = jnp.argmax(logits, axis=-1)
    else:
        preds = logits
    valid = labels != ignore_index

    # One-hot over classes; invalid pixels contribute to neither axis.
    cls = jnp.arange(num_classes)
    p = (preds[..., None] == cls) & valid[..., None]  # (B,H,W,C)
    t = (labels[..., None] == cls) & valid[..., None]
    reduce_axes = tuple(range(labels.ndim))
    tp = jnp.sum(p & t, axis=reduce_axes).astype(jnp.float32)
    fp = jnp.sum(p & ~t, axis=reduce_axes).astype(jnp.float32)
    fn = jnp.sum(~p & t, axis=reduce_axes).astype(jnp.float32)
    correct = jnp.sum((preds == labels) & valid).astype(jnp.float32)
    return {
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "correct": correct,
        "valid": jnp.sum(valid).astype(jnp.float32),
    }


def merge_counts(a: Dict[str, jnp.ndarray], b: Dict[str, jnp.ndarray]):
    """Accumulate confusion counts (global-confusion metric mode)."""
    return {k: a[k] + b[k] for k in a}


def _safe_div(n, d):
    return jnp.where(d > 0, n / jnp.where(d > 0, d, 1.0), 0.0)


def metrics_v1(counts: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """(pixel_acc, miou) semantics of /root/reference/Unet.py:162-196."""
    tp, fp, fn = counts["tp"], counts["fp"], counts["fn"]
    acc = _safe_div(counts["correct"], counts["valid"])
    union = tp + fp + fn
    iou = _safe_div(tp, union)
    present = (union > 0).astype(jnp.float32)
    miou = _safe_div(jnp.sum(iou * present), jnp.sum(present))
    return {"acc": acc, "miou": miou}


def metrics_v2(counts: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """{acc, miou, mpa, mf1} semantics of
    /root/reference/Unet-ChannalAttention.py:215-269 (OA quirk preserved)."""
    tp, fp, fn = counts["tp"], counts["fp"], counts["fn"]
    # OA quirk: denominator counts each misclassified pixel twice.
    acc = _safe_div(jnp.sum(tp), jnp.sum(tp) + jnp.sum(fp) + jnp.sum(fn))

    union = tp + fp + fn
    iou = _safe_div(tp, union)
    present = (union > 0).astype(jnp.float32)
    miou = _safe_div(jnp.sum(iou * present), jnp.sum(present))

    recall = _safe_div(tp, tp + fn)
    has_gt = (tp + fn > 0).astype(jnp.float32)
    mpa = _safe_div(jnp.sum(recall * has_gt), jnp.sum(has_gt))

    precision = _safe_div(tp, tp + fp)
    f1 = _safe_div(2.0 * precision * recall, precision + recall)
    mf1 = _safe_div(jnp.sum(f1 * has_gt), jnp.sum(has_gt))
    return {"acc": acc, "miou": miou, "mpa": mpa, "mf1": mf1}


def compute(counts, version: int = 2) -> Dict[str, jnp.ndarray]:
    return metrics_v1(counts) if version == 1 else metrics_v2(counts)
