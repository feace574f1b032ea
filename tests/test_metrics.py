"""Metrics: bit-parity with both reference variants (numpy goldens)."""

import numpy as np
import jax.numpy as jnp

from insarseg.train import metrics as M
from insarseg.train.losses import cross_entropy_loss

import torch
import torch.nn.functional as F


def _golden_v1(preds, masks, num_classes):
    """Reimplementation of /root/reference/Unet.py:162-196 semantics."""
    valid = masks != 255
    correct = ((preds == masks) & valid).sum()
    total = valid.sum()
    acc = correct / total if total > 0 else 0.0
    pf, mf = preds[valid], masks[valid]
    ious = []
    for c in range(num_classes):
        inter = ((pf == c) & (mf == c)).sum()
        union = ((pf == c) | (mf == c)).sum()
        if union > 0:
            ious.append(inter / union)
    miou = sum(ious) / len(ious) if ious else 0.0
    return acc, miou


def _golden_v2(preds, masks, num_classes):
    """Reimplementation of /root/reference/Unet-ChannalAttention.py:215-269."""
    valid = masks != 255
    pf, mf = preds[valid], masks[valid]
    TP = np.zeros(num_classes)
    FP = np.zeros(num_classes)
    FN = np.zeros(num_classes)
    for c in range(num_classes):
        TP[c] = ((mf == c) & (pf == c)).sum()
        FP[c] = ((mf != c) & (pf == c)).sum()
        FN[c] = ((mf == c) & (pf != c)).sum()
    total = TP.sum() + FP.sum() + FN.sum()
    acc = TP.sum() / total if total > 0 else 0.0
    union = TP + FP + FN
    iou = np.divide(TP, union, out=np.zeros_like(TP), where=union != 0)
    miou = iou[union > 0].mean() if (union > 0).any() else 0.0
    rec = np.divide(TP, TP + FN, out=np.zeros_like(TP), where=(TP + FN) != 0)
    mpa = rec[(TP + FN) > 0].mean() if ((TP + FN) > 0).any() else 0.0
    prec = np.divide(TP, TP + FP, out=np.zeros_like(TP), where=(TP + FP) != 0)
    f1 = np.divide(2 * prec * rec, prec + rec, out=np.zeros_like(TP),
                   where=(prec + rec) != 0)
    mf1 = f1[(TP + FN) > 0].mean() if ((TP + FN) > 0).any() else 0.0
    return dict(acc=acc, miou=miou, mpa=mpa, mf1=mf1)


def _random_case(seed, num_classes=2, with_ignore=True):
    rng = np.random.default_rng(seed)
    preds = rng.integers(0, num_classes, (3, 8, 8))
    masks = rng.integers(0, num_classes, (3, 8, 8))
    if with_ignore:
        masks[rng.random(masks.shape) < 0.2] = 255
    return preds, masks


def test_metrics_v1_parity():
    for seed in range(5):
        preds, masks = _random_case(seed)
        counts = M.confusion_counts(jnp.asarray(preds), jnp.asarray(masks), 2)
        got = M.metrics_v1(counts)
        acc, miou = _golden_v1(preds, masks, 2)
        np.testing.assert_allclose(float(got["acc"]), acc, atol=1e-6)
        np.testing.assert_allclose(float(got["miou"]), miou, atol=1e-6)


def test_metrics_v2_parity():
    for seed in range(5):
        preds, masks = _random_case(seed + 10, num_classes=3)
        counts = M.confusion_counts(jnp.asarray(preds), jnp.asarray(masks), 3)
        got = M.metrics_v2(counts)
        want = _golden_v2(preds, masks, 3)
        for k in want:
            np.testing.assert_allclose(float(got[k]), want[k], atol=1e-6, err_msg=k)


def test_v2_oa_quirk_denominator():
    # 3 correct, 1 wrong of 4 pixels: true acc=0.75, quirk OA = 3/(3+2*1)=0.6
    preds = np.array([[[0, 0, 0, 1]]])
    masks = np.array([[[0, 0, 0, 0]]])
    counts = M.confusion_counts(jnp.asarray(preds), jnp.asarray(masks), 2)
    v1 = M.metrics_v1(counts)
    v2 = M.metrics_v2(counts)
    assert abs(float(v1["acc"]) - 0.75) < 1e-6
    assert abs(float(v2["acc"]) - 0.6) < 1e-6


def test_counts_from_logits_and_merge():
    rng = np.random.default_rng(3)
    logits = rng.standard_normal((2, 4, 4, 2)).astype(np.float32)
    masks = rng.integers(0, 2, (2, 4, 4))
    c1 = M.confusion_counts(jnp.asarray(logits), jnp.asarray(masks), 2)
    preds = logits.argmax(-1)
    c2 = M.confusion_counts(jnp.asarray(preds), jnp.asarray(masks), 2)
    for k in c1:
        np.testing.assert_array_equal(np.asarray(c1[k]), np.asarray(c2[k]))
    merged = M.merge_counts(c1, c2)
    np.testing.assert_allclose(np.asarray(merged["tp"]), 2 * np.asarray(c1["tp"]))


def test_cross_entropy_matches_torch():
    rng = np.random.default_rng(4)
    logits = rng.standard_normal((2, 6, 6, 3)).astype(np.float32)
    masks = rng.integers(0, 3, (2, 6, 6))
    masks[0, :2] = 255  # exercise ignore_index
    got = cross_entropy_loss(jnp.asarray(logits), jnp.asarray(masks), 255)
    lt = torch.from_numpy(np.transpose(logits, (0, 3, 1, 2)))
    want = F.cross_entropy(lt, torch.from_numpy(masks).long(), ignore_index=255)
    np.testing.assert_allclose(float(got), float(want), atol=1e-5)
