"""Segmentation metric helpers (reference utils/misc.py:115-167).

All jittable; the reference's `GPU` suffix variants become plain functions
that run wherever the arrays live.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def train_mask_metrics(output_logits, target, threshold=0.35, pr_iou=0.5):
    """Batch thresholded mask IoU (x100) and Pr@pr_iou (reference
    trainMetricGPU, utils/misc.py:115-131)."""
    prob = jax.nn.sigmoid(output_logits.astype(jnp.float32))
    b = prob.reshape(prob.shape[0], -1) >= threshold
    t = target.reshape(target.shape[0], -1) > 0.5
    inter = jnp.sum(b & t, axis=1)
    union = jnp.sum(b | t, axis=1)
    ious = inter / (union + 1e-6)
    return 100.0 * ious.mean(), 100.0 * (ious > pr_iou).mean()


def val_mask_metrics(output_logits, target, threshold=0.35):
    """Per-sample IoU and Pr@{50..90} hits (reference ValMetricGPU,
    utils/misc.py:134-150)."""
    prob = jax.nn.sigmoid(output_logits.astype(jnp.float32))
    b = prob.reshape(prob.shape[0], -1) >= threshold
    t = target.reshape(target.shape[0], -1) > 0.5
    inter = jnp.sum(b & t, axis=1)
    union = jnp.sum(b | t, axis=1)
    iou = inter / (union + 1e-6)
    thresholds = jnp.arange(0.5, 1.0, 0.1)
    prec = (iou[:, None] > thresholds[None, :]).astype(jnp.float32)
    return iou, prec


def intersection_and_union(output, target, num_classes: int, ignore_index=255):
    """Multi-class intersection/union/target histograms (reference
    intersectionAndUnionGPU, utils/misc.py:153-167)."""
    output = output.reshape(-1)
    target = target.reshape(-1)
    valid = target != ignore_index
    output = jnp.where(valid, output, num_classes)
    target = jnp.where(valid, target, num_classes)
    match = output == target
    area_inter = jnp.bincount(
        jnp.where(match, output, num_classes), length=num_classes + 1
    )[:num_classes]
    area_out = jnp.bincount(output, length=num_classes + 1)[:num_classes]
    area_tgt = jnp.bincount(target, length=num_classes + 1)[:num_classes]
    return area_inter, area_out + area_tgt - area_inter, area_tgt
