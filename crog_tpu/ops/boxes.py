"""Box/anchor utilities (reference utils/box_utils.py), jit-first.

The anchor-GT ``match`` is fully vectorized over padded GT boxes (the
reference looped per image in python, model/ssg.py:317-321) so it vmaps over
the batch inside the train step.
"""

from __future__ import annotations

from itertools import product
from math import sqrt

import numpy as np

import jax
import jax.numpy as jnp

VARIANCES = (0.1, 0.2)


def make_anchors(conv_h, conv_w, scale, aspect_ratios, img_size) -> np.ndarray:
    """Center-form priors [N, 4] (reference utils/box_utils.py:88-103);
    iteration order (rows, cols, ratios) matches the convout flattening."""
    priors = []
    for j, i in product(range(conv_h), range(conv_w)):
        x = (i + 0.5) / conv_w
        y = (j + 0.5) / conv_h
        for ar in aspect_ratios:
            ar = sqrt(ar)
            w = scale * ar / img_size
            h = scale / ar / img_size
            priors.append([x, y, w, h])
    return np.asarray(priors, np.float32)


def box_iou(box_a, box_b):
    """Pairwise IoU of point-form boxes: [A,4] x [B,4] -> [A,B]
    (reference utils/box_utils.py:8-37)."""
    max_xy = jnp.minimum(box_a[:, None, 2:], box_b[None, :, 2:])
    min_xy = jnp.maximum(box_a[:, None, :2], box_b[None, :, :2])
    inter = jnp.clip(max_xy - min_xy, 0.0)
    inter_area = inter[..., 0] * inter[..., 1]
    area_a = (box_a[:, 2] - box_a[:, 0]) * (box_a[:, 3] - box_a[:, 1])
    area_b = (box_b[:, 2] - box_b[:, 0]) * (box_b[:, 3] - box_b[:, 1])
    return inter_area / (area_a[:, None] + area_b[None, :] - inter_area)


def encode(matched, priors):
    """Point-form GT -> (cx, cy, w, h) offsets with variances [0.1, 0.2]
    (reference utils/box_utils.py:106-117)."""
    g_cxcy = (matched[:, :2] + matched[:, 2:]) / 2 - priors[:, :2]
    g_cxcy = g_cxcy / (VARIANCES[0] * priors[:, 2:])
    g_wh = (matched[:, 2:] - matched[:, :2]) / priors[:, 2:]
    g_wh = jnp.log(jnp.maximum(g_wh, 1e-12)) / VARIANCES[1]
    return jnp.concatenate([g_cxcy, g_wh], axis=1)


def decode(box_pred, anchors):
    """Offsets -> point-form boxes, clipped to [0,1] (reference
    utils/grasp_eval.py:133-137)."""
    cxcy = anchors[:, :2] + box_pred[:, :2] * VARIANCES[0] * anchors[:, 2:]
    wh = anchors[:, 2:] * jnp.exp(box_pred[:, 2:] * VARIANCES[1])
    boxes = jnp.concatenate([cxcy - wh / 2, cxcy + wh / 2], axis=1)
    return jnp.clip(boxes, 0.0, 1.0)


def match(
    box_gt,
    gt_valid,
    class_gt,
    anchors_cf,
    pos_iou_thre: float = 0.5,
    neg_iou_thre: float = 0.4,
):
    """Anchor-GT assignment (reference utils/box_utils.py:57-85), vectorized
    over a padded GT set.

    Args:
      box_gt: [M, 4] point-form GT boxes (padded rows arbitrary).
      gt_valid: [M] bool validity of each GT row.
      class_gt: [M] int labels.
      anchors_cf: [N, 4] center-form priors.
    Returns (offsets [N,4], conf [N] int32, anchor_max_gt [N,4],
    anchor_max_i [N] int32).  conf: 0 = background, -1 = neutral, >0 = class.
    """
    decoded = jnp.concatenate(
        [anchors_cf[:, :2] - anchors_cf[:, 2:] / 2,
         anchors_cf[:, :2] + anchors_cf[:, 2:] / 2],
        axis=1,
    )
    overlaps = box_iou(box_gt, decoded)  # [M, N]
    overlaps = jnp.where(gt_valid[:, None], overlaps, -1.0)

    gt_max_i = jnp.argmax(overlaps, axis=1)  # best anchor per GT
    each_anchor_max = jnp.max(overlaps, axis=0)
    anchor_max_i = jnp.argmax(overlaps, axis=0)

    # Force-match the best anchor of each valid GT (IoU := 2): guarantees
    # every GT owns at least one positive anchor.
    n = anchors_cf.shape[0]
    m = box_gt.shape[0]
    scatter_i = jnp.where(gt_valid, gt_max_i, n)  # invalid -> dropped
    each_anchor_max = each_anchor_max.at[scatter_i].set(
        2.0, mode="drop"
    )
    anchor_max_i = anchor_max_i.at[scatter_i].set(
        jnp.arange(m), mode="drop"
    )

    anchor_max_gt = box_gt[anchor_max_i]
    conf = class_gt[anchor_max_i].astype(jnp.int32)
    conf = jnp.where(each_anchor_max < pos_iou_thre, -1, conf)
    conf = jnp.where(each_anchor_max < neg_iou_thre, 0, conf)
    offsets = encode(anchor_max_gt, anchors_cf)
    return offsets, conf, anchor_max_gt, anchor_max_i


def box_inside_mask(boxes, h: int, w: int, padding: int = 1):
    """[N, 4] relative boxes -> boolean [H, W, N] inside-box mask (the
    membership test of reference utils/box_utils.py:150-199)."""

    def sanitize(a, b, size):
        a = a * size
        b = b * size
        lo = jnp.minimum(a, b)
        hi = jnp.maximum(a, b)
        return jnp.clip(lo - padding, 0), jnp.clip(hi + padding, None, size)

    n = boxes.shape[0]
    x1, x2 = sanitize(boxes[:, 0], boxes[:, 2], w)
    y1, y2 = sanitize(boxes[:, 1], boxes[:, 3], h)
    rows = jax.lax.broadcasted_iota(jnp.float32, (h, w, n), 1)
    cols = jax.lax.broadcasted_iota(jnp.float32, (h, w, n), 0)
    return (
        (rows >= x1[None, None])
        & (rows < x2[None, None])
        & (cols >= y1[None, None])
        & (cols < y2[None, None])
    )


def crop_masks(masks, boxes, padding: int = 1, outside_value: float = 0.0):
    """Zero (or fill) everything outside each box (reference
    utils/box_utils.py:150-199).  masks: [H, W, N]; boxes: [N, 4] relative."""
    h, w, n = masks.shape
    inside = box_inside_mask(boxes, h, w, padding)
    return jnp.where(inside, masks, outside_value)


def mask_iou(mask1, mask2):
    """[A, P] x [B, P] binary masks -> [A, B] IoU (reference
    utils/box_utils.py:221-231)."""
    inter = mask1 @ mask2.T
    area1 = jnp.sum(mask1, axis=1)[:, None]
    area2 = jnp.sum(mask2, axis=1)[None, :]
    return inter / (area1 + area2 - inter)
