"""Grasp peak detection.

The reference detects grasp candidates with skimage ``peak_local_max``
(min_distance=2, threshold_abs=0.4, num_peaks in {1, 5}) on the CPU per sample
(utils/grasp_eval.py:289-302).  Here:

  * ``peak_local_max_np`` — exact host-side equivalent (used for parity tests
    and host-side eval paths).
  * ``detect_grasp_peaks`` — batched jittable device version: 5x5 max-pool
    equality + threshold + border exclusion, then top-k by quality.  Returns
    fixed-shape arrays with a validity mask so the whole eval batch stays on
    the TPU.
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage

import jax
import jax.numpy as jnp


def peak_local_max_np(
    image: np.ndarray,
    min_distance: int = 2,
    threshold_abs: float = 0.4,
    num_peaks: int = 5,
) -> np.ndarray:
    """skimage.feature.peak_local_max equivalent (exclude_border=min_distance).

    Semantics of modern scikit-image (>= 0.19, what the reference's unpinned
    install resolves to): candidates are window maxima of the
    (2*min_distance+1)^2 maximum_filter (ties included; the filter's
    boundary mode is irrelevant because the window only exits the image for
    border pixels, which exclude_border removes), strictly above threshold,
    borders excluded, NO peaks at all if every pixel is a window maximum
    (skimage's trivial-image rule); sorted by intensity descending (stable,
    so row-major among equals); then ensure_spacing greedily drops any
    candidate at CHEBYSHEV distance STRICTLY LESS than min_distance from an
    already-accepted peak — skimage's _ensure_spacing keeps "the points at
    exactly spacing" (skimage/_shared/coord.py, `d < spacing` rejection).
    This only bites for equal-valued plateau peaks — unequal neighbors are
    already removed by the max filter.

    Returns [K, 2] (row, col) coordinates sorted by intensity descending.
    """
    image = np.asarray(image, np.float64)
    size = 2 * min_distance + 1
    max_filt = ndimage.maximum_filter(image, size=size, mode="constant", cval=0.0)
    is_max = image == max_filt
    if is_max.all():  # trivial image (constant): skimage returns no peaks
        return np.zeros((0, 2), np.int64)
    mask = is_max & (image > threshold_abs)
    # exclude borders
    if min_distance > 0:
        mask[:min_distance, :] = False
        mask[-min_distance:, :] = False
        mask[:, :min_distance] = False
        mask[:, -min_distance:] = False
    coords = np.column_stack(np.nonzero(mask))
    if coords.shape[0] == 0:
        return coords
    order = np.argsort(-image[coords[:, 0], coords[:, 1]], kind="stable")
    coords = coords[order]
    kept: list = []
    for rc in coords:
        # strict <: peaks at exactly min_distance apart are both kept
        if all(np.max(np.abs(rc - k)) >= min_distance for k in kept):
            kept.append(rc)
            if len(kept) >= num_peaks:
                break
    return np.asarray(kept).reshape(-1, 2)


def detect_grasps_np(qua, sin, cos, wid, num_grasps=5, max_width=100.0):
    """Host grasp detection (reference detect_grasps, utils/grasp_eval.py:289-302).

    Returns a list of [x, y, width, 20, angle_deg] grasp rects.
    """
    peaks = peak_local_max_np(qua, 2, 0.4, num_grasps)
    ang = np.arctan2(sin, cos) / 2.0
    grasps = []
    for r, c in peaks:
        grasps.append(
            [
                float(c),
                float(r),
                float(wid[r, c]) * max_width,
                20.0,
                float(ang[r, c] / np.pi * 180.0),
            ]
        )
    return grasps


def _max_pool_same(x, k: int):
    """[..., H, W] max pool with 'same' padding, window k x k, stride 1."""
    pads = [(0, 0)] * (x.ndim - 2) + [(k // 2, k // 2), (k // 2, k // 2)]
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1,) * (x.ndim - 2) + (k, k),
        window_strides=(1,) * x.ndim,
        padding=pads,
    )


def find_peaks(
    qua: jax.Array,
    num_peaks: int = 5,
    min_distance: int = 2,
    threshold_abs: float = 0.4,
    valid_hw=None,
):
    """Batched peak_local_max: [B, H, W] quality maps -> (pr, pc, valid),
    each [B, num_peaks], peaks in score-descending order.

    Peak criterion matches peak_local_max: local max of a (2d+1)^2 window
    (ties included, consistent with equality testing), strictly above
    threshold, borders excluded; then the skimage >= 0.19 ensure_spacing
    greedy walk.

    ``valid_hw`` [B, 2] int gives each sample's true (h, w) when the maps are
    zero-padded to a common max size (per-sample original resolutions,
    reference engine/crog_engine.py:233-244): border exclusion then applies
    at each sample's own edges, and the zero padding matches scipy's
    constant-0 filter boundary.

    The max-pool lowers to an XLA reduce-window on the VPU; peak selection
    is num_peaks argmax+suppression passes (NOT a top_k: XLA lowers top_k
    to a full sort on TPU — see the in-body comment).
    """
    b, h, w = qua.shape
    k = 2 * min_distance + 1
    qf = qua.astype(jnp.float32)
    # constant(0) padding semantics of scipy maximum_filter: clamp below at 0
    pooled = _max_pool_same(jnp.maximum(qf, 0.0), k)
    is_max = qf == pooled
    # skimage trivial-image rule: a constant map has no peaks at all
    nontrivial = ~is_max.reshape(b, -1).all(axis=1)
    is_peak = is_max & (qf > threshold_abs) & nontrivial[:, None, None]
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    if valid_hw is None:
        vh = jnp.full((b, 1, 1), h, jnp.int32)
        vw = jnp.full((b, 1, 1), w, jnp.int32)
    else:
        vh = valid_hw[:, 0].astype(jnp.int32)[:, None, None]
        vw = valid_hw[:, 1].astype(jnp.int32)[:, None, None]
    border = (
        (rows[None] >= min_distance)
        & (rows[None] < vh - min_distance)
        & (cols[None] >= min_distance)
        & (cols[None] < vw - min_distance)
    )
    is_peak = is_peak & border

    score = jnp.where(is_peak, qf, -jnp.inf)
    # ensure_spacing (skimage >= 0.19) — greedily walk candidates in score
    # order and drop any at Chebyshev distance STRICTLY below min_distance
    # from an already-accepted one (skimage keeps points at exactly spacing —
    # _ensure_spacing's `d < spacing` rejection) — implemented as num_peaks
    # rounds of global argmax + suppression of the open Chebyshev ball
    # (|dr| < d AND |dc| < d box) around the accepted peak.  Equivalent to
    # the greedy walk: a candidate conflicts with an accepted peak iff it
    # lies inside that peak's suppression box, so the next global argmax IS
    # the next surviving candidate.  jnp.argmax tie-breaks at the lowest
    # flat index = row-major among equals, matching the host version's
    # stable intensity sort.  This replaced a lax.top_k over the full
    # [B, H*W] map: XLA lowers top_k to a full variadic sort on TPU — 65 ms
    # for an 8x16-mask eval batch at 480x640, 66% of the whole post program
    # (profiled 2026-08-20); num_peaks max/argmax passes are ~2 ms.
    prs, pcs, vals = [], [], []
    for _ in range(num_peaks):
        flat = score.reshape(b, h * w)
        idx = jnp.argmax(flat, axis=1)
        v = jnp.take_along_axis(flat, idx[:, None], axis=1)[:, 0]
        pr_i = (idx // w).astype(jnp.int32)
        pc_i = (idx % w).astype(jnp.int32)
        prs.append(pr_i)
        pcs.append(pc_i)
        vals.append(jnp.isfinite(v))
        suppress = (
            jnp.abs(rows[None] - pr_i[:, None, None]) < min_distance
        ) & (jnp.abs(cols[None] - pc_i[:, None, None]) < min_distance)
        score = jnp.where(suppress, -jnp.inf, score)
    pr = jnp.stack(prs, axis=1)  # [B, num_peaks], score-descending
    pc = jnp.stack(pcs, axis=1)
    valid = jnp.stack(vals, axis=1)
    return pr, pc, valid


def grasp_rects_from_values(pr, pc, ang_at, wid_at, max_width: float = 100.0):
    """Assemble [B, K, 5] grasp rects (x, y, width_px, 20, angle_deg) from
    peak coordinates and the angle/width values AT those peaks (reference
    detect_grasps, utils/grasp_eval.py:294-301: fixed height 20, width x
    max_width, angle in degrees)."""
    b, k = pr.shape
    return jnp.stack(
        [
            pc.astype(jnp.float32),
            pr.astype(jnp.float32),
            wid_at.astype(jnp.float32) * max_width,
            jnp.full((b, k), 20.0, jnp.float32),
            ang_at.astype(jnp.float32) / jnp.pi * 180.0,
        ],
        axis=-1,
    )


def detect_grasp_peaks(
    qua: jax.Array,
    sin: jax.Array,
    cos: jax.Array,
    wid: jax.Array,
    num_peaks: int = 5,
    min_distance: int = 2,
    threshold_abs: float = 0.4,
    max_width: float = 100.0,
    valid_hw=None,
):
    """Batched device grasp detection over full-resolution maps.

    Args: [B, H, W] quality / sin2t / cos2t / width maps.
    Returns (rects, valid): rects [B, K, 5] of (x, y, width_px, 20, angle_deg)
    and valid [B, K] bool — find_peaks on the quality map, then angle/width
    read at the peak pixels.  One call handles the full eval batch — this
    replaces the reference's per-sample CPU loop.
    """
    b = qua.shape[0]
    pr, pc, valid = find_peaks(
        qua, num_peaks, min_distance, threshold_abs, valid_hw
    )
    ang = jnp.arctan2(sin, cos) / 2.0
    batch_idx = jnp.arange(b)[:, None]
    rects = grasp_rects_from_values(
        pr, pc, ang[batch_idx, pr, pc], wid[batch_idx, pr, pc], max_width
    )
    return rects, valid
