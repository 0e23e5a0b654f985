"""Raw uint8 wire format: grasp-map rasterization, gaussian blur and the
letterbox warp all happen ON DEVICE inside the jitted step.

The reference runs the whole target pipeline per sample on host CPU
(utils/dataset.py:643-682 rasterization + gaussian, :856-890 letterbox
warpAffine); the round-2 "compact" format already moved the /255 + CLIP
normalization + sin/cos on device but still paid host raster + blur + warp
(~70% of the measured per-sample host cost on this 1-core box).  Here the
host ships only:

  * ``raw_img_u8``  [H0, W0, 3] — the UNWARPED camera image
  * ``raw_mask_bits`` [H0, ceil(W0/8)] uint8 — the unwarped 0/255 instance
    mask packed to bits (np.packbits, MSB-first): the mask is 1-bit
    information, and shipping it packed cuts the raw wire ~24% (it was a
    full uint8 plane = 1/4 of the batch bytes; on a 1-core host the
    host->device serialization of those bytes is on the e2e critical path)
  * ``rect_corners`` [R, 4, 2] int32 — per-grasp integer corner points,
    exactly the ``box_points(...).astype(int64)`` the host rasterizer uses
    (reference utils/dataset.py:652-654)
  * ``rect_vals`` [R, 3] float32 — (ang_value_deg, wid_value, valid) per
    rect, the scalars the reference writes into the ang/wid canvases
    (utils/dataset.py:665-671)

and ``unpack_raw`` reproduces the pipeline on device:

  1. rasterize pos/ang/wid canvases with the EXACT even-odd polygon test the
     host uses (integer PNPOLY — the divide-free cross-multiplied form is
     bit-identical to skimage.draw.polygon / native polygon_fill on integer
     corners), sequential-overwrite semantics across rects preserved;
  2. gaussian blur (sigma 3, truncate 4, replicate edges) FOLDED INTO the
     letterbox warp: both are linear maps along each axis, so qua/wid use a
     single per-axis matrix W_warp @ B_blur and the blur is free;
  3. letterbox warp as two small matmuls per plane (cubic for the image,
     linear for mask/targets) with constant-0 border; the image is
     CLIP-normalized FIRST via the 256-entry LUT, which makes the zero
     border exactly equivalent to cv2's CLIP-mean constant border
     ((warp(img) + mean*(1-cov) - mean)/std == warp((img-mean)/std));
  4. degrees -> radians -> sin/cos(2*theta) post-warp, like the host path.

Deliberate epsilon vs the legacy host path (NOT the `exact` variants, which
stay host-side and bit-pinned): the legacy path quantizes to uint8 after the
blur and again after the warp, and cv2's fixed-point interpolation quantizes
tap weights; the device path computes the same chain in fp32 without the
intermediate quantization.  Bounded by ~2/255 per target value (tested).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from crog_tpu.data.compact import _TAB
from crog_tpu.ops.affine import letterbox_transform
from crog_tpu.ops.filters import _gaussian_kernel1d
from crog_tpu.ops.rects import box_points
from crog_tpu.ops.resize import affine_axis_matrix

RAW_KEYS = (
    "raw_img_u8", "lb_img_u8", "raw_mask_bits", "rect_corners", "rect_vals",
)


def is_raw(batch: Dict) -> bool:
    return "raw_img_u8" in batch or "lb_img_u8" in batch


def pack_mask_bits(mask_u8: np.ndarray) -> np.ndarray:
    """[H, W] 0/255 uint8 instance mask -> [H, ceil(W/8)] uint8 bit plane.

    MSB-first (np.packbits default); ``unpack_mask_bits`` reverses it on
    device.  BINARY masks only: the legacy path carries mask/255 for any
    uint8 value, so a non-binary mask (e.g. value 1..254) has no 1-bit
    representation — fail loudly instead of silently thresholding it.
    """
    m = np.asarray(mask_u8)
    if m.dtype != np.bool_:
        bad = m[(m != 0) & (m != 255)]
        if bad.size:
            raise ValueError(
                "pack_mask_bits requires a binary 0/255 mask; got values "
                f"{np.unique(bad)[:8]} — use the legacy/compact wire format "
                "for non-binary masks"
            )
    return np.packbits(m > 0, axis=-1)


def unpack_mask_bits(bits, w0: int):
    """Jittable inverse of pack_mask_bits: [..., H, ceil(W/8)] uint8 ->
    [..., H, w0] float32 0/1 (MSB-first)."""
    bits = bits.astype(jnp.int32)
    shifts = jnp.arange(7, -1, -1, dtype=jnp.int32)
    mask = ((bits[..., None] >> shifts) & 1).astype(jnp.float32)
    return mask.reshape(*mask.shape[:-3], mask.shape[-3], -1)[..., :w0]


# ------------------------------------------------------------------- host side
def pack_raster_params(
    grasps: np.ndarray, max_rects: int = 16, width_factor: float = 100.0
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-rect integer corners + canvas values, padded to ``max_rects``.

    Mirrors the per-rect host prep of GraspTransforms.generate_masks
    (grasp_transforms.py:62-72 / reference utils/dataset.py:643-671): corners
    from box_points at HALF width with the -(theta+180) cv2 angle, truncated
    to integers; ang value int(theta+180)/int(theta); wid value
    clip(w, 0, width_factor)/width_factor.
    """
    grasps = np.asarray(grasps, np.float64).reshape(-1, grasps.shape[-1])
    m = grasps.shape[0]
    if m > max_rects:
        # later rects win overwrites, so keep the LAST max_rects in order
        grasps = grasps[m - max_rects:]
        m = max_rects
    corners = np.zeros((max_rects, 4, 2), np.int32)
    vals = np.zeros((max_rects, 3), np.float32)
    for i, rect in enumerate(grasps):
        cx, cy, w_rect, h_rect, theta = rect[:5]
        box = box_points(
            ((cx, cy), (w_rect / 2.0, h_rect), -(theta + 180.0))
        ).astype(np.int64)
        corners[i] = box
        vals[i, 0] = float(int(theta + 180) if theta < 0 else int(theta))
        vals[i, 1] = np.clip(w_rect, 0.0, width_factor) / width_factor
        vals[i, 2] = 1.0
    return corners, vals


# --------------------------------------------------------------- warp matrices
@lru_cache(maxsize=None)
def _blur_matrix(n: int, sigma: float) -> np.ndarray:
    """[n, n] separable-gaussian band matrix with replicate ('nearest')
    edges — the exact kernel of gaussian_blur_np (truncate 4.0)."""
    k = _gaussian_kernel1d(sigma).astype(np.float64)
    r = (len(k) - 1) // 2
    b = np.zeros((n, n), np.float64)
    idx = np.arange(n)
    for off in range(-r, r + 1):
        j = np.clip(idx + off, 0, n - 1)
        np.add.at(b, (idx, j), k[off + r])
    return b


@lru_cache(maxsize=None)
def _letterbox_axis_matrices(ori_hw, input_size: int, sigma: float = 3.0):
    """Per-axis warp matrices for the constant-size letterbox: cubic (image),
    linear (mask/ang) and linear-after-blur (qua/wid)."""
    mat, mat_inv = letterbox_transform(ori_hw, (input_size, input_size))
    # dst pixel samples src = scale*dst + offset, read off the (axis-aligned)
    # inverse matrix; identical construction to make_eval_step's fwd factors
    sy, oy = float(mat_inv[1, 1]), float(mat_inv[1, 2])
    sx, ox = float(mat_inv[0, 0]), float(mat_inv[0, 2])
    h0, w0 = ori_hw
    w_row_cub = affine_axis_matrix(h0, input_size, sy, oy, "cubic")
    w_col_cub = affine_axis_matrix(w0, input_size, sx, ox, "cubic")
    w_row_lin = affine_axis_matrix(h0, input_size, sy, oy, "linear")
    w_col_lin = affine_axis_matrix(w0, input_size, sx, ox, "linear")
    w_row_blur = (
        w_row_lin.astype(np.float64) @ _blur_matrix(h0, sigma)
    ).astype(np.float32)
    w_col_blur = (
        w_col_lin.astype(np.float64) @ _blur_matrix(w0, sigma)
    ).astype(np.float32)
    return {
        "cub": (w_row_cub, w_col_cub),
        "lin": (w_row_lin, w_col_lin),
        "blur": (w_row_blur, w_col_blur),
    }


# ------------------------------------------------------------------ device side
def _rasterize(corners, vals, h0: int, w0: int):
    """[B, R, 4, 2] int corners -> pos/ang/wid canvases [B, H0, W0] f32.

    Bit-identical inside test to the host PNPOLY (rects.polygon_indices /
    native polygon_fill): even-odd rule with the division cross-multiplied
    into exact int32 arithmetic.  Canvas write order [cc, rr] (x is the
    first polygon axis) matches reference utils/dataset.py:652-668, and the
    fori_loop preserves the sequential later-rect-overwrites semantics.
    """
    b, r_max = corners.shape[0], corners.shape[1]
    ys = jax.lax.broadcasted_iota(jnp.int32, (h0, w0), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h0, w0), 1)

    def draw(m, carry):
        pos, ang, wid = carry
        vx = corners[:, m, :, 0]  # [B, 4] polygon first axis (pr = x)
        vy = corners[:, m, :, 1]  # [B, 4] (pc = y)
        inside = jnp.zeros((b, h0, w0), bool)
        for i in range(4):
            j = (i - 1) % 4
            vxi = vx[:, i, None, None]
            vxj = vx[:, j, None, None]
            vyi = vy[:, i, None, None]
            vyj = vy[:, j, None, None]
            cond = (vxi > xs[None]) != (vxj > xs[None])
            # pc < (vyj - vyi) * (pr - vxi) / (vxj - vxi) + vyi, exact in
            # int32: (pc - vyi) * d < (vyj - vyi) * (pr - vxi), sign-flipped
            # when d < 0  (|products| <= ~640*1280, well inside int32)
            d = vxj - vxi
            lhs = (ys[None] - vyi) * d
            rhs = (vyj - vyi) * (xs[None] - vxi)
            crossed = cond & jnp.where(d > 0, lhs < rhs, lhs > rhs)
            inside = inside ^ crossed
        valid = vals[:, m, 2] > 0
        inside = inside & valid[:, None, None]
        pos = jnp.where(inside, 1.0, pos)
        ang = jnp.where(inside, vals[:, m, 0, None, None], ang)
        wid = jnp.where(inside, vals[:, m, 1, None, None], wid)
        return pos, ang, wid

    zeros = jnp.zeros((b, h0, w0), jnp.float32)
    return jax.lax.fori_loop(
        0, r_max, lambda m, c: draw(m, c), (zeros, zeros, zeros),
        unroll=False,
    )


def _warp(x, wrow, wcol, precision):
    """[B, H0, W0] (or [..., C]) -> [B, S, S] via the separable matrices."""
    y = jnp.einsum("oh,bhw...->bow...", jnp.asarray(wrow), x,
                   precision=precision)
    return jnp.einsum("pw,bow...->bop...", jnp.asarray(wcol), y,
                      precision=precision)


def unpack_raw(batch: Dict, input_size: int) -> Dict:
    """Jittable: raw wire batch -> the dense float batch the model sees
    (same keys as the legacy host pipeline: img/mask/qua/sin/cos/wid...).

    Two image variants share the mask/target path:

    * ``raw_img_u8`` [B, H0, W0, 3] — unwarped camera image; the cubic
      letterbox warp runs here on device (epsilon vs the legacy uint8 warp:
      fp32, no intermediate quantization — module docstring).
    * ``lb_img_u8`` [B, S, S, 3] — the host ALREADY letterboxed the uint8
      image with the cv2-parity kernel (OCIDVLGDataset.preprocess,
      reference utils/dataset.py:858-890), so the image numerics are
      BIT-EXACT legacy and only the 256-entry LUT normalize runs here.
      0.56 MB/sample on the wire vs raw's 0.96 — on a tunneled device
      whose streaming bandwidth bounds e2e, this is the lever (the
      original frame is recovered from the mask bit-plane shape, so the
      source width must be a multiple of 8 — OCID is 480x640).
    """
    hi = jax.lax.Precision.HIGHEST
    if "lb_img_u8" in batch:
        img8 = batch["lb_img_u8"]
        bits = batch["raw_mask_bits"]
        h0, w0 = bits.shape[-2], bits.shape[-1] * 8
    else:
        img8 = batch["raw_img_u8"]
        h0, w0 = img8.shape[1:3]
    mats = _letterbox_axis_matrices((h0, w0), input_size)

    # image: LUT-normalize (bit-exact CLIP normalize); for the unwarped
    # variant follow with the cubic warp whose zero border == cv2 CLIP-mean
    # constant border (module docstring)
    idx = img8.astype(jnp.int32)
    img = jnp.stack(
        [jnp.asarray(_TAB["img"][c])[idx[..., c]] for c in range(3)], axis=-1
    )
    img_w = img if "lb_img_u8" in batch else _warp(img, *mats["cub"], hi)

    # mask arrives bit-packed (pack_mask_bits, MSB-first): unpack to 0/1 f32
    mask = unpack_mask_bits(batch["raw_mask_bits"], w0)
    mask_w = _warp(mask, *mats["lin"], hi)

    out = {k: v for k, v in batch.items() if k not in RAW_KEYS}
    out["img"] = img_w
    out["mask"] = mask_w

    if "rect_corners" in batch:
        pos, ang, wid = _rasterize(
            batch["rect_corners"].astype(jnp.int32),
            batch["rect_vals"].astype(jnp.float32), h0, w0,
        )
        out["qua"] = _warp(pos, *mats["blur"], hi)
        out["wid"] = _warp(wid, *mats["blur"], hi)
        ang_w = _warp(ang, *mats["lin"], hi)
        ang_rad = ang_w * (jnp.pi / 180.0)
        out["ang"] = ang_rad
        out["sin"] = jnp.sin(2.0 * ang_rad)
        out["cos"] = jnp.cos(2.0 * ang_rad)
    return out
