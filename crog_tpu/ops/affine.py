"""Affine warps.

Host-side numpy replacements for the OpenCV calls in the reference input
pipeline (cv2.getAffineTransform / cv2.warpAffine at utils/dataset.py:825-890),
plus a jittable batched device warp used by the eval stack so the per-sample
CPU inverse-warp loop of the reference (engine/crog_engine.py:127-131,233-244)
becomes one fused TPU op.

Interpolation numerics: bicubic uses the Catmull-Rom-like kernel with
A = -0.75 (the OpenCV INTER_CUBIC constant, also torch's bicubic), bilinear is
standard.  Out-of-range samples take a constant border value.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

_CUBIC_A = -0.75


def get_affine_transform(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """2x3 affine mapping the 3 ``src`` points onto ``dst`` (cv2.getAffineTransform)."""
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    a = np.zeros((6, 6), np.float64)
    b = np.zeros(6, np.float64)
    for i in range(3):
        a[i, 0:2] = src[i]
        a[i, 2] = 1.0
        a[i + 3, 3:5] = src[i]
        a[i + 3, 5] = 1.0
        b[i] = dst[i, 0]
        b[i + 3] = dst[i, 1]
    x = np.linalg.solve(a, b)
    return x.reshape(2, 3)


def letterbox_transform(ori_size, input_size):
    """Letterbox (aspect-preserving pad-to-square) affine + its inverse.

    Matches ``OCIDVLGDataset.get_transform_mat`` (reference
    utils/dataset.py:825-840): scale to fit, center with symmetric bias.
    Returns (mat, mat_inv), each 2x3 float64.
    """
    ori_h, ori_w = ori_size
    inp_h, inp_w = input_size
    scale = min(inp_h / ori_h, inp_w / ori_w)
    new_h, new_w = ori_h * scale, ori_w * scale
    bias_x, bias_y = (inp_w - new_w) / 2.0, (inp_h - new_h) / 2.0
    src = np.array([[0, 0], [ori_w, 0], [0, ori_h]], np.float32)
    dst = np.array(
        [[bias_x, bias_y], [new_w + bias_x, bias_y], [bias_x, new_h + bias_y]],
        np.float32,
    )
    mat = get_affine_transform(src, dst)
    mat_inv = get_affine_transform(dst, src)
    return mat, mat_inv


def invert_affine(mat: np.ndarray) -> np.ndarray:
    m = np.asarray(mat, np.float64)
    a = m[:, :2]
    t = m[:, 2]
    a_inv = np.linalg.inv(a)
    t_inv = -a_inv @ t
    return np.concatenate([a_inv, t_inv[:, None]], axis=1)


def _cubic_weights(t, xp):
    """4-tap cubic convolution weights for fractional offset t in [0,1)."""
    A = _CUBIC_A
    # distances of the 4 taps (-1, 0, 1, 2) from the sample point
    d0 = 1.0 + t
    d1 = t
    d2 = 1.0 - t
    d3 = 2.0 - t

    def k1(x):  # |x| <= 1
        return ((A + 2.0) * x - (A + 3.0)) * x * x + 1.0

    def k2(x):  # 1 < |x| < 2
        return ((A * x - 5.0 * A) * x + 8.0 * A) * x - 4.0 * A

    return xp.stack([k2(d0), k1(d1), k1(d2), k2(d3)], axis=-1)


def warp_affine_np(
    img: np.ndarray,
    mat: np.ndarray,
    out_size,
    interpolation: str = "linear",
    border_value=0.0,
) -> np.ndarray:
    """Host warpAffine: ``dst(x,y) = src(M^-1 @ (x,y,1))``.

    ``out_size`` is (width, height) to match the cv2 call convention used by
    the reference.  ``img`` is HW or HWC.  Border handling is constant.
    Dispatches to the native C++ kernel when built (bit-identical); the numpy
    path below is the fallback and the reference for tests.
    """
    if img.dtype in (np.uint8, np.float32):
        from crog_tpu import native

        out = native.warp_affine(img, mat, out_size, interpolation, border_value)
        if out is not None:
            return out
    out_w, out_h = out_size
    inv = invert_affine(mat)
    xs = np.arange(out_w, dtype=np.float64)
    ys = np.arange(out_h, dtype=np.float64)
    gx, gy = np.meshgrid(xs, ys)
    sx = inv[0, 0] * gx + inv[0, 1] * gy + inv[0, 2]
    sy = inv[1, 0] * gx + inv[1, 1] * gy + inv[1, 2]

    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, c = img.shape
    border = np.broadcast_to(np.asarray(border_value, np.float64), (c,))

    if interpolation == "nearest":
        ix = np.round(sx).astype(np.int64)
        iy = np.round(sy).astype(np.int64)
        inside = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        out = np.where(
            inside[..., None],
            img[np.clip(iy, 0, h - 1), np.clip(ix, 0, w - 1)].astype(np.float64),
            border,
        )
    elif interpolation == "linear":
        x0 = np.floor(sx).astype(np.int64)
        y0 = np.floor(sy).astype(np.int64)
        fx = sx - x0
        fy = sy - y0
        out = np.zeros((out_h, out_w, c), np.float64)
        for dy in (0, 1):
            wy = np.where(dy == 0, 1.0 - fy, fy)
            for dx in (0, 1):
                wx = np.where(dx == 0, 1.0 - fx, fx)
                xi = x0 + dx
                yi = y0 + dy
                inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
                v = np.where(
                    inside[..., None],
                    img[np.clip(yi, 0, h - 1), np.clip(xi, 0, w - 1)].astype(
                        np.float64
                    ),
                    border,
                )
                out += (wy * wx)[..., None] * v
    elif interpolation == "cubic":
        x0 = np.floor(sx).astype(np.int64)
        y0 = np.floor(sy).astype(np.int64)
        fx = sx - x0
        fy = sy - y0
        wxs = _cubic_weights(fx, np)  # (H, W, 4)
        wys = _cubic_weights(fy, np)
        out = np.zeros((out_h, out_w, c), np.float64)
        for j in range(4):
            yi = y0 + (j - 1)
            for i in range(4):
                xi = x0 + (i - 1)
                inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
                v = np.where(
                    inside[..., None],
                    img[np.clip(yi, 0, h - 1), np.clip(xi, 0, w - 1)].astype(
                        np.float64
                    ),
                    border,
                )
                out += (wys[..., j] * wxs[..., i])[..., None] * v
    else:
        raise ValueError(f"unknown interpolation {interpolation}")

    if img.dtype == np.uint8:
        out = np.clip(np.round(out), 0, 255).astype(np.uint8)
    else:
        out = out.astype(img.dtype)
    return out[..., 0] if squeeze else out


def warp_affine_jax(
    img: jax.Array,
    inv_mat: jax.Array,
    out_h: int,
    out_w: int,
    interpolation: str = "linear",
    border_value: float = 0.0,
) -> jax.Array:
    """Jittable single-image warp: ``img`` [H, W], ``inv_mat`` [2, 3] maps
    output pixel -> source pixel.  vmap over leading axes for batches.

    This is the device-side replacement of the reference's eval-time
    cv2.warpAffine inverse warps; gathers vectorize on the VPU and the whole
    eval batch is warped in one XLA computation.
    """
    h, w = img.shape
    gx = jnp.arange(out_w, dtype=jnp.float32)[None, :]
    gy = jnp.arange(out_h, dtype=jnp.float32)[:, None]
    sx = inv_mat[0, 0] * gx + inv_mat[0, 1] * gy + inv_mat[0, 2]
    sy = inv_mat[1, 0] * gx + inv_mat[1, 1] * gy + inv_mat[1, 2]

    def tap(xi, yi):
        inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        v = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(inside, v, border_value)

    if interpolation == "linear":
        x0 = jnp.floor(sx).astype(jnp.int32)
        y0 = jnp.floor(sy).astype(jnp.int32)
        fx = sx - x0
        fy = sy - y0
        out = (
            (1 - fy) * (1 - fx) * tap(x0, y0)
            + (1 - fy) * fx * tap(x0 + 1, y0)
            + fy * (1 - fx) * tap(x0, y0 + 1)
            + fy * fx * tap(x0 + 1, y0 + 1)
        )
    elif interpolation == "cubic":
        x0 = jnp.floor(sx).astype(jnp.int32)
        y0 = jnp.floor(sy).astype(jnp.int32)
        wxs = _cubic_weights(sx - x0, jnp)
        wys = _cubic_weights(sy - y0, jnp)
        out = jnp.zeros((out_h, out_w), jnp.float32)
        for j in range(4):
            for i in range(4):
                out += wys[..., j] * wxs[..., i] * tap(x0 + (i - 1), y0 + (j - 1))
    else:
        raise ValueError(f"unknown interpolation {interpolation}")
    return out
