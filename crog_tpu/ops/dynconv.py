"""Per-sample dynamic convolution.

The reference's projector convolves all task maps with a language-conditioned
3x3 kernel generated per sample, using a grouped conv with groups=batch
(model/layers.py:95-123).  On TPU this maps to one
``lax.conv_general_dilated`` with ``feature_group_count = tasks*batch`` —
a single fused conv over all 5 task maps instead of 5 separate calls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dynamic_group_conv(
    x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, num_tasks: int
) -> jnp.ndarray:
    """Apply per-sample 3x3 kernels to ``num_tasks`` channel-chunks at once.

    Args:
      x: [B, H, W, T*C] — task t occupies channels [t*C, (t+1)*C).
      weight: [B, C, k, k] per-sample kernels (torch layout from the text head).
      bias: [B] per-sample scalar bias.
      num_tasks: T.
    Returns: [B, H, W, T] — map t in channel t.
    """
    b, h, w, tc = x.shape
    t = num_tasks
    c = tc // t
    k = weight.shape[-1]
    # lhs: (1, H, W, T*B*C) grouped as (task, batch) blocks
    lhs = (
        x.reshape(b, h, w, t, c)
        .transpose(3, 0, 4, 1, 2)  # (T, B, C, H, W)
        .reshape(1, t * b * c, h, w)
        .transpose(0, 2, 3, 1)  # NHWC
    )
    # rhs: HWIO = (k, k, C, T*B); out channel (t*B + b) uses group (t, b)
    rhs = jnp.tile(weight.transpose(2, 3, 1, 0)[:, :, :, None, :], (1, 1, 1, t, 1))
    rhs = rhs.reshape(k, k, c, t * b)
    out = jax.lax.conv_general_dilated(
        lhs,
        rhs.astype(lhs.dtype),
        window_strides=(1, 1),
        padding=[(k // 2, k // 2), (k // 2, k // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=t * b,
    )
    out = out + jnp.tile(bias, (t,)).astype(out.dtype)
    # (1, H, W, T*B) -> (B, H, W, T)
    return out[0].reshape(h, w, t, b).transpose(3, 0, 1, 2)
