"""Per-sample dynamic convolution.

The reference's projector convolves all task maps with a language-conditioned
3x3 kernel generated per sample, using a grouped conv with groups=batch
(model/layers.py:95-123).  A grouped lax.conv would express this, but its
BACKWARD pass lowers catastrophically on some backends (XLA-CPU reference
loops) and fragments the MXU on TPU (group size 1 output channel).  Instead
the k*k taps are unrolled into shifted batched contractions:

    out[b,h,w,t] = sum_{ky,kx,c} x[b, h+ky-r, w+kx-r, t, c] * w[b, c, ky, kx]

— k^2 einsums with a C-sized contraction (C=256): dense MXU matmuls forward
AND backward, identical math to the grouped conv.
"""

from __future__ import annotations

import jax.numpy as jnp


def dynamic_group_conv(
    x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, num_tasks: int
) -> jnp.ndarray:
    """Apply per-sample kxk kernels to ``num_tasks`` channel-chunks at once.

    Args:
      x: [B, H, W, T*C] — task t occupies channels [t*C, (t+1)*C).
      weight: [B, C, k, k] per-sample kernels (torch layout from the text head).
      bias: [B] per-sample scalar bias.
      num_tasks: T.
    Returns: [B, H, W, T] fp32 — map t in channel t.
    """
    b, h, w, tc = x.shape
    t = num_tasks
    c = tc // t
    k = weight.shape[-1]
    r = k // 2
    xr = x.reshape(b, h, w, t, c).astype(jnp.float32)
    xp = jnp.pad(xr, ((0, 0), (r, r), (r, r), (0, 0), (0, 0)))
    wf = weight.astype(jnp.float32)
    out = jnp.zeros((b, h, w, t), jnp.float32)
    for ky in range(k):
        for kx in range(k):
            patch = xp[:, ky : ky + h, kx : kx + w]
            out = out + jnp.einsum(
                "bhwtc,bc->bhwt", patch, wf[:, :, ky, kx]
            )
    return out + bias.astype(jnp.float32)[:, None, None, None]
