"""Per-sample dynamic convolution.

The reference's projector convolves all task maps with a language-conditioned
3x3 kernel generated per sample, using a grouped conv with groups=batch
(model/layers.py:95-123).  A grouped lax.conv would express this, but its
BACKWARD pass lowers catastrophically on some backends and its group size of
one output channel fragments the MXU.

Formulation here is contraction-first: the big C-sized channel contraction
runs ONCE over the feature map producing k*k tiny "tap maps", which are then
shift-accumulated:

    y[b,h,w,t,k] = sum_c x[b,h,w,t,c] * wk[b,c,k]      (one MXU einsum)
    out[b,h,w,t] = sum_k y[b, h+dy_k, w+dx_k, t, k] + bias[b]

This reads the feature map once (instead of k*k shifted copies), runs the
contraction in the compute dtype (the reference's autocast ran this conv in
fp16) with fp32 accumulation, and differentiates as plain matmuls.
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
    xr = x.reshape(b, h, w, t, c)
    wk = weight.reshape(b, c, k * k).astype(x.dtype)
    # one big contraction -> k*k tap maps, fp32 accumulation; output with
    # (h, w) MINOR — see _shift_accumulate
    taps = jnp.einsum(
        "bhwtc,bck->btkhw", xr, wk, preferred_element_type=jnp.float32
    )
    return _shift_accumulate(taps, bias, k)


def dynamic_group_conv_fused(
    x: jnp.ndarray,
    vis_kernel: jnp.ndarray,
    vis_bias: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray,
    num_tasks: int,
) -> jnp.ndarray:
    """The projector's 1x1 ``vis_out`` conv composed with the dynamic conv.

    The reference computes ``X @ Wv`` (1x1 conv 256 -> T*C,
    model/layers.py:62) and then contracts the result with the per-sample
    text kernel over C (:95-123).  Both are linear in the channel axis, so
    they compose:  taps = (X @ Wv) . wk  =  X @ (Wv . wk), where
    ``M[b,j,t,k] = sum_c Wv[j,t,c] wk[b,c,k]`` is a tiny per-sample tensor
    ([256, T, k*k]).  This removes the T*C-channel intermediate entirely —
    at batch 24 that was a 170-GFLOP conv plus ~2.7 GB/step of layout
    copies around the [24,104,104,1280] tensor (~10 ms/step).

    Args:
      x: [B, H, W, J] vis_conv2 features.
      vis_kernel: [1, 1, J, T*C] the vis_out conv kernel (HWIO).
      vis_bias: [T*C] the vis_out conv bias.
      weight: [B, C, k, k] per-sample text kernels.
      bias: [B] per-sample scalar bias.
    Returns: [B, H, W, T] fp32.
    """
    b = x.shape[0]
    t = num_tasks
    k = weight.shape[-1]
    c = weight.shape[1]
    j = vis_kernel.shape[2]
    wk = weight.reshape(b, c, k * k).astype(jnp.float32)
    wv = vis_kernel.reshape(j, t, c).astype(jnp.float32)
    m = jnp.einsum("jtc,bck->bjtk", wv, wk)  # [B, J, T, k*k], tiny
    tap_bias = jnp.einsum(
        "tc,bck->btk", vis_bias.reshape(t, c).astype(jnp.float32), wk
    )
    taps = jnp.einsum(
        "bhwj,bjtk->btkhw", x, m.astype(x.dtype),
        preferred_element_type=jnp.float32,
    )
    taps = taps + tap_bias[:, :, :, None, None].astype(taps.dtype)
    return _shift_accumulate(taps, bias, k)


def _shift_accumulate(taps: jnp.ndarray, bias: jnp.ndarray, k: int):
    """Sum the k*k spatially-shifted tap maps + per-sample scalar bias.

    ``taps`` is [B, T, k*k, H, W]: the SPATIAL dims are minor, so each
    shifted slice is a lane/sublane offset of a well-tiled array.  (The
    earlier [B, H, W, T, k*k] layout put k*k=9 in the lane dimension —
    14x padding on every byte the shift-adds moved, ~5 ms/step of the
    backward at batch 24.)  Returns [B, H, W, T] fp32.
    """
    b, t, _, h, w = taps.shape
    r = k // 2
    taps = jnp.pad(taps, ((0, 0), (0, 0), (0, 0), (r, r), (r, r)))
    out = jnp.zeros((b, t, h, w), jnp.float32)
    for ky in range(k):
        for kx in range(k):
            # cross-correlation (torch conv semantics): tap (ky, kx)
            # multiplies x[p + (ky-r, kx-r)] = padded tap map at p + (ky, kx)
            out = out + taps[
                :, :, ky * k + kx, ky : ky + h, kx : kx + w
            ]
    out = out.transpose(0, 2, 3, 1)
    return out + bias.astype(jnp.float32)[:, None, None, None]
