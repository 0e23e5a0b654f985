"""Space-to-depth stem: TPU lane-efficient low-channel convolutions.

The CLIP ResNet stem (reference model/clip.py:208-213) runs 3x3 convs with
3/32/64 channels at 208x208.  TPU arrays tile the channel axis onto 128
lanes, so those activations waste 2-4x of every HBM byte and MXU column —
the stem accounts for ~10 ms of the 140 ms train step at batch 24 while
doing ~2% of the FLOPs.

Fix: run the whole stem in SPACE-TO-DEPTH domain.  The input image is
blocked 4x4 into (B,104,104,48); every stem tensor then carries its 2x2
spatial block in the channel axis ((dy*2+dx)*C + c, 4C = 128 or 256 lanes —
fully packed).  Each original conv becomes one conv on the blocked tensors
whose kernel is a zero-embedded rearrangement of the ORIGINAL parameters,
built on the fly at trace time — the parameter tree, checkpoints, and the
optimizer are untouched, and the op computes exactly the same dot products
(same taps, same f32 MXU accumulation; only summation order may differ).

Derivation for a 3x3 stride-1 conv under 2x2 blocking: output block row
dy' at cell i is original row 2i+dy', reading original rows 2i+dy'+u,
u in {-1,0,1}; original row 2m+dy lands there iff u = 2(a-1)+dy-dy' with
cell tap a = m-i+1 in {0,1,2} — one valid (a,dy) pair per (dy',u).  The
blocked kernel therefore has exactly 9 nonzero (ci,co) blocks per output
slot.  For the 3x3 stride-2 stem conv1 under 4x4 input blocking the same
argument gives 2x2 cell taps with u = ry+4(a-1)-2dy'.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def space_to_depth(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """NHWC -> (B, H/k, W/k, k*k*C), slot index (dy*k+dx)*C + c."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // k, k, w // k, k, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // k, w // k, k * k * c)


def depth_to_space(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Inverse of space_to_depth."""
    b, h, w, kkc = x.shape
    c = kkc // (k * k)
    x = x.reshape(b, h, w, k, k, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * k, w * k, c)


def _place(w_big, w, a, b, slot_in, slot_out, ci, co):
    return w_big.at[
        a, b, slot_in * ci : (slot_in + 1) * ci,
        slot_out * co : (slot_out + 1) * co,
    ].set(w)


def block_kernel_s2(w: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-2 pad-1 conv kernel [3,3,ci,co] -> blocked [2,2,16ci,4co]
    for 4x4-blocked input, 2x2-blocked output; apply with stride 1 and
    padding ((1,0),(1,0))."""
    ci, co = w.shape[2], w.shape[3]
    out = jnp.zeros((2, 2, 16 * ci, 4 * co), w.dtype)
    for a in range(2):
        for bb in range(2):
            for ry in range(4):
                for rx in range(4):
                    for dy in range(2):
                        for dx in range(2):
                            u = ry + 4 * (a - 1) - 2 * dy
                            v = rx + 4 * (bb - 1) - 2 * dx
                            if abs(u) <= 1 and abs(v) <= 1:
                                out = _place(
                                    out, w[u + 1, v + 1], a, bb,
                                    ry * 4 + rx, dy * 2 + dx, ci, co,
                                )
    return out


def block_kernel_s1(w: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-1 pad-1 conv kernel [3,3,ci,co] -> blocked [3,3,4ci,4co]
    for 2x2-blocked input and output; apply with stride 1, padding 1."""
    ci, co = w.shape[2], w.shape[3]
    out = jnp.zeros((3, 3, 4 * ci, 4 * co), w.dtype)
    for a in range(3):
        for bb in range(3):
            for dy in range(2):
                for dx in range(2):
                    for dyo in range(2):
                        for dxo in range(2):
                            u = 2 * (a - 1) + dy - dyo
                            v = 2 * (bb - 1) + dx - dxo
                            if abs(u) <= 1 and abs(v) <= 1:
                                out = _place(
                                    out, w[u + 1, v + 1], a, bb,
                                    dy * 2 + dx, dyo * 2 + dxo, ci, co,
                                )
    return out


def block_mean(x: jnp.ndarray, c: int) -> jnp.ndarray:
    """avg_pool(2) of the un-blocked tensor == mean over the 4 block slots
    of the 2x2-blocked tensor: (B,h,w,4c) -> (B,h,w,c).

    Written as static channel slices, NOT reshape(...,4,c).mean: the reshape
    splits the minor (lane) dimension and XLA materializes a transposed
    copy to reduce over it (~0.9 ms at batch 24); slices reduce across
    lanes elementwise and fuse into the surrounding computation."""
    return (
        x[..., 0 * c : 1 * c]
        + x[..., 1 * c : 2 * c]
        + x[..., 2 * c : 3 * c]
        + x[..., 3 * c : 4 * c]
    ) * jnp.asarray(0.25, x.dtype)
