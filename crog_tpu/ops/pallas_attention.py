"""Fused multi-head attention as a Pallas TPU kernel.

The CROG decoder self-attends over 26x26 = 676 visual tokens and the CLIP
attention pool over 169 (reference model/layers.py:291-296,
model/clip.py:119-139).  With XLA's default lowering the [B, H, L, L] logits
and softmax matrices round-trip HBM in both passes (~350 MB each at batch 24)
— the dominant decoder cost.  At these "medium" lengths one head's ENTIRE
attention fits in VMEM, so each grid program computes a full head with the
score matrix living on-chip only:

  forward : S = qk^T -> softmax -> o, saving the row logsumexp
  backward: recompute P from the saved lse, then dv = P^T do,
            ds = P (dP - rowsum(do*o)), dq = ds k, dk = ds^T q

Both passes are single Pallas kernels over a (B*H,) grid; padded tail
positions are masked with a large negative constant (not -inf, keeping padded
rows finite).  Falls back to the plain XLA path for masked/cross attention
(tiny key lengths there) and on non-TPU backends.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, l_valid):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    kidx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(kidx < l_valid, s, _NEG)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot_general(
        (p / l).astype(v_ref.dtype), v_ref[0],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(l)  # [L, 1]


def _bwd_kernel(
    q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref, dq_ref, dk_ref, dv_ref,
    *, scale, l_valid,
):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    o = o_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]  # [L, 1]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    kidx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(kidx < l_valid, s, _NEG)
    p = jnp.exp(s - lse)

    dv = jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    delta = jnp.sum(do * o, axis=1, keepdims=True)
    ds = p * (dp - delta) * scale
    dq_ref[0] = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dq_ref.dtype)
    dk_ref[0] = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _pad_len(l: int) -> int:
    return max(8, -(-l // 8) * 8)


def _specs(n, l_pad, d):
    return pl.BlockSpec((1, l_pad, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_self_attention(q, k, v, scale: float, interpret: bool = False):
    """Softmax attention over [BH, L, D] without materializing scores in HBM."""
    o, _ = _fused_fwd(q, k, v, scale, interpret)
    return o


def _fused_fwd(q, k, v, scale, interpret):
    bh, l, d = q.shape
    l_pad = _pad_len(l)
    if l_pad != l:
        pad = [(0, 0), (0, l_pad - l), (0, 0)]
        q, k, v = (jnp.pad(x, pad) for x in (q, k, v))
    kern = functools.partial(_fwd_kernel, scale=scale, l_valid=l)
    o, lse = pl.pallas_call(
        kern,
        grid=(bh,),
        in_specs=[_specs(bh, l_pad, d)] * 3,
        out_specs=(
            _specs(bh, l_pad, d),
            _specs(bh, l_pad, 1),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, l_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, l_pad, 1), jnp.float32),
        ),
        interpret=interpret,
    )(q, k, v)
    return o[:, :l], (q, k, v, o, lse)


def _fused_fwd_vjp(q, k, v, scale, interpret):
    o, res = _fused_fwd(q, k, v, scale, interpret)
    return o, res


def _fused_bwd_vjp(scale, interpret, res, do):
    qp, kp, vp, op, lse = res  # padded
    bh, l_pad, d = qp.shape
    l = do.shape[1]
    if l_pad != l:
        do = jnp.pad(do, [(0, 0), (0, l_pad - l), (0, 0)])
    kern = functools.partial(_bwd_kernel, scale=scale, l_valid=l)
    dq, dk, dv = pl.pallas_call(
        kern,
        grid=(bh,),
        in_specs=[_specs(bh, l_pad, d)] * 5 + [_specs(bh, l_pad, 1)],
        out_specs=tuple([_specs(bh, l_pad, d)] * 3),
        out_shape=tuple(
            jax.ShapeDtypeStruct((bh, l_pad, d), qp.dtype) for _ in range(3)
        ),
        interpret=interpret,
    )(qp, kp, vp, op, do, lse)
    return dq[:, :l], dk[:, :l], dv[:, :l]


fused_self_attention.defvjp(_fused_fwd_vjp, _fused_bwd_vjp)


def flash_attention_bhld(q, k, v, interpret: bool = False):
    """[B, L, H, D]-less convenience: q/k/v as [B, H, L, D] -> [B, H, L, D]."""
    b, h, l, d = q.shape
    scale = 1.0 / math.sqrt(d)
    out = fused_self_attention(
        q.reshape(b * h, l, d), k.reshape(b * h, l, d),
        v.reshape(b * h, l, d), scale, interpret,
    )
    return out.reshape(b, h, l, d)
