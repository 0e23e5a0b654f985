"""Fused decoder FFN as a Pallas TPU kernel.

The CROG decoder's feed-forward chain (reference model/layers.py:300-311)
is Dense(512->2048) -> ReLU -> Dropout -> LayerNorm -> Dense(2048->512),
and every stage is PER-TOKEN: the LayerNorm reduces over the token's own
2048 features.  Under XLA each stage round-trips the [B*676, 2048]
activation through HBM (and the LayerNorm statistics force either slow
GEMM fusions or extra standalone passes — see LayerNormFp32's fences);
profiled at ~10 ms/step of the 113 ms train step for ~600 GFLOP that is
~3 ms of MXU time.

Forward: one kernel per token tile computes the whole chain with the
hidden activation resident in VMEM — read x once, write y once.

Backward: the kernel re-generates the dropout mask from the same seed,
recomputes the hidden chain from x (FLOPs are cheap, bytes are not),
produces dx plus the post-ReLU/dropout hidden gradient ``dh`` and the
normalized hidden ``hn`` (both needed by the weight gradients), and
accumulates the small per-feature bias/affine gradients across the
sequential TPU grid.  The two LARGE weight gradients (x^T dh, hn^T dy)
are left to XLA as clean full-contraction GEMMs — they run at MXU peak
and would blow the VMEM budget as in-kernel f32 accumulators.

Numerics match the unfused chain: f32 GEMM accumulation cast to bf16
hidden, LayerNorm statistics in f32 over the bf16 hidden (flax fast
variance), dropout scale 1/keep.  The DROPOUT DRAW differs from
jax.random's (Pallas PRNG vs threefry) — dropout is arbitrary randomness,
and the non-TPU path keeps flax Dropout, so parity tests compare with
dropout disabled.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TM = 256  # token-tile rows


def _ln_f32(h, eps):
    """Row LayerNorm stats on f32: (mean, rstd), flax fast variance."""
    hf = h.astype(jnp.float32)
    mu = jnp.mean(hf, axis=1, keepdims=True)
    mu2 = jnp.mean(hf * hf, axis=1, keepdims=True)
    var = jnp.maximum(0.0, mu2 - mu * mu)
    return mu, jax.lax.rsqrt(var + eps)


def _dropout_keep(shape, rate):
    bits = pltpu.prng_random_bits(shape)
    thresh = np.uint32(min(int(rate * 2**32), 2**32 - 1))
    return pltpu.bitcast(bits, jnp.uint32) >= thresh


def _hidden(x, w1, b1, *, rate, train, eps):
    """x tile -> (h bf16 post-dropout, mean, rstd, keep)."""
    h = jax.lax.dot_general(
        x, w1, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    h = (h + b1.astype(jnp.float32)).astype(x.dtype)
    h = jnp.maximum(h, 0)
    keep = None
    if train and rate > 0.0:
        keep = _dropout_keep(h.shape, rate)
        h = jnp.where(
            keep, h / jnp.asarray(1.0 - rate, h.dtype), jnp.zeros_like(h)
        )
    mu, rstd = _ln_f32(h, eps)
    return h, mu, rstd, keep


def _fwd_kernel(seed_ref, x_ref, w1_ref, b1_ref, g_ref, be_ref, w2_ref,
                b2_ref, y_ref, *, rate, train, eps):
    i = pl.program_id(0)
    if train and rate > 0.0:  # TPU PRNG; unavailable in CPU interpret mode
        pltpu.prng_seed(seed_ref[0] + i)
    x = x_ref[...]
    h, mu, rstd, _ = _hidden(
        x, w1_ref[...], b1_ref[...], rate=rate, train=train, eps=eps
    )
    hf = h.astype(jnp.float32)
    hn = ((hf - mu) * rstd * g_ref[...].astype(jnp.float32)
          + be_ref[...].astype(jnp.float32)).astype(x.dtype)
    y = jax.lax.dot_general(
        hn, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[...].astype(jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)


def _bwd_kernel(seed_ref, x_ref, w1_ref, b1_ref, g_ref, be_ref, w2_ref,
                dy_ref, dx_ref, dh_ref, hn_ref, db1_ref, dg_ref, dbe_ref,
                db2_ref, *, rate, train, eps):
    i = pl.program_id(0)
    if train and rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + i)  # same stream as forward
    x = x_ref[...]
    dy = dy_ref[...].astype(jnp.float32)
    h, mu, rstd, keep = _hidden(
        x, w1_ref[...], b1_ref[...], rate=rate, train=train, eps=eps
    )
    hf = h.astype(jnp.float32)
    g32 = g_ref[...].astype(jnp.float32)
    hhat = (hf - mu) * rstd
    hn = (hhat * g32 + be_ref[...].astype(jnp.float32)).astype(x.dtype)

    dyc = dy.astype(x.dtype)
    dhn = jax.lax.dot_general(  # dy @ W2^T
        dyc, w2_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db2 = jnp.sum(dy, axis=0, keepdims=True)

    dg = jnp.sum(dhn * hhat, axis=0, keepdims=True)
    dbe = jnp.sum(dhn, axis=0, keepdims=True)
    dhhat = dhn * g32
    m1 = jnp.mean(dhhat, axis=1, keepdims=True)
    m2 = jnp.mean(dhhat * hhat, axis=1, keepdims=True)
    dh = rstd * (dhhat - m1 - hhat * m2)

    if train and rate > 0.0:
        dh = jnp.where(keep, dh / (1.0 - rate), 0.0)
    # post-dropout h > 0 == (pre-dropout relu active AND kept); dropped
    # lanes already have dh == 0, so the combined mask is equivalent
    dh = jnp.where(hf > 0, dh, 0.0).astype(x.dtype)
    db1 = jnp.sum(dh.astype(jnp.float32), axis=0, keepdims=True)

    dx = jax.lax.dot_general(  # dh @ W1^T
        dh, w1_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    dx_ref[...] = dx.astype(dx_ref.dtype)
    dh_ref[...] = dh
    hn_ref[...] = hn

    @pl.when(i == 0)
    def _():
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dg_ref[...] = jnp.zeros_like(dg_ref)
        dbe_ref[...] = jnp.zeros_like(dbe_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    db1_ref[...] += db1
    dg_ref[...] += dg
    dbe_ref[...] += dbe
    db2_ref[...] += db2


def _pad_m(x, tm):
    m = x.shape[0]
    pad = (-m) % tm
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x, m


def _row_spec(tm, d):
    # index_map receives (grid_idx, *scalar_prefetch_refs)
    return pl.BlockSpec((tm, d), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM)


def _full_spec(*shape):
    return pl.BlockSpec(shape, lambda i, *_: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def fused_ffn(x, w1, b1, gamma, beta, w2, b2, seed,
              rate: float, train: bool, eps: float = 1e-5,
              interpret: bool = False):
    """Dense->ReLU->Dropout->LayerNorm->Dense over [M, D] tokens.

    1-D parameters are passed as [1, F] rows.  ``seed`` is an int32 scalar
    array; the dropout stream is the Pallas per-core PRNG (re-generated
    identically in the backward pass).
    """
    y, _ = _fused_ffn_fwd(x, w1, b1, gamma, beta, w2, b2, seed,
                          rate, train, eps, interpret)
    return y


def _fused_ffn_fwd(x, w1, b1, gamma, beta, w2, b2, seed,
                   rate, train, eps, interpret):
    d = x.shape[1]
    hdim = w1.shape[1]
    xp, m = _pad_m(x, _TM)
    grid = xp.shape[0] // _TM
    kern = functools.partial(_fwd_kernel, rate=rate, train=train, eps=eps)
    y = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                _row_spec(_TM, d),
                _full_spec(d, hdim),
                _full_spec(1, hdim),
                _full_spec(1, hdim),
                _full_spec(1, hdim),
                _full_spec(hdim, d),
                _full_spec(1, d),
            ],
            out_specs=_row_spec(_TM, d),
        ),
        out_shape=jax.ShapeDtypeStruct(xp.shape, x.dtype),
        interpret=interpret,
    )(seed.reshape(1), xp, w1, b1.reshape(1, -1), gamma.reshape(1, -1),
      beta.reshape(1, -1), w2, b2.reshape(1, -1))
    return y[:m], (x, w1, b1, gamma, beta, w2, seed)


def _fused_ffn_fwd_vjp(x, w1, b1, gamma, beta, w2, b2, seed,
                       rate, train, eps, interpret):
    return _fused_ffn_fwd(x, w1, b1, gamma, beta, w2, b2, seed,
                          rate, train, eps, interpret)


def _fused_ffn_bwd_vjp(rate, train, eps, interpret, res, dy):
    x, w1, b1, gamma, beta, w2, seed = res
    d = x.shape[1]
    hdim = w1.shape[1]
    xp, m = _pad_m(x, _TM)
    dyp, _ = _pad_m(dy, _TM)
    grid = xp.shape[0] // _TM
    kern = functools.partial(_bwd_kernel, rate=rate, train=train, eps=eps)
    dx, dh, hn, db1, dg, dbe, db2 = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                _row_spec(_TM, d),
                _full_spec(d, hdim),
                _full_spec(1, hdim),
                _full_spec(1, hdim),
                _full_spec(1, hdim),
                _full_spec(hdim, d),
                _row_spec(_TM, d),
            ],
            out_specs=(
                _row_spec(_TM, d),
                _row_spec(_TM, hdim),
                _row_spec(_TM, hdim),
                _full_spec(1, hdim),
                _full_spec(1, hdim),
                _full_spec(1, hdim),
                _full_spec(1, d),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(xp.shape, x.dtype),
            jax.ShapeDtypeStruct((xp.shape[0], hdim), x.dtype),
            jax.ShapeDtypeStruct((xp.shape[0], hdim), x.dtype),
            jax.ShapeDtypeStruct((1, hdim), jnp.float32),
            jax.ShapeDtypeStruct((1, hdim), jnp.float32),
            jax.ShapeDtypeStruct((1, hdim), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ),
        interpret=interpret,
    )(seed.reshape(1), xp, w1, b1.reshape(1, -1), gamma.reshape(1, -1),
      beta.reshape(1, -1), w2, dyp)
    # large weight grads as clean XLA GEMMs (full M contraction, MXU peak)
    dw1 = jnp.einsum(
        "mk,mh->kh", xp, dh, preferred_element_type=jnp.float32
    )
    dw2 = jnp.einsum(
        "mh,mk->hk", hn[:m], dy.astype(hn.dtype),
        preferred_element_type=jnp.float32,
    )
    return (dx[:m], dw1, db1.reshape(-1), dg.reshape(-1), dbe.reshape(-1),
            dw2, db2.reshape(-1), None)


fused_ffn.defvjp(_fused_ffn_fwd_vjp, _fused_ffn_bwd_vjp)
