"""Fused decoder attention blocks as Pallas TPU kernels.

The CROG decoder layer (reference model/layers.py:280-339) wraps each
attention in a pre-LN + post-LN + dropout + residual chain:

  self block :  x + drop(LN_sa( OutProj( MHA(LN1(x)+pos, LN1(x)+pos, LN1(x)) )))
  cross block:  x + drop(LN_ca( OutProj( MHA(LN2(x)+pos, txt+tpos, txt) )))

Under XLA every LN is fenced (LayerNormFp32) and every stage round-trips
the [B, 676, 512] activation through HBM; after the fused-FFN kernel the
decoder's remaining ~18 ms/step is exactly these chains.  Each kernel here
computes a WHOLE block for one sample per grid program — LN, q/k/v
projections, all-head attention (scores VMEM-resident), output projection,
post-LN, dropout and the residual add — reading x once and writing y once.

Backward recomputes the forward chain per sample (FLOPs are cheap, bytes
are not) and, unlike the fused-FFN kernel, accumulates the weight
gradients IN-KERNEL: dWq = qin^T dq is a [D, L_pad] x [L_pad, D] GEMM per
sample (K=688 — MXU-efficient), summed into a [4D, D] f32 VMEM accumulator
across the sequential grid alongside the bias/LN-affine rows.  Emitting the
per-sample intermediates for XLA-side contraction instead (the FFN recipe)
needs seven extra [B, L_pad, D] HBM buffers, which both overflows the 16 MB
scoped-VMEM window at batch 24 and round-trips ~34 MB/layer of HBM.

Numerics match the unfused path within bf16 rounding: LN statistics in f32
(flax fast variance), softmax in f32 with the same -1e30 padding mask as
ops/pallas_attention.py, bf16 GEMMs with f32 accumulation.  The dropout
draw uses the Pallas per-core PRNG (regenerated identically in the
backward); parity tests compare with dropout disabled, like the FFN kernel.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30
# the backward kernels' recompute chain + [4D, D] f32 weight-grad
# accumulator exceed XLA's default 16 MB scoped-VMEM window at Lp=688
_VMEM_LIMIT = 96 * 1024 * 1024
_EPS = 1e-5


def _pad_rows(x, rows):
    pad = rows - x.shape[0]
    return jnp.pad(x, ((0, pad), (0, 0))) if pad else x


def _pad_to(n: int, m: int) -> int:
    return -(-n // m) * m


# ---------------------------------------------------------------- helpers
def _ln_fwd(x, g, b):
    """LayerNormFp32 semantics: f32 stats (fast variance) + affine, cast
    back to x.dtype.  Returns (y, xhat, rstd) for reuse in backward."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=1, keepdims=True)
    mu2 = jnp.mean(xf * xf, axis=1, keepdims=True)
    var = jnp.maximum(0.0, mu2 - mu * mu)
    rstd = jax.lax.rsqrt(var + _EPS)
    xhat = (xf - mu) * rstd
    y = (xhat * g.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)
    return y, xhat, rstd


def _ln_bwd(dy, xhat, rstd, g):
    """dx plus (dg, db) row-sums; dy f32 [L, D]."""
    dxhat = dy * g.astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=1, keepdims=True)
    dx = rstd * (dxhat - m1 - xhat * m2)
    dg = jnp.sum(dy * xhat, axis=0, keepdims=True)
    db = jnp.sum(dy, axis=0, keepdims=True)
    return dx, dg, db


def _dense(x, w, b):
    """bf16 GEMM, f32 accumulate, + bias, cast back (flax Dense dtype=bf16)."""
    y = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return (y + b.astype(jnp.float32)).astype(x.dtype)


def _dense_t(x, w):
    """x @ w^T with f32 accumulation, cast to x.dtype."""
    return jax.lax.dot_general(
        x, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(x.dtype)


def _mha_fwd(q, k, v, nheads, kmask_add):
    """All-head attention, scores f32 in VMEM.  q [Lq, D], k/v [Lk, D];
    kmask_add [1, Lk] additive f32 (0 valid / -1e30 masked).
    Returns o [Lq, D] (q.dtype)."""
    lq, d = q.shape
    dh = d // nheads
    scale = dh ** -0.5
    outs = []
    for h in range(nheads):
        sl = slice(h * dh, (h + 1) * dh)
        # bf16 operands, f32 accumulation: the MXU's native mode (f32xf32
        # runs ~8x slower); matches the unfused XLA einsum's numerics
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        ) * scale + kmask_add
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        outs.append(jax.lax.dot_general(
            p.astype(v.dtype), v[:, sl],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ))
    # lane-dim concat (Mosaic has no dynamic_update_slice lowering)
    return jnp.concatenate(outs, axis=1).astype(q.dtype)


def _mha_bwd(q, k, v, do, nheads, kmask_add):
    """Recompute-probs attention backward.  do [Lq, D].
    Returns (dq, dk, dv) in q.dtype."""
    lq, d = q.shape
    lk = k.shape[0]
    dh = d // nheads
    scale = dh ** -0.5
    dqs, dks, dvs = [], [], []
    for h in range(nheads):
        sl = slice(h * dh, (h + 1) * dh)
        qh = q[:, sl]
        kh = k[:, sl]
        vh = v[:, sl]
        doh = do[:, sl].astype(q.dtype)
        # bf16 operands / f32 accumulation throughout (MXU native mode);
        # softmax math stays f32
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + kmask_add
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        pc = p.astype(q.dtype)
        dvh = jax.lax.dot_general(
            pc, doh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            doh, vh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        delta = jnp.sum(dp * p, axis=1, keepdims=True)
        ds = (p * (dp - delta) * scale).astype(q.dtype)
        dqh = jax.lax.dot_general(
            ds, kh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dkh = jax.lax.dot_general(
            ds, qh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dqs.append(dqh)
        dks.append(dkh)
        dvs.append(dvh)
    dq = jnp.concatenate(dqs, axis=1)
    dk = jnp.concatenate(dks, axis=1)
    dv = jnp.concatenate(dvs, axis=1)
    return dq.astype(q.dtype), dk.astype(q.dtype), dv.astype(q.dtype)


def _dropout_mask(shape, rate):
    bits = pltpu.prng_random_bits(shape)
    thresh = np.uint32(min(int(rate * 2**32), 2**32 - 1))
    return pltpu.bitcast(bits, jnp.uint32) >= thresh


def _apply_drop(x, keep, rate):
    if keep is None:
        return x
    return jnp.where(keep, x / jnp.asarray(1.0 - rate, x.dtype),
                     jnp.zeros_like(x))


# row blocks of the packed parameter table P [8, D]
_BQ, _BK, _BV, _BO, _GA, _BA, _GP, _BP = range(8)


def _w(w_ref, i, d):
    return w_ref[i * d : (i + 1) * d, :]


def _p(p_ref, i):
    return p_ref[i : i + 1, :]


# ------------------------------------------------------------- self block
def _self_fwd_kernel(seed_ref, x_ref, pos_ref, w_ref, p_ref, y_ref,
                     *, nheads, l_valid, rate, train):
    i = pl.program_id(0)
    if train and rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + i)
    d = x_ref.shape[2]
    x = x_ref[0]
    xl, _, _ = _ln_fwd(x, _p(p_ref, _GA), _p(p_ref, _BA))
    qin = xl + pos_ref[...].astype(xl.dtype)
    q = _dense(qin, _w(w_ref, 0, d), _p(p_ref, _BQ))
    k = _dense(qin, _w(w_ref, 1, d), _p(p_ref, _BK))
    v = _dense(xl, _w(w_ref, 2, d), _p(p_ref, _BV))
    kidx = jax.lax.broadcasted_iota(jnp.int32, (1, x.shape[0]), 1)
    kmask = jnp.where(kidx < l_valid, 0.0, _NEG)
    o = _mha_fwd(q, k, v, nheads, kmask)
    op = _dense(o, _w(w_ref, 3, d), _p(p_ref, _BO))
    on, _, _ = _ln_fwd(op, _p(p_ref, _GP), _p(p_ref, _BP))
    keep = _dropout_mask(on.shape, rate) if (train and rate > 0.0) else None
    y = x + _apply_drop(on, keep, rate)
    ridx = jax.lax.broadcasted_iota(jnp.int32, y.shape, 0)
    y_ref[0] = jnp.where(ridx < l_valid, y, 0).astype(y_ref.dtype)


def _grad_w(a, b):
    """dW = a^T b with f32 accumulation: [L, D] x [L, E] -> [D, E]."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _self_bwd_kernel(seed_ref, x_ref, pos_ref, w_ref, p_ref, dy_ref,
                     dx_ref, dw_ref, dp_ref,
                     *, nheads, l_valid, rate, train):
    i = pl.program_id(0)
    if train and rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + i)
    d = x_ref.shape[2]
    x = x_ref[0]
    dy = dy_ref[0].astype(jnp.float32)

    # recompute forward
    xl, xhat1, rstd1 = _ln_fwd(x, _p(p_ref, _GA), _p(p_ref, _BA))
    qin = xl + pos_ref[...].astype(xl.dtype)
    q = _dense(qin, _w(w_ref, 0, d), _p(p_ref, _BQ))
    k = _dense(qin, _w(w_ref, 1, d), _p(p_ref, _BK))
    v = _dense(xl, _w(w_ref, 2, d), _p(p_ref, _BV))
    kidx = jax.lax.broadcasted_iota(jnp.int32, (1, x.shape[0]), 1)
    kmask = jnp.where(kidx < l_valid, 0.0, _NEG)
    o = _mha_fwd(q, k, v, nheads, kmask)
    op = _dense(o, _w(w_ref, 3, d), _p(p_ref, _BO))
    _, xhat2, rstd2 = _ln_fwd(op, _p(p_ref, _GP), _p(p_ref, _BP))
    keep = _dropout_mask(op.shape, rate) if (train and rate > 0.0) else None

    # backward
    don = dy if keep is None else jnp.where(keep, dy / (1.0 - rate), 0.0)
    dop, dgp, dbp = _ln_bwd(don, xhat2, rstd2, _p(p_ref, _GP))
    dop_b = dop.astype(x.dtype)
    dbo = jnp.sum(dop, axis=0, keepdims=True)
    do = _dense_t(dop_b, _w(w_ref, 3, d))
    dq, dk, dv = _mha_bwd(q, k, v, do, nheads, kmask)
    dbq = jnp.sum(dq.astype(jnp.float32), axis=0, keepdims=True)
    dbk = jnp.sum(dk.astype(jnp.float32), axis=0, keepdims=True)
    dbv = jnp.sum(dv.astype(jnp.float32), axis=0, keepdims=True)
    dqin = (
        _dense_t(dq, _w(w_ref, 0, d)).astype(jnp.float32)
        + _dense_t(dk, _w(w_ref, 1, d)).astype(jnp.float32)
    )
    dxl = dqin + _dense_t(dv, _w(w_ref, 2, d)).astype(jnp.float32)
    dx_ln, dga, dba = _ln_bwd(dxl, xhat1, rstd1, _p(p_ref, _GA))
    dx = dy + dx_ln

    ridx = jax.lax.broadcasted_iota(jnp.int32, dx.shape, 0)
    dx_ref[0] = jnp.where(ridx < l_valid, dx, 0).astype(dx_ref.dtype)

    dp_rows = jnp.concatenate(
        [dbq, dbk, dbv, dbo, dga, dba, dgp, dbp], axis=0
    )

    @pl.when(i == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        dp_ref[...] = jnp.zeros_like(dp_ref)

    # per-block writes: a concatenated [4D, D] f32 row-stack would cost a
    # 4 MB VMEM temp on top of the accumulator
    for j, dwj in enumerate(
        (_grad_w(qin, dq), _grad_w(qin, dk), _grad_w(xl, dv),
         _grad_w(o, dop_b))
    ):
        dw_ref[j * d : (j + 1) * d, :] += dwj
    dp_ref[...] += dp_rows


# ------------------------------------------------------------ cross block
def _cross_fwd_kernel(seed_ref, x_ref, kv_ref, pos_ref, kpos_ref, kmask_ref,
                      w_ref, p_ref, y_ref, *, nheads, l_valid, rate, train):
    i = pl.program_id(0)
    if train and rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + i)
    d = x_ref.shape[2]
    x = x_ref[0]
    kv = kv_ref[0]
    xl, _, _ = _ln_fwd(x, _p(p_ref, _GA), _p(p_ref, _BA))
    qin = xl + pos_ref[...].astype(xl.dtype)
    kin = kv + kpos_ref[...].astype(kv.dtype)
    q = _dense(qin, _w(w_ref, 0, d), _p(p_ref, _BQ))
    k = _dense(kin, _w(w_ref, 1, d), _p(p_ref, _BK))
    v = _dense(kv, _w(w_ref, 2, d), _p(p_ref, _BV))
    o = _mha_fwd(q, k, v, nheads, kmask_ref[0].astype(jnp.float32))
    op = _dense(o, _w(w_ref, 3, d), _p(p_ref, _BO))
    on, _, _ = _ln_fwd(op, _p(p_ref, _GP), _p(p_ref, _BP))
    keep = _dropout_mask(on.shape, rate) if (train and rate > 0.0) else None
    y = x + _apply_drop(on, keep, rate)
    ridx = jax.lax.broadcasted_iota(jnp.int32, y.shape, 0)
    y_ref[0] = jnp.where(ridx < l_valid, y, 0).astype(y_ref.dtype)


def _cross_bwd_kernel(seed_ref, x_ref, kv_ref, pos_ref, kpos_ref, kmask_ref,
                      w_ref, p_ref, dy_ref,
                      dx_ref, dkv_ref, dw_ref, dp_ref,
                      *, nheads, l_valid, rate, train):
    i = pl.program_id(0)
    if train and rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + i)
    d = x_ref.shape[2]
    x = x_ref[0]
    kv = kv_ref[0]
    dy = dy_ref[0].astype(jnp.float32)

    xl, xhat1, rstd1 = _ln_fwd(x, _p(p_ref, _GA), _p(p_ref, _BA))
    qin = xl + pos_ref[...].astype(xl.dtype)
    kin = kv + kpos_ref[...].astype(kv.dtype)
    q = _dense(qin, _w(w_ref, 0, d), _p(p_ref, _BQ))
    k = _dense(kin, _w(w_ref, 1, d), _p(p_ref, _BK))
    v = _dense(kv, _w(w_ref, 2, d), _p(p_ref, _BV))
    kmask = kmask_ref[0].astype(jnp.float32)
    o = _mha_fwd(q, k, v, nheads, kmask)
    op = _dense(o, _w(w_ref, 3, d), _p(p_ref, _BO))
    _, xhat2, rstd2 = _ln_fwd(op, _p(p_ref, _GP), _p(p_ref, _BP))
    keep = _dropout_mask(op.shape, rate) if (train and rate > 0.0) else None

    don = dy if keep is None else jnp.where(keep, dy / (1.0 - rate), 0.0)
    dop, dgp, dbp = _ln_bwd(don, xhat2, rstd2, _p(p_ref, _GP))
    dop_b = dop.astype(x.dtype)
    dbo = jnp.sum(dop, axis=0, keepdims=True)
    do = _dense_t(dop_b, _w(w_ref, 3, d))
    dq, dk, dv = _mha_bwd(q, k, v, do, nheads, kmask)
    dbq = jnp.sum(dq.astype(jnp.float32), axis=0, keepdims=True)
    dbk = jnp.sum(dk.astype(jnp.float32), axis=0, keepdims=True)
    dbv = jnp.sum(dv.astype(jnp.float32), axis=0, keepdims=True)
    dqin = _dense_t(dq, _w(w_ref, 0, d)).astype(jnp.float32)
    dkv = (
        _dense_t(dk, _w(w_ref, 1, d)).astype(jnp.float32)
        + _dense_t(dv, _w(w_ref, 2, d)).astype(jnp.float32)
    )
    dx_ln, dga, dba = _ln_bwd(dqin, xhat1, rstd1, _p(p_ref, _GA))
    dx = dy + dx_ln

    ridx = jax.lax.broadcasted_iota(jnp.int32, dx.shape, 0)
    dx_ref[0] = jnp.where(ridx < l_valid, dx, 0).astype(dx_ref.dtype)
    dkv_ref[0] = dkv.astype(dkv_ref.dtype)

    dp_rows = jnp.concatenate(
        [dbq, dbk, dbv, dbo, dga, dba, dgp, dbp], axis=0
    )

    @pl.when(i == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        dp_ref[...] = jnp.zeros_like(dp_ref)

    for j, dwj in enumerate(
        (_grad_w(qin, dq), _grad_w(kin, dk), _grad_w(kv, dv),
         _grad_w(o, dop_b))
    ):
        dw_ref[j * d : (j + 1) * d, :] += dwj
    dp_ref[...] += dp_rows


# ------------------------------------------------------------- pallas glue
def _sample_spec(lp, d):
    return pl.BlockSpec((1, lp, d), lambda i, *_: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _const_spec(*shape):
    return pl.BlockSpec(shape, lambda i, *_: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _pack_params(bq, bk, bv, bo, ga, ba, gp, bp):
    return jnp.stack(
        [bq, bk, bv, bo, ga, ba, gp, bp], axis=0
    ).astype(jnp.float32)


def _pack_weights(wq, wk, wv, wo, dtype):
    return jnp.concatenate([wq, wk, wv, wo], axis=0).astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def fused_self_block(x, pos, w, p, seed, nheads: int, l_valid: int,
                     rate: float, train: bool, interpret: bool = False):
    """Whole pre-LN self-attention block over [B, Lp, D] padded tokens.

    x/pos bf16 (rows >= l_valid are zero), w = packed [4D, D] (q,k,v,o),
    p = packed [8, D] f32 (biases + LN affines).  Returns x + block(x).
    """
    y, _ = _self_fwd(x, pos, w, p, seed, nheads, l_valid, rate, train,
                     interpret)
    return y


def _self_fwd(x, pos, w, p, seed, nheads, l_valid, rate, train, interpret):
    b, lp, d = x.shape
    kern = functools.partial(
        _self_fwd_kernel, nheads=nheads, l_valid=l_valid, rate=rate,
        train=train,
    )
    y = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[
                _sample_spec(lp, d),
                _const_spec(lp, d),
                _const_spec(4 * d, d),
                _const_spec(8, d),
            ],
            out_specs=_sample_spec(lp, d),
        ),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )(seed.reshape(1), x, pos, w, p)
    return y, (x, pos, w, p, seed)


def _self_fwd_vjp(x, pos, w, p, seed, nheads, l_valid, rate, train,
                  interpret):
    return _self_fwd(x, pos, w, p, seed, nheads, l_valid, rate, train,
                     interpret)


def _self_bwd_vjp(nheads, l_valid, rate, train, interpret, res, dy):
    x, pos, w, p, seed = res
    b, lp, d = x.shape
    kern = functools.partial(
        _self_bwd_kernel, nheads=nheads, l_valid=l_valid, rate=rate,
        train=train,
    )
    dx, dw, dp = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[
                _sample_spec(lp, d),
                _const_spec(lp, d),
                _const_spec(4 * d, d),
                _const_spec(8, d),
                _sample_spec(lp, d),
            ],
            out_specs=(
                _sample_spec(lp, d),
                _const_spec(4 * d, d),
                _const_spec(8, d),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, lp, d), x.dtype),
            jax.ShapeDtypeStruct((4 * d, d), jnp.float32),
            jax.ShapeDtypeStruct((8, d), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )(seed.reshape(1), x, pos, w, p, dy.astype(x.dtype))
    return dx, None, dw.astype(w.dtype), dp, None


fused_self_block.defvjp(_self_fwd_vjp, _self_bwd_vjp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12))
def fused_cross_block(x, kv, pos, kpos, kmask, w, p, seed, nheads: int,
                      l_valid: int, rate: float, train: bool,
                      interpret: bool = False):
    """Whole pre-LN cross-attention block: queries from x [B, Lp, D],
    keys/values from kv [B, Tp, D]; kmask [B, 1, Tp] additive f32
    (0 valid / -1e30 for padded keys AND key_padding_mask)."""
    y, _ = _cross_fwd(x, kv, pos, kpos, kmask, w, p, seed, nheads, l_valid,
                      rate, train, interpret)
    return y


def _cross_fwd(x, kv, pos, kpos, kmask, w, p, seed, nheads, l_valid, rate,
               train, interpret):
    b, lp, d = x.shape
    tp = kv.shape[1]
    kern = functools.partial(
        _cross_fwd_kernel, nheads=nheads, l_valid=l_valid, rate=rate,
        train=train,
    )
    y = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[
                _sample_spec(lp, d),
                _sample_spec(tp, d),
                _const_spec(lp, d),
                _const_spec(tp, d),
                _sample_spec(1, tp),
                _const_spec(4 * d, d),
                _const_spec(8, d),
            ],
            out_specs=_sample_spec(lp, d),
        ),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )(seed.reshape(1), x, kv, pos, kpos, kmask, w, p)
    return y, (x, kv, pos, kpos, kmask, w, p, seed)


def _cross_fwd_vjp(x, kv, pos, kpos, kmask, w, p, seed, nheads, l_valid,
                   rate, train, interpret):
    return _cross_fwd(x, kv, pos, kpos, kmask, w, p, seed, nheads, l_valid,
                      rate, train, interpret)


def _cross_bwd_vjp(nheads, l_valid, rate, train, interpret, res, dy):
    x, kv, pos, kpos, kmask, w, p, seed = res
    b, lp, d = x.shape
    tp = kv.shape[1]
    kern = functools.partial(
        _cross_bwd_kernel, nheads=nheads, l_valid=l_valid, rate=rate,
        train=train,
    )
    (dx, dkv, dw, dp) = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[
                _sample_spec(lp, d),
                _sample_spec(tp, d),
                _const_spec(lp, d),
                _const_spec(tp, d),
                _sample_spec(1, tp),
                _const_spec(4 * d, d),
                _const_spec(8, d),
                _sample_spec(lp, d),
            ],
            out_specs=(
                _sample_spec(lp, d),
                _sample_spec(tp, d),
                _const_spec(4 * d, d),
                _const_spec(8, d),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, lp, d), x.dtype),
            jax.ShapeDtypeStruct((b, tp, d), x.dtype),
            jax.ShapeDtypeStruct((4 * d, d), jnp.float32),
            jax.ShapeDtypeStruct((8, d), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )(seed.reshape(1), x, kv, pos, kpos, kmask, w, p, dy.astype(x.dtype))
    return dx, dkv, None, None, None, dw.astype(w.dtype), dp, None


fused_cross_block.defvjp(_cross_fwd_vjp, _cross_bwd_vjp)


# ------------------------------------------------------------ public wrappers
def decoder_self_block(
    x, pos, wq, bq, wk, bk, wv, bv, wo, bo, g_pre, b_pre, g_post, b_post,
    seed, nheads: int, rate: float, train: bool, interpret: bool = False,
):
    """Fused pre-LN self-attention block (reference model/layers.py:313-318):
    ``x + drop(LN_post(OutProj(MHA(LN_pre(x)+pos, LN_pre(x)+pos, LN_pre(x)))))``.

    x [B, L, D]; pos [L, D]; dense kernels [D, D] (flax layout, y = x @ W);
    1-D biases/affines.  L is padded to the bf16 sublane multiple here and
    sliced back; the kernel masks padded keys and zeroes padded rows.
    """
    b, l, d = x.shape
    lp = _pad_to(max(l, 16), 16)
    xp = jnp.pad(x, ((0, 0), (0, lp - l), (0, 0))) if lp != l else x
    posp = _pad_rows(pos.astype(x.dtype), lp)
    w = _pack_weights(wq, wk, wv, wo, x.dtype)
    p = _pack_params(bq, bk, bv, bo, g_pre, b_pre, g_post, b_post)
    y = fused_self_block(
        xp, posp, w, p, seed, nheads, l, float(rate), bool(train), interpret
    )
    return y[:, :l] if lp != l else y


def decoder_cross_block(
    x, txt, pos, tpos, pad_mask,
    wq, bq, wk, bk, wv, bv, wo, bo, g_pre, b_pre, g_post, b_post,
    seed, nheads: int, rate: float, train: bool, interpret: bool = False,
):
    """Fused pre-LN cross-attention block (reference model/layers.py:320-326):
    queries from LN_pre(x)+pos, keys from txt+tpos, values from txt;
    ``pad_mask`` [B, T] bool (True = ignore key) or None.
    """
    b, l, d = x.shape
    t = txt.shape[1]
    lp = _pad_to(max(l, 16), 16)
    tp = _pad_to(max(t, 16), 16)
    xp = jnp.pad(x, ((0, 0), (0, lp - l), (0, 0))) if lp != l else x
    kvp = jnp.pad(txt, ((0, 0), (0, tp - t), (0, 0))) if tp != t else txt
    posp = _pad_rows(pos.astype(x.dtype), lp)
    tposp = _pad_rows(tpos.astype(x.dtype), tp)
    valid = (jnp.arange(tp) < t)[None, :]
    if pad_mask is not None:
        pm = jnp.pad(
            pad_mask.astype(bool), ((0, 0), (0, tp - t)), constant_values=True
        )
        valid = valid & ~pm
    kmask = jnp.broadcast_to(
        jnp.where(valid, 0.0, _NEG).astype(jnp.float32)[:, None, :],
        (b, 1, tp),
    )
    w = _pack_weights(wq, wk, wv, wo, x.dtype)
    p = _pack_params(bq, bk, bv, bo, g_pre, b_pre, g_post, b_post)
    y = fused_cross_block(
        xp, kvp.astype(x.dtype), posp, tposp, kmask, w, p, seed, nheads, l,
        float(rate), bool(train), interpret,
    )
    return y[:, :l] if lp != l else y
