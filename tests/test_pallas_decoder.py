"""Fused decoder attention blocks (ops/pallas_decoder) vs the plain chain.

Kernel-level: forward + full-operand gradient parity for the self and cross
blocks in interpret mode, including padded tails (L, T not sublane
multiples) and key-padding masks.  Module-level: TransformerDecoderLayer's
fused path (backend monkeypatched to "tpu", kernels in interpret mode)
against its unfused flax path with the SAME parameter tree — proving the
_MHAParams/_LNShell shells wire every weight to the right slot.  Dropout
draws come from the Pallas PRNG, so parity runs with dropout inactive, like
the FFN kernel tests."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crog_tpu.ops.pallas_decoder import decoder_cross_block, decoder_self_block

SEED = jnp.zeros((), jnp.int32)
NH = 4
D = 128


def _ln(x, g, b, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = jnp.maximum(0.0, (x * x).mean(-1, keepdims=True) - mu * mu)
    return (x - mu) * jax.lax.rsqrt(var + eps) * g + b


def _mha(q, k, v, nheads, mask_add=None):
    b, lq, d = q.shape
    lk = k.shape[1]
    dh = d // nheads
    qh = q.reshape(b, lq, nheads, dh).transpose(0, 2, 1, 3)
    kh = k.reshape(b, lk, nheads, dh).transpose(0, 2, 1, 3)
    vh = v.reshape(b, lk, nheads, dh).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) * dh**-0.5
    if mask_add is not None:
        s = s + mask_add[:, None, None, :]
    p = jax.nn.softmax(s, -1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
    return o.transpose(0, 2, 1, 3).reshape(b, lq, d)


def _plain_self(x, pos, wq, bq, wk, bk, wv, bv, wo, bo, g1, be1, gs, bs):
    xl = _ln(x, g1, be1)
    qin = xl + pos[None]
    q, k, v = qin @ wq + bq, qin @ wk + bk, xl @ wv + bv
    o = _mha(q, k, v, NH)
    return x + _ln(o @ wo + bo, gs, bs)


def _plain_cross(x, kv, pos, kpos, pad,
                 wq, bq, wk, bk, wv, bv, wo, bo, g1, be1, gs, bs):
    xl = _ln(x, g1, be1)
    q = (xl + pos[None]) @ wq + bq
    k = (kv + kpos[None]) @ wk + bk
    v = kv @ wv + bv
    mask_add = jnp.where(pad, -1e30, 0.0)
    o = _mha(q, k, v, NH, mask_add)
    return x + _ln(o @ wo + bo, gs, bs)


def _weights(seed=0):
    r = np.random.RandomState(seed)
    j = lambda *s: jnp.asarray(r.randn(*s).astype(np.float32) * 0.06)
    ws = []
    for _ in range(4):
        ws += [j(D, D), j(D)]
    affines = [
        jnp.asarray(1.0 + 0.1 * r.randn(D).astype(np.float32)),
        jnp.asarray(0.1 * r.randn(D).astype(np.float32)),
        jnp.asarray(1.0 + 0.1 * r.randn(D).astype(np.float32)),
        jnp.asarray(0.1 * r.randn(D).astype(np.float32)),
    ]
    return tuple(ws) + tuple(affines)


def _acts(b=2, l=20, t=17, seed=1):
    r = np.random.RandomState(seed)
    x = jnp.asarray(r.randn(b, l, D).astype(np.float32) * 0.5)
    kv = jnp.asarray(r.randn(b, t, D).astype(np.float32) * 0.5)
    pos = jnp.asarray(r.randn(l, D).astype(np.float32) * 0.3)
    kpos = jnp.asarray(r.randn(t, D).astype(np.float32) * 0.3)
    pad = jnp.asarray(r.rand(b, t) > 0.7)
    return x, kv, pos, kpos, pad


@pytest.mark.parametrize("l", [20, 32])
def test_self_block_forward(l):
    x, _, pos, _, _ = _acts(l=l)
    w = _weights()
    y = decoder_self_block(x, pos, *w, SEED, NH, 0.1, False, True)
    ref = _plain_self(x, pos, *w)
    assert y.shape == x.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=3e-5)


def test_self_block_grads():
    x, _, pos, _, _ = _acts()
    w = _weights()
    cot = jnp.asarray(np.random.RandomState(7).randn(*x.shape).astype(np.float32))

    def lf(x, *w):
        return jnp.vdot(decoder_self_block(x, pos, *w, SEED, NH, 0.1, False,
                                           True), cot)

    def lp(x, *w):
        return jnp.vdot(_plain_self(x, pos, *w), cot)

    n = 1 + len(w)
    gf = jax.grad(lf, argnums=tuple(range(n)))(x, *w)
    gp = jax.grad(lp, argnums=tuple(range(n)))(x, *w)
    names = ["x"] + [f"w{i}" for i in range(len(w))]
    for nm, a, b in zip(names, gf, gp):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4, err_msg=nm
        )


@pytest.mark.parametrize("mask", [False, True])
def test_cross_block_forward(mask):
    x, kv, pos, kpos, pad = _acts()
    w = _weights(2)
    pm = pad if mask else None
    y = decoder_cross_block(x, kv, pos, kpos, pm, *w, SEED, NH, 0.1, False,
                            True)
    ref = _plain_cross(x, kv, pos, kpos,
                       pad if mask else jnp.zeros_like(pad), *w)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=3e-5)


def test_cross_block_grads():
    x, kv, pos, kpos, pad = _acts()
    w = _weights(2)
    cot = jnp.asarray(np.random.RandomState(8).randn(*x.shape).astype(np.float32))

    def lf(x, kv, *w):
        return jnp.vdot(
            decoder_cross_block(x, kv, pos, kpos, pad, *w, SEED, NH, 0.1,
                                False, True), cot)

    def lp(x, kv, *w):
        return jnp.vdot(_plain_cross(x, kv, pos, kpos, pad, *w), cot)

    n = 2 + len(w)
    gf = jax.grad(lf, argnums=tuple(range(n)))(x, kv, *w)
    gp = jax.grad(lp, argnums=tuple(range(n)))(x, kv, *w)
    names = ["x", "kv"] + [f"w{i}" for i in range(len(w))]
    for nm, a, b in zip(names, gf, gp):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4, err_msg=nm
        )


def test_decoder_layer_fused_matches_unfused(monkeypatch):
    """The flax module's fused path (shells + kernels) against its unfused
    path with the SAME params — wiring/tree-compat proof."""
    import crog_tpu.ops.pallas_decoder as pd
    import crog_tpu.ops.pallas_ffn as pf
    from crog_tpu.models import layers as L

    dec = L.TransformerDecoder(
        num_layers=2, d_model=D, nhead=NH, dim_ffn=2 * D, dropout=0.1
    )
    r = np.random.RandomState(3)
    vis = jnp.asarray(r.randn(2, 4, 5, D).astype(np.float32) * 0.5)
    txt = jnp.asarray(r.randn(2, 17, D).astype(np.float32) * 0.5)
    pad = jnp.asarray(r.rand(2, 17) > 0.7)
    params = dec.init(jax.random.PRNGKey(0), vis, txt, pad, False)
    ref = dec.apply(params, vis, txt, pad, False)

    orig_self, orig_cross, orig_ffn = (
        pd.decoder_self_block, pd.decoder_cross_block, pf.fused_ffn
    )
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(
        pd, "decoder_self_block",
        lambda *a: orig_self(*a, interpret=True),
    )
    monkeypatch.setattr(
        pd, "decoder_cross_block",
        lambda *a: orig_cross(*a, interpret=True),
    )
    monkeypatch.setattr(
        pf, "fused_ffn", lambda *a: orig_ffn(*a, 1e-5, True)
    )
    fused = dec.apply(params, vis, txt, pad, False)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), atol=5e-5
    )


def test_decoder_layer_fused_grads_match(monkeypatch):
    """Parameter gradients through the fused module path match the unfused
    path (exercises both custom VJPs end-to-end through the shells)."""
    import crog_tpu.ops.pallas_decoder as pd
    import crog_tpu.ops.pallas_ffn as pf
    from crog_tpu.models import layers as L

    dec = L.TransformerDecoder(
        num_layers=1, d_model=D, nhead=NH, dim_ffn=2 * D, dropout=0.1
    )
    r = np.random.RandomState(4)
    vis = jnp.asarray(r.randn(1, 3, 4, D).astype(np.float32) * 0.5)
    txt = jnp.asarray(r.randn(1, 9, D).astype(np.float32) * 0.5)
    pad = jnp.asarray(r.rand(1, 9) > 0.7)
    params = dec.init(jax.random.PRNGKey(1), vis, txt, pad, False)
    cot = jnp.asarray(r.randn(1, 3, 4, D).astype(np.float32))

    def loss(p):
        return jnp.vdot(dec.apply(p, vis, txt, pad, False), cot)

    g_ref = jax.grad(loss)(params)

    orig_self, orig_cross, orig_ffn = (
        pd.decoder_self_block, pd.decoder_cross_block, pf.fused_ffn
    )
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(
        pd, "decoder_self_block", lambda *a: orig_self(*a, interpret=True)
    )
    monkeypatch.setattr(
        pd, "decoder_cross_block", lambda *a: orig_cross(*a, interpret=True)
    )
    monkeypatch.setattr(pf, "fused_ffn", lambda *a: orig_ffn(*a, 1e-5, True))
    g_fused = jax.grad(loss)(params)

    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_fused = jax.tree_util.tree_leaves_with_path(g_fused)
    assert len(flat_ref) == len(flat_fused)
    for (pa, a), (pb, b) in zip(flat_ref, flat_fused):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=4e-4, atol=4e-4,
            err_msg=jax.tree_util.keystr(pa),
        )
