"""Fused FFN kernel (ops/pallas_ffn) vs the plain chain, interpret mode.

Covers forward parity, gradients of every operand (custom VJP incl. the
in-kernel bias/affine accumulators and the XLA weight-grad GEMMs), and the
padded-tail path.  Dropout draws come from the Pallas PRNG, so parity runs
with dropout disabled (the non-TPU model path keeps flax Dropout)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crog_tpu.ops.pallas_ffn import fused_ffn


def _plain(x, w1, b1, g, be, w2, b2, eps=1e-5):
    h = jnp.maximum(x @ w1 + b1, 0)
    mu = h.mean(-1, keepdims=True)
    var = jnp.maximum(0.0, (h * h).mean(-1, keepdims=True) - mu * mu)
    hn = (h - mu) * jax.lax.rsqrt(var + eps) * g + be
    return hn @ w2 + b2


def _data(m=512, d=128, hdim=256, seed=0):
    r = np.random.RandomState(seed)
    return (
        jnp.asarray(r.randn(m, d).astype(np.float32) * 0.5),
        jnp.asarray(r.randn(d, hdim).astype(np.float32) * 0.05),
        jnp.asarray(r.randn(hdim).astype(np.float32) * 0.1),
        jnp.asarray(1.0 + 0.1 * r.randn(hdim).astype(np.float32)),
        jnp.asarray(0.1 * r.randn(hdim).astype(np.float32)),
        jnp.asarray(r.randn(hdim, d).astype(np.float32) * 0.05),
        jnp.asarray(r.randn(d).astype(np.float32) * 0.1),
    )


SEED = jnp.zeros((), jnp.int32)


def test_forward_matches_plain_chain():
    args = _data()
    y = fused_ffn(*args, SEED, 0.1, False, 1e-5, True)
    ref = _plain(*args)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=2e-5)


def test_forward_padded_tail():
    args = _data(m=300)
    y = fused_ffn(*args, SEED, 0.0, False, 1e-5, True)
    ref = _plain(*args)
    assert y.shape == (300, 128)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=2e-5)


def test_grads_match_plain_chain():
    args = _data(m=512)
    cot = jnp.asarray(
        np.random.RandomState(9).randn(512, 128).astype(np.float32)
    )

    def loss_fused(*a):
        return jnp.vdot(fused_ffn(*a, SEED, 0.1, False, 1e-5, True), cot)

    def loss_plain(*a):
        return jnp.vdot(_plain(*a), cot)

    gf = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    gp = jax.grad(loss_plain, argnums=tuple(range(7)))(*args)
    names = ["x", "w1", "b1", "gamma", "beta", "w2", "b2"]
    for n, a, b in zip(names, gf, gp):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4, err_msg=n
        )


def test_grads_padded_tail():
    args = _data(m=300)
    cot = jnp.asarray(
        np.random.RandomState(3).randn(300, 128).astype(np.float32)
    )
    gf = jax.grad(
        lambda *a: jnp.vdot(fused_ffn(*a, SEED, 0.0, False, 1e-5, True), cot),
        argnums=tuple(range(7)),
    )(*args)
    gp = jax.grad(
        lambda *a: jnp.vdot(_plain(*a), cot), argnums=tuple(range(7))
    )(*args)
    for a, b in zip(gf, gp):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
        )
