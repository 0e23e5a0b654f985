"""Fused Pallas attention vs the plain XLA formulation (interpret mode on the
CPU test mesh): forward values and gradients must match."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crog_tpu.ops.pallas_attention import fused_self_attention


def _reference(q, k, v, scale):
    s = jnp.einsum("bld,bmd->blm", q, k).astype(jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("blm,bmd->bld", p.astype(v.dtype), v)


@pytest.mark.parametrize("l,d", [(676, 64), (169, 64), (100, 32)])
def test_fused_attention_forward_matches_xla(l, d):
    rng = np.random.RandomState(0)
    bh = 4
    q = jnp.asarray(rng.randn(bh, l, d).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.randn(bh, l, d).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(bh, l, d).astype(np.float32))
    scale = 1.0 / np.sqrt(d)
    ref = _reference(q, k, v, scale)
    got = fused_self_attention(q, k, v, scale, True)  # interpret mode
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)


def test_fused_attention_grads_match_xla():
    rng = np.random.RandomState(1)
    bh, l, d = 2, 76, 32
    q = jnp.asarray(rng.randn(bh, l, d).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.randn(bh, l, d).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(bh, l, d).astype(np.float32))
    scale = 1.0 / np.sqrt(d)
    w = jnp.asarray(rng.randn(bh, l, d).astype(np.float32))

    def loss_ref(q, k, v):
        return jnp.sum(_reference(q, k, v, scale) * w)

    def loss_fused(q, k, v):
        return jnp.sum(fused_self_attention(q, k, v, scale, True) * w)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ref, g_fused, "qkv"):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-5, rtol=5e-5,
            err_msg=f"d{name} mismatch",
        )
