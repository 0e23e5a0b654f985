"""Dynamic group conv: fused (vis_out folded) vs explicit formulations.

The projector's 1x1 vis_out conv and the per-sample dynamic conv are both
linear in the channel axis, so dynamic_group_conv_fused(X, Wv, bv, wk, b)
must equal dynamic_group_conv(conv1x1(X, Wv, bv), wk, b) — and both must
equal the reference's grouped-conv semantics (torch F.conv2d groups=B,
model/layers.py:95-123), checked here against an explicit loop."""

import numpy as np

import jax.numpy as jnp

from crog_tpu.ops.dynconv import dynamic_group_conv, dynamic_group_conv_fused


def _data(b=2, h=6, w=7, j=5, c=4, t=3, k=3, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(b, h, w, j).astype(np.float32)
    wv = rng.randn(1, 1, j, t * c).astype(np.float32)
    bv = rng.randn(t * c).astype(np.float32)
    wk = rng.randn(b, c, k, k).astype(np.float32)
    bias = rng.randn(b).astype(np.float32)
    return x, wv, bv, wk, bias


def _explicit_reference(x, wv, bv, wk, bias, t):
    """Grouped-conv semantics, straight loops (cross-correlation, zero pad)."""
    b, h, w, j = x.shape
    c = wk.shape[1]
    k = wk.shape[-1]
    r = k // 2
    xv = np.einsum("bhwj,jo->bhwo", x, wv[0, 0]) + bv  # 1x1 conv
    xv = xv.reshape(b, h, w, t, c)
    xp = np.pad(xv, ((0, 0), (r, r), (r, r), (0, 0), (0, 0)))
    out = np.zeros((b, h, w, t), np.float64)
    for bi in range(b):
        for ky in range(k):
            for kx in range(k):
                out[bi] += np.einsum(
                    "hwtc,c->hwt",
                    xp[bi, ky : ky + h, kx : kx + w], wk[bi, :, ky, kx],
                )
        out[bi] += bias[bi]
    return out.astype(np.float32)


def test_fused_matches_explicit_chain():
    x, wv, bv, wk, bias, t = (*_data(), 3)
    xv = np.einsum("bhwj,jo->bhwo", x, wv[0, 0]) + bv
    chain = dynamic_group_conv(
        jnp.asarray(xv), jnp.asarray(wk), jnp.asarray(bias), t
    )
    fused = dynamic_group_conv_fused(
        jnp.asarray(x), jnp.asarray(wv), jnp.asarray(bv), jnp.asarray(wk),
        jnp.asarray(bias), t,
    )
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(chain), rtol=2e-5, atol=2e-5
    )


def test_fused_matches_grouped_conv_semantics():
    x, wv, bv, wk, bias, t = (*_data(seed=1), 3)
    ref = _explicit_reference(x, wv, bv, wk, bias, t)
    fused = dynamic_group_conv_fused(
        jnp.asarray(x), jnp.asarray(wv), jnp.asarray(bv), jnp.asarray(wk),
        jnp.asarray(bias), t,
    )
    np.testing.assert_allclose(np.asarray(fused), ref, rtol=2e-5, atol=2e-5)


def test_single_task():
    x, wv, bv, wk, bias = _data(t=1 * 0 + 2, j=4, c=3)[:5]
    # rebuild consistent single-task shapes
    rng = np.random.RandomState(3)
    b, h, w, j, c, k = 2, 5, 5, 4, 3, 3
    x = rng.randn(b, h, w, j).astype(np.float32)
    wv = rng.randn(1, 1, j, c).astype(np.float32)
    bv = rng.randn(c).astype(np.float32)
    wk = rng.randn(b, c, k, k).astype(np.float32)
    bias = rng.randn(b).astype(np.float32)
    ref = _explicit_reference(x, wv, bv, wk, bias, 1)
    fused = dynamic_group_conv_fused(
        jnp.asarray(x), jnp.asarray(wv), jnp.asarray(bv), jnp.asarray(wk),
        jnp.asarray(bias), 1,
    )
    np.testing.assert_allclose(np.asarray(fused), ref, rtol=2e-5, atol=2e-5)
