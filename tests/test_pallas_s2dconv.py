"""Parity of the gathered blocked-conv Pallas kernel (ops/pallas_s2dconv)
against the XLA zero-embedded blocked conv it replaces (ops/s2d
block_kernel_s1), in interpret mode on CPU: forward, input grads, weight
grads, and both VMEM-split paths."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crog_tpu.ops import pallas_s2dconv as psc
from crog_tpu.ops.s2d import block_kernel_s1


def _ref_conv(x, w):
    """The XLA path: conv with the zero-embedded blocked kernel."""
    return jax.lax.conv_general_dilated(
        x, block_kernel_s1(w).astype(x.dtype),
        window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _rand(rs, *shape):
    return jnp.asarray(rs.randn(*shape).astype(np.float32))


@pytest.mark.parametrize("b,h,wd,ci,co", [(2, 8, 8, 8, 16), (1, 13, 5, 4, 4)])
def test_forward_matches_xla_blocked_conv(b, h, wd, ci, co):
    rs = np.random.RandomState(0)
    x = _rand(rs, b, h, wd, 4 * ci)
    w = _rand(rs, 3, 3, ci, co) * 0.2
    got = psc.blocked_conv3x3_s1(x, w, True)
    ref = _ref_conv(x, w)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_grads_match_xla_blocked_conv():
    rs = np.random.RandomState(1)
    x = _rand(rs, 2, 6, 10, 4 * 8)
    w = _rand(rs, 3, 3, 8, 8) * 0.2
    g = _rand(rs, 2, 6, 10, 4 * 8)  # cotangent weights for a scalar loss

    def loss(f):
        return lambda x, w: jnp.sum(f(x, w) * g)

    fused = functools.partial(psc.blocked_conv3x3_s1, interpret=True)
    dx_f, dw_f = jax.grad(loss(fused), argnums=(0, 1))(x, w)
    dx_r, dw_r = jax.grad(loss(_ref_conv), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(
        np.asarray(dx_f), np.asarray(dx_r), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(dw_f), np.asarray(dw_r), rtol=1e-5, atol=1e-4
    )


def test_bf16_forward_close():
    rs = np.random.RandomState(2)
    x = _rand(rs, 1, 8, 8, 4 * 8).astype(jnp.bfloat16)
    w = _rand(rs, 3, 3, 8, 8) * 0.2
    got = psc.blocked_conv3x3_s1(x, w, True)
    assert got.dtype == jnp.bfloat16
    ref = _ref_conv(x, w)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_output_column_split_path(monkeypatch):
    """Force the n-split (output/weight column) path."""
    monkeypatch.setattr(psc, "_FORCE_SPLIT", "n")
    rs = np.random.RandomState(3)
    x = _rand(rs, 1, 4, 6, 4 * 2)
    w = _rand(rs, 3, 3, 2, 64) * 0.2
    got = psc.blocked_conv3x3_s1(x, w, True)
    ref = _ref_conv(x, w)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_input_channel_split_path(monkeypatch):
    """Force the k-split (dy slot-pair) path."""
    monkeypatch.setattr(psc, "_FORCE_SPLIT", "k")
    rs = np.random.RandomState(4)
    x = _rand(rs, 1, 4, 6, 4 * 64)
    w = _rand(rs, 3, 3, 64, 2) * 0.1
    got = psc.blocked_conv3x3_s1(x, w, True)
    ref = _ref_conv(x, w)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_split_paths_grads(monkeypatch):
    """Gradients through the split paths (k-split fwd/dgrad, wgrad column
    split — _FORCE_SPLIT maps any non-"none" force to "n" in the wgrad)."""
    monkeypatch.setattr(psc, "_FORCE_SPLIT", "k")
    rs = np.random.RandomState(5)
    x = _rand(rs, 1, 4, 4, 4 * 64)
    w = _rand(rs, 3, 3, 64, 64) * 0.05
    g = _rand(rs, 1, 4, 4, 4 * 64)

    def loss(f):
        return lambda x, w: jnp.sum(f(x, w) * g)

    fused = functools.partial(psc.blocked_conv3x3_s1, interpret=True)
    dx_f, dw_f = jax.grad(loss(fused), argnums=(0, 1))(x, w)
    dx_r, dw_r = jax.grad(loss(_ref_conv), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(
        np.asarray(dx_f), np.asarray(dx_r), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(dw_f), np.asarray(dw_r), rtol=1e-5, atol=1e-4
    )


def test_pack_unpack_adjoint():
    """unpack_s1 is the exact adjoint of pack_s1: <pack(w), g> == <w,
    unpack(g)> for random w, g."""
    rs = np.random.RandomState(6)
    ci, co = 3, 5
    w = _rand(rs, 3, 3, ci, co)
    gp = _rand(rs, 16 * ci, 4 * co)
    lhs = jnp.sum(psc.pack_s1(w) * gp)
    rhs = jnp.sum(w * psc.unpack_s1(gp, ci, co))
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-5)


def test_stem_module_fused_matches_xla(monkeypatch):
    """ModifiedResNet's s2d stem with the gathered Pallas convs (backend
    monkeypatched to "tpu", kernels in interpret mode) against the XLA
    blocked-conv stem with the SAME params — wiring proof, fwd + grads."""
    import flax.linen as nn

    from crog_tpu.models.clip import ModifiedResNet

    class StemOnly(ModifiedResNet):
        @nn.compact
        def __call__(self, x, train=False):
            return self._stem_s2d(x, train)

    stem = StemOnly(layers=(1, 1, 1, 1), output_dim=64, heads=4,
                    input_resolution=16, width=64, stem_s2d=True)
    rs = np.random.RandomState(7)
    x = _rand(rs, 2, 16, 16, 3)
    variables = stem.init({"params": jax.random.PRNGKey(0)}, x, train=True)

    def run(params):
        y, mut = stem.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )
        return y, mut

    ref_y, ref_mut = run(variables["params"])
    ref_g = jax.grad(lambda p: jnp.sum(run(p)[0] ** 2))(variables["params"])

    orig = psc.blocked_conv3x3_s1
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(
        psc, "blocked_conv3x3_s1", lambda x, w: orig(x, w, True)
    )
    got_y, got_mut = run(variables["params"])
    got_g = jax.grad(lambda p: jnp.sum(run(p)[0] ** 2))(variables["params"])

    np.testing.assert_allclose(
        np.asarray(got_y), np.asarray(ref_y), rtol=1e-4, atol=1e-4
    )
    for name in ("bn2", "bn3"):
        np.testing.assert_allclose(
            np.asarray(got_mut["batch_stats"][name]["mean"]),
            np.asarray(ref_mut["batch_stats"][name]["mean"]),
            rtol=1e-4, atol=1e-5, err_msg=name,
        )
    flat_g, _ = jax.tree_util.tree_flatten_with_path(got_g)
    flat_r = dict(jax.tree_util.tree_flatten_with_path(ref_g)[0])
    for path, leaf in flat_g:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_r[path]),
            rtol=2e-4, atol=2e-4, err_msg=str(path),
        )
