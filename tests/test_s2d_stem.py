"""Space-to-depth stem equivalence: same parameters, same math.

The s2d stem (ops/s2d.py, ModifiedResNet._stem_s2d) must share the exact
parameter/stats tree with the plain stem and reproduce its outputs,
gradients, and BatchNorm statistics (identical tap sums; only summation
order differs, so float32 tolerance is ~1e-5)."""

import numpy as np

import jax
import jax.numpy as jnp

from crog_tpu.models.clip import ModifiedResNet
from crog_tpu.ops.s2d import (
    block_kernel_s1,
    block_kernel_s2,
    block_mean,
    depth_to_space,
    space_to_depth,
)


def test_space_to_depth_roundtrip():
    x = jnp.asarray(np.random.randn(2, 8, 12, 3).astype(np.float32))
    assert np.array_equal(depth_to_space(space_to_depth(x, 4), 4), x)
    assert np.array_equal(depth_to_space(space_to_depth(x, 2), 2), x)


def test_blocked_kernels_match_plain_convs():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 16, 3).astype(np.float32))
    conv = lambda v, k, s, p: jax.lax.conv_general_dilated(
        v, k, (s, s), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # stride-2 under 4x blocking
    w = jnp.asarray(rng.randn(3, 3, 3, 5).astype(np.float32))
    ref = conv(x, w, 2, 1)  # [2, 8, 8, 5]
    got = jax.lax.conv_general_dilated(
        space_to_depth(x, 4), block_kernel_s2(w), (1, 1),
        ((1, 0), (1, 0)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # [2, 4, 4, 20]
    np.testing.assert_allclose(
        depth_to_space(got, 2), ref, rtol=1e-5, atol=1e-5
    )
    # stride-1 under 2x blocking
    w1 = jnp.asarray(rng.randn(3, 3, 5, 7).astype(np.float32))
    ref1 = conv(ref, w1, 1, 1)
    got1 = jax.lax.conv_general_dilated(
        got, block_kernel_s1(w1), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(
        depth_to_space(got1, 2), ref1, rtol=1e-5, atol=1e-5
    )
    # block_mean == avg_pool 2
    import flax.linen as nn

    np.testing.assert_allclose(
        block_mean(got1, 7), nn.avg_pool(ref1, (2, 2), strides=(2, 2)),
        rtol=1e-5, atol=1e-5,
    )


def _models(width=8):
    kw = dict(
        layers=(1, 1, 1, 1), output_dim=32, heads=4, input_resolution=32,
        width=width,
    )
    return (
        ModifiedResNet(stem_s2d=False, **kw),
        ModifiedResNet(stem_s2d=True, **kw),
    )


def test_stem_s2d_same_params_and_forward():
    plain, s2d = _models()
    x = jnp.asarray(np.random.RandomState(1).randn(2, 32, 32, 3).astype(np.float32))
    v_plain = plain.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    v_s2d = s2d.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    # identical trees AND identical values (path-derived init rngs)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b), v_plain, v_s2d
    )
    out_p = plain.apply(v_plain, x, train=False)
    out_s = s2d.apply(v_plain, x, train=False)
    for a, b in zip(out_p, out_s):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)


def test_stem_s2d_train_stats():
    """Full-model train-mode batch statistics match tightly (they are direct
    reductions of the forward activations)."""
    plain, s2d = _models()
    x = jnp.asarray(np.random.RandomState(2).randn(2, 32, 32, 3).astype(np.float32))
    variables = plain.init({"params": jax.random.PRNGKey(0)}, x, train=False)

    def stats(model):
        _, mut = model.apply(
            variables, x, train=True, mutable=["batch_stats"]
        )
        return mut["batch_stats"]

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5),
        stats(plain), stats(s2d),
    )


def test_stem_s2d_grads_float64():
    """Gradient equivalence proven in float64, where summation-order noise
    vanishes.  (In float32 the comparison is meaningless: the toy model's
    late stages normalize over 2 samples per channel, and mere reassociation
    of the PLAIN model — a reversed batch — already shifts grads by ~0.3
    absolute through the BN rsqrt backward.)"""
    with jax.enable_x64():
        kw = dict(
            layers=(1, 1, 1, 1), output_dim=32, heads=4, input_resolution=32,
            width=8, dtype=jnp.float64,
        )
        plain = ModifiedResNet(stem_s2d=False, **kw)
        s2d = ModifiedResNet(stem_s2d=True, **kw)
        x = jnp.asarray(np.random.RandomState(2).randn(2, 32, 32, 3))
        variables = plain.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        variables = jax.tree_util.tree_map(
            lambda v: jnp.asarray(np.asarray(v), jnp.float64), variables
        )

        def grads(model):
            def f(p):
                (x2, x3, x4), _ = model.apply(
                    {"params": p, "batch_stats": variables["batch_stats"]},
                    x, train=True, mutable=["batch_stats"],
                )
                return jnp.mean(x2**2) + jnp.mean(x3**2) + jnp.mean(x4**2)

            return jax.grad(f)(variables["params"])

        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-7, atol=1e-10
            ),
            grads(plain), grads(s2d),
        )


def test_stem_s2d_falls_back_on_indivisible_input():
    """Inputs whose H/W are not multiples of 4 silently use the plain stem
    (same parameters, so the result is identical up to conv reassociation)."""
    kw = dict(layers=(1, 1, 1, 1), output_dim=32, heads=4,
              input_resolution=64, width=8)
    s2d = ModifiedResNet(stem_s2d=True, **kw)
    plain = ModifiedResNet(stem_s2d=False, **kw)
    # 66 is even but NOT a multiple of 4 -> the s2d flag must fall back
    x66 = jnp.asarray(np.random.RandomState(5).randn(1, 66, 66, 3).astype(np.float32))
    v = plain.init({"params": jax.random.PRNGKey(0)}, x66, train=False)
    out_s = s2d.apply(v, x66, train=False)
    out_p = plain.apply(v, x66, train=False)
    for a, b in zip(out_p, out_s):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
