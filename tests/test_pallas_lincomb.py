"""Fused lincomb grasp-loss kernel (ops/pallas_lincomb) vs the einsum path,
interpret mode: forward values and coefficient/prototype gradients."""

import numpy as np
import jax
import jax.numpy as jnp

from crog_tpu.models.ssg_loss import (
    _select_positives,
    lincomb_grasp_masks_loss,
)


def _inputs(seed=0, b=2, n=48, m=4, ph=16, pw=16, c=32, k=8):
    rng = np.random.RandomState(seed)
    protos = jnp.asarray(rng.randn(b, ph, pw, c).astype(np.float32) * 0.3)
    coef = jnp.asarray(rng.randn(b, n, 4, c).astype(np.float32) * 0.3)
    ds = {
        kk: jnp.asarray(rng.rand(b, m, 64, 64).astype(np.float32))
        for kk in ("qua", "sin", "cos", "wid")
    }
    a_i = jnp.asarray(rng.randint(0, m, (b, n)).astype(np.int32))
    lo = rng.rand(b, n, 2) * 0.6
    hi = lo + 0.2 + rng.rand(b, n, 2) * 0.2
    a_box = jnp.asarray(
        np.stack([lo[..., 0], lo[..., 1], hi[..., 0], hi[..., 1]], -1)
        .astype(np.float32)
    )
    pos = jnp.asarray(rng.rand(b, n) > 0.6)
    sel_idx, sel_valid, old_np, num_np = _select_positives(
        pos, jax.random.PRNGKey(3), k
    )
    return (coef, protos, ds, pos, a_i, a_box, sel_idx, sel_valid,
            old_np, num_np)


def _run(args, force_pallas):
    coef, protos, ds, pos, a_i, a_box, sel_idx, sel_valid, o, nn = args

    def f(coef, protos):
        out = lincomb_grasp_masks_loss(
            coef, protos, ds, pos, a_i, a_box, sel_idx, sel_valid, o, nn,
            force_pallas=force_pallas, interpret=True,
        )
        return sum(out.values()), out

    (total, out), grads = jax.value_and_grad(f, argnums=(0, 1),
                                             has_aux=True)(coef, protos)
    return out, grads


def test_lincomb_kernel_matches_einsum_path():
    args = _inputs()
    out_ref, (dc_ref, dp_ref) = _run(args, force_pallas=False)
    out_pal, (dc_pal, dp_pal) = _run(args, force_pallas=True)
    for kk in ("qua", "sin", "cos", "wid"):
        np.testing.assert_allclose(
            np.asarray(out_pal[kk]), np.asarray(out_ref[kk]),
            rtol=1e-4, atol=1e-6, err_msg=kk,
        )
    np.testing.assert_allclose(
        np.asarray(dc_pal), np.asarray(dc_ref), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(dp_pal), np.asarray(dp_ref), rtol=1e-4, atol=1e-6
    )


def test_lincomb_kernel_production_geometry_shapes():
    """544-config geometry (ph=pw=136, k=100) pads to lane multiples and
    still agrees on the forward (no grad — keep the CPU run fast)."""
    args = _inputs(seed=1, b=1, n=40, m=3, ph=34, pw=34, k=5)
    out_ref, _ = _run(args, force_pallas=False)
    out_pal, _ = _run(args, force_pallas=True)
    for kk in ("qua", "sin", "cos", "wid"):
        np.testing.assert_allclose(
            np.asarray(out_pal[kk]), np.asarray(out_ref[kk]),
            rtol=1e-4, atol=1e-6, err_msg=kk,
        )


def test_lincomb_kernel_bce_matches_mask_loss():
    """lincomb_mask_loss (T=1, BCE) through the kernel vs the vmapped
    einsum path: values and grads."""
    from crog_tpu.models.ssg_loss import lincomb_mask_loss

    rng = np.random.RandomState(4)
    b, n, m, ph, pw, c, k = 2, 48, 4, 16, 16, 32, 8
    protos = jnp.asarray(rng.randn(b, ph, pw, c).astype(np.float32) * 0.3)
    coef = jnp.asarray(rng.randn(b, n, c).astype(np.float32) * 0.3)
    masks = jnp.asarray((rng.rand(b, m, 64, 64) > 0.5).astype(np.float32))
    a_i = jnp.asarray(rng.randint(0, m, (b, n)).astype(np.int32))
    lo = rng.rand(b, n, 2) * 0.6
    hi = lo + 0.2 + rng.rand(b, n, 2) * 0.2
    a_box = jnp.asarray(
        np.stack([lo[..., 0], lo[..., 1], hi[..., 0], hi[..., 1]], -1)
        .astype(np.float32)
    )
    pos = jnp.asarray(rng.rand(b, n) > 0.6)
    sel_idx, sel_valid, old_np, num_np = _select_positives(
        pos, jax.random.PRNGKey(5), k
    )

    def run(force):
        def f(coef, protos):
            return lincomb_mask_loss(
                coef, protos, masks, pos, a_i, a_box, sel_idx, sel_valid,
                old_np, num_np, force_pallas=force, interpret=True,
            )
        return jax.value_and_grad(f, argnums=(0, 1))(coef, protos)

    v_ref, (dc_ref, dp_ref) = run(False)
    v_pal, (dc_pal, dp_pal) = run(True)
    np.testing.assert_allclose(
        float(v_pal), float(v_ref), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(dc_pal), np.asarray(dc_ref), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(dp_pal), np.asarray(dp_ref), rtol=1e-4, atol=1e-6
    )
