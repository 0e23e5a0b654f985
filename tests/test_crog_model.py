import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crog_tpu.models.crog import CROG, crog_losses


SMALL = dict(
    input_resolution=128,
    vision_layers=(1, 1, 1, 1),
    transformer_layers=2,
    num_layers=1,
    dtype=jnp.float32,
)


@pytest.fixture(scope="module")
def small_crog():
    # small layer counts keep CPU test time sane; shapes scale with input/32
    model = CROG(**SMALL)
    img = jnp.zeros((2, 128, 128, 3), jnp.float32)
    word = jnp.zeros((2, 17), jnp.int32).at[:, 0].set(49406).at[:, 3].set(49407)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)}, img, word, train=False
    )
    return model, variables, img, word


def test_forward_shapes(small_crog):
    model, variables, img, word = small_crog
    preds = model.apply(variables, img, word, train=False)
    # 5 task maps at input/4
    assert preds.shape == (2, 32, 32, 5)
    assert preds.dtype == jnp.float32
    assert np.isfinite(np.asarray(preds)).all()


def test_batch_stats_collection_exists(small_crog):
    _, variables, _, _ = small_crog
    assert "batch_stats" in variables
    # BN stats exist for backbone stem
    bs = variables["batch_stats"]
    assert "backbone" in bs and "neck" in bs


def test_train_mode_updates_stats_and_losses(small_crog):
    model, variables, img, word = small_crog
    preds, mutated = model.apply(
        variables,
        img,
        word,
        train=True,
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert preds.shape == (2, 32, 32, 5)
    targets = {
        "mask": jnp.zeros((2, 128, 128)).at[:, 30:60, 40:80].set(1.0),
        "qua": jnp.zeros((2, 128, 128)),
        "sin": jnp.zeros((2, 128, 128)),
        "cos": jnp.ones((2, 128, 128)),
        "wid": jnp.zeros((2, 128, 128)),
    }
    total, loss_dict = crog_losses(preds, targets)
    assert np.isfinite(float(total))
    assert set(loss_dict) == {"m_ins", "m_qua", "m_sin", "m_cos", "m_wid"}
    assert float(total) == pytest.approx(
        sum(float(v) for v in loss_dict.values()), rel=1e-5
    )


def test_ablation_variants():
    img = jnp.zeros((1, 128, 128, 3), jnp.float32)
    word = jnp.zeros((1, 17), jnp.int32).at[:, 0].set(49406).at[:, 2].set(49407)
    no_dec = CROG(**{**SMALL, "use_contrastive": False})
    init = lambda m: jax.jit(m.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)}, img, word, train=False
    )
    v = init(no_dec)
    assert "decoder" not in v["params"]
    assert no_dec.apply(v, img, word, train=False).shape == (1, 32, 32, 5)

    no_grasp = CROG(**{**SMALL, "use_grasp_masks": False})
    v = init(no_grasp)
    assert no_grasp.apply(v, img, word, train=False).shape == (1, 32, 32, 1)


def test_weighted_bce_matches_torch():
    import torch
    import torch.nn.functional as F

    from crog_tpu.models.crog import smooth_l1, weighted_bce_with_logits

    rng = np.random.RandomState(0)
    logits = rng.randn(2, 16, 16).astype(np.float32)
    mask = (rng.rand(2, 16, 16) > 0.5).astype(np.float32)
    weight = mask * 0.5 + 1
    ref = F.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(mask),
        weight=torch.from_numpy(weight),
    ).item()
    got = float(weighted_bce_with_logits(logits, mask, weight))
    assert got == pytest.approx(ref, rel=1e-5)

    pred = rng.randn(2, 16, 16).astype(np.float32) * 3
    tgt = rng.randn(2, 16, 16).astype(np.float32)
    ref = F.smooth_l1_loss(torch.from_numpy(pred), torch.from_numpy(tgt)).item()
    assert float(smooth_l1(pred, tgt)) == pytest.approx(ref, rel=1e-5)
