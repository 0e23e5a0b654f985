"""End-to-end: synthetic data -> sharded batch over an 8-device mesh ->
jitted train step (grads, Adam, BN stats, metrics) -> jitted on-device eval
(upsample, inverse warp, peak detection) -> Jacquard metrics on host.

This exercises the data-parallel path the reference needed NCCL/DDP for
(train_crog.py:96-156): here the batch is sharded over the mesh's data axis
and XLA inserts the collectives.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crog_tpu.data.loader import DataLoader, device_put_crog
from crog_tpu.data.synthetic import SyntheticOCIDVLG
from crog_tpu.engine.crog_engine import (
    create_train_state,
    make_eval_step,
    make_train_step,
    validate_with_grasp,
)
from crog_tpu.engine.optim import make_optimizer
from crog_tpu.models.crog import CROG
from crog_tpu.parallel.mesh import data_sharding, get_mesh

pytestmark = pytest.mark.slow

SMALL = dict(
    input_resolution=128,
    vision_layers=(1, 1, 1, 1),
    transformer_layers=2,
    num_layers=1,
    dtype=jnp.float32,
)


@pytest.fixture(scope="module")
def setup():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    mesh = get_mesh()
    model = CROG(**SMALL)
    ds = SyntheticOCIDVLG(num_samples=16, input_size=128, ori_hw=(480, 640))
    sharding = data_sharding(mesh)
    loader = DataLoader(
        ds, batch_size=8, shuffle=True, drop_last=True, num_workers=2,
        device_put_fn=lambda b: device_put_crog(b, sharding),
    )
    batch = next(iter(loader))
    state = create_train_state(
        model,
        make_optimizer_for(model, batch),
        batch["img"],
        batch["word"],
        jax.random.PRNGKey(0),
    )
    return model, state, loader, batch


def make_optimizer_for(model, batch):
    variables = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)}, batch["img"], batch["word"],
            train=False,
        )
    )
    return make_optimizer(
        variables["params"], base_lr=1e-4, lr_multi=0.1, milestones=[35],
        lr_decay=0.1, steps_per_epoch=10,
    )


def test_train_step_runs_and_updates(setup):
    model, state, loader, batch = setup
    step = make_train_step(model, None)
    old_param = np.asarray(
        jax.tree_util.tree_leaves(state.params)[0]
    ).copy()
    # the step donates its input state; keep the fixture's copy alive for
    # the eval test
    state = jax.tree_util.tree_map(jnp.copy, state)
    state2, metrics = step(state, batch, jax.random.PRNGKey(1))
    m = jax.device_get(metrics)
    assert np.isfinite(m["loss"])
    assert 0.0 <= m["iou"] <= 100.0
    assert set(m) >= {"loss", "iou", "prec@50", "m_ins", "m_qua"}
    new_param = np.asarray(jax.tree_util.tree_leaves(state2.params)[0])
    assert not np.allclose(old_param, new_param)
    # second step with donated state
    state3, metrics2 = step(state2, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(jax.device_get(metrics2)["loss"]))


def test_batch_is_sharded_over_data_axis(setup):
    _, _, _, batch = setup
    sh = batch["img"].sharding
    assert "data" in str(sh.spec) or sh.num_devices == 8


def test_eval_pipeline_on_device(setup):
    model, state, loader, batch = setup
    eval_step = make_eval_step(model, input_size=128, ori_hw=(480, 640))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    out = eval_step(variables, batch)
    iou = np.asarray(out["iou"])
    assert iou.shape == (8,)
    assert ((iou >= 0) & (iou <= 1)).all()
    rects = np.asarray(out["rects"])
    assert rects.shape == (8, 5, 5)

    result = validate_with_grasp([batch], eval_step, variables)
    assert set(result) == {"iou", "prec", "j_index@1", "j_index@5"}
    assert 0 <= result["j_index@5"] <= 1
    assert len(result["prec"]) == 5


def test_compact_wire_format_train_and_eval(setup):
    """The compact uint8 batch must drive the same train/eval steps and give
    the same loss as the legacy float batch built from the same samples."""
    from crog_tpu.data.loader import device_put_crog
    from crog_tpu.parallel.mesh import data_sharding, get_mesh

    model, state, loader, batch = setup
    ds_c = SyntheticOCIDVLG(
        num_samples=16, input_size=128, ori_hw=(480, 640), compact=True
    )
    sharding = data_sharding(get_mesh())
    loader_c = DataLoader(
        ds_c, batch_size=8, shuffle=True, drop_last=True, num_workers=2,
        device_put_fn=lambda b: device_put_crog(b, sharding),
    )
    batch_c = next(iter(loader_c))
    assert batch_c["img_u8"].dtype == jnp.uint8

    step = make_train_step(model, None)
    state_l = jax.tree_util.tree_map(jnp.copy, state)
    state_c = jax.tree_util.tree_map(jnp.copy, state)
    _, m_legacy = step(state_l, batch, jax.random.PRNGKey(1))
    _, m_compact = step(state_c, batch_c, jax.random.PRNGKey(1))
    # same samples (loaders share seed/epoch), same rng -> same loss up to
    # the <=1 ulp sin/cos difference in the targets
    np.testing.assert_allclose(
        float(jax.device_get(m_compact["loss"])),
        float(jax.device_get(m_legacy["loss"])),
        rtol=1e-5,
    )

    eval_step = make_eval_step(model, input_size=128, ori_hw=(480, 640))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    out_l = eval_step(variables, batch)
    out_c = eval_step(variables, batch_c)
    np.testing.assert_allclose(
        np.asarray(out_c["iou"]), np.asarray(out_l["iou"]), atol=1e-6
    )
