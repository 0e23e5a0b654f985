"""SSG raw wire format (crog_tpu.data.ssg_rawwire): device-side augment +
per-instance raster must match the legacy host pipeline (reference
utils/dataset.py:1069-1416 + utils/augmentation.py:7-165) given the same
drawn augmentation parameters."""

import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crog_tpu.data.ocid_grasp import collate_ssg
from crog_tpu.data.ssg_rawwire import (
    collate_ssg_raw,
    is_ssg_raw,
    unpack_ssg_raw,
)
from crog_tpu.data.synthetic_ssg import SyntheticOCIDGrasp, SyntheticOCIDGraspFrames

FRAME = (48, 64)
S = 64
M = 6


def _pair(split, i, seed=7):
    """Legacy and raw samples with the SAME drawn augmentation (the
    draw/apply split consumes the python random stream in the reference
    call order, so seeding before each getitem aligns them draw-for-draw)."""
    kw = dict(num_samples=4, frame_hw=FRAME, img_size=S, split=split)
    ds_l = SyntheticOCIDGraspFrames(**kw)
    ds_r = SyntheticOCIDGraspFrames(**kw, raw=True, max_objs=M, max_rects=4)
    random.seed(seed + i)
    s_l = ds_l[i]
    random.seed(seed + i)
    s_r = ds_r[i]
    return collate_ssg([s_l], max_objs=M), collate_ssg_raw([s_r])


@pytest.mark.parametrize("split", ["training_0", "validation_0"])
def test_unpack_ssg_raw_matches_legacy(split):
    for i in range(2):
        bl, br = _pair(split, i)
        assert is_ssg_raw(br) and not is_ssg_raw(bl)
        # collate ships only occupied slots (rounded to the chunk); the
        # unpack pads the dense layout back to max_objs
        assert br["obj_valid"].shape[1] <= M
        dense = {
            k: jnp.asarray(v) for k, v in br.items()
            if isinstance(v, np.ndarray)
        }
        out = jax.jit(lambda b: unpack_ssg_raw(b, S, pad_objs=M))(dense)
        # host-side arithmetic must agree exactly (boxes/labels/obj_valid
        # pass through the unpack and get instance-padded there)
        np.testing.assert_allclose(
            np.asarray(out["boxes"]), bl["boxes"], atol=1e-6
        )
        np.testing.assert_array_equal(np.asarray(out["labels"]), bl["labels"])
        np.testing.assert_array_equal(
            np.asarray(out["obj_valid"]), bl["obj_valid"]
        )
        # bit-exact planes: distort+pad+resize image, bit-unpacked masks,
        # sin (background 0 either way)
        for k, atol in (
            ("img", 2e-5), ("ins_masks", 2e-5),
            ("grasp_sin", 1e-3), ("grasp_cos", 1e-3),
            # qua/wid carry the documented uint8-quantization epsilon (the
            # host quantizes after raster+blur, the device stays fp32)
            ("grasp_qua", 2.5 / 255), ("grasp_wid", 2.5 / 255),
        ):
            d = np.abs(np.asarray(out[k]) - bl[k])
            assert d.max() < atol, (k, float(d.max()))


def test_ssg_raw_wire_is_much_smaller():
    bl, br = _pair("training_0", 0)
    nb = lambda b: sum(
        v.nbytes for v in b.values() if isinstance(v, np.ndarray)
    )
    # at production geometry (480x640 -> 544^2, max_objs 24) the ratio is
    # ~50x; at this test geometry still >5x
    assert nb(br) * 5 < nb(bl)


def test_ssg_raw_wire_production_bytes():
    """At OCID camera geometry the wire must stay under 1.8 MB/sample
    (VERDICT r04 next #2: u16 depth + occupied-slot shipping vs the 3.09
    MB/sample round-4 wire)."""
    ds = SyntheticOCIDGraspFrames(
        num_samples=2, frame_hw=(480, 640), img_size=544, raw=True,
        split="training_0",
    )
    b = collate_ssg_raw([ds[0], ds[1]])
    per_sample = sum(
        v.nbytes for v in b.values() if isinstance(v, np.ndarray)
    ) / 2
    assert per_sample <= 1.8e6, per_sample / 1e6
    assert b["ssg_depth_u16"].dtype == np.uint16
    # occupied-slot trim engaged: 2-4 objects -> 4 slots, not max_objs=24
    assert b["obj_valid"].shape[1] == 4


def test_ssg_train_step_raw_dispatch():
    """The jitted SSG train step consumes a raw-wire batch (in-jit unpack)
    and produces (near-)the same loss as the dense legacy batch."""
    from crog_tpu.engine.optim import make_optimizer
    from crog_tpu.engine.ssg_engine import (
        create_ssg_train_state,
        make_ssg_train_step,
    )
    from crog_tpu.models.ssg import SSG

    IMG = 128
    kw = dict(num_samples=2, frame_hw=(96, 128), img_size=IMG,
              num_classes=8, split="training_0")
    ds_l = SyntheticOCIDGraspFrames(**kw)
    ds_r = SyntheticOCIDGraspFrames(**kw, raw=True, max_objs=M, max_rects=4)
    # the two getitems consume the random stream in the same order, so one
    # seed before each collate aligns the drawn augmentations pairwise
    random.seed(3)
    bl = collate_ssg([ds_l[0], ds_l[1]], max_objs=M)
    random.seed(3)
    br = collate_ssg_raw([ds_r[0], ds_r[1]])

    model = SSG(
        img_size=IMG, resnet_layers=(1, 1, 1, 1), num_classes=8,
        dtype=jnp.float32,
    )
    params_shape = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, IMG, IMG, 4)), train=True,
        )
    )["params"]
    tx = make_optimizer(
        params_shape, base_lr=3e-4, lr_multi=1.0, milestones=[100],
        lr_decay=0.95, steps_per_epoch=10, weight_decay=5e-4,
        optimizer="adamw",
    )
    step = make_ssg_train_step(
        model, tx, model.anchors(), {"masks_to_train": 16}, img_size=IMG,
        max_objs=M,
    )

    state = create_ssg_train_state(
        model, tx, jnp.asarray(bl["img"]), jax.random.PRNGKey(0)
    )
    _, m_dense = step(state, bl, jax.random.PRNGKey(1))
    loss_dense = float(jax.device_get(m_dense["loss"]))

    state = create_ssg_train_state(
        model, tx, jnp.asarray(bl["img"]), jax.random.PRNGKey(0)
    )
    _, m_raw = step(state, br, jax.random.PRNGKey(1))
    loss_raw = float(jax.device_get(m_raw["loss"]))

    assert np.isfinite(loss_raw)
    # identical GT up to the documented qua/wid epsilon -> near-equal loss
    assert abs(loss_raw - loss_dense) < 0.05 * max(abs(loss_dense), 1.0), (
        loss_raw, loss_dense,
    )


def test_legacy_544_synthetic_unchanged():
    """The direct 544-layout synthetic (compute bench input) still collates
    and keeps its documented keys."""
    ds = SyntheticOCIDGrasp(num_samples=1, img_size=96, num_classes=8)
    b = collate_ssg([ds[0]], max_objs=4)
    assert b["img"].shape == (1, 96, 96, 4)


def test_unpack_emit_ds_bitwise():
    """unpack_ssg_raw(emit_ds=True) ships the GT maps pre-downsampled; the
    planes must be bitwise what the loss would have computed from the
    full-res maps (same resize_bilinear + binarize, moved across the
    program boundary)."""
    from crog_tpu.ops.resize import resize_bilinear

    _, br = _pair("training_0", 0)
    dense = {
        k: jnp.asarray(v) for k, v in br.items()
        if isinstance(v, np.ndarray)
    }
    full = jax.jit(lambda b: unpack_ssg_raw(b, S, pad_objs=M))(dense)
    dense2 = {
        k: jnp.asarray(v) for k, v in br.items()
        if isinstance(v, np.ndarray)
    }
    ds = jax.jit(
        lambda b: unpack_ssg_raw(b, S, pad_objs=M, emit_ds=True)
    )(dense2)
    for k in ("ins_masks", "grasp_qua", "grasp_sin", "grasp_cos",
              "grasp_wid"):
        assert k not in ds, k
    ph, sh = S // 4, S // 8

    def _ref_ds(x, s):
        return resize_bilinear(x[..., None], (s, s), False)[..., 0]

    ins = jnp.asarray(full["ins_masks"])
    np.testing.assert_array_equal(
        np.asarray(ds["ins_ds"]),
        np.asarray((_ref_ds(ins, ph) > 0.5).astype(jnp.float32)),
    )
    np.testing.assert_array_equal(
        np.asarray(ds["sem_ds"]),
        np.asarray((_ref_ds(ins, sh) > 0.5).astype(jnp.float32)),
    )
    ref_g = jnp.stack(
        [_ref_ds(jnp.asarray(full[f"grasp_{k}"]), ph)
         for k in ("qua", "sin", "cos", "wid")], axis=1,
    )
    np.testing.assert_allclose(
        np.asarray(ds["grasp_ds"]), np.asarray(ref_g), atol=1e-6
    )


def test_ssg_raw_train_step_data_parallel():
    """SSG raw-wire training sharded over the 8-device data axis (the
    second model family's DP path, same layout train_ssg.py uses): the
    sharded step must run, keep the batch split over 'data', and produce
    the same loss as the single-shard run up to reduction-order noise."""
    from crog_tpu.engine.optim import make_optimizer
    from crog_tpu.engine.ssg_engine import (
        create_ssg_train_state,
        make_ssg_train_step,
    )
    from crog_tpu.models.ssg import SSG
    from crog_tpu.parallel.mesh import data_sharding, get_mesh, replicate

    IMG = 128
    n = jax.device_count()
    assert n == 8, "conftest pins an 8-device CPU mesh"
    kw = dict(num_samples=n, frame_hw=(96, 128), img_size=IMG,
              num_classes=8, split="training_0")
    ds_r = SyntheticOCIDGraspFrames(**kw, raw=True, max_objs=M, max_rects=4)
    random.seed(11)
    br = collate_ssg_raw([ds_r[i] for i in range(n)])

    model = SSG(
        img_size=IMG, resnet_layers=(1, 1, 1, 1), num_classes=8,
        dtype=jnp.float32,
    )
    params_shape = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, IMG, IMG, 4)), train=True,
        )
    )["params"]
    tx = make_optimizer(
        params_shape, base_lr=3e-4, lr_multi=1.0, milestones=[100],
        lr_decay=0.95, steps_per_epoch=10, weight_decay=5e-4,
        optimizer="adamw",
    )
    step = make_ssg_train_step(
        model, tx, model.anchors(), {"masks_to_train": 16}, img_size=IMG,
        max_objs=M,
    )

    def run(shard):
        state = create_ssg_train_state(
            model, tx, jnp.zeros((1, IMG, IMG, 4)), jax.random.PRNGKey(0)
        )
        batch = dict(br)
        if shard:
            mesh = get_mesh()
            sharding = data_sharding(mesh)
            state = state.replace(
                params=replicate(state.params, mesh),
                batch_stats=replicate(state.batch_stats, mesh),
                opt_state=replicate(state.opt_state, mesh),
            )
            batch = {
                k: jax.device_put(np.asarray(v), sharding)
                for k, v in batch.items() if isinstance(v, np.ndarray)
            }
        new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
        if shard:
            spec = batch["ssg_img_u8"].sharding.spec
            assert spec and spec[0] == "data", spec
        return new_state, float(jax.device_get(metrics["loss"]))

    _, loss_1 = run(False)
    _, loss_dp = run(True)
    assert np.isfinite(loss_dp)
    assert abs(loss_dp - loss_1) < 1e-3 * max(abs(loss_1), 1.0), (
        loss_dp, loss_1,
    )
