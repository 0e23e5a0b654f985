"""SSG model family: forward shapes, anchor matching, 8-term loss, Fast-NMS
post-processing, and one train step on a sharded batch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crog_tpu.data.ocid_grasp import collate_ssg
from crog_tpu.data.synthetic_ssg import SyntheticOCIDGrasp
from crog_tpu.engine.optim import make_optimizer
from crog_tpu.engine.ssg_engine import create_ssg_train_state, make_ssg_train_step
from crog_tpu.models.ssg import SSG
from crog_tpu.models.ssg_eval import make_ssg_post_processing
from crog_tpu.models.ssg_loss import ssg_losses
from crog_tpu.ops.boxes import box_iou, decode, encode, make_anchors, match

# 128: feature sizes 16/8/4 double exactly level-to-level, as the FPN's 2x
# upsample requires (like the reference, which only supports sizes where
# ceil(img/stride) halves cleanly, e.g. the production 544)
IMG = 128


@pytest.fixture(scope="module")
def ssg_setup():
    model = SSG(
        img_size=IMG, resnet_layers=(1, 1, 1, 1), num_classes=8,
        dtype=jnp.float32,
    )
    ds = SyntheticOCIDGrasp(
        num_samples=4, img_size=IMG, num_classes=8, seed=3
    )
    batch = collate_ssg([ds[i] for i in range(2)], max_objs=8)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(batch["img"]),
        train=True,
    )
    return model, variables, batch


def test_anchor_count_and_forward_shapes(ssg_setup):
    model, variables, batch = ssg_setup
    anchors = model.anchors()
    # 5 levels, 3 ratios: sum(ceil(136/s)^2 * 3)
    expected = sum(
        int(np.ceil(IMG / s)) ** 2 * 3 for s in (8, 16, 32, 64, 128)
    )
    assert anchors.shape == (expected, 4)

    out = model.apply(
        variables, jnp.asarray(batch["img"]), train=True,
        mutable=["batch_stats"],
    )[0]
    n = anchors.shape[0]
    # train mode: logits only (cls_pred softmax is eval-only), coef stacks
    # stay in the conv dtype for the post-gather convert in the loss
    assert "cls_pred" not in out
    assert out["cls_logits"].shape == (2, n, 8)
    assert out["box_pred"].shape == (2, n, 4)
    assert out["ins_coef_pred"].shape == (2, n, 32)
    assert out["grasp_coef_pred"].shape == (2, n, 4, 32)
    p3 = int(np.ceil(IMG / 8))
    assert out["protos"].shape == (2, 2 * p3, 2 * p3, 32)
    assert out["seg_pred"].shape == (2, p3, p3, 8)

    # eval mode carries the softmax, normalized, and f32 coef stacks
    out_e = model.apply(variables, jnp.asarray(batch["img"]), train=False)
    assert out_e["cls_pred"].shape == (2, n, 8)
    assert out_e["ins_coef_pred"].dtype == jnp.float32
    assert out_e["grasp_coef_pred"].dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(out_e["cls_pred"]).sum(-1), 1.0, atol=1e-5
    )


def test_match_semantics():
    anchors = jnp.asarray(
        make_anchors(4, 4, 24, (1, 0.5, 2), 128), jnp.float32
    )
    boxes = jnp.asarray(
        [[0.1, 0.1, 0.35, 0.35], [0.6, 0.6, 0.9, 0.9], [0, 0, 0, 0]],
        jnp.float32,
    )
    valid = jnp.asarray([True, True, False])
    labels = jnp.asarray([3, 5, 0], jnp.int32)
    offsets, conf, amax_gt, amax_i = match(boxes, valid, labels, anchors)
    conf = np.asarray(conf)
    # every valid GT owns at least one positive anchor (force-match)
    assert (conf == 3).sum() >= 1
    assert (conf == 5).sum() >= 1
    # padding GT contributes nothing
    assert set(np.unique(conf)) <= {-1, 0, 3, 5}
    # encode/decode roundtrip on the matched anchors
    pos = conf > 0
    dec = decode(np.asarray(offsets), np.asarray(anchors))
    np.testing.assert_allclose(
        np.asarray(dec)[np.asarray(pos)],
        np.asarray(amax_gt)[np.asarray(pos)],
        atol=1e-5,
    )


def test_losses_finite_and_grad(ssg_setup):
    model, variables, batch = ssg_setup
    anchors = jnp.asarray(model.anchors())
    out = model.apply(
        variables, jnp.asarray(batch["img"]), train=True,
        mutable=["batch_stats"],
    )[0]
    dense = {
        k: jnp.asarray(batch[k])
        for k in (
            "boxes", "labels", "obj_valid", "ins_masks", "grasp_qua",
            "grasp_sin", "grasp_cos", "grasp_wid",
        )
    }
    total, loss_dict = ssg_losses(
        out, dense, anchors, jax.random.PRNGKey(0), masks_to_train=16
    )
    assert np.isfinite(float(total))
    assert set(loss_dict) == {
        "loss_cls", "loss_box", "loss_ins", "loss_sem", "loss_qua",
        "loss_sin", "loss_cos", "loss_wid",
    }
    for k, v in loss_dict.items():
        assert np.isfinite(float(v)), k


def test_train_step(ssg_setup):
    model, variables, batch = ssg_setup
    params_shape = jax.eval_shape(lambda: variables)["params"]
    tx = make_optimizer(
        params_shape, base_lr=3e-4, lr_multi=1.0, milestones=[100],
        lr_decay=0.95, steps_per_epoch=10, weight_decay=5e-4,
        optimizer="adamw",
    )
    state = create_ssg_train_state(
        model, tx, jnp.asarray(batch["img"]), jax.random.PRNGKey(0)
    )
    step = make_ssg_train_step(
        model, tx, model.anchors(), {"masks_to_train": 16}
    )
    state2, metrics = step(state, batch, jax.random.PRNGKey(1))
    m = jax.device_get(metrics)
    assert np.isfinite(m["loss"])
    state3, metrics2 = step(state2, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(jax.device_get(metrics2)["loss"]))


def test_post_processing(ssg_setup):
    model, variables, batch = ssg_setup
    out = model.apply(
        variables, jnp.asarray(batch["img"][:1]), train=False
    )
    post_fn = make_ssg_post_processing(
        model.anchors(), ori_hw=(IMG, IMG), max_detections=10, top_k=20,
    )
    post = post_fn(out)
    assert post["bboxes"].shape == (10, 4)
    assert post["ins_masks"].shape == (10, IMG, IMG)
    assert post["grasp_rects"].shape == (10, 5, 5)
    assert post["cls"].shape == (10,)
    assert np.asarray(post["det_valid"]).dtype == bool


def test_post_processing_batched_matches_batch1(ssg_setup):
    """batched=True (vmapped per-image body) must reproduce the batch-1
    reference-contract path sample for sample (VERDICT r04 next #3)."""
    model, variables, batch = ssg_setup
    imgs = jnp.asarray(batch["img"])  # [2, ...]
    out = model.apply(variables, imgs, train=False)
    kw = dict(ori_hw=(IMG, IMG), max_detections=10, top_k=20)
    post_b = make_ssg_post_processing(model.anchors(), batched=True, **kw)(out)
    post_1 = make_ssg_post_processing(model.anchors(), **kw)
    for i in range(imgs.shape[0]):
        one = post_1(jax.tree.map(lambda x: x[i : i + 1], out))
        for k in ("scores", "bboxes", "grasp_rects"):
            np.testing.assert_allclose(
                np.asarray(post_b[k][i]), np.asarray(one[k]),
                rtol=1e-5, atol=1e-5, err_msg=k,
            )
        for k in ("cls", "det_valid", "grasp_valid", "ins_masks"):
            np.testing.assert_array_equal(
                np.asarray(post_b[k][i]), np.asarray(one[k]), err_msg=k
            )


def test_post_processing_batch1_refuses_batchN(ssg_setup):
    """Silent sample-0 truncation was VERDICT r04 weak #5 — the batch-1 post
    must now refuse a batch-N forward output at trace time."""
    model, variables, batch = ssg_setup
    out = model.apply(variables, jnp.asarray(batch["img"]), train=False)
    post_1 = make_ssg_post_processing(
        model.anchors(), ori_hw=(IMG, IMG), max_detections=10, top_k=20
    )
    with pytest.raises(ValueError, match="batched=True"):
        post_1(out)


def test_sample_bilinear_matches_full_upsample():
    """The post's 4-tap peak sampling must equal reading the materialized
    bilinear upsample at the same pixels (the equivalence that lets the
    batched post skip 3 of 5 full-res plane assemblies)."""
    from crog_tpu.models.ssg_eval import _sample_bilinear_at
    from crog_tpu.ops.resize import resize_bilinear

    rng = np.random.RandomState(0)
    m = jnp.asarray(rng.randn(3, 17, 19).astype(np.float32))
    s = 64
    full = resize_bilinear(m[..., None], (s, s), False)[..., 0]
    pr = jnp.asarray(rng.randint(0, s, (3, 5)))
    pc = jnp.asarray(rng.randint(0, s, (3, 5)))
    got = _sample_bilinear_at(m, pr, pc, s)
    want = full[jnp.arange(3)[:, None], pr, pc]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
    )


def test_bf16_forward_and_losses(ssg_setup):
    """The train-mode bf16 coef stacks (gather-then-convert in the loss,
    ssg_loss.py) are exercised with an actual bf16 model — the main fixture
    is f32, where that path is a no-op (ADVICE r04 #1)."""
    _, _, batch = ssg_setup
    model = SSG(
        img_size=IMG, resnet_layers=(1, 1, 1, 1), num_classes=8,
        dtype=jnp.bfloat16,
    )
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(batch["img"]),
        train=True,
    )
    out = model.apply(
        variables, jnp.asarray(batch["img"]), train=True,
        mutable=["batch_stats"],
    )[0]
    assert out["ins_coef_pred"].dtype == jnp.bfloat16
    assert out["grasp_coef_pred"].dtype == jnp.bfloat16
    dense = {
        k: jnp.asarray(batch[k])
        for k in (
            "boxes", "labels", "obj_valid", "ins_masks", "grasp_qua",
            "grasp_sin", "grasp_cos", "grasp_wid",
        )
    }
    total, loss_dict = ssg_losses(
        out, dense, jnp.asarray(model.anchors()), jax.random.PRNGKey(0),
        masks_to_train=16,
    )
    assert np.isfinite(float(total))
    for k, v in loss_dict.items():
        assert np.isfinite(float(v)), k
    # the f32-converted coef gathers must match converting the whole stack
    # up front (the optimization's bit-identity claim, ssg_loss.py:101-107)
    out_f32 = dict(out)
    out_f32["ins_coef_pred"] = out["ins_coef_pred"].astype(jnp.float32)
    out_f32["grasp_coef_pred"] = out["grasp_coef_pred"].astype(jnp.float32)
    total2, _ = ssg_losses(
        out_f32, dense, jnp.asarray(model.anchors()), jax.random.PRNGKey(0),
        masks_to_train=16,
    )
    np.testing.assert_array_equal(np.asarray(total), np.asarray(total2))
