"""Drive the three on-disk dataset readers (OCIDVLGDataset, OCIDGraspDataset,
RefOCIDGraspDataset) through real-format fixture trees: file discovery, JSON
parse, PNG decode, annotation matching, __getitem__ -> collate -> one
train/eval step.

The fixture tree (tests/ocid_fixture.py) replicates the exact OCID directory
layout and file formats of reference utils/dataset.py:704-766 (VLG refer
JSON), :1094-1207 (data_split + Annotations_per_class), :110-335
(RefOCIDGrasp {mode}_expressions.json).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.ocid_fixture import (
    H,
    SCENE_OBJECTS,
    W,
    build_ocid_tree,
    grasp_corners,
)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def ocid_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ocid")
    build_ocid_tree(root, num_scenes=2)
    return str(root)


# ---------------------------------------------------------------- grasp math
def test_grasp_corner_roundtrip():
    """The fixture's corner generator must invert the reference's 4-point
    parse exactly (both the (M,4,2) array path and the txt-file path)."""
    from crog_tpu.data.grasp_transforms import GraspTransforms

    rects = [(140.0, 160.0, 60.0, 20.0, 0.0), (415.0, 281.0, 50.0, 18.0, 30.0),
             (200.0, 100.0, 70.0, 25.0, -45.0), (320.0, 240.0, 40.0, 16.0, 90.0)]
    pts = np.stack([grasp_corners(*r) for r in rects])
    out = GraspTransforms()(pts, 7)
    ref = np.asarray(rects)
    np.testing.assert_allclose(out[:, :5], ref, atol=1e-9)
    assert (out[:, 5] == 7).all()


# ---------------------------------------------------------------- OCID-VLG
def test_ocid_vlg_reader(ocid_root):
    from crog_tpu.data.ocid_vlg import OCIDVLGDataset

    ds = OCIDVLGDataset(ocid_root, "train", input_size=128, word_length=17)
    assert len(ds) == 8  # 2 scenes x 2 objects x 2 expressions
    # split-name mapping incl. the test configs' 'val-test'
    for split in ("val", "test", "val-test"):
        assert len(OCIDVLGDataset(ocid_root, split, input_size=128)) == 8

    s = ds[0]
    assert s["img"].shape == (128, 128, 3) and s["img"].dtype == np.float32
    assert s["mask"].shape == (128, 128)
    assert 0.0 <= s["mask"].min() and s["mask"].max() <= 1.0
    assert s["mask"].max() > 0.5, "instance mask must select the object"
    assert s["word"].shape == (17,)
    assert s["inverse"].shape == (2, 3)
    assert tuple(s["ori_size"]) == (H, W)
    assert s["depth"].shape == (H, W)
    # depth PNG is millimeters; reader divides by 1000
    assert 0.5 < s["depth"].mean() < 1.0
    assert s["grasps"].shape == (2, 6)
    np.testing.assert_allclose(
        s["grasps"][0, :5], (140.0, 160.0, 60.0, 20.0, 0.0), atol=1e-6
    )
    assert s["objID"] == 2 and s["target"] == "apple_1"
    assert s["sent_id"] == 0 and ds.sent_to_index[0] == 0
    # grasp maps rasterized on the 480x640 canvas then letterboxed
    for k in ("qua", "wid"):
        assert s[k].shape == (128, 128)
        assert s[k].max() > 0
    assert np.all(np.abs(s["sin"]) <= 1.0) and np.all(np.abs(s["cos"]) <= 1.0)

    # the warped instance mask must sit where the letterboxed object is:
    # un-warp a mask pixel back through `inverse` and check the object bbox
    ys, xs = np.nonzero(s["mask"] > 0.5)
    cx, cy = xs.mean(), ys.mean()
    inv = s["inverse"]
    ox = inv[0, 0] * cx + inv[0, 1] * cy + inv[0, 2]
    oy = inv[1, 0] * cx + inv[1, 1] * cy + inv[1, 2]
    x, y, w, h = SCENE_OBJECTS[0][4]
    assert x <= ox <= x + w and y <= oy <= y + h


def test_ocid_vlg_compact_matches_legacy(ocid_root):
    from crog_tpu.data.ocid_vlg import OCIDVLGDataset

    ds_c = OCIDVLGDataset(ocid_root, "train", input_size=128, compact=True)
    s = ds_c[0]
    assert s["img_u8"].dtype == np.uint8 and s["img_u8"].shape == (128, 128, 3)
    assert s["planes_u8"].shape == (128, 128, 4)


def test_ocid_vlg_train_and_eval_step(ocid_root):
    """Real-format reader -> loader/collate -> sharded jitted train step and
    device eval step (same program shapes as test_train_e2e)."""
    from crog_tpu.data.loader import DataLoader, device_put_crog
    from crog_tpu.data.ocid_vlg import OCIDVLGDataset
    from crog_tpu.engine.crog_engine import (
        create_train_state,
        make_eval_step,
        make_train_step,
        validate_with_grasp,
    )
    from crog_tpu.engine.optim import make_optimizer
    from crog_tpu.models.crog import CROG
    from crog_tpu.parallel.mesh import data_sharding, get_mesh

    model = CROG(
        input_resolution=128, vision_layers=(1, 1, 1, 1),
        transformer_layers=2, num_layers=1, dtype=jnp.float32,
    )
    ds = OCIDVLGDataset(ocid_root, "train", input_size=128, word_length=17)
    sharding = data_sharding(get_mesh())
    loader = DataLoader(
        ds, batch_size=8, shuffle=True, drop_last=True, num_workers=2,
        device_put_fn=lambda b: device_put_crog(b, sharding),
    )
    batch = next(iter(loader))
    assert batch["img"].shape == (8, 128, 128, 3)
    assert len(batch["grasps"]) == 8

    variables = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)}, batch["img"], batch["word"],
            train=False,
        )
    )
    tx = make_optimizer(
        variables["params"], base_lr=1e-4, lr_multi=0.1, milestones=[35],
        lr_decay=0.1, steps_per_epoch=10,
    )
    state = create_train_state(
        model, tx, batch["img"], batch["word"], jax.random.PRNGKey(0)
    )
    step = make_train_step(model, None)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    m = jax.device_get(metrics)
    assert np.isfinite(m["loss"])

    eval_step = make_eval_step(model, input_size=128, ori_hw=(H, W))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    result = validate_with_grasp([batch], eval_step, variables)
    assert 0.0 <= result["iou"] <= 1.0
    assert 0.0 <= result["j_index@5"] <= 1.0


def test_refer_type_sweep_one_compile(ocid_root):
    """The per-refer-type sweep (test_diff_refer_types.evaluate_refer_types)
    pads tail batches: every eval-step invocation sees ONE batch shape, and
    subsets whose size is not a multiple of the batch are still fully scored."""
    from crog_tpu.data.ocid_vlg import OCIDVLGDataset
    from crog_tpu.engine.crog_engine import (
        create_train_state, make_eval_step,
    )
    from crog_tpu.engine.optim import make_optimizer
    from crog_tpu.models.crog import CROG
    from test_diff_refer_types import evaluate_refer_types

    model = CROG(
        input_resolution=128, vision_layers=(1, 1, 1, 1),
        transformer_layers=2, num_layers=1, dtype=jnp.float32,
    )
    ds = OCIDVLGDataset(ocid_root, "test", input_size=128, word_length=17)
    img0 = jnp.zeros((1, 128, 128, 3))
    word0 = jnp.zeros((1, 17), jnp.int32)
    tx = make_optimizer(
        jax.eval_shape(lambda: model.init(
            {"params": jax.random.PRNGKey(0)}, img0, word0, train=False,
        ))["params"],
        base_lr=1e-4, lr_multi=0.1, milestones=[35], lr_decay=0.1,
        steps_per_epoch=10,
    )
    state = create_train_state(model, tx, img0, word0, jax.random.PRNGKey(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    inner = make_eval_step(model, input_size=128, ori_hw=(H, W))
    seen_shapes = []

    def spying_step(v, batch):
        seen_shapes.append(batch["img"].shape if "img" in batch
                           else batch["word"].shape)
        return inner(v, batch)

    # 8 fixture samples; sizes 5 and 3 both force a padded tail at batch 4
    refer_types = {"name": list(range(5)), "loc": [5, 6, 7]}
    results = evaluate_refer_types(
        ds, refer_types, spying_step, variables, batch_size=4, num_workers=2,
    )
    assert set(results) == {"name", "loc"}
    # one shape for every invocation -> one compile for the whole sweep
    assert len(set(seen_shapes)) == 1 and seen_shapes[0][0] == 4
    for r in results.values():
        assert 0.0 <= r["iou"] <= 1.0


# ---------------------------------------------------------------- OCID-Grasp
def test_ocid_grasp_reader(ocid_root):
    from crog_tpu.data.ocid_grasp import OCIDGraspDataset

    ds = OCIDGraspDataset(ocid_root, "validation_0", img_size=128)
    assert len(ds) == 2
    d = ds[0]
    # both objects have matched grasps -> both instances kept
    assert d["bboxes"].shape == (2, 5)
    assert sorted(d["labels"].tolist()) == [1, 3]
    assert d["ins_masks"].shape == (2, 128, 128)
    assert d["rgb"].shape == (128, 128, 3)
    assert d["depth"].shape == (128, 128)
    # depth inversion: 1 - d/max -> objects (closer) get larger values
    assert 0.0 <= d["depth"].min() and d["depth"].max() <= 1.0
    # boxes normalized to [0,1]
    assert (d["bboxes"][:, :4] >= 0).all() and (d["bboxes"][:, :4] <= 1).all()
    for k in ("qua", "sin", "cos", "wid"):
        assert d["grasp_masks"][k].shape == (2, 128, 128)
    assert d["grasp_masks"]["qua"].max() > 0
    assert len(d["ins_grasp_rects"]) == 2
    assert all(r.shape == (2, 6) for r in d["ins_grasp_rects"])


def test_ocid_grasp_train_mode_augments(ocid_root):
    import random

    from crog_tpu.data.ocid_grasp import OCIDGraspDataset

    ds = OCIDGraspDataset(ocid_root, "training_0", img_size=128)
    assert ds.augmentor.mode == "train"
    random.seed(0)
    d = ds[0]
    assert d["rgb"].shape == (128, 128, 3)
    assert d["bboxes"].shape[1] == 5 and d["bboxes"].shape[0] >= 1


def test_ocid_grasp_to_ssg_loss(ocid_root):
    """Reader -> collate_ssg -> SSG forward + 8-term loss (same program
    shapes as test_ssg's ssg_setup: IMG=128, num_classes=8, batch 2)."""
    from crog_tpu.data.ocid_grasp import OCIDGraspDataset, collate_ssg
    from crog_tpu.models.ssg import SSG
    from crog_tpu.models.ssg_loss import ssg_losses

    ds = OCIDGraspDataset(ocid_root, "validation_0", img_size=128)
    batch = collate_ssg([ds[0], ds[1]], max_objs=8)
    assert batch["img"].shape == (2, 128, 128, 4)  # RGB-D
    assert batch["obj_valid"].sum() == 4

    model = SSG(
        img_size=128, resnet_layers=(1, 1, 1, 1), num_classes=8,
        dtype=jnp.float32,
    )
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(batch["img"]),
        train=True,
    )
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
        out, dense, jnp.asarray(model.anchors()), jax.random.PRNGKey(0),
        masks_to_train=16,
    )
    assert np.isfinite(float(total))
    assert all(np.isfinite(float(v)) for v in loss_dict.values())


# ------------------------------------------------------------- RefOCIDGrasp
def test_ref_ocid_reader(ocid_root):
    from crog_tpu.data.ref_ocid import RefOCIDGraspDataset

    ds = RefOCIDGraspDataset(ocid_root, input_size=128, mode="train")
    assert len(ds) == 8
    s = ds[0]
    assert s["img"].shape == (128, 128, 3)
    assert s["mask"].shape == (128, 128)
    assert s["mask"].max() > 0.5, "bbox-IoU matching must find the instance"
    assert s["word"].shape == (17,)
    assert s["grasps"].shape == (2, 6)
    # grasp-center-in-mask matching keeps the class's grasps
    np.testing.assert_allclose(
        s["grasps"][0, :5], (140.0, 160.0, 60.0, 20.0, 0.0), atol=1e-6
    )
    assert s["target"] == "apple"
    for k in ("qua", "sin", "cos", "wid"):
        assert s[k].shape == (128, 128)

    # the banana item must match the banana instance, not the apple
    s3 = ds[2]
    assert s3["target"] == "banana"
    x, y, w, h = SCENE_OBJECTS[1][4]
    cx, cy = x + w / 2, y + h / 2
    np.testing.assert_allclose(s3["grasps"][0, 0], cx, atol=1e-6)
    np.testing.assert_allclose(s3["grasps"][0, 1], cy, atol=1e-6)
