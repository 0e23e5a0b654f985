"""Raw wire format (crog_tpu.data.rawwire): device-side rasterization, blur
and letterbox vs the legacy host pipeline.

The raster itself (integer PNPOLY + sequential overwrite) must be
BIT-IDENTICAL to the host rasterizer; the blurred/warped planes carry a
small documented epsilon (the legacy path quantizes to uint8 after blur and
after warp, and cv2 interpolation is fixed-point) — bounded here.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crog_tpu.data.grasp_transforms import GraspTransforms
from crog_tpu.data.rawwire import (
    _letterbox_axis_matrices,
    _rasterize,
    pack_mask_bits,
    pack_raster_params,
    unpack_mask_bits,
    unpack_raw,
)
from crog_tpu.data.synthetic import SyntheticOCIDVLG
from crog_tpu.ops.rects import box_points, polygon_indices

ORI = (120, 160)
S = 64


def _host_canvases(rects, h, w):
    """The exact host raster (grasp_transforms.py:58-86 fallback branch)."""
    pos = np.zeros((h, w))
    ang = np.zeros((h, w))
    wid = np.zeros((h, w))
    for rect in rects:
        cx, cy, w_r, h_r, theta = rect[:5]
        box = box_points(
            ((cx, cy), (w_r / 2.0, h_r), -(theta + 180.0))
        ).astype(np.int64)
        rr, cc = polygon_indices(box[:, 0], box[:, 1])
        keep = (rr < w) & (cc < h) & (rr >= 0) & (cc >= 0)
        rr, cc = rr[keep], cc[keep]
        pos[cc, rr] = 1.0
        ang[cc, rr] = float(int(theta + 180) if theta < 0 else int(theta))
        wid[cc, rr] = np.clip(w_r, 0.0, 100.0) / 100.0
    return pos, ang, wid


def test_device_raster_bit_identical():
    rng = np.random.RandomState(0)
    rect_sets = []
    for _ in range(3):
        m = rng.randint(1, 6)
        rects = np.stack(
            [
                rng.uniform(20, ORI[1] - 20, m),      # cx
                rng.uniform(20, ORI[0] - 20, m),      # cy
                rng.uniform(10, 60, m),               # w
                rng.uniform(8, 25, m),                # h
                rng.uniform(-89, 89, m),              # theta
                np.ones(m),                           # cls
            ],
            axis=1,
        )
        rect_sets.append(rects)
    corners = np.stack(
        [pack_raster_params(r, 8)[0] for r in rect_sets]
    )
    vals = np.stack([pack_raster_params(r, 8)[1] for r in rect_sets])
    pos_d, ang_d, wid_d = jax.jit(
        lambda c, v: _rasterize(c, v, ORI[0], ORI[1])
    )(jnp.asarray(corners), jnp.asarray(vals))
    for i, rects in enumerate(rect_sets):
        pos_h, ang_h, wid_h = _host_canvases(rects, *ORI)
        np.testing.assert_array_equal(np.asarray(pos_d[i]), pos_h, err_msg=f"pos {i}")
        np.testing.assert_array_equal(np.asarray(ang_d[i]), ang_h, err_msg=f"ang {i}")
        np.testing.assert_allclose(
            np.asarray(wid_d[i]), wid_h, atol=1e-7, err_msg=f"wid {i}"
        )


def test_raster_overwrite_order():
    """Later rects overwrite earlier ones in overlap (reference sequential
    loop, utils/dataset.py:656-671)."""
    rects = np.asarray(
        [[50, 50, 40, 16, 10, 1], [55, 52, 30, 14, -30, 1]], np.float64
    )
    corners, vals = pack_raster_params(rects, 4)
    pos, ang, wid = jax.jit(
        lambda c, v: _rasterize(c, v, ORI[0], ORI[1])
    )(jnp.asarray(corners)[None], jnp.asarray(vals)[None])
    pos_h, ang_h, wid_h = _host_canvases(rects, *ORI)
    np.testing.assert_array_equal(np.asarray(ang[0]), ang_h)


def test_pack_respects_max_rects_keeps_last():
    rects = np.stack(
        [np.full(6, i, np.float64) + [50, 50, 20, 10, 0, 1] for i in range(6)]
    )
    corners, vals = pack_raster_params(rects, 4)
    assert vals[:, 2].sum() == 4
    # the LAST 4 rects are kept (they win overwrites)
    c5, v5 = pack_raster_params(rects[5:6], 4)
    np.testing.assert_array_equal(corners[3], c5[0])


def test_mask_bits_roundtrip():
    """pack_mask_bits (host, np.packbits) and the REAL device unpack
    (unpack_mask_bits, the helper unpack_raw calls) invert each other for
    every width remainder mod 8, unbatched and batched."""
    rng = np.random.RandomState(3)
    for w in (160, 157, 153):  # w % 8 == 0, 5, 1
        m = (rng.rand(9, w) > 0.5).astype(np.uint8) * 255
        bits = pack_mask_bits(m)
        assert bits.shape == (9, (w + 7) // 8) and bits.dtype == np.uint8
        un = unpack_mask_bits(jnp.asarray(bits), w)
        np.testing.assert_array_equal(np.asarray(un), m // 255)
        # batched layout, as unpack_raw sees it
        un_b = unpack_mask_bits(jnp.asarray(bits)[None], w)
        np.testing.assert_array_equal(np.asarray(un_b[0]), m // 255)


def test_pack_mask_bits_rejects_non_binary():
    """A non-binary mask has no 1-bit representation: fail loudly instead of
    silently zeroing values 1..127 (the legacy path carries v/255)."""
    m = np.zeros((4, 16), np.uint8)
    m[1, 3] = 7
    with pytest.raises(ValueError, match="binary"):
        pack_mask_bits(m)


def test_unpack_raw_matches_legacy_pipeline():
    """Same synthetic samples through the legacy host pipeline and the raw
    device pipeline: all model-facing planes agree within the documented
    quantization epsilon."""
    ds_l = SyntheticOCIDVLG(num_samples=4, input_size=S, ori_hw=ORI)
    ds_r = SyntheticOCIDVLG(num_samples=4, input_size=S, ori_hw=ORI, raw=True)
    for i in range(2):
        legacy = ds_l[i]
        raw = ds_r[i]
        assert raw["raw_img_u8"].shape == (*ORI, 3)
        batch = {
            k: jnp.asarray(np.asarray(raw[k])[None])
            for k in (
                "raw_img_u8", "raw_mask_bits", "rect_corners", "rect_vals",
                "word", "inverse", "ori_size",
            )
        }
        out = jax.jit(lambda b: unpack_raw(b, S))(batch)
        np.testing.assert_array_equal(
            np.asarray(batch["word"][0]), legacy["word"]
        )
        # image: cv2 fixed-point cubic + uint8 rounding vs fp32 matrices;
        # normalized units (std ~0.27 -> 1/255 input step ~0.015)
        img_d = np.asarray(out["img"][0])
        assert np.abs(img_d - legacy["img"]).max() < 0.12
        assert np.abs(img_d - legacy["img"]).mean() < 0.01
        # targets: u8-quantization-after-blur + fixed-point warp epsilon
        for k, atol in (
            ("mask", 0.06), ("qua", 0.03), ("wid", 0.03),
            ("sin", 0.2), ("cos", 0.2),
        ):
            d = np.asarray(out[k][0])
            assert d.shape == (S, S), k
            assert np.abs(d - legacy[k]).max() < atol, (
                k, np.abs(d - legacy[k]).max()
            )
            assert np.abs(d - legacy[k]).mean() < atol / 10, k


def test_unpack_rawlb_image_bit_exact_legacy():
    """raw='lb' letterboxes the uint8 image on HOST with the cv2-parity
    kernel and LUT-normalizes on device — the image plane must be BIT-EXACT
    to the legacy pipeline (same warp, same table arithmetic); the
    rasterized targets keep raw's documented epsilon."""
    ds_l = SyntheticOCIDVLG(num_samples=2, input_size=S, ori_hw=ORI)
    ds_lb = SyntheticOCIDVLG(num_samples=2, input_size=S, ori_hw=ORI, raw="lb")
    for i in range(2):
        legacy = ds_l[i]
        lb = ds_lb[i]
        assert lb["lb_img_u8"].shape == (S, S, 3)
        assert "raw_img_u8" not in lb
        batch = {
            k: jnp.asarray(np.asarray(lb[k])[None])
            for k in (
                "lb_img_u8", "raw_mask_bits", "rect_corners", "rect_vals",
                "word", "inverse", "ori_size",
            )
        }
        out = jax.jit(lambda b: unpack_raw(b, S))(batch)
        np.testing.assert_array_equal(
            np.asarray(out["img"][0]), legacy["img"]
        )
        for k, atol in (
            ("mask", 0.06), ("qua", 0.03), ("wid", 0.03),
            ("sin", 0.2), ("cos", 0.2),
        ):
            d = np.asarray(out[k][0])
            assert d.shape == (S, S), k
            assert np.abs(d - legacy[k]).max() < atol, k


def test_rawlb_smaller_on_the_wire_than_raw():
    ds_r = SyntheticOCIDVLG(num_samples=1, input_size=S, ori_hw=ORI, raw=True)
    ds_lb = SyntheticOCIDVLG(num_samples=1, input_size=S, ori_hw=ORI, raw="lb")
    nb = lambda s: sum(
        np.asarray(v).nbytes for v in s.values()
        if isinstance(v, np.ndarray)
    )
    assert nb(ds_lb[0]) < nb(ds_r[0])


def test_blur_fold_is_exact():
    """Blur folded into the warp matrix == blur then warp (linear maps)."""
    from crog_tpu.ops.filters import gaussian_blur_np

    rng = np.random.RandomState(2)
    x = (rng.rand(*ORI) > 0.97).astype(np.float64)
    mats = _letterbox_axis_matrices(ORI, S)
    wr_l, wc_l = mats["lin"]
    wr_b, wc_b = mats["blur"]
    blurred = gaussian_blur_np(x, 3.0)
    a = wr_l.astype(np.float64) @ blurred @ wc_l.astype(np.float64).T
    b = wr_b.astype(np.float64) @ x @ wc_b.astype(np.float64).T
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_train_step_raw_close_to_legacy():
    """The raw wire batch drives the SAME jitted train step; the loss must
    match the legacy batch within the target epsilon."""
    from crog_tpu.engine.crog_engine import (
        create_train_state, make_train_step,
    )
    from crog_tpu.engine.optim import make_optimizer

    from crog_tpu.models.crog import CROG

    model = CROG(
        input_resolution=S, vision_layers=(1, 1, 1, 1),
        transformer_layers=1, num_layers=1, dtype=jnp.float32,
    )
    ds_l = SyntheticOCIDVLG(num_samples=2, input_size=S, ori_hw=ORI)
    ds_r = SyntheticOCIDVLG(num_samples=2, input_size=S, ori_hw=ORI, raw=True)
    from crog_tpu.data.loader import collate_crog

    batch_l = collate_crog([ds_l[0], ds_l[1]])
    batch_r = collate_crog([ds_r[0], ds_r[1]])
    variables = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((2, S, S, 3)), jnp.zeros((2, 17), jnp.int32),
            train=False,
        )
    )
    tx = make_optimizer(
        variables["params"], base_lr=1e-4, lr_multi=0.1, milestones=[35],
        lr_decay=0.1, steps_per_epoch=10,
    )
    state = create_train_state(
        model, tx, jnp.zeros((2, S, S, 3)), jnp.zeros((2, 17), jnp.int32),
        jax.random.PRNGKey(0),
    )
    step = make_train_step(model, None)
    state_l = jax.tree_util.tree_map(jnp.copy, state)
    state_r = jax.tree_util.tree_map(jnp.copy, state)
    _, m_l = step(state_l, batch_l, jax.random.PRNGKey(1))
    _, m_r = step(state_r, batch_r, jax.random.PRNGKey(1))
    l_l = float(jax.device_get(m_l["loss"]))
    l_r = float(jax.device_get(m_r["loss"]))
    assert np.isfinite(l_r)
    assert abs(l_r - l_l) / abs(l_l) < 0.02, (l_l, l_r)
