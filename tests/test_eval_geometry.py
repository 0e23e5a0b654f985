"""Per-sample eval geometry: the jitted eval un-warp must match the
reference's per-sample host pipeline (bicubic upsample to input size +
cv2.warpAffine cubic inverse warp to each sample's own original size,
engine/crog_engine.py:180-244) for BATCHES MIXING ORIGINAL SIZES."""

import numpy as np
import pytest

import jax.numpy as jnp

from crog_tpu.data.loader import pad_batch
from crog_tpu.ops.affine import letterbox_transform, warp_affine_np
from crog_tpu.ops.resize import (
    affine_axis_matrix,
    batched_affine_axis_matrix,
    interp_matrix,
    resize_np,
)

INPUT = 64
PRED = 16


def _host_reference(pred_small, ori_hw):
    """Reference chain: bicubic align_corners=True upsample to INPUT, then
    cubic warp (constant-0 border) to the sample's original size."""
    oh, ow = ori_hw
    up = resize_np(pred_small, (INPUT, INPUT), "cubic", align_corners=True)
    mat, _ = letterbox_transform((oh, ow), (INPUT, INPUT))
    # cv2.warpAffine(pred, inverse, (w, h)) samples src = forward @ dst
    from crog_tpu.ops.affine import invert_affine

    return warp_affine_np(
        up.astype(np.float64), invert_affine(mat), (ow, oh), "cubic", 0.0
    )


def _device_warp(pred_small, inverses, ori_sizes, max_hw):
    """The eval-step math: per-sample matrices composed with the upsample."""
    b = pred_small.shape[0]
    inv = jnp.asarray(inverses, jnp.float32)
    osz = jnp.asarray(ori_sizes, jnp.int32)
    fsy = 1.0 / inv[:, 1, 1]
    foy = -inv[:, 1, 2] * fsy
    fsx = 1.0 / inv[:, 0, 0]
    fox = -inv[:, 0, 2] * fsx
    w_row = batched_affine_axis_matrix(INPUT, max_hw[0], fsy, foy, osz[:, 0])
    w_col = batched_affine_axis_matrix(INPUT, max_hw[1], fsx, fox, osz[:, 1])
    up = jnp.asarray(interp_matrix(PRED, INPUT, "cubic", True))
    import jax

    hi = jax.lax.Precision.HIGHEST
    wr = jnp.einsum("bos,sp->bop", w_row, up, precision=hi)
    wc = jnp.einsum("bos,sp->bop", w_col, up, precision=hi)
    x = jnp.asarray(pred_small, jnp.float32)
    y = jnp.einsum("boh,bhw->bow", wr, x, precision=hi)
    return np.asarray(jnp.einsum("bpw,bow->bop", wc, y, precision=hi))


def test_batched_axis_matrix_matches_host():
    """Device-built warp matrices == host float64 construction."""
    for (oh, scale, off) in ((48, 0.7, -3.2), (80, 1.31, 5.0)):
        host = affine_axis_matrix(INPUT, oh, scale, off, "cubic")
        dev = np.asarray(
            batched_affine_axis_matrix(
                INPUT, oh, jnp.asarray([scale], jnp.float32),
                jnp.asarray([off], jnp.float32),
            )
        )[0]
        np.testing.assert_allclose(dev, host, atol=2e-5)


@pytest.mark.parametrize(
    "sizes", [[(48, 64), (48, 64)], [(48, 64), (40, 52), (56, 44)]]
)
def test_per_sample_unwarp_matches_host_chain(sizes):
    rng = np.random.RandomState(0)
    b = len(sizes)
    max_h = max(s[0] for s in sizes)
    max_w = max(s[1] for s in sizes)
    preds = rng.rand(b, PRED, PRED).astype(np.float32)
    inverses = np.stack(
        [
            letterbox_transform(s, (INPUT, INPUT))[1].astype(np.float32)
            for s in sizes
        ]
    )
    osz = np.asarray(sizes, np.int32)
    got = _device_warp(preds, inverses, osz, (max_h, max_w))
    assert got.shape == (b, max_h, max_w)
    for i, (oh, ow) in enumerate(sizes):
        want = _host_reference(preds[i], (oh, ow))
        np.testing.assert_allclose(got[i, :oh, :ow], want, atol=5e-4)
        # padded region outside the sample's own size must be exactly 0
        assert np.all(got[i, oh:, :] == 0.0)
        assert np.all(got[i, :, ow:] == 0.0)


def test_pad_batch_marks_valid_count():
    batch = {
        "img": np.zeros((3, 8, 8, 3), np.float32),
        "grasps": [np.zeros((2, 6))] * 3,
        "word": np.zeros((3, 17), np.int32),
    }
    out = pad_batch(batch, 8, 3)
    assert out["n_valid"] == 3
    assert out["img"].shape[0] == 8
    assert len(out["grasps"]) == 8
    np.testing.assert_array_equal(out["img"][3:], np.zeros((5, 8, 8, 3)))
