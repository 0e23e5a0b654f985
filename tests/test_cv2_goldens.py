"""Pin host-op numerics against VENDORED cv2/scipy goldens.

tests/data/cv2_goldens.npz holds real cv2.warpAffine / cv2.boxPoints /
scipy.ndimage.gaussian_filter outputs recorded by tools/make_goldens.py
(cv2 5.0).  This replaces self-referential testing: warp_affine_np, the
native C++ kernel, box_points, and gaussian_blur_np are each checked against
actual library behavior (reference call sites utils/dataset.py:858-890,
:633-641, :673-676; engine/crog_engine.py:127-131).

Parity contract (see ops/affine.py docstring):
  * nearest / linear: BIT-EXACT for uint8;
  * cubic uint8: off-by-one on < 0.01% of pixels (rounding-boundary ulps);
  * float32: atol 1e-3 on a 0-255 scale (coordinate/weight f32 rounding).
"""

import os

import numpy as np
import pytest

from crog_tpu.ops.affine import warp_affine_np
from crog_tpu.ops.filters import gaussian_blur_np
from crog_tpu.ops.rects import box_points

DATA = os.path.join(os.path.dirname(__file__), "data", "cv2_goldens.npz")
G = np.load(DATA, allow_pickle=False)

WARP_CASES = [
    "img_fwd_cubic", "mask_fwd_linear", "mask_fwd_nearest",
    "eval_inv_cubic_u8", "eval_inv_cubic_f32", "odd_fwd_cubic",
    "odd_inv_linear", "small_inv_cubic",
]


def _check_warp(got, ref, mode):
    assert got.shape == ref.shape and got.dtype == ref.dtype
    if ref.dtype == np.uint8:
        if mode == "cubic":
            diff = np.abs(ref.astype(int) - got.astype(int))
            assert diff.max() <= 1, f"cubic uint8 diff {diff.max()} > 1"
            frac = (diff > 0).mean()
            assert frac < 1e-4, f"cubic uint8 mismatch fraction {frac}"
        else:
            np.testing.assert_array_equal(got, ref)
    else:
        scale = max(1.0, float(np.abs(ref).max()))
        np.testing.assert_allclose(got, ref, atol=1e-3 * scale / 255.0 * 255.0)


@pytest.mark.parametrize("name", WARP_CASES)
def test_warp_affine_np_fallback_matches_cv2(name, monkeypatch):
    """The pure-numpy fallback (native dispatch disabled)."""
    from crog_tpu import native

    monkeypatch.setattr(native, "warp_affine", lambda *a, **k: None)
    src = G[f"{name}_src"]
    mat = G[f"{name}_mat"]
    ow, oh = G[f"{name}_meta"]
    border = G[f"{name}_border"]
    mode = str(G[f"{name}_mode"])
    got = warp_affine_np(
        src, mat, (int(ow), int(oh)), mode,
        border if border.size > 1 else float(border[0]),
    )
    _check_warp(got, G[f"{name}_ref"], mode)


@pytest.mark.parametrize("name", WARP_CASES)
def test_native_warp_matches_cv2(name):
    from crog_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    src = G[f"{name}_src"]
    mat = G[f"{name}_mat"]
    ow, oh = G[f"{name}_meta"]
    border = G[f"{name}_border"]
    mode = str(G[f"{name}_mode"])
    got = native.warp_affine(
        src, mat, (int(ow), int(oh)), mode,
        border if border.size > 1 else float(border[0]),
    )
    _check_warp(got, G[f"{name}_ref"], mode)


def test_box_points_matches_cv2():
    for i in range(int(G["box_count"])):
        cx, cy, w, h, ang = G[f"box_{i}_rect"]
        got = box_points(((cx, cy), (w, h), ang))
        np.testing.assert_allclose(got, G[f"box_{i}_pts"], atol=2e-5)


def test_gaussian_matches_scipy_golden():
    got = gaussian_blur_np(G["gauss_src"], 3.0)
    np.testing.assert_allclose(got, G["gauss_ref"], atol=1e-9)
