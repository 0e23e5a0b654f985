"""Generate cv2/scipy golden fixtures for the host-op parity tests.

Runs only where OpenCV is installed (it is NOT a crog_tpu dependency);
the outputs are committed to tests/data/cv2_goldens.npz so the parity tests
pin warp_affine_np / the native C++ kernels / box_points / gaussian_blur_np
against REAL library behavior rather than our own reimplementations
(reference call sites: utils/dataset.py:858-890 warpAffine,
engine/crog_engine.py:127-131 eval inverse warp, utils/dataset.py:633-641
cv2.boxPoints, utils/dataset.py:673-676 gaussian).

Usage: python tools/make_goldens.py  (writes tests/data/cv2_goldens.npz)
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crog_tpu.ops.affine import letterbox_transform  # noqa: E402

CLIP_BORDER = [0.48145466 * 255, 0.4578275 * 255, 0.40821073 * 255]

CASES = [
    # name, ori (h,w), input (h,w), direction, channels, dtype, mode, border
    ("img_fwd_cubic", (480, 640), (416, 416), "fwd", 3, "u8", "cubic", CLIP_BORDER),
    ("mask_fwd_linear", (480, 640), (416, 416), "fwd", 1, "u8", "linear", 0.0),
    ("mask_fwd_nearest", (480, 640), (416, 416), "fwd", 1, "u8", "nearest", 0.0),
    ("eval_inv_cubic_u8", (480, 640), (416, 416), "inv", 1, "u8", "cubic", 0.0),
    ("eval_inv_cubic_f32", (480, 640), (416, 416), "inv", 1, "f32", "cubic", 0.0),
    ("odd_fwd_cubic", (423, 517), (416, 416), "fwd", 3, "u8", "cubic", CLIP_BORDER),
    ("odd_inv_linear", (423, 517), (416, 416), "inv", 1, "u8", "linear", 0.0),
    ("small_inv_cubic", (480, 640), (104, 104), "inv", 1, "f32", "cubic", 0.0),
]

BOX_RECTS = [
    ((100.5, 200.25), (50.0, 20.0), 33.0),
    ((10.0, 10.0), (5.0, 80.0), -77.0),
    ((320.0, 240.0), (64.25, 18.5), -123.4),
    ((0.0, 0.0), (1.0, 1.0), 0.0),
    ((55.5, 66.25), (30.0, 30.0), 45.0),
]


def main():
    import cv2
    from scipy import ndimage

    flags = {
        "nearest": cv2.INTER_NEAREST,
        "linear": cv2.INTER_LINEAR,
        "cubic": cv2.INTER_CUBIC,
    }
    rng = np.random.RandomState(1234)
    out = {"cv2_version": np.array(cv2.__version__)}
    for name, ori, inp, direction, ch, dt, mode, border in CASES:
        mat, mat_inv = letterbox_transform(ori, inp)
        if direction == "fwd":
            m, out_size, in_hw = mat, (inp[1], inp[0]), ori
        else:
            m, out_size, in_hw = mat_inv, (ori[1], ori[0]), inp
        shape = in_hw + (ch,) if ch > 1 else in_hw
        if dt == "u8":
            src = rng.randint(0, 256, shape, np.uint8)
        else:
            src = rng.rand(*shape).astype(np.float32)
        ref = cv2.warpAffine(src, m, out_size, flags=flags[mode], borderValue=border)
        out[f"{name}_src"] = src
        out[f"{name}_ref"] = ref
        out[f"{name}_mat"] = m
        out[f"{name}_meta"] = np.array([out_size[0], out_size[1]])
        out[f"{name}_border"] = np.asarray(border, np.float64).reshape(-1)
        out[f"{name}_mode"] = np.array(mode)

    for i, rect in enumerate(BOX_RECTS):
        out[f"box_{i}_rect"] = np.array(
            [rect[0][0], rect[0][1], rect[1][0], rect[1][1], rect[2]]
        )
        out[f"box_{i}_pts"] = cv2.boxPoints(rect)
    out["box_count"] = np.array(len(BOX_RECTS))

    # gaussian: skimage.filters.gaussian(x, 3, preserve_range=True) is a thin
    # wrapper over this exact scipy call (mode='nearest', truncate=4.0)
    sparse = np.zeros((96, 128))
    idx = rng.randint(0, 96 * 128, 60)
    sparse.flat[idx] = rng.rand(60)
    sparse[:6, :] = 0.7  # exercise the edge padding
    out["gauss_src"] = sparse
    out["gauss_ref"] = ndimage.gaussian_filter(
        sparse, sigma=3.0, mode="nearest", truncate=4.0
    )

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "data", "cv2_goldens.npz",
    )
    np.savez_compressed(path, **out)
    print(f"wrote {path} ({os.path.getsize(path)/1e6:.2f} MB, "
          f"{len(out)} arrays, cv2 {cv2.__version__})")


if __name__ == "__main__":
    main()
