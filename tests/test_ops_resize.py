"""Resize ops must match torch.nn.functional.interpolate numerics, because the
reference's losses/eval depend on them (e.g. bicubic align_corners=True eval
upsample, nearest GT downsample)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from crog_tpu.ops.resize import resize2d


CASES = [
    # (in_h, in_w, out_h, out_w, mode, align_corners)
    (26, 26, 52, 52, "linear", False),
    (13, 13, 26, 26, "linear", False),
    (69, 69, 138, 138, "linear", True),  # SSG protonet upsample
    (104, 104, 416, 416, "cubic", True),  # eval upsample
    (52, 52, 104, 104, "cubic", False),
    (416, 416, 104, 104, "nearest", None),  # GT mask downsample
    (544, 544, 138, 138, "linear", False),  # SSG mask-loss downsample
    (17, 31, 40, 23, "linear", False),
    (17, 31, 40, 23, "cubic", True),
]


@pytest.mark.parametrize("in_h,in_w,out_h,out_w,mode,align", CASES)
def test_resize_matches_torch(in_h, in_w, out_h, out_w, mode, align):
    rng = np.random.RandomState(0)
    x = rng.rand(2, 3, in_h, in_w).astype(np.float32)

    torch_mode = {"linear": "bilinear", "cubic": "bicubic", "nearest": "nearest"}[
        mode
    ]
    kwargs = {} if mode == "nearest" else {"align_corners": align}
    ref = F.interpolate(
        torch.from_numpy(x), size=(out_h, out_w), mode=torch_mode, **kwargs
    ).numpy()

    # ours is NHWC
    got = resize2d(
        np.transpose(x, (0, 2, 3, 1)),
        (out_h, out_w),
        mode,
        bool(align),
    )
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
