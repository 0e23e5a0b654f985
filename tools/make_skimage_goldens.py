"""Generate skimage golden fixtures for the polygon / peak_local_max parity
tests.

scikit-image is NOT installed in the build environment (and not a crog_tpu
dependency), so unlike the cv2 goldens (tools/make_goldens.py, generated
in-tree against cv2 5.0) these must be generated wherever skimage is
available and committed:

    python tools/make_skimage_goldens.py   # writes tests/data/skimage_goldens.npz

tests/test_skimage_semantics.py automatically pins polygon_indices, the
native polygon_fill, and peak_local_max_np against the file when present
(and records the skimage version used).  Reference call sites being pinned:
utils/dataset.py:652-676 (skimage.draw.polygon grasp rasterization),
utils/grasp_eval.py:292 (skimage.feature.peak_local_max).

The test inputs are derived deterministically from seeds (see CASES below,
mirrored in the test), so the npz stores only outputs.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_skimage_semantics import (  # noqa: E402
    peak_cases,
    polygon_cases,
)


def main():
    import skimage
    from skimage.draw import polygon
    from skimage.feature import peak_local_max

    out = {"skimage_version": np.asarray(skimage.__version__)}
    for name, (r, c, shape) in polygon_cases().items():
        rr, cc = polygon(r, c, shape)
        out[f"poly_{name}_rr"] = rr
        out[f"poly_{name}_cc"] = cc
    for name, (img, min_distance, thr, num_peaks) in peak_cases().items():
        out[f"peak_{name}"] = peak_local_max(
            img,
            min_distance=min_distance,
            threshold_abs=thr,
            num_peaks=num_peaks,
        )
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "data", "skimage_goldens.npz",
    )
    np.savez_compressed(path, **out)
    print(f"wrote {path} (skimage {skimage.__version__})")


if __name__ == "__main__":
    main()
