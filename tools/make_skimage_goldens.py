"""Generate skimage golden fixtures for the polygon / peak_local_max parity
tests (tests/test_skimage_semantics.py auto-pins against the npz when it
exists).  Reference call sites being pinned: utils/dataset.py:652-676
(skimage.draw.polygon grasp rasterization), utils/grasp_eval.py:292
(skimage.feature.peak_local_max).

Two generation modes, recorded in the npz's ``generator`` field:

* ``skimage-<version>`` — scikit-image is importable: call it directly.
  Preferred; run this wherever skimage exists and commit the npz.
* ``transcription-scipy-<version>`` — scikit-image is NOT importable (it
  cannot be installed in the build environment: no network egress).  Fall
  back to line-faithful SCALAR transcriptions of skimage's own algorithms:

    - ``skimage.draw.polygon``: the bbox scan + crossing-number
      point_in_polygon of skimage/draw/_draw.pyx::_polygon and
      skimage/_shared/geometry.pyx::point_in_polygon.
    - ``skimage.feature.peak_local_max`` (>= 0.19 semantics, what the
      reference's unpinned install resolves to): scipy.ndimage
      maximum_filter candidate mask (scipy IS skimage's actual backend for
      this), trivial-image rule, strict threshold, border exclusion, stable
      intensity sort, and skimage/_shared/coord.py::_ensure_spacing via
      scipy.spatial.cKDTree with ``d < spacing`` rejection (points at
      EXACTLY ``spacing`` are kept — skimage's documented "minimum allowed
      spacing").

  These transcriptions are deliberately scalar/loop-structured — a fully
  independent derivation path from the vectorized implementations under
  test (crog_tpu/ops/rects.py polygon_indices, crog_tpu/ops/peaks.py) —
  so shared bugs between golden and subject are implausible.

The test inputs are derived deterministically from seeds (see the case
tables in tests/test_skimage_semantics.py), so the npz stores only outputs.

    python tools/make_skimage_goldens.py   # writes tests/data/skimage_goldens.npz
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


# ----------------------------------------------------------- transcriptions
def _point_in_polygon(xp, yp, x, y):
    """skimage/_shared/geometry.pyx::point_in_polygon (PNPOLY crossing
    number), transcribed verbatim."""
    n = len(xp)
    j = n - 1
    inside = False
    for i in range(n):
        if ((yp[i] > y) != (yp[j] > y)) and (
            x < (xp[j] - xp[i]) * (y - yp[i]) / (yp[j] - yp[i]) + xp[i]
        ):
            inside = not inside
        j = i
    return inside


def _polygon_transcribed(r, c, shape):
    """skimage/draw/_draw.pyx::_polygon transcribed: integer bbox scan
    (min clamped at 0 even without shape; max = ceil, clamped to shape-1),
    crossing-number test per grid point, row-major emission order."""
    r = np.atleast_1d(np.asarray(r, np.float64))
    c = np.atleast_1d(np.asarray(c, np.float64))
    minr = int(max(0, r.min()))
    maxr = int(np.ceil(r.max()))
    minc = int(max(0, c.min()))
    maxc = int(np.ceil(c.max()))
    if shape is not None:
        maxr = min(shape[0] - 1, maxr)
        maxc = min(shape[1] - 1, maxc)
    rr, cc = [], []
    for r_i in range(minr, maxr + 1):
        for c_i in range(minc, maxc + 1):
            # polygon(r, c): r rows, c cols; the point test is (x=c, y=r)
            if _point_in_polygon(c, r, c_i, r_i):
                rr.append(r_i)
                cc.append(c_i)
    return np.asarray(rr, np.intp), np.asarray(cc, np.intp)


def _peak_local_max_transcribed(image, min_distance, threshold_abs, num_peaks):
    """skimage/feature/peak.py::peak_local_max (defaults: exclude_border=
    True -> min_distance, p_norm=inf) transcribed on scipy primitives."""
    from scipy import ndimage as ndi
    from scipy.spatial import cKDTree

    image = np.asarray(image, np.float64)
    # _get_peak_mask: window-max candidates.  The filter's boundary mode is
    # irrelevant here: the window only exits the image for pixels within
    # min_distance of the border, all of which _exclude_border removes.
    footprint = np.ones((2 * min_distance + 1,) * 2, bool)
    image_max = ndi.maximum_filter(image, footprint=footprint, mode="nearest")
    out = image == image_max
    if np.all(out):  # trivial image: no peaks
        out[:] = False
    out &= image > threshold_abs
    # _exclude_border(width=min_distance per dim)
    if min_distance > 0:
        out[:min_distance] = False
        out[-min_distance:] = False
        out[:, :min_distance] = False
        out[:, -min_distance:] = False
    # _get_high_intensity_peaks: stable descending intensity sort
    coord = np.column_stack(np.nonzero(out))
    if coord.shape[0] == 0:
        return coord.reshape(0, 2)
    idx = np.argsort(-image[coord[:, 0], coord[:, 1]], kind="stable")
    coord = coord[idx]
    # _shared/coord.py::_ensure_spacing(spacing=min_distance, p_norm=inf,
    # max_out=num_peaks): reject candidates at d < spacing of an accepted
    # point ("keep current point and the points at exactly spacing from it")
    tree = cKDTree(coord)
    ball = tree.query_ball_point(coord, r=min_distance, p=np.inf)
    rejected: set = set()
    naccepted = 0
    for i, cands in enumerate(ball):
        if i in rejected:
            continue
        cands = [c for c in cands if c != i]
        if cands:
            d = np.max(np.abs(coord[cands] - coord[i]), axis=1)
            rejected.update(c for c, dd in zip(cands, d) if dd < min_distance)
        naccepted += 1
        if naccepted >= num_peaks:
            break
    keep = np.delete(coord, tuple(rejected), axis=0)
    return keep[:num_peaks]


def main():
    try:
        import skimage
        from skimage.draw import polygon
        from skimage.feature import peak_local_max

        generator = f"skimage-{skimage.__version__}"

        def peaks_fn(img, d, thr, k):
            return peak_local_max(
                img, min_distance=d, threshold_abs=thr, num_peaks=k
            )
    except ImportError:
        import scipy

        polygon = _polygon_transcribed
        peaks_fn = _peak_local_max_transcribed
        generator = f"transcription-scipy-{scipy.__version__}"

    out = {"generator": np.asarray(generator)}
    for name, (r, c, shape) in polygon_cases().items():
        rr, cc = polygon(r, c, shape)
        out[f"poly_{name}_rr"] = rr
        out[f"poly_{name}_cc"] = cc
    for name, (img, min_distance, thr, num_peaks) in peak_cases().items():
        out[f"peak_{name}"] = peaks_fn(img, min_distance, thr, num_peaks)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "data", "skimage_goldens.npz",
    )
    np.savez_compressed(path, **out)
    print(f"wrote {path} ({generator})")


if __name__ == "__main__":
    main()


