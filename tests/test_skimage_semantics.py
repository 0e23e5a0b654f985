"""Pin the skimage-replicating numeric paths (polygon rasterization, peak
detection) against evidence OUTSIDE their own implementations.

skimage itself is not installed here (see tools/make_skimage_goldens.py for
the golden recipe — the goldens are auto-pinned below when the npz exists),
so three independent anchors are used:

  1. analytic expectations (exact pixel sets for rectangles / triangles,
     PNPOLY boundary behavior) derived from skimage.draw.polygon's documented
     even-odd crossing-number semantics (reference utils/dataset.py:652-676);
  2. matplotlib.path.Path.contains_points — an INDEPENDENT point-in-polygon
     implementation — on interior/exterior points away from edges;
  3. cross-implementation agreement: python polygon_indices vs the native
     C++ polygon_fill on randomized polygons, and peak_local_max_np (scipy
     maximum_filter based — the same backend skimage's peak_local_max calls)
     vs the batched device detector.
"""

import os

import numpy as np
import pytest

from crog_tpu.ops.peaks import peak_local_max_np
from crog_tpu.ops.rects import box_points, polygon_indices, polygon_mask

GOLDENS = os.path.join(os.path.dirname(__file__), "data", "skimage_goldens.npz")


# ---------------------------------------------------------------- case tables
def polygon_cases():
    """name -> (r, c, shape); mirrored by tools/make_skimage_goldens.py."""
    rng = np.random.RandomState(7)
    cases = {
        "unit_rect": ([1, 1, 4, 4], [2, 6, 6, 2], (10, 10)),
        "triangle": ([1.0, 8.0, 8.0], [4.0, 1.0, 8.0], (10, 10)),
        "halfpix": ([0.5, 0.5, 5.5, 5.5], [0.5, 5.5, 5.5, 0.5], (8, 8)),
        "clip": ([-3.0, -3.0, 6.0, 6.0], [-2.0, 9.0, 9.0, -2.0], (5, 5)),
        "noshape": ([2.2, 2.2, 7.7, 7.7], [1.1, 8.8, 8.8, 1.1], None),
    }
    for i in range(4):
        n = rng.randint(3, 8)
        cases[f"rand{i}"] = (
            rng.uniform(0, 60, n), rng.uniform(0, 60, n), (64, 64)
        )
    for i, (cx, cy, w, h, th) in enumerate(
        [(30.0, 25.0, 40.0, 12.0, 0.0), (30.0, 25.0, 30.0, 10.0, 37.0)]
    ):
        box = box_points(((cx, cy), (w / 2, h), -(th + 180.0))).astype(np.int64)
        # the reference passes x as the first polygon axis (utils/dataset.py:652)
        cases[f"grasp{i}"] = (
            box[:, 0].astype(np.float64), box[:, 1].astype(np.float64), (64, 64)
        )
    return cases


def peak_cases():
    """name -> (image, min_distance, threshold_abs, num_peaks)."""
    rng = np.random.RandomState(11)
    smooth = rng.rand(24, 24)
    for _ in range(3):  # low-pass so plateaus/maxima are well separated
        smooth = (
            smooth
            + np.roll(smooth, 1, 0) + np.roll(smooth, -1, 0)
            + np.roll(smooth, 1, 1) + np.roll(smooth, -1, 1)
        ) / 5.0
    smooth = (smooth - smooth.min()) / (smooth.max() - smooth.min())
    plateau = np.zeros((16, 16))
    plateau[4:7, 4:7] = 0.8  # equal-valued plateau
    plateau[10, 12] = 0.9
    two_close = np.zeros((12, 12))
    two_close[5, 5] = 0.7
    two_close[5, 7] = 0.7  # equal peaks at Chebyshev distance 2
    quant = np.round(rng.rand(20, 20) * 8) / 8.0  # many exact ties
    return {
        "smooth": (smooth, 2, 0.4, 5),
        "plateau": (plateau, 2, 0.4, 5),
        "two_close": (two_close, 2, 0.4, 5),
        "quant": (quant, 2, 0.4, 5),
        "quant_d1": (quant, 1, 0.5, 5),
        "top1": (smooth, 2, 0.4, 1),
    }


# ---------------------------------------------------------------- analytic
def test_polygon_axis_aligned_rect_exact():
    # PNPOLY with integer-vertex rect [1,4]x[2,6]: rows 2..4, cols 3..6
    # (bottom/right edges land ON vertices -> strict > excludes row 1 and
    # col 2; col 6 is inside because the crossing at 6.0 satisfies c < 6.0
    # only for c<6 ... verify against first principles below)
    rr, cc = polygon_indices([1, 1, 4, 4], [2, 6, 6, 2], (10, 10))
    got = set(zip(rr.tolist(), cc.tolist()))
    expect = set()
    for r in range(10):
        for c in range(10):
            # even-odd: inside iff 1 < r <= 4 is wrong by parity; compute
            # via the rule directly: crossings with edges r=1->1 (none,
            # horizontal), vertical edges at c: for rect the PNPOLY rule
            # reduces to (1 < r <= 4 ... strictly (vr[i] > r) != (vr[j] > r)
            # -> r in [1, 4) at integer r means r in {1,2,3}? no: (1>r)!=(4>r)
            # holds for 1 <= r < 4 -> rows 1,2,3; and c < xcross with the two
            # crossings at c=2 and c=6 -> inside iff 2 <= ... parity flips
            # when c < 6 and again when c < 2 -> inside iff 2 <= c < 6.
            crossings = 0
            vr = [1, 1, 4, 4]
            vc = [2, 6, 6, 2]
            j = 3
            for i in range(4):
                if (vr[i] > r) != (vr[j] > r):
                    x = (vc[j] - vc[i]) * (r - vr[i]) / (vr[j] - vr[i]) + vc[i]
                    if c < x:
                        crossings += 1
                j = i
            if crossings % 2:
                expect.add((r, c))
    assert got == expect
    assert got == {(r, c) for r in (1, 2, 3) for c in (2, 3, 4, 5)}


def test_polygon_matches_matplotlib_off_boundary():
    mpl_path = pytest.importorskip("matplotlib.path")
    rng = np.random.RandomState(3)
    for _ in range(8):
        n = rng.randint(3, 7)
        vr = rng.uniform(0, 40, n)
        vc = rng.uniform(0, 40, n)
        mask = polygon_mask(vr, vc, (48, 48))
        path = mpl_path.Path(np.stack([vc, vr], axis=1))
        pts_r, pts_c = np.meshgrid(np.arange(48), np.arange(48), indexing="ij")
        pts = np.stack([pts_c.ravel(), pts_r.ravel()], axis=1).astype(float)
        # radius=0 boundary semantics differ between implementations; only
        # compare points decisively inside/outside (eps margin both ways)
        inside_big = path.contains_points(pts, radius=0.02)
        inside_small = path.contains_points(pts, radius=-0.02)
        decisive = inside_big == inside_small
        np.testing.assert_array_equal(
            mask.ravel()[decisive], inside_big[decisive]
        )


def test_polygon_native_matches_python():
    from crog_tpu.native import polygon_fill

    rng = np.random.RandomState(5)
    for i in range(12):
        n = rng.randint(3, 9)
        vr = rng.uniform(-5, 70, n)
        vc = rng.uniform(-5, 70, n)
        canvas = np.zeros((64, 64), np.float64)
        # native canvas is indexed [cc, rr] like the reference's
        # pos_out[cc, rr] write (utils/dataset.py:656-668)
        ok = polygon_fill(canvas, vr, vc, 1.0, clip=(64, 64))
        if not ok:
            pytest.skip("native hostops unavailable")
        rr, cc = polygon_indices(vr, vc, (64, 64))
        keep = (rr < 64) & (cc < 64) & (rr >= 0) & (cc >= 0)
        expect = np.zeros((64, 64), np.float64)
        expect[cc[keep], rr[keep]] = 1.0
        np.testing.assert_array_equal(canvas, expect, err_msg=f"case {i}")


# ---------------------------------------------------------------- peaks
def test_peak_plateau_spacing_and_order():
    img, d, thr, k = peak_cases()["plateau"]
    peaks = peak_local_max_np(img, d, thr, k)
    # highest peak first; the 3x3 equal plateau collapses to ONE survivor
    # via ensure_spacing (Chebyshev <= 2 suppression)
    assert peaks[0].tolist() == [10, 12]
    plateau_peaks = [p for p in peaks.tolist() if p[0] < 8]
    assert len(plateau_peaks) == 1
    assert plateau_peaks[0] == [4, 4]  # row-major first among equals


def test_peak_equal_pair_suppression():
    img, d, thr, k = peak_cases()["two_close"]
    peaks = peak_local_max_np(img, d, thr, k)
    assert peaks.shape == (1, 2)  # distance 2 <= min_distance -> one kept
    assert peaks[0].tolist() == [5, 5]


def test_device_detector_matches_host():
    import jax.numpy as jnp

    from crog_tpu.ops.peaks import detect_grasp_peaks

    for name, (img, d, thr, k) in peak_cases().items():
        if d != 2:
            continue  # device path is built for the eval config (d=2)
        host = peak_local_max_np(img, d, thr, k)
        sin = np.zeros_like(img)
        cos = np.ones_like(img)
        wid = np.full_like(img, 0.5)
        rects, valid = detect_grasp_peaks(
            jnp.asarray(img)[None], jnp.asarray(sin)[None],
            jnp.asarray(cos)[None], jnp.asarray(wid)[None],
            num_peaks=k, min_distance=d, threshold_abs=thr,
        )
        rects = np.asarray(rects[0])[np.asarray(valid[0])]
        got = {(int(r[1]), int(r[0])) for r in rects}
        assert got == {tuple(p) for p in host.tolist()}, name


# ---------------------------------------------------------------- goldens
needs_goldens = pytest.mark.skipif(
    not os.path.exists(GOLDENS),
    reason="skimage goldens not generated (tools/make_skimage_goldens.py "
    "requires scikit-image, unavailable in this environment)",
)


@needs_goldens
def test_polygon_against_skimage_goldens():
    data = np.load(GOLDENS)
    for name, (r, c, shape) in polygon_cases().items():
        rr, cc = polygon_indices(r, c, shape)
        got = set(zip(rr.tolist(), cc.tolist()))
        want = set(
            zip(
                data[f"poly_{name}_rr"].tolist(),
                data[f"poly_{name}_cc"].tolist(),
            )
        )
        assert got == want, name


@needs_goldens
def test_peaks_against_skimage_goldens():
    data = np.load(GOLDENS)
    for name, (img, d, thr, k) in peak_cases().items():
        got = peak_local_max_np(img, d, thr, k)
        want = data[f"peak_{name}"]
        # tie order among equal-intensity peaks is unspecified in skimage
        # (unstable argsort); compare as sets + leading peak value
        assert {tuple(p) for p in got.tolist()} == {
            tuple(p) for p in want.tolist()
        }, name
