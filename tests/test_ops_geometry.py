import numpy as np

import jax.numpy as jnp

from crog_tpu.ops.affine import (
    get_affine_transform,
    invert_affine,
    letterbox_transform,
    warp_affine_jax,
    warp_affine_np,
)
from crog_tpu.ops.filters import gaussian_blur_jax, gaussian_blur_np
from crog_tpu.ops.peaks import detect_grasp_peaks, detect_grasps_np, peak_local_max_np
from crog_tpu.ops.rects import box_points, polygon_mask, rotated_rect_iou


def test_affine_solve_and_invert():
    src = np.array([[0, 0], [640, 0], [0, 480]], np.float32)
    dst = np.array([[13, 58], [403, 58], [13, 350.5]], np.float32)
    m = get_affine_transform(src, dst)
    for s, d in zip(src, dst):
        got = m @ np.array([s[0], s[1], 1.0])
        np.testing.assert_allclose(got, d, atol=1e-6)
    m_inv = invert_affine(m)
    for s, d in zip(src, dst):
        got = m_inv @ np.array([d[0], d[1], 1.0])
        np.testing.assert_allclose(got, s, atol=1e-5)


def test_letterbox_roundtrip():
    mat, mat_inv = letterbox_transform((480, 640), (416, 416))
    # corners of the source map inside the canvas
    corner = mat @ np.array([640.0, 480.0, 1.0])
    assert 0 <= corner[0] <= 416 and 0 <= corner[1] <= 416
    # inverse undoes forward
    p = np.array([123.0, 45.0, 1.0])
    q = mat @ p
    back = mat_inv @ np.array([q[0], q[1], 1.0])
    np.testing.assert_allclose(back, p[:2], atol=1e-5)


def test_warp_identity_and_translation():
    img = np.arange(20 * 30, dtype=np.float32).reshape(20, 30)
    ident = np.array([[1, 0, 0], [0, 1, 0]], np.float64)
    out = warp_affine_np(img, ident, (30, 20), "linear")
    np.testing.assert_allclose(out, img, atol=1e-6)
    out_c = warp_affine_np(img, ident, (30, 20), "cubic")
    np.testing.assert_allclose(out_c, img, atol=1e-4)

    shift = np.array([[1, 0, 5], [0, 1, 0]], np.float64)
    out = warp_affine_np(img, shift, (30, 20), "linear", border_value=-1.0)
    np.testing.assert_allclose(out[:, 5:], img[:, :-5], atol=1e-6)
    assert (out[:, :5] == -1.0).all()


def test_warp_jax_matches_np():
    rng = np.random.RandomState(1)
    img = rng.rand(48, 64).astype(np.float32)
    mat = np.array([[0.8, 0.05, 3.0], [-0.02, 1.1, -2.0]], np.float64)
    inv = invert_affine(mat)
    for interp in ("linear", "cubic"):
        ref = warp_affine_np(img, mat, (40, 32), interp, border_value=0.0)
        got = np.asarray(
            warp_affine_jax(img, inv.astype(np.float32), 32, 40, interp)
        )
        np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


def test_box_points_axis_aligned():
    pts = box_points(((10.0, 20.0), (8.0, 4.0), 0.0))
    # width 8 along x, height 4 along y, centered at (10, 20)
    assert sorted(pts[:, 0].tolist()) == [6.0, 6.0, 14.0, 14.0]
    assert sorted(pts[:, 1].tolist()) == [18.0, 18.0, 22.0, 22.0]


def test_box_points_rotation_90():
    pts0 = box_points(((0.0, 0.0), (8.0, 4.0), 0.0))
    pts90 = box_points(((0.0, 0.0), (8.0, 4.0), 90.0))
    # 90-degree rotation swaps extents
    assert np.allclose(sorted(np.abs(pts90[:, 0])), sorted(np.abs(pts0[:, 1])), atol=1e-5)


def test_polygon_mask_square():
    mask = polygon_mask([2, 2, 6, 6], [3, 8, 8, 3], (12, 12))
    assert mask[4, 5]
    assert not mask[0, 0]
    assert not mask[10, 10]
    # area close to (6-2)*(8-3)
    assert 12 <= mask.sum() <= 30


def test_rotated_rect_iou_identical_and_gate():
    r = [100.0, 100.0, 40.0, 20.0, 15.0]
    gt = [100.0, 100.0, 40.0, 20.0, 15.0, 1.0]
    assert rotated_rect_iou(r, gt) > 0.95
    # angle gate: > 30 degrees apart -> 0
    r2 = [100.0, 100.0, 40.0, 20.0, 60.0]
    assert rotated_rect_iou(r2, gt) == 0.0
    # disjoint
    r3 = [300.0, 300.0, 40.0, 20.0, 15.0]
    assert rotated_rect_iou(r3, gt) == 0.0


def test_peak_local_max_matches_reference_semantics():
    img = np.zeros((50, 50), np.float64)
    img[10, 10] = 1.0
    img[30, 40] = 0.8
    img[11, 11] = 0.6  # suppressed: within min_distance of a larger peak
    img[1, 1] = 0.9  # excluded border
    img[25, 25] = 0.3  # below threshold
    peaks = peak_local_max_np(img, min_distance=2, threshold_abs=0.4, num_peaks=5)
    assert peaks.tolist() == [[10, 10], [30, 40]]


def test_detect_grasp_peaks_device_matches_host():
    rng = np.random.RandomState(3)
    qua = (rng.rand(2, 64, 64) * 0.3).astype(np.float32)
    qua[0, 20, 30] = 0.95
    qua[0, 40, 10] = 0.7
    qua[1, 5, 5] = 0.99
    sin = rng.uniform(-1, 1, (2, 64, 64)).astype(np.float32)
    cos = rng.uniform(-1, 1, (2, 64, 64)).astype(np.float32)
    wid = rng.rand(2, 64, 64).astype(np.float32)

    rects, valid = detect_grasp_peaks(qua, sin, cos, wid, num_peaks=5)
    rects, valid = np.asarray(rects), np.asarray(valid)
    for b in range(2):
        host = detect_grasps_np(qua[b], sin[b], cos[b], wid[b], 5)
        dev = [rects[b, i].tolist() for i in range(5) if valid[b, i]]
        assert len(dev) == len(host)
        for hg, dg in zip(host, dev):
            np.testing.assert_allclose(hg, dg, rtol=1e-4, atol=1e-4)


def test_separable_affine_warp_matches_dense_warp():
    """The matmul formulation of the (axis-aligned) letterbox inverse warp
    must equal the dense cv2-style warp used for parity."""
    from crog_tpu.ops.resize import affine_axis_matrix, separable_affine_warp

    rng = np.random.RandomState(7)
    img = rng.rand(104, 104).astype(np.float32)
    # forward letterbox for ori (120, 160) -> 104 input
    mat, mat_inv = letterbox_transform((120, 160), (104, 104))
    ref = warp_affine_np(img, mat_inv, (160, 120), "cubic", border_value=0.0)
    wrow = affine_axis_matrix(104, 120, mat[1, 1], mat[1, 2], "cubic")
    wcol = affine_axis_matrix(104, 160, mat[0, 0], mat[0, 2], "cubic")
    got = np.asarray(separable_affine_warp(img[None], wrow, wcol))[0]
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_gaussian_blur_jax_matches_scipy():
    rng = np.random.RandomState(4)
    img = rng.rand(33, 47).astype(np.float32)
    ref = gaussian_blur_np(img, 2.0)
    got = np.asarray(gaussian_blur_jax(img, 2.0))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_peak_ensure_spacing_strictness():
    """skimage >= 0.19 applies ensure_spacing after the max filter with a
    STRICT `d < spacing` rejection (skimage/_shared/coord.py: "keep current
    point and the points at exactly spacing from it"): equal ties at
    Chebyshev distance == min_distance are ALL kept; only closer ties are
    suppressed.  Pinned by tests/data/skimage_goldens.npz."""
    img = np.zeros((32, 32))
    img[10, 10] = 0.9
    img[10, 12] = 0.9  # tie, Chebyshev distance 2 == min_distance -> KEPT
    img[12, 12] = 0.9  # tie, distance 2 from both -> KEPT
    img[20, 20] = 0.8
    peaks = peak_local_max_np(img, min_distance=2, threshold_abs=0.4, num_peaks=5)
    assert peaks.tolist() == [[10, 10], [10, 12], [12, 12], [20, 20]]
    # ties STRICTLY closer than min_distance are suppressed (greedy,
    # row-major first among equals)
    img2 = np.zeros((32, 32))
    img2[10, 10] = 0.9
    img2[10, 11] = 0.9  # distance 1 < min_distance: suppressed
    img2[11, 11] = 0.9  # distance 1 from both: suppressed
    peaks2 = peak_local_max_np(img2, 2, 0.4, 5)
    assert peaks2.tolist() == [[10, 10]]


def test_detect_grasp_peaks_device_ensure_spacing_and_refill():
    """Device version: suppressed ties free slots for lower peaks, matching
    the host semantics."""
    qua = np.zeros((1, 64, 64), np.float32)
    coords = [(10, 10), (10, 11), (30, 30), (40, 50), (50, 20), (20, 44),
              (44, 8)]
    vals = [0.9, 0.9, 0.8, 0.7, 0.65, 0.6, 0.55]
    for (r, c), v in zip(coords, vals):
        qua[0, r, c] = v
    sin = np.zeros_like(qua)
    cos = np.ones_like(qua)
    wid = np.full_like(qua, 0.5)
    rects, valid = detect_grasp_peaks(
        jnp.asarray(qua), jnp.asarray(sin), jnp.asarray(cos), jnp.asarray(wid),
        num_peaks=5,
    )
    rects = np.asarray(rects)[0]
    valid = np.asarray(valid)[0]
    host = peak_local_max_np(qua[0], 2, 0.4, 5)
    got = [(int(rects[k, 1]), int(rects[k, 0])) for k in range(5) if valid[k]]
    assert got == [tuple(p) for p in host.tolist()]
    # (10,11): equal tie at distance 1 < min_distance -> suppressed, and a
    # lower peak refills the slot so 5 peaks are still returned
    assert len(got) == 5 and (10, 11) not in got


def test_detect_grasp_peaks_per_sample_valid_extent():
    """Peaks within min_distance of a sample's own (padded) border are
    excluded, like the reference's per-sample original-size eval."""
    qua = np.zeros((2, 40, 40), np.float32)
    qua[0, 28, 28] = 0.9   # inside sample 0's 30x30 extent border -> excluded
    qua[0, 20, 20] = 0.8
    qua[1, 28, 28] = 0.9   # sample 1 is full size -> kept
    sin = np.zeros_like(qua); cos = np.ones_like(qua); wid = np.ones_like(qua)
    valid_hw = np.array([[30, 30], [40, 40]], np.int32)
    rects, valid = detect_grasp_peaks(
        jnp.asarray(qua), jnp.asarray(sin), jnp.asarray(cos), jnp.asarray(wid),
        num_peaks=5, valid_hw=jnp.asarray(valid_hw),
    )
    rects = np.asarray(rects); valid = np.asarray(valid)
    got0 = [(int(rects[0, k, 1]), int(rects[0, k, 0])) for k in range(5)
            if valid[0, k]]
    got1 = [(int(rects[1, k, 1]), int(rects[1, k, 0])) for k in range(5)
            if valid[1, k]]
    assert got0 == [(20, 20)]
    assert got1 == [(28, 28)]
