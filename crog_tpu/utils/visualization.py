"""Qualitative visualization (reference utils/grasp_eval.py:226-287 and the
per-sample PNG dumps in engine/crog_engine.py:530-533 /
engine/ssg_engine.py:184-263)."""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from crog_tpu.ops.rects import box_points


def _draw_line(img: np.ndarray, p0, p1, color, thickness: int = 2):
    """Integer line rasterizer (replaces cv2.line for annotation images)."""
    h, w = img.shape[:2]
    x0, y0 = float(p0[0]), float(p0[1])
    x1, y1 = float(p1[0]), float(p1[1])
    n = int(max(abs(x1 - x0), abs(y1 - y0), 1)) * 2
    t = np.linspace(0.0, 1.0, n)
    xs = np.round(x0 + (x1 - x0) * t).astype(int)
    ys = np.round(y0 + (y1 - y0) * t).astype(int)
    r = thickness // 2
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            xi = np.clip(xs + dx, 0, w - 1)
            yi = np.clip(ys + dy, 0, h - 1)
            img[yi, xi] = color


def draw_grasp_rects(img: np.ndarray, rects: Sequence) -> np.ndarray:
    """Draw grasp rectangles: gripper jaws red, fingers blue (reference
    utils/grasp_eval.py:233-242)."""
    out = np.ascontiguousarray(img).copy()
    for rect in rects:
        cx, cy, w, h, theta = rect[:5]
        box = box_points(((cx, cy), (w, h), -(theta + 180.0)))
        a, b, c, d = [p for p in box.astype(int)]
        _draw_line(out, a, b, (255, 0, 0))
        _draw_line(out, d, c, (255, 0, 0))
        _draw_line(out, b, c, (0, 0, 255))
        _draw_line(out, a, d, (0, 0, 255))
    return out


def visualize_grasp_prediction(
    img: np.ndarray,
    mask: np.ndarray,
    grasp_masks,
    grasps: Sequence,
    text: str,
    save_path: Optional[str] = None,
):
    """6-panel figure: RGB / predicted grasps / instance mask / quality /
    angle / width maps (reference utils/grasp_eval.py:226-287)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    qua, ang, wid = grasp_masks
    fig = plt.figure(figsize=(25, 10))
    panels = [
        (img / 255.0, "RGB", {}),
        (draw_grasp_rects(img, grasps) / 255.0, "predicted grasps", {}),
        (mask, "predicted instance mask", {}),
        (qua, "Grasp quality", dict(cmap="jet", vmin=0, vmax=1)),
        (ang, "Grasp Angle", dict(cmap="jet", vmin=0, vmax=1)),
        (wid, "Grasp Width", dict(cmap="jet", vmin=0, vmax=1)),
    ]
    for i, (data, title, kw) in enumerate(panels, start=1):
        ax = fig.add_subplot(2, 3, i)
        im = ax.imshow(data, **kw)
        ax.set_title(title)
        ax.axis("off")
        if kw:
            plt.colorbar(im)
    plt.suptitle(text, fontsize=20)
    plt.tight_layout()
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        plt.savefig(save_path)
    plt.close(fig)
    return save_path


def draw_proto_lincomb(protos: np.ndarray, coeffs: np.ndarray) -> np.ndarray:
    """Prototype linear-combination debug grid (reference draw_lincomb,
    utils/grasp_eval.py:15-51): prototypes sorted by |coeff|, 4x8 grid of the
    running sigmoid combination."""
    p_h, p_w, n = protos.shape
    idx = np.argsort(-np.abs(coeffs))
    arr_h, arr_w = 4, 8
    grid = np.zeros((p_h * arr_h, p_w * arr_w), np.float32)
    running = np.zeros((p_h, p_w), np.float32)
    for y in range(arr_h):
        for x in range(arr_w):
            i = arr_w * y + x
            if i >= n:
                break
            running = running + protos[:, :, idx[i]] * coeffs[idx[i]]
            nonlin = 1.0 / (1.0 + np.exp(-running))
            grid[y * p_h : (y + 1) * p_h, x * p_w : (x + 1) * p_w] = (
                nonlin > 0.5
            )
    return grid


def visualize_gt_sample(
    sample,
    save_path: str,
    annotated: Optional[np.ndarray] = None,
):
    """GT debug figure for a preprocessed dataset sample (reference
    OCIDVLGDataset.visualization, utils/dataset.py:976-1039): RGB / depth /
    instance mask / annotated grasps / quality / sin / cos / width panels.

    ``sample`` is a crog_tpu dataset item (normalized HWC img, /255 masks,
    radian angles); ``annotated`` is an optional raw-resolution RGB with GT
    rects drawn (grasp coordinates live in original image space).
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from crog_tpu.data.ocid_vlg import CLIP_MEAN, CLIP_STD

    img = np.asarray(sample["img"], np.float32)
    img = np.clip(img * CLIP_STD + CLIP_MEAN, 0.0, 1.0)
    panels = [(img, "RGB", {})]
    if "depth" in sample:
        panels.append((np.asarray(sample["depth"]), "Depth", dict(cmap="gray")))
    panels.append((np.asarray(sample["mask"]), "Segm Mask", {}))
    if annotated is not None:
        panels.append((annotated, "Box & Grasp", {}))
    for key, title, kw in (
        ("qua", "Grasp quality", dict(cmap="jet", vmin=0, vmax=1)),
        ("sin", "Angle-sine", dict(cmap="rainbow", vmin=-1, vmax=1)),
        ("cos", "Angle-cosine", dict(cmap="rainbow", vmin=-1, vmax=1)),
        ("wid", "Width", dict(cmap="jet", vmin=0, vmax=1)),
    ):
        if key in sample:
            panels.append((np.asarray(sample[key]), title, kw))
    fig = plt.figure(figsize=(25, 10))
    for i, (data, title, kw) in enumerate(panels, start=1):
        ax = fig.add_subplot(2, 4, i)
        im = ax.imshow(data, **kw)
        ax.set_title(title)
        ax.axis("off")
        if "vmin" in kw:
            plt.colorbar(im)
    plt.suptitle(str(sample.get("sentence", "")), fontsize=20)
    plt.tight_layout()
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    plt.savefig(save_path)
    plt.close(fig)
    return save_path
