"""Grasp rectangle conversions and grasp-map rasterization.

Parity target: ``GraspTransforms`` (reference utils/dataset.py:607-682):
4-corner-point grasps <-> (cx, cy, w, h, theta, cls) with theta in (-90, 90],
and rasterized quality/angle/width maps (rects drawn at HALF width, gaussian
sigma 3 on quality and width, width normalized by ``width_factor``).
"""

from __future__ import annotations

import numpy as np

from crog_tpu.ops.filters import gaussian_blur_np
from crog_tpu.ops.rects import box_points, polygon_indices


class GraspTransforms:
    def __init__(self, width_factor: int = 100, width: int = 640, height: int = 480):
        self.width_factor = width_factor
        self.width = width
        self.height = height

    def __call__(self, grasp_rectangles: np.ndarray, target) -> np.ndarray:
        """[M, 4, 2] corner points -> [M, 6] (cx, cy, w, h, theta_deg, cls)."""
        m = grasp_rectangles.shape[0]
        p1, p2, p3, p4 = np.split(grasp_rectangles.astype(np.float64), 4, axis=1)
        center_x = (p1[..., 0] + p3[..., 0]) / 2
        center_y = (p1[..., 1] + p3[..., 1]) / 2
        width = np.hypot(p1[..., 0] - p4[..., 0], p1[..., 1] - p4[..., 1])
        height = np.hypot(p1[..., 0] - p2[..., 0], p1[..., 1] - p2[..., 1])
        theta = (
            np.arctan2(p4[..., 0] - p1[..., 0], p4[..., 1] - p1[..., 1])
            * 180.0
            / np.pi
        )
        theta = np.where(theta > 0, theta - 90.0, theta + 90.0)
        cls = np.tile(np.array([[target]], np.float64), (m, 1))
        return np.concatenate(
            [center_x, center_y, width, height, theta, cls], axis=1
        )

    def inverse(self, grasp_rectangles):
        """[M, >=5] rects -> list of [4, 2] int corner arrays."""
        boxes = []
        for rect in grasp_rectangles:
            cx, cy, w, h, theta = rect[:5]
            box = box_points(((cx, cy), (w, h), -(theta + 180.0)))
            boxes.append(box.astype(np.int64))
        return boxes

    def generate_masks(self, grasp_rectangles) -> dict:
        """Rasterize grasp maps (reference utils/dataset.py:643-682): each
        rect drawn at half width; quality/width maps gaussian-blurred; all
        returned uint8 like the reference (values then /255 downstream)."""
        pos = np.zeros((self.height, self.width))
        ang = np.zeros((self.height, self.width))
        wid = np.zeros((self.height, self.width))
        for rect in grasp_rectangles:
            cx, cy, w_rect, h_rect, theta = rect[:5]
            box = box_points(
                ((cx, cy), (w_rect / 2.0, h_rect), -(theta + 180.0))
            ).astype(np.int64)
            rr, cc = polygon_indices(box[:, 0], box[:, 1])
            keep = (rr < self.width) & (cc < self.height)
            rr, cc = rr[keep], cc[keep]
            pos[cc, rr] = 1.0
            ang[cc, rr] = int(theta + 180) if theta < 0 else int(theta)
            wid[cc, rr] = np.clip(w_rect, 0.0, self.width_factor) / self.width_factor
        qua = (gaussian_blur_np(pos, 3) * 255).astype(np.uint8)
        pos8 = (pos * 255).astype(np.uint8)
        ang8 = ang.astype(np.uint8)
        wid8 = (gaussian_blur_np(wid, 3) * 255).astype(np.uint8)
        return {"pos": pos8, "qua": qua, "ang": ang8, "wid": wid8}
