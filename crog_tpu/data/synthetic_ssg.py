"""Synthetic OCID-Grasp-style dataset for SSG tests/bench: deterministic
scenes with per-instance masks, boxes, labels and grasp maps in the exact
collate layout of crog_tpu.data.ocid_grasp (no OCID download needed)."""

from __future__ import annotations

from typing import Dict

import numpy as np

from crog_tpu.data.grasp_transforms import GraspTransforms
from crog_tpu.ops.rects import box_points, polygon_mask


class SyntheticOCIDGrasp:
    def __init__(
        self,
        num_samples: int = 64,
        split: str = "training_0",
        img_size: int = 544,
        num_classes: int = 32,
        with_depth: bool = True,
        seed: int = 0,
    ):
        self.num_samples = num_samples
        self.img_size = img_size
        self.num_classes = num_classes
        self.with_depth = with_depth
        self.seed = seed + (0 if split == "training_0" else 50_000)
        self.gt = GraspTransforms(width=img_size, height=img_size)

    def __len__(self):
        return self.num_samples

    def __getitem__(self, n: int) -> Dict:
        s = self.img_size
        rng = np.random.RandomState(self.seed + n)
        img = rng.uniform(0.3, 0.5, (s, s, 3)).astype(np.float32)
        depth = rng.uniform(0.4, 0.6, (s, s)).astype(np.float32)
        num_obj = rng.randint(2, 5)
        boxes, labels, masks = [], [], []
        grasp_rects, qua_l, ang_l, wid_l = [], [], [], []
        sem = np.zeros((s, s), np.float32)
        for i in range(num_obj):
            cls = rng.randint(1, self.num_classes)
            cx, cy = rng.uniform(0.2 * s, 0.8 * s, 2)
            w, h = rng.uniform(0.08 * s, 0.25 * s, 2)
            theta = rng.uniform(-80, 80)
            corners = box_points(((cx, cy), (w, h), theta))
            mask = polygon_mask(corners[:, 1], corners[:, 0], (s, s))
            img[mask] = rng.rand(3)
            sem[mask] = cls
            ys, xs = np.nonzero(mask)
            if len(ys) == 0:
                continue
            boxes.append(
                [xs.min() / s, ys.min() / s, (xs.max() + 1) / s,
                 (ys.max() + 1) / s]
            )
            labels.append(cls)
            masks.append(mask.astype(np.float32))
            rects = np.asarray(
                [[cx, cy, min(h * 0.9, 99.0), 20.0, -theta, cls]], np.float32
            )
            grasp_rects.append(rects)
            gm = self.gt.generate_masks(rects)
            qua_l.append(gm["qua"] / 255.0)
            ang_l.append(gm["ang"].astype(np.float32) * np.pi / 180.0)
            wid_l.append(gm["wid"] / 255.0)
        ang = np.asarray(ang_l, np.float32)
        return {
            "rgb": img,
            "depth": depth,
            "ori_size": np.asarray([s, s], np.int32),
            "bboxes": np.concatenate(
                [np.asarray(boxes, np.float32),
                 np.asarray(labels, np.float32)[:, None]], axis=1
            ),
            "labels": np.asarray(labels, np.int32),
            "ins_masks": np.asarray(masks, np.float32),
            "sem_mask": sem,
            "ins_grasp_rects": grasp_rects,
            "grasp_masks": {
                "qua": np.asarray(qua_l, np.float32),
                "ang": ang,
                "wid": np.asarray(wid_l, np.float32),
                "sin": np.sin(2 * ang),
                "cos": np.cos(2 * ang),
            },
        }


class SyntheticOCIDGraspFrames:
    """OCIDGrasp-layout synthetic at the CAMERA frame size (480x640 like
    OCID), flowing through the SAME host pipeline as the real reader —
    per-instance raster + DataAugmentor (legacy) or raw wire packing
    (crog_tpu.data.ssg_rawwire).  The plain SyntheticOCIDGrasp above builds
    544^2 collate-layout samples directly and bypasses the host pipeline:
    fine for the compute bench, useless as e2e / host-cost evidence."""

    def __init__(
        self,
        num_samples: int = 64,
        split: str = "training_0",
        img_size: int = 544,
        frame_hw=(480, 640),
        num_classes: int = 32,
        seed: int = 0,
        raw: bool = False,
        max_objs: int = 24,
        max_rects: int = 16,
    ):
        from crog_tpu.data.ocid_grasp import DataAugmentor

        self.num_samples = num_samples
        self.img_size = img_size
        self.frame_hw = tuple(frame_hw)
        self.num_classes = num_classes
        self.seed = seed + (0 if split == "training_0" else 50_000)
        self.raw = raw
        self.max_objs = max_objs
        self.max_rects = max_rects
        self.grasp_transforms = GraspTransforms(
            width=frame_hw[1], height=frame_hw[0]
        )
        self.augmentor = DataAugmentor(
            img_size, "train" if split == "training_0" else "test"
        )

    def __len__(self):
        return self.num_samples

    def load_pre(self, n: int) -> Dict:
        h0, w0 = self.frame_hw
        rng = np.random.RandomState(self.seed + n)
        # BGR float 0-255 with INTEGER values, like the real reader's
        # uint8 PNG decode (ocid_grasp.py load_pre)
        rgb = np.full((h0, w0, 3), float(rng.randint(90, 130)), np.float32)
        depth = rng.uniform(0.3, 0.7, (h0, w0)).astype(np.float32)
        num_obj = rng.randint(2, 5)
        boxes, labels, masks, grasp_rects = [], [], [], []
        for i in range(num_obj):
            cls = rng.randint(1, self.num_classes)
            cx = rng.uniform(0.2 * w0, 0.8 * w0)
            cy = rng.uniform(0.2 * h0, 0.8 * h0)
            w, h = rng.uniform(40, 110), rng.uniform(30, 80)
            theta = rng.uniform(-80, 80)
            corners = box_points(((cx, cy), (w, h), theta))
            mask = polygon_mask(corners[:, 1], corners[:, 0], (h0, w0))
            if not mask.any():
                continue
            rgb[mask] = rng.randint(0, 256, 3).astype(np.float32)
            ys, xs = np.nonzero(mask)
            boxes.append(
                [float(xs.min()), float(ys.min()), float(xs.max() + 1),
                 float(ys.max() + 1), float(cls)]
            )
            labels.append(cls)
            masks.append(mask.astype(np.float32))
            rects = [
                [cx, cy, min(h * 0.9, 99.0), 20.0, float(rng.uniform(-85, 85)),
                 float(cls)]
                for _ in range(rng.randint(1, 4))
            ]
            grasp_rects.append(np.asarray(rects, np.float32))
        return {
            "rgb": rgb,
            "depth": depth,
            "ori_size": np.asarray([h0, w0], np.int32),
            "bboxes": np.asarray(boxes, np.float32).reshape(-1, 5),
            "labels": np.asarray(labels, np.int32),
            "ins_masks": np.asarray(masks, np.float32).reshape(-1, h0, w0),
            "ins_grasp_rects": grasp_rects,
        }

    def __getitem__(self, n: int) -> Dict:
        from crog_tpu.data.ocid_grasp import finalize_legacy
        from crog_tpu.data.ssg_rawwire import pack_ssg_raw

        pre = self.load_pre(n)
        if self.raw:
            return pack_ssg_raw(
                pre, self.augmentor, self.max_objs, self.max_rects
            )
        return finalize_legacy(pre, self.augmentor, self.grasp_transforms)
