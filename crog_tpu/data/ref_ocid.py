"""RefOCIDGrasp — the older/alternative CROG dataset (reference
utils/dataset.py:110-603; unused by the shipped entry points but part of the
capability surface).

Reads ``{mode}_expressions.json`` at the dataset root (a dict keyed by ref id
with class / scene_path / bbox / sentence fields), matches the referred
instance by bbox IoU against per-class instance regions (the reference used
shapely polygon IoU of axis-aligned boxes — plain rectangle IoU here, which is
mathematically identical for axis-aligned rectangles and drops the shapely
dependency), keeps grasps whose center falls inside the matched mask, and
produces the same letterboxed tensors as OCIDVLGDataset.

The reference version also had a latent NameError (``cls_names`` undefined,
utils/dataset.py:123) — fixed here by construction.
"""

from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np
from PIL import Image

from crog_tpu.data.grasp_transforms import GraspTransforms
from crog_tpu.data.ocid_classes import CNAMES
from crog_tpu.data.ocid_grasp import parse_grasp_file
from crog_tpu.data.ocid_vlg import OCIDVLGDataset


def _rect_iou(a, b) -> float:
    ax1, ay1, ax2, ay2 = a
    bx1, by1, bx2, by2 = b
    iw = max(0.0, min(ax2, bx2) - max(ax1, bx1))
    ih = max(0.0, min(ay2, by2) - max(ay1, by1))
    inter = iw * ih
    union = (ax2 - ax1) * (ay2 - ay1) + (bx2 - bx1) * (by2 - by1) - inter
    return inter / union if union > 0 else 0.0


class RefOCIDGraspDataset:
    def __init__(
        self,
        root_path: str,
        input_size: int = 416,
        word_length: int = 17,
        mode: str = "train",
    ):
        with open(os.path.join(root_path, f"{mode}_expressions.json")) as f:
            self.meta_data = json.load(f)
        self.root_path = root_path
        self.keys = list(self.meta_data.keys())
        self.input_size = (input_size, input_size)
        self.word_length = word_length
        self.mode = mode
        self.cls_names = CNAMES
        self.transform_grasp = GraspTransforms()
        self.with_grasp_masks = True

    def __len__(self):
        return len(self.keys)

    def _match_mask(self, bbox, ins_masks, cls_mask) -> np.ndarray:
        """Instance whose bbox best overlaps the referred bbox (reference
        _match_masks_with_ref, utils/dataset.py:294-325)."""
        cls_ins = np.where(cls_mask, ins_masks, 0)
        best_iou, best_id = 0.0, 0
        for ins_id in np.unique(cls_ins):
            if ins_id == 0:
                continue
            ys, xs = np.nonzero(cls_ins == ins_id)
            cand = (xs.min(), ys.min(), xs.max() + 1, ys.max() + 1)
            iou = _rect_iou(bbox, cand)
            if iou > best_iou:
                best_iou, best_id = iou, ins_id
        return cls_ins == best_id

    def __getitem__(self, index: int) -> Dict:
        key = self.keys[index]
        ref = self.meta_data[key]
        obj_cls = int(self.cls_names[ref["class"]])
        scene_path = ref["scene_path"]
        img = np.asarray(
            Image.open(os.path.join(self.root_path, scene_path)).convert("RGB")
        )
        base = scene_path.replace("rgb", "")
        sem = np.asarray(
            Image.open(
                os.path.join(
                    self.root_path,
                    scene_path.replace("rgb", "seg_mask_labeled_combi"),
                )
            )
        )
        ins = np.asarray(
            Image.open(
                os.path.join(
                    self.root_path,
                    scene_path.replace("rgb", "seg_mask_instances_combi"),
                )
            )
        )
        annos_dir = os.path.join(
            self.root_path,
            scene_path.replace("rgb", "Annotations_per_class")[:-4],
        )
        img_f = os.path.basename(scene_path)
        grasp_path = os.path.join(
            annos_dir, str(obj_cls), img_f[:-4] + ".txt"
        )
        rects = (
            parse_grasp_file(grasp_path, obj_cls)
            if os.path.exists(grasp_path)
            else []
        )

        bbox = ref["bbox"]
        if isinstance(bbox, str):
            # reference _load_bbox (utils/dataset.py:346-350): the JSON holds
            # the box as a "[a, b, c, d]" string; the values are consumed as
            # corner coordinates by _match_masks_with_ref (:294-299)
            bbox = [int(v) for v in bbox.replace("[", "").replace("]", "").split(",")]
        x1, y1, x2, y2 = bbox
        mask = self._match_mask((x1, y1, x2, y2), ins, sem == obj_cls)
        grasps = [
            r for r in rects if mask[int(r[1]), int(r[0])]
        ]
        grasps = np.asarray(grasps, np.float64).reshape(-1, 6)
        grasp_masks = self.transform_grasp.generate_masks(grasps)

        sample = OCIDVLGDataset.preprocess(
            self, img, mask, grasp_masks, ref["sentence"]
        )
        sample.update(
            grasps=grasps,
            sentence=ref["sentence"],
            target=ref["class"],
            bbox=np.asarray([x1, y1, x2, y2]),
            sent_id=key,
            scene_id=scene_path,
        )
        return sample
