"""REFER annotation API for the RefCOCO family (refcoco / refcoco+ / refcocog).

Compact re-implementation of the public refer toolkit interface the reference
vendored (tools/refer.py:37): loads refs(<dataset>).p + instances.json from a
refer data root and exposes ref/ann/image/category lookups plus mask decode.

Requires the external refer download (not vendored); pycocotools is needed
only for RLE mask decode and is import-gated.
"""

from __future__ import annotations

import itertools
import json
import os
import pickle
from typing import Dict, List

import numpy as np


class REFER:
    def __init__(self, data_root: str, dataset: str = "refcoco", splitBy: str = "unc"):
        self.data_root = data_root
        self.dataset = dataset
        ref_file = os.path.join(data_root, dataset, f"refs({splitBy}).p")
        inst_file = os.path.join(data_root, dataset, "instances.json")
        if not os.path.exists(ref_file):
            raise FileNotFoundError(
                f"{ref_file} not found — download the refer data "
                "(https://github.com/lichengunc/refer) into the data root"
            )
        with open(ref_file, "rb") as f:
            self.refs: List[Dict] = pickle.load(f)
        with open(inst_file) as f:
            instances = json.load(f)
        self.anns = {a["id"]: a for a in instances["annotations"]}
        self.imgs = {i["id"]: i for i in instances["images"]}
        self.cats = {c["id"]: c["name"] for c in instances["categories"]}
        self.ref_index = {r["ref_id"]: r for r in self.refs}
        self.img_to_refs: Dict[int, List[Dict]] = {}
        self.ann_to_ref = {}
        for r in self.refs:
            self.img_to_refs.setdefault(r["image_id"], []).append(r)
            self.ann_to_ref[r["ann_id"]] = r

    def getRefIds(self, split: str = "") -> List[int]:
        refs = self.refs
        if split:
            if split in ("testA", "testB", "testC"):
                refs = [r for r in refs if split[-1] in r["split"]]
            elif split in ("testAB", "testBC", "testAC"):
                refs = [r for r in refs if r["split"] == split]
            elif split == "test":
                refs = [r for r in refs if "test" in r["split"]]
            elif split in ("train", "val"):
                refs = [r for r in refs if r["split"] == split]
            else:
                raise ValueError(f"no such split {split}")
        return [r["ref_id"] for r in refs]

    def loadRefs(self, ref_ids) -> List[Dict]:
        if isinstance(ref_ids, int):
            ref_ids = [ref_ids]
        return [self.ref_index[i] for i in ref_ids]

    def loadAnns(self, ann_ids) -> List[Dict]:
        if isinstance(ann_ids, int):
            ann_ids = [ann_ids]
        return [self.anns[i] for i in ann_ids]

    def loadImgs(self, image_ids) -> List[Dict]:
        if isinstance(image_ids, int):
            image_ids = [image_ids]
        return [self.imgs[i] for i in image_ids]

    def getMask(self, ref: Dict) -> np.ndarray:
        """Binary mask for a ref's annotation (polygon or RLE segmentation)."""
        ann = self.anns[ref["ann_id"]]
        img = self.imgs[ref["image_id"]]
        h, w = img["height"], img["width"]
        seg = ann["segmentation"]
        if isinstance(seg, list):  # polygons
            from crog_tpu.ops.rects import polygon_mask

            mask = np.zeros((h, w), bool)
            for poly in seg:
                xs = np.asarray(poly[0::2])
                ys = np.asarray(poly[1::2])
                mask |= polygon_mask(ys, xs, (h, w))
            return mask.astype(np.uint8)
        # RLE
        try:
            from pycocotools import mask as maskUtils  # type: ignore
        except ImportError as e:  # pragma: no cover
            raise RuntimeError(
                "RLE segmentation decode requires pycocotools"
            ) from e
        rle = seg if isinstance(seg, dict) else maskUtils.frPyObjects(seg, h, w)
        return maskUtils.decode(rle).astype(np.uint8)
