"""RefCOCO-family referring-segmentation dataset (the CRIS-inherited flow the
reference kept alongside OCID-VLG: utils/dataset.py:101-106 reads pyarrow-LMDB
shards produced by tools/folder2lmdb.py).

Reads crog_tpu shard records (see crog_tpu.data.shards) containing encoded
image bytes + mask + sentences, applies the SAME letterbox/normalize
preprocessing as OCID-VLG, and yields mask-only samples for the
``use_grasp_masks=False`` CROG ablation (reference validate_without_grasp,
engine/crog_engine.py:289-381).
"""

from __future__ import annotations

import io
import os
import random
from typing import Dict

import numpy as np
from PIL import Image

from crog_tpu.data.ocid_vlg import CLIP_MEAN, CLIP_STD
from crog_tpu.ops.affine import letterbox_transform, warp_affine_np
from crog_tpu.utils.tokenizer import tokenize


class RefCOCODataset:
    def __init__(
        self,
        shard_dir: str,
        split: str = "train",
        input_size: int = 416,
        word_length: int = 17,
    ):
        from crog_tpu.data.shards import ShardReader

        self.reader = ShardReader(os.path.join(shard_dir, split))
        self.split = split
        self.input_size = (input_size, input_size)
        self.word_length = word_length
        # COCO images are at most 640px on a side; the eval step un-warps
        # each sample to its own ori_size inside this padded canvas
        self.max_ori_size = (640, 640)

    def __len__(self):
        return len(self.reader)

    def __getitem__(self, n: int) -> Dict:
        rec = self.reader[n]
        img = np.asarray(
            Image.open(io.BytesIO(rec["img_bytes"])).convert("RGB")
        )
        mask = np.asarray(rec["mask"], np.uint8)
        sents = rec["sents"]
        if isinstance(sents, np.ndarray):
            sents = [str(s) for s in sents.tolist()]
        # train: random expression; eval: first (CRIS convention)
        sent = random.choice(sents) if self.split == "train" else sents[0]

        ori_size = img.shape[:2]
        mat, mat_inv = letterbox_transform(ori_size, self.input_size)
        border = tuple((CLIP_MEAN * 255).tolist())
        img_w = warp_affine_np(img, mat, self.input_size, "cubic", border)
        img_f = (img_w.astype(np.float32) / 255.0 - CLIP_MEAN) / CLIP_STD
        mask_w = warp_affine_np(
            (mask * 255).astype(np.uint8) if mask.max() <= 1 else mask,
            mat, self.input_size, "linear",
        )
        return {
            "img": img_f,
            "mask": mask_w.astype(np.float32) / 255.0,
            "word": tokenize(sent, self.word_length, True)[0],
            "inverse": mat_inv.astype(np.float32),
            "ori_size": np.asarray(ori_size, np.int32),
            "sentence": sent,
            "sent_id": n,
        }
