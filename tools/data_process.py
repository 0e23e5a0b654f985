"""RefCOCO-family preparation: refer annotations -> per-split JSON + mask PNGs
(reference tools/data_process.py:82-137).

Usage:
  python tools/data_process.py --data-root <refer_root> --output-dir <anns> \
      --dataset refcoco --split unc [--generate-mask]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.refer import REFER  # noqa: E402

SPLIT_MAP = {
    "refcoco": ["train", "val", "testA", "testB"],
    "refcoco+": ["train", "val", "testA", "testB"],
    "refcocog_umd": ["train", "val", "test"],
    "refcocog_google": ["train", "val"],
}


def process(data_root, output_dir, dataset, split_by, generate_mask):
    refer = REFER(data_root, dataset.split("_")[0], split_by)
    key = dataset if dataset in SPLIT_MAP else dataset.split("_")[0]
    for split in SPLIT_MAP[key]:
        out = []
        ref_ids = refer.getRefIds(split)
        mask_dir = os.path.join(output_dir, dataset, "masks")
        os.makedirs(mask_dir, exist_ok=True)
        for ref_id in ref_ids:
            ref = refer.loadRefs(ref_id)[0]
            img = refer.loadImgs(ref["image_id"])[0]
            item = {
                "seg_id": ref_id,
                "img_name": img["file_name"],
                "cat": ref["category_id"],
                "sents": [s["sent"] for s in ref["sentences"]],
                "num_sents": len(ref["sentences"]),
                "mask_name": f"{ref_id}.png",
            }
            if generate_mask:
                mask = refer.getMask(ref) * 255
                Image.fromarray(mask.astype(np.uint8)).save(
                    os.path.join(mask_dir, f"{ref_id}.png")
                )
            out.append(item)
        anns_dir = os.path.join(output_dir, dataset, "anns")
        os.makedirs(anns_dir, exist_ok=True)
        with open(os.path.join(anns_dir, f"{split}.json"), "w") as f:
            json.dump(out, f)
        print(f"{dataset}/{split}: {len(out)} refs")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--dataset", default="refcoco")
    p.add_argument("--split", default="unc", dest="split_by")
    p.add_argument("--generate-mask", action="store_true")
    a = p.parse_args()
    process(a.data_root, a.output_dir, a.dataset, a.split_by, a.generate_mask)
