"""Build record shards from data_process.py output (reference
tools/folder2lmdb.py:35-71, which wrote pyarrow-serialized LMDB).

Writes crog_tpu shards (LMDB when the lmdb package is importable, else a
directory shard — see crog_tpu.data.shards) with encoded image bytes, mask
array and sentences per ref.

Usage:
  python tools/folder2lmdb.py -j <anns/refcoco/anns> -i <coco_images> \
      -m <anns/refcoco/masks> -o <shards/refcoco> [-s train]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crog_tpu.data.shards import ShardWriter  # noqa: E402


def folder2shard(json_dir, img_dir, mask_dir, output_dir, split):
    with open(os.path.join(json_dir, f"{split}.json")) as f:
        anns = json.load(f)
    writer = ShardWriter(os.path.join(output_dir, split))
    for i, item in enumerate(anns):
        with open(os.path.join(img_dir, item["img_name"]), "rb") as f:
            img_bytes = f.read()
        mask = np.asarray(
            Image.open(os.path.join(mask_dir, item["mask_name"]))
        )
        writer.put(
            str(item["seg_id"]),
            {
                "img_bytes": img_bytes,
                "mask": (mask > 127).astype(np.uint8),
                "sents": np.asarray(item["sents"]),
                "cat": int(item["cat"]),
                "img_name": item["img_name"],
            },
        )
        if (i + 1) % 1000 == 0:
            print(f"{split}: {i + 1}/{len(anns)}")
    writer.close()
    print(f"wrote {len(anns)} records ({writer.backend}) to "
          f"{os.path.join(output_dir, split)}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("-j", "--json-dir", required=True)
    p.add_argument("-i", "--img-dir", required=True)
    p.add_argument("-m", "--mask-dir", required=True)
    p.add_argument("-o", "--output-dir", required=True)
    p.add_argument("-s", "--split", default="train")
    a = p.parse_args()
    folder2shard(a.json_dir, a.img_dir, a.mask_dir, a.output_dir, a.split)
