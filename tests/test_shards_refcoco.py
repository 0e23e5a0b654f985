"""Record shards + RefCOCO dataset flow (directory backend; lmdb-gated)."""

import io
import os

import numpy as np
from PIL import Image

from crog_tpu.data.refcoco import RefCOCODataset
from crog_tpu.data.shards import ShardReader, ShardWriter, decode_record, encode_record


def test_record_roundtrip():
    rec = {
        "img_bytes": b"\x89PNG fake",
        "mask": np.random.RandomState(0).randint(0, 2, (48, 64)).astype(np.uint8),
        "sents": np.asarray(["the red mug", "mug on the left"]),
        "cat": 7,
        "img_name": "x.jpg",
    }
    out = decode_record(encode_record(rec))
    assert out["img_bytes"] == rec["img_bytes"]
    assert np.array_equal(out["mask"], rec["mask"])
    assert out["cat"] == 7
    assert out["img_name"] == "x.jpg"
    assert list(out["sents"]) == list(rec["sents"])


def _png_bytes(arr):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def test_shard_write_read_and_dataset(tmp_path):
    rng = np.random.RandomState(1)
    shard = str(tmp_path / "refcoco" / "val")
    w = ShardWriter(shard)
    for i in range(4):
        img = (rng.rand(60, 80, 3) * 255).astype(np.uint8)
        mask = (rng.rand(60, 80) > 0.7).astype(np.uint8)
        w.put(
            str(i),
            {
                "img_bytes": _png_bytes(img),
                "mask": mask,
                "sents": np.asarray([f"object number {i}", "the thing"]),
                "cat": i,
                "img_name": f"{i}.jpg",
            },
        )
    w.close()

    r = ShardReader(shard)
    assert len(r) == 4
    assert np.array_equal(r[2]["mask"].shape, (60, 80))

    ds = RefCOCODataset(str(tmp_path / "refcoco"), "val", input_size=64,
                        word_length=17)
    assert len(ds) == 4
    s = ds[1]
    assert s["img"].shape == (64, 64, 3)
    assert s["mask"].shape == (64, 64)
    assert s["word"].shape == (17,)
    assert s["word"][0] == 49406
    assert s["sentence"] == "object number 1"  # eval split: first sentence
