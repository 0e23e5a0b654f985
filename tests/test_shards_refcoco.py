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


def test_refcoco_eval_end_to_end(tmp_path):
    """Variable-resolution RefCOCO records evaluate through the FULL device
    eval stack (per-sample inverse warp to each image's own size — the
    geometry the reference did per sample on CPU, engine/crog_engine.py:
    233-244) with the padded tail batch scored correctly."""
    import jax
    import jax.numpy as jnp

    from crog_tpu.data.loader import DataLoader, device_put_crog
    from crog_tpu.engine.crog_engine import make_eval_step, validate_without_grasp
    from crog_tpu.models.crog import CROG

    rng = np.random.RandomState(2)
    shard = str(tmp_path / "refcoco" / "val")
    w = ShardWriter(shard)
    sizes = [(60, 80), (100, 64), (90, 90), (64, 120), (72, 56)]
    for i, (h, wd) in enumerate(sizes):
        img = (rng.rand(h, wd, 3) * 255).astype(np.uint8)
        mask = (rng.rand(h, wd) > 0.6).astype(np.uint8)
        w.put(str(i), {
            "img_bytes": _png_bytes(img), "mask": mask,
            "sents": np.asarray([f"sample {i}"]), "cat": i,
            "img_name": f"{i}.jpg",
        })
    w.close()

    ds = RefCOCODataset(str(tmp_path / "refcoco"), "val", input_size=128,
                        word_length=17)
    assert ds.max_ori_size == (640, 640)
    # small canvas covering the test sizes keeps the CPU compile fast
    ds.max_ori_size = (128, 128)
    loader = DataLoader(ds, batch_size=2, shuffle=False, drop_last=False,
                        pad_last_batch=True, num_workers=2,
                        device_put_fn=device_put_crog)

    model = CROG(
        input_resolution=128, vision_layers=(1, 1, 1, 1),
        transformer_layers=2, num_layers=1, dtype=jnp.float32,
    )
    b0 = next(iter(loader))
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)}, b0["img"], b0["word"], train=False
    )
    eval_step = make_eval_step(model, input_size=128, ori_hw=(128, 128))
    result = validate_without_grasp(loader, eval_step, variables)
    assert set(result) == {"iou", "prec", "j_index@1", "j_index@5"}
    assert 0.0 <= result["iou"] <= 1.0
    # all 5 samples scored despite batch_size 2 (padded tail, not dropped)
    # -> iou is a mean over 5 values; verify by recomputing sample count
    ious = []
    for batch in loader:
        out = eval_step(variables, batch)
        n_valid = int(batch.get("n_valid", np.asarray(out["iou"]).shape[0]))
        ious.extend(np.asarray(out["iou"])[:n_valid].tolist())
    assert len(ious) == 5
    np.testing.assert_allclose(np.mean(ious), result["iou"], rtol=1e-6)
