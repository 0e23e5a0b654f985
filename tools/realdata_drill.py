"""Import-day drill: real OCID-VLG data + a trained reference .pth -> metric
table, in ONE command (VERDICT r04 next #8).

The real-data quality targets (mask IoU / J@1 parity, BASELINE.md target #2)
are unprovable in the build environment — no OCID download, no trained
weights.  This tool makes day-one a single command when they land:

  python tools/realdata_drill.py --data-dir /data/OCID-VLG \
      --pth /ckpts/best_iou_model.pth [--version multiple] [--split test]

which 1) validates the dataset layout the reader expects (reference
utils/dataset.py:704-766: refer/<version>/<split>_expressions.json plus the
scene files the first expressions point at), 2) runs the full eval CLI
(test_crog.py — on-the-fly torch->flax conversion, jitted eval stack), and
3) prints the final metric table (IoU, Pr@50-90, J@1, J@5) next to the
reference's published numbers to eyeball parity.

Smoke-tested end-to-end with --fixture: builds the tiny real-format OCID
tree (tests/ocid_fixture.py — real PNGs, expressions JSON, per-class grasp
annotation txts) and a REFERENCE-SCHEMA random .pth (the torch state_dict
of /root/reference's own CROG, like tests/test_torch_parity_full.py), then
runs the identical pipeline on it (tests/test_realdata_drill.py).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def validate_layout(data_dir: str, version: str, split: str) -> dict:
    """Check the OCID-VLG tree the reader will walk; returns a summary."""
    refer = os.path.join(data_dir, "refer", version,
                         f"{split}_expressions.json")
    if not os.path.isfile(refer):
        raise SystemExit(
            f"[drill] missing {refer} — expected the reference layout "
            "refer/<version>/<split>_expressions.json "
            "(reference utils/dataset.py:704-710)"
        )
    with open(refer) as f:
        refer_data = json.load(f)
    items = refer_data["data"]  # reader schema, crog_tpu/data/ocid_vlg.py:81
    n = len(items)
    if n == 0:
        raise SystemExit(f"[drill] {refer} holds zero expressions")
    first = items[0]
    seq_path, im_name = first["image_filename"].split(",")
    missing = [
        os.path.join(seq_path, sub, im_name)
        for sub in ("rgb", "depth", "seg_mask_instances_combi")
        if not os.path.isfile(
            os.path.join(data_dir, seq_path, sub, im_name)
        )
    ]
    summary = {
        "expressions": n,
        "first_keys": sorted(first.keys()),
        "missing_scene_files": missing,
    }
    if missing:
        raise SystemExit(f"[drill] scene files missing: {missing[:4]}")
    return summary


def make_fixture(tmp: str) -> tuple:
    """Fixture tree + reference-schema random .pth (requires torch and the
    mounted reference repo — the smoke-test path, not the import-day path)."""
    import types

    import numpy as np
    import torch

    from tests.ocid_fixture import build_ocid_tree

    data_dir = os.path.join(tmp, "OCID-VLG")
    build_ocid_tree(data_dir, num_scenes=2, version="multiple")

    ref = "/root/reference"
    if ref not in sys.path:
        pass
    name = "model"
    if name not in sys.modules or not getattr(
        sys.modules[name], "__crog_ref__", False
    ):
        pkg = types.ModuleType(name)
        pkg.__path__ = [os.path.join(ref, "model")]
        pkg.__crog_ref__ = True
        sys.modules[name] = pkg
    import model.clip as ref_clip
    import model.crog as ref_crog

    torch.manual_seed(0)
    clip = ref_clip.CLIP(
        embed_dim=1024, image_resolution=224, vision_layers=(3, 4, 6, 3),
        vision_width=64, vision_patch_size=None, context_length=77,
        txt_length=17, vocab_size=49408, transformer_width=512,
        transformer_heads=8, transformer_layers=12,
    )
    clip_sd = clip.state_dict()

    class _FakeArchive:
        def eval(self):
            return self

        def state_dict(self):
            return dict(clip_sd)

    real_jit_load = torch.jit.load
    torch.jit.load = lambda *a, **k: _FakeArchive()
    try:
        cfg = types.SimpleNamespace(
            use_contrastive=True, use_pretrained_clip=True,
            use_grasp_masks=True, clip_pretrain="<in-memory>",
            word_len=17, word_dim=1024, vis_dim=512,
            fpn_in=(512, 1024, 1024), fpn_out=(256, 512, 1024),
            num_layers=3, num_head=8, dim_ffn=2048, dropout=0.1,
            intermediate=False,
        )
        ref_model = ref_crog.CROG(cfg).eval()
    finally:
        torch.jit.load = real_jit_load
    pth = os.path.join(tmp, "fixture_model.pth")
    # the reference saves the DDP-wrapped state dict with 'module.' prefixes
    # (train_crog.py:245-258); keep them so the drill exercises the same
    # strip the converter applies to real checkpoints
    sd = {"module." + k: v for k, v in ref_model.state_dict().items()}
    torch.save({"state_dict": sd, "epoch": 0}, pth)
    return data_dir, pth


def run_eval(config: str, data_dir: str, pth: str, split: str,
             version: str, extra_opts) -> str:
    cmd = [
        sys.executable, os.path.join(REPO, "test_crog.py"),
        "--config", config, "--opts",
        "root_path", data_dir,
        "dataset", "OCID-VLG",
        "version", version,
        "test_split", split,
        "resume", pth,
        "exp_name", "realdata_drill",
    ] + list(extra_opts or [])
    print("[drill] running:", " ".join(cmd), flush=True)
    proc = subprocess.run(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True
    )
    sys.stdout.write(proc.stdout[-4000:])
    if proc.returncode != 0:
        raise SystemExit(f"[drill] eval failed rc={proc.returncode}")
    m = re.search(r"Final: (IoU=.*)$", proc.stdout, re.M)
    if not m:
        raise SystemExit("[drill] no Final metric line in eval output")
    return m.group(1).strip()


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", help="real OCID-VLG root")
    p.add_argument("--pth", help="trained reference checkpoint (.pth)")
    p.add_argument(
        "--config", default="config/OCID-VLG/crog_multiple_r50.yaml"
    )
    p.add_argument("--version", default="multiple")
    p.add_argument("--split", default="test")
    p.add_argument(
        "--fixture", action="store_true",
        help="smoke mode: tiny real-format fixture tree + random "
        "reference-schema .pth instead of real data",
    )
    p.add_argument("--opts", default=[], nargs=argparse.REMAINDER)
    a = p.parse_args()

    tmp_ctx = tempfile.TemporaryDirectory() if a.fixture else None
    try:
        if a.fixture:
            data_dir, pth = make_fixture(tmp_ctx.name)
            split, version = "train", "multiple"
        else:
            if not (a.data_dir and a.pth):
                raise SystemExit("--data-dir and --pth required "
                                 "(or --fixture for the smoke test)")
            data_dir, pth, split, version = (
                a.data_dir, a.pth, a.split, a.version
            )
        summary = validate_layout(data_dir, version, split)
        print(f"[drill] layout OK: {json.dumps(summary)}", flush=True)
        final = run_eval(a.config, data_dir, pth, split, version, a.opts)
        print("\n================ DRILL RESULT ================")
        print(f"split={split} version={version}")
        print(final)
        print("reference comparison: paper table (arXiv 2311.05779) — "
              "IoU/J@1 within ~1pt = conversion + eval stack healthy")
        print("==============================================")
    finally:
        if tmp_ctx is not None:
            tmp_ctx.cleanup()


if __name__ == "__main__":
    main()
