"""Build a tiny on-disk fixture tree in the EXACT OCID layout.

Schema replicated (reference /root/reference/utils/dataset.py):
  * OCID-VLG:    refer/<version>/{split}_expressions.json   (:704-766)
  * OCID-Grasp:  data_split/<split>.txt + per-scene dirs    (:1094-1207)
  * RefOCIDGrasp: {mode}_expressions.json at the root       (:110-335)
  * per scene:   <seq>/rgb|depth|seg_mask_labeled_combi|
                 seg_mask_instances_combi/<im>.png and
                 <seq>/Annotations_per_class/<im_stem>/<cls_id>/<im_stem>.txt

Images are real-format: 640x480 8-bit RGB PNGs, 16-bit depth PNGs
(millimeters), 16-bit id masks.  Grasp annotation files hold 4 corner points
per rect, one "x y" pair per line, in the p1..p4 order the reference's
parser expects (utils/dataset.py:1180-1207).
"""

from __future__ import annotations

import json
import os

import numpy as np
from PIL import Image

H, W = 480, 640

# (subname, class_name, class_id, instance_id, bbox x,y,w,h)
SCENE_OBJECTS = [
    ("apple_1", "apple", 1, 2, (100, 120, 80, 80)),
    ("banana_1", "banana", 3, 3, (350, 250, 120, 70)),
]


def grasp_corners(cx, cy, w, h, theta_deg):
    """4 corner points (p1..p4) of a grasp rect such that the reference's
    4-point parse (utils/dataset.py:617-631) recovers exactly
    (cx, cy, w, h, theta_deg)."""
    raw = np.deg2rad(theta_deg + 90.0)
    e_w = np.array([np.sin(raw), np.cos(raw)])
    e_h = np.array([np.cos(raw), -np.sin(raw)])
    c = np.array([cx, cy], np.float64)
    p1 = c - e_w * w / 2 - e_h * h / 2
    p2 = p1 + h * e_h
    p4 = p1 + w * e_w
    p3 = p4 + h * e_h
    return np.stack([p1, p2, p3, p4])


def _scene_arrays(seed: int):
    """RGB / depth / semantic mask / instance mask for one scene."""
    rng = np.random.RandomState(seed)
    rgb = np.clip(
        110 + rng.randint(-10, 10, (H, W, 3)), 0, 255
    ).astype(np.uint8)
    depth = np.full((H, W), 900, np.uint16)
    sem = np.zeros((H, W), np.uint16)
    ins = np.zeros((H, W), np.uint16)
    for _, _, cls_id, ins_id, (x, y, w, h) in SCENE_OBJECTS:
        rgb[y : y + h, x : x + w] = (40 * cls_id % 255, 200, 60)
        depth[y : y + h, x : x + w] = 700
        sem[y : y + h, x : x + w] = cls_id
        ins[y : y + h, x : x + w] = ins_id
    return rgb, depth, sem, ins


def _scene_grasps():
    """Per object: list of (cx, cy, w, h, theta) grasp rects, all with the
    center inside the object mask."""
    out = {}
    for sub, _, cls_id, ins_id, (x, y, w, h) in SCENE_OBJECTS:
        cx, cy = x + w / 2, y + h / 2
        out[sub] = [
            (cx, cy, 60.0, 20.0, 0.0),
            (cx + 5, cy - 4, 50.0, 18.0, 30.0),
        ]
    return out


def build_ocid_tree(root, num_scenes: int = 2, version: str = "multiple"):
    """Write the fixture tree under ``root``; returns the scene list."""
    root = str(root)
    scenes = []
    grasps_by_sub = _scene_grasps()
    vlg_items = []
    ref_items = {}
    split_lines = []
    qi = 0
    for s in range(num_scenes):
        seq = f"ARID20/floor/bottom/seq{s:02d}"
        im = f"result_scene_{s:02d}.png"
        scenes.append((seq, im))
        stem = im[:-4]
        base = os.path.join(root, seq)
        rgb, depth, sem, ins = _scene_arrays(seed=s)
        for sub, arr in (
            ("rgb", rgb),
            ("depth", depth),
            ("seg_mask_labeled_combi", sem),
            ("seg_mask_instances_combi", ins),
        ):
            os.makedirs(os.path.join(base, sub), exist_ok=True)
            Image.fromarray(arr).save(os.path.join(base, sub, im))
        # Annotations_per_class/<stem>/<cls_id>/<stem>.txt
        for subname, cname, cls_id, ins_id, bbox in SCENE_OBJECTS:
            cls_dir = os.path.join(
                base, "Annotations_per_class", stem, str(cls_id)
            )
            os.makedirs(cls_dir, exist_ok=True)
            with open(os.path.join(cls_dir, stem + ".txt"), "w") as f:
                for cx, cy, gw, gh, th in grasps_by_sub[subname]:
                    for px, py in grasp_corners(cx, cy, gw, gh, th):
                        f.write(f"{px:.2f} {py:.2f}\n")
        split_lines.append(f"{seq},{im}")

        # referring expressions: 2 per object -> 4 per scene
        for subname, cname, cls_id, ins_id, (x, y, w, h) in SCENE_OBJECTS:
            pts = [
                grasp_corners(*g).tolist() for g in grasps_by_sub[subname]
            ]
            for sent in (
                f"pick up the {cname}",
                f"grasp the {cname} on the table",
            ):
                vlg_items.append(
                    dict(
                        image_filename=f"{seq},{im}",
                        box=[x, y, w, h],
                        grasps=pts,
                        answer=ins_id,
                        target=subname,
                        question=sent,
                        question_index=qi,
                        program=[{"type": "filter", "value": cname}],
                    )
                )
                ref_items[str(qi)] = dict(
                    **{"class": cname},
                    scene_path=f"{seq}/rgb/{im}",
                    bbox=f"[{x}, {y}, {x + w}, {y + h}]",
                    sentence=sent,
                )
                qi += 1

    refer_dir = os.path.join(root, "refer", version)
    os.makedirs(refer_dir, exist_ok=True)
    for split in ("train", "val", "test"):
        with open(
            os.path.join(refer_dir, f"{split}_expressions.json"), "w"
        ) as f:
            json.dump({"data": vlg_items}, f)
        with open(os.path.join(root, f"{split}_expressions.json"), "w") as f:
            json.dump(ref_items, f)

    os.makedirs(os.path.join(root, "data_split"), exist_ok=True)
    for split in ("training_0", "validation_0"):
        with open(os.path.join(root, "data_split", split + ".txt"), "w") as f:
            f.write("\n".join(split_lines) + "\n")
    return scenes
