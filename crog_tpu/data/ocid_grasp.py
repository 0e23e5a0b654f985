"""OCID-Grasp dataset + augmentation for SSG.

Parity targets: ``OCIDGraspDataset`` (reference utils/dataset.py:1069-1416)
and ``DataAugmentor`` (utils/augmentation.py:7-165).

Per scene: RGB, inverted-normalized depth (1 - d/max), instance decomposition
of the semantic mask into per-instance masks/boxes/labels, per-class grasp
rect files, instance<->grasp matching (grasp center inside the instance
mask), per-instance grasp-map rasterization; then photometric distort +
random mirror (train), pad-to-square, resize to img_size, normalized boxes,
/255 + BGR->RGB (reference _normalize_img, utils/augmentation.py:149-154;
only torch's CHW layout permute is dropped — TPU convs are NHWC).

Instance-region decomposition uses scipy.ndimage.label-free connected
regions: OCID instance ids are already unique per instance, so regionprops
reduces to unique-id bounding boxes (reference used skimage.regionprops).
"""

from __future__ import annotations

import os
import random
from typing import Dict, List

import numpy as np
from PIL import Image

from crog_tpu.data.grasp_transforms import GraspTransforms
from crog_tpu.data.ocid_classes import CNAMES
from crog_tpu.ops.resize import resize_np

CLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)


def instance_decomposition(sem_mask: np.ndarray, ins_mask: np.ndarray):
    """Per-instance (label, bbox, mask) from semantic + instance id masks
    (reference utils/dataset.py:1139-1166 via regionprops)."""
    labels: List[int] = []
    bboxes: List[List[float]] = []
    masks: List[np.ndarray] = []
    for cls_id in np.unique(sem_mask):
        if cls_id == 0:
            continue
        cls_bin = sem_mask == cls_id
        cls_ins = np.where(cls_bin, ins_mask, 0)
        for ins_id in np.unique(cls_ins):
            if ins_id == 0:
                continue
            m = cls_ins == ins_id
            ys, xs = np.nonzero(m)
            if len(ys) == 0:
                continue
            labels.append(int(cls_id))
            # regionprops bbox is (minr, minc, maxr+1, maxc+1) -> x1,y1,x2,y2
            bboxes.append(
                [float(xs.min()), float(ys.min()), float(xs.max() + 1),
                 float(ys.max() + 1), float(cls_id)]
            )
            masks.append(m.astype(np.float32))
    return (
        np.asarray(bboxes, np.float32).reshape(-1, 5),
        np.asarray(labels, np.int32),
        np.asarray(masks, np.float32).reshape(-1, *sem_mask.shape),
    )


def parse_grasp_file(path: str, cls_id: int) -> List[List[float]]:
    """4-corner-point text file -> (cx, cy, w, h, theta, cls) rects
    (reference utils/dataset.py:1170-1207)."""
    rects = []
    pts: List[tuple] = []
    with open(path) as f:
        for line in f:
            x, y = line.strip().split(" ")
            pts.append((float(x), float(y)))
            if len(pts) == 4:
                p1, p2, p3, p4 = pts
                cx = (p1[0] + p3[0]) / 2
                cy = (p1[1] + p3[1]) / 2
                w = np.hypot(p1[0] - p4[0], p1[1] - p4[1])
                h = np.hypot(p1[0] - p2[0], p1[1] - p2[1])
                theta = np.arctan2(p4[0] - p1[0], p4[1] - p1[1]) * 180 / np.pi
                theta = theta - 90 if theta > 0 else theta + 90
                rects.append([cx, cy, w, h, theta, int(cls_id)])
                pts = []
    return rects


def _bgr_hsv(img: np.ndarray) -> np.ndarray:
    """cv2 float32 BGR->HSV: H in [0,360), S,V in [0,1]-scaled by 255 input."""
    b, g, r = img[..., 0], img[..., 1], img[..., 2]
    maxc = np.maximum(np.maximum(r, g), b)
    minc = np.minimum(np.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = np.where(maxc > 0, delta / np.maximum(maxc, 1e-12), 0.0)
    h = np.zeros_like(maxc)
    mask = delta > 0
    rc = np.where(mask, (maxc - r) / np.maximum(delta, 1e-12), 0)
    gc = np.where(mask, (maxc - g) / np.maximum(delta, 1e-12), 0)
    bc = np.where(mask, (maxc - b) / np.maximum(delta, 1e-12), 0)
    h = np.where(maxc == r, bc - gc, h)
    h = np.where((maxc == g) & (maxc != r), 2.0 + rc - bc, h)
    h = np.where((maxc == b) & (maxc != r) & (maxc != g), 4.0 + gc - rc, h)
    h = (h * 60.0) % 360.0
    return np.stack([h, s, v], axis=-1)


def _hsv_bgr(img: np.ndarray) -> np.ndarray:
    h, s, v = img[..., 0], img[..., 1], img[..., 2]
    h = (h % 360.0) / 60.0
    i = np.floor(h).astype(np.int32) % 6
    f = h - np.floor(h)
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    r = np.choose(i, [v, q, p, p, t, v])
    g = np.choose(i, [t, v, v, q, p, p])
    b = np.choose(i, [p, p, t, v, v, q])
    return np.stack([b, g, r], axis=-1)


class DataAugmentor:
    """reference utils/augmentation.py:7-165.

    Split into ``draw()`` (consumes the python ``random`` stream in the
    EXACT reference call order — coins, conditional uniforms, mirror, pad)
    and ``apply(d, p)`` (deterministic given the params), so the raw SSG
    wire format can draw on host and replay the identical augmentation ON
    DEVICE (crog_tpu.data.ssg_rawwire).  ``__call__`` = apply(d, draw())
    keeps legacy behavior bit-for-bit.
    """

    def __init__(self, img_size: int, mode: str = "train"):
        self.img_size = img_size
        self.mode = mode
        self.mean = CLIP_MEAN

    def draw(self, h: int, w: int) -> Dict:
        """Draw all augmentation parameters, replicating the reference's
        random-call order (photometric coins/uniforms -> mirror coin -> pad
        offset) so seeded runs match the legacy path draw-for-draw."""
        p = {
            "b_delta": 0.0, "c_factor": 1.0, "h1": 0.0, "h2": 0.0,
            "mirror": 0, "pad_y0": 0, "pad_x0": 0,
        }
        if self.mode == "train":
            if random.randint(0, 1):
                p["b_delta"] = random.uniform(-32, 32)
            if random.randint(0, 1):
                p["c_factor"] = random.uniform(0.7, 1.3)
            p["h1"] = random.uniform(-15, 15)
            p["h2"] = random.uniform(-15, 15)
            p["mirror"] = random.randint(0, 1)
            if h != w:
                if h < w:
                    p["pad_y0"] = random.randint(0, w - h)
                elif h > w:
                    p["pad_x0"] = random.randint(0, h - w)
        return p

    def _photometric_distort(self, d: Dict, p: Dict):
        img = d["rgb"].astype(np.float32)
        img = np.clip(img + p["b_delta"], 0.0, 255.0)
        img = np.clip(img * p["c_factor"], 0.0, 255.0)
        hsv = _bgr_hsv(img)
        # DELIBERATE bug-for-bug parity, do not "fix": the reference's
        # _random_saturation mutates channel 0 (hue) instead of channel 1
        # (/root/reference/utils/augmentation.py:43-54), so its photometric
        # distort shifts hue TWICE and never touches saturation.  The trained
        # models saw exactly this distribution.
        hsv[..., 0] = (hsv[..., 0] + p["h1"]) % 360.0
        hsv[..., 0] = (hsv[..., 0] + p["h2"]) % 360.0
        img = np.clip(_hsv_bgr(hsv), 0.0, 255.0)
        d["rgb"] = img

    def _mirror(self, d: Dict, p: Dict):
        if p["mirror"]:
            width = d["rgb"].shape[1]
            d["rgb"] = d["rgb"][:, ::-1]
            d["depth"] = d["depth"][:, ::-1]
            d["ins_masks"] = d["ins_masks"][:, :, ::-1]
            for k in ("qua", "ang", "wid"):
                d["grasp_masks"][k] = d["grasp_masks"][k][:, :, ::-1]
            b = d["bboxes"][:, :4].copy()
            d["bboxes"][:, 0] = width - b[:, 2]
            d["bboxes"][:, 2] = width - b[:, 0]

    def _pad_to_square(self, d: Dict, p: Dict):
        img = d["rgb"]
        h, w = img.shape[:2]
        if h == w:
            return
        size = max(h, w)
        y0, x0 = p["pad_y0"], p["pad_x0"]
        pad_img = np.zeros((size, size, 3), np.float32)
        pad_img[:, :] = self.mean  # NOTE reference pads with 0-1 mean values
        pad_img[y0 : y0 + h, x0 : x0 + w] = img
        d["rgb"] = pad_img

        def pad2(x):
            out = np.zeros((size, size), np.float32)
            out[y0 : y0 + h, x0 : x0 + w] = x
            return out

        def pad3(x):
            out = np.zeros((x.shape[0], size, size), np.float32)
            out[:, y0 : y0 + h, x0 : x0 + w] = x
            return out

        d["depth"] = pad2(d["depth"])
        d["ins_masks"] = pad3(d["ins_masks"])
        for k in ("qua", "ang", "wid"):
            d["grasp_masks"][k] = pad3(d["grasp_masks"][k])
        d["bboxes"][:, [0, 2]] += x0
        d["bboxes"][:, [1, 3]] += y0

    def _resize(self, d: Dict):
        s = self.img_size
        scale = s / d["rgb"].shape[0]
        d["rgb"] = resize_np(d["rgb"], (s, s))
        d["depth"] = resize_np(d["depth"], (s, s))

        def rs(stack):
            return np.stack([resize_np(m, (s, s)) for m in stack]) if len(
                stack
            ) else stack
        d["ins_masks"] = rs(d["ins_masks"])
        for k in ("qua", "ang", "wid"):
            d["grasp_masks"][k] = rs(d["grasp_masks"][k])
        d["bboxes"][:, :4] *= scale

    def apply(self, d: Dict, p: Dict):
        """Deterministic augmentation given params ``p`` (from draw())."""
        if self.mode == "train":
            self._photometric_distort(d, p)
            self._mirror(d, p)
        self._pad_to_square(d, p)
        self._resize(d)
        h, w = d["rgb"].shape[:2]
        d["bboxes"][:, [0, 2]] /= w
        d["bboxes"][:, [1, 3]] /= h
        # /255 then BGR->RGB, exactly the reference's _normalize_img
        # (utils/augmentation.py:149-154; torch's CHW permute is layout-only
        # and dropped — TPU convs are NHWC)
        d["rgb"] = np.ascontiguousarray(
            d["rgb"].astype(np.float32)[:, :, ::-1] / 255.0
        )
        return d

    def __call__(self, d: Dict):
        return self.apply(d, self.draw(*d["rgb"].shape[:2]))


def finalize_legacy(pre: Dict, augmentor, grasp_transforms) -> Dict:
    """Pre-augment dict -> the dense legacy training sample: per-instance
    grasp-map rasterization (host raster + blur, reference
    utils/dataset.py:1211-1252), DataAugmentor, then sin/cos of the
    DEGREE-UNIT ang canvas (reference quirk, utils/dataset.py:1283-1284)."""
    d = dict(pre)
    stacks = [
        grasp_transforms.generate_masks(r) for r in pre["ins_grasp_rects"]
    ]
    hw = pre["rgb"].shape[:2]
    d["grasp_masks"] = {
        "qua": np.asarray([g["qua"] / 255.0 for g in stacks]).reshape(-1, *hw),
        "ang": np.asarray([g["ang"] for g in stacks], np.float32).reshape(
            -1, *hw
        ),
        "wid": np.asarray([g["wid"] / 255.0 for g in stacks]).reshape(-1, *hw),
    }
    augmentor(d)
    d["grasp_masks"]["sin"] = np.sin(2 * d["grasp_masks"]["ang"])
    d["grasp_masks"]["cos"] = np.cos(2 * d["grasp_masks"]["ang"])
    return d


class OCIDGraspDataset:
    def __init__(
        self,
        root_dir: str,
        split: str,
        img_size: int = 544,
        depth_factor: float = 1000.0,
        with_depth: bool = True,
        with_grasp_masks: bool = True,
        raw: bool = False,
        max_objs: int = 24,
        max_rects: int = 16,
    ):
        self.root_dir = root_dir
        self.split = split
        self.img_size = img_size
        self.depth_factor = depth_factor
        self.with_depth = with_depth
        self.with_grasp_masks = with_grasp_masks
        self.raw = raw
        self.max_objs = max_objs
        self.max_rects = max_rects
        self.grasp_transforms = GraspTransforms()
        self.num_classes = len(CNAMES)
        aug_mode = "train" if split == "training_0" else "test"
        self.augmentor = DataAugmentor(img_size, aug_mode)
        with open(os.path.join(root_dir, "data_split", split + ".txt")) as f:
            self.meta = [x.strip().split(",") for x in f.readlines()]

    def __len__(self):
        return len(self.meta)

    def load_pre(self, index: int) -> Dict:
        scene_id, img_f = self.meta[index]
        base = os.path.join(self.root_dir, scene_id)
        rgb = np.asarray(
            Image.open(os.path.join(base, "rgb", img_f)).convert("RGB")
        )[..., ::-1].astype(np.float32)  # reference keeps BGR order
        d: Dict = {
            "scene_id": scene_id,
            "img_f": img_f,
            "rgb": rgb,
            "ori_size": np.asarray(rgb.shape[:2], np.int32),
        }
        depth = (
            np.asarray(Image.open(os.path.join(base, "depth", img_f))).astype(
                np.float32
            )
            / self.depth_factor
        )
        d["depth"] = 1.0 - depth / depth.max()
        sem = np.asarray(
            Image.open(os.path.join(base, "seg_mask_labeled_combi", img_f))
        )
        ins = np.asarray(
            Image.open(os.path.join(base, "seg_mask_instances_combi", img_f))
        )
        bboxes, labels, masks = instance_decomposition(sem, ins)
        d["sem_mask"] = sem.astype(np.float32)

        # per-class grasp annotations + instance matching
        anno = os.path.join(base, "Annotations_per_class", img_f[:-4])
        raw_rects: List[List[float]] = []
        if os.path.isdir(anno):
            for cls_id in os.listdir(anno):
                gp = os.path.join(anno, cls_id, img_f[:-4] + ".txt")
                if os.path.exists(gp):
                    raw_rects += parse_grasp_file(gp, int(cls_id))

        keep_boxes, keep_labels, keep_masks = [], [], []
        grasp_rects = []
        for i in range(bboxes.shape[0]):
            box, mask, label = bboxes[i], masks[i], labels[i]
            matched = [
                r
                for r in raw_rects
                if int(r[-1]) == int(box[4])
                and mask[int(r[1]), int(r[0])] > 0
            ]
            if matched:
                keep_boxes.append(box)
                keep_labels.append(label)
                keep_masks.append(mask)
                grasp_rects.append(np.asarray(matched, np.float32))
        d["bboxes"] = np.asarray(keep_boxes, np.float32).reshape(-1, 5)
        d["labels"] = np.asarray(keep_labels, np.int32)
        d["ins_masks"] = np.asarray(keep_masks, np.float32).reshape(
            -1, *rgb.shape[:2]
        )
        d["ins_grasp_rects"] = grasp_rects
        return d

    def __getitem__(self, index: int) -> Dict:
        pre = self.load_pre(index)
        if self.raw:
            from crog_tpu.data.ssg_rawwire import pack_ssg_raw

            return pack_ssg_raw(
                pre, self.augmentor, self.max_objs, self.max_rects
            )
        return finalize_legacy(pre, self.augmentor, self.grasp_transforms)

    def visualization(self, index: int, tgt_dir: str):
        """GT debug figures (reference utils/dataset.py:1289-1394): one
        raw-data figure (RGB / depth / semantic mask) plus a per-instance
        grid of mask + grasp maps, written under ``tgt_dir``."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        d = self[index]
        os.makedirs(tgt_dir, exist_ok=True)
        rgb = np.clip(np.asarray(d["rgb"], np.float32), 0.0, 1.0)
        if rgb.ndim == 3 and rgb.shape[0] in (3, 4):  # CHW after augmentor
            rgb = rgb.transpose(1, 2, 0)[:, :, :3]
        fig = plt.figure(figsize=(25, 10))
        for i, (data, title, kw) in enumerate(
            (
                (rgb, "RGB", {}),
                (np.asarray(d["depth"]), "Depth", dict(cmap="gray")),
                (np.asarray(d["sem_mask"]), "Segm Mask", {}),
            ),
            start=1,
        ):
            ax = fig.add_subplot(1, 3, i)
            ax.imshow(data, **kw)
            ax.set_title(title)
            ax.axis("off")
        plt.tight_layout()
        plt.savefig(os.path.join(tgt_dir, "raw-data.png"))
        plt.close(fig)

        panels = (
            ("ins", None), ("qua", dict(cmap="jet", vmin=0, vmax=1)),
            ("sin", dict(cmap="rainbow", vmin=-1, vmax=1)),
            ("cos", dict(cmap="rainbow", vmin=-1, vmax=1)),
            ("wid", dict(cmap="jet", vmin=0, vmax=1)),
        )
        for i in range(d["ins_masks"].shape[0]):
            fig = plt.figure(figsize=(20, 2))
            maps = {
                "ins": d["ins_masks"][i],
                **{k: d["grasp_masks"][k][i] for k in ("qua", "sin", "cos", "wid")},
            }
            for j, (key, kw) in enumerate(panels, start=1):
                ax = fig.add_subplot(1, 5, j)
                ax.imshow(np.asarray(maps[key]), **(kw or {}))
                ax.set_title(key)
                ax.axis("off")
            plt.tight_layout()
            plt.savefig(os.path.join(tgt_dir, f"instance-{i}.png"))
            plt.close(fig)
        return tgt_dir


def collate_ssg(samples: List[Dict], max_objs: int = 24) -> Dict:
    """Pad the ragged object axis to ``max_objs`` producing the dense GT
    layout ssg_losses consumes (replaces the reference's list-of-tensors
    collate + per-image loss loops)."""
    b = len(samples)
    s = samples[0]["rgb"].shape[0]
    out = {
        "img": np.zeros((b, s, s, 4 if "depth" in samples[0] else 3), np.float32),
        "boxes": np.zeros((b, max_objs, 4), np.float32),
        "labels": np.zeros((b, max_objs), np.int32),
        "obj_valid": np.zeros((b, max_objs), bool),
        "ins_masks": np.zeros((b, max_objs, s, s), np.float32),
        "grasp_qua": np.zeros((b, max_objs, s, s), np.float32),
        "grasp_sin": np.zeros((b, max_objs, s, s), np.float32),
        "grasp_cos": np.zeros((b, max_objs, s, s), np.float32),
        "grasp_wid": np.zeros((b, max_objs, s, s), np.float32),
        "ins_grasp_rects": [],
        "ori_size": np.stack([x["ori_size"] for x in samples]),
    }
    for i, d in enumerate(samples):
        out["img"][i, :, :, :3] = d["rgb"]
        if "depth" in d:
            out["img"][i, :, :, 3] = d["depth"]
        m = min(d["bboxes"].shape[0], max_objs)
        out["boxes"][i, :m] = d["bboxes"][:m, :4]
        out["labels"][i, :m] = d["labels"][:m] if len(d["labels"]) else 0
        out["obj_valid"][i, :m] = True
        out["ins_masks"][i, :m] = d["ins_masks"][:m]
        out["grasp_qua"][i, :m] = d["grasp_masks"]["qua"][:m]
        out["grasp_sin"][i, :m] = d["grasp_masks"]["sin"][:m]
        out["grasp_cos"][i, :m] = d["grasp_masks"]["cos"][:m]
        out["grasp_wid"][i, :m] = d["grasp_masks"]["wid"][:m]
        # no semantic-mask field: the aux semantic head's GT is built in-loss
        # from the (augmented) per-instance masks + labels
        # (ssg_loss.semantic_seg_loss), exactly the reference's scatter of
        # instance masks into class channels (model/ssg.py:510-529); the raw
        # scene-level sem_mask is never letterboxed by the augmentor and so
        # cannot be collated consistently
        out["ins_grasp_rects"].append(d.get("ins_grasp_rects", []))
    return out
