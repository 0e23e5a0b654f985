"""OCID-VLG dataset (reference OCIDVLGDataset, utils/dataset.py:686-1064).

Loads refer/<version>/{split}_expressions.json, per-item RGB + depth +
instance mask PNGs, grasp rectangles, rasterized grasp maps, and produces the
letterboxed/normalized model inputs plus the inverse warp matrix for eval.

Image decode uses PIL (the reference used OpenCV); all warp/raster numerics
go through crog_tpu.ops for cv2/skimage-matching behavior.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np
from PIL import Image

from crog_tpu.data.grasp_transforms import GraspTransforms
from crog_tpu.ops.affine import letterbox_transform, warp_affine_np
from crog_tpu.utils.tokenizer import tokenize

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

# OCID class/instance dictionaries (reference utils/OCID_sub_class_dict.py)
# are loaded lazily from the dataset root if present; the 59 instance names
# are required to map `target` strings to class indices.
from crog_tpu.data.ocid_classes import CNAMES, SUBNAMES, SUB_TO_CLASS  # noqa: E402


class OCIDVLGDataset:
    def __init__(
        self,
        root_dir: str,
        split: str,
        input_size: int = 416,
        word_length: int = 17,
        with_depth: bool = True,
        with_segm_mask: bool = True,
        with_grasp_masks: bool = True,
        version: str = "multiple",
        transform_grasp: Optional[GraspTransforms] = None,
        compact: bool = False,
        raw: bool = False,
        max_rects: int = 16,
    ):
        self.compact = compact
        self.raw = raw
        self.max_rects = max_rects
        self.root_dir = root_dir
        self.split = split
        self.refer_dir = os.path.join(root_dir, "refer", version)
        self.split_map = {
            "train": "train_expressions.json",
            "val": "val_expressions.json",
            "test": "test_expressions.json",
            # reference test configs use 'val-test' as the test_split name
            "val-test": "test_expressions.json",
        }
        self.input_size = (input_size, input_size)
        self.word_length = word_length
        self.with_depth = with_depth
        self.with_segm_mask = with_segm_mask
        self.with_grasp_masks = with_grasp_masks
        self.transform_grasp = transform_grasp or GraspTransforms()
        self.class_instance_names = SUBNAMES
        self.class_names = CNAMES
        self.instance_idx_to_class_idx = SUB_TO_CLASS
        # every OCID capture is 480x640; the eval step pads its per-sample
        # un-warp canvas to this maximum
        self.max_ori_size = (480, 640)
        self._load_split()

    def _load_split(self):
        path = os.path.join(self.refer_dir, self.split_map[self.split])
        refer_data = json.load(open(path))
        self.items = []
        self.sent_to_index = {}
        for n, item in enumerate(refer_data["data"]):
            seq_path, im_name = item["image_filename"].split(",")
            self.items.append(
                dict(
                    seq_path=seq_path,
                    im_name=im_name,
                    scene_id=item["image_filename"],
                    bbox=item["box"],
                    grasps=item["grasps"],
                    objID=item["answer"],
                    target=item["target"],
                    sentence=item["question"],
                    program=item.get("program"),
                    sent_id=item["question_index"],
                )
            )
            self.sent_to_index[item["question_index"]] = n

    def __len__(self):
        return len(self.items)

    # -- decode helpers (PIL replaces cv2.imread) --
    def _rgb(self, seq_path, im_name):
        p = os.path.join(self.root_dir, seq_path, "rgb", im_name)
        return np.asarray(Image.open(p).convert("RGB"))

    def _depth(self, seq_path, im_name):
        p = os.path.join(self.root_dir, seq_path, "depth", im_name)
        return np.asarray(Image.open(p)).astype(np.float32) / 1000.0

    def _mask(self, seq_path, im_name):
        p = os.path.join(
            self.root_dir, seq_path, "seg_mask_instances_combi", im_name
        )
        return np.asarray(Image.open(p))

    def __getitem__(self, n: int) -> Dict:
        it = self.items[n]
        img = self._rgb(it["seq_path"], it["im_name"])
        target_idx = self.class_instance_names[it["target"]]
        grasps = self.transform_grasp(
            np.asarray(it["grasps"], np.float64), target_idx
        )
        msk_full = self._mask(it["seq_path"], it["im_name"])
        msk = msk_full == it["objID"]

        grasp_masks = (
            self.transform_grasp.generate_masks(grasps)
            if self.with_grasp_masks and not getattr(self, "raw", False)
            else None
        )
        sample = self.preprocess(
            img, msk, grasp_masks, it["sentence"],
            rects=grasps if self.with_grasp_masks else None,
        )
        x, y, w, h = it["bbox"]
        sample.update(
            grasps=grasps,
            sentence=it["sentence"],
            target=it["target"],
            objID=it["objID"],
            bbox=np.asarray([x, y, x + w, y + h]),
            sent_id=it["sent_id"],
            scene_id=it["scene_id"],
        )
        if self.with_depth:
            sample["depth"] = self._depth(it["seq_path"], it["im_name"])
        return sample

    def get_annotated_image(self, n: int) -> np.ndarray:
        """Raw-resolution RGB with the target bbox + GT grasp rects drawn
        (reference get_annotated_image, used by utils/dataset.py:976-1039)."""
        from crog_tpu.utils.visualization import _draw_line, draw_grasp_rects

        it = self.items[n]
        img = self._rgb(it["seq_path"], it["im_name"])
        target_idx = self.class_instance_names[it["target"]]
        grasps = self.transform_grasp(
            np.asarray(it["grasps"], np.float64), target_idx
        )
        out = draw_grasp_rects(img, grasps)
        x, y, w, h = it["bbox"]
        for p0, p1 in (
            ((x, y), (x + w, y)), ((x + w, y), (x + w, y + h)),
            ((x + w, y + h), (x, y + h)), ((x, y + h), (x, y)),
        ):
            _draw_line(out, p0, p1, (0, 255, 0))
        return out

    def visualization(self, n: int, save_path: str):
        """GT debug figure for sample ``n`` (reference
        utils/dataset.py:976-1039): RGB / depth / mask / annotated grasps /
        grasp-map panels, saved as sample_<n>.png under ``save_path``."""
        from crog_tpu.utils.visualization import visualize_gt_sample

        sample = self[n]
        return visualize_gt_sample(
            sample,
            os.path.join(save_path, f"sample_{n}.png"),
            annotated=self.get_annotated_image(n),
        )

    def preprocess(self, img, msk, grasp_masks, sentence, rects=None) -> Dict:
        """Letterbox warp + normalize (reference utils/dataset.py:843-914).

        Every plane is uint8 until the final conversions (img is warped as
        uint8 with the cv2-parity kernel; the grasp maps come out of
        ``generate_masks`` as uint8, including ``ang`` which holds integer
        degrees).  The four linear-interpolated planes are warped in ONE
        native call (the kernel computes the affine coordinates once per
        output pixel and loops channels) — numerically identical to four
        separate warps.

        With ``self.compact`` set (default False), the uint8 planes are
        returned as-is (``img_u8`` [S,S,3], ``planes_u8`` [S,S,{1,4}] in
        PLANE order mask/qua/ang/wid) and the /255, CLIP normalization and
        sin/cos(2*theta) happen on DEVICE inside the jitted step
        (crog_tpu.data.compact.unpack_compact) — 5x fewer bytes on the
        host->device wire and less host arithmetic, at <=1 ulp difference
        in the transcendentals.
        """
        ins_mask = (msk.astype(np.float64) * 255).astype(np.uint8) if msk.max() <= 1.0 else msk
        ori_size = img.shape[:2]
        mat, mat_inv = letterbox_transform(ori_size, self.input_size)

        if getattr(self, "raw", False):
            # raw wire format (crog_tpu.data.rawwire): ship UNWARPED uint8
            # planes + per-grasp raster params; rasterization, blur and the
            # letterbox warp all run on device inside the jit.  raw="lb"
            # letterboxes the IMAGE here on host (the exact legacy uint8
            # warp — bit-exact reference numerics) and ships 416^2 uint8
            # instead of 480x640: 1.7x fewer wire bytes, for tunneled
            # devices where streaming bandwidth bounds e2e throughput.
            from crog_tpu.data.rawwire import pack_mask_bits, pack_raster_params

            out = {
                "word": tokenize(sentence, self.word_length, True)[0],
                "inverse": mat_inv.astype(np.float32),
                "ori_size": np.asarray(ori_size, np.int32),
                "raw_mask_bits": pack_mask_bits(ins_mask),
            }
            if self.raw == "lb":
                assert ori_size[1] % 8 == 0, (
                    "raw='lb' recovers the source frame from the mask "
                    f"bit-plane; width {ori_size[1]} is not a multiple of 8"
                )
                border = tuple((CLIP_MEAN * 255).tolist())
                out["lb_img_u8"] = warp_affine_np(
                    img, mat, self.input_size, "cubic", border_value=border
                )
            else:
                out["raw_img_u8"] = np.ascontiguousarray(img)
            if rects is not None:
                corners, vals = pack_raster_params(
                    np.asarray(rects), getattr(self, "max_rects", 16),
                    self.transform_grasp.width_factor,
                )
                out["rect_corners"] = corners
                out["rect_vals"] = vals
            return out

        border = tuple((CLIP_MEAN * 255).tolist())
        img_w = warp_affine_np(
            img, mat, self.input_size, "cubic", border_value=border
        )
        planes = [ins_mask]
        if grasp_masks is not None:
            planes += [grasp_masks["qua"], grasp_masks["ang"], grasp_masks["wid"]]
        planes_w = warp_affine_np(
            np.stack(planes, axis=-1), mat, self.input_size, "linear"
        )
        out = {
            "word": tokenize(sentence, self.word_length, True)[0],
            "inverse": mat_inv.astype(np.float32),
            "ori_size": np.asarray(ori_size, np.int32),
        }
        if getattr(self, "compact", False):
            out["img_u8"] = img_w
            out["planes_u8"] = planes_w
            return out

        img_f = img_w.astype(np.float32) / 255.0
        img_f = (img_f - CLIP_MEAN) / CLIP_STD
        out["img"] = img_f  # HWC fp32
        out["mask"] = planes_w[..., 0].astype(np.float32) / 255.0
        if grasp_masks is not None:
            ang_rad = planes_w[..., 2].astype(np.float32) * np.pi / 180.0
            out.update(
                qua=planes_w[..., 1].astype(np.float32) / 255.0,
                wid=planes_w[..., 3].astype(np.float32) / 255.0,
                ang=ang_rad,
                sin=np.sin(2.0 * ang_rad),
                cos=np.cos(2.0 * ang_rad),
            )
        return out
