"""Raw uint8 wire format for SSG: per-instance grasp-map rasterization,
gaussian blur, photometric distortion, mirror, pad-to-square and resize all
happen ON DEVICE inside the jitted step.

The reference runs the whole SSG target pipeline per sample on host CPU
(utils/dataset.py:1069-1416 per-instance rasterization + gaussian via
GraspTransforms, utils/augmentation.py:7-165 distort/mirror/pad/resize), and
its dense collate layout is enormous: at 544^2 with max_objs=24 the padded
GT stack (ins_masks + 4 grasp maps) is ~28 MB * 5 per sample.  On a tunneled
TPU whose host->device wire bounds e2e throughput, shipping that is hopeless
— and on a 1-core host, *producing* it is the bottleneck (per-instance
raster + blur at 480x640, numpy HSV distort over the full frame, per-plane
resizes).  Here the host ships only:

  * ``ssg_img_u8``    [H0, W0, 3] uint8 — BGR camera frame (reference keeps
    BGR until the final normalize, utils/dataset.py:1120 / augmentation
    _normalize_img)
  * ``ssg_depth_u16`` [H0, W0] uint16 — inverted-normalized depth
    (1 - d/d.max(), reference utils/dataset.py:1120-1122: values in [0,1]
    by construction, so u16 quantization costs <= 7.6e-6 and halves the
    dominant wire plane vs f32; the unpack also accepts a legacy f32
    ``ssg_depth``)
  * ``ins_mask_bits`` [M, H0, ceil(W0/8)] uint8 — per-instance 0/1 masks
    bit-packed (np.packbits, MSB-first); M is the BATCH-OCCUPANCY slot
    count (collate_ssg_raw trims to the batch-max object count rounded up
    to the unpack chunk), not the dataset-wide max_objs
  * ``ssg_rect_corners`` [M, R, 4, 2] int32 / ``ssg_rect_vals`` [M, R, 3]
    float32 — per-instance grasp raster params, exactly
    crog_tpu.data.rawwire.pack_raster_params per instance
  * ``aug``           [7] float32 — the DataAugmentor.draw() parameters
    (b_delta, c_factor, h1, h2, mirror, pad_y0, pad_x0): the host draws the
    random stream in the reference call order, the device REPLAYS the
    augmentation deterministically
  * ``boxes``/``labels``/``obj_valid`` — final normalized GT boxes, the
    mirror/pad/resize arithmetic applied on host (4 floats per object)

~3 MB/sample on the wire vs ~150 MB dense — and near-zero host work.

``unpack_ssg_raw`` reproduces DataAugmentor.apply + the grasp-map raster on
device:

  1. photometric distort (brightness add, contrast mul, the reference's
     double-hue-shift — bug-for-bug, see ocid_grasp._photometric_distort)
     via jnp ports of the cv2-parity BGR<->HSV maps;
  2. per-instance raster with the exact integer PNPOLY of
     crog_tpu.data.rawwire._rasterize (instance axis folded into batch);
  3. gaussian blur (sigma 3) FOLDED into the per-sample resample matrices:
     mirror / pad-to-square / resize are per-axis linear maps, and their
     per-sample dynamics (pad offset, mirror) are a dynamic-slice + column
     flip of ONE static interpolation matrix built in padded-canvas space
     (interp_matrix(size, S, linear) — cv2.resize INTER_LINEAR parity), so
     each sample's full plane transform is two small matmuls;
  4. the RGB mean-pad (reference pads with the 0-1 CLIP mean on a 0-255
     image — preserved) becomes warp(img - mean) + mean with the zero-pad
     matrices; depth/masks/grasp maps pad with zero natively;
  5. /255 + BGR->RGB (reference _normalize_img), depth appended as
     channel 3; sin/cos(2*ang) AFTER the warp with ang in DEGREE UNITS —
     the reference quirk (utils/dataset.py:1283-1284 feeds the uint8
     degree canvas straight into torch.sin) is preserved.

Deliberate epsilon vs the legacy host path: the host quantizes qua/ang/wid
to uint8 after raster+blur (GraspTransforms.generate_masks) and cv2.resize
works in fixed point; the device computes the same linear chain in fp32
without intermediate quantization.  Bounded by ~2/255 per target value
(tested in tests/test_ssg_rawwire.py).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, List

import numpy as np

import jax
import jax.numpy as jnp

from crog_tpu.data.rawwire import (
    _blur_matrix,
    _rasterize,
    pack_raster_params,
    unpack_mask_bits,
)
from crog_tpu.ops.resize import interp_matrix

SSG_RAW_KEYS = (
    "ssg_img_u8", "ssg_depth", "ssg_depth_u16", "ins_mask_bits",
    "ssg_rect_corners", "ssg_rect_vals", "aug",
)
AUG_FIELDS = ("b_delta", "c_factor", "h1", "h2", "mirror", "pad_y0", "pad_x0")


def is_ssg_raw(batch: Dict) -> bool:
    return "ssg_img_u8" in batch


# ------------------------------------------------------------------- host side
def aug_params_vector(p: Dict) -> np.ndarray:
    """DataAugmentor.draw() dict -> the [7] float32 wire vector."""
    return np.asarray([float(p[k]) for k in AUG_FIELDS], np.float32)


def transform_boxes_host(
    boxes_px: np.ndarray, p: Dict, h0: int, w0: int
) -> np.ndarray:
    """Apply the augmentor's box arithmetic on host (boxes are 4 floats per
    object — not worth shipping to device): mirror -> pad offset -> resize +
    normalize.  Net effect of DataAugmentor._mirror/_pad_to_square/_resize +
    apply()'s /w,/h: normalized padded-canvas coords (boxes / size)."""
    b = np.asarray(boxes_px, np.float32).reshape(-1, boxes_px.shape[-1]).copy()
    if p["mirror"]:
        x1 = b[:, 0].copy()
        b[:, 0] = w0 - b[:, 2]
        b[:, 2] = w0 - x1
    size = float(max(h0, w0))
    b[:, [0, 2]] = (b[:, [0, 2]] + p["pad_x0"]) / size
    b[:, [1, 3]] = (b[:, [1, 3]] + p["pad_y0"]) / size
    return b


def pack_ssg_raw(
    pre: Dict,
    augmentor,
    max_objs: int = 24,
    max_rects: int = 16,
) -> Dict:
    """Pre-augment sample dict (rgb BGR f32 0-255, depth f32, bboxes [M,5]
    px, labels, ins_masks [M,H,W] 0/1, ins_grasp_rects list of [Ri,6]) ->
    raw wire sample.  Draws the augmentation on host (exact reference random
    call order via augmentor.draw) and ships params for device replay."""
    rgb = pre["rgb"]
    h0, w0 = rgb.shape[:2]
    assert w0 % 8 == 0, f"bit-packed masks need width % 8 == 0, got {w0}"
    p = augmentor.draw(h0, w0)

    m = min(pre["ins_masks"].shape[0], max_objs)
    mask_bits = np.zeros((max_objs, h0, w0 // 8), np.uint8)
    if m:
        mask_bits[:m] = np.packbits(
            pre["ins_masks"][:m] > 0, axis=-1
        )
    corners = np.zeros((max_objs, max_rects, 4, 2), np.int32)
    vals = np.zeros((max_objs, max_rects, 3), np.float32)
    for i in range(m):
        rects = np.asarray(pre["ins_grasp_rects"][i], np.float64)
        corners[i], vals[i] = pack_raster_params(rects, max_rects)

    boxes = np.zeros((max_objs, 4), np.float32)
    labels = np.zeros((max_objs,), np.int32)
    valid = np.zeros((max_objs,), bool)
    if m:
        boxes[:m] = transform_boxes_host(pre["bboxes"][:m, :4], p, h0, w0)
        labels[:m] = pre["labels"][:m]
        valid[:m] = True

    # depth -> uint16: the reference's inverted-normalized depth is in [0,1]
    # by construction (1 - d/d.max(), utils/dataset.py:1120-1122), so the
    # quantization epsilon is <= 0.5/65535 ~ 7.6e-6 — invisible next to the
    # model's bf16 compute — and the wire drops 0.61 MB/sample vs f32
    # (VERDICT r04 next #2)
    depth_u16 = np.round(
        np.clip(pre["depth"], 0.0, 1.0) * 65535.0
    ).astype(np.uint16)

    return {
        "ssg_img_u8": np.clip(rgb, 0, 255).astype(np.uint8),
        "ssg_depth_u16": depth_u16,
        "ins_mask_bits": mask_bits,
        "ssg_rect_corners": corners,
        "ssg_rect_vals": vals,
        "aug": aug_params_vector(p),
        "boxes": boxes,
        "labels": labels,
        "obj_valid": valid,
        "ori_size": np.asarray(pre["rgb"].shape[:2], np.int32),
        "ins_grasp_rects": pre["ins_grasp_rects"][:m],
    }


# --------------------------------------------------------------- device pieces
def _bgr_hsv_j(img):
    """jnp port of ocid_grasp._bgr_hsv (cv2 float32 BGR->HSV)."""
    b, g, r = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    mask = delta > 0
    safe = jnp.maximum(delta, 1e-12)
    rc = jnp.where(mask, (maxc - r) / safe, 0.0)
    gc = jnp.where(mask, (maxc - g) / safe, 0.0)
    bc = jnp.where(mask, (maxc - b) / safe, 0.0)
    h = jnp.zeros_like(maxc)
    h = jnp.where(maxc == r, bc - gc, h)
    h = jnp.where((maxc == g) & (maxc != r), 2.0 + rc - bc, h)
    h = jnp.where((maxc == b) & (maxc != r) & (maxc != g), 4.0 + gc - rc, h)
    h = (h * 60.0) % 360.0
    return h, s, maxc


def _hsv_bgr_j(h, s, v):
    """jnp port of ocid_grasp._hsv_bgr."""
    h6 = (h % 360.0) / 60.0
    i = jnp.floor(h6).astype(jnp.int32) % 6
    f = h6 - jnp.floor(h6)
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    # np.choose(i, [...]) == select by index
    def choose(opts):
        out = opts[0]
        for k in range(1, 6):
            out = jnp.where(i == k, opts[k], out)
        return out

    r = choose([v, q, p, p, t, v])
    g = choose([t, v, v, q, p, p])
    b = choose([p, p, t, v, v, q])
    return jnp.stack([b, g, r], axis=-1)


def _photometric_distort_j(img, aug):
    """img [H, W, 3] BGR f32 0-255; replays ocid_grasp._photometric_distort
    (incl. the reference's double-hue-shift bug, kept bug-for-bug)."""
    img = jnp.clip(img + aug[0], 0.0, 255.0)
    img = jnp.clip(img * aug[1], 0.0, 255.0)
    h, s, v = _bgr_hsv_j(img)
    h = (h + aug[2]) % 360.0
    h = (h + aug[3]) % 360.0
    return jnp.clip(_hsv_bgr_j(h, s, v), 0.0, 255.0)


@lru_cache(maxsize=None)
def _padded_resize_matrix(size: int, out: int) -> np.ndarray:
    """[out, size] cv2-parity INTER_LINEAR resize matrix in PADDED-canvas
    space: pad-to-square (size x size) then resize to out is, per axis,
    exactly this static matrix — the per-sample pad offset / mirror reduce
    to a column dynamic-slice / flip of it (module docstring)."""
    return interp_matrix(size, out, "linear", False)


def _axis_matrices(aug, h0: int, w0: int, out: int, sigma: float = 3.0):
    """Per-sample [out, H0] row / [out, W0] col resample matrices (linear and
    blur-folded variants) for one sample's aug params.  vmapped over batch."""
    size = max(h0, w0)
    wp = jnp.asarray(_padded_resize_matrix(size, out))
    pad_y = aug[5].astype(jnp.int32)
    pad_x = aug[6].astype(jnp.int32)
    wrow = jax.lax.dynamic_slice(wp, (0, pad_y), (out, h0))
    wcol = jax.lax.dynamic_slice(wp, (0, pad_x), (out, w0))
    # mirror: padded canvas holds the flipped image, so image coord i is
    # read from flipped index w0-1-i -> flip the sliced columns
    wcol = jnp.where(aug[4] > 0, wcol[:, ::-1], wcol)
    brow = jnp.asarray(_blur_matrix(h0, sigma).astype(np.float32))
    bcol = jnp.asarray(_blur_matrix(w0, sigma).astype(np.float32))
    hi = jax.lax.Precision.HIGHEST
    wrow_b = jnp.matmul(wrow, brow, precision=hi)
    wcol_b = jnp.matmul(wcol, bcol, precision=hi)
    return wrow, wcol, wrow_b, wcol_b


def _warp_planes(x, wrow, wcol, precision=jax.lax.Precision.HIGHEST):
    """x [B, ..., H0, W0] with per-sample matrices wrow [B, S, H0] /
    wcol [B, S, W0] -> [B, ..., S, S]."""
    y = jnp.einsum("bsh,b...hw->b...sw", wrow, x, precision=precision)
    return jnp.einsum("btw,b...sw->b...st", wcol, y, precision=precision)


def unpack_ssg_raw(
    batch: Dict, img_size: int, with_depth: bool = True, targets: bool = True,
    instance_chunk: int = 4, pad_objs: int = 0, emit_ds: bool = False,
) -> Dict:
    """Jittable: SSG raw wire batch -> the dense collate_ssg layout the
    model + loss consume (img/boxes/labels/obj_valid/ins_masks/grasp_*).

    ``targets=False`` unpacks only the image planes (eval forward: the
    Jacquard check needs GT rects on host, not GT maps — skipping the
    per-instance raster + resample entirely).

    ``pad_objs``: collate_ssg_raw ships only the OCCUPIED instance slots
    (batch-max objects rounded up to a chunk multiple — a 6-object scene no
    longer pays 24 slots of mask bits + raster work); the consumer (loss)
    wants ONE static instance count, so the unpacked targets and the
    pass-through boxes/labels/obj_valid are zero-padded back to ``pad_objs``
    here.  0 = keep the wire's instance count (tests).

    ``instance_chunk``: the per-instance raster + resample runs under
    ``lax.map`` over chunks of this many instances.  Unchunked, the raster's
    full-frame transients are [B*M, H0, W0] canvases (B=8, M=24 at 480x640:
    ~0.7 GB per plane plus int32 PNPOLY temporaries) — enough to take the
    544^2 train step past the worker's memory at practical batch sizes
    (measured: B=8 crashes the remote v5e worker, B=2 survives).  Chunking
    caps the live set at [B*chunk, H0, W0] while the warped [B, M, S, S]
    outputs (what the loss consumes, same as the dense wire) are unchanged.
    The raster is cheap VPU work; serializing it costs little."""
    img8 = batch["ssg_img_u8"]
    b, h0, w0 = img8.shape[:3]
    aug = batch["aug"].astype(jnp.float32)
    hi = jax.lax.Precision.HIGHEST

    wrow, wcol, wrow_b, wcol_b = jax.vmap(
        lambda a: _axis_matrices(a, h0, w0, img_size)
    )(aug)

    # ---- image: distort (train draws nonzero params; eval ships identity)
    img = jax.vmap(_photometric_distort_j)(img8.astype(jnp.float32), aug)
    # mean-pad via the zero-pad matrices: warp(img - mean) + mean.  The
    # reference pads the 0-255 image with the 0-1 CLIP mean (quirk kept —
    # ocid_grasp.DataAugmentor._pad_to_square).
    mean = jnp.asarray(
        [0.48145466, 0.4578275, 0.40821073], jnp.float32
    )  # BGR-order irrelevant: reference writes the RGB-ordered mean into a
    # BGR canvas (utils/augmentation.py pads with MEANS as-is) — kept as-is
    img = _warp_planes(
        jnp.moveaxis(img - mean, -1, 1), wrow, wcol, hi
    )  # [B, 3, S, S]
    img = jnp.moveaxis(img, 1, -1) + mean
    # /255 then BGR->RGB (reference _normalize_img)
    img = img[..., ::-1] / 255.0

    out = {k: v for k, v in batch.items() if k not in SSG_RAW_KEYS}
    if with_depth and ("ssg_depth" in batch or "ssg_depth_u16" in batch):
        if "ssg_depth_u16" in batch:  # wire dtype (pack_ssg_raw); f32 legacy
            d0 = batch["ssg_depth_u16"].astype(jnp.float32) / 65535.0
        else:
            d0 = batch["ssg_depth"]
        depth = _warp_planes(d0[:, None], wrow, wcol, hi)
        out["img"] = jnp.concatenate([img, jnp.moveaxis(depth, 1, -1)], -1)
    else:
        out["img"] = img

    def _pad_inst(x):  # zero-pad the instance axis [B, M, ...] -> pad_objs
        if pad_objs and x.shape[1] < pad_objs:
            return jnp.pad(
                x, [(0, 0), (0, pad_objs - x.shape[1])]
                + [(0, 0)] * (x.ndim - 2),
            )
        return x

    for k in ("boxes", "labels", "obj_valid"):
        if k in out:
            out[k] = _pad_inst(jnp.asarray(out[k]))
    if not targets:
        return out

    # ---- per-instance masks + grasp maps, lax.map'ed over instance chunks
    # (bit-unpack -> raster -> resample; see instance_chunk in the docstring)
    bits = batch["ins_mask_bits"]
    m = bits.shape[1]
    corners = batch["ssg_rect_corners"].astype(jnp.int32)
    vals = batch["ssg_rect_vals"].astype(jnp.float32)
    c = max(1, min(instance_chunk, m))
    n = -(-m // c)
    if n * c != m:  # pad the instance axis to a whole number of chunks
        pad = [(0, 0), (0, n * c - m)] + [(0, 0)] * (bits.ndim - 2)
        bits = jnp.pad(bits, pad)
        pad_i = [(0, 0), (0, n * c - m)]
        corners = jnp.pad(corners, pad_i + [(0, 0)] * 3)
        vals = jnp.pad(vals, pad_i + [(0, 0)] * 2)

    def _chunk(args):
        bits_c, corners_c, vals_c = args  # [B, c, ...]
        masks = unpack_mask_bits(bits_c, w0)  # [B, c, H0, W0]
        pos, ang_c, wid_c = _rasterize(
            corners_c.reshape(b * c, -1, 4, 2), vals_c.reshape(b * c, -1, 3),
            h0, w0,
        )
        return (
            _warp_planes(masks, wrow, wcol, hi),
            _warp_planes(pos.reshape(b, c, h0, w0), wrow_b, wcol_b, hi),
            _warp_planes(wid_c.reshape(b, c, h0, w0), wrow_b, wcol_b, hi),
            _warp_planes(ang_c.reshape(b, c, h0, w0), wrow, wcol, hi),
        )

    def _split(x):  # [B, n*c, ...] -> [n, B, c, ...] (lax.map leading axis)
        return jnp.moveaxis(x.reshape((b, n, c) + x.shape[2:]), 1, 0)

    chunks = jax.lax.map(_chunk, (_split(bits), _split(corners), _split(vals)))

    def _join(x):  # [n, B, c, S, S] -> [B, m, S, S]
        return jnp.moveaxis(x, 0, 1).reshape(b, n * c, *x.shape[3:])[:, :m]

    masks_w, qua_w, wid_w, ang_w = (_join(x) for x in chunks)
    out["ins_masks"] = _pad_inst(masks_w)
    out["grasp_qua"] = _pad_inst(qua_w)
    out["grasp_wid"] = _pad_inst(wid_w)
    # reference quirk: sin/cos of the DEGREE-UNIT canvas (module docstring)
    out["grasp_sin"] = _pad_inst(jnp.sin(2.0 * ang_w))
    # cos(2*0) = 1 would fill PADDED instance slots too; the dense collate
    # zeros them (collate_ssg), so gate by obj_valid (other planes are
    # naturally zero for empty slots)
    valid = batch["obj_valid"].astype(jnp.float32)[:, :, None, None]
    out["grasp_cos"] = _pad_inst(jnp.cos(2.0 * ang_w) * valid)
    if emit_ds:
        # The loss only ever consumes these maps DOWNSAMPLED (proto res for
        # lincomb/grasp, seg res for the semantic term; models/ssg_loss.py).
        # Computing the same resize_bilinear here and shipping only the
        # small planes cuts the unpack->step HBM intermediates ~16x
        # ([B,M,544,544] f32 x5 = 1.13 GB at batch 8 -> ~80 MB) and drops
        # the full-res reads from the loss program entirely.  Same op,
        # same input, moved across the program boundary.
        from crog_tpu.ops.resize import resize_bilinear

        ph = img_size // 4   # ProtoNet: 2x p3 (models/ssg.py ProtoNet)
        sh = img_size // 8   # semantic head: p3

        def _ds(x, s):
            return resize_bilinear(x[..., None], (s, s), False)[..., 0]

        ins_full = out.pop("ins_masks")
        out["ins_ds"] = (_ds(ins_full, ph) > 0.5).astype(jnp.float32)
        out["sem_ds"] = (_ds(ins_full, sh) > 0.5).astype(jnp.float32)
        out["grasp_ds"] = jnp.stack(
            [_ds(out.pop(f"grasp_{k}"), ph)
             for k in ("qua", "sin", "cos", "wid")],
            axis=1,
        )  # [B, 4, M, ph, ph] — the layout lincomb_grasp_masks_loss wants
    return out


def collate_ssg_raw(samples: List[Dict], slot_round: int = 4) -> Dict:
    """Stack raw-wire SSG samples (dense arrays stacked, ragged GT rect
    lists kept as a list for the host-side Jacquard check).

    Ships only the OCCUPIED instance slots: the instance axis is trimmed to
    the batch-max object count rounded up to ``slot_round`` (= the unpack's
    instance_chunk, so chunking divides evenly and the jitted unpack sees at
    most max_objs/slot_round distinct shapes).  A typical 6-object OCID
    scene stops paying 24 slots of mask-bit wire bytes and device raster
    work; unpack_ssg_raw(pad_objs=max_objs) pads the dense targets back so
    the train step keeps one static shape (VERDICT r04 next #2)."""
    out: Dict = {}
    for k in (
        "ssg_img_u8", "ssg_depth", "ssg_depth_u16", "ins_mask_bits",
        "ssg_rect_corners", "ssg_rect_vals", "aug", "boxes", "labels",
        "obj_valid", "ori_size",
    ):
        if k in samples[0]:
            out[k] = np.stack([s[k] for s in samples])
    m_wire = out["obj_valid"].shape[1]
    occ = int(out["obj_valid"].sum(axis=1).max()) if m_wire else 0
    mb = min(m_wire, max(slot_round, -(-occ // slot_round) * slot_round))
    if mb < m_wire:
        for k in (
            "ins_mask_bits", "ssg_rect_corners", "ssg_rect_vals", "boxes",
            "labels", "obj_valid",
        ):
            out[k] = np.ascontiguousarray(out[k][:, :mb])
    out["ins_grasp_rects"] = [s["ins_grasp_rects"] for s in samples]
    return out
