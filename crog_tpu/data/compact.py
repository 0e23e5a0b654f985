"""Compact uint8 wire format: device-side batch unpacking.

The reference pipeline ships fully materialized float32 tensors to the
accelerator (~6.2 MB/sample for CROG).  Every CROG input is exactly
representable as uint8 until the last conversions — the image is warped as
uint8 (reference utils/dataset.py:858-890), the grasp maps leave
``GraspTransforms.generate_masks`` as uint8 (``ang`` holds integer degrees,
reference utils/dataset.py:643-682) — so the wire carries uint8 planes
(~1.2 MB/sample) and the /255, CLIP normalization, degrees->radians and
sin/cos(2*theta) happen ON DEVICE inside the jitted step.

BIT-EXACT by construction: a uint8 plane has only 256 possible values, so
every conversion is a 256-entry lookup table precomputed on the host with
the *identical numpy expressions* the legacy path uses (XLA's own
arithmetic would drift 1 ulp — it rewrites /255 into a reciprocal multiply
and its sin/cos differ from libm).  The gathers are tiny (256-entry tables
in VMEM) and fuse into the input pipeline of the first convolution.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

import jax.numpy as jnp

from crog_tpu.data.ocid_vlg import CLIP_MEAN, CLIP_STD

# plane order in "planes_u8" (OCIDVLGDataset.preprocess)
PLANES = ("mask", "qua", "ang", "wid")


def _tables():
    """All 256-entry conversion tables, computed with the exact host ops of
    OCIDVLGDataset.preprocess (same order, same dtypes)."""
    v = np.arange(256, dtype=np.uint8)
    over255 = v.astype(np.float32) / 255.0
    img = np.stack(
        [(over255 - CLIP_MEAN[c]) / CLIP_STD[c] for c in range(3)]
    )  # [3, 256]
    ang_rad = v.astype(np.float32) * np.pi / 180.0
    return {
        "over255": over255,
        "img": img,
        "ang": ang_rad,
        "sin": np.sin(2.0 * ang_rad),
        "cos": np.cos(2.0 * ang_rad),
    }


_TAB = _tables()


def is_compact(batch: Dict) -> bool:
    return "img_u8" in batch


def unpack_compact_host(batch: Dict) -> Dict:
    """Numpy twin of unpack_compact for host consumers (model init examples,
    visualization); identical tables, hence identical values."""
    if not is_compact(batch):
        return batch
    img8 = np.asarray(batch["img_u8"])
    planes = np.asarray(batch["planes_u8"])
    out = {k: v for k, v in batch.items() if k not in ("img_u8", "planes_u8")}
    out["img"] = np.stack(
        [_TAB["img"][c][img8[..., c]] for c in range(3)], axis=-1
    )
    out["mask"] = _TAB["over255"][planes[..., 0]]
    if planes.shape[-1] == 4:
        ang8 = planes[..., 2]
        out["qua"] = _TAB["over255"][planes[..., 1]]
        out["wid"] = _TAB["over255"][planes[..., 3]]
        out["ang"] = _TAB["ang"][ang8]
        out["sin"] = _TAB["sin"][ang8]
        out["cos"] = _TAB["cos"][ang8]
    return out


def unpack_compact(batch: Dict) -> Dict:
    """Jittable: uint8 wire batch -> the dense float batch the model sees.

    ``img_u8`` [B,S,S,3] uint8, ``planes_u8`` [B,S,S,{1,4}] uint8 (mask, or
    mask/qua/ang/wid).  Bit-equal to OCIDVLGDataset.preprocess's host
    conversions (table construction above).
    """
    img8 = batch["img_u8"].astype(jnp.int32)
    img = jnp.stack(
        [jnp.asarray(_TAB["img"][c])[img8[..., c]] for c in range(3)], axis=-1
    )
    planes = batch["planes_u8"].astype(jnp.int32)
    over255 = jnp.asarray(_TAB["over255"])
    out = {k: v for k, v in batch.items() if k not in ("img_u8", "planes_u8")}
    out["img"] = img
    out["mask"] = over255[planes[..., 0]]
    if planes.shape[-1] == 4:
        ang8 = planes[..., 2]
        out["qua"] = over255[planes[..., 1]]
        out["wid"] = over255[planes[..., 3]]
        out["ang"] = jnp.asarray(_TAB["ang"])[ang8]
        out["sin"] = jnp.asarray(_TAB["sin"])[ang8]
        out["cos"] = jnp.asarray(_TAB["cos"])[ang8]
    return out
