"""SSG training losses (reference model/ssg.py:297-529), TPU-vectorized.

The reference loops per image in python (anchor match :317-321, mask losses
:402-451, grasp losses :464-507, semantic loss :515-528).  Here every loss is
expressed over a PADDED ground-truth layout and vmapped across the batch, so
the whole 8-term loss is one fused XLA computation:

  batch GT layout (collate pads object axis to MAX_OBJS):
    boxes      [B, M, 4]  point-form, normalized
    labels     [B, M]     int class ids (0 padding rows)
    obj_valid  [B, M]     bool
    ins_masks  [B, M, S, S]   (also the semantic head's GT source)
    grasp_masks{qua,sin,cos,wid} [B, M, S, S]

Positive-anchor subsampling (masks_to_train, reference :416-421) becomes a
top-k over randomly-prioritized positives — fixed K shapes, no dynamic
gather sizes.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from crog_tpu.ops.boxes import box_inside_mask, match
from crog_tpu.ops.resize import resize_bilinear


def smooth_l1_sum(pred, target):
    d = jnp.abs(pred - target)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


def category_loss(class_logits, conf_gt, pos, np_ratio: int = 3):
    """Softmax CE with 3:1 hard-negative mining (reference :354-382).

    class_logits [B, N, C]; conf_gt [B, N] (-1 neutral, 0 bg, >0 class);
    pos [B, N] bool.
    """
    b, n, c = class_logits.shape
    logits = class_logits.astype(jnp.float32)
    # OHEM score: logsumexp - background logit
    mark = jax.nn.logsumexp(logits, axis=-1) - logits[..., 0]
    mark = jnp.where(pos | (conf_gt < 0), 0.0, mark)

    # rank negatives by mark descending
    order = jnp.argsort(-mark, axis=1)
    ranks = jnp.argsort(order, axis=1)
    num_pos = jnp.sum(pos, axis=1, keepdims=True)
    num_neg = jnp.clip(np_ratio * num_pos, None, n - 1)
    neg = (ranks < num_neg) & ~pos & (conf_gt >= 0)

    sel = pos | neg
    labels = jnp.clip(conf_gt, 0, c - 1)
    ce = -jax.nn.log_softmax(logits, axis=-1)
    # one-hot select, not take_along_axis: the N-long gather (and its scatter
    # transpose in the backward) profiled 1.4 ms/step; multiplying by the
    # one-hot mask is a single fused pass and bit-identical (the sum has one
    # nonzero term)
    ce = jnp.sum(ce * jax.nn.one_hot(labels, c, dtype=ce.dtype), axis=-1)
    loss = jnp.sum(jnp.where(sel, ce, 0.0))
    return loss / jnp.maximum(jnp.sum(num_pos), 1)


def box_loss(box_pred, offsets, pos):
    """Smooth-L1 on positive anchors (reference :385-390)."""
    per = jnp.sum(smooth_l1_sum(box_pred, offsets), axis=-1)
    loss = jnp.sum(jnp.where(pos, per, 0.0))
    return loss / jnp.maximum(jnp.sum(pos), 1)


def _select_positives(pos, rng, k: int):
    """Choose up to k positive anchors per image, random when over-full
    (reference masks_to_train subsample :415-421).  Returns (idx [B,k],
    sel_valid [B,k], old_num_pos [B], num_pos [B])."""
    b, n = pos.shape
    priority = jax.random.uniform(rng, (b, n))
    score = jnp.where(pos, priority, -1.0)
    top_vals, top_idx = jax.lax.top_k(score, k)
    sel_valid = top_vals >= 0.0
    old_num_pos = jnp.sum(pos, axis=1)
    num_pos = jnp.sum(sel_valid, axis=1)
    return top_idx, sel_valid, old_num_pos, num_pos


def lincomb_mask_loss(
    ins_coef, protos, ins_masks_gt, pos, anchor_max_i, anchor_max_gt,
    sel_idx, sel_valid, old_num_pos, num_pos, ins_ds=None,
    force_pallas: bool | None = None, interpret: bool = False,
):
    """Prototype-combination instance mask loss (reference :394-451):
    sigmoid(protos @ coef) cropped to the matched GT box, BCE normalized by
    box area.

    ``ins_ds`` [B, M, ph, pw]: GT masks already downsampled + binarized (the
    raw-wire unpack emits them, unpack_ssg_raw(emit_ds=True) — same
    resize_bilinear, moved into the unpack program); when given,
    ``ins_masks_gt`` may be None."""
    b = ins_coef.shape[0]
    ph, pw = protos.shape[1:3]
    pre_ds = ins_ds is not None
    masks_in = ins_ds if pre_ds else ins_masks_gt
    total_pos = jnp.maximum(jnp.sum(pos), 1)

    use_pallas = (
        _use_pallas_lincomb() if force_pallas is None else force_pallas
    )
    if use_pallas:
        # Same fused kernel as the grasp loss with loss_kind='bce'
        # (ops/pallas_lincomb) — identical math, no [B, k, ph, pw]
        # prediction stack
        from crog_tpu.ops.pallas_lincomb import lincomb_task_sums

        if pre_ds:
            ds_all = ins_ds
        else:
            ds_all = resize_bilinear(
                masks_in[..., None].astype(jnp.float32), (ph, pw), False
            )[..., 0]
            ds_all = (ds_all > 0.5).astype(jnp.float32)  # [B, M, ph, pw]
        sel_coef = jnp.take_along_axis(
            ins_coef, sel_idx[:, :, None], axis=1
        ).astype(jnp.float32)[:, :, None, :]            # [B, k, 1, C]
        sel_gt = jnp.take_along_axis(anchor_max_i, sel_idx, axis=1)
        sel_box = jnp.take_along_axis(
            anchor_max_gt, sel_idx[:, :, None], axis=1
        )
        sums = lincomb_task_sums(
            protos, sel_coef,
            ds_all.reshape(b, ds_all.shape[1], ph * pw),
            sel_gt, sel_box, num_tasks=1, interpret=interpret,
            loss_kind="bce",
        )[..., 0]                                        # [B, k]
        area = (sel_box[..., 2] - sel_box[..., 0]) * (
            sel_box[..., 3] - sel_box[..., 1]
        )
        per_anchor = sums / jnp.maximum(area, 1e-6)
        per_anchor = jnp.where(sel_valid, per_anchor, 0.0)
        scale = jnp.where(
            old_num_pos > num_pos,
            old_num_pos / jnp.maximum(num_pos, 1), 1.0,
        )
        losses = jnp.sum(per_anchor, axis=1) * scale
        return jnp.sum(losses) / ph / pw / total_pos

    def per_image(coefs, protos_i, gt_masks, a_i, a_box, idx, valid, old_n, n_p):
        if pre_ds:
            ds = gt_masks  # [M, ph, pw], binarized upstream
        else:
            # gt masks downsampled to proto res, binarized (reference :403-406)
            ds = resize_bilinear(
                gt_masks[..., None].astype(jnp.float32), (ph, pw), False
            )[..., 0]
            ds = (ds > 0.5).astype(jnp.float32)  # [M, ph, pw]
        # post-gather convert: train-mode coef stacks arrive in the conv
        # dtype (bf16); converting the k gathered rows is bit-identical to
        # converting all N anchors first (models/ssg.py output dict note)
        sel_coef = coefs[idx].astype(jnp.float32)  # [k, 32]
        sel_gt_i = a_i[idx]                    # [k] -> GT index
        sel_box = a_box[idx]                   # [k, 4]
        # k-major output layout so the GT gather ds[sel_gt_i] is consumed
        # as-is — the [ph, pw, k] layout forced a large transpose copy
        # between the gather and the elementwise loss (profiled)
        mask_p = jax.nn.sigmoid(
            jnp.einsum("hwc,kc->khw", protos_i, sel_coef)
        )
        inside = jnp.transpose(box_inside_mask(sel_box, ph, pw), (2, 0, 1))
        mask_p = jnp.where(inside, mask_p, 0.0)
        gt = ds[sel_gt_i]                      # [k, ph, pw]
        mp = jnp.clip(mask_p, 0.0, 1.0)
        bce = -(gt * jnp.log(jnp.clip(mp, 1e-7)) +
                (1 - gt) * jnp.log(jnp.clip(1 - mp, 1e-7)))
        area = (sel_box[:, 2] - sel_box[:, 0]) * (sel_box[:, 3] - sel_box[:, 1])
        per_anchor = jnp.sum(bce, axis=(1, 2)) / jnp.maximum(area, 1e-6)
        per_anchor = jnp.where(valid, per_anchor, 0.0)
        scale = jnp.where(
            old_n > n_p, old_n / jnp.maximum(n_p, 1), 1.0
        )
        return jnp.sum(per_anchor) * scale

    losses = jax.vmap(per_image)(
        ins_coef, protos, masks_in, anchor_max_i, anchor_max_gt,
        sel_idx, sel_valid, old_num_pos, num_pos,
    )
    return jnp.sum(losses) / ph / pw / total_pos


def _use_pallas_lincomb() -> bool:
    """Default OFF: the fused lincomb kernel (ops/pallas_lincomb) is
    parity-tested, 30-iteration soak-clean standalone at batch 8/16, and
    3.3x faster than the XLA chain it replaces — but linked into the full
    SSG train step it crashes the remote v5e worker (2/2 runs 2026-08-21,
    'TPU worker process crashed'), the same fused-binary-only fault
    documented in docs/ssg_worker_fault.md.  Opt in with
    SSG_PALLAS_LOSS=1 on a platform where the soak passes."""
    import os

    return (
        os.environ.get("SSG_PALLAS_LOSS", "0") == "1"
        and jax.default_backend() == "tpu"
    )


def lincomb_grasp_masks_loss(
    grasp_coef, protos, grasp_masks_gt, pos, anchor_max_i, anchor_max_gt,
    sel_idx, sel_valid, old_num_pos, num_pos, grasp_ds=None,
    force_pallas: bool | None = None, interpret: bool = False,
):
    """Grasp-map coefficient loss (reference :455-507): smooth-L1 on
    sigmoid(protos @ coef) vs downsampled GT grasp maps; the cos map uses
    ones outside the box (cos(0)=1), others zero-crop.

    ``grasp_ds`` [B, 4, M, ph, pw]: pre-downsampled qua/sin/cos/wid stacks
    from unpack_ssg_raw(emit_ds=True); when given, ``grasp_masks_gt`` may
    be None."""
    ph, pw = protos.shape[1:3]
    total_pos = jnp.maximum(jnp.sum(pos), 1)
    keys = ("qua", "sin", "cos", "wid")
    if grasp_ds is not None:
        ds = grasp_ds
    else:
        # One einsum/crop/L1 pass over all 4 tasks, but FOUR separate GT
        # downsamples: the full-res maps [B, M, S, S] (~227 MB each at batch
        # 8 / 544 / M=24) must each be read once regardless, and reading them
        # straight out of batch memory lets XLA fuse the read into the resize.
        # Stacking them first ([B, 4, M, S, S]) materializes a ~900 MB copy and
        # measured 9% SLOWER end-to-end (129 vs 141 samples/s/chip); only the
        # small downsampled maps (14 MB each) are stacked.
        ds = jnp.stack(
            [
                resize_bilinear(
                    grasp_masks_gt[k][..., None].astype(jnp.float32),
                    (ph, pw), False,
                )[..., 0]
                for k in keys
            ],
            axis=1,
        )  # [B, 4, M, ph, pw]
    # cos(2*0)=1 outside the crop box, others 0 (reference :484-489)
    outside = jnp.array([0.0, 0.0, 1.0, 0.0], jnp.float32)

    use_pallas = (
        _use_pallas_lincomb() if force_pallas is None else force_pallas
    )
    if use_pallas:
        # Fused kernel path (ops/pallas_lincomb): identical math, MXU
        # einsum + in-VMEM sigmoid/crop/smooth-L1 — never materializes the
        # [B, 4, k, ph, pw] prediction stack (measured 17.98 ms -> the
        # kernel's einsum-bound cost at batch 16/544^2; see module doc).
        from crog_tpu.ops.pallas_lincomb import lincomb_task_sums

        b, ph_, pw_ = ds.shape[0], ds.shape[3], ds.shape[4]
        sel_coef = jnp.take_along_axis(
            grasp_coef, sel_idx[:, :, None, None], axis=1
        ).astype(jnp.float32)                     # [B, k, 4, C]
        sel_gt = jnp.take_along_axis(anchor_max_i, sel_idx, axis=1)
        sel_box = jnp.take_along_axis(
            anchor_max_gt, sel_idx[:, :, None], axis=1
        )                                          # [B, k, 4]
        sums = lincomb_task_sums(
            protos, sel_coef,
            ds.reshape(b, 4 * ds.shape[2], ph_ * pw_),
            sel_gt, sel_box, num_tasks=4, interpret=interpret,
        )                                          # [B, k, 4]
        area = (sel_box[..., 2] - sel_box[..., 0]) * (
            sel_box[..., 3] - sel_box[..., 1]
        )
        l = sums / jnp.maximum(area, 1e-6)[..., None]
        l = jnp.where(sel_valid[..., None], l, 0.0)
        scale = jnp.where(
            old_num_pos > num_pos,
            old_num_pos / jnp.maximum(num_pos, 1), 1.0,
        )
        losses = jnp.sum(l, axis=1) * scale[:, None]   # [B, 4]
        per_task = jnp.sum(losses, axis=0) / ph / pw / total_pos
        return {k: per_task[i] for i, k in enumerate(keys)}

    def per_image(coefs, protos_i, ds_i, a_i, a_box, idx, valid, old_n, n_p):
        sel_coef = coefs[idx].astype(jnp.float32)  # [k, 4, 32]
        sel_gt_i = a_i[idx]
        sel_box = a_box[idx]
        # [t, k, h, w] output layout: the GT gather ds_i[:, sel_gt_i] is then
        # consumed directly — an hwkt layout forced a ~30 MB/image transpose
        # copy between the gather and the smooth-L1 (profiled at 1.1 ms/step)
        mask_p = jax.nn.sigmoid(
            jnp.einsum("hwc,ktc->tkhw", protos_i, sel_coef)
        )
        inside = jnp.transpose(box_inside_mask(sel_box, ph, pw), (2, 0, 1))
        mask_p = jnp.where(
            inside[None], mask_p, outside[:, None, None, None]
        )
        gt = ds_i[:, sel_gt_i]  # [4, k, ph, pw]
        l = jnp.sum(smooth_l1_sum(mask_p, gt), axis=(2, 3))  # [4, k]
        area = (sel_box[:, 2] - sel_box[:, 0]) * (
            sel_box[:, 3] - sel_box[:, 1]
        )
        l = l / jnp.maximum(area, 1e-6)[None, :]
        l = jnp.where(valid[None, :], l, 0.0)
        scale = jnp.where(old_n > n_p, old_n / jnp.maximum(n_p, 1), 1.0)
        return jnp.sum(l, axis=1) * scale  # [4]

    losses = jax.vmap(per_image)(
        grasp_coef, protos, ds, anchor_max_i, anchor_max_gt,
        sel_idx, sel_valid, old_num_pos, num_pos,
    )  # [B, 4]
    per_task = jnp.sum(losses, axis=0) / ph / pw / total_pos
    return {k: per_task[i] for i, k in enumerate(keys)}


def semantic_seg_loss(seg_pred, sem_masks_gt, labels, obj_valid, sem_ds=None):
    """Per-class max-aggregated BCE (reference :510-529).  Instead of the
    reference's scatter loop over instances, instance masks are max-scattered
    into a [B, C, h, w] one-hot stack.

    ``sem_ds`` [B, M, h, w]: GT masks already downsampled + binarized at the
    seg-head resolution (unpack_ssg_raw(emit_ds=True)); when given,
    ``sem_masks_gt`` may be None."""
    b, h, w, c = seg_pred.shape
    if sem_ds is not None:
        assert sem_ds.shape[2:] == (h, w), (sem_ds.shape, seg_pred.shape)
        ds = sem_ds
    else:
        ds = resize_bilinear(
            sem_masks_gt[..., None].astype(jnp.float32), (h, w), False
        )[..., 0]
        ds = (ds > 0.5).astype(jnp.float32)  # [B, M, h, w]

    def build_gt(masks_i, labels_i, valid_i):
        # max over instances of each class
        onehot = jax.nn.one_hot(labels_i, c, dtype=jnp.float32)  # [M, C]
        onehot = onehot * valid_i[:, None]
        return jnp.einsum("mhw,mc->chw", masks_i, onehot).clip(0.0, 1.0)

    seg_gt = jax.vmap(build_gt)(ds, labels, obj_valid.astype(jnp.float32))
    logits = jnp.transpose(seg_pred, (0, 3, 1, 2)).astype(jnp.float32)
    bce = (
        jnp.maximum(logits, 0) - logits * seg_gt
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    return jnp.sum(bce) / h / w / b


def ssg_losses(
    output: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    anchors: jnp.ndarray,
    rng,
    pos_iou_thre: float = 0.5,
    neg_iou_thre: float = 0.4,
    masks_to_train: int = 100,
    # defaults mirror config/OCID-Grasp/ssg_r50.yaml:45-49 (same values as
    # the reference yaml — alpha_ins 6.126 and alpha_grasp 6.125 really do
    # differ there); train_ssg.py always passes the config values, which are
    # the source of truth
    alpha_conf: float = 1.0,
    alpha_bbox: float = 1.5,
    alpha_ins: float = 6.126,
    alpha_sem: float = 1.0,
    alpha_grasp: float = 6.125,
    with_grasp_masks: bool = True,
):
    """Full 8-term loss dict (reference compute_loss :297-352)."""
    boxes = batch["boxes"]
    labels = batch["labels"]
    obj_valid = batch["obj_valid"]

    # named scopes: profile_step.py's region rollup attributes each loss
    # term (forward AND its transpose/backward) separately, so the
    # loss-block roofline can be stated per term instead of one 34.5 ms blob
    with jax.named_scope("lmatch"):
        offsets, conf_gt, anchor_max_gt, anchor_max_i = jax.vmap(
            lambda bx, v, lb: match(
                bx, v, lb, anchors, pos_iou_thre, neg_iou_thre
            )
        )(boxes, obj_valid, labels)
        pos = conf_gt > 0

        sel_idx, sel_valid, old_np, num_np = _select_positives(
            pos, rng, masks_to_train
        )

    with jax.named_scope("lcls"):
        l_cls = alpha_conf * category_loss(output["cls_logits"], conf_gt, pos)
    with jax.named_scope("lbox"):
        l_box = alpha_bbox * box_loss(output["box_pred"], offsets, pos)
    with jax.named_scope("lins"):
        l_ins = alpha_ins * lincomb_mask_loss(
            output["ins_coef_pred"], output["protos"],
            batch.get("ins_masks"),
            pos, anchor_max_i, anchor_max_gt, sel_idx, sel_valid, old_np,
            num_np, ins_ds=batch.get("ins_ds"),
        )
    with jax.named_scope("lsem"):
        l_sem = alpha_sem * semantic_seg_loss(
            output["seg_pred"], batch.get("ins_masks"), labels, obj_valid,
            sem_ds=batch.get("sem_ds"),
        )
    loss = {
        "loss_cls": l_cls,
        "loss_box": l_box,
        "loss_ins": l_ins,
        "loss_sem": l_sem,
    }
    if with_grasp_masks:
        with jax.named_scope("lgrasp"):
            grasp_ds = batch.get("grasp_ds")
            g = lincomb_grasp_masks_loss(
                output["grasp_coef_pred"], output["protos"],
                None if grasp_ds is not None else {
                    k: batch[f"grasp_{k}"]
                    for k in ("qua", "sin", "cos", "wid")
                },
                pos, anchor_max_i, anchor_max_gt, sel_idx, sel_valid, old_np,
                num_np, grasp_ds=grasp_ds,
            )
        for k in ("qua", "sin", "cos", "wid"):
            loss[f"loss_{k}"] = alpha_grasp * g[k]
    total = sum(loss.values())
    return total, loss
