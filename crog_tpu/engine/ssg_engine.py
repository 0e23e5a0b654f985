"""SSG train / eval engine (reference engine/ssg_engine.py:20-263).

Train: one jitted step — forward, vectorized anchor matching, 8-term loss,
grads, AdamW update, global BN stats.  The reference ran anchor matching in a
per-image python loop on device tensors (model/ssg.py:317-321) and summed the
loss dict in the loop body (engine/ssg_engine.py:62-64).

Eval: jitted Fast-NMS post-processing + device grasp detection
(models/ssg_eval.py), then the host-side per-object Jacquard check
(engine/ssg_engine.py:147-166 semantics: a GT object counts as hit if ANY
predicted instance's grasps match it).
"""

from __future__ import annotations

import time
from typing import Any, Dict

import numpy as np

import jax
import jax.numpy as jnp

from crog_tpu.engine.crog_engine import TrainState, jacquard_index
from crog_tpu.models.ssg_loss import ssg_losses
from crog_tpu.utils.logging import get_logger
from crog_tpu.utils.meters import AverageMeter, ProgressMeter

_DENSE_KEYS = (
    "img", "boxes", "labels", "obj_valid", "ins_masks", "grasp_qua",
    "grasp_sin", "grasp_cos", "grasp_wid",
)


def create_ssg_train_state(model, tx, example_img, rng) -> TrainState:
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": rng}, example_img, train=True
    )
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
    )
    return state.replace(step=jnp.asarray(0, jnp.int32))


def make_ssg_train_step(
    model, tx, anchors: np.ndarray, loss_cfg: Dict[str, Any],
    img_size: int = 544, with_depth: bool = True, max_objs: int = 24,
):
    """The raw-wire unpack (device-side augment + per-instance raster,
    data/ssg_rawwire.py) runs as its OWN jitted program, not fused into the
    train step: the fused program compiles fine (3.7 GB temp, fits HBM) but
    its EXECUTION hard-crashes the remote v5e worker at batch 8 — while the
    identical unpack and the identical dense step each run clean back-to-back
    at the same batch (bisected 2026-08-19; B=2 fused also works, so it is a
    size-dependent runtime fault in the fused binary, not OOM).  The split
    costs one extra dispatch and materializes the [B, M, S, S] targets in
    HBM — which the dense wire did anyway."""
    anchors_j = jnp.asarray(anchors)

    def step(state: TrainState, batch, rng):
        def loss_fn(params):
            output, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch["img"],
                train=True,
                mutable=["batch_stats"],
            )
            total, loss_dict = ssg_losses(
                output, batch, anchors_j, rng, **loss_cfg
            )
            return total, (mutated["batch_stats"], loss_dict)

        (loss, (new_stats, loss_dict)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        with jax.named_scope("opt_update"):
            new_state = state.apply_gradients(
                grads=grads, batch_stats=new_stats
            )
        return new_state, {"loss": loss, **loss_dict}

    jitted = jax.jit(step, donate_argnums=(0,))

    from crog_tpu.data.ssg_rawwire import SSG_RAW_KEYS, unpack_ssg_raw

    # pad_objs: the wire ships only occupied instance slots (collate_ssg_raw
    # occupancy trim); the unpack pads targets back to max_objs so the dense
    # step compiles ONCE (the unpack itself retraces per slot bucket — at
    # most max_objs/instance_chunk variants)
    unpack = jax.jit(
        lambda bt: unpack_ssg_raw(bt, img_size, with_depth,
                                  pad_objs=max_objs, emit_ds=True),
        donate_argnums=(0,),
    )

    def wrapped(state, batch, rng):
        if "ssg_img_u8" in batch:
            keys = SSG_RAW_KEYS + ("boxes", "labels", "obj_valid")
            dense = unpack({k: batch[k] for k in keys if k in batch})
        else:
            dense = {k: batch[k] for k in _DENSE_KEYS if k in batch}
        return jitted(state, dense, rng)

    return wrapped


def train_one_epoch(loader, state, train_step, epoch, args, rng):
    logger = get_logger()
    meters = {
        "batch_time": AverageMeter("Batch", ":2.2f"),
        "loss": AverageMeter("Loss", ":2.4f"),
    }
    progress = ProgressMeter(
        len(loader), list(meters.values()),
        prefix=f"SSG Training: Epoch=[{epoch}/{args.epochs}] ",
    )
    end = time.perf_counter()
    metrics = None
    for i, batch in enumerate(loader):
        step_rng = jax.random.fold_in(rng, i)
        state, metrics = train_step(state, batch, step_rng)
        if (i + 1) % args.print_freq == 0:
            m = jax.device_get(metrics)
            bsz = batch["img" if "img" in batch else "ssg_img_u8"].shape[0]
            meters["loss"].update(float(m["loss"]), bsz)
            meters["batch_time"].update(
                (time.perf_counter() - end) / args.print_freq
            )
            logger.info(
                progress.display(i + 1)
                + "  "
                + "  ".join(
                    f"{k}={float(v):.3f}" for k, v in m.items() if k != "loss"
                )
            )
            end = time.perf_counter()
    return state, metrics


def make_ssg_eval_fwd(model, img_size: int = 544, with_depth: bool = True):
    """One jitted eval forward, built ONCE and reused by every validate /
    visualization call — building the jit inside those functions gave every
    validation epoch a fresh cache entry and a full re-trace.

    Takes the (dense fields of a) batch dict and evaluates EVERY sample in it
    (the reference eval is batch-1 by construction, utils/grasp_eval.py:99;
    pair batch-N loaders with make_ssg_post_processing(batched=True)).
    Raw-wire batches are unpacked in-jit (image planes only — the Jacquard
    check consumes host GT rects, so the per-instance target raster is
    skipped at eval).  Returns (output, img) so callers render/crop from the
    same image the model saw."""

    def fwd(v, batch):
        if "ssg_img_u8" in batch:
            from crog_tpu.data.ssg_rawwire import unpack_ssg_raw

            batch = unpack_ssg_raw(batch, img_size, with_depth, targets=False)
        img = batch["img"]
        return model.apply(v, img, train=False), img

    jitted = jax.jit(fwd)

    def wrapped(v, batch):
        keys = (
            ("ssg_img_u8", "ssg_depth", "ssg_depth_u16", "aug")
            if "ssg_img_u8" in batch
            else ("img",)
        )
        dense = {k: jnp.asarray(batch[k]) for k in keys if k in batch}
        return jitted(v, dense)

    return wrapped


def _batched_post(post):
    """Normalize a post-processing result to batched layout [B, ...]: the
    batch-1 mode of make_ssg_post_processing returns per-image arrays with no
    batch axis (reference contract); the batched mode already carries [B]."""
    if np.asarray(post["det_valid"]).ndim == 1:
        return jax.tree.map(lambda x: jnp.asarray(x)[None], post)
    return post


def visualization(loader, post_fn, fwd, variables, epoch, args, vis_dir="vis"):
    """Render one random val sample per epoch (reference
    engine/ssg_engine.py:184-263): RGB with predicted grasps + grasp maps.

    ``fwd`` is the jitted eval forward from make_ssg_eval_fwd (hoisted to
    the caller so repeated epochs hit one jit cache entry).  ``post_fn``
    must carry the full-res grasp maps (make_ssg_post_processing with
    with_maps; the batch-1 default) — the forward output is sliced to ONE
    sample here, whatever the loader batch."""
    import random as _random

    import numpy as _np

    from crog_tpu.utils.visualization import visualize_grasp_prediction

    idx = _random.randint(0, max(len(loader) - 1, 0))
    for i, batch in enumerate(loader):
        if i < idx:
            continue
        output, img_j = fwd(variables, batch)
        output = jax.tree.map(lambda x: x[:1], output)
        post = _batched_post(post_fn(output))
        rects = _np.asarray(post["grasp_rects"])[0]
        gvalid = _np.asarray(post["grasp_valid"])[0]
        dvalid = _np.asarray(post["det_valid"])[0]
        all_rects = [
            rects[k, j]
            for k in range(rects.shape[0])
            if dvalid[k]
            for j in range(rects.shape[1])
            if gvalid[k, j]
        ]
        qua, ang, wid = (m[0] for m in post["grasp_masks"])
        img = _np.asarray(img_j[0, :, :, :3])
        mask = _np.asarray(post["ins_masks"])[0].any(axis=0)
        return visualize_grasp_prediction(
            (img * 255).astype(_np.uint8),
            mask.astype(float),
            (
                _np.asarray(qua).max(axis=0) if qua.ndim == 3 else _np.asarray(qua),
                _np.asarray(ang).max(axis=0) if ang.ndim == 3 else _np.asarray(ang),
                _np.asarray(wid).max(axis=0) if wid.ndim == 3 else _np.asarray(wid),
            ),
            all_rects,
            f"epoch {epoch}",
            save_path=f"{vis_dir}/ssg_epoch{epoch:04d}.png",
        )
    return None


def validate(loader, post_fn, fwd, variables, epoch, args, max_batches=101):
    """Per-object J@1/J@5 over ~100 val batches (reference
    engine/ssg_engine.py:119-180 — batch-1 there; here the loader batch may
    be >1 when post_fn was built with batched=True).  ``fwd`` from
    make_ssg_eval_fwd."""
    logger = get_logger()
    hits = [0, 0]
    totals = [0, 0]
    for i, batch in enumerate(loader):
        output, _ = fwd(variables, batch)
        post = _batched_post(post_fn(output))
        rects_b = np.asarray(post["grasp_rects"])  # [B, K, 5, 5]
        gvalid_b = np.asarray(post["grasp_valid"])
        dvalid_b = np.asarray(post["det_valid"])
        for bi in range(rects_b.shape[0]):
            rects, gvalid, dvalid = rects_b[bi], gvalid_b[bi], dvalid_b[bi]
            pred_instances = [
                [rects[k, j].tolist() for j in range(rects.shape[1])
                 if gvalid[k, j]]
                for k in range(rects.shape[0])
                if dvalid[k]
            ]
            for gt_rects in batch["ins_grasp_rects"][bi]:
                for gi, topk in enumerate((1, 5)):
                    hit = any(
                        jacquard_index([p[:5] for p in preds[:topk]], gt_rects)
                        for preds in pred_instances
                        if preds
                    )
                    hits[gi] += int(hit)
                    totals[gi] += 1
        if i >= max_batches - 1:
            break
    j1 = hits[0] / max(totals[0], 1)
    j5 = hits[1] / max(totals[1], 1)
    logger.info(
        f"SSG Evaluation: Epoch=[{epoch}/{args.epochs}]  "
        f"J_index@1: {100 * j1:.2f}  J_index@5: {100 * j5:.2f}"
    )
    return [j1, j5]
