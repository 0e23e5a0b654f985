"""CROG train / eval engine.

Parity targets: engine/crog_engine.py in the reference —
``train_with_grasp`` (:17-122), ``validate_with_grasp`` (:126-285),
``validate_without_grasp`` (:289-381), ``inference_with_grasp`` (:386-558).

TPU-first redesign:
  * One jitted train step: forward + losses + grad + Adam update + batch IoU
    metrics.  Batch is sharded over the mesh's ``data`` axis; XLA inserts the
    gradient all-reduce (DDP equivalent) and computes global BN statistics
    (SyncBN equivalent).  Metric reductions (the reference's dist.all_reduce
    at :88-93) fall out as plain jnp.means over the global batch.
  * One jitted eval step that keeps the ENTIRE eval pipeline on device:
    sigmoid -> bicubic upsample (align_corners=True) -> batched inverse
    letterbox warp to the original resolution -> thresholded mask IoU ->
    grasp peak detection.  The reference did all post-forward work per sample
    on the CPU (:214-261), its eval bottleneck.
  * Only the ragged Jacquard rect-IoU check against variable-count GT rects
    remains on host (tiny rasterizations).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from crog_tpu.models.crog import crog_losses
from crog_tpu.ops.peaks import detect_grasp_peaks
from crog_tpu.ops.rects import rotated_rect_iou
from crog_tpu.utils.logging import get_logger
from crog_tpu.utils.meters import AverageMeter, ProgressMeter


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def create_train_state(model, tx, example_img, example_word, rng) -> TrainState:
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": rng}, example_img, example_word, train=False
    )
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
    )
    # step must be a strong-typed device scalar from the start: a python int
    # here would give call #1 a weak-typed aval and call #2 (step now an
    # int32 array) a different cache key -> silent full recompile every step.
    return state.replace(step=jnp.asarray(0, jnp.int32))


def train_metrics(pred_logits, target_mask, threshold=0.35, pr_iou=0.5):
    """Batch mask IoU / Pr@50 (reference utils/misc.py:115-131), x100."""
    prob = jax.nn.sigmoid(pred_logits.astype(jnp.float32))
    binary = prob >= threshold
    t = target_mask > 0.5
    b = binary.reshape(binary.shape[0], -1)
    t = t.reshape(t.shape[0], -1)
    inter = jnp.sum(b & t, axis=1)
    union = jnp.sum(b | t, axis=1)
    ious = inter / (union + 1e-6)
    return 100.0 * ious.mean(), 100.0 * (ious > pr_iou).mean()


_TRAIN_KEYS = ("img", "word", "mask", "qua", "sin", "cos", "wid")
_EVAL_KEYS = ("img", "word", "mask", "inverse", "ori_size")
# compact uint8 wire format (crog_tpu.data.compact): unpacked inside the jit
_TRAIN_KEYS_C = ("img_u8", "planes_u8", "word")
_EVAL_KEYS_C = ("img_u8", "planes_u8", "word", "inverse", "ori_size")
# raw wire format (crog_tpu.data.rawwire): raster + blur + letterbox in-jit
# (raw_img_u8 = unwarped camera frame, lb_img_u8 = host-letterboxed variant)
_TRAIN_KEYS_R = (
    "raw_img_u8", "lb_img_u8", "raw_mask_bits", "rect_corners", "rect_vals",
    "word",
)
_EVAL_KEYS_R = _TRAIN_KEYS_R + ("inverse", "ori_size")


def _select_keys(batch, legacy, compact, raw):
    if "raw_img_u8" in batch or "lb_img_u8" in batch:
        return raw
    return compact if "img_u8" in batch else legacy


def _unpack(batch, input_size: int):
    """In-jit wire-format dispatch (identity on legacy float batches)."""
    if "raw_img_u8" in batch or "lb_img_u8" in batch:
        from crog_tpu.data.rawwire import unpack_raw

        return unpack_raw(batch, input_size)
    if "img_u8" in batch:
        from crog_tpu.data.compact import unpack_compact

        return unpack_compact(batch)
    return batch


def make_train_step(model, tx, use_grasp_masks: bool = True):
    """Returns (state, batch, rng) -> (state, metrics); jit-compiled on the
    dense device fields only (ragged host fields are stripped)."""

    def step(state: TrainState, batch: Dict[str, jax.Array], rng) -> Any:
        batch = _unpack(batch, model.input_resolution)
        img = batch["img"]
        word = batch["word"]
        targets = {
            "mask": batch["mask"],
            "qua": batch.get("qua", batch["mask"]),
            "sin": batch.get("sin", batch["mask"]),
            "cos": batch.get("cos", batch["mask"]),
            "wid": batch.get("wid", batch["mask"]),
        }

        def loss_fn(params):
            preds, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                img,
                word,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            total, loss_dict = crog_losses(preds, targets, use_grasp_masks)
            return total, (preds, mutated["batch_stats"], loss_dict)

        (loss, (preds, new_stats, loss_dict)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        with jax.named_scope("opt_update"):
            new_state = state.apply_gradients(
                grads=grads, batch_stats=new_stats
            )
        # target resized inside crog_losses; recompute small for metrics
        ds_mask = targets["mask"]
        if ds_mask.shape[1:3] != preds.shape[1:3]:
            from crog_tpu.ops.resize import resize_nearest

            ds_mask = resize_nearest(ds_mask[..., None], preds.shape[1:3])[..., 0]
        iou, pr5 = train_metrics(preds[..., 0], ds_mask)
        metrics = {"loss": loss, "iou": iou, "prec@50": pr5, **loss_dict}
        return new_state, metrics

    jitted = jax.jit(step, donate_argnums=(0,))

    def wrapped(state, batch, rng):
        keys = _select_keys(batch, _TRAIN_KEYS, _TRAIN_KEYS_C, _TRAIN_KEYS_R)
        dense = {k: batch[k] for k in keys if k in batch}
        return jitted(state, dense, rng)

    # expose the jitted step so callers can .lower() it (bench.py inspects
    # the HLO to prove the fused Pallas attention path engaged)
    wrapped._jitted = jitted
    wrapped._dense_keys = _TRAIN_KEYS
    return wrapped


def make_eval_step(
    model,
    input_size: int = 416,
    ori_hw=(480, 640),
    num_peaks: int = 5,
    mask_threshold: float = 0.35,
):
    """Returns a jit-compiled eval step with PER-SAMPLE original geometry.

    ``ori_hw`` is the MAXIMUM original (h, w) across the split; every sample
    is un-warped to its own resolution (from ``batch['inverse']`` /
    ``batch['ori_size']``, like the reference's per-sample cv2.warpAffine
    loop at engine/crog_engine.py:233-244) inside a common zero-padded
    [B, max_h, max_w] canvas, so constant-size datasets (OCID-VLG, 480x640)
    and variable-size ones (RefCOCO) share one compiled program.

    The letterbox inverse is a pure scale+translate affine (reference
    utils/dataset.py:825-840), hence SEPARABLE: the whole eval resample
    chain — bicubic 4x upsample (align_corners=True, reference :187-211)
    composed with the cv2-style inverse warp to original resolution —
    collapses to one row matrix and one column matrix per sample applied to
    the raw 104x104 predictions.  Batched matmuls on the MXU replace a
    16-tap gather per pixel.

    Outputs per-sample mask IoU and top-k grasp rects in ORIGINAL image
    coordinates (the reference computed all of this per sample with
    cv2/skimage on host, engine/crog_engine.py:214-261).
    """
    max_h, max_w = ori_hw
    from crog_tpu.ops.resize import batched_affine_axis_matrix, interp_matrix

    pred_size = input_size // 4
    up = jnp.asarray(interp_matrix(pred_size, input_size, "cubic", True))
    hi = jax.lax.Precision.HIGHEST

    def step(variables, batch):
        batch = _unpack(batch, input_size)
        img = batch["img"]
        word = batch["word"]
        preds = model.apply(variables, img, word, train=False)
        mask_p = jax.nn.sigmoid(preds[..., 0].astype(jnp.float32))
        qua_p = jax.nn.sigmoid(preds[..., 1].astype(jnp.float32))
        sin_p = preds[..., 2].astype(jnp.float32)
        cos_p = preds[..., 3].astype(jnp.float32)
        wid_p = jax.nn.sigmoid(preds[..., 4].astype(jnp.float32))

        # per-sample warp matrices: cv2.warpAffine(pred, inverse, ori_size)
        # samples src = forward_letterbox @ dst, so invert the stored
        # (axis-aligned) input->original matrix per sample
        inv = batch["inverse"].astype(jnp.float32)  # [B, 2, 3]
        osz = batch["ori_size"].astype(jnp.int32)  # [B, 2] (h, w)
        fsy = 1.0 / inv[:, 1, 1]
        foy = -inv[:, 1, 2] * fsy
        fsx = 1.0 / inv[:, 0, 0]
        fox = -inv[:, 0, 2] * fsx
        w_row = batched_affine_axis_matrix(
            input_size, max_h, fsy, foy, osz[:, 0]
        )  # [B, max_h, S]
        w_col = batched_affine_axis_matrix(
            input_size, max_w, fsx, fox, osz[:, 1]
        )  # [B, max_w, S]
        # compose with the static upsample matrix: [B, max, pred]
        wr = jnp.einsum("bos,sp->bop", w_row, up, precision=hi)
        wc = jnp.einsum("bos,sp->bop", w_col, up, precision=hi)

        stack = jnp.stack([mask_p, qua_p, sin_p, cos_p, wid_p], axis=1)
        y = jnp.einsum("boh,bchw->bcow", wr, stack, precision=hi)
        warped = jnp.einsum("bpw,bcow->bcop", wc, y, precision=hi)
        mask_w, qua_w, sin_w, cos_w, wid_w = (
            warped[:, 0], warped[:, 1], warped[:, 2], warped[:, 3], warped[:, 4]
        )

        tgt = batch["mask"].astype(jnp.float32)
        ty = jnp.einsum("boh,bhw->bow", w_row, tgt, precision=hi)
        tgt_w = jnp.einsum("bpw,bow->bop", w_col, ty, precision=hi)

        pred_bin = mask_w > mask_threshold
        tgt_bin = tgt_w != 0.0  # np.logical_and float semantics (ref :247)
        inter = jnp.sum(pred_bin & tgt_bin, axis=(1, 2))
        union = jnp.sum(pred_bin | tgt_bin, axis=(1, 2))
        iou = inter / (union + 1e-6)

        rects, valid = detect_grasp_peaks(
            qua_w, sin_w, cos_w, wid_w, num_peaks=num_peaks, valid_hw=osz
        )
        return {"iou": iou, "rects": rects, "rects_valid": valid}

    jitted = jax.jit(step)

    def wrapped(variables, batch):
        keys = _select_keys(batch, _EVAL_KEYS, _EVAL_KEYS_C, _EVAL_KEYS_R)
        dense = {k: batch[k] for k in keys if k in batch}
        return jitted(variables, dense)

    return wrapped


def jacquard_index(
    grasp_preds, grasp_targets, iou_threshold: float = 0.25, shape=(480, 640)
) -> int:
    """1 if any predicted rect overlaps any GT rect above threshold
    (reference utils/grasp_eval.py:350-373): GT height forced to 20, width
    clipped to 100."""
    if len(grasp_preds) == 0:
        return 0
    gts = np.array(grasp_targets, np.float64).copy()
    gts[:, 3] = 20.0
    gts[:, 2] = np.clip(gts[:, 2], 0, 100)
    for gt in gts:
        for p in grasp_preds:
            if rotated_rect_iou(p, gt, shape=shape) > iou_threshold:
                return 1
    return 0


def summarize_eval(iou_list, j_hits_1, j_hits_5, epoch=0, epochs=0):
    iou_arr = np.asarray(iou_list, np.float64)
    prec = {}
    for thres in range(5, 10):
        prec[f"Pr@{thres * 10}"] = float((iou_arr > thres / 10.0).mean())
    result = {
        "iou": float(iou_arr.mean()),
        "prec": prec,
        "j_index@1": float(np.mean(j_hits_1)) if len(j_hits_1) else 0.0,
        "j_index@5": float(np.mean(j_hits_5)) if len(j_hits_5) else 0.0,
    }
    logger = get_logger()
    head = (
        f"Evaluation: Epoch=[{epoch}/{epochs}]  IoU={100 * result['iou']:.2f}  "
        f"J_index@1: {100 * result['j_index@1']:.2f}  "
        f"J_index@5: {100 * result['j_index@5']:.2f}  "
    )
    head += "  ".join(
        f"{k}: {100 * v:.2f}" for k, v in prec.items()
    )
    logger.info(head)
    return result


def validate_with_grasp(
    loader,
    eval_step,
    variables,
    epoch: int = 0,
    args=None,
    with_grasps: bool = True,
    on_batch=None,
):
    """Host eval loop: device metrics + host Jacquard check.

    ``loader`` yields batches with device arrays plus host-side ragged
    ``grasps`` (list of [Mi, 6] arrays) and ``ori_size``.  ``on_batch`` is an
    optional hook called as ``on_batch(batch, out, n_valid)`` after each eval
    step (inference visualization reuses the single pass this way).
    """
    iou_list: list = []
    j1_hits: list = []
    j5_hits: list = []
    for batch in loader:
        out = eval_step(variables, batch)
        iou = np.asarray(out["iou"])
        # a padded tail batch (drop_last=False + pad_last_batch) carries the
        # count of real samples; the reference evaluated the full split
        # (train_crog.py:200 drop_last=False)
        n_valid = int(batch.get("n_valid", iou.shape[0]))
        iou_list.extend(iou[:n_valid].tolist())
        if with_grasps:
            rects = np.asarray(out["rects"])
            valid = np.asarray(out["rects_valid"])
            ori_sizes = np.asarray(batch["ori_size"]) if "ori_size" in batch \
                else np.full((rects.shape[0], 2), (480, 640))
            for i in range(n_valid):
                preds5 = [rects[i, k].tolist() for k in range(rects.shape[1])
                          if valid[i, k]]
                preds1 = preds5[:1]
                gts = batch["grasps"][i]
                shape = (int(ori_sizes[i, 0]), int(ori_sizes[i, 1]))
                j1_hits.append(jacquard_index(preds1, gts, shape=shape))
                j5_hits.append(jacquard_index(preds5, gts, shape=shape))
        if on_batch is not None:
            on_batch(batch, out, n_valid)
    # cross-host metric gather (reference concat_all_gather of per-sample
    # IoUs, engine/crog_engine.py:269); identity on one host
    from crog_tpu.parallel.mesh import gather_metrics

    iou_list = gather_metrics(iou_list).tolist()
    j1_hits = gather_metrics(j1_hits).tolist()
    j5_hits = gather_metrics(j5_hits).tolist()
    epochs = getattr(args, "epochs", 0) if args is not None else 0
    return summarize_eval(iou_list, j1_hits, j5_hits, epoch, epochs)


def validate_without_grasp(loader, eval_step, variables, epoch=0, args=None):
    """Mask-only eval (reference engine/crog_engine.py:289-381): same device
    pipeline with the Jacquard check skipped (use_grasp_masks ablation)."""
    return validate_with_grasp(
        loader, eval_step, variables, epoch, args, with_grasps=False
    )


def inference_with_grasp(
    loader,
    eval_step,
    variables,
    args=None,
    visualize: bool = False,
    vis_dir: str = "vis",
):
    """Test-split inference (reference engine/crog_engine.py:386-558):
    validate_with_grasp plus optional per-sample visualization PNGs for the
    WHOLE split (reference :530-533), rendered during the same single pass
    over the loader."""
    on_batch = None
    if visualize:
        import numpy as _np

        from crog_tpu.utils.visualization import visualize_grasp_prediction

        counter = {"batch": 0}

        def on_batch(batch, out, n_valid):  # noqa: F811
            from crog_tpu.data.compact import unpack_compact_host

            if "raw_img_u8" in batch:
                from crog_tpu.data.rawwire import RAW_KEYS, unpack_raw

                size = int(getattr(args, "input_size", 416)) if args else 416
                dense = {
                    k: jnp.asarray(batch[k])
                    for k in RAW_KEYS + ("word",) if k in batch
                }
                unpacked = jax.device_get(unpack_raw(dense, size))
                batch = {**batch, **unpacked}
            else:
                batch = unpack_compact_host(batch)
            bi = counter["batch"]
            counter["batch"] += 1
            rects = _np.asarray(out["rects"])
            valid = _np.asarray(out["rects_valid"])
            for i in range(n_valid):
                img = _np.asarray(batch["img"][i])
                img = (img - img.min()) / max(img.max() - img.min(), 1e-6)
                visualize_grasp_prediction(
                    (img * 255).astype(_np.uint8),
                    _np.asarray(batch["mask"][i]),
                    (
                        _np.asarray(batch.get("qua", batch["mask"])[i]),
                        _np.asarray(batch.get("sin", batch["mask"])[i]),
                        _np.asarray(batch.get("wid", batch["mask"])[i]),
                    ),
                    [r for k, r in enumerate(rects[i]) if valid[i, k]],
                    batch.get("sentence", [""] * rects.shape[0])[i],
                    save_path=f"{vis_dir}/{bi:04d}_{i:02d}.png",
                )

    return validate_with_grasp(
        loader, eval_step, variables, 0, args,
        with_grasps=args is None or args.get("use_grasp_masks", True),
        on_batch=on_batch,
    )


def train_one_epoch(
    loader,
    state: TrainState,
    train_step,
    epoch: int,
    args,
    rng,
    steps_per_epoch: Optional[int] = None,
):
    """One training epoch (reference train_with_grasp, :17-122)."""
    logger = get_logger()
    num_batches = steps_per_epoch or len(loader)
    meters = {
        name: AverageMeter(label, fmt)
        for name, (label, fmt) in {
            "batch_time": ("Batch", ":2.2f"),
            "data_time": ("Data", ":2.2f"),
            "loss": ("Loss", ":2.4f"),
            "iou": ("IoU", ":2.2f"),
            "prec@50": ("Prec@50", ":2.2f"),
        }.items()
    }
    progress = ProgressMeter(
        num_batches,
        list(meters.values()),
        prefix=f"Training: Epoch=[{epoch}/{args.epochs}] ",
    )
    end = time.perf_counter()
    win_start = end  # per-print-window clock: batch_time = window / print_freq
    metrics = None
    for i, batch in enumerate(loader):
        meters["data_time"].update(time.perf_counter() - end)
        # rng is already folded per-epoch by the caller; fold the host-side
        # batch index for a distinct key per step (state.step is a device
        # array — using it here would force a sync every step)
        step_rng = jax.random.fold_in(rng, i)
        state, metrics = train_step(state, batch, step_rng)
        if (i + 1) % args.print_freq == 0:
            # sync once per print window only — keeps the device queue full
            m = jax.device_get(metrics)
            bsz = batch["word"].shape[0]
            meters["loss"].update(float(m["loss"]), bsz)
            meters["iou"].update(float(m["iou"]), bsz)
            meters["prec@50"].update(float(m["prec@50"]), bsz)
            now = time.perf_counter()
            meters["batch_time"].update((now - win_start) / args.print_freq)
            win_start = now
            logger.info(progress.display(i + 1))
        end = time.perf_counter()
    return state, metrics
