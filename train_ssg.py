"""SSG training entry point (parity target: reference train_ssg.py).

Single process drives all TPU chips via one data-parallel mesh (the reference
spawned NCCL DDP workers, train_ssg.py:60-130).  AdamW + MultiStepLR,
rank-0-style validation every ``val_freq`` epochs with Fast-NMS
post-processing on device.
"""

from __future__ import annotations

import argparse
import os
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from crog_tpu.config import load_cfg_from_cfg_file, merge_cfg_from_list
from crog_tpu.data.loader import DataLoader
from crog_tpu.data.ocid_grasp import OCIDGraspDataset, collate_ssg
from crog_tpu.engine import checkpoint as ckpt
from crog_tpu.engine.optim import make_optimizer
from crog_tpu.engine.ssg_engine import (
    create_ssg_train_state,
    make_ssg_eval_fwd,
    make_ssg_train_step,
    train_one_epoch,
    validate,
)
from crog_tpu.models.ssg import build_ssg
from crog_tpu.models.ssg_eval import make_ssg_post_processing
from crog_tpu.parallel.mesh import data_sharding, get_mesh, replicate
from crog_tpu.utils.logging import get_logger, setup_logger
from crog_tpu.utils.seed import set_random_seed


def get_parser():
    parser = argparse.ArgumentParser(description="TPU-native SSG training")
    parser.add_argument(
        "--config", default="config/OCID-Grasp/ssg_r50.yaml", type=str
    )
    parser.add_argument("--opts", default=None, nargs=argparse.REMAINDER)
    a = parser.parse_args()
    cfg = load_cfg_from_cfg_file(a.config)
    if a.opts:
        cfg = merge_cfg_from_list(cfg, a.opts)
    return cfg


def build_ssg_dataset(args, split: str):
    # wire_format: what the host ships to the device per sample.
    #   raw    — uint8 frame + bit-packed instance masks + grasp-rect params
    #            + drawn augmentation params; photometric distort, mirror,
    #            pad, resize and per-instance raster all run INSIDE the
    #            jitted step (crog_tpu.data.ssg_rawwire).  ~3 MB/sample on
    #            the wire vs ~150 MB dense; near-zero host work.  Default.
    #   legacy — full dense host pipeline (reference semantics on host).
    raw = args.get("wire_format", "legacy") == "raw"
    kw = dict(
        raw=raw,
        max_objs=int(args.get("max_objs", 24)),
        max_rects=int(args.get("max_rects", 16)),
    )
    if args.dataset == "synthetic":
        from crog_tpu.data.synthetic_ssg import (
            SyntheticOCIDGrasp,
            SyntheticOCIDGraspFrames,
        )

        n = int(args.get("synthetic_samples", 128))
        if raw:
            # the frame-level synthetic flows through the SAME host pipeline
            # (DataAugmentor + raw packing) as the real reader
            return SyntheticOCIDGraspFrames(
                num_samples=n, split=split, img_size=args.img_size,
                num_classes=args.num_classes, **kw,
            )
        return SyntheticOCIDGrasp(
            num_samples=n, split=split, img_size=args.img_size,
            num_classes=args.num_classes,
        )
    return OCIDGraspDataset(
        root_dir=args.root_dir,
        split=split,
        img_size=args.img_size,
        depth_factor=args.depth_factor,
        with_depth=args.with_depth,
        with_grasp_masks=args.with_grasp_masks,
        **kw,
    )


def main():
    args = get_parser()
    setup_logger(
        os.path.join(args.output_folder, args.exp_name), filename="train.log"
    )
    logger = get_logger()
    rng = set_random_seed(args.manual_seed)
    mesh = get_mesh()
    logger.info(f"Devices: {jax.device_count()}")
    logger.info(str(args))

    model, _ = build_ssg(args)
    anchors = model.anchors()
    train_ds = build_ssg_dataset(args, args.train_split)
    val_ds = build_ssg_dataset(args, args.val_split)

    sharding = data_sharding(mesh)
    raw = args.get("wire_format", "legacy") == "raw"
    if raw:
        from crog_tpu.data.ssg_rawwire import collate_ssg_raw as collate
    else:
        collate = partial(collate_ssg, max_objs=int(args.get("max_objs", 24)))

    from crog_tpu.data.loader import device_put_crog

    train_loader = DataLoader(
        train_ds, batch_size=args.batch_size, shuffle=True, drop_last=True,
        seed=args.manual_seed, num_workers=args.get("workers", 4),
        collate_fn=collate,
        device_put_fn=lambda batch: device_put_crog(batch, sharding),
    )
    # reference eval is batch-1 by construction (utils/grasp_eval.py:99);
    # batch_size_val > 1 pairs the batched eval forward with the vmapped
    # post-processing (make_ssg_post_processing(batched=True))
    bval = int(args.get("batch_size_val", 1))
    val_loader = DataLoader(
        val_ds, batch_size=bval, shuffle=False,
        num_workers=args.get("workers_val", 2), collate_fn=collate,
    )

    example_img = jnp.zeros(
        (args.batch_size, args.img_size, args.img_size,
         4 if args.with_depth else 3), jnp.float32,
    )
    params_shape = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)}, example_img, train=True
        )
    )
    tx = make_optimizer(
        params_shape["params"],
        base_lr=args.base_lr,
        lr_multi=1.0,
        milestones=args.milestones,
        lr_decay=args.lr_decay,
        steps_per_epoch=len(train_loader),
        weight_decay=args.weight_decay,
        max_norm=args.max_norm,
        optimizer="adamw",
    )
    state = create_ssg_train_state(model, tx, example_img, rng)
    state = state.replace(
        params=replicate(state.params, mesh),
        batch_stats=replicate(state.batch_stats, mesh),
        opt_state=replicate(state.opt_state, mesh),
    )

    start_epoch = args.start_epoch
    resume = args.get("resume")
    if resume and os.path.exists(resume):
        restored = ckpt.restore_checkpoint(resume, state)
        state = restored["state"]
        start_epoch = int(restored["meta"].get("epoch", 0))
        logger.info(f"=> resumed from '{resume}' (epoch {start_epoch})")

    loss_cfg = dict(
        pos_iou_thre=args.pos_iou_thre,
        neg_iou_thre=args.neg_iou_thre,
        masks_to_train=args.masks_to_train,
        alpha_conf=args.alpha_conf,
        alpha_bbox=args.alpha_bbox,
        alpha_ins=args.alpha_ins,
        alpha_sem=args.alpha_sem,
        alpha_grasp=args.alpha_grasp,
        with_grasp_masks=args.with_grasp_masks,
    )
    train_step = make_ssg_train_step(
        model, tx, anchors, loss_cfg,
        img_size=args.img_size, with_depth=args.with_depth,
        max_objs=int(args.get("max_objs", 24)),
    )
    post_fn = make_ssg_post_processing(
        anchors,
        num_protos=args.num_protos,
        nms_score_thre=args.nms_score_thre,
        nms_iou_thre=args.nms_iou_thre,
        top_k=args.top_k,
        max_detections=args.max_detections,
        ori_hw=(480, 640) if args.dataset != "synthetic"
        else (args.img_size, args.img_size),
        batched=bval > 1,
    )
    eval_fwd = make_ssg_eval_fwd(model, args.img_size, args.with_depth)
    out_dir = os.path.join(args.output_folder, args.exp_name)
    from crog_tpu.utils.tracking import MetricsTracker

    tracker = MetricsTracker(
        out_dir, project="crog_tpu_ssg", name=args.exp_name, config=args
    )
    best_j1 = 0.0
    post_vis = None

    for epoch in range(start_epoch, args.epochs):
        epoch_rng = jax.random.fold_in(rng, epoch)
        train_loader.set_epoch(epoch)
        t0 = time.perf_counter()
        state, _ = train_one_epoch(
            train_loader, state, train_step, epoch + 1, args, epoch_rng
        )
        dt = time.perf_counter() - t0
        logger.info(
            f"Epoch {epoch + 1}: {dt:.1f}s, "
            f"{len(train_loader) * args.batch_size / dt:.2f} samples/s"
        )
        if args.get("evaluate", True) and (epoch + 1) % args.val_freq == 0:
            variables = {
                "params": state.params, "batch_stats": state.batch_stats
            }
            j1, j5 = validate(
                val_loader, post_fn, eval_fwd, variables, epoch + 1, args
            )
            tracker.log(
                {"val/j_index@1": j1, "val/j_index@5": j5}, step=epoch + 1
            )
            if args.get("visualize", False):
                from crog_tpu.engine.ssg_engine import visualization

                if post_vis is None:  # batch-1, with full-res grasp maps
                    post_vis = make_ssg_post_processing(
                        anchors,
                        num_protos=args.num_protos,
                        nms_score_thre=args.nms_score_thre,
                        nms_iou_thre=args.nms_iou_thre,
                        top_k=args.top_k,
                        max_detections=args.max_detections,
                        ori_hw=(480, 640) if args.dataset != "synthetic"
                        else (args.img_size, args.img_size),
                    )
                visualization(
                    val_loader, post_vis, eval_fwd, variables, epoch + 1,
                    args, vis_dir=os.path.join(out_dir, "vis"),
                )
            ckpt.save_checkpoint(out_dir, state, epoch + 1, best_jindex=best_j1)
            if j1 > best_j1:
                best_j1 = j1
                ckpt.copy_best(out_dir, ckpt.LAST, ckpt.BEST_J)
        else:
            ckpt.save_checkpoint(out_dir, state, epoch + 1)
    tracker.finish()
    logger.info("* SSG training finished *")


if __name__ == "__main__":
    main()
