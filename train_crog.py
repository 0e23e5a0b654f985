"""CROG training entry point (parity target: reference train_crog.py).

Usage: python train_crog.py --config config/OCID-VLG/crog_multiple_r50.yaml \
           [--opts key value ...]

The reference spawned one process per GPU with NCCL DDP
(train_crog.py:71-156).  Here a single process drives every TPU chip through
one device mesh: the global batch is sharded over the ``data`` axis, XLA
inserts gradient all-reduces and global BN statistics (SyncBN), and
per-epoch eval runs as one jitted device computation.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from crog_tpu.config import load_cfg_from_cfg_file, merge_cfg_from_list
from crog_tpu.data.loader import DataLoader, device_put_crog
from crog_tpu.engine import checkpoint as ckpt
from crog_tpu.engine.crog_engine import (
    create_train_state,
    make_eval_step,
    make_train_step,
    train_one_epoch,
    validate_with_grasp,
)
from crog_tpu.engine.optim import make_optimizer
from crog_tpu.models.crog import build_crog
from crog_tpu.parallel.mesh import data_sharding, get_mesh, replicate
from crog_tpu.utils.logging import get_logger, setup_logger
from crog_tpu.utils.seed import set_random_seed


def get_parser():
    parser = argparse.ArgumentParser(
        description="TPU-native CROG training (language-guided grasp synthesis)"
    )
    parser.add_argument(
        "--config", default="config/OCID-VLG/crog_multiple_r50.yaml",
        type=str, help="config file",
    )
    parser.add_argument(
        "--opts", default=None, nargs=argparse.REMAINDER,
        help="override config options via key value pairs",
    )
    args = parser.parse_args()
    cfg = load_cfg_from_cfg_file(args.config)
    if args.opts:
        cfg = merge_cfg_from_list(cfg, args.opts)
    return cfg


def build_dataset(args, split: str):
    # wire_format: what the host ships to the device per sample.
    #   rawlb   — raw with the IMAGE letterboxed on host as uint8 (bit-exact
    #             legacy numerics); fewest wire bytes (~0.56 MB/sample),
    #             default: on a tunneled device the wire bounds e2e.
    #   raw     — unwarped uint8 planes + grasp-rect params; rasterization,
    #             gaussian blur and the letterbox warp run INSIDE the jitted
    #             step (crog_tpu.data.rawwire).  Least host work.
    #   compact — host warps, ships uint8 canvases; /255 + CLIP normalize +
    #             sin/cos on device (crog_tpu.data.compact).  Bit-exact to
    #             legacy.
    #   legacy  — full float32 host pipeline (reference semantics,
    #             utils/dataset.py:843-914).
    # compact_transfer (older flag) is honored when wire_format is unset.
    wire = args.get(
        "wire_format",
        "compact" if args.get("compact_transfer", True) else "legacy",
    )
    # rawlb: host letterboxes the uint8 image (bit-exact legacy numerics),
    # targets still rasterized on device from rect params — fewest wire bytes
    kw = dict(
        compact=wire == "compact",
        raw={"raw": True, "rawlb": "lb"}.get(wire, False),
    )
    if args.dataset == "synthetic":
        from crog_tpu.data.synthetic import SyntheticOCIDVLG

        n = {"train": 512, "val": 128}.get(split, 128)
        ds = SyntheticOCIDVLG(
            num_samples=int(args.get("synthetic_samples", n)),
            split=split,
            input_size=args.input_size,
            word_length=args.word_len,
            **kw,
        )
    else:
        from crog_tpu.data.ocid_vlg import OCIDVLGDataset

        ds = OCIDVLGDataset(
            root_dir=args.root_path,
            split=split,
            input_size=args.input_size,
            word_length=args.word_len,
            version=args.get("version", "multiple"),
            **kw,
        )
    # cache_samples: decode+preprocess each sample once, serve epochs 2..N
    # from RAM (semantically exact — the CROG pipeline has no random
    # augmentation).  True = 4 GiB bound, or an explicit byte count.
    cache = args.get("cache_samples", False)
    if cache:
        from crog_tpu.data.cache import SampleCache

        max_bytes = (4 << 30) if cache is True else int(cache)
        ds = SampleCache(ds, max_bytes=max_bytes)
    return ds


def maybe_load_pretrained_clip(args, state):
    """use_pretrained_clip semantics (reference model/crog.py:20-23)."""
    logger = get_logger()
    path = args.get("clip_pretrain")
    if not args.get("use_pretrained_clip", True):
        logger.info("Load pretrained CLIP: False")
        return state
    if not path or not os.path.exists(path):
        logger.warning(
            f"clip_pretrain checkpoint not found at {path!r}; "
            "backbone keeps fresh initialization"
        )
        return state
    from crog_tpu.models.convert import (
        convert_clip_state_dict,
        load_torch_state_dict,
        merge_pretrained_clip,
    )

    sd = load_torch_state_dict(path)
    params, stats = convert_clip_state_dict(sd)
    variables = merge_pretrained_clip(
        {"params": state.params, "batch_stats": state.batch_stats}, params, stats
    )
    logger.info(f"Load pretrained CLIP: True ({path})")
    return state.replace(
        params=variables["params"], batch_stats=variables["batch_stats"]
    )


def main():
    args = get_parser()
    setup_logger(
        os.path.join(args.output_folder, args.exp_name),
        distributed_rank=jax.process_index(),
        filename="train.log",
    )
    logger = get_logger()
    rng = set_random_seed(args.manual_seed)

    mesh = get_mesh()
    n_dev = len(mesh.devices.ravel())
    logger.info(f"Devices: {n_dev} ({jax.devices()[0].platform}); mesh axes "
                f"{mesh.axis_names}")
    logger.info(str(args))

    model, _ = build_crog(args)
    train_ds = build_dataset(args, args.train_split)
    val_ds = build_dataset(args, args.val_split)

    sharding = data_sharding(mesh)
    put = lambda b: device_put_crog(b, sharding)
    # per-host striding: each host loads its slice of the global batch
    # (DistributedSampler equivalent; with 1 host this is the whole batch)
    hosts = dict(num_hosts=jax.process_count(), host_id=jax.process_index())
    per_host_batch = max(1, args.batch_size // jax.process_count())
    train_loader = DataLoader(
        train_ds, batch_size=per_host_batch, shuffle=True, drop_last=True,
        seed=args.manual_seed, num_workers=args.get("workers", 4),
        num_procs=int(args.get("workers_procs", 0)),
        device_put_fn=put, **hosts,
    )
    # full val split: no sample dropped (reference train_crog.py:200
    # drop_last=False); the tail batch is padded to keep one compiled program
    val_loader = DataLoader(
        val_ds, batch_size=max(1, args.batch_size_val // jax.process_count()),
        shuffle=False, drop_last=False, pad_last_batch=True,
        num_workers=args.get("workers_val", 2), device_put_fn=put, **hosts,
    )
    steps_per_epoch = len(train_loader)

    # init needs only SHAPES (batch dim is irrelevant to the param tree);
    # building them directly avoids consuming a loader batch before step 0
    example = {
        "img": jnp.zeros((1, args.input_size, args.input_size, 3), jnp.float32),
        "word": jnp.zeros((1, args.word_len), jnp.int32),
    }
    init_params_shape = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)}, example["img"], example["word"],
            train=False,
        )
    )
    tx = make_optimizer(
        init_params_shape["params"],
        base_lr=args.base_lr,
        lr_multi=args.lr_multi,
        milestones=args.milestones,
        lr_decay=args.lr_decay,
        steps_per_epoch=steps_per_epoch,
        weight_decay=args.weight_decay,
        max_norm=args.max_norm,
    )
    state = create_train_state(
        model, tx, example["img"], example["word"], rng
    )
    state = maybe_load_pretrained_clip(args, state)
    state = state.replace(
        params=replicate(state.params, mesh),
        batch_stats=replicate(state.batch_stats, mesh),
        opt_state=replicate(state.opt_state, mesh),
    )

    start_epoch = args.start_epoch
    best_iou, best_jindex = 0.0, 0.0
    resume = args.get("resume")
    if resume and os.path.exists(resume):
        restored = ckpt.restore_checkpoint(resume, state)
        state = restored["state"]
        meta = restored["meta"]
        start_epoch = int(meta.get("epoch", 0))
        best_iou = float(meta.get("best_iou", 0.0))
        best_jindex = float(meta.get("best_jindex", 0.0))
        logger.info(f"=> resumed from '{resume}' (epoch {start_epoch})")

    train_step = make_train_step(model, tx, args.use_grasp_masks)
    eval_step = make_eval_step(
        model, input_size=args.input_size,
        ori_hw=getattr(val_ds, "max_ori_size", (480, 640)),
    )
    out_dir = os.path.join(args.output_folder, args.exp_name)
    from crog_tpu.utils.tracking import MetricsTracker

    tracker = MetricsTracker(
        out_dir, project="crog_tpu", name=args.exp_name, config=args
    )

    for epoch in range(start_epoch, args.epochs):
        epoch_rng = jax.random.fold_in(rng, epoch)
        train_loader.set_epoch(epoch)
        t0 = time.perf_counter()
        state, _ = train_one_epoch(
            train_loader, state, train_step, epoch + 1, args, epoch_rng,
            steps_per_epoch,
        )
        dt = time.perf_counter() - t0
        seen = steps_per_epoch * args.batch_size
        logger.info(
            f"Epoch {epoch + 1}: {dt:.1f}s, {seen / dt:.2f} samples/s global"
        )
        tracker.log(
            {"train/epoch_time_s": dt, "train/samples_per_s": seen / dt},
            step=epoch + 1,
        )

        if args.get("evaluate", True):
            variables = {"params": state.params, "batch_stats": state.batch_stats}
            result = validate_with_grasp(
                val_loader, eval_step, variables, epoch + 1, args,
                with_grasps=args.use_grasp_masks,
            )
            tracker.log(
                {
                    "val/iou": result["iou"],
                    "val/j_index@1": result["j_index@1"],
                    "val/j_index@5": result["j_index@5"],
                    **{f"val/{k}": v for k, v in result["prec"].items()},
                },
                step=epoch + 1,
            )
            ckpt.save_checkpoint(
                out_dir, state, epoch + 1, best_iou, best_jindex,
                result["prec"],
            )
            if result["iou"] > best_iou:
                best_iou = result["iou"]
                ckpt.copy_best(out_dir, ckpt.LAST, ckpt.BEST_IOU)
                logger.info(f"=> new best IoU {100 * best_iou:.2f}")
            if result["j_index@1"] > best_jindex:
                best_jindex = result["j_index@1"]
                ckpt.copy_best(out_dir, ckpt.LAST, ckpt.BEST_J)
                logger.info(f"=> new best J@1 {100 * best_jindex:.2f}")
        else:
            ckpt.save_checkpoint(out_dir, state, epoch + 1, best_iou, best_jindex)

    tracker.finish()
    logger.info("* Training finished *")


if __name__ == "__main__":
    main()
