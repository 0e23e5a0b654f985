"""CROG evaluation entry point (parity target: reference test_crog.py).

Runs the full test split producing mask IoU, Pr@50-90, J@1, J@5.  Unlike the
reference (single-GPU DataParallel, batch 1, per-sample CPU post-processing,
test_crog.py:56-87), the whole eval pipeline is one jitted device computation
per batch; only the ragged Jacquard rect check runs on host.
"""

from __future__ import annotations

import argparse
import os

import jax

from crog_tpu.config import load_cfg_from_cfg_file, merge_cfg_from_list
from crog_tpu.data.loader import DataLoader, device_put_crog
from crog_tpu.engine import checkpoint as ckpt
from crog_tpu.engine.crog_engine import make_eval_step, validate_with_grasp
from crog_tpu.models.crog import build_crog
from crog_tpu.parallel.mesh import data_sharding, get_mesh
from crog_tpu.utils.logging import get_logger, setup_logger
from train_crog import build_dataset, maybe_load_pretrained_clip


def get_parser():
    parser = argparse.ArgumentParser(description="TPU-native CROG evaluation")
    parser.add_argument(
        "--config", default="config/OCID-VLG/crog_multiple_r50.yaml", type=str
    )
    parser.add_argument("--opts", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()
    cfg = load_cfg_from_cfg_file(args.config)
    if args.opts:
        cfg = merge_cfg_from_list(cfg, args.opts)
    return cfg


def load_eval_variables(args, model, example):
    """Restore checkpoint params for eval (reference test_crog.py:76-80)."""
    logger = get_logger()
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)}, example["img"][:1],
        example["word"][:1], train=False,
    )
    resume = args.get("resume")
    if resume and os.path.exists(resume):
        if resume.endswith((".pth", ".pt")):
            # trained reference checkpoint (torch): convert on the fly —
            # the day-one migration path (reference test_crog.py:73-79
            # loads {'state_dict': ...} strictly; so does this merge)
            from crog_tpu.models.convert import (
                convert_crog_state_dict,
                load_torch_state_dict,
                merge_trained_crog,
            )

            sd = load_torch_state_dict(resume)
            params, stats = convert_crog_state_dict(sd)
            variables = merge_trained_crog(variables, params, stats)
            logger.info(f"=> converted torch checkpoint '{resume}'")
        else:
            payload = ckpt.restore_checkpoint(resume)
            variables = {
                "params": payload["params"],
                "batch_stats": payload["batch_stats"],
            }
            logger.info(f"=> loaded checkpoint '{resume}'")
    else:
        logger.warning(
            f"checkpoint {resume!r} not found — evaluating fresh weights"
        )
    return variables


def main():
    args = get_parser()
    setup_logger(
        os.path.join(args.output_folder, args.exp_name),
        filename="test.log",
    )
    logger = get_logger()
    logger.info(str(args))

    mesh = get_mesh()
    model, _ = build_crog(args)
    ds = build_dataset(args, args.test_split)
    loader = DataLoader(
        ds,
        batch_size=int(args.get("batch_size_test", args.get("batch_size_val", 16))),
        shuffle=False,
        drop_last=False,
        pad_last_batch=True,
        num_workers=args.get("workers_val", 4),
        device_put_fn=lambda b: device_put_crog(b),
    )
    # init needs only SHAPES — independent of the wire format on the loader
    import jax.numpy as jnp

    example = {
        "img": jnp.zeros((1, args.input_size, args.input_size, 3), jnp.float32),
        "word": jnp.zeros((1, args.word_len), jnp.int32),
    }
    variables = load_eval_variables(args, model, example)
    eval_step = make_eval_step(
        model, input_size=args.input_size,
        ori_hw=getattr(ds, "max_ori_size", (480, 640)),
    )
    result = validate_with_grasp(
        loader, eval_step, variables, with_grasps=args.use_grasp_masks
    )
    logger.info(
        f"Final: IoU={100 * result['iou']:.2f} "
        + "  ".join(f"{k}={100 * v:.2f}" for k, v in result["prec"].items())
        + f"  J@1={100 * result['j_index@1']:.2f}"
        + f"  J@5={100 * result['j_index@5']:.2f}"
    )
    return result


if __name__ == "__main__":
    main()
