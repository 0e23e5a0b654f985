"""Per-referring-expression-type evaluation sweep.

Parity target: reference test_diff_refer_types.py (which is broken as shipped
— imports ``engine.engine``/``build_segmenter`` that don't exist; SURVEY.md
section 2.4).  This version works: loads refer_types.json (5 expression-type
index lists: name / location / attribute / relation / mixed), evaluates each
subset, and reports per-type IoU / Pr@K / J@1 / J@5.
"""

from __future__ import annotations

import argparse
import json
import os

from crog_tpu.config import load_cfg_from_cfg_file, merge_cfg_from_list
from crog_tpu.data.loader import DataLoader, device_put_crog
from crog_tpu.engine.crog_engine import make_eval_step, validate_with_grasp
from crog_tpu.models.crog import build_crog
from crog_tpu.utils.logging import get_logger, setup_logger
from test_crog import load_eval_variables
from train_crog import build_dataset


class Subset:
    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = list(indices)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.dataset[self.indices[i]]


def get_parser():
    parser = argparse.ArgumentParser(
        description="CROG per-refer-type evaluation"
    )
    parser.add_argument(
        "--config", default="config/OCID-VLG/crog_multiple_r50.yaml"
    )
    parser.add_argument(
        "--refer-types", default="refer_types.json",
        help="json mapping refer type -> sample index list",
    )
    parser.add_argument("--opts", default=None, nargs=argparse.REMAINDER)
    a = parser.parse_args()
    cfg = load_cfg_from_cfg_file(a.config)
    if a.opts:
        cfg = merge_cfg_from_list(cfg, a.opts)
    cfg.refer_types_path = a.refer_types
    return cfg


def evaluate_refer_types(
    base_ds, refer_types, eval_step, variables, batch_size: int = 16,
    num_workers: int = 4, with_grasps: bool = True,
):
    """Per-type eval loop, separated from config/checkpoint plumbing so the
    fixture-driven test can exercise the real sweep path."""
    logger = get_logger()
    results = {}
    for rtype, indices in refer_types.items():
        subset = Subset(base_ds, [i for i in indices if i < len(base_ds)])
        if len(subset) == 0:
            logger.warning(f"refer type {rtype}: no samples in split, skipped")
            continue
        loader = DataLoader(
            subset,
            batch_size=batch_size,
            num_workers=num_workers,
            drop_last=False,
            # pad tails: each of the 5 types has its own subset size, so
            # without padding every non-multiple-of-batch tail would compile
            # a fresh eval step at its own shape (one compile per sweep
            # instead, like test_crog.py)
            pad_last_batch=True,
            device_put_fn=lambda b: device_put_crog(b),
        )
        logger.info(f"=== refer type: {rtype} ({len(subset)} samples) ===")
        results[rtype] = validate_with_grasp(
            loader, eval_step, variables, with_grasps=with_grasps
        )
    return results


def main():
    args = get_parser()
    setup_logger(
        os.path.join(args.output_folder, args.exp_name),
        filename="test_refer_types.log",
    )
    logger = get_logger()

    with open(args.refer_types_path) as f:
        refer_types = json.load(f)

    model, _ = build_crog(args)
    base_ds = build_dataset(args, args.test_split)
    eval_step = make_eval_step(model, input_size=args.input_size)

    # init needs only SHAPES — independent of the wire format on the loader
    import jax.numpy as jnp

    example = {
        "img": jnp.zeros((1, args.input_size, args.input_size, 3), jnp.float32),
        "word": jnp.zeros((1, args.word_len), jnp.int32),
    }
    variables = load_eval_variables(args, model, example)

    results = evaluate_refer_types(
        base_ds, refer_types, eval_step, variables,
        batch_size=int(args.get("batch_size_test", 16)),
        num_workers=args.get("workers_val", 4),
        with_grasps=args.use_grasp_masks,
    )
    for rtype, r in results.items():
        logger.info(
            f"{rtype}: IoU={100 * r['iou']:.2f} "
            f"J@1={100 * r['j_index@1']:.2f} J@5={100 * r['j_index@5']:.2f}"
        )
    return results


if __name__ == "__main__":
    main()
