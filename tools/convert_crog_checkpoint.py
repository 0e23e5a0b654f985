"""Convert a trained reference CROG checkpoint (torch .pth) to orbax.

The reference saves ``{'state_dict': model.state_dict(), ...}`` from its
DDP-wrapped model (reference train_crog.py:236-247).  This tool lays every
tensor into the flax CROG tree (models/convert.convert_crog_state_dict,
strict — any schema drift is a loud error) and writes an orbax checkpoint
directory that ``test_crog.py --opts resume <dir>`` restores.

``test_crog.py`` can also consume the .pth directly (it converts on the fly
when ``resume`` ends in .pth/.pt); this tool is for doing the conversion
once and keeping the fast-restoring artifact.

Usage:
  python tools/convert_crog_checkpoint.py \
      --config config/OCID-VLG/crog_multiple_r50.yaml \
      --src exp_torch/best_model.pth --dst exp/converted/best_model
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("--src", required=True, help="torch checkpoint (.pth)")
    p.add_argument("--dst", required=True, help="orbax checkpoint dir to write")
    p.add_argument(
        "--model", choices=("crog", "ssg"), default=None,
        help="model family (default: inferred from the config)",
    )
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp

    from crog_tpu.config import load_cfg_from_cfg_file
    from crog_tpu.models.convert import (
        convert_crog_state_dict,
        convert_ssg_state_dict,
        load_torch_state_dict,
        merge_trained_crog,
    )

    cfg = load_cfg_from_cfg_file(args.config)
    family = args.model or ("ssg" if "num_protos" in cfg else "crog")
    sd = load_torch_state_dict(args.src)
    if family == "ssg":
        from crog_tpu.models.ssg import build_ssg

        model, _ = build_ssg(cfg)
        chans = 4 if cfg.with_depth else 3
        variables = jax.jit(model.init, static_argnames=("train",))(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.img_size, cfg.img_size, chans), jnp.float32),
            train=True,  # train: the semantic seg head is part of the tree
        )
        params, stats = convert_ssg_state_dict(sd)
    else:
        from crog_tpu.models.crog import build_crog

        model, _ = build_crog(cfg)
        variables = jax.jit(model.init, static_argnames=("train",))(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, cfg.input_size, cfg.input_size, 3), jnp.float32),
            jnp.zeros((1, cfg.word_len), jnp.int32),
            train=False,
        )
        params, stats = convert_crog_state_dict(sd)
    variables = merge_trained_crog(variables, params, stats)
    payload = {
        "params": jax.device_get(variables["params"]),
        "batch_stats": jax.device_get(variables["batch_stats"]),
        "step": np.asarray(0),
        "meta": {"converted_from": 0},  # scalar tree: orbax-friendly
    }
    ocp.PyTreeCheckpointer().save(os.path.abspath(args.dst), payload, force=True)
    print(f"wrote {args.dst}")


if __name__ == "__main__":
    main()
