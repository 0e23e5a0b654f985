"""Optimizer assembly.

Parity targets: Adam with two param groups — backbone params (excluding any
``positional_embedding``) at ``lr_multi * base_lr``, everything else at
``base_lr`` (reference model/__init__.py:6-23, train_crog.py:119-121) — plus
MultiStepLR epoch milestones with gamma ``lr_decay`` (train_crog.py:123) and
optional global-norm grad clipping (engine/crog_engine.py:81-83).

The reference's fp16 GradScaler has no TPU equivalent: bf16 keeps fp32 range,
so loss scaling is unnecessary (SURVEY.md section 2.5 AMP row).
"""

from __future__ import annotations

from typing import Dict

import jax
import optax


def multistep_schedule(base_lr: float, milestones, gamma: float, steps_per_epoch: int):
    """MultiStepLR: lr * gamma^k after each milestone epoch."""
    boundaries = {int(m) * steps_per_epoch: gamma for m in milestones}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def param_group_label(path) -> str:
    """'backbone' for CLIP tower params except positional embeddings."""
    keys = [getattr(p, "key", str(p)) for p in path]
    if keys and keys[0] == "backbone" and not any(
        "positional_embedding" in k for k in keys
    ):
        return "backbone"
    return "rest"


def make_optimizer(
    params,
    base_lr: float,
    lr_multi: float,
    milestones,
    lr_decay: float,
    steps_per_epoch: int,
    weight_decay: float = 0.0,
    max_norm: float = 0.0,
    optimizer: str = "adam",
) -> optax.GradientTransformation:
    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: param_group_label(path), params
    )

    def adam(lr_scale: float):
        sched = multistep_schedule(
            base_lr * lr_scale, milestones, lr_decay, steps_per_epoch
        )
        if optimizer == "adamw" or weight_decay > 0:
            return optax.adamw(sched, weight_decay=weight_decay)
        return optax.adam(sched)

    tx = optax.multi_transform(
        {"backbone": adam(lr_multi), "rest": adam(1.0)}, labels
    )
    if max_norm and max_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(max_norm), tx)
    return tx
