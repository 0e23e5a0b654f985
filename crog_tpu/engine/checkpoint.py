"""Checkpoint / resume via orbax.

Parity with the reference's torch.save flow (train_crog.py:245-267): each
epoch writes ``last_model`` containing step/epoch, model params, BN stats,
optimizer state and the best-metric scalars; improvements are additionally
recorded as ``best_iou_model`` / ``best_jindex_model``.  Resume restores all
of it (train_crog.py:206-226).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

LAST = "last_model"
BEST_IOU = "best_iou_model"
BEST_J = "best_jindex_model"


def _checkpointer():
    return ocp.PyTreeCheckpointer()


def _opt_fingerprint(opt_state) -> np.uint64:
    """Stable fingerprint of the optimizer-state STRUCTURE (treedef + leaf
    shapes/dtypes).  Restore rebuilds optax state classes by unflattening
    the saved leaves against the current optimizer's treedef — silently
    wrong if the optax version/config changed the state pytree between save
    and restore, so the fingerprint makes version skew a loud error."""
    import hashlib

    leaves, treedef = jax.tree_util.tree_flatten(opt_state)
    desc = str(treedef) + "|" + ";".join(
        f"{np.shape(l)}:{np.asarray(l).dtype}" for l in leaves
    )
    return np.uint64(int(hashlib.sha1(desc.encode()).hexdigest()[:16], 16))


def save_checkpoint(
    output_dir: str,
    state,
    epoch: int,
    best_iou: float = 0.0,
    best_jindex: float = 0.0,
    prec: Optional[Dict[str, float]] = None,
    name: str = LAST,
):
    payload = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "step": np.asarray(jax.device_get(state.step)),
        "meta": {
            "opt_fingerprint": _opt_fingerprint(state.opt_state),
            "epoch": np.asarray(epoch),
            "best_iou": np.asarray(best_iou),
            "best_jindex": np.asarray(best_jindex),
            **{k: np.asarray(v) for k, v in (prec or {}).items()},
        },
    }
    path = os.path.abspath(os.path.join(output_dir, name))
    _checkpointer().save(path, payload, force=True)
    return path


def restore_checkpoint(path: str, state=None) -> Dict[str, Any]:
    """Restore a checkpoint dir.  With ``state`` given, returns a new state
    with params/opt_state/batch_stats/step replaced (resume); otherwise the
    raw payload (eval restore)."""
    path = os.path.abspath(path)
    restored = _checkpointer().restore(path)
    if state is None:
        return restored
    # opt_state restores as generic containers; rebuild it against the
    # optimizer's own structure so optax state classes survive the roundtrip
    opt_template = jax.device_get(state.opt_state)
    meta = restored.get("meta") or {}
    saved_fp = meta.get("opt_fingerprint")
    if saved_fp is not None:
        current_fp = _opt_fingerprint(opt_template)
        if np.uint64(np.asarray(saved_fp)) != current_fp:
            raise ValueError(
                "optimizer-state structure mismatch: checkpoint "
                f"{path!r} was saved with a different optimizer "
                "configuration or optax version (fingerprint "
                f"{int(np.asarray(saved_fp))} != current {int(current_fp)}). "
                "Rebuild the optimizer to match, or restore without `state` "
                "and load params only."
            )
    flat_restored = jax.tree_util.tree_leaves(restored["opt_state"])
    treedef = jax.tree_util.tree_structure(opt_template)
    if len(flat_restored) != treedef.num_leaves:
        raise ValueError(
            f"optimizer-state leaf count mismatch restoring {path!r}: "
            f"checkpoint has {len(flat_restored)} leaves, current optimizer "
            f"expects {treedef.num_leaves}"
        )
    opt_state = jax.tree_util.tree_unflatten(treedef, flat_restored)
    new_state = state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=opt_state,
        step=jnp.asarray(np.asarray(restored["step"]), jnp.int32),
    )
    return {"state": new_state, "meta": restored.get("meta") or {}}


def copy_best(output_dir: str, src: str, dst: str):
    """Record an improved checkpoint under a best-model name (the reference
    copied the .pth file; orbax re-links the directory via save of the
    restored payload)."""
    payload = _checkpointer().restore(os.path.abspath(os.path.join(output_dir, src)))
    _checkpointer().save(
        os.path.abspath(os.path.join(output_dir, dst)), payload, force=True
    )
