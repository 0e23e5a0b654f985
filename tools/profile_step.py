"""Profile the CROG train step on the attached TPU and aggregate the trace.

Captures a jax.profiler trace of steady-state train steps, then parses the
chrome trace: per-op device time, grouped by HLO op category and by model
region (scope names embedded in the fusion metadata), plus bytes_accessed
where the compiler reports it.

Usage:  python tools/profile_step.py [steps] [batch]
        PROFILE_MODEL=ssg python tools/profile_step.py [steps] [batch]
Output: a sorted table of the top device-time consumers.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict


def _enable_compile_cache():
    import jax

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


def capture_ssg(steps: int, batch: int, logdir: str):
    """SSG train-step trace (second model family, train_ssg.py)."""
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import synthetic_ssg_batch
    from crog_tpu.engine.optim import make_optimizer
    from crog_tpu.engine.ssg_engine import (
        create_ssg_train_state,
        make_ssg_train_step,
    )
    from crog_tpu.models.ssg import SSG
    from crog_tpu.parallel.mesh import data_sharding, get_mesh, replicate

    mesh = get_mesh()
    model = SSG(dtype=jnp.bfloat16)
    sharding = data_sharding(mesh)
    dev_batch = jax.device_put(synthetic_ssg_batch(batch), sharding)
    params_shape = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, 544, 544, 4)), train=True,
        )
    )
    tx = make_optimizer(
        params_shape["params"], base_lr=3e-4, lr_multi=1.0, milestones=[100],
        lr_decay=0.95, steps_per_epoch=1000, weight_decay=5e-4,
        optimizer="adamw",
    )
    state = create_ssg_train_state(
        model, tx, dev_batch["img"][:1], jax.random.PRNGKey(0)
    )
    state = state.replace(
        params=replicate(state.params, mesh),
        batch_stats=replicate(state.batch_stats, mesh),
        opt_state=replicate(state.opt_state, mesh),
    )
    step = make_ssg_train_step(
        model, tx, model.anchors(), {"masks_to_train": 100}
    )
    key = jax.random.PRNGKey(1)
    for i in range(3):
        state, metrics = step(state, dev_batch, jax.random.fold_in(key, i))
    float(jax.device_get(metrics["loss"]))
    jax.profiler.start_trace(logdir)
    for i in range(steps):
        state, metrics = step(state, dev_batch, jax.random.fold_in(key, 10 + i))
    float(jax.device_get(metrics["loss"]))
    jax.profiler.stop_trace()


def capture_ssg_eval(steps: int, batch: int, logdir: str):
    """SSG batched eval trace: forward + vmapped post-processing
    (models/ssg_eval), the round-5 batched eval path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    _enable_compile_cache()
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from crog_tpu.engine.ssg_engine import make_ssg_eval_fwd
    from crog_tpu.models.ssg import SSG
    from crog_tpu.models.ssg_eval import make_ssg_post_processing

    model = SSG(dtype=jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 544, 544, 4)),
        train=False,
    )
    fwd = make_ssg_eval_fwd(model)
    img = jnp.asarray(
        np.random.RandomState(0).rand(batch, 544, 544, 4), jnp.float32
    )
    max_det = int(os.environ.get("PROFILE_SSG_EVAL_DETS", "16"))
    post = make_ssg_post_processing(
        model.anchors(), ori_hw=(480, 640), batched=batch > 1,
        max_detections=max_det if batch > 1 else 100,
    )
    out = post(fwd(variables, {"img": img})[0])
    float(jax.device_get(out["grasp_rects"].sum()))
    jax.profiler.start_trace(logdir)
    for _ in range(steps):
        out = post(fwd(variables, {"img": img})[0])
    float(jax.device_get(out["grasp_rects"].sum()))
    jax.profiler.stop_trace()


def capture(steps: int, batch: int, logdir: str):
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import synthetic_device_batch
    from crog_tpu.engine.crog_engine import create_train_state, make_train_step
    from crog_tpu.engine.optim import make_optimizer
    from crog_tpu.models.crog import CROG
    from crog_tpu.parallel.mesh import data_sharding, get_mesh, replicate

    mesh = get_mesh()
    model = CROG(dtype=jnp.bfloat16)
    batch_np = synthetic_device_batch(batch)
    sharding = data_sharding(mesh)
    dev_batch = {k: jax.device_put(v, sharding) for k, v in batch_np.items()}
    params_shape = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.asarray(batch_np["img"][:1]), jnp.asarray(batch_np["word"][:1]),
            train=False,
        )
    )
    tx = make_optimizer(
        params_shape["params"], base_lr=1e-4, lr_multi=0.1, milestones=[35],
        lr_decay=0.1, steps_per_epoch=1000,
    )
    state = create_train_state(
        model, tx, dev_batch["img"], dev_batch["word"], jax.random.PRNGKey(0)
    )
    state = state.replace(
        params=replicate(state.params, mesh),
        batch_stats=replicate(state.batch_stats, mesh),
        opt_state=replicate(state.opt_state, mesh),
    )
    step = make_train_step(model, tx)
    key = jax.random.PRNGKey(1)
    for i in range(3):
        state, metrics = step(state, dev_batch, jax.random.fold_in(key, i))
    float(jax.device_get(metrics["loss"]))

    jax.profiler.start_trace(logdir)
    for i in range(steps):
        state, metrics = step(state, dev_batch, jax.random.fold_in(key, 10 + i))
    float(jax.device_get(metrics["loss"]))
    jax.profiler.stop_trace()


_CATEGORIES = [
    ("conv", re.compile(r"convolution|conv_general", re.I)),
    ("matmul", re.compile(r"\bdot\b|einsum|matmul", re.I)),
    ("pallas", re.compile(r"custom-call|tpu_custom_call", re.I)),
    ("reduce", re.compile(r"reduce", re.I)),
    ("copy/transpose", re.compile(r"copy|transpose|reshape|bitcast", re.I)),
]


def aggregate(logdir: str, steps: int):
    paths = glob.glob(
        os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True
    )
    assert paths, f"no trace under {logdir}"
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # device lanes: pid/tid whose thread name mentions TensorCore / XLA Ops
    lane_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            lane_name[(e["pid"], e["tid"])] = e["args"].get("name", "")
    by_name = defaultdict(float)
    bytes_by_name = defaultdict(float)
    region_time = defaultdict(float)
    for e in events:
        if e.get("ph") != "X":
            continue
        lane = lane_name.get((e.get("pid"), e.get("tid")), "")
        if "XLA Ops" not in lane and "TensorCore" not in lane:
            continue
        name = e.get("name", "?")
        by_name[name] += e.get("dur", 0.0)
        args = e.get("args", {}) or {}
        for k in ("bytes_accessed", "bytes accessed"):
            if k in args:
                try:
                    bytes_by_name[name] += float(args[k])
                except (TypeError, ValueError):
                    pass
        # region = first scope segment below the (possibly transposed) model
        # call in the op's metadata path, e.g.
        # "jit(step)/transpose(jvp(CROG))/decoder/layer_2/..." -> "decoder"
        top = args.get("tf_op") or args.get("long_name") or ""
        m = re.search(r"\(?(?:jvp|vjp)?\(?(?:CROG|SSG)\)?\)?/([A-Za-z0-9_.]+)", top)
        if m:
            region_time[m.group(1)] += e.get("dur", 0.0)
        elif top:
            # loss-term named scopes (ssg_loss.py) and the optimizer live
            # outside the model module scope; match them anywhere in the
            # metadata path (forward or its transpose)
            m2 = re.search(
                r"\b(lmatch|lcls|lbox|lins|lsem|lgrasp|opt_update"
                r"|apply_gradients|adamw?|scale_by)", top
            )
            region_time[
                f"<loss:{m2.group(1)}>" if m2 else "<other-scope>"
            ] += e.get("dur", 0.0)
    total = sum(by_name.values())
    print(f"\ntrace: {path}")
    print(f"device time total: {total/1e3/steps:.2f} ms/step over {steps} steps")
    # achieved GB/s = compiler-reported bytes_accessed / device time; compare
    # against the v5e HBM peak (~819 GB/s) to call an op at-roofline — ops
    # near peak are CLOSED (memory-bound, nothing left), ops far below it at
    # high MB/step are fusion/layout suspects
    print(f"\n{'us/step':>10}  {'%':>5}  {'MB/step':>8}  {'GB/s':>6}  op")
    items = sorted(by_name.items(), key=lambda kv: -kv[1])
    for name, dur in items[:40]:
        mb = bytes_by_name.get(name, 0.0) / 1e6 / steps
        gbps = (
            bytes_by_name.get(name, 0.0) / 1e9 / (dur / 1e6)
            if dur else 0.0
        )
        print(
            f"{dur/steps:10.0f}  {100*dur/total:5.1f}  {mb:8.1f}  "
            f"{gbps:6.0f}  {name[:100]}"
        )
    # category rollup
    cat_time = defaultdict(float)
    for name, dur in by_name.items():
        for cat, rx in _CATEGORIES:
            if rx.search(name):
                cat_time[cat] += dur
                break
        else:
            cat_time["other"] += dur
    print("\ncategory rollup (ms/step):")
    for cat, dur in sorted(cat_time.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:15s} {dur/1e3/steps:8.2f}  ({100*dur/total:.1f}%)")
    if region_time:
        print("\nregion rollup (ms/step, by op metadata scope):")
        for reg, dur in sorted(region_time.items(), key=lambda kv: -kv[1]):
            if dur / 1e3 / steps >= 0.05:
                print(f"  {reg:24s} {dur/1e3/steps:8.2f}  ({100*dur/total:.1f}%)")


if __name__ == "__main__":
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    which = os.environ.get("PROFILE_MODEL", "crog")
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else (
        16 if which == "ssg" else 8 if which == "ssg_eval" else 24
    )
    logdir = os.environ.get("PROFILE_DIR", "/tmp/crog_profile")
    {"ssg": capture_ssg, "ssg_eval": capture_ssg_eval, "crog": capture}[
        which
    ](steps, batch, logdir)
    aggregate(logdir, steps)
