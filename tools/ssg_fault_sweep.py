"""Minimal-repro sweep for the SSG raw-wire worker fault (VERDICT r04 #1).

History: the SSG raw-wire e2e loop (device unpack: photometric replay +
per-instance raster + resample, then the dense train step) hard-crashed the
remote v5e worker at per-chip batch 8 ("TPU worker process crashed") while
batch 4 ran clean — size-dependent AND flaky (a 2026-08-19 bisect ran both
split programs clean back-to-back at batch 8; the sustained loop still
faulted on 2026-08-20).  The round-5 wire ships only occupied instance
slots, cutting the raster transients ~6x at typical occupancy, so the fault
envelope must be re-measured.

Each configuration runs in its OWN subprocess (a worker fault kills the JAX
client for the whole process — nothing after it can be trusted), sustained
over enough batches to catch the flaky fault.  The parent prints one JSON
line per config and a final table.

Usage:
  python tools/ssg_fault_sweep.py                  # default sweep
  python tools/ssg_fault_sweep.py 8:4:4 8:24:4     # batch:slots:chunk list
  SWEEP_BATCHES=16 python tools/ssg_fault_sweep.py # longer soak per config

Config axes:
  batch  per-chip batch size
  slots  instance slots on the wire (4 = round-5 occupancy trim at the
         synthetic's 2-4 objects; 24 = the round-4 full-max_objs wire,
         forced via collate slot_round)
  chunk  unpack instance_chunk (lax.map serialization of the raster)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child(batch: int, slots: int, chunk: int, n_batches: int) -> None:
    sys.path.insert(0, REPO)
    import numpy as np

    import jax
    import jax.numpy as jnp

    from bench import _enable_compile_cache

    _enable_compile_cache()
    from functools import partial

    from crog_tpu.data.loader import DataLoader, device_put_crog
    from crog_tpu.data.ssg_rawwire import collate_ssg_raw
    from crog_tpu.data.synthetic_ssg import SyntheticOCIDGraspFrames
    from crog_tpu.engine.optim import make_optimizer
    from crog_tpu.engine.ssg_engine import (
        create_ssg_train_state,
        make_ssg_train_step,
    )
    from crog_tpu.models.ssg import SSG
    from crog_tpu.parallel.mesh import data_sharding, get_mesh, replicate

    n_chips = jax.device_count()
    b = batch * n_chips
    ds = SyntheticOCIDGraspFrames(
        num_samples=b * (n_batches + 1), split="training_0", raw=True
    )
    model = SSG(dtype=jnp.bfloat16)
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
        model, tx, jnp.zeros((1, 544, 544, 4)), jax.random.PRNGKey(0)
    )
    mesh = get_mesh()
    state = state.replace(
        params=replicate(state.params, mesh),
        batch_stats=replicate(state.batch_stats, mesh),
        opt_state=replicate(state.opt_state, mesh),
    )
    # instance_chunk is threaded through a custom unpack-equipped step
    import crog_tpu.data.ssg_rawwire as rw

    orig_unpack = rw.unpack_ssg_raw

    def unpack_with_chunk(bt, img_size, with_depth=True, targets=True,
                          instance_chunk=4, **kw):
        return orig_unpack(bt, img_size, with_depth, targets,
                           instance_chunk=chunk, **kw)

    rw.unpack_ssg_raw = unpack_with_chunk
    step = make_ssg_train_step(
        model, tx, model.anchors(), {"masks_to_train": 100}
    )
    sharding = data_sharding(mesh)
    loader = DataLoader(
        ds, batch_size=b, shuffle=True, drop_last=True,
        num_workers=max(4, os.cpu_count() or 1),
        collate_fn=partial(collate_ssg_raw, slot_round=slots),
        device_put_fn=lambda batch_: device_put_crog(batch_, sharding),
        prefetch=2,
    )
    key = jax.random.PRNGKey(5)
    t0 = time.perf_counter()
    n = 0
    loss = float("nan")
    for bt in loader:
        state, metrics = step(state, bt, key)
        # force completion EVERY step: a deferred fault otherwise surfaces
        # batches later and muddies which size faulted
        loss = float(jax.device_get(metrics["loss"]))
        n += bt["aug"].shape[0]
    dt = time.perf_counter() - t0
    assert np.isfinite(loss), f"non-finite loss {loss}"
    print(json.dumps({
        "ok": True, "batch": batch, "slots": slots, "chunk": chunk,
        "samples": n, "sps_per_chip": round(n / dt / n_chips, 2),
        "wire_slots": int(next(iter(loader))["obj_valid"].shape[1]),
    }))


def main() -> None:
    n_batches = int(os.environ.get("SWEEP_BATCHES", "10"))
    if os.environ.get("SWEEP_CHILD"):
        b, s, c = (int(x) for x in os.environ["SWEEP_CHILD"].split(":"))
        child(b, s, c, n_batches)
        return
    configs = sys.argv[1:] or [
        "4:4:4", "6:4:4", "8:4:4", "8:24:4", "8:24:2", "8:24:8", "12:4:4",
    ]
    results = []
    for cfg in configs:
        env = dict(os.environ, SWEEP_CHILD=cfg)
        t0 = time.perf_counter()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
                timeout=int(os.environ.get("SWEEP_TIMEOUT", "2400")),
            )
            line = next(
                (l for l in proc.stdout.splitlines() if l.startswith("{")),
                None,
            )
            if proc.returncode == 0 and line:
                res = json.loads(line)
            else:
                tail = (proc.stderr or "").strip().splitlines()[-6:]
                res = {
                    "ok": False, "config": cfg, "exit": proc.returncode,
                    "stderr_tail": tail,
                }
        except subprocess.TimeoutExpired:
            res = {"ok": False, "config": cfg, "exit": "timeout"}
        res["wall_s"] = round(time.perf_counter() - t0, 1)
        results.append(res)
        print(json.dumps(res), flush=True)
    print("\nconfig (batch:slots:chunk) -> status")
    for cfg, res in zip(configs, results):
        status = (
            f"OK  {res.get('sps_per_chip', '?')}/s"
            if res.get("ok")
            else f"FAULT exit={res.get('exit')}"
        )
        print(f"  {cfg:10s} {status}")


if __name__ == "__main__":
    main()
