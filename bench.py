"""Benchmark: CROG training throughput on the attached TPU.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

North-star (BASELINE.md): OCID-VLG img+text->grasp TRAINING samples/sec/chip.
Reference baseline: ~22 samples/s global on 2x RTX 4090 (README.md:31 derived)
= 11 samples/s/chip; vs_baseline is our per-chip rate over 11.

Protocol: flagship CROG (RN50, 416 px, word 17, bf16 compute), full jitted
train step (fwd + losses + bwd + Adam + BN stats) on a synthetic batch held
on device, batch 24 per chip (the reference's global batch), timed over
steady-state steps with block_until_ready.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

PER_CHIP_BASELINE = 11.0  # samples/s/chip, 2x RTX 4090 -> 22 global


def main():
    import jax
    import jax.numpy as jnp

    from crog_tpu.engine.crog_engine import create_train_state, make_train_step
    from crog_tpu.engine.optim import make_optimizer
    from crog_tpu.models.crog import CROG
    from crog_tpu.parallel.mesh import data_sharding, get_mesh, replicate

    n_chips = jax.device_count()
    mesh = get_mesh()
    # reference trained global batch 24 on 2 GPUs; one v5e chip fits the
    # whole global batch with the vision tower rematerialized
    per_chip_batch = int(os.environ.get("BENCH_BATCH", "24"))
    b = per_chip_batch * n_chips

    # batch 24 fits without remat since the dynconv rewrite; remat available
    # for larger batches (BENCH_REMAT=1)
    model = CROG(
        dtype=jnp.bfloat16,
        remat=os.environ.get("BENCH_REMAT", "0") == "1",
    )
    rng = np.random.RandomState(0)
    batch_np = {
        "img": rng.randn(b, 416, 416, 3).astype(np.float32) * 0.5,
        "word": np.concatenate(
            [
                np.full((b, 1), 49406, np.int32),
                rng.randint(1000, 40000, (b, 8)).astype(np.int32),
                np.full((b, 1), 49407, np.int32),
                np.zeros((b, 7), np.int32),
            ],
            axis=1,
        ),
        "mask": (rng.rand(b, 416, 416) > 0.8).astype(np.float32),
        "qua": rng.rand(b, 416, 416).astype(np.float32),
        "sin": rng.uniform(-1, 1, (b, 416, 416)).astype(np.float32),
        "cos": rng.uniform(-1, 1, (b, 416, 416)).astype(np.float32),
        "wid": rng.rand(b, 416, 416).astype(np.float32),
    }
    sharding = data_sharding(mesh)
    batch = {k: jax.device_put(v, sharding) for k, v in batch_np.items()}

    params_shape = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.asarray(batch_np["img"][:1]),
            jnp.asarray(batch_np["word"][:1]),
            train=False,
        )
    )
    tx = make_optimizer(
        params_shape["params"], base_lr=1e-4, lr_multi=0.1, milestones=[35],
        lr_decay=0.1, steps_per_epoch=1000,
    )
    state = create_train_state(
        model, tx, batch["img"], batch["word"], jax.random.PRNGKey(0)
    )
    state = state.replace(
        params=replicate(state.params, mesh),
        batch_stats=replicate(state.batch_stats, mesh),
        opt_state=replicate(state.opt_state, mesh),
    )
    train_step = make_train_step(model, tx)

    key = jax.random.PRNGKey(1)
    # warmup / compile; device_get forces real completion (on the axon
    # remote platform block_until_ready returns before execution finishes,
    # so it cannot be used for timing)
    for i in range(3):
        state, metrics = train_step(state, batch, jax.random.fold_in(key, i))
    float(jax.device_get(metrics["loss"]))

    # steady-state wall clock over a step chain (each step consumes the
    # previous state, so the chain serializes on device) with one final
    # forced transfer
    iters = 60
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = train_step(state, batch, jax.random.fold_in(key, 100 + i))
    loss = float(jax.device_get(metrics["loss"]))
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(loss), f"non-finite training loss {loss}"

    global_sps = b / dt
    per_chip = global_sps / n_chips
    print(
        json.dumps(
            {
                "metric": "crog_train_throughput_per_chip",
                "value": round(per_chip, 2),
                "unit": "samples/s/chip",
                "vs_baseline": round(per_chip / PER_CHIP_BASELINE, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
