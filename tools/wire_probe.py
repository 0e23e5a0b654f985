"""Measure the host->device wire honestly on the attached (tunneled) TPU.

The round-3 bench's wire diagnostic timed ONE synchronous device_put +
device_get round trip, which measures 2x the tunnel RPC latency plus the
transfer — at small-ish batch sizes the latency term dominates and the
resulting "MB/s" is off by an order of magnitude (VERDICT r03, weak #1).
This probe separates the terms:

  rtt_ms          median round trip of a 4-byte array (pure RPC latency)
  seq_MBps        K back-to-back device_puts of a realistic batch dict,
                  completion forced by a jitted per-array reduction whose
                  scalar output is device_get (4 bytes back) — amortizes
                  the RTT over K transfers, never echoes the payload back
  conc_MBps       same bytes split over T putter threads (does the tunnel
                  multiplex / is the serializer the bottleneck?)
  overlap_ratio   wall(puts || compute chain) / max(wall(puts), wall(compute))
                  ~1.0 = full overlap, ~2.0 = fully serialized

Usage: python tools/wire_probe.py [batch_MB] [reps]
"""

from __future__ import annotations

import json
import sys
import threading
import time

import numpy as np

import jax
import jax.numpy as jnp


def _force(tree):
    """Force H2D completion without echoing payload back: reduce each array
    to a scalar on device and device_get the (tiny) result. block_until_ready
    does NOT wait on the axon platform (CLAUDE.md)."""
    s = _sum_tree(tree)
    return float(jax.device_get(s))


@jax.jit
def _sum_tree(tree):
    return sum(jnp.sum(v.astype(jnp.float32)) for v in jax.tree.leaves(tree))


def make_batch(mb: float, seed: int = 0) -> dict:
    """Realistic raw-wire-shaped batch: one big uint8 image tensor plus small
    sidecar arrays, scaled to ~mb megabytes."""
    rng = np.random.RandomState(seed)
    n = max(1, int(mb * 1e6 / (480 * 640 * 3)))
    return {
        "raw_img_u8": rng.randint(0, 255, (n, 480, 640, 3), dtype=np.uint8),
        "raw_mask_bits": rng.randint(0, 255, (n, 480, 80), dtype=np.uint8),
        "rect_corners": rng.randint(0, 480, (n, 16, 4, 2)).astype(np.int32),
        "rect_vals": rng.rand(n, 16, 3).astype(np.float32),
        "word": rng.randint(0, 49408, (n, 17)).astype(np.int32),
    }


def probe_rtt(reps: int = 20) -> float:
    x = np.zeros((1,), np.float32)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(jax.device_put(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3)


def probe_seq(batch: dict, reps: int) -> float:
    nbytes = sum(v.nbytes for v in batch.values())
    # vary the contents per rep so no caching layer can elide the transfer
    batches = [
        {k: (v + i).astype(v.dtype) if v.dtype != np.uint8 else v
         for k, v in batch.items()}
        for i in range(reps)
    ]
    _force(jax.device_put(batches[0]))  # warm the path + compile _sum_tree
    t0 = time.perf_counter()
    puts = [jax.device_put(b) for b in batches]
    _force(puts)
    dt = time.perf_counter() - t0
    return nbytes * reps / dt / 1e6


def probe_concurrent(batch: dict, reps: int, threads: int) -> float:
    nbytes = sum(v.nbytes for v in batch.values())
    out = [None] * threads

    def put(i):
        out[i] = [jax.device_put(batch) for _ in range(reps)]

    t0 = time.perf_counter()
    ts = [threading.Thread(target=put, args=(i,)) for i in range(threads)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    _force(out)
    dt = time.perf_counter() - t0
    return nbytes * reps * threads / dt / 1e6


def probe_overlap(batch: dict, reps: int) -> dict:
    """Does an H2D put stream while a device compute chain runs?"""
    n = 2048

    @jax.jit
    def chain(x, iters):
        def body(_, x):
            return jnp.tanh(x @ x) * 0.999

        return jax.lax.fori_loop(0, iters, body, x)

    x = jax.device_put(np.random.RandomState(1).rand(n, n).astype(np.float32))
    _force(chain(x, 1))
    # size the chain to roughly match the put wall so overlap is observable
    t0 = time.perf_counter()
    _force(chain(x, 50))
    per50 = time.perf_counter() - t0

    t0 = time.perf_counter()
    puts = [jax.device_put(batch) for _ in range(reps)]
    _force(puts)
    put_wall = time.perf_counter() - t0

    iters = max(1, int(50 * put_wall / per50))
    t0 = time.perf_counter()
    _force(chain(x, iters))
    comp_wall = time.perf_counter() - t0

    done = {}

    def compute():
        t = time.perf_counter()
        _force(chain(x, iters))
        done["comp"] = time.perf_counter() - t

    th = threading.Thread(target=compute)
    t0 = time.perf_counter()
    th.start()
    puts = [jax.device_put(batch) for _ in range(reps)]
    _force(puts)
    th.join()
    both_wall = time.perf_counter() - t0
    return {
        "put_wall_s": round(put_wall, 3),
        "compute_wall_s": round(comp_wall, 3),
        "both_wall_s": round(both_wall, 3),
        "overlap_ratio": round(both_wall / max(put_wall, comp_wall), 3),
    }


def main():
    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 23.0
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    batch = make_batch(mb)
    nbytes = sum(v.nbytes for v in batch.values())
    res = {
        "platform": jax.default_backend(),
        "batch_MB": round(nbytes / 1e6, 2),
        "rtt_ms": round(probe_rtt(), 2),
        "seq_MBps": round(probe_seq(batch, reps), 1),
    }
    for t in (2, 4):
        res[f"conc{t}_MBps"] = round(probe_concurrent(batch, max(2, reps // t), t), 1)
    res.update(probe_overlap(batch, reps))
    print(json.dumps(res))


if __name__ == "__main__":
    main()
