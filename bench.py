"""Benchmark: CROG training throughput on the attached TPU.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

North-star (BASELINE.md): OCID-VLG img+text->grasp TRAINING samples/sec/chip.
Reference baseline: ~22 samples/s global on 2x RTX 4090 (README.md:31 derived)
= 11 samples/s/chip; vs_baseline is our per-chip rate over 11.  The
reference's number is END TO END (torch DataLoader feeding the step), so the
line carries both views:

  value / "samples/s/chip"     compute-only: full jitted train step (fwd +
                               losses + bwd + Adam + BN stats) on a synthetic
                               batch held on device, batch 24 per chip, timed
                               over steady-state steps.
  "e2e_samples_s_per_chip"     host pipeline in the loop: SyntheticOCIDVLG
                               (GraspTransforms raster + gaussian + letterbox
                               warp, the same ops the real dataset runs) ->
                               threaded DataLoader -> device_put -> train
                               step, one pass, wall clock.
  "pallas_fused_attention"     true iff the lowered train step contains the
                               Pallas custom call (the ops/attention.py:29
                               backend gate engaged — a silent XLA fallback
                               would cost the fused-attention win).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

PER_CHIP_BASELINE = 11.0  # samples/s/chip, 2x RTX 4090 -> 22 global


def _enable_compile_cache():
    """Persistent XLA compile cache — the SSG/CROG programs take tens of
    minutes to compile for the tunneled TPU; cache them across runs."""
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


def synthetic_device_batch(b):
    rng = np.random.RandomState(0)
    return {
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


def bench_eval(model, state, batch_np, sharding, n_chips):
    """Steady-state throughput of the FULL jitted eval pipeline: forward +
    bicubic upsample + per-sample inverse letterbox warp to original
    resolution + mask IoU + grasp peak detection — everything the reference
    did per sample on CPU (engine/crog_engine.py:214-261)."""
    import jax

    from crog_tpu.engine.crog_engine import make_eval_step
    from crog_tpu.ops.affine import letterbox_transform

    b = batch_np["img"].shape[0]
    _, inv = letterbox_transform((480, 640), (416, 416))
    eval_batch = {
        "img": batch_np["img"],
        "word": batch_np["word"],
        "mask": batch_np["mask"],
        "inverse": np.tile(inv.astype(np.float32)[None], (b, 1, 1)),
        "ori_size": np.tile(np.asarray([[480, 640]], np.int32), (b, 1)),
    }
    eval_batch = {k: jax.device_put(v, sharding) for k, v in eval_batch.items()}
    eval_step = make_eval_step(model, input_size=416, ori_hw=(480, 640))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    out = eval_step(variables, eval_batch)  # compile
    float(jax.device_get(out["iou"][0]))
    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        out = eval_step(variables, eval_batch)
    float(jax.device_get(out["iou"][0]))
    dt = (time.perf_counter() - t0) / iters
    return b / dt / n_chips


def check_pallas_engaged(train_step, state, batch, key) -> bool:
    """Lower (no compile) the jitted step and look for the TPU Pallas custom
    call; on TPU the fused attention MUST be present (ops/attention.py gate)."""
    import jax

    dense = {k: batch[k] for k in train_step._dense_keys if k in batch}
    txt = train_step._jitted.lower(state, dense, key).as_text()
    return ("tpu_custom_call" in txt) or ("pallas" in txt.lower())


def _iqr(xs):
    lo, hi = np.percentile(np.asarray(xs, np.float64), [25, 75])
    return [round(float(lo), 1), round(float(hi), 1)]


def wire_diagnostics(dense, sharding, b, n_chips):
    """Wire bounds the e2e measurements must bracket (VERDICT r04 weak #1 /
    next #4): RTT separated from bandwidth, and BOTH sequential and
    2-thread-concurrent streaming rates — device_put is async, so the
    loader's single put-stage thread still keeps multiple transfers in
    flight, and on this tunnel the concurrent rate is the achievable one.
    The force-reduction's own device time is measured on resident arrays
    and subtracted so it doesn't deflate the bandwidth estimate."""
    import threading

    import jax
    import jax.numpy as jnp

    nbytes = sum(v.nbytes for v in dense.values())
    reps = int(os.environ.get("BENCH_WIRE_REPS", "6"))
    force = jax.jit(
        lambda tree: sum(jnp.sum(v.astype(jnp.float32))
                         for v in jax.tree.leaves(tree))
    )
    resident = jax.device_put(dense, sharding)
    # Pre-compile + calibrate the force reduction for the EXACT pytree
    # structures timed below (a list of `reps` trees, and a 2-list nest).
    # A different structure is a different jit cache key; letting the
    # timed region compile once put the compile in the measurement AND in
    # the subtracted calibration, which overshot and clamped dt to 1e-6
    # (the 8e7 "MB/s" readings in early r5 runs).
    def _calibrated_force_cost(tree):
        float(jax.device_get(force(tree)))  # compile + warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(jax.device_get(force(tree)))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    seq_force_s = _calibrated_force_cost([resident] * reps)
    conc_force_s = _calibrated_force_cost([[resident] * reps] * 2)

    x = np.zeros((1,), np.float32)
    rtts = []
    for _ in range(10):
        t0 = time.perf_counter()
        jax.device_get(jax.device_put(x))
        rtts.append(time.perf_counter() - t0)
    rtt_ms = float(np.median(rtts) * 1e3)

    t0 = time.perf_counter()
    puts = [jax.device_put(dense, sharding) for _ in range(reps)]
    float(jax.device_get(force(puts)))
    dt = max(time.perf_counter() - t0 - seq_force_s, 1e-3)
    seq_mbps = nbytes * reps / dt / 1e6

    out = [None, None]

    def put(i):
        out[i] = [jax.device_put(dense, sharding) for _ in range(reps)]

    ts = [threading.Thread(target=put, args=(i,)) for i in range(2)]
    t0 = time.perf_counter()
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    float(jax.device_get(force(out)))
    dt = max(time.perf_counter() - t0 - conc_force_s, 1e-3)
    conc_mbps = nbytes * reps * 2 / dt / 1e6

    best = max(seq_mbps, conc_mbps)
    return {
        "batch_MB": round(nbytes / 1e6, 2),
        "wire_rtt_ms": round(rtt_ms, 1),
        "wire_stream_MBps": round(seq_mbps, 1),
        "wire_conc2_MBps": round(conc_mbps, 1),
        "wire_bound_sps": round(best * 1e6 / (nbytes / b) / n_chips, 1),
    }


def _make_wire_probe(dense, sharding):
    """A cheap (2-put) calibrated bandwidth probe for interleaving with
    e2e passes.  Returns a closure yielding MB/s per call."""
    import jax
    import jax.numpy as jnp

    nbytes = sum(v.nbytes for v in dense.values())
    force = jax.jit(
        lambda tree: sum(jnp.sum(v.astype(jnp.float32))
                         for v in jax.tree.leaves(tree))
    )
    resident = jax.device_put(dense, sharding)
    float(jax.device_get(force([resident] * 2)))  # compile + warm
    costs = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jax.device_get(force([resident] * 2)))
        costs.append(time.perf_counter() - t0)
    force_s = float(np.median(costs))

    def probe():
        t0 = time.perf_counter()
        puts = [jax.device_put(dense, sharding) for _ in range(2)]
        float(jax.device_get(force(puts)))
        dt = max(time.perf_counter() - t0 - force_s, 1e-3)
        return nbytes * 2 / dt / 1e6

    return probe


def bench_e2e(train_step, state, key, per_chip_batch, n_chips, sharding):
    """Host pipeline feeding the jitted step, median + IQR over N passes
    (BENCH_E2E_PASSES, default 5 — the shared 1-core host and the tunnel
    swing individual passes 2-4x; VERDICT r04 next #4 asks for enough
    passes to converge and for outliers to be explained, so each pass
    records its per-batch step times and slow passes ship a breakdown).

    Returns (cold, warm, ctx): cold = full per-sample host pipeline in the
    loop (epoch-1 semantics, fresh SampleCache per pass); warm = samples
    served from a populated SampleCache (what epochs 2..N of a real run see
    — the CROG pipeline is deterministic, so this is exact).  ctx carries
    the wire bounds from ``wire_diagnostics``.
    """
    import jax

    from crog_tpu.data.cache import SampleCache
    from crog_tpu.data.loader import DataLoader, device_put_crog
    from crog_tpu.data.synthetic import SyntheticOCIDVLG

    b = per_chip_batch * n_chips
    n_batches = int(os.environ.get("BENCH_E2E_BATCHES", "12"))
    n_passes = int(os.environ.get("BENCH_E2E_PASSES", "5"))
    # BENCH_WIRE: rawlb (host-letterboxed uint8 image + device-side
    # raster+blur, fewest wire bytes, the default), raw (unwarped uint8,
    # all warps on device), compact (uint8 planes, host warp), legacy
    # (float32 host pipeline)
    wire = os.environ.get("BENCH_WIRE", "rawlb")
    base = SyntheticOCIDVLG(
        num_samples=b * (n_batches + 2), split="train",
        compact=wire == "compact",
        raw={"raw": True, "rawlb": "lb"}.get(wire, False),
    )
    put_fn = lambda batch: device_put_crog(batch, sharding)

    def make_loader(ds):
        return DataLoader(
            ds, batch_size=b, shuffle=True, drop_last=True,
            num_workers=max(4, os.cpu_count() or 1),
            device_put_fn=put_fn, prefetch=2,
        )

    def run_pass(loader, state, epoch):
        # the jitted step DONATES state, so it must be threaded through and
        # returned (the caller's old reference is a deleted buffer)
        loader.set_epoch(epoch)
        it = iter(loader)
        for _ in range(2):
            state, metrics = train_step(state, next(it), key)
        float(jax.device_get(metrics["loss"]))
        t0 = time.perf_counter()
        tb = t0
        n = 0
        batch_times = []
        for batch in it:
            state, metrics = train_step(state, batch, key)
            n += batch["word"].shape[0]
            batch_times.append(time.perf_counter() - tb)
            tb = time.perf_counter()
            if n >= n_batches * b:
                break
        loss = float(jax.device_get(metrics["loss"]))
        dt = time.perf_counter() - t0
        # CLOSE the iterator: its producer thread keeps prefetching (and
        # device_put-ing over the wire) after the early break otherwise,
        # competing with whatever is measured next
        it.close()
        assert np.isfinite(loss), f"non-finite e2e loss {loss}"
        return state, n / dt / n_chips, batch_times

    colds, warms, slow_detail = [], [], {}
    warm_ds = SampleCache(base)
    cold_times, warm_times = [], []
    for p in range(n_passes):
        state, r, bt = run_pass(make_loader(SampleCache(base)), state, p)
        colds.append(r)
        cold_times.append(bt)
    warm_loader = make_loader(warm_ds)
    state, _, _ = run_pass(warm_loader, state, 0)  # populate the cache
    # Wire-bandwidth probe run ADJACENT to each warm pass: the tunnel's
    # bandwidth swings 2-4x minute-to-minute on this shared box, so a
    # single bound measured after the fact need not bracket passes measured
    # minutes earlier (r04 warm 45.4 vs bound 38.5; r05 97 vs 80).  A
    # 2-put probe right after each pass gives a contemporaneous bound.
    sample = next(_host_only_batches(warm_ds, b, 1))
    dense = {k: v for k, v in sample.items() if isinstance(v, np.ndarray)}
    probe = _make_wire_probe(dense, sharding)
    probe_mbps = []
    for p in range(n_passes):
        state, r, bt = run_pass(warm_loader, state, p + 1)
        warms.append(r)
        warm_times.append(bt)
        probe_mbps.append(probe())
    cold, warm = float(np.median(colds)), float(np.median(warms))

    # outlier forensics: a pass at <0.5x the median gets its per-batch step
    # times recorded so the cause (one stalled batch vs uniform slowdown)
    # is visible in the JSON
    for name, rates, times in (
        ("cold", colds, cold_times), ("warm", warms, warm_times),
    ):
        med = float(np.median(rates))
        for i, r in enumerate(rates):
            if r < 0.5 * med:
                slow_detail[f"{name}_pass{i}_batch_s"] = [
                    round(t, 2) for t in times[i]
                ]

    t0 = time.perf_counter()
    host_n = 0
    for batch in _host_only_batches(base, b, 4):  # UNcached rate
        host_n += batch["word"].shape[0]
    host_rate = host_n / (time.perf_counter() - t0) / n_chips

    ctx = {
        "host_pipeline_samples_s": round(host_rate, 2),
        "wire_format": wire,
        "e2e_cold_passes": [round(c, 1) for c in colds],
        "e2e_warm_passes": [round(w, 1) for w in warms],
        "e2e_cold_iqr": _iqr(colds),
        "e2e_warm_iqr": _iqr(warms),
        **wire_diagnostics(dense, sharding, b, n_chips),
        **slow_detail,
    }
    per_sample_mb = ctx["batch_MB"] / b
    ctx["wire_probe_MBps_per_warm_pass"] = [round(m, 1) for m in probe_mbps]
    ctx["wire_bound_sps_range"] = [
        round(min(probe_mbps) / per_sample_mb / n_chips, 1),
        round(max(probe_mbps) / per_sample_mb / n_chips, 1),
    ]
    return cold, warm, ctx


def _host_only_batches(ds, b, n_batches):
    from crog_tpu.data.loader import collate_crog

    for i in range(n_batches):
        yield collate_crog([ds[(i * b + j) % len(ds)] for j in range(b)])


def synthetic_ssg_batch(b, s=544, max_objs=24, num_classes=32):
    """Device-held synthetic batch in the collate_ssg layout (RGB-D)."""
    rng = np.random.RandomState(0)
    n_obj = 6
    masks = np.zeros((b, max_objs, s, s), np.float32)
    boxes = np.zeros((b, max_objs, 4), np.float32)
    for i in range(b):
        for m in range(n_obj):
            x0, y0 = rng.randint(0, s - 120, 2)
            w, h = rng.randint(40, 120, 2)
            masks[i, m, y0 : y0 + h, x0 : x0 + w] = 1.0
            boxes[i, m] = (x0 / s, y0 / s, min(x0 + w, s) / s, min(y0 + h, s) / s)
    valid = np.zeros((b, max_objs), bool)
    valid[:, :n_obj] = True
    qua = masks * rng.rand(b, max_objs, 1, 1).astype(np.float32)
    return {
        "img": rng.rand(b, s, s, 4).astype(np.float32),
        "boxes": boxes,
        "labels": rng.randint(1, num_classes, (b, max_objs)).astype(np.int32),
        "obj_valid": valid,
        "ins_masks": masks,
        "grasp_qua": qua,
        "grasp_sin": (masks * 0.3).astype(np.float32),
        "grasp_cos": (masks * 0.9).astype(np.float32),
        "grasp_wid": (masks * 0.5).astype(np.float32),
    }


def bench_ssg(n_chips, sharding, per_chip_batch=None):
    """SSG (second model family, reference train_ssg.py / model/ssg.py:208-529)
    training throughput: full-size R50 FPN + ProtoNet + 8-term loss at 544
    RGB-D, jitted step on a device-held synthetic batch."""
    import jax
    import jax.numpy as jnp

    from crog_tpu.engine.optim import make_optimizer
    from crog_tpu.engine.ssg_engine import (
        create_ssg_train_state,
        make_ssg_train_step,
    )
    from crog_tpu.models.ssg import SSG
    from crog_tpu.parallel.mesh import replicate, get_mesh

    per_chip = per_chip_batch or int(os.environ.get("BENCH_SSG_BATCH", "8"))
    b = per_chip * n_chips
    model = SSG(dtype=jnp.bfloat16)
    batch_np = synthetic_ssg_batch(b)
    batch = jax.device_put(batch_np, sharding)
    params_shape = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, 544, 544, 4)), train=True,
        )
    )
    tx = make_optimizer(
        params_shape["params"], base_lr=3e-4, lr_multi=1.0,
        milestones=[100], lr_decay=0.95, steps_per_epoch=1000,
        weight_decay=5e-4, optimizer="adamw",
    )
    state = create_ssg_train_state(
        model, tx, batch["img"][:1], jax.random.PRNGKey(0)
    )
    mesh = get_mesh()
    state = state.replace(
        params=replicate(state.params, mesh),
        batch_stats=replicate(state.batch_stats, mesh),
        opt_state=replicate(state.opt_state, mesh),
    )
    step = make_ssg_train_step(
        model, tx, model.anchors(), {"masks_to_train": 100}
    )
    key = jax.random.PRNGKey(2)
    for i in range(3):
        state, metrics = step(state, batch, jax.random.fold_in(key, i))
    loss = float(jax.device_get(metrics["loss"]))
    assert np.isfinite(loss), f"non-finite SSG loss {loss}"
    iters = 10
    times = []
    for w in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            state, metrics = step(
                state, batch, jax.random.fold_in(key, 50 + w * iters + i)
            )
        float(jax.device_get(metrics["loss"]))
        times.append((time.perf_counter() - t0) / iters)
    dt = sorted(times)[1]
    return b / dt / n_chips


def bench_ssg_eval(n_chips, batch: int | None = None):
    """SSG eval-path throughput: batched forward + VMAPPED jitted Fast-NMS
    post-processing + device grasp peaks — the whole per-image eval stack
    (reference engine/ssg_engine.py:119-180, utils/grasp_eval.py:100-221; the
    reference is batch-1 only by construction, round-5 batched the post via
    models/ssg_eval._post_one vmap).  Returns (batched_sps, b1_sps, ctx):
    b1_sps is the reference-shaped batch-1 number kept for comparability."""
    import jax
    import jax.numpy as jnp

    from crog_tpu.engine.ssg_engine import make_ssg_eval_fwd
    from crog_tpu.models.ssg import SSG
    from crog_tpu.models.ssg_eval import make_ssg_post_processing

    # batch sweep on the real chip (2026-08-21): 8 -> 178/s, 16 -> 202/s,
    # 24 -> 219/s; the eval forward has no fault history, so default to 24
    batch = batch or int(os.environ.get("BENCH_SSG_EVAL_BATCH", "24"))
    # max_detections caps the [B, K, 480, 640] f32 x5 assembled-mask
    # transient (16 at batch 8 = ~590 MB); the reference's 100 cap only
    # matters when >16 detections clear the 0.3 score keep
    max_det = int(os.environ.get("BENCH_SSG_EVAL_DETS", "16"))
    model = SSG(dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 544, 544, 4)), train=False,
    )
    fwd = make_ssg_eval_fwd(model)

    def measure(b, batched):
        img = jnp.asarray(rng.rand(b, 544, 544, 4), jnp.float32)
        post = make_ssg_post_processing(
            model.anchors(), ori_hw=(480, 640), batched=batched,
            max_detections=max_det if batched else 100,
        )
        out = post(fwd(variables, {"img": img})[0])  # compile
        float(jax.device_get(out["grasp_rects"].sum()))
        iters = max(4, 32 // b)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = post(fwd(variables, {"img": img})[0])
            float(jax.device_get(out["grasp_rects"].sum()))
            times.append((time.perf_counter() - t0) / iters)
        return b / sorted(times)[1] / n_chips

    b1 = measure(1, False)
    bn = measure(batch, True)
    return bn, b1, {"ssg_eval_batch": batch, "ssg_eval_max_dets": max_det}


def bench_ssg_e2e(n_chips, sharding, per_chip=None):
    """SSG end-to-end: the OCIDGrasp-layout host pipeline (DataAugmentor in
    the loop) feeding the jitted train step over the raw SSG wire format
    (crog_tpu.data.ssg_rawwire — device-side distort/mirror/pad/resize +
    per-instance raster; ~3 MB/sample on the wire vs ~150 MB dense).

    Cold-path only: SSG augmentation is random per epoch, so SampleCache
    does not apply (data/cache.py refuses it).  Returns (e2e, ctx)."""
    import jax
    import jax.numpy as jnp

    from crog_tpu.data.loader import DataLoader, device_put_crog
    from crog_tpu.data.ssg_rawwire import collate_ssg_raw
    from crog_tpu.data.synthetic_ssg import SyntheticOCIDGraspFrames
    from crog_tpu.engine.optim import make_optimizer
    from crog_tpu.engine.ssg_engine import (
        create_ssg_train_state,
        make_ssg_train_step,
    )
    from crog_tpu.models.ssg import SSG
    from crog_tpu.parallel.mesh import get_mesh, replicate

    per_chip = per_chip or int(os.environ.get("BENCH_SSG_E2E_BATCH", "4"))
    b = per_chip * n_chips
    n_batches = int(os.environ.get("BENCH_SSG_E2E_BATCHES", "8"))
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
    step = make_ssg_train_step(
        model, tx, model.anchors(), {"masks_to_train": 100}
    )
    key = jax.random.PRNGKey(3)

    def make_loader():
        return DataLoader(
            ds, batch_size=b, shuffle=True, drop_last=True,
            num_workers=max(4, os.cpu_count() or 1),
            collate_fn=collate_ssg_raw,
            device_put_fn=lambda batch: device_put_crog(batch, sharding),
            prefetch=2,
        )

    n_passes = int(os.environ.get("BENCH_SSG_E2E_PASSES", "5"))
    from crog_tpu.data.ssg_rawwire import collate_ssg_raw as _collate

    wire_batch = _collate([ds[i] for i in range(b)])
    dense = {
        k: v for k, v in wire_batch.items() if isinstance(v, np.ndarray)
    }
    probe = _make_wire_probe(dense, sharding)
    probe_mbps = []
    rates, pass_times = [], []
    for p in range(n_passes):
        loader = make_loader()
        loader.set_epoch(p)
        it = iter(loader)
        state, metrics = step(state, next(it), key)  # warm/compile
        float(jax.device_get(metrics["loss"]))
        t0 = time.perf_counter()
        tb = t0
        n = 0
        batch_times = []
        for batch in it:
            state, metrics = step(state, batch, key)
            n += batch["aug"].shape[0]
            batch_times.append(time.perf_counter() - tb)
            tb = time.perf_counter()
        loss = float(jax.device_get(metrics["loss"]))
        dt = time.perf_counter() - t0
        assert np.isfinite(loss), f"non-finite SSG e2e loss {loss}"
        rates.append(n / dt / n_chips)
        pass_times.append(batch_times)
        probe_mbps.append(probe())

    # context: raw-wire host production rate vs the legacy host pipeline's
    # (the number the raw wire is beating — per-instance raster + blur +
    # full-frame numpy HSV distort + per-plane resizes on host)
    t0 = time.perf_counter()
    for i in range(2 * b):
        _ = ds[i]
    host_raw = 2 * b / (time.perf_counter() - t0) / n_chips
    ds_legacy = SyntheticOCIDGraspFrames(
        num_samples=8, split="training_0", raw=False
    )
    t0 = time.perf_counter()
    for i in range(8):
        _ = ds_legacy[i]
    host_legacy = 8 / (time.perf_counter() - t0) / n_chips
    wire_mb = sum(v.nbytes for v in dense.values()) / 1e6 / b
    ctx = {
        "ssg_e2e_passes": [round(r, 1) for r in rates],
        "ssg_e2e_iqr": _iqr(rates),
        "ssg_host_raw_samples_s": round(host_raw, 2),
        "ssg_host_legacy_samples_s": round(host_legacy, 2),
        "ssg_wire_MB_per_sample": round(wire_mb, 2),
        "ssg_wire_probe_MBps_per_pass": [round(m, 1) for m in probe_mbps],
        "ssg_wire_bound_sps_range": [
            round(min(probe_mbps) / wire_mb / n_chips, 1),
            round(max(probe_mbps) / wire_mb / n_chips, 1),
        ],
    }
    wd = wire_diagnostics(dense, sharding, b, n_chips)
    ctx.update({f"ssg_{k}": v for k, v in wd.items()})
    med = float(np.median(rates))
    for i, r in enumerate(rates):
        if r < 0.5 * med:
            ctx[f"ssg_pass{i}_batch_s"] = [
                round(t, 2) for t in pass_times[i]
            ]
    return med, ctx


def _require_live_backend():
    """Fail FAST with a diagnostic JSON line if the TPU backend never
    initializes: the tunneled v5e worker has a documented wedge state
    (docs/ssg_worker_fault.md) where jax.devices() hangs indefinitely in
    fresh processes — better one JSON error line than a silent hang that
    times out the whole bench harness."""
    import threading

    seconds = float(os.environ.get("BENCH_INIT_TIMEOUT_S", "900"))
    ok = threading.Event()

    def _init():
        import jax
        import jax.numpy as jnp

        jax.devices()
        # enumeration alone is not proof of life: one observed wedge phase
        # enumerates devices in ~8s but hangs every compile/execute RPC —
        # force one tiny program through
        float(jax.device_get(jnp.ones((8, 8)).sum()))
        ok.set()

    t = threading.Thread(target=_init, daemon=True)
    t.start()
    t.join(seconds)
    if not ok.is_set():
        print(json.dumps({
            "metric": "crog_train_throughput_per_chip",
            "value": 0.0, "unit": "samples/s/chip", "vs_baseline": 0.0,
            "error": f"TPU backend init did not complete in {seconds:.0f}s "
                     "— the remote v5e worker is in its documented wedge "
                     "state (docs/ssg_worker_fault.md); remote-side "
                     "restart required",
        }), flush=True)
        os._exit(1)


def main_ssg():
    """Standalone SSG bench (BENCH_MODEL=ssg): one JSON line with train,
    eval and e2e numbers."""
    _require_live_backend()
    import jax

    from crog_tpu.parallel.mesh import data_sharding, get_mesh

    _enable_compile_cache()

    n_chips = jax.device_count()
    sharding = data_sharding(get_mesh())

    t0 = time.perf_counter()

    def _stage(name):  # stage timing on stderr; the JSON line stays clean
        print(f"[bench ssg] {name} done at +{time.perf_counter() - t0:.0f}s",
              file=sys.stderr, flush=True)

    out = {
        "metric": "ssg_train_throughput_per_chip",
        "value": round(bench_ssg(n_chips, sharding), 2),
        "unit": "samples/s/chip",
    }
    _stage("train")
    if os.environ.get("BENCH_SSG_EVAL", "1") == "1":
        bn, b1, ectx = bench_ssg_eval(n_chips)
        out["ssg_eval_samples_s_per_chip"] = round(bn, 2)
        out["ssg_eval_b1_samples_s_per_chip"] = round(b1, 2)
        out.update(ectx)
        _stage("eval")
    # the raw-wire unpack runs as its own device program (see
    # make_ssg_train_step's docstring: the FUSED unpack+step binary
    # hard-crashed the remote v5e worker at batch 8; split, the 2026-08-19
    # bisect ran both clean back-to-back at batch 8, but the sustained e2e
    # loop STILL faulted the worker at batch 8 in the full-bench run
    # (2026-08-20) — the fault is size-dependent and flaky, so the default
    # batch stays at the measured-safe size and the whole section is fenced:
    # a worker crash here must not take the SSG train/eval numbers down.
    if os.environ.get("BENCH_SSG_E2E", "1") == "1":
        try:
            e2e, ctx = bench_ssg_e2e(n_chips, sharding)
            out["ssg_e2e_samples_s_per_chip"] = round(e2e, 2)
            out.update(ctx)
            _stage("e2e")
        except Exception as e:  # noqa: BLE001 — worker faults surface as
            # JaxRuntimeError at the forcing device_get; record and move on
            out["ssg_e2e_error"] = f"{type(e).__name__}: {e}"[:300]
            _stage("e2e FAILED")
    print(json.dumps(out))


def main():
    _require_live_backend()
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

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

    # batch 24 fits without remat since the dynconv rewrite; BENCH_REMAT:
    # 0 off, 1 full bottleneck remat, sel selective (save conv outs only)
    remat = {"0": False, "1": True, "sel": "selective"}[
        os.environ.get("BENCH_REMAT", "0")
    ]
    model = CROG(dtype=jnp.bfloat16, remat=remat)
    batch_np = synthetic_device_batch(b)
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
    pallas_ok = check_pallas_engaged(train_step, state, batch, key)
    if jax.default_backend() == "tpu":
        assert pallas_ok, (
            "fused Pallas attention did NOT engage in the lowered train step "
            "(ops/attention.py gate fell back to plain XLA attention)"
        )

    # warmup / compile; device_get forces real completion (on the axon
    # remote platform block_until_ready returns before execution finishes,
    # so it cannot be used for timing)
    for i in range(3):
        state, metrics = train_step(state, batch, jax.random.fold_in(key, i))
    float(jax.device_get(metrics["loss"]))

    # steady-state wall clock over a step chain (each step consumes the
    # previous state, so the chain serializes on device) with one forced
    # transfer per window; report the MEDIAN of 3 windows (the host is
    # shared/1-core — a single window can catch a scheduling hiccup)
    iters = 20
    times = []
    for w in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            state, metrics = train_step(
                state, batch, jax.random.fold_in(key, 100 + w * iters + i)
            )
        loss = float(jax.device_get(metrics["loss"]))
        times.append((time.perf_counter() - t0) / iters)
        assert np.isfinite(loss), f"non-finite training loss {loss}"
    dt = sorted(times)[1]

    global_sps = b / dt
    per_chip = global_sps / n_chips

    eval_per_chip = None
    if os.environ.get("BENCH_EVAL", "1") == "1":
        eval_per_chip = bench_eval(model, state, batch_np, sharding, n_chips)

    e2e_per_chip = e2e_warm = e2e_ctx = None
    if os.environ.get("BENCH_E2E", "1") == "1":
        e2e_per_chip, e2e_warm, e2e_ctx = bench_e2e(
            train_step, state, key, per_chip_batch, n_chips, sharding
        )

    ssg_per_chip = None
    ssg_extra = {}
    if os.environ.get("BENCH_SSG", "1") == "1":
        # SSG runs in a SUBPROCESS: a worker fault (e.g. OOM at an
        # oversized batch) must not take the CROG numbers down with it
        import subprocess
        import sys

        env = dict(os.environ, BENCH_MODEL="ssg")
        ssg_extra = {}
        # fully fenced (ADVICE r04): a hang hits the timeout and a worker
        # fault exits nonzero — either way the CROG JSON line still prints,
        # with the failure recorded instead of the SSG numbers
        try:
            # stderr inherited: the SSG bench prints stage timings there
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                stdout=subprocess.PIPE, text=True,
                timeout=int(os.environ.get("BENCH_SSG_TIMEOUT", "3600")),
            )
            for line in proc.stdout.splitlines():
                try:
                    d = json.loads(line)
                    ssg_per_chip = d["value"]
                    ssg_extra = {
                        k: v for k, v in d.items()
                        if k not in ("metric", "value", "unit")
                    }
                    break
                except (ValueError, KeyError):
                    continue
            if ssg_per_chip is None:
                ssg_extra = {
                    "ssg_error": f"subprocess exit {proc.returncode}, "
                    f"no JSON line in stdout"
                }
        except subprocess.TimeoutExpired:
            ssg_extra = {"ssg_error": "subprocess timeout"}

    out = {
        "metric": "crog_train_throughput_per_chip",
        "value": round(per_chip, 2),
        "unit": "samples/s/chip",
        "vs_baseline": round(per_chip / PER_CHIP_BASELINE, 3),
        "pallas_fused_attention": bool(pallas_ok),
    }
    if eval_per_chip is not None:
        out["eval_samples_s_per_chip"] = round(eval_per_chip, 2)
    if e2e_per_chip is not None:
        out["e2e_samples_s_per_chip"] = round(e2e_per_chip, 2)
        out["e2e_vs_baseline"] = round(e2e_per_chip / PER_CHIP_BASELINE, 3)
        out["e2e_warm_samples_s_per_chip"] = round(e2e_warm, 2)
        out["host_cores"] = os.cpu_count()
        out.update(e2e_ctx)
    if ssg_per_chip is not None:
        out["ssg_samples_s_per_chip"] = round(ssg_per_chip, 2)
    out.update(ssg_extra)
    print(json.dumps(out))


if __name__ == "__main__":
    if os.environ.get("BENCH_MODEL") == "ssg":
        main_ssg()
    else:
        main()
