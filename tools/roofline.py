"""Single-image latency roofline: what does the hardware allow, and how far
is the measured latency from it?

BASELINE.md asks for "speed-of-light single-image inference"; a latency
number without a bound is unfalsifiable.  This tool lowers the batch-1
CROG eval forward (the same program tools/latency.py times), reads XLA's
compiled cost analysis (flops + bytes accessed), and prints

    latency_bound_ms = max(flops / peak_flops, bytes / hbm_bw)

against the measured latency.  Batch-1 inference on a big-matmul chip is
almost always HBM-bound (arithmetic intensity collapses when B=1: every
weight byte is read for one sample), so the bytes term usually dominates —
the gap between bound and measurement is then dispatch overhead + kernel
tails, not missing FLOPs.

Peak numbers (TPU v5e, public spec): 197 TFLOP/s bf16, 819 GB/s HBM.
Override with --peak-tflops / --hbm-gbps for other chips.

Usage: python tools/roofline.py [--config config/OCID-VLG/crog_multiple_r50.yaml]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from crog_tpu.config import load_cfg_from_cfg_file, merge_cfg_from_list
    from crog_tpu.models.crog import build_crog

    parser = argparse.ArgumentParser(description="CROG latency roofline")
    parser.add_argument(
        "--config", default="config/OCID-VLG/crog_multiple_r50.yaml"
    )
    parser.add_argument("--peak-tflops", type=float, default=197.0)
    parser.add_argument("--hbm-gbps", type=float, default=819.0)
    parser.add_argument("--opts", default=None, nargs=argparse.REMAINDER)
    a = parser.parse_args()
    cfg = load_cfg_from_cfg_file(a.config)
    if a.opts:
        cfg = merge_cfg_from_list(cfg, a.opts)

    model, _ = build_crog(cfg)
    rng = np.random.RandomState(0)
    img = jnp.asarray(
        rng.randn(1, cfg.input_size, cfg.input_size, 3).astype(np.float32)
    )
    word = jnp.asarray(rng.randint(0, 4096, (1, cfg.word_len)).astype(np.int32))
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)}, img, word, train=False
    )
    compiled = (
        jax.jit(lambda v, i, w: model.apply(v, i, w, train=False))
        .lower(variables, img, word)
        .compile()
    )
    costs = compiled.cost_analysis()
    if isinstance(costs, list):  # older jax returns one dict per device
        costs = costs[0]
    flops = float(costs.get("flops", 0.0))
    bytes_ = float(costs.get("bytes accessed", 0.0))
    param_bytes = sum(
        int(np.prod(x.shape)) * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(variables)
    )

    t_flops_ms = flops / (a.peak_tflops * 1e12) * 1e3
    t_bytes_ms = bytes_ / (a.hbm_gbps * 1e9) * 1e3
    bound_ms = max(t_flops_ms, t_bytes_ms)
    print(f"device: {jax.devices()[0].device_kind} ({jax.devices()[0].platform})")
    print(f"flops (compiled, B=1 fwd): {flops / 1e9:.2f} GFLOP")
    print(f"bytes accessed (compiled): {bytes_ / 1e6:.1f} MB "
          f"(params alone: {param_bytes / 1e6:.1f} MB)")
    print(f"arithmetic intensity: {flops / max(bytes_, 1):.1f} FLOP/byte "
          f"(roofline knee at {a.peak_tflops * 1e12 / (a.hbm_gbps * 1e9):.0f})")
    print(f"t_flops = {t_flops_ms:.3f} ms   t_bytes = {t_bytes_ms:.3f} ms")
    print(f"latency bound = {bound_ms:.3f} ms "
          f"({'HBM' if t_bytes_ms >= t_flops_ms else 'MXU'}-bound)")
    print("measure actual latency with: python tools/latency.py")


if __name__ == "__main__":
    main()
