"""Isolate the vision-tower stem / layer1 cost on the attached TPU.

Times forward+backward of (a) the space-to-depth stem, (b) the plain stem,
(c) layer1 (3 bottlenecks at 104², 64→256 ch), (d) layers2-4 for context —
each as its own jitted value_and_grad at the training batch size.  This
bounds the win available to a Pallas implicit-GEMM conv+BN rewrite
(VERDICT round-2 item #3) before building it: the kernel can at best
remove the stage's HBM traffic above one read of its input + one write of
its output, and the 4x zero-block MXU tax of the blocked s2d kernels.

Usage: python tools/bench_stem.py [batch]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


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


def main():
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import flax.linen as nn

    from crog_tpu.models.clip import ModifiedResNet

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    dtype = jnp.bfloat16
    rng = jax.random.PRNGKey(0)

    class StemOnly(ModifiedResNet):
        @nn.compact
        def __call__(self, x, train=False):  # noqa: D401
            if self.stem_s2d and x.shape[1] % 4 == 0:
                return self._stem_s2d(x, train)
            return self._stem_plain(x, train)

    def time_module(name, module, x, n=30):
        vars_ = module.init({"params": rng}, x, train=True)

        def loss_fn(params, x):
            y, mut = module.apply(
                {"params": params, "batch_stats": vars_["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )
            if isinstance(y, tuple):
                y = sum(jnp.sum(t.astype(jnp.float32) ** 2) for t in y)
            else:
                y = jnp.sum(y.astype(jnp.float32) ** 2)
            return y

        g = jax.jit(jax.value_and_grad(loss_fn))
        out = g(vars_["params"], x)
        float(jax.device_get(out[0]))
        t0 = time.perf_counter()
        for _ in range(n):
            out = g(vars_["params"], x)
        float(jax.device_get(out[0]))
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"{name:28s} {dt:8.2f} ms/step (fwd+bwd, batch {batch})")
        return dt

    x = jnp.asarray(
        np.random.RandomState(0).randn(batch, 416, 416, 3), dtype
    )
    kw = dict(layers=(3, 4, 6, 3), output_dim=1024, heads=32,
              input_resolution=416, width=64, dtype=dtype)
    t_s2d = time_module("stem s2d (current)", StemOnly(stem_s2d=True, **kw), x)
    t_plain = time_module("stem plain", StemOnly(stem_s2d=False, **kw), x)

    # layer1 in isolation: input = stem output shape
    from crog_tpu.models.clip import Bottleneck

    class Layer1(nn.Module):
        dtype: object = jnp.bfloat16

        @nn.compact
        def __call__(self, x, train=False):
            x = Bottleneck(64, 1, self.dtype, name="layer1_0")(x, train)
            x = Bottleneck(64, 1, self.dtype, name="layer1_1")(x, train)
            x = Bottleneck(64, 1, self.dtype, name="layer1_2")(x, train)
            return x

    x1 = jnp.asarray(
        np.random.RandomState(1).randn(batch, 104, 104, 64), dtype
    )
    t_l1 = time_module("layer1 (3 bottlenecks)", Layer1(), x1)

    class Layer2(nn.Module):
        dtype: object = jnp.bfloat16

        @nn.compact
        def __call__(self, x, train=False):
            x = Bottleneck(128, 2, self.dtype, name="layer2_0")(x, train)
            for i in range(1, 4):
                x = Bottleneck(128, 1, self.dtype, name=f"layer2_{i}")(x, train)
            return x

    x2 = jnp.asarray(
        np.random.RandomState(2).randn(batch, 104, 104, 256), dtype
    )
    t_l2 = time_module("layer2 (4 bottlenecks)", Layer2(), x2)

    print(f"\nstem s2d vs plain: {t_plain - t_s2d:+.2f} ms")
    print(f"stem+layer1 combined: {t_s2d + t_l1:.2f} ms "
          f"(the implicit-GEMM rewrite's addressable region)")


if __name__ == "__main__":
    main()
