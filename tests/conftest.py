"""Test configuration: force a virtual 8-device CPU platform so data-parallel
sharding paths are exercised without TPU hardware.

Note: this environment pins ``jax_platforms`` to the axon TPU tunnel, so the
JAX_PLATFORMS env var alone is not enough — we override the config after
import (before any backend is initialized)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: XLA-CPU compiles of the partitioned train
# step take minutes on this host; cache them across pytest runs.
_CACHE = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
