"""crog_tpu — a TPU-native (JAX/XLA/Pallas) framework for language-guided robot
grasp synthesis, providing the full capability surface of HilbertXu/CROG
(CoRL 2023) re-designed TPU-first.

Two model families:
  * CROG — CLIP-RN50 referring grasp synthesis (image + text -> instance mask
    + 4-DoF pixel-wise grasp maps).  Reference: /root/reference/model/crog.py.
  * SSG  — vision-only YOLACT-style instance grasp synthesis.
    Reference: /root/reference/model/ssg.py.

Design: pure-functional flax modules, jit-compiled train/eval steps, data
parallelism via jax.sharding over a device Mesh (XLA inserts the collectives
that NCCL provided in the reference), bf16 compute on the MXU, orbax
checkpoints, and a host-side input pipeline with device prefetch.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("CROG_PLATFORM"):
    # subprocess platform pin: this environment fixes jax_platforms=axon,cpu
    # at the config level, so the JAX_PLATFORMS env var alone is IGNORED —
    # only an in-process config update sticks (tests/conftest.py does it for
    # pytest; CROG_PLATFORM does it for CLI subprocesses, e.g. the realdata
    # drill's fixture smoke which must not compile on the tunneled TPU)
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["CROG_PLATFORM"])

from crog_tpu.config import CfgNode, load_cfg_from_cfg_file, merge_cfg_from_list  # noqa: F401
