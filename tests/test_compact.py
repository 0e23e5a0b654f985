"""Compact uint8 wire format: host pack <-> device unpack equivalence.

The compact path (crog_tpu.data.compact) must reproduce the legacy float
pipeline: /255 + CLIP normalization bit-comparable, sin/cos within 1 ulp
(transcendental libm vs XLA).  Also covers the process-pool loader mode.
"""

import numpy as np

import jax
import jax.numpy as jnp

from crog_tpu.data.compact import unpack_compact
from crog_tpu.data.loader import DataLoader, collate_crog
from crog_tpu.data.synthetic import SyntheticOCIDVLG


def _pair(n=3, input_size=128):
    legacy = SyntheticOCIDVLG(num_samples=8, input_size=input_size)
    compact = SyntheticOCIDVLG(num_samples=8, input_size=input_size, compact=True)
    return [legacy[i] for i in range(n)], [compact[i] for i in range(n)]


def test_unpack_matches_legacy_preprocess():
    legacy, compact = _pair()
    cb = collate_crog(compact)
    ub = jax.jit(unpack_compact)({
        k: jnp.asarray(v) for k, v in cb.items() if isinstance(v, np.ndarray)
    })
    lb = collate_crog(legacy)
    # every conversion is a 256-entry host-computed table -> BIT-EXACT
    for k in ("mask", "qua", "wid", "img", "ang", "sin", "cos"):
        np.testing.assert_array_equal(np.asarray(ub[k]), lb[k], err_msg=k)
    # eval fields pass through
    np.testing.assert_array_equal(np.asarray(ub["inverse"]), lb["inverse"])
    np.testing.assert_array_equal(np.asarray(ub["ori_size"]), lb["ori_size"])


def test_compact_batch_is_small():
    _, compact = _pair(n=2)
    cb = collate_crog(compact)
    dense = sum(
        v.nbytes for v in cb.values() if isinstance(v, np.ndarray)
    )
    lb = collate_crog(_pair(n=2)[0])
    legacy = sum(v.nbytes for v in lb.values() if isinstance(v, np.ndarray))
    assert dense < legacy / 4.5, (dense, legacy)


def test_process_pool_loader_matches_threads():
    ds = SyntheticOCIDVLG(num_samples=8, input_size=128, compact=True)
    lt = DataLoader(ds, batch_size=4, shuffle=False, num_workers=2)
    lp = DataLoader(ds, batch_size=4, shuffle=False, num_procs=2)
    for bt, bp in zip(lt, lp):
        np.testing.assert_array_equal(bt["img_u8"], bp["img_u8"])
        np.testing.assert_array_equal(bt["planes_u8"], bp["planes_u8"])
        np.testing.assert_array_equal(bt["word"], bp["word"])
