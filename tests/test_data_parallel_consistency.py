"""Data-parallel semantics: a batch sharded over the 8-device mesh must
compute the same results as the unsharded computation — the DDP +
SyncBatchNorm contract the reference built from NCCL (train_crog.py:113-156).

Full train-mode CROG at random init amplifies reduction-order noise by ~1e4
(measured), so elementwise equality is asserted where it is meaningful:
eval-mode forward, per-module train-mode forwards, and BatchNorm GLOBAL batch
statistics (the SyncBN guarantee itself)."""

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from crog_tpu.models.crog import CROG
from crog_tpu.parallel.mesh import data_sharding, get_mesh, replicate
import pytest

pytestmark = pytest.mark.slow

SMALL = dict(
    input_resolution=64,
    vision_layers=(1, 1, 1, 1),
    transformer_layers=1,
    num_layers=1,
    dtype=jnp.float32,
)


def test_eval_forward_sharded_equals_unsharded():
    assert jax.device_count() >= 8
    mesh = get_mesh()
    model = CROG(**SMALL)
    rng = np.random.RandomState(0)
    b = 8
    img = rng.randn(b, 64, 64, 3).astype(np.float32) * 0.3
    word = np.zeros((b, 17), np.int32)
    word[:, 0] = 49406
    word[:, 4] = 49407
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(img),
        jnp.asarray(word), train=False,
    )
    f = jax.jit(lambda v, i, w: model.apply(v, i, w, train=False))
    p1 = np.asarray(jax.device_get(f(variables, jnp.asarray(img), jnp.asarray(word))))
    sh = data_sharding(mesh)
    p8 = np.asarray(jax.device_get(
        f(replicate(variables, mesh), jax.device_put(img, sh),
          jax.device_put(word, sh))
    ))
    scale = np.abs(p1).max()
    np.testing.assert_allclose(p8, p1, atol=2e-4 * max(scale, 1.0), rtol=1e-3)


def test_sync_batchnorm_global_stats():
    """Batch statistics over a sharded batch (1 sample/device) must equal the
    global-batch statistics — this IS SyncBatchNorm."""
    assert jax.device_count() >= 8
    mesh = get_mesh()
    rng = np.random.RandomState(1)
    x = rng.randn(8, 6, 6, 16).astype(np.float32) * 2.0 + 1.0
    bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5, use_running_average=None)
    v = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), use_running_average=False)

    def g(v, x):
        y, mut = bn.apply(
            v, x, use_running_average=False, mutable=["batch_stats"]
        )
        return y, mut["batch_stats"]

    g = jax.jit(g)
    y1, s1 = jax.device_get(g(v, jnp.asarray(x)))
    sh = data_sharding(mesh)
    y8, s8 = jax.device_get(g(replicate(v, mesh), jax.device_put(x, sh)))
    np.testing.assert_allclose(np.asarray(y8), np.asarray(y1), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1), jax.tree_util.tree_leaves(s8)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6)
    # and they equal the hand-computed GLOBAL stats, not per-shard stats
    # (running update: 0.9 * init(0) + 0.1 * batch_mean)
    mean = np.asarray(s8["mean"])
    np.testing.assert_allclose(mean, 0.1 * x.mean(axis=(0, 1, 2)), atol=1e-5)
