"""Engine-layer components: checkpoint roundtrip, sampler semantics,
optimizer param groups, grasp-transform roundtrip, jacquard metric."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from crog_tpu.data.grasp_transforms import GraspTransforms
from crog_tpu.data.loader import EpochSampler
from crog_tpu.engine import checkpoint as ckpt
from crog_tpu.engine.crog_engine import TrainState, jacquard_index
from crog_tpu.engine.optim import make_optimizer, multistep_schedule, param_group_label


def test_multistep_schedule():
    s = multistep_schedule(1e-4, [35], 0.1, steps_per_epoch=100)
    assert float(s(0)) == pytest.approx(1e-4)
    assert float(s(3499)) == pytest.approx(1e-4)
    assert float(s(3500)) == pytest.approx(1e-5)


def test_param_group_label_split():
    params = {
        "backbone": {
            "visual": {"conv1": {"kernel": jnp.zeros((3, 3, 3, 32))}},
            "transformer": {"positional_embedding": jnp.zeros((77, 512))},
        },
        "neck": {"aggr": {"conv": {"kernel": jnp.zeros((1, 1, 8, 8))}}},
    }
    labels = jax.tree_util.tree_map_with_path(
        lambda p, _: param_group_label(p), params
    )
    assert labels["backbone"]["visual"]["conv1"]["kernel"] == "backbone"
    # positional embeddings keep base lr (reference model/__init__.py:12-17)
    assert (
        labels["backbone"]["transformer"]["positional_embedding"] == "rest"
    )
    assert labels["neck"]["aggr"]["conv"]["kernel"] == "rest"


def test_optimizer_applies_lr_multiplier():
    params = {
        "backbone": {"w": jnp.ones((4,))},
        "neck": {"w": jnp.ones((4,))},
    }
    tx = make_optimizer(
        params, base_lr=0.1, lr_multi=0.1, milestones=[100], lr_decay=0.1,
        steps_per_epoch=10,
    )
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # adam normalizes the first update to ~lr; backbone should move ~10x less
    ratio = abs(float(updates["backbone"]["w"][0])) / abs(
        float(updates["neck"]["w"][0])
    )
    assert ratio == pytest.approx(0.1, rel=0.05)


def test_epoch_sampler_shuffle_and_hosts():
    s = EpochSampler(100, shuffle=True, seed=0, drop_last=True, batch_size=16)
    s.set_epoch(0)
    e0 = [i for b in s.batches() for i in b]
    s.set_epoch(1)
    e1 = [i for b in s.batches() for i in b]
    assert e0 != e1  # reshuffled per epoch
    s.set_epoch(0)
    assert e0 == [i for b in s.batches() for i in b]  # deterministic
    assert len(e0) == 96  # drop_last

    # host sharding partitions without overlap
    parts = []
    for h in range(4):
        sh = EpochSampler(100, shuffle=True, seed=0, batch_size=8,
                          num_hosts=4, host_id=h)
        parts.append({i for b in sh.batches() for i in b})
    assert set.union(*parts) == set(range(100))
    assert sum(len(p) for p in parts) == 100


def test_checkpoint_roundtrip(tmp_path):
    params = {"w": jnp.arange(6.0).reshape(2, 3)}
    tx = optax.adam(1e-3)
    state = TrainState.create(
        apply_fn=lambda *a: None, params=params, batch_stats={"bn": jnp.ones(3)},
        tx=tx,
    ).replace(step=jnp.asarray(7, jnp.int32))
    path = ckpt.save_checkpoint(
        str(tmp_path), state, epoch=3, best_iou=0.5, best_jindex=0.25,
        prec={"Pr@50": 0.9},
    )
    # eval-style restore
    payload = ckpt.restore_checkpoint(path)
    np.testing.assert_allclose(payload["params"]["w"], np.arange(6.0).reshape(2, 3))
    assert int(payload["meta"]["epoch"]) == 3
    # resume-style restore
    fresh = TrainState.create(
        apply_fn=lambda *a: None,
        params={"w": jnp.zeros((2, 3))},
        batch_stats={"bn": jnp.zeros(3)},
        tx=tx,
    ).replace(step=jnp.asarray(0, jnp.int32))
    restored = ckpt.restore_checkpoint(path, fresh)
    np.testing.assert_allclose(
        np.asarray(restored["state"].params["w"]), np.arange(6.0).reshape(2, 3)
    )
    assert int(restored["state"].step) == 7
    assert float(restored["meta"]["best_iou"]) == pytest.approx(0.5)


def test_checkpoint_optimizer_skew_is_loud(tmp_path):
    """A checkpoint saved under one optimizer config must refuse a resume
    under a structurally different one (fingerprint guard) instead of
    silently unflattening wrong leaves."""
    params = {"w": jnp.arange(6.0).reshape(2, 3)}
    state = TrainState.create(
        apply_fn=lambda *a: None, params=params, batch_stats={},
        tx=optax.adam(1e-3),
    ).replace(step=jnp.asarray(1, jnp.int32))
    path = ckpt.save_checkpoint(str(tmp_path), state, epoch=0)

    # same structure -> restores fine
    same = TrainState.create(
        apply_fn=lambda *a: None, params={"w": jnp.zeros((2, 3))},
        batch_stats={}, tx=optax.adam(5e-4),
    ).replace(step=jnp.asarray(0, jnp.int32))
    assert ckpt.restore_checkpoint(path, same)["state"] is not None

    # different optimizer -> loud error
    skewed = TrainState.create(
        apply_fn=lambda *a: None, params={"w": jnp.zeros((2, 3))},
        batch_stats={},
        tx=optax.chain(optax.clip_by_global_norm(1.0), optax.sgd(1e-3)),
    ).replace(step=jnp.asarray(0, jnp.int32))
    with pytest.raises(ValueError, match="optimizer-state structure"):
        ckpt.restore_checkpoint(path, skewed)


def test_loader_process_pool_forkserver(tmp_path):
    """num_procs > 0 must use a fork-safe worker pool: no fork-after-threads
    DeprecationWarning (the JAX runtime + prefetch threads are live by loader
    time), and the batches must match the in-thread path."""
    import warnings

    from crog_tpu.data.loader import DataLoader
    from crog_tpu.data.synthetic import SyntheticOCIDVLG

    ds = SyntheticOCIDVLG(num_samples=8, input_size=32, ori_hw=(60, 80))
    ref_loader = DataLoader(ds, batch_size=4, shuffle=False, num_workers=2)
    ref = list(iter(ref_loader))

    loader = DataLoader(ds, batch_size=4, shuffle=False, num_procs=2)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        got = list(iter(loader))
    fork_warnings = [
        w for w in caught
        if "fork" in str(w.message).lower() and "deadlock" in str(w.message).lower()
    ]
    assert not fork_warnings, [str(w.message) for w in fork_warnings]
    assert len(got) == len(ref) == 2
    for b_ref, b_got in zip(ref, got):
        np.testing.assert_array_equal(b_got["img"], b_ref["img"])
        np.testing.assert_array_equal(b_got["word"], b_ref["word"])
    loader._workers.shutdown()


def test_loader_propagates_worker_exception():
    """A dataset error mid-epoch must crash the consumer with the original
    exception, not silently truncate the epoch (a producer thread dying used
    to enqueue the end-of-epoch sentinel, making every epoch look like a
    short success — reference torch DataLoader propagates)."""
    import pytest

    from crog_tpu.data.loader import DataLoader

    class Poisoned:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            if i == 9:
                raise RuntimeError("corrupt sample 9")
            return {"img": np.zeros((4, 4, 3), np.float32),
                    "word": np.zeros(17, np.int32)}

    loader = DataLoader(Poisoned(), batch_size=4, shuffle=False, num_workers=2)
    got = []
    with pytest.raises(RuntimeError, match="corrupt sample 9"):
        for batch in loader:
            got.append(batch)
    assert len(got) < 4  # the epoch did NOT look complete


def test_two_stage_put_pipeline_order_and_exceptions():
    """With device_put_fn set, collate and transfer run as separate pipeline
    stages; batches must arrive in order, each exactly once, and exceptions
    from EITHER stage must reach the consumer."""
    import pytest

    from crog_tpu.data.loader import DataLoader

    class Seq:
        def __len__(self):
            return 12

        def __getitem__(self, i):
            return {"img": np.full((2, 2), i, np.float32)}

    put_calls = []

    def put(batch):
        put_calls.append(int(batch["img"][0, 0, 0]))
        return {**batch, "put": True}

    loader = DataLoader(Seq(), batch_size=4, shuffle=False, num_workers=2,
                        device_put_fn=put)
    got = list(iter(loader))
    assert [int(b["img"][0, 0, 0]) for b in got] == [0, 4, 8]
    assert all(b["put"] for b in got)
    assert put_calls == [0, 4, 8]

    # an exception raised inside the put stage propagates too
    def bad_put(batch):
        raise OSError("wire down")

    loader = DataLoader(Seq(), batch_size=4, shuffle=False, num_workers=2,
                        device_put_fn=bad_put)
    with pytest.raises(OSError, match="wire down"):
        list(iter(loader))

    # a worker exception still propagates THROUGH the put stage
    class Poisoned2(Seq):
        def __getitem__(self, i):
            if i == 5:
                raise RuntimeError("corrupt 5")
            return super().__getitem__(i)

    loader = DataLoader(Poisoned2(), batch_size=4, shuffle=False,
                        num_workers=2, device_put_fn=put)
    with pytest.raises(RuntimeError, match="corrupt 5"):
        list(iter(loader))


def test_grasp_transforms_roundtrip():
    gt = GraspTransforms()
    rects = np.array([[320.0, 240.0, 60.0, 20.0, 30.0, 1.0],
                      [100.0, 400.0, 40.0, 16.0, -75.0, 2.0]])
    pts = gt.inverse(rects)  # 4-corner int boxes
    back = gt(np.asarray(pts, np.float64), 1)
    # center/size/angle recovered to integer-corner resolution
    np.testing.assert_allclose(back[:, :2], rects[:, :2], atol=1.0)
    np.testing.assert_allclose(back[:, 2:4], rects[:, 2:4], atol=2.0)
    ang_diff = np.abs(back[:, 4] - rects[:, 4])
    ang_diff = np.minimum(ang_diff, 180 - ang_diff)
    assert (ang_diff < 3.0).all()


def test_jacquard_index_semantics():
    gt = [[100.0, 100.0, 60.0, 33.0, 15.0, 1.0]]
    # same rect: GT height forced to 20, so predict with height 20
    assert jacquard_index([[100.0, 100.0, 60.0, 20.0, 15.0]], gt) == 1
    # angle gate
    assert jacquard_index([[100.0, 100.0, 60.0, 20.0, 80.0]], gt) == 0
    # far away
    assert jacquard_index([[300.0, 300.0, 60.0, 20.0, 15.0]], gt) == 0
    # empty predictions
    assert jacquard_index([], gt) == 0
    # width clipped to 100 on GT
    gt_wide = [[100.0, 100.0, 400.0, 20.0, 0.0, 1.0]]
    assert jacquard_index([[100.0, 100.0, 100.0, 20.0, 0.0]], gt_wide) == 1


def test_visualize_gt_sample_renders(tmp_path):
    """GT visualization (reference utils/dataset.py:976-1039 equivalent)."""
    from crog_tpu.data.synthetic import SyntheticOCIDVLG
    from crog_tpu.utils.visualization import visualize_gt_sample

    ds = SyntheticOCIDVLG(num_samples=2, input_size=64)
    out = visualize_gt_sample(ds[0], str(tmp_path / "gt.png"))
    import os

    assert os.path.exists(out) and os.path.getsize(out) > 1000
