"""SampleCache: epoch-2 samples come from RAM, semantics unchanged.

The reference re-runs the per-sample host pipeline every epoch
(utils/dataset.py:919-975); the cache replays epoch 1's bytes exactly
because the CROG pipeline is deterministic per index.
"""

import pickle

import numpy as np
import pytest

from crog_tpu.data.cache import SampleCache
from crog_tpu.data.loader import DataLoader, collate_crog
from crog_tpu.data.synthetic import SyntheticOCIDVLG


def test_cache_hit_is_identical_object():
    ds = SampleCache(SyntheticOCIDVLG(num_samples=4, raw=True))
    a = ds[1]
    b = ds[1]
    assert a is b  # served from RAM, not recomputed
    fresh = SyntheticOCIDVLG(num_samples=4, raw=True)[1]
    for k, v in fresh.items():
        if isinstance(v, np.ndarray):
            np.testing.assert_array_equal(v, a[k])


def test_cache_byte_bound():
    base = SyntheticOCIDVLG(num_samples=6, raw=True)
    one = sum(
        v.nbytes for v in base[0].values() if isinstance(v, np.ndarray)
    )
    ds = SampleCache(base, max_bytes=int(one * 2.5))
    for i in range(6):
        ds[i]
    assert ds.cached_count == 2
    assert ds.cached_bytes <= one * 2.5
    # misses still return correct samples
    np.testing.assert_array_equal(ds[5]["raw_img_u8"], base[5]["raw_img_u8"])


def test_cache_refuses_train_augmentation(tmp_path):
    from tests.ocid_fixture import build_ocid_tree

    from crog_tpu.data.ocid_grasp import OCIDGraspDataset

    build_ocid_tree(tmp_path)
    train = OCIDGraspDataset(str(tmp_path), "training_0", img_size=128)
    with pytest.raises(ValueError):
        SampleCache(train)
    SampleCache(train, force=True)  # explicit override allowed
    # eval-mode augmentor is deterministic -> cacheable
    SampleCache(OCIDGraspDataset(str(tmp_path), "validation_0", img_size=128))


def test_cache_pickles_empty():
    ds = SampleCache(SyntheticOCIDVLG(num_samples=4, raw=True))
    ds[0]
    clone = pickle.loads(pickle.dumps(ds))
    assert clone.cached_count == 0
    np.testing.assert_array_equal(
        clone[0]["raw_img_u8"], ds[0]["raw_img_u8"]
    )


def test_cache_through_loader_two_epochs():
    ds = SampleCache(SyntheticOCIDVLG(num_samples=8, raw=True))
    loader = DataLoader(
        ds, batch_size=4, shuffle=True, drop_last=True, num_workers=2,
        collate_fn=collate_crog,
    )
    first = [b["raw_img_u8"].copy() for b in loader]
    assert ds.cached_count == 8
    loader.set_epoch(1)
    n = sum(b["raw_img_u8"].shape[0] for b in loader)
    assert n == 8
    assert ds.cached_count == 8
    assert len(first) == 2
