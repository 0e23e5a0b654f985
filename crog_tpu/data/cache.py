"""In-RAM sample cache: decode/preprocess each sample once, serve every
later epoch from memory.

The reference re-runs the full per-sample host pipeline every epoch —
cv2.imread PNG decodes, mask extraction, grasp parsing (reference
utils/dataset.py:919-975) — 50 times over the same training split.  With the
raw uint8 wire format the per-sample host work is already down to decode +
pack, but on a host with few cores that work is still the end-to-end
bottleneck (BENCH e2e: the step waits on the producer).  CROG's pipeline is
deterministic per index (there is NO random augmentation — SURVEY §2.2), so
caching the finished sample dict is semantically exact: epochs 2..N replay
epoch 1's bytes.

Scope rules:

* Wrap datasets whose ``__getitem__`` is deterministic (OCID-VLG / RefOCID /
  RefCOCO / synthetic).  Do NOT wrap a dataset that applies random
  augmentation inside ``__getitem__`` (SSG's DataAugmentor) — the cache
  would freeze the augmentation of epoch 1.  ``SampleCache`` refuses known
  augmenting datasets unless ``force=True``.
* ``max_bytes`` bounds resident size (default 4 GiB); once full, remaining
  indices fall through to the wrapped dataset every epoch (the cache keeps
  the FIRST samples it saw — with a shuffling sampler the hit set is an
  arbitrary subset, which is fine).
* Cached arrays are served without copying; collate stacks (copies) them
  before anything downstream could mutate.
"""

from __future__ import annotations

import threading
from typing import Dict, Optional

import numpy as np


def _sample_nbytes(sample) -> int:
    n = 0
    if isinstance(sample, dict):
        it = sample.values()
    elif isinstance(sample, (list, tuple)):
        it = sample
    else:
        it = (sample,)
    for v in it:
        if isinstance(v, np.ndarray):
            n += v.nbytes
        elif isinstance(v, (dict, list, tuple)):
            n += _sample_nbytes(v)
        elif isinstance(v, (bytes, str)):
            n += len(v)
        else:
            n += 8
    return n


class SampleCache:
    """Memoizing wrapper around a map-style dataset.

    >>> ds = SampleCache(OCIDVLGDataset(...), max_bytes=8 << 30)

    Epoch 1 populates; later epochs are RAM reads.  Thread-safe for the
    loader's thread pool.  Under a PROCESS pool each worker builds its own
    cache (the wrapper pickles as the bare dataset + settings), so prefer
    thread workers (the default) when caching.
    """

    def __init__(self, dataset, max_bytes: Optional[int] = 4 << 30,
                 force: bool = False):
        aug = getattr(dataset, "augmentor", None)
        augmenting = aug is not None and getattr(aug, "mode", "") == "train"
        if augmenting and not force:
            raise ValueError(
                f"{type(dataset).__name__} applies random augmentation per "
                "__getitem__; caching would freeze epoch 1's draws. Pass "
                "force=True to cache anyway."
            )
        self.dataset = dataset
        self.max_bytes = max_bytes
        self._cache: Dict[int, object] = {}
        self._bytes = 0
        self._full = False
        self._lock = threading.Lock()

    def __len__(self):
        return len(self.dataset)

    def __getattr__(self, name):
        # passthrough for dataset attributes (split, input_size, ...)
        return getattr(self.dataset, name)

    def __getstate__(self):
        # a pickled copy (process-pool worker) starts with an empty cache
        return {"dataset": self.dataset, "max_bytes": self.max_bytes}

    def __setstate__(self, state):
        self.__init__(state["dataset"], state["max_bytes"], force=True)

    @property
    def cached_bytes(self) -> int:
        return self._bytes

    @property
    def cached_count(self) -> int:
        return len(self._cache)

    def __getitem__(self, i: int):
        hit = self._cache.get(i)
        if hit is not None:
            return hit
        sample = self.dataset[i]
        if not self._full:
            with self._lock:
                if i not in self._cache:
                    nb = _sample_nbytes(sample)
                    if self.max_bytes is None or self._bytes + nb <= self.max_bytes:
                        self._cache[i] = sample
                        self._bytes += nb
                    else:
                        self._full = True
        return sample
