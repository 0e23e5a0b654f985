"""Record shard storage for the RefCOCO-family path.

The reference serialized pyarrow records into LMDB (tools/folder2lmdb.py:35-71,
read back at utils/dataset.py:101-106).  Neither lmdb nor pyarrow is a hard
dependency here: records are numpy-native (npz bytes), stored in LMDB when the
package is importable, else in a plain directory shard (one file per record +
an index) — the latter is friendlier to sequential-read object stores anyway.
"""

from __future__ import annotations

import io
import json
import os
from typing import Dict, Iterator, List, Optional

import numpy as np

try:
    import lmdb  # type: ignore

    _HAS_LMDB = True
except Exception:  # pragma: no cover
    _HAS_LMDB = False


def encode_record(record: Dict) -> bytes:
    """Serialize a dict of numpy arrays / scalars / strings to npz bytes."""
    norm = {}
    for k, v in record.items():
        if isinstance(v, (str, int, float, bool)):
            norm[f"scalar::{k}"] = np.asarray(v)
        elif isinstance(v, bytes):
            norm[f"bytes::{k}"] = np.frombuffer(v, np.uint8)
        else:
            norm[k] = np.asarray(v)
    buf = io.BytesIO()
    np.savez_compressed(buf, **norm)
    return buf.getvalue()


def decode_record(data: bytes) -> Dict:
    z = np.load(io.BytesIO(data), allow_pickle=False)
    out: Dict = {}
    for k in z.files:
        if k.startswith("scalar::"):
            out[k[8:]] = z[k].item()
        elif k.startswith("bytes::"):
            out[k[7:]] = z[k].tobytes()
        else:
            out[k] = z[k]
    return out


class ShardWriter:
    def __init__(self, path: str, backend: Optional[str] = None):
        self.path = path
        self.backend = backend or ("lmdb" if _HAS_LMDB else "dir")
        self.keys: List[str] = []
        if self.backend == "lmdb":
            if not _HAS_LMDB:
                raise RuntimeError("lmdb backend requested but not importable")
            self._env = lmdb.open(path, map_size=1 << 40)
            self._txn = self._env.begin(write=True)
        else:
            os.makedirs(path, exist_ok=True)

    def put(self, key: str, record: Dict):
        data = encode_record(record)
        if self.backend == "lmdb":
            self._txn.put(key.encode(), data)
            if len(self.keys) % 500 == 499:
                self._txn.commit()
                self._txn = self._env.begin(write=True)
        else:
            with open(os.path.join(self.path, f"{key}.npz"), "wb") as f:
                f.write(data)
        self.keys.append(key)

    def close(self):
        if self.backend == "lmdb":
            self._txn.put(
                b"__keys__", json.dumps(self.keys).encode()
            )
            self._txn.commit()
            self._env.sync()
            self._env.close()
        else:
            with open(os.path.join(self.path, "__index__.json"), "w") as f:
                json.dump({"keys": self.keys, "backend": "dir"}, f)


class ShardReader:
    def __init__(self, path: str):
        self.path = path
        if os.path.isfile(os.path.join(path, "__index__.json")):
            self.backend = "dir"
            with open(os.path.join(path, "__index__.json")) as f:
                self.keys = json.load(f)["keys"]
        elif _HAS_LMDB:
            self.backend = "lmdb"
            self._env = lmdb.open(
                path, readonly=True, lock=False, readahead=False, meminit=False
            )
            with self._env.begin(write=False) as txn:
                self.keys = json.loads(txn.get(b"__keys__").decode())
        else:
            raise RuntimeError(
                f"{path} is not a directory shard and lmdb is unavailable"
            )

    def __len__(self):
        return len(self.keys)

    def get(self, key: str) -> Dict:
        if self.backend == "lmdb":
            with self._env.begin(write=False) as txn:
                return decode_record(txn.get(key.encode()))
        with open(os.path.join(self.path, f"{key}.npz"), "rb") as f:
            return decode_record(f.read())

    def __getitem__(self, i: int) -> Dict:
        return self.get(self.keys[i])

    def __iter__(self) -> Iterator[Dict]:
        for k in self.keys:
            yield self.get(k)
