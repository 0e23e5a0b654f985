"""Experiment tracking.

The reference logged metrics to wandb in forced-offline mode (train_crog.py:
11-12, train_ssg.py:102-108, engine/ssg_engine.py:97-114) with a hardcoded
API key (which we deliberately do not replicate).  Here: a lightweight JSONL
tracker that always works, plus a wandb passthrough when the package is
importable and the user opts in via WANDB_MODE.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsTracker:
    """Append-only JSONL metrics log, wandb-API-shaped (init/log/finish)."""

    def __init__(
        self,
        output_dir: str,
        project: str = "crog_tpu",
        name: Optional[str] = None,
        config: Optional[Dict] = None,
        use_wandb: Optional[bool] = None,
    ):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, "metrics.jsonl")
        self._fh = open(self.path, "a")
        self._start = time.time()
        self._wandb = None
        if use_wandb is None:
            use_wandb = os.environ.get("WANDB_MODE", "") not in ("", "disabled")
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(
                    project=project, name=name,
                    config=dict(config) if config else None,
                )
            except Exception:
                self._wandb = None
        header = {
            "event": "init",
            "project": project,
            "name": name,
            "time": time.time(),
        }
        if config:
            header["config"] = {
                k: v for k, v in dict(config).items()
                if isinstance(v, (int, float, str, bool, list, type(None)))
            }
        self._write(header)

    def _write(self, record: Dict):
        self._fh.write(json.dumps(record) + "\n")
        self._fh.flush()

    def log(self, metrics: Dict, step: Optional[int] = None):
        rec = {
            "event": "log",
            "step": step,
            "elapsed": time.time() - self._start,
        }
        rec.update({k: _to_py(v) for k, v in metrics.items()})
        self._write(rec)
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def finish(self):
        self._write({"event": "finish", "elapsed": time.time() - self._start})
        self._fh.close()
        if self._wandb is not None:
            self._wandb.finish()


def _to_py(v):
    try:
        import numpy as np

        if isinstance(v, (np.generic, np.ndarray)):
            return v.item() if getattr(v, "size", 2) == 1 else v.tolist()
    except Exception:
        pass
    if hasattr(v, "item"):
        try:
            return v.item()
        except Exception:
            pass
    return v
