"""Fault-tolerant SSG training supervisor: auto-degrade batch on worker fault.

The SSG raw-wire pipeline has a known size-dependent, FLAKY remote-TPU-worker
fault at large per-chip batch (VERDICT r04 missing #1: "TPU worker process
crashed" at batch 8, clean at 4; bisected but not root-caused — see
tools/ssg_fault_sweep.py for the envelope measurement).  A worker fault kills
the JAX client irrecoverably in-process, so survival has to come from OUTSIDE
the process: this supervisor launches ``train_ssg.py`` as a child, and when
the child dies with a fault it relaunches from the last orbax checkpoint
(``<exp>/last_model``, saved every epoch) with the per-chip batch HALVED.
Batch never degrades below ``--min-batch``; a child that fails at min batch
(or fails ``--max-restarts`` times) ends the run with the child's exit code.

The reference has no equivalent (a crashed rank hangs the DDP job and
recovery is a manual relaunch, SURVEY.md section 5.3); this is the
production-run answer the reference's ``resume:`` key only enables by hand
(reference train_crog.py:206-226).

Usage (same CLI as train_ssg.py; batch_size may be overridden per restart):
  python tools/ssg_train_supervisor.py --config config/OCID-Grasp/ssg_r50.yaml \
      [--max-restarts 4] [--min-batch 1] [--opts k v ...]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_cmd(script, config, opts, batch_size, resume):
    """Child command line: caller opts first, then the supervisor's
    batch_size/resume overrides (later --opts keys win in merge_cfg_from_list,
    reference utils/config.py:77-88)."""
    cmd = [sys.executable, script, "--config", config, "--opts"]
    cmd += list(opts)
    cmd += ["batch_size", str(batch_size)]
    if resume is not None:
        cmd += ["resume", resume]
    return cmd


def supervise(
    config: str,
    opts,
    script: str = os.path.join(REPO, "train_ssg.py"),
    max_restarts: int = 4,
    min_batch: int = 1,
    batch_size: int | None = None,
    resume_path: str | None = None,
) -> int:
    """Run the trainer, halving batch_size and resuming on nonzero exit.
    Returns the final child exit code (0 = a child ran to completion)."""
    from crog_tpu.config import load_cfg_from_cfg_file, merge_cfg_from_list

    cfg = load_cfg_from_cfg_file(config)
    if opts:
        cfg = merge_cfg_from_list(cfg, list(opts))
    bs = int(batch_size or cfg.batch_size)
    if resume_path is None:
        resume_path = os.path.join(
            cfg.output_folder, cfg.exp_name, "last_model"
        )

    restarts = 0
    while True:
        # resume unconditionally: train_ssg skips it until the checkpoint
        # exists, and after a fault it picks up the last finished epoch
        cmd = build_cmd(script, config, opts, bs, resume_path)
        print(
            f"[supervisor] launch (batch_size={bs}, restart {restarts}): "
            + " ".join(cmd),
            flush=True,
        )
        t0 = time.perf_counter()
        rc = subprocess.call(cmd)
        if rc == 0:
            print("[supervisor] training completed", flush=True)
            return 0
        print(
            f"[supervisor] child exited rc={rc} after "
            f"{time.perf_counter() - t0:.0f}s",
            flush=True,
        )
        restarts += 1
        if restarts > max_restarts:
            print("[supervisor] restart budget exhausted", flush=True)
            return rc
        new_bs = max(min_batch, bs // 2)
        if new_bs < bs:
            bs = new_bs
            print(f"[supervisor] degrading batch_size -> {bs}", flush=True)
        else:
            # already at min batch: plain retries (the fault is flaky) until
            # the restart budget runs out
            print(
                f"[supervisor] retrying at min batch {bs} "
                f"({max_restarts - restarts} restarts left)",
                flush=True,
            )


def main() -> None:
    p = argparse.ArgumentParser(description="SSG training supervisor")
    p.add_argument("--config", required=True)
    p.add_argument("--script", default=os.path.join(REPO, "train_ssg.py"))
    p.add_argument("--max-restarts", type=int, default=4)
    p.add_argument("--min-batch", type=int, default=1)
    p.add_argument("--opts", default=[], nargs=argparse.REMAINDER)
    a = p.parse_args()
    sys.exit(
        supervise(
            a.config, a.opts, script=a.script,
            max_restarts=a.max_restarts, min_batch=a.min_batch,
        )
    )


if __name__ == "__main__":
    main()
