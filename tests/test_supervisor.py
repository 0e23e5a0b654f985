"""SSG training supervisor (tools/ssg_train_supervisor.py): auto-degrade on
worker fault.  Uses a fake trainer script that simulates the v5e raw-wire
fault (crash whenever batch_size exceeds a threshold) — the real fault needs
the real remote worker, but the supervision logic (halve + resume + budget)
is fully exercised here."""

import json
import os
import subprocess
import sys
import textwrap

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.ssg_train_supervisor import supervise  # noqa: E402

FAKE_TRAINER = textwrap.dedent(
    """
    import json, os, sys
    # parse --opts k v ... exactly like the real CLI (later keys win)
    opts = {}
    if "--opts" in sys.argv:
        rest = sys.argv[sys.argv.index("--opts") + 1:]
        for k, v in zip(rest[::2], rest[1::2]):
            opts[k] = v
    bs = int(opts.get("batch_size", "32"))
    log = os.environ["FAKE_LOG"]
    with open(log, "a") as f:
        f.write(json.dumps({"batch_size": bs, "resume": opts.get("resume")}) + "\\n")
    if bs > int(os.environ.get("FAKE_MAX_OK", "4")):
        sys.stderr.write("jaxlib.xla_extension.XlaRuntimeError: "
                         "INTERNAL: TPU worker process crashed\\n")
        sys.exit(1)
    sys.exit(0)
    """
)


def _run(tmp_path, batch_size, max_ok=4, max_restarts=4, min_batch=1):
    script = tmp_path / "fake_trainer.py"
    script.write_text(FAKE_TRAINER)
    log = tmp_path / "launches.jsonl"
    os.environ["FAKE_LOG"] = str(log)
    os.environ["FAKE_MAX_OK"] = str(max_ok)
    try:
        rc = supervise(
            "config/OCID-Grasp/ssg_r50.yaml",
            ["batch_size", str(batch_size), "exp_name", "sup_test"],
            script=str(script),
            max_restarts=max_restarts,
            min_batch=min_batch,
        )
    finally:
        os.environ.pop("FAKE_LOG", None)
        os.environ.pop("FAKE_MAX_OK", None)
    launches = [
        json.loads(l) for l in log.read_text().splitlines()
    ] if log.exists() else []
    return rc, launches


def test_supervisor_degrades_to_working_batch(tmp_path):
    rc, launches = _run(tmp_path, batch_size=16, max_ok=4)
    assert rc == 0
    assert [l["batch_size"] for l in launches] == [16, 8, 4]
    # every relaunch resumes from the last checkpoint path
    assert all(l["resume"].endswith("last_model") for l in launches)


def test_supervisor_budget_exhausts(tmp_path):
    rc, launches = _run(
        tmp_path, batch_size=16, max_ok=0, max_restarts=3, min_batch=2
    )
    assert rc != 0
    # 16 -> 8 -> 4 -> 2, then the budget (3 restarts) is spent
    assert [l["batch_size"] for l in launches] == [16, 8, 4, 2]


def test_supervisor_retries_at_min_batch(tmp_path):
    rc, launches = _run(
        tmp_path, batch_size=4, max_ok=0, max_restarts=2, min_batch=4
    )
    assert rc != 0
    # no degrade below min: plain retries until the budget runs out
    assert [l["batch_size"] for l in launches] == [4, 4, 4]


def test_supervisor_immediate_success(tmp_path):
    rc, launches = _run(tmp_path, batch_size=4, max_ok=8)
    assert rc == 0
    assert [l["batch_size"] for l in launches] == [4]
