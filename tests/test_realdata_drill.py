"""Import-day drill (tools/realdata_drill.py): fixture tree + reference-schema
torch checkpoint -> converter -> full eval CLI -> metric table, as ONE
command (VERDICT r04 next #8).  Runs the real test_crog.py subprocess on the
CPU platform (CROG_PLATFORM pin) at production CROG geometry."""

import os
import subprocess
import sys

import pytest

torch = pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir("/root/reference/model"),
        reason="reference repo not mounted",
    ),
]


def test_drill_fixture_end_to_end():
    env = dict(
        os.environ,
        CROG_PLATFORM="cpu",
        XLA_FLAGS=os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=1",
    )
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "tools", "realdata_drill.py"),
            "--fixture", "--opts", "batch_size_val", "2", "workers_val", "2",
        ],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, timeout=3600,
    )
    out = proc.stdout
    assert proc.returncode == 0, out[-4000:]
    assert "[drill] layout OK" in out
    assert "converted torch checkpoint" in out
    assert "DRILL RESULT" in out
    assert "IoU=" in out
