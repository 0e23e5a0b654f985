"""The bench wire instrument (bench.wire_diagnostics / bench._make_wire_probe)
measured 8e7 "MB/s" in early round-5 runs because the timed region compiled a
force reduction whose pytree structure differed from the calibrated one.
These tests pin the fixed contract on the CPU backend: every rate is finite,
positive, and far below an obviously-absurd ceiling, and the probe is
reusable across calls (the e2e loop calls it once per warm pass).
"""

import numpy as np
import jax

import bench


def _dense(b=4):
    rng = np.random.RandomState(0)
    return {
        "img_u8": rng.randint(0, 255, (b, 64, 64, 3)).astype(np.uint8),
        "word": rng.randint(0, 40000, (b, 17)).astype(np.int32),
    }


def test_wire_diagnostics_sane():
    dense = _dense()
    out = bench.wire_diagnostics(dense, jax.devices()[0], 4, 1)
    assert set(out) == {
        "batch_MB", "wire_rtt_ms", "wire_stream_MBps", "wire_conc2_MBps",
        "wire_bound_sps",
    }
    for k in ("wire_stream_MBps", "wire_conc2_MBps", "wire_bound_sps"):
        assert np.isfinite(out[k]) and out[k] > 0.0, (k, out)
        # host-local CPU device_put tops out in the GB/s range; the broken
        # instrument reported 8e7 MB/s (= 80 TB/s)
        assert out[k] < 1e6, (k, out)
    assert out["batch_MB"] == round(
        sum(v.nbytes for v in dense.values()) / 1e6, 2
    )


def test_wire_probe_repeatable():
    probe = bench._make_wire_probe(_dense(), jax.devices()[0])
    rates = [probe() for _ in range(3)]
    assert all(np.isfinite(r) and 0.0 < r < 1e6 for r in rates), rates
