"""bench.py's JSON line must survive optional-row failures.

The driver records bench.py's output as the round's BENCH artifact; an
opt-in serving-mode row (int8 / folded-Pallas / multiobj / latency) that
fails on the real chip must degrade to a labeled *_error field, never take
down the headline bf16 numbers. Exercised here with a stubbed bench_e2e.
"""

import contextlib
import io
import json

import pytest


@pytest.fixture()
def bench_mod(monkeypatch):
    import bench

    return bench


def _run_main(bench, fake):
    old = bench.bench_e2e
    bench.bench_e2e = fake
    try:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            bench.main()
    finally:
        bench.bench_e2e = old
    return json.loads(buf.getvalue().strip().splitlines()[-1])


def test_all_rows_report(bench_mod):
    def fake(batch_size=128, chain=200, variant="rgb", int8_backbone=False,
             max_objects=1, folded_backbone=False):
        return 1000.0, "chained_difference"

    out = _run_main(bench_mod, fake)
    assert out["value"] == 1000.0
    for key in ("rgbd_value", "rgbd_int8_value", "rgb_int8_value",
                "rgbd_folded_value", "rgb_maxobj4_value", "latency_ms_b1",
                "target_answered_by"):
        assert key in out, key
    assert not [k for k in out if k.endswith("_error")]


def test_failed_optional_row_is_isolated(bench_mod):
    def fake(batch_size=128, chain=200, variant="rgb", int8_backbone=False,
             max_objects=1, folded_backbone=False):
        if folded_backbone:
            raise RuntimeError("mosaic lowering failed")
        return 1000.0, "chained_difference"

    out = _run_main(bench_mod, fake)
    assert out["value"] == 1000.0 and out["rgbd_value"] == 1000.0
    assert "rgbd_folded_value" not in out
    assert "mosaic" in out["folded_error"]
    # the other optional rows still ran
    assert "rgbd_int8_value" in out and "latency_ms_b1" in out
