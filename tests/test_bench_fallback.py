"""bench.py honesty: a dead TPU tunnel must yield a clearly-stamped CPU
fallback JSON line, never a number that could be read as a TPU result
(round-3 verdict weak #2 / next-round item 9)."""
import json
import runpy
import sys
from pathlib import Path

REPO = Path(__file__).parent.parent


def test_probe_retries_then_false(monkeypatch):
    """With the backend forced dead, _probe_backend retries and returns
    False instead of hanging."""
    monkeypatch.setenv("RDEIC_BENCH_FORCE_CPU", "1")
    monkeypatch.delenv("RDEIC_BENCH_SKIP_PROBE", raising=False)
    sys.path.insert(0, str(REPO))
    try:
        import bench

        assert bench._probe_backend() is False
    finally:
        sys.path.remove(str(REPO))


def test_forced_fallback_stamps_backend(monkeypatch, capfd):
    """Full bench run with the probe forced to fail: the JSON line must
    carry backend == "cpu-fallback" and the cpu smoke metric name."""
    monkeypatch.setenv("RDEIC_BENCH_FORCE_CPU", "1")
    monkeypatch.delenv("RDEIC_BENCH_SKIP_PROBE", raising=False)
    # bench's main() sets serving env defaults (e.g. RDEIC_RANS_LANES);
    # scope them to this test so they never leak into later in-process
    # CLI smoke runs
    monkeypatch.setenv("RDEIC_RANS_LANES", "0")
    old = sys.argv
    try:
        sys.argv = ["bench.py"]
        runpy.run_path(str(REPO / "bench.py"), run_name="__main__")
    finally:
        sys.argv = old
    out = capfd.readouterr().out.strip().splitlines()
    rec = json.loads(out[-1])
    assert rec["backend"] == "cpu-fallback"
    assert rec["metric"].startswith("cpu_smoke")
    assert rec["value"] > 0


def test_budget_exhausted_still_emits(monkeypatch, capfd):
    """With the wall-clock budget at zero, later stages are skipped and the
    JSON line still carries the best early-stage measurement — the driver
    must never record an empty bench."""
    monkeypatch.setenv("RDEIC_BENCH_FORCE_CPU", "1")
    monkeypatch.delenv("RDEIC_BENCH_SKIP_PROBE", raising=False)
    monkeypatch.setenv("RDEIC_RANS_LANES", "0")
    monkeypatch.setenv("RDEIC_BENCH_BUDGET_S", "0")
    old = sys.argv
    try:
        sys.argv = ["bench.py"]
        runpy.run_path(str(REPO / "bench.py"), run_name="__main__")
    finally:
        sys.argv = old
    cap = capfd.readouterr()
    rec = json.loads(cap.out.strip().splitlines()[-1])
    assert rec["value"] > 0
    assert "skipping batched" in cap.err
