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
    # in-process run: the watchdog's _exit would take pytest down
    monkeypatch.setenv("RDEIC_BENCH_WATCHDOG", "0")
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


def test_sigterm_mid_run_is_distinguishable():
    """A SIGTERM'd bench must exit nonzero (128+sig) and stamp
    interrupted:true; an empty run must carry value null, never a -1
    sentinel (advisor round 4)."""
    import os
    import signal
    import subprocess
    import time

    env = dict(os.environ)
    env.update({"RDEIC_BENCH_FORCE_CPU": "1", "RDEIC_RANS_LANES": "0"})
    env.pop("RDEIC_BENCH_SKIP_PROBE", None)
    proc = subprocess.Popen(
        [sys.executable, str(REPO / "bench.py")],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
        cwd=str(REPO),
    )
    # wait for the handler-installed marker so the signal cannot land
    # before bench.py has registered its SIGTERM hook; keep draining
    # stderr afterwards or the child dies on a full/closed pipe instead
    # of in its signal handler
    import threading

    seen = threading.Event()

    def _drain():
        for line in proc.stderr:
            if b"warmup" in line:
                seen.set()

    threading.Thread(target=_drain, daemon=True).start()
    assert seen.wait(300), "bench.py never reached warmup"
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=120)
    assert proc.returncode == 128 + signal.SIGTERM
    rec = json.loads(out.decode().strip().splitlines()[-1])
    assert rec["interrupted"] is True
    assert rec["partial"] is True
    # either a real early-stage number or an explicit null — never -1
    assert rec["value"] is None or rec["value"] > 0


def test_budget_exhausted_still_emits(monkeypatch, capfd):
    """With the wall-clock budget at zero, later stages are skipped and the
    JSON line still carries the best early-stage measurement — the driver
    must never record an empty bench."""
    monkeypatch.setenv("RDEIC_BENCH_FORCE_CPU", "1")
    monkeypatch.delenv("RDEIC_BENCH_SKIP_PROBE", raising=False)
    monkeypatch.setenv("RDEIC_RANS_LANES", "0")
    monkeypatch.setenv("RDEIC_BENCH_BUDGET_S", "0")
    monkeypatch.setenv("RDEIC_BENCH_WATCHDOG", "0")
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


def test_watchdog_force_emits_when_wedged():
    """The hard watchdog must emit a (partial, interrupted) line and exit 3
    even when the budget is exhausted mid-stage — the observed failure mode
    is a bench process blocked >9 h inside a tunnel device call with no
    output for the driver. A negative budget makes the deadline already
    passed when the watchdog starts, standing in for a wedged stage."""
    import os
    import subprocess

    env = dict(os.environ)
    env.update({
        "RDEIC_BENCH_FORCE_CPU": "1",
        "RDEIC_RANS_LANES": "0",
        "RDEIC_BENCH_BUDGET_S": "-200",
    })
    env.pop("RDEIC_BENCH_SKIP_PROBE", None)
    env.pop("RDEIC_BENCH_WATCHDOG", None)
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True, timeout=600, env=env, cwd=str(REPO),
    )
    assert proc.returncode == 3
    rec = json.loads(proc.stdout.decode().strip().splitlines()[-1])
    assert rec["partial"] is True
    assert rec["interrupted"] is True
    assert rec["value"] is None or rec["value"] > 0
    assert b"watchdog" in proc.stderr
