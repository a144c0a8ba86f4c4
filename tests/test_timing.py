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


def test_median_iqr_small_and_large():
    med, iqr = median_iqr_ms([0.001, 0.002, 0.003])  # <4: spread = max-min
    assert abs(med - 2.0) < 1e-9 and abs(iqr - 2.0) < 1e-9
    med, iqr = median_iqr_ms([0.001] * 8)
    assert abs(med - 1.0) < 1e-9 and iqr == 0.0
