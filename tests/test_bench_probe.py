"""Pins for the bench throttle-detection probe (r12, VERDICT #1): the
probe is the trust anchor for every cross-round perf claim, so its
arithmetic and the headline-key wiring get their own tests."""

import bench


def test_headline_keys_all_resolve():
    """Every HEADLINE name must resolve to a callable — either a
    registry key or a bench-only twin (BENCH_EXTRA). A typo here would
    crash the driver's per-round bench."""
    for name in bench.HEADLINE:
        fn = bench.BENCH_EXTRA.get(name) or bench.QUERIES.get(name)
        assert callable(fn), name
    # the r12 regression-watch additions are present
    assert "orders_item_cf" in bench.HEADLINE
    assert "data_profile_hll" in bench.HEADLINE
    # bench-only twins never shadow a registry key
    assert not set(bench.BENCH_EXTRA) & set(bench.QUERIES)


def test_probe_drift_and_steal_math():
    # drift gates on the 32-thread arm only: the single-thread arm
    # carries a cold-process clock-ramp artifact (see probe_drift_pct)
    a = {"st_sec": 0.30, "mt_sec": 0.50}
    b = {"st_sec": 0.99, "mt_sec": 0.55}
    assert abs(bench.probe_drift_pct(a, b) - 10.0) < 1e-9
    assert bench.probe_drift_pct(a, a) == 0.0
    # steal: 50 stolen jiffies out of a 1000-jiffy window = 5%
    assert bench.steal_pct((1000, 10), (2000, 60)) == 5.0
    # degenerate zero-width window must not divide by zero
    assert bench.steal_pct((1000, 10), (1000, 10)) == 0.0


def test_steal_snapshot_reads_proc_stat():
    total, steal = bench.steal_snapshot()
    assert total > 0 and steal >= 0 and steal < total


def test_cpu_probe_returns_stable_shape():
    p = bench.cpu_probe()
    assert set(p) == {"st_sec", "mt_sec", "steal_pct"}
    assert p["st_sec"] > 0 and p["mt_sec"] > 0 and p["steal_pct"] >= 0
