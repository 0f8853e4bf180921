"""Manifest table format: file-level commits, stats pruning, file-granular
delete carry-forward, compaction, time-travel pointer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_backend_spark.etl.manifest import ManifestTable
from etl_backend_spark.sources.catalog import Catalog
from tests.conftest import SF_DIR


@pytest.fixture()
def mtable(spark, tmp_path):
    cat = Catalog(spark, SF_DIR)
    t = ManifestTable(spark, str(tmp_path), "orders", ["o_orderkey", "o_totalprice"])
    # create from key-ranged chunks so file stats intervals are disjoint
    o = cat.table("orders")
    t.create(o.filter(F.col("o_orderkey") <= 500).repartition(2))
    t.append(o.filter((F.col("o_orderkey") > 500) & (F.col("o_orderkey") <= 1000)).repartition(2))
    t.append(o.filter(F.col("o_orderkey") > 1000).repartition(2))
    return t, o


def test_manifest_read_roundtrip(mtable):
    t, o = mtable
    assert t.read().count() == o.count()
    assert sum(e["rows"] for e in t.files()) == o.count()


def test_manifest_stats_pruning_skips_files(mtable):
    t, o = mtable
    df, skipped = t.read_pruned("o_orderkey", lo=1200, hi=None)
    assert skipped >= 4  # both chunks of the first two key ranges
    # Spark genuinely opens fewer files, not just a smaller logical list
    assert len(df.inputFiles()) == len(t.files()) - skipped
    got = df.filter(F.col("o_orderkey") >= 1200).count()
    assert got == o.filter(F.col("o_orderkey") >= 1200).count()


def test_manifest_delete_carries_disjoint_files(mtable):
    t, o = mtable
    before_paths = {e["path"] for e in t.files()}
    res = t.delete(F.col("o_orderkey").between(1, 100), "o_orderkey", lo=1, hi=100)
    assert res["carried"] >= 4
    assert res["rewritten"] >= 1
    after = t.read()
    assert after.filter(F.col("o_orderkey").between(1, 100)).count() == 0
    expect = o.filter(~F.col("o_orderkey").between(1, 100)).count()
    assert after.count() == expect
    # carried files are the SAME physical files (no rewrite)
    carried_after = {e["path"] for e in t.files()} & before_paths
    assert len(carried_after) == res["carried"]


def test_manifest_compaction_reduces_files(mtable):
    t, o = mtable
    n_before = len(t.files())
    res = t.compact(target_rows=10_000)
    assert res["compacted_files"] == n_before  # all our chunks are small
    assert len(t.files()) < n_before
    assert t.read().count() == o.count()  # content preserved


def test_zorder_prunes_on_both_dimensions(spark, tmp_path):
    """Z-ordered layout: manifest stats prune files for range predicates on
    EITHER interleaved column; a single-column sort only prunes its own."""
    from etl_backend_spark.sources.layout import zorder_sort

    cat = Catalog(spark, SF_DIR)
    o = cat.table("orders")

    zt = ManifestTable(spark, str(tmp_path), "z_orders", ["o_custkey", "o_orderkey"])
    zt.create(zorder_sort(o, "o_custkey", "o_orderkey", n_files=8))

    _, skipped_cust = zt.read_pruned("o_custkey", lo=None, hi=20)
    _, skipped_order = zt.read_pruned("o_orderkey", lo=None, hi=200)
    assert skipped_cust > 0
    assert skipped_order > 0

    # correctness: pruned read returns exactly the predicate's rows
    df, _ = zt.read_pruned("o_custkey", lo=None, hi=20)
    got = df.filter(F.col("o_custkey") <= 20).count()
    assert got == o.filter(F.col("o_custkey") <= 20).count()


def test_manifest_vacuum_reclaims_orphans(mtable):
    import os

    from etl_backend_spark.etl.manifest import vacuum

    t, o = mtable
    t.delete(F.col("o_orderkey").between(1, 100), "o_orderkey", lo=1, hi=100)
    n = t.read().count()
    res = vacuum(t)
    assert res["data_files"] > 0 and res["manifests"] > 0
    assert t.read().count() == n  # live data intact
    on_disk = sum(
        len(files) for _, _, files in os.walk(t.data_dir)
    )
    assert on_disk >= len(t.files())  # only live (+ _SUCCESS markers) remain


def test_stream_into_store_skips_replayed_batch(spark, tmp_path):
    """Calling the foreachBatch handler twice with the same batch_id must
    append once (the at-least-once replay contract)."""
    import os

    from etl_backend_spark.etl.writes import ParquetTableStore
    from etl_backend_spark.sources.catalog import Catalog

    store = ParquetTableStore(spark, str(tmp_path / "store"))
    ev = Catalog(spark, SF_DIR).table("events").limit(10)
    store.create("m", ev.limit(0))

    # the marker protocol of chat_pipeline.stream_into_store, driven directly
    markers = str(tmp_path / "ck" / "applied")

    def handle(batch_df, batch_id):
        os.makedirs(markers, exist_ok=True)
        marker = os.path.join(markers, str(batch_id))
        if os.path.exists(marker):
            return
        store.append("m", batch_df)
        open(marker, "w").close()

    handle(ev, 0)
    handle(ev, 0)  # replay of the same batch id
    handle(ev, 1)
    assert store.read("m").count() == 20


def test_manifest_commit_conflict_detected(mtable, spark):
    """Two writers deriving from the same snapshot: the second commit must
    fail with CommitConflict instead of silently dropping the first."""
    from etl_backend_spark.etl.manifest import CommitConflict

    t, o = mtable
    extra = o.limit(5)
    stale_parent = t._live_id()
    entries = t.files() + t._write_files(extra)
    t.append(extra)  # a competing writer lands first
    with pytest.raises(CommitConflict):
        t._commit(entries, parent=stale_parent)


def test_manifest_delete_retains_null_predicate_rows(spark, tmp_path):
    """SQL DELETE semantics: rows where the predicate evaluates to NULL are
    kept, not deleted."""
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 99.0)], "k LONG, v DOUBLE"
    )
    t = ManifestTable(spark, str(tmp_path), "nulls", ["k"])
    t.create(df)
    t.delete(F.col("v") > 50.0, "k")
    kept = sorted(r.k for r in t.read().collect())
    assert kept == [1, 2]  # k=2 has NULL predicate -> retained


def test_manifest_upsert_file_granular(mtable, spark):
    """MERGE: matched keys replaced, new keys inserted, disjoint files
    carried by reference (no rewrite)."""
    t, o = mtable
    before_paths = {e["path"] for e in t.files()}
    # key -1 cannot exist -> a genuine insert that keeps incoming's stats
    # range at [-1, 50], so interval pruning still carries key-disjoint files
    assert o.filter(F.col("o_orderkey") == -1).count() == 0
    incoming = (
        o.filter(F.col("o_orderkey").between(1, 50))
        .unionByName(o.limit(1).withColumn("o_orderkey", F.lit(-1).cast("long")))
        .withColumn("o_totalprice", F.lit(0.0))
    )
    res = t.upsert(incoming, "o_orderkey")
    assert res["carried"] >= 4  # key-disjoint chunks untouched
    assert ({e["path"] for e in t.files()} & before_paths)
    after = t.read()
    assert after.count() == o.count() + 1  # replaced, not duplicated
    assert (
        after.filter(F.col("o_orderkey").between(1, 50))
        .agg(F.sum("o_totalprice")).collect()[0][0] == 0.0
    )
    assert after.filter(F.col("o_orderkey") == -1).count() == 1


def test_manifest_time_travel(mtable, spark):
    t, o = mtable
    n0 = t.read().count()
    past = t._live_id()
    t.delete(F.col("o_orderkey") <= 500, "o_orderkey", lo=1, hi=500)
    assert t.read().count() < n0
    hist = t.history()
    assert hist[0] == t._live_id() and past in hist
    assert t.read_at(past).count() == n0


def test_manifest_delete_to_empty_file_set(spark, tmp_path):
    """Deleting every row of every touched file commits an empty rewrite
    cleanly (no schema-inference crash on a part-less directory)."""
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k LONG, v DOUBLE")
    t = ManifestTable(spark, str(tmp_path), "wipe", ["k"])
    t.create(df)
    t.delete(F.col("k") >= 0, "k")
    assert t.files() == []


def test_manifest_empty_table_readable(spark, tmp_path):
    """After deleting every row, read/read_pruned/read_at still work (the
    persisted schema covers the no-files state)."""
    df = spark.createDataFrame([(1, 1.0)], "k LONG, v DOUBLE")
    t = ManifestTable(spark, str(tmp_path), "empty", ["k"])
    t.create(df)
    pre = t._live_id()
    t.delete(F.col("k") >= 0, "k")
    assert t.read().count() == 0
    assert t.read().schema == df.schema
    got, skipped = t.read_pruned("k", lo=100)
    assert got.count() == 0
    assert t.read_at(pre).count() == 1
    t.append(df)  # still writable after empty state
    assert t.read().count() == 1


def test_manifest_crashed_holder_does_not_wedge(spark, tmp_path):
    """A lock file left by a crashed committer never blocks: the lock is an
    OS flock released by the kernel when the holder's fd closed (crash
    included), so a leftover lock FILE carries no lock. No staleness
    heuristic, hence no reclaim TOCTOU where a fresh holder's lock could
    be deleted out from under it."""
    import os

    df = spark.createDataFrame([(1, 1.0)], "k LONG, v DOUBLE")
    t = ManifestTable(spark, str(tmp_path), "locked", ["k"])
    t.create(df)
    lock = t._pointer() + ".lock"
    assert os.path.exists(lock)  # left over from create's commit — unheld
    t.append(df)  # must proceed immediately
    assert t.read().count() == 2


def test_manifest_live_lock_conflicts_fast(spark, tmp_path):
    """A HELD lock (live committer) times out to CommitConflict — and the
    loser's never-committed manifest file is cleaned up, not orphaned."""
    import fcntl
    import os

    from etl_backend_spark.etl.manifest import CommitConflict

    df = spark.createDataFrame([(1, 1.0)], "k LONG, v DOUBLE")
    t = ManifestTable(spark, str(tmp_path), "busy", ["k"])
    t.create(df)
    fd = os.open(t._pointer() + ".lock", os.O_CREAT | os.O_WRONLY)
    fcntl.flock(fd, fcntl.LOCK_EX)  # simulate a live committer mid-swap
    manifests_before = set(os.listdir(t.manifest_dir))
    try:
        with pytest.raises(CommitConflict):
            t._commit(t.files(), parent=t._live_id())
    finally:
        os.close(fd)
    assert set(os.listdir(t.manifest_dir)) == manifests_before


def test_append_once_replay_is_noop(spark, tmp_path):
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k LONG, v DOUBLE")
    t = ManifestTable(spark, str(tmp_path), "txn", ["k"])
    t.create(df)
    assert t.append_once(df, txn="b-0") is True
    assert t.read().count() == 4
    assert t.append_once(df, txn="b-0") is False  # replay
    assert t.read().count() == 4
    assert t.append_once(df, txn="b-1") is True
    assert t.read().count() == 6
    # tokens survive further commits (ancestor-set union)
    t.delete(F.col("k") > 100, "k")
    assert t.append_once(df, txn="b-1") is False


def test_stream_into_manifest_exactly_once(spark, tmp_path):
    """availableNow stream into the manifest table; rerunning the drained
    stream (fresh checkpoint, same batch ids) appends nothing."""
    import json as _json

    from etl_backend_spark.streaming import chat_pipeline as cp
    from tests.conftest import SF_DIR

    src = tmp_path / "json"
    src.mkdir()
    ev = Catalog(spark, SF_DIR).table("events").limit(30)
    rows = ev.collect()
    with open(src / "a.json", "w") as f:
        for r in rows:
            d = r.asDict()
            d["ts"] = d["ts"].isoformat() + "Z"
            f.write(_json.dumps(d) + "\n")

    t = ManifestTable(spark, str(tmp_path), "events_m", ["event_id"])
    t.create(spark.read.schema(cp.EVENT_WIRE_SCHEMA).json(str(src)).limit(0))

    stream = cp.read_json_stream(spark, str(src))
    w = cp.stream_into_manifest(stream, t, str(tmp_path / "ck1"))
    cp.run_available_now(w, "m1")
    n = t.read().count()
    assert n == 30

    # a DIFFERENT query (fresh checkpoint = new app id) is NOT deduped —
    # batch ids restart at 0 for every query, so the token must carry the
    # query identity (Delta's txnAppId) or a second stream would be dropped
    stream2 = cp.read_json_stream(spark, str(src))
    w2 = cp.stream_into_manifest(stream2, t, str(tmp_path / "ck2"))
    cp.run_available_now(w2, "m2")
    assert t.read().count() == 2 * n

    # the SAME logical query replayed (stable app id, lost checkpoint) IS
    # deduped: same (app, batch_id) tokens -> exact no-op
    stream3 = cp.read_json_stream(spark, str(src))
    w3 = cp.stream_into_manifest(
        stream3, t, str(tmp_path / "ck3"), txn_app_id="job-A"
    )
    cp.run_available_now(w3, "m3")
    assert t.read().count() == 3 * n
    stream4 = cp.read_json_stream(spark, str(src))
    w4 = cp.stream_into_manifest(
        stream4, t, str(tmp_path / "ck4"), txn_app_id="job-A"
    )
    cp.run_available_now(w4, "m4")
    assert t.read().count() == 3 * n  # replayed app:batch tokens -> no-op


def test_manifest_concurrent_appends_lose_nothing(spark, tmp_path):
    """Two threads appending concurrently with CommitConflict retry: every
    batch lands exactly once (the CAS turns racing commits into retries,
    never lost updates)."""
    import threading

    from etl_backend_spark.etl.manifest import CommitConflict

    df = spark.createDataFrame([(1, 1.0)], "k LONG, v DOUBLE")
    t = ManifestTable(spark, str(tmp_path), "race", ["k"])
    t.create(df.limit(0))
    errors = []

    def writer(tag):
        try:
            for i in range(5):
                batch = spark.createDataFrame(
                    [(tag * 100 + i, float(i))], "k LONG, v DOUBLE"
                )
                for attempt in range(30):
                    try:
                        t.append_once(batch, txn=f"w{tag}-b{i}")
                        break
                    except CommitConflict:
                        if attempt == 29:
                            raise
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(tag,)) for tag in (1, 2)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    keys = sorted(r.k for r in t.read().collect())
    assert keys == sorted([100 + i for i in range(5)] + [200 + i for i in range(5)])
    # and replaying any token after the dust settles is a no-op
    assert t.append_once(df, txn="w1-b0") is False


def test_manifest_concurrent_upserts_lose_nothing(spark, tmp_path):
    """r13 VERDICT #5 (merge half): two writers UPSERTING concurrently —
    including keys that land in the SAME data file, so both writers
    rewrite the same entries — must converge with no silent lost update:
    the CAS turns the race into a retry, and the retry re-derives its
    rewrite from the WINNER's snapshot. Final state = both writers'
    rows, each key exactly once with its writer's value."""
    import threading

    from etl_backend_spark.etl.manifest import CommitConflict

    base = spark.createDataFrame(
        [(k, 0.0) for k in range(20)], "k LONG, v DOUBLE")
    t = ManifestTable(spark, str(tmp_path), "merge-race", ["k"])
    t.create(base.coalesce(1))  # one file => every upsert rewrites it
    errors = []

    def writer(tag):
        try:
            for i in range(3):
                # writer 1 owns even keys, writer 2 odd — disjoint keys,
                # same physical file
                keys = [k for k in range(20) if k % 2 == (tag % 2)][i::3]
                batch = spark.createDataFrame(
                    [(k, float(tag)) for k in keys], "k LONG, v DOUBLE")
                for attempt in range(30):
                    try:
                        t.upsert(batch, "k")
                        break
                    except CommitConflict:
                        if attempt == 29:
                            raise
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(tag,))
               for tag in (1, 2)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    rows = {r.k: r.v for r in t.read().collect()}
    assert len(rows) == 20  # no duplicated or vanished keys
    assert rows == {k: float(1 if k % 2 == 1 else 2) for k in range(20)}


def test_commit_conflict_discards_loser_batch(mtable, spark):
    """A losing CAS must not leak its data files or manifest: the retry
    rewrites from the caller's df, so the orphaned batch would accumulate
    forever under the stream_into_manifest retry loop."""
    import os

    from etl_backend_spark.etl.manifest import CommitConflict

    t, o = mtable
    extra = o.limit(5)
    stale_parent = t._live_id()
    new = t._write_files(extra)
    loser_dirs = {os.path.dirname(e["path"]) for e in new}
    entries = t.files() + new
    t.append(extra)  # competing writer lands first
    manifests_live = set(os.listdir(t.manifest_dir))
    with pytest.raises(CommitConflict):
        t._commit_or_discard(entries, new, parent=stale_parent)
    assert all(not os.path.isdir(d) for d in loser_dirs)  # batch reclaimed
    assert set(os.listdir(t.manifest_dir)) == manifests_live  # no orphan json
    live_paths = {e["path"] for e in t.files()}
    assert all(os.path.exists(p) for p in live_paths)  # winner intact


def test_upsert_rejects_duplicate_and_null_keys(spark, tmp_path):
    """MERGE requires a unique non-null source key (Delta raises on
    multiple source matches); silent acceptance would land both copies."""
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k LONG, v DOUBLE")
    t = ManifestTable(spark, str(tmp_path), "dup", ["k"])
    t.create(df)
    dup = spark.createDataFrame([(1, 9.0), (1, 8.0)], "k LONG, v DOUBLE")
    with pytest.raises(ValueError, match="duplicate or NULL"):
        t.upsert(dup, "k")
    withnull = spark.createDataFrame([(None, 9.0), (3, 8.0)], "k LONG, v DOUBLE")
    with pytest.raises(ValueError, match="duplicate or NULL"):
        t.upsert(withnull, "k")
    assert t.read().count() == 2  # table unchanged by the rejected merges


def test_crash_after_data_write_before_commit_replays_exactly_once(
    spark, tmp_path,
):
    """Crash point A: writer dies after its data files land but before
    _commit. The pointer never moved, so the re-run (same txn) must apply
    the batch exactly once; the crashed batch is unreferenced and vacuum
    reclaims it."""
    import os

    from etl_backend_spark.etl.manifest import vacuum

    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k LONG, v DOUBLE")
    t = ManifestTable(spark, str(tmp_path), "crashA", ["k"])
    t.create(df)
    batch = spark.createDataFrame([(10, 1.0)], "k LONG, v DOUBLE")
    t._write_files(batch)  # simulated crash: files written, no commit
    assert t.read().count() == 2  # reader never sees the uncommitted batch
    assert t.append_once(batch, txn="retry-1") is True  # driver re-runs
    assert t.append_once(batch, txn="retry-1") is False
    assert t.read().count() == 3
    assert [r.k for r in t.read().filter(F.col("k") == 10).collect()] == [10]
    res = vacuum(t)
    assert res["data_files"] >= 1  # the crashed batch is reclaimed
    assert t.read().count() == 3


def test_crash_after_manifest_write_before_swap_replays_exactly_once(
    spark, tmp_path, monkeypatch,
):
    """Crash point B: writer dies after its manifest json is durable but
    before the pointer swap. _CURRENT still names the parent, so the
    half-commit is invisible; the re-run applies once and vacuum drops the
    orphaned manifest."""
    import os

    import etl_backend_spark.etl.manifest as mmod
    from etl_backend_spark.etl.manifest import vacuum

    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k LONG, v DOUBLE")
    t = ManifestTable(spark, str(tmp_path), "crashB", ["k"])
    t.create(df)
    batch = spark.createDataFrame([(10, 1.0)], "k LONG, v DOUBLE")

    real_replace = os.replace

    def dying_replace(src, dst):
        raise KeyboardInterrupt("simulated kill between manifest and swap")

    monkeypatch.setattr(mmod.os, "replace", dying_replace)
    with pytest.raises(KeyboardInterrupt):
        t.append_once(batch, txn="retry-2")
    monkeypatch.setattr(mmod.os, "replace", real_replace)

    assert t.read().count() == 2  # half-commit invisible
    assert t.append_once(batch, txn="retry-2") is True  # re-run applies
    assert t.append_once(batch, txn="retry-2") is False
    assert t.read().count() == 3
    vacuum(t)
    assert t.read().count() == 3
    # exactly one manifest (the live one) survives vacuum
    assert len(os.listdir(t.manifest_dir)) == 1


# ----------------------------------------------------------- schema evolution

def test_append_rejects_schema_drift_without_evolve(spark, tmp_path):
    o = Catalog(spark, SF_DIR).table("orders").select("o_orderkey", "o_totalprice")
    t = ManifestTable(spark, str(tmp_path), "orders", ["o_orderkey"])
    t.create(o.filter(F.col("o_orderkey") <= 100))
    drifted = o.filter(F.col("o_orderkey") > 100).withColumn(
        "o_channel", F.lit("web")
    )
    with pytest.raises(ValueError, match="evolve=True"):
        t.append(drifted)


def test_additive_evolution_and_snapshot_schemas(spark, tmp_path):
    """ADD COLUMN semantics: old rows read null for the new column, the
    creation snapshot keeps the OLD column set, and a post-evolution
    mutation (delete rewriting mixed-schema files) must not drop the new
    column."""
    o = Catalog(spark, SF_DIR).table("orders").select("o_orderkey", "o_totalprice")
    t = ManifestTable(spark, str(tmp_path), "orders", ["o_orderkey"])
    base = o.filter(F.col("o_orderkey") <= 100)
    t.create(base)
    n_base = base.count()
    incoming = (
        o.filter((F.col("o_orderkey") > 100) & (F.col("o_orderkey") <= 200))
        .withColumn("o_channel", F.lit("web"))
    )
    n_new = incoming.count()
    t.append(incoming, evolve=True)

    live = t.read()
    assert live.columns == ["o_orderkey", "o_totalprice", "o_channel"]
    assert live.count() == n_base + n_new
    assert live.filter(F.col("o_channel").isNull()).count() == n_base
    assert live.filter(F.col("o_channel") == "web").count() == n_new

    v0 = t.history()[-1]
    snap = t.read_at(v0)
    assert snap.columns == ["o_orderkey", "o_totalprice"]  # pre-evolution
    assert snap.count() == n_base

    # batch MISSING live columns needs no evolve flag at all (Delta
    # semantics: a pre-evolution producer keeps working) — null-filled
    missing = o.filter(F.col("o_orderkey") > 1400).select("o_orderkey")
    t.append(missing)

    # mutation across mixed-schema files keeps the evolved column
    t.delete((F.col("o_orderkey") % 2 == 1), "o_orderkey")
    after = t.read()
    assert after.columns == ["o_orderkey", "o_totalprice", "o_channel"]
    assert after.filter(F.col("o_channel") == "web").count() == \
        incoming.filter(F.col("o_orderkey") % 2 == 0).count()


def test_evolution_survives_compaction(spark, tmp_path):
    o = Catalog(spark, SF_DIR).table("orders").select("o_orderkey", "o_totalprice")
    t = ManifestTable(spark, str(tmp_path), "orders", ["o_orderkey"])
    t.create(o.filter(F.col("o_orderkey") <= 100).repartition(4))
    t.append(
        o.filter((F.col("o_orderkey") > 100) & (F.col("o_orderkey") <= 200))
        .withColumn("o_channel", F.lit("web")).repartition(4),
        evolve=True,
    )
    before = t.read().filter(F.col("o_channel") == "web").count()
    t.compact(target_rows=100_000)
    after = t.read()
    assert after.columns == ["o_orderkey", "o_totalprice", "o_channel"]
    assert after.filter(F.col("o_channel") == "web").count() == before


def test_crash_during_compact_leaves_table_intact(spark, tmp_path, monkeypatch):
    """A compaction that dies between writing its merged files and the
    pointer swap must leave the live table byte-identical; the orphaned
    merge output is reclaimable by vacuum."""
    from etl_backend_spark.etl import manifest as M

    o = Catalog(spark, SF_DIR).table("orders")
    t = ManifestTable(spark, str(tmp_path), "orders", ["o_orderkey"])
    t.create(o.repartition(8))
    before = sorted(e["path"] for e in t.files())
    n_before = t.read().count()

    real_commit = t._commit

    def dying_commit(*a, **k):
        raise RuntimeError("killed before pointer swap")

    monkeypatch.setattr(t, "_commit", dying_commit)
    with pytest.raises(RuntimeError, match="pointer swap"):
        t.compact(target_rows=100_000)
    monkeypatch.setattr(t, "_commit", real_commit)

    # live state untouched
    assert sorted(e["path"] for e in t.files()) == before
    assert t.read().count() == n_before
    # vacuum reclaims the orphaned merge output
    stats = M.vacuum(t)
    assert stats["data_files"] > 0
    assert t.read().count() == n_before  # still intact after vacuum


def test_concurrent_evolution_and_append_converge(spark, tmp_path):
    """Writer A evolves the schema while writer B appends the old column
    set from the SAME snapshot: the CAS rejects the loser, and the retry
    (old-schema batch, no evolve flag) null-fills into the widened
    table — no lost update, no rejected producer."""
    from etl_backend_spark.etl.manifest import CommitConflict

    o = Catalog(spark, SF_DIR).table("orders").select("o_orderkey", "o_totalprice")
    t = ManifestTable(spark, str(tmp_path), "orders", ["o_orderkey"])
    t.create(o.filter(F.col("o_orderkey") <= 100))

    evolved = (
        o.filter((F.col("o_orderkey") > 100) & (F.col("o_orderkey") <= 200))
        .withColumn("o_channel", F.lit("web"))
    )
    old_style = o.filter((F.col("o_orderkey") > 1400))

    # both writers snapshot the same parent: A commits first, B conflicts
    tb = ManifestTable(spark, str(tmp_path), "orders", ["o_orderkey"])
    parent_b, manifest_b = tb._snapshot()
    t.append(evolved, evolve=True)  # writer A wins
    new_b = tb._write_files(old_style)
    with pytest.raises(CommitConflict):
        tb._commit_or_discard(
            manifest_b["entries"] + new_b, new_b, parent=parent_b
        )
    tb.append(old_style)  # B's retry: plain append into the evolved table

    live = t.read()
    assert live.columns == ["o_orderkey", "o_totalprice", "o_channel"]
    assert live.count() == (
        o.filter(F.col("o_orderkey") <= 100).count()
        + evolved.count()
        + old_style.count()
    )
    # B's rows landed with the new column null-filled
    assert live.filter(
        (F.col("o_orderkey") > 1400) & F.col("o_channel").isNull()
    ).count() == old_style.count()


def test_append_rejects_type_drift(spark, tmp_path):
    """A batch column sharing a live column's name with an incompatible
    type must fail AT WRITE TIME — not land and surface later as a parquet
    conversion error on a declared-schema read."""
    t = ManifestTable(spark, str(tmp_path), "t", ["k"])
    t.create(spark.createDataFrame([(1, 10.5)], "k bigint, v double"))
    bad = spark.createDataFrame([(2, "oops")], "k bigint, v string")
    with pytest.raises(ValueError, match="type mismatch.*v.*string.*double"):
        t.append(bad)
    # evolve=True does not bless type CHANGES either (additive only)
    with pytest.raises(ValueError, match="type mismatch"):
        t.append(bad, evolve=True)
    assert t.read().count() == 1  # nothing committed


def test_append_widens_lossless_numeric_types(spark, tmp_path):
    """int -> bigint and float -> double batch columns upcast silently
    (lossless); the stored file carries the LIVE types so declared-schema
    reads never hit a parquet type conflict."""
    t = ManifestTable(spark, str(tmp_path), "t", ["k"])
    t.create(spark.createDataFrame([(1, 1.5)], "k bigint, v double"))
    t.append(spark.createDataFrame([(2, 2.5)], "k int, v float"))
    got = t.read().orderBy("k")
    assert [f.dataType.simpleString() for f in got.schema.fields] == [
        "bigint", "double"]
    assert [(r.k, r.v) for r in got.collect()] == [(1, 1.5), (2, 2.5)]


def test_upsert_applies_align_contract(spark, tmp_path):
    """upsert rides _align_to_live like append: extra columns raise
    loudly (previously written as-is and invisible on declared-schema
    reads), missing columns null-fill, type drift raises."""
    t = ManifestTable(spark, str(tmp_path), "t", ["k"])
    t.create(spark.createDataFrame([(1, "a", 10)], "k bigint, s string, v bigint"))
    with pytest.raises(ValueError, match="extra columns.*junk"):
        t.upsert(spark.createDataFrame([(1, "b", 1, 9)],
                                       "k bigint, s string, junk int, v bigint"),
                 key="k")
    with pytest.raises(ValueError, match="type mismatch"):
        t.upsert(spark.createDataFrame([(1, 2.5, 9)],
                                       "k bigint, s double, v bigint"), key="k")
    # missing column null-fills and the merge still lands
    t.upsert(spark.createDataFrame([(1, "b"), (2, "c")], "k bigint, s string"),
             key="k")
    got = {r.k: (r.s, r.v) for r in t.read().collect()}
    assert got == {1: ("b", None), 2: ("c", None)}


def test_zorder_n_prunes_on_all_three_dimensions(spark, tmp_path):
    """3-column Morton layout: manifest stats prune files for a range
    predicate on EACH of the three interleaved columns."""
    from etl_backend_spark.sources.layout import zorder_sort_n

    cat = Catalog(spark, SF_DIR)
    li = cat.table("lineitem")
    cols = ["l_orderkey", "l_partkey", "l_suppkey"]
    t = ManifestTable(spark, str(tmp_path), "z3_lineitem", cols)
    t.create(zorder_sort_n(li, cols, n_files=8))
    for c in cols:
        hi = li.agg(F.expr(f"percentile({c}, 0.2)")).collect()[0][0]
        _, skipped = t.read_pruned(c, lo=None, hi=int(hi))
        assert skipped > 0, c


def test_bloom_prunes_unsorted_point_lookup(spark, tmp_path):
    """The bloom prune works exactly where zone maps fail: an UNSORTED
    layout gives every file a [min,max] interval spanning the whole key
    domain (min/max skips nothing), yet a point lookup skips most files
    via the per-file bloom — and returns exactly the right rows."""
    cat = Catalog(spark, SF_DIR)
    # shuffle rows so each file's o_orderkey range spans ~everything
    o = cat.table("orders").repartition(8)

    t = ManifestTable(spark, str(tmp_path), "bloom_orders",
                      ["o_orderkey"], bloom_col="o_orderkey")
    t.create(o)

    key = o.limit(1).collect()[0].o_orderkey
    _, skipped_minmax = t.read_pruned("o_orderkey", lo=key, hi=key)
    df, skipped_bloom = t.read_pruned_bloom(key)
    assert skipped_minmax == 0          # zone maps are useless here
    assert skipped_bloom > 0            # blooms are not
    got = df.filter(F.col("o_orderkey") == key).count()
    want = cat.table("orders").filter(F.col("o_orderkey") == key).count()
    assert got == want > 0
    # a definitely-absent key skips EVERY file
    _, skipped_all = t.read_pruned_bloom(-987654321)
    assert skipped_all == len(t.files())


def test_bloom_positions_python_matches_spark(spark):
    """The probe side recomputes write-side positions bit-for-bit: one
    Spark job checks 20 values against the pure-Python twin."""
    from etl_backend_spark.etl.manifest import _bloom_pos, bloom_positions

    vals = [0, 1, 42, 4242, 999999, -7] + list(range(100, 114))
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    rows = df.select(
        "v", *[_bloom_pos("v", i, 8192).alias(f"p{i}") for i in range(4)]
    ).collect()
    for r in rows:
        assert [r.p0, r.p1, r.p2, r.p3] == bloom_positions(r.v, 4, 8192)


def test_table_constraints_reject_bad_batch_at_append(spark, tmp_path):
    """Declared table checks fail the COMMIT: a violating batch raises
    with per-rule counts and leaves the table untouched; a clean batch
    appends normally."""
    import pytest

    o = Catalog(spark, SF_DIR).table("orders").limit(50)
    t = ManifestTable(spark, str(tmp_path), "checked", ["o_orderkey"])
    t.create(o)
    t.table_checks = [
        ("not_null", ["o_orderpriority"]),
        ("enum", "o_orderstatus", ["O", "F", "P"]),
        ("unique", ["o_orderkey"]),
    ]
    n = t.read().count()
    bad = o.limit(5).withColumn("o_orderstatus", F.lit("ZZZ"))
    with pytest.raises(ValueError, match="enum"):
        t.append(bad)
    dup = o.limit(2).withColumn("o_orderkey", F.lit(7))
    with pytest.raises(ValueError, match="unique"):
        t.append(dup)
    assert t.read().count() == n  # nothing landed
    t.append(o.limit(3).withColumn(
        "o_orderkey", F.col("o_orderkey") + 1_000_000))
    assert t.read().count() == n + 3


def test_append_with_quarantine_routes_bad_rows(spark, tmp_path):
    """Violating rows land in the quarantine table, clean rows append,
    counts report both, and a batch-level duplicate key still hard-fails."""
    import pytest

    o = Catalog(spark, SF_DIR).table("orders").limit(20)
    t = ManifestTable(spark, str(tmp_path), "main", ["o_orderkey"])
    t.create(o)
    q = ManifestTable(spark, str(tmp_path), "quarantine", ["o_orderkey"])
    q.create(o.limit(0))
    t.table_checks = [("enum", "o_orderstatus", ["O", "F", "P"]),
                      ("unique", ["o_orderkey"])]
    n = t.read().count()
    batch = (
        o.limit(6)
        .withColumn("o_orderkey", F.col("o_orderkey") + 1_000_000)
        .withColumn(
            "o_orderstatus",
            F.when(F.col("o_orderkey") % 2 == 0, F.lit("ZZZ"))
            .otherwise(F.col("o_orderstatus")),
        )
    )
    res = t.append_with_quarantine(batch, q)
    assert res["appended"] + res["quarantined"] == 6
    assert res["quarantined"] > 0
    assert t.read().count() == n + res["appended"]
    assert q.read().count() == res["quarantined"]
    assert t.read().filter(F.col("o_orderstatus") == "ZZZ").count() == 0
    dup = o.limit(2).withColumn("o_orderkey", F.lit(7))
    with pytest.raises(ValueError, match="unique"):
        t.append_with_quarantine(dup, q)


def test_quarantine_commits_nothing_when_clean_slice_has_dup_keys(
        spark, tmp_path):
    """A batch carrying BOTH row-level violations and duplicate keys in the
    clean slice must abort with NOTHING durably written: the unique check
    runs on the clean slice BEFORE the quarantine commit, so the bad rows
    are not left committed to quarantine while the main append raises."""
    import pytest

    o = Catalog(spark, SF_DIR).table("orders").limit(20)
    t = ManifestTable(spark, str(tmp_path), "main2", ["o_orderkey"])
    t.create(o)
    q = ManifestTable(spark, str(tmp_path), "quarantine2", ["o_orderkey"])
    q.create(o.limit(0))
    t.table_checks = [("enum", "o_orderstatus", ["O", "F", "P"]),
                      ("unique", ["o_orderkey"])]
    n_main, n_q = t.read().count(), q.read().count()
    # 2 clean rows sharing one key (duplicate) + 2 enum-violating rows
    batch = (
        o.limit(2).withColumn("o_orderkey", F.lit(9_000_000))
        .unionByName(
            o.limit(2)
            .withColumn("o_orderkey", F.col("o_orderkey") + 8_000_000)
            .withColumn("o_orderstatus", F.lit("ZZZ"))
        )
    )
    with pytest.raises(ValueError, match="unique"):
        t.append_with_quarantine(batch, q)
    assert t.read().count() == n_main  # main untouched
    assert q.read().count() == n_q     # quarantine untouched too


def test_quarantine_with_txn_is_exactly_once_under_retries(spark, tmp_path):
    """The ADVICE-r6 crash window, closed by the txn token: a retry that
    arrives AFTER the quarantine commit but with the clean append never
    landed (simulated by pre-committing the derived quarantine token)
    must no-op the quarantine side (no duplicate bad rows) and still
    apply the clean side; a full replay of the same token no-ops both."""
    o = Catalog(spark, SF_DIR).table("orders").limit(20)
    t = ManifestTable(spark, str(tmp_path), "main3", ["o_orderkey"])
    t.create(o)
    q = ManifestTable(spark, str(tmp_path), "quarantine3", ["o_orderkey"])
    q.create(o.limit(0))
    t.table_checks = [("enum", "o_orderstatus", ["O", "F", "P"]),
                      ("unique", ["o_orderkey"])]
    n_main = t.read().count()
    batch = (
        o.limit(6)
        .withColumn("o_orderkey", F.col("o_orderkey") + 2_000_000)
        .withColumn(
            "o_orderstatus",
            F.when(F.col("o_orderkey") % 2 == 0, F.lit("ZZZ"))
            .otherwise(F.col("o_orderstatus")),
        )
    )
    bad = batch.filter(F.col("o_orderstatus") == "ZZZ")
    n_bad = bad.count()
    assert 0 < n_bad < 6
    # attempt 1 crashed between the two commits: quarantine already durable
    assert q.append_once(bad, txn="b7:quarantine") is True
    # the caller's retry of the whole batch
    res = t.append_with_quarantine(batch, q, txn="b7")
    assert res == {"appended": 6 - n_bad, "quarantined": 0}
    assert q.read().count() == n_bad          # NOT re-quarantined
    assert t.read().count() == n_main + 6 - n_bad
    # full replay: both sides no-op, tables unchanged
    res2 = t.append_with_quarantine(batch, q, txn="b7")
    assert res2 == {"appended": 0, "quarantined": 0}
    assert q.read().count() == n_bad
    assert t.read().count() == n_main + 6 - n_bad
    # a fresh token applies normally and reports both sides
    batch2 = batch.withColumn("o_orderkey", F.col("o_orderkey") + 50)
    res3 = t.append_with_quarantine(batch2, q, txn="b8")
    assert res3 == {"appended": 6 - n_bad, "quarantined": n_bad}


def test_bloom_probe_uses_written_geometry(spark, tmp_path):
    """A reader opened with DIFFERENT bloom geometry than the writer must
    probe each entry with the geometry the file was WRITTEN with (m from
    the stored bit-array length, k from the entry) — probing mod the wrong
    m turns real hits into definitive misses and silently drops files that
    DO contain the value (ADVICE r5, medium)."""
    o = Catalog(spark, SF_DIR).table("orders").repartition(8)
    writer = ManifestTable(spark, str(tmp_path), "geom", ["o_orderkey"],
                           bloom_col="o_orderkey", bloom_bits=65536)
    writer.create(o)
    key = o.limit(1).collect()[0].o_orderkey
    want = o.filter(F.col("o_orderkey") == key).count()

    # reopen with the 8192 default — entry geometry must win
    reader = ManifestTable(spark, str(tmp_path), "geom", ["o_orderkey"],
                           bloom_col="o_orderkey")
    df, skipped = reader.read_pruned_bloom(key)
    got = df.filter(F.col("o_orderkey") == key).count()
    assert got == want > 0   # no silently-pruned files
    assert skipped > 0       # and the bloom still prunes
    # absent key: every entry skipped under the written geometry too
    _, skipped_all = reader.read_pruned_bloom(-123456789)
    assert skipped_all == len(reader.files())


def test_restore_makes_past_snapshot_live_again(spark, tmp_path):
    """RESTORE: after a delete, restoring the pre-delete manifest brings
    the data back via a NEW forward commit (history intact, zero data
    I/O), and restore refuses when the target's files were vacuumed."""
    import pytest

    from etl_backend_spark.etl.manifest import vacuum

    o = Catalog(spark, SF_DIR).table("orders").limit(100)
    t = ManifestTable(spark, str(tmp_path), "r_orders", ["o_orderkey"])
    t.create(o)
    before = t._live_id()
    n0 = t.read().count()
    t.delete(F.col("o_orderkey") >= 0, "o_orderkey")  # nuke everything
    assert t.read().count() == 0
    new_id = t.restore(before)
    assert t.read().count() == n0
    # history moved FORWARD: the delete commit is still an ancestor
    assert before in t.history() and new_id == t.history()[0]
    # vacuumed target refuses loudly
    t.delete(F.col("o_orderkey") >= 0, "o_orderkey")
    vacuum(t)
    with pytest.raises(ValueError, match="vacuumed"):
        t.restore(new_id)


def test_deletion_vectors_merge_on_read_and_compact(spark, tmp_path):
    """Merge-on-read DELETE: delete_dv commits positions, not rewrites —
    reads (plain, pruned, time-travel) apply the anti-join; stacked DVs
    compose; copy-on-write mutations refuse until compact_dv folds the
    vectors back into data files; after folding the data files actually
    shrank and reads are unchanged."""
    import pytest

    o = Catalog(spark, SF_DIR).table("orders")
    t = ManifestTable(spark, str(tmp_path), "dv_orders", ["o_orderkey"])
    t.create(o.repartition(4))
    pre_mid = t._live_id()
    n0 = t.read().count()
    n_f = o.filter(F.col("o_orderstatus") == "F").count()

    res = t.delete_dv(F.col("o_orderstatus") == "F")
    assert res["marked"] == n_f > 0
    assert t.read().count() == n0 - n_f
    assert t.read().filter(F.col("o_orderstatus") == "F").count() == 0
    # no data file was rewritten — same entry list as before
    assert {e["path"] for e in t.files()} == {
        e["path"] for e in t._manifest_at(pre_mid)["entries"]
    }
    # pruned reads apply DVs too
    key = int(o.filter(F.col("o_orderstatus") == "F")
              .limit(1).collect()[0].o_orderkey)
    df, _ = t.read_pruned("o_orderkey", lo=key, hi=key)
    assert df.filter(F.col("o_orderkey") == key).count() == 0
    # time travel: the pre-delete snapshot still has every row
    assert t.read_at(pre_mid).count() == n0

    # stacked second DV
    n_p = t.read().filter(F.col("o_orderpriority") == "1-URGENT").count()
    t.delete_dv(F.col("o_orderpriority") == "1-URGENT")
    assert t.read().count() == n0 - n_f - n_p

    # copy-on-write ops refuse while DVs are live
    with pytest.raises(ValueError, match="compact_dv"):
        t.delete(F.col("o_orderkey") < 0, "o_orderkey", lo=None, hi=0)
    with pytest.raises(ValueError, match="compact_dv"):
        t.upsert(o.limit(1), "o_orderkey")

    expect = sorted(map(tuple, t.read().collect()))
    res = t.compact_dv()
    assert res["rewritten"] > 0
    assert not t._live_manifest().get("dvs")
    assert sorted(map(tuple, t.read().collect())) == expect
    # and the fold really dropped the rows from the files
    assert sum(e["rows"] for e in t.files()) == n0 - n_f - n_p
    # rewrite ops work again
    t.delete(F.col("o_orderkey") < 0, "o_orderkey", lo=None, hi=0)


def test_delete_dv_conflicts_with_concurrent_commit(spark, tmp_path):
    """delete_dv rides the same CAS as every other mutation: a commit
    landing between its snapshot and its pointer swap must raise
    CommitConflict, never silently drop either change."""
    import pytest

    from etl_backend_spark.etl.manifest import CommitConflict

    o = Catalog(spark, SF_DIR).table("orders").limit(50)
    t = ManifestTable(spark, str(tmp_path), "dvc", ["o_orderkey"])
    t.create(o)
    parent, manifest = t._snapshot()
    # competing writer lands first
    t.append(o.limit(3).withColumn("o_orderkey",
                                   F.col("o_orderkey") + 5_000_000))
    with pytest.raises(CommitConflict):
        t._commit(manifest["entries"], parent=parent, dvs=["bogus-dv"])
    # the losing DV never became visible
    assert not t._live_manifest().get("dvs")


def test_vacuum_reclaims_folded_dv_sidecars(spark, tmp_path):
    """After compact_dv folds the vectors, the sidecar dirs remain for
    time travel; vacuum removes every DV dir the LIVE manifest no longer
    references (and keeps live ones)."""
    import os

    from etl_backend_spark.etl.manifest import vacuum

    o = Catalog(spark, SF_DIR).table("orders").limit(100)
    t = ManifestTable(spark, str(tmp_path), "dvv", ["o_orderkey"])
    t.create(o.repartition(4))
    t.delete_dv(F.col("o_orderstatus") == "F")
    dv_root = os.path.join(t.dir, "dv")
    assert len(os.listdir(dv_root)) == 1
    n = t.read().count()
    t.compact_dv()
    res = vacuum(t)
    assert res["dv_dirs"] == 1
    assert not os.listdir(dv_root)
    assert t.read().count() == n  # live data intact

    # a LIVE (unfolded) DV must survive vacuum
    t.delete_dv(F.col("o_orderpriority") == "1-URGENT")
    n2 = t.read().count()
    res = vacuum(t)
    assert res["dv_dirs"] == 0
    assert len(os.listdir(dv_root)) == 1
    assert t.read().count() == n2


def test_restore_carries_target_snapshot_dvs(spark, tmp_path):
    """RESTORE across deletion-vector commits: restoring the pre-delete
    snapshot must NOT inherit the live DVs (rows would stay deleted), and
    restoring a DV-bearing snapshot must reapply exactly its vectors."""
    o = Catalog(spark, SF_DIR).table("orders").limit(100)
    t = ManifestTable(spark, str(tmp_path), "dvr", ["o_orderkey"])
    t.create(o.repartition(4))
    pre = t._live_id()
    n0 = t.read().count()
    t.delete_dv(F.col("o_orderstatus") == "F")
    with_dv = t._live_id()
    n1 = t.read().count()
    assert n1 < n0

    t.restore(pre)
    assert t.read().count() == n0      # DVs NOT inherited
    t.restore(with_dv)
    assert t.read().count() == n1      # target's DVs reapplied


def test_shallow_clone_is_zero_copy_and_isolated(spark, tmp_path):
    """clone_shallow shares the source's files as pure metadata, then the
    two lineages diverge without touching each other's storage — and the
    clone's vacuum can never reclaim source files (it only walks its own
    data_dir)."""
    import os

    from etl_backend_spark.etl.manifest import clone_shallow, vacuum

    o = Catalog(spark, SF_DIR).table("orders").limit(500)
    t = ManifestTable(spark, str(tmp_path), "src", ["o_orderkey"])
    t.create(o.repartition(4))
    src_paths = {e["path"] for e in t.files()}

    c = clone_shallow(t, str(tmp_path), "fork")
    assert {e["path"] for e in c.files()} == src_paths
    assert not any(
        f.endswith(".parquet")
        for _, _, fs in os.walk(c.data_dir) for f in fs
    )
    assert c.read().count() == 500

    # clone-side mutations: DV delete + append land only in the clone
    n_f = c.read().filter(F.col("o_orderstatus") == "F").count()
    c.delete_dv(F.col("o_orderstatus") == "F")
    c.append(o.filter(F.col("o_orderkey") <= 100))
    n_extra = o.filter(F.col("o_orderkey") <= 100).count()
    assert c.read().count() == 500 - n_f + n_extra
    assert t.read().count() == 500                      # source untouched
    assert not os.path.isdir(os.path.join(t.dir, "dv"))  # DVs under clone

    # source-side append invisible to the clone
    n_clone = c.read().count()
    t.append(o.filter(F.col("o_orderkey") <= 50))
    assert c.read().count() == n_clone

    # clone time travel: its creation snapshot is the source as-cloned
    assert c.read_at(c.history()[-1]).count() == 500

    # vacuum on the CLONE must not reclaim any shared source file
    vacuum(c)
    for p in src_paths:
        assert os.path.exists(p)
    assert c.read().count() == n_clone

    # fresh txn namespace: an append_once token replays as a new write
    tok = "batch-42"
    t2 = clone_shallow(t, str(tmp_path), "fork2")
    t2.append_once(o.filter(F.col("o_orderkey") <= 10), txn=tok)
    n2 = t2.read().count()
    t2.append_once(o.filter(F.col("o_orderkey") <= 10), txn=tok)
    assert t2.read().count() == n2  # replay within the clone is a no-op
