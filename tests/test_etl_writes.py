"""Tests for the parquet rewrite-and-swap mutation layer: post-state
correctness, upsert idempotence, cascade integrity, vacuum, atomic pointer."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_backend_spark.etl.writes import ParquetTableStore, cascade_delete_user, touch_parent
from etl_backend_spark.sources.catalog import Catalog
from tests.conftest import SF_DIR


@pytest.fixture()
def store(spark, tmp_path):
    cat = Catalog(spark, SF_DIR)
    s = ParquetTableStore(spark, str(tmp_path / "store"))
    for t in ("region", "customer", "orders", "lineitem"):
        s.create(t, cat.table(t))
    return s


def test_append_adds_rows_without_rewrite(store, spark):
    before = store.read("region").count()
    ver_dir_before = store._version_dir("region", store._current_version("region"))
    new = spark.createDataFrame([(98, "NARNIA")], store.read("region").schema)
    store.append("region", new)
    assert store.read("region").count() == before + 1
    # same version dir — append is file-add, not a rewrite
    assert store._current_version("region") is not None
    assert ver_dir_before == store._version_dir("region", store._current_version("region"))


def test_update_soft_delete(store):
    store.update(
        "orders",
        {"o_orderstatus": F.lit("deleted")},
        F.col("o_totalprice") > 400000.0,
    )
    out = store.read("orders")
    assert out.filter((F.col("o_totalprice") > 400000.0)
                      & (F.col("o_orderstatus") != "deleted")).count() == 0
    assert out.filter((F.col("o_totalprice") <= 400000.0)
                      & (F.col("o_orderstatus") == "deleted")).count() == 0


def test_delete_removes_only_matching(store):
    before = store.read("orders")
    n_f = before.filter(F.col("o_orderstatus") == "F").count()
    n = before.count()
    store.delete("orders", F.col("o_orderstatus") == "F")
    after = store.read("orders")
    assert after.count() == n - n_f
    assert after.filter(F.col("o_orderstatus") == "F").count() == 0


def test_upsert_idempotent(store, spark):
    incoming = spark.createDataFrame(
        [(0, "AFRICA-DUP"), (55, "ATLANTIS")], store.read("region").schema
    )
    base = store.read("region").count()
    store.upsert("region", incoming, ["r_regionkey"])
    once = store.read("region").count()
    assert once == base + 1  # key 0 exists already, only 55 inserted
    store.upsert("region", incoming, ["r_regionkey"])
    assert store.read("region").count() == once  # run twice == run once
    name = store.read("region").filter(F.col("r_regionkey") == 0).collect()[0].r_name
    assert name != "AFRICA-DUP"  # existing row untouched (empty update:{})


def test_cascade_delete_referential_integrity(store, spark):
    doomed = store.read("customer").filter(F.col("c_custkey") % 100 == 0).select("c_custkey")
    cascade_delete_user(store, doomed)
    cust = store.read("customer")
    orders = store.read("orders")
    li = store.read("lineitem")
    assert cust.join(doomed, "c_custkey", "left_semi").count() == 0
    # no orphan orders or lineitems
    orphans_o = orders.join(cust, orders["o_custkey"] == cust["c_custkey"], "left_anti")
    assert orphans_o.count() == 0
    orphans_l = li.join(orders, li["l_orderkey"] == orders["o_orderkey"], "left_anti")
    assert orphans_l.count() == 0


def test_touch_parent_sets_max_child_ts(store, spark):
    touch_parent(store, "orders", "lineitem", "o_orderkey", "l_orderkey",
                 "l_shipdate", updated_col="updated_at")
    out = store.read("orders")
    sample = (
        out.join(
            store.read("lineitem").groupBy("l_orderkey").agg(F.max("l_shipdate").alias("mx")),
            out["o_orderkey"] == F.col("l_orderkey"),
        )
        .filter(F.col("updated_at") != F.col("mx"))
    )
    assert sample.count() == 0


def test_vacuum_keeps_live_version(store):
    store.delete("region", F.col("r_regionkey") == 0)   # creates new version
    n = store.read("region").count()
    removed = store.vacuum("region")
    assert removed >= 1
    assert store.read("region").count() == n  # live version intact
    live = store._current_version("region")
    versions = [e for e in os.listdir(store._tdir("region")) if e.startswith("v-")]
    assert versions == [live]


def test_partitioned_update_rewrites_only_affected(spark, tmp_path):
    import os

    from etl_backend_spark.etl.writes import PartitionedTableStore

    cat = Catalog(spark, SF_DIR)
    s = PartitionedTableStore(spark, str(tmp_path / "pstore"), "o_orderstatus")
    s.create("orders", cat.table("orders"))
    v0 = s._current_version("orders")
    v0_dir = s._version_dir("orders", v0)
    f_inode = {
        f: os.stat(os.path.join(v0_dir, "o_orderstatus=F", f)).st_ino
        for f in os.listdir(os.path.join(v0_dir, "o_orderstatus=F"))
        if f.endswith(".parquet")
    }

    s.update_partitions(
        "orders", ["O"], {"o_orderpriority": F.lit("5-LOW")},
        F.col("o_totalprice") > 300000.0,
    )
    out = s.read("orders")
    base = cat.table("orders")
    # semantics: only status-O rows above the threshold changed
    changed = out.filter((F.col("o_orderstatus") == "O")
                         & (F.col("o_totalprice") > 300000.0)
                         & (F.col("o_orderpriority") != "5-LOW"))
    assert changed.count() == 0
    untouched = out.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderpriority"
    )
    orig = base.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderpriority"
    )
    assert untouched.subtract(orig).count() == 0
    assert out.count() == base.count()

    # physical: the F partition's files are HARD LINKS of the old version
    v1_dir = s._version_dir("orders", s._current_version("orders"))
    for f, ino in f_inode.items():
        assert os.stat(os.path.join(v1_dir, "o_orderstatus=F", f)).st_ino == ino


def test_scd2_merge_invariants(spark, cat):
    """Per key: exactly one current row; history rows have valid_to set;
    running the merge twice with the same batch adds no new versions."""
    from etl_backend_spark.etl.scd import scd2_merge

    c = cat.table("customer")
    current = c.select(
        "c_custkey", "c_mktsegment",
        F.to_timestamp(F.lit("2020-01-01")).alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    incoming = c.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 10 == 0, "MACHINERY2")
        .otherwise(F.col("c_mktsegment")).alias("c_mktsegment"),
    )
    ts = F.to_timestamp(F.lit("2024-06-01"))
    once = scd2_merge(current, incoming, "c_custkey", ["c_mktsegment"], ts)

    per_key_current = (
        once.filter(F.col("is_current")).groupBy("c_custkey").count()
        .filter(F.col("count") != 1)
    )
    assert per_key_current.count() == 0
    assert once.filter(~F.col("is_current") & F.col("valid_to").isNull()).count() == 0

    n_changed = c.filter((F.col("c_custkey") % 10 == 0)
                         & (F.col("c_mktsegment") != "MACHINERY2")).count()
    assert once.count() == c.count() + n_changed

    # idempotence: same batch again changes nothing
    twice = scd2_merge(once, incoming, "c_custkey", ["c_mktsegment"],
                       F.to_timestamp(F.lit("2024-07-01")))
    assert twice.count() == once.count()


def test_incremental_view_equals_full_recompute(spark, cat):
    """Applying batches incrementally == aggregating everything at once,
    for count/sum/min/max per key (the conversation-touch generalization)."""
    from etl_backend_spark.etl.incremental import aggregate_state, merge_delta

    ev = cat.table("events")
    aggs = [("event_id", "count", "n"), ("value", "sum", "sv"),
            ("ts", "min", "first_ts"), ("ts", "max", "last_ts")]

    b0 = ev.filter(F.col("event_id") % 3 == 0)
    b1 = ev.filter(F.col("event_id") % 3 == 1)
    b2 = ev.filter(F.col("event_id") % 3 == 2)

    state = aggregate_state(b0, ["user_id"], aggs)
    state = merge_delta(state, b1, ["user_id"], aggs)
    state = merge_delta(state, b2, ["user_id"], aggs)

    full = aggregate_state(ev, ["user_id"], aggs)
    inc = {r.user_id: (r.n, round(r.sv, 6), r.first_ts, r.last_ts)
           for r in state.collect()}
    exp = {r.user_id: (r.n, round(r.sv, 6), r.first_ts, r.last_ts)
           for r in full.collect()}
    assert inc == exp


def test_incremental_merge_handles_new_keys(spark):
    from etl_backend_spark.etl.incremental import aggregate_state, merge_delta

    base = spark.createDataFrame([(1, 10.0), (1, 20.0)], "k long, v double")
    delta = spark.createDataFrame([(1, 5.0), (2, 7.0)], "k long, v double")
    aggs = [("v", "count", "n"), ("v", "sum", "s"), ("v", "max", "mx")]
    state = merge_delta(aggregate_state(base, ["k"], aggs), delta, ["k"], aggs)
    got = {r.k: (r.n, r.s, r.mx) for r in state.collect()}
    assert got == {1: (3, 35.0, 20.0), 2: (1, 7.0, 7.0)}


def test_append_idempotent_replay_overwrites_partial_batch(spark, tmp_path):
    """Crash-replay contract: a partially-applied batch (some files moved,
    marker never written) must be REPAIRED by replay, not duplicated."""
    import os

    from etl_backend_spark.etl.writes import ParquetTableStore
    from etl_backend_spark.sources.catalog import Catalog
    from tests.conftest import SF_DIR

    store = ParquetTableStore(spark, str(tmp_path))
    ev = Catalog(spark, SF_DIR).table("region")
    store.create("t", ev.limit(0))

    batch = ev.repartition(3)
    n = batch.count()
    store.append_idempotent("t", batch, token="7")
    assert store.read("t").count() == n

    # simulate a crashed attempt that moved only SOME of the batch's files:
    # delete one of the token's destination files, then replay
    vdir = store._version_dir("t", store._current_version("t"))
    token_files = sorted(f for f in os.listdir(vdir) if f.startswith("b-7-"))
    assert len(token_files) >= 2
    os.remove(os.path.join(vdir, token_files[0]))
    assert store.read("t").count() < n

    store.append_idempotent("t", batch, token="7")  # replay
    assert store.read("t").count() == n  # repaired, not duplicated

    store.append_idempotent("t", batch, token="8")  # a genuinely new batch
    assert store.read("t").count() == 2 * n


def test_append_idempotent_replay_with_fewer_files(spark, tmp_path):
    """A replay that produces FEWER part files than the crashed attempt must
    remove the stale extras, not leave them as duplicates."""
    from etl_backend_spark.etl.writes import ParquetTableStore
    from etl_backend_spark.sources.catalog import Catalog
    from tests.conftest import SF_DIR

    store = ParquetTableStore(spark, str(tmp_path))
    ev = Catalog(spark, SF_DIR).table("region")
    store.create("t", ev.limit(0))
    n = ev.count()
    store.append_idempotent("t", ev.repartition(4), token="9")
    assert store.read("t").count() == n
    # same batch id, different partitioning (e.g. code change before replay)
    store.append_idempotent("t", ev.repartition(2), token="9")
    assert store.read("t").count() == n


def test_constraint_checkers_find_planted_violations(spark):
    """Each checker against a frame with KNOWN violations — the audit
    must count exactly the planted rows, and clean data must audit clean."""
    from etl_backend_spark.etl import constraints as C

    df = spark.createDataFrame(
        [(1, 10, "O"), (2, 10, "O"), (3, None, "O"),
         (4, 99, "X"), (4, 11, None)],
        "id long, fk long, status string",
    )
    parent = spark.createDataFrame([(10,), (11,)], "pk long")

    dups = C.unique_violations(df, ["id"]).collect()
    assert [(r.id, r.n) for r in dups] == [(4, 2)]
    orphans = C.fk_orphans(df, "fk", parent, "pk")
    assert sorted(r.id for r in orphans.collect()) == [4]  # null fk skipped
    assert C.enum_violations(df, "status", ["O"]).count() == 1  # null skipped
    nulls = {r.rule: r.n_violations
             for r in C.null_violations(df, ["fk", "status"]).collect()}
    assert nulls == {"not_null(fk)": 1, "not_null(status)": 1}
    summary = C.summarize([
        ("u", C.unique_violations(df, ["id"])),
        ("fk", C.fk_orphans(df, "fk", parent, "pk")),
    ]).collect()
    assert {r.rule: r.n_violations for r in summary} == {"u": 1, "fk": 1}


def test_bloom_build_lookup_split_idempotent_and_identical(spark):
    """The persisted bloom index (VERDICT r5 task 3): repeat builds hit
    the fingerprint cache instead of rewriting, and the lookup-only key
    returns rows bit-identical to a plain filter on the source."""
    from etl_backend_spark.registry import QUERIES
    from etl_backend_spark.sources.catalog import Catalog
    from tests.conftest import SF_DIR

    b1 = QUERIES["etl_bloom_build"](spark, SF_DIR).collect()[0]
    b2 = QUERIES["etl_bloom_build"](spark, SF_DIR).collect()[0]
    assert b2.reused                      # second build reopened, not rewrote
    assert (b2.n_files, b2.rows) == (b1.n_files, b1.rows)

    got = sorted(map(tuple,
                     QUERIES["etl_bloom_pruned_read"](spark, SF_DIR).collect()))
    want = sorted(map(tuple, (
        Catalog(spark, SF_DIR).table("orders")
        .filter(F.col("o_orderkey") == 42)
        .select("o_orderkey", "o_custkey", "o_totalprice").collect()
    )))
    assert got == want and len(got) > 0


def test_backfill_overwrites_only_the_target_day_partition(spark, tmp_path):
    """Dynamic partition overwrite contract: the backfill write replaces
    exactly the corrupted day's directory — every other day partition's
    files stay byte-identical in place — and heals the corrupted counts."""
    import os

    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet")
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")

    def rollup(df):
        return df.groupBy(F.col("user_id"), day.alias("d")).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )

    out = str(tmp_path / "rollup")
    bad_day = ev.select(day.alias("d")).agg(F.min("d")).collect()[0][0]
    corrupted = rollup(
        ev.filter(~((day == bad_day) & (F.col("event_type") == "click")))
    )
    corrupted.write.mode("overwrite").partitionBy("d").parquet(out)

    correct = {(r.user_id, r.d): (r.n, r.sum_value)
               for r in rollup(ev).collect()}
    pre = {(r.user_id, r.d): (r.n, r.sum_value)
           for r in spark.read.parquet(out)
           .select("user_id", F.col("d").cast("string").alias("d"),
                   "n", "sum_value").collect()}
    assert pre != correct  # the corruption is real

    def snapshot():
        files = {}
        for root, _dirs, names in os.walk(out):
            for nm in names:
                if nm.endswith(".parquet") and f"d={bad_day}" not in root:
                    p = os.path.join(root, nm)
                    st = os.stat(p)
                    files[p] = (st.st_size, st.st_mtime_ns)
        return files

    before = snapshot()
    (
        rollup(ev.filter(day == bad_day))
        .write.mode("overwrite").partitionBy("d")
        .option("partitionOverwriteMode", "dynamic").parquet(out)
    )
    assert snapshot() == before  # untouched partitions byte-identical
    post = {(r.user_id, r.d): (r.n, r.sum_value)
            for r in spark.read.parquet(out)
            .select("user_id", F.col("d").cast("string").alias("d"),
                    "n", "sum_value").collect()}
    assert post == correct
