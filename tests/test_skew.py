"""Hot-key-only salted join: correctness under any hot set, detection on a
skewed distribution, and the plan gate proving the exploded branch carries
only the hot-key subset of the build side."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_backend_spark.operators.joins import detect_heavy_hitters, salted_join

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def skewed(spark):
    """fact: key 0 holds ~80% of rows (the melting key), keys 1..99 are
    uniform; build: one row per key 0..119 (20 unmatched)."""
    fact = spark.range(25_000).select(
        F.when(F.col("id") < 20_000, F.lit(0))
        .otherwise((F.col("id") % 99) + 1)
        .alias("fk"),
        (F.col("id") * 7 % 1000).alias("v"),
        F.col("id").alias("rid"),
    )
    build = spark.range(120).select(
        F.col("id").alias("bk"), F.concat(F.lit("p"), F.col("id")).alias("payload")
    )
    return fact, build


def _summarize(df):
    return sorted(
        df.groupBy("fk", "payload")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
        .collect(),
        key=lambda r: (r.fk, r.payload),
    )


def test_detects_the_melting_key(skewed):
    fact, _ = skewed
    hot = detect_heavy_hitters(fact, "fk", fraction=0.05, min_count=3, top=8)
    keys = [r["__hot"] for r in hot.collect()]
    assert 0 in keys  # an 80%-share key cannot be missed by a 5% sample
    assert len(keys) <= 8


@pytest.mark.parametrize("hot_mode", ["detected", "empty", "all"])
def test_salted_join_matches_plain_join_for_any_hot_set(spark, skewed, hot_mode):
    """Correctness must not depend on detection quality: the union of the
    salted hot branch and the plain cold branch equals the plain join for
    the detected set, the empty set, and the everything-is-hot set."""
    fact, build = skewed
    if hot_mode == "detected":
        hot = detect_heavy_hitters(fact, "fk", fraction=0.05, min_count=3, top=8)
    elif hot_mode == "empty":
        hot = spark.range(0).select(F.col("id").alias("__hot"))
    else:
        hot = build.select(F.col("bk").alias("__hot"))
    salted = salted_join(fact, build, "fk", "bk", hot, n_salts=4)
    plain = fact.join(build, fact["fk"] == build["bk"])
    assert _summarize(salted) == _summarize(plain)


def test_salted_join_outer_how(spark, skewed):
    """`how` passes through: left join keeps unmatched fact rows in
    whichever branch (hot/cold) they fall."""
    fact, build = skewed
    fact2 = fact.withColumn("fk", F.when(F.col("rid") < 10, F.lit(999)).otherwise(F.col("fk")))
    hot = detect_heavy_hitters(fact2, "fk", fraction=0.05, min_count=3, top=8)
    salted = salted_join(fact2, build, "fk", "bk", hot, n_salts=4, how="left")
    plain = fact2.join(build, fact2["fk"] == build["bk"], "left")
    assert salted.count() == plain.count() == fact2.count()
    assert salted.filter(F.col("payload").isNull()).count() == 10


def test_salted_join_rejects_right_full(spark, skewed):
    fact, build = skewed
    hot = spark.range(1).select(F.col("id").alias("__hot"))
    with pytest.raises(ValueError, match="inner.*left"):
        salted_join(fact, build, "fk", "bk", hot, how="right")


def test_exploded_side_is_hot_subset_only(spark, skewed):
    """The gate from VERDICT r3: the build side must NEVER be replicated
    n_salts x in full (the round-3 defect). The single-pass form explodes
    per-row counts: |build| + (S-1) x |hot build rows| output rows, and
    the probe side is never replicated at all."""
    from etl_backend_spark.operators.joins import (
        _salted_build_side,
        _salted_fact_side,
    )

    fact, build = skewed
    hot = detect_heavy_hitters(fact, "fk", fraction=0.05, min_count=3, top=8)
    n_hot_in_build = build.join(
        hot, build["bk"] == hot["__hot"], "left_semi"
    ).count()
    assert n_hot_in_build >= 1
    S = 4
    b2 = _salted_build_side(build, "bk", hot, S)
    assert b2.count() == build.count() + (S - 1) * n_hot_in_build
    f2 = _salted_fact_side(fact, "fk", hot, F.pmod(F.col("rid"), S))
    assert f2.count() == fact.count()
    # cold fact rows all carry salt 0 (must meet the single cold build copy)
    assert (
        f2.join(hot, f2["fk"] == hot["__hot"], "left_anti")
        .filter(F.col("__salt") != 0)
        .count()
        == 0
    )


def test_salted_join_plan_single_pass(spark, skewed):
    """One explode (per-row sequence, not a full array fan-out), one join,
    no union — each side scanned once."""
    fact, build = skewed
    hot = detect_heavy_hitters(fact, "fk", fraction=0.05, min_count=3, top=8)
    out = salted_join(fact, build, "fk", "bk", hot, n_salts=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Generate explode") == 1
    assert "explode(sequence(0," in plan  # per-row count, not array(0..S-1)
    assert "Union" not in plan
    assert "SortMergeJoin" in plan  # the pinned salted-shuffle shape


def test_registry_join_salted_plan_and_sf(spark):
    """The registered query carries the same shape on real testdata."""
    from etl_backend_spark.registry import QUERIES

    df = QUERIES["join_salted"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Generate explode") == 1
    assert "explode(sequence(0," in plan
    rows = {r.o_orderstatus: (r.n_lines, r.sum_price) for r in df.collect()}
    # identical to the plain join
    from etl_backend_spark.sources.catalog import Catalog

    cat = Catalog(spark, SF_DIR)
    li, o = cat.table("lineitem"), cat.table("orders")
    expect = {
        r.o_orderstatus: (r.n_lines, r.sum_price)
        for r in li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
        .collect()
    }
    assert rows == expect


def test_join_1n_nested_salted_matches_plain(spark):
    """Two-phase salted collect_list equals the single-phase nested
    include, and both exchanges are keyed (no single-reducer stage)."""
    from etl_backend_spark.registry import QUERIES

    a = sorted(map(tuple, QUERIES["join_1n_nested_salted"](spark, SF_DIR).collect()))
    b = sorted(map(tuple, QUERIES["join_1n_nested"](spark, SF_DIR).collect()))
    assert a == b and len(a) > 0
    plan = (
        QUERIES["join_1n_nested_salted"](spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SinglePartition" not in plan
    # phase-1 exchange hashes (l_orderkey, __salt)
    import re

    assert re.search(r"hashpartitioning\(l_orderkey#\d+L?, __salt", plan), plan


def test_aqe_skew_split_rescues_plain_smj(spark):
    """Evidence for BASELINE.md's skew A/B conclusion: on a skewed
    sort-merge join, AQE's OptimizeSkewedJoin splits the melting
    partition at runtime (the batch-SMJ case where manual salting is NOT
    needed). The final adaptive plan marks the join skew=true.

    Two test-scale subtleties this test had to get right (useful when
    reading AQE plans elsewhere): the skew decision is made on SHUFFLED
    BYTES after column pruning — a hot key whose surviving columns are
    constants compresses to nothing and never looks skewed (the agg here
    must consume the wide fact column) — and the default 256MB partition
    threshold never triggers on toy data, so the thresholds are lowered;
    what's locked is the detection mechanism, not the default sizing."""
    fact = spark.range(500_000).select(
        F.when(F.col("id") < 400_000, F.lit(0))
        .otherwise((F.col("id") % 99) + 1)
        .alias("fk"),
        F.md5(F.col("id").cast("string")).alias("v"),  # incompressible
    )
    build = spark.range(120).crossJoin(
        spark.range(200).select(F.col("id").alias("rep"))
    ).select(F.col("id").alias("bk"), "rep")
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256KB",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        j = fact.join(build, fact["fk"] == build["bk"]).groupBy("rep").agg(
            F.sum(F.length("v")).alias("n")  # keeps v un-pruned
        )
        j.collect()  # finalize THIS DataFrame's adaptive plan
        final = j._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
    assert "skew=true" in final, final


def test_join_null_skew_routes_nulls_around_the_join(spark):
    """The NULL-key split (registry join_null_skew): the null branch must
    plan NO join — nulls can't match, so shuffling them into the join's
    single hash(NULL) reducer is pure straggler cost. Locked by counting
    join nodes in the composed plan: exactly the non-null branch's one."""
    from etl_backend_spark.registry import QUERIES

    df = QUERIES["join_null_skew"](spark, SF_DIR)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Join") == 1, plan
    # and answers match the plain left join exactly
    from pyspark.sql import functions as F
    from etl_backend_spark.sources.catalog import Catalog

    cat = Catalog(spark, SF_DIR)
    o = cat.table("orders").select(
        "o_orderkey",
        F.when(F.col("o_custkey") % 3 == 0, F.lit(None))
        .otherwise(F.col("o_custkey")).alias("k"),
    )
    c = cat.table("customer").select("c_custkey", "c_name")
    plain = o.join(c, F.col("k") == F.col("c_custkey"), "left").select(
        "o_orderkey", "c_name"
    )
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, plain.collect()))


def test_runtime_bloom_filter_reaches_fact_scan(spark):
    """Runtime semi-join reduction: a selective dim filter must inject a
    bloom filter (might_contain on the fact's join key) into the fact side
    BEFORE the shuffle — at 100 TB this drops non-matching fact rows at the
    scan instead of carrying them through exchange + join. Local thresholds
    are production-shaped defaults scaled to testdata (creation side under
    100MB, application side over 1KB); on a cluster the 10MB/10GB defaults
    trigger on exactly this query shape."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        from etl_backend_spark.sources.catalog import Catalog

        cat = Catalog(spark, SF_DIR)
        o = cat.table("orders").filter(F.col("o_orderpriority") == "1-URGENT")
        li = cat.table("lineitem")
        j = (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .groupBy("o_orderstatus").count()
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, plan
        # and the filter sits on the fact's key, not the dim's
        assert "might_contain(scalar-subquery" in plan and "l_orderkey" in \
            plan.split("might_contain", 1)[1][:120], plan
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
