"""Registry: aggregations, windows, set ops (SURVEY.md §2.4, §2.5 + free
Spark extensions the reference lacks).

Double-valued aggregates are rounded identically on both engine sides —
order-of-accumulation differs between Spark partial aggregation and DuckDB,
so raw float sums are not hash-stable.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..ann.index import ANN_ROOT as _ANN_ROOT
from ..operators import aggregates, windows
from ..sources.catalog import Catalog
from . import register


# ONE oracle definition per twin pair (r13 review —
# the _md5_hex64_sql no-verbatim-copies rule): an oracle
# edit applied to one twin but not the other only
# surfaces as a full-gate hash failure later.
_TPCH_Q3_ORACLE = """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '2001-06-01'
      AND l_shipdate > TIMESTAMP '2001-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
    LIMIT 10
    """

_TPCH_Q5_ORACLE = """
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '2000-01-01'
      AND o_orderdate < TIMESTAMP '2001-01-01'
    GROUP BY n_name
    """

_LATEST_PER_GROUP_ORACLE = """
    SELECT event_id, user_id, ts, event_type FROM (
      SELECT event_id, user_id, ts, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """

_ROLLING_RANGE_ORACLE = """
    SELECT event_id, user_id,
           count(*) OVER w AS n_1h,
           round(sum(value) OVER w, 4) AS sum_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """


@register(
    "agg_count_filtered",
    oracle="""
    SELECT count(*) AS cnt FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    """,
)
def q_agg_count_filtered(spark, sf_dir):
    """COUNT(*) under predicate (reference src/routes/ads.ts:155)."""
    li = Catalog(spark, sf_dir).table("lineitem")
    return aggregates.count_filtered(
        li, F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02"))
    )


@register(
    "agg_relation_count",
    oracle="""
    SELECT c_custkey, coalesce(n.n_orders, 0) AS n_orders
    FROM customer
    LEFT JOIN (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey) n
      ON c_custkey = n.o_custkey
    """,
)
def q_agg_relation_count(spark, sf_dir):
    """Per-row related-entity count `_count:{favorites}`
    (reference src/routes/ads.ts:150-153): pre-aggregate then join back —
    the shuffle carries one row per group, not the fact rows."""
    cat = Catalog(spark, sf_dir)
    out = aggregates.relation_count(
        cat.table("customer"), cat.table("orders"), "c_custkey", "o_custkey",
        alias="n_orders",
    )
    return out.select("c_custkey", "n_orders")


@register(
    "agg_multi_count",
    oracle="""
    SELECT (SELECT count(*) FROM customer) AS n_customers,
           (SELECT count(*) FROM orders) AS n_orders,
           (SELECT count(*) FROM orders WHERE o_orderstatus = 'O') AS n_open_orders,
           (SELECT count(*) FROM part) AS n_parts
    """,
)
def q_agg_multi_count(spark, sf_dir):
    """Dashboard multi-aggregate — the reference runs 4 parallel COUNT plans
    (src/routes/admin.ts:135-147); here the orders counts share one pass via
    conditional aggregation and the independent tables cross-join their
    1-row aggregates. ``n_open_orders`` is a COUNT under predicate — the §2
    ``agg_count_filtered`` computation, which also stays registered
    standalone."""
    cat = Catalog(spark, sf_dir)
    cust = cat.table("customer").agg(F.count(F.lit(1)).alias("n_customers"))
    orders = aggregates.multi_count(
        cat.table("orders"),
        {"n_orders": None, "n_open_orders": F.col("o_orderstatus") == "O"},
    )
    parts = cat.table("part").agg(F.count(F.lit(1)).alias("n_parts"))
    return cust.crossJoin(orders).crossJoin(parts).select(
        "n_customers", "n_orders", "n_open_orders", "n_parts"
    )


@register(
    "agg_sum_group",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_sum_group(spark, sf_dir):
    """TPC-H Q1-shape grouped aggregate — sum/avg are absent in the reference
    (SURVEY.md §2.4) but free in Spark; partial aggregation makes the shuffle
    one row per (partition, group) at any scale."""
    li = Catalog(spark, sf_dir).table("lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("2000-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_minmax_group",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n,
           round(min(o_totalprice), 2) AS min_price,
           round(max(o_totalprice), 2) AS max_price,
           round(avg(o_totalprice), 4) AS avg_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_agg_minmax_group(spark, sf_dir):
    o = Catalog(spark, sf_dir).table("orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
    )


@register(
    "agg_distinct",
    oracle="""
    SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_distinct(spark, sf_dir):
    """Exact distinct aggregate (absent in reference; two-phase in Spark)."""
    li = Catalog(spark, sf_dir).table("lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_distinct(F.col("l_partkey")).alias("n_parts")
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_agg_rollup(spark, sf_dir):
    """ROLLUP hierarchy totals (absent in reference)."""
    li = Catalog(spark, sf_dir).table("lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty")
    )


@register(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_agg_cube(spark, sf_dir):
    """CUBE cross-tab totals (absent in reference)."""
    o = Catalog(spark, sf_dir).table("orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )


@register("agg_approx_distinct")  # no oracle: HLL estimate is engine-specific
def q_agg_approx_distinct(spark, sf_dir):
    """approx_count_distinct (HLL) — the sketch path for 100 TB cardinality;
    estimates are engine-specific so this gets the rows-only check."""
    li = Catalog(spark, sf_dir).table("lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("n_parts_approx")
    )


@register("agg_hll_mergeable")  # no oracle: sketch bytes are engine-specific
def q_agg_hll_mergeable(spark, sf_dir):
    """MERGEABLE HLL sketches — the incremental-maintenance pattern for
    100 TB cardinality: build one sketch per nation partition
    (``hll_sketch_agg``), then union-merge the partial sketches to a global
    estimate (``hll_union_agg``). At scale the per-partition sketches are
    PERSISTED (a few KB each); a new data batch only sketches its own rows
    and re-merges — no rescan of history. Estimate accuracy vs the exact
    distinct count is pytest-asserted; the sketch itself is engine-specific,
    hence rows-only here."""
    c = Catalog(spark, sf_dir).table("customer")
    partials = c.groupBy("c_nationkey").agg(
        F.hll_sketch_agg("c_custkey").alias("sketch")
    )
    return partials.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch"))
        .alias("n_customers_approx")
    )


@register("agg_kll_quantiles")  # rows-only: sketch estimates are
# engine-specific; rank-error bound vs the exact quantiles is
# pytest-asserted (tests/test_operators.py)
def q_agg_kll_quantiles(spark, sf_dir):
    """MERGEABLE KLL quantile sketches (Karnin-Lang-Liberty; the
    Datasketches KLL built into Spark 4) — quantiles join HLL
    (distinct), CMS (frequency), and theta (set ops) in the mergeable-
    sketch family: one sketch per event-type partition, union-merged to
    global p50/p90/p99 of events.value. Same incremental-maintenance
    story as agg_hll_mergeable: persisted KB-scale partials, a new batch
    sketches only its own rows and re-merges — the exact-quantile
    alternative (agg_percentile/agg_median_exact) rescans history."""
    ev = Catalog(spark, sf_dir).table("events")
    partials = ev.groupBy("event_type").agg(
        F.kll_sketch_agg_double("value").alias("sk")
    )
    merged = partials.agg(F.kll_merge_agg_double("sk").alias("sk"))
    return merged.select(
        F.kll_sketch_get_n_double("sk").alias("n"),
        F.kll_sketch_get_quantile_double("sk", F.lit(0.5)).alias("p50"),
        F.kll_sketch_get_quantile_double("sk", F.lit(0.9)).alias("p90"),
        F.kll_sketch_get_quantile_double("sk", F.lit(0.99)).alias("p99"),
    )


@register("agg_theta_setops")  # rows-only: sketch estimates are
# engine-specific; bounds pytest-asserted
def q_agg_theta_setops(spark, sf_dir):
    """THETA sketches — the set-OPERATION member of the sketch family:
    unlike HLL, theta supports intersection/difference, answering "how
    many users did BOTH view and purchase" without a distinct-pair scan.
    One sketch per event type (mergeable partials, same persistence
    story), then |view ∩ purchase| and |view \\ purchase| estimates next
    to the per-side cardinalities."""
    ev = Catalog(spark, sf_dir).table("events")
    sk = ev.groupBy("event_type").agg(
        F.theta_sketch_agg("user_id").alias("sk")
    )
    row = sk.agg(
        F.max(F.when(F.col("event_type") == "view", F.col("sk"))).alias("va"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("sk"))).alias("pa"),
    )
    return row.select(
        F.theta_sketch_estimate(F.col("va")).alias("n_view"),
        F.theta_sketch_estimate(F.col("pa")).alias("n_purchase"),
        F.theta_sketch_estimate(
            F.theta_intersection(F.col("va"), F.col("pa"))
        ).alias("n_both"),
        F.theta_sketch_estimate(
            F.theta_difference(F.col("va"), F.col("pa"))
        ).alias("n_view_only"),
    )


# ---------------------------------------------------------------- §2.5 windows

@register("window_latest_per_group", oracle=_LATEST_PER_GROUP_ORACLE)
def q_window_latest_per_group(spark, sf_dir):
    """Top-1 per group by recency — last message per conversation
    (reference src/routes/chat.ts:43-47,108-111); tie-break on event_id."""
    ev = Catalog(spark, sf_dir).table("events")
    out = windows.latest_per_group(
        ev, "user_id", [F.col("ts").desc(), F.col("event_id").desc()]
    )
    return out.select("event_id", "user_id", "ts", "event_type")


@register("window_latest_per_group_bucketed", oracle=_LATEST_PER_GROUP_ORACLE)
def q_window_latest_per_group_bucketed(spark, sf_dir):
    """window_latest_per_group over events BUCKETED ON user_id
    (sources.catalog.bucketed_events_table): the window's required
    hash distribution is satisfied by the bucketed scan, so the
    per-query exchange disappears — zero shuffles for the whole
    latest-per-user read, the recurring chat-list query (reference
    src/routes/chat.ts:43-47). What bucketed_fact_tables does for the
    orderkey join family, this does for the per-user window family.
    Plan-asserted (no exchange) in tests/test_operators.py."""
    from pyspark.sql import Window

    from ..sources.catalog import bucketed_events_table

    ev = spark.table(bucketed_events_table(spark, sf_dir))
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "ts", "event_type")
    )


@register(
    "window_rank_topk",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey DESC) AS rnk
      FROM orders
    ) WHERE rnk <= 3
    """,
)
def q_window_rank_topk(spark, sf_dir):
    """Top-3 per group via rank() (extension; reference has only top-1)."""
    o = Catalog(spark, sf_dir).table("orders")
    out = windows.rank_topk(
        o, "o_custkey", [F.col("o_totalprice").desc(), F.col("o_orderkey").desc()], 3
    )
    return out.select("o_custkey", "o_orderkey", "o_totalprice", "rnk")


@register(
    "window_lag_delta",
    oracle="""
    SELECT event_id, user_id,
           epoch_us(ts) - lag(epoch_us(ts))
             OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS delta_us
    FROM events
    """,
)
def q_window_lag_delta(spark, sf_dir):
    """lag() inter-event gap, microsecond-exact (extension)."""
    ev = Catalog(spark, sf_dir).table("events")
    out = windows.lag_delta_us(ev, "user_id", "ts", "event_id")
    return out.select("event_id", "user_id", "delta_us")


@register(
    "window_running_sum",
    oracle="""
    SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                  ROWS UNBOUNDED PRECEDING), 4) AS running_sum
    FROM events
    """,
)
def q_window_running_sum(spark, sf_dir):
    """Cumulative-sum frame (rowsBetween unboundedPreceding→current)."""
    ev = Catalog(spark, sf_dir).table("events")
    out = windows.running_sum(ev, "user_id", "ts", "event_id", "value")
    return out.select(
        "event_id", "user_id", F.round(F.col("running_sum"), 4).alias("running_sum")
    )


# ---------------------------------------------------------------- set ops

@register(
    "set_union",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 400000.0
    """,
)
def q_set_union(spark, sf_dir):
    """UNION (distinct) — absent in reference, free in Spark."""
    cat = Catalog(spark, sf_dir)
    a = cat.table("customer").filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = (
        cat.table("orders")
        .filter(F.col("o_totalprice") > 400000.0)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return a.union(b).distinct()


@register(
    "set_intersect",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000.0
    """,
)
def q_set_intersect(spark, sf_dir):
    cat = Catalog(spark, sf_dir)
    a = cat.table("customer").filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = (
        cat.table("orders")
        .filter(F.col("o_totalprice") > 300000.0)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return a.intersect(b)


@register(
    "set_except",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000.0
    """,
)
def q_set_except(spark, sf_dir):
    cat = Catalog(spark, sf_dir)
    a = cat.table("customer").filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = (
        cat.table("orders")
        .filter(F.col("o_totalprice") > 300000.0)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return a.subtract(b)


@register(
    "agg_pivot",
    oracle="""
    SELECT o_orderpriority,
           count(*) FILTER (o_orderstatus = 'F') AS st_f,
           count(*) FILTER (o_orderstatus = 'O') AS st_o,
           count(*) FILTER (o_orderstatus = 'P') AS st_p
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_agg_pivot(spark, sf_dir):
    """Pivot / cross-tab (absent in reference; conditional-agg form shares
    one shuffle). Pivot values are FIXED, not discovered — a discovery pass
    at 100 TB would be its own scan."""
    o = Catalog(spark, sf_dir).table("orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("st_f"),
            F.coalesce("O", F.lit(0)).alias("st_o"),
            F.coalesce("P", F.lit(0)).alias("st_p"),
        )
    )


@register(
    "agg_percentile",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.95), 4) AS p95
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_agg_percentile(spark, sf_dir):
    """Exact interpolated percentiles (Spark `percentile` == DuckDB
    quantile_cont). The 100 TB path is approx_percentile (t-digest sketch,
    engine-specific → would be rows-only checked)."""
    o = Catalog(spark, sf_dir).table("orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.95)), 4).alias("p95"),
    )


@register(
    "agg_stats_funcs",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_extendedprice), 2) AS sd_price,
           round(var_samp(l_quantity), 4) AS var_qty,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS cov_qp
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_stats_funcs(spark, sf_dir):
    """Statistical aggregates (absent in reference, free in Spark): sample
    stddev/variance/correlation/covariance, rounded for cross-engine float
    stability."""
    li = Catalog(spark, sf_dir).table("lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("sd_price"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qp"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("cov_qp"),
    )


@register(
    "agg_skew_salted",
    oracle="""
    SELECT user_id, count(*) AS n, round(sum(value), 4) AS sum_value,
           max(ts) AS last_ts
    FROM events GROUP BY user_id
    """,
)
def q_agg_skew_salted(spark, sf_dir):
    """Salted two-phase aggregation (operators/skew.py): identical result to
    the plain groupBy — the point is the plan, which spreads any hot key
    over 16 reducers before recombining (the oracle is the plain form)."""
    from ..operators import skew

    ev = Catalog(spark, sf_dir).table("events")
    out = skew.salted_agg(
        ev, ["user_id"], "event_id",
        [("event_id", "count", "n"), ("value", "sum", "sum_value"),
         ("ts", "max", "last_ts")],
    )
    return out.select(
        "user_id", "n", F.round("sum_value", 4).alias("sum_value"), "last_ts"
    )


@register("tpch_q3_shape", oracle=_TPCH_Q3_ORACLE)
def q_tpch_q3_shape(spark, sf_dir):
    """TPC-H Q3 shape (shipping-priority): selective dim filter → two-hop
    join → grouped revenue → top-10. The customer filter prunes before the
    join; the final top-k is TakeOrderedAndProject, never a global sort."""
    cat = Catalog(spark, sf_dir)
    c = cat.table("customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = cat.table("orders").filter(
        F.col("o_orderdate") < F.to_timestamp(F.lit("2001-06-01"))
    )
    li = cat.table("lineitem").filter(
        F.col("l_shipdate") > F.to_timestamp(F.lit("2001-03-15"))
    )
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(revenue, 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate").asc(),
                 F.col("l_orderkey").asc())
        .limit(10)
    )


@register("tpch_q3_bucketed", oracle=_TPCH_Q3_ORACLE)
def q_tpch_q3_bucketed(spark, sf_dir):
    """Q3 over the co-located layout — ZERO exchanges end to end: customer
    (filtered, broadcast) joins orders without moving the fact; the o⋈li
    edge is bucket-to-bucket; and the grouped revenue keys on l_orderkey,
    which the bucket partitioning already satisfies, so even the
    aggregation shuffles nothing. The top-10 is TakeOrderedAndProject.
    Third member of the layout-pair evidence set (two_hop, q5, q3):
    bucketing the two fact tables once removes EVERY per-query shuffle
    this workload family has. Plan-asserted in tests/test_operators.py."""
    from ..sources.catalog import Catalog, bucketed_fact_tables

    li_t, o_t = bucketed_fact_tables(spark, sf_dir)
    c = Catalog(spark, sf_dir).table("customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = spark.table(o_t).filter(
        F.col("o_orderdate") < F.to_timestamp(F.lit("2001-06-01"))
    )
    li = spark.table(li_t).filter(
        F.col("l_shipdate") > F.to_timestamp(F.lit("2001-03-15"))
    )
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        F.broadcast(c).join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(revenue, 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate").asc(),
                 F.col("l_orderkey").asc())
        .limit(10)
    )


@register("tpch_q5_shape", oracle=_TPCH_Q5_ORACLE)
def q_tpch_q5_shape(spark, sf_dir):
    """TPC-H Q5 shape (local-supplier revenue): 6-table star join with the
    region/nation dims broadcast (never shuffling the fact side), plus the
    co-location predicate c_nationkey = s_nationkey."""
    cat = Catalog(spark, sf_dir)
    c, o, li, s = (cat.table("customer"), cat.table("orders"),
                   cat.table("lineitem"), cat.table("supplier"))
    n, r = cat.tbl("nation"), cat.tbl("region")
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .filter(
            (F.col("o_orderdate") >= F.to_timestamp(F.lit("2000-01-01")))
            & (F.col("o_orderdate") < F.to_timestamp(F.lit("2001-01-01")))
        )
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .join(s, (li["l_suppkey"] == s["s_suppkey"])
                 & (c["c_nationkey"] == s["s_nationkey"]))
        .join(n, s["s_nationkey"] == n["n_nationkey"])
        .join(r, n["n_regionkey"] == r["r_regionkey"])
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(F.round(revenue, 2).alias("revenue"))
    )


@register("tpch_q5_bucketed", oracle=_TPCH_Q5_ORACLE)
def q_tpch_q5_bucketed(spark, sf_dir):
    """Q5 shape restructured around the co-located fact layout: the li⋈o
    join (the only fact-fact edge, 1.82×/decade when shuffled) runs
    bucket-to-bucket with no exchange; customer and supplier join the
    already-joined stream as broadcasts, and nation/region stay broadcast
    dims. The date filter sits on the bucketed orders scan — a filter
    never invalidates bucket partitioning. One shuffle remains in the
    whole plan: the final 5-row groupBy(n_name), already partial-agg
    reduced map-side."""
    from ..sources.catalog import Catalog, bucketed_fact_tables

    cat = Catalog(spark, sf_dir)
    li_t, o_t = bucketed_fact_tables(spark, sf_dir)
    li, o = spark.table(li_t), spark.table(o_t)
    c, s = cat.table("customer"), cat.table("supplier")
    n, r = cat.tbl("nation"), cat.tbl("region")
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(
            o.filter(
                (F.col("o_orderdate") >= F.to_timestamp(F.lit("2000-01-01")))
                & (F.col("o_orderdate") < F.to_timestamp(F.lit("2001-01-01")))
            ),
            li["l_orderkey"] == o["o_orderkey"],
        )
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(
            F.broadcast(s),
            (li["l_suppkey"] == s["s_suppkey"])
            & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(n, s["s_nationkey"] == n["n_nationkey"])
        .join(r, n["n_regionkey"] == r["r_regionkey"])
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(F.round(revenue, 2).alias("revenue"))
    )


@register(
    "window_latest_maxby",
    oracle="""
    SELECT user_id, event_id AS last_event_id, ts AS last_ts FROM (
      SELECT user_id, event_id, ts,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q_window_latest_maxby(spark, sf_dir):
    """Top-1-per-group via max_by (partial-aggregable, NO sort, no window
    shuffle-and-sort) — the scale-preferred form of window_latest_per_group
    when only the argmax row's columns are needed. Tie-broken on (ts,
    event_id) struct ordering identically in both engines."""
    ev = Catalog(spark, sf_dir).table("events")
    return ev.groupBy("user_id").agg(
        F.max_by("event_id", F.struct("ts", "event_id")).alias("last_event_id"),
        F.max("ts").alias("last_ts"),
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
)
def q_agg_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (beyond rollup/cube): two independent
    groupings in one shuffle pass."""
    Catalog(spark, sf_dir).register_views()
    return spark.sql("""
        SELECT l_returnflag, l_linestatus, count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """)


@register(
    "window_ntile",
    oracle="""
    SELECT o_orderkey, ntile(4) OVER (ORDER BY o_totalprice ASC, o_orderkey ASC)
             AS quartile
    FROM orders
    """,
)
def q_window_ntile(spark, sf_dir):
    """ntile quartiles over a total order — EXACT and distributed: the
    global rank comes from the shared prefix-sum helper (range partition
    + local row_numbers + broadcast offsets,
    operators/windows.distributed_global_rank), and ntile(k) over a
    unique order is floor((rank-1)*k / n) + 1. No SinglePartition
    exchange anywhere (plan-asserted); approx-percentile bucketing
    (agg_approx_quantile) remains the sketch alternative when a rank
    shuffle per query is too much."""
    from ..operators.windows import distributed_global_rank

    o = Catalog(spark, sf_dir).table("orders")
    ranked, n = distributed_global_rank(
        o.select("o_orderkey", "o_totalprice"),
        ["o_totalprice", "o_orderkey"],
    )
    # SQL ntile: the first (n mod k) buckets get ceil(n/k) rows — NOT the
    # even-spread floor((rank-1)*k/n) tiling, which disagrees whenever
    # k does not divide n
    k = 4
    q, r = divmod(n, k)
    big = (q + 1) * r
    rank = F.col("__rank")
    quart = (
        F.when(rank <= big, ((rank - 1) / (q + 1)).cast("long") + 1)
        .otherwise(F.lit(r) + ((rank - big - 1) / q).cast("long") + 1)
    )
    return ranked.select(
        "o_orderkey", quart.cast("int").alias("quartile")
    )


@register(
    "tpch_q12_shape",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_returnflag = 'R'
      AND l_shipdate >= TIMESTAMP '2000-01-01'
      AND l_shipdate < TIMESTAMP '2001-01-01'
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY
    GROUP BY l_linestatus
    """,
)
def q_tpch_q12_shape(spark, sf_dir):
    """TPC-H Q12 shape (late-shipment priority counts, adapted to the
    testdata's reduced lineitem schema): selective fact-side predicates that
    push to the lineitem scan, one fact-fact equi-join with a residual
    cross-table date predicate (shipped >30 days after order), conditional
    aggregation. The scan-pushable filters prune BEFORE the join, so the
    shuffle carries only returned lines in the window."""
    cat = Catalog(spark, sf_dir)
    o, li = cat.table("orders"), cat.table("lineitem")
    lif = li.filter(
        (F.col("l_returnflag") == "R")
        & (F.col("l_shipdate") >= F.to_timestamp(F.lit("2000-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("2001-01-01")))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(
            lif,
            (o["o_orderkey"] == lif["l_orderkey"])
            & (lif["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 30 DAYS")),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(high.cast("long")).alias("high_line_count"),
            F.sum((~high).cast("long")).alias("low_line_count"),
        )
    )


@register(
    "tpch_q10_shape",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '2000-01-01'
      AND o_orderdate < TIMESTAMP '2000-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def q_tpch_q10_shape(spark, sf_dir):
    """TPC-H Q10 shape (returned-item customer ranking): quarter-windowed
    orders x returned lineitems, customer rollup with the nation dim
    broadcast, top-20 by revenue via TakeOrdered (never a global sort).
    Both selective predicates push to their fact scans before the join."""
    cat = Catalog(spark, sf_dir)
    c, o, li = cat.table("customer"), cat.table("orders"), cat.table("lineitem")
    n = cat.tbl("nation")
    of = o.filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("2000-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("2000-04-01")))
    )
    lif = li.filter(F.col("l_returnflag") == "R")
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        c.join(of, c["c_custkey"] == of["o_custkey"])
        .join(lif, of["o_orderkey"] == lif["l_orderkey"])
        .join(n, c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(revenue, 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "window_ntile_keyed",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           ntile(4) OVER (PARTITION BY c_mktsegment
                          ORDER BY c_acctbal ASC, c_custkey ASC) AS quartile
    FROM customer
    """,
)
def q_window_ntile_keyed(spark, sf_dir):
    """ntile quartiles WITHIN each market segment — the keyed form of
    ``window_ntile`` (hash exchange on the segment + per-key sort), which is
    the shape that survives 100 TB; the global-order sibling stays scoped to
    ranked reporting output, and ``agg_approx_quantile`` is the sketch path
    for global buckets at scale."""
    from pyspark.sql import Window

    c = Catalog(spark, sf_dir).table("customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    return c.select(
        "c_custkey", "c_mktsegment", F.ntile(4).over(w).alias("quartile")
    )


@register(
    "tpch_q13_shape",
    oracle="""
    SELECT c_count, count(*) AS custdist FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) GROUP BY c_count
    """,
)
def q_tpch_q13_shape(spark, sf_dir):
    """TPC-H Q13 shape (customer order-count distribution): left join with a
    join-side residual predicate, then a double aggregation — the second
    groupBy's input is already one row per customer, so the second shuffle
    is tiny."""
    cat = Catalog(spark, sf_dir)
    c, o = cat.table("customer"), cat.table("orders")
    per_cust = (
        c.join(
            o,
            (c["c_custkey"] == o["o_custkey"])
            & (o["o_orderpriority"] != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "tpch_q18_shape",
    oracle="""
    WITH big AS (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 150
    )
    SELECT c_name, o_orderkey, o_orderdate, o_totalprice,
           round(sum(l_quantity), 2) AS total_qty
    FROM orders
    JOIN big ON o_orderkey = big.l_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN lineitem ON o_orderkey = lineitem.l_orderkey
    GROUP BY c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20
    """,
)
def q_tpch_q18_shape(spark, sf_dir):
    """TPC-H Q18 shape (large-volume orders): HAVING-filtered aggregate as a
    semi-join key set, re-join to facts, top-k. The `big` key set is small
    after the HAVING filter → broadcasts into both joins."""
    cat = Catalog(spark, sf_dir)
    li, o, c = cat.table("lineitem"), cat.table("orders"), cat.table("customer")
    big = (
        li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150).select(F.col("l_orderkey").alias("__bk"))
    )
    return (
        o.join(big, o["o_orderkey"] == F.col("__bk"))
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )


@register(
    "agg_incremental_view",
    oracle="""
    SELECT user_id, count(*) AS n, round(sum(value), 4) AS sv, max(ts) AS mx
    FROM events GROUP BY user_id
    """,
)
def q_agg_incremental_view(spark, sf_dir):
    """Incrementally-maintained aggregate view (etl/incremental.py): three
    delta batches merged into running state must equal the one-shot GROUP BY
    (the oracle). Per-batch cost is O(delta + changed keys), never
    O(history)."""
    from ..etl.incremental import aggregate_state, merge_delta

    ev = Catalog(spark, sf_dir).table("events")
    aggs = [("event_id", "count", "n"), ("value", "sum", "sv"), ("ts", "max", "mx")]
    state = aggregate_state(ev.filter(F.col("event_id") % 3 == 0), ["user_id"], aggs)
    state = merge_delta(state, ev.filter(F.col("event_id") % 3 == 1), ["user_id"], aggs)
    state = merge_delta(state, ev.filter(F.col("event_id") % 3 == 2), ["user_id"], aggs)
    return state.select("user_id", "n", F.round("sv", 4).alias("sv"), "mx")


@register(
    "window_distribution_keyed",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           round(percent_rank() OVER w, 6) AS pr,
           round(cume_dist() OVER w, 6) AS cd
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice ASC, o_orderkey ASC)
    """,
)
def q_window_distribution_keyed(spark, sf_dir):
    """percent_rank / cume_dist WITHIN each priority class — the keyed form
    of ``window_distribution`` (hash exchange + per-key sort), the shape
    that survives 100 TB; the global-order sibling stays scoped to ranked
    reporting output and ``agg_approx_quantile`` is the sketch path."""
    from pyspark.sql import Window

    o = Catalog(spark, sf_dir).table("orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderkey", "o_orderpriority",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@register(
    "window_distribution",
    oracle="""
    SELECT o_orderkey,
           round(percent_rank() OVER w, 6) AS pr,
           round(cume_dist() OVER w, 6) AS cd,
           first_value(o_orderkey) OVER w AS cheapest_key,
           nth_value(o_orderkey, 2) OVER (ORDER BY o_totalprice ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_key
    FROM orders
    WINDOW w AS (ORDER BY o_totalprice ASC, o_orderkey ASC)
    """,
)
def q_window_distribution(spark, sf_dir):
    """Distribution window functions over a total price order, EXACT and
    distributed: with a UNIQUE order (orderkey tie-break) percent_rank is
    (rank-1)/(n-1) and cume_dist is rank/n over the prefix-sum global
    rank — no ties, no SinglePartition window. first/nth_value over the
    cumulative frame are the global rank-1 and rank-2 rows: one bounded
    2-row collect, broadcast as literals."""
    from ..operators.windows import distributed_global_rank

    o = Catalog(spark, sf_dir).table("orders")
    ranked, n = distributed_global_rank(
        o.select("o_orderkey", "o_totalprice"),
        ["o_totalprice", "o_orderkey"],
    )
    head = {
        r["__rank"]: r["o_orderkey"]
        for r in ranked.filter(F.col("__rank") <= 2).collect()
    }
    rank = F.col("__rank")
    return ranked.select(
        "o_orderkey",
        F.round((rank - 1) / F.lit(n - 1), 6).alias("pr"),
        F.round(rank / F.lit(n), 6).alias("cd"),
        F.lit(head[1]).alias("cheapest_key"),
        F.when(rank >= 2, F.lit(head.get(2))).alias("second_key"),
    )


@register("agg_approx_quantile")  # rows-only: sketch estimates are
# engine-specific (Spark Greenwald-Khanna vs DuckDB t-digest)
def q_agg_approx_quantile(spark, sf_dir):
    """approx_percentile — the sketch path for percentiles at 100 TB (exact
    interpolated percentiles need a full sort per group; the sketch is
    one-pass mergeable state). Estimates differ per engine → rows-only;
    `agg_percentile` is the exact, oracle-checked counterpart."""
    li = Catalog(spark, sf_dir).table("lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(1000)).alias("p50_est"),
        F.approx_percentile("l_extendedprice", F.lit(0.99), F.lit(1000)).alias("p99_est"),
    )


@register("window_rolling_range", oracle=_ROLLING_RANGE_ORACLE)
def q_window_rolling_range(spark, sf_dir):
    """Per-key rolling aggregate over a TIME interval frame (RANGE BETWEEN
    INTERVAL 1 HOUR PRECEDING) — the per-row trailing-window shape
    (rate-limit counters, rolling health metrics) the reference computes
    imperatively per request (src/routes/ads.ts:155 count-then-act).
    Spark has no interval literal in rangeBetween, so the frame orders by
    unix_micros(ts) with a µs offset — identical frame membership to the
    SQL interval form (both bounds inclusive, peers grouped by value).
    Scale: keyed window → one hash exchange on user_id, per-key sort;
    no single-partition stage, no join (contrast the range-join form in
    events.py which materializes pair candidates)."""
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).table("events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.round(F.sum("value").over(w), 4).alias("sum_1h"),
    )


@register("window_rolling_range_salted", oracle=_ROLLING_RANGE_ORACLE)
def q_window_rolling_range_salted(spark, sf_dir):
    """window_rolling_range with the partition key SALTED BY TIME BLOCK —
    the skew-safe twin (VERDICT r3 task 6): a keyed window puts one user's
    whole history in one task, so a hot user melts it exactly like a hot
    join key. Salting a window cannot use a random salt (frames span
    rows), but the TIME AXIS is a natural salt: partition by (user_id,
    hour_block) and the 1-hour trailing frame of any row spans at most
    its own block and the previous one.

    Two-phase plan: every row is sent to its own block as OWNER and to
    the next block as DONOR (2x the shuffle volume — the price of
    splitting the key); within each (user_id, block) partition the exact
    µs-range frame is computed over owners+donors together (each original
    row appears at most once per partition: owners are this block's rows,
    donors are the previous block's), and only owner rows are emitted.
    Oracle-identical to the unsalted form for any data; the hot key now
    spreads over as many tasks as it has active hours. At 100 TB this is
    the difference between one task processing a bot user's year and
    ~8760 tasks processing an hour each. Plan-gated in
    tests/test_registry_window.py: the exchange hashes (user_id, block),
    never user_id alone."""
    from pyspark.sql import Window

    W_US = 3_600_000_000  # 1 hour in µs = frame width = block width
    ev = Catalog(spark, sf_dir).table("events")
    us = F.unix_micros(F.col("ts"))
    base = ev.select(
        "event_id", "user_id", "value",
        us.alias("__us"), F.floor(us / W_US).cast("long").alias("__blk"),
    )
    owners = base.withColumn("__own", F.lit(1))
    donors = (
        base.withColumn("__blk", F.col("__blk") + 1)
        .withColumn("__own", F.lit(0))
    )
    w = (
        Window.partitionBy("user_id", "__blk")
        .orderBy("__us")
        .rangeBetween(-W_US, 0)
    )
    return (
        owners.unionByName(donors)
        .select(
            "event_id", "user_id", "__own",
            F.count(F.lit(1)).over(w).alias("n_1h"),
            F.round(F.sum("value").over(w), 4).alias("sum_1h"),
        )
        .filter(F.col("__own") == 1)
        .select("event_id", "user_id", "n_1h", "sum_1h")
    )


@register(
    "tpch_q1_shape",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
             AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1_shape(spark, sf_dir):
    """TPC-H Q1 (pricing summary report) — THE canonical scan-heavy
    aggregation: one full fact pass, 6 grouped measures over arithmetic
    expressions, a 4-ish-row result. The whole query is one partial-agg +
    one tiny final shuffle (map-side combine collapses 600k rows to
    |groups| per task); the shipdate filter and 7-column projection push
    to the parquet scan. At 100 TB this is the shape that proves the
    scan+codegen path: zero joins, zero Python, shuffle bytes independent
    of fact size."""
    li = Catalog(spark, sf_dir).table("lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("2001-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2)
              .alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "tpch_q4_shape",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '2000-07-01'
      AND o_orderdate < TIMESTAMP '2000-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_tpch_q4_shape(spark, sf_dir):
    """TPC-H Q4 shape (order-priority checking; EXISTS correlated on a
    cross-table predicate — adapted to l_shipdate > o_orderdate since the
    testdata lineitem has no commit/receipt dates). The EXISTS is a LEFT
    SEMI join with the date comparison as a join-side residual: Spark
    dedups match multiplicity inside the join (no DISTINCT pass), and the
    quarter filter prunes the orders scan before the shuffle."""
    cat = Catalog(spark, sf_dir)
    o = cat.table("orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("2000-07-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("2000-10-01")))
    )
    li = cat.table("lineitem")
    return (
        o.join(
            li,
            (o["o_orderkey"] == li["l_orderkey"])
            & (li["l_shipdate"] > o["o_orderdate"]),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "tpch_q6_shape",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2000-01-01'
      AND l_shipdate < TIMESTAMP '2001-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6_shape(spark, sf_dir):
    """TPC-H Q6 (forecasting revenue change): pure selective scan-agg —
    all four predicates push to the parquet scan as range filters
    (PushedFilters prunes row groups on shipdate/discount/quantity stats),
    a single global sum follows. The at-scale shape where predicate
    pushdown IS the query plan: I/O drops with selectivity, shuffle is one
    row per task."""
    li = Catalog(spark, sf_dir).table("lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("2000-01-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("2001-01-01")))
            & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
            .alias("revenue")
        )
    )


@register(
    "tpch_q14_shape",
    oracle="""
    SELECT round(
             100.0 * sum(CASE WHEN p_type = 'PROMO'
                         THEN l_extendedprice * (1 - l_discount) END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '2000-09-01'
      AND l_shipdate < TIMESTAMP '2000-10-01'
    """,
)
def q_tpch_q14_shape(spark, sf_dir):
    """TPC-H Q14 shape (promotion revenue share; p_type = 'PROMO' — the
    testdata's p_type is a single token, not the three-word TPC-H form):
    month-windowed fact filter pushes to the scan, the part dim joins as a
    broadcast (no fact shuffle), and the share is a conditional/total sum
    ratio in ONE aggregation pass."""
    cat = Catalog(spark, sf_dir)
    li = cat.table("lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("2000-09-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("2000-10-01")))
    )
    p = cat.tbl("part")  # broadcast hint via Catalog.tbl
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev))
                / F.sum(rev),
                4,
            ).alias("promo_share")
        )
    )


@register(
    "tpch_q16_shape",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#4'
      AND p_type <> 'ECONOMY'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q_tpch_q16_shape(spark, sf_dir):
    """TPC-H Q16 shape (parts/supplier relationship; lineitem stands in
    for partsupp, which the testdata lacks): NOT-filters + IN-list push to
    the broadcast-joined part dim, then COUNT(DISTINCT supplier) per
    brand/type/size. Spark expands the distinct-agg into a two-level
    aggregate (partial dedup of (group, suppkey) map-side, then count) —
    the shuffle carries distinct pairs, not fact rows, which is what makes
    global distinct-count survive 100 TB."""
    cat = Catalog(spark, sf_dir)
    li = cat.table("lineitem")
    p = cat.tbl("part").filter(
        (F.col("p_brand") != "Brand#4")
        & (F.col("p_type") != "ECONOMY")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


@register(
    "tpch_q2_shape",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    sr AS (
      SELECT s_suppkey, s_acctbal, s_name, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
    ),
    cand AS (
      SELECT p_partkey, p_name, s_acctbal, s_name, n_name
      FROM part
      JOIN ps ON p_partkey = l_partkey
      JOIN sr ON l_suppkey = s_suppkey
      WHERE p_size = 15 AND p_type = 'LARGE'
    ),
    mn AS (SELECT p_partkey, min(s_acctbal) AS min_bal
           FROM cand GROUP BY p_partkey)
    SELECT round(c.s_acctbal, 2) AS s_acctbal, s_name, n_name,
           c.p_partkey AS p_partkey, p_name
    FROM cand c JOIN mn ON c.p_partkey = mn.p_partkey
                       AND c.s_acctbal = mn.min_bal
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 20
    """,
)
def q_tpch_q2_shape(spark, sf_dir):
    """TPC-H Q2 shape (minimum-cost supplier; s_acctbal stands in for
    ps_supplycost and the DISTINCT lineitem (part, supp) pairs stand in
    for partsupp, which the testdata lacks): correlated MIN subquery as a
    groupBy + equality join-back, region-filtered suppliers broadcast.
    The per-part min never materializes the full candidate set twice —
    the mn branch reuses the cand exchange (same grouping key)."""
    cat = Catalog(spark, sf_dir)
    ps = (
        cat.table("lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    sr = (
        cat.table("supplier")
        .join(cat.tbl("nation"),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(cat.tbl("region").filter(F.col("r_name") == "ASIA"),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    p = cat.tbl("part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "LARGE")
    )
    cand = (
        p.join(ps, p["p_partkey"] == ps["l_partkey"])
        .join(sr, ps["l_suppkey"] == sr["s_suppkey"])
        .select("p_partkey", "p_name", "s_acctbal", "s_name", "n_name")
    )
    mn = cand.groupBy(F.col("p_partkey").alias("__pk")).agg(
        F.min("s_acctbal").alias("__min_bal")
    )
    return (
        cand.join(
            mn,
            (cand["p_partkey"] == mn["__pk"])
            & (cand["s_acctbal"] == mn["__min_bal"]),
        )
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name", "n_name", "p_partkey", "p_name",
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(20)
    )


@register(
    "tpch_q7_shape",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS l_year,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1999-01-01'
      AND l_shipdate < TIMESTAMP '2001-01-01'
    GROUP BY n1.n_name, n2.n_name, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q_tpch_q7_shape(spark, sf_dir):
    """TPC-H Q7 (volume shipping between a nation PAIR, by year) — the
    filtered/yearly refinement of ``join_self_roles``: the nation-pair
    disjunction lands on the two broadcast dim copies (each prunes to ≤2
    rows before broadcast), the date window pushes to the fact scan, and
    the residual pair predicate runs after both joins."""
    cat = Catalog(spark, sf_dir)
    li = cat.table("lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1999-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("2001-01-01")))
    )
    s, o, c = (cat.table("supplier"), cat.table("orders"),
               cat.table("customer"))
    pair = ("NATION_1", "NATION_2")
    n1 = cat.tbl("nation").filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_name").alias("supp_nation"),
    )
    n2 = cat.tbl("nation").filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("cust_nation"),
    )
    return (
        li.join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "tpch_q11_shape",
    oracle="""
    WITH val AS (
      SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS v
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
      GROUP BY l_partkey
    )
    SELECT l_partkey AS partkey, round(v, 2) AS value
    FROM val
    WHERE v > (SELECT 3.0 * avg(v) FROM val)
    ORDER BY value DESC, partkey
    """,
)
def q_tpch_q11_shape(spark, sf_dir):
    """TPC-H Q11 shape (important-stock share; per-part revenue from one
    nation's suppliers stands in for partsupp stock value): the HAVING-
    against-a-global-fraction pattern — per-key aggregate, a 1-row global
    sum over it, broadcast the scalar back as a cross join, filter. The
    global reduction reads the per-part aggregate (tiny), never the fact."""
    cat = Catalog(spark, sf_dir)
    li = cat.table("lineitem")
    s = (
        cat.table("supplier")
        .join(cat.tbl("nation").filter(F.col("n_name") == "NATION_3"),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    val = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("v"))
    )
    thresh = val.agg((3.0 * F.avg("v")).alias("__t"))
    return (
        val.crossJoin(F.broadcast(thresh))
        .filter(F.col("v") > F.col("__t"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.round("v", 2).alias("value"),
        )
        .orderBy(F.col("value").desc(), "partkey")
    )


@register(
    "tpch_q15_shape",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '2000-01-01'
        AND l_shipdate < TIMESTAMP '2000-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    ORDER BY s_suppkey
    """,
)
def q_tpch_q15_shape(spark, sf_dir):
    """TPC-H Q15 (top supplier by quarter revenue, the CREATE VIEW form):
    per-supplier revenue, a 1-row MAX over it broadcast back, equality
    filter keeps all tied maxima. Revenue is rounded BEFORE the max/compare
    on both sides so order-of-accumulation ulps can't split a tie across
    engines."""
    cat = Catalog(spark, sf_dir)
    li = cat.table("lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("2000-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("2000-04-01")))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    s = cat.table("supplier")
    return (
        s.join(rev, s["s_suppkey"] == rev["l_suppkey"])
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__mx"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q17_shape",
    oracle="""
    WITH pa AS (
      SELECT l_partkey AS pk, sum(l_quantity) AS sq, count(*) AS cq
      FROM lineitem GROUP BY l_partkey
    )
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pa ON pa.pk = l_partkey
    WHERE p_brand = 'Brand#4' AND p_type = 'SMALL'
      AND 2 * l_quantity * cq < sq
    """,
)
def q_tpch_q17_shape(spark, sf_dir):
    """TPC-H Q17 (small-quantity-order revenue): the correlated AVG
    subquery (l_quantity < 0.2 * avg per part; 0.5 here for testdata
    selectivity) as a per-part pre-aggregate joined back. The threshold
    compare is INTEGER-EXACT on both engines — quantities are integer-
    valued, so `2 * qty * count < sum` avoids the cross-engine ulp
    hazard of comparing against a floating-point average."""
    cat = Catalog(spark, sf_dir)
    li = cat.table("lineitem")
    pa = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("l_quantity").alias("sq"), F.count(F.lit(1)).alias("cq")
    )
    p = cat.tbl("part").filter(
        (F.col("p_brand") == "Brand#4") & (F.col("p_type") == "SMALL")
    )
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(pa, li["l_partkey"] == pa["pk"])
        .filter(2 * F.col("l_quantity") * F.col("cq") < F.col("sq"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly")
        )
    )


@register(
    "tpch_q19_shape",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#16' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q_tpch_q19_shape(spark, sf_dir):
    """TPC-H Q19 (disjunctive predicate revenue): OR-of-ANDs spanning both
    tables. Catalyst splits the disjunction into single-table residuals
    (each side's derivable bounds push to its scan: l_quantity IN [1,30],
    p_brand IN the 3-list) and keeps the cross-table OR as a post-join
    filter — the pattern that proves pushdown through disjunctions."""
    cat = Catalog(spark, sf_dir)
    li = cat.table("lineitem")
    p = cat.tbl("part")
    j = li.join(p, li["l_partkey"] == p["p_partkey"])
    c1 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    )
    c2 = (
        (F.col("p_brand") == "Brand#16")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    )
    c3 = (
        (F.col("p_brand") == "Brand#19")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return j.filter(c1 | c2 | c3).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )


@register(
    "tpch_q22_shape",
    oracle="""
    SELECT c_nationkey AS cntry, count(*) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                       WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    ORDER BY cntry
    """,
)
def q_tpch_q22_shape(spark, sf_dir):
    """TPC-H Q22 shape (global-sales-opportunity; nationkey stands in for
    the phone-prefix country code): scalar AVG subquery broadcast back as
    a threshold + NOT EXISTS as a LEFT ANTI join against the urgent-order
    subset (every testdata customer has SOME order, so the classic no-
    orders form is vacuous; "no urgent order" keeps the anti-join shape
    selective-but-nonempty). The anti join's left side is already thinned
    by the balance filter before the shuffle, and the right side prunes
    on priority at its scan."""
    cat = Catalog(spark, sf_dir)
    c, o = cat.table("customer"), cat.table("orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("__avg")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg"))
        .join(
            o.filter(F.col("o_orderpriority") == "1-URGENT"),
            c["c_custkey"] == o["o_custkey"], "left_anti",
        )
        .groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntry")
    )


@register(
    "tpch_q8_shape",
    oracle="""
    WITH base AS (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1999-01-01'
        AND o_orderdate < TIMESTAMP '2001-01-01'
    )
    SELECT o_year,
           round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
                          ELSE 0 END) / sum(volume), 4) AS mkt_share
    FROM base GROUP BY o_year ORDER BY o_year
    """,
)
def q_tpch_q8_shape(spark, sf_dir):
    """TPC-H Q8 (national market share; p_type filter dropped — testdata
    part types are coarse — the market-share RATIO structure is the
    pattern): revenue into a region's customers by year, with one
    nation's supplier share as a conditional/total ratio in ONE grouped
    pass. Region/nation dims broadcast on both the customer and supplier
    legs (the same dim under two roles); the date window pushes to the
    orders scan."""
    cat = Catalog(spark, sf_dir)
    li, o, c, s = (cat.table("lineitem"), cat.table("orders"),
                   cat.table("customer"), cat.table("supplier"))
    n1 = cat.tbl("nation").select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_regionkey").alias("n1_region"),
    )
    n2 = cat.tbl("nation").select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("supp_nation"),
    )
    r = cat.tbl("region").filter(F.col("r_name") == "ASIA")
    of = o.filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1999-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("2001-01-01")))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        li.join(of, li["l_orderkey"] == of["o_orderkey"])
        .join(c, of["o_custkey"] == c["c_custkey"])
        .join(n1, F.col("c_nationkey") == F.col("n1_key"))
        .join(r, F.col("n1_region") == F.col("r_regionkey"))
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(n2, F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.alias("volume"), "supp_nation",
        )
    )
    share = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))
        .otherwise(0.0)
    ) / F.sum("volume")
    return (
        base.groupBy("o_year")
        .agg(F.round(share, 4).alias("mkt_share"))
        .orderBy("o_year")
    )


@register(
    "tpch_q21_shape",
    oracle="""
    WITH late AS (
      SELECT l_orderkey, l_suppkey FROM lineitem JOIN orders
        ON l_orderkey = o_orderkey
      WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    )
    SELECT s_name, count(*) AS numwait
    FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM late) l1
    JOIN supplier ON l1.l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM late l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q_tpch_q21_shape(spark, sf_dir):
    """TPC-H Q21 shape (suppliers who kept orders waiting — the ONLY
    supplier late on a multi-supplier order; lateness adapted to
    shipdate > orderdate + 60d since the testdata lacks commit/receipt
    dates): the hardest correlation pattern in the suite — an EXISTS and
    a NOT EXISTS against the SAME table under different aliases,
    correlated on (order, other-supplier). Both become per-order
    aggregates here: a multi-supplier order set (semi join) and a
    late-supplier-count per order (the NOT EXISTS holds iff this
    supplier is the order's ONLY late one) — each shuffles one row per
    order, never a correlated re-scan per row."""
    cat = Catalog(spark, sf_dir)
    li, o = cat.table("lineitem"), cat.table("orders")
    late = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    multi_supp = (
        li.groupBy("l_orderkey")
        .agg(F.count_distinct("l_suppkey").alias("__ns"))
        .filter(F.col("__ns") > 1)
        .select("l_orderkey")
    )
    late_counts = late.groupBy(F.col("l_orderkey").alias("__lk")).agg(
        F.count(F.lit(1)).alias("__nlate")
    )
    only_late = (
        late.join(multi_supp, "l_orderkey", "left_semi")
        .join(late_counts, late["l_orderkey"] == F.col("__lk"))
        .filter(F.col("__nlate") == 1)
    )
    s = cat.table("supplier")
    n = cat.tbl("nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    return (
        only_late.join(s, only_late["l_suppkey"] == s["s_suppkey"])
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@register(
    "agg_unpivot",
    oracle="""
    SELECT c_custkey, metric, round(value, 2) AS value
    FROM (
      UNPIVOT (SELECT c_custkey, c_acctbal,
                      CAST(c_nationkey AS DOUBLE) AS nation_id
               FROM customer)
      ON c_acctbal, nation_id
      INTO NAME metric VALUE value
    )
    ORDER BY c_custkey, metric
    """,
)
def q_agg_unpivot(spark, sf_dir):
    """Unpivot / melt — pivot's inverse (wide metrics to tidy long form,
    the shape feature stores and plotting layers want). Spark's native
    ``unpivot`` is a NARROW transformation: each input row fans out to
    one row per value column inside the scan stage, no shuffle at any
    scale; the only exchange here is the gate's presentation sort."""
    c = Catalog(spark, sf_dir).table("customer")
    wide = c.select(
        "c_custkey", "c_acctbal",
        F.col("c_nationkey").cast("double").alias("nation_id"),
    )
    return (
        wide.unpivot(
            "c_custkey", ["c_acctbal", "nation_id"], "metric", "value"
        )
        .select("c_custkey", "metric", F.round("value", 2).alias("value"))
        .orderBy("c_custkey", "metric")
    )


@register(
    "agg_median_exact",
    oracle="""
    SELECT o_orderpriority, round(median(o_totalprice), 2) AS med,
           count(*) AS n
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q_agg_median_exact(spark, sf_dir):
    """Exact grouped median (Spark's ``median`` = interpolated
    percentile(0.5), matching DuckDB) — the exact sibling of
    ``agg_approx_quantile``: fine per GROUP at any scale (each group's
    values sort within its reducer); for a global median over a fact
    table the sketch path is the answer, and the distributed-rank helper
    (operators/windows.py) is the exact fallback."""
    o = Catalog(spark, sf_dir).table("orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.round(F.median("o_totalprice"), 2).alias("med"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "agg_mode_deterministic",
    oracle="""
    WITH c AS (
      SELECT o_orderpriority, o_orderstatus, count(*) AS n
      FROM orders GROUP BY o_orderpriority, o_orderstatus
    ), m AS (SELECT o_orderpriority, max(n) AS mx FROM c
             GROUP BY o_orderpriority)
    SELECT c.o_orderpriority,
           min(o_orderstatus) AS mode_status,
           CAST(max(n) AS BIGINT) AS n
    FROM c JOIN m ON c.o_orderpriority = m.o_orderpriority AND c.n = m.mx
    GROUP BY c.o_orderpriority
    ORDER BY c.o_orderpriority
    """,
)
def q_agg_mode_deterministic(spark, sf_dir):
    """Grouped MODE with a DETERMINISTIC tie-break (lexicographic min
    among max-frequency values) — engines' native mode() leaves ties
    implementation-defined, which is exactly the nondeterminism a
    value-hashed pipeline can't ship. Two tiny aggregations over the
    (group, value) count table; the shuffle carries one row per distinct
    pair, never the fact."""
    o = Catalog(spark, sf_dir).table("orders")
    c = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )
    m = c.groupBy("o_orderpriority").agg(F.max("n").alias("mx"))
    return (
        c.join(m, ["o_orderpriority"])
        .filter(F.col("n") == F.col("mx"))
        .groupBy("o_orderpriority")
        .agg(
            F.min("o_orderstatus").alias("mode_status"),
            F.max("n").alias("n"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "tpch_q9_shape",
    oracle="""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
           round(sum(l_extendedprice * (1 - l_discount)
                     - 0.6 * p_retailprice * l_quantity), 2) AS sum_profit
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q_tpch_q9_shape(spark, sf_dir):
    """TPC-H Q9 shape (product-type profit by nation and year;
    0.6 * p_retailprice stands in for ps_supplycost — the testdata lacks
    partsupp — keeping the revenue-minus-cost expression structure): the
    part-name LIKE filter prunes the broadcast dim before the join, the
    5-table star groups on (supplier nation, order year), and the profit
    arithmetic runs inside the single grouped aggregation pass."""
    cat = Catalog(spark, sf_dir)
    li, o, s = (cat.table("lineitem"), cat.table("orders"),
                cat.table("supplier"))
    p = cat.tbl("part").filter(F.col("p_name").like("%red%"))
    n = cat.tbl("nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "tpch_q20_shape",
    oracle="""
    WITH promo AS (
      SELECT l_suppkey, sum(l_quantity) AS promo_qty
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_type = 'PROMO'
      GROUP BY l_suppkey
    ), total AS (
      SELECT l_suppkey, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_suppkey
    )
    SELECT s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
      AND s_suppkey IN (
        SELECT promo.l_suppkey FROM promo JOIN total
          ON promo.l_suppkey = total.l_suppkey
        WHERE promo_qty * 6 > total_qty
      )
    ORDER BY s_name
    """,
)
def q_tpch_q20_shape(spark, sf_dir):
    """TPC-H Q20 shape (suppliers with excess stock of filtered parts;
    shipped-quantity SHARE stands in for ps_availqty > 0.5*sum(qty) —
    suppliers whose PROMO-part volume exceeds a sixth of their total — the distribution's mean, so the threshold splits the population): the
    nested-IN structure — a correlated per-supplier aggregate threshold
    feeding a semi join into the dim-filtered supplier list. Both
    aggregates shuffle one row per supplier; the final IN is a broadcast
    semi join."""
    cat = Catalog(spark, sf_dir)
    li = cat.table("lineitem")
    p = cat.tbl("part").filter(F.col("p_type") == "PROMO")
    promo = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("promo_qty"))
    )
    total = li.groupBy(F.col("l_suppkey").alias("__sk")).agg(
        F.sum("l_quantity").alias("total_qty")
    )
    excess = (
        promo.join(total, promo["l_suppkey"] == F.col("__sk"))
        .filter(F.col("promo_qty") * 6 > F.col("total_qty"))
        .select("l_suppkey")
    )
    s = cat.table("supplier")
    n = cat.tbl("nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3", "NATION_4")
    )
    return (
        s.join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(excess, s["s_suppkey"] == excess["l_suppkey"], "left_semi")
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


# ---- derived partsupp: closes the q9/q20 stand-in gap (VERDICT r7 #3) --
#
# The driver's testdata schema is FROZEN (TESTDATA.md) and lacks TPC-H's
# partsupp, so tpch_q9_shape/q20_shape substituted retailprice/quantity-
# share for supplycost/availqty. r8 instead DERIVES a deterministic
# partsupp both engines can rebuild bit-identically: one row per shipped
# (l_partkey, l_suppkey) pair (TPC-H guarantees lineitem's pairs exist in
# partsupp — deriving from shipped pairs preserves exactly the coverage
# q9/q20 consume), with integer-formula attributes
#   ps_availqty   = 1 + (ps_partkey*31 + ps_suppkey*17) % 9999
#   ps_supplycost = ((ps_partkey*131 + ps_suppkey*523) % 99900 + 100)/100.0
# (positive-int % agrees across Spark/DuckDB; one double division of the
# same integer is IEEE-identical). tpch_q9/tpch_q20 below run the REAL
# supplycost/availqty semantics on it, fully value-hash-gated; the _shape
# variants stay registered for round-over-round continuity.

_PARTSUPP_SQL = """
      SELECT ps_partkey, ps_suppkey,
             CAST(1 + (ps_partkey * 31 + ps_suppkey * 17) % 9999 AS INT)
               AS ps_availqty,
             CAST((ps_partkey * 131 + ps_suppkey * 523) % 99900 + 100
                  AS DOUBLE) / 100.0 AS ps_supplycost
      FROM (SELECT DISTINCT l_partkey AS ps_partkey,
                            l_suppkey AS ps_suppkey FROM lineitem)
"""


def _partsupp_synth(cat):
    li = cat.table("lineitem")
    return (
        li.select(F.col("l_partkey").alias("ps_partkey"),
                  F.col("l_suppkey").alias("ps_suppkey"))
        .distinct()
        .withColumn(
            "ps_availqty",
            (F.lit(1) + (F.col("ps_partkey") * 31
                         + F.col("ps_suppkey") * 17) % 9999).cast("int"),
        )
        .withColumn(
            "ps_supplycost",
            ((F.col("ps_partkey") * 131 + F.col("ps_suppkey") * 523)
             % 99900 + 100).cast("double") / 100.0,
        )
    )


@register("partsupp_synth", oracle=f"SELECT * FROM ({_PARTSUPP_SQL})")
def q_partsupp_synth(spark, sf_dir):
    """The derived partsupp relation itself, value-checked end to end
    (see the derivation note above): one distinct-pairs shuffle over
    lineitem's two key columns, then two codegen'd integer formulas —
    at 100 TB this is a map-combinable distinct on a skinny projection,
    nothing else."""
    return _partsupp_synth(Catalog(spark, sf_dir))


_TPCH_Q9_ORACLE = f"""
    WITH partsupp AS ({_PARTSUPP_SQL})
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
           round(sum(l_extendedprice * (1 - l_discount)
                     - ps_supplycost * l_quantity), 2) AS sum_profit
    FROM lineitem
    JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, o_year
    ORDER BY nation, o_year DESC
    """

@register("tpch_q9", oracle=_TPCH_Q9_ORACLE)
def q_tpch_q9(spark, sf_dir):
    """TPC-H Q9 with the REAL profit expression — revenue minus
    ps_supplycost * l_quantity over the derived partsupp (the r7
    stand-in used 0.6*p_retailprice; VERDICT r7 #3).

    The partsupp JOIN is algebraically ELIMINATED (r9, after the
    interleaved sf10 A/B measured the join form 5.9x slower than the
    oracle — compute-bound, so diagnose-or-close): the derived
    partsupp's attributes are pure functions of (ps_partkey,
    ps_suppkey) and its key set is exactly lineitem's DISTINCT
    (l_partkey, l_suppkey) pairs, so the inner equi-join attaches to
    every lineitem row precisely the formula value of its own keys —
    never dropping or duplicating a row. Evaluating the formula inline
    is therefore value-identical (same integer arithmetic, same single
    double division) while deleting BOTH lineitem-scale stages the
    join needed: the distinct-pairs exchange that built partsupp and
    the big-big composite-key join against it. This is the rewrite a
    generated-column-aware optimizer would make; the ORACLE keeps the
    join form, so the value-hash gate is exactly the proof the rewrite
    is sound. A real (non-functional) partsupp would need the join —
    that plan shape stays exercised by tpch_q9_shape and the
    partsupp_synth row itself (Spark 9.5x FASTER than the oracle on
    the distinct+formula build, sf1 interleaved).

    Remaining plan: part's LIKE filter prunes before its broadcast
    join; supplier+nation broadcast; the orders join is the one
    big-big exchange, on the natural l_orderkey; the 5-way star then
    aggregates once, map-combinably, on (nation, year)."""
    cat = Catalog(spark, sf_dir)
    li, o, s = (cat.table("lineitem"), cat.table("orders"),
                cat.table("supplier"))
    p = cat.tbl("part").filter(F.col("p_name").like("%red%"))
    n = cat.tbl("nation")
    # identical arithmetic to _partsupp_synth's ps_supplycost, on the
    # lineitem row's own keys (see docstring for why this is exact)
    supplycost = (
        (F.col("l_partkey") * 131 + F.col("l_suppkey") * 523)
        % 99900 + 100
    ).cast("double") / 100.0
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - supplycost * F.col("l_quantity")
    )
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@register("tpch_q9_partsupp_join", oracle=_TPCH_Q9_ORACLE)
def q_tpch_q9_partsupp_join(spark, sf_dir):
    """Q9 with the partsupp JOIN materialized — the general-case plan a
    REAL partsupp (attributes not derivable from the keys) requires:
    distinct-pairs build, big-big composite-key join, then the star.
    Kept registered and gate-checked after r9's `tpch_q9` eliminated
    the join algebraically (see its docstring: the derived partsupp is
    a pure function of the keys, so inlining is value-identical —
    this row and that one hash to the SAME oracle results, which is
    the rewrite's soundness proof running every round). Measured cost
    of the join form at sf10: 11.9 s vs 2.7 s inlined, 5.9x vs the
    oracle (BASELINE.md r9) — the price of generality, paid only when
    the attributes are genuinely independent data."""
    cat = Catalog(spark, sf_dir)
    li, o, s = (cat.table("lineitem"), cat.table("orders"),
                cat.table("supplier"))
    ps = _partsupp_synth(cat)
    p = cat.tbl("part").filter(F.col("p_name").like("%red%"))
    n = cat.tbl("nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("ps_supplycost") * F.col("l_quantity")
    )
    return (
        li.join(ps, (li["l_partkey"] == ps["ps_partkey"])
                & (li["l_suppkey"] == ps["ps_suppkey"]))
        .join(p, li["l_partkey"] == p["p_partkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "tpch_q2",
    oracle=f"""
    WITH partsupp AS ({_PARTSUPP_SQL}),
    sr AS (
      SELECT s_suppkey, s_acctbal, s_name, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
    ),
    cand AS (
      SELECT p_partkey, p_name, ps_supplycost, s_acctbal, s_name, n_name
      FROM part
      JOIN partsupp ON p_partkey = ps_partkey
      JOIN sr ON ps_suppkey = s_suppkey
      WHERE p_size = 15
    ),
    mn AS (SELECT p_partkey, min(ps_supplycost) AS min_cost
           FROM cand GROUP BY p_partkey)
    SELECT round(c.s_acctbal, 2) AS s_acctbal, s_name, n_name,
           c.p_partkey AS p_partkey, p_name,
           round(c.ps_supplycost, 2) AS supplycost
    FROM cand c JOIN mn ON c.p_partkey = mn.p_partkey
                       AND c.ps_supplycost = mn.min_cost
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 20
    """,
)
def q_tpch_q2(spark, sf_dir):
    """TPC-H Q2 with the REAL minimum-cost-supplier semantics over the
    derived partsupp (r9 — closes the last two partsupp stand-ins,
    q2/q11, the same way r8 closed q9/q20; tpch_q2_shape's
    s_acctbal-for-supplycost substitution stays for continuity).
    Correlated MIN as groupBy + equality join-back, exactly the shape's
    plan but on ps_supplycost. The supplycost equality join is
    bit-safe across engines: every supplycost is the same single
    double division of the same integer, so min and the compare see
    identical doubles. Plan: the very selective part filter broadcasts
    INTO the pair relation first, then the region-filtered supplier
    dim broadcasts — cand is a few rows per qualifying part before the
    min runs. The decisive scale move (r9, after the first sf10 A/B
    measured the full-partsupp form 4.0x over the oracle): the
    selective part and region predicates SEMI-JOIN into the raw
    lineitem pairs BEFORE the distinct — filter-through-distinct is
    sound for key-determined predicates, and DuckDB gets the same
    rewrite for free by inlining the CTE, which is exactly why the
    full-build form lost. The distinct then exchanges ~2% of the
    pairs instead of all of them (sf10: 14.5 s -> 2.0 s, under the
    bar); at 100 TB the broadcast semi-joins prune at the scan."""
    cat = Catalog(spark, sf_dir)
    sr = (
        cat.table("supplier")
        .join(cat.tbl("nation"),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(cat.tbl("region").filter(F.col("r_name") == "ASIA"),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    p = cat.tbl("part").filter(F.col("p_size") == 15)
    li = cat.table("lineitem")
    pairs = (
        li.select(F.col("l_partkey").alias("ps_partkey"),
                  F.col("l_suppkey").alias("ps_suppkey"))
        .join(F.broadcast(p.select("p_partkey")),
              F.col("ps_partkey") == F.col("p_partkey"), "left_semi")
        .join(F.broadcast(sr.select("s_suppkey")),
              F.col("ps_suppkey") == F.col("s_suppkey"), "left_semi")
        .distinct()
    )
    ps = pairs.withColumn(
        "ps_supplycost",
        ((F.col("ps_partkey") * 131 + F.col("ps_suppkey") * 523)
         % 99900 + 100).cast("double") / 100.0,
    )
    cand = (
        ps.join(F.broadcast(p), ps["ps_partkey"] == p["p_partkey"])
        .join(F.broadcast(sr), ps["ps_suppkey"] == sr["s_suppkey"])
        .select("p_partkey", "p_name", "ps_supplycost",
                "s_acctbal", "s_name", "n_name")
    )
    mn = cand.groupBy(F.col("p_partkey").alias("__pk")).agg(
        F.min("ps_supplycost").alias("__min_cost")
    )
    return (
        cand.join(
            mn,
            (cand["p_partkey"] == mn["__pk"])
            & (cand["ps_supplycost"] == mn["__min_cost"]),
        )
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name", "n_name", "p_partkey", "p_name",
            F.round("ps_supplycost", 2).alias("supplycost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(20)
    )


@register(
    "tpch_q11",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
    ),
    val AS (
      SELECT pk AS ps_partkey,
             sum(CAST(1 + (pk * 31 + sk * 17) % 9999 AS BIGINT)
                 * CAST((pk * 131 + sk * 523) % 99900 + 100 AS BIGINT))
               AS vc
      FROM pairs GROUP BY pk
    )
    SELECT ps_partkey AS partkey, CAST(vc AS DOUBLE) / 100.0 AS value
    FROM val
    WHERE 10000 * vc > (SELECT sum(vc) FROM val)
    ORDER BY value DESC, partkey
    """,
)
def q_tpch_q11(spark, sf_dir):
    """TPC-H Q11 with the REAL stock-value semantics — per-part
    sum(ps_supplycost * ps_availqty) over one nation's suppliers,
    kept where it exceeds the standard 0.0001 fraction of the total
    (r9; tpch_q11_shape's revenue substitution stays for continuity).
    Same HAVING-against-a-global-fraction plan as the shape: per-key
    aggregate, 1-row global sum over it broadcast back, filter — the
    global reduction reads the tiny per-part aggregate, never
    partsupp.

    INTEGER-EXACT value contract (the repo's never-round-a-blend
    rule): ps_supplycost is exactly cents/100 and ps_availqty is an
    int, so the whole computation runs in BIGINT CENTS — per-pair
    availqty * cost_cents (<= 1e9), per-part sums vc (<= ~4e12 at
    sf10; 10^4 * vc stays far inside int64 through sf1000), and the
    1e-4 threshold becomes the EXACT comparison 10^4*vc > sum(vc).
    The displayed dollars value is one double division of the same
    int64 on both engines — hashed raw, no rounding anywhere, no
    order-of-accumulation exposure at all (r9 code review replaced
    the double-blend first draft). Scale move (r9, same diagnosis as
    tpch_q2): the one-nation supplier predicate semi-joins into the
    raw pairs BEFORE the distinct, so the exchange carries ~4% of the
    pairs (sf10: 6.1 s -> 1.4-2.1 s). The residual gap vs the
    hardened integer-cents oracle (0.42 s at sf10) is STAGE FLOOR,
    not work — the measured sf10 stage split: bare 2-col scan+agg
    0.35 s, +semi 0.77, +distinct 0.92, +per-part agg 1.09, full
    pipeline 1.39 — each added stage costs ~one VM stage barrier
    (~0.3 s) while the added WORK is centiseconds.

    r10 closes the floor-bound claim with EVIDENCE (VERDICT r9 #1):
    (a) both fusion arms measured and REJECTED — collect_set fusing
    distinct+groupBy into one exchange is 33% slower (the
    higher-order sum loses to two codegen hash aggs), and a declared
    checkpoint on `val` is flat (AQE exchange reuse already dedups
    the threshold branch); (b) the interleaved engine/oracle ratio
    CONVERGES across three decades as the floor model predicts:
    sf10 1.60/0.47 = 3.4x, sf30 2.45/0.88 = 2.8x, sf100 (600M-row
    lineitem) 6.26/3.04 = 2.06x, second independent sf100 session
    5.34/2.77 = 1.93x — UNDER the bar at the crossover decade, with
    the asymptote set by the two engines' bare 2-col parquet scan
    speeds, not by plan shape (BASELINE.md r10)."""
    cat = Catalog(spark, sf_dir)
    s = (
        cat.table("supplier")
        .join(cat.tbl("nation").filter(F.col("n_name") == "NATION_3"),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    li = cat.table("lineitem")
    pairs = (
        li.select(F.col("l_partkey").alias("pk"),
                  F.col("l_suppkey").alias("sk"))
        .join(F.broadcast(s),
              F.col("sk") == F.col("s_suppkey"), "left_semi")
        .distinct()
    )
    cents = (
        (F.lit(1) + (F.col("pk") * 31 + F.col("sk") * 17) % 9999)
        * ((F.col("pk") * 131 + F.col("sk") * 523) % 99900 + 100)
    )
    val = pairs.groupBy(F.col("pk").alias("ps_partkey")).agg(
        F.sum(cents).alias("vc")
    )
    thresh = val.agg(F.sum("vc").alias("__t"))
    return (
        val.crossJoin(F.broadcast(thresh))
        .filter(F.lit(10000) * F.col("vc") > F.col("__t"))
        .select(
            F.col("ps_partkey").alias("partkey"),
            (F.col("vc").cast("double") / 100.0).alias("value"),
        )
        .orderBy(F.col("value").desc(), "partkey")
    )


@register(
    "tpch_q20",
    oracle=f"""
    WITH partsupp AS ({_PARTSUPP_SQL}),
    shipped AS (
      SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_partkey, l_suppkey
    )
    SELECT s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
      AND s_suppkey IN (
        SELECT ps_suppkey
        FROM partsupp
        JOIN part ON p_partkey = ps_partkey AND p_name LIKE 'red%'
        JOIN shipped ON shipped.l_partkey = ps_partkey
                    AND shipped.l_suppkey = ps_suppkey
        WHERE ps_availqty > 0.5 * qty
      )
    ORDER BY s_name
    """,
)
def q_tpch_q20(spark, sf_dir):
    """TPC-H Q20 with the REAL availqty threshold — suppliers in the
    four nations holding excess stock (ps_availqty > half the 1996
    shipped quantity) of a name-prefixed part, over the derived
    partsupp (the r7 stand-in used a shipped-quantity share; VERDICT
    r7 #3). The correlated structure is the real one: per-(part,supp)
    year aggregate -> threshold against partsupp -> semi join into the
    dim-filtered supplier list. Quantity sums are small-int-valued
    doubles, so the 0.5*qty comparison is exact on both engines."""
    import datetime as _dt

    cat = Catalog(spark, sf_dir)
    li = cat.table("lineitem")
    p = cat.tbl("part").filter(F.col("p_name").like("red%"))
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit(_dt.datetime(1996, 1, 1)))
            & (F.col("l_shipdate") < F.lit(_dt.datetime(1997, 1, 1)))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    # partsupp join eliminated (r9, same algebra as tpch_q9): every
    # 1996-shipped pair is a shipped pair overall, so shipped's keys
    # are a SUBSET of the derived partsupp's key set and the inner
    # join ps⋈shipped keeps shipped unchanged; ps_availqty is a pure
    # function of the keys, evaluated inline with identical integer
    # arithmetic — the two lineitem-scale stages the join needed
    # (distinct-pairs exchange + composite-key join) disappear, and
    # the oracle's join form is the gate-checked proof of soundness.
    availqty = (
        F.lit(1) + (F.col("l_partkey") * 31
                    + F.col("l_suppkey") * 17) % 9999
    ).cast("int")
    excess = (
        shipped.join(p, shipped["l_partkey"] == p["p_partkey"])
        .filter(availqty > 0.5 * F.col("qty"))
        .select(F.col("l_suppkey").alias("ps_suppkey"))
    )
    s = cat.table("supplier")
    n = cat.tbl("nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3", "NATION_4")
    )
    return (
        s.join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(excess, s["s_suppkey"] == excess["ps_suppkey"], "left_semi")
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@register(
    "agg_quartiles",
    oracle="""
    SELECT c_mktsegment,
           list_transform(quantile_cont(c_acctbal, [0.25, 0.5, 0.75]),
                          x -> round(x, 2)) AS quartiles
    FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def q_agg_quartiles(spark, sf_dir):
    """Grouped quartile BANDS in one pass: ``percentile(col, array(...))``
    computes all three interpolated quantiles from a single per-group
    sort — the box-plot/SLA-band shape. One aggregate, one shuffle row
    per group; both engines interpolate identically (continuous
    quantile over the same doubles)."""
    c = Catalog(spark, sf_dir).table("customer")
    q = F.expr(
        "transform(percentile(c_acctbal, array(0.25D, 0.5D, 0.75D)), "
        "x -> round(x, 2))"
    )
    return (
        c.groupBy("c_mktsegment")
        .agg(q.alias("quartiles"))
        .orderBy("c_mktsegment")
    )


@register(
    "orders_cohort_revenue",
    oracle="""
    WITH first AS (
      SELECT o_custkey, date_trunc('month', min(o_orderdate)) AS cohort_m
      FROM orders GROUP BY o_custkey
    )
    SELECT cohort_m,
           CAST(date_diff('day', cohort_m,
                          date_trunc('month', o_orderdate)) AS INT)
             AS day_offset,
           round(sum(o_totalprice), 2) AS revenue,
           CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_buyers
    FROM orders o JOIN first ON o.o_custkey = first.o_custkey
    GROUP BY cohort_m, day_offset
    ORDER BY cohort_m, day_offset
    """,
)
def q_orders_cohort_revenue(spark, sf_dir):
    """Revenue cohorts (LTV curve input): customers grouped by
    first-order month, revenue and distinct buyers per subsequent month
    — the retention-cohort machinery pointed at money. Month offsets are
    day-difference integers (month arithmetic differs across engines;
    day diffs of month-truncated dates are exact everywhere). Two
    shuffles: first-order aggregate, then the (cohort, offset) rollup."""
    o = Catalog(spark, sf_dir).table("orders")
    first = o.groupBy(F.col("o_custkey").alias("__ck")).agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort_m")
    )
    return (
        o.join(first, o["o_custkey"] == F.col("__ck"))
        .groupBy(
            "cohort_m",
            F.datediff(F.date_trunc("month", F.col("o_orderdate")),
                       F.col("cohort_m")).cast("int").alias("day_offset"),
        )
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count_distinct("o_custkey").alias("n_buyers"),
        )
        .orderBy("cohort_m", "day_offset")
    )


@register(
    "orders_rfm",
    oracle="""
    WITH base AS (
      SELECT o_custkey,
             date_diff('day', max(o_orderdate),
                       TIMESTAMP '2002-01-01') AS recency,
             count(*) AS frequency,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS monetary
      FROM orders GROUP BY o_custkey
    ), b AS (
      SELECT quantile_cont(recency, [0.25, 0.5, 0.75]) AS rb,
             quantile_cont(frequency * 1.0, [0.25, 0.5, 0.75]) AS fb,
             quantile_cont(monetary, [0.25, 0.5, 0.75]) AS mb
      FROM base
    )
    SELECT o_custkey,
           CAST(CASE WHEN recency <= rb[1] THEN 1 WHEN recency <= rb[2]
                THEN 2 WHEN recency <= rb[3] THEN 3 ELSE 4 END AS INT) AS r,
           CAST(CASE WHEN frequency <= fb[1] THEN 1 WHEN frequency <= fb[2]
                THEN 2 WHEN frequency <= fb[3] THEN 3 ELSE 4 END AS INT) AS f,
           CAST(CASE WHEN monetary <= mb[1] THEN 1 WHEN monetary <= mb[2]
                THEN 2 WHEN monetary <= mb[3] THEN 3 ELSE 4 END AS INT) AS m
    FROM base CROSS JOIN b
    ORDER BY o_custkey
    """,
)
def q_orders_rfm(spark, sf_dir):
    """RFM segmentation — the classic customer scoring: per-customer
    recency/frequency/monetary, bucketed 1-4 against the corpus quartile
    boundaries. The boundaries are ONE 1-row aggregate broadcast back
    (never a global-order window), so the whole query is two passes:
    per-customer rollup, then bucket-by-comparison. At 100 TB the exact
    percentile boundaries become approxQuantile with the same compare —
    the plan shape is unchanged. All three metrics are exact integers
    (days, counts, CENTS — r13), so the interpolated boundaries are
    bit-identical cross-engine and bucket compares can never flip on an
    accumulation-order ulp."""
    o = Catalog(spark, sf_dir).table("orders")
    base = o.groupBy("o_custkey").agg(
        F.datediff(F.to_timestamp(F.lit("2002-01-01")),
                   F.max("o_orderdate")).alias("recency"),
        F.count(F.lit(1)).alias("frequency"),
        # BIGINT cents, not a float-blend sum (r13 review; the tpch_q11
        # never-round-a-blend rule): double partial sums accumulate in
        # different orders per engine, and an ulp at a quantile boundary
        # flips a bucket on one engine only. Cent-scaled sums are exact
        # integers — order-independent — and the interpolated boundaries
        # derived from identical integers match to the bit.
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .alias("monetary"),
    )
    bounds = base.agg(
        F.expr("percentile(recency, array(0.25D, 0.5D, 0.75D))").alias("rb"),
        F.expr("percentile(frequency * 1.0, array(0.25D, 0.5D, 0.75D))")
        .alias("fb"),
        F.expr("percentile(monetary, array(0.25D, 0.5D, 0.75D))").alias("mb"),
    )

    def bucket(c, b):
        return (
            F.when(F.col(c) <= F.element_at(F.col(b), 1), 1)
            .when(F.col(c) <= F.element_at(F.col(b), 2), 2)
            .when(F.col(c) <= F.element_at(F.col(b), 3), 3)
            .otherwise(4)
        ).cast("int")

    return (
        base.crossJoin(F.broadcast(bounds))
        .select(
            "o_custkey",
            bucket("recency", "rb").alias("r"),
            bucket("frequency", "fb").alias("f"),
            bucket("monetary", "mb").alias("m"),
        )
        .orderBy("o_custkey")
    )


@register(
    "orders_market_basket",
    oracle="""
    WITH ot AS (
      SELECT DISTINCT l_orderkey, p_type
      FROM lineitem JOIN part ON l_partkey = p_partkey
    )
    SELECT a.p_type AS type_a, b.p_type AS type_b, count(*) AS n_orders
    FROM ot a JOIN ot b
      ON a.l_orderkey = b.l_orderkey AND a.p_type < b.p_type
    GROUP BY type_a, type_b
    ORDER BY type_a, type_b
    """,
)
def q_orders_market_basket(spark, sf_dir):
    """Market-basket co-occurrence: how often two part types appear in
    the SAME order — association-mining support counts. The scale shape
    is the shingle-pair recipe from the dedup family applied
    relationally: dedup to (order, type) pairs first (bounding the
    per-order set by |types|, not line items), then expand pairs INSIDE
    the per-order group via a self-join on the already-shuffled key —
    fan-out is ≤ C(|types|, 2) per order regardless of order width."""
    cat = Catalog(spark, sf_dir)
    li = cat.table("lineitem")
    p = cat.tbl("part")
    ot = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .select("l_orderkey", "p_type")
        .distinct()
    )
    a = ot.select(F.col("l_orderkey").alias("k"),
                  F.col("p_type").alias("type_a"))
    b = ot.select(F.col("l_orderkey").alias("k2"),
                  F.col("p_type").alias("type_b"))
    return (
        a.join(b, (F.col("k") == F.col("k2"))
               & (F.col("type_a") < F.col("type_b")))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("type_a", "type_b")
    )


@register(
    "orders_pareto",
    oracle="""
    WITH rev AS (
      SELECT o_custkey, round(sum(o_totalprice), 2) AS revenue
      FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT revenue,
             ntile(10) OVER (ORDER BY revenue DESC, o_custkey ASC)
               AS decile
      FROM rev
    )
    SELECT CAST(decile AS INT) AS decile,
           round(sum(revenue), 2) AS revenue,
           round(sum(revenue) / (SELECT sum(revenue) FROM rev), 4)
             AS share
    FROM ranked GROUP BY decile ORDER BY decile
    """,
)
def q_orders_pareto(spark, sf_dir):
    """Revenue concentration (Pareto curve): customers ranked by spend,
    rolled into deciles with each decile's share of total revenue — the
    'top 10% of customers drive X%' report. The global rank comes from
    the distributed prefix-sum helper (no SinglePartition window); the
    revenue is pre-rounded so rank ties can't split across engines, and
    decile assignment uses exact SQL ntile arithmetic."""
    from ..operators.windows import distributed_global_rank

    o = Catalog(spark, sf_dir).table("orders")
    rev = o.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue")
    ).withColumn("neg_rev", -F.col("revenue"))
    ranked, n = distributed_global_rank(rev, ["neg_rev", "o_custkey"])
    k = 10
    q, r = divmod(n, k)
    big = (q + 1) * r
    rank = F.col("__rank")
    decile = (
        F.when(rank <= big, ((rank - 1) / (q + 1)).cast("long") + 1)
        .otherwise(F.lit(r) + ((rank - big - 1) / q).cast("long") + 1)
    ).cast("int")
    total = rev.agg(F.sum("revenue").alias("__t"))
    return (
        ranked.select(decile.alias("decile"), "revenue")
        .groupBy("decile")
        .agg(F.round(F.sum("revenue"), 2).alias("revenue"),
             F.sum("revenue").alias("__raw"))
        .crossJoin(F.broadcast(total))
        .select(
            "decile", "revenue",
            F.round(F.col("__raw") / F.col("__t"), 4).alias("share"),
        )
        .orderBy("decile")
    )


@register(
    "udaf_median_pandas",
    oracle="""
    SELECT o_orderpriority, round(median(o_totalprice), 2) AS med,
           count(*) AS n
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q_udaf_median_pandas(spark, sf_dir):
    """Pandas GROUPED-AGG UDAF — the one §2.10 UDF API surface the
    registry didn't yet demonstrate (scalar pandas UDF: auth; UDTF:
    sentences; mapInPandas: codecs; applyInPandas(+WithState): zscore /
    streaming). A custom aggregate runs as an Arrow-batched reduction
    per group; the oracle is the SAME SQL as agg_median_exact, so the
    UDAF path is value-checked against both DuckDB and (transitively)
    the built-in F.median form. Median is chosen deliberately: an order
    statistic is exact (no accumulation-order float drift), keeping the
    cross-engine hash byte-stable where a UDAF mean/geomean would not
    be. Scale note: GROUPED_AGG materializes each group in one worker —
    correct for bounded groups (these are 5 priority buckets); unbounded
    groups belong to the built-in partial aggregates."""
    import pandas as pd

    def _median(v: pd.Series) -> float:
        return float(v.median())

    def _n(v: pd.Series) -> int:
        return int(len(v))

    # typed via the explicit signature (the string-annotation form trips
    # PySpark's signature parser for GROUPED_AGG); Spark refuses to mix
    # GROUPED_AGG UDAFs with built-in aggregates in one agg(), so the
    # count rides a second UDAF instead of F.count
    median_udaf = F.pandas_udf(_median, "double", F.PandasUDFType.GROUPED_AGG)
    count_udaf = F.pandas_udf(_n, "long", F.PandasUDFType.GROUPED_AGG)

    o = Catalog(spark, sf_dir).table("orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.round(median_udaf("o_totalprice"), 2).alias("med"),
            count_udaf("o_totalprice").alias("n"),
        )
        .orderBy("o_orderpriority")
    )


@register("agg_cms_heavy_hitters")  # rows-only: CMS bit layout is
# engine-specific; the estimate bounds are pytest-pinned instead
def q_agg_cms_heavy_hitters(spark, sf_dir):
    """Count-min sketch heavy hitters — completing the mergeable-sketch
    family (HLL distinct, approx quantile, bloom membership, now CMS
    frequency): ONE pass builds a fixed-size sketch (count_min_sketch is
    algebraic — partials merge associatively, so at 100 TB every
    partition contributes a sketch and the driver merges KBs); the
    serialized sketch is then probed driver-side through Spark's own
    CountMinSketch reader (no SQL estimate function exists yet in 4.1).
    Estimates are deterministic (fixed seed) and obey the CMS contract:
    estimate >= true count, overshoot <= eps * N (pytest-bounded)."""
    o = Catalog(spark, sf_dir).table("orders")
    # probe keys ride the SAME pass as the sketch (r13 review: a
    # separate distinct().collect() re-scanned the fact table just to
    # learn ~5 keys); collect_set is algebraic like the sketch, bounded
    # by the low-cardinality key domain
    row = o.agg(
        F.count_min_sketch(
            "o_orderpriority", F.lit(0.01), F.lit(0.99), F.lit(42)
        ).alias("sk"),
        F.count(F.lit(1)).alias("n"),
        F.collect_set("o_orderpriority").alias("ks"),
    ).collect()[0]
    jvm = spark.sparkContext._jvm
    bais = jvm.java.io.ByteArrayInputStream(bytes(row.sk))
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bais)
    keys = sorted(row.ks)
    return spark.createDataFrame(
        [(k, int(cms.estimateCount(k)), int(row.n)) for k in keys],
        "o_orderpriority STRING, est LONG, n LONG",
    )


# Measured size gate for data_profile's distinct counts (r8, VERDICT r7
# #2): below, exact COUNT(DISTINCT) — the 6x Expand is harmless at small
# n and the DuckDB gate checks exact values (the driver runs at sf0.01);
# above, the distincts switch to the mergeable HLL sketch and the whole
# profile collapses to ONE Expand-free pass (same automatic-plan-choice
# pattern as graph_pagerank's measured broadcast gate). Crossover
# measured interleaved at sf1 (1.5 M rows) / sf10 (15 M): numbers in
# BASELINE.md r8.
DATA_PROFILE_HLL_ROWS = 5_000_000


def _footer_profile_stats(sf_dir, table, cols):
    """EXACT per-column (null_count, min_str, max_str) from parquet
    row-group footers — metadata only, no data read, no Spark job. A
    column qualifies only if EVERY chunk carries complete statistics
    (has_min_max + null_count); anything else is excluded and the caller
    keeps it in the scan agg, so a writer that OMITS stats can only cost
    time, never correctness. TRUNCATED stats are the one shape the
    footer cannot self-report (parquet-mr truncates binary min/max at
    64 bytes and bumps the max's last byte; pyarrow exposes no
    is-exact flag — r13 review), so string/bytes stats at or beyond
    that length are rejected as untrusted and the column falls back to
    the exact scan path — a 64-byte genuine value costs a scan, never
    a wrong profile row. Values are rendered exactly
    as the scan path's Spark casts do: ints/strings verbatim, doubles
    through DECIMAL(18,2) HALF_UP (Spark's double→decimal goes through
    the shortest decimal repr, which is what Python's repr() gives)."""
    import os
    from decimal import ROUND_HALF_UP, Decimal

    import pyarrow.parquet as papq

    from ..sources.catalog import parquet_part_files

    files = parquet_part_files(os.path.join(sf_dir, f"{table}.parquet"))
    acc = {c: [0, None, None] for c in cols}
    bad = set()
    for f in files:
        md = papq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i
                 for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for c in cols:
                if c in bad:
                    continue
                i = names.get(c)
                st = row.column(i).statistics if i is not None else None
                if (st is None or not st.has_min_max
                        or st.null_count is None):
                    bad.add(c)
                    continue
                mn, mx = st.min, st.max
                # parquet-mr truncates string stats at 64 BYTES; pyarrow
                # hands back decoded str, so a multibyte UTF-8 value cut
                # at 64 bytes decodes to <64 CHARS and would slip a
                # len(v) guard (r13 ADVICE) — compare encoded byte length
                if any(isinstance(v, (str, bytes))
                       and (len(v) if isinstance(v, bytes)
                            else len(v.encode("utf-8", "surrogatepass"))
                            ) >= 64
                       for v in (mn, mx)):
                    bad.add(c)  # possibly truncated — see docstring
                    continue
                cur = acc[c]
                cur[0] += st.null_count
                cur[1] = mn if cur[1] is None or mn < cur[1] else cur[1]
                cur[2] = mx if cur[2] is None or mx > cur[2] else cur[2]

    def fmt(v):
        if isinstance(v, float):
            return str(Decimal(repr(v)).quantize(
                Decimal("0.01"), rounding=ROUND_HALF_UP))
        if isinstance(v, bytes):
            return v.decode("utf-8")
        return str(v)

    return {
        c: (v[0], fmt(v[1]), fmt(v[2]))
        for c, v in acc.items()
        if c not in bad and v[1] is not None
    }


def _data_profile_oracle_valid(sf_dir: str) -> bool:
    """The registered oracle asserts EXACT count(DISTINCT); above the
    HLL gate the engine deliberately returns sketch estimates, so the
    oracle only models the query below the gate (r9 ADVICE fix —
    check_oracle.py downgrades to rows-only beyond it instead of
    reporting a false value mismatch). Same footer read as the plan
    choice itself, so the two can never disagree."""
    from ..sources.catalog import parquet_num_rows

    return parquet_num_rows(sf_dir, "orders") <= DATA_PROFILE_HLL_ROWS


@register(
    "data_profile",
    oracle_valid=_data_profile_oracle_valid,
    oracle="""
    SELECT 'o_custkey' AS col,
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
           CAST(min(o_custkey) AS VARCHAR) AS min_s,
           CAST(max(o_custkey) AS VARCHAR) AS max_s
    FROM orders
    UNION ALL
    SELECT 'o_orderdate',
           CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT o_orderdate) AS BIGINT),
           CAST(min(o_orderdate) AS VARCHAR), CAST(max(o_orderdate) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderkey',
           CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT o_orderkey) AS BIGINT),
           CAST(min(o_orderkey) AS VARCHAR), CAST(max(o_orderkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority',
           CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT o_orderpriority) AS BIGINT),
           min(o_orderpriority), max(o_orderpriority)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus',
           CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT o_orderstatus) AS BIGINT),
           min(o_orderstatus), max(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice',
           CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT o_totalprice) AS BIGINT),
           CAST(CAST(min(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR),
           CAST(CAST(max(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR)
    FROM orders
    ORDER BY col
    """,
)
def q_data_profile(spark, sf_dir, force_hll=False):
    """Column-level data profiling (the Deequ/Great-Expectations analyzer
    core): per column, null count, distinct count, and min/max in long
    format. ``force_hll`` (bench-only, never set by the registry entry)
    takes the sketch+footer path regardless of row count so bench.py can
    regression-watch the >5M-row plan at sf0.1 (r12, VERDICT #3).

    EXACT path (n <= DATA_PROFILE_HLL_ROWS): deliberately TWO aggs
    cross-joined (1 row × 1 row), not one — folding the six
    COUNT(DISTINCT)s into the same agg as the null/min/max pass makes
    Catalyst's Expand multiply every input row 7x WITH the carry-along
    columns before the shuffle (measured 4.8x slower at sf0.1, 3.38 s
    vs 0.70 s). Split, the distinct agg's Expand carries only the six
    key columns and the plain agg stays Expand-free.

    SKETCH path (n > gate, chosen from the parquet footer count — no
    extra job): approx_count_distinct (HLL, default 5% rsd — the
    agg_approx_distinct / agg_hll_mergeable scale family) plus FOOTER
    STATISTICS for null/min/max (r11): above the gate the base aggs were
    ~70% of the query (sf30 arm split: base-only 4.3 s vs hll-only
    2.0 s, single and split-agg both ~5 s — the HLL-kills-codegen
    hypothesis measured FALSE), and per-column null_count/min/max are
    already sitting EXACTLY in every row-group footer. The profile
    therefore reads them from metadata (driver-side pyarrow pass, no
    data touched) and scans ONLY for the ND sketches; any column whose
    chunks lack complete statistics (e.g. timestamp[ns] columns, whose
    deprecated stats pyarrow hides) falls back into the scan agg —
    loud, per column, never a silent wrong value. A pytest pins
    footer-vs-scan equality of all null/min/max cells. Doubles go
    through DECIMAL(18,2) before stringifying so both engines print
    the same text."""
    from ..sources.catalog import parquet_num_rows

    o = Catalog(spark, sf_dir).table("orders")
    cols = ["o_custkey", "o_orderdate", "o_orderkey",
            "o_orderpriority", "o_orderstatus", "o_totalprice"]

    def base_exprs(cs):
        out = []
        for c in cs:
            mn, mx = F.min(c), F.max(c)
            if c == "o_totalprice":
                mn = mn.cast("decimal(18,2)")
                mx = mx.cast("decimal(18,2)")
            out += [
                F.sum(F.col(c).isNull().cast("long")).alias(f"nn_{c}"),
                mn.cast("string").alias(f"mn_{c}"),
                mx.cast("string").alias(f"mx_{c}"),
            ]
        return out

    if force_hll or parquet_num_rows(sf_dir, "orders") > DATA_PROFILE_HLL_ROWS:
        stats = _footer_profile_stats(sf_dir, "orders", cols)
        scan_cols = [c for c in cols if c not in stats]
        lits = []
        for c, (nn, mn, mx) in stats.items():
            lits += [
                F.lit(nn).cast("long").alias(f"nn_{c}"),
                F.lit(mn).alias(f"mn_{c}"),
                F.lit(mx).alias(f"mx_{c}"),
            ]
        wide = o.agg(
            *base_exprs(scan_cols),
            *[F.approx_count_distinct(F.col(c)).alias(f"nd_{c}")
              for c in cols],
        ).select("*", *lits)
    else:
        wide = o.agg(*base_exprs(cols)).crossJoin(
            o.agg(*[F.count_distinct(F.col(c)).alias(f"nd_{c}")
                    for c in cols])
        )
    stack_args = ", ".join(
        f"'{c}', nn_{c}, nd_{c}, mn_{c}, mx_{c}" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack(6, {stack_args}) AS (col, n_nulls, n_distinct, min_s, max_s)"
        )
    ).orderBy("col")


@register(
    "orders_item_cf",
    oracle="""
    WITH ot AS (
      SELECT DISTINCT l_orderkey, p_type
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_orderkey IS NOT NULL AND p_type IS NOT NULL
    ), item_n AS (
      SELECT p_type, count(*) AS n FROM ot GROUP BY p_type
    ), pairs AS (
      SELECT a.p_type AS type_a, b.p_type AS type_b, count(*) AS n_ab
      FROM ot a JOIN ot b
        ON a.l_orderkey = b.l_orderkey AND a.p_type < b.p_type
      GROUP BY a.p_type, b.p_type
    ), scored AS (
      SELECT p.type_a, p.type_b, CAST(p.n_ab AS BIGINT) AS n_ab,
             round(p.n_ab / sqrt(na.n * nb.n), 6) AS cosine
      FROM pairs p
      JOIN item_n na ON na.p_type = p.type_a
      JOIN item_n nb ON nb.p_type = p.type_b
      WHERE p.n_ab >= 5
    ), ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY type_a ORDER BY cosine DESC, type_b) AS rk
      FROM scored
    )
    SELECT type_a, type_b, n_ab, cosine
    FROM ranked WHERE rk <= 3
    ORDER BY type_a, cosine DESC, type_b
    """,
)
def q_orders_item_cf(spark, sf_dir):
    """Item-item collaborative filtering (the classic Amazon-style
    recommender): cosine similarity over order co-occurrence,
    top-3 neighbors per item. Scale shape: dedup to (order, type) pairs
    first — per-order fan-out is bounded by C(|types|,2) regardless of
    order width — then the pair expansion rides the already-shuffled
    order key; the per-item totals are a tiny broadcast join back. The
    cosine n_ab/sqrt(n_a*n_b) is integers through sqrt and one divide —
    both IEEE-correctly-rounded, so it hash-matches cross-engine (round 6
    belt-and-braces). A support floor (n_ab >= 5) kills noise pairs
    before ranking, exactly as a production recommender would.

    All four consumers of the (order, type) dedup — both self-join sides
    and both item_n totals — share ONE evaluation of the lineitem⋈part
    base via ReuseExchange: every branch sits above the identical
    distinct exchange, and the item_n joins are deliberately plain
    (non-broadcast) so they stay inside the reused shuffle instead of
    forcing a separate broadcast-side re-execution. The r10 sf30
    stage-split (BASELINE.md) measured the alternatives: an eager
    170M-row localCheckpoint feeding the broadcast branches costs ~18 s
    of pure materialization, and broadcast-without-checkpoint
    re-executes join+distinct per broadcast branch — both lose. The
    joined sides are tiny anyway (pairs ≤ C(|p_type|,2) ≈ 11k rows,
    item_n ≤ |p_type| = 150 rows), so the plain joins cost nothing.

    INT-CODED SHUFFLE (r11): the dedup shuffle dominates end-to-end
    (sf30 stage-split: the distinct alone is ~80% of the query), and its
    payload was (8 B orderkey + ~25 B type string) per row. The type
    vocabulary is bounded (≤ |p_type| = 150), so types are dense-coded
    to ints through a broadcast dim BEFORE the dedup — the 131M-row
    shuffle carries 12 B rows instead of ~33 B — and decoded only on the
    ≤ C(150,2) pair rows after aggregation. The dense ids come from the
    distributed prefix-sum rank ORDERED BY p_type, so tid order ==
    string order and the a<b pair orientation is unchanged. The r10
    int-coded arm lost only because it paid a declared-layout checkpoint
    on top; this form keeps the reuse plan."""
    from pyspark.sql import Window

    from ..operators.windows import distributed_global_rank

    cat = Catalog(spark, sf_dir)
    li = cat.table("lineitem")
    p = cat.tbl("part")
    ranked, _ = distributed_global_rank(
        p.select("p_type").distinct(), ["p_type"], n_parts=4)
    tdim = ranked.select(
        "p_type", F.col("__rank").cast("int").alias("tid"))
    # part joins the tiny tid dim first, so the fact-side broadcast join
    # attaches the int code directly and the string never reaches the
    # wide shuffle
    pt = p.select("p_partkey", "p_type").join(F.broadcast(tdim), "p_type")
    ot = (
        li.join(F.broadcast(pt.select("p_partkey", "tid")),
                li["l_partkey"] == F.col("p_partkey"))
        .select("l_orderkey", "tid")
        # explicit not-null on BOTH columns (vacuous on TPC-H data): the
        # downstream joins infer asymmetric isnotnull sets per branch
        # (the self-join null-rejects both keys, the item_n join only
        # tid), and that asymmetry makes the distinct-exchange subtrees
        # non-identical, defeating ReuseExchange. With the filters
        # stated once here, every branch canonicalizes to the same
        # exchange and the base is scanned exactly once.
        .filter(F.col("l_orderkey").isNotNull() & F.col("tid").isNotNull())
        .distinct()
    )
    item_n = ot.groupBy("tid").agg(F.count(F.lit(1)).alias("n"))
    a = ot.select(F.col("l_orderkey").alias("k"), F.col("tid").alias("tid_a"))
    b = ot.select(F.col("l_orderkey").alias("k2"), F.col("tid").alias("tid_b"))
    pairs = (
        a.join(b, (F.col("k") == F.col("k2")) & (F.col("tid_a") < F.col("tid_b")))
        .groupBy("tid_a", "tid_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 5)
    )
    na = item_n.select(F.col("tid").alias("tid_a"), F.col("n").alias("n_a"))
    nb = item_n.select(F.col("tid").alias("tid_b"), F.col("n").alias("n_b"))
    da = F.broadcast(tdim.select(F.col("tid").alias("tid_a"),
                                 F.col("p_type").alias("type_a")))
    db = F.broadcast(tdim.select(F.col("tid").alias("tid_b"),
                                 F.col("p_type").alias("type_b")))
    scored = (
        pairs.join(na, "tid_a").join(nb, "tid_b")
        .join(da, "tid_a").join(db, "tid_b")
        .select(
            "type_a", "type_b", "n_ab",
            F.round(F.col("n_ab") / F.sqrt(F.col("n_a") * F.col("n_b")), 6)
            .alias("cosine"),
        )
    )
    rk = F.row_number().over(
        Window.partitionBy("type_a").orderBy(F.col("cosine").desc(), "type_b")
    )
    return (
        scored.withColumn("rk", rk).filter(F.col("rk") <= 3).drop("rk")
        .orderBy("type_a", F.col("cosine").desc(), "type_b")
    )


def als_recommendations(spark, sf_dir, rank=8, iters=5):
    """Implicit-feedback ALS (Hu/Koren/Volinsky) over order co-occurrence,
    via pyspark.ml's BLOCKED implementation — users and items are hashed
    into co-partitioned in/out blocks, each half-step joins factor blocks
    to rating blocks and solves the rank x rank normal equations inside
    the block, so no factor table is ever broadcast or collected (the
    scale property hand-rolled loops get wrong — cf. the PageRank
    broadcast lesson, BASELINE.md r7). Deterministic: fixed seed, fixed
    block counts, and a sorted dense item index (dense item ids keep the
    factor blocks dense; p_type strings are indexed alphabetically so the
    mapping is engine-independent)."""
    from pyspark.ml.recommendation import ALS

    from ..operators.windows import distributed_global_rank

    cat = Catalog(spark, sf_dir)
    li = cat.table("lineitem")
    p = cat.tbl("part")
    o = cat.table("orders")
    # dense item index via the distributed prefix-sum rank (house rule:
    # no single-partition window, even on the bounded type vocabulary)
    ranked, _ = distributed_global_rank(
        p.select("p_type").distinct(), ["p_type"], n_parts=4)
    types = ranked.select(
        "p_type", (F.col("__rank") - 1).cast("int").alias("item"))
    ratings = (
        li.join(F.broadcast(p.select("p_partkey", "p_type")),
                li["l_partkey"] == p["p_partkey"])
        .join(o.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("o_custkey").cast("int").alias("user"), "p_type")
        .join(F.broadcast(types), "p_type")
        .groupBy("user", "item")
        .agg(F.count(F.lit(1)).cast("float").alias("rating"))
    )
    als = ALS(
        rank=rank, maxIter=iters, regParam=0.1, implicitPrefs=True,
        alpha=1.0, seed=42, numUserBlocks=8, numItemBlocks=8,
        userCol="user", itemCol="item", ratingCol="rating",
        coldStartStrategy="drop",
    )
    model = als.fit(ratings)
    return model, types, ratings


# Factor-artifact replay oracle (r11, the _PAGERANK_REPLAY_ORACLE
# precedent): the engine persists the fitted factor tables — the 5
# requested users' rows and the full (item, p_type, f) table, both cast
# element-wise float32 -> double (exact) — and serves with the
# SEQUENTIAL fold dot (functions/vectors.dot); DuckDB replays
# list_reduce over the same prepended-0.0 chain, so the scores are
# bit-identical and the full (user, rk, p_type, score) surface
# hash-gates. The ALS solve itself stays pytest-pinned
# (planted-block-structure + fixed-seed determinism,
# tests/test_operators.py) — blocked normal-equation floats are not
# SQL-replicable. "user" is quoted throughout: it is a reserved word in
# DuckDB's (PostgreSQL-derived) grammar.
_ALS_REPLAY_ORACLE = f"""
    WITH uf AS (
      SELECT "user", f
      FROM read_parquet('{_ANN_ROOT}/als-current/user_f/*.parquet')
    ), itf AS (
      SELECT item, p_type, f
      FROM read_parquet('{_ANN_ROOT}/als-current/item_f/*.parquet')
    ), scored AS (
      SELECT uf."user", itf.item, itf.p_type,
             list_reduce(list_prepend(0.0,
               list_transform(generate_series(1, len(uf.f)),
                              i -> uf.f[i] * itf.f[i])),
               (a, x) -> a + x) AS score
      FROM uf, itf
    )
    SELECT "user", rk, p_type, score FROM (
      SELECT "user", item, p_type, score,
             row_number() OVER (PARTITION BY "user"
                                ORDER BY score DESC, item ASC) AS rk
      FROM scored) WHERE rk <= 3
    ORDER BY "user", rk
    """


@register("recsys_als", oracle=_ALS_REPLAY_ORACLE)
def q_recsys_als(spark, sf_dir):
    """Top-3 ALS recommendations for the 5 lowest-keyed active users —
    the serving shape of the recommender. The factor dot-products and
    per-user top-k run distributed (the bounded 150-item factor table
    broadcasts over the user partition — at any user-set size this is
    one map-side pass, no shuffle); nothing beyond the result rows
    reaches the driver.

    VALUE-GATED since r11: the fitted factors persist as parquet
    artifacts (the production shape — a feature-store entry the serving
    job broadcasts) and both the engine and the DuckDB oracle
    (_ALS_REPLAY_ORACLE above) score from the same bits with the same
    left-associated fold and the same (score DESC, item ASC) tie-break,
    replacing MLlib's recommendForUserSubset whose BLAS accumulation
    order is engine-private. The solve keeps its
    planted-block-structure and determinism pins in
    tests/test_operators.py."""
    import os

    from pyspark.sql import Window as W

    from ..ann import index as ann_index
    from ..functions import vectors as V

    model, types, ratings = als_recommendations(spark, sf_dir)
    users = ratings.select("user").distinct().orderBy("user").limit(5)
    d = ann_index.index_dir_for(
        "als", sf_dir, tables=("lineitem", "orders", "part"),
        root=_ANN_ROOT)
    uf = (
        model.userFactors
        .join(F.broadcast(users.withColumnRenamed("user", "id")), "id")
        .select(F.col("id").alias("user"),
                V.as_double(F.col("features")).alias("f"))
    )
    itf = (
        model.itemFactors
        .select(F.col("id").alias("item"),
                V.as_double(F.col("features")).alias("f"))
        .join(F.broadcast(types), "item")
        .select("item", "p_type", "f")
    )
    ann_index.write_artifact(uf.coalesce(1), os.path.join(d, "user_f"))
    ann_index.write_artifact(itf.coalesce(1), os.path.join(d, "item_f"))
    ann_index.point_current("als", d, root=_ANN_ROOT)
    uf_p = spark.read.parquet(os.path.join(d, "user_f"))
    itf_p = spark.read.parquet(os.path.join(d, "item_f"))
    scored = (
        uf_p.crossJoin(F.broadcast(itf_p))
        .select("user", "item", "p_type",
                V.dot(uf_p["f"], itf_p["f"]).alias("score"))
    )
    w = W.partitionBy("user").orderBy(F.col("score").desc(),
                                      F.col("item").asc())
    # the score doubles are bit-identical across engines (same persisted
    # bits, same fold), so they gate RAW — a display round(4) would
    # reintroduce the Spark-vs-DuckDB decimal-tie divergence this repo
    # documented on events.py's window family (HALF_UP on the shortest
    # decimal repr vs rounding the scaled double; r11 code-review)
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("user", "rk", "p_type", "score")
        .orderBy("user", "rk")
    )
