"""Incremental view maintenance: keep aggregate tables current by merging
per-batch delta aggregates instead of recomputing over the full history.

The reference maintains ``Conversation.updatedAt`` incrementally (one UPDATE
per message, reference src/websocket.ts:65-68); the generalization is any
algebraic aggregate view (count/sum/min/max, and avg as sum/count):

    new_state(key) = combine(old_state(key), aggregate(delta rows))

At 100 TB this is THE difference between a per-batch job proportional to the
batch (this) and one proportional to all history (full recompute). Only
algebraic aggregates qualify; holistic ones (exact distinct, median) need
their own state (sketches or full re-agg).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# partial-state column spec per supported aggregate:
#   partial: delta rows -> state row per key
#   combine: (old_state, delta_state) -> new state value
_COMBINE = {
    "count": F.sum,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def aggregate_state(rows: DataFrame, keys: list[str],
                    aggs: list[tuple[str, str, str]]) -> DataFrame:
    """Aggregate rows into view state. aggs: [(col, fn, alias)],
    fn ∈ count/sum/min/max."""
    exprs = []
    for col, fn, alias in aggs:
        if fn == "count":
            exprs.append(F.count(F.col(col)).alias(alias))
        else:
            exprs.append(getattr(F, fn)(F.col(col)).alias(alias))
    return rows.groupBy(*keys).agg(*exprs)


def merge_delta(state: DataFrame, delta_rows: DataFrame, keys: list[str],
                aggs: list[tuple[str, str, str]]) -> DataFrame:
    """New view state from old state + a batch of appended rows. One shuffle
    of (|changed keys| + |delta|) rows — never touches unchanged history."""
    delta_state = aggregate_state(delta_rows, keys, aggs)
    old = state.select(
        *keys, *[F.col(a).alias(f"__old_{a}") for _, _, a in aggs]
    )
    new = delta_state.select(
        *keys, *[F.col(a).alias(f"__new_{a}") for _, _, a in aggs]
    )
    joined = old.join(new, on=keys, how="full_outer")
    out_cols = list(keys)
    for _, fn, alias in aggs:
        o, n = F.col(f"__old_{alias}"), F.col(f"__new_{alias}")
        # pairwise combine of two partial states; a missing side is identity
        if fn in ("count", "sum"):
            combined = F.coalesce(o, F.lit(0)) + F.coalesce(n, F.lit(0))
        elif fn == "min":
            combined = F.when(o.isNull(), n).when(n.isNull(), o).otherwise(F.least(o, n))
        else:  # max
            combined = F.when(o.isNull(), n).when(n.isNull(), o).otherwise(F.greatest(o, n))
        out_cols.append(combined.alias(alias))
    return joined.select(*out_cols)


def cascade_merge(daily_state: DataFrame | None,
                  monthly_state: DataFrame | None,
                  delta_rows: DataFrame,
                  user_col: str = "user_id", ts_col: str = "ts",
                  val_col: str = "value") -> tuple[DataFrame, DataFrame]:
    """Incremental refresh of the hour→day→month continuous-aggregate
    cascade (the batch one-shot is registry events_rollup_cascade) from an
    APPEND batch. Returns (new_daily_state, new_monthly_state).

    The algebraic measures (count, sum) need no tier-to-tier propagation:
    each tier merges the SAME delta aggregated at its own granularity.
    The cascade dependency is ``active_days`` — a DISTINCT-day count,
    non-algebraic from raw rows: it increments exactly when the daily
    tier gains a key it did not have, so the monthly merge consumes the
    daily tier's KEY-NOVELTY (an anti-join of delta day-keys against the
    old daily state), never a recount of history. Per-batch cost is
    O(delta + changed keys) at every tier."""
    day = F.date_trunc("day", F.col(ts_col))
    month = F.date_trunc("month", F.col("d"))
    daily_keys = [user_col, "d"]
    daily_aggs = [(val_col, "count", "n"), (val_col, "sum", "sv")]

    delta_named = delta_rows.withColumn("d", day)
    daily_delta = aggregate_state(delta_named, daily_keys, daily_aggs)

    if daily_state is None:
        new_daily = daily_delta
        new_day_keys = daily_delta.select(*daily_keys)
    else:
        new_daily = merge_delta(daily_state, delta_named, daily_keys,
                                daily_aggs)
        new_day_keys = daily_delta.select(*daily_keys).join(
            daily_state.select(*daily_keys), on=daily_keys, how="left_anti"
        )

    month_delta = (
        daily_delta.withColumn("m", month)
        .groupBy(user_col, "m")
        .agg(F.sum("n").alias("n"), F.sum("sv").alias("sv"))
        .join(
            new_day_keys.withColumn("m", month)
            .groupBy(user_col, "m")
            .agg(F.count(F.lit(1)).alias("active_days")),
            on=[user_col, "m"], how="left",
        )
        .na.fill({"active_days": 0})
    )
    if monthly_state is None:
        new_monthly = month_delta
    else:
        old = monthly_state.select(
            user_col, "m", F.col("n").alias("__on"),
            F.col("sv").alias("__osv"),
            F.col("active_days").alias("__od"),
        )
        new_monthly = old.join(month_delta, on=[user_col, "m"],
                               how="full_outer").select(
            user_col, "m",
            (F.coalesce("__on", F.lit(0)) + F.coalesce("n", F.lit(0)))
            .alias("n"),
            (F.coalesce("__osv", F.lit(0.0)) + F.coalesce("sv", F.lit(0.0)))
            .alias("sv"),
            (F.coalesce("__od", F.lit(0))
             + F.coalesce("active_days", F.lit(0))).alias("active_days"),
        )
    return new_daily, new_monthly
