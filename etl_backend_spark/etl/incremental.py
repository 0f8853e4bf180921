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
