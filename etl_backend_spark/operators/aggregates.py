"""Aggregation operators (SURVEY.md §2.4).

Spark computes all of these with partial (map-side) aggregation before the
shuffle — the per-group state is tiny, so at 100 TB the shuffle carries only
one row per (partition, group), not the fact rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def count_filtered(df: DataFrame, pred: Column, alias: str = "cnt") -> DataFrame:
    """COUNT(*) under predicate — pagination total / dashboard count
    (reference src/routes/ads.ts:155, src/routes/admin.ts:138)."""
    return df.filter(pred).agg(F.count(F.lit(1)).alias(alias))


def relation_count(parent: DataFrame, child: DataFrame, parent_key: str,
                   child_key: str, alias: str = "n_children") -> DataFrame:
    """Per-row related-entity count — `_count:{select:{favorites:true}}`
    (reference src/routes/ads.ts:150-153).

    groupBy the child FK (partial agg → tiny shuffle), then left-join back and
    coalesce missing groups to 0. Never a per-row subquery.
    """
    counts = child.groupBy(F.col(child_key).alias("__ck")).agg(
        F.count(F.lit(1)).alias("__n")
    )
    return (
        parent.join(counts, parent[parent_key] == counts["__ck"], "left")
        .withColumn(alias, F.coalesce(F.col("__n"), F.lit(0)))
        .drop("__ck", "__n")
    )


def multi_count(df: DataFrame, conds: dict[str, Column | None]) -> DataFrame:
    """Dashboard multi-aggregate — N counts in one pass instead of the
    reference's N parallel plans (reference src/routes/admin.ts:135-147).

    conds: {alias: predicate-or-None}; None counts all rows.
    """
    aggs = []
    for alias, cond in conds.items():
        if cond is None:
            aggs.append(F.count(F.lit(1)).alias(alias))
        else:
            aggs.append(F.sum(F.when(cond, 1).otherwise(0)).alias(alias))
    return df.agg(*aggs)


def page_math(total_df: DataFrame, limit: int, total_col: str = "cnt") -> DataFrame:
    """`totalPages = ceil(total/limit)` (reference src/routes/ads.ts:164)."""
    return total_df.select(
        F.col(total_col).alias("total"),
        F.ceil(F.col(total_col) / F.lit(float(limit))).alias("total_pages"),
    )
