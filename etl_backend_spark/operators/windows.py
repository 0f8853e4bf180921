"""Window / top-k-per-group operators (SURVEY.md §2.5).

The reference's only window shape is "latest message per conversation"
(`orderBy createdAt desc, take:1` inside an include — src/routes/chat.ts:43-47).
Spark: row_number over a partitioned window; ALWAYS tie-break on a unique key
so the result is deterministic (oracle parity requirement).

Scale: a window partitioned by a grouping key is one shuffle on that key;
skewed keys (hot conversations) are handled by AQE. For pure top-1-per-group,
``max_by`` (no sort, partial-aggregable) beats a window at scale — both are
provided.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_per_group(df: DataFrame, group: str, order: list[Column],
                     n: int = 1) -> DataFrame:
    """Top-n per group by recency (reference src/routes/chat.ts:43-47,108-111)."""
    w = Window.partitionBy(group).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def rank_topk(df: DataFrame, group: str, order: list[Column], k: int,
              rank_col: str = "rnk") -> DataFrame:
    """rank() top-k per group — extension beyond the reference (absent there,
    SURVEY.md §2.5); ties share a rank."""
    w = Window.partitionBy(group).orderBy(*order)
    return df.withColumn(rank_col, F.rank().over(w)).filter(F.col(rank_col) <= k)


def lag_delta_us(df: DataFrame, group: str, ts_col: str, tie: str,
                 alias: str = "delta_us") -> DataFrame:
    """Per-key event-time delta via lag() — microsecond-exact (uses
    unix_micros, not second-truncated casts)."""
    w = Window.partitionBy(group).orderBy(F.col(ts_col).asc(), F.col(tie).asc())
    prev = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    return df.withColumn(alias, F.unix_micros(F.col(ts_col)) - prev)


def running_sum(df: DataFrame, group: str, ts_col: str, tie: str,
                value_col: str, alias: str = "running_sum") -> DataFrame:
    """Cumulative sum frame (rowsBetween unbounded preceding → current)."""
    w = (
        Window.partitionBy(group)
        .orderBy(F.col(ts_col).asc(), F.col(tie).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(alias, F.sum(F.col(value_col)).over(w))
