"""Storage layout for scale: partitioned writes (partition pruning) and
bucketed tables (shuffle-free co-located joins).

The reference's b-tree indexes (prisma/schema.prisma:54-56,69,85-87,102-104)
have no direct Spark analog; their role is played by physical layout:

- **Partition columns** (`status`, event date): the planner prunes whole
  directories for equality/range predicates — the `Ad(status)` index becomes
  `status=active/` never reading `status=deleted/`.
- **Bucketing** on a join/group key: both sides pre-shuffled at write time
  into the same bucket scheme → the join plans with ZERO Exchange. At 100 TB
  this converts the recurring per-query shuffle of fact-fact joins
  (messages ⋈ conversations class) into a one-time write cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str],
                      mode: str = "errorifexists") -> None:
    """Hive-layout partitioned parquet (dir per partition value)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_bucketed(df: DataFrame, table_name: str, bucket_col: str,
                   n_buckets: int = 8, sort_col: str | None = None,
                   mode: str = "overwrite") -> None:
    """Bucketed (and optionally sorted) managed table. Requires a warehouse
    dir; both sides of a co-located join must use the same n_buckets."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table_name)


def cobucketed_join(spark: SparkSession, left_table: str, right_table: str,
                    on: str) -> DataFrame:
    """Join two same-scheme bucketed tables; planner elides both Exchanges
    (verify via explain: no ShuffleExchange above either scan)."""
    return spark.table(left_table).join(spark.table(right_table), on=on)
