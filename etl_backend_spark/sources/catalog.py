"""Table catalog: explicit schemas + parquet loaders.

The reference declares its schema once and migrates it (prisma/schema.prisma
compiled to DDL; see SURVEY.md §1.3) — schema-on-write, never inference.
We mirror that: every table has a declared ``StructType`` and loads refuse to
infer. The driver's testdata tables (TPC-H-ish star schema + ``events`` +
``documents``/``embeddings``) stand in for the reference's marketplace tables
(reference prisma/schema.prisma:11-105).

Scale notes
-----------
- Loads are plain ``spark.read.schema(...).parquet`` — column pruning and
  predicate pushdown reach the parquet scan (verify via
  ``df.explain('formatted')`` → ``PushedFilters`` / ``ReadSchema``).
- ``DIM_TABLES`` marks broadcast-sized dimensions (the reference's Category
  table class, prisma/seed.ts:26-33): join helpers broadcast these.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

SCHEMAS: dict[str, StructType] = {
    "region": StructType(
        [
            StructField("r_regionkey", IntegerType()),
            StructField("r_name", StringType()),
        ]
    ),
    "nation": StructType(
        [
            StructField("n_nationkey", IntegerType()),
            StructField("n_name", StringType()),
            StructField("n_regionkey", IntegerType()),
        ]
    ),
    "customer": StructType(
        [
            StructField("c_custkey", LongType()),
            StructField("c_name", StringType()),
            StructField("c_nationkey", IntegerType()),
            StructField("c_acctbal", DoubleType()),
            StructField("c_mktsegment", StringType()),
        ]
    ),
    "supplier": StructType(
        [
            StructField("s_suppkey", LongType()),
            StructField("s_name", StringType()),
            StructField("s_nationkey", IntegerType()),
            StructField("s_acctbal", DoubleType()),
        ]
    ),
    "part": StructType(
        [
            StructField("p_partkey", LongType()),
            StructField("p_name", StringType()),
            StructField("p_brand", StringType()),
            StructField("p_type", StringType()),
            StructField("p_size", IntegerType()),
            StructField("p_retailprice", DoubleType()),
        ]
    ),
    "orders": StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_custkey", LongType()),
            StructField("o_orderstatus", StringType()),
            StructField("o_totalprice", DoubleType()),
            StructField("o_orderdate", TimestampType()),
            StructField("o_orderpriority", StringType()),
        ]
    ),
    "lineitem": StructType(
        [
            StructField("l_orderkey", LongType()),
            StructField("l_partkey", LongType()),
            StructField("l_suppkey", LongType()),
            StructField("l_linenumber", IntegerType()),
            StructField("l_quantity", DoubleType()),
            StructField("l_extendedprice", DoubleType()),
            StructField("l_discount", DoubleType()),
            StructField("l_tax", DoubleType()),
            StructField("l_returnflag", StringType()),
            StructField("l_linestatus", StringType()),
            StructField("l_shipdate", TimestampType()),
        ]
    ),
    # events.ts is stored as TIMESTAMP(NANOS) which Spark's reader rejects;
    # it is read as raw int64 nanos (legacy.parquet.nanosAsLong) and converted
    # to a microsecond timestamp in load_table via integer division — double
    # division would lose precision at ~1.7e18 ns. DuckDB truncates ns→µs the
    # same way, so both engines see identical values.
    "events": StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", LongType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    ),
    "documents": StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField("n_chars", LongType()),
        ]
    ),
    "embeddings": StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
            StructField("label", IntegerType()),
        ]
    ),
}

TABLES: list[str] = list(SCHEMAS)

# Broadcast-sized dimensions (the reference's Category class of table:
# 6 seeded rows, prisma/seed.ts:26-33). region/nation stay tiny at any SF.
DIM_TABLES = {"region", "nation"}


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Load one catalog table with its declared schema (never inferred)."""
    sf_dir = sf_dir or DEFAULT_SF_DIR
    if name not in SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        # must hold on whatever session the caller provides (the driver
        # builds its own), so set it here, not only in session.get_spark
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
    df = spark.read.schema(SCHEMAS[name]).parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # ns→µs truncation; computed column, so ts predicates don't push to
        # parquet — at scale, partition events by date instead and prune on
        # the partition column.
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


class Catalog:
    """Bound catalog: a SparkSession + a scale-factor directory.

    ``tbl('nation')`` returns the dimension with a broadcast hint applied so
    downstream equi-joins plan as broadcast hash joins without per-call-site
    hints.
    """

    def __init__(self, spark: SparkSession, sf_dir: str | None = None):
        self.spark = spark
        self.sf_dir = sf_dir or DEFAULT_SF_DIR

    def table(self, name: str) -> DataFrame:
        return load_table(self.spark, name, self.sf_dir)

    def tbl(self, name: str) -> DataFrame:
        df = self.table(name)
        if name in DIM_TABLES:
            df = F.broadcast(df)
        return df

    def register_views(self) -> None:
        """Register every table as a temp view for the raw-SQL passthrough
        surface (reference src/routes/setup.ts:12-15 `$executeRawUnsafe`)."""
        for name in TABLES:
            self.table(name).createOrReplaceTempView(name)


def load_events_time_range(spark: SparkSession, sf_dir: str | None,
                           lo: str | None = None,
                           hi: str | None = None) -> DataFrame:
    """Events scan with a time-range predicate that actually reaches parquet.

    ``load_table`` converts the raw int64 nanos to a timestamp, so a filter
    on the converted column is a post-scan residual (computed columns don't
    push down). Here the bounds are converted to nanos and applied to the
    RAW column first — the row-group min/max skipping then happens in the
    reader, which at 100 TB is the difference between scanning a day and
    scanning a decade."""
    import datetime as _dt

    sf_dir = sf_dir or DEFAULT_SF_DIR
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    df = spark.read.schema(SCHEMAS["events"]).parquet(f"{sf_dir}/events.parquet")

    def to_nanos(s: str) -> int:
        t = _dt.datetime.fromisoformat(s).replace(tzinfo=_dt.timezone.utc)
        return int(t.timestamp() * 1_000_000) * 1000

    if lo is not None:
        df = df.filter(F.col("ts") >= F.lit(to_nanos(lo)))
    if hi is not None:
        df = df.filter(F.col("ts") < F.lit(to_nanos(hi)))
    return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
