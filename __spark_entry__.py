"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship search query (reference GET /api/ads,
src/routes/ads.ts:84-171) at sf0.001. ``queries()``/``oracle_sql()`` expose
the full operator registry of ``etl_backend_spark`` (one key per SURVEY.md §2
operator ID); the driver diff-tests each against DuckDB at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_backend_spark.registry import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["ads_search"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
