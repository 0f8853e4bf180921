"""Oracle-checkable query registry backing ``__spark_entry__.py``.

Every implemented operator from SURVEY.md §2 registers here:
``QUERIES[name]`` is a ``(spark, sf_dir) -> DataFrame`` builder, and
``ORACLES[name]`` (when SQL-expressible) is the equivalent ANSI SQL that the
driver runs in DuckDB over the same parquet views. Column names/aliases match
exactly on both sides; double-valued aggregates are rounded identically on
both sides so order-of-accumulation noise can't flip the value hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: register a query builder and (optionally) its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


from . import reads  # noqa: E402,F401
from . import aggs  # noqa: E402,F401
from . import events  # noqa: E402,F401
from . import etl  # noqa: E402,F401
from . import llm  # noqa: E402,F401
from . import media  # noqa: E402,F401
from . import pipeline  # noqa: E402,F401
from . import aliases  # noqa: E402,F401
