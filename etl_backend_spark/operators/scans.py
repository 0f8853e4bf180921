"""Scan / lookup operators (SURVEY.md §2.1).

Point lookups rely on parquet min/max row-group skipping + partition pruning
instead of the reference's b-tree indexes (prisma/schema.prisma:54-56) — at
100 TB, partition the fact tables on the hot filter column (status, date) so
these become O(pruned-files) not O(table).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scan_filtered(df: DataFrame, pred: Column, cols: list[str] | None = None) -> DataFrame:
    """Filtered scan + projection — `findMany({where, select})`
    (reference src/routes/ads.ts:135-154). Filter first so pushdown reaches
    the parquet reader; project so ReadSchema prunes columns."""
    out = df.filter(pred)
    return out.select(*cols) if cols else out


def lookup_pk(df: DataFrame, key_col: str, key) -> DataFrame:
    """Point lookup by PK — `findUnique({where:{id}})`
    (reference src/routes/ads.ts:178-195)."""
    return df.filter(F.col(key_col) == F.lit(key)).limit(1)


def lookup_unique_composite(df: DataFrame, keys: dict) -> DataFrame:
    """Point lookup by composite unique key — favorite by (userId, adId)
    (reference src/routes/favorites.ts:109-117, src/routes/chat.ts:21-27)."""
    pred = None
    for k, v in keys.items():
        c = F.col(k) == F.lit(v)
        pred = c if pred is None else pred & c
    return df.filter(pred)
