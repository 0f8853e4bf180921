"""Constraint validation operators — the reference's database-enforced
invariants as ETL checks.

The reference's schema declares UNIQUE keys (Favorite (userId, adId),
prisma/schema.prisma:68; Conversation (user1Id, user2Id), :84), foreign
keys with CASCADE/RESTRICT (migration.sql:115-139), NOT NULL columns, and
an enum-as-string status domain (schema.prisma:44). Parquet enforces none
of these — at 100 TB they become VALIDATION OPERATORS run at ingest or as
audits, each a single aggregation/anti-join whose shuffle carries keys,
never payloads:

- uniqueness:   groupBy(key) HAVING count>1 — partial agg collapses each
                key map-side, so the shuffle is one row per distinct key.
- foreign key:  LEFT ANTI child→parent on the key — orphans only; the
                parent side is a key projection (broadcastable for dims).
- not-null / enum domain: conditional counts in ONE pass over the table.

Every checker returns violations as DATA (not exceptions): at scale you
route them to a quarantine sink and alert on counts; `summarize` collects
the audit into one tidy (rule, n_violations) frame for dashboards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unique_violations(df: DataFrame, cols: list[str]) -> DataFrame:
    """Keys appearing more than once: (cols..., n). NULL keys are grouped
    like values (SQL GROUP BY), so a duplicated NULL key also surfaces."""
    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


def fk_orphans(child: DataFrame, fk: str, parent: DataFrame,
               pk: str) -> DataFrame:
    """Child rows whose non-null FK has no parent (LEFT ANTI on the key).
    NULL FKs are not orphans — SQL FK semantics ignore NULLs."""
    return (
        child.filter(F.col(fk).isNotNull())
        .join(parent.select(pk).distinct(),
              F.col(fk) == F.col(pk), "left_anti")
    )


def null_violations(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row per required column: (rule, n_violations) — a single pass
    of conditional counts."""
    aggs = [
        F.sum(F.col(c).isNull().cast("long")).alias(c) for c in cols
    ]
    row = df.agg(*aggs)
    stacked = ", ".join(f"'not_null({c})', {c}" for c in cols)
    return row.selectExpr(
        f"stack({len(cols)}, {stacked}) AS (rule, n_violations)"
    )


def enum_violations(df: DataFrame, col: str, allowed: list[str]) -> DataFrame:
    """Rows whose value falls outside the declared domain (NULL excluded —
    pair with a not-null rule when the column is required)."""
    return df.filter(
        F.col(col).isNotNull() & ~F.col(col).isin(*allowed)
    )


def summarize(named_checks: list[tuple[str, DataFrame]]) -> DataFrame:
    """Fold violation frames into one (rule, n_violations) audit table.
    Each input contributes a 1-row count; the union is tiny regardless of
    table size."""
    parts = [
        d.agg(F.count(F.lit(1)).alias("n_violations"))
        .select(F.lit(name).alias("rule"), "n_violations")
        for name, d in named_checks
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
