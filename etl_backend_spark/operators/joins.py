"""Join operators (SURVEY.md §2.3).

Every reference join is an FK equi-join (Prisma ``include``); Spark strategy:

- n:1 dimension lookups → **broadcast hash join** (dims are Category-class
  small, reference prisma/seed.ts:26-33). At 100 TB the fact side streams,
  nothing shuffles.
- fact-fact joins (messages-scale) → sort-merge with AQE skew splitting; at
  scale, bucket both sides on the join key to eliminate the shuffle entirely.
- nested 1:N includes → ``collect_list(struct(...))`` after a groupBy, not a
  driver-side loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lookup_n1(fact: DataFrame, dim: DataFrame, fact_key: str, dim_key: str,
              how: str = "left", broadcast_dim: bool = True) -> DataFrame:
    """Many-to-one FK lookup join — `include:{user:{select...}}`
    (reference src/routes/ads.ts:140-149)."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return fact.join(d, fact[fact_key] == d[dim_key], how)


def semi(df: DataFrame, keys: DataFrame, on) -> DataFrame:
    """Existence check — "is ad favorited?" boolean probe
    (reference src/routes/favorites.ts:105-122)."""
    return df.join(keys, on, "left_semi")


def anti(df: DataFrame, existing: DataFrame, on) -> DataFrame:
    """Non-existence guard — create-if-absent
    (reference src/routes/favorites.ts:23-41)."""
    return df.join(existing, on, "left_anti")


def self_roles(fact: DataFrame, dim: DataFrame, role_keys: dict[str, str],
               dim_key: str, select_per_role: dict[str, list[str]]) -> DataFrame:
    """Join the same dimension under multiple roles — Conversation includes
    `user1` and `user2`, both -> User (reference src/routes/chat.ts:93-107).

    role_keys: {role_prefix: fact_fk_col}; select_per_role: dim cols to carry,
    re-aliased ``{prefix}_{col}``.
    """
    out = fact
    for prefix, fk in role_keys.items():
        d = dim.select(
            F.col(dim_key).alias(f"__{prefix}_key"),
            *[F.col(c).alias(f"{prefix}_{c}") for c in select_per_role[prefix]],
        )
        out = out.join(F.broadcast(d), out[fk] == d[f"__{prefix}_key"], "left").drop(
            f"__{prefix}_key"
        )
    return out


def nested_1n(parent: DataFrame, child: DataFrame, parent_key: str,
              child_key: str, collect_col, sort: bool = True,
              out_col: str = "children") -> DataFrame:
    """One-to-many nested collect — `include:{messages:[...]}` as a
    struct/array column (reference src/routes/chat.ts:108-111).

    ``collect_col`` is a Column built from child columns (e.g. a struct).
    Aggregated child lists are sorted for determinism.
    """
    agg = F.collect_list(collect_col)
    if sort:
        agg = F.sort_array(agg)
    nested = child.groupBy(F.col(child_key).alias("__pk")).agg(agg.alias(out_col))
    return parent.join(nested, parent[parent_key] == nested["__pk"], "left").drop("__pk")


def asof_join(left: DataFrame, right: DataFrame, key: str, ts: str,
              right_val: str, out_col: str = "asof_val") -> DataFrame:
    """As-of join: for each left row, the latest right row of the same key
    with right.ts <= left.ts (ties: right wins, then max right id).

    Implemented as union + running `last(ignorenulls)` window — ONE shuffle
    on the key, no inequality join, no per-row scan of the right side; the
    standard scalable formulation (an inequality-join plan would be
    quadratic per key). Right rows sort before left rows at equal ts so the
    <= semantics hold.
    """
    from pyspark.sql import Window

    l2 = left.select(
        F.col(key).alias("__k"), F.col(ts).alias("__ts"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__row"),
        F.lit(None).cast(right.schema[right_val].dataType).alias("__rv"),
        F.lit(1).alias("__side"),
    )
    r2 = right.select(
        F.col(key).alias("__k"), F.col(ts).alias("__ts"),
        F.lit(None).cast(l2.schema["__row"].dataType).alias("__row"),
        F.col(right_val).alias("__rv"),
        F.lit(0).alias("__side"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__rv").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l2.unionByName(r2).withColumn(
        out_col, F.last("__rv", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("__side") == 1).select("__row.*", out_col)
    return out


def range_join_count(left: DataFrame, right: DataFrame, key: str, ts: str,
                     lookback: str = "1 hour",
                     out_col: str = "n_in_range") -> DataFrame:
    """Count right rows per left row with right.ts in [left.ts - lookback,
    left.ts) for the same key.

    Scalable formulation: bucket both sides by the lookback width; each left
    row probes its own and the previous bucket (equi-join on (key, bucket)),
    then the exact range filter applies. Converts the inequality join into a
    2x fan-out equi-join — the shuffle is on (key, bucket), never all-pairs
    per key. (DuckDB's IEJoin does this natively; Spark needs the bucket
    trick.)
    """
    import re as _re

    m = _re.match(r"(\d+)\s*(hour|minute|second)s?", lookback)
    unit_us = {"hour": 3600, "minute": 60, "second": 1}[m.group(2)] * 1_000_000
    width_us = int(m.group(1)) * unit_us

    bucket = (F.unix_micros(F.col(ts)) / width_us).cast("long")
    r2 = right.select(
        F.col(key).alias("__rk"), F.col(ts).alias("__rts"),
        bucket.alias("__rb"),
    )
    # unique per-row id BEFORE the 2x probe explode so the regroup restores
    # exactly one output row per input row, even for fully-duplicate rows
    l2 = (
        left.withColumn("__lid", F.monotonically_increasing_id())
        .withColumn("__b", bucket)
        .withColumn(
            "__probe", F.explode(F.array(F.col("__b"), F.col("__b") - 1))
        )
    )
    joined = l2.join(
        r2,
        (l2[key] == r2["__rk"]) & (l2["__probe"] == r2["__rb"])
        & (r2["__rts"] >= F.col(ts) - F.expr(f"INTERVAL {lookback}"))
        & (r2["__rts"] < F.col(ts)),
        "left",
    )
    return (
        joined.groupBy(F.col("__lid"), *[F.col(c) for c in left.columns])
        .agg(F.count("__rts").alias(out_col))
        .drop("__lid")
    )
