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
