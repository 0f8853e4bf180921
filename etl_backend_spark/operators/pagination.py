"""Sort / limit / pagination operators (SURVEY.md §2.6).

Offset pagination is inherently driver-anchored; Spark executes
``orderBy + offset + limit`` as TakeOrderedAndProject (global top-(skip+n)
merged from per-partition top-(skip+n)) — fine for page-sized k, and the sort
NEVER materializes globally. Deep pagination at 100 TB should switch to
keyset pagination (``keyset_page``), which prunes with the sort-key predicate
instead of scanning skip+n rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Runtime-selected sort options — `sortBy` newest/price_low/price_high
# (reference src/routes/ads.ts:126-132). Tie-break key appended by callers.
SORT_OPTIONS: dict[str, list[tuple[str, str]]] = {
    "newest": [("o_orderdate", "desc")],
    "price_low": [("o_totalprice", "asc")],
    "price_high": [("o_totalprice", "desc")],
}


def sort_spec(option: str, tie_break: str, tie_dir: str = "desc") -> list[Column]:
    cols = SORT_OPTIONS[option] + [(tie_break, tie_dir)]
    return [F.col(c).desc() if d == "desc" else F.col(c).asc() for c, d in cols]


def paginate_offset(df: DataFrame, order: list[Column], page: int = 1,
                    limit: int = 20) -> DataFrame:
    """Offset/limit pagination — `skip=(page-1)*limit, take=limit`
    (reference src/routes/ads.ts:93-97,137-139). ``order`` MUST be a total
    order (include a unique tie-break) for deterministic pages."""
    skip = (page - 1) * limit
    out = df.orderBy(*order)
    if skip:
        out = out.offset(skip)
    return out.limit(limit)


def keyset_page(df: DataFrame, key_col: str, after, limit: int = 20,
                ascending: bool = True) -> DataFrame:
    """Keyset (cursor) pagination — the scale-path alternative the reference
    lacks: WHERE key > cursor ORDER BY key LIMIT n; the predicate prunes at
    the scan, so page cost is O(limit) regardless of depth."""
    c = F.col(key_col)
    pred = c > F.lit(after) if ascending else c < F.lit(after)
    order = c.asc() if ascending else c.desc()
    return df.filter(pred).orderBy(order).limit(limit)


def top_k(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """Global top-k (TakeOrderedAndProject — no global sort)."""
    return df.orderBy(*order).limit(k)
