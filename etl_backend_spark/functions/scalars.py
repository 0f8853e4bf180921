"""Scalar column functions (SURVEY.md §2.7).

Everything here is a built-in-expression combinator (JVM-side, codegen'd) —
zero Python UDFs on the oracle-checked path. The only UDF-shaped surface in
the reference is bcrypt/jwt (src/routes/auth.ts:30,51-55); see ``auth.py``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cast_double(c: Column | str) -> Column:
    """string→float64 — `parseFloat(price)` (reference src/routes/ads.ts:57)."""
    return F.col(c).cast("double") if isinstance(c, str) else c.cast("double")


def cast_int(c: Column | str) -> Column:
    """string→int — `parseInt(page)` (reference src/routes/ads.ts:97)."""
    return F.col(c).cast("int") if isinstance(c, str) else c.cast("int")


def lower_contains(c: Column, needle: str) -> Column:
    """ci-substring (reference src/routes/ads.ts:106-107)."""
    return F.contains(F.lower(c), F.lit(needle.lower()))


def canonical_pair(a: Column, b: Column) -> tuple[Column, Column]:
    """Canonical unordered-pair ordering — `[a,b].sort()` before conversation
    lookup (reference src/routes/chat.ts:18)."""
    return F.least(a, b), F.greatest(a, b)


def pages(total: Column, limit: int) -> Column:
    """`Math.ceil(total/limit)` (reference src/routes/ads.ts:164)."""
    return F.ceil(total / F.lit(float(limit)))


def build_upload_paths(names: Column) -> Column:
    """`files.map(f => '/uploads/ads/' + f.filename)` over an array column
    (reference src/routes/ads.ts:51)."""
    return F.transform(names, lambda n: F.concat(F.lit("/uploads/ads/"), n))


def ext_allowed(path: Column) -> Column:
    """Upload extension allow-list `/jpeg|jpg|png|webp/`
    (reference src/routes/ads.ts:30-32)."""
    return F.lower(path).rlike(r"\.(jpeg|jpg|png|webp)$")


def unique_filename(prefix: Column, rand: Column, ext: Column) -> Column:
    """`${Date.now()}-${rand}${ext}` (reference src/routes/ads.ts:21) — caller
    supplies the deterministic components."""
    return F.concat(F.concat_ws("-", prefix, rand), ext)


def exists_flag(c: Column) -> Column:
    """null→bool — `{ isFavorite: !!favorite }`
    (reference src/routes/favorites.ts:118)."""
    return c.isNotNull()
