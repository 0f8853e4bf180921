"""Slowly-changing-dimension (Type 2) merge: history-preserving upsert.

The reference's profile updates overwrite in place (src/routes/auth.ts:142-157
— a Type 1 update, `etl_update_dynamic`); a 100 TB warehouse usually needs
the Type 2 form instead: close out the old row (set valid_to) and append the
new version, keeping full history. Implemented as pure DataFrame algebra —
one join of current rows against the incoming batch, no per-row logic:

  changed   = current ⋉ incoming where any tracked attribute differs
  closed    = changed rows with valid_to := effective_ts, is_current := false
  new_rows  = incoming (for keys that are new or changed), valid_from := ts
  unchanged = everything else, carried as-is
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scd2_merge(current: DataFrame, incoming: DataFrame, key: str,
               attrs: list[str], effective_ts: Column) -> DataFrame:
    """Merge an incoming attribute snapshot into an SCD2 dimension.

    ``current`` columns: key, attrs..., valid_from, valid_to (null =
    current), is_current. ``incoming`` columns: key, attrs... . Rows whose
    tracked attributes are unchanged are carried through untouched (no
    spurious versions).
    """
    inc = incoming.select(
        F.col(key).alias("__ik"),
        *[F.col(a).alias(f"__i_{a}") for a in attrs],
    )
    cur = current.filter(F.col("is_current"))
    hist = current.filter(~F.col("is_current"))

    joined = cur.join(inc, cur[key] == inc["__ik"], "left")
    diff = F.lit(False)
    for a in attrs:
        diff = diff | ~F.col(a).eqNullSafe(F.col(f"__i_{a}"))
    matched_changed = F.col("__ik").isNotNull() & diff

    closed = (
        joined.filter(matched_changed)
        .select(
            key, *attrs, "valid_from",
            effective_ts.alias("valid_to"),
            F.lit(False).alias("is_current"),
        )
    )
    carried = (
        joined.filter(~matched_changed)
        .select(key, *attrs, "valid_from", "valid_to", "is_current")
    )
    fresh_keys = (
        joined.filter(matched_changed).select(F.col(key).alias("__fk"))
        .unionByName(
            inc.join(cur, inc["__ik"] == cur[key], "left_anti")
            .select(F.col("__ik").alias("__fk"))
        )
    )
    new_rows = (
        inc.join(fresh_keys, inc["__ik"] == F.col("__fk"), "left_semi")
        .select(
            F.col("__ik").alias(key),
            *[F.col(f"__i_{a}").alias(a) for a in attrs],
            effective_ts.alias("valid_from"),
            F.lit(None).cast("timestamp").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    return hist.unionByName(carried).unionByName(closed).unionByName(new_rows)
