"""Generic Prisma-style ``findMany`` compiler — the reference's ORM query
surface as a DataFrame planner.

Every route in the reference is ultimately a Prisma ``findMany``/``findFirst``
call with a ``where`` object tree, an ``orderBy`` list, and ``skip``/``take``
(e.g. src/routes/ads.ts:135-154, src/routes/admin.ts:24-40). The route-level
facade (engine.py) reproduces each call site; THIS module reproduces the
generic surface, so arbitrary new queries a reference user writes against
Prisma compile here without new engine code.

Supported where-tree grammar (the operator set the reference uses, plus the
obvious closures):

    {col: value}                       equality (None -> IS NULL)
    {col: {op: operand, ...}}          ops AND'd: equals, not, in, notIn,
                                       lt, lte, gt, gte, contains,
                                       startsWith, endsWith
                                       (+ mode: "insensitive" for the three
                                        string ops — src/routes/ads.ts:105-108)
    {"AND": [trees]} / {"OR": [trees]} / {"NOT": tree}

Compilation is a pure fold to ONE Column expression — Catalyst sees a single
predicate conjunction and pushes the scan-eligible parts down; nothing here
executes driver-side. SQL three-valued logic applies (a NULL column fails
every comparison except the explicit None equality), matching the relational
semantics the oracle checks.

Scale: sort+take compiles to TakeOrderedAndProject (never a global sort);
``skip`` composes offset-after-sort, the same contract as
operators/pagination (keyset pagination remains the deep-page scale path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class WhereError(ValueError):
    pass


_LOGICAL = ("AND", "OR", "NOT")


def _lit(v):
    return F.lit(v)


def _field_pred(col: str, spec) -> Column:
    """One field's predicate: scalar equality or an op dict (ops AND'd)."""
    c = F.col(col)
    if spec is None:
        return c.isNull()
    if not isinstance(spec, dict):
        return c == _lit(spec)
    ci = spec.get("mode") == "insensitive"

    def s(x):
        return F.lower(x) if ci else x

    preds = []
    for op, v in spec.items():
        if op == "mode":
            continue
        if op == "equals":
            preds.append(c.isNull() if v is None else c == _lit(v))
        elif op == "not":
            preds.append(c.isNotNull() if v is None else c != _lit(v))
        elif op == "in":
            preds.append(c.isin(*v))
        elif op == "notIn":
            preds.append(~c.isin(*v))
        elif op == "lt":
            preds.append(c < _lit(v))
        elif op == "lte":
            preds.append(c <= _lit(v))
        elif op == "gt":
            preds.append(c > _lit(v))
        elif op == "gte":
            preds.append(c >= _lit(v))
        elif op == "contains":
            preds.append(s(c).contains(s(_lit(v))))
        elif op == "startsWith":
            preds.append(s(c).startswith(s(_lit(v))))
        elif op == "endsWith":
            preds.append(s(c).endswith(s(_lit(v))))
        else:
            raise WhereError(f"unknown operator {op!r} on field {col!r}")
    if not preds:
        raise WhereError(f"empty operator object on field {col!r}")
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


def compile_where(tree: dict) -> Column:
    """Fold a where tree into one Column predicate (see module docstring)."""
    if not isinstance(tree, dict):
        raise WhereError(f"where must be a dict, got {type(tree).__name__}")
    preds = []
    for key, val in tree.items():
        if key == "AND":
            for sub in val:
                preds.append(compile_where(sub))
        elif key == "OR":
            if not val:
                raise WhereError("OR requires a non-empty list")
            branch = compile_where(val[0])
            for sub in val[1:]:
                branch = branch | compile_where(sub)
            preds.append(branch)
        elif key == "NOT":
            preds.append(~compile_where(val))
        else:
            preds.append(_field_pred(key, val))
    if not preds:
        return F.lit(True)
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


def find_many(df: DataFrame, where: dict | None = None,
              order_by: list[tuple[str, str]] | None = None,
              skip: int = 0, take: int | None = None) -> DataFrame:
    """The generic findMany plan: filter -> sort -> skip/take. ``order_by``
    is [(col, 'asc'|'desc'), ...]; callers wanting deterministic pages must
    end it with a unique tie-break column (the same contract Prisma leaves
    implicit and the reference relies on its PK index for)."""
    return find_many_full(df, where=where, order_by=order_by,
                          skip=skip, take=take)


def find_many_full(df: DataFrame, where: dict | None = None,
                   select: list[str] | None = None,
                   include: list[tuple[DataFrame, str, str, list[str]]]
                   | None = None,
                   include_list: list[tuple[DataFrame, str, str, "Column", str]]
                   | None = None,
                   count_relations: list[tuple[DataFrame, str, str, str]]
                   | None = None,
                   order_by: list[tuple[str, str]] | None = None,
                   skip: int = 0, take: int | None = None) -> DataFrame:
    """The full Prisma findMany call shape: where + select + include +
    _count + orderBy + skip/take (e.g. reference src/routes/ads.ts:135-154
    uses all six at once).

    ``include``: [(dim_df, fk, pk, cols)] — n:1 relation hydration as a
    broadcast-eligible equi-join projecting ``cols`` (Prisma's nested
    object, flattened — columnar engines don't nest structs for free and
    every consumer immediately destructures anyway).
    ``include_list``: [(child_df, local_key, child_fk, item_expr,
    alias)] — Prisma's 1:n include (nested child arrays): the child
    pre-aggregates ``sort_array(collect_list(item_expr))`` on its FK and
    joins back ONE row per parent — the shuffle carries one assembled
    array per key, and the sorted order makes the array deterministic
    under any partitioning. Parents with no children get an empty array
    (Prisma returns [], not null).
    ``count_relations``: [(child_df, local_key, child_fk, alias)] —
    Prisma's ``_count``: the child pre-aggregates on its FK and joins
    back one row per key, so the shuffle carries counts, not child rows.

    Order of application mirrors Prisma/SQL semantics: WHERE filters the
    base rows first; includes/counts hydrate; sort+page run LAST over the
    hydrated frame (an orderBy on an included column is legal).

    Page-before-hydrate (r6): when every orderBy column lives on the BASE
    frame and ``take`` is set, the parent set is cut to the page
    (top skip+take via TakeOrderedAndProject — distributed top-k, no
    global sort) BEFORE includes/counts run, so child arrays are
    assembled for the page only, not for every matching parent (the r6
    fifth-decade sweep measured the difference at 4.8x/decade vs flat).
    Hydration is row-count-preserving (n:1 include on a unique pk, 1:n
    and _count pre-aggregate to one row per key), so the page cut
    commutes with it; the final sort/skip/take still run last, over the
    hydrated page. An orderBy that references an included column keeps
    the unpushed path."""
    out = df
    if where:
        out = out.filter(compile_where(where))
    if (
        take is not None and order_by
        and all(c in out.columns for c, _ in order_by)
    ):
        out = out.orderBy(*[
            F.col(c).desc() if d.lower() == "desc" else F.col(c).asc()
            for c, d in order_by
        ]).limit(skip + take)
    for dim, fk, pk, cols in include or []:
        dim_proj = dim.select(pk, *cols)
        out = out.join(dim_proj, out[fk] == dim_proj[pk], "left").drop(pk)
    for child, local_key, child_fk, item, alias in include_list or []:
        # Two scale rules Catalyst cannot apply for us here:
        # 1. SEMI-PRUNE the child to surviving parents BEFORE the grouped
        #    collect — the parent WHERE sits on non-key columns behind a
        #    left join, so no optimizer rule transfers it to the child,
        #    and without it the plan assembles arrays for EVERY parent in
        #    the table to keep 20 (r6 fifth-decade sweep: 7.1x/decade at
        #    sf10, superlinear purely from collecting the unfiltered
        #    child). With a selective WHERE the key set broadcasts and
        #    the child scan drops to the matching fraction.
        # 2. repartition-first: partial_collect_list cannot combine (the
        #    buffer carries every element), so the default plan serializes
        #    per-element buffers through the shuffle for nothing; shipping
        #    raw rows and collecting once post-shuffle measured 2.1x
        #    faster. Column-only repartition keeps AQE sizing partitions.
        keys = out.select(F.col(local_key).alias(child_fk))
        pruned = child.join(keys, on=child_fk, how="left_semi")
        arrs = pruned.repartition(F.col(child_fk)).groupBy(child_fk).agg(
            F.sort_array(F.collect_list(item)).alias(alias)
        )
        # empty-array fallback typed from the child aggregate itself, so a
        # non-string item_expr (numeric child column, struct, ...) keeps
        # the coalesce type-consistent instead of failing analysis
        empty = F.array().cast(arrs.schema[alias].dataType)
        out = (
            out.join(arrs, out[local_key] == arrs[child_fk], "left")
            .drop(child_fk)
            .withColumn(alias, F.coalesce(alias, empty))
        )
    for child, local_key, child_fk, alias in count_relations or []:
        counts = child.groupBy(child_fk).agg(
            F.count(F.lit(1)).alias(alias)
        )
        out = (
            out.join(counts, out[local_key] == counts[child_fk], "left")
            .drop(child_fk)
            .withColumn(alias, F.coalesce(alias, F.lit(0)))
        )
    if select:
        out = out.select(*select)
    if order_by:
        out = out.orderBy(*[
            F.col(c).desc() if d.lower() == "desc" else F.col(c).asc()
            for c, d in order_by
        ])
    if skip:
        out = out.offset(skip)
    if take is not None:
        out = out.limit(take)
    return out
