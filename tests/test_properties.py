"""Property-based tests (hypothesis): the reference's API contract must hold
for ARBITRARY parameter combinations, not just the fixtures — pagination
algebra, dynamic-predicate consistency, upsert idempotence."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_backend_spark.operators import pagination
from etl_backend_spark.plans.query_builder import SearchParams, ads_search, ads_search_total
from etl_backend_spark.sources.catalog import Catalog
from tests.conftest import SF_DIR

SETTINGS = settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

params_st = st.builds(
    SearchParams,
    status=st.sampled_from(["O", "F", "P"]),
    min_price=st.one_of(st.none(), st.floats(0, 200_000, allow_nan=False)),
    max_price=st.one_of(st.none(), st.floats(200_000, 600_000, allow_nan=False)),
    sort_by=st.sampled_from(["newest", "price_low", "price_high"]),
    page=st.integers(1, 5),
    limit=st.integers(1, 40),
)


@given(p=params_st)
@SETTINGS
def test_search_rows_satisfy_predicates_and_page_size(spark_session, p):
    cat = Catalog(spark_session, SF_DIR)
    rows = ads_search(cat, p).collect()
    total = ads_search_total(cat, p).collect()[0].total
    # page size: full page unless past the end
    expected_n = max(min(p.limit, total - (p.page - 1) * p.limit), 0)
    assert len(rows) == expected_n
    for r in rows:
        assert r.o_orderstatus == p.status
        if p.min_price is not None:
            assert r.o_totalprice >= p.min_price
        if p.max_price is not None:
            assert r.o_totalprice <= p.max_price
    # sort contract
    if p.sort_by == "price_low":
        prices = [r.o_totalprice for r in rows]
        assert prices == sorted(prices)
    elif p.sort_by == "price_high":
        prices = [r.o_totalprice for r in rows]
        assert prices == sorted(prices, reverse=True)


@given(page_a=st.integers(1, 4), page_b=st.integers(1, 4),
       limit=st.integers(5, 50))
@SETTINGS
def test_distinct_pages_disjoint(spark_session, page_a, page_b, limit):
    if page_a == page_b:
        return
    cat = Catalog(spark_session, SF_DIR)
    o = cat.table("orders").select("o_orderkey")
    order = [F.col("o_orderkey").asc()]
    a = {r.o_orderkey for r in pagination.paginate_offset(o, order, page_a, limit).collect()}
    b = {r.o_orderkey for r in pagination.paginate_offset(o, order, page_b, limit).collect()}
    assert not (a & b)


@given(keys=st.lists(st.integers(0, 30), max_size=8, unique=True))
@SETTINGS
def test_upsert_insert_if_absent_idempotent(spark_session, keys):
    """Anti-join+union upsert: |result| == |existing| + |new keys|; applying
    the same batch twice changes nothing (reference seed upsert semantics,
    prisma/seed.ts:11-21)."""
    existing = spark_session.range(0, 20).select(F.col("id").alias("k"))
    incoming = spark_session.createDataFrame(
        [(k,) for k in keys] or [(None,)], "k long"
    ).filter(F.col("k").isNotNull())

    def upsert(cur, inc):
        fresh = inc.join(cur, on="k", how="left_anti")
        return cur.unionByName(fresh)

    once = upsert(existing, incoming)
    n_new = len([k for k in keys if k >= 20])
    assert once.count() == 20 + n_new
    assert upsert(once, incoming).count() == once.count()


@given(
    upd=st.lists(st.integers(0, 40), min_size=1, max_size=10, unique=True),
    new=st.lists(st.integers(100_000, 100_040), max_size=5, unique=True),
)
@SETTINGS
def test_manifest_upsert_merge_algebra(spark_session, tmp_path_factory, upd, new):
    """MERGE algebra for arbitrary update/insert key sets: post-state =
    (base \\ matched) ∪ incoming, and re-running the same upsert is
    idempotent."""
    from pyspark.sql import functions as F

    from etl_backend_spark.etl.manifest import ManifestTable

    spark = spark_session
    base = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    )
    t = ManifestTable(
        spark, str(tmp_path_factory.mktemp("m")), "t", ["k"]
    )
    t.create(base.repartition(3))
    incoming_keys = sorted(set(upd) | set(new))
    incoming = spark.createDataFrame(
        [(k, -1.0) for k in incoming_keys], "k LONG, v DOUBLE"
    )
    t.upsert(incoming, "k")
    got = {(r.k, r.v) for r in t.read().collect()}
    expect = {(k, float(k)) for k in range(50) if k not in incoming_keys} | {
        (k, -1.0) for k in incoming_keys
    }
    assert got == expect
    t.upsert(incoming, "k")  # idempotent
    assert {(r.k, r.v) for r in t.read().collect()} == expect


@given(
    n_keys=st.integers(2, 20),
    hot_pick=st.lists(st.integers(0, 19), max_size=5, unique=True),
    n_salts=st.integers(2, 6),
)
@SETTINGS
def test_salted_join_equals_plain_for_arbitrary_hot_sets(
    spark_session, n_keys, hot_pick, n_salts
):
    """salted_join's contract: for ANY hot-key set (including keys absent
    from either side) and any salt count, the result multiset equals the
    plain inner join."""
    from etl_backend_spark.operators.joins import salted_join

    spark = spark_session
    fact = spark.range(0, 200).select(
        (F.col("id") % n_keys).alias("fk"), F.col("id").alias("rid")
    )
    build = spark.range(0, n_keys + 3).select(
        F.col("id").alias("bk"), (F.col("id") * 10).alias("payload")
    )
    hot = spark.createDataFrame(
        [(k,) for k in hot_pick] or [(None,)], "h long"
    ).filter(F.col("h").isNotNull())
    salted = salted_join(fact, build, "fk", "bk", hot, n_salts=n_salts)
    plain = fact.join(build, fact["fk"] == build["bk"])
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


@given(
    st.lists(st.binary(min_size=0, max_size=300), min_size=0, max_size=8),
    st.integers(min_value=8, max_value=64),
    st.integers(min_value=8, max_value=64),
    st.integers(min_value=1, max_value=2_000_000),
)
@settings(max_examples=40, deadline=None)
def test_avi_container_roundtrip_lossless(frames, w, h, usec):
    """The RIFF/AVI container is a lossless byte envelope: ANY frame byte
    strings (including empty and odd-length, which exercise the RIFF even-
    padding rule) must come back exactly, with the avih metadata intact."""
    from etl_backend_spark.multimodal import avi

    blob = avi.build_mjpeg_avi(frames, w, h, usec)
    meta = avi.parse_avi(blob)
    assert meta["frames"] == frames
    assert (meta["width"], meta["height"]) == (w, h)
    assert meta["usec_per_frame"] == usec
    assert meta["n_frames"] == len(frames)


_FM_COLS = ("a", "b")


def _py_eval(tree, row) -> bool:
    """Python reference semantics for the find_many where grammar over
    non-null int columns (SQL three-valued logic never bites here)."""
    def field(col, spec):
        v = row[col]
        if not isinstance(spec, dict):
            return v == spec
        ok = True
        for op, x in spec.items():
            if op == "lt":
                ok &= v < x
            elif op == "lte":
                ok &= v <= x
            elif op == "gt":
                ok &= v > x
            elif op == "gte":
                ok &= v >= x
            elif op == "in":
                ok &= v in x
            elif op == "notIn":
                ok &= v not in x
            elif op == "not":
                ok &= v != x
            elif op == "equals":
                ok &= v == x
        return ok

    out = True
    for k, val in tree.items():
        if k == "AND":
            out &= all(_py_eval(s, row) for s in val)
        elif k == "OR":
            out &= any(_py_eval(s, row) for s in val)
        elif k == "NOT":
            out &= not _py_eval(val, row)
        else:
            out &= field(k, val)
    return out


def _tree_strategy():
    leaf = st.one_of(
        st.builds(lambda c, v: {c: v},
                  st.sampled_from(_FM_COLS), st.integers(0, 9)),
        st.builds(
            lambda c, op, v: {c: {op: v}},
            st.sampled_from(_FM_COLS),
            st.sampled_from(["lt", "lte", "gt", "gte", "not", "equals"]),
            st.integers(0, 9),
        ),
        st.builds(
            lambda c, vs: {c: {"in": vs}},
            st.sampled_from(_FM_COLS),
            st.lists(st.integers(0, 9), min_size=1, max_size=3),
        ),
    )
    return st.recursive(
        leaf,
        lambda sub: st.one_of(
            st.builds(lambda xs: {"AND": xs}, st.lists(sub, min_size=1, max_size=2)),
            st.builds(lambda xs: {"OR": xs}, st.lists(sub, min_size=1, max_size=2)),
            st.builds(lambda x: {"NOT": x}, sub),
        ),
        max_leaves=4,
    )


@given(_tree_strategy())
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_find_many_where_tree_matches_python_reference(spark_session, tree):
    """ANY where tree from the grammar must filter exactly like the
    Python reference evaluation — the compiler has no tree shapes of its
    own invention."""
    from etl_backend_spark.plans.find_many import compile_where

    spark = spark_session
    rows = [{"a": a, "b": (a * 3 + 1) % 10} for a in range(10)] * 2
    df = spark.createDataFrame(rows)
    got = sorted((r.a, r.b) for r in df.filter(compile_where(tree)).collect())
    want = sorted((r["a"], r["b"]) for r in rows if _py_eval(tree, r))
    assert got == want, tree


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 24), h=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
    sg=st.booleans(),
    cache=st.sampled_from([0, 1, 4, 8]),
    pred=st.sampled_from([None, 2, 3]),
    meta=st.sampled_from([None, 2, 3]),
)
def test_webp_roundtrip_property(w, h, seed, sg, cache, pred, meta):
    """Any image, any flag combination: encode->decode is the identity.
    (The codec pair is self-validating — this is the fuzz half of that
    contract; pixel-exact over random dims, seeds, and feature flags.)"""
    import numpy as np

    from etl_backend_spark.multimodal import webp

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
    data = webp.encode_webp_lossless(
        px, use_subtract_green=sg, cache_bits=cache,
        predictor_bits=pred, meta_bits=meta,
    )
    assert np.array_equal(webp.decode_webp(data), px)


# ---- r8 bucket-local LSH kernels: bit-exactness + pair-set contracts ----
#
# The kernels are plain pandas->pandas functions, so hypothesis drives
# them WITHOUT a Spark session against a brute-force Python reference
# whose float arithmetic is the exact sequential IEEE chain the JVM
# aggregate fold and the DuckDB oracle compute (plain Python float ops
# ARE that chain).

def _seq_cos(a, b):
    import math

    dot = na = nb = 0.0
    for x, y in zip(a, b):
        x, y = float(x), float(y)
        dot = dot + x * y
        na = na + x * x
        nb = nb + y * y
    # math.sqrt = IEEE sqrt, same as np.sqrt/JVM/DuckDB; x**0.5 is libm
    # pow and 1 ulp off for some doubles (r8 code-review finding)
    return dot / (math.sqrt(na) * math.sqrt(nb))


bucket_rows_st = st.lists(
    st.tuples(
        st.integers(0, 5),                   # bucket key
        st.booleans(),                       # is_probe (probe kernel only)
        st.lists(st.floats(-4, 4, allow_nan=False, width=32),
                 min_size=6, max_size=6),    # embedding, fixed dim 6
    ),
    min_size=2, max_size=40,
)


@given(bucket_rows_st, st.one_of(st.none(), st.floats(-1, 1)))
@settings(max_examples=25, deadline=None)
def test_bucket_allpairs_kernel_matches_python_reference(rows, tau):
    import numpy as np
    import pandas as pd

    from etl_backend_spark.functions import vectors as V

    pdf = pd.DataFrame({
        "vec_id": range(len(rows)),
        "band": [0] * len(rows),
        "key": [r[0] for r in rows],
        "embedding": [np.asarray(r[2], dtype=np.float32) for r in rows],
    })
    # degenerate all-zero vectors divide 0/0 -> NaN on every engine;
    # the contract only covers non-zero vectors
    pdf = pdf[[bool(np.any(np.asarray(e) != 0)) for e in pdf["embedding"]]]
    if len(pdf) < 2:
        return
    out = V.bucket_allpairs_cosine_pandas(tau=tau)(pdf)
    got = {(r.vec_a, r.vec_b): r.cos for r in out.itertuples()}
    emb = dict(zip(pdf["vec_id"], pdf["embedding"]))
    key = dict(zip(pdf["vec_id"], pdf["key"]))
    expected = {}
    ids = sorted(emb)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if key[a] != key[b]:
                continue
            c = _seq_cos(emb[a], emb[b])
            if tau is None or c >= tau:
                expected[(a, b)] = c
    assert set(got) == set(expected)
    for k, v in expected.items():
        assert got[k] == v, (k, got[k], v)  # bit-exact, not approx


@given(bucket_rows_st, st.one_of(st.none(), st.floats(-1, 1)))
@settings(max_examples=25, deadline=None)
def test_bucket_probe_kernel_matches_python_reference(rows, tau):
    import numpy as np
    import pandas as pd

    from etl_backend_spark.functions import vectors as V

    pdf = pd.DataFrame({
        "vec_id": range(len(rows)),
        "band": [0] * len(rows),
        "key": [r[0] for r in rows],
        "is_probe": [r[1] for r in rows],
        "embedding": [np.asarray(r[2], dtype=np.float32) for r in rows],
    })
    pdf = pdf[[bool(np.any(np.asarray(e) != 0)) for e in pdf["embedding"]]]
    if len(pdf) < 2:
        return
    out = V.bucket_probe_pairs_cosine_pandas(tau=tau)(pdf)
    got = {(r.vec_a, r.vec_b): r.cos for r in out.itertuples()}
    # reference: normalized pairs within a bucket where >=1 side is base;
    # repeats across orientations must agree bit-exactly (commutative
    # per-term products, same j order), mirroring the real pipeline's
    # dropDuplicates-after contract
    emb, key, isp = (dict(zip(pdf["vec_id"], pdf[c]))
                     for c in ("embedding", "key", "is_probe"))
    expected = {}
    ids = sorted(emb)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if key[a] != key[b] or (isp[a] and isp[b]):
                continue
            c = _seq_cos(emb[a], emb[b])
            if tau is None or c >= tau:
                expected[(a, b)] = c
    assert set(got) == set(expected)
    for k, v in expected.items():
        assert got[k] == v, (k, got[k], v)
