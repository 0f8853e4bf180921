"""Tests for the LLM-data-pipeline surface: dedup invariants, text metrics,
vector math — properties the DuckDB hash-compare can't express."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from etl_backend_spark.functions import text as T
from etl_backend_spark.functions import vectors as V


def test_dedup_exact_keeps_one_per_hash(spark, cat):
    d = cat.table("documents")
    groups = d.groupBy(F.sha2(F.col("text"), 256).alias("h")).agg(
        F.min("doc_id").alias("keep"), F.count(F.lit(1)).alias("n")
    )
    n_docs = d.count()
    n_groups = groups.count()
    dup_rows = groups.select(F.sum(F.col("n") - 1).alias("s")).collect()[0].s
    assert n_groups + dup_rows == n_docs


def test_word_shingles_known_value(spark):
    df = spark.createDataFrame([("a b c d",)], ["text"])
    got = df.select(T.word_shingles(F.col("text"), 3).alias("s")).collect()[0].s
    assert sorted(got) == ["a b c", "b c d"]


def test_shingles_short_doc_single_window(spark):
    df = spark.createDataFrame([("one two",)], ["text"])
    got = df.select(T.word_shingles(F.col("text"), 3).alias("s")).collect()[0].s
    assert got == ["one two"]


def test_jaccard_identical_docs_is_one(spark):
    sh = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "x"), (2, "y")], ["doc_id", "shingle"]
    )
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id"), F.col("b.doc_id"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert inter[0].n == 2  # |∩| = 2, sizes 2 → jaccard = 2/(2+2-2) = 1


def test_lang_id_markers(spark):
    rows = [
        ("the cat and the dog of war", "en"),
        ("le chat et la mer", "fr"),
        ("el perro y los gatos", "es"),
        ("der hund und die katze", "de"),
        ("zzzz qqqq", "und"),
    ]
    df = spark.createDataFrame(rows, ["text", "expect"])
    got = df.select("expect", T.lang_id(F.col("text")).alias("pred")).collect()
    for r in got:
        assert r.pred == r.expect, r


def test_quality_score_bounds(cat):
    d = cat.table("documents")
    bad = d.select(T.quality_score(F.col("text")).alias("q")).filter(
        (F.col("q") < 0) | (F.col("q") > 1)
    )
    assert bad.count() == 0


def test_token_count_bpe_ish(spark):
    df = spark.createDataFrame([("Hello, world 42!",)], ["text"])
    n = df.select(T.bpe_ish_token_count(F.col("text")).alias("n")).collect()[0].n
    # Hello , world 42 !  -> 5
    assert n == 5


def test_cosine_self_is_one_and_symmetry(spark):
    df = spark.createDataFrame([([1.0, 2.0, 3.0], [3.0, 2.0, 1.0])], ["a", "b"])
    row = df.select(
        V.cosine(F.col("a"), F.col("a")).alias("self"),
        V.cosine(F.col("a"), F.col("b")).alias("ab"),
        V.cosine(F.col("b"), F.col("a")).alias("ba"),
        V.dot(F.col("a"), F.col("b")).alias("dot"),
        V.norm(F.col("a")).alias("na"),
    ).collect()[0]
    assert math.isclose(row.self, 1.0, rel_tol=1e-12)
    assert math.isclose(row.ab, row.ba, rel_tol=1e-12)
    assert math.isclose(row.dot, 10.0, rel_tol=1e-12)
    assert math.isclose(row.na, math.sqrt(14.0), rel_tol=1e-12)


def test_cosine_zero_norm_clamps_to_minus_one_like_duckdb(spark):
    """r12 ADVICE: a zero-norm operand must score cosine -1.0, mirroring
    DuckDB's list_cosine_similarity clamp, so degenerate vectors rank
    BELOW real negative-cosine candidates in BOTH engines (the old 0.0
    guard ranked them above — a latent top-k gate divergence on corpora
    with fewer than k positive-cosine candidates). Pinned against a live
    DuckDB evaluation of the same operand triples."""
    import duckdb

    triples = [
        ([0.0, 0.0], [1.0, 2.0]),    # zero left
        ([1.0, 2.0], [0.0, 0.0]),    # zero right
        ([0.0, 0.0], [0.0, 0.0]),    # both zero
        ([1.0, 0.0], [-1.0, 0.1]),   # real negative-cosine candidate
        ([1.0, 2.0], [2.0, 1.0]),    # real positive-cosine candidate
        # denormal boundary (r13, ADVICE): the -1.0 branch keys on the
        # norm PRODUCT underflowing to 0.0 because DuckDB's clamp does
        # too — tiny-but-nonzero vectors split both ways across it
        ([1e-170, 0.0], [1e-170, 0.0]),   # norms² underflow -> -1.0
        ([1e-200, 1e-200], [1e-200, 2e-200]),  # same -> -1.0
        ([2e-162, 0.0], [2e-162, 0.0]),   # 4e-324 denormal product -> 1.0
        ([1e-155, 0.0], [1e-155, 0.0]),   # denormal product -> 1.0
    ]
    df = spark.createDataFrame(triples, ["a", "b"])
    got = [r.c for r in
           df.select(V.cosine(F.col("a"), F.col("b")).alias("c")).collect()]
    want = [duckdb.sql(
        f"select list_cosine_similarity({a}::DOUBLE[], {b}::DOUBLE[])"
    ).fetchone()[0] for a, b in triples]
    for g, w, t in zip(got, want, triples):
        assert math.isclose(g, w, rel_tol=1e-12), (t, g, w)
    # ranking consequence: the zero vector is now BELOW the real
    # negative-cosine candidate
    assert got[0] < got[3] < got[4]


def test_write_artifact_restores_prior_artifact_on_persistent_failure(
        spark, tmp_path, monkeypatch):
    """r12 ADVICE: if every swap attempt fails for a persistent
    (non-race) reason, write_artifact must leave the PREVIOUS good
    artifact in place (the old finally-rmtree destroyed it, leaving the
    -current symlink pointing at a dir missing the artifact for any
    later oracle replay)."""
    import os

    from etl_backend_spark.ann import index as ann_index

    dirpath = str(tmp_path / "art" / "sig")
    os.makedirs(os.path.dirname(dirpath), exist_ok=True)
    ann_index.write_artifact(
        spark.createDataFrame([(1, "old")], ["id", "v"]), dirpath,
        attribute=False)
    before = sorted(os.listdir(dirpath))
    assert before  # parquet parts present

    real_rename = os.rename

    def failing_rename(src, dst):
        if src.startswith(dirpath + ".stage"):
            raise OSError("persistent: simulated EACCES on rename-in")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", failing_rename)
    import pytest as _pytest
    with _pytest.raises(OSError):
        ann_index.write_artifact(
            spark.createDataFrame([(2, "new")], ["id", "v"]), dirpath,
            attribute=False)
    monkeypatch.undo()

    # prior artifact restored, bit-for-bit same part listing, old row
    assert os.path.isdir(dirpath)
    assert sorted(os.listdir(dirpath)) == before
    assert [tuple(r) for r in
            spark.read.parquet(dirpath).collect()] == [(1, "old")]
    # no stray trash/stage dirs leak next to the artifact
    leftovers = [p for p in os.listdir(os.path.dirname(dirpath))
                 if p != os.path.basename(dirpath)]
    assert leftovers == [], leftovers


def test_l2_normalize_unit_norm(cat):
    e = cat.table("embeddings").limit(20)
    norms = e.select(
        V.norm(V.l2_normalize(V.as_double(F.col("embedding")))).alias("n")
    ).collect()
    for r in norms:
        assert math.isclose(r.n, 1.0, rel_tol=1e-9)


def test_sim_topk_brute_recall_is_exact(spark, cat):
    """Brute-force top-k must equal a python-side exact computation."""
    import numpy as np

    e = cat.table("embeddings")
    pdf = e.toPandas()
    vecs = {int(r.vec_id): np.array(r.embedding, dtype=np.float64) for _, r in pdf.iterrows()}
    qid = 0
    qv = vecs[qid]
    sims = {
        vid: float(np.dot(qv, v) / (np.linalg.norm(qv) * np.linalg.norm(v)))
        for vid, v in vecs.items()
        if vid != qid
    }
    expect = sorted(sims, key=lambda k: (-round(sims[k], 6), k))[:5]

    from etl_backend_spark.registry import QUERIES

    got = (
        QUERIES["sim_topk_brute"](spark, "/root/testdata/sf0.001")
        .filter(F.col("q_id") == qid)
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(5)
        .collect()
    )
    assert [r.vec_id for r in got] == expect


def test_minhash_lsh_recall_vs_exact(spark):
    """Every exact-Jaccard ≥0.5 pair should be recovered by the MinHash-LSH
    path with est ≥ 0.35 band-candidate generation (the est≥0.5 output filter
    may legitimately drop borderline pairs, so compare candidate recall at
    the banding stage via the registered query's pairs with relaxed filter)."""
    from etl_backend_spark.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    exact = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["dedup_ngram_jaccard"](spark, sf).collect()
        if r.jaccard >= 0.7  # well above the LSH s-curve threshold
    }
    sketched = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["dedup_minhash_lsh"](spark, sf).collect()
    }
    missed = exact - sketched
    assert not missed, f"high-similarity pairs missed by LSH: {missed}"


def test_knn_graph_lsh_recall_and_scoring_vs_exact(spark):
    """Full-corpus kNN-graph recall vs an exact numpy graph at sf0.001,
    plus edge-score exactness. Random-gaussian neighbors are weak (top
    cos ~ 0.3-0.4, sign-plane agreement barely above chance), so banded
    sign-LSH recall here is the same honest ~0.14 the dedup_embedding
    pytest measures at tau=0.3 — assert the >= 0.1 floor, and that every
    edge the approximate graph DOES emit carries the exact cosine and a
    rank consistent with (rounded score desc, nbr_id asc)."""
    import numpy as np

    from etl_backend_spark.registry import QUERIES
    from etl_backend_spark.sources.catalog import Catalog

    sf = "/root/testdata/sf0.001"
    pdf = (Catalog(spark, sf).table("embeddings")
           .select("vec_id", "embedding").toPandas())
    ids = pdf["vec_id"].to_numpy()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    np.fill_diagonal(sims, -2.0)
    idx = {int(v): i for i, v in enumerate(ids)}
    true_edges = set()
    for i in range(len(ids)):
        top = sorted(range(len(ids)),
                     key=lambda j: (-round(sims[i, j], 6), ids[j]))[:5]
        true_edges.update((int(ids[i]), int(ids[j])) for j in top)

    rows = QUERIES["knn_graph_lsh"](spark, sf).collect()
    got = {(r.vec_id, r.nbr_id) for r in rows}
    recall = len(got & true_edges) / len(true_edges)
    assert recall >= 0.1, recall
    # scores are the exact cosine; ranks ordered by (rounded cos, nbr)
    by_src: dict = {}
    for r in rows:
        exact = round(float(sims[idx[r.vec_id], idx[r.nbr_id]]), 6)
        assert abs(r.cos_sim - exact) < 1e-9, (r, exact)
        by_src.setdefault(r.vec_id, []).append(r)
    for edges in by_src.values():
        edges.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in edges] == list(range(1, len(edges) + 1))
        keys = [(-r.cos_sim, r.nbr_id) for r in edges]
        assert keys == sorted(keys)


def test_bucket_knn_kernel_bit_exact_and_superset(spark):
    """The r8 bucket-local kNN kernel (V.bucket_knn_candidates_pandas):

    1. every emitted cosine is BIT-IDENTICAL (==, not approx) to the
       sequential left-assoc IEEE fold the JVM ``aggregate`` expression
       and the DuckDB oracle compute — a plain Python float loop is that
       exact same chain, so it is the reference here;
    2. per (bucket, vector), the emitted candidate set is a SUPERSET of
       the rounded-order top-5 (the 2e-6 eps margin's guarantee — the
       downstream agg then ranks and slices exactly);
    3. no self-pairs, no pairs across buckets.
    """
    import numpy as np
    import pandas as pd

    from etl_backend_spark.functions import vectors as VV

    rng = np.random.RandomState(7)
    rows = []
    # buckets of varied sizes incl. degenerate (1), small (<k), one
    # above the OVERSIZE=64 batch cap (block path), and two pairs
    # sharing a power-of-two size class at different m (30+32, 40+33)
    # so the class-batched 3D path pads within a class
    sizes = [1, 3, 32, 30, 40, 33, 7, 70, 6]
    vid = 0
    for b, m in enumerate(sizes):
        for _ in range(m):
            rows.append({
                "vec_id": vid,
                "embedding": rng.randn(16).astype(np.float32),
                "band": 0,
                "key": b,
            })
            vid += 1
    pdf = pd.DataFrame(rows)
    out = VV.bucket_knn_candidates_pandas(k=5)(pdf)

    def seq_cos(a, b):  # the JVM/DuckDB fold, as plain Python floats
        dot = 0.0
        na = 0.0
        nb = 0.0
        for x, y in zip(a.tolist(), b.tolist()):
            dot = dot + float(x) * float(y)
            na = na + float(x) * float(x)
            nb = nb + float(y) * float(y)
        return dot / (math.sqrt(na) * math.sqrt(nb))

    emb = {r["vec_id"]: r["embedding"] for r in rows}
    bucket = {r["vec_id"]: r["key"] for r in rows}
    emitted = set()
    for r in out.itertuples():
        assert r.vec_id != r.nbr_id
        assert bucket[r.vec_id] == bucket[r.nbr_id]
        assert r.cos == seq_cos(emb[r.vec_id], emb[r.nbr_id]), r
        emitted.add((r.vec_id, r.nbr_id))
    # superset of the rounded-order top-5 inside each bucket
    by_bucket: dict = {}
    for r in rows:
        by_bucket.setdefault(r["key"], []).append(r["vec_id"])
    for members in by_bucket.values():
        if len(members) < 2:
            continue
        for a in members:
            ranked = sorted(
                (m for m in members if m != a),
                key=lambda m: (-round(seq_cos(emb[a], emb[m]), 6), m),
            )[:5]
            for m in ranked:
                assert (a, m) in emitted, (a, m)


def test_bucket_kernels_zero_norm_degrade(spark):
    """Zero-norm embeddings (r9 ADVICE fix): a zero vector's 0/0 NaN
    cosines must not corrupt OTHER vectors' top-k thresholds — before
    the fix, >=k zero-norm bucket-mates made np.partition's k-th-best
    threshold NaN and the real vector silently emitted nothing. The
    contract: zero-norm rows emit no candidates, pairs touching them
    are dropped, and every real vector still gets its full top-k
    superset. Covered on BOTH kNN paths (class-batched 3D <=64 and the
    oversize block path) and on the allpairs/probe kernels with and
    without a tau filter."""
    import numpy as np
    import pandas as pd

    from etl_backend_spark.functions import vectors as VV

    rng = np.random.RandomState(11)

    def mk(sizes, n_zero, with_probe=False):
        rows = []
        vid = 0
        for b, m in enumerate(sizes):
            for i in range(m):
                emb = (np.zeros(16, dtype=np.float32) if i < n_zero
                       else rng.randn(16).astype(np.float32))
                row = {"vec_id": vid, "embedding": emb, "band": 0,
                       "key": b}
                if with_probe:
                    row["is_probe"] = bool(vid % 3 == 0)
                rows.append(row)
                vid += 1
        return rows, pd.DataFrame(rows)

    def seq_cos(a, b):
        dot = na = nb = 0.0
        for x, y in zip(a.tolist(), b.tolist()):
            dot = dot + float(x) * float(y)
            na = na + float(x) * float(x)
            nb = nb + float(y) * float(y)
        return dot / (math.sqrt(na) * math.sqrt(nb))

    # kNN: 8 zero-norm mates (> k=5) in a size-20 bucket (3D path) and
    # in a size-80 bucket (block path); bucket 2 is all-zero
    rows, pdf = mk(sizes=[20, 80, 4], n_zero=8)
    out = VV.bucket_knn_candidates_pandas(k=5)(pdf)
    emb = {r["vec_id"]: r["embedding"] for r in rows}
    bucket = {r["vec_id"]: r["key"] for r in rows}
    zero = {r["vec_id"] for r in rows if not np.any(r["embedding"])}
    emitted = set()
    for r in out.itertuples():
        assert r.vec_id not in zero and r.nbr_id not in zero, r
        assert np.isfinite(r.cos), r
        emitted.add((r.vec_id, r.nbr_id))
    by_bucket: dict = {}
    for r in rows:
        if r["vec_id"] not in zero:
            by_bucket.setdefault(r["key"], []).append(r["vec_id"])
    for members in by_bucket.values():
        if len(members) < 2:
            continue
        for a in members:
            ranked = sorted(
                (m for m in members if m != a),
                key=lambda m: (-round(seq_cos(emb[a], emb[m]), 6), m),
            )[:5]
            for m in ranked:
                assert (a, m) in emitted, (a, m)

    # allpairs + probe kernels: zero-norm pairs drop, real pairs keep
    # their bit-exact cosines, tau=None and tau set behave identically
    # w.r.t. zero-norm rows
    rows, pdf = mk(sizes=[12], n_zero=6)
    emb = {r["vec_id"]: r["embedding"] for r in rows}
    zero = {r["vec_id"] for r in rows if not np.any(r["embedding"])}
    for tau in (None, -0.5):
        out = VV.bucket_allpairs_cosine_pandas(tau=tau)(pdf)
        for r in out.itertuples():
            assert r.vec_a not in zero and r.vec_b not in zero
            assert r.cos == seq_cos(emb[r.vec_a], emb[r.vec_b])
            if tau is not None:
                assert r.cos >= tau
        n_real = len([r for r in rows if r["vec_id"] not in zero])
        if tau is None:
            assert len(out) == n_real * (n_real - 1) // 2
    rows, pdf = mk(sizes=[12], n_zero=6, with_probe=True)
    emb = {r["vec_id"]: r["embedding"] for r in rows}
    zero = {r["vec_id"] for r in rows if not np.any(r["embedding"])}
    out = VV.bucket_probe_pairs_cosine_pandas(tau=None)(pdf)
    for r in out.itertuples():
        assert r.vec_a not in zero and r.vec_b not in zero
        assert r.cos == seq_cos(emb[r.vec_a], emb[r.vec_b])


def test_bucket_motif_pairs_kernel_matches_python_reference(spark):
    """bucket_motif_pairs_pandas (r9, events_motif_pairs' bucket-local
    pairing): per SAX-word bucket of 2..cap windows, every
    non-overlapping a<b pair's zdist2 is the bit-exact left-assoc fold
    over dims; oversized words emit nothing (the rare cap); same-user
    pairs within wlen positions drop; the per-call output is exactly
    the top-k under (zdist2, user_a, event_a, user_b, event_b)."""
    import numpy as np
    import pandas as pd

    from etl_backend_spark.functions import vectors as VV

    rng = np.random.RandomState(3)
    rows = []
    vid = 0
    # word sizes: degenerate (1), small, at-cap boundary (4 with cap=4
    # below stays, 5 drops), plus same-user overlap cases
    for word, size in [("aa", 1), ("bb", 3), ("cc", 4), ("dd", 5)]:
        for i in range(size):
            rows.append({
                "w": word,
                "user_id": vid % 2,           # mixes same/cross user
                "event_id": vid,
                "wpos": i * 3,                # some same-user overlaps
                "z": rng.randn(8),
            })
            vid += 1
    pdf = pd.DataFrame(rows)
    out = VV.bucket_motif_pairs_pandas(cap=4, wlen=8, topk=5)(pdf)

    def fold(a, b):
        s = 0.0
        for x, y in zip(a.tolist(), b.tolist()):
            d = float(x) - float(y)
            s = s + d * d
        return s

    byw: dict = {}
    for r in rows:
        byw.setdefault(r["w"], []).append(r)
    expected = []
    for word, members in byw.items():
        if len(members) < 2 or len(members) > 4:
            continue
        ms = sorted(members, key=lambda r: (r["user_id"], r["event_id"]))
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                a, b = ms[i], ms[j]
                if (a["user_id"] == b["user_id"]
                        and abs(a["wpos"] - b["wpos"]) < 8):
                    continue
                expected.append((fold(a["z"], b["z"]), a["user_id"],
                                 a["event_id"], b["user_id"], b["event_id"]))
    expected.sort(key=lambda t: (t[0], t[1], t[2], t[3], t[4]))
    expected = expected[:5]
    got = [(r.zdist2, r.user_a, r.event_a, r.user_b, r.event_b)
           for r in out.itertuples()]
    assert got == expected, (got, expected)  # bit-exact, order included


def test_bucket_discord_nn_kernel_matches_python_reference(spark):
    """bucket_discord_nn_pandas (r14, events_discord_topk's one-pass
    plan): per SAX-word bucket of 1..cap windows, every window's
    nn_dist is the min bit-exact fold distance over same-word
    NON-overlapping peers; a peerless window (unique word, or all
    peers same-user-overlapping) emits NaN (-> NULL in Spark, ranking
    first under DESC NULLS FIRST); oversized words emit nothing (the
    rare cap); per-call output is exactly the top-k under
    (nn_dist desc nulls-as-inf, user_id, event_id)."""
    import numpy as np
    import pandas as pd

    from etl_backend_spark.functions import vectors as VV

    rng = np.random.RandomState(7)
    rows = []
    vid = 0
    # aa: unique word (NULL nn). bb: 2 same-user overlapping windows
    # (both NULL: peer excluded). cc: 3 cross-user windows (real nn).
    # dd: over-cap word (drops entirely).
    for word, size, same_user, step in [
        ("aa", 1, False, 9), ("bb", 2, True, 3),
        ("cc", 3, False, 9), ("dd", 5, False, 9),
    ]:
        for i in range(size):
            rows.append({
                "w": word,
                "user_id": 1 if same_user else vid,
                "event_id": vid,
                "wpos": i * step,
                "z": rng.randn(8),
            })
            vid += 1
    pdf = pd.DataFrame(rows)
    out = VV.bucket_discord_nn_pandas(cap=4, wlen=8, topk=10)(pdf)

    def fold(a, b):
        s = 0.0
        for x, y in zip(a.tolist(), b.tolist()):
            d = float(x) - float(y)
            s = s + d * d
        return s

    byw: dict = {}
    for r in rows:
        byw.setdefault(r["w"], []).append(r)
    expected = []
    for word, members in byw.items():
        if len(members) > 4:
            continue
        for a in members:
            dists = [
                fold(a["z"], b["z"]) for b in members
                if b is not a and not (a["user_id"] == b["user_id"]
                                       and abs(a["wpos"] - b["wpos"]) < 8)
            ]
            expected.append((min(dists) if dists else float("inf"),
                             a["user_id"], a["event_id"]))
    expected.sort(key=lambda t: (-t[0], t[1], t[2]))
    expected = [(None if d == float("inf") else d, u, e)
                for d, u, e in expected[:10]]
    got = [(None if pd.isna(r.nn_dist) else r.nn_dist, r.user_id, r.event_id)
           for r in out.itertuples()]
    assert got == expected, (got, expected)  # bit-exact, order included


def test_events_discord_one_pass_plan_single_subtree(spark):
    """The r14 one-pass discord plan evaluates the _motif_zx subtree
    ONCE below _MOTIF_SLIM_MIN_ROWS: exactly one events scan and one
    Window node in the optimized plan (the r8-r13 join form carried
    four of each — the ReuseExchange-defeat diagnosis), and no join at
    all."""
    from etl_backend_spark.registry import QUERIES

    df = QUERIES["events_discord_topk"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Relation") == 1, plan
    assert plan.count("Window") == 1, plan
    assert "Join" not in plan, plan


def test_dot_unrolled_bit_equals_fold(spark):
    """dot_unrolled / norm_unrolled are bit-identical to the sequential
    aggregate fold (same seed, same left-assoc order) — pinned so the
    documented negative result (r8: the 64-term unroll de-JITs and is
    SLOWER; see vectors.py) keeps its correctness claim testable."""
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    v = V.as_double(F.col("embedding"))
    pair_dot = V.pair_dot_seq_pandas()
    bad = (
        e.select(
            V.dot(v, F.reverse(v)).alias("f"),
            V.dot_unrolled(v, F.reverse(v), 64).alias("u"),
            pair_dot(v, F.reverse(v)).alias("a"),
            V.norm(v).alias("nf"),
            V.norm_unrolled(v, 64).alias("nu"),
        )
        .filter((F.col("f") != F.col("u")) | (F.col("nf") != F.col("nu"))
                | (F.col("f") != F.col("a")))
        .count()
    )
    assert bad == 0


def test_sim_topk_lsh_recall_vs_brute(spark):
    """Bucketed ANN top-10 vs brute-force top-10.

    This dataset's nearest neighbors are weak (top cos ≈ 0.39 ⇒ sign-plane
    bit-agreement p ≈ 0.63), so hamming-≤2 multi-probe over 8 bits predicts
    recall ≈ Σ_{k≤2} C(8,k) p^(8-k)(1-p)^k ≈ 0.38; require ≥0.3 mean (for
    true near-dups at cos ≥ 0.9 the same math gives ≥0.95). Scores of every
    returned neighbor must match brute exactly (same scorer)."""
    from etl_backend_spark.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    brute = QUERIES["sim_topk_brute"](spark, sf).collect()
    lsh = QUERIES["sim_topk_lsh"](spark, sf).collect()
    brute_by_q: dict[int, set[int]] = {}
    score = {}
    for r in brute:
        brute_by_q.setdefault(r.q_id, set()).add(r.vec_id)
        score[(r.q_id, r.vec_id)] = r.cos_sim
    recalls = []
    for q, ids in brute_by_q.items():
        got = {r.vec_id for r in lsh if r.q_id == q}
        recalls.append(len(got & ids) / len(ids))
    assert sum(recalls) / len(recalls) >= 0.3, recalls
    for r in lsh:
        if (r.q_id, r.vec_id) in score:
            assert r.cos_sim == score[(r.q_id, r.vec_id)]


def test_word_shingles_py_equals_expression(spark, cat):
    """The pandas-UDF shingler and the expression shingler must produce the
    same shingle SETS (the fast path can't drift from the oracle-mirrored
    definition)."""
    d = cat.table("documents").limit(100)
    a = {
        (r.doc_id, r.s)
        for r in d.select(
            "doc_id", F.explode(T.word_shingles(F.col("text"), 3)).alias("s")
        ).distinct().collect()
    }
    b = {
        (r.doc_id, r.s)
        for r in d.select(
            "doc_id", F.explode(T.word_shingles_py(3)(F.col("text"))).alias("s")
        ).collect()
    }
    assert a == b


def test_sim_topk_ivf_recall_vs_brute(spark):
    """IVF (KMeans-8, probe-2) recall vs brute-force top-10: scanning the 2
    nearest of 8 clusters bounds recall by the cluster structure; require
    ≥0.3 mean here (weak-neighbor dataset) and exact score agreement on
    returned pairs."""
    from etl_backend_spark.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    brute = QUERIES["sim_topk_brute"](spark, sf).collect()
    ivf = QUERIES["sim_topk_ivf"](spark, sf).collect()
    bq, score = {}, {}
    for r in brute:
        bq.setdefault(r.q_id, set()).add(r.vec_id)
        score[(r.q_id, r.vec_id)] = r.cos_sim
    recalls = [
        len({r.vec_id for r in ivf if r.q_id == q} & ids) / len(ids)
        for q, ids in bq.items()
    ]
    assert sum(recalls) / len(recalls) >= 0.3, recalls
    for r in ivf:
        if (r.q_id, r.vec_id) in score:
            assert r.cos_sim == score[(r.q_id, r.vec_id)]


def test_dedup_embedding_recall_vs_allpairs(spark, cat):
    """The bucketed embedding near-dup op must (a) return a SUBSET of the
    exact all-pairs result restricted to its candidate rule, and (b) catch a
    reasonable fraction of true pairs (sign-LSH recall)."""
    from etl_backend_spark.registry import QUERIES
    from tests.conftest import SF_DIR

    lsh = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in QUERIES["dedup_embedding"](spark, SF_DIR).collect()
    }
    exact = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in QUERIES["sim_pairs_threshold"](spark, SF_DIR).collect()
    }
    # restrict both to the baseline's id range for comparability
    lsh_b = {k: v for k, v in lsh.items() if k[0] < 100 and k[1] < 100}
    # subset with identical scores
    for k, v in lsh_b.items():
        assert k in exact and abs(exact[k] - v) < 1e-9, k
    # recall: sign-agreement on the first 8 dims for cos>=0.3 pairs
    assert exact, "baseline empty — test data changed?"
    recall = len(lsh_b) / len(exact)
    assert recall >= 0.1, recall


def test_degenerate_bucket_block_salt_splits_tasks_same_pairs(spark, monkeypatch):
    """Planted degenerate LSH bucket (VERDICT r9 #4): vectors engineered
    to share ONE sign pattern in every band land in a single (band, key)
    bucket per band. With the routing threshold lowered under the
    planted size, `_bucket_pairs_block_salted` must (a) actually take
    the block path, splitting the bucket into MANY block-pair tasks
    instead of one unsplittable applyInPandas task, and (b) emit
    bit-identical pairs to the whole-bucket path. (The verdict's
    literal 200k-row plant is infeasible in a unit test — the O(m^2)
    PAIR WORK is the output itself at any split — so the plant is 600
    rows with the threshold at 200 and 128-row blocks: same mechanism,
    parameter-scaled; nb = ceil(600/128) = 5 -> 15 block-pair groups
    per band.)"""
    import numpy as np

    from etl_backend_spark.registry import QUERIES
    from etl_backend_spark.registry import llm as LL

    rng = np.random.RandomState(7)
    # all-positive dims => identical sign pattern in every band slice
    vecs = rng.uniform(0.1, 1.0, size=(600, 64)).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(600)],
        "vec_id long, embedding array<float>",
    )
    sf = "/tmp/etlbs-degen-bucket"
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf}/embeddings.parquet")

    ref = QUERIES["dedup_embedding"](spark, sf)  # threshold 100k: whole-bucket
    ref_rows = sorted(map(tuple, ref.collect()))
    assert ref_rows, "planted bucket produced no pairs?"
    plan_ref = ref._jdf.queryExecution().executedPlan().toString()

    monkeypatch.setattr(LL, "_DEGEN_BUCKET_ROWS", 200)
    monkeypatch.setattr(LL, "_DEGEN_BLOCK_ROWS", 128)
    # exact detection for the tiny plant (production samples 1/128 —
    # sound either way since routing is value-neutral)
    monkeypatch.setattr(LL, "_DEGEN_SAMPLE_MOD", 1)
    sal = QUERIES["dedup_embedding"](spark, sf)
    sal_rows = sorted(map(tuple, sal.collect()))
    assert sal_rows == ref_rows  # bit-identical routing (cos rounded same)

    # >1 task: the block path groups by (band, key, lo, hi); prove the
    # planted rows actually spread over >1 block (hence >1 kernel group)
    # with the SAME hash arithmetic the plan uses
    nb = -(-600 // 128)
    assert nb == 5
    n_blocks = (
        df.select(F.pmod(F.hash("vec_id"), F.lit(nb)).alias("blk"))
        .distinct().count()
    )
    assert n_blocks > 1  # => >= nb*(nb+1)/2 block-pair groups per band

    # the kNN consumer routes through the same guard with a block-aware
    # top-(k+eps) kernel — the block-pair superset must reproduce the
    # whole-bucket rows bit-exactly through the dedup+sort+slice agg
    monkeypatch.undo()
    knn_ref = sorted(map(tuple, QUERIES["knn_graph_lsh"](spark, sf).collect()))
    assert knn_ref
    monkeypatch.setattr(LL, "_DEGEN_BUCKET_ROWS", 200)
    monkeypatch.setattr(LL, "_DEGEN_BLOCK_ROWS", 128)
    monkeypatch.setattr(LL, "_DEGEN_SAMPLE_MOD", 1)
    knn_sal = sorted(map(tuple, QUERIES["knn_graph_lsh"](spark, sf).collect()))
    assert knn_sal == knn_ref

    # and the multiprobe consumer (probe/base asymmetric blocked kernel)
    monkeypatch.undo()
    mp_ref = sorted(map(tuple,
                        QUERIES["dedup_embedding_multiprobe"](spark, sf)
                        .collect()))
    assert mp_ref
    monkeypatch.setattr(LL, "_DEGEN_BUCKET_ROWS", 200)
    monkeypatch.setattr(LL, "_DEGEN_BLOCK_ROWS", 128)
    monkeypatch.setattr(LL, "_DEGEN_SAMPLE_MOD", 1)
    mp_sal = sorted(map(tuple,
                        QUERIES["dedup_embedding_multiprobe"](spark, sf)
                        .collect()))
    assert mp_sal == mp_ref
    # and the plans differ in shape: the salted one carries TWO
    # FlatMapGroupsInPandas operators (normal path + block path), while
    # the ref side is FOOTER-GATED (r11): 600 vectors can't fill a
    # 100k-row bucket, so the detection pass is skipped and the empty
    # salted branch folds away — exactly ONE kernel operator and no
    # sampled-count subtree (the logical plan is print-stable; the
    # executed AQE toString prints initial+final and can't distinguish
    # operator count from print count)
    opt_sal = sal._jdf.queryExecution().optimizedPlan().toString()
    assert opt_sal.count("FlatMapGroupsInPandas") == 2
    opt_ref = ref._jdf.queryExecution().optimizedPlan().toString()
    assert opt_ref.count("FlatMapGroupsInPandas") == 1
    assert "xxhash64" not in opt_ref  # no detection scan below the gate
    # (opt_sal's detection ran with _DEGEN_SAMPLE_MOD=1 — exact counts,
    # no hash-sample filter — so xxhash64's absence there proves nothing)


def test_split_leakage_safe_keeps_clusters_together(spark):
    """The property naive hash splitting violates: no near-dup pair may
    straddle the train/eval fence. Every cluster maps to exactly one
    split, and every Jaccard>=0.5 pair lands in one split."""
    from etl_backend_spark.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    sp = QUERIES["split_leakage_safe"](spark, sf)
    per_cluster = (
        sp.groupBy("cluster_id")
        .agg(F.count_distinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert per_cluster == 0
    # and all three splits actually occur (bucket arithmetic sane)
    splits = {r.split for r in sp.select("split").distinct().collect()}
    assert splits == {"train", "val", "test"}
    # direct pair check against the pair generator itself
    pairs = QUERIES["dedup_ngram_jaccard"](spark, sf).select("doc_a", "doc_b")
    sa = sp.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a"))
    sb = sp.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b"))
    straddling = (
        pairs.join(sa, "doc_a").join(sb, "doc_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .count()
    )
    assert straddling == 0


def test_multiprobe_dominates_exact_key_lsh(spark):
    """Query-directed multi-probing is a strict superset of the exact-key
    candidate generation: every pair the base form finds survives, plus
    recovered near-misses (one flipped low-confidence sign bit in some
    band)."""
    from etl_backend_spark.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    base = {
        (r.vec_a, r.vec_b)
        for r in QUERIES["dedup_embedding"](spark, sf).collect()
    }
    probed = {
        (r.vec_a, r.vec_b)
        for r in QUERIES["dedup_embedding_multiprobe"](spark, sf).collect()
    }
    assert base <= probed
    assert len(probed) > len(base)  # probing recovers extra true pairs


def test_multiprobe_capped_retains_full_hamming1_recall(spark):
    """The registered probe set flips only the _MULTIPROBE_FLIPS least-
    confident bits per band (constant probe expansion — the fourth-decade
    slope fix). The smallest-|x| bits are exactly where near-neighbor sign
    disagreements concentrate, so the capped form must retain ≥ 0.95 of
    the pairs full hamming-1 probing (flip every bit) finds."""
    import math

    from etl_backend_spark.registry import QUERIES
    from etl_backend_spark.registry.llm import _multiprobe_pairs
    from etl_backend_spark.sources.catalog import Catalog

    sf = "/root/testdata/sf0.001"
    e = Catalog(spark, sf).table("embeddings")
    n = e.count()
    bits = min(16, max(8, math.ceil(math.log2(max(n, 2) / 32.0))))
    full = {
        (r.vec_a, r.vec_b)
        for r in _multiprobe_pairs(spark, e, bits, capped=False).collect()
    }
    capped = {
        (r.vec_a, r.vec_b)
        for r in QUERIES["dedup_embedding_multiprobe"](spark, sf).collect()
    }
    assert len(full) > 0
    recall = len(capped & full) / len(full)
    assert recall >= 0.95, f"capped-probe recall vs full hamming-1: {recall:.3f}"


def test_jaccard_df_cap_engine_oracle_agree():
    """The boilerplate DF cap is derived once (2 x pair-blowup budget) and
    interpolated into every oracle that filters on it; a drifted engine-side
    constant would silently change results. Assert the oracle SQL carries
    the exact derived value."""
    from etl_backend_spark.registry import ORACLES
    from etl_backend_spark.registry.llm import (
        _JACCARD_DF_CAP,
        _JACCARD_PAIR_BLOWUP,
    )

    assert _JACCARD_DF_CAP == 2 * _JACCARD_PAIR_BLOWUP
    assert f"count(*) <= {_JACCARD_DF_CAP}" in ORACLES["dedup_ngram_jaccard"]


def test_pq_fit_encode_adc_unit():
    """functions/pq.py unit contract: deterministic fit, nearest-centroid
    encoding, and ADC scores that equal the explicit dot product against the
    reconstructed (centroid-concatenated) vectors."""
    import numpy as np

    from etl_backend_spark.functions import pq

    rng = np.random.RandomState(0)
    x = rng.randn(300, 16)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    b1 = pq.fit_codebooks(x, m=4, k=8, iters=5, seed=7)
    b2 = pq.fit_codebooks(x, m=4, k=8, iters=5, seed=7)
    assert np.array_equal(b1, b2)                   # seeded determinism
    assert b1.shape == (4, 8, 4)

    codes = pq.encode(x, b1)
    assert codes.shape == (300, 4) and codes.min() >= 0 and codes.max() < 8
    # encoding is the per-subspace argmin: check one row exhaustively
    for mi in range(4):
        sub = x[0, mi * 4:(mi + 1) * 4]
        d2 = ((b1[mi] - sub) ** 2).sum(axis=1)
        assert codes[0, mi] == d2.argmin()

    q = rng.randn(3, 16)
    tables = pq.adc_tables(q, b1)
    scores = pq.adc_scores(codes, tables)
    assert scores.shape == (300, 3)
    # ADC == dot(query, reconstruction) by construction
    recon = np.concatenate([b1[mi][codes[:, mi]] for mi in range(4)], axis=1)
    assert np.allclose(scores, recon @ q.T)


def test_pq_rejects_indivisible_dim():
    import numpy as np
    import pytest

    from etl_backend_spark.functions import pq

    with pytest.raises(ValueError, match="not divisible"):
        pq.fit_codebooks(np.zeros((10, 10)), m=4, k=2)


def test_sim_topk_pq_recall_vs_brute(spark):
    """PQ (M=8, K=16, ADC top-64 rerank) vs brute-force top-10: the exact
    rerank over 64 ADC candidates recovers most of the true top-10 even on
    this weak-neighbor dataset (measured 0.68 at sf0.001 / 0.84 at sf0.01 —
    well above LSH's 0.38 and IVF's 0.3 structural bounds); require ≥0.5
    mean. Returned scores must match brute exactly (same exact-cosine
    scorer in the rerank)."""
    from etl_backend_spark.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    brute = QUERIES["sim_topk_brute"](spark, sf).collect()
    got = QUERIES["sim_topk_pq"](spark, sf).collect()
    bq, score = {}, {}
    for r in brute:
        bq.setdefault(r.q_id, set()).add(r.vec_id)
        score[(r.q_id, r.vec_id)] = r.cos_sim
    recalls = [
        len({r.vec_id for r in got if r.q_id == q} & ids) / len(ids)
        for q, ids in bq.items()
    ]
    assert sum(recalls) / len(recalls) >= 0.5, recalls
    for r in got:
        if (r.q_id, r.vec_id) in score:
            assert r.cos_sim == score[(r.q_id, r.vec_id)]


def test_pq_topk_scan_partition_independent(spark):
    """In-scan local top-k under a total order must give the SAME final
    result for any partitioning of the corpus (selection by a total order
    is associative — the scale guarantee the operator relies on)."""
    import numpy as np

    from etl_backend_spark.functions import pq

    rng = np.random.RandomState(3)
    vecs = rng.randn(200, 16)
    books = pq.fit_codebooks(vecs, m=4, k=8, iters=5, seed=1)
    tables = pq.adc_tables(rng.randn(2, 16), books)
    codes = pq.encode(vecs, books)
    df = spark.createDataFrame(
        [(int(i), [int(c) for c in codes[i]]) for i in range(200)],
        "vec_id long, codes array<int>",
    )
    results = []
    for parts in (1, 3, 8):
        out = (
            df.repartition(parts)
            .mapInPandas(pq.topk_scan_pandas(tables, k=10),
                         schema="qi int, vec_id long, adc double")
            .collect()
        )
        # global top-10 per query from the local unions
        byq = {}
        for r in out:
            byq.setdefault(r.qi, []).append((-r.adc, r.vec_id))
        results.append({q: sorted(v)[:10] for q, v in byq.items()})
    assert results[0] == results[1] == results[2]
    # exclude_ids drops the excluded candidate entirely
    out = (
        df.mapInPandas(pq.topk_scan_pandas(tables, k=200, exclude_ids=[5, 7]),
                       schema="qi int, vec_id long, adc double")
        .collect()
    )
    assert all(not (r.qi == 0 and r.vec_id == 5) for r in out)
    assert all(not (r.qi == 1 and r.vec_id == 7) for r in out)


def test_sim_topk_pandas_matches_brute(spark):
    """The numpy fast path (in-scan local top-10 pruning + global re-rank)
    must return the same neighbors as the expression-based exact brute
    force, with scores equal to 6-decimal rounding (the scorers differ only
    in float summation order)."""
    import math

    from etl_backend_spark.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    brute = {(r.q_id, r.vec_id): r.cos_sim
             for r in QUERIES["sim_topk_brute"](spark, sf).collect()}
    fast = {(r.q_id, r.vec_id): r.cos_sim
            for r in QUERIES["sim_topk_pandas"](spark, sf).collect()}
    assert set(fast) == set(brute)
    for k in brute:
        assert math.isclose(fast[k], brute[k], abs_tol=2e-6), k


def test_pq_indexed_equals_adhoc(spark):
    """The persisted-index query path must return EXACTLY the ad-hoc
    sim_topk_pq rows — same seeds, same total order — proving the
    fit→persist→load→scan artifact round-trip loses nothing."""
    from etl_backend_spark.registry import QUERIES
    from tests.conftest import SF_DIR

    adhoc = QUERIES["sim_topk_pq"](spark, SF_DIR).collect()
    indexed = QUERIES["sim_topk_pq_indexed"](spark, SF_DIR).collect()
    assert sorted(map(tuple, adhoc)) == sorted(map(tuple, indexed))


def test_index_dir_rekeys_on_corpus_change(tmp_path):
    """r11 ADVICE (medium): artifact dirs must be keyed by corpus CONTENT,
    not path alone — a regenerated corpus at the same path previously kept
    serving stale codes (and the replay oracles read the same stale
    artifacts through the symlink, so the value gate could not catch it).
    The fingerprint folds file sizes and mtimes, so rewriting any source
    file re-keys the directory and forces a rebuild."""
    import os

    from etl_backend_spark.ann import index as ann_index

    # the fingerprint stats names/sizes/mtimes — it never opens parquet,
    # so a dummy part file exercises the rekey logic without fixture
    # copies; a NESTED layout proves the lister walks recursively (the
    # r11 code-review finding: a top-level glob saw these as empty)
    sf = tmp_path / "corpus"
    (sf / "embeddings.parquet" / "part=0").mkdir(parents=True)
    victim = sf / "embeddings.parquet" / "part=0" / "part-0.parquet"
    victim.write_bytes(b"x" * 64)
    root = str(tmp_path / "annroot")  # isolated artifact root

    d1 = ann_index.index_dir_for("pq", str(sf), root=root)
    # same content -> same dir (stable cache key)
    assert ann_index.index_dir_for("pq", str(sf), root=root) == d1

    # rewrite the corpus (size change) -> new dir; a top-level-only
    # lister would fingerprint the nested layout as empty and keep d1
    with open(victim, "ab") as f:
        f.write(b"\0")
    d2 = ann_index.index_dir_for("pq", str(sf), root=root)
    assert d2 != d1

    # mtime-only change (same size, e.g. regenerated identical-size drop)
    # also re-keys
    st = os.stat(victim)
    os.utime(victim, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    d3 = ann_index.index_dir_for("pq", str(sf), root=root)
    assert d3 != d2

    # point_current garbage-collects unreferenced same-kind siblings
    # (fingerprint-keyed dirs would otherwise leak one corpus-sized
    # artifact set per regeneration) without touching other kinds
    d_other = ann_index.index_dir_for("pqx", str(sf), root=root)
    ann_index.point_current("pq", d3, root=root)
    assert os.path.isdir(d3) and os.path.isdir(d_other)
    assert not os.path.isdir(d1) and not os.path.isdir(d2)
    assert os.path.realpath(os.path.join(root, "pq-current")) == \
        os.path.realpath(d3)

    # per-user root (r11 ADVICE): no fixed world-writable shared path
    assert str(os.getuid()) in ann_index.ANN_ROOT


def test_min_label_components_long_chain_converges_logarithmically(spark):
    """Planted 100-node chain (diameter 99 — far beyond any near-dup
    fixture): pointer jumping must converge in O(log diameter) rounds,
    where plain neighbor-min propagation would need 99 and trip the cap.
    Also verifies a multi-component graph labels every node with its
    component's min id (VERDICT r5 task 5)."""
    from pyspark.sql import functions as F

    from etl_backend_spark.operators.windows import release_plan_checkpoints
    from etl_backend_spark.registry.llm import min_label_components

    # chain 0-1-2-...-99 plus a disjoint triangle {1000,1001,1002}
    chain = [(i, i + 1) for i in range(99)]
    tri = [(1000, 1001), (1001, 1002), (1000, 1002)]
    pairs = spark.createDataFrame(chain + tri, "s long, d long")
    edges = pairs.union(pairs.select(F.col("d").alias("s"),
                                     F.col("s").alias("d")))

    labels, converged = min_label_components(edges, max_rounds=12)
    assert converged, "100-node chain needs <= ~9 jump rounds, got cap"
    got = {r.n: r.lbl for r in labels.collect()}
    release_plan_checkpoints(labels)
    assert all(got[i] == 0 for i in range(100))
    assert all(got[i] == 1000 for i in (1000, 1001, 1002))


def test_sim_topk_ivfpq_recall_and_partition_pruning(spark):
    """The composed IVF-PQ index: (a) recall@10 vs exact brute-force stays
    above the multiprobe bar on the probed fraction of the corpus; (b) the
    codes scan is PARTITION-pruned to the probed cells (hive-partitioned
    inverted lists — unprobed directories never open); (c) repeat queries
    reuse the persisted artifact."""
    from etl_backend_spark.registry import QUERIES
    from tests.conftest import SF_DIR

    brute = {
        (r.q_id, r.vec_id)
        for r in QUERIES["sim_topk_brute"](spark, SF_DIR).collect()
    }
    got_df = QUERIES["sim_topk_ivfpq"](spark, SF_DIR)
    got = {(r.q_id, r.vec_id) for r in got_df.collect()}
    recall = len(got & brute) / len(brute)
    assert recall >= 0.5, f"IVF-PQ recall@10 {recall:.2f} under bar"

    # partition pruning visible in the plan of the scan
    import os

    from etl_backend_spark.ann import index as ann_index

    d = ann_index.index_dir_for("ivfpq", SF_DIR)
    assert os.path.exists(os.path.join(d, "ivfpq.json"))
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan, plan

    # determinism across invocations (artifact reuse, same seeds)
    again = {(r.q_id, r.vec_id)
             for r in QUERIES["sim_topk_ivfpq"](spark, SF_DIR).collect()}
    assert again == got


def test_text_search_indexed_prunes_partitions_and_reuses(spark):
    """The inverted-index keyword search opens ONLY the query terms'
    posting buckets (hive-partition pruning on tb) and the build is
    fingerprint-cached."""
    from etl_backend_spark.registry import QUERIES
    from etl_backend_spark.registry.pipeline import (
        _term_bucket_py, ensure_text_index)
    from tests.conftest import SF_DIR

    df = QUERIES["text_search_indexed"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "tb" in plan, plan

    idx_dir, built = ensure_text_index(spark, SF_DIR)
    assert not built  # second call reused the artifact
    buckets = {_term_bucket_py(t) for t in ("spark", "merge")}
    # the plan prunes on the bucket key (inputFiles() is pre-pruning, so
    # assert through the executed plan + a semantic equivalence check:
    # pruned-bucket postings == full-table postings for the query terms)
    full = spark.read.parquet(idx_dir).filter(
        F.col("term").isin(["spark", "merge"])
    )
    pruned = full.filter(F.col("tb").isin(sorted(buckets)))
    pplan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [tb" in pplan.replace("cast(tb", "tb") or \
        "tb#" in pplan.split("PartitionFilters")[1][:120], pplan
    a = sorted(map(tuple, pruned.select("term", "doc_id").collect()))
    b = sorted(map(tuple, full.select("term", "doc_id").collect()))
    assert a == b and len(a) > 0


def test_text_phrase_indexed_prunes_partitions_and_counts_adjacency(spark):
    """The positional-index phrase search opens only the two query terms'
    buckets (partition pruning on tb), reuses the fingerprint-cached
    artifact, and its per-doc counts equal a python recount of exact
    'fast table' adjacencies over the tokenized corpus."""
    from etl_backend_spark.registry import QUERIES
    from etl_backend_spark.registry.pipeline import (
        ensure_text_index_positional)
    from etl_backend_spark.sources.catalog import Catalog
    from tests.conftest import SF_DIR

    df = QUERIES["text_phrase_indexed"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "tb" in plan, plan
    got = {r.doc_id: r.n_hits for r in df.collect()}

    _, built = ensure_text_index_positional(spark, SF_DIR)
    assert not built  # second call reused the artifact

    docs = Catalog(spark, SF_DIR).table("documents") \
        .select("doc_id", "text").collect()
    expected = {}
    for r in docs:
        w = r.text.strip().lower().split()
        n = sum(1 for i in range(len(w) - 1)
                if w[i] == "fast" and w[i + 1] == "table")
        if n:
            expected[r.doc_id] = n
    assert got == expected and len(got) > 0


def test_bm25_search_indexed_prunes_and_ranks_sanely(spark):
    """BM25 runs off the pruned posting partitions (plan-asserted), all
    scores are positive (the +1 idf variant), and a doc with MORE query
    terms outranks the same-length doc with fewer — checked against a
    python BM25 recount on the highest-scored doc."""
    import math

    from etl_backend_spark.registry import QUERIES
    from etl_backend_spark.sources.catalog import Catalog
    from tests.conftest import SF_DIR

    df = QUERIES["bm25_search_indexed"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "tb" in plan, plan
    rows = df.collect()
    assert rows and all(r.bm25 > 0 for r in rows)

    docs = Catalog(spark, SF_DIR).table("documents") \
        .select("doc_id", "text").collect()
    toks = {r.doc_id: r.text.strip().lower().split() for r in docs}
    n = len(toks)
    avgdl = sum(len(w) for w in toks.values()) / n
    dfs = {t: sum(1 for w in toks.values() if t in w)
           for t in ("spark", "merge")}
    best = max(rows, key=lambda r: (r.bm25, -r.doc_id))
    w = toks[best.doc_id]
    expect = 0.0
    for t in ("spark", "merge"):
        tf = w.count(t)
        if tf:
            idf = math.log((n - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0)
            expect += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(w) / avgdl))
    assert abs(best.bm25 - round(expect, 4)) < 1e-9, (best, expect)


def test_bpe_matches_pure_python_reference(spark):
    """The distributed BPE path (capped-frequency-table train + memoized
    Arrow apply) must equal an end-to-end pure-Python BPE on the same
    corpus: same merges, same per-doc token counts. Also pins the
    algebraic invariants (chars >= tokens >= words) and determinism."""
    from etl_backend_spark.functions import bpe
    from etl_backend_spark.registry import QUERIES
    from etl_backend_spark.sources.catalog import Catalog
    from tests.conftest import SF_DIR

    docs = {
        r.doc_id: r.text.strip().lower().split()
        for r in Catalog(spark, SF_DIR).table("documents")
        .select("doc_id", "text").collect()
    }
    # pure-Python reference: full-corpus frequency table (the corpus
    # vocab is far under the 4096 cap, so capped == full here), then
    # the same greedy trainer
    freqs: dict[str, int] = {}
    for ws in docs.values():
        for w in ws:
            freqs[w] = freqs.get(w, 0) + 1
    ref_freqs = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))[:4096]
    ref_merges = bpe.train_merges(ref_freqs, n_merges=32)

    spark_merges = bpe.train_merges(
        bpe.word_freq_table(Catalog(spark, SF_DIR).table("documents")),
        n_merges=32,
    )
    assert spark_merges == ref_merges  # identical artifact

    got = {r.doc_id: (r.n_words, r.n_tokens)
           for r in QUERIES["tokenize_bpe"](spark, SF_DIR).collect()}
    for doc_id, ws in docs.items():
        want = sum(len(bpe.encode_word(w, ref_merges)) for w in ws)
        assert got[doc_id] == (len(ws), want), doc_id
        n_chars = sum(len(w) + 1 for w in ws)  # + EOW sentinel
        assert len(ws) <= want <= n_chars
    # merges actually compress: tokens strictly under raw chars somewhere
    assert any(got[d][1] < sum(len(w) + 1 for w in ws)
               for d, ws in docs.items())

    again = {r.doc_id: (r.n_words, r.n_tokens)
             for r in QUERIES["tokenize_bpe"](spark, SF_DIR).collect()}
    assert again == got


def test_quality_classifier_learns_rule_labels(spark):
    """The learned quality filter must agree with the rule labels it was
    bootstrapped from on HELD-OUT documents (features determine labels,
    so a fit LR should generalize near-perfectly), and both classes must
    actually occur in the corpus (no degenerate single-class fit)."""
    from etl_backend_spark.registry import QUERIES
    from tests.conftest import SF_DIR

    labels = QUERIES["gopher_rules"](spark, SF_DIR).groupBy("keep").count()
    assert labels.count() == 2  # both classes present

    rows = QUERIES["quality_classifier_lr"](spark, SF_DIR).collect()
    stats = {(r.split, r.agree): r.n for r in rows}
    for split in ("train", "heldout"):
        agree = stats.get((split, True), 0)
        total = agree + stats.get((split, False), 0)
        assert total > 0
        assert agree / total >= 0.95, (split, stats)


# Frozen LR artifact (VERDICT r6 #3): one 20-iter LBFGS fit of
# quality_classifier_lr's exact config at sf0.001, captured 2026-08-14.
# The pin below scores TODAY'S feature pipeline with THESE weights and
# requires the per-doc predictions to match exactly — an accuracy bar
# lets small feature/scoring drift hide; a frozen-weight prediction set
# cannot (any change to the feature expressions flips boundary docs).
_QLR_FROZEN_W = (0.010056062300354596, -0.5210280257482008,
                 0.0, 30.8961616325859)
_QLR_FROZEN_B = -13.497412774606715
_QLR_EXPECT_N_DOCS = 500
_QLR_EXPECT_PRED0 = [
    14, 27, 32, 33, 45, 51, 52, 57, 84, 89, 114, 134, 139, 140, 147,
    155, 164, 167, 193, 225, 253, 327, 346, 370, 397, 398, 400, 405,
    414, 424, 436, 455, 466, 487,
]


def test_quality_classifier_frozen_weight_predictions(spark):
    """Score the live feature frame with the FROZEN weights and pin the
    exact per-doc prediction set — regression guard for the feature
    expressions and the scoring math (the live fit keeps its own
    accuracy-bar test above)."""
    from etl_backend_spark.registry.pipeline import qlr_features
    from tests.conftest import SF_DIR

    w, b = _QLR_FROZEN_W, _QLR_FROZEN_B
    margin = (
        F.lit(b)
        + F.lit(w[0]) * F.col("f_nwords")
        + F.lit(w[1]) * F.col("f_wordlen")
        + F.lit(w[2]) * F.col("f_symbols")
        + F.lit(w[3]) * F.col("f_stop")
    )
    rows = (
        qlr_features(spark, SF_DIR)
        .select("doc_id", (margin <= 0).alias("pred0"))
        .collect()
    )
    assert len(rows) == _QLR_EXPECT_N_DOCS
    pred0 = sorted(r.doc_id for r in rows if r.pred0)
    assert pred0 == _QLR_EXPECT_PRED0


def _pagerank_python_reference(spark, sf_dir):
    """Pure-Python 15-round damped power iteration on the SAME edge
    weights the engine builds (weights are integers, so the collect is
    exact; the normalization and blend replay the engine's float ops)."""
    from collections import defaultdict

    from etl_backend_spark.sources.catalog import Catalog

    cat = Catalog(spark, sf_dir)
    o = cat.table("orders").select("o_orderkey", "o_custkey")
    li = cat.table("lineitem").select("l_orderkey", "l_partkey")
    co = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    small = (co.groupBy("p").agg(F.count(F.lit(1)).alias("nc"))
             .filter(F.col("nc") <= 64).select("p"))
    cop = co.join(small, "p", "left_semi")
    a = cop.select("p", F.col("c").alias("s"))
    b = cop.select("p", F.col("c").alias("d"))
    e = (a.join(b, "p").filter(F.col("s") != F.col("d"))
         .groupBy("s", "d").agg(F.count(F.lit(1)).alias("w"))
         .filter(F.col("w") >= 2))
    rows = e.collect()
    outw = defaultdict(float)
    for r in rows:
        outw[r.s] += r.w
    nodes = sorted(outw)
    ranks = {n: 1.0 for n in nodes}
    for _ in range(15):
        cin = defaultdict(float)
        for r in rows:
            cin[r.d] += (r.w / outw[r.s]) * ranks[r.s]
        ranks = {n: 0.15 + 0.85 * cin.get(n, 0.0) for n in nodes}
    return ranks


def test_graph_pagerank_matches_reference_power_iteration(spark):
    """The distributed damped power iteration must match a pure-Python
    reference on the SAME normalized edge list to 1e-6 — same rounds,
    same damping, same teleport — and the top-20 ordering must agree."""
    from etl_backend_spark.registry import QUERIES
    from tests.conftest import SF_DIR

    ranks = _pagerank_python_reference(spark, SF_DIR)
    got = QUERIES["graph_pagerank"](spark, SF_DIR).collect()
    want = sorted(ranks, key=lambda n: (-ranks[n], n))[:20]
    assert [r.custkey for r in got] == want
    for r in got:
        assert abs(r.rank - ranks[r.custkey]) < 1e-5, (r, ranks[r.custkey])


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001",
                                    "/root/testdata/sf0.01"])
def test_graph_pagerank_full_vector_pinned_two_decades(spark, sf_dir):
    """VERDICT r6 #3: the FULL rank vector (not top-20) pinned against
    the pure-Python reference at TWO decades, tolerance 0 on 1e-9-scaled
    integers. Distributed float sums differ from sequential ones by
    ~1e-13 relative, far inside the 1e-9 grid, so any true regression
    (a dropped node, a wrong teleport, a mis-normalized edge) cannot
    hide — unlike a top-k or tolerance-band check."""
    from etl_backend_spark.registry.llm import pagerank_ranks

    want = {n: round(r * 1e9) for n, r in
            _pagerank_python_reference(spark, sf_dir).items()}
    got = {r.n: round(r.r * 1e9) for r in
           pagerank_ranks(spark, sf_dir).collect()}
    assert set(got) == set(want)
    diffs = {n: (got[n], want[n]) for n in want if got[n] != want[n]}
    assert diffs == {}, (len(diffs), dict(list(diffs.items())[:5]))


def test_semdedup_kmeans_matches_independent_greedy_twin(spark):
    """Full-output pin at two decades: an INDEPENDENT plain-loop greedy
    (paper rule re-coded from scratch: visit farthest-from-centroid
    first, duplicate of the most-similar kept vector above 1 - eps)
    over the same deterministic cells must reproduce every
    (vec_id, cell, keep, dup_of) row. The centroid fit/assignment is the
    shared SPEC (seeded numpy, functions/semdedup.py); the pruning logic
    — the part with ordering/tie-break room — is re-derived here."""
    import numpy as np

    from etl_backend_spark.functions import semdedup as sd
    from etl_backend_spark.registry import QUERIES
    from etl_backend_spark.sources.catalog import Catalog

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        got = {
            r.vec_id: (r.cell, r.keep, r.dup_of)
            for r in QUERIES["semdedup_kmeans"](spark, sf).collect()
        }

        rows = sorted(
            (r.vec_id, np.array(r.embedding, dtype=np.float64))
            for r in Catalog(spark, sf).table("embeddings")
            .select("vec_id", "embedding").collect()
        )
        ids = np.array([i for i, _ in rows])
        mat = np.stack([v / np.linalg.norm(v) for _, v in rows])
        n = len(ids)
        k = sd.k_schedule(n)
        cap = min(n, max(8 * k, 4096), sd.FIT_CAP)
        assert n <= cap, "twin assumes the fit sample is the full corpus"
        cents = sd.fit_centroids(mat, k=min(k, n), seed=11)
        cell, cdot = sd.assign_cells(mat, cents)

        expected = {}
        for c in np.unique(cell):
            m = cell == c
            c_ids, c_mat, c_cdot = ids[m], mat[m], cdot[m]
            assert len(c_ids) <= sd.SUBSPLIT, "twin assumes no local split"
            # independent greedy: plain loops, explicit tie-breaks
            order = sorted(range(len(c_ids)),
                           key=lambda i: (c_cdot[i], c_ids[i]))
            kept = []
            for i in order:
                best_j, best_s = None, -2.0
                for j in kept:
                    s = float(c_mat[i] @ c_mat[j])
                    if s > best_s:
                        best_j, best_s = j, s
                if best_j is not None and best_s > 1.0 - sd.EPS:
                    expected[int(c_ids[i])] = (int(c), False, int(c_ids[best_j]))
                else:
                    kept.append(i)
                    expected[int(c_ids[i])] = (int(c), True, None)
        assert got == expected and len(got) == n


def test_semdedup_kmeans_partition_layout_independent(spark):
    """Output must not depend on the shuffle layout: the prune stage sorts
    each cell group before its order-sensitive greedy pass."""
    from etl_backend_spark.registry import QUERIES

    sf = "/root/testdata/sf0.01"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    base = sorted(map(tuple, QUERIES["semdedup_kmeans"](spark, sf).collect()))
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        alt = sorted(map(tuple, QUERIES["semdedup_kmeans"](spark, sf).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert base == alt and len(base) > 0


def test_semdedup_subsplit_path_replays_in_oracle(spark, tmp_path):
    """Force the hot-cluster SUBSPLIT path (a cell past SUBSPLIT=256
    rows re-clusters locally before the greedy) and assert the DuckDB
    replay oracle reproduces the engine's full
    (vec_id, cell, keep, dup_of) surface exactly — the (sub, prio)
    columns of the persisted assignment record are precisely what makes
    this path replayable, and neither the sf0.01 gate corpus nor the
    other planted tests are guaranteed to exercise it.

    300 BIT-IDENTICAL vectors must land in one k-means cell (equal
    distance rows -> argmin's first-index tie-break picks the same
    centroid for all), pushing that cell past SUBSPLIT deterministically
    regardless of where the seeded fit places centroids."""
    import duckdb
    import numpy as np

    from etl_backend_spark.ann.index import ANN_ROOT
    from etl_backend_spark.functions import semdedup as sd
    from etl_backend_spark.registry import ORACLES, QUERIES

    rng = np.random.RandomState(3)
    hot = rng.randn(64)
    vecs = [(i, hot) for i in range(300)]
    vecs += [(300 + i, rng.randn(64) * 3.0) for i in range(150)]
    d = tmp_path / "sfhot"
    d.mkdir()
    spark.createDataFrame(
        [(int(i), [float(x) for x in v], "x") for i, v in vecs],
        "vec_id long, embedding array<float>, label string",
    ).write.parquet(str(d / "embeddings.parquet"))

    # NOTE: this runs the registry builder against the global ANN_ROOT,
    # so semdedup-current now points at THIS corpus' artifacts and
    # point_current's GC reclaims prior dirs — fine under the engine-
    # runs-strictly-before-its-oracle protocol every consumer follows
    # (the gate and driver re-run the engine first; an oracle-only
    # replay after pytest would read this test corpus).
    rows = QUERIES["semdedup_kmeans"](spark, str(d)).collect()
    got = sorted((r.vec_id, r.cell, r.keep, r.dup_of) for r in rows)
    assert len(got) == 450

    con = duckdb.connect()
    art = con.execute(
        f"SELECT max(sub), count(*) FROM read_parquet("
        f"'{ANN_ROOT}/semdedup-current/assign/*.parquet')"
    ).fetchone()
    assert art[1] == 450
    # sub > 0 holds because the hot cell captures ~1/7 of the 150
    # far-scattered gaussians in expectation (a geometric fact, not a
    # rounding-sensitive one), and the sub-fit's dead-centroid reseed
    # then pulls at least one sub-centroid onto a scatter point, which
    # claims its neighborhood away from sub 0
    assert art[0] > 0, "subsplit path not exercised — hot cell too small"

    # the 300 identical vectors collapse to exactly one kept vector
    hot_rows = [r for r in rows if r.vec_id < 300]
    kept_hot = [r.vec_id for r in hot_rows if r.keep]
    assert len(kept_hot) == 1
    assert all(r.dup_of == kept_hot[0] for r in hot_rows if not r.keep)

    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{d}/embeddings.parquet/*.parquet')"
    )
    want = sorted(map(tuple, con.execute(
        ORACLES["semdedup_kmeans"]).fetchall()))
    con.close()
    assert got == want


def test_semdedup_zero_norm_vectors_kept_and_replay_matches(spark,
                                                            tmp_path):
    """Degenerate embeddings must not kill or desync the gate (r11
    code-review): an ALL-ZERO vector used to raise DIVIDE_BY_ZERO under
    Spark 4's ANSI mode inside l2_normalize — with the 1e-300 divisor
    guard (mirrored in the replay oracle's SQL) it normalizes to the
    zero vector and is KEPT (cosine 0.0 to everything). A NaN-poisoned
    vector still normalizes to NaN, and the greedy masks NaN cosines to
    -inf on BOTH engines (numpy's argmax would return the NaN position
    and compare False while DuckDB sorts NaN ABOVE the threshold —
    opposite keep/dup decisions without the shared mask). TWO NaN
    vectors force the all-NaN-sims path: the second one's sims against
    the kept first are NaN. Pin: all four degenerate vectors are KEPT,
    planted near-dups still collapse (degenerate rows never suppress a
    real duplicate), and the oracle replay matches row-for-row."""
    import duckdb
    import numpy as np

    from etl_backend_spark.registry import ORACLES, QUERIES

    rng = np.random.RandomState(11)
    base = rng.randn(150, 64)
    vecs = [(i, base[i]) for i in range(150)]
    for p in range(5):  # near-dup twins of the first 5
        vecs.append((500 + p, base[p] + rng.randn(64) * 0.01))
    vecs.append((900, np.zeros(64)))
    vecs.append((901, np.zeros(64)))
    nanvec = base[20].copy()
    nanvec[7] = np.nan
    vecs.append((910, nanvec))
    vecs.append((911, nanvec))
    d = tmp_path / "sfzero"
    d.mkdir()
    spark.createDataFrame(
        [(int(i), [float(x) for x in v], "x") for i, v in vecs],
        "vec_id long, embedding array<float>, label string",
    ).write.parquet(str(d / "embeddings.parquet"))

    rows = QUERIES["semdedup_kmeans"](spark, str(d)).collect()
    out = {r.vec_id: r for r in rows}
    assert len(out) == 159
    for v in (900, 901, 910, 911):  # degenerate vectors survive
        assert out[v].keep, v
    for p in range(5):  # degenerates never suppressed real dup detection
        ra, rb = out[p], out[500 + p]
        assert ra.keep != rb.keep
        dup, kept = (ra, rb) if rb.keep else (rb, ra)
        assert dup.dup_of == kept.vec_id

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{d}/embeddings.parquet/*.parquet')"
    )
    want = sorted(map(tuple, con.execute(
        ORACLES["semdedup_kmeans"]).fetchall()))
    con.close()
    got = sorted((r.vec_id, r.cell, r.keep, r.dup_of) for r in rows)
    assert got == want


def test_semdedup_incremental_planted_and_replay(spark, tmp_path):
    """Incremental SemDeDup behavior pins on planted data: a batch
    vector near a BASE KEPT vector collapses onto it (dup_of = the base
    id), a batch-internal near-dup pair (far from the base) keeps
    exactly one member, base-only vectors never appear in the output,
    and the DuckDB replay oracle reproduces the engine's full surface
    from the persisted base/batch records. The 'sdinc:' md5 split is
    recomputed here with hashlib to locate base vs batch ids."""
    import hashlib

    import duckdb
    import numpy as np

    from etl_backend_spark.registry import ORACLES, QUERIES

    def is_batch(i):
        h = hashlib.md5(f"sdinc:{i}".encode()).hexdigest()[:8]
        return int(h, 16) % 100 >= 90

    rng = np.random.RandomState(23)
    n = 300
    vecs = {i: rng.randn(64) for i in range(n)}
    batch_ids = sorted(i for i in vecs if is_batch(i))
    base_ids = sorted(i for i in vecs if not is_batch(i))
    assert len(batch_ids) >= 10
    # plant: first batch id is a near-copy of a base vector
    b_on_base, a_base = batch_ids[0], base_ids[0]
    vecs[b_on_base] = vecs[a_base] + rng.randn(64) * 0.01
    # plant: two batch ids are near-copies of each other, far from base
    b1, b2 = batch_ids[1], batch_ids[2]
    shared = rng.randn(64) * 2.0
    vecs[b1] = shared + rng.randn(64) * 0.01
    vecs[b2] = shared + rng.randn(64) * 0.01

    d = tmp_path / "sfincr"
    d.mkdir()
    spark.createDataFrame(
        [(int(i), [float(x) for x in v], "x") for i, v in vecs.items()],
        "vec_id long, embedding array<float>, label string",
    ).write.parquet(str(d / "embeddings.parquet"))

    rows = QUERIES["semdedup_incremental"](spark, str(d)).collect()
    out = {r.vec_id: r for r in rows}
    assert set(out) == set(batch_ids)  # batch only, every batch row

    assert not out[b_on_base].keep
    assert out[b_on_base].dup_of == a_base  # collapsed onto the base rep
    ra, rb = out[b1], out[b2]
    assert ra.keep != rb.keep  # batch-internal pair: exactly one lives
    dup, kept = (ra, rb) if rb.keep else (rb, ra)
    assert dup.dup_of == kept.vec_id

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{d}/embeddings.parquet/*.parquet')"
    )
    want = sorted(map(tuple, con.execute(
        ORACLES["semdedup_incremental"]).fetchall()))
    con.close()
    got = sorted((r.vec_id, r.cell, r.keep, r.dup_of) for r in rows)
    assert got == want


def test_dedup_minhash_incremental_planted_and_replay(spark, tmp_path):
    """Incremental fuzzy dedup pins: a batch doc that is a near-copy of
    a BASE doc surfaces as (doc_new=batch, doc_match=base) with high
    estimated Jaccard; a batch-internal near-pair surfaces once,
    oriented doc_match < doc_new; base-base near-pairs NEVER appear
    (the corpus is not re-deduped); and the DuckDB oracle — batch
    signatures recomputed in SQL, base signatures read from the
    persisted index — matches the engine row-for-row. The 'mhinc:' md5
    split is recomputed with hashlib to place planted docs."""
    import hashlib

    import duckdb

    from etl_backend_spark.registry import ORACLES, QUERIES

    def is_batch(i):
        h = hashlib.md5(f"mhinc:{i}".encode()).hexdigest()[:8]
        return int(h, 16) % 100 >= 90

    ids = list(range(400))
    batch_ids = [i for i in ids if is_batch(i)]
    base_ids = [i for i in ids if not is_batch(i)]
    assert len(batch_ids) >= 4 and len(base_ids) >= 4

    import numpy as np
    rng = np.random.RandomState(31)
    vocab = [f"w{j}" for j in range(5000)]
    docs = {i: " ".join(rng.choice(vocab, 30)) for i in ids}
    # batch near-copy of a base doc (perturb one word far from the edge)
    nb, base_t = batch_ids[0], base_ids[0]
    w = docs[base_t].split(); w[15] = "zzz"
    docs[nb] = " ".join(w)
    # batch-internal near-pair
    p1, p2 = batch_ids[1], batch_ids[2]
    w = docs[p1].split(); w[20] = "qqq"
    docs[p2] = " ".join(w)
    # base-base near-pair — must NOT appear in the output
    b1, b2 = base_ids[1], base_ids[2]
    w = docs[b1].split(); w[10] = "xxx"
    docs[b2] = " ".join(w)

    d = tmp_path / "sfmh"
    d.mkdir()
    spark.createDataFrame(
        [(int(i), t, "en", "web") for i, t in docs.items()],
        "doc_id long, text string, lang string, source string",
    ).write.parquet(str(d / "documents.parquet"))

    rows = QUERIES["dedup_minhash_incremental"](spark, str(d)).collect()
    got = sorted((r.doc_new, r.doc_match, r.est_jaccard) for r in rows)
    pairs = {(a, b) for a, b, _ in got}
    assert all(is_batch(a) for a, _, _ in got)  # doc_new is always batch
    assert (nb, base_t) in pairs                # batch-onto-base found
    assert (max(p1, p2), min(p1, p2)) in pairs  # batch-internal, oriented
    assert not any({a, b} == {b1, b2} for a, b in pairs)  # base-base absent

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    want = sorted(map(tuple, con.execute(
        ORACLES["dedup_minhash_incremental"]).fetchall()))
    con.close()
    assert got == want


def test_semdedup_planted_near_duplicates_collapse(spark, tmp_path):
    """Behavior pin on planted data: injected near-copies (cos ~ 0.9998)
    collapse to one kept vector with dup_of pointing at it; the base
    corpus (random gaussians, pairwise cos << 1 - eps whp) survives."""
    import numpy as np

    from etl_backend_spark.registry import QUERIES

    rng = np.random.RandomState(7)
    base = rng.randn(300, 64)
    vecs, pairs = [], []
    for i, v in enumerate(base):
        vecs.append((i, v))
    for p in range(10):  # near-dup twins of the first 10 vectors
        twin_id = 1000 + p
        noise = rng.randn(64) * 0.01
        vecs.append((twin_id, base[p] + noise))
        pairs.append((p, twin_id))
    d = tmp_path / "sfplanted"
    d.mkdir()
    spark.createDataFrame(
        [(int(i), [float(x) for x in v], "x") for i, v in vecs],
        "vec_id long, embedding array<float>, label string",
    ).write.parquet(str(d / "embeddings.parquet"))

    out = {r.vec_id: r for r in QUERIES["semdedup_kmeans"](spark, str(d)).collect()}
    assert len(out) == 310
    for a, b in pairs:
        ra, rb = out[a], out[b]
        assert ra.keep != rb.keep, (a, b)  # exactly one survives
        dup, kept = (ra, rb) if rb.keep else (rb, ra)
        assert dup.dup_of == kept.vec_id
    # the non-planted tail is (whp) mutually distant: everything kept
    others = [r for i, r in out.items() if i >= 10 and i < 1000]
    assert all(r.keep for r in others)


def test_embedding_pca_matches_single_pass_numpy_twin(spark):
    """Projection pin: a single-pass numpy PCA (full-data covariance, same
    eigh, same sign rule) must match the distributed partial-moments path
    to 1e-9 — catches wrong centering, partial-combine, or sign drift."""
    import numpy as np

    from etl_backend_spark.registry import QUERIES
    from etl_backend_spark.sources.catalog import Catalog

    sf = "/root/testdata/sf0.01"
    got = {
        r.vec_id: np.array(r.proj)
        for r in QUERIES["embedding_pca"](spark, sf).collect()
    }

    rows = sorted(
        (r.vec_id, np.array(r.embedding, dtype=np.float64))
        for r in Catalog(spark, sf).table("embeddings")
        .select("vec_id", "embedding").collect()
    )
    mat = np.stack([v for _, v in rows])
    mean = mat.mean(axis=0)
    cov = np.cov(mat, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    comp = evecs[:, ::-1][:, :8].T
    flip = np.sign(comp[np.arange(8), np.abs(comp).argmax(axis=1)])
    comp = comp * flip[:, None]
    expected = (mat - mean) @ comp.T

    assert len(got) == len(rows)
    for (vid, _), exp in zip(rows, expected):
        np.testing.assert_allclose(got[vid], exp, rtol=0, atol=1e-9)


def test_embedding_pca_components_ordered_by_variance(spark):
    import numpy as np

    from etl_backend_spark.registry import QUERIES

    proj = np.stack([
        np.array(r.proj)
        for r in QUERIES["embedding_pca"](spark, "/root/testdata/sf0.01").collect()
    ])
    var = proj.var(axis=0)
    assert all(var[i] >= var[i + 1] - 1e-12 for i in range(len(var) - 1))


def test_dsir_importance_matches_independent_python_twin(spark):
    """Full-output pin: re-derive the DSIR rule from the paper with plain
    Python (hashlib md5, Counter, explicit half-away-from-zero rounding —
    Python's round() is banker's and would NOT match) and require every
    (doc_id, score_scaled, sel_range, selected) row to agree. The SQL
    oracle mirrors the engine formula; this twin breaks the shared-spec
    symmetry (independent tokenizer loop, independent ranking loop)."""
    import hashlib
    import math
    import re
    from collections import Counter

    from etl_backend_spark.registry import QUERIES
    from etl_backend_spark.sources.catalog import Catalog

    sf = "/root/testdata/sf0.01"
    got = {
        r.doc_id: (r.score_scaled, r.sel_range, r.selected)
        for r in QUERIES["dsir_importance"](spark, sf).collect()
    }

    docs = [
        (r.doc_id, r.text, r.lang)
        for r in Catalog(spark, sf).table("documents")
        .select("doc_id", "text", "lang").collect()
    ]

    def ngrams(text):
        w = re.split(r"\s+", text.strip().lower())
        return w + [f"{a} {b}" for a, b in zip(w, w[1:])]

    def bucket(ng):
        return hashlib.md5(ng.encode()).hexdigest()[:3]

    t_cnt, r_cnt = Counter(), Counter()
    per_doc = {}
    for doc_id, text, lang in docs:
        c = Counter(bucket(ng) for ng in ngrams(text))
        (t_cnt if lang == "en" else r_cnt).update(c)
        if lang != "en":
            per_doc[doc_id] = c
    tt, rt = sum(t_cnt.values()), sum(r_cnt.values())

    def half_away(x):
        return int(math.floor(abs(x) + 0.5)) * (1 if x >= 0 else -1)

    lr = {
        b: half_away(1e6 * (math.log((t_cnt[b] + 0.5) / (tt + 2048.0))
                            - math.log((rb + 0.5) / (rt + 2048.0))))
        for b, rb in r_cnt.items()
    }
    scores = {
        doc_id: sum(c * lr[b] for b, c in cnt.items())
        for doc_id, cnt in per_doc.items()
    }

    expected = {}
    by_range = {}
    for doc_id, s in scores.items():
        rng = hashlib.md5(f"dsir:{doc_id}".encode()).hexdigest()[:1]
        by_range.setdefault(rng, []).append((doc_id, s))
    for rng, members in by_range.items():
        members.sort(key=lambda t: (-t[1], t[0]))
        k = math.ceil(len(members) / 4.0)
        for rank, (doc_id, s) in enumerate(members, start=1):
            expected[doc_id] = (s, rng, rank <= k)

    assert got == expected and len(got) > 0


def test_dsir_importance_planted_target_alike_wins(spark, tmp_path):
    """Behavior pin: a raw-pool doc written in the target vocabulary must
    outscore raw-pool gibberish and be selected."""
    rows = []
    target_vocab = ("the quick brown fox jumps over the lazy dog "
                    "and runs through the quiet green field")
    for i in range(20):  # target corpus defines p_target
        rows.append((i, target_vocab, "en", "srcT", len(target_vocab)))
    # raw pool: one target-alike + 19 disjoint-vocab docs
    rows.append((100, "the quick brown fox and the lazy dog", "de", "srcR", 37))
    for i in range(19):
        junk = " ".join(f"zz{i}w{j}" for j in range(12))
        rows.append((101 + i, junk, "de", "srcR", len(junk)))
    d = tmp_path / "sfdsir"
    d.mkdir()
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(d / "documents.parquet"))

    from etl_backend_spark.registry import QUERIES

    out = {r.doc_id: r for r in QUERIES["dsir_importance"](spark, str(d)).collect()}
    assert set(out) == set(range(100, 120))  # only the raw pool is scored
    assert out[100].score_scaled == max(r.score_scaled for r in out.values())
    assert out[100].selected


def test_dsir_importance_plan_is_jvm_only_with_broadcast_model(spark):
    """Scale-shape audit: no Python workers anywhere in the plan, and the
    <=4096-row bucket model reaches the doc-score join as a broadcast."""
    from etl_backend_spark.registry import QUERIES

    df = QUERIES["dsir_importance"](spark, "/root/testdata/sf0.01")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_source_mix_temperature_upweights_rare_sources(spark, tmp_path):
    """alpha=1/2 mixing must (a) keep rare sources at a HIGHER rate than
    dominant ones (the whole point of temperature sampling; checked on a
    deliberately skewed corpus — the sf0.001 testdata mix is uniform),
    (b) respect per-source thresholds exactly (every kept doc's md5 value
    is under its source's threshold), and (c) be deterministic across
    runs."""
    from etl_backend_spark.registry import QUERIES

    from pyspark.sql import functions as FF

    rows = (
        [(i, "t", "en", "common-crawl", 10) for i in range(900)]
        + [(i + 900, "t", "en", "wiki", 10) for i in range(90)]
        + [(i + 990, "t", "en", "books", 10) for i in range(10)]
    )
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    base = {"common-crawl": 900, "wiki": 90, "books": 10}

    out = QUERIES["source_mix_temperature"](spark, sf_dir)
    kept = {r["source"]: r["n"] for r in
            out.groupBy("source").agg(FF.count("*").alias("n")).collect()}
    rate = lambda s: kept.get(s, 0) / base[s]
    assert rate("books") >= rate("wiki") >= rate("common-crawl")
    assert rate("books") > rate("common-crawl")
    # thresholds honored exactly
    v = FF.conv(FF.substring(
        FF.md5(FF.concat(FF.lit("mix:"), FF.col("doc_id").cast("string"))),
        1, 8), 16, 10).cast("long")
    assert out.filter(v >= FF.col("mix_threshold")).count() == 0
    # determinism
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, QUERIES["source_mix_temperature"](spark, sf_dir).collect()))
    assert a == b and len(a) > 0


def test_unigram_tokenizer_semantics_and_apply(spark):
    """Unigram-LM tokenizer pins: (a) hand-checkable toy fit — frequent
    shared subwords ('est') survive as multi-char pieces and every
    Viterbi segmentation reconstructs its word exactly; (b) unknown
    characters segment as themselves (coverage never fails); (c) the
    fit is deterministic across runs; (d) the distributed memoized
    apply equals direct per-word Viterbi counts on real docs."""
    from etl_backend_spark.functions import unigram
    from etl_backend_spark.registry import QUERIES
    from tests.conftest import SF_DIR

    freqs = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    logp = unigram.train_unigram(freqs, vocab_cap=20, n_iters=2)
    assert "est" in logp  # the shared suffix must survive the prune
    for w, _ in freqs:
        seg = unigram.viterbi(w, logp)
        assert "".join(seg) == w
        assert all(p in logp for p in seg)
    assert unigram.viterbi("newest", logp)[-1] == "est"
    assert unigram.viterbi("zzz", logp) == ["z", "z", "z"]
    logp2 = unigram.train_unigram(freqs, vocab_cap=20, n_iters=2)
    assert logp == logp2

    out = {r.doc_id: (r.n_words, r.n_pieces)
           for r in QUERIES["tokenize_unigram"](spark, SF_DIR).collect()}
    assert len(out) == 500
    # replay a sample locally with the SAME cached vocab
    from etl_backend_spark.registry.pipeline import _UNIGRAM_CACHE
    from etl_backend_spark.sources.cache import file_fingerprint

    vocab = _UNIGRAM_CACHE[file_fingerprint(f"{SF_DIR}/documents.parquet")]
    docs = {r.doc_id: r.text for r in
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .filter(F.col("doc_id") < 20).collect()}
    for did, text in docs.items():
        ws = [w for w in text.strip().lower().split() if w]
        n_pieces = sum(len(unigram.viterbi(w, vocab)) for w in ws)
        assert out[did] == (len(ws), n_pieces), did


def test_incremental_index_appends_without_rewriting_base_files(spark, tmp_path):
    """Incremental index maintenance contract: appending a batch's
    postings (same partitionBy write, mode=append) leaves every base
    file byte-identical in place and only ADDS files — O(batch) cost —
    and the maintained index serves searches identically to a
    from-scratch rebuild over the union corpus."""
    import os

    from etl_backend_spark.registry.pipeline import boolean_postings

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "idx")
    base = boolean_postings(docs.filter(F.col("doc_id") % 10 != 0))
    base.write.mode("overwrite").partitionBy("tb").parquet(out)

    def snapshot():
        files = {}
        for root, _dirs, names in os.walk(out):
            for n in names:
                if n.endswith(".parquet"):
                    p = os.path.join(root, n)
                    st = os.stat(p)
                    files[p] = (st.st_size, st.st_mtime_ns)
        return files

    before = snapshot()
    batch = boolean_postings(docs.filter(F.col("doc_id") % 10 == 0))
    batch.write.mode("append").partitionBy("tb").parquet(out)
    after = snapshot()
    # every base file survives untouched; new files appeared
    for p, meta in before.items():
        assert after.get(p) == meta, p
    assert len(after) > len(before)
    # the maintained index equals a from-scratch rebuild
    merged = spark.read.parquet(out).select("term", "doc_id")
    full = boolean_postings(docs).select("term", "doc_id")
    assert merged.exceptAll(full).count() == 0
    assert full.exceptAll(merged).count() == 0


def test_ivfpq_incremental_append_is_complete_and_leaves_base_files(spark, tmp_path):
    """Vector-index maintenance contract (the text-index twin): (a) the
    batch append rewrites NO base code file (size+mtime snapshot) and
    only adds files; (b) the maintained codes table is IDENTICAL to a
    one-shot encode of the union corpus under the same frozen
    centroids/codebooks — append completeness at the code level; (c) a
    query over the maintained index returns full top-k rows."""
    import os

    import numpy as np

    from etl_backend_spark.ann import index as ann_index

    d = str(tmp_path / "ivfpq")
    sf = "/root/testdata/sf0.001"
    manifest = ann_index.build_ivfpq_index(
        spark, sf, d, id_filter=F.col("vec_id") % 10 != 0
    )
    codes_dir = os.path.join(d, "codes")

    def snapshot():
        files = {}
        for root, _dirs, names in os.walk(codes_dir):
            for n in names:
                if n.endswith(".parquet"):
                    p = os.path.join(root, n)
                    st = os.stat(p)
                    files[p] = (st.st_size, st.st_mtime_ns)
        return files

    before = snapshot()
    ann_index.append_ivfpq_batch(spark, sf, d, F.col("vec_id") % 10 == 0)
    after = snapshot()
    for p, meta in before.items():
        assert after.get(p) == meta, p
    assert len(after) > len(before)

    cents = np.array(manifest["cents"])
    books = np.array(manifest["books"])
    merged = {
        (int(r.vec_id), int(r.cell), tuple(r.codes))
        for r in spark.read.parquet(codes_dir).collect()
    }
    oneshot = {
        (int(r.vec_id), int(r.cell), tuple(r.codes))
        for r in ann_index._corpus(spark, sf).select("vec_id", "nv")
        .mapInPandas(ann_index._encode_with(cents, books),
                     schema="vec_id long, cell int, codes array<int>")
        .collect()
    }
    assert merged == oneshot and len(merged) > 0

    res = ann_index.query_ivfpq_index(spark, sf, d)
    counts = {r.q_id: r.n for r in
              res.groupBy("q_id").agg(F.count("*").alias("n")).collect()}
    assert len(counts) == 5 and all(v == 10 for v in counts.values())


def test_curriculum_order_bands_are_contiguous_and_positions_exact(spark):
    """Curriculum contract: positions are exactly 1..N with no gaps, and
    every document of a better band precedes every document of a worse
    one (the whole point of the schedule)."""
    from etl_backend_spark.registry import QUERIES
    from tests.conftest import SF_DIR

    rows = QUERIES["curriculum_order"](spark, SF_DIR).collect()
    assert sorted(r.curriculum_pos for r in rows) == list(range(1, len(rows) + 1))
    by_pos = sorted(rows, key=lambda r: r.curriculum_pos)
    bands = [r.band for r in by_pos]
    assert bands == sorted(bands)
    assert len(set(bands)) > 1  # the schedule actually has multiple bands


def test_compression_ratio_exact_vs_cpython(spark):
    """quality_compression_ratio must equal a direct CPython zlib call
    byte-for-byte (same level 6): the signal is deterministic, so exact
    equality — not a tolerance — is the pin."""
    import zlib

    from etl_backend_spark.registry import QUERIES
    from tests.conftest import SF_DIR

    got = {r["doc_id"]: r for r in
           QUERIES["quality_compression_ratio"](spark, SF_DIR).collect()}
    import duckdb
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    con.close()
    assert len(got) == len(rows)
    for doc_id, text in rows[:500]:
        raw = text.encode("utf-8")
        n_comp = len(zlib.compress(raw, 6))
        r = got[doc_id]
        assert r["n_raw"] == len(raw)
        assert r["n_comp"] == n_comp
        assert r["ratio_pm"] == (n_comp * 1000) // max(len(raw), 1)
        assert r["keep"] == (200 <= r["ratio_pm"] <= 900)


def test_graph_reachability_matches_python_bfs_two_decades(spark):
    """The recursive-CTE BFS must equal a plain-dict BFS (independent
    re-derivation: adjacency dict + frontier sets, no SQL) on the same
    edge list at two decades — exact (seed, node, hops) equality, and
    the released edge checkpoint must be discoverable through the
    temp-view indirection (the analyzed-plan walk in
    release_plan_checkpoints)."""
    import duckdb

    from etl_backend_spark.operators.windows import release_plan_checkpoints
    from etl_backend_spark.registry import QUERIES

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        df = QUERIES["graph_reachability"](spark, sf)
        got = {(r.seed, r.partkey): r.hops for r in df.collect()}
        released = release_plan_checkpoints(df)
        assert released >= 1, "edge checkpoint not found via analyzed plan"

        con = duckdb.connect()
        edges = con.execute(f"""
            WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                        FROM read_parquet('{sf}/lineitem.parquet'))
            SELECT DISTINCT a.pk, b.pk FROM li a JOIN li b
            ON a.ok = b.ok AND a.pk <> b.pk
        """).fetchall()
        con.close()
        adj: dict[int, set[int]] = {}
        for s, d in edges:
            adj.setdefault(s, set()).add(d)
        seeds = sorted({s for s, _ in edges})[:4]
        want = {}
        for seed in seeds:
            dist = {seed: 0}
            frontier = {seed}
            for depth in (1, 2, 3):
                frontier = {d for n in frontier for d in adj.get(n, ())}
                for n in frontier:
                    dist.setdefault(n, depth)
            want.update({(seed, n): h for n, h in dist.items()})
        assert got == want


def test_search_rerank_mmr_matches_python_reference(spark):
    """The unrolled MMR stages must reproduce a straightforward greedy
    Python MMR (lambda=0.5, rounded-6 scores, id tiebreaks) exactly —
    selection order, ids, and scores."""
    import numpy as np

    from etl_backend_spark.registry import QUERIES
    from etl_backend_spark.sources.catalog import Catalog

    sf = "/root/testdata/sf0.001"
    pdf = (Catalog(spark, sf).table("embeddings")
           .select("vec_id", "embedding").toPandas())
    ids = pdf["vec_id"].to_numpy()
    M = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    idx = {int(v): i for i, v in enumerate(ids)}

    def pair(a, b):
        # the engine/oracle sequential fold, NOT a BLAS matmul on
        # pre-normalized vectors — matmul's reordered accumulation is
        # ~ulps off and can flip a round(.,6) boundary (r8 code review)
        va, vb = M[idx[a]], M[idx[b]]
        dot = na = nb = 0.0
        for j in range(len(va)):
            dot = dot + va[j] * vb[j]
            na = na + va[j] * va[j]
            nb = nb + vb[j] * vb[j]
        return round(dot / (math.sqrt(na) * math.sqrt(nb)), 6)

    cosq = {int(v): pair(int(v), 0) for v in ids if v != 0}
    cand = sorted(cosq, key=lambda v: (-cosq[v], v))[:20]

    sel = [max(cand, key=lambda v: (cosq[v], -v))]
    expected = [(1, sel[0], cosq[sel[0]], cosq[sel[0]])]
    for rnk in range(2, 6):
        rem = [v for v in cand if v not in sel]
        scores = {v: 0.5 * cosq[v] - 0.5 * max(pair(v, s) for s in sel)
                  for v in rem}
        pick = max(rem, key=lambda v: (scores[v], -v))
        expected.append((rnk, pick, cosq[pick], scores[pick]))
        sel.append(pick)

    got = sorted(
        (r.rnk, r.vec_id, r.cosq, r.mmr)
        for r in QUERIES["search_rerank_mmr"](spark, sf).collect()
    )
    assert got == sorted(expected)


def _mh_sig_np(text, k=3):
    """Pure-python replica of hashing.minhash_sig_py's signature chain —
    used by planted-construction searches so a test can verify, before
    writing the corpus, that its planted texts produce the band
    collisions and estimate thresholds the assertions rely on."""
    import hashlib
    import re

    import numpy as np

    from etl_backend_spark.functions.hashing import (MINHASH_A, MINHASH_B,
                                                     MINHASH_MOD)

    words = re.split(r"\s+", text.strip().lower())
    m = max(len(words) - (k - 1), 1)
    shingles = set(" ".join(words[i:i + k]) for i in range(m))
    base = np.array(
        [int(hashlib.md5(s.encode()).hexdigest()[:8], 16) for s in shingles],
        dtype=np.uint64,
    )
    a = np.array(MINHASH_A, dtype=np.uint64)[:, None]
    b = np.array(MINHASH_B, dtype=np.uint64)[:, None]
    return ((a * base[None, :] + b) % MINHASH_MOD).min(axis=1)


def _mh_found(sx, sy, threshold=0.5, bands=8, rows=2):
    """Would the LSH pipeline surface this pair: at least one full-band
    collision AND estimated Jaccard >= threshold."""
    est = float((sx == sy).mean())
    collide = any(
        all(sx[b * rows + r] == sy[b * rows + r] for r in range(rows))
        for b in range(bands)
    )
    return collide and est >= threshold


def test_dedup_clusters_incremental_merges_base_clusters(spark, tmp_path):
    """r12 VERDICT #5 planted case: a batch doc that near-dups one
    member of base cluster A and one member of base cluster B MERGES the
    two persisted clusters — the ingest emits the batch doc labeled with
    the merged id plus remap rows for BOTH touched base cluster ids,
    all other batch docs keep their own ids, and the DuckDB replay
    (batch pairs recomputed in SQL against the persisted sig artifact,
    base labels from the persisted labels artifact, recursive-CTE label
    merge) matches the engine row-for-row."""
    import hashlib

    import duckdb
    import numpy as np

    from etl_backend_spark.registry import ORACLES, QUERIES

    def is_batch(i):
        h = hashlib.md5(f"clinc:{i}".encode()).hexdigest()[:8]
        return int(h, 16) % 100 >= 90

    ids = list(range(200))
    batch_ids = sorted(i for i in ids if is_batch(i))
    base_ids = sorted(i for i in ids if not is_batch(i))
    assert len(batch_ids) >= 4 and len(base_ids) >= 8

    # search for a planted (A-text, B-text, bridge-text) triple where
    # the LSH pipeline finds bridge~A and bridge~B but NOT A~B: B
    # replaces 6 spread-out word positions of A (true Jaccard ~0.2),
    # the bridge replaces only the first 3 (true Jaccard ~0.5 to each
    # side) — the 16-slot estimate is then near-threshold, so a short
    # deterministic search picks a seed where both planted conditions
    # hold exactly
    pos = [2, 7, 12, 17, 22, 27]
    planted = None
    for seed in range(300):
        rng = np.random.RandomState(10_000 + seed)
        words_a = [f"pa{seed}w{j}" for j in rng.randint(0, 10_000, 30)]
        repl = [f"pb{seed}r{j}" for j in range(6)]
        wb = list(words_a)
        wx = list(words_a)
        for i, p in enumerate(pos):
            wb[p] = repl[i]
            if i < 3:
                wx[p] = repl[i]
        ta, tb, tx = " ".join(words_a), " ".join(wb), " ".join(wx)
        sa, sb, sx = _mh_sig_np(ta), _mh_sig_np(tb), _mh_sig_np(tx)
        if (_mh_found(sx, sa) and _mh_found(sx, sb)
                and not _mh_found(sa, sb)):
            planted = (ta, tb, tx)
            break
    assert planted is not None, "no planted seed found in 300 tries"
    ta, tb, tx = planted

    rng = np.random.RandomState(77)
    vocab = [f"w{j}" for j in range(8000)]
    docs = {i: " ".join(rng.choice(vocab, 30)) for i in ids}
    a1, a2, b1, b2 = base_ids[0], base_ids[1], base_ids[2], base_ids[3]
    x = batch_ids[0]
    docs[a1] = docs[a2] = ta   # base cluster A (identical pair)
    docs[b1] = docs[b2] = tb   # base cluster B
    docs[x] = tx               # batch bridge

    d = tmp_path / "sfcl"
    d.mkdir()
    spark.createDataFrame(
        [(int(i), t, "en", "web") for i, t in docs.items()],
        "doc_id long, text string, lang string, source string",
    ).write.parquet(str(d / "documents.parquet"))

    rows = QUERIES["dedup_clusters_incremental"](spark, str(d)).collect()
    got = {(r.id, r.kind): r.cluster_id for r in rows}

    merged = min(a1, b1, x)  # base cluster ids are min members; a1 < b1
    assert got[(x, "batch_doc")] == merged
    assert got[(a1, "base_cluster")] == merged  # cluster A remapped
    assert got[(b1, "base_cluster")] == merged  # cluster B remapped
    # non-min base members never appear as cluster nodes
    assert (a2, "base_cluster") not in got and (b2, "base_cluster") not in got
    # every batch doc present; non-planted ones keep their own id
    for i in batch_ids:
        assert (i, "batch_doc") in got
        if i != x:
            assert got[(i, "batch_doc")] == i

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    want = sorted(map(tuple, con.execute(
        ORACLES["dedup_clusters_incremental"]).fetchall()))
    con.close()
    assert sorted((r.id, r.kind, r.cluster_id) for r in rows) == want


def test_clusters_incremental_skewed_mega_cluster(spark, tmp_path):
    """r13 VERDICT #4: planted SKEW — one label owns ~half the base (a
    mega-cluster of identical docs), and a batch doc bridges into it.
    The stress points: candidate generation fans one batch doc out to
    |mega| pairs, and the contraction join hits one hot label. Pins:
    (a) the bridge doc takes the mega label and every untouched batch
    doc keeps its own id; (b) the contracted graph stays tiny — the
    |mega| pair endpoints contract to ONE label node, so the hot label
    costs one edge, not |mega| propagation work; (c) the ingest's pair
    plan still streams the base band index map-side (BroadcastHashJoin,
    no base shuffle); (d) the DuckDB recursive-CTE replay matches
    row-for-row under skew."""
    import hashlib
    import os

    import duckdb
    import numpy as np

    from etl_backend_spark.ann import index as ann_index
    from etl_backend_spark.registry import ORACLES, QUERIES
    from etl_backend_spark.registry import llm as L

    def is_batch(i):
        h = hashlib.md5(f"clinc:{i}".encode()).hexdigest()[:8]
        return int(h, 16) % 100 >= 90

    ids = list(range(400))
    batch_ids = sorted(i for i in ids if is_batch(i))
    base_ids = sorted(i for i in ids if not is_batch(i))
    mega = base_ids[:len(base_ids) // 2]   # ~half the base, one cluster
    assert len(mega) >= 150

    rng = np.random.RandomState(99)
    vocab = [f"w{j}" for j in range(8000)]
    docs = {i: " ".join(rng.choice(vocab, 30)) for i in ids}
    mega_text = " ".join(rng.choice(vocab, 30))
    for i in mega:
        docs[i] = mega_text                # identical => pairwise est 1.0
    bridge = batch_ids[0]
    w = mega_text.split()
    w[12] = "bridgetoken"
    docs[bridge] = " ".join(w)             # near-dups EVERY mega member

    d = tmp_path / "sfskew"
    d.mkdir()
    spark.createDataFrame(
        [(int(i), t, "en", "web") for i, t in docs.items()],
        "doc_id long, text string, lang string, source string",
    ).write.parquet(str(d / "documents.parquet"))

    rows = QUERIES["dedup_clusters_incremental"](spark, str(d)).collect()
    got = {(r.id, r.kind): r.cluster_id for r in rows}
    mega_label = min(mega)
    assert got[(bridge, "batch_doc")] == mega_label       # (a) bridged
    assert got[(mega_label, "base_cluster")] == mega_label
    for i in batch_ids:
        if i != bridge:
            assert got[(i, "batch_doc")] == i
    # (b) hot label contracted to ONE node: the only base_cluster rows
    # are labels touched by batch pairs — the mega label, not |mega| rows
    base_rows = [k for k in got if k[1] == "base_cluster"]
    assert len(base_rows) <= 2

    # (c) the ingest pair plan under skew: base band index streams
    # map-side through the broadcast gate, never shuffled
    art = ann_index.index_dir_for(
        "clinc-incr", str(d), tables=("documents",))
    pairs = L.minhash_incr_pairs(
        spark, art, L.minhash_batch_sig_path(art))
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert pairs.filter(F.col("doc_new") == bridge).count() == len(mega)

    # (d) replay under skew
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    want = sorted(map(tuple, con.execute(
        ORACLES["dedup_clusters_incremental"]).fetchall()))
    con.close()
    assert sorted((r.id, r.kind, r.cluster_id) for r in rows) == want


def test_dedup_incremental_persisted_index_planted_and_replay(
        spark, tmp_path):
    """r12 VERDICT #2: exact dedup's ingest runs against the PERSISTED
    sha256 index. Planted pins: a batch doc duplicating a BASE doc is
    dropped; a within-batch duplicate pair keeps min doc_id only; every
    other batch doc survives with its hash — computed independently
    with hashlib. The DuckDB oracle (batch hashes recomputed in SQL,
    base hashes read from the persisted artifact) matches row-for-row,
    and the artifact exists with one row per base doc."""
    import hashlib
    import os

    import duckdb
    import numpy as np

    from etl_backend_spark.ann.index import ANN_ROOT
    from etl_backend_spark.registry import ORACLES, QUERIES

    def is_batch(i):
        h = hashlib.md5(f"split:{i}".encode()).hexdigest()[:8]
        return int(h, 16) % 100 >= 90

    ids = list(range(300))
    batch_ids = sorted(i for i in ids if is_batch(i))
    base_ids = sorted(i for i in ids if not is_batch(i))
    assert len(batch_ids) >= 4

    rng = np.random.RandomState(5)
    vocab = [f"w{j}" for j in range(8000)]
    docs = {i: " ".join(rng.choice(vocab, 12)) for i in ids}
    dup_on_base, base_t = batch_ids[0], base_ids[0]
    docs[dup_on_base] = docs[base_t]           # dropped: hash in base
    w1, w2 = batch_ids[1], batch_ids[2]
    docs[w2] = docs[w1]                        # within-batch dup pair

    d = tmp_path / "sfex"
    d.mkdir()
    spark.createDataFrame(
        [(int(i), t, "en", "web") for i, t in docs.items()],
        "doc_id long, text string, lang string, source string",
    ).write.parquet(str(d / "documents.parquet"))

    rows = QUERIES["dedup_incremental"](spark, str(d)).collect()
    got = sorted((r.doc_id, r.text_hash) for r in rows)

    expected = {}
    base_hashes = {hashlib.sha256(docs[i].encode()).hexdigest()
                   for i in base_ids}
    for i in batch_ids:
        h = hashlib.sha256(docs[i].encode()).hexdigest()
        if h in base_hashes:
            continue
        expected[h] = min(expected.get(h, i), i)
    assert got == sorted((i, h) for h, i in expected.items())
    assert dup_on_base not in {i for i, _ in got}
    assert w2 not in {i for i, _ in got} and w1 in {i for i, _ in got}

    # the persisted index: one row per base doc
    art = os.path.realpath(os.path.join(ANN_ROOT, "exact-incr-current"))
    import pyarrow.parquet as pq
    from etl_backend_spark.sources.catalog import parquet_part_files
    n_idx = sum(pq.ParquetFile(f).metadata.num_rows
                for f in parquet_part_files(os.path.join(art, "hashes")))
    assert n_idx == len(base_ids)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    want = sorted(map(tuple, con.execute(
        ORACLES["dedup_incremental"]).fetchall()))
    con.close()
    assert got == want


def test_incremental_ingest_shuffle_fallback_plans(spark, tmp_path,
                                                   monkeypatch):
    """r12 VERDICT #6: the measured broadcast gates must DEGRADE to the
    shuffle plan, not an oversized broadcast — exercised here above the
    gate (thresholds forced to 0). With auto-broadcast disabled so only
    EXPLICIT hints can produce broadcast joins: the gated path's plan
    contains broadcast joins, the fallback's contains none, and both
    return identical rows. Also pins the r13 ADVICE fix: the fallback
    never writes the .cand scratch dir."""
    import os
    import shutil

    import numpy as np

    from etl_backend_spark.ann import index as ann_index
    from etl_backend_spark.registry import QUERIES
    from etl_backend_spark.registry import llm as L

    rng = np.random.RandomState(13)
    vocab = [f"w{j}" for j in range(5000)]
    ids = list(range(300))
    docs = {i: " ".join(rng.choice(vocab, 30)) for i in ids}
    d = tmp_path / "sffb"
    d.mkdir()
    spark.createDataFrame(
        [(int(i), t, "en", "web") for i, t in docs.items()],
        "doc_id long, text string, lang string, source string",
    ).write.parquet(str(d / "documents.parquet"))

    # builds (gated path): minhash + exact artifacts
    mh_rows = sorted(map(tuple,
                         QUERIES["dedup_minhash_incremental"](
                             spark, str(d)).collect()))
    ex_rows = sorted(map(tuple,
                         QUERIES["dedup_incremental"](
                             spark, str(d)).collect()))
    mh_art = ann_index.index_dir_for(
        "mhlsh-incr", str(d), tables=("documents",))
    ex_art = ann_index.index_dir_for(
        "exact-incr", str(d), tables=("documents",))

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        def plan(df):
            return df._jdf.queryExecution().executedPlan().toString()

        # gated (broadcast) plans carry explicit hints
        mh_b = L.minhash_incr_pairs(
            spark, mh_art, L.minhash_batch_sig_path(mh_art))
        ex_b = L.exact_incr_new(
            spark, ex_art, os.path.join(ex_art, "batch"))
        assert "BroadcastHashJoin" in plan(mh_b)
        assert "BroadcastHashJoin" in plan(ex_b)

        # force the fallback: thresholds to 0 — shuffle-only plans
        monkeypatch.setattr(L, "MINHASH_INCR_BCAST_DOCS", 0)
        monkeypatch.setattr(L, "EXACT_INCR_BCAST_DOCS", 0)
        mh_f = L.minhash_incr_pairs(
            spark, mh_art, L.minhash_batch_sig_path(mh_art))
        ex_f = L.exact_incr_new(
            spark, ex_art, os.path.join(ex_art, "batch"))
        assert "BroadcastHashJoin" not in plan(mh_f)
        assert "BroadcastHashJoin" not in plan(ex_f)
        assert sorted(map(tuple, mh_f.collect())) == mh_rows
        assert sorted(map(tuple, ex_f.collect())) == ex_rows
        # r15: the candidate set is a localCheckpoint, never a scratch
        # parquet — NO ingest path writes anything into the artifact
        cand_scratch = L.minhash_batch_sig_path(mh_art).rstrip("/") + ".cand"
        assert not os.path.exists(cand_scratch)
        assert not os.path.exists(os.path.join(mh_art, "sig_batch.cand"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_sim_recall_report_planted_structure(spark, tmp_path):
    """r13 VERDICT #6: the recall readout pinned on a PLANTED-STRUCTURE
    corpus, not random gaussians — 5 tight, well-separated clusters
    whose members share the first-8-dim sign pattern (so sign-LSH
    buckets align with the structure) with one query (vec_id 0..4) per
    cluster. Every method's candidate machinery can find the in-cluster
    true top-10 here, so the floors are tight; a regression in any
    path's pruning/probing drops its recall row below them. Also pins
    the report's shape and that mean >= min per row."""
    import numpy as np

    from etl_backend_spark.registry import QUERIES

    rng = np.random.RandomState(11)
    n_clusters, per = 5, 24
    # distinct ±1 sign patterns on all 16 dims, scaled to 3.0; noise
    # sigma 0.05 keeps every member far inside its orthant
    pats = [[1, -1, 1, 1, -1, -1, 1, -1], [-1, 1, 1, -1, 1, -1, -1, 1],
            [1, 1, -1, -1, 1, 1, -1, -1], [-1, -1, -1, 1, 1, 1, 1, -1],
            [1, -1, -1, -1, -1, 1, 1, 1]]
    centers = [np.array(p + p[::-1], dtype="float64") * 3.0 for p in pats]
    rows = []
    # vec_ids 0..4 are the family's query sample — one per cluster
    for c in range(n_clusters):
        rows.append((c, centers[c] + rng.normal(0, 0.05, 16)))
    nxt = n_clusters
    for c in range(n_clusters):
        for _ in range(per - 1):
            rows.append((nxt, centers[c] + rng.normal(0, 0.05, 16)))
            nxt += 1
    sf = tmp_path / "planted"
    sf.mkdir()
    spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    ).coalesce(1).write.parquet(str(sf / "embeddings.parquet"))

    rep = {r.method: r for r in
           QUERIES["sim_recall_report"](spark, str(sf)).collect()}
    assert set(rep) == {"lsh", "ivf", "pq", "ivfpq"}
    for r in rep.values():
        assert r.n_q == 5
        assert 0.0 <= r.min_recall <= r.mean_recall <= 1.0
    # exact-rerank candidate paths on planted structure: near-perfect
    assert rep["lsh"].mean_recall >= 0.9
    assert rep["ivf"].mean_recall >= 0.9
    # quantized scorers: ADC ranking noise tolerated, structure must win
    assert rep["ivfpq"].mean_recall >= 0.7
    assert rep["pq"].mean_recall >= 0.5


def test_minhash_band_index_kb_pruning(spark, tmp_path):
    """r13 VERDICT #1: the persisted band index is PARTITIONED by the
    md5 band-key bucket (kb), and a small-batch ingest PRUNES to the
    directories its band keys touch instead of scanning the whole
    index — the text_index discipline applied to the minhash family.
    Pins: (a) the artifact is laid out as kb=N hive dirs; (b) a tiny
    batch's ingest plan carries a kb partition filter and reads
    strictly fewer than all buckets; (c) pruning changes NO rows (tiny
    result == full-batch result restricted to the tiny docs); (d) the
    ingest leaves every base index file byte-identical."""
    import os

    import numpy as np

    from etl_backend_spark.ann import index as ann_index
    from etl_backend_spark.registry import QUERIES
    from etl_backend_spark.registry import llm as L

    rng = np.random.RandomState(7)
    vocab = [f"w{j}" for j in range(5000)]
    ids = list(range(300))
    docs = {i: " ".join(rng.choice(vocab, 30)) for i in ids}
    d = tmp_path / "sfkb"
    d.mkdir()
    spark.createDataFrame(
        [(int(i), t, "en", "web") for i, t in docs.items()],
        "doc_id long, text string, lang string, source string",
    ).write.parquet(str(d / "documents.parquet"))

    full = QUERIES["dedup_minhash_incremental"](spark, str(d))
    full_rows = {tuple(r) for r in full.collect()}
    art = ann_index.index_dir_for(
        "mhlsh-incr", str(d), tables=("documents",))

    # (a) hive layout by kb, bucket count recorded in the staged
    # sidecar (r15: size-adaptive — a 300-doc corpus gets the floor)
    bands_dir = os.path.join(art, "bands")
    kb_dirs = [n for n in os.listdir(bands_dir) if n.startswith("kb=")]
    assert len(kb_dirs) > 1
    assert L._read_kb_buckets(art) == L.MINHASH_KB_MIN
    assert len(kb_dirs) <= L.MINHASH_KB_MIN

    # snapshot base index bytes before the tiny ingest
    def tree_state(root):
        out = {}
        for dp, _, fns in os.walk(root):
            for fn in fns:
                p = os.path.join(dp, fn)
                out[p] = (os.path.getsize(p), os.path.getmtime(p))
        return out

    before = {sub: tree_state(os.path.join(art, sub))
              for sub in ("sig", "bands")}

    # tiny batch = 2 docs of the staged batch signatures
    batch_sig = spark.read.parquet(L.minhash_batch_sig_path(art))
    tiny_ids = [r.doc_id for r in
                batch_sig.select("doc_id").orderBy("doc_id").limit(2)
                .collect()]
    tiny_path = str(tmp_path / "tiny_sig")
    batch_sig.filter(F.col("doc_id").isin(tiny_ids)).write.parquet(
        tiny_path)

    tiny = L.minhash_incr_pairs(spark, art, tiny_path)
    plan = tiny._jdf.queryExecution().executedPlan().toString()
    # (b) the bands scan is partition-filtered on kb and prunes dirs
    assert "PartitionFilters" in plan and "kb" in plan
    tiny_rows = {tuple(r) for r in tiny.collect()}

    # (c) rows unchanged by pruning: tiny == full restricted to tiny
    # docs (doc_match limited to base docs or the other tiny doc —
    # full-batch internal pairs against non-tiny docs can't exist here)
    base_ids = {r.doc_id for r in
                spark.read.parquet(L.minhash_base_sig_path(art))
                .select("doc_id").collect()}
    keep = set(tiny_ids) | base_ids
    expect = {(a, b, e) for a, b, e in full_rows
              if a in tiny_ids and b in keep}
    assert tiny_rows == expect

    # (d) base index files byte-identical after the ingest
    after = {sub: tree_state(os.path.join(art, sub))
             for sub in ("sig", "bands")}
    assert before == after


def test_positional_incremental_appends_and_maintains_stats(
        spark, tmp_path, monkeypatch):
    """Positional-index maintenance contract (r13 — the last index type
    without an ingest twin, and the one with a build-time stats
    sidecar): (a) appending a batch's positional postings leaves every
    base file byte-identical and only adds files; (b) the maintained
    postings equal a from-scratch rebuild over the union corpus; (c)
    the integer-add stats update reproduces the full rebuild's
    n_docs/dl_sum EXACTLY — a stale sidecar shifts every BM25 score;
    (d) bm25_incremental returns row-identical scores to the
    from-scratch bm25_search_indexed."""
    import json
    import os
    import tempfile

    from etl_backend_spark.registry import pipeline as P
    from etl_backend_spark.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")

    # (a) + (b): drive the shared builders directly, snapshot between
    out = str(tmp_path / "posidx")
    P.positional_postings(docs.filter(F.col("doc_id") % 10 != 0)).write \
        .mode("overwrite").partitionBy("tb").parquet(out)

    def snapshot():
        files = {}
        for root, _dirs, names in os.walk(out):
            for n in names:
                if n.endswith(".parquet"):
                    p = os.path.join(root, n)
                    st = os.stat(p)
                    files[p] = (st.st_size, st.st_mtime_ns)
        return files

    before = snapshot()
    P.positional_postings(docs.filter(F.col("doc_id") % 10 == 0)).write \
        .mode("append").partitionBy("tb").parquet(out)
    after = snapshot()
    for p, meta in before.items():
        assert after.get(p) == meta, p
    assert len(after) > len(before)
    merged = spark.read.parquet(out).select("term", "doc_id", "pos")
    full = P.positional_postings(docs).select("term", "doc_id", "pos")
    assert merged.exceptAll(full).count() == 0
    assert full.exceptAll(merged).count() == 0

    # (c) + (d): the ensure_* path in a fresh tempdir
    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    idx_dir, built = P.ensure_text_index_positional_incremental(spark, sf)
    assert built
    st = json.load(open(os.path.join(P.doc_length_dir(idx_dir),
                                     "_stats.json")))
    want = docs.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
              .cast("long")).alias("s")).collect()[0]
    assert st == {"n_docs": int(want.n), "dl_sum": int(want.s)}
    # idempotent: a rerun sees the marker and does not rebuild
    _, built2 = P.ensure_text_index_positional_incremental(spark, sf)
    assert not built2

    got = sorted(map(tuple, QUERIES["bm25_incremental"](spark, sf).collect()))
    ref = sorted(map(tuple,
                     QUERIES["bm25_search_indexed"](spark, sf).collect()))
    assert got == ref and got


def test_clusters_incremental_matches_independent_unionfind(
        spark, tmp_path_factory):
    """Property-style semantic pin for dedup_clusters_incremental,
    against a THIRD implementation: pure-python minhash signatures
    (_mh_sig_np — the engine's exact hash chain) + the engine's exact
    LSH visibility rule (_mh_found: band collision AND est >= 0.5) +
    python union-find over base-base plus batch pairs. The contraction
    identity under test: components of (base pairs ∪ batch pairs)
    resolved through persisted base labels equal components of the full
    pair graph, with merged ids = min member id — for arbitrary random
    dup structure, not just the planted case. Three seeded corpora with
    grouped near-dup templates spanning base/batch membership."""
    import hashlib

    import numpy as np

    from etl_backend_spark.registry import QUERIES

    def bucket(i):
        return int(hashlib.md5(f"clinc:{i}".encode()).hexdigest()[:8],
                   16) % 100

    for seed in (101, 202, 303):
        rng = np.random.RandomState(seed)
        ids = list(range(120))
        base_ids = [i for i in ids if bucket(i) < 90]
        batch_ids = [i for i in ids if bucket(i) >= 90]
        vocab = [f"s{seed}v{j}" for j in range(4000)]
        docs = {i: " ".join(rng.choice(vocab, 14)) for i in ids}
        # grouped near-dups: templates with 2-4 members across the
        # base/batch split, each member mutating 0-2 word positions
        pool = list(ids)
        rng.shuffle(pool)
        p = 0
        for _g in range(10):
            k = int(rng.randint(2, 5))
            if p + k > len(pool):
                break
            members, p = pool[p:p + k], p + k
            tmpl = list(rng.choice(vocab, 14))
            for m in members:
                w = list(tmpl)
                for _ in range(int(rng.randint(0, 3))):
                    w[int(rng.randint(0, 14))] = str(
                        rng.choice(vocab))
                docs[m] = " ".join(w)

        # independent python truth
        sigs = {i: _mh_sig_np(docs[i]) for i in ids}
        parent = {i: i for i in ids}

        def find(a):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        def union(a, b):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)

        base_set = set(base_ids)
        base_parent = {}
        base_pairs = [(a, b) for ix, a in enumerate(base_ids)
                      for b in base_ids[ix + 1:]
                      if _mh_found(sigs[a], sigs[b])]
        batch_pairs = [(x, d) for x in batch_ids for d in ids
                       if d != x and not (d in batch_ids and d > x)
                       and _mh_found(sigs[x], sigs[d])]
        # persisted base labels = components over base pairs only
        bp = {i: i for i in base_ids}

        def bfind(a):
            while bp[a] != a:
                bp[a] = bp[bp[a]]
                a = bp[a]
            return a

        for a, b in base_pairs:
            ra, rb = bfind(a), bfind(b)
            if ra != rb:
                bp[max(ra, rb)] = min(ra, rb)
        base_lbl = {i: bfind(i) for i in base_ids}
        # full graph = base pairs ∪ batch pairs
        for a, b in base_pairs:
            union(a, b)
        for a, b in batch_pairs:
            union(a, b)

        expected = {}
        touched = set()
        for x in batch_ids:
            expected[(x, "batch_doc")] = find(x)
        for x, d in batch_pairs:
            if d in base_set:
                touched.add(base_lbl[d])
            elif d in batch_ids:
                pass
        for lbl in touched:
            expected[(lbl, "base_cluster")] = find(lbl)

        d = tmp_path_factory.mktemp(f"clprop{seed}")
        spark.createDataFrame(
            [(int(i), t, "en", "web") for i, t in docs.items()],
            "doc_id long, text string, lang string, source string",
        ).write.parquet(str(d / "documents.parquet"))
        rows = QUERIES["dedup_clusters_incremental"](
            spark, str(d)).collect()
        got = {(r.id, r.kind): r.cluster_id for r in rows}
        assert got == expected, (
            seed,
            {k: (got.get(k), expected.get(k))
             for k in set(got) ^ set(expected) | {
                 k for k in got if got.get(k) != expected.get(k)}},
        )
