"""Vector math over ``array<float>`` embedding columns — all built-in higher-
order functions (zip_with / aggregate / transform), JVM-side, no UDFs.

Arithmetic is done in float64 (arrays are cast first) so results are
bit-comparable with the DuckDB oracle and stable under reordering-free
sequential accumulation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product of two double arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(v: Column) -> Column:
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_normalize(v: Column) -> Column:
    n = norm(v)
    return F.transform(v, lambda x: x / n)


def cosine_scores_pandas(query_vec):
    """Factory: Arrow-batched pandas UDF scoring a whole corpus column
    against one query vector with numpy (SIMD/pairwise summation).

    The expression-based ``cosine`` above is exactly portable to the DuckDB
    oracle (sequential accumulation) but higher-order-function expressions
    run interpreted, outside whole-stage codegen; this is the throughput
    path for large corpora, at the cost of bit-exact oracle parity
    (pairwise vs sequential float summation). Returns a Column.
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)

    @pandas_udf(DoubleType())
    def score(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (batch, dim) float64
        m = m.astype(np.float64, copy=False)
        dots = m @ q
        norms = np.linalg.norm(m, axis=1)
        return pd.Series(dots / (norms * qn))

    return score


def cosine_scores_multi_pandas(query_vecs: list[list[float]]):
    """Single Arrow-batched pandas UDF scoring every corpus vector against
    ALL queries at once: one (batch x dim) @ (dim x n_queries) matmul per
    batch, one scan, one Python worker round — per-query UDFs pay the
    scan + worker startup n_queries times. Returns array<double> of scores
    in query order (posexplode downstream)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, DoubleType

    qm = np.asarray(query_vecs, dtype=np.float64).T  # (dim, n_q)
    qn = np.linalg.norm(qm, axis=0)                  # (n_q,)

    @pandas_udf(ArrayType(DoubleType()))
    def score(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64, copy=False)
        scores = (m @ qm) / (np.linalg.norm(m, axis=1)[:, None] * qn[None, :])
        return pd.Series(list(scores))

    return score


def cosine_topk_scan_pandas(query_vecs: list[list[float]], k: int,
                            exclude_ids=None):
    """mapInPandas worker factory over (vec_id, v): score every corpus
    vector against ALL queries (one matmul per Arrow batch — same math as
    ``cosine_scores_multi_pandas``) and emit only the LOCAL top-k rows per
    query, (qi, vec_id, cos), under the strict total order (cos desc,
    vec_id asc).

    Selection by a total order is associative, so the global top-k per
    query is always contained in the union of per-batch top-ks: a tiny
    global re-rank over <= k x n_batches skinny rows replaces a window over
    the full n x nq scored set — the EXACT scorer gets the same
    shuffle-bounded scan the PQ path has (functions/pq.topk_scan_pandas),
    with results bit-identical regardless of partitioning.
    ``exclude_ids[qi]`` drops that vec_id from query qi's candidates before
    selection (self-match never burns a slot)."""
    qm = np.asarray(query_vecs, dtype=np.float64).T   # (dim, n_q)
    qn = np.linalg.norm(qm, axis=0)

    def run(batches):
        for pdf in batches:
            m = np.stack(pdf["v"].to_numpy()).astype(np.float64, copy=False)
            ids = pdf["vec_id"].to_numpy()
            scores = (m @ qm) / (np.linalg.norm(m, axis=1)[:, None] * qn[None, :])
            out = {"qi": [], "vec_id": [], "cos": []}
            for qi in range(qm.shape[1]):
                s, cand = scores[:, qi], ids
                if exclude_ids is not None:
                    keep = cand != exclude_ids[qi]
                    s, cand = s[keep], cand[keep]
                order = np.lexsort((cand, -s))[:k]
                out["qi"].extend([qi] * len(order))
                out["vec_id"].extend(cand[order].tolist())
                out["cos"].extend(s[order].tolist())
            yield pd.DataFrame(out)

    return run
