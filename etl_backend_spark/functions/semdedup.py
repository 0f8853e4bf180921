"""SemDeDup: semantic deduplication via k-means clustering + within-cluster
cosine pruning (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", arXiv:2303.09540 — the recipe
used to prune LAION/web-scale corpora).

The 100-TB shape, composed for Spark:

1. FIT: k centroids on a bounded seeded sample (same contract as the
   IVF/PQ quantizers in functions/pq.py: never the full corpus). K follows
   the corpus so the EXPECTED cluster size stays constant
   (K = clamp(n / target, 4, K_MAX)); the centroid matrix is K x d doubles
   (<= 2 MB at K=4096, d=64) and rides UDF closures — broadcast-trivial.
   The fit itself is TWO-LEVEL past FLAT_FIT_K (coarse sqrt(k) cells,
   then per-cell sub-fits — O(|sample| * sqrt(k)) instead of flat
   Lloyd's O(|sample| * k); see fit_centroids).
2. ASSIGN: one map-only pass (Arrow-batched) tags every vector with its
   nearest centroid. No shuffle, no driver traffic.
3. PRUNE: ONE shuffle on the cluster id, then each cluster is pruned
   locally with numpy: vectors are visited farthest-from-centroid first
   (the paper's keep rule) and a vector is marked a duplicate of the
   already-kept vector it is most similar to when that similarity exceeds
   1 - eps. Work is O(cluster^2) flops vectorized per cluster — bounded,
   because clusters past `subsplit` are locally re-clustered (seeded by
   the cluster id) into ~target-sized subclusters first, the same
   boundary-miss tradeoff the paper accepts globally. Total pairwise work
   is therefore O(n * target) regardless of corpus size.

Everything is deterministic: seeded inits, fixed iteration counts,
argmin/argmax lowest-index tie-breaks, groups sorted by vec_id before any
order-dependent step — so output is identical across partition layouts
(pytest-asserted) and across runs. Float centroid FITTING is not
SQL-replicable (like the other k-means family members, sim_topk_pq/ivf),
so the fit/assignment stays pinned by the planted-duplicates +
independent-greedy pytests; since r11 the registry row is nonetheless a
full VALUE GATE — the per-vector assignment record (cell, sub, prio)
persists as a parquet artifact and a DuckDB recursive CTE replays the
greedy PRUNE from it bit-exactly (fold-order cosines on both sides; see
registry/llm.py:_SEMDEDUP_REPLAY_ORACLE).
"""

from __future__ import annotations

import numpy as np

TARGET_CLUSTER = 64      # E[cluster size] the K schedule holds
K_MAX = 4096             # coarse-fit ceiling (2 MB centroid matrix at d=64)
FIT_CAP = 32768          # bounded fit sample (8 points/centroid at K_MAX)
SUBSPLIT = 256           # local re-cluster guard for hot clusters
EPS = 0.05               # duplicate iff cos > 1 - EPS
PAIRWISE_PRECOMPUTE_MAX = 2048   # n^2 sim-matrix cap (32 MB doubles);
#                                  past it greedy_prune folds per visit


def k_schedule(n: int, target: int = TARGET_CLUSTER) -> int:
    return int(min(K_MAX, max(4, n // target)))


FLAT_FIT_K = 64          # past this, fit_centroids goes two-level


def _lloyd(sample: np.ndarray, k: int, iters: int = 10,
           seed: int = 11) -> np.ndarray:
    """Lloyd k-means with the matmul distance trick — O(n*k) memory, not
    the O(n*k*d) broadcast tensor of pq.fit_codebooks (which is sized for
    k=16 subspace codebooks; this fit runs at k up to 4096).

    Deterministic: seeded row init, fixed iterations, argmin lowest-index
    ties, dead centroids re-seeded from the currently-farthest point. The
    mean update is d bincount passes (sequential-accumulation sums), not
    a per-centroid mask loop — the loop was O(n*k) boolean work plus k
    numpy-call overheads per iteration."""
    n, d = sample.shape
    rng = np.random.RandomState(seed)
    cent = sample[rng.choice(n, size=k, replace=n < k)].astype(np.float64).copy()
    x2 = (sample * sample).sum(axis=1)
    for _ in range(iters):
        # ||x-c||^2 = ||x||^2 + ||c||^2 - 2 x.c ; ||x||^2 constant per row
        d2 = (cent * cent).sum(axis=1)[None, :] - 2.0 * (sample @ cent.T)
        assign = d2.argmin(axis=1)
        far = (d2.min(axis=1) + x2).argmax()
        counts = np.bincount(assign, minlength=k)
        sums = np.empty((k, d), dtype=np.float64)
        for j in range(d):
            sums[:, j] = np.bincount(assign, weights=sample[:, j],
                                     minlength=k)
        nz = counts > 0
        cent[nz] = sums[nz] / counts[nz, None]
        cent[~nz] = sample[far]
    return cent


def fit_centroids(sample: np.ndarray, k: int, iters: int = 10,
                  seed: int = 11) -> np.ndarray:
    """Centroid fit; TWO-LEVEL past FLAT_FIT_K (the r7 fifth-decade fix).

    Flat Lloyd is O(|sample| * k) per iteration; with the k-schedule
    tracking n up to K_MAX=4096 the one-time fit at the cap is ~1.7e11
    flops of single-threaded driver numpy (measured 19 s at k=3125) —
    bounded, but a bad constant. The standard large-k trick (FAISS IVF
    training): fit g = ceil(sqrt(k)) coarse centroids, partition the
    sample by coarse cell, fit each cell's quota of sub-centroids
    locally — total work O(|sample| * sqrt(k)), ~sqrt(k)-fold less.
    Quotas are proportional to cell mass (rounded, every non-empty cell
    >= 1, capped at the cell's point count), so the returned count is
    within rounding of k — callers treat cents.shape[0] as truth.

    Deterministic end-to-end: seeded coarse init, per-cell seeds derived
    from (seed, cell index), fixed iteration counts, argmin ties lowest
    index.

    NOTE (r13 review): on the two-level path, ``iters`` drives only the
    COARSE fit; every per-cell sub-fit runs a FIXED 5 Lloyd iterations
    by design — the sub-problems are small and near-converged after the
    coarse partition, and the fixed count keeps persisted centroid
    artifacts (and every replay oracle reading them) stable across any
    caller-side iters tuning. Threading ``iters`` through would churn
    all existing artifacts for no correctness gain."""
    n, d = sample.shape
    if k <= FLAT_FIT_K or n <= 2 * k:
        return _lloyd(sample, k, iters, seed)
    g = int(np.ceil(np.sqrt(k)))
    coarse = _lloyd(sample, g, iters, seed)
    d2 = (coarse * coarse).sum(axis=1)[None, :] - 2.0 * (sample @ coarse.T)
    asg = d2.argmin(axis=1)
    counts = np.bincount(asg, minlength=g)
    quota = np.round(counts * (k / n)).astype(np.int64)
    quota = np.minimum(np.maximum(quota, (counts > 0).astype(np.int64)),
                       counts)
    parts = []
    for ci in range(g):
        if quota[ci] == 0:
            continue
        pts = sample[asg == ci]
        parts.append(_lloyd(pts, int(quota[ci]), iters=5,
                            seed=seed + 7919 * (ci + 1)))
    return np.vstack(parts)


def assign_cells(mat: np.ndarray, cents: np.ndarray):
    """Nearest centroid per row + cosine to that centroid (the prune
    priority). `mat` rows are l2-normalized, centroids are means (NOT
    unit-norm), so nearest-by-L2 = argmin(||c||^2 - 2 x.c)."""
    dots = mat @ cents.T                                  # (n, k)
    d2 = (cents * cents).sum(axis=1)[None, :] - 2.0 * dots
    cell = d2.argmin(axis=1)
    cnorm = np.sqrt((cents * cents).sum(axis=1))
    cdot = dots[np.arange(len(mat)), cell] / np.maximum(cnorm[cell], 1e-300)
    return cell.astype(np.int32), cdot


def greedy_prune(ids: np.ndarray, mat: np.ndarray, cdot: np.ndarray,
                 eps: float = EPS):
    """Paper's within-cluster rule, vectorized: visit farthest-from-
    centroid first (ties: lowest vec_id); mark a duplicate of the MOST
    similar already-kept vector when that cosine > 1 - eps (ties: the
    earlier-kept one, which the running argmax already yields).

    Since r11 the kept-vs-candidate cosines accumulate SEQUENTIALLY over
    dimensions (a left-associated fold per pair from a 0.0 seed — the
    same chain as DuckDB's list_reduce with a prepended 0.0), not via
    BLAS matvec: the _SEMDEDUP_REPLAY_ORACLE (registry/llm.py) replays
    this greedy bit-for-bit from the persisted assignment artifact, and
    accumulation ORDER is the only degree of freedom between the two
    engines. For speed the whole cluster's pairwise matrix is built in
    ONE fold-ordered pass over dims (S += col x col^T per dim — each
    pair's accumulator sees the identical add chain; 64 vectorized ops
    per CLUSTER instead of per visit, 14x less numpy-call overhead,
    measured) when n^2 doubles stay small; degenerate oversized groups
    (only near-identical points survive subsplit that large, so the kept
    set stays tiny) fall back to the per-visit fold — same chain, O(n *
    kept) memory.

    Returns (keep bool array, dup_of int64 array with -1 for keeps),
    aligned with the input order.

    ONE kernel: this is exactly the incremental greedy with an empty
    base kept set, and delegating keeps the two bit-parity-critical
    code paths (same S-precompute guard, same per-visit fold, same
    NaN -> -inf mask, same tie-breaks) from ever drifting apart (r11
    second review). Bit-equivalence of the delegation: with kb = 0 the
    precompute condition n*(0+n) <= MAX^2 equals n <= MAX, the S pass
    runs the identical per-dim chain, and S[i, kept] vs S[kept, i]
    differ only by operand order inside each float multiply —
    commutative bit-exactly."""
    empty = np.empty(0, dtype=np.int64)
    return greedy_prune_incremental(
        ids, mat, cdot, empty,
        np.empty((0, mat.shape[1]), dtype=np.float64), eps)


def prune_cluster(ids: np.ndarray, mat: np.ndarray, cdot: np.ndarray,
                  cell: int, eps: float = EPS, subsplit: int = SUBSPLIT,
                  target: int = TARGET_CLUSTER):
    """Prune one cluster; clusters past `subsplit` are locally re-clustered
    (seed derived from the cluster id — layout-independent) into
    ~target-sized subclusters first, bounding the pairwise pass.

    Returns (keep, dup_of, sub, prio): `sub` is the local subcluster id
    (0 when the cluster was small enough to prune whole) and `prio` the
    centroid-cosine the greedy visit order actually used (the
    sub-centroid's for split clusters) — together with (cell, vec_id)
    these four columns are the ASSIGNMENT RECORD the registry persists,
    from which the replay oracle re-runs the greedy decision procedure
    (registry/llm.py:_SEMDEDUP_REPLAY_ORACLE)."""
    if len(ids) <= subsplit:
        keep, dup_of = greedy_prune(ids, mat, cdot, eps)
        return keep, dup_of, np.zeros(len(ids), dtype=np.int32), cdot
    k = max(2, int(np.ceil(len(ids) / target)))
    sub_cents = fit_centroids(mat, k=min(k, len(ids)), iters=5,
                              seed=1_000_003 + int(cell))
    sub, sub_cdot = assign_cells(mat, sub_cents)
    keep = np.zeros(len(ids), dtype=bool)
    dup_of = np.full(len(ids), -1, dtype=np.int64)
    for s in np.unique(sub):
        m = sub == s
        k_m, d_m = greedy_prune(ids[m], mat[m], sub_cdot[m], eps)
        keep[m] = k_m
        dup_of[m] = d_m
    return keep, dup_of, sub.astype(np.int32), sub_cdot


def greedy_prune_incremental(ids: np.ndarray, mat: np.ndarray,
                             prio: np.ndarray, kept_ids: np.ndarray,
                             kept_mat: np.ndarray, eps: float = EPS):
    """INCREMENTAL greedy: dedup a NEW batch against an already-pruned
    base kept set without revisiting (or ever re-deciding) the base.
    The kept list starts as the base cell's kept vectors in their
    CANONICAL order (sub ASC, prio ASC, vec_id ASC — the caller
    pre-orders; the argmax tie-break "earlier kept wins" then prefers
    base representatives over new arrivals) and grows with accepted new
    vectors, which are visited farthest-from-centroid first exactly
    like the batch path.

    Same cross-engine float contract as ``greedy_prune``: cosines
    accumulate in fold order — precomputed as ONE pass over dims of the
    (new x (base-kept + new)) matrix when it fits, per-visit fold
    otherwise (identical add chain either way; pinned by the same
    bit-equality discipline) — and NaN cosines mask to -inf. The
    replay oracle (_SEMDEDUP_INCR_REPLAY_ORACLE, registry/llm.py)
    re-runs THIS procedure from the persisted base + batch assignment
    records.

    Returns (keep, dup_of) aligned with the input order; dup_of may
    name a base kept vector or an earlier-accepted new one, -1 for
    keeps."""
    order = np.lexsort((ids, prio))
    n_new = len(ids)
    kb = len(kept_ids)
    all_ids = np.concatenate([kept_ids, ids]) if kb else ids
    all_mat = np.vstack([kept_mat, mat]) if kb else mat
    keep = np.zeros(n_new, dtype=bool)
    dup_of = np.full(n_new, -1, dtype=np.int64)
    kept_rows = list(range(kb))          # positions into all_mat
    S = None
    if n_new * (kb + n_new) <= PAIRWISE_PRECOMPUTE_MAX ** 2:
        S = np.zeros((n_new, kb + n_new), dtype=np.float64)
        for d in range(mat.shape[1]):    # sequential over dims = fold
            S += mat[:, d][:, None] * all_mat[:, d][None, :]
    for i in order:
        if kept_rows:
            if S is not None:
                sims = S[i, kept_rows]
            else:
                kmat = all_mat[kept_rows]
                v = mat[i]
                sims = np.zeros(len(kept_rows), dtype=np.float64)
                for d in range(mat.shape[1]):
                    sims = sims + kmat[:, d] * v[d]
            sims = np.where(np.isnan(sims), -np.inf, sims)
            j = int(sims.argmax())
            if sims[j] > 1.0 - eps:
                dup_of[i] = all_ids[kept_rows[j]]
                continue
        keep[i] = True
        kept_rows.append(kb + i)
    return keep, dup_of
