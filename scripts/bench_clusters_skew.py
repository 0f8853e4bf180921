"""Skewed-cluster O(batch) receipt for ``clusters_incr_update``
(r13 VERDICT #4, timed half — the correctness half is
tests/test_llm_ops.py::test_clusters_incremental_skewed_mega_cluster):
two same-size bases with equal-machinery workloads — 'spread' (50
batch docs each near-dupping a distinct base label) vs 'skew' (ONE
batch doc bridging a mega-cluster that owns ~half the base: one hot
label, |mega| candidate pairs). If the ingest's contraction design
holds under skew — |mega| pair endpoints contract to ONE label node
before propagation — the skewed cell lands within ~1.3x of the spread
cell; an implementation that propagated over the hot label's full
membership would scale with |mega| instead. Both arms run real
propagation (a zero-pair arm would skip it and mismeasure the delta
as fixed round overhead).

Runs interleave arms (uniform, skew per round) so both see the same
noise process; cpu probes bracket the window (bench.py thermometer).

Usage: python scripts/bench_clusters_skew.py [rounds] [n_docs]
Prints one JSON line: {"uniform_median": s, "skew_median": s,
"skew_x": ratio, ...}.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from bench import cpu_probe, probe_drift_pct, run_full  # noqa: E402
from etl_backend_spark.ann import index as ann_index  # noqa: E402
from etl_backend_spark.registry import QUERIES  # noqa: E402
from etl_backend_spark.registry import llm as L  # noqa: E402
from etl_backend_spark.registry.llm import _ANN_ROOT  # noqa: E402
from etl_backend_spark.session import get_spark  # noqa: E402

SCRATCH = "/tmp/etlbs-clskew"


def is_batch(i: int) -> bool:
    h = hashlib.md5(f"clinc:{i}".encode()).hexdigest()[:8]
    return int(h, 16) % 100 >= 90


def build_corpus(spark, out: str, n: int, skew: bool) -> None:
    """Both arms carry REAL batch-onto-base near-dup structure, so both
    run the full contraction + propagation machinery — the arms differ
    only in SHAPE: 'spread' links 50 batch docs onto 50 distinct base
    labels; 'skew' links ONE batch doc onto a mega-cluster owning ~half
    the base (one hot label, |mega| candidate pairs). An uniform arm
    with zero pairs would skip propagation entirely and overstate the
    skew cost as round-count overhead rather than hot-label scaling."""
    rng = np.random.RandomState(5 if skew else 6)
    vocab = [f"w{j}" for j in range(20_000)]
    docs = {i: " ".join(rng.choice(vocab, 30)) for i in range(n)}
    batch_ids = sorted(i for i in range(n) if is_batch(i))
    base_ids = sorted(i for i in range(n) if not is_batch(i))
    if skew:
        mega_text = " ".join(rng.choice(vocab, 30))
        for i in base_ids[: len(base_ids) // 2]:
            docs[i] = mega_text
        w = mega_text.split()
        w[12] = "bridgetoken"
        docs[batch_ids[0]] = " ".join(w)
    else:
        for k in range(min(50, len(batch_ids), len(base_ids))):
            w = docs[base_ids[k]].split()
            w[12] = f"spread{k}"
            docs[batch_ids[k]] = " ".join(w)
    spark.createDataFrame(
        [(int(i), t, "en", "web") for i, t in docs.items()],
        "doc_id long, text string, lang string, source string",
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3000
    spark = get_spark(app_name="clusters-skew")
    spark.sparkContext.setLogLevel("ERROR")
    probe0 = cpu_probe()

    shutil.rmtree(SCRATCH, ignore_errors=True)
    os.makedirs(SCRATCH, exist_ok=True)
    arts = {}
    for tag in ("uniform", "skew"):
        sf = os.path.join(SCRATCH, f"sf-{tag}")
        build_corpus(spark, sf, n, skew=(tag == "skew"))
        # untimed base build (registered query also runs one ingest)
        run_full(QUERIES["dedup_clusters_incremental"](spark, sf))
        src = ann_index.index_dir_for(
            "clinc-incr", sf, tables=("documents",), root=_ANN_ROOT)
        dst = os.path.join(SCRATCH, f"art-{tag}")
        shutil.copytree(src, dst)  # point_current GCs same-kind siblings
        arts[tag] = dst

    times: dict[str, list[float]] = {"uniform": [], "skew": []}
    for _ in range(rounds):
        for tag in ("uniform", "skew"):
            t0 = time.monotonic()
            run_full(L.clusters_incr_update(
                spark, arts[tag],
                L.minhash_batch_sig_path(arts[tag])))
            times[tag].append(round(time.monotonic() - t0, 3))
    probe1 = cpu_probe()

    u = statistics.median(times["uniform"])
    s = statistics.median(times["skew"])
    print(json.dumps({
        "n_docs": n, "rounds": rounds,
        "uniform_sec": times["uniform"], "skew_sec": times["skew"],
        "uniform_median": u, "skew_median": s,
        "skew_x": round(s / u, 3),
        "probe_before": probe0, "probe_after": probe1,
        "probe_drift_pct": probe_drift_pct(probe0, probe1),
    }))


if __name__ == "__main__":
    main()
