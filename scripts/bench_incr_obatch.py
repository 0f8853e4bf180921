"""O(batch)-not-O(corpus) receipt for the incremental-family ingest
paths (r12, VERDICT #2): hold the BATCH fixed, grow the BASE corpus
10x (sf1 -> sf10), and measure the batch path only. If ingest cost is
O(batch) — the property a daily-ingest pipeline over a 100 TB corpus
actually needs — the timings are flat within noise; an O(corpus)
ingest would grow ~10x.

Per family the timed region is exactly what a production ingest runs
against an EXISTING index:

* minhash: batch band explode + band join against the persisted
  pre-exploded band index + estimate verify
  (registry/llm.minhash_incr_pairs), batch signatures pre-staged.
* semdedup: tag the batch with the persisted frozen centroids +
  cogroup against the kept vectors persisted in the base artifact
  (registry/llm.semdedup_incr_tag / semdedup_incr_batch_rec).

Base-index builds (untimed) run the registered queries once per base
dir. The fixed batch is sf1's md5 batch — replica 0 of the sf10 build
keeps sf1 rows bit-identical, so the same rows exist in both corpora.
Runs interleave base arms (A=sf1, B=sf10 per round) so both see the
same noise process, and a cpu_probe runs before/after so the window's
cleanliness is recorded (bench.py's thermometer).

Usage:
    python scripts/bench_incr_obatch.py [rounds]
Prints one JSON line per family plus a probe line.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from bench import cpu_probe, probe_drift_pct, run_full  # noqa: E402
from etl_backend_spark.ann import index as ann_index  # noqa: E402
from etl_backend_spark.registry import QUERIES  # noqa: E402
from etl_backend_spark.registry import llm as L  # noqa: E402
from etl_backend_spark.registry.llm import _ANN_ROOT  # noqa: E402
from etl_backend_spark.session import get_spark  # noqa: E402
from etl_backend_spark.sources.catalog import Catalog  # noqa: E402
from etl_backend_spark.functions import vectors as V  # noqa: E402

SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/etlbs-sf1")
SF10 = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/etlbs-sf10")
SCRATCH = "/tmp/etlbs-obatch"


def art_for(kind: str, sf_dir: str, tables) -> str:
    return ann_index.index_dir_for(kind, sf_dir, tables=tables,
                                   root=_ANN_ROOT)


def median_timed(fn, rounds: int) -> list:
    out = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        fn()
        out.append(round(time.perf_counter() - t0, 3))
    return out


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(app_name="incr-obatch")
    spark.sparkContext.setLogLevel("ERROR")
    probe0 = cpu_probe()

    # ---- untimed: build base indexes for both corpora --------------
    # point_current() garbage-collects same-kind sibling dirs, so the
    # two bases' live artifacts cannot coexist under the ANN root —
    # snapshot each base's index to scratch right after its build and
    # time against the snapshots.
    shutil.rmtree(SCRATCH, ignore_errors=True)
    os.makedirs(SCRATCH, exist_ok=True)
    mh_art, sd_art = {}, {}
    for sf, tag in ((SF1, "sf1"), (SF10, "sf10")):
        run_full(QUERIES["dedup_minhash_incremental"](spark, sf))
        run_full(QUERIES["semdedup_incremental"](spark, sf))
        mh_art[sf] = os.path.join(SCRATCH, f"mh-{tag}")
        sd_art[sf] = os.path.join(SCRATCH, f"sd-{tag}")
        shutil.copytree(art_for("mhlsh-incr", sf, ("documents",)),
                        mh_art[sf])
        shutil.copytree(art_for("semdedup-incr", sf, ("embeddings",)),
                        sd_art[sf])

    # ---- minhash: stage the FIXED batch sigs once ------------------
    fixed_sig = os.path.join(SCRATCH, "mh-batch-sig")
    shutil.copytree(os.path.join(mh_art[SF1], "sig_batch"), fixed_sig)

    def mh_run(sf):
        run_full(L.minhash_incr_pairs(spark, mh_art[sf], fixed_sig))

    # ---- semdedup: fixed batch rows from sf1, tagged per-base ------
    bucket = (
        F.conv(F.substring(
            F.md5(F.concat(F.lit("sdinc:"), F.col("vec_id").cast("string"))),
            1, 8), 16, 10).cast("long") % 100
    )
    fixed_vecs = (
        Catalog(spark, SF1).table("embeddings")
        .filter(bucket >= 90)
        .select("vec_id",
                V.l2_normalize(V.as_double(F.col("embedding"))).alias("nv"))
    )

    # centroids load once per base OUTSIDE the timed region — a
    # production ingest holds the frozen centroid matrix resident; the
    # timed region is tag + prune-cogroup, the per-batch work
    cents_by = {sf: L.semdedup_incr_load_cents(sd_art[sf])
                for sf in (SF1, SF10)}

    def sd_run(sf):
        batch = (
            L.semdedup_incr_tag(fixed_vecs, cents_by[sf])
            .select("vec_id", "cell", F.col("cdot").alias("prio"), "nv")
        )
        run_full(L.semdedup_incr_batch_rec(spark, sd_art[sf], batch))

    results = {}
    for fam, runner in (("minhash", mh_run), ("semdedup", sd_run)):
        runner(SF1); runner(SF10)  # warm both arms
        a, b = [], []
        for _ in range(rounds):  # interleaved A,B per round
            t0 = time.perf_counter(); runner(SF1)
            a.append(round(time.perf_counter() - t0, 3))
            t0 = time.perf_counter(); runner(SF10)
            b.append(round(time.perf_counter() - t0, 3))
        am, bm = statistics.median(a), statistics.median(b)
        results[fam] = {
            "base_sf1_sec": a, "base_sf10_sec": b,
            "sf1_median": am, "sf10_median": bm,
            "growth_x_for_10x_base": round(bm / am, 2),
        }
        print(json.dumps({"family": fam, **results[fam]}))

    probe1 = cpu_probe()
    print(json.dumps({
        "probe_before": probe0, "probe_after": probe1,
        "probe_drift_pct": round(probe_drift_pct(probe0, probe1), 1),
    }))


if __name__ == "__main__":
    main()
