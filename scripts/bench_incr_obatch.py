"""O(batch)-not-O(corpus) receipt for the incremental-family ingest
paths (r12 VERDICT #2, extended r13 VERDICT #2/#3/#5): hold the BATCH
fixed, grow the BASE corpus 10x (sf1 -> sf10), and measure the batch
path only. If ingest cost is O(batch) — the property a daily-ingest
pipeline over a 100 TB corpus actually needs — the timings are flat
within noise; an O(corpus) ingest would grow ~10x.

Per family the timed region is exactly what a production ingest runs
against an EXISTING index:

* minhash: batch band explode + band join against the persisted
  pre-exploded band index + estimate verify
  (registry/llm.minhash_incr_pairs), batch signatures pre-staged.
* semdedup: tag the batch with the persisted frozen centroids +
  cogroup against the kept vectors persisted in the base artifact
  (registry/llm.semdedup_incr_tag / semdedup_incr_batch_rec).
* exact: batch content hashes anti-join the persisted sha256 index
  under the measured broadcast gate (registry/llm.exact_incr_new),
  batch hashes pre-staged — NEW r13 (VERDICT #2).
* clusters: batch near-dup pairs from the persisted band index,
  contraction against the persisted labels, min-label propagation over
  the contracted batch-sized graph
  (registry/llm.clusters_incr_update) — NEW r13 (VERDICT #5).
* text_index: batch postings computed from the staged batch docs and
  APPENDED into the bucket-partitioned base postings table
  (registry/pipeline.boolean_postings + parquet append) — NEW r13
  (VERDICT #3; the zero-base-file-rewrite pytest pin gets a timed
  receipt).
* sim_index: batch vectors encoded with the base index's FROZEN
  coarse centroids + PQ codebooks and appended into the cell
  partitions (ann/index.append_ivfpq_batch) — NEW r13 (VERDICT #3).

Base-index builds (untimed) run the registered queries / builders once
per base dir. The fixed batch is sf1's — replica 0 of the sf10 build
keeps sf1 rows bit-identical, so the same rows exist in both corpora,
and the split buckets tag them batch in BOTH bases (the fixed batch is
disjoint from each base). Runs interleave base arms (A=sf1, B=sf10 per
round) so both see the same noise process, and a cpu_probe runs
before/after so the window's cleanliness is recorded (bench.py's
thermometer). The two append families mutate their scratch indexes
(each round re-appends the same batch); append cost is independent of
what earlier rounds appended, and both arms accumulate identically.

Usage:
    python scripts/bench_incr_obatch.py [rounds] [family ...]
Prints one JSON line per family plus a probe line. With no family
arguments, runs all six.
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
from etl_backend_spark.registry import pipeline as P  # noqa: E402
from etl_backend_spark.registry.llm import _ANN_ROOT  # noqa: E402
from etl_backend_spark.session import get_spark  # noqa: E402
from etl_backend_spark.sources.catalog import Catalog  # noqa: E402
from etl_backend_spark.functions import vectors as V  # noqa: E402

SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/etlbs-sf1")
SF10 = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/etlbs-sf10")
SCRATCH = "/tmp/etlbs-obatch"
ALL_FAMILIES = ("minhash", "semdedup", "exact", "clusters",
                "text_index", "sim_index", "pos_index")


def art_for(kind: str, sf_dir: str, tables) -> str:
    return ann_index.index_dir_for(kind, sf_dir, tables=tables,
                                   root=_ANN_ROOT)


def snapshot(kind: str, sf: str, tag: str, tables) -> str:
    """Copy a just-built live artifact to scratch: point_current()
    garbage-collects same-kind sibling dirs, so the two bases' live
    artifacts cannot coexist under the ANN root."""
    dst = os.path.join(SCRATCH, f"{kind}-{tag}")
    shutil.copytree(art_for(kind, sf, tables), dst)
    return dst


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    unknown = [a for a in sys.argv[2:] if a not in ALL_FAMILIES]
    if unknown:
        raise SystemExit(f"unknown families {unknown}; "
                         f"choose from {ALL_FAMILIES}")
    fams = list(dict.fromkeys(sys.argv[2:])) or list(ALL_FAMILIES)
    spark = get_spark(app_name="incr-obatch")
    spark.sparkContext.setLogLevel("ERROR")
    probe0 = cpu_probe()

    shutil.rmtree(SCRATCH, ignore_errors=True)
    os.makedirs(SCRATCH, exist_ok=True)
    runners = {}

    # ---- untimed: build base indexes for both corpora --------------
    if {"minhash", "semdedup", "exact", "clusters"} & set(fams):
        arts = {}
        for sf, tag in ((SF1, "sf1"), (SF10, "sf10")):
            if "minhash" in fams:
                run_full(QUERIES["dedup_minhash_incremental"](spark, sf))
                arts[("mh", sf)] = snapshot("mhlsh-incr", sf, f"mh-{tag}",
                                            ("documents",))
            if "semdedup" in fams:
                run_full(QUERIES["semdedup_incremental"](spark, sf))
                arts[("sd", sf)] = snapshot("semdedup-incr", sf,
                                            f"sd-{tag}", ("embeddings",))
            if "exact" in fams:
                run_full(QUERIES["dedup_incremental"](spark, sf))
                arts[("ex", sf)] = snapshot("exact-incr", sf, f"ex-{tag}",
                                            ("documents",))
            if "clusters" in fams:
                run_full(QUERIES["dedup_clusters_incremental"](spark, sf))
                arts[("cl", sf)] = snapshot("clinc-incr", sf, f"cl-{tag}",
                                            ("documents",))

    if "minhash" in fams:
        # fixed batch = sf1's staged batch signatures
        fixed_sig = os.path.join(SCRATCH, "mh-batch-sig")
        shutil.copytree(L.minhash_batch_sig_path(arts[("mh", SF1)]),
                        fixed_sig)
        runners["minhash"] = lambda sf: run_full(
            L.minhash_incr_pairs(spark, arts[("mh", sf)], fixed_sig))

    if "semdedup" in fams:
        bucket = (
            F.conv(F.substring(
                F.md5(F.concat(F.lit("sdinc:"),
                               F.col("vec_id").cast("string"))),
                1, 8), 16, 10).cast("long") % 100
        )
        fixed_vecs = (
            Catalog(spark, SF1).table("embeddings")
            .filter(bucket >= 90)
            .select("vec_id",
                    V.l2_normalize(V.as_double(F.col("embedding")))
                    .alias("nv"))
        )
        # centroids load once per base OUTSIDE the timed region — a
        # production ingest holds the frozen centroid matrix resident;
        # the timed region is tag + prune-cogroup, the per-batch work
        cents_by = {sf: L.semdedup_incr_load_cents(arts[("sd", sf)])
                    for sf in (SF1, SF10)}

        def sd_run(sf):
            batch = (
                L.semdedup_incr_tag(fixed_vecs, cents_by[sf])
                .select("vec_id", "cell", F.col("cdot").alias("prio"),
                        "nv")
            )
            run_full(L.semdedup_incr_batch_rec(spark, arts[("sd", sf)],
                                               batch))

        runners["semdedup"] = sd_run

    if "exact" in fams:
        fixed_h = os.path.join(SCRATCH, "ex-batch-hashes")
        shutil.copytree(os.path.join(arts[("ex", SF1)], "batch"), fixed_h)
        runners["exact"] = lambda sf: run_full(
            L.exact_incr_new(spark, arts[("ex", sf)], fixed_h))

    if "clusters" in fams:
        fixed_cl = os.path.join(SCRATCH, "cl-batch-sig")
        shutil.copytree(L.minhash_batch_sig_path(arts[("cl", SF1)]),
                        fixed_cl)
        runners["clusters"] = lambda sf: run_full(
            L.clusters_incr_update(spark, arts[("cl", sf)], fixed_cl))

    if "text_index" in fams:
        # untimed: base postings per corpus + staged fixed batch docs
        tix = {}
        for sf, tag in ((SF1, "sf1"), (SF10, "sf10")):
            out = os.path.join(SCRATCH, f"tix-{tag}")
            base_docs = (Catalog(spark, sf).table("documents")
                         .filter(F.col("doc_id") % 10 != 0))
            P.boolean_postings(base_docs).write.mode(
                "overwrite").partitionBy("tb").parquet(out)
            tix[sf] = out
        fixed_docs = os.path.join(SCRATCH, "tix-batch-docs")
        (Catalog(spark, SF1).table("documents")
         .filter(F.col("doc_id") % 10 == 0)
         .select("doc_id", "text")
         .write.parquet(fixed_docs))
        runners["text_index"] = lambda sf: (
            P.boolean_postings(spark.read.parquet(fixed_docs))
            .write.mode("append").partitionBy("tb").parquet(tix[sf]))

    if "pos_index" in fams:
        # positional twin (r13): the timed ingest is batch postings +
        # doc-length append PLUS the integer stats update — the sidecar
        # maintenance ensure_text_index_positional_incremental runs
        import json as _json

        pix = {}
        for sf, tag in ((SF1, "sf1"), (SF10, "sf10")):
            out = os.path.join(SCRATCH, f"pix-{tag}")
            base_docs = (Catalog(spark, sf).table("documents")
                         .filter(F.col("doc_id") % 10 != 0))
            P.positional_postings(base_docs).write.mode(
                "overwrite").partitionBy("tb").parquet(out)
            dl = P.doc_lengths(base_docs)
            dl.write.mode("overwrite").parquet(out + "-len")
            st = dl.agg(F.count(F.lit(1)).alias("n"),
                        F.sum("dl").alias("s")).collect()[0]
            with open(out + "-len/_stats.json", "w") as fh:
                _json.dump({"n_docs": int(st.n), "dl_sum": int(st.s)}, fh)
            pix[sf] = out
        fixed_pdocs = os.path.join(SCRATCH, "pix-batch-docs")
        (Catalog(spark, SF1).table("documents")
         .filter(F.col("doc_id") % 10 == 0)
         .select("doc_id", "text")
         .write.parquet(fixed_pdocs))

        def pix_run(sf):
            bd = spark.read.parquet(fixed_pdocs)
            P.positional_postings(bd).write.mode(
                "append").partitionBy("tb").parquet(pix[sf])
            dlb = P.doc_lengths(bd)
            dlb.write.mode("append").parquet(pix[sf] + "-len")
            bst = dlb.agg(F.count(F.lit(1)).alias("n"),
                          F.sum("dl").alias("s")).collect()[0]
            with open(pix[sf] + "-len/_stats.json") as fh:
                st = _json.load(fh)
            st = {"n_docs": st["n_docs"] + int(bst.n),
                  "dl_sum": st["dl_sum"] + int(bst.s or 0)}
            with open(pix[sf] + "-len/_stats.json", "w") as fh:
                _json.dump(st, fh)

        runners["pos_index"] = pix_run

    if "sim_index" in fams:
        six = {}
        for sf, tag in ((SF1, "sf1"), (SF10, "sf10")):
            d = os.path.join(SCRATCH, f"six-{tag}")
            os.makedirs(d, exist_ok=True)
            ann_index.build_ivfpq_index(
                spark, sf, d, id_filter=F.col("vec_id") % 10 != 0)
            six[sf] = d
        # the timed region reads the FIXED sf1 batch vectors, encodes
        # with each base's frozen codebooks, appends into its cells
        runners["sim_index"] = lambda sf: ann_index.append_ivfpq_batch(
            spark, SF1, six[sf], F.col("vec_id") % 10 == 0)

    results = {}
    for fam in fams:
        runner = runners[fam]
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
