"""Synthesize an sf1-scale testdata directory (10x sf0.1) for the scaling
curve's fourth decade.

Method: key-shifted replication. Each of the 10 replicas shifts every
PK/FK family by ``replica * (max_key + 1)``, so FK integrity and join
cardinality SHAPES are preserved exactly (each replica joins within
itself); the fixed dimensions (region, nation) are copied as-is, like
TPC-H does at every scale factor. Events additionally shift ``ts`` by
``replica * 31 days`` so the event timeline extends instead of stacking
(sessionization and as-of shapes stay realistic).

Documents replicate with a per-replica DISJOINT vocabulary: every token in
replica r>0 gets an ``x{r}`` suffix, so each replica keeps its internal
exact-dup/near-dup structure bit-for-bit (the suffix map is injective and
uniform within a replica — shingle sets and Jaccard similarities are
preserved exactly) while no duplicate pair ever spans replicas. Without
this, textual replicas would be near-duplicates of each OTHER and the
dedup workload would grow quadratically instead of scaling.

Embeddings replicate with a per-replica isometry: circular dimension shift
by ``r*6`` plus sign-flip of the first ``r`` dims. Both preserve norms and
within-replica inner products exactly (cosine structure intact), while
cross-replica cosines decorrelate to noise — same rationale as the token
suffix, in vector space.

Output: $SPARK_GRAFT_SF1_DIR (default /tmp/etlbs-sf1)/<table>.parquet,
written once (skipped if the _BUILT marker exists).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_backend_spark.session import get_spark  # noqa: E402
from etl_backend_spark.sources.catalog import load_table  # noqa: E402

# Generalized (r6): SRC/OUT/REPLICAS come from the environment, so the
# same key-shifted replication builds the FIFTH decade too —
#   SPARK_GRAFT_SFSRC_DIR=/tmp/etlbs-sf1 SPARK_GRAFT_SF1_DIR=/tmp/etlbs-sf10 \
#   python scripts/make_sf1.py
# (replicating sf1 by 10; all invariants — FK integrity, disjoint vocab,
# per-replica isometry — compose across applications).
SRC = os.environ.get("SPARK_GRAFT_SFSRC_DIR", "/root/testdata/sf0.1")
OUT = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/etlbs-sf1")
REPLICAS = int(os.environ.get("SPARK_GRAFT_REPLICAS", "10"))

# per-table key columns and the key family each belongs to; every column in
# one family shifts by the same per-replica offset so joins stay intact
SHIFTS = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "events": {"event_id": "eventid", "user_id": "userid"},
}
COPY = ["region", "nation"]


def main() -> None:
    # V2 adds documents/embeddings; tables already on disk are skipped, so
    # upgrading an existing V1 dir only builds the text/vector tables
    marker = os.path.join(OUT, "_BUILT_V2")
    if os.path.exists(marker):
        print(f"{OUT} already built")
        return
    spark = get_spark(app_name="make-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)

    # one offset per key family = max over every column in the family + 1
    family_cols: dict[str, list[tuple[str, str]]] = {}
    for table, cols in SHIFTS.items():
        for col, fam in cols.items():
            family_cols.setdefault(fam, []).append((table, col))
    offsets: dict[str, int] = {}
    for fam, cols in family_cols.items():
        m = 0
        for table, col in cols:
            v = load_table(spark, table, SRC).agg(F.max(col)).collect()[0][0]
            m = max(m, int(v))
        offsets[fam] = m + 1

    for table in COPY:
        out_path = os.path.join(OUT, f"{table}.parquet")
        if os.path.isdir(out_path):
            continue
        load_table(spark, table, SRC).write.mode("overwrite").parquet(out_path)

    for table, cols in SHIFTS.items():
        if os.path.isdir(os.path.join(OUT, f"{table}.parquet")):
            print(f"skip {table} (exists)")
            continue
        if table == "events":
            # unit-normalized raw read (µs TimestampType whatever the
            # source's physical unit); written back as TIMESTAMP_MICROS so
            # the sf1 file round-trips through the same sniffing loader
            from etl_backend_spark.sources.catalog import read_events_raw

            spark.conf.set(
                "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
            )
            base = read_events_raw(spark, f"{SRC}/{table}.parquet")
        else:
            base = load_table(spark, table, SRC)
        rep = base.withColumn(
            "__r", F.explode(F.lit(list(range(REPLICAS))))
        )
        for col, fam in cols.items():
            rep = rep.withColumn(
                col, F.col(col) + F.col("__r") * F.lit(offsets[fam])
            )
        if table == "events":
            rep = rep.withColumn(
                "ts",
                F.expr(
                    "timestamp_micros(unix_micros(ts)"
                    " + __r * cast(31 * 86400 as long) * 1000000)"
                ),
            )
        out_path = os.path.join(OUT, f"{table}.parquet")
        rep.drop("__r").repartition(16).write.mode("overwrite").parquet(out_path)
        print(f"wrote {table}: {REPLICAS}x")

    docs_out = os.path.join(OUT, "documents.parquet")
    if not os.path.isdir(docs_out):
        docs = load_table(spark, "documents", SRC)
        doc_off = int(docs.agg(F.max("doc_id")).collect()[0][0]) + 1
        rep = docs.withColumn("__r", F.explode(F.lit(list(range(REPLICAS)))))
        rep = (
            rep.withColumn("doc_id", F.col("doc_id") + F.col("__r") * F.lit(doc_off))
            # replica 0 keeps the original bytes; r>0 suffixes every token
            # with x{r} — injective per replica, so within-replica dup and
            # Jaccard structure is preserved exactly, disjoint across
            .withColumn(
                "text",
                F.when(F.col("__r") == 0, F.col("text")).otherwise(
                    F.regexp_replace(
                        "text", r"(\w+)",
                        F.concat(F.lit(r"$1x"), F.col("__r").cast("string")),
                    )
                ),
            )
            .withColumn("n_chars", F.length("text").cast("long"))
        )
        rep.drop("__r").repartition(16).write.mode("overwrite").parquet(docs_out)
        print(f"wrote documents: {REPLICAS}x (disjoint vocab)")

    emb_out = os.path.join(OUT, "embeddings.parquet")
    if not os.path.isdir(emb_out):
        emb = load_table(spark, "embeddings", SRC)
        vec_off = int(emb.agg(F.max("vec_id")).collect()[0][0]) + 1
        dim = len(emb.select("embedding").first()[0])
        rep = emb.withColumn("__r", F.explode(F.lit(list(range(REPLICAS)))))
        shift = (F.col("__r") * F.lit(6)) % F.lit(dim)
        rotated = F.concat(
            F.slice("embedding", shift + 1, F.lit(dim) - shift),
            F.slice("embedding", F.lit(1), shift),
        )
        # sign-flip the first r dims after rotation: still an isometry
        flipped = F.transform(
            rotated,
            lambda x, i: F.when(i < F.col("__r"), -x).otherwise(x),
        )
        rep = (
            rep.withColumn("vec_id", F.col("vec_id") + F.col("__r") * F.lit(vec_off))
            .withColumn("embedding", flipped.cast("array<float>"))
        )
        rep.drop("__r").repartition(16).write.mode("overwrite").parquet(emb_out)
        print(f"wrote embeddings: {REPLICAS}x (per-replica isometry)")

    open(marker, "w").close()
    open(os.path.join(OUT, "_BUILT"), "w").close()
    print(f"built {OUT}")


if __name__ == "__main__":
    main()
