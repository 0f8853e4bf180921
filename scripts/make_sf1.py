"""Synthesize an sf1-scale testdata directory (10x sf0.1) for the scaling
curve's fourth decade.

Method: key-shifted replication. Each of the 10 replicas shifts every
PK/FK family by ``replica * (max_key + 1)``, so FK integrity and join
cardinality SHAPES are preserved exactly (each replica joins within
itself); the fixed dimensions (region, nation) are copied as-is, like
TPC-H does at every scale factor. Events additionally shift ``ts`` by
``replica * 31 days`` so the event timeline extends instead of stacking
(sessionization and as-of shapes stay realistic). Documents/embeddings are
NOT replicated — textual replicas would be synthetic near-duplicates of
each other and corrupt the dedup-family semantics; the dedup scale path is
covered by the LSH operators' own cost model instead.

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

SRC = "/root/testdata/sf0.1"
OUT = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/etlbs-sf1")
REPLICAS = 10

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
    marker = os.path.join(OUT, "_BUILT")
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
        load_table(spark, table, SRC).write.mode("overwrite").parquet(
            os.path.join(OUT, f"{table}.parquet")
        )

    for table, cols in SHIFTS.items():
        if table == "events":
            # keep ts as the RAW int64 nanos (the sf0.1 file stores
            # TIMESTAMP(NANOS); Spark cannot write that back, but a plain
            # INT64 column reads identically through catalog.load_table and
            # the pushdown loader)
            from etl_backend_spark.sources.catalog import SCHEMAS

            base = spark.read.schema(SCHEMAS["events"]).parquet(
                f"{SRC}/{table}.parquet"
            )
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
                F.col("ts")
                + F.col("__r").cast("long") * F.lit(31 * 86400 * 1_000_000_000),
            )
        out_path = os.path.join(OUT, f"{table}.parquet")
        rep.drop("__r").repartition(16).write.mode("overwrite").parquet(out_path)
        print(f"wrote {table}: {REPLICAS}x")

    open(marker, "w").close()
    print(f"built {OUT}")


if __name__ == "__main__":
    main()
