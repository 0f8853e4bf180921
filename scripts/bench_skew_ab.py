"""Interleaved A/B/C benchmark for skew-join strategies on a SKEWED key
distribution at ~sf1 scale (the testdata tables are uniform — skew has to
be synthesized to measure skew handling).

Dataset (built once, cached in /tmp): fact with ~30% of rows on ONE key
(the melting reducer) over `n_keys` otherwise-uniform keys; build with one
row per key. Arms, strictly interleaved per round so all share the same
noise process (scripts/bench_ab.py rationale):

  plain     — fact ⋈ build, whatever AQE does (skew-split can rescue the
              sort-merge case at runtime)
  salt_full — the round-3 form: explode the ENTIRE build side S ways
              before the shuffle (the shape VERDICT r3 flagged: S x build
              shuffle for a handful of hot keys)
  salt_hot  — hot-key-only two-phase salting (operators.joins.salted_join
              with detect_heavy_hitters)

All arms end in the same groupBy so every join materializes fully; the
script asserts all three produce identical aggregates before timing.

Usage: python scripts/bench_skew_ab.py [n_fact] [rounds]
Prints one JSON line with per-arm medians.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_backend_spark.operators.joins import (  # noqa: E402
    detect_heavy_hitters,
    salted_join,
)
from etl_backend_spark.session import get_spark  # noqa: E402

N_KEYS = 2_000_000  # build side ~2M rows: ABOVE the broadcast threshold,
# so the join genuinely shuffles both sides — the regime salting exists for
# (a broadcastable build side never has reducer skew in the first place)
S = 8


def data(spark, n_fact: int):
    import tempfile

    d = os.path.join(
        tempfile.gettempdir(), f"etlbs-u{os.getuid()}-skewbench-{n_fact}"
    )
    fpath, bpath = f"{d}/fact.parquet", f"{d}/build.parquet"
    if not os.path.isdir(fpath):
        fact = spark.range(n_fact).select(
            F.when(
                F.pmod(F.xxhash64("id"), 10) < 3, F.lit(0)
            ).otherwise(F.pmod(F.xxhash64("id", F.lit(1)), N_KEYS)).alias("fk"),
            F.pmod("id", F.lit(1000)).cast("double").alias("v"),
        )
        fact.repartition(32).write.mode("overwrite").parquet(fpath)
        build = spark.range(N_KEYS).select(
            F.col("id").alias("bk"),
            F.pmod("id", F.lit(5)).cast("int").alias("grp"),
        )
        build.repartition(4).write.mode("overwrite").parquet(bpath)
    return spark.read.parquet(fpath), spark.read.parquet(bpath)


def arms(spark, fact, build):
    def finish(j):
        return j.groupBy("grp").agg(
            F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 2).alias("sv")
        )

    def plain():
        return finish(fact.join(build, fact["fk"] == build["bk"]))

    def salt_full():
        f = fact.withColumn("__salt", F.pmod(F.xxhash64("fk", "v"), S).cast("int"))
        b = build.withColumn(
            "__salt", F.explode(F.array(*[F.lit(i) for i in range(S)]))
        )
        return finish(
            f.join(
                b.hint("merge"),
                (f["fk"] == b["bk"]) & (f["__salt"] == b["__salt"]),
            )
        )

    def salt_hot():
        hot = detect_heavy_hitters(fact, "fk", fraction=0.002, min_count=3, top=64)
        return finish(salted_join(fact, build, "fk", "bk", hot, n_salts=S))

    return {"plain": plain, "salt_full": salt_full, "salt_hot": salt_hot}


def main() -> None:
    n_fact = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 7

    spark = get_spark(app_name="bench-skew-ab")
    spark.sparkContext.setLogLevel("ERROR")
    fact, build = data(spark, n_fact)
    A = arms(spark, fact, build)

    # all arms agree before any timing
    ref = None
    for name, fn in A.items():
        got = sorted(map(tuple, fn().collect()))
        if ref is None:
            ref = got
        assert got == ref, f"{name} disagrees with plain"

    times: dict[str, list[float]] = {k: [] for k in A}
    for _ in range(rounds):
        for name, fn in A.items():  # strict interleave
            t0 = time.perf_counter()
            fn().collect()
            times[name].append(time.perf_counter() - t0)

    med = {k: round(statistics.median(v), 3) for k, v in times.items()}
    print(json.dumps({
        "n_fact": n_fact, "n_keys": N_KEYS, "hot_share": 0.3, "s": S,
        "rounds": rounds, "median_s": med,
        "full_vs_hot_pct": round(
            100.0 * (med["salt_full"] - med["salt_hot"]) / med["salt_hot"], 1
        ),
    }))


if __name__ == "__main__":
    main()
