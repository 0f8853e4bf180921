"""Interleaved A/B for the rolling-interval window under KEY SKEW: the
plain keyed window (one task owns a user's whole history) vs the
time-block-salted two-phase form (window_rolling_range_salted's shape).

Dataset (built once, cached in /tmp): events-like rows where ONE user
holds ~30% of all rows spread over ~60 days — the bot-account shape that
melts a keyed window task. Both arms compute the identical 1-hour
trailing count/sum per row; the script asserts value equality before
timing.

Usage: python scripts/bench_skew_window.py [n_rows] [rounds]
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

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from etl_backend_spark.session import get_spark  # noqa: E402

N_USERS = 10_000
SPAN_US = 60 * 86_400 * 1_000_000  # 60 days
W_US = 3_600_000_000  # 1-hour frame = block width


def data(spark, n_rows: int):
    import tempfile

    d = os.path.join(
        tempfile.gettempdir(), f"etlbs-u{os.getuid()}-skewwin-{n_rows}"
    )
    p = f"{d}/events.parquet"
    if not os.path.isdir(p):
        df = spark.range(n_rows).select(
            F.col("id").alias("event_id"),
            F.when(F.pmod(F.xxhash64("id"), 10) < 3, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id", F.lit(1)), N_USERS))
            .alias("user_id"),
            F.pmod(F.xxhash64("id", F.lit(2)), SPAN_US).alias("us"),
            F.pmod("id", F.lit(1000)).cast("double").alias("value"),
        )
        df.repartition(32).write.mode("overwrite").parquet(p)
    return spark.read.parquet(p)


def arms(ev):
    def plain():
        w = (
            Window.partitionBy("user_id").orderBy("us").rangeBetween(-W_US, 0)
        )
        return ev.select(
            "event_id", "user_id",
            F.count(F.lit(1)).over(w).alias("n_1h"),
            F.round(F.sum("value").over(w), 4).alias("sum_1h"),
        )

    def salted():
        base = ev.select(
            "event_id", "user_id", "value", "us",
            F.floor(F.col("us") / W_US).cast("long").alias("__blk"),
        )
        owners = base.withColumn("__own", F.lit(1))
        donors = (
            base.withColumn("__blk", F.col("__blk") + 1)
            .withColumn("__own", F.lit(0))
        )
        w = (
            Window.partitionBy("user_id", "__blk")
            .orderBy("us")
            .rangeBetween(-W_US, 0)
        )
        return (
            owners.unionByName(donors)
            .select(
                "event_id", "user_id", "__own",
                F.count(F.lit(1)).over(w).alias("n_1h"),
                F.round(F.sum("value").over(w), 4).alias("sum_1h"),
            )
            .filter(F.col("__own") == 1)
            .select("event_id", "user_id", "n_1h", "sum_1h")
        )

    return {"plain": plain, "salted": salted}


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    spark = get_spark(app_name="bench-skew-window")
    spark.sparkContext.setLogLevel("ERROR")
    ev = data(spark, n_rows)
    A = arms(ev)

    agg = lambda df: sorted(  # noqa: E731 — value-equality fingerprint
        map(
            tuple,
            df.agg(
                F.count(F.lit(1)), F.sum("n_1h"), F.round(F.sum("sum_1h"), 2)
            ).collect(),
        )
    )
    assert agg(A["plain"]()) == agg(A["salted"]())

    times: dict[str, list[float]] = {k: [] for k in A}
    for _ in range(rounds):
        for name, fn in A.items():  # strict interleave
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            times[name].append(time.perf_counter() - t0)

    med = {k: round(statistics.median(v), 3) for k, v in times.items()}
    print(json.dumps({
        "n_rows": n_rows, "n_users": N_USERS, "hot_share": 0.3,
        "span_days": 60, "rounds": rounds, "median_s": med,
        "salted_vs_plain_pct": round(
            100.0 * (med["plain"] - med["salted"]) / med["salted"], 1
        ),
    }))


if __name__ == "__main__":
    main()
