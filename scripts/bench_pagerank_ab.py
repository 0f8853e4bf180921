"""Interleaved A/B: legacy broadcast-ranks PageRank vs the co-partitioned
form (VERDICT r6 #1). The legacy arm lives HERE, not in the engine — it is
the scale-antipattern baseline (per-round driver collect + broadcast of the
|V|-row rank vector), kept only so the swap's parity/perf claim is a paired
measurement per the repo's measurement rules, not a cross-session guess.

Usage:
    python scripts/bench_pagerank_ab.py [sf_dir] [rounds]

Prints one JSON line:
    {"a": "broadcast", "b": "copartitioned", "rounds": N,
     "a_median": s, "b_median": s, "delta_median_pct": p,
     "deltas_pct": [...], "top20_equal": bool}
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from etl_backend_spark.operators.windows import (  # noqa: E402
    release_plan_checkpoints,
)
from etl_backend_spark.registry.llm import (  # noqa: E402
    _pagerank_edges,
    pagerank_ranks,
)
from etl_backend_spark.session import get_spark  # noqa: E402


def _broadcast_form(spark, sf_dir, rounds: int = 15):
    """The r6 engine loop, verbatim shape: en checkpointed unpartitioned,
    ranks collected to the driver and broadcast every round."""
    en = _pagerank_edges(spark, sf_dir)  # materialized by the builder
    nodes = en.select(F.col("s").alias("n")).distinct()
    ranks = nodes.select("n", F.lit(1.0).alias("r"))
    prev = None
    for _ in range(rounds):
        contrib = (
            en.join(F.broadcast(ranks), en["s"] == ranks["n"])
            .groupBy(F.col("d").alias("n2"))
            .agg(F.sum(F.col("frac") * F.col("r")).alias("cin"))
        )
        ranks = (
            nodes.join(contrib, nodes["n"] == contrib["n2"], "left")
            .select(
                "n",
                (F.lit(0.15) + F.lit(0.85) * F.coalesce("cin", F.lit(0.0)))
                .alias("r"),
            )
            .localCheckpoint(eager=True)
        )
        if prev is not None:
            release_plan_checkpoints(prev)
        prev = ranks
    release_plan_checkpoints(en)
    return ranks


def _top20(ranks_df):
    return [
        (r.n, round(r.r, 6))
        for r in ranks_df.orderBy(F.col("r").desc(), F.col("n").asc())
        .limit(20).collect()
    ]


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args.pop(0) if args and "/" in args[0] else "/root/testdata/sf0.1"
    rounds = int(args.pop(0)) if args else 5

    spark = get_spark(app_name="bench-pagerank-ab")
    spark.sparkContext.setLogLevel("ERROR")

    def once(form) -> tuple[float, list]:
        t0 = time.perf_counter()
        df = form(spark, sf_dir)
        top = _top20(df)
        release_plan_checkpoints(df)
        return time.perf_counter() - t0, top

    # warm both arms (page cache, codegen)
    _, top_a = once(_broadcast_form)
    _, top_b = once(pagerank_ranks)
    equal = top_a == top_b

    a_s, b_s, deltas = [], [], []
    for _ in range(rounds):
        ta, _ = once(_broadcast_form)
        tb, _ = once(pagerank_ranks)
        a_s.append(ta)
        b_s.append(tb)
        deltas.append(round(100.0 * (tb - ta) / ta, 1))

    am, bm = statistics.median(a_s), statistics.median(b_s)
    print(json.dumps({
        "a": "broadcast", "b": "copartitioned", "sf_dir": sf_dir,
        "rounds": rounds,
        "a_median": round(am, 3), "b_median": round(bm, 3),
        "delta_median_pct": round(100.0 * (bm - am) / am, 1),
        "deltas_pct": deltas, "top20_equal": equal,
    }))


if __name__ == "__main__":
    main()
