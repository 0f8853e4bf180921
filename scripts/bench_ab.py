"""Interleaved A/B benchmark: the only defensible way to compare two
timings on this VM (neighbor load swings identical plans 2-10x between
sessions — BASELINE.md). Sequential medians confound "B is slower" with
"the machine got slower while B ran"; strict A,B,A,B,... interleaving
within ONE session gives both arms the same noise process, and the
per-round deltas carry it as a paired sample.

Null-experiment mode (one query name): arm B is the SAME builder as arm A.
Any apparent A-vs-B delta is then pure measurement noise — run this to get
the noise floor before believing any cross-round regression of similar
size (the round-2 "sim_topk_pandas +31%" question).

Oracle mode (qB == "oracle"): arm B runs qA's DuckDB oracle SQL over the
same parquet — the interleaved engine-vs-oracle ratio VERDICT r3 asked for
on dedup_ngram_jaccard (single sequential runs on this VM cannot place a
query on either side of the 2x bar).

Usage:
    python scripts/bench_ab.py [sf_dir] qA [qB|oracle] [rounds]

Prints one JSON line:
    {"a": ..., "b": ..., "rounds": N, "a_median": s, "b_median": s,
     "delta_median_pct": p, "deltas_pct": [...], "null": bool}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import run_full  # noqa: E402
from etl_backend_spark.registry import QUERIES  # noqa: E402
from etl_backend_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = args.pop(0) if args and "/" in args[0] else "/root/testdata/sf0.1"
    qa = args.pop(0)
    qb = args.pop(0) if args and not args[0].isdigit() else qa
    rounds = int(args.pop(0)) if args else 9
    null = qa == qb

    spark = get_spark(app_name="bench-ab")
    spark.sparkContext.setLogLevel("ERROR")

    if qb == "oracle":
        import duckdb

        from etl_backend_spark.registry import ORACLES
        from etl_backend_spark.sources.catalog import TABLES

        con = duckdb.connect()
        con.execute(f"SET threads TO {os.cpu_count()}")
        for t in TABLES:
            # synthetic decades (make_sf1) store tables as DIRECTORIES of
            # part files; testdata drops are single files
            p = f"{sf_dir}/{t}.parquet"
            if os.path.isdir(p):
                p = f"{p}/*.parquet"
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
        osql = ORACLES[qa]

    def once(name: str) -> float:
        t0 = time.perf_counter()
        if name == "oracle":
            con.execute(osql).fetchall()
        else:
            run_full(QUERIES[name](spark, sf_dir))
        return time.perf_counter() - t0

    once(qa), once(qb)  # warm both arms (page cache, codegen)
    a_s, b_s, deltas = [], [], []
    for _ in range(rounds):
        ta, tb = once(qa), once(qb)
        a_s.append(ta)
        b_s.append(tb)
        deltas.append(round(100.0 * (tb - ta) / ta, 1))

    am, bm = statistics.median(a_s), statistics.median(b_s)
    print(json.dumps({
        "a": qa, "b": qb, "rounds": rounds, "null": null,
        "a_median": round(am, 3), "b_median": round(bm, 3),
        "delta_median_pct": round(100.0 * (bm - am) / am, 1),
        "deltas_pct": deltas,
    }))


if __name__ == "__main__":
    main()
