"""Measure the DuckDB-oracle baseline for the bench headline queries and the
engine/oracle ratio (driver acceptance: engine ≤ 2x oracle per query).

Usage: python scripts/bench_baseline.py [sf_dir]
Prints a markdown table + one JSON line.
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import BENCH_EXTRA, HEADLINE, RUNS, time_query  # noqa: E402
from etl_backend_spark.registry import ORACLES, QUERIES  # noqa: E402
from etl_backend_spark.session import get_spark  # noqa: E402
from etl_backend_spark.sources.catalog import TABLES  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    spark = get_spark(app_name="bench-baseline")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for name in HEADLINE:
        if name not in ORACLES:
            continue
        sql = ORACLES[name]
        con.execute(sql).fetchall()  # warm-up
        samples = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            samples.append(time.perf_counter() - t0)
        oracle_s = statistics.median(samples)
        engine_s = time_query(BENCH_EXTRA.get(name) or QUERIES[name], spark, sf_dir)
        rows.append((name, round(oracle_s, 3), round(engine_s, 3),
                     round(engine_s / oracle_s, 2)))

    print(f"| query | oracle s | engine s | ratio |")
    print(f"|---|---|---|---|")
    for r in rows:
        print(f"| {r[0]} | {r[1]} | {r[2]} | {r[3]} |")
    print(json.dumps({
        "sf_dir": sf_dir,
        "per_query": {r[0]: {"oracle_s": r[1], "engine_s": r[2], "ratio": r[3]} for r in rows},
    }))


if __name__ == "__main__":
    main()
