"""Scaling check: run the headline queries at sf0.001 / sf0.01 / sf0.1 and
report the runtime growth factor per 10x data growth. A well-planned query
grows sublinearly in local mode (fixed per-action overhead amortizes; scans
and shuffles parallelize); anything growing >=10x per decade is flagged —
that's the shape that will not survive a 100 TB cluster.

Usage: python scripts/scaling_check.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import HEADLINE, time_query  # noqa: E402
from etl_backend_spark.registry import QUERIES  # noqa: E402
from etl_backend_spark.session import get_spark  # noqa: E402

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    spark = get_spark(app_name="scaling-check")
    spark.sparkContext.setLogLevel("ERROR")

    table: dict[str, list[float]] = {}
    for name in HEADLINE:
        table[name] = [round(time_query(QUERIES[name], spark, sf), 3) for sf in SFS]

    print("| query | sf0.001 s | sf0.01 s | sf0.1 s | x/decade |")
    print("|---|---|---|---|---|")
    flagged = []
    for name, times in table.items():
        growth = (times[2] / times[0]) ** 0.5 if times[0] > 0 else float("inf")
        if growth >= 10:
            flagged.append(name)
        print(f"| {name} | {times[0]} | {times[1]} | {times[2]} | {growth:.2f} |")
    print(json.dumps({"per_query_sec": table, "flagged_superlinear": flagged}))


if __name__ == "__main__":
    main()
