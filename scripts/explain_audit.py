"""Plan hygiene audit: print the physical plan of each headline query and
flag anti-patterns (cartesian products, row-at-a-time Python evals on the
hot path, missing pushdown, unexpected sort-merge joins of broadcast-sized
dims). The per-operator scale argument lives in the module docstrings; this
script is the evidence.

Usage: python scripts/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import HEADLINE  # noqa: E402
from etl_backend_spark.registry import QUERIES  # noqa: E402
from etl_backend_spark.session import get_spark  # noqa: E402

# acceptable: BroadcastNestedLoopJoin only for tiny broadcast probe sides
FLAGS = {
    "CartesianProduct": "all-pairs join — never acceptable at scale",
    "BatchEvalPython": "row-at-a-time Python UDF on the path",
}


def audit(name: str, plan: str) -> list[str]:
    problems = []
    for marker, why in FLAGS.items():
        if marker in plan:
            problems.append(f"{marker}: {why}")
    # a Sort/Window fed by Exchange SinglePartition = one task sorts the
    # whole table (a bare SinglePartition under a global agg is fine: the
    # partial agg reduced each partition to one row first)
    if re.search(r"(Sort|Window) [^\n]*\n[^\n]*Exchange SinglePartition", plan):
        problems.append("global sort/window into a single partition")
    n_exchanges = len(re.findall(r"Exchange (hashpartitioning|rangepartitioning|SinglePartition)", plan))
    n_scans = plan.count("Scan parquet")
    problems_str = "; ".join(problems) if problems else "clean"
    print(f"{name}: exchanges={n_exchanges} scans={n_scans} [{problems_str}]")
    return problems


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or HEADLINE
    spark = get_spark(app_name="explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    verbose = len(sys.argv) > 2

    from bench import BENCH_EXTRA  # bench-only twins (data_profile_hll)

    bad = {}
    for name in names:
        df = (BENCH_EXTRA.get(name) or QUERIES[name])(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        problems = audit(name, plan)
        if problems:
            bad[name] = problems
        if verbose:
            # PySpark 4: explainString needs an ExplainMode object, not a
            # bare string — go through the public API instead.
            print(f"== {name} ==")
            df.explain(mode="formatted")
    if bad:
        print(f"\nFLAGGED: {bad}")
        sys.exit(1)
    print("\nall plans clean")


if __name__ == "__main__":
    main()
