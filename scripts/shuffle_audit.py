"""Shuffle cost audit: MEASURED bytes-over-network per headline query.

For every headline query, runs it once warm and once measured, then
reads the Spark UI REST API's per-stage metrics (shuffle write bytes)
for exactly the stages the measured run created. The deliverable is the
SHUFFLE AMPLIFICATION factor

    amp = shuffle_bytes_written / on_disk_bytes_of_scanned_tables

which is the quantity that decides 100-TB viability: a cluster whose
tables total 100 TB moves amp x 100 TB across the network for this
query (shuffle data is also read back once, but write volume is the
budgeted number). The denominator is the physical size of every file
the plan's FileScans point at (parsed from the executed plan; a table
scanned twice counts twice) — NOT the post-pruning bytes-read metric,
so column pruning and partition pruning show up as LOW amp, which is
the point: amp already rewards plans that avoid touching data. The
REST input-bytes metric is kept as a secondary column (it underreports
OS-cached local parquet reads). Exchange node counts (shuffle /
broadcast / reused) come from the executed plan string. SCALE.md's
cost-model section interprets the numbers; this script regenerates
them.

Usage: python scripts/shuffle_audit.py [sf_dir] [query ...]
Prints one JSON line per query and a closing summary line.
"""

from __future__ import annotations

import json
import re
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import BENCH_EXTRA, HEADLINE, run_full  # noqa: E402
from etl_backend_spark.registry import QUERIES  # noqa: E402
from etl_backend_spark.session import get_spark  # noqa: E402


def _api(base: str, path: str):
    with urllib.request.urlopen(f"{base}{path}", timeout=10) as r:
        return json.loads(r.read())


def _stages(base: str, app_id: str):
    out = {}
    for s in _api(base, f"/api/v1/applications/{app_id}/stages"):
        # attempts of the same stage id share the id; keep the union
        key = (s["stageId"], s.get("attemptId", 0))
        out[key] = (
            s.get("shuffleWriteBytes", 0),
            s.get("inputBytes", 0),
            s.get("shuffleReadBytes", 0),
        )
    return out


def _dir_bytes(path: Path) -> int:
    if path.is_file():
        return path.stat().st_size
    return sum(f.stat().st_size for f in path.rglob("*") if f.is_file())


def _table_root(path: str) -> Path:
    """Normalize a (possibly per-file / per-partition) plan location to
    its top-level table root: the outermost *.parquet file-or-dir, or a
    derived *_layout directory."""
    q = Path(path)
    root = None
    while str(q) != "/":
        if ".parquet" in q.name or q.name.endswith("_layout"):
            root = q
        q = q.parent
    return root or Path(path)


def _scanned_bytes(plan: str, _seen: frozenset = frozenset()) -> int:
    """Physical on-disk bytes under every 'Scan parquet' node in the
    plan (each node's truncated location list is normalized to its
    table root). A table scanned by two nodes is read twice and counts
    twice.

    Scans of a per-query ARTIFACT (the decision-record pattern: the
    query writes its record, then returns a scan of it — semdedup's
    assignment, pagerank's ranks) resolve TRANSITIVELY through
    ann.index.ARTIFACT_SOURCE_PLANS to the write-side plan's real
    table scans, the CHECKPOINT_SOURCE_PLANS discipline applied to
    artifacts: without this the denominator sees only the KB-scale
    record while the numerator includes the write job's shuffle
    (late-r11 fix). The artifact's own bytes count too (they are real
    I/O); a cycle guard caps the recursion."""
    from etl_backend_spark.ann.index import (ARTIFACT_SOURCE_PLANS,
                                             ARTIFACT_UNATTRIBUTED)

    total = 0
    sizes: dict[str, int] = {}
    for seg in re.split(r"Scan parquet", plan)[1:]:
        m = re.search(r"file:(/[^\s\],)\"]+)", seg)
        if not m:
            continue
        root = _table_root(m.group(1))
        key = str(root)
        if key not in sizes:
            sizes[key] = _dir_bytes(root)
        total += sizes[key]
        real = str(Path(key).resolve())
        if real in ARTIFACT_UNATTRIBUTED:
            # checkpoint-chained producer (pagerank): write-side scans
            # unrecoverable by design — poison the denominator so the
            # query reports amp None, the plain-localCheckpoint honesty
            # rule
            raise _UnattributedArtifact(real)
        if real not in _seen:
            for src in ARTIFACT_SOURCE_PLANS.get(real, []):
                total += _scanned_bytes(src, _seen | {real})
    return total


class _UnattributedArtifact(Exception):
    pass


def _checkpoint_scanned_bytes(df) -> int:
    """FileScan bytes hidden behind localCheckpoint leaves (r9, VERDICT
    r8 #2): a declared-layout checkpoint (graph_reachability's edge
    relation) bottoms the measured plan out at a LogicalRDD, so the
    tables its materialization read are invisible to _scanned_bytes.
    localcheckpoint_declared records each checkpoint's PRE-checkpoint
    executed plan(s) keyed by rdd id — chained declared checkpoints
    included (CHECKPOINT_SOURCE_PLANS); this resolves every LogicalRDD
    leaf of the measured frame through that map via the shared
    plan-walker and sums the recorded plans' FileScan bytes. Plain
    (unrecorded) localCheckpoint leaves contribute 0 and keep their
    queries honestly unattributed (amp None)."""
    from etl_backend_spark.operators.windows import (
        CHECKPOINT_SOURCE_PLANS, iter_logicalrdd_rdds)

    total = 0
    try:
        for rdd in iter_logicalrdd_rdds(df):
            for src in CHECKPOINT_SOURCE_PLANS.get(rdd.id(), []):
                total += _scanned_bytes(src)
    except Exception:
        return 0
    return total


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args.pop(0) if args and "/" in args[0] else "/root/testdata/sf0.1"
    names = args or list(HEADLINE)

    spark = get_spark(app_name="shuffle-audit",
                      extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    rows = []
    for name in names:
        q = BENCH_EXTRA.get(name) or QUERIES[name]
        df = q(spark, sf_dir)
        # run_full, NOT count(): count() lets Catalyst prune non-key
        # columns out of aggregates, under-reporting shuffle bytes
        # (e.g. dedup pair rows drop the cos column, ~33% light); it
        # also releases plan localCheckpoints so storage does not
        # accumulate across the sweep (both: bench.py's documented
        # lessons, re-found by the r8 code review)
        run_full(df)  # warm: caches plan/codegen, fills file caches
        before = set(_stages(ui, app_id))
        df2 = q(spark, sf_dir)
        # resolve checkpoint-hidden scans BEFORE run_full: the release
        # pass inside run_full drops CHECKPOINT_SOURCE_PLANS entries
        # along with the blocks (the builder call above just recorded
        # them)
        cp_scanned = _checkpoint_scanned_bytes(df2)
        t0 = time.time()
        run_full(df2)
        sec = time.time() - t0
        after = _stages(ui, app_id)
        new = [after[k] for k in set(after) - before]
        sw = sum(x[0] for x in new)
        inp = sum(x[1] for x in new)
        plan = df2._jdf.queryExecution().executedPlan().toString()
        n_reuse = len(re.findall(r"ReusedExchange", plan))
        n_bcast = len(re.findall(r"BroadcastExchange", plan))
        n_shuf = len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition|RoundRobinPartitioning)", plan))
        # checkpoint-hidden scans (graph_reachability's declared-layout
        # edge relation) resolve through CHECKPOINT_SOURCE_PLANS — the
        # r8 model's one unattributed row now gets a true denominator
        try:
            scanned = _scanned_bytes(plan) + cp_scanned
        except _UnattributedArtifact:
            scanned = 0  # amp reports None below (honestly unattributed)
        amp = round(sw / scanned, 3) if scanned else (None if sw else 0.0)
        row = {
            "query": name, "sec": round(sec, 2),
            "scanned_tables_mb": round(scanned / 1e6, 2),
            "bytes_read_metric_mb": round(inp / 1e6, 2),
            "shuffle_write_mb": round(sw / 1e6, 2),
            "amp": amp,
            "exchanges": n_shuf, "broadcasts": n_bcast, "reused": n_reuse,
            "tb_over_network_at_100tb_tables":
                round(amp * 100, 1) if amp is not None else None,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    rows.sort(key=lambda r: -(r["amp"] or 0))
    print(json.dumps({
        "sf_dir": sf_dir,
        "worst_amp": [(r["query"], r["amp"]) for r in rows[:10]],
        "zero_shuffle": [r["query"] for r in rows if r["shuffle_write_mb"] == 0],
        "unattributed": [r["query"] for r in rows if r["amp"] is None],
    }))


if __name__ == "__main__":
    main()
