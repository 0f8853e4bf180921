"""Anchor protocol, mechanized (r12, VERDICT #1).

Runs bench.py N times (default 3), validates every run's CPU
calibration probe, and REFUSES to write an anchor unless the window is
verifiably clean:

  * each run's own before/after probe drift must be <= --max-drift
    (default 10%) — catches throttling that sets in mid-run;
  * the cross-run spread of probe readings (worst arm, max/min - 1)
    must be <= --max-drift — catches a window where successive runs
    see different CPU speeds (the r11 failure mode: three median-of-3
    runs of IDENTICAL code totalled 46.4 / 60.8 / 54.2 s).

On success writes the anchor as a FLAT {query: median_sec} JSON (the
same shape every BENCH_anchor_r*.json has, so existing diff tooling
keeps working) plus a sibling <out>.meta.json holding the probe
readings, per-run totals, and the common-key delta vs --baseline.

Usage:
    python scripts/make_anchor.py --out BENCH_anchor_r12.json \
        --baseline BENCH_anchor_r10.json [--rounds 3] [--max-drift 10]
"""

from __future__ import annotations

import argparse
import json
import statistics
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def run_bench(env_extra: dict | None = None) -> dict:
    import os

    env = dict(os.environ)
    env.update(env_extra or {})
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        cwd=str(REPO), env=env, capture_output=True, text=True,
    )
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise SystemExit(f"bench.py failed rc={proc.returncode}")
    line = proc.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--baseline", default=None,
                    help="prior anchor JSON to diff common keys against")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--max-drift", type=float, default=10.0)
    ap.add_argument("--max-steal", type=float, default=2.0,
                    help="max hypervisor steal %% over any run's window")
    ap.add_argument("--max-spread", type=float, default=20.0,
                    help="max cross-run spread of run-mean probe "
                         "readings. Looser than --max-drift on purpose: "
                         "each accepted run is internally clean (drift + "
                         "steal gated), but this host's clean-window "
                         "clock itself wanders 12-15%% across an hour "
                         "(measured: three runs at drift 0.4/4.6/0.5%% "
                         "and steal <=0.34%% spanned 15.4%% on run-mean "
                         "mt) — per-query medians then mix slightly "
                         "different clock epochs, bounded by the spread "
                         "RECORDED in the meta artifact")
    ap.add_argument("--accept-spread", action="store_true",
                    help="FALLBACK (VERDICT r12 #1): when every run is "
                         "internally clean (drift + steal gated) but the "
                         "cross-run spread gate still refuses — the "
                         "measured failure mode where this host's clock "
                         "wanders faster than three 6-minute runs "
                         "complete — write the anchor anyway with "
                         "wide_window=true and the spread recorded as "
                         "the uncertainty band. The NORMALIZED medians "
                         "(per-run wall / that run's own mt quantum) "
                         "stay comparable across clock epochs and are "
                         "the intended diffing column for such anchors.")
    ap.add_argument("--max-attempts", type=int, default=12,
                    help="total bench attempts before giving up — steal "
                         "oscillates on minute scales, so dirty runs are "
                         "DISCARDED and retried rather than poisoning the "
                         "anchor or aborting on the first bad window")
    args = ap.parse_args()

    import time

    from bench import cpu_probe  # noqa: E402 (repo root on sys.path)

    runs, attempts = [], 0
    while len(runs) < args.rounds:
        if attempts >= args.max_attempts:
            raise SystemExit(
                f"REFUSED: only {len(runs)}/{args.rounds} clean runs in "
                f"{attempts} attempts — no anchor written; the host never "
                "offered a clean window")
        attempts += 1
        # pre-flight: a ~3 s probe before committing to a ~6 min bench
        # run; skip the attempt outright if the window is already dirty
        pre = cpu_probe()
        if pre["steal_pct"] > args.max_steal:
            print(f"attempt {attempts}: pre-flight steal "
                  f"{pre['steal_pct']}% — waiting 90 s")
            time.sleep(90)
            continue
        r = run_bench()
        p = r.get("probe") or {}
        print(f"attempt {attempts} (run {len(runs) + 1}/{args.rounds}): "
              f"total={r['value']}s "
              f"probe st={p.get('before', {}).get('st_sec')}->"
              f"{p.get('after', {}).get('st_sec')} "
              f"mt={p.get('before', {}).get('mt_sec')}->"
              f"{p.get('after', {}).get('mt_sec')} "
              f"drift={p.get('drift_pct')}% "
              f"steal={p.get('window_steal_pct')}%")
        if not p:
            raise SystemExit("bench.py output carries no probe readings "
                             "— refusing to anchor")
        if p["drift_pct"] > args.max_drift:
            print(f"  DISCARDED: probe drift {p['drift_pct']}% > "
                  f"{args.max_drift}% (host throttled mid-run)")
            continue
        if p.get("window_steal_pct", 0.0) > args.max_steal:
            print(f"  DISCARDED: window steal {p['window_steal_pct']}% > "
                  f"{args.max_steal}%")
            continue
        runs.append(r)

    # cross-run spread over the gated (32-thread) arm — the st arm is
    # diagnostic only (cold-process single-core ramp, see bench.py).
    # Compared on RUN-LEVEL MEANS (before+after)/2: an individual probe
    # sample carries ~5% clean-window noise, so six raw samples can
    # span >10% with no regime change (observed 12.1% across three
    # runs whose totals agreed within 6%); the run mean halves the
    # sampling noise while still catching the real failure mode — one
    # run measured on a throttled host, another on a fast one.
    spread = None
    wide_window = False
    for arm in ("mt_sec",):
        vals = [(r["probe"]["before"][arm] + r["probe"]["after"][arm]) / 2
                for r in runs]
        spread = round(100.0 * (max(vals) / min(vals) - 1.0), 1)
        if spread > args.max_spread:
            if not args.accept_spread:
                raise SystemExit(
                    f"REFUSED: cross-run probe spread on {arm} run-means "
                    f"is {spread}% > {args.max_spread}% (unstable window: "
                    f"{vals}) — no anchor written (pass --accept-spread "
                    "to take the documented wide-window fallback)")
            wide_window = True
            print(f"WIDE WINDOW accepted: cross-run {arm} spread "
                  f"{spread}% > {args.max_spread}% — wall medians carry "
                  "that band; diff on the normalized column")

    keys = list(runs[0]["queries"].keys())
    anchor = {k: round(statistics.median(
        [r["queries"][k] for r in runs]), 3) for k in keys}
    total = round(sum(anchor.values()), 3)

    # normalized medians (r13, VERDICT #4): per-run queries_norm =
    # wall / window mt-probe quantum (bench.py emits it; derive from the
    # probes for runs made by an older bench.py). Host-speed-free, so
    # cross-round diffs don't carry the measured 12-15%/hour clean-window
    # clock wander the wall column does.
    def run_norm(r: dict) -> dict:
        if "queries_norm" in r:
            return r["queries_norm"]
        p = r["probe"]
        mt = (p["before"]["mt_sec"] + p["after"]["mt_sec"]) / 2.0
        return {k: v / mt for k, v in r["queries"].items()}

    norms = [run_norm(r) for r in runs]
    anchor_norm = {k: round(statistics.median(
        [n[k] for n in norms]), 4) for k in keys}

    meta = {
        "rounds": args.rounds,
        "sf": runs[0]["sf"],
        "total_median_per_query_sec": total,
        "run_totals": [r["value"] for r in runs],
        "run_queries": [r["queries"] for r in runs],
        "probes": [r["probe"] for r in runs],
        "queries_norm_median": anchor_norm,
        "norm_unit": "probe_mt_quanta",
        "max_drift_pct": args.max_drift,
        "cross_run_mt_spread_pct": spread,
        "max_spread_pct": args.max_spread,
        "wide_window": wide_window,
    }
    if args.baseline:
        base = json.loads(Path(args.baseline).read_text())
        common = sorted(set(base) & set(anchor))
        b_sum = round(sum(base[k] for k in common), 3)
        a_sum = round(sum(anchor[k] for k in common), 3)
        meta["baseline"] = {
            "file": args.baseline,
            "common_keys": len(common),
            "baseline_common_sec": b_sum,
            "anchor_common_sec": a_sum,
            # guard the divide: a disjoint key set (renamed/retired
            # queries) must not ZeroDivisionError AFTER the gated runs
            # succeeded and BEFORE the anchor is written (r13 review)
            "delta_pct": (round(100.0 * (a_sum / b_sum - 1.0), 1)
                          if b_sum > 0 else None),
        }
        print(f"common-{len(common)} vs {args.baseline}: "
              f"{b_sum} -> {a_sum} s ({meta['baseline']['delta_pct']:+}%)"
              if b_sum > 0 else
              f"no common keys with {args.baseline} — wall delta skipped")
        # normalized delta needs the baseline's own normalized medians —
        # present in anchors made by this script version (sibling meta);
        # older anchors (r10) predate the probe and get wall-only diffs.
        base_meta_p = Path(args.baseline + ".meta.json")
        if base_meta_p.exists():
            bm = json.loads(base_meta_p.read_text())
            bnorm = bm.get("queries_norm_median")
            ncommon = sorted(set(bnorm or {}) & set(anchor_norm))
            if bnorm and ncommon:
                bn = round(sum(bnorm[k] for k in ncommon), 2)
                an = round(sum(anchor_norm[k] for k in ncommon), 2)
                meta["baseline"]["norm_common_keys"] = len(ncommon)
                meta["baseline"]["baseline_common_norm"] = bn
                meta["baseline"]["anchor_common_norm"] = an
                meta["baseline"]["norm_delta_pct"] = round(
                    100.0 * (an / bn - 1.0), 1)
                print(f"normalized common-{len(ncommon)}: {bn} -> {an} "
                      f"quanta ({meta['baseline']['norm_delta_pct']:+}%)")
            else:
                meta["baseline"]["norm_delta_pct"] = None
        else:
            meta["baseline"]["norm_delta_pct"] = None

    Path(args.out).write_text(
        json.dumps(anchor, indent=1, sort_keys=False) + "\n")
    Path(args.out + ".meta.json").write_text(
        json.dumps(meta, indent=1) + "\n")
    print(f"anchor written: {args.out} (total {total}s, "
          f"probes clean at <={args.max_drift}%)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
