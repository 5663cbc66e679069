#!/usr/bin/env python3
"""Round-close health check — run before ending a round.

The r8 regression (3 queries broken by a fixture re-encoding) hid for two
rounds because nobody compared artifact cardinalities: BENCH_r08 listed 3
entries in "failed" and CORRECTNESS_r08 silently dropped from 97 to 94
entries. This script turns both conditions into a nonzero exit.

Checks (each prints RED/OK):
  1. latest bench json (full tools/bench_local/r*_local.json preferred,
     tail-truncated BENCH_r*.json fallback): "failed" must be [].
  2. latest CORRECTNESS_r*.json: every entry must be green — oracle rows
     + schema + hash all true, or err == "no_oracle" (gated queries).
  3. cardinality: |CORRECTNESS entries| must equal |bench "queries" keys|
     (both surfaces are SparkEntry.queries; a shortfall means some query
     threw during Verify and its dump was skipped).

Usage: python3 tools/round_health.py [--verify-out DIR]
  --verify-out: also check a local graft.Verify output dir — its dump
  count must match the bench query count (for pre-driver local closes).
"""
import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def round_no(p):
    m = re.search(r"r(\d+)", os.path.basename(p))
    return int(m.group(1)) if m else -1


def is_full_json(p):
    try:
        json.load(open(p))
        return 1
    except (json.JSONDecodeError, OSError):
        return 0


def latest(*patterns):
    """Highest-round file across all patterns; on a round tie, a full
    (parseable) file beats a tail-truncated driver artifact."""
    files = [f for pat in patterns for f in glob.glob(os.path.join(ROOT, pat))]
    if not files:
        return None
    return max(files, key=lambda p: (round_no(p), is_full_json(p)))


def salvage(text):
    """Recover failed + a query-name lower bound from a truncated bench
    line (the driver keeps only the tail; the reps-map fragment still
    names most queries)."""
    names = set(re.findall(r'"([A-Za-z0-9_]+)":\s*-?[0-9.]+', text))
    names -= {"metric", "value", "sf"}
    m = re.search(r'"failed":\s*(\[[^\]]*\])', text)
    failed = json.loads(m.group(1)) if m else None
    g = re.search(r'"baseline_gate":\s*(\{.*?\})', text)
    gate = None
    if g:
        try:
            gate = json.loads(g.group(1))
        except json.JSONDecodeError:
            pass
    return {"queries": dict.fromkeys(names, None), "failed": failed,
            "baseline_gate": gate, "_truncated": True}


def parse_bench(path):
    """Full bench line, driver wrapper ({"tail": ..., "parsed": ...}),
    or raw-truncated salvage."""
    text = open(path).read().strip()
    try:
        data = json.loads(text)
    except json.JSONDecodeError:
        return salvage(text)
    if isinstance(data, dict) and "tail" in data:  # driver artifact wrapper
        parsed = data.get("parsed")
        if isinstance(parsed, dict) and "queries" in parsed:
            return parsed
        return salvage(data["tail"])
    return data


def main():
    rc = 0
    bench_path = latest("tools/bench_local/r*_local.json", "BENCH_r*.json")
    corr_path = latest("CORRECTNESS_r*.json")
    if not bench_path or not corr_path:
        print(f"RED missing artifacts: bench={bench_path} correctness={corr_path}")
        return 1
    bench = parse_bench(bench_path)
    corr = json.load(open(corr_path))

    failed = bench.get("failed")
    if failed is None:
        print(f"RED {os.path.basename(bench_path)}: 'failed' list unrecoverable (truncated artifact)")
        rc = 1
    elif failed:
        print(f"RED {os.path.basename(bench_path)}: failed queries {failed}")
        rc = 1
    else:
        print(f"OK  {os.path.basename(bench_path)}: failed == []")

    # The bench artifact must contain its own regression-gate verdict
    # (r10 committed four unadjudicated >2x in-sweep readings because the
    # gate only ran in judge heads): a sweep without SPARK_GRAFT_BASELINE=1
    # is not a valid round-close artifact.
    gate = bench.get("baseline_gate")
    status = (gate or {}).get("status")
    if status == "ok":
        print(f"OK  {os.path.basename(bench_path)}: baseline_gate ok")
        # A gated sweep that only passes via isolated retries is the gate
        # working hard, not the environment being honest (r17 had four
        # such passes): warn when the sweep's aggregate-vs-pins exceeds
        # ~1.05 so close sweeps migrate to fresh-host state.
        agg = (gate or {}).get("aggregate_vs_pins")
        if isinstance(agg, (int, float)) and agg > 1.05:
            print(f"WARN {os.path.basename(bench_path)}: aggregate vs pins "
                  f"{agg:.2f} > 1.05 — sweep ran in a contended/post-test "
                  "environment; re-run the close sweep in a fresh process "
                  "(see graft-round-workflow: fresh-host-only close sweeps)")
    elif status == "violations":
        print(f"RED {os.path.basename(bench_path)}: baseline_gate violations "
              f"{gate.get('violations')}")
        rc = 1
    else:
        print(f"RED {os.path.basename(bench_path)}: no baseline_gate verdict — "
              "re-run the sweep with SPARK_GRAFT_BASELINE=1")
        rc = 1

    bad = [name for name, e in corr.items()
           if e.get("err") != "no_oracle"
           and not (e.get("rows_match") and e.get("schema_match") and e.get("hash_match"))]
    if bad:
        print(f"RED {os.path.basename(corr_path)}: non-green entries {sorted(bad)}")
        rc = 1
    else:
        print(f"OK  {os.path.basename(corr_path)}: all {len(corr)} entries green")

    n_bench = len(bench.get("queries", {}))
    if bench.get("_truncated"):
        print(f"WARN bench artifact truncated — query-count floor {n_bench}; "
              "cardinality check uses it as a lower bound only")
        if len(corr) < n_bench:
            print(f"RED cardinality: {len(corr)} correctness entries < {n_bench} bench queries")
            rc = 1
    elif n_bench != len(corr):
        print(f"RED cardinality: {len(corr)} correctness entries != {n_bench} bench queries")
        rc = 1
    else:
        print(f"OK  cardinality: {len(corr)} correctness entries == {n_bench} bench queries")

    for i, a in enumerate(sys.argv):
        if a == "--verify-out" and i + 1 < len(sys.argv):
            vdir = sys.argv[i + 1]
            dumps = [d for d in os.listdir(vdir)
                     if os.path.isdir(os.path.join(vdir, d))]
            short = (len(dumps) < n_bench) if bench.get("_truncated") \
                else (len(dumps) != n_bench)
            if short:
                missing = sorted(set(bench.get("queries", {})) - set(dumps))
                print(f"RED verify-out {vdir}: {len(dumps)} dumps vs {n_bench} bench queries; missing {missing}")
                rc = 1
            else:
                print(f"OK  verify-out {vdir}: {len(dumps)} dumps vs {n_bench} bench queries")

    print("HEALTH: " + ("RED" if rc else "GREEN"))
    return rc


if __name__ == "__main__":
    sys.exit(main())
