#!/usr/bin/env python3
"""Median bench snapshot: run graft.Bench N times, take the per-query
MEDIAN across runs, write one merged JSON artifact.

Why: single-run snapshots sit at a random point of the host's noise band
(round 9's committed snapshot was the top of a 99.9-107.0 s five-run
spread and produced a correlated ~1.3x drift cluster that wasted a judge
cycle; round 8 had the same false alarm on g6_khop). Bench itself already
reports best-of-2 per query inside one JVM; the cross-run median on top
removes run-position effects (JIT state, page cache, host stalls).

Usage:
  python3 tools/bench_median.py [N] [out.json]
Defaults: N=3, out=audits/bench_r10_local_sf01.json. Honors
SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS like the bench itself (defaults
sf0.1 / 32 per the established snapshot protocol).
"""
import json
import os
import statistics
import subprocess
import sys


def run_once(env):
    out = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        capture_output=True, text=True, env=env, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    line = None
    for l in out.stdout.splitlines():
        l = l.strip()
        if l.startswith("[info] "):
            l = l[len("[info] "):]
        # the per-query line is the one carrying "queries"; the compact
        # summary line that follows has the same total but no breakdown
        if l.startswith("{") and '"queries"' in l:
            line = l
    if line is None:
        sys.stderr.write(out.stdout[-2000:] + "\n")
        raise SystemExit("no bench JSON line found")
    return json.loads(line)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    dest = sys.argv[2] if len(sys.argv) > 2 else "audits/bench_r10_local_sf01.json"
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    runs = []
    for i in range(n):
        r = run_once(env)
        print(f"run {i + 1}/{n}: total={r['value']}s failures={r['failures']}",
              flush=True)
        runs.append(r)
    names = sorted(runs[0]["queries"].keys())
    failed = sorted({f for r in runs for f in r.get("failed", [])})
    queries = {q: round(statistics.median(r["queries"][q] for r in runs), 3)
               for q in names}
    total = round(sum(v for q, v in queries.items() if q not in failed), 3)
    merged = {
        "metric": "total", "value": total, "unit": "sec",
        "queries": queries, "failures": len(failed), "failed": failed,
        "sf": runs[0]["sf"], "protocol": f"per-query median of {n} runs, "
        "each best-of-2 in-JVM; totals of the individual runs: "
        + ", ".join(str(r["value"]) for r in runs),
    }
    with open(dest, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    print(f"wrote {dest}: total={total}s over {len(names)} queries "
          f"(per-run totals: {[r['value'] for r in runs]})")


if __name__ == "__main__":
    main()
