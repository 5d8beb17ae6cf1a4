#!/usr/bin/env python
"""Isolated per-query re-timing harness (VERDICT r6 directive #7): time
ONE query in a FRESH SparkSession (its own JVM, nothing else resident),
min-of-3 after a sf0.001 warm-up — the protocol that was hand-run for
the r6 drift root-cause note, now a one-liner so every future "did this
query really regress or is it shared-session pressure?" investigation
is mechanical.

Usage:
    python tools/bench_isolate.py [--sf DIR] QUERY [QUERY ...]

Each QUERY runs in its own subprocess (one JVM per query — that IS the
isolation; a shared session would reintroduce the codegen-cache and GC
pressure this tool exists to exclude). Prints one JSON line per query:

    {"query": "q_x", "sf_dir": "...", "runs": [a, b, c], "min": m}

and a final summary line. Compare ``min`` against the same query's
BENCH_DETAIL.json entry: if isolated-min ~= detail number, the bench
number is the query's real cost; if isolated-min is clearly lower, the
detail number carries shared-session pressure, not a plan regression.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RUNS = 3


def _time_one(name: str, sf_dir: str) -> dict:
    from spark_ml_spark.registry import collect
    from spark_ml_spark.session import get_spark

    queries, _ = collect()
    spark = get_spark("bench_isolate")
    fn = queries[name]
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    # pay JVM class-loading + codegen once, same as bench.py's protocol
    fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    runs = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 3))
        spark.catalog.clearCache()
    spark.stop()
    return {"query": name, "sf_dir": sf_dir, "runs": runs, "min": min(runs)}


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if argv and argv[0] == "--sf":
        sf_dir = argv[1]
        argv = argv[2:]
    if argv and argv[0] == "--one":
        print(json.dumps(_time_one(argv[1], sf_dir)), flush=True)
        return
    if not argv:
        sys.exit(__doc__)
    results = []
    for name in argv:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--sf", sf_dir, "--one", name],
            capture_output=True, text=True, cwd=REPO,
        )
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("{") and '"query"' in ln]
        if not line:
            print(f"FAIL {name}: {out.stderr.strip().splitlines()[-1:] }")
            continue
        rec = json.loads(line[-1])
        results.append(rec)
        print(json.dumps(rec), flush=True)
    if results:
        print(json.dumps({
            "summary": {r["query"]: r["min"] for r in results},
            "protocol": f"fresh session per query, min-of-{RUNS}, "
                        f"sf0.001 warm-up",
        }))


if __name__ == "__main__":
    main()
