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

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RUNS = 3


def _time_one(name: str, sf_dir: str) -> dict:
    # warm-up and per-rep measurement are IMPORTED from bench.py, not
    # re-implemented: isolated numbers are only comparable to
    # BENCH_DETAIL numbers if both protocols are the same code
    from bench import time_query_once, warm_dir_for
    from spark_ml_spark.registry import collect
    from spark_ml_spark.session import get_spark

    queries, _ = collect()
    spark = get_spark("bench_isolate")
    fn = queries[name]
    # pay JVM class-loading + codegen once, same as bench.py's protocol
    fn(spark, warm_dir_for(sf_dir)).write.format("noop").mode(
        "overwrite").save()
    spark.catalog.clearCache()
    runs = [time_query_once(spark, fn, sf_dir) for _ in range(RUNS)]
    spark.stop()
    return {"query": name, "sf_dir": sf_dir, "runs": runs, "min": min(runs)}


def main() -> None:
    # argparse so flag misplacement errors out loudly instead of being
    # misread as query names ('q_x --sf DIR' used to time two bogus
    # "queries"; a trailing --sf raised IndexError) — ADVICE r7
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf", default="/root/testdata/sf0.1",
                    metavar="DIR", help="testdata scale-factor directory")
    ap.add_argument("--one", metavar="QUERY", default=None,
                    help="internal: time one query in THIS process")
    ap.add_argument("queries", nargs="*", help="query names to isolate-time")
    ns = ap.parse_args()
    sf_dir = ns.sf
    if ns.one:
        print(json.dumps(_time_one(ns.one, sf_dir)), flush=True)
        return
    if not ns.queries:
        ap.error("no query names given")
    results, failed = [], []
    for name in ns.queries:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--sf", sf_dir, "--one", name],
            capture_output=True, text=True, cwd=REPO,
        )
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("{") and '"query"' in ln]
        if not line:
            err = out.stderr.strip().splitlines()
            # a killed child (OOM, signal) can have empty stderr — the
            # exit code is then the only diagnostic worth printing
            print(f"FAIL {name}: "
                  f"{err[-1] if err else f'child exit {out.returncode}'}")
            failed.append(name)
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
    # a failed query must fail the invocation: scripted callers (make
    # isolate, CI) otherwise read "no timing data" as success
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
