#!/usr/bin/env python
"""Local emulation of the driver's verify pass (driver contract in
``__spark_entry__.py``): run ``entry(spark)`` as a smoke check, then run
every ``queries()[name]`` at sf0.01 side-by-side with its
``oracle_sql()[name]`` in DuckDB and compare row-count + column names +
order-insensitive value hash. Queries without oracle SQL get the weaker
rows-only check.

Usage: python tools/driver_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import decimal
import hashlib
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from spark_ml_spark.registry import collect  # noqa: E402
from spark_ml_spark.io.sources import TABLES  # noqa: E402
from spark_ml_spark.session import get_spark  # noqa: E402


def _norm(v: object) -> str:
    """Normalize a cell for hashing the way an order-insensitive value
    compare must: floats to 6 significant digits, None → ∅. Decimal is
    coerced to float so a DECIMAL-typed oracle column can't silently
    string-match a DOUBLE Spark column (VERDICT r1 §wrong 1)."""
    if v is None:
        return "∅"
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if v != v:
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def _type_categories(cols: list[str], rows: list[tuple]) -> dict[str, str]:
    """Coarse per-column Python type category from the first non-None cell —
    catches DECIMAL-vs-DOUBLE oracle drift that name-only compare misses."""
    cats: dict[str, str] = {}
    for i, c in enumerate(cols):
        cat = "unknown"
        for r in rows:
            v = r[i]
            if v is None:
                continue
            if isinstance(v, bool):
                cat = "bool"
            elif isinstance(v, decimal.Decimal):
                cat = "decimal"
            elif isinstance(v, int):
                cat = "int"
            elif isinstance(v, float):
                cat = "float"
            elif isinstance(v, (list, tuple)):
                cat = "array"
            else:
                cat = type(v).__name__
            break
        cats[c] = cat
    return cats


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(_norm(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    queries, oracles = collect()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    spark = get_spark("driver_check")

    # smoke: entry()
    if not only:
        import __spark_entry__ as e
        n = len(e.entry(spark).collect())
        print(f"entry(): {n} rows {'OK' if n >= 0 else 'FAIL'}")

    passed = failed = rows_only = 0
    for name in sorted(queries):
        if only and name not in only:
            continue
        try:
            sdf = queries[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {ex}")
            failed += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (rows-only)")
            rows_only += 1
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {ex}")
            failed += 1
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} != {sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} != {len(orows)}")
        scats, ocats = _type_categories(scols, srows), _type_categories(ocols, orows)
        for c in scols:
            sc, oc = scats.get(c), ocats.get(c)
            if sc and oc and "unknown" not in (sc, oc) and sc != oc:
                problems.append(f"type category {c}: spark={sc} oracle={oc}")
        if not problems:
            sh, oh = value_hash(scols, srows), value_hash(ocols, orows)
            if sh != oh:
                problems.append(f"value hash {sh} != {oh}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            failed += 1
        else:
            print(f"ok    {name}: {len(srows)} rows")
            passed += 1

    print(f"\n{passed} oracle-ok, {rows_only} rows-only, {failed} FAILED")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
