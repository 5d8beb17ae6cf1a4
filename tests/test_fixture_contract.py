"""Fixture-schema contract: the driver REGENERATES /root/testdata between
rounds (TESTDATA.md), and a silent schema change there (like the r3
TIMESTAMP(NANOS) → timestamp[us] switch) breaks queries with a confusing
blast radius. This test pins every table's parquet schema so a fixture
drift fails HERE first, with a diff naming the table and column —
minutes of diagnosis instead of hours of oracle-mismatch archaeology.

Reads parquet footers only (no Spark session) — runs in milliseconds.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

SF_DIRS = sorted(glob.glob("/root/testdata/sf*"))

#: (column, arrow type) per table — the contract every operator and
#: oracle in the repo is written against (FIXTURES.md §A)
EXPECTED = {
    "region": [("r_regionkey", "int32"), ("r_name", "string")],
    "nation": [
        ("n_nationkey", "int32"), ("n_name", "string"),
        ("n_regionkey", "int32"),
    ],
    "customer": [
        ("c_custkey", "int64"), ("c_name", "string"),
        ("c_nationkey", "int32"), ("c_acctbal", "double"),
        ("c_mktsegment", "string"),
    ],
    "supplier": [
        ("s_suppkey", "int64"), ("s_name", "string"),
        ("s_nationkey", "int32"), ("s_acctbal", "double"),
    ],
    "part": [
        ("p_partkey", "int64"), ("p_name", "string"),
        ("p_brand", "string"), ("p_type", "string"),
        ("p_size", "int32"), ("p_retailprice", "double"),
    ],
    "orders": [
        ("o_orderkey", "int64"), ("o_custkey", "int64"),
        ("o_orderstatus", "string"), ("o_totalprice", "double"),
        ("o_orderdate", "timestamp[us]"), ("o_orderpriority", "string"),
    ],
    "lineitem": [
        ("l_orderkey", "int64"), ("l_partkey", "int64"),
        ("l_suppkey", "int64"), ("l_linenumber", "int32"),
        ("l_quantity", "double"), ("l_extendedprice", "double"),
        ("l_discount", "double"), ("l_tax", "double"),
        ("l_returnflag", "string"), ("l_linestatus", "string"),
        ("l_shipdate", "timestamp[us]"),
    ],
    "events": [
        ("event_id", "int64"), ("ts", "timestamp[us]"),
        ("user_id", "int64"), ("event_type", "string"),
        ("value", "double"), ("props", "string"),
    ],
    "documents": [
        ("doc_id", "int64"), ("text", "string"), ("lang", "string"),
        ("source", "string"), ("n_chars", "int64"),
    ],
    "embeddings": [
        ("vec_id", "int64"), ("embedding", "list<element: float>"),
        ("label", "int32"),
    ],
}


@pytest.mark.parametrize("sf_dir", SF_DIRS, ids=os.path.basename)
@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_table_schema_matches_contract(sf_dir, table):
    path = os.path.join(sf_dir, f"{table}.parquet")
    assert os.path.exists(path), f"fixture table missing: {path}"
    schema = pq.read_schema(path)
    got = [(f.name, str(f.type)) for f in schema]
    assert got == EXPECTED[table], (
        f"{table} schema drifted at {sf_dir} — update FIXTURES.md and "
        f"audit every operator/oracle touching the changed columns"
    )


def test_all_sf_dirs_present():
    names = {os.path.basename(d) for d in SF_DIRS}
    assert {"sf0.001", "sf0.01", "sf0.1"} <= names
