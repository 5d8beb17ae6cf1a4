"""Oracle-differential tests for the r12 trio
(``operators/staged_r12.py``) — the same strict compare the driver
applies, first run two rounds before registration per the staging
discipline, kept green after the r12 flip registered them.

Also pins the registration count: the r12 flip registers the trio plus
the seven PROMOTED r13 candidates (366 -> 376; this test is updated
alongside each flip).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from driver_check import value_hash  # noqa: E402

from spark_ml_spark.operators.staged_r11 import STAGED as STAGED_R11  # noqa: E402
from spark_ml_spark.operators.staged_r12 import STAGED  # noqa: E402
from spark_ml_spark.registry import QUERIES, collect  # noqa: E402


def test_r12_flip_registered_the_trio():
    qs, _ = collect()
    assert len(qs) == 376
    assert set(STAGED) <= set(QUERIES)
    assert not set(STAGED) & set(STAGED_R11)


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_oracle_match(name, spark, duck, sf_dir):
    fn, sql = STAGED[name]
    sdf = fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(sql)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    assert sorted(scols) == sorted(ocols), (
        f"{name}: column mismatch {scols} vs {ocols}")
    assert len(srows) == len(orows), (
        f"{name}: row count {len(srows)} vs {len(orows)}")
    assert value_hash(scols, srows) == value_hash(ocols, orows), (
        f"{name}: value hash mismatch")


def test_scd2_merge_apply_history_is_wellformed(spark, sf_dir):
    rows = STAGED["q_scd2_merge_apply"][0](spark, sf_dir).collect()
    assert rows
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for u, vs in by_user.items():
        # deterministic order even if two versions tie on valid_from_us
        # (two same-user events on one microsecond): the open version
        # (valid_to_us None) sorts last, closed ones by valid_to_us
        # (ADVICE r10 #3)
        vs.sort(key=lambda r: (
            r.valid_from_us,
            r.valid_to_us is None,
            r.valid_to_us if r.valid_to_us is not None else 0,
        ))
        # exactly one open version per entity, and it is the last one
        opens = [r for r in vs if r.valid_to_us is None]
        assert len(opens) == 1 and vs[-1].valid_to_us is None
        # intervals chain without gaps or overlaps
        for a, b in zip(vs, vs[1:]):
            assert a.valid_to_us == b.valid_from_us
        # consecutive versions genuinely differ (run-merge semantics)
        for a, b in zip(vs, vs[1:]):
            assert a.event_type != b.event_type


def test_fiscal_rollup_level_accounting(spark, sf_dir):
    rows = STAGED["q_fiscal_rollup"][0](spark, sf_dir).collect()
    # the grand-total row equals the sum of the leaf rows
    leaves = [r for r in rows if r.fiscal_period is not None]
    total = [r for r in rows if r.fiscal_year_off is None]
    assert len(total) == 1
    assert total[0].n_orders == sum(r.n_orders for r in leaves)
    assert total[0].revenue_cents == sum(r.revenue_cents for r in leaves)
    # 4-4-5 structure: periods 1..12, quarters 1..4, quarter = per-period map
    for r in leaves:
        assert 1 <= r.fiscal_period <= 12 and 1 <= r.fiscal_quarter <= 4
        assert r.fiscal_quarter == (r.fiscal_period - 1) // 3 + 1


def test_spatial_summary_reconciles_with_containment(spark, sf_dir):
    summ = {r.polygon_id: r
            for r in STAGED["q_spatial_summary"][0](spark, sf_dir).collect()}
    pip = {r.polygon_id: r
           for r in STAGED_R11["q_point_in_polygon"][0](
               spark, sf_dir).collect()}
    assert summ.keys() == pip.keys()
    for pid, s in summ.items():
        assert s.n_inside == pip[pid].n_inside
        # contained-site centroid must itself lie inside the coordinate
        # domain (a sign error in the conditional sums would blow it out)
        if s.n_inside:
            assert abs(s.sum_lon_e4) <= 1_800_000 * s.n_inside
            assert abs(s.sum_lat_e4) <= 900_000 * s.n_inside
