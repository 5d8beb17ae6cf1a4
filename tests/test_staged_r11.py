"""Oracle-differential tests for the r11 reopening batch
(``operators/staged_r11.py``) — the same strict compare the driver
applies (column names + order-insensitive value hash via
``tools.driver_check.value_hash``). Written BEFORE registration so the
r11 reopening flipped on code that was already driver-green by
construction; since the flip (VERDICT r10 #1) the wiring test pins the
nine names as REGISTERED (``len(queries()) == 366``).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from driver_check import value_hash  # noqa: E402

from spark_ml_spark.operators.staged_r10 import STAGED as STAGED_R10  # noqa: E402
from spark_ml_spark.operators.staged_r11 import STAGED  # noqa: E402
from spark_ml_spark.registry import QUERIES, collect  # noqa: E402


def test_staged_module_is_registered():
    # the r11 flip (VERDICT r10 #1): importing the module registers all
    # nine names — 357 -> 366, no collision with the r10 wave
    qs, _ = collect()
    assert len(qs) == 376
    assert set(STAGED) <= set(QUERIES)
    assert not set(STAGED) & set(STAGED_R10)


@pytest.mark.parametrize(
    "name", sorted(n for n, (_, sql) in STAGED.items() if sql is not None))
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


def test_rollup_invariance_holds(spark, sf_dir):
    # the audit's entire point: every daily row reconciles, and the
    # surface is day-granular (bounded, not fact-sized)
    rows = STAGED["q_rollup_invariance"][0](spark, sf_dir).collect()
    assert rows
    assert all(r.invariant_ok for r in rows)
    assert all(r.day_us % 86_400_000_000 == 0 for r in rows)


def test_shuffle_hash_join_plan_is_shuffled_hash(spark, sf_dir):
    # the probe's reason to exist: the hint must override both the
    # auto-broadcast threshold (dims are tiny at fixture scale) and
    # the sort-merge default
    plan = STAGED["q_shuffle_hash_join"][0](
        spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" not in plan


def test_bfs_levels_are_valid(spark, sf_dir):
    rows = STAGED["q_bfs_levels"][0](spark, sf_dir).collect()
    assert rows
    levels = {r.node: r.level for r in rows}
    assert len(levels) == len(rows), "a node must appear exactly once"
    assert set(l for l in levels.values()) <= set(range(4))
    # every seed is at level 0 and every level-0 node is a seed
    assert all(
        (n % 97 == 0) == (lv == 0) for n, lv in levels.items()
    )


def test_point_in_polygon_shares(spark, sf_dir):
    rows = STAGED["q_point_in_polygon"][0](spark, sf_dir).collect()
    assert [r.polygon_id for r in rows] == [1, 2, 3, 4]
    assert all(0 <= r.n_inside <= r.n_total for r in rows)
    # the polygons are sized to capture a nonzero share of the uniform
    # coordinate domain — an all-zero column would mean the parity test
    # silently broke
    assert any(r.n_inside > 0 for r in rows)


def test_mmr_diversify_greedy_properties(spark, sf_dir):
    rows = STAGED["q_mmr_diversify"][0](spark, sf_dir).collect()
    assert [r.step for r in rows] == list(range(1, 9))
    ids = [r.vec_id for r in rows]
    assert len(set(ids)) == len(ids), "selections must be distinct"
    # step 1 is pure relevance: no later pick may beat it on relevance
    assert all(r.rel_micro <= rows[0].rel_micro for r in rows)


def test_stream_update_mode_audit_accounting(spark, sf_dir):
    # rows-only by design — these invariants ARE its correctness story
    rows = STAGED["q_stream_update_mode_audit"][0](
        spark, sf_dir).collect()
    assert rows, "no hourly windows at all"
    assert all(0 <= r.n_emissions <= 3 for r in rows)
    assert all(r.n_final <= r.n_exact for r in rows)
    assert any(not r.complete for r in rows), (
        "disorder replay should drop at least one window's late rows")
    assert any(r.complete for r in rows)
    assert all((r.n_final == r.n_exact) == r.complete for r in rows)


def test_update_mode_emits_at_least_append_mode(spark, sf_dir):
    # update mode surfaces every changed window per batch; append only
    # finalized ones — so update's emitted-window set is a superset
    upd = STAGED["q_stream_update_mode_audit"][0](spark, sf_dir).collect()
    app = STAGED_R10["q_stream_watermark_audit"][0](
        spark, sf_dir).collect()
    upd_seen = {r.hour_us for r in upd if r.n_emissions > 0}
    app_seen = {r.hour_us for r in app if r.n_emitted > 0}
    assert app_seen <= upd_seen


def test_rollup_delta_apply_exercises_both_merge_paths(spark, sf_dir):
    rows = STAGED["q_rollup_delta_apply"][0](spark, sf_dir).collect()
    assert rows
    assert all(r.invariant_ok for r in rows)
    # the increment path: some day absorbed a partial delta
    assert any(0 < r.n_delta < r.n_events for r in rows)
    # the insertion path: the engineered final-day keys exist ONLY in
    # the delta, so their merged row is delta-entirely
    assert any(r.n_delta == r.n_events > 0 for r in rows)


def test_ann_recall_audit_invariants(spark, sf_dir):
    rows = STAGED["q_ann_recall_audit"][0](spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_exact == 10
    assert 0 < r.n_approx <= 10
    assert 0 <= r.n_overlap <= min(r.n_exact, r.n_approx)
    assert r.recall_ppm == (1_000_000 * r.n_overlap) // 10
    # id lists travel as comma-joined strings (driver rows-only
    # canonicalizer rejects array cells — pre-audit catch, r11)
    exact_ids = {int(x) for x in r.exact_ids.split(",")}
    approx_ids = {int(x) for x in r.approx_ids.split(",")}
    assert len(exact_ids) == r.n_exact
    assert len(approx_ids) == r.n_approx
    assert len(exact_ids & approx_ids) == r.n_overlap
    assert 0 not in exact_ids | approx_ids, (
        "the query vector must not be its own neighbour")
    # seeded determinism: the audit is reproducible within a session
    again = STAGED["q_ann_recall_audit"][0](spark, sf_dir).collect()[0]
    assert (again.exact_ids, again.approx_ids) == (
        r.exact_ids, r.approx_ids)


def test_bitemporal_asof_winners_are_eligible(spark, sf_dir):
    rows = STAGED["q_bitemporal_asof"][0](spark, sf_dir).collect()
    assert rows
    custs = [r.o_custkey for r in rows]
    assert len(set(custs)) == len(custs), "one winner per customer"
    assert all(r.tx_us >= r.valid_us for r in rows), (
        "transaction time is valid time plus a non-negative delay")
