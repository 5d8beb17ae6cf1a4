"""Bench-surface accounting (VERDICT r5 directive #4 made HEADLINE cover
every registered batch query; this pins that coverage so it cannot rot):

* every HEADLINE name is a registered query (a rename in an operator
  module without a bench update would otherwise only fail at bench time,
  after the expensive passes already ran);
* no duplicates (a duplicate silently double-times one query and skews
  the headline total);
* the exclusion set — registered queries NOT in HEADLINE — is exactly
  the 20 documented in bench.py's module docstring (13 streaming + 7
  MLlib estimator fits). Registering a new batch query without benching
  it fails here, loudly, with the offender named.

Also pins the canary-protocol invariants bench_diff relies on: artifacts
are only normalized across equal ``cal_protocol`` values, so bench.py
must stamp the current protocol constant.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from spark_ml_spark import registry  # noqa: E402

#: the 20 documented exclusions (bench.py module docstring, VERDICT r5
#: directive #4): wall-clock there measures trigger/checkpoint latency or
#: iterative JVM solver cost, not a data plan this repo authors
EXPECTED_EXCLUDED = {
    # streaming (micro-batch trigger latency, not engine throughput)
    "q_stream_watermark_audit",
    "q_stream_update_mode_audit",
    "q_stream_tumbling",
    "q_stream_sliding_window",
    "q_stream_event_window",
    "q_stream_dedup",
    "q_stream_stateful_sessions",
    "q_stream_stream_join",
    "q_stream_foreachbatch_upsert",
    "q_stream_to_parquet",
    "q_stream_static_join",
    "q_stream_session_window",
    "q_stream_hll",
    # MLlib estimator fits (iterative solver cost)
    "q_ml_features",
    "q_rf_regression",
    "q_gbt_regression",
    "q_model_selection",
    "q_logreg_classify",
    "q_brp_lsh_neighbors",
    "q_ann_recall_audit",
}


def test_headline_names_are_registered_and_unique():
    registry.collect()
    unknown = [n for n in bench.HEADLINE if n not in registry.QUERIES]
    assert not unknown, f"HEADLINE names not registered: {unknown}"
    dupes = [n for n in set(bench.HEADLINE)
             if bench.HEADLINE.count(n) > 1]
    assert not dupes, f"HEADLINE duplicates (double-timed): {dupes}"


def test_exclusions_are_exactly_the_documented_17():
    registry.collect()
    excluded = set(registry.QUERIES) - set(bench.HEADLINE)
    assert excluded == EXPECTED_EXCLUDED, (
        "bench exclusion drift — every registered batch query must be in "
        f"HEADLINE. newly unbenched: {sorted(excluded - EXPECTED_EXCLUDED)}; "
        f"benched-but-listed-excluded: {sorted(EXPECTED_EXCLUDED - excluded)}"
    )


def test_stream_windowed_topk_exception_is_documented():
    # q_stream_windowed_topk IS in HEADLINE (it runs availableNow over a
    # bounded source, so its wall-clock is real work) while the other 11
    # q_stream_* are excluded — guard against the easy mistake of
    # "excluding everything q_stream_*" in a future refactor
    assert "q_stream_windowed_topk" in bench.HEADLINE


def test_canary_protocol_constant():
    src = open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py")).read()
    assert '"cal_protocol": 2' in src, (
        "bench.py must stamp cal_protocol — bench_diff only normalizes "
        "across equal protocols; bump the number when _canary's workload "
        "or timing points change"
    )
