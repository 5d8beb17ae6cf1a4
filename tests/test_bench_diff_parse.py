"""Unit tests for tools/bench_diff.py's artifact parsing — the layer
that decides which numbers every round-over-round perf claim stands on.
Covers the three artifact shapes that exist in the repo's history (raw
bench stdout, the driver's BENCH_r{N}.json wrapper, and the r3-style
TRUNCATED tail) plus the two r7 hardening guarantees:

* a value cut mid-digit is DROPPED, never recovered as a wrong number
  (ADVICE r6: '12.34' truncated to '12.' must not parse as 12.0);
* an end-truncated JSON line falls through to the regex recovery
  instead of crashing on the line-scan json.loads (self-review r7);
* cal_protocol defaults to 1 for pre-r7 artifacts, so bench_diff can
  refuse to normalize a 0.07s range-sum against a 3s shuffled group-by.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from bench_diff import read_bench, read_cal  # noqa: E402


def _write(tmp_path, name: str, text: str) -> str:
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_raw_bench_line(tmp_path):
    path = _write(tmp_path, "raw.json", json.dumps(
        {"metric": "m", "queries": {"q_a": 1.5, "q_b": 0.25},
         "cal_sec": 3.1, "cal_protocol": 2}))
    assert read_bench(path) == {"q_a": 1.5, "q_b": 0.25}
    assert read_cal(path) == (3.1, 2)


def test_driver_wrapper_with_parsed(tmp_path):
    path = _write(tmp_path, "wrap.json", json.dumps(
        {"tail": "noise", "parsed": {"queries": {"q_a": 2.0},
                                     "cal_sec": 0.07}}))
    assert read_bench(path) == {"q_a": 2.0}
    assert read_cal(path) == (0.07, 1)  # pre-r7 artifact -> protocol 1


def test_wrapper_tail_with_log_noise(tmp_path):
    tail = 'WARN noise\n{"metric": "m", "queries": {"q_a": 1.0}, ' \
           '"cal_sec": 0.08}\n'
    path = _write(tmp_path, "tail.json", json.dumps({"tail": tail}))
    assert read_bench(path) == {"q_a": 1.0}
    assert read_cal(path) == (0.08, 1)


def test_truncated_tail_drops_cut_value(tmp_path):
    # the r3 failure shape: the JSON line cut mid-object — here mid-digit,
    # the exact ADVICE-r6 scenario. q_b's '3.' must be dropped, q_a kept,
    # and nothing may raise.
    path = _write(tmp_path, "trunc.json",
                  '{"metric": "m", "cal_sec": 0.07, '
                  '"queries": {"q_a": 1.25, "q_b": 3.')
    assert read_bench(path) == {"q_a": 1.25}
    assert read_cal(path) == (0.07, 1)


def test_truncated_inside_wrapper_tail(tmp_path):
    path = _write(tmp_path, "wt.json", json.dumps(
        {"tail": '{"metric": "m", "queries": {"q_a": 1.25, "q_b": 12.'}))
    assert read_bench(path) == {"q_a": 1.25}


def test_later_complete_line_wins_over_regex_mix(tmp_path):
    # ADVICE r7: bench printed twice — first line truncated, second
    # complete. The scan must CONTINUE past the truncated line and parse
    # the complete one, not bail to regex recovery (which would mix
    # q_a=1.25 from the dead first line with the second line's pairs).
    text = ('{"metric": "m", "queries": {"q_a": 1.25, "q_b": 3.\n'
            '{"metric": "m", "queries": {"q_a": 9.0, "q_c": 2.0}, '
            '"cal_sec": 3.2, "cal_protocol": 2}\n')
    path = _write(tmp_path, "twice.json", text)
    assert read_bench(path) == {"q_a": 9.0, "q_c": 2.0}
    assert read_cal(path) == (3.2, 2)


def test_complete_line_mentioning_queries_is_skipped(tmp_path):
    # self-review r8: a complete JSON line that merely MENTIONS
    # "queries" (log echo, no top-level dict key) must not crash with
    # KeyError or return a non-dict — scan must continue to the real
    # bench line after it.
    text = ('{"note": "parsed \\"queries\\" ok", "n": 332}\n'
            '{"metric": "m", "queries": 7}\n'
            '{"metric": "m", "queries": {"q_a": 1.0}, "cal_sec": 3.0, '
            '"cal_protocol": 2}\n')
    path = _write(tmp_path, "echo.json", text)
    assert read_bench(path) == {"q_a": 1.0}
    assert read_cal(path) == (3.0, 2)


def test_both_readers_pick_the_same_last_line(tmp_path):
    # ADVICE r8: two complete bench prints (re-run appended) must never
    # pair run-1 query timings with run-2's canary. Both readers pick
    # the LAST complete line — the appended re-run supersedes.
    text = ('{"metric": "m", "queries": {"q_a": 1.0}}\n'
            '{"metric": "m", "queries": {"q_a": 1.1}, "cal_sec": 2.5, '
            '"cal_protocol": 2}\n')
    path = _write(tmp_path, "twocal.json", text)
    assert read_bench(path) == {"q_a": 1.1}
    assert read_cal(path) == (2.5, 2)


def test_canary_less_last_line_reports_none_not_other_runs_cal(tmp_path):
    # ADVICE r8, mirror case: the superseding re-run PREDATES the
    # canary while the stale first print carries one — read_cal must
    # report None for the chosen run, not borrow the dead line's 9.9.
    text = ('{"metric": "m", "queries": {"q_a": 5.0}, "cal_sec": 9.9, '
            '"cal_protocol": 2}\n'
            '{"metric": "m", "queries": {"q_a": 1.1}}\n')
    path = _write(tmp_path, "stalecal.json", text)
    assert read_bench(path) == {"q_a": 1.1}
    assert read_cal(path) == (None, 1)


def test_no_bench_json_raises(tmp_path):
    path = _write(tmp_path, "junk.json", "no json here at all")
    with pytest.raises(ValueError):
        read_bench(path)
