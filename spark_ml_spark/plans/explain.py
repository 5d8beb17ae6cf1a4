"""Physical-plan introspection helpers.

The 100 TB posture is verified, not assumed: tests assert that dimension
joins are ``BroadcastHashJoin``, that filters appear in ``PushedFilters``,
that scans prune to the projected columns (``ReadSchema``), and that no
plan contains a Cartesian product it shouldn't.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    """Return the plan string that ``df.explain(mode)`` would print."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def assert_in_plan(df: DataFrame, *needles: str) -> None:
    plan = physical_plan(df)
    missing = [n for n in needles if n not in plan]
    if missing:
        raise AssertionError(f"plan missing {missing}:\n{plan}")


def assert_not_in_plan(df: DataFrame, *needles: str) -> None:
    plan = physical_plan(df)
    present = [n for n in needles if n in plan]
    if present:
        raise AssertionError(f"plan unexpectedly contains {present}:\n{plan}")
