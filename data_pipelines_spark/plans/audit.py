"""Physical-plan audit helpers: make "is this the plan I'd want at
100 TB?" an assertable property instead of a one-off eyeball.

The engine's discipline is that every operator's plan is inspected
once (`.explain("formatted")`) and its load-bearing properties pinned
in tests — no nested-loop joins on the fact path, broadcasts where
dimensions are small, scans that don't multiply, window nodes that
don't re-evaluate the same running aggregate. These helpers are the
shared vocabulary for those pins (15 tests hand-rolled plan-string
greps before this module existed).
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "executed", final_only: bool = False) -> str:
    """The physical plan as text. ``mode``: 'executed' (after AQE
    preparation — what actually runs) or 'spark' (before).

    ``final_only`` drops the "== Initial Plan ==" section AQE appends
    after the final plan — REQUIRED for node-COUNT assertions on a
    materialized adaptive plan (every node appears once per section, so
    a count against the full string double-counts; substring presence
    checks are unaffected)."""
    qe = df._jdf.queryExecution()
    if mode == "executed":
        plan = qe.executedPlan().toString()
    elif mode == "spark":
        plan = qe.sparkPlan().toString()
    else:
        raise ValueError(f"unknown mode: {mode}")
    if final_only:
        plan = plan.split("== Initial Plan ==")[0]
    return plan


def assert_plan(
    df: DataFrame,
    forbid: Sequence[str] = (),
    require: Sequence[str] = (),
    mode: str = "executed",
) -> str:
    """Assert plan-text properties; returns the plan for further
    checks. ``forbid``/``require`` are plain substrings (e.g.
    ``forbid=["NestedLoop", "Cartesian"]``,
    ``require=["BroadcastHashJoin"]``). Raises AssertionError with the
    offending plan attached — the failure message IS the explain
    output, so a broken pin is diagnosable from the test log alone.
    """
    plan = plan_string(df, mode)
    # Explicit raises, not bare `assert`: these pins also run inside
    # production plan audits, and `python -O` strips assert statements
    # — a guard that silently becomes a no-op under -O is not a guard.
    for bad in forbid:
        if bad in plan:
            raise AssertionError(
                f"plan contains forbidden '{bad}':\n{plan}"
            )
    for good in require:
        if good not in plan:
            raise AssertionError(f"plan lacks required '{good}':\n{plan}")
    return plan


def scan_count(df: DataFrame, source: str = "parquet") -> int:
    """How many file-source scans the plan performs — the D1 persist
    discipline's measurable: a frame feeding N consumers without a
    persist re-scans its source N times (Spark does not share
    unpersisted subplans across join/union branches)."""
    plan = plan_string(df)
    return len(re.findall(rf"FileScan {re.escape(source)}", plan))


def window_aggregate_counts(df: DataFrame) -> list[int]:
    """Number of window aggregate expressions evaluated by each Window
    node, in plan order.

    Catalyst does NOT deduplicate repeated window expressions inside a
    node: referencing ``last(x).over(w)`` twice inline evaluates the
    running aggregate twice per row (measured ~25% on the resample
    headline before interpolate_linear materialized its four window
    values once). Pin the expected counts so an innocent-looking
    refactor that re-inlines them fails loudly.
    """
    plan = plan_string(df)
    counts = []
    for m in re.finditer(r"Window \[(.*?)\](?:, \[|\n)", plan):
        counts.append(m.group(1).count("windowspecdefinition"))
    return counts
