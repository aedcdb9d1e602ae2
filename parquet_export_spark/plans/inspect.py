"""Physical-plan introspection helpers.

The 100 TB design rule (SURVEY.md §7.4) is enforced as *tests over the
plan*, not hopes: filters reach the scan (PushedFilters), projections
prune columns (ReadSchema), dimension joins broadcast, shuffle counts
stay at the expected minimum. tests/test_plans.py uses these to pin
the plan shape of every headline query.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame) -> str:
    """Formatted physical plan (post-analysis, pre-execution)."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Every PushedFilters entry across the plan's scans."""
    out = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan_string(df)):
        if m.group(1).strip():
            out.append(m.group(1).strip())
    return out


def read_schemas(df: DataFrame) -> list[set[str]]:
    """Column sets read by each parquet scan (pruning evidence)."""
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan_string(df)):
        cols = {
            part.split(":")[0].strip()
            for part in m.group(1).split(",")
            if part.strip()
        }
        out.append(cols)
    return out


def count_broadcast_joins(df: DataFrame) -> int:
    """BroadcastHashJoin nodes, counted once each via the numbered
    operator details ("(N) BroadcastHashJoin")."""
    return len(re.findall(r"\(\d+\) BroadcastHashJoin", plan_string(df)))


def executed_plan_string(df: DataFrame) -> str:
    """Final (post-AQE) physical plan: executes THIS DataFrame's own
    QueryExecution (collect) so its AdaptiveSparkPlan resolves to the
    final plan. Codegen'd operators carry the ``*(n)`` stage prefix.
    Intended for tests at small scale (collect is driver-side)."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def count_shuffles(df: DataFrame) -> int:
    """Shuffle Exchange operators (broadcast exchanges excluded)."""
    return len(re.findall(r"\(\d+\) Exchange\b", plan_string(df)))
