"""Physical-plan inspection helpers: the 'did Catalyst do what we declared'
checks (filter pushdown, column pruning, broadcast joins) used by tests and
by humans tuning at scale."""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def scan_pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section of the first parquet scan in the plan."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line:
            return line.strip()
    return ""


def scan_read_schema(df: DataFrame) -> str:
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "ReadSchema" in line:
            return line.strip()
    return ""


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)
