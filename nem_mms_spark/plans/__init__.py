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


def unaggregated_global_windows(df: DataFrame) -> list[str]:
    """Window nodes with an EMPTY partition spec whose input is not already
    aggregated — the 'moving all data to a single partition' scale-killer.

    A global window over an Aggregate output is allowed: that is the second
    level of a two-level segmented computation (per-bucket partial + tiny
    boundary stitch), standard recursive-reduction shape.  A global window
    straight over a scan is flagged.
    """
    plan = df._jdf.queryExecution().optimizedPlan()  # noqa: SLF001

    def children(node):
        seq = node.children()
        return [seq.apply(i) for i in range(seq.size())]

    def subtree_has_aggregate(node) -> bool:
        if node.nodeName() == "Aggregate":
            return True
        return any(subtree_has_aggregate(c) for c in children(node))

    bad: list[str] = []

    def walk(node):
        if node.nodeName() == "Window" and node.partitionSpec().isEmpty():
            if not any(subtree_has_aggregate(c) for c in children(node)):
                bad.append(node.toString().splitlines()[0])
        for c in children(node):
            walk(c)

    walk(plan)
    return bad
