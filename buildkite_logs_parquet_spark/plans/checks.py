"""Physical-plan inspection helpers.

Used by tests (and round-over-round tuning) to assert the plans we designed
for actually materialize: filters reach the Parquet scan, projections prune
the read schema, small dimensions broadcast.  The reference engine has no
optimizer to check; here the optimizer IS the engine, so these checks are
the scale-correctness tests.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters lists from every Parquet scan in the plan."""
    text = explain_str(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", text)


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column names in each scan's ReadSchema (column-pruning check)."""
    out = []
    for m in re.findall(r"ReadSchema: struct<([^>]*)>", explain_str(df)):
        cols = [c.split(":")[0].strip() for c in m.split(",") if c.strip()]
        out.append(cols)
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df) or "BroadcastNestedLoopJoin" in (
        explain_str(df)
    )


def scan_metrics(df: DataFrame) -> dict[str, int]:
    """Runtime metrics of the plan's file scans, summed — call AFTER an
    action has executed the DataFrame.  Keys of interest: ``numFiles``
    (files listed for the scan) and ``numOutputRows`` (rows actually
    materialized by the reader — rows inside parquet row groups skipped by
    pushed min/max predicates never appear here, which makes this the
    runtime proof of positional pruning)."""
    totals: dict[str, int] = {}

    def walk(node) -> None:
        if "Scan" in node.nodeName():
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                totals[kv._1()] = totals.get(kv._1(), 0) + kv._2().value()
        for i in range(node.children().length()):
            walk(node.children().apply(i))
        if hasattr(node, "executedPlan"):  # descend into AQE subtrees
            try:
                walk(node.executedPlan())
            except Exception:
                pass

    walk(df._jdf.queryExecution().executedPlan())
    return totals
