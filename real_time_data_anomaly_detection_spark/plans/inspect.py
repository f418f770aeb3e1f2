"""Assertions over Spark physical plans.

These make scale properties TESTABLE: "the dimension join broadcasts",
"the filter reached the parquet scan", "this pipeline shuffles once" —
the difference between working-at-sf0.01 and working-at-100TB. Used by
tests/test_plans.py and available for ad-hoc plan review.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The `.explain("formatted")` text (executed-plan string)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_broadcast_join(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def has_pushed_filters(df: DataFrame, *fragments: str) -> bool:
    """True if the scan's PushedFilters mentions every fragment."""
    plan = formatted_plan(df)
    pushed_lines = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    blob = " ".join(pushed_lines)
    return all(fr in blob for fr in fragments) and bool(pushed_lines)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (broadcast
    exchanges excluded — they're the cheap kind)."""
    plan = formatted_plan(df)
    return sum(
        1
        for ln in plan.splitlines()
        if ln.strip().startswith("(")
        and "Exchange" in ln
        and "BroadcastExchange" not in ln
    )


def scan_read_schema(df: DataFrame, table_hint: str = "") -> list[str]:
    """Column names in the (first matching) parquet scan's ReadSchema —
    verifies column pruning reached the reader."""
    plan = formatted_plan(df)
    for ln in plan.splitlines():
        if "ReadSchema" in ln and (table_hint in ln if table_hint else True):
            # ReadSchema: struct<a:int,b:string,...>
            inner = ln.split("struct<", 1)[-1].rsplit(">", 1)[0]
            return [p.split(":")[0] for p in inner.split(",") if ":" in p]
    return []
