"""Helpers over ``df.explain`` output.

Why string parsing: PySpark exposes no stable structured API for the
executed plan; the formatted explain text is the documented interface
(spark.apache.org "explain formatted"). These helpers centralize the
parsing so tests assert plan properties ("this join broadcasts",
"this filter reached the scan", "no extra exchange") — the properties
that decide whether a plan survives a 100x scale-up.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (simple mode:
    formatted mode lists every operator twice — tree + details)."""
    plan = physical_plan(df, mode="simple")
    return len(
        re.findall(
            r"\bExchange (?:hash|range|RoundRobin|SinglePartition)", plan
        )
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or (
        "BroadcastNestedLoopJoin" in physical_plan(df)
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every scan node."""
    plan = physical_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def codegen_fraction(df: DataFrame) -> float:
    """Fraction of plan nodes inside WholeStageCodegen spans — a rough
    'how much stays JVM-compiled' signal (Python boundaries and
    non-codegen operators lower it)."""
    plan = physical_plan(df, mode="simple")
    lines = [ln for ln in plan.splitlines() if ln.strip().startswith(("*", "+-", ":-"))]
    if not lines:
        return 0.0
    codegen = sum(1 for ln in lines if "*(" in ln)
    return codegen / len(lines)
