"""Physical-plan inspection helpers (SURVEY.md §4.2).

The optimizations the engine depends on at 100 TB — predicate pushdown
into the scan, column pruning (especially of ``bytes``), broadcast joins
for small dims, map-side partial aggregation, Python-free plans where
designed — must be *visible in the plan*, not assumed. These helpers
extract the formatted plan and assert on it; tests/test_plans.py pins the
flagship plans, and PLANS.md is generated from the same surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The `.explain("formatted")` text, returned instead of printed."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def read_schema_lines(df: DataFrame) -> list[str]:
    """The ReadSchema line of every scan node — what actually gets read."""
    return [ln for ln in formatted_plan(df).splitlines() if "ReadSchema" in ln]


def scans_column(df: DataFrame, column: str) -> bool:
    """True if ANY scan in the plan reads ``column``."""
    return any(column in ln for ln in read_schema_lines(df))


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters lines — predicates that reached the data source."""
    return [ln for ln in formatted_plan(df).splitlines() if "PushedFilters" in ln]


def has_node(df: DataFrame, node: str) -> bool:
    """True if the physical plan contains ``node`` (e.g. 'BroadcastHashJoin',
    'Exchange', 'ArrowEvalPython')."""
    return node in formatted_plan(df)


def is_python_free(df: DataFrame) -> bool:
    """True when no Python-evaluation node appears — the whole plan runs
    JVM-side (Tungsten/whole-stage-codegen)."""
    plan = formatted_plan(df)
    return not any(n in plan for n in (
        "ArrowEvalPython", "BatchEvalPython", "FlatMapGroupsInPandas",
        "MapInPandas", "PythonMapInArrow", "MapInArrow",
    ))


def is_shuffle_free(df: DataFrame) -> bool:
    """True when the plan contains no Exchange at all."""
    return not has_node(df, "Exchange")
