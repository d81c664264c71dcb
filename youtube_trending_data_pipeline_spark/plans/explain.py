"""Physical-plan inspection helpers.

Used by tests/test_plan_quality.py to assert the plans Catalyst produces
are the plans we want at 100 TB: filters pushed to the parquet scan,
columns pruned, small dims broadcast, no stray shuffles.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters lists from every parquet scan in the plan."""
    plan = formatted_plan(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings from every parquet scan (column pruning)."""
    plan = formatted_plan(df)
    return re.findall(r"ReadSchema: (struct<[^\n]*)", plan)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the final plan (AQE-resolved)."""
    plan = physical_plan(df)
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", plan))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def codegen_stage_count(df: DataFrame) -> int:
    """Distinct whole-stage-codegen stages; the tree print marks codegen'd
    operators with '*(N)'."""
    plan = physical_plan(df)
    return len(
        set(re.findall(r"\*\((\d+)\)", plan))
        | set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
    )
