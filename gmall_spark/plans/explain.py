"""Physical-plan inspection (the 100 TB feedback loop).

The reference has no optimizer (SURVEY §4) — we rely on Catalyst, and these
helpers make its decisions testable: did the filter push into the parquet
scan, did the dim join go broadcast, how wide is the codegen span. Used by
tests/test_plans.py so a regression that silently un-broadcasts a join or
blocks pushdown fails CI, not the 100 TB run.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def scan_info(df: DataFrame) -> list[dict[str, str]]:
    """Parse PushedFilters / ReadSchema for every parquet scan in the plan."""
    plan = physical_plan(df)
    scans = []
    for block in re.split(r"\n\n", plan):
        if "Scan parquet" in block or "PushedFilters" in block:
            pushed = re.search(r"PushedFilters: \[(.*?)\]", block)
            schema = re.search(r"ReadSchema: (struct<.*?>)", block, re.S)
            if pushed or schema:
                scans.append(
                    {
                        "pushed_filters": pushed.group(1) if pushed else "",
                        "read_schema": schema.group(1) if schema else "",
                    }
                )
    return scans


def assert_broadcast(df: DataFrame, at_least: int = 1) -> None:
    n = physical_plan(df).count("BroadcastHashJoin")
    if n < at_least:
        raise AssertionError(
            f"expected >= {at_least} BroadcastHashJoin, found {n}:\n{physical_plan(df)}"
        )


def assert_pushdown(df: DataFrame, fragment: str) -> None:
    """Assert some pushed filter mentions ``fragment`` (a column name)."""
    for scan in scan_info(df):
        if fragment in scan["pushed_filters"]:
            return
    raise AssertionError(f"no pushed filter mentioning {fragment!r}:\n{physical_plan(df)}")


def audit(df: DataFrame) -> dict:
    """Scale-lint summary of a plan: the structural counts that predict
    100 TB behavior. Pure plan inspection — nothing executes."""
    plan = physical_plan(df)
    return {
        "shuffles": plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning"),
        "broadcasts": plan.count("BroadcastHashJoin"),
        "scans": plan.count("Scan parquet"),
        "cartesian": plan.count("CartesianProduct"),
        "row_python_udf": plan.count("BatchEvalPython"),
        "arrow_python": plan.count("ArrowEvalPython")
        + plan.count("MapInPandas")
        + plan.count("FlatMapGroupsInPandas"),
        "nested_loop": plan.count("BroadcastNestedLoopJoin"),
        "codegen_spans": plan.count("WholeStageCodegen"),
    }


def assert_scale_clean(df: DataFrame, allow_nested_loop: bool = False) -> None:
    """The two hard scale failures no query may ship with:

    - CartesianProduct: |left|·|right| work AND a single-partition exchange.
    - BatchEvalPython: row-at-a-time Python — 10-100× slower than the
      Arrow-batched kernels (ArrowEvalPython/MapInPandas), which stay legal.

    BroadcastNestedLoopJoin is tolerated only when explicitly allowed: the
    scalar-subquery pattern (cross join against a 1-row aggregate) plans as
    BNLJ and is O(n); any other BNLJ deserves the explicit opt-in at the
    call site so review sees it.
    """
    a = audit(df)
    if a["cartesian"]:
        raise AssertionError(f"CartesianProduct in plan:\n{physical_plan(df)}")
    if a["row_python_udf"]:
        raise AssertionError(
            f"row-at-a-time Python UDF (BatchEvalPython) in plan:\n{physical_plan(df)}"
        )
    if a["nested_loop"] and not allow_nested_loop:
        raise AssertionError(
            f"BroadcastNestedLoopJoin in plan (pass allow_nested_loop=True "
            f"if this is a 1-row scalar cross join):\n{physical_plan(df)}"
        )
