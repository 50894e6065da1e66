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
