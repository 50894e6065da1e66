from gmall_spark.plans.explain import (
    assert_broadcast,
    assert_pushdown,
    assert_scale_clean,
    audit,
    physical_plan,
    scan_info,
)

__all__ = [
    "assert_broadcast",
    "assert_pushdown",
    "assert_scale_clean",
    "audit",
    "physical_plan",
    "scan_info",
]
