from gmall_spark.plans.explain import physical_plan, scan_info, assert_broadcast, assert_pushdown

__all__ = ["physical_plan", "scan_info", "assert_broadcast", "assert_pushdown"]
