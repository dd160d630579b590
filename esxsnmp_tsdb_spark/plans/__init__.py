from esxsnmp_tsdb_spark.plans.explain import (
    GLOBAL_WINDOW_RE,
    assert_contains,
    codegen_span_count,
    plan_str,
    plan_violations,
    pushed_filters,
    raw_single_partition_sites,
    read_schema,
)

__all__ = [
    "GLOBAL_WINDOW_RE",
    "assert_contains",
    "codegen_span_count",
    "plan_str",
    "plan_violations",
    "pushed_filters",
    "raw_single_partition_sites",
    "read_schema",
]
