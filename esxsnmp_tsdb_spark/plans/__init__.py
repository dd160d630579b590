from esxsnmp_tsdb_spark.plans.explain import (
    assert_contains,
    codegen_span_count,
    plan_str,
    pushed_filters,
    read_schema,
)

__all__ = [
    "assert_contains",
    "codegen_span_count",
    "plan_str",
    "pushed_filters",
    "read_schema",
]
