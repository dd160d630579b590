"""Physical-plan inspection helpers — the engine's self-check that Catalyst
produced the plan the 100 TB deployment needs (SURVEY.md §4 checklist):
filters pushed to the scan, projections pruned, dimension joins broadcast,
top-k as TakeOrdered, wide whole-stage-codegen spans.

Used by ``tests/test_plans.py``; also handy interactively::

    from esxsnmp_tsdb_spark.plans import plan_str
    print(plan_str(df))
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_str(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as a string (what ``df.explain(mode)`` prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> str:
    """Concatenated PushedFilters entries from every parquet scan node."""
    return " ".join(re.findall(r"PushedFilters: \[([^\]]*)\]", plan_str(df)))


def read_schema(df: DataFrame) -> str:
    """Concatenated ReadSchema entries — what the scan actually reads."""
    return " ".join(re.findall(r"ReadSchema: (\S+)", plan_str(df)))


def codegen_span_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (wider = fewer interpreter hops).

    Executes the plan first (AQE only materializes codegen stars in the
    FINAL adaptive plan), then reads simple mode, where spans appear as
    ``*(n)`` stars.
    """
    df.collect()
    simple = plan_str(df, "simple")
    return len(
        set(re.findall(r"\*\((\d+)\)", simple))
        | set(re.findall(r"WholeStageCodegen \((\d+)\)", simple))
    )


# A Window whose child chain (through its Sort) is Exchange
# SinglePartition — the empty-partition-spec global window, the one plan
# shape that funnels an unbounded input through a single task.  Shared by
# tests/test_plan_audit.py and the bench.py hygiene gate.
GLOBAL_WINDOW_RE = re.compile(
    r"Window [^\n]*\n(?:[^\n]*\n){0,2}?[^\n]*Exchange SinglePartition"
)

# Every Exchange SinglePartition with the line that FEEDS it (simple
# mode prints a node's child on the next line).  A single-partition
# exchange is scale-safe only when that producer is an aggregate —
# one pre-combined row per upstream partition (the global-scalar
# count/sum/percentile pattern); fed by a scan/join/project/sort it is a
# full-table funnel through one task.  Shared by tests/test_plan_audit.py
# (invariant 4) and plan_violations (the bench.py per-query gate).
SP_EXCHANGE_RE = re.compile(r"Exchange SinglePartition[^\n]*\n[^\n]*")
SP_FED_BY_AGG_RE = re.compile(
    r"Exchange SinglePartition[^\n]*\n[^\n]*?"
    r"(HashAggregate|ObjectHashAggregate|SortAggregate)\("
)


def raw_single_partition_sites(plan: str) -> list[str]:
    """Exchange-SinglePartition sites NOT fed by an aggregate (the
    producer line, for the error message); empty = clean."""
    return [
        s.splitlines()[-1].strip()
        for s in SP_EXCHANGE_RE.findall(plan)
        if not SP_FED_BY_AGG_RE.match(s)
    ]


def plan_violations(df: DataFrame) -> list[str]:
    """Scale anti-patterns present in the plan (empty list = clean):
    row-at-a-time Python UDFs, unbroadcast cartesian products,
    single-partition windows, and single-partition exchanges carrying
    anything other than pre-combined aggregate rows."""
    p = plan_str(df, "simple")
    out = []
    if "BatchEvalPython" in p:
        out.append("BatchEvalPython")
    if "CartesianProduct" in p:
        out.append("CartesianProduct")
    if GLOBAL_WINDOW_RE.search(p):
        out.append("single-partition Window")
    raw = raw_single_partition_sites(p)
    if raw:
        out.append(f"raw single-partition exchange ({raw[0][:60]})")
    return out


def assert_contains(df: DataFrame, *needles: str) -> None:
    plan = plan_str(df)
    missing = [n for n in needles if n not in plan]
    if missing:
        raise AssertionError(f"plan lacks {missing}; plan:\n{plan}")
