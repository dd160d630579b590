"""Registry-wide physical-plan audit (SURVEY.md §4).

Four invariants that decide whether ANY plan survives a 100× scale-up,
checked for every registered batch op, not just the hand-picked set in
test_plans.py:

1. No ``BatchEvalPython`` — row-at-a-time Python UDFs are the slow path;
   anything Python-side must go through Arrow (``ArrowEvalPython``,
   ``FlatMapGroupsInPandas``, ``MapInPandas``…).
2. No ``CartesianProduct`` — an unbroadcast cross join shuffles |A|×|B|;
   a 1-row broadcast side must plan as ``BroadcastNestedLoopJoin``.
3. No Window fed by ``Exchange SinglePartition`` — a global
   ``Window.orderBy`` funnels every input row through one task.  Global
   top-k must plan as ``TakeOrderedAndProject``
   (functions/topk.py:ranked_topk); bounded running frames must carry a
   non-foldable constant partition key (functions/topk.py:
   bounded_running) so the single logical partition is explicit in code
   and the exchange stays a hash exchange.
4. Every ``Exchange SinglePartition`` anywhere in the plan must be fed
   by an aggregate node (Hash/ObjectHash/SortAggregate) — the single
   task then receives one pre-combined row per upstream partition (the
   global-scalar pattern), never raw rows.  Strictly stronger than 3;
   shared with bench.py via plans.raw_single_partition_sites.

Streaming ops and write ops execute eagerly on call, so they are skipped
here (their semantics are covered by the oracle/rows checks; streaming
micro-batch plans are exercised in test_stateful_tws.py).
"""

from __future__ import annotations

import pytest

from esxsnmp_tsdb_spark import registry
from esxsnmp_tsdb_spark.plans import (
    GLOBAL_WINDOW_RE,
    plan_str,
    raw_single_partition_sites,
)
from tests.conftest import SF_ORACLE

registry.load_all()

_SKIP_EAGER = {k for k in registry.QUERIES if k.startswith("stream_")} | {
    "ingest_batch_append",  # write op: executes a durable append on call
    "dedup_connected_components",  # iterative: runs its convergence loop on call
}

BATCH_OPS = sorted(k for k in registry.QUERIES if k not in _SKIP_EAGER)


@pytest.fixture(scope="module")
def plans(spark):
    return {k: plan_str(registry.QUERIES[k](spark, SF_ORACLE)) for k in BATCH_OPS}


def test_audit_covers_registry(plans):
    # The audit must grow with the registry: every non-eager op is planned.
    assert len(plans) == len(registry.QUERIES) - len(_SKIP_EAGER)
    assert len(plans) >= 83


def test_no_row_at_a_time_python_udf(plans):
    offenders = [k for k, p in plans.items() if "BatchEvalPython" in p]
    assert not offenders, f"row-at-a-time Python UDF in: {offenders}"


def test_no_unbroadcast_cartesian(plans):
    offenders = [k for k, p in plans.items() if "CartesianProduct" in p]
    assert not offenders, f"unbroadcast cross join in: {offenders}"


# GLOBAL_WINDOW_RE (plans/explain.py): a Window node whose child chain
# (through its Sort) is an Exchange SinglePartition — the
# empty-partition-spec window.  In simple mode the window's own required
# exchange prints directly beneath it, so adjacency within two
# intermediate lines is the window's, not some unrelated branch's.
@pytest.fixture(scope="module")
def simple_plans(spark):
    return {
        k: plan_str(registry.QUERIES[k](spark, SF_ORACLE), "simple")
        for k in BATCH_OPS
    }


def test_no_single_partition_window(simple_plans):
    offenders = [
        k for k, p in simple_plans.items() if GLOBAL_WINDOW_RE.search(p)
    ]
    assert not offenders, f"global (single-partition) window in: {offenders}"


# Invariant 4 (strictly stronger than 3): EVERY Exchange SinglePartition
# in EVERY batch plan must be fed by an aggregate node — i.e. the single
# task only ever receives one pre-combined row per upstream partition
# (the global-scalar pattern: count/sum/percentile over partials), never
# raw rows.  A SinglePartition exchange whose producer is a scan, join,
# project, or sort is a full-table funnel through one task — the plan
# shape that dies first at 100×.  The producer regexes are single-sourced
# in plans/explain.py (raw_single_partition_sites), which bench.py's
# per-query hygiene gate enforces too.
def test_single_partition_exchanges_carry_only_aggregates(simple_plans):
    offenders = {
        k: bad
        for k, p in simple_plans.items()
        if (bad := [s[:80] for s in raw_single_partition_sites(p)])
    }
    assert not offenders, (
        f"Exchange SinglePartition fed by a non-aggregate in: {offenders}"
    )
