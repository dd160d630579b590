"""Skew handling: salted two-phase aggregation (SURVEY.md §4 — 'salting
recipe for hot series').

A hot key (one series with millions of rows per slot, one document hash
with a million duplicates) turns a keyed shuffle into a single straggler
task.  AQE's skew-join split covers joins; for AGGREGATIONS the standard
recipe is salt → partial agg on (key, salt) → final agg on key, which
bounds any task at ~1/n_salts of the hot key.  Only algebraic aggregates
(sum/count/min/max, and avg via sum+count) can ride this; the helpers
below expose exactly those.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16) -> DataFrame:
    """Deterministic row salt (hash of the whole row, not rand(): keeps
    results reproducible and the oracle checkable)."""
    return df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    n_salts: int = 16,
    sum_cols: tuple[str, ...] = (),
    min_cols: tuple[str, ...] = (),
    max_cols: tuple[str, ...] = (),
    count: bool = True,
) -> DataFrame:
    """Two-phase salted aggregation over ``keys``.

    Phase 1 groups on (keys + salt) — the hot key's rows spread over
    ``n_salts`` tasks; phase 2 merges the ≤ n_salts partials per key.
    Returns sum_<c>, min_<c>, max_<c>, n columns.
    """
    partial_aggs = (
        [F.sum(c).alias(f"_s_{c}") for c in sum_cols]
        + [F.min(c).alias(f"_m_{c}") for c in min_cols]
        + [F.max(c).alias(f"_x_{c}") for c in max_cols]
        + ([F.count(F.lit(1)).alias("_n")] if count else [])
    )
    partial = with_salt(df, n_salts).groupBy(*keys, "_salt").agg(*partial_aggs)
    final_aggs = (
        [F.sum(f"_s_{c}").alias(f"sum_{c}") for c in sum_cols]
        + [F.min(f"_m_{c}").alias(f"min_{c}") for c in min_cols]
        + [F.max(f"_x_{c}").alias(f"max_{c}") for c in max_cols]
        + ([F.sum("_n").cast("bigint").alias("n")] if count else [])
    )
    return partial.groupBy(*keys).agg(*final_aggs)
