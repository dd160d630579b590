"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real content lives in the ``esxsnmp_tsdb_spark`` package; this module
is a thin adapter over ``esxsnmp_tsdb_spark.registry``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from esxsnmp_tsdb_spark import registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"
FLAGSHIP = "ts_downsample_avg"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the reference's signature derived-data op: RRD-style
    `average` consolidation of every series into 1-hour buckets
    (SURVEY.md §7 Phase 0).
    """
    return registry.queries()[FLAGSHIP](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable takes (spark, sf_dir) and returns a DataFrame.
    Every computed/aggregate column is aliased to match ``oracle_sql``.
    """
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """For each key in ``queries()``, equivalent ANSI SQL runnable by
    DuckDB on the same parquet tables (pre-registered views: region
    nation customer supplier part orders lineitem events documents
    embeddings).  Omitted for non-SQL-expressible ops → driver records a
    weaker rows-only check.
    """
    return registry.oracle_sql()
