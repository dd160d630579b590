"""Operator registry — the contract surface for ``__spark_entry__.py``.

Every operator module registers its queries with the :func:`op` decorator:

    @op("ts_rate", oracle=\"\"\"SELECT ... FROM events ...\"\"\")
    def ts_rate(spark, sf_dir):
        ...

``QUERIES`` maps op key → ``(spark, sf_dir) -> DataFrame``; ``ORACLE`` maps
op key → the equivalent DuckDB SQL (omitted for non-SQL-expressible ops —
the driver then records a weaker rows-only check, per the driver contract in
``__spark_entry__.py``).

Column-name discipline (driver hashes values after sorting columns BY NAME):
every computed column must be aliased identically in the Spark query and the
oracle SQL.  Float discipline: round aggregates on BOTH sides (SURVEY.md §7
hard parts) so cross-engine summation order cannot flip the hash.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}

_OPERATOR_MODULES = (
    "esxsnmp_tsdb_spark.operators.timeseries",
    "esxsnmp_tsdb_spark.operators.aggregator",
    "esxsnmp_tsdb_spark.operators.analytics",
    "esxsnmp_tsdb_spark.operators.relational",
    "esxsnmp_tsdb_spark.operators.relational2",
    "esxsnmp_tsdb_spark.operators.scalar",
    "esxsnmp_tsdb_spark.operators.tpch",
    "esxsnmp_tsdb_spark.operators.dedup",
    "esxsnmp_tsdb_spark.operators.curation",
    "esxsnmp_tsdb_spark.operators.similarity",
    "esxsnmp_tsdb_spark.operators.text",
    "esxsnmp_tsdb_spark.operators.multimodal",
    "esxsnmp_tsdb_spark.operators.ingest",
    "esxsnmp_tsdb_spark.operators.streaming_ops",
)

_loaded = False


def op(key: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``key``; optionally attach its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise ValueError(f"duplicate op key {key!r}")
        QUERIES[key] = fn
        if oracle is not None:
            ORACLE[key] = oracle
        fn.op_key = key
        return fn

    return deco


def load_all() -> None:
    """Import every operator module (idempotent) so decorators run."""
    global _loaded
    if _loaded:
        return
    for mod in _OPERATOR_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as exc:
            # Allow partial builds while modules land; anything else raises.
            if mod.rsplit(".", 1)[-1] not in str(exc):
                raise
    _loaded = True


def queries() -> dict[str, QueryFn]:
    load_all()
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    load_all()
    return dict(ORACLE)
