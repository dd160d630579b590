"""Table catalog: fixture parquet → DataFrames + temp views.

The reference's catalog is a directory tree walked by ``TSDBBase.list_sets /
list_vars`` (SURVEY.md §2.1 `ts_series_catalog`, † anchor); here the catalog
is simply the set of parquet tables plus Spark temp views, so every operator
can be written either with the DataFrame API or as ``spark.sql`` text over
registered view names.

Scale posture: each fixture table is one parquet file locally; the 100 TB
layout for the observation table is ``partitionBy(date(slot))`` + bucket by
``hash(path)`` (SURVEY.md §4).  ``register_views`` is idempotent and cheap —
it re-registers when ``sf_dir`` changes so queries() callables can be invoked
against any scale factor.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from esxsnmp_tsdb_spark.session import tune

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Columns stored as parquet TIMESTAMP(NANOS): Spark reads them as
# nano-precision longs (spark.sql.legacy.parquet.nanosAsLong) and the
# catalog rebuilds TimestampType (microsecond) columns here, so every
# operator sees proper timestamps.  DuckDB reads the same columns natively;
# sub-microsecond digits exist in the fixtures, so oracles must compare at
# second/date granularity (floor-epoch), never raw timestamps.
TS_COLS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}

# Key used to remember which sf_dir a session's views point at.
_VIEW_TAG = "spark.esxsnmp_tsdb.viewSfDir"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog has {TABLES}")
    tune(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in TS_COLS.get(name, ()):
        if col in df.columns and dict(df.dtypes)[col] == "bigint":
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    return df


def load_events_range(
    spark: SparkSession, sf_dir: str, begin: int, end: int
) -> DataFrame:
    """`events` restricted to ``begin <= floor-epoch(ts) < end``, with the
    predicate applied to the RAW nano-long column *before* the timestamp
    rebuild.

    Filtering the converted column wraps the comparison in
    ``unix_timestamp(timestamp_micros(ts div 1000))`` — an expression the
    parquet reader cannot push, so every row group is read.  On the raw
    long, ``tse >= b  ⇔  ts >= b·10⁹`` exactly (positive epochs), and the
    scan shows ``PushedFilters: [GreaterThanOrEqual(ts,…), LessThan(ts,…)]``
    — min/max row-group skipping, the 100 TB analog of the reference's
    YYYYMMDD chunk mapper working *within* a day file."""
    tune(spark)
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes)["ts"] == "bigint":
        df = df.filter(
            (F.col("ts") >= begin * 1_000_000_000)
            & (F.col("ts") < end * 1_000_000_000)
        ).withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:  # already proper timestamps (non-nanos source)
        # Compare against foldable timestamp literals (NOT unix_timestamp(ts),
        # which wraps the column and kills pushdown): floor-epoch(ts) >= b
        # ⇔ ts >= b exactly for integral b, so the scan still shows
        # PushedFilters on ts and skips row groups by min/max.
        ts_type = dict(df.dtypes)["ts"]
        lo = F.timestamp_seconds(F.lit(begin)).cast(ts_type)
        hi = F.timestamp_seconds(F.lit(end)).cast(ts_type)
        df = df.filter((F.col("ts") >= lo) & (F.col("ts") < hi))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Tune the session and register every fixture table as a temp view.

    Returns the name → DataFrame mapping.  Re-registration is skipped when
    the session's views already point at ``sf_dir``.
    """
    tune(spark)
    dfs = {name: load_table(spark, sf_dir, name) for name in TABLES}
    try:
        current = spark.conf.get(_VIEW_TAG)
    except Exception:
        current = None
    if current != sf_dir:
        for name, df in dfs.items():
            df.createOrReplaceTempView(name)
        spark.conf.set(_VIEW_TAG, sf_dir)
    return dfs
