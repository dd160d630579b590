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
import weakref

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

# Conf key recording which sf_dir the bkt_obs table was built from —
# stamped by ``storage2.bucketed_obs_table`` (which re-exports this
# constant), read here and by ``bench_bucketed.bucketed_obs`` to skip
# rebuilds and to refuse cross-fixture routing.
BKT_OBS_TAG = "spark.esxsnmp_tsdb.bktObsSfDir"

# Opt-in bucketed-obs routing (VERDICT r11 item 3).  Default OFF: the
# driver's vanilla session must see the flat-parquet path (its oracle
# runs DuckDB over the same events.parquet, and its session has no
# bkt_obs table).  When "true" AND a bkt_obs table built from THIS
# sf_dir exists, ``load_obs`` serves the §2.1/§2.2 family from the
# bucketed+sorted layout instead — the bench-proven 2-9x / zero-exchange
# path (BENCH bucketed_vs_flat, three consecutive rounds).
ROUTE_BUCKETED_CONF = "spark.esxsnmp_tsdb.routeBucketedObs"

# Canonical obs column order (functions/tsdb.py · obs_from_events): the
# routed table is re-projected to it so routing can never reorder the
# schema under an operator.
OBS_COLUMNS = ("path", "tse", "value", "flags", "event_id")


def load_obs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The observation table for the §2.1/§2.2 operator family.

    Flat path (default): derive obs from the events fixture exactly as
    every round before r12 did — this branch is call-for-call identical
    to the old per-module ``_obs`` helpers, so driver-facing values and
    plans are unchanged (pinned by the byte-exact shuffle diff,
    docs/SHUFFLE_r12.json).

    Routed path (``ROUTE_BUCKETED_CONF`` = "true", opt-in): serve
    ``bkt_obs`` — the SURVEY §4 bucketBy(hash(path)).sortBy(path, tse)
    layout materialized by ``storage2.bucketed_obs_table`` — so
    per-series window/consolidation plans consume the bucket layout with
    ZERO exchanges.  Routing refuses silently-wrong reads twice over:
    the stamp must match ``sf_dir`` (no cross-fixture serves) and the
    table must still exist (a stale stamp after an external DROP falls
    back to flat).  Value parity flat-vs-routed is pinned for every
    routed op in tests/test_bucketed_routing.py."""
    from esxsnmp_tsdb_spark.functions import tsdb

    tune(spark)
    if (spark.conf.get(ROUTE_BUCKETED_CONF, "false") or "").lower() == "true":
        try:
            built_for = spark.conf.get(BKT_OBS_TAG)
        except Exception:
            built_for = None
        if built_for == sf_dir and spark.catalog.tableExists("bkt_obs"):
            return spark.table("bkt_obs").select(*OBS_COLUMNS)
    return tsdb.obs_from_events(register_views(spark, sf_dir)["events"])


# Per-session memo of constructed fixture DataFrames, keyed by
# (abspath(sf_dir), table) and guarded by the file's (size, mtime_ns)
# stamp.  This caches PLANS (lazy metadata: resolved schema + file
# listing), never data — every execution still scans the parquet bytes.
# Motivation (OPTIMIZATION_r13, guide §7.3 "the driver should do almost
# no data work"): `spark.read.parquet` resolves the footer/schema through
# py4j on every call, and `register_views` makes 10 such calls; measured
# ~0.2-0.5 s of pure driver-side re-resolution *inside the timed region
# of every benched query*.  The stamp refuses a regenerated fixture
# (tests rebuild synthetic dirs in place), and the WeakKeyDictionary
# scopes entries to the owning session, so a new/driver session never
# sees another session's plans.
_TABLE_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def _table_stamp(sf_dir: str, name: str) -> tuple[int, int]:
    # (size, mtime_ns) of the fixture FILE.  ADVICE r13: this guard
    # assumes single-file fixtures (the driver contract's layout); a
    # directory-style table rewritten in place with identical entry names
    # could keep the directory stat unchanged and serve a stale listing —
    # if the fixture layout ever becomes a directory, stat the newest
    # part file here instead.
    st = os.stat(os.path.join(sf_dir, f"{name}.parquet"))
    return (st.st_size, st.st_mtime_ns)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog has {TABLES}")
    tune(spark)
    key = (os.path.abspath(sf_dir), name)
    stamp = _table_stamp(sf_dir, name)
    try:
        if spark not in _TABLE_CACHE and _TABLE_CACHE:
            # ADVICE r13: the cached DataFrames hold strong refs back to
            # their session, so weak keys alone never expire (value →
            # session → key cycle rooted at this module-level dict).
            # Evict on session turnover instead: a NEW session clears
            # prior sessions' plans, bounding the memo to the active
            # session (sessions are used one at a time here — bench,
            # tests, the driver; interleaved multi-session use would
            # only re-resolve, never misserve).
            _TABLE_CACHE.clear()
        per_session = _TABLE_CACHE.setdefault(spark, {})
    except TypeError:  # un-weakref-able session shim: skip memoization
        per_session = {}
    hit = per_session.get(key)
    if hit is not None and hit[0] == stamp:
        return hit[1]
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in TS_COLS.get(name, ()):
        if col in df.columns and dict(df.dtypes)[col] == "bigint":
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    per_session[key] = (stamp, df)
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
