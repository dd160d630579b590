"""Ingest batch 2 (§2.3 surface): CDC changeset application — the
general MERGE with deletes that `ts_merge_upsert` (update/insert only)
doesn't cover.

The changeset is manufactured deterministically from the fixture (every
17th event is a tombstone, the rest are upserts), identically in both
engines; application is last-change-wins per (path, slot) followed by a
full outer join against the base snapshot.

Scale posture: one co-partitioned shuffle on (path, slot) for the
dedup window and one for the outer join — with the bucketed layout of
``sources.compaction`` both collapse into the write-time partitioning,
which is how nightly CDC application over a 100 TB store stays a single
pass with no driver involvement."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from esxsnmp_tsdb_spark.functions import tsdb
from esxsnmp_tsdb_spark.operators._shared import (
    OBS_CTE,
    STEP,
    T_JAN10,
    T_JAN15_NOON,
    T_JAN20,
)
from esxsnmp_tsdb_spark.registry import op
from esxsnmp_tsdb_spark.sources import register_views
from esxsnmp_tsdb_spark.sources.catalog import load_events_range

TOMBSTONE_MOD = 17  # every 17th event in the change window is a delete


@op(
    "ingest_cdc_merge",
    oracle=f"""
WITH {OBS_CTE},
base AS (
  SELECT path, slot, value FROM (
    SELECT path, tse - tse % {STEP} AS slot, value,
           row_number() OVER (PARTITION BY path, tse - tse % {STEP}
                              ORDER BY tse DESC, event_id DESC) AS rn
    FROM obs WHERE tse < {T_JAN15_NOON}
  ) WHERE rn = 1
),
chg AS (
  SELECT path, slot, value, op FROM (
    SELECT path, tse - tse % {STEP} AS slot, value,
           CASE WHEN event_id % {TOMBSTONE_MOD} = 0 THEN 'D' ELSE 'U' END AS op,
           row_number() OVER (PARTITION BY path, tse - tse % {STEP}
                              ORDER BY tse DESC, event_id DESC) AS rn
    FROM obs WHERE tse >= {T_JAN10} AND tse < {T_JAN20}
  ) WHERE rn = 1
)
SELECT coalesce(c.path, b.path) AS path,
       coalesce(c.slot, b.slot) AS slot,
       round(coalesce(c.value, b.value), 6) AS value,
       CASE WHEN c.path IS NULL THEN 'base'
            WHEN b.path IS NULL THEN 'insert'
            ELSE 'update' END AS src
FROM base b FULL OUTER JOIN chg c ON b.path = c.path AND b.slot = c.slot
WHERE c.op IS DISTINCT FROM 'D'
""",
)
def ingest_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply: a changeset of upserts AND tombstones merged into the
    base snapshot — WHEN MATCHED AND op='D' DELETE / WHEN MATCHED UPDATE
    / WHEN NOT MATCHED INSERT, as one window + one full outer join.

    Last-change-wins per (path, slot) resolves intra-batch conflicts
    before the join (the same LWW discipline as `ts_slot_dedup`), so the
    merge itself is set-oriented and idempotent — replaying the same
    changeset yields the same table, the property a recovering CDC
    consumer needs."""
    register_views(spark, sf_dir)
    base = tsdb.slot_dedup(
        tsdb.obs_from_events(load_events_range(spark, sf_dir, 0, T_JAN15_NOON)),
        STEP,
    ).select("path", "slot", F.col("value").alias("b_value"))
    cobs = tsdb.obs_from_events(
        load_events_range(spark, sf_dir, T_JAN10, T_JAN20)
    ).withColumn("slot", F.col("tse") - F.col("tse") % STEP)
    w = Window.partitionBy("path", "slot").orderBy(
        F.col("tse").desc(), F.col("event_id").desc()
    )
    chg = (
        cobs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("path").alias("c_path"),
            F.col("slot").alias("c_slot"),
            F.col("value").alias("c_value"),
            F.when(F.col("event_id") % TOMBSTONE_MOD == 0, "D")
            .otherwise("U")
            .alias("op"),
        )
    )
    merged = base.join(
        chg,
        (F.col("path") == F.col("c_path")) & (F.col("slot") == F.col("c_slot")),
        "full",
    )
    return merged.filter(
        F.col("op").isNull() | (F.col("op") != "D")
    ).select(
        F.coalesce("c_path", "path").alias("path"),
        F.coalesce("c_slot", "slot").alias("slot"),
        F.round(F.coalesce("c_value", "b_value"), 6).alias("value"),
        F.when(F.col("c_path").isNull(), "base")
        .when(F.col("path").isNull(), "insert")
        .otherwise("update")
        .alias("src"),
    )


BULK_EVENT_TYPE = "click"  # the bulk request's path set: every */click series


@op(
    "api_bulk_timerange",
    oracle=f"""
WITH {OBS_CTE},
agg AS (
  SELECT path, tse - tse % {STEP} AS slot,
         CAST(floor(avg(value) * 1000000 + 0.5) AS BIGINT) AS avg_micro,
         count(*) AS n
  FROM obs
  WHERE tse >= {T_JAN10} AND tse < {T_JAN15_NOON}
    AND path LIKE '%/{BULK_EVENT_TYPE}'
  GROUP BY 1, 2
)
SELECT path, slot, avg_micro, n FROM agg
""",
)
def api_bulk_timerange(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bulk REST fetch (``POST /bulk`` in the reference API †): ONE
    request carries a set of series paths + a shared (begin, end, step),
    answered as one scan instead of N single-series round trips — the
    dashboard-panel pattern (every interface of a device, every */click
    series here).

    The path-set predicate and the time range both reach the scan (the
    suffix filter compiles to a codegen EndsWith; the range predicate is
    the pushed-filter path `ts_range_scan` proves), and the aggregate is
    the same single-shuffle consolidation as every §2.2 op — request
    fan-in changes the filter, never the plan shape.  Values are emitted
    as integer microunits (`api_timerange_json`'s cross-engine trick)."""
    register_views(spark, sf_dir)
    obs = tsdb.obs_from_events(
        load_events_range(spark, sf_dir, T_JAN10, T_JAN15_NOON)
    )
    return (
        tsdb.range_scan(obs, T_JAN10, T_JAN15_NOON)
        .filter(F.col("path").endswith("/" + BULK_EVENT_TYPE))
        .groupBy("path", tsdb.slot_of(F.col("tse"), STEP).alias("slot"))
        .agg(
            F.floor(F.avg("value") * 1000000 + 0.5)
            .cast("bigint")
            .alias("avg_micro"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@op(
    "ingest_late_data_report",
    oracle=f"""
WITH {OBS_CTE},
arr AS (
  SELECT path, tse,
         max(tse) OVER (PARTITION BY path ORDER BY event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS runmax
  FROM obs
)
SELECT path,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN tse < runmax THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST(coalesce(max(CASE WHEN tse < runmax THEN runmax - tse END), 0)
            AS BIGINT) AS max_lateness_s,
       round(coalesce(sum(CASE WHEN tse < runmax THEN runmax - tse END), 0)
             * 1.0 / count(*), 6) AS avg_lateness_s
FROM arr GROUP BY path
""",
)
def ingest_late_data_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data audit over the ingest feed: how out-of-order each
    series arrives, measured against the running event-time high-water
    mark in ARRIVAL order (event_id is the poller's write sequence).
    This is the report that tells you what streaming watermark delay
    (`stream_watermark_late`) and batch re-sort window the deployment
    actually needs — guessing it is how late points get dropped.

    One shuffle on path (the arrival-order window); lateness sums are
    BIGINT seconds, so the per-series aggregate is exact-integer and
    hash-stable.  The final group-by reuses the window's partitioning —
    no second exchange (same plan shape as `ts_utilization_report`)."""
    obs = tsdb.obs_from_events(register_views(spark, sf_dir)["events"])
    w = (
        Window.partitionBy("path")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    arr = obs.select("path", "tse", F.max("tse").over(w).alias("runmax"))
    late = F.col("tse") < F.col("runmax")
    lateness = F.when(late, F.col("runmax") - F.col("tse"))
    return arr.groupBy("path").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(late.cast("int")).cast("bigint").alias("n_late"),
        F.coalesce(F.max(lateness), F.lit(0)).cast("bigint").alias("max_lateness_s"),
        F.round(
            F.coalesce(F.sum(lateness), F.lit(0)) / F.count(F.lit(1)), 6
        ).alias("avg_lateness_s"),
    )
