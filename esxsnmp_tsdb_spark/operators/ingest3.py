"""Ingest layer, batch 3 (EXT): malformed-record quarantine (dead-letter
queue) through Spark's PERMISSIVE JSON parser.

The op stages the events fixture as a JSON-lines feed with a
deterministic corruption (every {DLQ_MOD}th record truncated, so it
cannot parse), ingests it with an explicit schema + ``_corrupt_record``,
and reports per-class accepted counts alongside the quarantined count —
the poller's "log and skip bad rows, never stall the feed" behavior
(SURVEY §2.3) as a checkable aggregate.

Scale posture: corruption handling is per-row inside the parser (no
pre-pass over the feed), the quarantine is a column, and the report is
one hash aggregate — a real DLQ sink would just ``partitionBy`` on the
same CASE expression in the same pass.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from esxsnmp_tsdb_spark.operators._workdirs import op_dir
from esxsnmp_tsdb_spark.registry import op
from esxsnmp_tsdb_spark.sources import register_views

DLQ_MOD = 13  # every 13th record is truncated mid-JSON


@op(
    "ingest_dlq_quarantine",
    oracle=f"""
SELECT event_type AS class, count(*) AS n,
       round(sum(value), 6) AS sum_value
FROM events WHERE event_id % {DLQ_MOD} != 0
GROUP BY event_type
UNION ALL
SELECT '_dlq' AS class, count(*) AS n, CAST(NULL AS DOUBLE) AS sum_value
FROM events WHERE event_id % {DLQ_MOD} = 0
""",
)
def ingest_dlq_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter-queue ingest: a JSONL feed where every {DLQ_MOD}th
    record is truncated (unparseable) goes through the PERMISSIVE reader
    with an explicit schema; parse failures land in ``_corrupt_record``
    and are counted as the ``_dlq`` class instead of failing the job —
    the ingest contract that keeps one bad poller line from stalling a
    feed.

    The corruption is deterministic (event_id mod {DLQ_MOD}), so the
    oracle can state exactly which rows must survive: equality proves
    the quarantine catches ALL corrupt rows and ONLY corrupt rows, and
    that surviving values parse bit-exactly through the text format."""
    out = op_dir("dlq_feed")
    feed = os.path.join(out, "feed")
    ev = register_views(spark, sf_dir)["events"]
    line = F.to_json(
        F.struct(
            "event_id",
            F.unix_timestamp("ts").alias("tse"),
            "user_id",
            "event_type",
            "value",
        )
    )
    corrupted = ev.select(
        F.when(
            F.col("event_id") % DLQ_MOD == 0,
            F.substring(line, 1, 10),  # truncated mid-JSON: cannot parse
        )
        .otherwise(line)
        .alias("value")
    )
    corrupted.write.mode("overwrite").text(feed)
    parsed = (
        spark.read.schema(
            "event_id bigint, tse bigint, user_id bigint, "
            "event_type string, value double, _corrupt_record string"
        )
        .option("mode", "PERMISSIVE")
        .json(feed)
    )
    cls = F.when(F.col("_corrupt_record").isNull(), F.col("event_type")).otherwise(
        "_dlq"
    )
    return parsed.groupBy(cls.alias("class")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.when(F.col("_corrupt_record").isNull(), F.col("value"))), 6
        ).alias("sum_value"),
    )


# Declared contract for the `events` feed: the checks an ingest gate
# runs before accepting a batch.  value_in_range is deliberately
# tighter than the feed (values run to ~500) so the report demonstrably
# carries failing rows — a contract table that can only ever say PASS
# is untested wiring.
CONTRACT_VALUE_MAX = 100.0
CONTRACT_TS_LO = 1704067200  # 2024-01-01 (_shared.T_JAN01)
CONTRACT_TS_HI = 1706745600  # 2024-02-01 (_shared.T_FEB01)
_CONTRACT_TYPES = "('click', 'view', 'purchase', 'signup', 'error')"


@op(
    "data_quality_contract",
    oracle=f"""
WITH ev AS (
  SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS tse,
         user_id, event_type, value
  FROM events
),
agg AS (
  SELECT
    CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS value_nonnull,
    CAST(sum(CASE WHEN value < 0 OR value > {CONTRACT_VALUE_MAX}
             THEN 1 ELSE 0 END) AS BIGINT) AS value_in_range,
    CAST(sum(CASE WHEN tse < {CONTRACT_TS_LO} OR tse >= {CONTRACT_TS_HI}
             THEN 1 ELSE 0 END) AS BIGINT) AS ts_in_window,
    CAST(sum(CASE WHEN user_id < 0 THEN 1 ELSE 0 END) AS BIGINT)
      AS user_id_nonneg,
    CAST(sum(CASE WHEN event_type NOT IN {_CONTRACT_TYPES}
             THEN 1 ELSE 0 END) AS BIGINT) AS type_in_domain,
    CAST(count(*) - count(DISTINCT event_id) AS BIGINT)
      AS event_id_unique
  FROM ev
)
SELECT 'value_nonnull' AS check_name, value_nonnull AS n_violations,
       value_nonnull = 0 AS pass FROM agg
UNION ALL SELECT 'value_in_range', value_in_range,
       value_in_range = 0 FROM agg
UNION ALL SELECT 'ts_in_window', ts_in_window, ts_in_window = 0 FROM agg
UNION ALL SELECT 'user_id_nonneg', user_id_nonneg,
       user_id_nonneg = 0 FROM agg
UNION ALL SELECT 'type_in_domain', type_in_domain,
       type_in_domain = 0 FROM agg
UNION ALL SELECT 'event_id_unique', event_id_unique,
       event_id_unique = 0 FROM agg
""",
)
def data_quality_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-contract validation over the ingest feed (the
    Great-Expectations / dbt-test shape): nullability, numeric range,
    event-time window, key domain, enum membership, and primary-key
    uniqueness — each check a row with its violation count and verdict.
    The range check is intentionally tighter than the feed so the
    report demonstrably carries FAILING rows; a gate that has never
    seen red is untested wiring.

    Scale: ONE pass over the table computes every check as a
    conditional aggregate (map-side combined); the only non-algebraic
    check, key uniqueness, rides the same aggregate as
    count−count(distinct).  The report is |checks| rows, and adding a
    check adds a column to the same scan, not a new job."""
    ev = register_views(spark, sf_dir)["events"].select(
        "event_id",
        F.unix_timestamp("ts").alias("tse"),
        "user_id",
        "event_type",
        "value",
    )
    bad_value_null = F.col("value").isNull()
    bad_range = (F.col("value") < 0) | (F.col("value") > CONTRACT_VALUE_MAX)
    bad_ts = (F.col("tse") < CONTRACT_TS_LO) | (
        F.col("tse") >= CONTRACT_TS_HI
    )
    bad_user = F.col("user_id") < 0
    bad_type = ~F.col("event_type").isin(
        "click", "view", "purchase", "signup", "error"
    )
    agg = ev.agg(
        F.sum(bad_value_null.cast("bigint")).alias("value_nonnull"),
        F.sum(bad_range.cast("bigint")).alias("value_in_range"),
        F.sum(bad_ts.cast("bigint")).alias("ts_in_window"),
        F.sum(bad_user.cast("bigint")).alias("user_id_nonneg"),
        F.sum(bad_type.cast("bigint")).alias("type_in_domain"),
        (F.count(F.lit(1)) - F.count_distinct("event_id"))
        .cast("bigint")
        .alias("event_id_unique"),
    )
    checks = agg.select(
        F.expr(
            "stack(6,"
            " 'value_nonnull', value_nonnull,"
            " 'value_in_range', value_in_range,"
            " 'ts_in_window', ts_in_window,"
            " 'user_id_nonneg', user_id_nonneg,"
            " 'type_in_domain', type_in_domain,"
            " 'event_id_unique', event_id_unique)"
            " AS (check_name, n_violations)"
        )
    )
    return checks.withColumn("pass", F.col("n_violations") == 0)
