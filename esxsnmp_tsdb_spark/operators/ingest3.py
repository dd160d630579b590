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
