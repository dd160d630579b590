"""§2.6 streaming surface, batch 3 (EXT): exactly-once delivery under
replay.

`stream_replay_exactly_once` runs the same checkpointed query TWICE over
the same source.  The sink is the idempotent epoch-keyed overwrite
pattern (epoch id in the path, mode=overwrite), so a retried or replayed
micro-batch lands on the same location instead of appending a duplicate
— the foreachBatch half of Spark's exactly-once contract — and the
checkpoint's committed offsets make the second run a no-op.  The batch
oracle aggregates the fixture once; equality proves the replay added
nothing, and the op additionally asserts the store's row count did not
change between runs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from esxsnmp_tsdb_spark.operators._workdirs import op_dir
from esxsnmp_tsdb_spark.registry import op
from esxsnmp_tsdb_spark.streaming import events_stream


@op(
    "stream_replay_exactly_once",
    oracle="""
SELECT concat_ws('/', user_id, event_type) AS path,
       count(*) AS n,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM events GROUP BY 1
""",
)
def stream_replay_exactly_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once streaming ingest proven by replay: the query writes
    each micro-batch to ``store/epoch=<id>`` with mode=overwrite (the
    idempotent-sink recipe for foreachBatch), then the SAME query —
    same checkpoint, same source — is started again and driven to
    completion.  The checkpoint's committed source offsets mean run 2
    processes zero batches; if the sink were append-mode or the
    checkpoint ignored, every row would double and the per-path counts
    below would all be wrong.

    At 100 TB this is the ingest pipeline's restart story: a crashed
    driver resumes from the checkpoint and re-emits at most the one
    uncommitted epoch, which the overwrite absorbs — delivery is
    exactly-once END TO END, not just inside the engine."""
    out = op_dir("replay_once")
    store = os.path.join(out, "store")
    ckpt = os.path.join(out, "ckpt")
    ev = events_stream(spark, sf_dir)
    rows = ev.select(
        F.concat_ws("/", "user_id", "event_type").alias("path"),
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )

    def write_epoch(bdf, epoch_id: int) -> None:
        bdf.write.mode("overwrite").parquet(
            os.path.join(store, f"epoch={epoch_id}")
        )

    def run_once() -> None:
        q = (
            rows.writeStream.foreachBatch(write_epoch)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()
    n_first = spark.read.parquet(store).count()
    run_once()  # replay: committed offsets → no new epochs, no duplicates
    back = spark.read.parquet(store)
    n_second = back.count()
    assert n_first == n_second, (
        f"replay duplicated rows: {n_first} -> {n_second}"
    )
    return back.groupBy("path").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").cast("bigint").alias("cents"),
    )
