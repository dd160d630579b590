"""Structured Streaming harness: fixture parquet replayed through the file
source, results landed in a memory sink synchronously (SURVEY.md §2.6 —
the reference's 'streaming' is the poller ingest loop †; here it is a real
``readStream`` micro-batch pipeline).

``run_to_memory`` drives the query to completion with
``processAllAvailable`` — the file source delivers the fixture as
micro-batches, the final no-data batch advances the watermark so
append-mode windows can close deterministically.
"""

from __future__ import annotations

import hashlib
import itertools
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from esxsnmp_tsdb_spark.session import tune

_SINK_IDS = itertools.count()

# The streaming file source needs an explicit schema; take it from a batch
# read of the same file so the stream always matches the fixture's actual
# physical types (TIMESTAMP(NANOS)-as-long under the legacy flag in older
# fixture generations, native timestamp[us] in current ones).
_RAW_SCHEMA_CACHE: dict[str, T.StructType] = {}


def _raw_schema(spark: SparkSession, path: str) -> T.StructType:
    if path not in _RAW_SCHEMA_CACHE:
        _RAW_SCHEMA_CACHE[path] = spark.read.parquet(path).schema
    return _RAW_SCHEMA_CACHE[path]


def _stream_dir(sf_dir: str, table: str) -> str:
    """The streaming file source requires a *directory*; stage one holding
    a symlink to the (read-only) fixture file."""
    tag = hashlib.md5(f"{sf_dir}/{table}".encode()).hexdigest()[:12]
    d = os.path.join(tempfile.gettempdir(), f"esxsnmp_stream_src_{tag}")
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, f"{table}.parquet")
    if not os.path.exists(link):
        os.symlink(f"{sf_dir}/{table}.parquet", link)
    return d


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`events` as a micro-batched stream with a proper timestamp column —
    the streaming twin of ``sources.catalog.load_table('events')``."""
    tune(spark)
    raw = (
        spark.readStream.schema(_raw_schema(spark, f"{sf_dir}/events.parquet"))
        .option("maxFilesPerTrigger", 1)
        .parquet(_stream_dir(sf_dir, "events"))
    )
    if dict(raw.dtypes)["ts"] == "bigint":  # legacy nanos-as-long fixture
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:  # native parquet timestamp (ntz) — event-time ops need TimestampType
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def run_to_memory(
    result: DataFrame, output_mode: str, spark: SparkSession
) -> DataFrame:
    """Run a streaming DataFrame to completion into a memory sink; return
    the sink table as a batch DataFrame."""
    name = f"stream_sink_{next(_SINK_IDS)}"
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    q = (
        result.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)
