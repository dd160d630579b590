"""Source/sink breadth beyond parquet: CSV / JSON-lines / ORC readers and
writers for the obs layout, schema-pinned (no inference — inference is a
full extra pass at 100 TB and nondeterministic typing besides).

The reference's only 'format' is its bespoke binary chunk file; these are
the interchange formats an ingest edge actually sees (poller dumps,
API exports).  Delta/Iceberg/Hudi would slot in here but their jars are
not in this image — constructors raise cleanly (import-try gate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

OBS_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("tse", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("flags", T.IntegerType()),
        T.StructField("event_id", T.LongType()),
    ]
)

_FORMATS = ("parquet", "csv", "json", "orc")


def write_obs_as(obs: DataFrame, fmt: str, path: str) -> None:
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; supported: {_FORMATS}")
    w = obs.select([f.name for f in OBS_SCHEMA.fields]).write.mode("overwrite")
    if fmt == "csv":
        w = w.option("header", "true")
    w.format(fmt).save(path)


def read_obs(spark: SparkSession, fmt: str, path: str) -> DataFrame:
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; supported: {_FORMATS}")
    r = spark.read.schema(OBS_SCHEMA)
    if fmt == "csv":
        r = r.option("header", "true")
    return r.format(fmt).load(path)


def delta_table(*_args, **_kwargs):
    """Delta Lake connector gate — jars not present in this image."""
    try:
        import delta  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "Delta Lake jars are not on the classpath in this environment; "
            "the obs layout maps 1:1 (partitionBy(day) + MERGE for LWW)"
        ) from exc
