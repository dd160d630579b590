"""Storage layer, batch 3 (EXT): file-skipping via a min/max manifest —
the plain-parquet form of Delta/Iceberg data-skipping statistics.

The op writes the obs dataset range-clustered on time, harvests per-file
(min_tse, max_tse, n_rows) from the parquet FOOTERS (metadata only — no
data read), and answers a time-range query by consulting the manifest to
enumerate candidate files before Spark ever plans the scan.  The DuckDB
oracle aggregates the source directly; equality proves pruning loses no
rows, and the op asserts the prune actually skipped files.

Scale posture: the manifest is the Delta-log pattern — its size is
O(files), lives driver-side like a real table format's log, and turns a
full-dataset scan into |matching files| reads.  Range-clustering on tse
is what makes the min/max spans tight (`storage_zorder_scan` proves the
same property for the two-column case).
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from esxsnmp_tsdb_spark.functions import tsdb
from esxsnmp_tsdb_spark.operators._shared import OBS_CTE, T_JAN10, T_JAN15_NOON
from esxsnmp_tsdb_spark.operators._workdirs import op_dir
from esxsnmp_tsdb_spark.registry import op
from esxsnmp_tsdb_spark.sources import register_views

N_RANGE_FILES = 16  # range-clustered output files (≈ daily-file granularity)


@op(
    "storage_file_skipping_manifest",
    oracle=f"""
WITH {OBS_CTE}
SELECT tse // 86400 AS day, count(*) AS n,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM obs
WHERE tse >= {T_JAN10} AND tse < {T_JAN15_NOON}
GROUP BY tse // 86400
""",
)
def storage_file_skipping_manifest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Manifest-pruned range scan: write obs range-clustered on tse
    ({N_RANGE_FILES} files), build a per-file min/max manifest from the
    parquet footers, and answer [Jan 10, Jan 15 noon) by reading ONLY the
    files whose [min_tse, max_tse] intersects the range — the
    data-skipping mechanism every lake table format (Delta stats,
    Iceberg manifests) builds in, reconstructed on plain parquet.

    The manifest harvest touches footers, not data (O(files) metadata,
    the size class of a Delta log); the pruned read hands Spark an
    explicit file list, so the scan cost is |matching files| regardless
    of dataset size.  The op asserts the prune skipped at least one file
    — a manifest that never skips is a bug, not a slow path."""
    out = op_dir("skip_manifest")
    data = os.path.join(out, "data")
    obs = tsdb.obs_from_events(register_views(spark, sf_dir)["events"])
    (
        obs.repartitionByRange(N_RANGE_FILES, "tse")
        .sortWithinPartitions("tse")
        .write.mode("overwrite")
        .parquet(data)
    )
    manifest = []
    for f in sorted(glob.glob(os.path.join(data, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        lo = min(
            md.row_group(i).column(1).statistics.min
            for i in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(i).column(1).statistics.max
            for i in range(md.num_row_groups)
        )
        manifest.append((f, int(lo), int(hi), md.num_rows))
    # sanity: column(1) must be tse (schema order: path, tse, value, ...)
    assert pq.read_schema(manifest[0][0]).names[1] == "tse"
    lo_q, hi_q = T_JAN10, T_JAN15_NOON
    picked = [
        f for f, lo, hi, _ in manifest if hi >= lo_q and lo < hi_q
    ]
    assert 0 < len(picked) < len(manifest), (
        f"manifest prune ineffective: {len(picked)}/{len(manifest)} files"
    )
    back = spark.read.parquet(*picked)
    return (
        back.filter((F.col("tse") >= lo_q) & (F.col("tse") < hi_q))
        .groupBy(F.expr("tse div 86400").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents"),
        )
    )
