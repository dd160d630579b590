"""Incremental ladder maintenance: streaming foreachBatch upserts must
converge to exactly the batch-built ladder (SURVEY.md §3.2)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from esxsnmp_tsdb_spark.functions import tsdb
from esxsnmp_tsdb_spark.sources import register_views
from esxsnmp_tsdb_spark.streaming import events_stream
from esxsnmp_tsdb_spark.streaming.maintenance import (
    maintain_levels,
    merge_partials,
    batch_partials,
    read_level,
)

SF = "/root/testdata/sf0.001"


def test_streaming_maintenance_equals_batch(spark):
    out = tempfile.mkdtemp(prefix="ladder_out_")
    ev = events_stream(spark, SF)
    obs = ev.select(
        F.concat_ws("/", "user_id", "event_type").alias("path"),
        F.unix_timestamp("ts").alias("tse"),
        F.col("value").cast("double").alias("value"),
    )
    q = maintain_levels(obs, out, levels=(3600,))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    maintained = read_level(spark, out, 3600)
    batch_obs = tsdb.obs_from_events(register_views(spark, SF)["events"])
    direct = tsdb.downsample(batch_obs, 3600)

    got = {(r.path, r.slot): r for r in maintained.collect()}
    want = {(r.path, r.slot): r for r in direct.collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k].average == pytest.approx(want[k].average)
        assert got[k].vmin == want[k].vmin
        assert got[k].vmax == want[k].vmax
        assert got[k].n == want[k].n


def test_merge_partials_is_algebraic(spark):
    rows = [("s", t, float(t % 13), 1, i) for i, t in enumerate(range(0, 5000, 37))]
    df = spark.createDataFrame(
        rows, "path string, tse long, value double, flags int, event_id long"
    )
    half1 = batch_partials(df.filter(F.col("event_id") % 2 == 0), 300)
    half2 = batch_partials(df.filter(F.col("event_id") % 2 == 1), 300)
    merged = merge_partials(half1, half2)
    direct = batch_partials(df, 300)
    a = {(r.path, r.slot): (r.sv, r.n, r.mn, r.mx) for r in merged.collect()}
    b = {(r.path, r.slot): (r.sv, r.n, r.mn, r.mx) for r in direct.collect()}
    assert set(a) == set(b)
    for k in b:
        assert a[k][0] == pytest.approx(b[k][0])
        assert a[k][1:] == b[k][1:]
