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


def test_expire_late_arrival_backfill_converges(spark):
    """The classic TSDB operational race, staged deterministically:
    (1) the ladder is maintained from in-time data, (2) retention expires
    the oldest day partition, (3) LATE data arrives spanning both the
    expired day and a retained day, (4) the retention-aware maintenance
    merges it, (5) compaction rewrites the level.  The ladder must
    converge to the batch twin over retained-window data only — the
    expired day stays expired (never resurrected by the late batch), the
    retained day absorbs the backfill exactly."""
    import os
    import shutil

    from esxsnmp_tsdb_spark.sources import compaction
    from esxsnmp_tsdb_spark.streaming.maintenance import (
        read_level,
        upsert_level,
    )

    out = tempfile.mkdtemp(prefix="ladder_expire_")
    level = f"{out}/level=3600"
    step = 3600
    day = 86400
    # 3 days of two series, one sample per 300s; every 7th sample is "late"
    rows = [
        (p, t, float((t // 300) % 17), 1, i)
        for p in ("s1", "s2")
        for i, t in enumerate(range(0, 3 * day, 300))
    ]
    schema = "path string, tse long, value double, flags int, event_id long"
    obs = spark.createDataFrame(rows, schema)
    on_time = obs.filter(F.col("event_id") % 7 != 0)
    late = obs.filter(F.col("event_id") % 7 == 0)

    # (1) initial maintenance from the on-time feed
    upsert_level(spark, level, on_time, step)
    assert os.path.isdir(f"{level}/day=1970-01-01")
    # (2) retention expires day 0 (directory drop, the O(1) expiry)
    shutil.rmtree(f"{level}/day=1970-01-01")
    cutoff = "1970-01-02"
    # (3)+(4) the late batch — including rows for the EXPIRED day —
    # merges under the retention policy
    upsert_level(spark, level, late, step, retention_cutoff=cutoff)
    # (5) compaction rewrites what remains, losslessly
    compaction.compact(spark, level, sort_cols=("path", "slot"))

    # expired day stayed expired: no resurrection by the late arrivals
    assert not os.path.exists(f"{level}/day=1970-01-01")
    # and the store converges to the batch twin over the retained window
    maintained = read_level(spark, out, step)
    direct = tsdb.downsample(obs.filter(F.col("tse") >= day), step)
    got = {(r.path, r.slot): r for r in maintained.collect()}
    want = {(r.path, r.slot): r for r in direct.collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k].average == pytest.approx(want[k].average)
        assert got[k].vmin == want[k].vmin
        assert got[k].vmax == want[k].vmax
        assert got[k].n == want[k].n
