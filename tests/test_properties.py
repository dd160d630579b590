"""Property-based invariants (SURVEY.md §5.2): wrap/rate correctness for
arbitrary counter sequences, spine density, dedup idempotence.  Examples
kept small — each example is a Spark job."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from esxsnmp_tsdb_spark.functions import tsdb

WRAP = 1000

PROP = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

increments = st.lists(
    st.integers(min_value=0, max_value=WRAP - 1), min_size=1, max_size=20
)


@given(incs=increments)
@PROP
def test_wrap_correction_recovers_increments(spark, incs):
    # A counter that wraps at WRAP: wrap-corrected deltas must equal the
    # true increments, whatever the sequence (each increment < WRAP).
    total = 0
    rows = [("s", 0, 0, 0)]
    for i, inc in enumerate(incs, start=1):
        total += inc
        rows.append(("s", i * 300, total % WRAP, i))
    df = spark.createDataFrame(
        rows, "path string, tse long, counter long, event_id long"
    )
    out = tsdb.counter_rate(df, "counter", modulus=WRAP)
    got = [
        r.wrapped_delta
        for r in sorted(out.collect(), key=lambda r: r.tse)
        if r.wrapped_delta is not None
    ]
    assert got == incs
    # and rates are never negative for a (wrapped) monotonic counter
    assert all(
        r.rate >= 0 for r in out.collect() if r.rate is not None
    )


@given(
    begin=st.integers(min_value=0, max_value=10_000),
    n_slots=st.integers(min_value=1, max_value=50),
    step=st.sampled_from([60, 300, 3600]),
)
@PROP
def test_spine_density(spark, begin, n_slots, step):
    # The spine always yields exactly ceil((end-begin)/step) slots per
    # path, however sparse the observations.
    begin = begin * step  # slot-aligned begin, like the reference
    end = begin + n_slots * step
    df = spark.createDataFrame(
        [("s", begin + 1, 1.0, 1, 0)],
        "path string, tse long, value double, flags int, event_id long",
    )
    out = tsdb.time_spine(df, begin, end, step)
    assert out.count() == math.ceil((end - begin) / step)
    assert out.filter(F.col("valid")).count() == 1


@given(
    ts_list=st.lists(
        st.integers(min_value=0, max_value=3000), min_size=1, max_size=30
    )
)
@PROP
def test_slot_dedup_idempotent_and_unique(spark, ts_list):
    rows = [("s", t, float(i), 1, i) for i, t in enumerate(ts_list)]
    df = spark.createDataFrame(
        rows, "path string, tse long, value double, flags int, event_id long"
    )
    once = tsdb.slot_dedup(df, 300)
    twice = tsdb.slot_dedup(once.drop("slot"), 300)
    a = sorted((r.slot, r.value) for r in once.collect())
    b = sorted((r.slot, r.value) for r in twice.collect())
    assert a == b  # idempotent
    slots = [s for s, _ in a]
    assert len(slots) == len(set(slots))  # one row per slot
