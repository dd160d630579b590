"""Opt-in bucketed-obs routing (sources/catalog.py · load_obs, VERDICT
r11 item 3): with ``ROUTE_BUCKETED_CONF`` on and a matching ``bkt_obs``
table present, every routed §2.1/§2.2 op must (1) return EXACTLY the
flat-path values, (2) actually read the bucketed table, and (3) keep the
bench-proven exchange win on the consolidation shapes.  With the flag
off — the driver's posture — ``load_obs`` must be the flat path even
when the table exists, and routing must refuse a table built for a
DIFFERENT sf_dir (silent cross-fixture serves are the failure mode that
would poison every routed op at once)."""

from __future__ import annotations

import pytest

from esxsnmp_tsdb_spark import registry
from esxsnmp_tsdb_spark.plans import plan_str
from esxsnmp_tsdb_spark.session import get_session
from esxsnmp_tsdb_spark.sources import (
    BKT_OBS_TAG,
    ROUTE_BUCKETED_CONF,
    load_obs,
)

SF = "/root/testdata/sf0.001"


def _routed_keys() -> list[str]:
    """Every op key registered by the four routed modules."""
    registry.load_all()
    mods = {
        "esxsnmp_tsdb_spark.operators.timeseries",
        "esxsnmp_tsdb_spark.operators.aggregator",
        "esxsnmp_tsdb_spark.operators.aggregator2",
        "esxsnmp_tsdb_spark.operators.analytics",
    }
    return sorted(
        k for k, fn in registry.QUERIES.items() if fn.__module__ in mods
    )


@pytest.fixture(scope="module")
def spark():
    registry.load_all()
    return get_session()


@pytest.fixture(scope="module")
def bkt(spark):
    """bkt_obs built for SF; routing flag managed per-test."""
    from esxsnmp_tsdb_spark.operators.storage2 import bucketed_obs_table

    bucketed_obs_table(spark, SF)
    yield
    spark.conf.set(ROUTE_BUCKETED_CONF, "false")


def _routed(spark, flag: str):
    spark.conf.set(ROUTE_BUCKETED_CONF, flag)


def _canon(df):
    """Driver-style canonical rows: columns sorted by name, rows sorted
    by their full string form — exact, no float tolerance (the routed
    table is a byte-faithful parquet round-trip of the same rows, so
    the values must be identical, not merely close)."""
    cols = sorted(df.columns)
    rows = [tuple(map(repr, r)) for r in df.select(*cols).collect()]
    return cols, sorted(rows)


def test_flag_off_is_flat_even_with_table(spark, bkt):
    _routed(spark, "false")
    plan = plan_str(load_obs(spark, SF), "simple")
    assert "bkt_obs" not in plan
    assert "events" in plan


def test_flag_on_reads_bucketed_table(spark, bkt):
    _routed(spark, "true")
    try:
        plan = plan_str(load_obs(spark, SF), "simple")
        assert "bkt_obs" in plan
        assert "events.parquet" not in plan
    finally:
        _routed(spark, "false")


def test_cross_fixture_stamp_refuses_routing(spark, bkt):
    _routed(spark, "true")
    stamp = spark.conf.get(BKT_OBS_TAG)
    try:
        spark.conf.set(BKT_OBS_TAG, "/root/testdata/sf0.01")
        plan = plan_str(load_obs(spark, SF), "simple")
        assert "bkt_obs" not in plan  # stale stamp -> flat fallback
    finally:
        spark.conf.set(BKT_OBS_TAG, stamp)
        _routed(spark, "false")


def test_consolidation_shapes_lose_their_exchanges(spark, bkt):
    """The headline win: groupBy(path, slot) consolidation over the
    routed layout plans with ZERO exchanges (bucket hash on path covers
    the grouping key)."""
    key = "ts_downsample_avg"
    _routed(spark, "false")
    flat_ex = plan_str(registry.QUERIES[key](spark, SF), "simple").count(
        "Exchange"
    )
    _routed(spark, "true")
    try:
        routed_plan = plan_str(registry.QUERIES[key](spark, SF), "simple")
    finally:
        _routed(spark, "false")
    assert "bkt_obs" in routed_plan
    assert routed_plan.count("Exchange") == 0 < flat_ex


@pytest.mark.parametrize("key", _routed_keys())
def test_routed_op_value_parity(spark, bkt, key):
    _routed(spark, "false")
    flat = _canon(registry.QUERIES[key](spark, SF))
    _routed(spark, "true")
    try:
        routed = _canon(registry.QUERIES[key](spark, SF))
    finally:
        _routed(spark, "false")
    assert flat[0] == routed[0], f"{key}: column drift"
    assert flat[1] == routed[1], f"{key}: value drift flat vs routed"
