"""transformWithStateInPandas path: runs (and must match the lag-window
oracle) where the protobuf runtime exists; cleanly gated where it doesn't."""

from __future__ import annotations

import pytest

from esxsnmp_tsdb_spark.streaming.stateful import tws_available

SF = "/root/testdata/sf0.001"


def test_tws_gate_or_equivalence(spark):
    from esxsnmp_tsdb_spark.operators.streaming_ops import (
        stream_stateful_rate,
        stream_tws_rate,
    )

    if not tws_available():
        with pytest.raises(NotImplementedError, match="protobuf"):
            stream_tws_rate(spark, SF)
        return
    tws = {(r.path, r.tse): r.rate for r in stream_tws_rate(spark, SF).collect()}
    legacy = {
        (r.path, r.tse): r.rate for r in stream_stateful_rate(spark, SF).collect()
    }
    assert tws == legacy
