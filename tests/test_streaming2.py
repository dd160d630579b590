"""State-boundary semantics for the batch-2 streaming ops: the fixture
arrives as ONE micro-batch, so the cross-batch state splice in
``_zscore_fn`` is exercised here directly — scoring must not depend on
where micro-batch boundaries fall."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from esxsnmp_tsdb_spark.operators.streaming_ops2 import _zscore_fn


class _FakeState:
    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def _run(chunks):
    state = _FakeState()
    outs = []
    for chunk in chunks:
        outs.extend(_zscore_fn(("p",), iter([chunk]), state))
    return (
        pd.concat(outs).reset_index(drop=True)
        if outs
        else pd.DataFrame(columns=["path", "tse", "event_id", "cents", "z"])
    )


def _mkpdf(vals, start=0):
    return pd.DataFrame(
        {
            "path": "p",
            "tse": range(start, start + len(vals)),
            "event_id": range(start, start + len(vals)),
            "cents": vals,
        }
    )


def test_zscore_batch_split_invariant():
    vals = [100, 101, 99, 100, 102, 98, 100, 101, 99, 100, 100, 5000, 100, 101]
    whole = _run([_mkpdf(vals)])
    split = _run([_mkpdf(vals[:7]), _mkpdf(vals[7:], start=7)])
    assert whole.to_dict("records") == split.to_dict("records")
    # the 5000 spike is the (only) anomaly
    assert list(whole["cents"]) == [5000]


def test_zscore_needs_min_prior():
    # 5 stable samples then a spike: below the prior threshold, no flag
    out = _run([_mkpdf([100, 101, 99, 100, 5000])])
    assert len(out) == 0


def test_zscore_rejects_out_of_order_batch():
    # A later micro-batch whose rows precede the state's high-water mark
    # must raise, not silently score against wrong prefix moments.
    vals = [100, 101, 99, 100, 102, 98, 100, 101, 99, 100, 100, 5000]
    with pytest.raises(ValueError, match="out-of-order micro-batch"):
        _run([_mkpdf(vals[6:], start=6), _mkpdf(vals[:6], start=0)])


def test_zscore_rounding_half_away_from_zero():
    # .round(6) in pandas is half-even; the oracle's round() is
    # half-away-from-zero — pin the formula on an exact 5e-7 tie.
    z = pd.Series([1.0000005, -1.0000005, 2.5e-7])
    rounded = np.floor(z.abs() * 1e6 + 0.5) / 1e6 * np.sign(z)
    assert list(rounded) == [1.000001, -1.000001, 0.0]


def test_rate_fn_rejects_out_of_order_batch():
    from esxsnmp_tsdb_spark.operators.streaming_ops import _rate_fn

    def run(chunks):
        state = _FakeState()
        outs = []
        for chunk in chunks:
            outs.extend(_rate_fn(("p",), iter([chunk]), state))
        return outs

    a = pd.DataFrame({"path": "p", "tse": [100, 200], "value": [1.0, 2.0],
                      "event_id": [0, 1]})
    b = pd.DataFrame({"path": "p", "tse": [50], "value": [0.5],
                      "event_id": [2]})
    run([a])  # in order: fine
    with pytest.raises(ValueError, match="out-of-order micro-batch"):
        run([a, b])


def test_stream_dedup_indexed_supersets_batch_hits(spark):
    """The streaming probe sees everything the batch op sees (the corpus
    index) PLUS earlier micro-batches' appended signatures — so its hit
    set must contain the batch op's corpus hits, and every extra pair
    must point at a stream doc (id >= 100000), never at the corpus."""
    from tests.conftest import SF_SMOKE

    from esxsnmp_tsdb_spark import registry

    registry.load_all()
    QUERIES = registry.QUERIES
    batch = {
        (r.new_id, r.match_id)
        for r in QUERIES["dedup_minhash_indexed"](spark, SF_SMOKE).collect()
    }
    stream = {
        (r.new_id, r.match_id)
        for r in QUERIES["stream_dedup_indexed"](spark, SF_SMOKE).collect()
    }
    assert batch <= stream
    assert all(m >= 100000 for (_n, m) in stream - batch)
