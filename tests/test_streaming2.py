"""State-boundary semantics for the batch-2 streaming ops: the fixture
arrives as ONE micro-batch, so the cross-batch state splice in
``_zscore_fn`` is exercised here directly — scoring must not depend on
where micro-batch boundaries fall."""

from __future__ import annotations

import pandas as pd

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
