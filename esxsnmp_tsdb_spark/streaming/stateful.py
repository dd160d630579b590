"""Spark 4 `transformWithStateInPandas` stateful processor: the modern
replacement for `applyInPandasWithState` (SURVEY.md §2.6
`stream_stateful_rate` row names it).  State is typed ValueState in the
state store; the processor carries each series' last (tse, value) across
micro-batches and emits wrap/heartbeat-free gauge rates — the reference
Aggregator's 'last-processed position' † as first-class streaming state.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)


def tws_available() -> bool:
    """The TWS runtime speaks protobuf to the JVM state server; the python
    ``protobuf`` package is not in this container, so gate on it."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class RateProcessor(StatefulProcessor):
    """Per-path gauge→rate with ValueState carrying the previous sample."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._last = handle.getValueState(
            "last_sample", "last_tse LONG, last_value DOUBLE"
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        (path,) = key
        if self._last.exists():
            last_tse, last_value = self._last.get()
        else:
            last_tse, last_value = None, None
        for pdf in rows:
            pdf = pdf.sort_values(["tse", "event_id"])
            # Vectorized shift()-based rate, state row spliced in as the
            # predecessor of row 0 (same formulation as the
            # applyInPandasWithState twin in operators/streaming_ops.py).
            prev_tse = pdf["tse"].astype("float64").shift()
            prev_val = pdf["value"].astype("float64").shift()
            if last_tse is not None and len(pdf):
                prev_tse.iloc[0] = float(last_tse)
                prev_val.iloc[0] = float(last_value)
            dt = pdf["tse"] - prev_tse
            keep = dt > 0
            if len(pdf):
                last_tse = int(pdf["tse"].iloc[-1])
                last_value = float(pdf["value"].iloc[-1])
            if keep.any():
                yield pd.DataFrame(
                    {
                        "path": path,
                        "tse": pdf.loc[keep, "tse"].astype("int64"),
                        "rate": ((pdf["value"] - prev_val) / dt)[keep].round(6),
                    }
                )
        self._last.update((last_tse, last_value))

    def close(self) -> None:
        pass
