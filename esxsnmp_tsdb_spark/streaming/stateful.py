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
        out = []
        for pdf in rows:
            pdf = pdf.sort_values(["tse", "event_id"])
            for _, row in pdf.iterrows():
                if last_tse is not None and row.tse > last_tse:
                    rate = (row.value - last_value) / (row.tse - last_tse)
                    out.append((path, int(row.tse), round(rate, 6)))
                last_tse, last_value = int(row.tse), float(row.value)
        self._last.update((last_tse, last_value))
        yield pd.DataFrame(out, columns=["path", "tse", "rate"])

    def close(self) -> None:
        pass
