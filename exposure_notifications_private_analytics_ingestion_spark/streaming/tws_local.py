"""Local (engine-free) driver for StatefulProcessor — exercises the
transformWithState batch assembler in containers whose PySpark cannot run
``transformWithStateInPandas`` (the protocol needs the ``protobuf`` wheel).

Emulates exactly the engine semantics the processor relies on:
- state scoped per grouping key (MapState get/update/remove/iterator)
- event-time timers: ``registerTimer`` collects per-key timers; after each
  micro-batch the watermark advances to ``max(event time seen) − lag`` and
  every timer ≤ watermark fires once via ``handleExpiredTimer``
- watermark visible to both paths via ``timerValues.getCurrentWatermarkInMs``
- rows grouped per key per micro-batch, delivered as one pandas frame

This is a TEST harness (tests/test_tws_engine.py uses it to assert
packet-level equality against the applyInPandasWithState engine); production
use of the tws engine goes through ``closed_batches_stream_tws`` on a
protobuf-equipped cluster.
"""

from __future__ import annotations

import pandas as pd


class _FakeTimerValues:
    def __init__(self, wm_ms: int):
        self._wm = wm_ms

    def getCurrentWatermarkInMs(self) -> int:  # noqa: N802
        return self._wm


class _FakeExpiredTimerInfo:
    def __init__(self, ts_ms: int):
        self._ts = ts_ms

    def getExpiryTimeInMs(self) -> int:  # noqa: N802
        return self._ts


class _FakeMapState:
    """Key-scoped map state: the harness sets ``current_key`` before each
    processor call, mirroring the engine's implicit grouping-key context."""

    def __init__(self, handle):
        self._handle = handle
        self._data: dict[object, dict] = {}

    def _m(self) -> dict:
        return self._data.setdefault(self._handle.current_key, {})

    def containsKey(self, k) -> bool:  # noqa: N802
        return tuple(k) in self._m()

    def getValue(self, k):  # noqa: N802
        return self._m().get(tuple(k))

    def updateValue(self, k, v) -> None:  # noqa: N802
        self._m()[tuple(k)] = v

    def removeKey(self, k) -> None:  # noqa: N802
        self._m().pop(tuple(k), None)

    def iterator(self):
        return iter(list(self._m().items()))


class LocalTwsHandle:
    def __init__(self):
        self.current_key = None
        self.states: list[_FakeMapState] = []
        self.timers: dict[object, set[int]] = {}

    def getMapState(self, name, key_schema, val_schema):  # noqa: N802
        st = _FakeMapState(self)
        self.states.append(st)
        return st

    def registerTimer(self, ts_ms: int) -> None:  # noqa: N802
        self.timers.setdefault(self.current_key, set()).add(int(ts_ms))


def run_processor_locally(
    processor,
    epochs: list[pd.DataFrame],
    watermark_lag_ms: int,
    key_col: str = "conv_id",
) -> pd.DataFrame:
    """Drive ``processor`` over ``epochs`` (one frame per micro-batch) with
    Spark's watermark/timer cadence; returns the concatenated output."""
    handle = LocalTwsHandle()
    processor.init(handle)
    outs: list[pd.DataFrame] = []
    wm = 0

    def fire_expired(new_wm: int):
        for key in list(handle.timers):
            due = sorted(t for t in handle.timers[key] if t <= new_wm)
            if not due:
                continue
            handle.timers[key] -= set(due)
            for t in due:
                handle.current_key = key
                outs.extend(
                    processor.handleExpiredTimer(
                        key, _FakeTimerValues(new_wm), _FakeExpiredTimerInfo(t)
                    )
                )

    for pdf in epochs:
        for key, grp in pdf.groupby(key_col, sort=True):
            handle.current_key = (key,)
            outs.extend(
                processor.handleInputRows(
                    (key,), iter([grp.reset_index(drop=True)]),
                    _FakeTimerValues(wm),
                )
            )
        max_ts = (
            pdf["ts"].to_numpy(dtype="datetime64[us]").astype("int64") // 1000
        ).max()
        wm = max(wm, int(max_ts) - watermark_lag_ms)
        fire_expired(wm)

    processor.close()
    if not outs:
        return pd.DataFrame()
    return pd.concat(outs, ignore_index=True)
