"""Unit tests for the applyInPandasWithState session function's
cross-batch edge cases, driven directly with a fake GroupState (the
multi-batch paths a single availableNow drain never exercises)."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from data_wrangling_spark.streaming.events import _session_fn


class FakeState:
    def __init__(self, value=None, timed_out=False, watermark_ms=0):
        self._v = value
        self.hasTimedOut = timed_out
        self._wm = watermark_ms
        self.timeout = None
        self.removed = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def setTimeoutTimestamp(self, ms):
        self.timeout = ms

    def getCurrentWatermarkMs(self):
        return self._wm

    def remove(self):
        self.removed = True


def _us(h, m):
    return int(dt.datetime(2024, 1, 1, h, m).timestamp() * 1_000_000)


def _batch(*times):
    return pd.DataFrame(
        {
            "user_id": [1] * len(times),
            "event_id": list(range(len(times))),
            "ts": pd.Series([_us(*t) for t in times], dtype="int64").astype(
                "datetime64[us]"
            ),
        }
    )


def test_late_event_extends_session_start_backward():
    """A late-but-within-watermark event BEFORE the carried session's
    start must pull session_start back (min), not be swallowed."""
    fn = _session_fn(30)
    state = FakeState(value=(_us(10, 0), _us(10, 5), 2))
    out = list(fn((1,), iter([_batch((9, 50))]), state))
    assert out == []  # still one open session, nothing closed
    assert state.get == (_us(9, 50), _us(10, 5), 3)


def test_timeout_clamped_above_watermark():
    """An already-old group's timeout must clamp past the watermark
    (Spark raises on timeout <= watermark)."""
    fn = _session_fn(30)
    wm_ms = _us(12, 0) // 1000  # watermark far ahead of the event
    state = FakeState(watermark_ms=wm_ms)
    list(fn((1,), iter([_batch((8, 0))]), state))
    assert state.timeout == wm_ms + 1


def test_gap_splits_batch_and_closes_carried():
    """Carried session too old to merge → emitted; in-batch gap closes
    the first batch session; trailing session stays in state."""
    fn = _session_fn(30)
    state = FakeState(value=(_us(1, 0), _us(1, 10), 5))
    [emitted] = list(fn((1,), iter([_batch((9, 0), (9, 10), (11, 0))]), state))
    rows = set(
        zip(emitted["session_start"], emitted["session_end"], emitted["n_events"])
    )
    assert rows == {
        (pd.Timestamp(2024, 1, 1, 1, 0), pd.Timestamp(2024, 1, 1, 1, 10), 5),
        (pd.Timestamp(2024, 1, 1, 9, 0), pd.Timestamp(2024, 1, 1, 9, 10), 2),
    }
    assert state.get == (_us(11, 0), _us(11, 0), 1)
