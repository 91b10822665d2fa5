"""Custom stateful streaming operator: per-vehicle trip detection
(SURVEY.md §2.9 ST4 — the path for state machines the built-in windowed
aggregates cannot express).

``session_window`` can group pings by silence gaps, but a real trip
detector needs ARBITRARY per-key state: an open-trip record that survives
micro-batches, closes either when a later ping reveals a gap or when the
watermark passes the trip's horizon (event-time timeout), and emits
exactly one row per closed trip. That is ``applyInPandasWithState``:
Arrow-batched per-key pandas groups + an explicit ``GroupState`` handle +
``EventTimeTimeout`` for watermark-driven finalization — state never
outlives the watermark, so it is bounded exactly like built-in windows.

Trip semantics: consecutive pings of one (provider, vehicleId) belong to
one trip while each inter-ping silence is <= ``TRIP_GAP_MIN`` minutes; a
longer silence closes the trip at its last ping. Output: one row per
closed trip (start, end, ping count).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

TRIP_GAP_MIN = 30

TRIP_OUTPUT_SCHEMA = (
    "provider string, vehicleId string, trip_start timestamp, "
    "trip_end timestamp, n_pings long"
)
# open-trip record as epoch-microsecond longs (timestamp-in-state is
# needlessly fiddly across Arrow versions; micros are exact)
TRIP_STATE_SCHEMA = "trip_start long, trip_end long, n_pings long"

_GAP_US = TRIP_GAP_MIN * 60 * 1_000_000


def _emit(provider: str, vehicle: str, trips: list[tuple[int, int, int]]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "provider": provider,
            "vehicleId": vehicle,
            "trip_start": pd.to_datetime([t[0] for t in trips], unit="us"),
            "trip_end": pd.to_datetime([t[1] for t in trips], unit="us"),
            "n_pings": [t[2] for t in trips],
        }
    )


def detect_trips(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-key state machine. Called by Spark either with new data for the
    key, or (exclusively) with ``hasTimedOut`` once the watermark passes
    the registered timeout — which finalizes a dangling open trip."""
    provider, vehicle = key
    if state.hasTimedOut:
        trip_start, trip_end, n = state.get
        state.remove()
        yield _emit(provider, vehicle, [(trip_start, trip_end, n)])
        return

    ts_us: list[int] = []
    for pdf in pdfs:
        # dropna BEFORE the int cast: NaT casts to INT64_MIN, which would
        # open a bogus epoch-min trip and gap-close every real one
        ts = pd.to_datetime(pdf["eventTs"]).dropna()
        ts_us.extend(int(v) // 1000 for v in ts.astype("int64"))
    ts_us.sort()

    open_trip = state.get if state.exists else None
    closed: list[tuple[int, int, int]] = []
    for t in ts_us:
        if open_trip is None:
            open_trip = (t, t, 1)
        elif t - open_trip[1] <= _GAP_US:
            open_trip = (open_trip[0], max(open_trip[1], t), open_trip[2] + 1)
        else:
            closed.append(open_trip)
            open_trip = (t, t, 1)

    if open_trip is None:
        # an invocation can deliver rows whose eventTs are all null (no
        # usable instants) with no prior state — nothing to track, and
        # state.update(None) would raise inside the stateful operator
        return
    state.update(open_trip)
    # finalize the open trip when the watermark passes its gap horizon
    state.setTimeoutTimestamp(open_trip[1] // 1000 + TRIP_GAP_MIN * 60 * 1000)
    if closed:
        yield _emit(provider, vehicle, closed)


def vehicle_trips_stream(pings: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """pings stream -> closed-trip stream (append)."""
    return (
        pings.withWatermark("eventTs", watermark)
        .groupBy("provider", "vehicleId")
        .applyInPandasWithState(
            detect_trips,
            TRIP_OUTPUT_SCHEMA,
            TRIP_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


class TripProcessor(StatefulProcessor):
    """``transformWithStateInPandas`` twin of ``detect_trips`` — the same
    per-vehicle trip state machine on PySpark 4.x's successor API
    (typed state handles + explicit event-time TIMERS instead of the
    single ``GroupState`` + timeout slot). Semantics are identical by
    construction: one value-state record for the open trip, a timer at
    ``trip_end + gap`` re-armed on every update, state cleared when the
    timer fires — so state is watermark-bounded exactly like the
    ``applyInPandasWithState`` form. Requires the RocksDB state store
    provider (the API needs multiple column families), which
    ``assembly.run_streaming_trips_tws`` scopes around the query."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._trip = handle.getValueState("trip", TRIP_STATE_SCHEMA)

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        provider, vehicle = key
        ts_us: list[int] = []
        for pdf in rows:
            # dropna BEFORE the int cast — same NaT guard as detect_trips
            ts = pd.to_datetime(pdf["eventTs"]).dropna()
            ts_us.extend(int(v) // 1000 for v in ts.astype("int64"))
        ts_us.sort()

        open_trip = tuple(self._trip.get()) if self._trip.exists() else None
        closed: list[tuple[int, int, int]] = []
        for t in ts_us:
            if open_trip is None:
                open_trip = (t, t, 1)
            elif t - open_trip[1] <= _GAP_US:
                open_trip = (open_trip[0], max(open_trip[1], t), open_trip[2] + 1)
            else:
                closed.append(open_trip)
                open_trip = (t, t, 1)

        if open_trip is not None:
            self._trip.update(open_trip)
            # re-arm the finalization timer at the NEW horizon: a stale
            # timer from a previous batch would fire early and split the
            # still-open trip, so it is deleted before registering
            for old in self._handle.listTimers():
                self._handle.deleteTimer(old)
            self._handle.registerTimer(open_trip[1] // 1000 + TRIP_GAP_MIN * 60 * 1000)
        if closed:
            yield _emit(provider, vehicle, closed)

    def handleExpiredTimer(
        self, key: tuple, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        provider, vehicle = key
        if self._trip.exists():
            trip = tuple(self._trip.get())
            self._trip.clear()
            yield _emit(provider, vehicle, [trip])

    def close(self) -> None:
        pass


def vehicle_trips_stream_tws(pings: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """pings stream -> closed-trip stream via ``transformWithStateInPandas``
    (append; event-time timers finalize dangling trips)."""
    return (
        pings.withWatermark("eventTs", watermark)
        .groupBy("provider", "vehicleId")
        .transformWithStateInPandas(
            TripProcessor(),
            TRIP_OUTPUT_SCHEMA,
            "append",
            "eventTime",
        )
    )
