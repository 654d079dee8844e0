"""Custom stateful streaming operators via ``applyInPandasWithState``
(the north-star escape hatch for semantics the built-in operators can't
express: user-defined per-key state machines).

State discipline at scale: state is keyed by the shuffle key (lives where
the data lands), kept to fixed-width scalars, and bounded by a processing-
time timeout so abandoned keys are evicted — unbounded keyed state is the
streaming OOM."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType


def running_count(
    stream: DataFrame,
    key: str = "user_id",
    timeout_ms: int | None = None,
) -> DataFrame:
    """Per-key cumulative event counter: each micro-batch emits the running
    total (count survives across batches in keyed state)."""
    out_schema = f"{key} long, total long"
    state_schema = "total long"

    def update(key_tuple, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            # Eviction callback: the batch iterator is EMPTY. The running
            # total was already emitted on every batch that touched this
            # key (update mode), so eviction just drops the state — no
            # final row, no touching the iterator.
            if state.exists:
                state.remove()
            return
        total = state.get[0] if state.exists else 0
        for pdf in pdfs:
            total += len(pdf)
        state.update((total,))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame({key: [key_tuple[0]], "total": [total]})

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return stream.groupBy(key).applyInPandasWithState(
        update,
        outputStructType=StructType.fromDDL(out_schema),
        stateStructType=StructType.fromDDL(state_schema),
        outputMode="update",
        timeoutConf=timeout,
    )


def session_tracker(
    stream: DataFrame,
    key: str = "user_id",
    ts_us_col: str = "ts_us",
    tiebreak_col: str = "event_id",
    gap_sec: int = 900,
    timeout_ms: int | None = None,
) -> DataFrame:
    """TRUE streaming sessionization: per-key state holds the OPEN
    session (start, last-event, count as three longs — fixed width);
    each micro-batch's events extend it or, when the event-time gap
    exceeds ``gap_sec``, CLOSE it — closed sessions are what the
    operator emits. The still-open session stays in state (flushed by
    the processing-time timeout in production; at stream end it is the
    documented unemitted tail — the same visibility rule as the outer
    stream-stream join).

    Event-time correctness requires per-key batch monotonicity (events
    for a key must not arrive in an earlier batch than earlier events
    — file-stream replays stage time-ranged files; Kafka gives it per
    partition). Within a batch, order is restored by sorting on
    ``(ts, tiebreak)`` — batches are allowed to be internally
    unordered. Timestamps are epoch MICROSECOND longs (exact; no
    pandas datetime-unit ambiguity).
    """
    out_schema = (
        f"{key} long, session_start_us long, session_end_us long, "
        "n_events long")
    state_schema = "start_us long, last_us long, n long"
    gap_us = gap_sec * 1_000_000

    def update(key_tuple, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            # Processing-time eviction: Spark hands an EMPTY batch
            # iterator (pd.concat would raise), so flush the open
            # session as closed and drop the state — this is the
            # "flushed by the processing-time timeout" path of the
            # docstring.
            if state.exists:
                start, last, n = state.get
                state.remove()
                if start is not None:
                    yield pd.DataFrame({
                        key: [key_tuple[0]],
                        "session_start_us": [start],
                        "session_end_us": [last],
                        "n_events": [n],
                    })
            return
        start, last, n = state.get if state.exists else (None, None, 0)
        closed: list[tuple[int, int, int]] = []
        frames = [pdf for pdf in pdfs if len(pdf)]
        if not frames:
            # Defensive: an empty non-timeout invocation just re-arms.
            if state.exists:
                state.update((start, last, n))
                if timeout_ms is not None:
                    state.setTimeoutDuration(timeout_ms)
            return
        rows = pd.concat(frames, ignore_index=True)
        rows = rows.sort_values([ts_us_col, tiebreak_col])
        for ts in rows[ts_us_col].astype("int64"):
            ts = int(ts)
            if start is None:
                start, last, n = ts, ts, 1
            elif ts - last > gap_us:
                closed.append((start, last, n))
                start, last, n = ts, ts, 1
            else:
                # min/max clamps (r11 out-of-order probe): a LATE event
                # from a contract-violating earlier-time batch folds
                # into the open session but can never regress its end —
                # an unclamped `last = ts` made the NEXT on-time event's
                # gap measure against the regressed end and split
                # phantom sessions. In-order input hits ts >= last and
                # the clamps are identities.
                start, last, n = min(start, ts), max(last, ts), n + 1
        state.update((start, last, n))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        if closed:
            yield pd.DataFrame({
                key: [key_tuple[0]] * len(closed),
                "session_start_us": [c[0] for c in closed],
                "session_end_us": [c[1] for c in closed],
                "n_events": [c[2] for c in closed],
            })

    return stream.groupBy(key).applyInPandasWithState(
        update,
        outputStructType=StructType.fromDDL(out_schema),
        stateStructType=StructType.fromDDL(state_schema),
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def heavy_hitters_tracker(
    stream: DataFrame,
    key: str = "event_type",
    item_col: str = "item",
    capacity: int = 8,
    timeout_ms: int | None = None,
) -> DataFrame:
    """TRUE-streaming Misra-Gries heavy hitters per key (the streaming
    twin of the batch `text_heavy_hitters` sketch): keyed state holds a
    bounded summary of at most ``capacity`` (item, count) pairs; each
    micro-batch's counts merge in with the summary-merge rule (Agarwal
    et al. 2013 — subtract the (capacity+1)-th largest count, drop the
    non-positive), so state stays O(capacity) per key FOREVER while
    guaranteeing

        true_count − N/(capacity+1)  <=  est  <=  true_count

    and that any item with true frequency above N/(capacity+1) is
    still in the summary. Ties in the merge order break on
    (count desc, item asc), so the whole trajectory is deterministic
    given the micro-batch order (stage replay files with distinct
    mtimes — the batch-order lesson). Each batch emits the key's full
    summary stamped with a state-owned batch sequence number; readers
    take the max-seq rows per key."""
    out_schema = (f"{key} string, seq long, item string, "
                  "est long, n_total long")
    state_schema = "items array<string>, counts array<long>, n long, seq long"

    def update(key_tuple, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            if state.exists:
                state.remove()
            return
        if state.exists:
            items, counts, n, seq = state.get
            summary = dict(zip(items, counts))
        else:
            summary, n, seq = {}, 0, 0
        batch_n = 0
        for pdf in pdfs:
            vc = pdf[item_col].value_counts()
            batch_n += int(vc.sum())
            for item, c in vc.items():
                summary[str(item)] = summary.get(str(item), 0) + int(c)
        n += batch_n
        if len(summary) > capacity:
            ranked = sorted(summary.items(), key=lambda kv: (-kv[1], kv[0]))
            t = ranked[capacity][1]
            summary = {i: c - t for i, c in ranked[:capacity] if c - t > 0}
        seq += 1
        items = sorted(summary)
        state.update((items, [summary[i] for i in items], n, seq))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame({
            key: [key_tuple[0]] * len(items),
            "seq": [seq] * len(items),
            "item": items,
            "est": [summary[i] for i in items],
            "n_total": [n] * len(items),
        })

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return stream.groupBy(key).applyInPandasWithState(
        update,
        outputStructType=StructType.fromDDL(out_schema),
        stateStructType=StructType.fromDDL(state_schema),
        outputMode="update",
        timeoutConf=timeout,
    )


def ttl_inactivity_tracker(
    stream: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    ttl_sec: int = 1800,
    delay: str = "0 seconds",
) -> DataFrame:
    """Keyed state with an EVENT-TIME TTL: per-key activity state
    (first seen, last seen, event count) that EXPIRES when the stream's
    watermark passes ``last activity + ttl_sec``; each expiry emits ONE
    final row — the inactive-entity emission (abandoned cart, dormant
    device, closed account session). Active keys emit nothing: the
    operator's output IS the expirations (append mode).

    Unlike the PROCESSING-time timeouts on :func:`running_count` /
    :func:`session_tracker` (wall-clock, nondeterministic under
    replay — unit-poll-only evidence), this TTL is EVENT-time: the
    watermark is a function of the data and the batch boundaries, so a
    staged file replay produces the exact same expiry rows every run
    and a test can assert them row-for-row. Same per-key batch
    monotonicity contract as ``session_tracker``; ``ts_col`` must be a
    TIMESTAMP (the watermark needs one — applied here with ``delay``).

    State is three longs per key — fixed width, O(1) per key, the
    module discipline. The timeout registration clamps to
    ``watermark + 1 ms`` when a fully-late batch would otherwise
    register a timeout the engine rejects (timeouts may not precede
    the current watermark). Emits ``(key, first_seen_us,
    last_seen_us, n_events, expired_at_wm_ms)`` — exact integer
    micros/millis, no timestamp-unit ambiguity. The key column keeps
    its INPUT type in the output (string device ids work as well as
    long user ids — ADVICE r11 flagged the hardcoded ``long``)."""
    key_ddl = stream.schema[key].dataType.simpleString()
    out_schema = (
        f"{key} {key_ddl}, first_seen_us long, last_seen_us long, "
        "n_events long, expired_at_wm_ms long")
    state_schema = "first_us long, last_us long, n long"
    ttl_ms = int(ttl_sec) * 1000

    def update(key_tuple, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            # Event-time eviction: the batch iterator is empty; the
            # state's final aggregate is the emission.
            first, last, n = state.get
            state.remove()
            yield pd.DataFrame({
                key: [key_tuple[0]],
                "first_seen_us": [first],
                "last_seen_us": [last],
                "n_events": [n],
                "expired_at_wm_ms": [state.getCurrentWatermarkMs()],
            })
            return
        first, last, n = state.get if state.exists else (None, None, 0)
        for pdf in pdfs:
            if not len(pdf):
                continue
            # robust across pandas datetime units (ns or us)
            us = pdf[ts_col].astype("datetime64[us]").astype("int64")
            mn, mx = int(us.min()), int(us.max())
            first = mn if first is None else min(first, mn)
            last = mx if last is None else max(last, mx)
            n += len(pdf)
        if last is None:
            return
        state.update((first, last, n))
        state.setTimeoutTimestamp(
            max(last // 1000 + ttl_ms, state.getCurrentWatermarkMs() + 1))

    return (
        stream.withWatermark(ts_col, delay)
        .groupBy(key)
        .applyInPandasWithState(
            update,
            outputStructType=StructType.fromDDL(out_schema),
            stateStructType=StructType.fromDDL(state_schema),
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def running_count_tws(
    stream: DataFrame,
    key: str = "user_id",
) -> DataFrame:
    """Per-key cumulative counter on the NEW Spark 4 arbitrary-state
    API (``transformWithStateInPandas`` — typed state variables +
    timers + TTL, the successor to ``applyInPandasWithState``'s single
    state tuple): semantically identical to :func:`running_count`, so
    the two APIs can be differential-tested against each other (the
    `stream_stateful_tws` gate reuses the batch COUNT(*) oracle).
    State is one ValueState long per key — same O(1)-per-key
    discipline as every operator in this module.

    ENVIRONMENT GATE: the new API's driver worker imports
    ``google.protobuf``; call :func:`tws_available` first — in a
    container without protobuf the query crashes at init (this is a
    runtime dependency of Spark's transform_with_state_driver_worker,
    not of this module). The `applyInPandasWithState` twin
    (:func:`running_count`) has no such dependency and is the gated,
    driver-checked path."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql.types import LongType, StructField
    import pandas as pd

    out_schema = StructType.fromDDL(f"{key} long, total long")

    class Counter(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._count = handle.getValueState(
                "count", StructType([StructField("n", LongType())]))

        def handleInputRows(self, k, rows, timerValues):
            total = self._count.get()[0] if self._count.exists() else 0
            for pdf in rows:
                total += len(pdf)
            self._count.update((total,))
            yield pd.DataFrame({key: [k[0]], "total": [total]})

        def close(self) -> None:
            pass

    return stream.groupBy(key).transformWithStateInPandas(
        statefulProcessor=Counter(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


def tws_available() -> bool:
    """True when the ``transformWithStateInPandas`` runtime dependency
    (google.protobuf) is importable — the new-API operators crash at
    driver-worker init without it."""
    try:
        from google.protobuf import descriptor  # noqa: F401
        return True
    except ImportError:
        return False
