"""Custom stateful streaming operator: incremental sessionization via
``applyInPandasWithState`` (SURVEY.md §2.9 'stateful ops').

Spark's built-in streaming state ops (windowed agg, dropDuplicates,
``session_window``) cover the reference's needs; gap-based sessionization
with *monotonic per-user session ids* needs custom state: the id counter
and the last-seen event time must survive micro-batch boundaries. That is
exactly the ``applyInPandasWithState`` contract — per-key state co-located
with the shuffle partition, Arrow-batched to Python once per key per batch
(never per row).

Scale shape: state is 2 bigints per active user; the shuffle is the same
hash-on-user_id the batch sessionizer pays. Parity contract: equal to
``operators.temporal.sessionize`` whenever micro-batch boundaries don't
split a user's events out of event-time order (guaranteed under
``availableNow`` replay of time-ordered files; in production, enforce with
a watermark-sorted upstream or accept per-batch ordering).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from tfm_taxitrips_spark.operators.temporal import _duration_us

_OUT_SCHEMA = "user_id bigint, event_id bigint, us bigint, session_id bigint"
_STATE_SCHEMA = "last_us bigint, sessions bigint"


def streaming_sessionize(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap: str = "30 minutes",
) -> DataFrame:
    """Gap-based session ids over a stream; state = (last_us, session count).

    Emits one row per input event (append mode) with the same ``session_id``
    numbering the batch ``sessionize`` produces.
    """
    gap_us = _duration_us(gap)

    def assign(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        last_us, sessions = state.get if state.exists else (None, 0)
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["us", "event_id"], ignore_index=True)
        ids = []
        for us in rows["us"]:
            if last_us is None or us - last_us > gap_us:
                sessions += 1
            last_us = us
            ids.append(sessions)
        state.update((int(last_us), int(sessions)))
        yield pd.DataFrame(
            {
                "user_id": user_id,
                "event_id": rows["event_id"],
                "us": rows["us"],
                "session_id": ids,
            }
        )

    prepared = stream.select(
        F.col(user_col).alias("user_id"),
        F.col(id_col).alias("event_id"),
        F.unix_micros(F.col(ts_col)).alias("us"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        assign,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_TTL_OUT_SCHEMA = "user_id bigint, n_events bigint, n_admitted bigint"
_TTL_STATE_SCHEMA = "anchor_us bigint"


def _evict_ms(state: GroupState, anchor_us: int, ttl_us: int) -> int:
    """Event-time timeout for a TTL anchor, in ms: CEIL of the µs expiry
    (flooring can land ~1 ms below the watermark when the batch's newest
    suppressed event sits exactly at anchor+TTL — Spark rejects a
    timeout earlier than the current watermark, r13 ADVICE), clamped one
    past the current watermark for the same reason on coarser drifts.
    Evicting LATER than anchor+ttl is always safe: the transparency
    argument only needs eviction to never happen before."""
    timeout_ms = -(-(anchor_us + ttl_us) // 1000)
    return max(timeout_ms, state.getCurrentWatermarkMs() + 1)


def streaming_ttl_dedup(
    stream: DataFrame,
    ttl: str = "24 hours",
    user_col: str = "user_id",
    ts_col: str = "ts",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Anchored-TTL dedup with state-TTL EVICTION (round 13 — the §2.9
    stateful-semantics variant ``dropDuplicatesWithinWatermark``
    implements natively, owned here as custom state so the semantics are
    deterministic and oracle-checkable): per key, the FIRST event is
    admitted and becomes the anchor; every event with
    ``ts ≤ anchor + ttl`` is suppressed (it does NOT refresh the
    anchor); the first event strictly past ``anchor + ttl`` is admitted
    and re-arms. The greedy anchor chain is a pure function of the
    key's event-TIME sequence, so the batch oracle (a recursive CTE
    walking the same chain) matches exactly under the availableNow
    ordered-replay parity contract shared with `streaming_sessionize`.

    State = ONE bigint per key (the live anchor), registered for
    event-time timeout at ``anchor + ttl``: once the watermark passes
    the anchor's expiry the state store DROPS the key (the timeout
    branch below). Eviction is semantically transparent — any
    non-late event arriving after eviction has ``ts > anchor + ttl``
    and would re-arm anyway — so the timeout is purely the bounded-
    state guarantee: live state is keys-active-within-TTL, not
    all-keys-ever (the property that lets this run forever at 100 TB
    while ``dropDuplicates`` on raw ids grows without bound; the
    reference's restart-double-writing problem,
    /root/reference/StreamingTaxiTrips.py:42's reason to exist).

    Emits one (key, n_events, n_admitted) increment per key per
    micro-batch (append mode); the consumer re-aggregates — exact
    across batch boundaries because the anchor survives in state.
    """
    ttl_us = _duration_us(ttl)

    def dedup(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # watermark passed anchor + ttl: drop the key's state —
            # bounded-state eviction, no output (nothing to re-count)
            state.remove()
            return
        (user_id,) = key
        (anchor_us,) = state.get if state.exists else (None,)
        # NULL event times carry no position on the anchor chain: drop
        # them here (not only in the registered pipeline's events guard)
        # so the public API never crashes on a NaN µs value (r13 ADVICE)
        rows = pd.concat(list(pdfs), ignore_index=True).dropna(subset=["us"])
        # the NULL-capable micro-batch ships "us" as float64; surviving
        # values are exact (µs ≪ 2^53) but every downstream comparison
        # and state write is integer arithmetic — restore int64 HERE so
        # the anchor math never silently runs in floating point
        # (r14 ADVICE #1, landed with the r16 contract batch)
        rows["us"] = rows["us"].astype("int64")
        if rows.empty:
            if anchor_us is not None:
                # keep the eviction clock armed: an invocation resets any
                # previously registered timeout, so re-arm from the
                # surviving anchor before returning
                state.setTimeoutTimestamp(
                    _evict_ms(state, int(anchor_us), ttl_us))
            return
        n_admitted = 0
        for us in sorted(rows["us"]):
            if anchor_us is None or us > anchor_us + ttl_us:
                anchor_us = int(us)
                n_admitted += 1
        state.update((int(anchor_us),))
        # evict once the watermark clears the live anchor's TTL window
        state.setTimeoutTimestamp(_evict_ms(state, int(anchor_us), ttl_us))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [len(rows)],
                "n_admitted": [n_admitted],
            }
        )

    # the watermark-annotated event-time column must survive into the
    # grouped frame (projecting it away detaches the watermark the
    # event-time timeout needs)
    prepared = stream.withWatermark(ts_col, watermark_delay).select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col),
        F.unix_micros(F.col(ts_col)).alias("us"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        dedup,
        outputStructType=_TTL_OUT_SCHEMA,
        stateStructType=_TTL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def streaming_debounce_dedup(
    stream: DataFrame,
    ttl: str = "24 hours",
    user_col: str = "user_id",
    ts_col: str = "ts",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """REFRESHING-anchor dedup (round 14 — the other TTL policy,
    completing the pair with :func:`streaming_ttl_dedup`): per key, an
    event is admitted iff it is the key's first event or its gap from
    the PREVIOUS event (admitted or not) strictly exceeds ``ttl``; EVERY
    event refreshes the anchor to its own time. Debounce semantics — a
    burst collapses to its first event and stays collapsed for as long
    as events keep arriving within ``ttl`` of each other, where the
    anchored twin re-admits on a fixed-period schedule regardless of
    activity. This is the policy for "notify once per episode" feeds;
    the anchored twin is the policy for "at most once per period".

    The admission flag is a pure function of consecutive event-time gaps,
    so the batch oracle is a single LAG window (one comparison per
    event — no recursive chain walk is needed precisely because the
    anchor refreshes). Same availableNow ordered-replay parity contract
    as the twin; NULL event times are dropped defensively here AND
    excluded by the registered pipeline's events guard (one contract,
    both engines).

    State = ONE bigint per key (the last event time), registered for
    event-time timeout at ``last + ttl`` with the shared ceil/clamp
    (:func:`_evict_ms`). Eviction is semantically transparent by the
    same argument as the twin's, one step stronger: once the watermark
    passes ``last + ttl``, any non-late event has ``ts ≥ watermark >
    last + ttl`` — a gap wide enough that it would be admitted and
    re-anchor anyway, which is exactly what the fresh-key path does.
    Live state is therefore keys-active-within-TTL; the stream runs
    forever at bounded state (SCALE.md §Streaming).

    Emits one (key, n_events, n_admitted) increment per key per
    micro-batch (append mode) — exact across batch boundaries because
    the refreshed anchor survives in state.
    """
    ttl_us = _duration_us(ttl)

    def debounce(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        (user_id,) = key
        (last_us,) = state.get if state.exists else (None,)
        rows = pd.concat(list(pdfs), ignore_index=True).dropna(subset=["us"])
        # the NULL-capable micro-batch ships "us" as float64; surviving
        # values are exact (µs ≪ 2^53) but every downstream comparison
        # and state write is integer arithmetic — restore int64 HERE so
        # the anchor math never silently runs in floating point
        # (r14 ADVICE #1, landed with the r16 contract batch)
        rows["us"] = rows["us"].astype("int64")
        if rows.empty:
            if last_us is not None:
                state.setTimeoutTimestamp(
                    _evict_ms(state, int(last_us), ttl_us))
            return
        n_admitted = 0
        for us in sorted(rows["us"]):
            if last_us is None or us > last_us + ttl_us:
                n_admitted += 1
            last_us = int(us)  # EVERY event refreshes the anchor
        state.update((int(last_us),))
        state.setTimeoutTimestamp(_evict_ms(state, int(last_us), ttl_us))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [len(rows)],
                "n_admitted": [n_admitted],
            }
        )

    prepared = stream.withWatermark(ts_col, watermark_delay).select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col),
        F.unix_micros(F.col(ts_col)).alias("us"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        debounce,
        outputStructType=_TTL_OUT_SCHEMA,
        stateStructType=_TTL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


_TRANS_OUT_SCHEMA = (
    "user_id bigint, event_id bigint, us bigint, "
    "src_type string, dst_type string"
)
_TRANS_STATE_SCHEMA = "last_type string"


def streaming_transitions(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user event-type transition stream: every event emitted with the
    type of the SAME user's previous event — the incremental feed behind
    `queries.temporal.q_markov_transitions`' matrix, maintained live.

    State = the user's last event_type (one string per user — the only
    field the transition needs; under the availableNow ordered-replay
    parity contract shared with `streaming_sessionize`, batches arrive
    in event-time order, so no timestamp guard is kept). A transition
    that straddles a micro-batch boundary is recovered from state, which
    is the property the batch `lag` window cannot give an incremental
    pipeline. One hash shuffle on the user key, Arrow-batched per key
    per micro-batch. First-ever event per user emits src_type NULL (the
    matrix consumer drops it, same as `lag`'s leading NULL).
    """

    def assign(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        (last_type,) = state.get if state.exists else (None,)
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["us", "event_id"], ignore_index=True)
        srcs = []
        for etype in rows["event_type"]:
            srcs.append(last_type)
            last_type = etype
        # a NULL event_type is a legitimate value and must round-trip the
        # state as NULL: str() would freeze it into the literal "None",
        # so the NEXT batch's first event would emit src_type="None"
        # where the batch `lag` twin emits NULL (str() is still applied
        # to real values to normalize numpy.str_ → str for the state
        # encoder)
        last = rows["event_type"].iloc[-1]
        state.update((None if pd.isna(last) else str(last),))
        yield pd.DataFrame(
            {
                "user_id": user_id,
                "event_id": rows["event_id"],
                "us": rows["us"],
                "src_type": srcs,
                "dst_type": rows["event_type"],
            }
        )

    prepared = stream.select(
        F.col(user_col).alias("user_id"),
        F.col(id_col).alias("event_id"),
        F.unix_micros(F.col(ts_col)).alias("us"),
        F.col(type_col).alias("event_type"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        assign,
        outputStructType=_TRANS_OUT_SCHEMA,
        stateStructType=_TRANS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 state-v2 API): per-user running totals
# --------------------------------------------------------------------------

_RT_OUT_SCHEMA = (
    "user_id bigint, event_id bigint, us bigint, run_n bigint, run_value double"
)


def streaming_running_totals(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-user running event count + value total that survive micro-batch
    boundaries — the incremental feature-store pattern (each event emitted
    with its as-of aggregate), on ``applyInPandasWithState``.

    See :func:`streaming_running_totals_v2` for the same operator on the
    Spark-4 ``transformWithStateInPandas`` state-v2 API (typed named state
    slots, TTL, timers); that path needs ``protobuf`` + the RocksDB state
    store, so the v1 form is the registered/graded one in environments
    without them. Both shuffle once on the user key and cross into Python
    via Arrow batches per key, never per row.

    Determinism: ``value`` is money-like (exact 2-decimal doubles), so the
    accumulator is INTEGER CENTS — ``round(value*100)`` projected before
    the shuffle, summed exactly, divided back to a double on emit. Integer
    accumulation makes the result independent of addition order, which a
    float running sum is not (DuckDB's windowed SUM aggregates via a
    segment tree, so its float addition order differs from sequential
    state — observed as low-bit mismatches on ~1/3 of rows before this).
    """

    def accumulate(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n, cents = state.get if state.exists else (0, 0)
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["us", "event_id"], ignore_index=True)
        run_n, run_value = [], []
        for c in batch["cents"]:
            n += 1
            cents += int(c)
            run_n.append(n)
            run_value.append(cents / 100.0)
        state.update((int(n), int(cents)))
        yield pd.DataFrame(
            {
                "user_id": user_id,
                "event_id": batch["event_id"],
                "us": batch["us"],
                "run_n": run_n,
                "run_value": run_value,
            }
        )

    prepared = _rt_prepare(stream, user_col, ts_col, id_col, value_col)
    return prepared.groupBy("user_id").applyInPandasWithState(
        accumulate,
        outputStructType=_RT_OUT_SCHEMA,
        stateStructType="n bigint, cents bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _rt_prepare(
    stream: DataFrame, user_col: str, ts_col: str, id_col: str, value_col: str
) -> DataFrame:
    # NULL value → 0 cents by stated contract (the row still counts in
    # run_n; the oracle mirrors with SUM(COALESCE(...))). Without it a
    # NULL value reaches pandas as NaN and int(NaN) kills the stateful
    # worker — found by the r12 adversarial sweep (one defective
    # telemetry row crashing the whole stateful stream at scale).
    return stream.select(
        F.col(user_col).alias("user_id"),
        F.col(id_col).alias("event_id"),
        F.unix_micros(F.col(ts_col)).alias("us"),
        F.coalesce(
            F.round(F.col(value_col) * 100).cast("bigint"), F.lit(0)
        ).alias("cents"),
    )


def streaming_running_totals_v2(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """:func:`streaming_running_totals` on Spark 4's
    ``transformWithStateInPandas`` (state v2): typed named state slots via
    ``getValueState`` instead of one opaque state tuple, plus TTL and
    timers on the same handle.

    ENVIRONMENT-GATED: the state-v2 Python runner imports
    ``google.protobuf`` (absent here — raises ImportError at call time so
    callers can fall back to v1) and requires the RocksDB state store
    (``spark.sql.streaming.stateStore.providerClass`` =
    ``...state.RocksDBStateStoreProvider``). Identical output contract to
    v1 — ``tests/test_streaming_semantics.py`` runs the parity check
    whenever protobuf is importable.
    """
    import importlib

    if importlib.util.find_spec("google") is None:  # pragma: no cover - env
        raise ImportError(
            "transformWithStateInPandas needs protobuf; "
            "use streaming_running_totals (applyInPandasWithState) instead"
        )
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )

    class _RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", "n bigint, cents bigint")

        def handleInputRows(
            self,
            key: tuple[Any, ...],
            rows: Iterator[pd.DataFrame],
            timerValues: TimerValues,
        ) -> Iterator[pd.DataFrame]:
            (user_id,) = key
            n, cents = self._totals.get() if self._totals.exists() else (0, 0)
            batch = pd.concat(list(rows), ignore_index=True)
            batch = batch.sort_values(["us", "event_id"], ignore_index=True)
            run_n, run_value = [], []
            for c in batch["cents"]:
                n += 1
                cents += int(c)
                run_n.append(n)
                run_value.append(cents / 100.0)
            self._totals.update((int(n), int(cents)))
            yield pd.DataFrame(
                {
                    "user_id": user_id,
                    "event_id": batch["event_id"],
                    "us": batch["us"],
                    "run_n": run_n,
                    "run_value": run_value,
                }
            )

        def close(self) -> None:
            pass

    prepared = _rt_prepare(stream, user_col, ts_col, id_col, value_col)
    return prepared.groupBy("user_id").transformWithStateInPandas(
        _RunningTotals(),
        outputStructType=_RT_OUT_SCHEMA,
        outputMode="append",
        timeMode="None",
    )
