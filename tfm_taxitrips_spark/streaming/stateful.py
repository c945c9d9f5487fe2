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
