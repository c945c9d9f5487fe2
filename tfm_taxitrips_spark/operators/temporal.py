"""Temporal operators: sessionization and as-of join (engine extensions;
the reference has no window functions at all — SURVEY.md §2.7).

Both are implemented as window functions over a single shuffle on the
entity key — the only scalable shape: a naive as-of via range join is
O(probes × candidates) per key, while the union+last() trick below is
O(n log n) within each key partition and streams through one sort.
Timestamps are compared as integer epoch-micros so results are exact and
engine-portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap: str = "30 minutes",
) -> DataFrame:
    """Assign gap-based session ids per user: a new session starts when the
    time since the previous event exceeds ``gap``.

    Adds ``us`` (epoch micros), ``session_id`` (1-based per user).
    One shuffle on ``user_col``; in-partition sort by (us, id).
    """
    gap_us = _duration_us(gap)
    w = Window.partitionBy(user_col).orderBy("us", id_col)
    with_us = df.withColumn("us", F.unix_micros(F.col(ts_col)))
    prev = F.lag("us").over(w)
    new_session = F.when(
        prev.isNull() | ((F.col("us") - prev) > gap_us), 1
    ).otherwise(0)
    cum = Window.partitionBy(user_col).orderBy("us", id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return with_us.withColumn("_new_s", new_session).withColumn(
        "session_id", F.sum("_new_s").over(cum)
    ).drop("_new_s")


def _duration_us(duration: str) -> int:
    qty, unit = duration.split()
    mult = {
        "seconds": 1_000_000,
        "second": 1_000_000,
        "minutes": 60_000_000,
        "minute": 60_000_000,
        "hours": 3_600_000_000,
        "hour": 3_600_000_000,
    }[unit]
    return int(qty) * mult


def time_range_join(
    probes: DataFrame,
    candidates: DataFrame,
    probe_ts: str,
    cand_ts: str,
    range_us: int,
) -> DataFrame:
    """All (probe, candidate) pairs with ``cand_ts ∈ [probe_ts, probe_ts +
    range_us]`` — WITHOUT a nested-loop join.

    A naive range join has no equi key, so Spark plans
    BroadcastNestedLoopJoin / cartesian — O(|P|·|C|), dead at scale. The
    scalable shape: quantize time into buckets of exactly ``range_us``; a
    candidate can only match probes in its own or the previous bucket, so
    replicating each candidate row to those two buckets turns the range
    join into an equi shuffle join on the bucket id + an exact residual
    filter. Cost: 2× the candidate rows through one hash shuffle — linear,
    partitionable, AQE-skew-splittable.

    Expects both inputs to carry integer epoch-micro columns (``probe_ts``,
    ``cand_ts``). Column names must be disjoint.
    """
    # integer division (not fp /) so bucket edges are exact at any magnitude
    bucket = F.expr(f"{cand_ts} DIV {range_us}")
    c2 = candidates.withColumn(
        "_b", F.explode(F.array(bucket, bucket - 1))
    )
    p2 = probes.withColumn("_b", F.expr(f"{probe_ts} DIV {range_us}"))
    return (
        p2.join(c2, "_b")
        .where(
            (F.col(cand_ts) >= F.col(probe_ts))
            & (F.col(cand_ts) <= F.col(probe_ts) + range_us)
        )
        .drop("_b")
    )


def asof_join(
    probes: DataFrame,
    candidates: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    payload: Column | str,
    payload_name: str = "asof_value",
) -> DataFrame:
    """For each probe row, the most recent candidate with ``ts <= probe.ts``
    (ties: candidate first, then larger id wins), per key.

    Implementation: tag and union both sides, one window sort per key,
    ``last(payload, ignorenulls=True)`` carries the latest candidate payload
    forward onto each probe row. No range join, no per-probe scan.
    """
    payload_col = F.col(payload) if isinstance(payload, str) else payload
    # carry the payload in its OWN type: probe the dtype from the candidate
    # schema so nothing is silently truncated to bigint
    payload_type = candidates.select(payload_col.alias("_p")).schema["_p"].dataType
    p = probes.select(
        F.col(key_col),
        F.col(id_col),
        F.unix_micros(F.col(ts_col)).alias("us"),
        F.lit(1).alias("_is_probe"),
        F.lit(None).cast(payload_type).alias("_payload"),
    )
    c = candidates.select(
        F.col(key_col),
        F.col(id_col),
        F.unix_micros(F.col(ts_col)).alias("us"),
        F.lit(0).alias("_is_probe"),
        payload_col.cast(payload_type).alias("_payload"),
    )
    unioned = p.unionByName(c)
    w = (
        Window.partitionBy(key_col)
        .orderBy("us", "_is_probe", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        payload_name, F.last("_payload", ignorenulls=True).over(w)
    )
    return carried.where(F.col("_is_probe") == 1).drop("_is_probe", "_payload")


def asof_forward_join(
    probes: DataFrame,
    candidates: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    tolerance_us: int | None = None,
) -> DataFrame:
    """FORWARD as-of: for each probe row, the EARLIEST candidate with
    ``ts >= probe.ts`` per key (ties at the same timestamp match — probes
    sort before candidates), optionally nulled when the gap exceeds
    ``tolerance_us``. The mirror of :func:`asof_join`.

    Same scale shape: tag + union + ONE window scan per key, with
    ``last(..., ignorenulls=True)`` over a reverse-ordered running frame
    (the O(n) formulation of "earliest at-or-after" — see the comment at
    the window below) carrying the next candidate's id and timestamp
    together (both read the identical frame, so they always come from
    the same matched row).
    Output: probe rows with ``us``, ``next_id``, ``next_us`` (and
    ``gap_us`` when a tolerance is given).
    """
    p = probes.select(
        F.col(key_col),
        F.col(id_col),
        F.unix_micros(F.col(ts_col)).alias("us"),
        F.lit(0).alias("_build_rank"),
        F.lit(None).cast("long").alias("_b_id"),
        F.lit(None).cast("long").alias("_b_us"),
    )
    c = candidates.select(
        F.col(key_col),
        F.col(id_col),
        F.unix_micros(F.col(ts_col)).alias("us"),
        F.lit(1).alias("_build_rank"),
        F.col(id_col).cast("long").alias("_b_id"),
        F.unix_micros(F.col(ts_col)).alias("_b_us"),
    )
    # r18 (guide §2; same fix as q_event_gap_fill_interp): the forward
    # carry as a RUNNING frame over the REVERSE ordering instead of a
    # [currentRow, unboundedFollowing] frame — Spark re-aggregates an
    # UnboundedFollowing frame from scratch for every row (O(n²) per
    # key), while the reversed [unboundedPreceding, currentRow] frame is
    # incremental (O(n)). last(ignorenulls) over (us, _build_rank, id)
    # DESC is exactly first(ignorenulls) over the same columns ASC from
    # the current row forward; the ordering is total (id unique within
    # each _build_rank), so results are bit-identical. Both carried
    # columns read the identical frame, so they still come from the same
    # matched row.
    w = (
        Window.partitionBy(key_col)
        .orderBy(
            F.col("us").desc(), F.col("_build_rank").desc(),
            F.col(id_col).desc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = p.unionByName(c).select(
        key_col,
        id_col,
        "us",
        "_build_rank",
        F.last("_b_id", ignorenulls=True).over(w).alias("next_id"),
        F.last("_b_us", ignorenulls=True).over(w).alias("next_us"),
    )
    out = carried.where(F.col("_build_rank") == 0).drop("_build_rank")
    if tolerance_us is not None:
        within = F.col("next_us") - F.col("us") <= tolerance_us
        out = out.select(
            key_col,
            id_col,
            "us",
            F.when(within, F.col("next_id")).alias("next_id"),
            F.when(within, F.col("next_us") - F.col("us")).alias("gap_us"),
        )
    return out
