"""Temporal queries over events: sessionization, as-of join (engine
extensions beyond the reference — SURVEY.md §2.7 notes it has no window
functions; these are the first-class equivalents a serving layer needs).

All timestamp math happens on integer epoch-micros (``unix_micros`` /
``epoch_us``) so Spark and the DuckDB oracle agree bit-for-bit whatever
precision the source parquet stores (see sources.readers.read_events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tfm_taxitrips_spark.functions.aggregates import dsum, dsum_sql
from tfm_taxitrips_spark.operators.prefix import two_phase_prefix_sum
from tfm_taxitrips_spark.operators.temporal import (
    asof_forward_join,
    asof_join,
    sessionize,
    time_range_join,
)
from tfm_taxitrips_spark.queries.registry import QuerySpec
from tfm_taxitrips_spark.sources.readers import table

GAP = "30 minutes"
GAP_US = 30 * 60 * 1_000_000


def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions per user: one shuffle on user_id, windowed scan."""
    events = table(spark, sf_dir, "events")
    s = sessionize(events, gap=GAP)
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("us").alias("session_start_us"),
        F.max("us").alias("session_end_us"),
    )


_SESSION_SQL = f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
),
x AS (
  SELECT *,
         CASE WHEN LAG(us) OVER w IS NULL OR us - LAG(us) OVER w > {GAP_US}
              THEN 1 ELSE 0 END AS new_s
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
s AS (
  SELECT *,
         CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM x
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       MIN(us) AS session_start_us, MAX(us) AS session_end_us
FROM s GROUP BY 1, 2
"""


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent
    at-or-before click (union + carry-forward window — no range join)."""
    events = table(spark, sf_dir, "events")
    purchases = events.where(F.col("event_type") == "purchase")
    clicks = events.where(F.col("event_type") == "click")
    joined = asof_join(
        purchases,
        clicks,
        key_col="user_id",
        ts_col="ts",
        id_col="event_id",
        payload="event_id",
        payload_name="prior_click_id",
    )
    return joined.select(
        F.col("event_id").alias("purchase_id"), "user_id", "us", "prior_click_id"
    )


_ASOF_SQL = """
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
),
u AS (
  SELECT user_id, event_id, us, 1 AS is_probe, NULL::BIGINT AS payload
  FROM e WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, event_id, us, 0, event_id FROM e WHERE event_type = 'click'
),
m AS (
  SELECT *,
         LAST_VALUE(payload IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY us, is_probe, event_id
           ROWS UNBOUNDED PRECEDING) AS prior_click_id
  FROM u
)
SELECT event_id AS purchase_id, user_id, us, prior_click_id
FROM m WHERE is_probe = 1
"""


def q_event_gap_fill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap fill with LINEAR INTERPOLATION — the ``interpolate`` companion
    to :func:`q_event_gap_fill`'s LOCF: empty grid buckets get
    ``prev + (next - prev) * (t - t_prev) / (t_next - t_prev)`` between
    the neighboring non-empty buckets. Same grid/join/partitioning shape
    (one user keying reused by the join and BOTH carry windows); the
    interpolation is one fixed expression tree over doubles and exact
    integer bucket distances, so it is bit-identical across engines.
    Interior-only by construction: each user's grid spans [first, last]
    non-empty bucket, so both neighbors always exist.
    """
    events = table(spark, sf_dir, "events")
    e = events.where(
        (F.col("ts") >= F.lit(GAPFILL_FROM)) & (F.col("ts") < F.lit(GAPFILL_TO))
    ).select(
        "user_id",
        F.expr(f"unix_micros(ts) div {BUCKET_US}").alias("bucket"),
        "value",
    )
    per_bucket = e.groupBy("user_id", "bucket").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("value").alias("v"),
    )
    grid = (
        e.groupBy("user_id")
        .agg(F.min("bucket").alias("mn"), F.max("bucket").alias("mx"))
        .select("user_id", F.explode(F.sequence("mn", "mx")).alias("bucket"))
    )
    filled = grid.join(per_bucket, ["user_id", "bucket"], "left")
    wb = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # r18 (guide §2 'stragglers', measured 28.4 s → see OPTIMIZATION_r18.md):
    # the forward carry previously used first(..., ignorenulls) over
    # [currentRow, unboundedFollowing] — Spark's UnboundedFollowing frame
    # re-aggregates the ENTIRE remaining partition for EVERY row (no
    # incremental state), i.e. O(rows²) per user grid. The same value is
    # a RUNNING frame over the reverse ordering: with the grid sorted by
    # bucket DESC, last(..., ignorenulls) over
    # [unboundedPreceding, currentRow] is exactly "first non-null at or
    # after this bucket" — O(rows), one extra in-partition sort, same
    # exchange (both windows partition on user_id). Bucket is unique per
    # user (grid construction), so the ordering is total and the result
    # bit-identical.
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.col("bucket").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    known_bucket = F.when(F.col("v").isNotNull(), F.col("bucket"))
    pv = F.last("v", ignorenulls=True).over(wb)
    pb = F.last(known_bucket, ignorenulls=True).over(wb)
    nv = F.last("v", ignorenulls=True).over(wf)
    nb = F.last(known_bucket, ignorenulls=True).over(wf)
    interp = pv + (nv - pv) * ((F.col("bucket") - pb) / (nb - pb))
    return filled.select(
        "user_id",
        (F.col("bucket") * F.lit(BUCKET_US)).alias("bucket_start_us"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.when(F.col("v").isNotNull(), F.col("v"))
        .otherwise(interp)
        .alias("value_interp"),
    )


def _gap_interp_sql() -> str:
    return f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) // {BUCKET_US} AS bucket, value
  FROM events
  WHERE ts >= TIMESTAMP '{GAPFILL_FROM}' AND ts < TIMESTAMP '{GAPFILL_TO}'
),
pb AS (
  SELECT user_id, bucket, COUNT(*) AS n_events, MAX(value) AS v
  FROM e GROUP BY 1, 2
),
grid AS (
  SELECT user_id, unnest(range(mn, mx + 1)) AS bucket
  FROM (SELECT user_id, MIN(bucket) AS mn, MAX(bucket) AS mx
        FROM e GROUP BY 1)
),
f AS (
  SELECT g.user_id, g.bucket, pb.n_events, pb.v
  FROM grid g LEFT JOIN pb ON pb.user_id = g.user_id AND pb.bucket = g.bucket
),
c AS (
  SELECT *,
    LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY bucket
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
    LAST_VALUE(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY bucket
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pbk,
    FIRST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY bucket
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    FIRST_VALUE(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY bucket
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nbk
  FROM f
)
SELECT user_id,
       CAST(bucket * {BUCKET_US} AS BIGINT) AS bucket_start_us,
       COALESCE(n_events, 0) AS n_events,
       CASE WHEN v IS NOT NULL THEN v
            ELSE pv + (nv - pv) * ((bucket - pbk) / (nbk - pbk)) END
         AS value_interp
FROM c
"""


FWD_TOL_US = 30 * 60 * 1_000_000  # forward as-of tolerance: 30 minutes


def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join with tolerance: each click matched to the same
    user's NEXT purchase at-or-after it, nulled when the gap exceeds 30
    minutes — the mirror of :func:`q_asof_join`'s backward direction, so
    the engine covers both as-of orientations (reference serving layers
    typically need backward for enrichment and forward for attribution).

    Same scale shape as backward: union + ONE user-keyed window scan
    (operators/temporal.asof_forward_join — property-tested against a
    naive per-probe scan), never a range self-join.
    """
    events = table(spark, sf_dir, "events")
    clicks = events.where(F.col("event_type") == "click")
    purchases = events.where(F.col("event_type") == "purchase")
    joined = asof_forward_join(
        clicks,
        purchases,
        key_col="user_id",
        ts_col="ts",
        id_col="event_id",
        tolerance_us=FWD_TOL_US,
    )
    return joined.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        "us",
        F.col("next_id").alias("next_purchase_id"),
        "gap_us",
    )


_ASOF_FWD_SQL = f"""
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
  WHERE event_type IN ('click', 'purchase')
),
u AS (
  SELECT user_id, event_id, us,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS build_rank,
         CASE WHEN event_type = 'purchase' THEN event_id END AS b_id,
         CASE WHEN event_type = 'purchase' THEN us END AS b_us
  FROM e
),
m AS (
  SELECT *,
         FIRST_VALUE(b_id IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY us, build_rank, event_id
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_id,
         FIRST_VALUE(b_us IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY us, build_rank, event_id
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_us
  FROM u
)
SELECT event_id AS click_id, user_id, us,
       CASE WHEN next_us - us <= {FWD_TOL_US} THEN next_id END
         AS next_purchase_id,
       CASE WHEN next_us - us <= {FWD_TOL_US} THEN next_us - us END
         AS gap_us
FROM m WHERE build_rank = 0
"""


RANGE_US = 5 * 60 * 1_000_000  # 5 minutes


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join without a nested loop: errors paired with ALL events in
    the following 5 minutes (any user) via the bucketed equi-join rewrite
    (operators/temporal.time_range_join), then counted per error."""
    events = table(spark, sf_dir, "events")
    errors = events.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.unix_micros("ts").alias("err_us"),
    )
    others = events.select(
        F.col("event_id").alias("other_id"),
        F.unix_micros("ts").alias("ev_us"),
    )
    pairs = time_range_join(errors, others, "err_us", "ev_us", RANGE_US)
    return pairs.where(F.col("other_id") != F.col("error_id")).groupBy(
        "error_id", "err_us"
    ).agg(F.count(F.lit(1)).alias("n_following"))


_RANGE_SQL = f"""
SELECT e.event_id AS error_id, epoch_us(e.ts) AS err_us,
       COUNT(*) AS n_following
FROM events e
JOIN events o ON epoch_us(o.ts) >= epoch_us(e.ts)
            AND epoch_us(o.ts) <= epoch_us(e.ts) + {RANGE_US}
            AND o.event_id <> e.event_id
WHERE e.event_type = 'error'
GROUP BY 1, 2
"""


def q_sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) event-time windows: a 30-minute span advancing
    every 15 minutes, so each event lands in exactly span/slide = 2
    windows. Spark expands the assignment map-side (a ``Generate``, never
    a self-join against a window table) and the aggregate stays the usual
    two-phase hash — at 100 TB the cost is 2× the tumbling rollup, not
    O(windows). The oracle mirrors the expansion with a 2-element unnest
    of the candidate window starts.
    """
    events = table(spark, sf_dir, "events")
    w = F.window("ts", "30 minutes", "15 minutes")
    return (
        events.groupBy(w.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


_SLIDING_SQL = f"""
SELECT ws AS window_start,
       ws + INTERVAL '30 minutes' AS window_end,
       event_type, COUNT(*) AS n_events, {dsum_sql('value')} AS total_value
FROM events,
     unnest([time_bucket(INTERVAL '15 minutes', ts),
             time_bucket(INTERVAL '15 minutes', ts) - INTERVAL '15 minutes'])
       AS u(ws)
GROUP BY 1, 2, 3
"""


def q_session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessions via the BUILT-IN ``session_window`` aggregate
    (the declarative alternative to the lag-gap window scan of
    :func:`q_sessionization` — one two-phase agg, sessions merged by the
    engine, and the same construct drives streaming session windows with
    watermark-based state eviction).

    Boundary semantics: an event exactly ``gap`` after the previous one
    starts a NEW session (windows are half-open — merge requires
    ``next.start < cur.end``), hence ``>=`` in the oracle where the
    lag-gap formulation of ``q_sessionization`` uses ``>``.
    """
    events = table(spark, sf_dir, "events")
    sw = F.session_window("ts", GAP)
    return (
        events.groupBy("user_id", sw.alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("sw.start").alias("session_start_us"),
            F.unix_micros("sw.end").alias("session_end_us"),
            "n_events",
        )
    )


_SESSION_WINDOW_SQL = f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
),
x AS (
  SELECT *,
         CASE WHEN LAG(us) OVER w IS NULL OR us - LAG(us) OVER w >= {GAP_US}
              THEN 1 ELSE 0 END AS new_s
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
s AS (
  SELECT *,
         CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
  FROM x
)
SELECT user_id,
       MIN(us) AS session_start_us,
       MAX(us) + {GAP_US} AS session_end_us,
       COUNT(*) AS n_events
FROM s GROUP BY user_id, sid
"""


#: Gap fill is defined over an explicit analysis range + bucket width,
#: exactly like TimescaleDB's ``time_bucket_gapfill(start, finish)`` — an
#: unbounded dense grid (users × full history at source granularity) is an
#: output-size bug at scale, not a feature. Hourly buckets over January
#: match the synthetic event density (~2 events/user/day: roughly one
#: non-empty bucket in ten, so LOCF does real carrying).
GAPFILL_FROM = "2024-01-01 00:00:00"
GAPFILL_TO = "2024-02-01 00:00:00"
BUCKET_US = 3_600_000_000  # 1 hour


def q_event_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + gap fill (the hypertable ``time_bucket_gapfill``
    + ``locf`` idiom): each user's events inside the analysis range are
    bucketed to an hourly grid spanning their [first, last] activity,
    empty buckets are materialized, and the bucket value is carried forward
    from the most recent non-empty bucket.

    Scale shape: the dense grid is generated map-side per user
    (``sequence`` + ``explode`` — a Generate, never a join against a
    calendar table), so its cost is exactly the output size, bounded by
    users × the requested range/bucket regardless of event volume. The
    event side collapses to one row per (user, bucket) BEFORE the grid
    join, so the join input is already minimal; grid join and LOCF window
    both key on ``user_id`` and reuse one partitioning. Per-bucket sample
    is ``max(value)`` (order-independent — never a float sum).
    """
    events = table(spark, sf_dir, "events")
    e = events.where(
        (F.col("ts") >= F.lit(GAPFILL_FROM)) & (F.col("ts") < F.lit(GAPFILL_TO))
    ).select(
        "user_id",
        F.expr(f"unix_micros(ts) div {BUCKET_US}").alias("bucket"),
        "value",
    )
    per_bucket = e.groupBy("user_id", "bucket").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("value").alias("v"),
    )
    grid = (
        e.groupBy("user_id")
        .agg(F.min("bucket").alias("mn"), F.max("bucket").alias("mx"))
        .select("user_id", F.explode(F.sequence("mn", "mx")).alias("bucket"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = grid.join(per_bucket, ["user_id", "bucket"], "left")
    return filled.select(
        "user_id",
        (F.col("bucket") * F.lit(BUCKET_US)).alias("bucket_start_us"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.last("v", ignorenulls=True).over(w).alias("value_locf"),
    )


_GAP_FILL_SQL = f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) // {BUCKET_US} AS bucket, value FROM events
  WHERE ts >= TIMESTAMP '{GAPFILL_FROM}' AND ts < TIMESTAMP '{GAPFILL_TO}'
),
m AS (
  SELECT user_id, bucket, COUNT(*) AS n_events, MAX(value) AS v
  FROM e GROUP BY 1, 2
),
g AS (
  SELECT user_id, UNNEST(generate_series(MIN(bucket), MAX(bucket))) AS bucket
  FROM e GROUP BY user_id
)
SELECT g.user_id,
       g.bucket * {BUCKET_US} AS bucket_start_us,
       COALESCE(m.n_events, 0) AS n_events,
       LAST_VALUE(m.v IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_locf
FROM g LEFT JOIN m ON g.user_id = m.user_id AND g.bucket = m.bucket
"""


ROLL_US = 10 * 60 * 1_000_000  # 10-minute trailing frame


def q_event_rolling_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing-window rate: for every event, how many events and
    how much value the same user produced in the preceding 10 minutes
    (inclusive). A RANGE frame over integer epoch-micros — the engine keeps
    a sliding frame per partition in one pass; no self-join, no explode.

    One shuffle on ``user_id``; per-user state is the frame buffer, bounded
    by the densest 10 minutes of a single user, not by history length. The
    value sum runs in DECIMAL inside the frame (order-independent and
    engine-exact — a DOUBLE running frame would diverge from the oracle's
    segment-tree association; see functions/aggregates).
    """
    events = table(spark, sf_dir, "events")
    e = events.select(
        "event_id", "user_id", F.unix_micros("ts").alias("us"), "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-ROLL_US, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        "us",
        F.count(F.lit(1)).over(w).alias("n_last_10m"),
        F.sum(F.col("value").cast("decimal(18,2)")).over(w)
        .cast("double").alias("value_last_10m"),
    )


_ROLLING_SQL = f"""
SELECT event_id, user_id, epoch_us(ts) AS us,
       COUNT(*) OVER w AS n_last_10m,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS value_last_10m
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN {ROLL_US} PRECEDING AND CURRENT ROW)
"""


def q_event_count_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection on the hourly event series: flag hours
    whose count deviates > 3σ from the TRAILING 24-hour window (previous
    hours only — no leakage of the hour being judged), the monitoring
    primitive that guards an ingest pipeline against silent upstream
    breaks or floods.

    Integer-exact z-test: with trailing n, S = Σc, Q = Σc², the float
    test (x − S/n)² > 9·Var reduces — multiplying through by n² — to
    ``(n·x − S)² > 9·(n·Q − S²)`` on exact BIGINTs, so no float boundary
    can flip a verdict between engines (headroom: exact while hourly
    counts stay ≤ ~3e8; past that you pre-scale the series). Hours with
    < 12 trailing observations abstain.

    Scale shape: the window runs over the AGGREGATED (type, hour) series
    — cardinality-collapsed from the raw events by a map-side-combined
    count first (the `pareto_frontier` lesson), so the per-type sort
    touches |hours| rows, not |events|. The RANGE frame keys on an
    integer hour index (epoch-micros div 3600e6), making gaps in the
    series behave as true time gaps, not missing rows.
    """
    events = table(spark, sf_dir, "events")
    hc = (
        events.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .withColumn("hidx", F.expr("unix_micros(h) div 3600000000"))
    )
    win = (
        Window.partitionBy("event_type").orderBy("hidx").rangeBetween(-24, -1)
    )
    st = hc.select(
        "event_type",
        F.col("h").alias("window_start"),
        "cnt",
        F.count(F.lit(1)).over(win).cast("bigint").alias("n_hist"),
        F.coalesce(F.sum("cnt").over(win), F.lit(0)).cast("bigint").alias("s"),
        F.coalesce(F.sum(F.col("cnt") * F.col("cnt")).over(win), F.lit(0))
        .cast("bigint").alias("q"),
    )
    dev = F.col("n_hist") * F.col("cnt") - F.col("s")
    return st.select(
        "event_type",
        "window_start",
        "cnt",
        "n_hist",
        (
            (F.col("n_hist") >= 12)
            & (dev * dev > 9 * (F.col("n_hist") * F.col("q") - F.col("s") * F.col("s")))
        ).alias("is_anomaly"),
    )


_ANOMALY_SQL = """
WITH hc AS (
  SELECT event_type, date_trunc('hour', ts) AS h, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
),
w AS (
  SELECT event_type, h, cnt, epoch_us(h) // 3600000000 AS hidx FROM hc
),
st AS (
  SELECT event_type, h, cnt,
         CAST(COUNT(*) OVER win AS BIGINT) AS n_hist,
         CAST(COALESCE(SUM(cnt) OVER win, 0) AS BIGINT) AS s,
         CAST(COALESCE(SUM(cnt * cnt) OVER win, 0) AS BIGINT) AS q
  FROM w
  WINDOW win AS (PARTITION BY event_type ORDER BY hidx
                 RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, h AS window_start, cnt, n_hist,
       (n_hist >= 12 AND
        (n_hist * cnt - s) * (n_hist * cnt - s) > 9 * (n_hist * q - s * s))
         AS is_anomaly
FROM st
"""


def q_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series downsampling to hourly OHLC bars per event type — the
    classic resample an observability/feature pipeline runs before a
    model ever sees raw ticks (open/close = first/last ``value`` by event
    time, high/low = extrema, volume = row count).

    Spark-first shape: ``min_by``/``max_by`` keyed on the COMPOSITE
    ``struct(ts, event_id)`` (a total order — event_id is unique — so
    same-timestamp ticks can never flip open/close between runs) turn the
    whole resample into ONE two-phase aggregation with map-side combine
    (the struct-ordered buffer plans as SortAggregate, but the partial
    phase still reduces each task to one bar per (type, hour) BEFORE the
    exchange — pinned in tests/test_plans.py). The oracle expresses
    first/last with row_number windows instead, which would shuffle and
    sort EVERY tick. That asymmetry is the point at 100 TB: the
    aggregation form's shuffle carries partial bars, not ticks, and AQE
    can split a hot hour freely since nothing depends on
    partition-internal order. All outputs are either exact
    integer counts or verbatim picks of stored doubles (no float
    arithmetic), so the driver hash compare is bit-stable.
    """
    events = table(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        events
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            "event_type",
        )
        .agg(
            F.min_by("value", key).alias("open_value"),
            F.max("value").alias("high_value"),
            F.min("value").alias("low_value"),
            F.max_by("value", key).alias("close_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


_OHLC_SQL = """
WITH r AS (
  SELECT event_type,
         date_trunc('hour', ts) AS ws,
         value,
         ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts, event_id) AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT ws AS window_start, event_type,
       MAX(CASE WHEN rn_a = 1 THEN value END) AS open_value,
       MAX(value) AS high_value,
       MIN(value) AS low_value,
       MAX(CASE WHEN rn_d = 1 THEN value END) AS close_value,
       COUNT(*) AS n_events
FROM r
GROUP BY 1, 2
"""


def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    for every ordered (src → dst) event-type pair that appears as
    consecutive events of one user, the transition count and the
    row-normalized probability in ppm — the behavioral model a
    recommendation / anomaly layer fits over clickstreams.

    Scale shape: ONE user-keyed shuffle feeds the lag window (per-user
    sequences, the same bound `event_sessionization` rides), then the
    pairs collapse through a map-side-combined groupBy to the |types|²
    transition matrix — tiny by construction — so the row-normalizing
    window costs nothing. Probability is the cross-engine-exact integer
    ``(1e6·n) div row_total`` (both operands BIGINT, no float anywhere);
    the lag ordering carries the (us, event_id) total order so same-ts
    events can't flip a transition between runs.
    """
    events = table(spark, sf_dir, "events")
    e = events.select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    pairs = e.select(
        F.lag("event_type").over(w).alias("src_type"),
        F.col("event_type").alias("dst_type"),
    ).where(F.col("src_type").isNotNull())
    counts = pairs.groupBy("src_type", "dst_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_trans")
    )
    return counts.select(
        "src_type",
        "dst_type",
        "n_trans",
        F.expr("(1000000 * n_trans) div (sum(n_trans) OVER "
               "(PARTITION BY src_type))").alias("p_ppm"),
    )


_MARKOV_SQL = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events
),
pairs AS (
  SELECT LAG(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id)
           AS src_type,
         event_type AS dst_type
  FROM e
),
counts AS (
  SELECT src_type, dst_type, CAST(COUNT(*) AS BIGINT) AS n_trans
  FROM pairs WHERE src_type IS NOT NULL GROUP BY 1, 2
)
SELECT src_type, dst_type, n_trans,
       CAST((1000000 * n_trans) // SUM(n_trans) OVER (PARTITION BY src_type)
            AS BIGINT) AS p_ppm
FROM counts
"""


def q_group_trend_slopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type trend detection: ordinary-least-squares slope of the
    hourly event-count series, fitted per event_type purely from
    sufficient statistics — the monitoring primitive that turns "is this
    stream growing/decaying?" into one aggregation.

    Integer-exact OLS: with x = hour index recentred to the global min
    (keeps every product far inside BIGINT), slope = num/den where
    ``num = n·Σxy − Σx·Σy`` and ``den = n·Σx² − (Σx)²`` — all BIGINT, no
    float in the lineage. The reported ``slope_uphr`` (micro-counts per
    hour) divides with EXPLICIT sign handling, ``sign(num)·((1e6·|num|)
    div den)``, so Spark's `div` and DuckDB's `//` agree even where their
    negative-operand conventions differ.

    Scale shape: raw events collapse to the (type, hour) series by a
    map-side-combined count FIRST (the `event_count_anomaly` shape), the
    global min-hour is a 1-row broadcast, and the OLS is a second
    map-side-combined aggregation over |hours| rows — no window, no sort,
    no per-event work past the first combine.
    """
    events = table(spark, sf_dir, "events")
    hc = (
        events.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .withColumn("hidx", F.expr("unix_micros(h) div 3600000000"))
    )
    base = hc.agg(F.min("hidx").alias("h0"))
    st = (
        hc.crossJoin(F.broadcast(base))
        .select(
            "event_type",
            (F.col("hidx") - F.col("h0")).alias("x"),
            F.col("cnt").alias("y"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_hours"),
            F.sum("x").cast("bigint").alias("sx"),
            F.sum("y").cast("bigint").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
            F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        )
    )
    num = F.col("n_hours") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n_hours") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.when(
        den > 0,
        F.signum(num).cast("bigint")
        * F.expr("(1000000 * abs(n_hours * sxy - sx * sy)) div "
                 "(n_hours * sxx - sx * sx)"),
    )
    return st.select(
        "event_type",
        "n_hours",
        num.alias("slope_num"),
        den.alias("slope_den"),
        slope.alias("slope_uphr"),
    )


_TREND_SQL = """
WITH hc AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
),
w AS (
  SELECT event_type, epoch_us(h) // 3600000000 AS hidx, cnt FROM hc
),
base AS (SELECT MIN(hidx) AS h0 FROM w),
st AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_hours,
         CAST(SUM(hidx - h0) AS BIGINT) AS sx,
         CAST(SUM(cnt) AS BIGINT) AS sy,
         CAST(SUM((hidx - h0) * cnt) AS BIGINT) AS sxy,
         CAST(SUM((hidx - h0) * (hidx - h0)) AS BIGINT) AS sxx
  FROM w CROSS JOIN base GROUP BY 1
)
SELECT event_type, n_hours,
       n_hours * sxy - sx * sy AS slope_num,
       n_hours * sxx - sx * sx AS slope_den,
       CASE WHEN n_hours * sxx - sx * sx > 0 THEN
         CAST(sign(n_hours * sxy - sx * sy) AS BIGINT)
         * ((1000000 * abs(n_hours * sxy - sx * sy))
            // (n_hours * sxx - sx * sx))
       END AS slope_uphr
FROM st
"""


def q_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM change-point detection on the hourly event series:
    flag sustained LEVEL SHIFTS (drift) per event type — the complement
    of `event_count_anomaly`'s single-hour spike test; a slow 20% volume
    decay never trips a 3σ spike gate but accumulates here.

    Integer-exact Page CUSUM: with per-type n/Σc/Σc², the series is
    centered and scaled by 2n (``y⁺ = 2n·x − 3·tot`` embeds the standard
    μ/2 slack — ``2n·(x − μ − μ/2)`` — that keeps pure noise bounded),
    the recursion ``S_i = max(0, S_{i-1} + y_i)`` becomes the closed form
    ``S = C − min(0, running-min C)`` over the cumulative sum, and the
    h=3.5σ decision is the cross-multiplied ``(n−1)·S² > 49·n·(n·Q −
    tot²)`` on exact BIGINTs — no sqrt, no float, no rounding boundary.
    Headroom: exact while hourly counts stay ≤ ~1e5 (tot² dominates);
    past that, pre-scale the series (the `event_count_anomaly` note).

    Scale shape: raw events collapse map-side to the (type, hour) series
    first; the per-type stats row broadcasts; both cumulative windows
    share ONE partitioning and ordering, so the per-type sort happens
    once over |hours| rows. The slack is what makes this deployable as a
    standing monitor — without it a random walk crosses any fixed
    threshold eventually.
    """
    events = table(spark, sf_dir, "events")
    hc = events.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    tt = hc.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cnt").cast("bigint").alias("tot"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("bigint").alias("q"),
    )
    y = hc.join(F.broadcast(tt), "event_type").select(
        "event_type",
        F.col("h").alias("window_start"),
        "cnt", "n", "tot", "q",
        (2 * F.col("n") * F.col("cnt") - 3 * F.col("tot")).alias("yu"),
        (F.col("tot") - 2 * F.col("n") * F.col("cnt")).alias("yd"),
    )
    wi = (
        Window.partitionBy("event_type").orderBy("window_start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = y.select(
        "event_type", "window_start", "cnt", "n", "tot", "q",
        F.sum("yu").over(wi).alias("cu"),
        F.sum("yd").over(wi).alias("cd"),
    )
    s = c.select(
        "event_type", "window_start", "cnt", "n", "tot", "q",
        (F.col("cu") - F.least(F.lit(0), F.min("cu").over(wi)))
        .alias("cusum_up"),
        (F.col("cd") - F.least(F.lit(0), F.min("cd").over(wi)))
        .alias("cusum_dn"),
    )
    rhs = 49 * F.col("n") * (F.col("n") * F.col("q") - F.col("tot") * F.col("tot"))
    return s.select(
        "event_type",
        "window_start",
        "cnt",
        "cusum_up",
        "cusum_dn",
        ((F.col("n") - 1) * F.col("cusum_up") * F.col("cusum_up") > rhs)
        .alias("drift_up"),
        ((F.col("n") - 1) * F.col("cusum_dn") * F.col("cusum_dn") > rhs)
        .alias("drift_dn"),
    )


_CUSUM_SQL = """
WITH hc AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
),
tt AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cnt) AS BIGINT) AS tot,
         CAST(SUM(cnt * cnt) AS BIGINT) AS q
  FROM hc GROUP BY 1
),
y AS (
  SELECT hc.event_type, hc.h, hc.cnt, tt.n, tt.tot, tt.q,
         CAST(2 * tt.n * hc.cnt - 3 * tt.tot AS BIGINT) AS yu,
         CAST(tt.tot - 2 * tt.n * hc.cnt AS BIGINT) AS yd
  FROM hc JOIN tt USING (event_type)
),
c AS (
  SELECT event_type, h, cnt, n, tot, q,
         CAST(SUM(yu) OVER wi AS BIGINT) AS cu,
         CAST(SUM(yd) OVER wi AS BIGINT) AS cd
  FROM y
  WINDOW wi AS (PARTITION BY event_type ORDER BY h
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
s AS (
  SELECT event_type, h, cnt, n, tot, q,
         CAST(cu - LEAST(0, MIN(cu) OVER wi) AS BIGINT) AS cusum_up,
         CAST(cd - LEAST(0, MIN(cd) OVER wi) AS BIGINT) AS cusum_dn
  FROM c
  WINDOW wi AS (PARTITION BY event_type ORDER BY h
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_type, h AS window_start, cnt, cusum_up, cusum_dn,
       (n - 1) * cusum_up * cusum_up > 49 * n * (n * q - tot * tot)
         AS drift_up,
       (n - 1) * cusum_dn * cusum_dn > 49 * n * (n * q - tot * tot)
         AS drift_dn
FROM s
"""


def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily time-weighted average value (TWAP) per event type over the
    IRREGULAR event series — a plain AVG over-weights bursts; weighting
    each observation by its holding duration (time until the next event
    that day) is how financial/telemetry pipelines downsample honestly.

    Integer-exact: values go through floor-cents, durations are exact
    epoch-micro differences, and the TWAP is ``Σ(cents·dur) div Σdur``
    on BIGINTs — the weighted mean never touches a float sum (a double
    Σ(v·w) would be shuffle-order-dependent). The day's last observation
    carries no forward duration and is excluded from the weighting
    (documented choice, mirrored in the oracle; n_obs still counts it).

    Scale shape: one (type, day)-keyed window for the lead — the
    sessionization-class sort — then a map-side-combined aggregation to
    one row per (type, day).
    """
    events = table(spark, sf_dir, "events")
    e = events.select(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.unix_micros(F.col("ts")).alias("us"),
        "event_id",
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    w = Window.partitionBy("event_type", "day").orderBy("us", "event_id")
    d = e.select(
        "event_type", "day", "cents",
        (F.lead("us").over(w) - F.col("us")).alias("dur_us"),
    )
    return (
        d.groupBy("event_type", "day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_obs"),
            F.sum("dur_us").cast("bigint").alias("span_us"),
            F.sum(F.col("cents") * F.col("dur_us")).cast("bigint")
            .alias("wsum"),
        )
        .select(
            "event_type", "day", "n_obs", "span_us",
            # sign-explicit so Spark `div` and DuckDB `//` agree even if a
            # fixture regen ships negative values (cents < 0)
            F.expr("CASE WHEN span_us > 0 THEN "
                   "CAST(sign(wsum) AS BIGINT) * (abs(wsum) div span_us) END")
            .alias("twap_cents"),
        )
    )


_TWAP_SQL = """
WITH e AS (
  SELECT event_type, date_trunc('day', ts) AS day, epoch_us(ts) AS us,
         event_id, CAST(FLOOR(value * 100) AS BIGINT) AS cents
  FROM events
),
d AS (
  SELECT event_type, day, cents,
         LEAD(us) OVER (PARTITION BY event_type, day
                        ORDER BY us, event_id) - us AS dur_us
  FROM e
),
g AS (
  SELECT event_type, day,
         CAST(COUNT(*) AS BIGINT) AS n_obs,
         CAST(SUM(dur_us) AS BIGINT) AS span_us,
         CAST(SUM(cents * dur_us) AS BIGINT) AS wsum
  FROM d GROUP BY 1, 2
)
SELECT event_type, day, n_obs, span_us,
       CASE WHEN span_us > 0
            THEN CAST(CAST(sign(wsum) AS BIGINT) * (abs(wsum) // span_us)
                      AS BIGINT) END AS twap_cents
FROM g
"""


ATTR_WINDOW_US = 30 * 60 * 1_000_000  # linear-attribution lookback


def q_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear marketing attribution: every click by the same user in the
    30 minutes before a purchase shares the conversion credit equally
    (1/k as exact integer ppm) — the multi-touch generalization of
    `event_asof_join`'s last-touch pick.

    Scale shape: the backward range join uses the SAME bucketed rewrite
    as operators/temporal.time_range_join — clicks replicate to two
    window-width buckets and the join is EQUI on (user_id, bucket) plus
    an exact residual filter, so there is no nested-loop pair space and
    the shuffle is user-local (the cross-user pairing a bare time-bucket
    join would produce never exists). The per-purchase touch count is a
    partition-only window over groups bounded by a user's 30-minute
    click burst.
    """
    events = table(spark, sf_dir, "events")
    w = ATTR_WINDOW_US
    clicks = events.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"),
        F.col("event_id").alias("click_id"),
        F.unix_micros("ts").alias("c_us"),
    )
    purch = events.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.unix_micros("ts").alias("p_us"),
    )
    c2 = clicks.withColumn(
        "_b",
        F.explode(F.array(F.expr(f"c_us DIV {w}"), F.expr(f"c_us DIV {w}") + 1)),
    )
    p2 = purch.withColumn("_b", F.expr(f"p_us DIV {w}"))
    pairs = (
        p2.join(c2, (p2.user_id == c2.cu) & (p2._b == c2._b))
        .where((F.col("c_us") >= F.col("p_us") - w)
               & (F.col("c_us") <= F.col("p_us")))
        .select("user_id", "purchase_id", "p_us", "click_id", "c_us")
    )
    kw = Window.partitionBy("purchase_id")
    return pairs.select(
        "user_id",
        "purchase_id",
        "click_id",
        F.count(F.lit(1)).over(kw).cast("bigint").alias("n_touches"),
        F.expr(f"{10**6} div count(1) OVER (PARTITION BY purchase_id)")
        .cast("bigint").alias("credit_ppm"),
    )


_ATTR_SQL = f"""
WITH c AS (
  SELECT user_id, event_id AS click_id, epoch_us(ts) AS c_us
  FROM events WHERE event_type = 'click'
),
p AS (
  SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS p_us
  FROM events WHERE event_type = 'purchase'
),
pairs AS (
  SELECT p.user_id, p.purchase_id, c.click_id
  FROM p JOIN c ON p.user_id = c.user_id
   AND c.c_us >= p.p_us - {ATTR_WINDOW_US} AND c.c_us <= p.p_us
)
SELECT user_id, purchase_id, click_id,
       CAST(COUNT(*) OVER (PARTITION BY purchase_id) AS BIGINT) AS n_touches,
       CAST({10**6} // COUNT(*) OVER (PARTITION BY purchase_id) AS BIGINT)
         AS credit_ppm
FROM pairs
"""


DECAY_HORIZON_DAYS = 30  # contributions older than this decay to zero


def q_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted engagement score per user: each event contributes
    ``2^(H − age_days)`` (half-life = one day, horizon H=30) — the
    freshness-aware ranking signal a feed/retention model uses instead
    of raw counts, which treat a year-old click like today's.

    EXACT exponential decay: powers of two are integer bit-shifts, so
    the score is a BIGINT sum — order-independent under any shuffle,
    engine-identical — where the usual ``exp(−λ·age)`` float would be
    neither. Age anchors to the dataset's max event day (a 1-row
    broadcast), so the query is deterministic over a fixture rather than
    wall-clock-dependent.

    Scale shape: map-side weight computation on the scan, one
    map-side-combined groupBy(user). The weight table is 31 distinct
    values; contributions beyond the horizon are exactly 0 and are
    dropped BEFORE the shuffle (partition-pruning-friendly predicate).
    """
    events = table(spark, sf_dir, "events")
    e = events.select(
        "user_id",
        F.expr("unix_micros(ts) div 86400000000").alias("eday"),
    )
    anchor = e.agg(F.max("eday").alias("maxday"))
    h = DECAY_HORIZON_DAYS
    return (
        e.crossJoin(F.broadcast(anchor))
        .where(F.col("maxday") - F.col("eday") <= h)
        .select(
            "user_id",
            F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                   f"CAST({h} - (maxday - eday) AS INT))").alias("w"),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_recent"),
            F.sum("w").cast("bigint").alias("score"),
        )
    )


_DECAY_SQL = f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS eday FROM events
),
anchor AS (SELECT MAX(eday) AS maxday FROM e)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_recent,
       CAST(SUM(CAST(1 AS BIGINT)
                << CAST({DECAY_HORIZON_DAYS} - (maxday - eday) AS INT))
            AS BIGINT) AS score
FROM e CROSS JOIN anchor
WHERE maxday - eday <= {DECAY_HORIZON_DAYS}
GROUP BY 1
"""


def q_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware anomaly detection: each hour's count is judged
    against the hour-of-day baseline for its event type (all Mondays 9am
    behave alike), catching the "normal for 3am, broken for 9am" case
    that both the trailing-window z-test (`event_count_anomaly`) and the
    drift monitor (`cusum_drift`) miss by construction.

    Integer-exact: per-(type, hour-of-day) sufficient statistics
    (n, Σc, Σc²) broadcast back onto the series (≤ |types|·24 rows), the
    residual is the n-scaled ``n·x − Σc`` (which is also the exact
    leave-one-out deviation, scaled), and the 3σ fence is the familiar
    cross-multiplied ``(n−1)·resid² > 9·n·(n·Q − S²)`` on BIGINTs.
    Buckets with < 10 observations abstain.

    Scale shape: two map-side-combined aggregations (series, then the
    tiny baseline) and one broadcast join — no window, no sort; the
    per-hour verdict is pure codegen on the joined row.
    """
    events = table(spark, sf_dir, "events")
    hc = (
        events.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .withColumn("hidx", F.expr("unix_micros(h) div 3600000000"))
        .withColumn("hod", F.expr("hidx % 24"))
    )
    base = hc.groupBy("event_type", "hod").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_b"),
        F.sum("cnt").cast("bigint").alias("tot_b"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("bigint").alias("q_b"),
    )
    j = hc.join(F.broadcast(base), ["event_type", "hod"])
    resid = F.col("n_b") * F.col("cnt") - F.col("tot_b")
    return j.select(
        "event_type",
        F.col("h").alias("window_start"),
        F.col("hod").cast("int").alias("hour_of_day"),
        "cnt",
        resid.alias("resid_scaled"),
        (
            (F.col("n_b") >= 10)
            & (
                (F.col("n_b") - 1) * resid * resid
                > 9 * F.col("n_b")
                * (F.col("n_b") * F.col("q_b") - F.col("tot_b") * F.col("tot_b"))
            )
        ).alias("is_seasonal_anomaly"),
    )


_SEASONAL_SQL = """
WITH hc AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
),
w AS (
  SELECT event_type, h, cnt,
         (epoch_us(h) // 3600000000) % 24 AS hod
  FROM hc
),
base AS (
  SELECT event_type, hod, CAST(COUNT(*) AS BIGINT) AS n_b,
         CAST(SUM(cnt) AS BIGINT) AS tot_b,
         CAST(SUM(cnt * cnt) AS BIGINT) AS q_b
  FROM w GROUP BY 1, 2
)
SELECT event_type, h AS window_start, CAST(hod AS INT) AS hour_of_day, cnt,
       n_b * cnt - tot_b AS resid_scaled,
       (n_b >= 10 AND
        (n_b - 1) * (n_b * cnt - tot_b) * (n_b * cnt - tot_b)
          > 9 * n_b * (n_b * q_b - tot_b * tot_b)) AS is_seasonal_anomaly
FROM w JOIN base USING (event_type, hod)
"""


_DAY_US = 86_400_000_000


def q_concurrency_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per epoch-day — the interval-algebra
    sweep line (+1 at each session start, -1 at each end, running sum =
    live sessions) that answers the capacity question no groupBy can:
    how many sessions OVERLAP, not how many occur. Sessions come from the
    same built-in ``session_window`` construct as
    :func:`q_session_window_agg`.

    Scale shape: the sweep's running sum is a global ordered prefix — at
    100 TB you never global-sort it; this is
    :func:`~tfm_taxitrips_spark.operators.prefix.two_phase_prefix_sum`
    on the natural time split (epoch days as buckets), the same operator
    ``token_budget_mix`` rides. Day keys are pure integer epoch-day
    division (``us div 86400e6``) — no timezone anywhere. A day's true
    peak includes the concurrency CARRIED OVER MIDNIGHT (sessions open
    at day start), so the report takes ``greatest(carry_in, day max)``,
    and a quiet day wholly inside open sessions (no boundaries at all)
    still appears, inheriting its carry — both assembled from the tiny
    per-day relation (a dense day scaffold + one cardinality-collapsed
    window, like the Pareto frontier's). The per-day maximum is
    invariant to tie order within equal (instant, delta) groups (equal
    deltas yield the same partial-sum multiset), so the result is
    deterministic under any shuffle, and the oracle states the naive
    global-cumsum form — the differential proves the rewrite.
    """
    events = table(spark, sf_dir, "events")
    sessions = (
        events.groupBy("user_id", F.session_window("ts", GAP).alias("sw"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_micros("sw.start").alias("s_us"),
            F.unix_micros("sw.end").alias("e_us"),
        )
    )
    bounds = (
        sessions.select(
            F.explode(
                F.array(
                    F.struct(F.col("s_us").alias("us"), F.lit(1).alias("delta")),
                    F.struct(F.col("e_us").alias("us"), F.lit(-1).alias("delta")),
                )
            ).alias("b")
        )
        .select(F.col("b.us").alias("us"), F.col("b.delta").alias("delta"))
        .withColumn("day_idx", F.expr(f"us div {_DAY_US}"))
        .localCheckpoint(eager=False)
    )
    conc = two_phase_prefix_sum(
        bounds, bucket_col="day_idx", order_cols=("us", "delta"),
        val_col="delta", out_col="conc",
    )
    per_day = conc.groupBy("day_idx").agg(
        F.max("conc").alias("mx"),
        F.count(F.lit(1)).cast("bigint").alias("nb"),
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
        .cast("bigint").alias("ns"),
        F.sum("delta").alias("dsum"),
    )
    # scaffold bounds come from the CHECKPOINTED boundary relation, not
    # from per_day — keeps per_day single-consumer so the sweep runs once
    scaffold = (
        bounds.agg(F.min("day_idx").alias("lo"), F.max("day_idx").alias("hi"))
        .select(F.explode(F.sequence("lo", "hi")).alias("day_idx"))
    )
    w_carry = Window.orderBy("day_idx").rowsBetween(
        Window.unboundedPreceding, -1)
    dense = (
        scaffold.join(F.broadcast(per_day), "day_idx", "left")
        .withColumn("carry", F.coalesce(F.sum("dsum").over(w_carry), F.lit(0)))
    )
    return dense.select(
        "day_idx",
        F.greatest(F.col("carry"), F.coalesce(F.col("mx"), F.col("carry")))
        .cast("bigint").alias("max_concurrent"),
        F.coalesce(F.col("nb"), F.lit(0)).cast("bigint").alias("n_boundaries"),
        F.coalesce(F.col("ns"), F.lit(0)).cast("bigint").alias("n_starts"),
    )


_CONCURRENCY_SQL = f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
),
x AS (
  SELECT *,
         CASE WHEN LAG(us) OVER w IS NULL OR us - LAG(us) OVER w >= {GAP_US}
              THEN 1 ELSE 0 END AS new_s
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
s AS (
  SELECT *,
         CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
  FROM x
),
sess AS (
  SELECT MIN(us) AS s_us, MAX(us) + {GAP_US} AS e_us
  FROM s GROUP BY user_id, sid
),
b AS (
  SELECT s_us AS us, 1 AS delta FROM sess
  UNION ALL
  SELECT e_us AS us, -1 AS delta FROM sess
),
c AS (
  SELECT us, delta, us // {_DAY_US} AS day_idx,
         CAST(SUM(delta) OVER (ORDER BY us, delta
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS conc
  FROM b
),
d AS (
  SELECT day_idx, MAX(conc) AS mx, COUNT(*) AS nb,
         COUNT(*) FILTER (WHERE delta = 1) AS ns,
         SUM(delta) AS dsum
  FROM c GROUP BY 1
),
dense AS (
  SELECT t.day_idx, d.mx, d.nb, d.ns, d.dsum
  FROM (SELECT UNNEST(generate_series(
          (SELECT MIN(day_idx) FROM d),
          (SELECT MAX(day_idx) FROM d))) AS day_idx) t
  LEFT JOIN d USING (day_idx)
),
k AS (
  SELECT day_idx, mx, nb, ns,
         CAST(COALESCE(SUM(dsum) OVER (ORDER BY day_idx
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS carry
  FROM dense
)
SELECT day_idx,
       CAST(GREATEST(carry, COALESCE(mx, carry)) AS BIGINT) AS max_concurrent,
       CAST(COALESCE(nb, 0) AS BIGINT) AS n_boundaries,
       CAST(COALESCE(ns, 0) AS BIGINT) AS n_starts
FROM k
"""


QUERIES: dict[str, QuerySpec] = {
    "concurrency_profile": QuerySpec(
        q_concurrency_profile, _CONCURRENCY_SQL,
        tags=("temporal", "interval", "window")),
    "event_range_join": QuerySpec(q_range_join, _RANGE_SQL, tags=("temporal", "range_join")),
    "event_sessionization": QuerySpec(q_sessionization, _SESSION_SQL, bench=True,
                                      tags=("temporal",)),
    "event_asof_join": QuerySpec(q_asof_join, _ASOF_SQL, tags=("temporal",)),
    "event_asof_forward": QuerySpec(q_asof_forward, _ASOF_FWD_SQL,
                                    tags=("temporal", "asof")),
    "sliding_window_agg": QuerySpec(q_sliding_window_agg, _SLIDING_SQL,
                                    tags=("temporal", "A5", "window")),
    "session_window_agg": QuerySpec(q_session_window_agg, _SESSION_WINDOW_SQL,
                                    tags=("temporal", "session")),
    "event_gap_fill": QuerySpec(q_event_gap_fill, _GAP_FILL_SQL,
                                tags=("temporal", "gapfill", "window")),
    "event_gap_fill_interp": QuerySpec(q_event_gap_fill_interp,
                                       _gap_interp_sql(),
                                       tags=("temporal", "gapfill", "window")),
    "event_rolling_rate": QuerySpec(q_event_rolling_rate, _ROLLING_SQL,
                                    tags=("temporal", "window")),
    "event_ohlc_resample": QuerySpec(q_ohlc_resample, _OHLC_SQL,
                                     tags=("temporal", "resample")),
    "event_count_anomaly": QuerySpec(q_event_count_anomaly, _ANOMALY_SQL,
                                     tags=("temporal", "monitoring", "window")),
    "markov_transitions": QuerySpec(q_markov_transitions, _MARKOV_SQL,
                                    tags=("temporal", "sequence")),
    "group_trend_slopes": QuerySpec(q_group_trend_slopes, _TREND_SQL,
                                    tags=("temporal", "monitoring")),
    "cusum_drift": QuerySpec(q_cusum_drift, _CUSUM_SQL,
                             tags=("temporal", "monitoring", "window")),
    "time_weighted_avg": QuerySpec(q_time_weighted_avg, _TWAP_SQL,
                                   tags=("temporal", "resample")),
    "touch_attribution": QuerySpec(q_touch_attribution, _ATTR_SQL,
                                   tags=("temporal", "attribution")),
    "decayed_engagement": QuerySpec(q_decayed_engagement, _DECAY_SQL,
                                    tags=("temporal", "scoring")),
    "seasonal_anomaly": QuerySpec(q_seasonal_anomaly, _SEASONAL_SQL,
                                  tags=("temporal", "monitoring")),
}
