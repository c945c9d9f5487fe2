"""Dashboard-analytics queries (funnel, cohort retention, Pareto frontier,
histogram, RFM) — the serving-layer families the reference exposes through
Superset charts over Druid (/root/reference/README.md:10-11), owned
natively as one-pass DataFrame plans.

Determinism discipline (driver hashes values): counts are BIGINT, money
runs through the decimal-sum helper, ratios are single IEEE divisions
(correctly rounded, so bit-identical across engines), and every ordering
has a total tie-break key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tfm_taxitrips_spark.functions.aggregates import dsum, dsum_sql
from tfm_taxitrips_spark.operators.analytics import skyline_2d
from tfm_taxitrips_spark.operators.partitioning import fan_out
from tfm_taxitrips_spark.operators.prefix import (
    two_phase_prefix_sum,
    two_phase_prefix_sums,
)
from tfm_taxitrips_spark.queries.registry import QuerySpec
from tfm_taxitrips_spark.sources.readers import table


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-stage funnel (view → click → purchase): a user converts a
    stage only if its FIRST occurrence is strictly after the previous
    stage's first occurrence.

    Scale shape: ONE shuffle — conditional ``min(when(...))`` per user is
    a map-side-combining hash aggregate, the stage counts reduce to a
    single row, and the 3-row unpivot is a driver-free ``stack``. No
    self-joins, no per-stage passes: at 100 TB this is a single scan of
    events regardless of funnel depth.
    """
    events = table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    per_user = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", us)).alias("v_us"),
        F.min(F.when(F.col("event_type") == "click", us)).alias("c_us"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("p_us"),
    )
    s2 = F.col("v_us").isNotNull() & (F.col("c_us") > F.col("v_us"))
    s3 = s2 & (F.col("p_us") > F.col("c_us"))
    counts = per_user.agg(
        F.count("v_us").alias("n1"),
        F.count(F.when(s2, F.lit(1))).alias("n2"),
        F.count(F.when(s3, F.lit(1))).alias("n3"),
    )
    return counts.selectExpr(
        "stack(3, 'view', n1, 'view_click', n2, 'view_click_purchase', n3) "
        "as (stage, n_users)"
    )


_FUNNEL_SQL = """
WITH pu AS (
  SELECT user_id,
         min(epoch_us(ts)) FILTER (WHERE event_type = 'view') AS v_us,
         min(epoch_us(ts)) FILTER (WHERE event_type = 'click') AS c_us,
         min(epoch_us(ts)) FILTER (WHERE event_type = 'purchase') AS p_us
  FROM events GROUP BY 1
)
SELECT 'view' AS stage, count(v_us) AS n_users FROM pu
UNION ALL
SELECT 'view_click', count(*) FILTER (WHERE v_us IS NOT NULL AND c_us > v_us)
FROM pu
UNION ALL
SELECT 'view_click_purchase',
       count(*) FILTER (WHERE v_us IS NOT NULL AND c_us > v_us AND p_us > c_us)
FROM pu
"""


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by the week they first
    appeared, then distinct-active counts per (cohort_week, week_offset).

    Scale shape: first-seen is one user-keyed aggregate; the cohort join
    re-uses the SAME user_id partitioning (co-partitioned shuffle join, no
    broadcast of a user-sized dim); the final distinct-count aggregates on
    the small (cohort, offset) grid. Week math stays on integer day
    diffs — both engines truncate weeks to Monday 00:00, so the diff is an
    exact multiple of 7.
    """
    events = table(spark, sf_dir, "events")
    first_seen = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = events.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("w")
    )
    joined = active.join(first_seen, "user_id")
    offset = (
        F.datediff(F.col("w").cast("date"), F.col("cohort_week").cast("date"))
        / 7
    ).cast("int")
    return (
        joined.withColumn("week_offset", offset)
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


_RETENTION_SQL = """
WITH fs AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events GROUP BY 1
),
act AS (
  SELECT e.user_id, fs.cohort_week, date_trunc('week', e.ts) AS w
  FROM events e JOIN fs USING (user_id)
)
SELECT cohort_week,
       CAST(date_diff('day', cohort_week, w) // 7 AS INT) AS week_offset,
       COUNT(DISTINCT user_id) AS n_users
FROM act GROUP BY 1, 2
"""


def q_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto frontier over part: minimize ``p_retailprice``,
    maximize ``p_size``. A part survives iff no other part is at-or-better
    on both axes and strictly better on one.

    Scale shape: NOT the O(n²) dominance self-join the semantics suggest.
    Prices aggregate to their per-price max size (map-side combine), a
    running max over the price-sorted group table finds each price's best
    strictly-cheaper competitor, and the verdict joins back. The only
    sequential step — the running max — runs over DISTINCT prices
    (cardinality-collapsed, thousands not billions), so the single-
    partition window is a deliberate, bounded choice; the group table is
    broadcast back against the full part scan. The oracle is the naive
    NOT EXISTS dominance formulation — an independent derivation, which is
    exactly what makes the differential check strong.

    Stated contract (r13 star-table sweep finding): a part with a NULL
    on either axis is EXCLUDED in both engines — an unrankable row has
    no place in a dominance comparison (the r12 `auc_score_eval`
    convention). Without the filter the engines diverge by accident:
    SQL's NOT EXISTS leaves an all-NULL row vacuously undominated (every
    dominance predicate is NULL), while the skyline composition drops it
    at the price join.
    """
    part = table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    ).where(F.col("p_retailprice").isNotNull()
            & F.col("p_size").isNotNull())
    return skyline_2d(part, "p_retailprice", "p_size").select(
        "p_partkey", "p_retailprice", "p_size"
    )


_PARETO_SQL = """
WITH pr AS (
  SELECT p_partkey, p_retailprice, p_size FROM part
  WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
)
SELECT p.p_partkey, p.p_retailprice, p.p_size
FROM pr p
WHERE NOT EXISTS (
  SELECT 1 FROM pr q
  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
)
"""


HIST_WIDTH = 100


def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of document lengths — the corpus-profiling
    pass every training-data pipeline runs before choosing filters.
    Integer bucket math (floor division), one map-side-combining
    aggregate on a bounded key space; at 100 TB this is scan-bound."""
    docs = table(spark, sf_dir, "documents")
    bucket = F.floor(F.col("n_chars") / HIST_WIDTH)
    return (
        docs.groupBy(bucket.alias("_b"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .select(
            (F.col("_b") * HIST_WIDTH).cast("long").alias("bucket_lo"),
            ((F.col("_b") + 1) * HIST_WIDTH).cast("long").alias("bucket_hi"),
            "n_docs",
            "total_chars",
        )
    )


_HIST_SQL = f"""
SELECT CAST((n_chars // {HIST_WIDTH}) * {HIST_WIDTH} AS BIGINT) AS bucket_lo,
       CAST((n_chars // {HIST_WIDTH} + 1) * {HIST_WIDTH} AS BIGINT) AS bucket_hi,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY 1, 2
"""


def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: quartile rank each customer on recency
    (latest order), frequency (order count) and monetary (decimal-summed
    spend), concatenated to the classic 'RFM' segment code.

    Scale shape: the per-customer aggregate collapses the fact table
    first; ``ntile`` then needs a total order over CUSTOMERS — fine into
    the tens of millions on one partition of 3-column rows, and the
    documented scale-out is to swap ntile for precomputed
    ``approx_percentile`` thresholds (same output contract, no global
    sort). Every ntile ordering carries the custkey tie-break so ranks
    are total and engine-independent.
    """
    orders = table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("spend"),
    )
    r = F.ntile(4).over(
        Window.orderBy(F.col("last_order").desc(), F.col("o_custkey"))
    )
    fq = F.ntile(4).over(
        Window.orderBy(F.col("n_orders").desc(), F.col("o_custkey"))
    )
    m = F.ntile(4).over(
        Window.orderBy(F.col("spend").desc(), F.col("o_custkey"))
    )
    seg = per_cust.select(
        "o_custkey",
        r.alias("r_quartile"),
        fq.alias("f_quartile"),
        m.alias("m_quartile"),
    )
    return seg.withColumn(
        "rfm_segment",
        F.concat_ws(
            "", F.col("r_quartile"), F.col("f_quartile"), F.col("m_quartile")
        ),
    )


_RFM_SQL = f"""
WITH pc AS (
  SELECT o_custkey,
         max(o_orderdate) AS last_order,
         count(*) AS n_orders,
         {dsum_sql('o_totalprice')} AS spend
  FROM orders GROUP BY 1
)
SELECT o_custkey,
       ntile(4) OVER (ORDER BY last_order DESC, o_custkey) AS r_quartile,
       ntile(4) OVER (ORDER BY n_orders DESC, o_custkey) AS f_quartile,
       ntile(4) OVER (ORDER BY spend DESC, o_custkey) AS m_quartile,
       CAST(ntile(4) OVER (ORDER BY last_order DESC, o_custkey) AS VARCHAR)
         || CAST(ntile(4) OVER (ORDER BY n_orders DESC, o_custkey) AS VARCHAR)
         || CAST(ntile(4) OVER (ORDER BY spend DESC, o_custkey) AS VARCHAR)
         AS rfm_segment
FROM pc
"""


def q_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-table column profiling in ONE scan: per column of ``orders``
    — null count, exact distinct count, and a typed-but-portable min/max
    rendering — unpivoted to one row per column via ``stack``.

    This is the ingest-gate primitive of a data pipeline (schema drift,
    null storms, and key-cardinality regressions all surface here before
    a model trains on garbage). Plan shape: the six exact
    ``count(DISTINCT)``s in one aggregation make Catalyst plan a single
    pass with an ``Expand`` (rows × #distinct-aggs before the partial
    aggregate) — the deliberate single-scan tradeoff; at 100 TB you flip
    exact→``approx_count_distinct`` per column and the Expand disappears,
    which is a one-line knob precisely because the profile is ONE
    aggregation, not six scans. The unpivot is driver-free (stack over
    the one-row aggregate).

    Portable renderings (bit-stable across engines): BIGINT keys and
    VARCHAR columns cast to string; money min/max in floor-cents (cast
    truncation differs between engines, ``floor`` does not — and floor is
    monotone, so it commutes with min/max); timestamps formatted to
    seconds.

    r18 (guide §2.5 'input skew'): ``fan_out`` on the scan — a
    single-file fixture plans as ONE scan partition, so the ×7 Expand
    and the partial distinct aggregation (the heavy map side of this
    query) ran on one core; fan_out round-robins the scan up to session
    parallelism and is a no-op on any real multi-split table (measured
    5.2 s → ~1 s at sf0.1). Aggregates are partitioning-invariant.
    """
    o = fan_out(table(spark, sf_dir, "orders"))
    n = F.count(F.lit(1))
    ts_fmt = "yyyy-MM-dd HH:mm:ss"

    def prof(c, mn, mx):
        return [
            (n - F.count(F.col(c))).cast("bigint").alias(f"nn_{c}"),
            F.countDistinct(F.col(c)).cast("bigint").alias(f"nd_{c}"),
            mn.cast("string").alias(f"mn_{c}"),
            mx.cast("string").alias(f"mx_{c}"),
        ]

    cents = F.floor(F.col("o_totalprice") * 100).cast("bigint")
    aggs = (
        prof("o_orderkey", F.min("o_orderkey"), F.max("o_orderkey"))
        + prof("o_custkey", F.min("o_custkey"), F.max("o_custkey"))
        + prof("o_orderstatus", F.min("o_orderstatus"), F.max("o_orderstatus"))
        + prof("o_totalprice", F.min(cents), F.max(cents))
        + prof(
            "o_orderdate",
            F.date_format(F.min("o_orderdate"), ts_fmt),
            F.date_format(F.max("o_orderdate"), ts_fmt),
        )
        + prof("o_orderpriority", F.min("o_orderpriority"), F.max("o_orderpriority"))
    )
    one = o.agg(n.cast("bigint").alias("n_rows"), *aggs)
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority"]
    stack = ", ".join(
        f"'{c}', nn_{c}, nd_{c}, mn_{c}, mx_{c}" for c in cols
    )
    return one.selectExpr(
        "n_rows",
        f"stack({len(cols)}, {stack}) AS (col_name, n_null, n_distinct, min_repr, max_repr)",
    ).select("col_name", "n_rows", "n_null", "n_distinct", "min_repr", "max_repr")


def _profile_col_sql(c: str, mn: str, mx: str) -> str:
    return (
        f"SELECT '{c}' AS col_name, COUNT(*) AS n_rows,\n"
        f"       COUNT(*) - COUNT({c}) AS n_null,\n"
        f"       COUNT(DISTINCT {c}) AS n_distinct,\n"
        f"       {mn} AS min_repr, {mx} AS max_repr\n"
        f"FROM orders"
    )


_COLUMN_PROFILE_SQL = "\nUNION ALL\n".join(
    [
        _profile_col_sql("o_orderkey", "CAST(MIN(o_orderkey) AS VARCHAR)",
                         "CAST(MAX(o_orderkey) AS VARCHAR)"),
        _profile_col_sql("o_custkey", "CAST(MIN(o_custkey) AS VARCHAR)",
                         "CAST(MAX(o_custkey) AS VARCHAR)"),
        _profile_col_sql("o_orderstatus", "MIN(o_orderstatus)", "MAX(o_orderstatus)"),
        _profile_col_sql(
            "o_totalprice",
            "CAST(MIN(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS VARCHAR)",
            "CAST(MAX(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS VARCHAR)",
        ),
        _profile_col_sql(
            "o_orderdate",
            "strftime(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S')",
            "strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S')",
        ),
        _profile_col_sql("o_orderpriority", "MIN(o_orderpriority)",
                         "MAX(o_orderpriority)"),
    ]
)


#: Market-basket guards: pairs below this support are noise (and the
#: apriori prune that keeps the pair space bounded); baskets with more
#: distinct brands than the cap are dropped — a mega-basket pairs
#: everything with everything (C(b,2) blowup) while carrying no affinity
#: signal, the same Zipf-head reasoning as NGRAM_DF_CAP / TRI_PART_CAP.
BASKET_MINSUP = 20
BASKET_CAP = 64


def q_copurchase_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: for every unordered brand pair co-occurring
    in at least ``BASKET_MINSUP`` orders, the support count and the lift
    in ppm — the co-purchase signal behind "customers also bought".

    Scale shape: the basket relation (order, brand) is distinct-collapsed
    and localCheckpointed ONCE, then feeds four consumers (both pair-join
    sides, the per-brand marginals, the order total) without replaying
    the lineitem scan. The pair self-join is bounded two ways: per-order
    output is ≤ C(BASKET_CAP, 2) by the basket-size guard, and the brand
    universe caps the result at C(|brands|, 2) rows after the support
    aggregation. Marginals and the 1-row order count broadcast. Lift is
    the exact integer ``(1e6·support·n_orders) div (n_a·n_b)`` — BIGINT
    headroom holds to ~3e6 orders; past that, pre-divide the marginals
    (documented, not needed at fixture scale).
    """
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # part scales with SF — no hard broadcast hint; the size-statistics
    # threshold broadcasts at small SF and AQE re-plans past it
    # (SCALE.md §Joins, "SF-scaling sides")
    items = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    # r19 (guide §2.4): the basket-size cap rides a COUNT WINDOW over the
    # order key instead of a groupBy + join-back — the old form consumed
    # ``items`` twice (re-running the scan→join→distinct once per
    # consumer; items is too big to fence at corpus scale) and paid a
    # second exchange pair for the self-join. Same kept rows exactly;
    # per-okey window partitions are basket-sized at any scale.
    basket = (
        items.withColumn(
            "_nb", F.count(F.lit(1)).over(Window.partitionBy("okey")))
        .where(F.col("_nb") <= BASKET_CAP)
        .select("okey", "brand")
        .localCheckpoint(eager=False)
    )
    a = basket.select("okey", F.col("brand").alias("brand_a"))
    b = basket.select(F.col("okey").alias("okey_b"), F.col("brand").alias("brand_b"))
    pairs = a.join(
        b, (a.okey == b.okey_b) & (F.col("brand_a") < F.col("brand_b"))
    )
    support = (
        pairs.groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
        .where(F.col("support") >= BASKET_MINSUP)
    )
    marg = basket.groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_brand")
    )
    n_orders = basket.agg(
        F.count_distinct(F.col("okey")).cast("bigint").alias("n_orders")
    )
    return (
        support.join(
            F.broadcast(marg.select(F.col("brand").alias("brand_a"),
                                    F.col("n_brand").alias("n_a"))),
            "brand_a",
        )
        .join(
            F.broadcast(marg.select(F.col("brand").alias("brand_b"),
                                    F.col("n_brand").alias("n_b"))),
            "brand_b",
        )
        .crossJoin(F.broadcast(n_orders))
        .select(
            "brand_a", "brand_b", "support", "n_a", "n_b",
            F.expr("(1000000 * support * n_orders) div (n_a * n_b)")
            .alias("lift_ppm"),
        )
    )


_COPURCHASE_SQL = f"""
WITH items AS (
  SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
sizes AS (
  SELECT okey, COUNT(*) AS n_brands FROM items GROUP BY 1
),
basket AS (
  SELECT i.okey, i.brand FROM items i
  JOIN sizes s ON i.okey = s.okey AND s.n_brands <= {BASKET_CAP}
),
support AS (
  SELECT a.brand AS brand_a, b.brand AS brand_b,
         CAST(COUNT(*) AS BIGINT) AS support
  FROM basket a JOIN basket b
    ON a.okey = b.okey AND a.brand < b.brand
  GROUP BY 1, 2
  HAVING COUNT(*) >= {BASKET_MINSUP}
),
marg AS (
  SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_brand FROM basket GROUP BY 1
),
tot AS (
  SELECT CAST(COUNT(DISTINCT okey) AS BIGINT) AS n_orders FROM basket
)
SELECT s.brand_a, s.brand_b, s.support,
       ma.n_brand AS n_a, mb.n_brand AS n_b,
       (1000000 * s.support * t.n_orders) // (ma.n_brand * mb.n_brand)
         AS lift_ppm
FROM support s
JOIN marg ma ON s.brand_a = ma.brand
JOIN marg mb ON s.brand_b = mb.brand
CROSS JOIN tot t
"""


#: Z-order layout: 16 bits per dimension interleaved into a 32-bit key,
#: bucketed into 64 equal z-ranges (the "file" granularity).
Z_BITS = 16
Z_BUCKETS = 64


def _interleave_spark(qx: str, qy: str) -> str:
    terms = []
    for i in range(Z_BITS):
        terms.append(f"shiftleft(shiftright({qx}, {i}) & 1, {2 * i})")
        terms.append(f"shiftleft(shiftright({qy}, {i}) & 1, {2 * i + 1})")
    return " + ".join(terms)


def _interleave_duckdb(qx: str, qy: str) -> str:
    terms = []
    for i in range(Z_BITS):
        terms.append(f"((({qx} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({qy} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout keys over orders on the (o_custkey,
    order-day) pair — the multi-dimensional clustering step a lakehouse
    runs before writing (Delta/Iceberg ``OPTIMIZE ZORDER BY`` analog), so
    zone-map min/max pruning works for range predicates on EITHER
    dimension, not just the sort-leading one.

    Two passes, the honest shape: a stats pass reduces to a 1-row
    min/max frame (broadcast), then a MAP-ONLY pass quantizes each
    dimension to {Z_BITS} bits (integer scale-div, no float) and
    interleaves bits with shift/mask expressions — all inside
    whole-stage codegen, zero shuffle exchanges (pinned). The physical
    move (repartitionByRange on zval) is the deployment step; this query
    returns the verifiable layout assignment (zval + file bucket), and
    tests/test_pipeline_ops.py measures the payoff: mean per-bucket
    zone-map span is a small fraction of the domain on BOTH dimensions.
    """
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("x"),
        F.expr("datediff(cast(o_orderdate as date), date'1970-01-01')")
        .cast("bigint").alias("y"),
    )
    mm = orders.agg(
        F.min("x").alias("minx"), F.max("x").alias("maxx"),
        F.min("y").alias("miny"), F.max("y").alias("maxy"),
    )
    scale = (1 << Z_BITS) - 1
    q = orders.crossJoin(F.broadcast(mm)).select(
        "o_orderkey",
        F.expr(f"(({scale} * (x - minx)) div greatest(1, maxx - minx))")
        .alias("qx"),
        F.expr(f"(({scale} * (y - miny)) div greatest(1, maxy - miny))")
        .alias("qy"),
    )
    zexpr = _interleave_spark("qx", "qy")
    return q.select(
        "o_orderkey",
        F.expr(zexpr).cast("bigint").alias("zval"),
    ).withColumn(
        "file_bucket",
        F.expr(f"zval div {(1 << (2 * Z_BITS)) // Z_BUCKETS}").cast("int"),
    )


_ZORDER_SQL = f"""
WITH o AS (
  SELECT o_orderkey, o_custkey AS x,
         CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
              AS BIGINT) AS y
  FROM orders
),
mm AS (
  SELECT MIN(x) AS minx, MAX(x) AS maxx, MIN(y) AS miny, MAX(y) AS maxy
  FROM o
),
q AS (
  SELECT o_orderkey,
         (({(1 << Z_BITS) - 1} * (x - minx)) // GREATEST(1, maxx - minx)) AS qx,
         (({(1 << Z_BITS) - 1} * (y - miny)) // GREATEST(1, maxy - miny)) AS qy
  FROM o CROSS JOIN mm
),
z AS (
  SELECT o_orderkey,
         CAST({_interleave_duckdb('qx', 'qy')} AS BIGINT) AS zval
  FROM q
)
SELECT o_orderkey, zval,
       CAST(zval // {(1 << (2 * Z_BITS)) // Z_BUCKETS} AS INT) AS file_bucket
FROM z
"""


def q_mad_outlier_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outlier flags via median absolute deviation —
    the mean/σ pair (`event_count_anomaly`'s tool) is itself dragged by
    outliers; MAD is the 50%-breakdown robust alternative a data-quality
    gate uses on skewed telemetry/money columns (here: the heavy-tailed
    per-type event value; a uniform column never breaches a 4.45·MAD
    fence by construction, which is the right behavior).

    Integer discipline around an interpolated median: balances go
    through floor-cents, and every median is carried DOUBLED
    (``2·median`` = the sum of the two middle elements — an exact BIGINT
    even when the median itself is a .5), so ``d2 = |2x − med2|`` and
    ``mad4 = 2·median(d2)`` never leave integer space. The 3·1.4826·MAD
    fence is the cross-multiplied ``20000·d2 > 44478·mad4`` — no float
    comparison anywhere. (The only doubles are the engines' exact
    ``(a+b)/2``, lossless below 2^53.)

    Scale shape: two grouped EXACT medians (sort-per-group — the honest
    exact mode; the documented 100 TB flip is `approx_percentile`, the
    `quantile_sketch_bounds` path) with the tiny per-type stats
    broadcast back each pass.
    """
    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    med = ev.groupBy("event_type").agg(
        F.expr("CAST(2 * percentile(cents, 0.5) AS BIGINT)").alias("med2")
    )
    d = ev.join(F.broadcast(med), "event_type").select(
        "event_id", "event_type", "cents", "med2",
        F.abs(2 * F.col("cents") - F.col("med2")).alias("d2"),
    )
    mad = d.groupBy("event_type").agg(
        F.expr("CAST(2 * percentile(d2, 0.5) AS BIGINT)").alias("mad4")
    )
    return d.join(F.broadcast(mad), "event_type").select(
        "event_id",
        "event_type",
        "cents",
        (20000 * F.col("d2") > 44478 * F.col("mad4")).alias("is_outlier"),
    )


_MAD_SQL = """
WITH ev AS (
  SELECT event_id, event_type,
         CAST(FLOOR(value * 100) AS BIGINT) AS cents
  FROM events
),
med AS (
  SELECT event_type, CAST(2 * median(cents) AS BIGINT) AS med2
  FROM ev GROUP BY 1
),
d AS (
  SELECT e.event_id, e.event_type, e.cents,
         ABS(2 * e.cents - m.med2) AS d2
  FROM ev e JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, CAST(2 * median(d2) AS BIGINT) AS mad4
  FROM d GROUP BY 1
)
SELECT d.event_id, d.event_type, d.cents,
       20000 * d.d2 > 44478 * ma.mad4 AS is_outlier
FROM d JOIN mad ma USING (event_type)
"""


def q_type_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise co-movement matrix of the hourly event-type series:
    Pearson r² (signed, in basis points) for every unordered type pair —
    "do errors rise when purchases rise?" as one aggregation.

    Missing hours are REAL ZEROS: the series densifies against the
    global hour grid before pairing (a common-hours-only join silently
    biases r upward). All sufficient statistics are BIGINT; r² avoids
    sqrt entirely — ``r² = num²/(denx·deny)`` — computed as the two-step
    truncated integer ``((10000·|num|) div denx)·|num| div deny`` with
    the sign re-applied (both engines truncate at the same two points,
    so the result is deterministic; bias ≤ 1bp·r). Headroom: exact while
    n·Σxy ≲ 9e14 — at larger series, pre-scale counts.

    Scale shape: raw events collapse map-side to (type, hour) counts;
    the dense grid is |types|·|hours|; the pair join is equi on the hour
    key (never a cartesian in the plan — the |types|² fan-out rides the
    hour join); the final matrix is C(|types|,2) rows via one
    map-side-combined aggregation.
    """
    events = table(spark, sf_dir, "events")
    hc = events.groupBy(
        "event_type",
        F.expr("unix_micros(date_trunc('hour', ts)) div 3600000000")
        .alias("hidx"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    hours = hc.select("hidx").distinct()
    types = hc.select("event_type").distinct()
    # materialized ONCE (lazy localCheckpoint): both pair-join sides
    # consume the densified grid, and without the pin each side would
    # replay the scan→agg→fan-out lineage
    grid = (
        hours.crossJoin(F.broadcast(types))
        .join(hc, ["event_type", "hidx"], "left")
        .select(
            "event_type", "hidx",
            F.coalesce("cnt", F.lit(0)).cast("bigint").alias("cnt"),
        )
        .localCheckpoint(eager=False)
    )
    a = grid.select(
        F.col("event_type").alias("type_a"),
        "hidx",
        F.col("cnt").alias("x"),
    )
    b = grid.select(
        F.col("event_type").alias("type_b"),
        F.col("hidx").alias("hidx_b"),
        F.col("cnt").alias("y"),
    )
    st = (
        a.join(b, (a.hidx == b.hidx_b) & (F.col("type_a") < F.col("type_b")))
        .groupBy("type_a", "type_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_hours"),
            F.sum("x").cast("bigint").alias("sx"),
            F.sum("y").cast("bigint").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
            F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
            F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        )
    )
    num = F.col("n_hours") * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = F.col("n_hours") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("n_hours") * F.col("syy") - F.col("sy") * F.col("sy")
    r2 = F.when(
        (denx > 0) & (deny > 0),
        F.signum(num).cast("bigint")
        * F.expr(
            "(((10000 * abs(n_hours * sxy - sx * sy))"
            " div (n_hours * sxx - sx * sx))"
            " * abs(n_hours * sxy - sx * sy))"
            " div (n_hours * syy - sy * sy)"
        ),
    )
    return st.select(
        "type_a", "type_b", "n_hours",
        num.alias("cov_num"),
        r2.alias("r2_bp"),
    )


_TYPECORR_SQL = """
WITH hc AS (
  SELECT event_type,
         epoch_us(date_trunc('hour', ts)) // 3600000000 AS hidx,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
),
hours AS (SELECT DISTINCT hidx FROM hc),
types AS (SELECT DISTINCT event_type FROM hc),
grid AS (
  SELECT t.event_type, h.hidx,
         CAST(COALESCE(hc.cnt, 0) AS BIGINT) AS cnt
  FROM hours h CROSS JOIN types t
  LEFT JOIN hc ON hc.event_type = t.event_type AND hc.hidx = h.hidx
),
st AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS n_hours,
         CAST(SUM(a.cnt) AS BIGINT) AS sx,
         CAST(SUM(b.cnt) AS BIGINT) AS sy,
         CAST(SUM(a.cnt * b.cnt) AS BIGINT) AS sxy,
         CAST(SUM(a.cnt * a.cnt) AS BIGINT) AS sxx,
         CAST(SUM(b.cnt * b.cnt) AS BIGINT) AS syy
  FROM grid a JOIN grid b
    ON a.hidx = b.hidx AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, n_hours,
       n_hours * sxy - sx * sy AS cov_num,
       CASE WHEN n_hours * sxx - sx * sx > 0
             AND n_hours * syy - sy * sy > 0 THEN
         CAST(sign(n_hours * sxy - sx * sy) AS BIGINT)
         * ((((10000 * abs(n_hours * sxy - sx * sy))
              // (n_hours * sxx - sx * sx))
             * abs(n_hours * sxy - sx * sy))
            // (n_hours * syy - sy * sy))
       END AS r2_bp
FROM st
"""


def q_fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema: for each FK
    relationship, the child row count and the orphan count (child keys
    with no parent) — the ingest gate that catches a truncated dimension
    load before a silent inner join drops fact rows downstream.

    Scale shape: each orphan check is ONE left-anti join — small parents
    (customer, supplier, part at dimension scale) broadcast; the
    fact-fact check (lineitem→orders) is the honest shuffle anti-join,
    AQE-skew-splittable. Counts reduce to a 4-row summary unioned
    driver-free. No pass reads a table's non-key columns (pruned scans).
    """
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    part = table(spark, sf_dir, "part")

    def audit(child, key, parent, pkey, rel):
        ch = child.select(F.col(key).alias("k"))
        pa = parent.select(F.col(pkey).alias("k"))
        total = ch.agg(F.count(F.lit(1)).cast("bigint").alias("n_child"))
        orphans = ch.join(pa, "k", "left_anti").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orphans")
        )
        return total.crossJoin(orphans).select(
            F.lit(rel).alias("relationship"), "n_child", "n_orphans"
        )

    return (
        audit(li, "l_orderkey", orders, "o_orderkey", "lineitem->orders")
        .unionByName(audit(li, "l_partkey", part, "p_partkey",
                           "lineitem->part"))
        .unionByName(audit(li, "l_suppkey", supp, "s_suppkey",
                           "lineitem->supplier"))
        .unionByName(audit(orders, "o_custkey", cust, "c_custkey",
                           "orders->customer"))
    )


# Children are counted in their own scan and orphans via NOT EXISTS —
# a LEFT JOIN + COUNT(*) would fan out (and miscount) if a corrupted
# ingest double-writes a parent key, which is exactly the scenario the
# audit exists to catch; this mirrors the Spark anti-join shape.
_FK_AUDIT_SQL = """
SELECT 'lineitem->orders' AS relationship,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_child,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
UNION ALL
SELECT 'lineitem->part',
       (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
       (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM part p
                          WHERE p.p_partkey = l.l_partkey))
UNION ALL
SELECT 'lineitem->supplier',
       (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
       (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM supplier s
                          WHERE s.s_suppkey = l.l_suppkey))
UNION ALL
SELECT 'orders->customer',
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey))
"""


def q_key_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew audit — per candidate join/aggregation key, the
    concentration numbers that decide the physical strategy BEFORE a
    1000-executor job hits a hot partition: row count, distinct keys,
    top-1 and top-10 key share (ppm, exact integer division), and a skew
    flag (top key carries >100× the mean per-key load, integer
    cross-multiplied — no float threshold). This is the planning
    companion to ``salted_skew_join`` / AQE skew handling: the audit says
    WHICH keys need salting; SCALE.md §Joins says when.

    Scale shape per column: one pruned single-column scan → one
    map-side-combined groupBy (the only shuffle, carrying |keys| partial
    rows); top-1 is ``max`` over the collapsed counts, top-10 a
    ``TakeOrderedAndProject`` over |keys| rows — never a global sort, and
    ties at the cut are count-equal so the sum is deterministic under
    either engine's tie-break. The collapsed per-key counts are
    materialized once per column via lazy ``localCheckpoint`` (two
    consumers — totals and top-10 — would otherwise each replay the fact
    scan). The four audits union driver-free.
    """

    def audit(df: DataFrame, col: str, label: str) -> DataFrame:
        counts = (df.groupBy(F.col(col).alias("k"))
                  .agg(F.count(F.lit(1)).alias("cnt"))
                  .localCheckpoint(eager=False))
        stats = counts.agg(
            F.sum("cnt").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.max("cnt").cast("bigint").alias("_top1"),
        )
        top10 = (
            counts.orderBy(F.col("cnt").desc(), F.col("k").asc())
            .limit(10)
            .agg(F.sum("cnt").cast("bigint").alias("_top10"))
        )
        return stats.crossJoin(F.broadcast(top10)).select(
            F.lit(label).alias("key_column"),
            "n_rows",
            "n_keys",
            F.expr("(_top1 * 1000000) div n_rows").alias("top1_ppm"),
            F.expr("(_top10 * 1000000) div n_rows").alias("top10_ppm"),
            # decimal domain: top1*n_keys in BIGINT would wrap at ~1e19
            # and silently clear the flag on exactly the hottest keys
            (F.col("_top1").cast("decimal(38,0)") * F.col("n_keys")
             > F.lit(100).cast("decimal(38,0)") * F.col("n_rows"))
            .alias("skewed"),
        )

    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    ev = table(spark, sf_dir, "events")
    return (
        audit(li, "l_partkey", "lineitem.l_partkey")
        .unionByName(audit(li, "l_suppkey", "lineitem.l_suppkey"))
        .unionByName(audit(orders, "o_custkey", "orders.o_custkey"))
        .unionByName(audit(ev, "user_id", "events.user_id"))
    )


def _skew_audit_sql(tbl: str, col: str) -> str:
    return f"""
SELECT '{tbl}.{col}' AS key_column,
       CAST(SUM(cnt) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST((MAX(cnt) * 1000000) // CAST(SUM(cnt) AS BIGINT)
            AS BIGINT) AS top1_ppm,
       CAST(((SELECT CAST(SUM(cnt) AS BIGINT) FROM (
           SELECT cnt FROM (SELECT {col} AS k, COUNT(*) AS cnt
                            FROM {tbl} GROUP BY 1)
           ORDER BY cnt DESC, k ASC LIMIT 10)) * 1000000)
           // CAST(SUM(cnt) AS BIGINT) AS BIGINT) AS top10_ppm,
       CAST(MAX(cnt) AS HUGEINT) * COUNT(*)
         > 100 * CAST(SUM(cnt) AS HUGEINT) AS skewed
FROM (SELECT {col} AS k, COUNT(*) AS cnt FROM {tbl} GROUP BY 1)
"""


_KEY_SKEW_SQL = " UNION ALL ".join([
    _skew_audit_sql("lineitem", "l_partkey"),
    _skew_audit_sql("lineitem", "l_suppkey"),
    _skew_audit_sql("orders", "o_custkey"),
    _skew_audit_sql("events", "user_id"),
])


def q_data_contract_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-contract audit (the dbt-test / expectations
    analog): each rule is a violation predicate evaluated in ONE pass
    over its table, reported as (table, rule, n_checked, n_violations,
    violation_ppm). The ingest gate a pipeline runs before promoting a
    batch — :func:`q_column_profile` describes the data, this ASSERTS it.

    NULL discipline is explicit: a rule counts a row only when its
    violation predicate is TRUE (SQL three-valued logic — NULLs fall to
    not-violated), mirrored exactly by the oracle's ``FILTER`` clauses;
    rules that must catch NULLs say ``IS NULL`` in the predicate.

    Scale shape: one scan per table computes ALL of that table's rules
    as conditional sums in a single map-side-combined aggregate (adding
    a rule adds a column, not a pass); the per-rule rows unpivot from
    the 1-row aggregate driver-free, and the three audits union. No
    join, no window, no second scan however many rules a table carries.
    """

    def audit(df: DataFrame, tname: str, rules: dict[str, Column]) -> DataFrame:
        agg = df.agg(
            F.count(F.lit(1)).cast("bigint").alias("_n"),
            *[
                # count(when(...)) not sum(when(...)): an EMPTY table must
                # report 0 violations, not NULL (the oracle's FILTER does)
                F.count(F.when(cond, 1)).cast("bigint").alias(rid)
                for rid, cond in rules.items()
            ],
        )
        arr = F.array(*[
            F.struct(F.lit(rid).alias("rule_id"), F.col(rid).alias("nv"))
            for rid in rules
        ])
        return agg.select(
            F.lit(tname).alias("table_name"),
            F.explode(arr).alias("r"),
            F.col("_n").alias("n_checked"),
        ).select(
            "table_name",
            F.col("r.rule_id").alias("rule_id"),
            "n_checked",
            F.col("r.nv").alias("n_violations"),
            F.expr("(r.nv * 1000000) div n_checked").alias("violation_ppm"),
        )

    # raw=True on EVERY read: the audit's whole purpose is seeing the
    # defective rows the ingest guards exclude or mask — value_null must
    # count guarded-away events, and a non-finite o_totalprice must trip
    # price_nonpositive's domain rules on the wire value, not on the
    # star guard's NULL rewrite (r16 batch residual #1, ROUND15_NOTES
    # §13: an audit reading guarded star tables while its oracle opts
    # out via the raw-ingest tag diverges by construction — symmetric
    # raw reads restore one semantics in both engines)
    orders = table(spark, sf_dir, "orders", raw=True)
    li = table(spark, sf_dir, "lineitem", raw=True)
    ev = table(spark, sf_dir, "events", raw=True)
    d = F.col  # brevity
    return (
        audit(orders, "orders", {
            "price_nonpositive": d("o_totalprice") <= 0,
            "status_domain":
                ~d("o_orderstatus").isin("O", "F", "P"),
            "date_window":
                (d("o_orderdate") < F.lit("1992-01-01").cast("date"))
                | (d("o_orderdate") > F.lit("1998-12-31").cast("date")),
        })
        .unionByName(audit(li, "lineitem", {
            "quantity_range": (d("l_quantity") < 1) | (d("l_quantity") > 50),
            "discount_range": (d("l_discount") < 0) | (d("l_discount") > 0.1),
            "tax_range": (d("l_tax") < 0) | (d("l_tax") > 0.08),
        }))
        .unionByName(audit(ev, "events", {
            "value_null": d("value").isNull(),
            "type_domain":
                ~d("event_type").isin("view", "click", "purchase"),
        }))
    )


def _contract_sql(tbl: str, rules: dict[str, str]) -> str:
    rows = []
    for rid, pred in rules.items():
        rows.append(
            f"SELECT '{tbl}' AS table_name, '{rid}' AS rule_id,\n"
            f"       CAST(COUNT(*) AS BIGINT) AS n_checked,\n"
            f"       CAST(COUNT(*) FILTER (WHERE {pred}) AS BIGINT)\n"
            f"         AS n_violations,\n"
            f"       CAST((COUNT(*) FILTER (WHERE {pred}) * 1000000)\n"
            f"         // COUNT(*) AS BIGINT) AS violation_ppm\n"
            f"FROM {tbl}"
        )
    return "\nUNION ALL\n".join(rows)


_CONTRACT_SQL = "\nUNION ALL\n".join([
    _contract_sql("orders", {
        "price_nonpositive": "o_totalprice <= 0",
        "status_domain": "NOT (o_orderstatus IN ('O', 'F', 'P'))",
        "date_window": ("o_orderdate < DATE '1992-01-01'"
                        " OR o_orderdate > DATE '1998-12-31'"),
    }),
    _contract_sql("lineitem", {
        "quantity_range": "l_quantity < 1 OR l_quantity > 50",
        "discount_range": "l_discount < 0 OR l_discount > 0.1",
        "tax_range": "l_tax < 0 OR l_tax > 0.08",
    }),
    _contract_sql("events", {
        "value_null": "value IS NULL",
        "type_domain": "NOT (event_type IN ('view', 'click', 'purchase'))",
    }),
])


_MED_BUCKET = 4096  # cents-domain range width for the two-phase cumsum


def _event_value_cum(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Shared counting-quantile machinery: the per-(type, cents) count
    relation with its two-phase cumulative count, plus per-type totals.
    Both rank-lookup consumers (`exact_grouped_median`,
    `equi_depth_histogram`) ride this; the collapsed relations are
    lazily checkpointed so consumers never replay the event scan."""
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    collapsed = (
        ev.select(
            "event_type",
            F.floor(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("event_type", "cents")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rng", F.expr(f"cents div {_MED_BUCKET}"))
        .localCheckpoint(eager=False)
    )
    # no fence on ``cum`` (r19, guide §2.4): both rank-lookup consumers
    # now read it exactly ONCE per query (the median's lo/hi lookups
    # merged into one pass below; the histogram always was one pass), so
    # the fence bought nothing and cost a per-construction plan compile
    # + its own materialization job. ``collapsed`` stays fenced — the
    # prefix sum references it twice and ``totals`` is a third reader.
    cum = two_phase_prefix_sum(
        collapsed, partition_cols=("event_type",), bucket_col="rng",
        order_cols=("cents",), val_col="cnt", out_col="cum_le",
    )
    totals = collapsed.groupBy("event_type").agg(
        F.sum("cnt").cast("bigint").alias("n_values"))
    return cum, totals


def q_exact_grouped_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-type median of the event value WITHOUT sorting the
    data — the scale path the MAD fence's docstring promises: medians by
    counting, not ordering. Values floor to cents and collapse to
    per-(type, cents) counts (map-side combine, bounded by the VALUE
    DOMAIN, not the row count); the cumulative count then rides
    :func:`~tfm_taxitrips_spark.operators.prefix.two_phase_prefix_sum`
    over contiguous cents ranges, and the median is a rank lookup: the
    smallest value whose running count reaches rank (n+1)//2 (and
    n//2+1 — both middles, so the emitted ``median2_cents`` is the exact
    doubled median, integer even when the true median is a .5, same
    convention as the MAD op).

    Scale shape: one scan → one map-side-combined collapse → windows
    over (type, range) partitions of the collapsed relation → two
    rank-filter aggregates joined back by broadcast (per-type rows). No
    global sort at any point, no per-group sort either — the thing that
    makes exact medians tractable when one group holds half the data.
    The oracle states the naive one-window-per-type cumulative form.
    """
    cum, totals = _event_value_cum(spark, sf_dir)

    # eqNullSafe join: a NULL event_type is a real stratum (the repo's
    # NULL-provenance convention) — a plain equi-join silently drops the
    # NULL group that every GROUP BY in the same query keeps (r12
    # adversarial sweep; the oracle mirrors with IS NOT DISTINCT FROM).
    # r19 (guide §1.2/§2.4): BOTH middle ranks resolve in ONE pass over
    # ``cum`` — the rank targets ride one broadcast with r_lo and r_hi,
    # the filter keeps every row either lookup needs (r_lo ≤ r_hi always,
    # so cum_le ≥ r_lo is the union), and conditional MINs split them
    # back out. Same values as the old two-pass lo/hi joins; removes one
    # full pass over cum, two broadcast joins and the cum fence.
    ranks = totals.select(
        F.col("event_type").alias("_et"),
        F.col("n_values"),
        F.expr("(n_values + 1) div 2").cast("bigint").alias("_r_lo"),
        F.expr("n_values div 2 + 1").cast("bigint").alias("_r_hi"),
    )
    return (
        cum.join(F.broadcast(ranks),
                 F.col("event_type").eqNullSafe(F.col("_et")))
        .where(F.col("cum_le") >= F.col("_r_lo"))
        .groupBy("event_type")
        .agg(
            F.max("n_values").alias("n_values"),
            (
                F.min(F.when(F.col("cum_le") >= F.col("_r_lo"),
                             F.col("cents")))
                + F.min(F.when(F.col("cum_le") >= F.col("_r_hi"),
                               F.col("cents")))
            ).cast("bigint").alias("median2_cents"),
        )
        .select("event_type", "n_values", "median2_cents")
    )


_EXACT_MEDIAN_SQL = """
WITH c AS (
  SELECT event_type, CAST(FLOOR(value * 100) AS BIGINT) AS cents,
         COUNT(*) AS cnt
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
cum AS (
  SELECT event_type, cents,
         CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY cents
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_le
  FROM c
),
t AS (
  SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n_values
  FROM c GROUP BY 1
)
SELECT t.event_type, t.n_values,
       (SELECT MIN(cents) FROM cum
        WHERE cum.event_type IS NOT DISTINCT FROM t.event_type
          AND cum_le >= (t.n_values + 1) // 2)
     + (SELECT MIN(cents) FROM cum
        WHERE cum.event_type IS NOT DISTINCT FROM t.event_type
          AND cum_le >= t.n_values // 2 + 1) AS median2_cents
FROM t
"""


_HIST_BUCKETS = 10


def q_equi_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equi-depth histogram boundaries per type — the
    cost-based-optimizer statistic (equal ROW counts per bucket, so
    selectivity estimates stay accurate under skew, where equi-WIDTH
    buckets collapse into one hot bin). Boundary b = the smallest value
    whose cumulative count reaches ``ceil(b·n/10)`` — the discrete
    quantile, exact, from the same counting machinery as
    :func:`q_exact_grouped_median`: collapsed per-(type, cents) counts,
    the shared two-phase cumulative sum, then 10 rank lookups per type
    (a broadcast of the |types|×10 rank targets against the collapsed
    relation). No sort at any scale; the oracle states the naive
    one-window cumulative form with correlated-subquery lookups.
    """
    cum, totals = _event_value_cum(spark, sf_dir)
    buckets = spark.range(1, _HIST_BUCKETS + 1).select(
        F.col("id").cast("int").alias("bucket"))
    # _et alias + eqNullSafe: the NULL event_type stratum is real (same
    # r12 contract as exact_grouped_median — plain equi-joins dropped it)
    ranks = totals.crossJoin(F.broadcast(buckets)).select(
        F.col("event_type").alias("_et"), "bucket", "n_values",
        F.expr(f"(bucket * n_values + {_HIST_BUCKETS - 1}) "
               f"div {_HIST_BUCKETS}").alias("_r"),
    )
    return (
        cum.join(F.broadcast(ranks),
                 F.col("event_type").eqNullSafe(F.col("_et")))
        .where(F.col("cum_le") >= F.col("_r"))
        .groupBy("event_type", "bucket")
        .agg(
            F.max("n_values").alias("n_values"),
            F.max("_r").cast("bigint").alias("rank_target"),
            F.min("cents").alias("upper_cents"),
        )
    )


_EQUI_DEPTH_SQL = f"""
WITH c AS (
  SELECT event_type, CAST(FLOOR(value * 100) AS BIGINT) AS cents,
         COUNT(*) AS cnt
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
cum AS (
  SELECT event_type, cents,
         CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY cents
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_le
  FROM c
),
t AS (
  SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n_values
  FROM c GROUP BY 1
),
r AS (
  SELECT t.event_type, CAST(b.bucket AS INT) AS bucket, t.n_values,
         (b.bucket * t.n_values + {_HIST_BUCKETS - 1}) // {_HIST_BUCKETS}
           AS rk
  FROM t, (SELECT UNNEST(range(1, {_HIST_BUCKETS + 1})) AS bucket) b
)
SELECT r.event_type, r.bucket, r.n_values,
       CAST(r.rk AS BIGINT) AS rank_target,
       (SELECT MIN(cents) FROM cum
        WHERE cum.event_type IS NOT DISTINCT FROM r.event_type
          AND cum.cum_le >= r.rk) AS upper_cents
FROM r
"""


# Benford first-digit expectations, pinned as INTEGER ppm constants computed
# once in Python (round(log10(1+1/d)·10⁶)) — no transcendental runs in either
# engine, so there is no libm-divergence surface (the PMI/log-free discipline).
_BENFORD_EXP_PPM = (301030, 176091, 124939, 96910, 79181, 66947, 57992,
                    51153, 45757)


def q_benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forensic data-quality audit: the observed FIRST-DIGIT distribution
    of ``l_extendedprice`` per return-flag segment against Benford's-law
    expectation — the fabricated-data / broken-upstream-generator detector
    (a synthesized or unit-mistaken feed shows flat or spiked first
    digits where organic multi-magnitude money data follows Benford).

    Integer-exact: the value is first made an exact integer (cents via
    DECIMAL(18,2)·100), the leading digit comes from the INTEGER's string
    form (identical formatting in every engine — no double→string or
    log10 involved), observed shares are ``(10⁶·n) div total`` ppm, and
    the deviation is |obs − exp| against the pinned constant table.

    Scale shape: one map-side-combined two-key groupBy (segment × digit,
    ≤ 9 digits per segment), a segment-total window over the aggregate-
    sized result, and a 9-row expectation lookup folded as a literal
    array — per-row work is one decimal cast and a substring at any
    scale.
    """
    li = table(spark, sf_dir, "lineitem")
    exp_arr = F.array(*[F.lit(v).cast("bigint") for v in _BENFORD_EXP_PPM])
    # Benford's law reads the first SIGNIFICANT digit of the MAGNITUDE:
    # abs() before the string form (r13 extreme-value probe: a negative
    # reversal line's leading '-' crashes the ANSI string→int cast), and
    # an exactly-zero value has no significant digit — explicit NULL
    # digit, folding into the NULL bucket (both engines)
    cents = F.abs(
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint"))
    digits = li.select(
        F.col("l_returnflag").alias("segment"),
        F.when(cents > 0,
               F.substring(cents.cast("string"), 1, 1).cast("int"))
        .alias("digit"),
    )
    counts = digits.groupBy("segment", "digit").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    return counts.select(
        "segment",
        "digit",
        "n",
        F.expr("(1000000 * n) div sum(n) over "
               "(partition by segment)").cast("bigint").alias("obs_ppm"),
        # explicit NULL guard (r13 star-table sweep finding): Spark's
        # element_at with a NULL COLUMN index returns the LAST array
        # element (the NULL literal form returns NULL; DuckDB's CASE
        # yields NULL) — a NULL-digit segment must get NULL expectation
        F.when(F.col("digit").isNotNull(),
               F.element_at(exp_arr, F.col("digit"))).alias("exp_ppm"),
    ).withColumn(
        "abs_dev_ppm", F.abs(F.col("obs_ppm") - F.col("exp_ppm"))
    )


_BENFORD_CASE = " ".join(
    f"WHEN {d} THEN CAST({v} AS BIGINT)"
    for d, v in enumerate(_BENFORD_EXP_PPM, start=1)
)

_BENFORD_SQL = f"""
WITH cents AS (
  SELECT l_returnflag AS segment,
         abs(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
             AS BIGINT)) AS c
  FROM lineitem
),
digits AS (
  SELECT segment,
         CASE WHEN c > 0
              THEN CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INT)
         END AS digit
  FROM cents
),
counts AS (
  SELECT segment, digit, CAST(COUNT(*) AS BIGINT) AS n
  FROM digits GROUP BY 1, 2
),
scored AS (
  SELECT segment, digit, n,
         CAST((1000000 * n) // SUM(n) OVER (PARTITION BY segment) AS BIGINT)
           AS obs_ppm,
         CASE digit {_BENFORD_CASE} END AS exp_ppm
  FROM counts
)
SELECT segment, digit, n, obs_ppm, exp_ppm,
       abs(obs_ppm - exp_ppm) AS abs_dev_ppm
FROM scored
"""


def q_group_ols_two_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment TWO-FACTOR least squares: regress line price (cents)
    on quantity and discount (percent points) per return flag, solved in
    CLOSED FORM from sufficient statistics — the multivariate extension
    of `group_trend_slopes`' single-regressor OLS, i.e. "which driver
    moves revenue in this segment, volume or discounting?" as one
    aggregation, no ML library and no iterative solver.

    Integer-exact normal equations: all inputs become exact integers
    (DECIMAL(18,2) casts ×100), the 9 sufficient statistics accumulate
    in DECIMAL(38,0), and the centered moments ``m_ab = n·Σab − Σa·Σb``
    stay exact.  The 2×2 solve emits integer-ppm slopes with explicit
    sign handling and the ppm scaling applied AFTER the division via the
    exact identity ``(10⁶·|num|) div det = 10⁶·(|num| div det) +
    (10⁶·(|num| mod det)) div det`` — only the sub-``det`` remainder is
    ever multiplied by 10⁶, so the scaling itself can never overflow.
    No float exists anywhere in the lineage.

    Overflow horizon (honest): the 9 sufficient statistics stay inside
    DECIMAL(38,0) past 10¹¹ rows/group, but the 2×2 solve's products
    ``m_ab·m_cd`` grow ~n⁴.  At this table's column-domain maxima
    (x1 ≤ 50, x2 ≤ 10, y ≤ 1.05×10⁷ cents) the CRUDE adversarial bound
    ``|num₂| ≤ 2n⁴·X1²·X2·Y`` caps the safe per-group row count at
    ~3.7×10⁶ (~sf1.9); on the MEASURED sf0.1 covariance structure
    (num ~10²⁷·⁹, det ~10²⁴·⁵ at n≈2×10⁵) the binding term is
    10⁶·(num mod det) and the extrapolated horizon is ~1.5×10⁷
    rows/group (~sf7).  `tests/test_feature_ops.py` pins both bounds
    against the tested group sizes.  Recentring does NOT extend the
    horizon: the central moments are shift-invariant, so recentring
    shrinks only the raw sums (never the binding n⁴ products).  Past
    the horizon the escalation is sharding each segment by a secondary
    key and combining the shards' moments by weighted addition — a
    plan shape the tested scales never need.

    Scale shape: ONE map-side-combined groupBy over the fact table
    computes every moment; the solve is a 3-row projection.  No window,
    no join, no sort.
    """
    li = table(spark, sf_dir, "lineitem")
    d38 = "decimal(38,0)"
    base = li.select(
        F.col("l_returnflag").alias("segment"),
        F.col("l_quantity").cast("decimal(18,2)").cast("bigint")
        .cast(d38).alias("x1"),
        (F.col("l_discount").cast("decimal(18,2)") * 100).cast("bigint")
        .cast(d38).alias("x2"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("bigint")
        .cast(d38).alias("y"),
    )
    st = base.groupBy("segment").agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum("x1").alias("sx1"),
        F.sum("x2").alias("sx2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("sx1x1"),
        F.sum(F.col("x2") * F.col("x2")).alias("sx2x2"),
        F.sum(F.col("x1") * F.col("x2")).alias("sx1x2"),
        F.sum(F.col("x1") * F.col("y")).alias("sx1y"),
        F.sum(F.col("x2") * F.col("y")).alias("sx2y"),
    )
    mom = st.select(
        "segment",
        F.col("n").cast("bigint").alias("n_rows"),
        (F.col("n") * F.col("sx1x1") - F.col("sx1") * F.col("sx1")).alias("m11"),
        (F.col("n") * F.col("sx2x2") - F.col("sx2") * F.col("sx2")).alias("m22"),
        (F.col("n") * F.col("sx1x2") - F.col("sx1") * F.col("sx2")).alias("m12"),
        (F.col("n") * F.col("sx1y") - F.col("sx1") * F.col("sy")).alias("m1y"),
        (F.col("n") * F.col("sx2y") - F.col("sx2") * F.col("sy")).alias("m2y"),
    )
    num1 = "(m22 * m1y - m12 * m2y)"
    num2 = "(m11 * m2y - m12 * m1y)"
    det = "(m11 * m22 - m12 * m12)"

    def _beta_ppm(num: str) -> str:
        # (10⁶·|num|) div det, computed WITHOUT forming 10⁶·|num|:
        # 10⁶·(|num| div det) + (10⁶·(|num| mod det)) div det — exact by
        # the division algorithm (|num| = q·det + r, r < det), so only
        # the sub-det remainder meets the 10⁶ factor.
        return (
            f"CASE WHEN {det} > 0 THEN CAST(sign({num}) AS BIGINT)"
            f" * (1000000 * CAST(abs({num}) div {det} AS BIGINT)"
            f"    + CAST((1000000 * (abs({num}) % {det})) div {det}"
            f"           AS BIGINT)) END"
        )

    return mom.select(
        "segment",
        "n_rows",
        F.expr(_beta_ppm(num1)).alias("beta_qty_ppm"),
        F.expr(_beta_ppm(num2)).alias("beta_disc_ppm"),
    )


_OLS2_SQL = """
WITH base AS (
  SELECT l_returnflag AS segment,
         CAST(CAST(l_quantity AS DECIMAL(18,2)) AS HUGEINT) AS x1,
         CAST(CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)
              AS HUGEINT) AS x2,
         CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
              AS HUGEINT) AS y
  FROM lineitem
),
st AS (
  SELECT segment,
         CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(x1) AS sx1, SUM(x2) AS sx2, SUM(y) AS sy,
         SUM(x1 * x1) AS sx1x1, SUM(x2 * x2) AS sx2x2,
         SUM(x1 * x2) AS sx1x2, SUM(x1 * y) AS sx1y, SUM(x2 * y) AS sx2y
  FROM base GROUP BY 1
),
mom AS (
  SELECT segment, CAST(n AS BIGINT) AS n_rows,
         n * sx1x1 - sx1 * sx1 AS m11,
         n * sx2x2 - sx2 * sx2 AS m22,
         n * sx1x2 - sx1 * sx2 AS m12,
         n * sx1y - sx1 * sy AS m1y,
         n * sx2y - sx2 * sy AS m2y
  FROM st
)
SELECT segment, n_rows,
       CASE WHEN (m11 * m22 - m12 * m12) > 0
            THEN CAST(sign(m22 * m1y - m12 * m2y) AS BIGINT)
                 * (1000000 * CAST(abs(m22 * m1y - m12 * m2y)
                        // (m11 * m22 - m12 * m12) AS BIGINT)
                    + CAST((1000000 * (abs(m22 * m1y - m12 * m2y)
                                       % (m11 * m22 - m12 * m12)))
                           // (m11 * m22 - m12 * m12) AS BIGINT)) END
         AS beta_qty_ppm,
       CASE WHEN (m11 * m22 - m12 * m12) > 0
            THEN CAST(sign(m11 * m2y - m12 * m1y) AS BIGINT)
                 * (1000000 * CAST(abs(m11 * m2y - m12 * m1y)
                        // (m11 * m22 - m12 * m12) AS BIGINT)
                    + CAST((1000000 * (abs(m11 * m2y - m12 * m1y)
                                       % (m11 * m22 - m12 * m12)))
                           // (m11 * m22 - m12 * m12) AS BIGINT)) END
         AS beta_disc_ppm
FROM mom
"""


def q_ks_split_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic between the
    `l_extendedprice` distributions of the 'A' and 'R' return-flag
    populations — the NUMERIC-distribution drift gate (max ECDF
    deviation) completing `source_token_tvd`'s categorical one: the
    pre-deploy check that a feature's distribution didn't shift between
    two splits/snapshots/cohorts.

    Integer-exact: values collapse to exact cents, per-value counts to
    one map-side-combined groupBy, and the deviation is computed on the
    CROSS-MULTIPLIED form |cumA·nB − cumB·nA| (never a float CDF);
    ``ks_ppm = (10⁶·max dev) div (nA·nB)`` with DECIMAL(38,0) products
    (cum·N reaches ~10²⁴ at 10¹² rows). The argmax value reports WHERE
    the distributions diverge most (ties → smallest value).

    Scale shape: the raw scan collapses to the |distinct cents| value
    domain FIRST; both cumulative counts run through the two-phase
    distributed prefix sum (`operators/prefix.py`) on a coarse monotone
    value bucket — no global sort, the heavy windows keep |buckets|×
    parallelism; totals and the max are aggregate-sized broadcasts. The
    oracle states the naive one-window form, proving the rewrite exact.
    """
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag").isin("A", "R")
    )
    # each frame below fans out to 2+ consumers (two_phase_prefix_sum
    # itself reads its input twice: bucket sums + the offset join), so
    # without materialization the scan/groupBy subtree re-executes 16× —
    # lazy localCheckpoint at every fan-out point keeps it to one pass
    # (the token_budget_mix/copurchase_lift discipline)
    vals = (
        li.select(
            (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("bigint").alias("v"),
            F.col("l_returnflag").alias("flag"),
        )
        .groupBy("v")
        .agg(
            F.sum(F.when(F.col("flag") == "A", 1).otherwise(0))
            .cast("decimal(38,0)").alias("ca"),
            F.sum(F.when(F.col("flag") == "R", 1).otherwise(0))
            .cast("decimal(38,0)").alias("cb"),
        )
        .withColumn("vb", F.expr("v div 1000000"))  # ~$10k monotone buckets
        .localCheckpoint(eager=False)
    )
    # BOTH cumulative counts ride ONE two-phase pass (r19, guide
    # §1.2/§2.4): the stacked single-column calls each re-read their
    # input twice and forced a fence between them — the multi form pays
    # the bucket collapse, the offset join, the local window and the
    # fence exactly once, and the shared frame spec plans ONE physical
    # Window operator for both sums (column math bit-identical).
    cum = two_phase_prefix_sums(
        vals, bucket_col="vb", order_cols=["v"],
        cols=[("ca", "cuma"), ("cb", "cumb")],
    ).localCheckpoint(eager=False)
    tot = cum.agg(
        F.sum("ca").cast("decimal(38,0)").alias("na"),
        F.sum("cb").cast("decimal(38,0)").alias("nb"),
    )
    # max dev + its argmax in ONE aggregation over ONE pass (r19): the
    # struct max picks the largest dev and, among ties, the largest
    # negated value = the SMALLEST v — exactly the old two-pass
    # max-then-filter semantics (min v among dev == maxdev rows) without
    # the dev fence, the second crossJoin or the re-scan of dev.
    dev = F.abs(F.col("cuma") * F.col("nb") - F.col("cumb") * F.col("na"))
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "na", "nb",
            F.struct(dev.alias("dev"), (-F.col("v")).alias("nv")).alias("_m"),
        )
        .agg(
            F.first("na").alias("_na"),
            F.first("nb").alias("_nb"),
            F.max("_m").alias("_m"),
        )
        .select(
            F.col("_na").cast("bigint").alias("n_a"),
            F.col("_nb").cast("bigint").alias("n_b"),
            F.expr("CAST((1000000 * _m.dev) div (_na * _nb) AS BIGINT)")
            .alias("ks_ppm"),
            (-F.col("_m.nv")).alias("ks_at_cents"),
        )
    )


_KS_SQL = """
WITH vals AS (
  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
         CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END)
              AS HUGEINT) AS ca,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS HUGEINT) AS cb
  FROM lineitem WHERE l_returnflag IN ('A', 'R') GROUP BY 1
),
tot AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM vals),
cum AS (
  SELECT v,
         SUM(ca) OVER (ORDER BY v) AS cuma,
         SUM(cb) OVER (ORDER BY v) AS cumb
  FROM vals
),
d AS (
  SELECT v, abs(cuma * nb - cumb * na) AS dev
  FROM cum CROSS JOIN tot
)
SELECT CAST((SELECT na FROM tot) AS BIGINT) AS n_a,
       CAST((SELECT nb FROM tot) AS BIGINT) AS n_b,
       CAST((1000000 * (SELECT MAX(dev) FROM d))
            // (SELECT na * nb FROM tot) AS BIGINT) AS ks_ppm,
       MIN(v) AS ks_at_cents
FROM d WHERE dev = (SELECT MAX(dev) FROM d)
"""


QUERIES: dict[str, QuerySpec] = {
    "ks_split_drift": QuerySpec(
        q_ks_split_drift, _KS_SQL,
        tags=("analytics", "drift", "stats", "prefix"),
    ),
    "benford_digit_audit": QuerySpec(
        q_benford_digit_audit, _BENFORD_SQL,
        tags=("analytics", "quality", "audit"),
    ),
    "group_ols_two_factor": QuerySpec(
        q_group_ols_two_factor, _OLS2_SQL,
        tags=("analytics", "stats", "regression"),
    ),
    "equi_depth_histogram": QuerySpec(
        q_equi_depth_histogram, _EQUI_DEPTH_SQL,
        tags=("analytics", "stats", "cbo"),
    ),
    "exact_grouped_median": QuerySpec(
        q_exact_grouped_median, _EXACT_MEDIAN_SQL,
        tags=("analytics", "robust", "window"),
    ),
    "data_contract_audit": QuerySpec(
        q_data_contract_audit, _CONTRACT_SQL,
        # raw-ingest (generalized from raw-events in the r16 batch): the
        # audit must SEE the defective rows/values every ingest guard
        # excludes or masks — its Spark side reads ALL tables with
        # table(..., raw=True), and this tag opts its oracle out of the
        # events AND star guard CTEs symmetrically
        tags=("analytics", "quality", "contract", "raw-ingest"),
    ),
    "key_skew_audit": QuerySpec(
        q_key_skew_audit, _KEY_SKEW_SQL, tags=("analytics", "skew", "profiling")
    ),
    "column_profile": QuerySpec(
        q_column_profile, _COLUMN_PROFILE_SQL, tags=("analytics", "profiling")
    ),
    "funnel_conversion": QuerySpec(
        q_funnel_conversion, _FUNNEL_SQL, tags=("analytics", "funnel")
    ),
    "retention_cohorts": QuerySpec(
        q_retention_cohorts, _RETENTION_SQL, tags=("analytics", "cohort")
    ),
    "pareto_frontier": QuerySpec(
        q_pareto_frontier, _PARETO_SQL, tags=("analytics", "skyline")
    ),
    "value_histogram": QuerySpec(
        q_value_histogram, _HIST_SQL, tags=("analytics", "histogram")
    ),
    "rfm_segmentation": QuerySpec(
        q_rfm_segmentation, _RFM_SQL, tags=("analytics", "window")
    ),
    "copurchase_lift": QuerySpec(
        q_copurchase_lift, _COPURCHASE_SQL, tags=("analytics", "basket")
    ),
    "zorder_layout": QuerySpec(
        q_zorder_layout, _ZORDER_SQL, tags=("analytics", "layout")
    ),
    "mad_outlier_flags": QuerySpec(
        q_mad_outlier_flags, _MAD_SQL, tags=("analytics", "robust")
    ),
    "type_correlation": QuerySpec(
        q_type_correlation, _TYPECORR_SQL, tags=("analytics", "stats")
    ),
    "fk_integrity_audit": QuerySpec(
        q_fk_integrity_audit, _FK_AUDIT_SQL, tags=("analytics", "quality")
    ),
}
