"""Core relational query registry (SURVEY.md §2 rows S4, P1-P7, F1, F3,
J1-J3, A1-A4, §2.7 top-k, §2.8 scalars).

Star-schema mapping of the taxi domain (FIXTURES.md §B): ``lineitem+orders``
play the trips fact, ``customer→nation`` the pickup area (role-playing dim),
``supplier→nation`` the dropoff area, ``c_mktsegment`` the company.

Determinism conventions (required by the driver's order-insensitive
value-hash vs DuckDB):
- money/quantity SUMs go through DECIMAL (see functions.aggregates.dsum);
- every computed column is aliased identically in Spark and SQL;
- double→int casts are avoided (Spark truncates, DuckDB rounds) — we use
  explicit FLOOR where integers are derived from doubles;
- all top-k orderings carry a unique tie-breaker key;
- top-k order columns are either non-null by construction (aggregates,
  groupBy keys of fixture-pinned non-null columns) or must pin explicit
  null ordering on BOTH engines — Spark's bare ``asc`` sorts NULLs first
  while ANSI engines default them last, so a nullable order column at
  the k boundary silently admits different rows per engine
  (``streaming.serving.topk_view`` is the precedent: NULLS LAST pinned
  the day NULL keys became reachable there).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tfm_taxitrips_spark.functions.aggregates import dsum, dsum_sql
from tfm_taxitrips_spark.operators.bloom import bloom_build, bloom_probe
from tfm_taxitrips_spark.operators.dedup import dedup_exact, dedup_exact_aligned
from tfm_taxitrips_spark.operators.enrich import role_play
from tfm_taxitrips_spark.operators.skew import salted_join
from tfm_taxitrips_spark.operators.topk import top_k_by_group, top_k_global
from tfm_taxitrips_spark.operators.views import agg_view, rollup_views
from tfm_taxitrips_spark.queries.registry import QuerySpec
from tfm_taxitrips_spark.sources.readers import table


# --------------------------------------------------------------------------
# role-playing dimensions (J3 analog: dim build via join)
# --------------------------------------------------------------------------

def _pickup_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer→nation as the 'pickup area' role (P2 + J3)."""
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    joined = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    )
    return role_play(
        joined,
        {"c_custkey": "c_custkey", "c_mktsegment": "c_mktsegment", "n_name": "pickup_nation"},
    )


def _dropoff_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    joined = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    )
    return role_play(joined, {"s_suppkey": "s_suppkey", "n_name": "dropoff_nation"})


def _enriched_trips(
    spark: SparkSession, sf_dir: str, roles: tuple[str, ...] = ("pickup", "dropoff")
) -> DataFrame:
    """The §3.1 enrichment pipeline: dedup fact → join header → role-playing
    broadcast joins (A1 + J1).

    ``roles`` prunes unused dimension joins at construction time: Catalyst
    cannot eliminate a LEFT join whose output is unused, because without
    uniqueness metadata a duplicate-keyed dim could multiply fact rows. The
    query layer knows each role dim is key-unique, so a consumer that only
    reads pickup columns skips the dropoff build+probe entirely — one fewer
    broadcast and one fewer per-row probe over the whole fact table.
    """
    # A1 whole-row distinct, shuffle-aligned to the l_orderkey join below
    li = dedup_exact_aligned(table(spark, sf_dir, "lineitem"), "l_orderkey")
    orders = table(spark, sf_dir, "orders")
    enriched = li.join(orders, li.l_orderkey == orders.o_orderkey)
    if "pickup" in roles:
        enriched = enriched.join(
            F.broadcast(_pickup_dim(spark, sf_dir)),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
    if "dropoff" in roles:
        enriched = enriched.join(
            F.broadcast(_dropoff_dim(spark, sf_dir)),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left",
        )
    return enriched


def _enriched_sql(roles: tuple[str, ...] = ("pickup", "dropoff")) -> str:
    """Oracle mirror of :func:`_enriched_trips` with the same role pruning."""
    sel = ["l.*", "o.*"]
    ctes, joins = [], []
    if "pickup" in roles:
        ctes.append(
            "pickup AS (\n"
            "  SELECT c_custkey, c_mktsegment, n_name AS pickup_nation\n"
            "  FROM customer JOIN nation ON c_nationkey = n_nationkey\n)"
        )
        joins.append("LEFT JOIN pickup p ON o.o_custkey = p.c_custkey")
        sel += ["p.pickup_nation", "p.c_mktsegment"]
    if "dropoff" in roles:
        ctes.append(
            "dropoff AS (\n"
            "  SELECT s_suppkey, n_name AS dropoff_nation\n"
            "  FROM supplier JOIN nation ON s_nationkey = n_nationkey\n)"
        )
        joins.append("LEFT JOIN dropoff d ON l.l_suppkey = d.s_suppkey")
        sel.append("d.dropoff_nation")
    cte_block = ",\n".join(["li AS (SELECT DISTINCT * FROM lineitem)"] + ctes)
    join_block = "\n  ".join(joins)
    return f"""
WITH {cte_block},
enriched AS (
  SELECT {', '.join(sel)}
  FROM li l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  {join_block}
)
"""


_ENRICHED_SQL = _enriched_sql()


# --------------------------------------------------------------------------
# flagship (§3.1): dedup → enrich → multi-key agg with sum/count/countDistinct
# --------------------------------------------------------------------------

def q_flagship_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — the companies_pickup_area_view analog
    (/root/reference/TransformTaxiTrips.py:98-113): group by (month,
    pickup, dropoff) with money sums, trip count, distinct-entity count."""
    enriched = _enriched_trips(spark, sf_dir).withColumn(
        "order_month", F.date_trunc("month", F.col("o_orderdate"))
    )
    return agg_view(
        enriched,
        keys=["order_month", "pickup_nation", "dropoff_nation"],
        sum_cols=[("l_extendedprice", "revenue"), ("l_quantity", "total_qty")],
        count_col=("l_orderkey", "n_trips"),
        distinct_col=("l_suppkey", "n_suppliers"),
    )


_FLAGSHIP_SQL = _ENRICHED_SQL + f"""
SELECT date_trunc('month', o_orderdate) AS order_month,
       pickup_nation, dropoff_nation,
       {dsum_sql('l_extendedprice')} AS revenue,
       {dsum_sql('l_quantity')} AS total_qty,
       COUNT(l_orderkey) AS n_trips,
       COUNT(DISTINCT l_suppkey) AS n_suppliers
FROM enriched
GROUP BY 1, 2, 3
"""


def q_rollup_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3+A4 — both view levels in ONE rollup pass (lvl=0 with segment,
    lvl=1 without), with TRUE distinct counts at each level — the
    documented fix for the reference's re-aggregation bug
    (/root/reference/TransformTaxiTrips.py:123-136; SURVEY.md §2.6 A4)."""
    enriched = _enriched_trips(spark, sf_dir, roles=("pickup",)).withColumn(
        "order_year", F.year(F.col("o_orderdate"))
    )
    return rollup_views(
        enriched,
        rollup_key="c_mktsegment",
        keys=["order_year", "pickup_nation"],
        sum_cols=[("l_extendedprice", "revenue"), ("l_quantity", "total_qty")],
        count_col=("l_orderkey", "n_trips"),
        distinct_col=("l_suppkey", "n_suppliers"),
    )


_ROLLUP_FAMILY_SQL = _enriched_sql(("pickup",)) + f"""
SELECT order_year, pickup_nation, c_mktsegment,
       CAST(GROUPING(c_mktsegment) AS INT) AS lvl,
       {dsum_sql('l_extendedprice')} AS revenue,
       {dsum_sql('l_quantity')} AS total_qty,
       COUNT(l_orderkey) AS n_trips,
       COUNT(DISTINCT l_suppkey) AS n_suppliers
FROM (SELECT e.*, CAST(year(o_orderdate) AS INT) AS order_year FROM enriched e)
GROUP BY GROUPING SETS ((order_year, pickup_nation, c_mktsegment),
                        (order_year, pickup_nation))
"""


# --------------------------------------------------------------------------
# joins (J1, J2)
# --------------------------------------------------------------------------

def q_left_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — left broadcast enrich: every order survives, unknown dims null
    (batch semantics, /root/reference/TransformTaxiTrips.py:93-94)."""
    orders = table(spark, sf_dir, "orders")
    return orders.join(
        F.broadcast(_pickup_dim(spark, sf_dir)),
        orders.o_custkey == F.col("c_custkey"),
        "left",
    ).select("o_orderkey", "o_custkey", "pickup_nation")


_LEFT_JOIN_SQL = """
SELECT o_orderkey, o_custkey, n_name AS pickup_nation
FROM orders
LEFT JOIN (SELECT c_custkey, n_name FROM customer JOIN nation ON c_nationkey = n_nationkey) p
  ON o_custkey = p.c_custkey
"""


def q_inner_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — inner stream-style enrich: rows without a dim match are dropped
    (streaming semantics, /root/reference/StreamingTaxiTrips.py:140-141)."""
    orders = table(spark, sf_dir, "orders")
    return orders.join(
        F.broadcast(_pickup_dim(spark, sf_dir)),
        orders.o_custkey == F.col("c_custkey"),
    ).select("o_orderkey", "o_custkey", "pickup_nation")


_INNER_JOIN_SQL = """
SELECT o_orderkey, o_custkey, n_name AS pickup_nation
FROM orders
JOIN (SELECT c_custkey, n_name FROM customer JOIN nation ON c_nationkey = n_nationkey) p
  ON o_custkey = p.c_custkey
"""


# --------------------------------------------------------------------------
# projections & scalar ops (P3-P7)
# --------------------------------------------------------------------------

def q_currency_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 — '$1,234.56' → double (/root/reference/IngestHistoricTrips.py:82-86).

    The star testdata has no dirty money strings, so the query synthesizes
    them from integer cents (FLOOR keeps both engines identical), then runs
    the engine's parse_money on the result.
    """
    from tfm_taxitrips_spark.operators.cleaning import parse_money

    orders = table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    dollars = (cents / 100).cast("long")  # truncation-safe: cents >= 0
    rem = (cents % 100).cast("long")
    money = F.concat(
        F.lit("$"),
        F.format_number(dollars, 0),
        F.lit("."),
        F.lpad(rem.cast("string"), 2, "0"),
    )
    return orders.select(
        "o_orderkey",
        money.alias("money_str"),
        parse_money(money).alias("amount"),
    )


_CURRENCY_SQL = """
WITH c AS (
  SELECT o_orderkey,
         CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
s AS (
  SELECT o_orderkey,
         '$' || format('{:,}', cents // 100) || '.' || lpad(CAST(cents % 100 AS VARCHAR), 2, '0') AS money_str
  FROM c
)
SELECT o_orderkey, money_str,
       CAST(regexp_replace(money_str, '[\\$,)]', '', 'g') AS DOUBLE) AS amount
FROM s
"""


def q_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 — year/month derivation (the reference's partition columns,
    /root/reference/IngestHistoricTrips.py:95-96) + count per part."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.withColumn("order_year", F.year("o_orderdate"))
        .withColumn("order_month", F.month("o_orderdate"))
        .groupBy("order_year", "order_month")
        .agg(F.count("o_orderkey").alias("n_orders"),
             dsum("o_totalprice").alias("total_price"))
    )


_DATE_PARTS_SQL = f"""
SELECT CAST(year(o_orderdate) AS INT) AS order_year,
       CAST(month(o_orderdate) AS INT) AS order_month,
       COUNT(o_orderkey) AS n_orders,
       {dsum_sql('o_totalprice')} AS total_price
FROM orders GROUP BY 1, 2
"""


def q_date_trunc_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 — day truncation (/root/reference/TransformTaxiTrips.py:47 does a
    string round-trip; date_trunc is the numeric equivalent)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.withColumn("ship_day", F.date_trunc("day", F.col("l_shipdate")))
        .groupBy("ship_day")
        .agg(F.count("l_orderkey").alias("n_items"),
             dsum("l_extendedprice").alias("revenue"))
    )


_DATE_TRUNC_SQL = f"""
SELECT date_trunc('day', l_shipdate) AS ship_day,
       COUNT(l_orderkey) AS n_items,
       {dsum_sql('l_extendedprice')} AS revenue
FROM lineitem GROUP BY 1
"""


def q_cast_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 — type casts (int-safe: l_quantity is integral so trunc==round;
    /root/reference/IngestHistoricTrips.py:76-81)."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").cast("string").alias("orderkey_str"),
        F.col("l_linenumber").cast("long").alias("linenumber_long"),
        F.col("l_quantity").cast("int").alias("quantity_int"),
        F.col("l_returnflag").alias("returnflag"),
    )


_CAST_SQL = """
SELECT CAST(l_orderkey AS VARCHAR) AS orderkey_str,
       CAST(l_linenumber AS BIGINT) AS linenumber_long,
       CAST(l_quantity AS INT) AS quantity_int,
       l_returnflag AS returnflag
FROM lineitem
"""


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 — from_json payload parse (/root/reference/StreamingTaxiTrips.py:89-91),
    on the events.props JSON column."""
    events = table(spark, sf_dir, "events")
    parsed = events.select(
        "event_id",
        F.from_json(F.col("props"), "k INT").alias("p"),
    )
    return parsed.select("event_id", F.col("p.k").alias("k"))


_JSON_EXTRACT_SQL = """
SELECT event_id,
       -- malformed JSON yields NULL, matching Spark's lenient from_json
       -- (DuckDB's json functions ERROR on broken input — r12 sweep)
       CASE WHEN props IS NOT NULL AND json_valid(props)
            THEN CAST(json_extract_string(props, '$.k') AS INT) END AS k
FROM events
"""


def q_to_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 — struct pack → JSON (the Kafka-sink payload shape,
    /root/reference/StreamingTaxiTrips.py:146).

    Stated contract (r13 star-table sweep finding): Spark's ``to_json``
    OMITS null struct fields — a NULL o_orderstatus serializes as
    ``{"o_orderkey":N}``, not ``null``. The oracle mirrors that with
    per-field CASE guards + concat_ws (the old ``||`` chain NULLed the
    whole payload on one NULL field)."""
    orders = table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.to_json(F.struct("o_orderkey", "o_orderstatus")).alias("payload"),
    )


_TO_JSON_SQL = """
SELECT o_orderkey,
       '{' || concat_ws(',',
         CASE WHEN o_orderkey IS NOT NULL
              THEN '"o_orderkey":' || o_orderkey END,
         CASE WHEN o_orderstatus IS NOT NULL
              THEN '"o_orderstatus":"' || o_orderstatus || '"' END
       ) || '}' AS payload
FROM orders
"""


# --------------------------------------------------------------------------
# filters (F1, F3)
# --------------------------------------------------------------------------

def q_null_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 — null-predicate conjunction (/root/reference/AreasLoc.py:51-52).
    NULLIF manufactures the nulls the star data lacks."""
    events = table(spark, sf_dir, "events")
    flagged = events.withColumn(
        "err_marker", F.expr("NULLIF(event_type, 'error')")
    )
    return (
        flagged.filter(
            F.col("user_id").isNotNull()
            & F.col("value").isNotNull()
            & F.col("err_marker").isNull()
        )
        .select("event_id", "user_id", "event_type", "value")
    )


_NULL_PRED_SQL = """
SELECT event_id, user_id, event_type, value
FROM (SELECT e.*, NULLIF(event_type, 'error') AS err_marker FROM events e)
WHERE user_id IS NOT NULL AND value IS NOT NULL AND err_marker IS NULL
"""


def q_partition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 — year-predicate pruning: declarative `.where(year==…)` instead of
    the reference's path-munging (/root/reference/TransformTaxiTrips.py:39-41)."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.where(F.year("o_orderdate") == 1997)
        .groupBy("o_orderpriority")
        .agg(F.count("o_orderkey").alias("n_orders"),
             dsum("o_totalprice").alias("total_price"))
    )


_PARTITION_FILTER_SQL = f"""
SELECT o_orderpriority, COUNT(o_orderkey) AS n_orders,
       {dsum_sql('o_totalprice')} AS total_price
FROM orders WHERE year(o_orderdate) = 1997
GROUP BY 1
"""


# --------------------------------------------------------------------------
# dedup (A1, A2)
# --------------------------------------------------------------------------

def q_dedup_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — projected dedup (/root/reference/AreasLoc.py:57): distinct
    (user, event_type) pairs. Key-only output keeps it deterministic."""
    events = table(spark, sf_dir, "events")
    return dedup_exact(events.select("user_id", "event_type"))


_DEDUP_PAIRS_SQL = "SELECT DISTINCT user_id, event_type FROM events"


def q_dedup_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — whole-row distinct then count (the reference's post-scan
    .distinct(), /root/reference/TransformTaxiTrips.py:42)."""
    li = dedup_exact(table(spark, sf_dir, "lineitem"))
    return li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n_rows"))


_DEDUP_COUNT_SQL = """
SELECT l_returnflag, COUNT(*) AS n_rows
FROM (SELECT DISTINCT * FROM lineitem) GROUP BY 1
"""


# --------------------------------------------------------------------------
# top-k (§2.7)
# --------------------------------------------------------------------------

def q_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-100 orders by value — planned as TakeOrderedAndProject
    (per-partition heaps, no global sort)."""
    orders = table(spark, sf_dir, "orders")
    return top_k_global(
        orders.select("o_orderkey", "o_totalprice"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        100,
    )


_TOPK_GLOBAL_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
"""


def q_topk_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per priority via row_number window (the 'zonas con más
    viajes' analytics goal, /root/reference/README.md:10-11)."""
    orders = table(spark, sf_dir, "orders")
    return top_k_by_group(
        orders.select("o_orderpriority", "o_orderkey", "o_totalprice"),
        partition_by=["o_orderpriority"],
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        k=3,
    )


_TOPK_GROUP_SQL = """
SELECT * FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                 ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rnk
  FROM orders
) WHERE rnk <= 3
"""


def q_top_segments_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Empresas con mayor volumen' analog (/root/reference/README.md:11):
    market segments ranked by enriched-trip revenue."""
    enriched = _enriched_trips(spark, sf_dir, roles=("pickup",))
    agg = enriched.groupBy("c_mktsegment").agg(
        dsum("l_extendedprice").alias("revenue"),
        F.count(F.lit(1)).alias("n_trips"),
    )
    return top_k_global(agg, [F.col("revenue").desc(), F.col("c_mktsegment").asc()], 10)


_TOP_SEGMENTS_SQL = _enriched_sql(("pickup",)) + f"""
SELECT c_mktsegment, {dsum_sql('l_extendedprice')} AS revenue, COUNT(*) AS n_trips
FROM enriched GROUP BY 1
ORDER BY revenue DESC, c_mktsegment ASC LIMIT 10
"""


# --------------------------------------------------------------------------
# set ops (§2.7 — engine-added)
# --------------------------------------------------------------------------

def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION of customer and supplier nation keys."""
    customer = table(spark, sf_dir, "customer")
    supplier = table(spark, sf_dir, "supplier")
    return (
        customer.select(F.col("c_nationkey").alias("nationkey"))
        .union(supplier.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


_UNION_SQL = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
"""


def q_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (orderpriority, orderstatus): all four grouping levels in
    one pass with grouping_id — the generalization of the A4 rollup family
    (every marginal computed from one shuffle, not one job per view)."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
            F.grouping_id("o_orderpriority", "o_orderstatus").cast("int").alias("lvl"),
        )
    )


_CUBE_SQL = f"""
SELECT o_orderpriority, o_orderstatus,
       COUNT(*) AS n_orders,
       {dsum_sql('o_totalprice')} AS total_price,
       CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS INT) AS lvl
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""


def q_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running cumulative revenue per market segment over order months —
    the frame-based window-function family (§2.7): one shuffle on the
    partition key, an in-partition sort, no self-join.

    Stated contract (r13 star-table sweep finding): an order with a NULL
    order date has no place on a revenue TIMELINE and is excluded in
    both engines (the drift-gate snapshot convention). Without the
    filter the engines diverge by window NULL placement — Spark ASC
    sorts the NULL month FIRST (its running sum starts NULL), DuckDB
    LAST (it inherits the grand total).
    """
    orders = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate").isNotNull())
    customer = table(spark, sf_dir, "customer")
    # customer scales with SF (unlike nation / the taxi role dims) — no
    # hard broadcast hint: Spark's size-statistics threshold broadcasts it
    # at small SF (plan-pinned) and falls back to a shuffle join past
    # autoBroadcastJoinThreshold.  SCALE.md §Joins, "SF-scaling sides".
    monthly = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy(
            F.col("c_mktsegment"),
            F.date_trunc("month", F.col("o_orderdate")).alias("order_month"),
        )
        .agg(dsum("o_totalprice").alias("month_revenue"))
    )
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy("order_month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # running sum over already-exact month sums: decimal again for
    # order-independence of the partial sums
    return monthly.withColumn(
        "cum_revenue",
        F.sum(F.col("month_revenue").cast("decimal(18,2)")).over(w).cast("double"),
    )


_RUNNING_SQL = f"""
WITH monthly AS (
  SELECT c_mktsegment, date_trunc('month', o_orderdate) AS order_month,
         {dsum_sql('o_totalprice')} AS month_revenue
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE o_orderdate IS NOT NULL
  GROUP BY 1, 2
)
SELECT c_mktsegment, order_month, month_revenue,
       CAST(SUM(CAST(month_revenue AS DECIMAL(18,2)))
            OVER (PARTITION BY c_mktsegment ORDER BY order_month
                  ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_revenue
FROM monthly
"""


def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order timeline via offset window functions (§2.7):
    days since the previous order (``lag``), the next order date
    (``lead``), and an ``ntile(4)`` recency quartile — one shuffle on
    ``o_custkey``, an in-partition sort, no self-join (the naive
    formulation is an O(n²) self-join on adjacent rows).

    Determinism: the window orders by ``(o_orderdate, o_orderkey)`` —
    the unique tie-breaker makes lag/lead/ntile reproducible across
    engines even when a customer places two orders the same day, and
    NULLS FIRST is explicit in BOTH engines (r13 star-table sweep
    finding: Spark ASC defaults NULLS FIRST, DuckDB NULLS LAST, so an
    undated order silently moved across the ntile boundary). An undated
    order keeps its timeline row — its lag/datediff are NULL — pinned
    deterministically before the dated ones.
    Scale: per-customer partitions are tiny (TPC-H ~10 orders/customer),
    so the sort never spills; the single hash exchange on the partition
    key is the floor for any offset-window computation.
    """
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc_nulls_first(),
        F.col("o_orderkey").asc_nulls_first())
    od = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").alias("order_date"),
        F.datediff(od, F.lag(od).over(w)).alias("days_since_prev"),
        F.lead("o_orderdate").over(w).alias("next_order_date"),
        F.ntile(4).over(w).alias("order_quartile"),
    )


_LAG_LEAD_SQL = """
SELECT o_custkey, o_orderkey,
       o_orderdate AS order_date,
       CAST(date_diff('day',
                      lag(CAST(o_orderdate AS DATE)) OVER w,
                      CAST(o_orderdate AS DATE)) AS INT) AS days_since_prev,
       lead(o_orderdate) OVER w AS next_order_date,
       CAST(ntile(4) OVER w AS INT) AS order_quartile
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY o_orderdate ASC NULLS FIRST,
                      o_orderkey ASC NULLS FIRST)
"""


def q_window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window family (§2.7): rank / dense_rank / percent_rank /
    cume_dist over a TIES-bearing order (order date within priority — many
    orders share a date, so rank≠row_number and the tie semantics are
    actually exercised), plus ``ntile(4)`` over a tie-free total order
    (ntile distributes by row POSITION, so without a unique tie-breaker
    its output is nondeterministic — engines may order equal keys
    differently).

    Both window specs share one partitioning (``o_orderpriority``), so the
    plan is a single hash exchange with two in-partition sorts — the floor
    for a two-ordering ranking query at any scale. percent_rank and
    cume_dist are single IEEE divisions of exact integer counts:
    bit-identical across engines.
    """
    orders = table(spark, sf_dir, "orders")
    w_date = Window.partitionBy("o_orderpriority").orderBy("o_orderdate")
    w_price = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return orders.select(
        "o_orderpriority",
        "o_orderkey",
        F.rank().over(w_date).alias("date_rank"),
        F.dense_rank().over(w_date).alias("date_dense_rank"),
        F.percent_rank().over(w_date).alias("date_percent_rank"),
        F.cume_dist().over(w_date).alias("date_cume_dist"),
        F.ntile(4).over(w_price).alias("price_quartile"),
    )


_RANK_FAMILY_SQL = """
SELECT o_orderpriority, o_orderkey,
       CAST(rank() OVER wd AS INT) AS date_rank,
       CAST(dense_rank() OVER wd AS INT) AS date_dense_rank,
       percent_rank() OVER wd AS date_percent_rank,
       cume_dist() OVER wd AS date_cume_dist,
       CAST(ntile(4) OVER wp AS INT) AS price_quartile
FROM orders
WINDOW wd AS (PARTITION BY o_orderpriority ORDER BY o_orderdate),
       wp AS (PARTITION BY o_orderpriority
              ORDER BY o_totalprice DESC, o_orderkey ASC)
"""


_PIVOT_STATUSES = ("F", "O", "P")


def q_pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot(): order counts reshaped to one column per status.
    The value list is given explicitly — at scale an unlisted pivot forces
    an extra distinct-scan job just to discover the columns."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", list(_PIVOT_STATUSES))
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            *[F.coalesce(F.col(s), F.lit(0)).alias(f"n_{s}") for s in _PIVOT_STATUSES],
        )
    )


_PIVOT_SQL = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_F,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_O,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_P
FROM orders GROUP BY o_orderpriority
"""


def q_intersect_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers active in both 1996 and 2000 (completes the
    set-op family alongside union/anti/semi; SURVEY.md §2.7)."""
    orders = table(spark, sf_dir, "orders")
    y96 = orders.where(F.year("o_orderdate") == 1996).select("o_custkey")
    y00 = orders.where(F.year("o_orderdate") == 2000).select("o_custkey")
    return y96.intersect(y00)


_INTERSECT_SQL = """
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
INTERSECT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 2000
"""


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti: customers with no 1995 orders (engine-added; the reference
    has no semi/anti joins — SURVEY.md §2.5). The year filter makes the
    anti-set non-empty."""
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").where(F.year("o_orderdate") == 1995)
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


_ANTI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (
  SELECT o_custkey FROM orders
  WHERE o_custkey IS NOT NULL AND year(o_orderdate) = 1995
)
"""


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi: parts that appear in lineitem."""
    part = table(spark, sf_dir, "part")
    li = table(spark, sf_dir, "lineitem")
    return part.join(li, part.p_partkey == li.l_partkey, "left_semi").select(
        "p_partkey", "p_brand"
    )


_SEMI_SQL = """
SELECT p_partkey, p_brand FROM part
WHERE p_partkey IN (SELECT l_partkey FROM lineitem)
"""


def q_bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective fact join behind an explicit Bloom runtime filter
    (operators/bloom.py): urgent orders' keys are packed into an 8 KiB
    filter, broadcast, and lineitem rows that cannot join are dropped at
    the scan — before any shuffle moves them.

    The result is bit-identical to the unpruned join (Bloom filters have
    no false negatives; the inner join removes false positives), so the
    oracle is the plain join — correctness of the pruning IS the check.

    Scale: at test scale Catalyst would broadcast the filtered orders side
    anyway; the operator earns its keep when the build side's ROWS exceed
    the broadcast threshold but its KEY SET still fits m bits — e.g. 10⁹
    urgent orders are ~100 GB of rows but a ~1 GB exact key set and a
    ~1 KB-per-million-keys Bloom. The filter is sized m=64Ki/k=3 for the
    test corpus (~3 k keys → ~0.2% FP); size m ≈ 10·n_keys at scale.
    """
    orders = table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    lineitem = table(spark, sf_dir, "lineitem")
    bloom = bloom_build(orders.select("o_orderkey"), "o_orderkey")
    pruned = bloom_probe(lineitem, "l_orderkey", bloom)
    joined = pruned.join(orders, pruned.l_orderkey == orders.o_orderkey)
    return joined.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_extendedprice").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


_BLOOM_JOIN_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {dsum_sql('l_extendedprice')} AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# windowed event-time aggregate (A5, batch form; streaming form in streamq)
# --------------------------------------------------------------------------

def q_windowed_agg_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — the Druid 15-minute rollup cube, batch form
    (/root/reference/druid/kafkaIngestionTaxiTrips.json:42-87): tumbling
    event-time window × dimension, count + sums."""
    events = table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "15 minutes").alias("w"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


_WINDOWED_SQL = f"""
SELECT time_bucket(INTERVAL '15 minutes', ts) AS window_start,
       event_type, COUNT(*) AS n_events, {dsum_sql('value')} AS total_value
FROM events GROUP BY 1, 2
"""


def q_salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe aggregation on a genuinely hot key (l_returnflag: 3 values
    across all of lineitem) — salted two-phase, identical results to the
    direct groupBy (operators/skew.py)."""
    from tfm_taxitrips_spark.operators.skew import salted_agg

    li = table(spark, sf_dir, "lineitem")
    return salted_agg(
        li,
        keys=["l_returnflag"],
        sum_cols=[("l_quantity", "total_qty"), ("l_extendedprice", "revenue")],
        count_alias="n_rows",
    )


_SALTED_SQL = f"""
SELECT l_returnflag,
       {dsum_sql('l_quantity')} AS total_qty,
       {dsum_sql('l_extendedprice')} AS revenue,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY 1
"""


def q_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe JOIN on a genuinely hot key: every lineitem row joins its
    l_returnflag-level revenue total (3 distinct flags — a plain shuffle
    join funnels the whole fact through 3 reducers). ``salted_join``
    (operators/skew.py) spreads each flag over 16 reducers by salting the
    fact side and replicating the 3-row agg side ×16.

    The agg side carries a ``shuffle_hash`` hint: at test scale Catalyst
    would broadcast 3 rows and no skew would exist to fix — the hint makes
    the salted exchange the REAL plan (pinned in tests/test_plans.py), the
    shape this operator produces at 100 TB where the agg dim is millions of
    group keys (too big to broadcast) with a power-law key frequency.

    revenue_share = one IEEE division of a raw double by a dsum-exact
    double, bit-identical across engines and row orders.
    """
    li = table(spark, sf_dir, "lineitem")
    flag_totals = li.groupBy(F.col("l_returnflag").alias("rf")).agg(
        dsum("l_extendedprice").alias("flag_revenue")
    )
    joined = salted_join(
        li.select("l_orderkey", "l_linenumber", "l_returnflag",
                  "l_extendedprice"),
        flag_totals.hint("shuffle_hash"),
        "l_returnflag",
        "rf",
    )
    return joined.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        (F.col("l_extendedprice") / F.col("flag_revenue"))
        .alias("revenue_share"),
    )


_SALTED_JOIN_SQL = f"""
WITH ft AS (
  SELECT l_returnflag AS rf, {dsum_sql('l_extendedprice')} AS flag_revenue
  FROM lineitem GROUP BY 1
)
SELECT l_orderkey, l_linenumber, l_returnflag,
       l_extendedprice / flag_revenue AS revenue_share
FROM lineitem JOIN ft ON l_returnflag = rf
"""


_TAXI_FIXTURE = __file__.rsplit("/", 3)[0] + "/tests/fixtures/taxi_trips_dirty.csv"

_CSV_COLS = (
    "trip_id", "taxi_id", "trip_start_timestamp", "trip_end_timestamp",
    "trip_seconds", "trip_miles", "pickup_census_tract", "dropoff_census_tract",
    "pickup_community_area", "dropoff_community_area", "fare", "tips", "tolls",
    "extras", "trip_total", "payment_type", "company",
    "pickup_centroid_latitude", "pickup_centroid_longitude",
    "pickup_centroid_location", "dropoff_centroid_latitude",
    "dropoff_centroid_longitude", "dropoff_centroid_location",
)


def q_taxi_clean_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 + F2 + P3-P6 end-to-end on dirty CSV: the reference's front door
    (/root/reference/IngestHistoricTrips.py:66-97) — $-money with commas,
    12-hour AM/PM timestamps, empty tracts, malformed rows under
    DROPMALFORMED — through ``read_trips_csv`` → ``clean_trips``.

    Reads the checked-in fixture ``tests/fixtures/taxi_trips_dirty.csv``
    (regenerate with ``tests.taxi_fixtures.write_trips_csv(make_trips(400,
    seed=42), path, malformed=3)``); independent of ``sf_dir`` because the
    driver's star tables carry no dirty-CSV surface.
    """
    from tfm_taxitrips_spark.operators.cleaning import clean_trips
    from tfm_taxitrips_spark.sources.readers import read_trips_csv

    # same UTC pin as readers.table: the driver's vanilla session inherits
    # the host timezone; AM/PM parsing + year()/month() must stay aligned
    # with DuckDB's naive timestamps.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return clean_trips(read_trips_csv(spark, _TAXI_FIXTURE))


def _taxi_clean_sql() -> str:
    money = "try_cast(regexp_replace({c}, '[$,)]', '', 'g') AS DOUBLE) AS {c}"
    ts = "try_strptime({c}, '%m/%d/%Y %I:%M:%S %p') AS {c}"
    names = ", ".join(f"'{c}'" for c in _CSV_COLS)
    return f"""
WITH raw AS (
  SELECT * FROM read_csv('{_TAXI_FIXTURE}',
    header = true, all_varchar = true, names = [{names}])
),
typed AS (
  SELECT trip_id, taxi_id,
         {ts.format(c='trip_start_timestamp')},
         {ts.format(c='trip_end_timestamp')},
         try_cast(trip_seconds AS INTEGER) AS trip_seconds,
         try_cast(trip_miles AS DOUBLE) AS trip_miles,
         pickup_census_tract, dropoff_census_tract,
         try_cast(pickup_community_area AS INTEGER) AS pickup_community_area,
         try_cast(dropoff_community_area AS INTEGER) AS dropoff_community_area,
         {money.format(c='fare')}, {money.format(c='tips')},
         {money.format(c='tolls')}, {money.format(c='extras')},
         {money.format(c='trip_total')},
         payment_type, company,
         pickup_centroid_latitude, pickup_centroid_longitude,
         pickup_centroid_location, dropoff_centroid_latitude,
         dropoff_centroid_longitude, dropoff_centroid_location,
         -- raw copies for the DROPMALFORMED mirror below
         trip_start_timestamp AS _r_start, trip_end_timestamp AS _r_end,
         trip_seconds AS _r_secs, trip_miles AS _r_miles,
         pickup_community_area AS _r_pca, dropoff_community_area AS _r_dca
  FROM raw
)
SELECT trip_id, taxi_id, trip_start_timestamp, trip_end_timestamp,
       trip_seconds, trip_miles, pickup_census_tract, dropoff_census_tract,
       pickup_community_area, dropoff_community_area, fare, tips, tolls,
       extras, trip_total, payment_type, company,
       pickup_centroid_latitude, pickup_centroid_longitude,
       pickup_centroid_location, dropoff_centroid_latitude,
       dropoff_centroid_longitude, dropoff_centroid_location,
       CAST(year(trip_start_timestamp) AS INT) AS year,
       CAST(month(trip_start_timestamp) AS INT) AS month
FROM typed
WHERE (_r_start IS NULL OR trip_start_timestamp IS NOT NULL)
  AND (_r_end   IS NULL OR trip_end_timestamp   IS NOT NULL)
  AND (_r_secs  IS NULL OR trip_seconds  IS NOT NULL)
  AND (_r_miles IS NULL OR trip_miles    IS NOT NULL)
  AND (_r_pca   IS NULL OR pickup_community_area  IS NOT NULL)
  AND (_r_dca   IS NULL OR dropoff_community_area IS NOT NULL)
"""


_TAXI_CLEAN_SQL = _taxi_clean_sql()


QUERIES: dict[str, QuerySpec] = {
    "taxi_clean_csv": QuerySpec(q_taxi_clean_csv, _TAXI_CLEAN_SQL,
                                tags=("S1", "F2", "P3", "P4", "P5", "P6")),
    "flagship_view": QuerySpec(q_flagship_view, _FLAGSHIP_SQL, bench=True,
                               tags=("A3", "J1", "A1", "P5")),
    "salted_skew_agg": QuerySpec(q_salted_skew_agg, _SALTED_SQL, tags=("A3", "skew")),
    "salted_skew_join": QuerySpec(q_salted_skew_join, _SALTED_JOIN_SQL,
                                  tags=("join", "skew")),
    "rollup_family": QuerySpec(q_rollup_family, _ROLLUP_FAMILY_SQL, bench=True,
                               tags=("A3", "A4")),
    "left_join_enrich": QuerySpec(q_left_join_enrich, _LEFT_JOIN_SQL, tags=("J1",)),
    "inner_join_enrich": QuerySpec(q_inner_join_enrich, _INNER_JOIN_SQL, tags=("J2",)),
    "currency_normalize": QuerySpec(q_currency_normalize, _CURRENCY_SQL, tags=("P4",)),
    "date_parts": QuerySpec(q_date_parts, _DATE_PARTS_SQL, tags=("P6",)),
    "date_trunc_day": QuerySpec(q_date_trunc_day, _DATE_TRUNC_SQL, bench=True, tags=("P5",)),
    "cast_project": QuerySpec(q_cast_project, _CAST_SQL, tags=("P3",)),
    "json_extract": QuerySpec(q_json_extract, _JSON_EXTRACT_SQL, tags=("S6",)),
    "to_json_struct": QuerySpec(q_to_json_struct, _TO_JSON_SQL, tags=("P7", "K3")),
    "null_predicates": QuerySpec(q_null_predicates, _NULL_PRED_SQL, tags=("F1",)),
    "partition_filter": QuerySpec(q_partition_filter, _PARTITION_FILTER_SQL, tags=("F3", "S4")),
    "dedup_distinct_pairs": QuerySpec(q_dedup_distinct_pairs, _DEDUP_PAIRS_SQL, tags=("A2",)),
    "dedup_count": QuerySpec(q_dedup_count, _DEDUP_COUNT_SQL, tags=("A1",)),
    "topk_global": QuerySpec(q_topk_global, _TOPK_GLOBAL_SQL, tags=("topk",)),
    "topk_by_group": QuerySpec(q_topk_by_group, _TOPK_GROUP_SQL, tags=("topk",)),
    "top_segments_by_revenue": QuerySpec(q_top_segments_by_revenue, _TOP_SEGMENTS_SQL,
                                         bench=True, tags=("topk", "A3")),
    "union_distinct": QuerySpec(q_union_distinct, _UNION_SQL, tags=("setop",)),
    "intersect_custkeys": QuerySpec(q_intersect_custkeys, _INTERSECT_SQL,
                                    tags=("setop",)),
    "cube_orders": QuerySpec(q_cube_orders, _CUBE_SQL, tags=("A4", "cube")),
    "pivot_status_by_priority": QuerySpec(q_pivot_status_by_priority, _PIVOT_SQL,
                                          tags=("pivot",)),
    "running_revenue": QuerySpec(q_running_revenue, _RUNNING_SQL,
                                 tags=("window", "frame")),
    "window_lag_lead": QuerySpec(q_window_lag_lead, _LAG_LEAD_SQL,
                                 tags=("window", "offset")),
    "window_rank_family": QuerySpec(q_window_rank_family, _RANK_FAMILY_SQL,
                                    tags=("window", "rank")),
    "anti_join": QuerySpec(q_anti_join, _ANTI_SQL, tags=("join",)),
    "semi_join": QuerySpec(q_semi_join, _SEMI_SQL, tags=("join",)),
    "bloom_pruned_join": QuerySpec(q_bloom_pruned_join, _BLOOM_JOIN_SQL,
                                   tags=("join", "bloom", "runtime-filter")),
    "windowed_agg_batch": QuerySpec(q_windowed_agg_batch, _WINDOWED_SQL, bench=True,
                                    tags=("A5",)),
}
