"""SQL front-end suite: classic TPC-H-style analytics written ONCE in a
shared ANSI dialect and executed verbatim by BOTH engines — ``spark.sql``
over registered temp views and the DuckDB oracle. Exercises the engine's
second public API (SQL text; SURVEY.md §3 'engine consequence') and the
optimizer paths the DataFrame registry can't reach (SQL join reordering,
correlated filters).

Determinism: revenue terms are computed in DECIMAL (exact multiply + exact
sum, cast back to double once), dates compared as literals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tfm_taxitrips_spark.queries.registry import QuerySpec
from tfm_taxitrips_spark.schemas import STAR_TABLES
from tfm_taxitrips_spark.sources.readers import table


#: per-session record of which sf_dir each star view currently points at.
#: ``createOrReplaceTempView`` costs ~100 ms of driver-side analysis per
#: guarded table (measured r18), and the registry's SQL queries
#: re-registered all 10 views on every construction — ~1 s of pure
#: overhead per query, more than the execution time of half the SQL
#: suite. Registration is idempotent for a fixed (session, sf_dir), so
#: it is skipped unless the target directory changed. Only this module
#: registers these view names, so the record cannot go stale.
_VIEWS_REGISTERED: "weakref.WeakKeyDictionary[SparkSession, dict]" = None  # type: ignore[assignment]


def register_star_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = STAR_TABLES
) -> None:
    """Expose the star schema to spark.sql as temp views (idempotent per
    (session, sf_dir); ``names`` restricts to the tables a query reads)."""
    global _VIEWS_REGISTERED
    if _VIEWS_REGISTERED is None:
        import weakref

        _VIEWS_REGISTERED = weakref.WeakKeyDictionary()
    registered = _VIEWS_REGISTERED.setdefault(spark, {})
    for name in names:
        if registered.get(name) != sf_dir:
            table(spark, sf_dir, name).createOrReplaceTempView(name)
            registered[name] = sf_dir


def _referenced_tables(sql: str) -> tuple[str, ...]:
    """The star tables a SQL text actually reads (word-boundary match —
    table names never appear as substrings of other identifiers in this
    suite). Registering only these cuts per-query setup from 10 view
    builds to the 1-6 the query needs."""
    import re

    return tuple(
        t for t in STAR_TABLES if re.search(rf"\b{t}\b", sql) is not None
    )


def _sql_query(sql: str):
    needed = _referenced_tables(sql)

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_star_views(spark, sf_dir, needed)
        return spark.sql(sql)

    return run


#: exact decimal revenue term, identical semantics in Spark SQL and DuckDB
_REV = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
)

# TPC-H Q1 (pricing summary) — shared dialect, decimal-routed aggregates
SQL_Q1 = f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM({_REV}) AS DOUBLE) AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

# TPC-H Q3 (shipping priority) — join reordering + top-k
SQL_Q3 = f"""
SELECT l_orderkey,
       CAST(SUM({_REV}) AS DOUBLE) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""

# TPC-H Q5 (local supplier volume) — 5-way join through both role dims
SQL_Q5 = f"""
SELECT n_name,
       CAST(SUM({_REV}) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""

# TPC-H Q10-style (returned items by customer) — top-k on a 4-way join
SQL_Q10 = f"""
SELECT c_custkey, c_name, n_name,
       CAST(SUM({_REV}) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# TPC-H Q4 (order priority) — correlated EXISTS → left-semi join
SQL_Q4 = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""

# TPC-H Q6 (forecast revenue) — pure scan+filter+agg; the pushdown showcase
SQL_Q6 = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
              * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""

# TPC-H Q14 (promo revenue share) — conditional aggregation; exact decimal
# sums, one final double division
SQL_Q14 = f"""
SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV}
                             ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM({_REV}) AS DOUBLE) AS promo_revenue_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
"""

# TPC-H Q15 (top supplier) — CTE reused twice + scalar MAX subquery;
# decimal revenue keeps the MAX-equality comparison exact
SQL_Q15 = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, SUM({_REV}) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""

# TPC-H Q18 (large-volume orders) — IN-subquery with HAVING
SQL_Q18 = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey
                     HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 20
"""

# TPC-H Q19 (discounted revenue) — disjunction of conjunctive ranges; tests
# OR-predicate pushdown through a join
SQL_Q19 = f"""
SELECT CAST(SUM({_REV}) AS DOUBLE) AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
"""

# TPC-H Q22-style (idle high-balance customers) — scalar AVG subquery
# (exact decimal sum / count → identical double in both engines) + NOT
# EXISTS anti-join. Adapted: the testdata gives every customer at least one
# order, so "idle" means no order since 2000-01-01.
SQL_Q22 = """
SELECT c_mktsegment, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                          / COUNT(*)
                   FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_mktsegment
"""


# TPC-H Q7 (volume between two trading nations) — 6-way join with a
# disjunctive cross-nation predicate + year extraction
SQL_Q7 = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       CAST(SUM({_REV}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
"""

# TPC-H Q8 (market share) — conditional-sum ratio per year; exact decimal
# sums, one double division per group
SQL_Q8 = f"""
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(SUM(CASE WHEN n1.n_name = 'NATION_3' THEN {_REV}
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
     / CAST(SUM({_REV}) AS DOUBLE) AS mkt_share
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region ON n2.n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY year(o_orderdate)
"""

# TPC-H Q11-style (high-revenue parts) — HAVING against a scalar subquery
# over the whole fact (global-total fraction)
SQL_Q11 = f"""
SELECT l_partkey, CAST(rev AS DOUBLE) AS revenue
FROM (SELECT l_partkey, SUM({_REV}) AS rev FROM lineitem GROUP BY l_partkey)
WHERE rev > (SELECT SUM({_REV}) * 0.0005 FROM lineitem)
"""

# TPC-H Q13 (customer order-count distribution) — left join with an ON-side
# filter, then a distribution over the per-customer counts
SQL_Q13 = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""

# TPC-H Q17 (small-quantity revenue) — correlated scalar AVG subquery per
# part. l_quantity values are integral doubles, so the AVG is an exact
# sum/count and the comparison is engine-stable.
SQL_Q17 = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
         AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = p_partkey)
"""

# TPC-H Q21-style (sole returning supplier in shared orders) — EXISTS +
# NOT EXISTS over the same fact (semi- and anti-join against lineitem)
SQL_Q21 = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 10
"""


# TPC-H Q2-style (min-cost supplier) — correlated scalar MIN subquery;
# doubles compare exactly (same stored values both engines)
SQL_Q2 = """
SELECT DISTINCT p_partkey, s_suppkey, s_name,
       l_extendedprice AS min_price
FROM part
JOIN lineitem ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
WHERE p_size = 15
  AND l_extendedprice = (SELECT MIN(l2.l_extendedprice) FROM lineitem l2
                         WHERE l2.l_partkey = p_partkey)
"""

# TPC-H Q9-style (net revenue by supplier nation × year) — LIKE filter +
# triple decimal product. Precisions chosen so the product (29,6) stays
# inside DECIMAL(38) in both engines — no precision-loss rounding.
# DECIMAL(19,2) for the price rather than TPC-H's schema-native 12,2:
# the r13 extreme-value probe showed a legal ~10^13 price crashes an
# ANSI 12,2 cast, and 18,2 still overflows DuckDB's INT64-backed
# multiply — 19+ forces the INT128 path there while Spark's triple
# product stays a lossless (29,6). Ingest robustness beats schema
# minimalism (same magnitude contract as dsum).
_NETREV = (
    "CAST(l_extendedprice AS DECIMAL(19,2))"
    " * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"
    " * (CAST(1 AS DECIMAL(4,2)) - CAST(l_tax AS DECIMAL(4,2)))"
)
SQL_Q9 = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(SUM({_NETREV}) AS DOUBLE) AS net_revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%a%'
GROUP BY n_name, year(o_orderdate)
"""

# TPC-H Q12-style (priority quality by return flag) — conditional integer
# counts over a join
SQL_Q12 = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= o_orderdate
GROUP BY l_returnflag
"""

# TPC-H Q16-style (supplier diversity per part class) — NOT IN subquery +
# COUNT(DISTINCT) over 3 group keys
SQL_Q16 = """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM part
JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 5, 10, 15, 20)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""

# TPC-H Q20-style (heavy promo suppliers) — nested IN subqueries
# (semi-join into aggregated semi-join)
SQL_Q20 = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
  GROUP BY l_suppkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 500
)
"""


QUERIES: dict[str, QuerySpec] = {
    "sql_q1_pricing_summary": QuerySpec(_sql_query(SQL_Q1), SQL_Q1, bench=True,
                                        tags=("sql", "A3")),
    "sql_q4_order_priority": QuerySpec(_sql_query(SQL_Q4), SQL_Q4,
                                       tags=("sql", "semi_join")),
    "sql_q6_forecast_revenue": QuerySpec(_sql_query(SQL_Q6), SQL_Q6, bench=True,
                                         tags=("sql", "pushdown")),
    "sql_q14_promo_share": QuerySpec(_sql_query(SQL_Q14), SQL_Q14,
                                     tags=("sql", "conditional_agg")),
    "sql_q15_top_supplier": QuerySpec(_sql_query(SQL_Q15), SQL_Q15,
                                      tags=("sql", "cte", "scalar_subquery")),
    "sql_q18_large_volume": QuerySpec(_sql_query(SQL_Q18), SQL_Q18,
                                      tags=("sql", "in_subquery", "topk")),
    "sql_q19_disjunctive": QuerySpec(_sql_query(SQL_Q19), SQL_Q19,
                                     tags=("sql", "pushdown")),
    "sql_q22_idle_customers": QuerySpec(_sql_query(SQL_Q22), SQL_Q22,
                                        tags=("sql", "anti_join",
                                              "scalar_subquery")),
    "sql_q3_shipping_priority": QuerySpec(_sql_query(SQL_Q3), SQL_Q3, bench=True,
                                          tags=("sql", "topk")),
    "sql_q5_local_supplier": QuerySpec(_sql_query(SQL_Q5), SQL_Q5, bench=True,
                                       tags=("sql", "J1")),
    "sql_q10_returned_items": QuerySpec(_sql_query(SQL_Q10), SQL_Q10,
                                        tags=("sql", "topk")),
    "sql_q7_nation_volume": QuerySpec(_sql_query(SQL_Q7), SQL_Q7, tags=("sql",)),
    "sql_q8_market_share": QuerySpec(_sql_query(SQL_Q8), SQL_Q8,
                                     tags=("sql", "conditional_agg")),
    "sql_q11_important_parts": QuerySpec(_sql_query(SQL_Q11), SQL_Q11,
                                         tags=("sql", "scalar_subquery")),
    "sql_q13_order_distribution": QuerySpec(_sql_query(SQL_Q13), SQL_Q13,
                                            tags=("sql", "left_join")),
    "sql_q17_small_quantity": QuerySpec(_sql_query(SQL_Q17), SQL_Q17,
                                        tags=("sql", "correlated_subquery")),
    "sql_q21_sole_returner": QuerySpec(_sql_query(SQL_Q21), SQL_Q21,
                                       tags=("sql", "anti_join", "semi_join")),
    "sql_q2_min_cost_supplier": QuerySpec(_sql_query(SQL_Q2), SQL_Q2,
                                          tags=("sql", "correlated_subquery")),
    "sql_q9_nation_profit": QuerySpec(_sql_query(SQL_Q9), SQL_Q9, tags=("sql",)),
    "sql_q12_priority_quality": QuerySpec(_sql_query(SQL_Q12), SQL_Q12,
                                          tags=("sql", "conditional_agg")),
    "sql_q16_supplier_diversity": QuerySpec(_sql_query(SQL_Q16), SQL_Q16,
                                            tags=("sql", "not_in")),
    "sql_q20_promo_suppliers": QuerySpec(_sql_query(SQL_Q20), SQL_Q20,
                                         tags=("sql", "semi_join")),
}
