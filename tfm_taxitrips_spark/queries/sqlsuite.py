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


def register_star_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose the star schema to spark.sql as temp views."""
    for name in STAR_TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)


def _sql_query(sql: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_star_views(spark, sf_dir)
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


QUERIES: dict[str, QuerySpec] = {
    "sql_q1_pricing_summary": QuerySpec(_sql_query(SQL_Q1), SQL_Q1, bench=True,
                                        tags=("sql", "A3")),
    "sql_q3_shipping_priority": QuerySpec(_sql_query(SQL_Q3), SQL_Q3, bench=True,
                                          tags=("sql", "topk")),
    "sql_q5_local_supplier": QuerySpec(_sql_query(SQL_Q5), SQL_Q5, bench=True,
                                       tags=("sql", "J1")),
    "sql_q10_returned_items": QuerySpec(_sql_query(SQL_Q10), SQL_Q10,
                                        tags=("sql", "topk")),
}
