"""Training-data pipeline operators beyond the per-doc stages: near-dup
clustering with canonical-survivor selection, stratified corpus sampling,
per-group quantile outlier trimming, and incremental merge (SCD-1 upsert).

These extend the reference's surface per BASELINE.json's north star (the
reference's own dedup is whole-row ``.distinct()``,
/root/reference/TransformTaxiTrips.py:42; its views are full overwrites,
/root/reference/TransformTaxiTrips.py:115-119 — no incremental path).
Each query is deterministic (md5-derived hashing, no rand()) and paired
with a bit-exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tfm_taxitrips_spark.functions.aggregates import dsum, dsum_sql
from tfm_taxitrips_spark.functions.text import hash60, hash60_sql
from tfm_taxitrips_spark.operators.clustering import connected_components
from tfm_taxitrips_spark.queries.registry import QuerySpec
from tfm_taxitrips_spark.queries.text import (
    _MINHASH_LSH_SQL,
    q_minhash_lsh_candidates,
)
from tfm_taxitrips_spark.sources.readers import table


# --------------------------------------------------------------------------
# near-dup clustering: LSH pairs → connected components → canonical doc
# --------------------------------------------------------------------------

def q_dedup_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs → transitive closure → one surviving
    (minimum-id) document per near-dup cluster.

    The iterative Spark side (min-label propagation,
    :mod:`tfm_taxitrips_spark.operators.clustering`) must agree exactly
    with the oracle's recursive-CTE reachability — both compute
    ``cluster_id = min(id reachable from doc)``.
    """
    pairs = q_minhash_lsh_candidates(spark, sf_dir)
    comp = connected_components(pairs, src="doc_a", dst="doc_b")
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("comp").alias("cluster_id"),
        (F.col("node") == F.col("comp")).cast("int").alias("keep"),
    )


_DEDUP_CLUSTER_SQL = f"""
WITH RECURSIVE pairs AS ({_MINHASH_LSH_SQL}),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION
  SELECT doc_b AS u, doc_a AS v FROM pairs
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u AND e.v <> r.u
)
SELECT u AS doc_id,
       LEAST(u, MIN(v)) AS cluster_id,
       CAST(u = LEAST(u, MIN(v)) AS INT) AS keep
FROM reach
GROUP BY u
"""


# --------------------------------------------------------------------------
# stratified sampling: per-language quota rates, deterministic membership
# --------------------------------------------------------------------------

#: per-language sampling rate in percent; languages outside the map get the
#: default. Deterministic hash-threshold membership means re-running on a
#: grown corpus keeps every previously-sampled doc sampled (incremental
#: corpus re-mixes don't churn).
_STRAT_RATES = {"en": 25, "es": 50, "fr": 50, "de": 100, "zh": 75}
_STRAT_DEFAULT = 10


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum (language) quota sampling over ``documents``: each doc
    draws a stable 0-99 bucket from md5(doc_id) and is sampled iff the
    bucket is under its language's rate. One narrow scan + one agg shuffle;
    the membership decision never leaves the map side."""
    docs = table(spark, sf_dir, "documents")
    bucket = F.pmod(
        hash60(F.concat(F.lit("strat:"), F.col("doc_id").cast("string"))), F.lit(100)
    )
    rate_map = F.create_map(
        *[F.lit(x) for kv in _STRAT_RATES.items() for x in kv]
    )
    rate = F.coalesce(
        F.element_at(rate_map, F.col("lang")), F.lit(_STRAT_DEFAULT)
    )
    sampled = (bucket < rate).cast("int")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(sampled).cast("bigint").alias("n_sampled"),
        F.max(rate).alias("rate_pct"),
    )


_STRAT_RATE_CASE = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in _STRAT_RATES.items())
    + f" ELSE {_STRAT_DEFAULT} END"
)

_STRAT_SAMPLE_SQL = f"""
SELECT lang,
       COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN {hash60_sql("concat('strat:', CAST(doc_id AS VARCHAR))")} % 100
                     < {_STRAT_RATE_CASE} THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       MAX({_STRAT_RATE_CASE}) AS rate_pct
FROM documents
GROUP BY lang
"""


# --------------------------------------------------------------------------
# per-group quantile trim: drop tail outliers before aggregation
# --------------------------------------------------------------------------

def q_quantile_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep each return-flag group's P5-P95 price band, then aggregate —
    the quality-filter shape used to trim length/score outliers from a
    training corpus.

    ``percent_rank`` ties-safely reproduces DuckDB's PERCENT_RANK (equal
    values share a rank), so the 0.05/0.95 boundary is engine-independent.
    Scale note: one window sort per group partition. At 100 TB the exact
    window is replaced by a two-pass plan — ``approx_percentile`` per group
    (map-side sketch, one tiny agg), broadcast the thresholds back, filter —
    trading exactness of the cut point for zero global sorts; the exact
    variant stays the correctness oracle.
    """
    li = table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    pr = F.percent_rank().over(w)
    trimmed = li.withColumn("pr", pr).where(
        (F.col("pr") >= 0.05) & (F.col("pr") <= 0.95)
    )
    return trimmed.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_kept"),
        dsum("l_extendedprice").alias("kept_revenue"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


_QUANTILE_TRIM_SQL = f"""
WITH r AS (
  SELECT l_returnflag, l_extendedprice,
         PERCENT_RANK() OVER (PARTITION BY l_returnflag
                              ORDER BY l_extendedprice) AS pr
  FROM lineitem
)
SELECT l_returnflag,
       COUNT(*) AS n_kept,
       {dsum_sql('l_extendedprice')} AS kept_revenue,
       MIN(l_extendedprice) AS min_price,
       MAX(l_extendedprice) AS max_price
FROM r
WHERE pr >= 0.05 AND pr <= 0.95
GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# incremental merge: SCD-1 upsert of a change batch onto a base table
# --------------------------------------------------------------------------

def q_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-style upsert: a deterministic 10% change batch (status → 'U')
    is applied onto ``orders`` as anti-join(base, keys) ∪ changes, then the
    merged table is aggregated per status.

    This is the incremental path the reference lacks (it overwrites whole
    per-year views, /root/reference/TransformTaxiTrips.py:115-119). Scale
    note: the anti join broadcasts the change-batch *keys* (a change batch
    is small relative to base), so the base table is never shuffled; with a
    bucketed base table the merge is shuffle-free entirely.
    """
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    base = table(spark, sf_dir, "orders").select(*cols)
    is_chg = (
        F.pmod(hash60(F.concat(F.lit("chg:"), F.col("o_orderkey").cast("string"))), F.lit(10))
        == 0
    )
    changes = base.where(is_chg).withColumn("o_orderstatus", F.lit("U"))
    merged = base.join(
        F.broadcast(changes.select("o_orderkey")), "o_orderkey", "left_anti"
    ).unionByName(changes)
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("total_price"),
    )


_CHG_HASH = hash60_sql("concat('chg:', CAST(o_orderkey AS VARCHAR))")
_CHG_PRED = f"{_CHG_HASH} % 10 = 0"

_INCR_MERGE_SQL = f"""
WITH changes AS (
  SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice
  FROM orders WHERE {_CHG_PRED}
),
merged AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
  WHERE NOT EXISTS (SELECT 1 FROM changes c WHERE c.o_orderkey = orders.o_orderkey)
  UNION ALL
  SELECT * FROM changes
)
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       {dsum_sql('o_totalprice')} AS total_price
FROM merged
GROUP BY o_orderstatus
"""


QUERIES: dict[str, QuerySpec] = {
    "dedup_cluster_canonical": QuerySpec(
        q_dedup_cluster_canonical, _DEDUP_CLUSTER_SQL,
        tags=("dedup", "clustering", "pipeline"),
    ),
    "stratified_sample": QuerySpec(
        q_stratified_sample, _STRAT_SAMPLE_SQL, tags=("sample", "pipeline"),
    ),
    "quantile_trim_outliers": QuerySpec(
        q_quantile_trim, _QUANTILE_TRIM_SQL, tags=("quality", "window"),
    ),
    "incremental_merge": QuerySpec(
        q_incremental_merge, _INCR_MERGE_SQL, tags=("merge", "pipeline"),
    ),
}
