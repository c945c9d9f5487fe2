"""Bucketed (pre-shuffled) tables for shuffle-free co-located joins.

At 100 TB the dominant cost of a fact-fact join (e.g. lineitem ⨝ orders, or
trips ⨝ trips self-joins for dedup audits) is the shuffle of both sides on
the join key — O(data) network every query. Bucketing pays that shuffle ONCE
at write time: ``bucketBy(n, key)`` hash-partitions rows into ``n`` files
per partition, and Spark's scan reports the hash distribution to Catalyst
(``HashPartitioning`` in outputPartitioning), so an equi-join of two tables
bucketed by the same key into the same bucket count plans with **no
Exchange on either side**. ``sortBy`` additionally pre-sorts within buckets,
dropping the Sort from sort-merge join.

The reference has no fact-fact join (its only joins are broadcast-sized
dimensions, /root/reference/TransformTaxiTrips.py:93-94), but its at-rest
layout choice (year/month partitioned parquet chosen to fix query
performance — thesis "Problemas/Soluciones" slide) is the same idea one
level up; bucketing is the within-partition extension of it.

Bucket-count sizing at scale: target ~128-256 MB per bucket file per
partition; for a 100 TB fact, thousands of buckets. The count must match on
both sides of a join (or divide evenly, which Spark 3+ can exploit via
bucket coalescing).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    keys: Sequence[str],
    buckets: int,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally bucket-sorted) table.

    ``path`` makes it an external table (data outside the warehouse dir);
    catalog metadata records the bucket spec either way.
    """
    writer = df.write.format("parquet").mode("overwrite").bucketBy(buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(name)


def bucketed_join(
    spark: SparkSession,
    left_name: str,
    right_name: str,
    on: Sequence[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables; Catalyst elides both shuffles."""
    return spark.table(left_name).join(spark.table(right_name), on, how)
