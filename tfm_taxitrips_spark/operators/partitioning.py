"""Input-parallelism guard for compute-heavy map stages.

A scan's task count comes from its file splits
(``spark.sql.files.maxPartitionBytes``). That is the right sizing when the
bottleneck is I/O, but a CPU-heavy derivation (shingling, hashing, n-gram
explode — each input row fans out to hundreds) on a *small-file* input then
runs on a handful of tasks while the cluster idles. ``fan_out`` repartitions
only in that case: when the scan yields fewer partitions than the session's
parallelism. On a 100 TB input the split count already exceeds any cluster's
core count, so this is a no-op there — no gratuitous full-table shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` up to the session's parallelism iff it is narrower.

    The check reads the planned partition count (no job is triggered).
    """
    spark = df.sparkSession
    if min_partitions is None:
        min_partitions = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min_partitions:
        return df.repartition(min_partitions)
    return df
