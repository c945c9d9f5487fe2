"""Streaming top-k serving view (SURVEY.md §2.7 streaming form).

The reference serves "top segments" as Superset ``ORDER BY ... LIMIT``
queries over the Druid rollup (/root/reference/README.md:10-11); the
engine owns that serving layer natively:

stream → watermarked windowed rollup (update mode) → ``foreachBatch``
upsert into a parquet serving table → batch ``ORDER BY ... LIMIT`` view.

Scale design: update mode emits only the (window, event_type) rows CHANGED
in each micro-batch (bounded by the watermark), and the upsert uses dynamic
partition overwrite on exactly that aggregation key — each refresh rewrites
only the touched (window_id, event_type) partitions, never the whole
history. The overwrite unit MUST equal the aggregation key: partitioning by
window_id alone would let a batch that updates one event type of a window
silently delete the window's other event types' previously-upserted rows
(exposed by the cross-type replay in tests/test_streaming_semantics.py).
The serving read is a global top-k, which Spark plans as
TakeOrderedAndProject (no global sort, no full shuffle — pinned by
tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: leading partition column of the serving table (epoch seconds of window
#: start — timestamps make hostile directory names on some filesystems)
WINDOW_ID = "window_id"

#: full partition spec == the rollup's aggregation key, so the dynamic
#: overwrite unit matches what update mode emits
PARTITION_COLS = (WINDOW_ID, "event_type")


def upsert_to_serving(serving_path: str):
    """``foreachBatch`` body: upsert one micro-batch of updated rollup rows
    into the serving table, overwriting ONLY the (window, event_type)
    partitions present in the batch (dynamic partition overwrite)."""

    def refresh(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn(
                WINDOW_ID, F.unix_timestamp("window_start").cast("long")
            )
            # one file per touched aggregation key, not per task
            .repartition(*PARTITION_COLS)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*PARTITION_COLS)
            .parquet(serving_path)
        )

    return refresh


def run_topk_serving(
    rolled: DataFrame,
    serving_path: str,
    checkpoint: str,
    state_partitions: int | None = None,
) -> None:
    """Drain a watermarked windowed rollup (availableNow) through the
    update-mode upsert into ``serving_path``. Production would ``start()``
    without awaiting; the finite-replay form is what the oracle checks.

    ``state_partitions`` sizes the rollup's state store like
    ``pipeline.run_to_memory`` does (set before ``start()``, restored
    after; fresh checkpoint per call): the rollup state is windows × dims
    — time-linear, aggregate-sized — so inheriting a fact-scan shuffle
    default pays per-partition state commits for nothing."""
    spark = rolled.sparkSession
    prev = None
    if state_partitions is not None:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            rolled.writeStream.outputMode("update")
            .foreachBatch(upsert_to_serving(serving_path))
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)


def topk_view(
    spark: SparkSession, serving_path: str, k: int, order_cols: list | None = None
) -> DataFrame:
    """The serving query: top-k windows by metric with a total tie-break
    key (deterministic under the driver's order-insensitive compare)."""
    order = order_cols or [
        F.col("total_value").desc(),
        F.col("window_start").asc(),
        F.col("event_type").asc(),
    ]
    df = spark.read.parquet(serving_path).drop(WINDOW_ID)
    return df.orderBy(*order).limit(k)
