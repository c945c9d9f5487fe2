"""Streaming top-k serving view (SURVEY.md §2.7 streaming form).

The reference serves "top segments" as Superset ``ORDER BY ... LIMIT``
queries over the Druid rollup (/root/reference/README.md:10-11); the
engine owns that serving layer natively:

stream → watermarked windowed rollup (update mode) → ``foreachBatch``
upsert into a parquet serving table → batch ``ORDER BY ... LIMIT`` view.

Scale design: update mode emits only the window rows CHANGED in each
micro-batch (bounded by the watermark), and the upsert uses dynamic
partition overwrite on the window id — each refresh rewrites only the
touched window partitions, never the whole history. The serving read is a
global top-k, which Spark plans as TakeOrderedAndProject (no global sort,
no full shuffle — pinned by tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: partition column of the serving table (epoch seconds of window start —
#: timestamps make hostile directory names on some filesystems)
WINDOW_ID = "window_id"


def upsert_to_serving(serving_path: str):
    """``foreachBatch`` body: upsert one micro-batch of updated window rows
    into the serving table, overwriting ONLY the window partitions present
    in the batch (dynamic partition overwrite)."""

    def refresh(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn(
                WINDOW_ID, F.unix_timestamp("window_start").cast("long")
            )
            .repartition(WINDOW_ID)  # one file per touched window, not per task
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(WINDOW_ID)
            .parquet(serving_path)
        )

    return refresh


def run_topk_serving(
    rolled: DataFrame, serving_path: str, checkpoint: str
) -> None:
    """Drain a watermarked windowed rollup (availableNow) through the
    update-mode upsert into ``serving_path``. Production would ``start()``
    without awaiting; the finite-replay form is what the oracle checks."""
    q = (
        rolled.writeStream.outputMode("update")
        .foreachBatch(upsert_to_serving(serving_path))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


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
