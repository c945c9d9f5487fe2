"""Top-k helpers (SURVEY.md §2.7).

The reference leaves ORDER BY ... LIMIT to the serving layer (Superset);
these are the first-class equivalents. ``top_k_by_group`` uses a rank
window — Spark plans a single shuffle on the partition keys with in-partition
sort; with AQE skew handling a hot group is split. ``top_k_global`` uses
``orderBy().limit(k)`` which Spark executes as per-partition TopK + a
single-reducer merge of k-row heaps (TakeOrderedAndProject) — no global sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_global(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    return df.orderBy(*order_by).limit(k)


def top_k_by_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rnk",
    keep_rank: bool = True,
) -> DataFrame:
    """row_number ≤ k per group; pass fully-deterministic ``order_by``
    (include a tie-breaker key) or results are run-dependent."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    out = df.withColumn(rank_col, F.row_number().over(w)).where(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)
