"""Aggregate view builders (SURVEY.md §2.6 A3-A4, §4 'partial aggregation').

The reference materializes four per-year views by aggregating twice: a
6-key groupBy (A3, /root/reference/TransformTaxiTrips.py:98-113) and then a
re-aggregation of that *result* dropping the company key (A4, :123-136).
Two problems at scale:

1. The re-aggregation's ``countDistinct("taxis")`` counts distinct
   per-company taxi-*counts*, not distinct taxis — a semantic bug (the data
   model doc claims "número de taxis activos"). **Decision: we compute the
   true distinct from the base table** and document the divergence here.
2. The base subtree is recomputed per view (no cache). We compute the whole
   family in ONE pass with ``rollup`` + ``grouping_id`` — one shuffle, both
   levels, exact distinct counts at each level.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tfm_taxitrips_spark.functions.aggregates import dsum


def agg_view(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[tuple[str, str]],
    count_col: tuple[str, str],
    distinct_col: tuple[str, str],
) -> DataFrame:
    """A3 — multi-key hash aggregate: SUMs + COUNT + COUNT(DISTINCT).

    ``sum_cols``/``count_col``/``distinct_col`` are (source, alias) pairs so
    output names line up with the oracle (driver hashing is name-sensitive).
    """
    aggs = [dsum(src).alias(alias) for src, alias in sum_cols]
    aggs.append(F.count(F.col(count_col[0])).alias(count_col[1]))
    aggs.append(F.countDistinct(F.col(distinct_col[0])).alias(distinct_col[1]))
    return df.groupBy(*keys).agg(*aggs)


def rollup_views(
    df: DataFrame,
    rollup_key: str,
    keys: Sequence[str],
    sum_cols: Sequence[tuple[str, str]],
    count_col: tuple[str, str],
    distinct_col: tuple[str, str],
) -> DataFrame:
    """A3+A4 in one pass: EXACTLY the two grouping sets the reference
    materializes (with and without ``rollup_key``), tagged by
    ``grouping_id`` — ``lvl=0`` is the detailed view, ``lvl=1`` the
    re-aggregated one with *true* distinct counts.

    ``groupingSets`` (not ``rollup``+filter): a full rollup over k keys
    Expands every input row k+1×, then the filter throws all but two
    levels away post-shuffle — with 6 grouping columns that is 3.5× wasted
    shuffle volume at 100 TB. Explicit sets Expand only 2×.

    One scan + one shuffle replaces the reference's two full pipelines.
    """
    aggs = [dsum(src).alias(alias) for src, alias in sum_cols]
    aggs.append(F.count(F.col(count_col[0])).alias(count_col[1]))
    aggs.append(F.countDistinct(F.col(distinct_col[0])).alias(distinct_col[1]))
    # grouping columns ordered (keys…, rollup_key): gid=0 → full detail;
    # gid=1 → rollup_key aggregated out.
    return df.groupingSets(
        [[*keys, rollup_key], list(keys)], *keys, rollup_key
    ).agg(F.grouping_id().cast("int").alias("lvl"), *aggs)
