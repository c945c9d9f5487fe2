"""Deduplication operators (SURVEY.md §2.6 A1-A2 + §2.10 extensions).

Exact dedup here; near-duplicate detection (MinHash/LSH, SimHash, n-gram
Jaccard, embedding cosine) lives in :mod:`tfm_taxitrips_spark.functions.text`
and :mod:`tfm_taxitrips_spark.functions.similarity` and is wired into the
query registry.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_exact(df: DataFrame, keys: Sequence[str] | None = None) -> DataFrame:
    """A1/A2 — exact dedup.

    The reference calls ``.distinct()`` on the full 16-column projection
    (/root/reference/TransformTaxiTrips.py:42), which shuffles every column
    as the hash key. With a natural key (``trip_id``) the shuffle key is one
    column and map-side partial aggregation collapses duplicates before the
    exchange — at 100 TB that is the difference between shuffling the table
    and shuffling the key column. Pass ``keys=None`` for the reference's
    whole-row semantics.
    """
    if keys:
        return df.dropDuplicates(list(keys))
    return df.distinct()


def dedup_exact_aligned(df: DataFrame, join_key: str) -> DataFrame:
    """Whole-row distinct whose shuffle is pre-aligned to a downstream
    join key.

    A plain ``distinct()`` exchanges on ALL columns; a following join on
    ``join_key`` then exchanges the deduped table AGAIN. Hash-partitioning
    on ``join_key`` alone already satisfies the distinct's clustering
    requirement (identical rows share the key, so they land in one
    partition), and the aggregate's output keeps that partitioning — the
    join reuses it with no further exchange. Two full-table shuffles
    become one; at 100 TB that halves the fact table's wire volume for
    the §3.1 enrichment pipeline. Same result set as ``distinct()``.

    Trade-off: partial (map-side) dedup still applies, but partition
    balance now follows ``join_key`` — with a heavily skewed key prefer
    plain ``dedup_exact`` plus AQE skew handling.
    """
    return df.repartition(join_key).distinct()
