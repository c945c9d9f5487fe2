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
