"""Explicit Bloom-filter runtime join pruning.

Spark's own runtime row-level filtering (``InjectRuntimeFilter``) does this
transparently, but only when its heuristics fire and never across query
boundaries. This operator makes the pattern a first-class, reusable step:
scan the *build* side once, pack its join-key membership into an ``m``-bit
Bloom filter represented as a dense ``array<bigint>`` of ``m/64`` words
(~``m/8`` bytes however many keys went in), broadcast that single row, and
drop probe-side rows whose keys cannot possibly join — BEFORE the join's
shuffle moves them.

Why not just broadcast the build side? A broadcast hash join needs the
*rows*; the Bloom filter needs ``m`` bits total. 10⁹ build keys at a 1%
false-positive rate is ~1.2 GB of keys but a ~1.2 KB-per-1k-keys filter —
the filter stays broadcastable long after the table isn't. False positives
only cost wasted shuffle (the join itself removes them); false negatives
are impossible, so the join result is bit-identical to the unpruned join —
which is exactly what makes the operator oracle-checkable.

Everything is built-in expressions (xxhash64, bit ops, ``element_at`` on a
dense array is O(1)), so both build and probe stay inside whole-stage
codegen. No reference analog (the reference joins one city's dimension
tables: /root/reference/TransformTaxiTrips.py:96-101); this is the scale
path for selective fact-fact joins.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default geometry: m=64Ki bits (8 KiB) / 3 hashes ≈ 0.2% false positives
#: at 3 k keys, ~1% at 6 k. Size m ≈ 10·n_keys for ~1% at other scales.
M_BITS = 1 << 16
N_HASHES = 3


def _positions(key: Column, m_bits: int, n_hashes: int) -> list[Column]:
    """``n_hashes`` independent bit positions for one key.

    ``xxhash64(key, i)`` hashes the (key, seed-literal) tuple — cheap,
    codegen, and identical on build and probe side by construction.
    """
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits))
        for i in range(n_hashes)
    ]


def bloom_build(
    df: DataFrame,
    key: str,
    m_bits: int = M_BITS,
    n_hashes: int = N_HASHES,
) -> DataFrame:
    """One-row DataFrame with column ``bloom``: array<bigint> of m/64 words.

    Map-side combinable: the explode emits n_hashes ints per row, the
    ``bit_or`` partials collapse per word before the (tiny, ≤ m/64 row)
    shuffle. The dense-array materialization runs once on the final
    single-row state.
    """
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    words = m_bits // 64
    pos = F.explode(F.array(*_positions(F.col(key), m_bits, n_hashes)))
    sparse = (
        df.select(pos.alias("p"))
        .select(
            (F.col("p") / 64).cast("int").alias("w"),
            F.expr("shiftleft(1L, int(p % 64))").alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
    )
    return sparse.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "word"))).alias("_m")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(words - 1)),
            lambda i: F.coalesce(F.element_at("_m", i), F.lit(0).cast("long")),
        ).alias("bloom")
    )


def bloom_probe(
    df: DataFrame,
    key: str,
    bloom: DataFrame,
    m_bits: int = M_BITS,
    n_hashes: int = N_HASHES,
) -> DataFrame:
    """Keep only rows whose ``key`` might be in the filter (no false
    negatives). The one-row ``bloom`` build broadcasts; every probe is
    ``n_hashes`` O(1) array reads + bit tests inside codegen.
    """
    tests = [
        F.getbit(
            F.element_at(F.col("bloom"), (p / 64).cast("int") + 1),
            (p % 64).cast("int"),
        )
        == 1
        for p in _positions(F.col(key), m_bits, n_hashes)
    ]
    pruned = (
        df.join(F.broadcast(bloom))
        .where(reduce(lambda a, b: a & b, tests))
        .drop("bloom")
    )
    return pruned
