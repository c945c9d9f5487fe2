"""Unit tests for the connected-components operator (near-dup clustering)."""

from __future__ import annotations

from tfm_taxitrips_spark.operators.clustering import connected_components


def _cc(spark, pairs):
    edges = spark.createDataFrame(pairs, "src long, dst long")
    rows = connected_components(edges).collect()
    return {r["node"]: r["comp"] for r in rows}


def test_chain_collapses_to_min(spark):
    # 1-2, 2-3, 3-4: one component, min id 1, needs >1 propagation round
    got = _cc(spark, [(1, 2), (2, 3), (3, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_cycle_terminates(spark):
    got = _cc(spark, [(5, 6), (6, 7), (7, 5)])
    assert got == {5: 5, 6: 5, 7: 5}


def test_two_components(spark):
    got = _cc(spark, [(1, 2), (10, 11), (11, 12)])
    assert got == {1: 1, 2: 1, 10: 10, 11: 10, 12: 10}


def test_long_chain_converges(spark):
    # diameter 9: exercises several propagation rounds + lineage truncation
    pairs = [(i, i + 1) for i in range(20, 30)]
    got = _cc(spark, pairs)
    assert got == {i: 20 for i in range(20, 31)}


def test_duplicate_and_reversed_edges(spark):
    got = _cc(spark, [(2, 1), (1, 2), (2, 1)])
    assert got == {1: 1, 2: 1}
