"""Bench continuity contract (r4 verdict item #7).

``bench.py``'s ``value_per_calibration`` series is the round-over-round
performance signal; it is only apples-to-apples while the calibration
workload definition never changes. These tests freeze that definition —
editing the workload fails here, forcing an explicit ``calibration_id``
series break instead of a silent unit change.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def test_calibration_definition_frozen():
    # the literal values BENCH_r04-era rounds normalized against
    assert bench.CALIBRATION_ROWS == 200_000_000
    assert bench.CALIBRATION_EXPR == "sum(id * 2654435761 % 1000003) v"
    assert bench.CALIBRATION_ID == (
        "range(200000000):sum(id * 2654435761 % 1000003) v"
    )


def test_calibration_df_is_the_frozen_workload(spark):
    df = bench.calibration_df(spark)
    # one aggregate row, derived only from the frozen range + expression
    assert df.columns == ["v"]
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "Range (0, 200000000" in plan
    assert "2654435761" in plan and "1000003" in plan


def test_calibration2_definition_frozen():
    # the shuffle+scan calibration added in round 8 (r7 verdict item #3):
    # the literal values every BENCH_r08+ `value_per_calibration2`
    # normalizes against
    assert bench.CALIBRATION2_ROWS == 20_000_000
    assert bench.CALIBRATION2_KEYS == 1_000_003
    assert bench.CALIBRATION2_ID == (
        "parquet(20000000):groupBy(id % 1000003):sum,count"
    )


def test_calibration2_df_is_scan_plus_exchange(spark, tmp_path):
    """The second calibration must actually exercise the resource profile
    it claims to time: a parquet scan feeding a shuffle exchange into a
    hash aggregate (not a range source, not a broadcast, not a sort)."""
    path = os.path.join(tmp_path, "calib2")
    # a 1k-row miniature with the same plan shape (rows don't change the
    # physical operators, only their runtime)
    spark.range(1000).selectExpr(
        f"id % {bench.CALIBRATION2_KEYS} k",
        "id * 2654435761 % 1000003 v",
    ).write.parquet(path)
    plan = (
        bench.calibration2_df(spark, path)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange hashpartitioning(k" in plan
    assert "FileScan parquet" in plan
    assert "HashAggregate" in plan


def test_calibration_affinity_covers_bench_set():
    """Per-query attribution (r8 verdict item #5): every bench=True query
    carries exactly one affinity tag, tags name a real calibration shape,
    and no stale tags survive a bench-set change — so the
    ``queries_normalized`` series can never silently fall back to an
    implicit default."""
    from tfm_taxitrips_spark.queries.registry import all_queries

    bench_set = {n for n, s in all_queries().items() if s.bench}
    assert set(bench.CALIBRATION_AFFINITY) == bench_set
    assert set(bench.CALIBRATION_AFFINITY.values()) <= {"cpu", "shuffle"}
    # both shapes are actually in use — an all-one-shape map would mean
    # the attribution collapsed back into a single global ratio
    assert set(bench.CALIBRATION_AFFINITY.values()) == {"cpu", "shuffle"}
