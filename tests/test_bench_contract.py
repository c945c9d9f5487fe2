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


def test_calibration_v2_definition_frozen():
    """The v2 calibrations added in round 12 (r10 verdict item #5): the
    literal values every BENCH_r12+ `*_v2` series normalizes against.
    v2 exists because the v1 probes were too short to be host-stable
    (0.14-0.24 s swung ±70% across round hosts); the v2 shapes are
    multi-second steady-state with a median-of-5."""
    assert bench.CALIBRATION_V2_ROWS == 12_000_000_000
    assert bench.CALIBRATION_V2_EXPR == (
        "sum(id % 16777213 * 2654435761 % 1000003) v"
    )
    assert bench.CALIBRATION_V2_ID == (
        "range(12000000000):sum(id % 16777213 * 2654435761 % 1000003) v"
    )
    assert bench.CALIBRATION2_V2_ROWS == 40_000_000
    assert bench.CALIBRATION2_V2_ID == (
        "parquet(40000000):groupBy(id % 1000003):sum,count"
    )
    assert bench.CALIBRATION_V2_REPS == 5
    # v1 fields stay alive for series continuity — v2 never replaces them
    assert bench.CALIBRATION_ID and bench.CALIBRATION2_ID


def test_calibration_v2_df_is_overflow_safe_codegen_loop(spark):
    """The v2 CPU probe must keep the v1 resource profile (range source →
    whole-stage-codegen aggregate, no exchange of note) while reducing
    ``id`` BEFORE the multiply — the v1 expression overflows int64 past
    id ≈ 3.46e9 and v2 drives 12e9 rows through it."""
    df = bench.calibration_v2_df(spark)
    assert df.columns == ["v"]
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "Range (0, 12000000000" in plan
    assert "16777213" in plan       # the pre-multiply reduction
    # the reduced operand can never overflow: (16777213-1) * 2654435761
    assert (bench.CALIBRATION_V2_ROWS % 16777213 >= 0
            and 16777212 * 2654435761 < 2**63)


def test_payload_order_keeps_critical_fields_in_tail():
    """The driver records only the LAST 2000 characters of bench.py's
    JSON line (front truncation lost flagship_view/rollup_family raw
    times three rounds running). The emission order must keep every
    raw per-query time, the v2 calibrations, the v2-normalized series,
    and the totals at the END of the line — pinned here so a refactor
    can't silently reshuffle them to the sacrificial front."""
    order = list(bench.PAYLOAD_ORDER)
    assert len(order) == len(set(order)), "duplicate payload keys"
    tail = order[order.index("errors"):]
    # everything a round-over-round reader needs sits after `errors` —
    # since r16 that includes the per-query rep SPREAD (the meter's own
    # error bar, r15 verdict order #3) and the basis note naming the
    # median-of-reps definition of `queries`
    for key in (
        "queries_spread", "calibration_v2_sec", "calibration2_v2_sec",
        "value_per_calibration_v2", "value_per_calibration2_v2",
        "queries_normalized_v2", "queries_basis", "queries", "metric",
        "value", "unit", "sf",
    ):
        assert key in tail, key
    # raw queries and totals are the LAST things to ever truncate
    assert order[-5:] == ["queries", "metric", "value", "unit", "sf"]
    # the sacrificial front holds only recoverable/diagnostic fields
    # (queries_median3 there is an explicit-name DUPLICATE of `queries`)
    front = set(order[:order.index("errors")])
    assert "queries" not in front and "value" not in front
    assert "queries_median3" in front


def test_metric_id_marks_the_r16_series_break():
    """r15 verdict order #3: the metric id carries the `_median3`
    suffix from r16 on — the reading basis (median of round-robin
    reps) is unchanged since r3, but the id bump makes the meter fix
    an explicit series break instead of a silent relabel. The frozen
    REPS basis is pinned with it."""
    src = open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py")).read()
    assert '"metric": "headline_queries_total_runtime_median3"' in src
    assert '"metric_front": "headline_queries_total_runtime_median3"' in src
    assert "REPS = 3" in src and "EXTRA_REPS = 2" in src


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
