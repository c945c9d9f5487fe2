#!/usr/bin/env python
"""Benchmark the engine's headline queries.

Runs every ``bench=True`` query from the registry at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}``.

Each query is fully materialized through the ``noop`` sink (forces the whole
plan — scan, shuffles, aggregation — without measuring a real sink).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tfm_taxitrips_spark.queries.registry import all_queries  # noqa: E402
from tfm_taxitrips_spark.session import get_spark  # noqa: E402

# Calibration workload — FROZEN. ``value_per_calibration`` is only
# comparable across rounds while this definition never changes, so it is
# pinned by tests/test_bench_contract.py (which asserts these literals and
# the derived ``calibration_id``). Change them and the test fails — if a
# change is ever genuinely needed, bump the id suffix so consumers see the
# series break instead of silently comparing different units.
CALIBRATION_ROWS = 200_000_000
CALIBRATION_EXPR = "sum(id * 2654435761 % 1000003) v"
CALIBRATION_ID = f"range({CALIBRATION_ROWS}):{CALIBRATION_EXPR}"

# Second calibration shape — FROZEN like the first (same contract test).
# The CPU-bound range:sum shape under-corrected 15-20% swings on the
# shuffle/IO-heavy headline queries two rounds running (r6/r7 verdicts):
# co-tenant interference that hits the shuffle/scan path barely moves a
# whole-stage-codegen loop over an in-memory range. This shape times the
# OTHER resource profile — a parquet scan feeding a real exchange
# (20M rows into ~1M groups: map-side partial aggregation barely
# combines, so nearly every row crosses the shuffle) — over synthetic
# data written once per run (the write is untimed).
CALIBRATION2_ROWS = 20_000_000
CALIBRATION2_KEYS = 1_000_003
CALIBRATION2_ID = (
    f"parquet({CALIBRATION2_ROWS}):groupBy(id % {CALIBRATION2_KEYS})"
    f":sum,count"
)

# Calibration v2 — FROZEN like v1 (r10 verdict item #5, executed r12).
# The v1 probes are too SHORT to normalize anything: the 0.14-0.24 s cpu
# probe swung ±70% across round hosts while 1-2 s queries moved ±10%,
# making `queries_normalized` units incomparable across rounds three
# rounds running. v2 keeps the same two resource profiles but sizes each
# probe to multi-second steady-state (≥5 s on the known driver hosts)
# AND takes a median-of-5, so one co-tenant spike is discarded instead
# of polluting the unit. v1 probes and fields are kept verbatim for
# series continuity; consumers should prefer the *_v2 series from r12 on.
# The cpu-v2 expression reduces ``id`` BEFORE the multiply — the v1
# expression overflows int64 past id ≈ 3.46e9, and v2 needs 12e9 rows.
CALIBRATION_V2_ROWS = 12_000_000_000
CALIBRATION_V2_EXPR = "sum(id % 16777213 * 2654435761 % 1000003) v"
CALIBRATION_V2_ID = f"range({CALIBRATION_V2_ROWS}):{CALIBRATION_V2_EXPR}"
CALIBRATION2_V2_ROWS = 40_000_000
CALIBRATION2_V2_ID = (
    f"parquet({CALIBRATION2_V2_ROWS}):groupBy(id % {CALIBRATION2_KEYS})"
    f":sum,count"
)
CALIBRATION_V2_REPS = 5

# Emission order of the ONE JSON line — FROZEN (r10 verdict item #5's
# second half, executed r12). The driver's capture keeps only the LAST
# 2000 characters of the line, so r9/r10/r11 all lost the
# flagship_view/rollup_family/windowed_agg_batch/training_data_mix raw
# times to FRONT truncation. Keys are ordered least-critical-first so
# the tail always retains: the v2 calibrations, the v2-normalized
# per-query series, EVERY raw per-query median, the totals, and sf.
# Pinned by tests/test_bench_contract.py.
PAYLOAD_ORDER = (
    # -- sacrificial front (recoverable from source / prior rounds)
    "metric_front",            # duplicate of `metric` for short-line readers
    "calibration_affinity",
    "queries_min",
    "queries_median3",         # duplicate of `queries` under its explicit
    #                            name (r15 verdict order #3; the tail copy
    #                            is the one the driver always retains)
    "high_variance_queries",
    "reps",
    "reps_high_variance",
    "queries_normalized",      # v1 series — host-sensitive, superseded
    "calibration_id",
    "calibration_sec",
    "value_per_calibration",
    "calibration2_id",
    "calibration2_sec",
    "value_per_calibration2",
    # -- the tail the driver must retain
    "errors",
    "queries_spread",          # r16: per-query max-min across the reps —
    #                            the in-run variance band a single-number
    #                            reading can't show (r15 verdict order #3)
    "calibration_v2_id",
    "calibration_v2_sec",
    "calibration2_v2_id",
    "calibration2_v2_sec",
    "value_per_calibration_v2",
    "value_per_calibration2_v2",
    "queries_normalized_v2",
    "queries_basis",           # states what `queries` IS: per-query median
    #                            of the round-robin reps (3, or 5 for the
    #                            high-variance set)
    "queries",
    "metric",
    "value",
    "unit",
    "sf",
)


# Per-query calibration affinity (r8 verdict item #5 — the second half of
# r7 item #3): which of the two frozen calibration shapes tracks each
# headline query's dominant resource, so round-over-round drift reads as
# ONE normalized number per query (``queries_normalized``) instead of a
# manual read of two global ratios. "cpu" = the codegen/hashing loop
# (range:sum shape); "shuffle" = the scan→exchange→aggregate shape.
# Assignment basis: hash/array-codegen-dominated queries (md5/conv
# MinHash pipelines, vector arithmetic, shingle hashing over the 500-doc
# corpus) tag "cpu"; fact-table scan/join/exchange queries and the
# state-store-commit-bound stream drain tag "shuffle". The tag is an
# ATTRIBUTION aid, not a unit change — re-tagging in a later round is a
# visible series break for that query (the tag ships in the JSON).
CALIBRATION_AFFINITY = {
    "date_trunc_day": "shuffle",
    "top_segments_by_revenue": "shuffle",
    "dedup_exact_docs": "cpu",
    "minhash_signature": "cpu",
    "ann_bruteforce": "cpu",
    "ann_lsh": "cpu",
    "stream_window_rollup": "shuffle",
    "flagship_view": "shuffle",
    "rollup_family": "shuffle",
    "windowed_agg_batch": "shuffle",
    "training_data_mix": "cpu",
    "minhash_lsh_candidates": "cpu",
    "event_sessionization": "shuffle",
    "sql_q1_pricing_summary": "shuffle",
    "sql_q6_forecast_revenue": "shuffle",
    "sql_q3_shipping_priority": "shuffle",
    "sql_q5_local_supplier": "shuffle",
}


def calibration_df(spark):
    """The fixed engine-independent workload timed for host normalization."""
    return spark.range(CALIBRATION_ROWS).selectExpr(CALIBRATION_EXPR)


def calibration2_build(spark, path: str) -> None:
    """Write the second calibration's synthetic parquet (NOT timed)."""
    spark.range(CALIBRATION2_ROWS).selectExpr(
        f"id % {CALIBRATION2_KEYS} k",
        "id * 2654435761 % 1000003 v",
    ).write.parquet(path, mode="overwrite")


def calibration2_df(spark, path: str):
    """The timed part: parquet scan → shuffle exchange → hash aggregate."""
    return (
        spark.read.parquet(path)
        .groupBy("k")
        .agg({"v": "sum", "*": "count"})
    )


def calibration_v2_df(spark):
    """The v2 CPU probe: same codegen-loop profile as v1, sized to
    multi-second steady state (overflow-safe expression)."""
    return spark.range(CALIBRATION_V2_ROWS).selectExpr(CALIBRATION_V2_EXPR)


def calibration2_v2_build(spark, path: str) -> None:
    """Write the v2 shuffle calibration's synthetic parquet (NOT timed)."""
    spark.range(CALIBRATION2_V2_ROWS).selectExpr(
        f"id % {CALIBRATION2_KEYS} k",
        "id * 2654435761 % 1000003 v",
    ).write.parquet(path, mode="overwrite")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(app_name="tfm-taxitrips-bench")

    specs = {n: s for n, s in all_queries().items() if s.bench}

    # Warm the JVM once, excluded from timings (standard steady-state
    # benching): exercise the actual codepaths — parquet scan, shuffle
    # exchange, hash aggregate, broadcast join, window, codegen — on the
    # tiny dimension tables so the first measured query doesn't pay JIT
    # compilation for the whole engine.
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    warm = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .distinct()
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("n_name").orderBy(F.col("c_acctbal").desc())
            ),
        )
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("c_nationkey").alias("d"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).alias("s"),
        )
    )
    warm.write.format("noop").mode("overwrite").save()

    # same, for the text/vector codepaths (regexp, md5/conv hashing,
    # explode, array folds, collect_set) over the 25-row nation table
    toks = F.regexp_extract_all(F.lower("n_name"), F.lit(r"[a-z]+"), 0)
    warm_text = (
        nation.select(
            "n_nationkey",
            F.explode(
                F.transform(
                    toks,
                    lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
                )
            ).alias("h"),
        )
        .groupBy("h")
        .agg(F.collect_set("n_nationkey").alias("ids"))
        .select(
            F.aggregate(
                F.transform("ids", lambda x: x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x * x,
            ).alias("fold")
        )
    )
    warm_text.write.format("noop").mode("overwrite").save()

    # and the MinHash signature shapes (shingle → hash → distinct → 16-way
    # min-agg) on a 64-doc sample — the heaviest codegen unit in the suite
    from tfm_taxitrips_spark.functions.text import (
        MINHASH_A,
        MINHASH_B,
        MINHASH_PERMS,
        MINHASH_PRIME,
        hash60,
        shingles,
    )

    docs64 = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(64)
    hashed = (
        docs64.select("doc_id", F.explode(shingles(F.lower(F.col("text")), 3)).alias("s"))
        .select("doc_id", (hash60(F.col("s")) % MINHASH_PRIME).alias("x"))
        .distinct()
    )
    mins = [
        F.min((F.lit(MINHASH_A[j]) * F.col("x") + F.lit(MINHASH_B[j])) % MINHASH_PRIME).alias(f"h{j}")
        for j in range(MINHASH_PERMS)
    ]
    hashed.groupBy("doc_id").agg(*mins).write.format("noop").mode("overwrite").save()

    # the enrich + grouping-sets/count-distinct (Expand) shape on a
    # 2048-row fact sample — flagship/rollup's codegen unit
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(2048)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    enriched = (
        li.distinct()
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), F.col("o_custkey") == customer.c_custkey, "left")
    )
    warm_rollup = enriched.groupingSets(
        [["l_returnflag", "c_mktsegment"], ["l_returnflag"]],
        "l_returnflag",
        "c_mktsegment",
    ).agg(
        F.grouping_id().alias("lvl"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("s"),
        F.countDistinct("l_suppkey").alias("d"),
    )
    warm_rollup.write.format("noop").mode("overwrite").save()

    # streaming machinery (micro-batch scheduler, state store, commit log)
    ws = (
        spark.readStream.format("rate").option("rowsPerSecond", "1").load()
        .groupBy("value").count()
    )
    wq = (
        ws.writeStream.format("memory").queryName("bench_warm_stream")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    wq.awaitTermination(30)
    wq.stop()  # never let a straggling warmup batch run beside timed queries
    spark.catalog.dropTempView("bench_warm_stream")

    # REPS runs per query, ROUND-ROBIN (all queries, then repeat): a
    # co-tenant CPU spike then lands on one rep of many queries instead of
    # all reps of one, and the median discards it. One-shot timings on
    # this host have shown ±25-200% swings on untouched code — medians
    # plus calibration normalization are what make round-over-round
    # deltas signal (round-3 verdict item #5).
    REPS = 3
    # queries whose round-over-round medians have historically swung ≥20%
    # on untouched code (r6/r7 verdicts) get 2 extra reps — a 5-sample
    # median tolerates two corrupted reps instead of one (r7 verdict
    # item #3's optional leg)
    HIGH_VARIANCE = {
        "sql_q1_pricing_summary", "sql_q3_shipping_priority",
        "sql_q5_local_supplier", "stream_window_rollup",
        "minhash_signature", "windowed_agg_batch", "ann_lsh",
        "ann_bruteforce",
        # r9 addition: the other stateful streaming drain — ±30% swings
        # on untouched code observed r8→r9 (ROUND9_NOTES.md §9); its
        # median basis changes 3→5 reps from r9 on (disclosed per the
        # ADVICE r8 transition rule)
        "event_sessionization",
    }
    EXTRA_REPS = 2
    runs: dict[str, list[float]] = {n: [] for n in specs}
    errors: dict[str, str] = {}
    for rep in range(REPS + EXTRA_REPS):
        for name in sorted(specs):
            if name in errors:
                continue  # failed once: don't retry, don't kill the bench
            if rep >= REPS and name not in HIGH_VARIANCE:
                continue
            start = time.perf_counter()
            try:
                df = specs[name].fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
            except Exception as exc:  # one broken query must not cost the JSON line
                errors[name] = str(exc)[:200]
                continue
            runs[name].append(time.perf_counter() - start)
    # a query that failed on ANY rep reports ONLY under `errors` — its
    # surviving reps would be a degraded 1-2 sample pseudo-median that a
    # round-over-round consumer could not distinguish from a real one
    runs = {n: v for n, v in runs.items() if v and n not in errors}

    from statistics import median

    timings = {n: round(median(v), 3) for n, v in runs.items()}
    # per-query rep spread (max-min): the in-run variance band. A driver
    # reading where the spread is small but the round-over-round move is
    # large is a HOST shift between rounds; a large spread says the
    # reading itself is noisy and the calibrations must arbitrate
    # (r15 verdict order #3 — the meter must expose its own error bar).
    spreads = {n: round(max(v) - min(v), 3) for n, v in runs.items()}

    # Fixed engine-independent workloads (same REPS/median treatment),
    # reported alongside the query timings so round-over-round comparisons
    # can be normalized for machine drift. Not part of `value`.
    # Two shapes, two resource profiles: the CPU-bound codegen loop and
    # the shuffle+scan exchange — a round-over-round drift that shows in
    # the queries but in NEITHER calibration is code; drift matching one
    # of them is host, attributed to the resource that calibration times.
    import shutil
    import tempfile

    calib2_dir = os.path.join(tempfile.mkdtemp(prefix="bench_calib2_"), "t")
    calibration2_build(spark, calib2_dir)  # untimed one-off write
    calibs: list[float] = []
    calibs2: list[float] = []
    for _ in range(REPS):
        calib_start = time.perf_counter()
        calibration_df(spark).write.format("noop").mode("overwrite").save()
        calibs.append(time.perf_counter() - calib_start)
        calib_start = time.perf_counter()
        calibration2_df(spark, calib2_dir).write.format("noop").mode(
            "overwrite").save()
        calibs2.append(time.perf_counter() - calib_start)
    calib = round(median(calibs), 3)
    calib2 = round(median(calibs2), 3)
    shutil.rmtree(os.path.dirname(calib2_dir), ignore_errors=True)

    # v2 probes: multi-second steady-state shapes, median-of-5,
    # interleaved round-robin like the queries so a co-tenant spike
    # lands on one rep of each instead of all reps of one
    calib2_v2_dir = os.path.join(
        tempfile.mkdtemp(prefix="bench_calib2v2_"), "t")
    calibration2_v2_build(spark, calib2_v2_dir)  # untimed one-off write
    calibs_v2: list[float] = []
    calibs2_v2: list[float] = []
    for _ in range(CALIBRATION_V2_REPS):
        calib_start = time.perf_counter()
        calibration_v2_df(spark).write.format("noop").mode(
            "overwrite").save()
        calibs_v2.append(time.perf_counter() - calib_start)
        calib_start = time.perf_counter()
        calibration2_df(spark, calib2_v2_dir).write.format("noop").mode(
            "overwrite").save()
        calibs2_v2.append(time.perf_counter() - calib_start)
    calib_v2 = round(median(calibs_v2), 3)
    calib2_v2 = round(median(calibs2_v2), 3)
    shutil.rmtree(os.path.dirname(calib2_v2_dir), ignore_errors=True)

    def affinity_probe(name: str, cpu_probe: float, shuffle_probe: float):
        return (cpu_probe
                if CALIBRATION_AFFINITY.get(name, "shuffle") == "cpu"
                else shuffle_probe)

    total = round(sum(timings.values()), 3)
    fields = {
        "metric_front": "headline_queries_total_runtime_median3",
        # per-query attribution (r8 verdict item #5): each query
        # normalized by its affinity-matched calibration — the
        # one-number-per-query drift series; a move here that the
        # OTHER series doesn't explain is code, not host.
        # .get default keeps one missing tag from costing the whole
        # JSON line; the contract test enforces full coverage so the
        # default never actually ships
        "calibration_affinity": {
            n: CALIBRATION_AFFINITY.get(n, "shuffle")
            for n in sorted(timings)
        },
        "queries_min": {n: round(min(v), 3) for n, v in runs.items()},
        "queries_median3": dict(sorted(timings.items())),
        "high_variance_queries": sorted(HIGH_VARIANCE & set(runs)),
        "reps": REPS,
        "reps_high_variance": REPS + EXTRA_REPS,
        # v1 normalized series — kept for continuity; prefer *_v2
        "queries_normalized": {
            n: round(t / affinity_probe(n, calib, calib2), 3)
            for n, t in sorted(timings.items())
            if affinity_probe(n, calib, calib2)
        },
        # v1 calibrations: total in units of the calibration workload —
        # only rows sharing `calibration_id` are comparable (the id
        # names the frozen definition, pinned by
        # tests/test_bench_contract.py)
        "calibration_id": CALIBRATION_ID,
        "calibration_sec": calib,
        "value_per_calibration": round(total / calib, 2) if calib else None,
        "calibration2_id": CALIBRATION2_ID,
        "calibration2_sec": calib2,
        "value_per_calibration2": round(total / calib2, 2)
        if calib2 else None,
        "errors": errors,
        "queries_spread": dict(sorted(spreads.items())),
        # v2 calibrations (r12): the host-stable normalization series
        "calibration_v2_id": CALIBRATION_V2_ID,
        "calibration_v2_sec": calib_v2,
        "calibration2_v2_id": CALIBRATION2_V2_ID,
        "calibration2_v2_sec": calib2_v2,
        "value_per_calibration_v2": round(total / calib_v2, 2)
        if calib_v2 else None,
        "value_per_calibration2_v2": round(total / calib2_v2, 2)
        if calib2_v2 else None,
        "queries_normalized_v2": {
            n: round(t / affinity_probe(n, calib_v2, calib2_v2), 3)
            for n, t in sorted(timings.items())
            if affinity_probe(n, calib_v2, calib2_v2)
        },
        "queries_basis": f"median of {REPS} round-robin reps "
                         f"({REPS + EXTRA_REPS} for high-variance)",
        "queries": timings,
        "metric": "headline_queries_total_runtime_median3",
        "value": total,
        "unit": "sec",
        "sf": sf,
    }
    payload = {k: fields[k] for k in PAYLOAD_ORDER}
    assert set(payload) == set(fields), "PAYLOAD_ORDER out of sync"
    # full payload sidecar: nothing is ever lost to the driver's
    # 2000-char tail capture when reading results locally
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_full_latest.json"), "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
