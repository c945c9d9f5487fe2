"""Measured confirmation leg for the r16 non-finite ingest contract:
the cost of the ``star_guard`` projection, claimed as a DELTA against
the raw-read sibling on the same host/session (the side-by-side
discipline — never a bare wall clock).

Two shapes, chosen to maximize guard exposure:

- ``q1``: the TPC-H q1 pricing-summary aggregation over ``lineitem`` —
  every one of the table's four allowlisted measure columns flows
  through the guard's CASE rebuild into DECIMAL sums (the worst case:
  the guard touches 4 of the 7 referenced columns);
- ``scanagg``: a bare full-scan SUM over the same four measures with no
  grouping — isolates the projection cost with no shuffle/agg noise
  on top.

Each shape is built twice from the SAME loader with only the guard
toggled (``readers.table(..., raw=...)`` — ``raw=True`` skips the guard
but keeps schema conformance, so the delta is exactly the guard), timed
round-robin for REPS reps through the noop sink, medians reported.

Run: ``python tools/guard_overhead.py [sf_dir] [cores]``
(defaults /root/testdata/sf0.1, 8). Results recorded in SCALE.md
(measured evidence) and ROUND16_NOTES.
"""

from __future__ import annotations

import os
import sys
import time
from statistics import median

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REPS = 5


def _shapes(spark, sf_dir: str, raw: bool):
    from pyspark.sql import functions as F

    from tfm_taxitrips_spark.functions.aggregates import dsum
    from tfm_taxitrips_spark.sources.readers import table

    li = table(spark, sf_dir, "lineitem", raw=raw)
    q1 = (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .alias("sum_disc_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    scanagg = li.agg(
        dsum("l_quantity").alias("s1"),
        dsum("l_extendedprice").alias("s2"),
        dsum("l_discount").alias("s3"),
        dsum("l_tax").alias("s4"),
    )
    return {"q1": q1, "scanagg": scanagg}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cores = sys.argv[2] if len(sys.argv) > 2 else "8"

    from tfm_taxitrips_spark.session import get_spark

    spark = get_spark(app_name="guard-overhead",
                      master=f"local[{cores}]",
                      shuffle_partitions=int(cores))

    # warm both paths once (JIT + footer probes), untimed
    for raw in (False, True):
        for df in _shapes(spark, sf_dir, raw).values():
            df.write.format("noop").mode("overwrite").save()

    runs: dict[tuple[str, bool], list[float]] = {}
    for _rep in range(REPS):  # round-robin: spikes land on one rep of each
        for raw in (False, True):
            for name, df in _shapes(spark, sf_dir, raw).items():
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                runs.setdefault((name, raw), []).append(
                    time.perf_counter() - t0)

    print(f"\nguard overhead @ local[{cores}], {sf_dir}, "
          f"median of {REPS} (seconds):")
    print(f"{'shape':<10}{'guarded':>10}{'raw':>10}{'delta':>10}{'rel':>8}")
    for name in ("q1", "scanagg"):
        g = median(runs[(name, False)])
        r = median(runs[(name, True)])
        print(f"{name:<10}{g:>10.3f}{r:>10.3f}{g - r:>10.3f}"
              f"{(g / r - 1) * 100:>7.1f}%")


if __name__ == "__main__":
    main()
