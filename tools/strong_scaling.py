"""Strong-scaling experiment: fixed data (~sf1), growing core counts.

Replicates the scale smoke's ×10 dataset once, then times the flagship
shape on fresh ``local[N]`` sessions for N in 4/8/16/32 and prints a
speedup table plus per-stage shuffle-write bytes. The point is measured
evidence for SCALE.md: the engine's headline plan parallelizes with
cores at fixed data (scale-UP here, the same property that scales OUT
across executors on a cluster), and its shuffle volume grows with data,
not with parallelism.

Run: ``python tools/strong_scaling.py [copies]`` (default 10 ≈ sf1).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import urllib.request
from functools import reduce

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"
OFFSET = 100_000_000
REPLICATED = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
}
PASSTHROUGH = ("region", "nation", "supplier", "part")
CORES = (4, 8, 16, 32)
REPS = 3


def build_dataset(copies: int) -> str:
    from pyspark.sql import DataFrame, SparkSession
    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix="strongscale_")
    # driver.memory must be set on the FIRST session of the process — the
    # in-process JVM persists across spark.stop(), so later sessions
    # inherit this heap (a 1 g default OOMs the 16-thread leg at ~sf1)
    spark = (
        SparkSession.builder.master("local[16]").appName("strongscale-gen")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name, keys in REPLICATED.items():
        src = spark.read.parquet(f"{SRC}/{name}.parquet")
        parts = []
        for i in range(copies):
            d = src
            for k in keys:
                d = d.withColumn(k, F.col(k) + F.lit(i * OFFSET))
            parts.append(d)
        reduce(DataFrame.unionByName, parts).write.parquet(
            f"{out}/{name}.parquet", mode="overwrite")
    for name in PASSTHROUGH:
        spark.read.parquet(f"{SRC}/{name}.parquet").write.parquet(
            f"{out}/{name}.parquet", mode="overwrite")
    spark.stop()
    return out


def shuffle_write_bytes(spark) -> int:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app}/stages?status=complete"
    ) as r:
        stages = json.load(r)
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def run_at(cores: int, data_dir: str) -> tuple[float, int]:
    from pyspark.sql import SparkSession

    from tfm_taxitrips_spark.queries.relational import q_flagship_view

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"strongscale-{cores}")
        .config("spark.sql.shuffle.partitions", str(max(cores, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        q_flagship_view(spark, data_dir).write.format("noop").mode(
            "overwrite").save()
        times.append(time.perf_counter() - t0)
    sw = shuffle_write_bytes(spark)
    spark.stop()
    return min(times), sw


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    data_dir = build_dataset(copies)
    print(f"dataset: {copies}x sf0.1 at {data_dir}")
    rows = []
    for c in CORES:
        best, sw = run_at(c, data_dir)
        rows.append((c, best, sw))
        print(f"local[{c:>2}]: best {best:6.2f} s   "
              f"shuffle-write {sw/1e6:8.1f} MB (cumulative over reps)",
              flush=True)
    base = rows[0][1]
    print("\ncores  time_s  speedup_vs_4")
    for c, t, _ in rows:
        print(f"{c:>5}  {t:6.2f}  {base / t:10.2f}x")


if __name__ == "__main__":
    main()
