"""Input-parallelism guard for compute-heavy map stages.

A scan's task count comes from its file splits
(``spark.sql.files.maxPartitionBytes``). That is the right sizing when the
bottleneck is I/O, but a CPU-heavy derivation (shingling, hashing, n-gram
explode — each input row fans out to hundreds) on a *small-file* input then
runs on a handful of tasks while the cluster idles. ``fan_out`` repartitions
only in that case: when the scan yields fewer partitions than the session's
parallelism. On a 100 TB input the split count already exceeds any cluster's
core count, so this is a no-op there — no gratuitous full-table shuffle.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame

#: memo of fan-out decisions keyed by the *input* DataFrame (weak, by
#: identity — exactly what we want now that ``sources.readers.table``
#: returns the same plan object per (session, sf_dir, table)). The
#: narrowness check is driver-only but not free (~20 ms of optimizer
#: work); 27 call sites paid it per query construction before r18.
_FAN_OUT_MEMO: "weakref.WeakKeyDictionary[DataFrame, DataFrame]" = (
    weakref.WeakKeyDictionary()
)


def _estimated_scan_partitions(df: DataFrame) -> int:
    """Planned-size estimate of the scan's task count: optimizer statistics
    ``sizeInBytes`` over ``spark.sql.files.maxPartitionBytes``. Driver-only,
    never triggers a job (unlike ``df.rdd.getNumPartitions()``, which
    compiles the whole physical plan — measured ~200 ms per call r18).
    Underestimates for many-small-file inputs (no per-file open-cost
    padding) — which errs toward repartitioning, the safe side for the
    CPU-heavy stages this guards."""
    size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    try:
        # resolved long, whatever unit string the conf was set with
        max_split = int(
            df.sparkSession._jsparkSession.sessionState().conf()
            .filesMaxPartitionBytes()
        )
    except Exception:  # Connect or API drift: parse the conf string
        max_split = _parse_bytes_conf(df.sparkSession.conf.get(
            "spark.sql.files.maxPartitionBytes", "134217728"))
    return max(1, -(-size // max(1, max_split)))


def _parse_bytes_conf(raw: str) -> int:
    """Spark byte-conf string → bytes (``"128m"``, ``"134217728b"``…)."""
    s = raw.strip().lower().removesuffix("b")
    units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}
    mult = 1
    if s and s[-1] in units:
        mult, s = units[s[-1]], s[:-1]
    return int(s or "134217728") * mult


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` up to the session's parallelism iff it is narrower.

    The check reads planned statistics (no job is triggered) and the
    decision is memoized per input plan object.
    """
    if min_partitions is None:
        out = _FAN_OUT_MEMO.get(df)
        if out is not None:
            return out
        min_partitions = df.sparkSession.sparkContext.defaultParallelism
        if _estimated_scan_partitions(df) < min_partitions:
            out = df.repartition(min_partitions)
        else:
            out = df
        _FAN_OUT_MEMO[df] = out
        return out
    if _estimated_scan_partitions(df) < min_partitions:
        return df.repartition(min_partitions)
    return df
