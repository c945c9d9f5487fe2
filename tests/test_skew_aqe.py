"""AQE skew-join beside the manual salt (round-3 verdict item #7).

The repo ships TWO skew answers: ``operators/skew.salted_join`` (explicit
salt, deterministic pre-planned shape) and AQE's runtime skew-join
splitting (``spark.sql.adaptive.skewJoin``, on in the session factory).
At 100 TB you reach for AQE FIRST — it needs no key-frequency knowledge,
splits only the partitions that actually materialized oversized, and
composes with every join in the pipeline; the manual salt remains for the
cases AQE cannot touch (skewed AGGREGATIONS, and joins whose skew you
must neutralize deterministically at plan time, e.g. under a
``shuffle_hash`` hint or a streaming join where AQE is unavailable).
SCALE.md §skew records the decision rule; this module proves the AQE leg
actually fires and returns the same rows.

The thresholds are scaled down (defaults: 256 MB partition threshold) so
the split triggers on a test-sized hot key; the MECHANISM is identical at
production thresholds.
"""

from __future__ import annotations

from contextlib import contextmanager

import pytest
from pyspark.sql import functions as F

HOT_ROWS = 200_000
COLD_KEYS = 400
COLD_ROWS_PER_KEY = 50


@contextmanager
def _skew_confs(spark):
    keys = {
        # no broadcast escape hatch: force a shuffled join like a
        # too-big-to-broadcast dim at real scale
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        # scaled-down skew detection so a ~MB hot partition qualifies
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "100k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "50k",
        # forceApply not needed — detection must fire on its own
    }
    saved = {}
    for k, v in keys.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _skewed_frames(spark):
    """Fact with one pathologically hot key (HOT_ROWS rows on key 0, ~50
    rows on each cold key) joined to a per-key dim."""
    hot = spark.range(HOT_ROWS).select(
        F.lit(0).alias("k"), F.col("id").alias("payload")
    )
    cold = spark.range(COLD_KEYS * COLD_ROWS_PER_KEY).select(
        (F.col("id") % COLD_KEYS + 1).alias("k"),
        F.col("id").alias("payload"),
    )
    fact = hot.unionByName(cold)
    dim = spark.range(COLD_KEYS + 1).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("dim_val")
    )
    return fact, dim


def test_aqe_splits_the_hot_partition_and_preserves_rows(spark):
    fact, dim = _skewed_frames(spark)
    with _skew_confs(spark):
        joined = fact.join(dim, "k").select("k", "payload", "dim_val")
        # collect() (not count()) so THIS DataFrame's QueryExecution runs —
        # count() builds its own and the inspected plan would stay unfinal
        total = len(joined.collect())
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final_plan
    # every fact row matches exactly one dim row
    assert total == HOT_ROWS + COLD_KEYS * COLD_ROWS_PER_KEY
    # AQE marks the skew-handled join in the FINAL adaptive plan
    assert "skew=true" in final_plan, final_plan[:2000]


def test_aqe_skew_parity_with_plain_join(spark):
    """Same aggregate answer with and without the skew machinery — AQE
    splitting is a physical rewrite, never a semantic one."""
    fact, dim = _skewed_frames(spark)
    expected = (HOT_ROWS, HOT_ROWS * 7 * 0)  # key 0: dim_val 0
    with _skew_confs(spark):
        row = (
            fact.join(dim, "k")
            .where(F.col("k") == 0)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("dim_val").alias("s"),
            )
            .collect()[0]
        )
    assert (row.n, row.s) == expected


def test_manual_salt_still_owns_aggregations(spark):
    """The boundary of AQE skew handling: it splits JOIN partitions only —
    a skewed groupBy key still funnels one reducer, which is why
    operators/skew.salted_agg exists. Pin the decision rule by showing the
    AQE-final aggregate plan contains no skew annotation to rely on."""
    fact, _ = _skewed_frames(spark)
    with _skew_confs(spark):
        agg = fact.groupBy("k").agg(F.sum("payload").alias("s"))
        agg.collect()
        final_plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final_plan
    assert "skew=true" not in final_plan
