"""Reusable analytics operators: 2-D skyline and CDC last-wins collapse.

Extracted from the query layer so the algorithms are property-testable on
arbitrary frames (tests/test_properties.py) independent of the fixture
data the differential oracles pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(df: DataFrame, min_col: str, max_col: str) -> DataFrame:
    """Pareto frontier minimizing ``min_col`` and maximizing ``max_col``:
    keep rows no other row dominates (at-or-better on both axes, strictly
    better on one).

    NOT the O(n²) dominance self-join: per-``min_col`` max (map-side
    combine) + running max over the DISTINCT sorted ``min_col`` values
    (cardinality-collapsed single-partition window — a deliberate bounded
    choice) + broadcast verdict joined back. Survivors are rows equal to
    their group's best ``max_col`` whose group strictly beats every
    cheaper group. Ties on both axes survive together (neither strictly
    dominates).
    """
    per_group = df.groupBy(min_col).agg(F.max(max_col).alias("_best"))
    w = Window.orderBy(min_col).rowsBetween(Window.unboundedPreceding, -1)
    verdict = per_group.withColumn(
        "_cheaper_best", F.max("_best").over(w)
    ).where(
        F.col("_cheaper_best").isNull()
        | (F.col("_best") > F.col("_cheaper_best"))
    )
    return (
        df.join(F.broadcast(verdict), min_col)
        .where(F.col(max_col) == F.col("_best"))
        .drop("_best", "_cheaper_best")
    )


def cdc_collapse(
    ops: DataFrame,
    key: str,
    seq: str = "seq",
    op_col: str = "op",
    payload: str = "status",
    delete_op: str = "D",
) -> DataFrame:
    """Collapse an ordered CDC log to final per-key state: last writer
    (highest ``seq``) wins; a final ``delete_op`` nulls the payload and
    marks the key dead.

    ONE key exchange (``max_by`` aggregate with map-side partial combine);
    wire volume scales with distinct keys, not log length. The payload
    must be NON-NULL on every row (sentinel-encode tombstones before
    calling) — cross-engine oracles require it because DuckDB's
    ``arg_max`` skips NULL arguments while Spark's ``max_by`` carries
    them; keeping the engine seam null-free sidesteps the divergence.
    """
    last = ops.groupBy(key).agg(
        F.max_by(op_col, seq).alias("last_op"),
        F.max_by(payload, seq).alias("_payload_enc"),
        F.max(seq).alias("last_seq"),
    )
    return last.select(
        key,
        "last_op",
        F.when(
            F.col("last_op") != delete_op, F.col("_payload_enc")
        ).alias("final_" + payload),
        "last_seq",
        (F.col("last_op") != delete_op).alias("alive"),
    )
