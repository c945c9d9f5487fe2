"""Skew mitigation (SURVEY.md §4 'shuffle tuning / skew').

AQE's skew-join splitting handles skewed JOINS automatically
(``spark.sql.adaptive.skewJoin.enabled``, on in the session factory), but a
skewed AGGREGATION key still funnels one reducer. ``salted_agg`` is the
classic fix: phase 1 aggregates on (keys, salt) spreading each hot key over
``salt_buckets`` reducers; phase 2 combines the partials on the true keys.
Results are identical to the direct aggregation (sums in DECIMAL are
associative) — asserted by the differential oracle.

Worth it only when a key's row share ≫ 1/parallelism; for uniform keys the
extra shuffle is pure overhead. At 100 TB you enable it per-pipeline from
key-frequency stats, not globally.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def null_split_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    how: str = "left",
) -> DataFrame:
    """Left join that keeps null-key rows OUT of the shuffle.

    Null keys can never match, but a shuffled join still hashes them all to
    one partition — on a fact table where e.g. 30% of rows have an unknown
    dimension key (the reference's dirty taxi data: null community areas,
    /root/reference/AreasLoc.py:51-52), that single reducer IS the job's
    critical path. Splitting them out turns the straggler partition into a
    free union: matched rows shuffle, null rows pass through with
    null-padded right columns. Result is row-identical to the direct left
    join (asserted in tests).
    """
    if how != "left":
        raise ValueError("null_split_join supports only how='left'")
    overlap = (set(left.columns) & set(right.columns)) - {key}
    if overlap:
        raise ValueError(
            f"left/right share non-key columns {sorted(overlap)}; rename them "
            "first — the null-padded union cannot disambiguate duplicates"
        )
    matched = left.where(F.col(key).isNotNull()).join(right, key, "left")
    nulls = left.where(F.col(key).isNull())
    for field in right.schema.fields:
        if field.name != key:
            nulls = nulls.withColumn(field.name, F.lit(None).cast(field.dataType))
    return matched.unionByName(nulls.select(*matched.columns))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side.

    A hot join key funnels every one of its rows through one reducer —
    AQE's skew-join split handles the common case, but only AFTER the
    skewed shuffle files exist, only for sort-merge joins, and never when
    the skewed side is the output of an exchange-reusing stage. The
    explicit form: the (big, skewed) left gets a partition-id-derived salt
    in [0, salt_buckets); the right is replicated once per salt value via
    a generated ``sequence`` explode (rows × salt_buckets — use only when
    the right is small relative to the left, yet too big to broadcast);
    the join key becomes (key, salt), spreading each hot key over
    ``salt_buckets`` reducers. Row-identical to the direct join for
    ``inner`` and ``left`` (each left row carries exactly one salt and
    every salt replica of the right exists).

    The salt is ``xxhash64`` over the left row's content, not a random
    number and not the input partition id: deterministic across retries (a
    task re-run salts identically, so no dup/lost rows under speculative
    execution), and it spreads a hot key's rows WITHIN each input
    partition — a partition-id salt collapses when the hot key is
    concentrated in few input partitions (clustered/sorted input, coalesced
    scans, or an upstream exchange narrower than ``salt_buckets``). The one
    degenerate case — a hot key whose rows are bit-identical in every
    column — lands on one reducer either way, and its join output is
    row-identical copies, so no salt can do better there.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left'")
    salted_left = left.withColumn(
        "_salt", F.pmod(F.xxhash64(*left.columns), F.lit(salt_buckets))
    )
    salted_right = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    cond = (salted_left[left_key] == salted_right[right_key]) & (
        salted_left["_salt"] == salted_right["_salt"]
    )
    return salted_left.join(salted_right, cond, how).drop("_salt")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[tuple[str, str]],
    count_alias: str = "n_rows",
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe groupBy: decimal SUMs + COUNT.

    The salt is the input partition id — it spreads a hot key across as
    many phase-1 reducers as there are input partitions (capped at
    ``salt_buckets``) regardless of the DATA: a value-derived salt would
    silently collapse to one bucket when the hot key's measures are
    constant. The final result is salt-invariant (decimal sums
    reassociate), so any spread is correct.
    """
    salt = F.pmod(F.spark_partition_id(), F.lit(salt_buckets))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(
            *[
                F.sum(F.col(src).cast("decimal(18,2)")).alias(f"_p_{alias}")
                for src, alias in sum_cols
            ],
            F.count(F.lit(1)).alias("_p_count"),
        )
    )
    return partial.groupBy(*keys).agg(
        *[
            F.sum(F.col(f"_p_{alias}")).cast("double").alias(alias)
            for _, alias in sum_cols
        ],
        F.sum("_p_count").alias(count_alias),
    )
