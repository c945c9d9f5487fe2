"""Bounded LSH bucket→pair generation (scale guard for the dedup family).

Round-1 shape: ``groupBy(bucket).agg(collect_set(id))`` then expand pairs
inside each bucket's array. LSH buckets are small *by design*, but a
degenerate corpus (billions of empty / near-identical docs collapsing into
one bucket, or a small band space like a 16-bit simhash) turns that into a
single task materializing a width-sized array and a width²-sized pair
batch — an OOM at 100 TB.

The fix is dynamic sub-bucket salting, chosen over two rejected designs:

* skip-wide-buckets (filter ``size(ids) <= N``) silently drops pairs and
  forces every oracle to mirror the cap;
* a narrow/wide two-branch union consumes the bands table twice more, and
  Spark does not reuse the exchange across the branches (verified on the
  physical plan: the whole signature lineage executed 3×);
* widths via count-agg + SHUFFLE_HASH join-back instead of the window
  (drops the window's in-partition sort; measured ~10% off
  minhash_lsh_candidates at sf0.1) — but the widths branch re-executes
  the full signature lineage (ReuseExchange cannot fire: column pruning
  and pushed null-filters make the two exchange subtrees non-identical),
  i.e. a second corpus pass at 100 TB. Single-lineage wins at scale.

Salting keeps ONE consumer of the bands table and changes only the
execution strategy: a bucket of width ``w`` splits into
``nsub = ceil(w / max_width)`` salt groups; each row fans out to its
``nsub`` pair-groups ``(min(salt, o), max(salt, o))``. Same-salt pairs are
emitted only in the diagonal group ``(s, s)``, cross-salt pairs in exactly
one off-diagonal group — every unordered pair exactly once, so the emitted
pair set is IDENTICAL to the uncapped version and DuckDB oracles need no
cap mirroring. Narrow buckets (the LSH design case) get ``nsub = 1``: no
fan-out, no extra rows, the round-1 fast path. Per-task arrays are bounded
by ~2·``max_width`` regardless of corpus shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Target sub-bucket width: buckets at or below this expand in-task from one
# collected array; wider buckets are salted into ceil(w / cap) groups. A
# memory knob, not a semantic threshold — any setting emits the same pairs.
# 512 bounds the transient per-group pair batch at ~C(512,2) ≈ 131k structs
# (~16 MB); salting costs ~25% extra on a corpus wide enough to engage it
# (measured on the 16-bit simhash band space), so the cap is set where
# normal LSH corpora never pay it.
LSH_MAX_BUCKET = 512

_W = "_bucket_width"


def bucket_pairs(
    bands: DataFrame,
    keys: list[str],
    item: Column,
    max_width: int = LSH_MAX_BUCKET,
    pair_filter=None,
    strategy: str = "collect",
    spread: str = "explicit",
) -> DataFrame:
    """All unordered intra-bucket pairs of ``item``, as column ``p``
    (struct with fields ``a`` < ``b`` in Spark struct order).

    ``bands`` must hold one row per (bucket, item); ``keys`` name the
    bucket columns. Two shuffles, both over the compact banded table: the
    width window hash-partitions on ``keys``; the pair aggregation
    partially collects map-side (rows of a bucket are co-located after the
    window) and exchanges one array per (bucket, salt-group). The
    signature lineage feeding ``bands`` executes once.

    ``pair_filter`` (r18, guide §1.2 'per-task work'): optional
    ``(item_a, item_b) -> BooleanColumn`` predicate applied INSIDE the
    expansion lambdas — a failing slot yields NULL (the pair struct is
    never built, CASE is lazy) and is dropped by an array filter before
    the explode, so callers with a cheap necessary condition (e.g. the
    set-similarity size-ratio bound) avoid materializing and exploding
    provably-hopeless pairs. Must be deterministic and SYMMETRIC in its
    arguments (it is evaluated once per unordered pair, in whichever
    orientation the expansion produces). ``None`` keeps the exact
    pre-r18 expression tree.

    ``strategy`` picks how the per-group quadratic expansion executes;
    both emit the IDENTICAL pair set (pinned by
    tests/test_pairs.py::test_join_strategy_pair_set_identical):

    - ``"collect"`` (default, the pre-r18 form): collect each
      (bucket, salt-group) into one array and expand pairs with nested
      higher-order lambdas in-task. Zero join machinery — right for LSH
      corpora whose buckets are narrow by design (the pair batch per
      group stays tiny, and millions of narrow groups pay no per-group
      join overhead).
    - ``"join"`` (r18, guide §1.2 'the distributed algorithm'): a
      co-partitioned self-equi-join of the salted sub-group rows on
      (bucket, salt-group). Same distribution guarantee — each group's
      quadratic work lands on exactly one task, bounded by the salt cap —
      but pairs stream out of a whole-stage-codegen'd join loop instead
      of materializing a C(width, 2)-sized array of nested structs per
      group and exploding it. Measured 26.5 s → 3–6 s on the wide-bucket
      set-similarity prefix corpus (~50M slot evaluations, sf0.1), where
      wide buckets are the NORM and per-group arrays are the cost;
      equal-salt members of an off-diagonal group are excluded by the
      join condition (their pair belongs to the diagonal group), and
      orientation/dedup semantics match ``collect_set`` exactly because
      ``item`` is unique per bucket (the bands contract).

    ``spread`` (r19, ADVICE r18) controls how the COLLECT branch's
    sub-group exchange is sized; the join branch is always explicit:

    - ``"explicit"`` (default): REPARTITION_BY_NUM at the session's
      shuffle-partition count — exempt from AQE coalescing, which sizes
      shuffles by INPUT bytes and cannot see a quadratic OUTPUT. The
      right call whenever wide buckets are plausible (the semantic-dedup
      corpus measured −20% at sf0.1 with it).
    - ``"adaptive"``: column repartition, AQE-coalescible. For callers
      whose buckets are narrow BY DESIGN (LSH banding: expansion factor
      ≈ avg bucket width, output bytes ≈ input bytes), input-byte
      coalescing is the correct model and the forced width is pure task
      overhead at small scale (+0.5 s on the sf0.1 LSH candidates). At
      production scale the banded table exceeds AQE's per-partition
      floor anyway, so both settings plan identically — the knob only
      exists because a BOUNDED fixture can sit below that floor.
    """
    if spread not in ("explicit", "adaptive"):
        raise ValueError(f"unknown bucket_pairs spread {spread!r}")
    sized = bands.withColumn("it", item).withColumn(
        _W, F.count(F.lit(1)).over(Window.partitionBy(*keys))
    )
    nsub = F.ceil(F.col(_W) / F.lit(max_width)).cast("int")
    salt = F.pmod(F.xxhash64("it"), nsub).cast("int")
    sub = (
        sized.withColumn("_nsub", nsub)
        .withColumn("_salt", salt)
        .select(
            *keys,
            "_salt",
            F.struct(F.col("it"), F.col("_salt").alias("s")).alias("m"),
            F.explode(F.sequence(F.lit(0), F.col("_nsub") - 1)).alias("_o"),
        )
        .select(
            *keys,
            F.least("_salt", "_o").alias("_gi"),
            F.greatest("_salt", "_o").alias("_gj"),
            "m",
        )
    )
    if strategy == "join":
        # ONE explicit-count repartition on the full (bucket, salt-group)
        # key feeds both join sides (r18, guide §2.5/§2.2): the join's
        # own exchanges would carry only the COMPACT banded rows, so AQE —
        # which coalesces on INPUT bytes and cannot see that the join's
        # OUTPUT is the quadratic pair expansion — merged them into a
        # single partition and ran the whole emission plus the map-side
        # half of the downstream pair-distinct on one core (measured on
        # the sf0.1 set-similarity corpus: all 28.7M expanded pairs in
        # partition 0). An explicit numPartitions (REPARTITION_BY_NUM) is
        # exempt from AQE coalescing by contract; both sides project from
        # the same exchange, so alias-aware output partitioning satisfies
        # the join's distribution with no further shuffle and each group's
        # quadratic emission still lands on exactly one task, bounded by
        # the salt cap.
        sub = sub.repartition(
            int(bands.sparkSession.conf.get("spark.sql.shuffle.partitions")),
            *keys, "_gi", "_gj",
        )
        # The A side carries each group's salt-_gi members, the B side its
        # salt-_gj members: a diagonal group (gi == gj) self-pairs its one
        # salt with the strict item order deduping, an off-diagonal group
        # evaluates EXACTLY the |la|×|lb| cross pairs (same-salt members
        # never meet here — their pair belongs to the diagonal group), the
        # same slot set the collect path's lambdas enumerate.
        la = sub.where(F.col("m")["s"] == F.col("_gi")).select(
            *keys, "_gi", "_gj", F.col("m").alias("_ma"))
        lb = sub.where(F.col("m")["s"] == F.col("_gj")).select(
            *[F.col(k).alias(f"_r_{k}") for k in keys],
            F.col("_gi").alias("_r_gi"), F.col("_gj").alias("_r_gj"),
            F.col("m").alias("_mb"))
        cond = (F.col("_gi") == F.col("_r_gi")) & (
            F.col("_gj") == F.col("_r_gj"))
        for k in keys:
            cond &= F.col(k).eqNullSafe(F.col(f"_r_{k}"))
        ma, mb = F.col("_ma"), F.col("_mb")
        # diagonal groups need the strict item order to emit each
        # unordered pair once (equal items cannot occur: one row per
        # (bucket, item), and collect_set would likewise collapse them);
        # off-diagonal cross pairs are all distinct and get ORIENTED by
        # the item order below instead of filtered on it
        cond &= (F.col("_gi") != F.col("_gj")) | (ma["it"] < mb["it"])
        if pair_filter is not None:
            cond &= pair_filter(ma["it"], mb["it"])
        return la.join(lb, cond).select(
            F.struct(
                F.least(ma["it"], mb["it"]).alias("a"),
                F.greatest(ma["it"], mb["it"]).alias("b"),
            ).alias("p")
        )
    if strategy != "collect":
        raise ValueError(f"unknown bucket_pairs strategy {strategy!r}")
    # Explicit repartition on the sub-group key: the bucket-key partitioning
    # from the window already SATISFIES the groupBy's distribution (the
    # group key is a superset), so without this Spark would elide the
    # exchange and run every sub-group of a mega bucket in one task —
    # memory-safe (bounded arrays, spilling agg) but CPU-skewed: the whole
    # O(w²) expansion on one core. One extra shuffle of the compact banded
    # rows buys cluster-wide distribution of the quadratic work.
    # r19 (ADVICE r18): under spread="explicit" the count is EXPLICIT
    # (REPARTITION_BY_NUM, exempt from AQE coalescing) for the same
    # reason as the join branch above — AQE coalesces on the compact
    # banded INPUT bytes and cannot see that the groups' OUTPUT (the
    # in-task pair arrays) is quadratic. spread="adaptive" keeps the
    # coalescible column form for narrow-by-design callers (docstring).
    if spread == "explicit":
        sub = sub.repartition(
            int(bands.sparkSession.conf.get("spark.sql.shuffle.partitions")),
            *keys, "_gi", "_gj")
    else:
        sub = sub.repartition(*keys, "_gi", "_gj")
    grouped = (
        sub
        .groupBy(*keys, "_gi", "_gj")
        .agg(F.array_sort(F.collect_set("m")).alias("ids"))
        .where(F.size("ids") > 1)
    )
    ids = F.col("ids")

    def _pair(a, b):
        slot = F.struct(a.alias("ma"), b.alias("mb"))
        if pair_filter is None:
            return slot
        return F.when(pair_filter(a["it"], b["it"]), slot)

    # Diagonal groups hold one salt's members → triangular expansion (every
    # same-salt pair once). Off-diagonal groups emit ONLY cross-salt pairs —
    # |la|×|lb| generated directly, so no within-salt pair is ever built
    # just to be filtered (that waste measured ~2× on a wide-bucket corpus).
    tri = F.flatten(
        F.transform(
            ids,
            lambda a, i: F.transform(
                F.slice(ids, i + F.lit(2), F.greatest(F.size(ids) - i - 1, F.lit(0))),
                lambda b: _pair(a, b),
            ),
        )
    )
    la = F.filter(ids, lambda m: m["s"] == F.col("_gi"))
    lb = F.filter(ids, lambda m: m["s"] == F.col("_gj"))
    cross = F.flatten(
        F.transform(
            la,
            lambda a: F.transform(
                lb,
                lambda b: F.when(a["it"] < b["it"], _pair(a, b)).otherwise(
                    _pair(b, a)
                ),
            ),
        )
    )
    expanded = F.when(F.col("_gi") == F.col("_gj"), tri).otherwise(cross)
    if pair_filter is not None:
        # drop the NULL slots of filtered pairs before they become rows
        expanded = F.filter(expanded, lambda q: q.isNotNull())
    return grouped.select(F.explode(expanded).alias("q")).select(
        F.struct(F.col("q.ma.it").alias("a"), F.col("q.mb.it").alias("b")).alias("p")
    )


def bucket_width_stats(bands: DataFrame, keys: list[str]) -> DataFrame:
    """Ops/audit view of the bucket-width distribution feeding
    :func:`bucket_pairs` — how much of the corpus salts at the current
    cap."""
    widths = bands.groupBy(*keys).agg(F.count(F.lit(1)).alias("width"))
    return widths.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("width").alias("max_width"),
        F.sum(F.when(F.col("width") > LSH_MAX_BUCKET, 1).otherwise(0)).alias(
            "n_over_cap"
        ),
    )
