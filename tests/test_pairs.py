"""Bounded bucket→pair generation (operators/pairs.bucket_pairs).

The scale guard for the LSH dedup family: a degenerate corpus collapsing
into one mega-bucket must neither OOM a single task (salting distributes
the O(width²) expansion) nor change the emitted pair set (salting is an
execution strategy, not a semantic cap).
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from tfm_taxitrips_spark.operators.pairs import bucket_pairs, bucket_width_stats


def _bands(spark, widths):
    """One row per (bucket, item): bucket b gets items b*100000+0..w-1."""
    rows = [
        (b, b * 100_000 + i) for b, w in enumerate(widths) for i in range(w)
    ]
    return spark.createDataFrame(rows, "bucket int, item long")


def _expected(widths):
    return {
        (b * 100_000 + i, b * 100_000 + j)
        for b, w in enumerate(widths)
        for i, j in combinations(range(w), 2)
    }


def _got(bands, max_width):
    out = bucket_pairs(bands, ["bucket"], F.col("item"), max_width=max_width)
    return {
        (r.a, r.b)
        for r in out.select(F.col("p.a").alias("a"), F.col("p.b").alias("b")).collect()
    }


def test_adversarial_mega_bucket(spark):
    """All docs identical → ONE bucket far above the cap. Must complete by
    salting into sub-buckets and still emit every pair exactly once."""
    n = 1200  # > 2 × LSH_MAX_BUCKET
    bands = _bands(spark, [n])
    out = bucket_pairs(bands, ["bucket"], F.col("item"))
    pairs = out.select(F.col("p.a").alias("a"), F.col("p.b").alias("b")).collect()
    assert len(pairs) == n * (n - 1) // 2  # exactly once each — no dup rows
    assert {(r.a, r.b) for r in pairs} == _expected([n])


def test_tiny_cap_exercises_salting_exactly(spark):
    """cap=3 over mixed widths: heavy salting, same pair set as uncapped."""
    widths = [1, 2, 3, 10, 40]
    bands = _bands(spark, widths)
    assert _got(bands, max_width=3) == _expected(widths)


def test_narrow_buckets_unaffected(spark):
    """Widths under the cap take the nsub=1 path — no fan-out rows, same
    pairs (the round-1 semantics)."""
    widths = [2, 5, 17]
    bands = _bands(spark, widths)
    assert _got(bands, max_width=256) == _expected(widths)


def test_salted_plan_stays_single_lineage(spark):
    """The salting rewrite must not re-execute the bands lineage per
    branch (the rejected union design scanned the source 3×)."""
    bands = _bands(spark, [5, 600])
    out = bucket_pairs(bands, ["bucket"], F.col("item"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") <= 1


def test_bucket_width_stats(spark):
    bands = _bands(spark, [2, 600])
    row = bucket_width_stats(bands, ["bucket"]).collect()[0]
    assert row.n_buckets == 2
    assert row.max_width == 600
    assert row.n_over_cap == 1


def test_ngram_df_cap_drops_hot_shingle(spark, tmp_path):
    """Semantic pin for the q_ngram_jaccard_pairs df cap: a shingle shared
    by > NGRAM_DF_CAP documents must contribute ZERO pairs, while rare
    shared shingles still pair. Built on a synthetic corpus where every
    doc carries the same hot 3-gram and exactly two docs share a rare one."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tfm_taxitrips_spark.queries.text import NGRAM_DF_CAP, q_ngram_jaccard_pairs

    hot = "alpha beta gamma"  # one shared 3-word shingle in every doc
    n_docs = NGRAM_DF_CAP + 10
    texts = [f"{hot} unique{i} filler{i}" for i in range(n_docs)]
    # docs 0 and 1 additionally share a rare tail -> one true near-dup pair
    texts[0] = f"{hot} delta epsilon zeta eta"
    texts[1] = f"{hot} delta epsilon zeta eta"
    t = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * n_docs),
            "source": pa.array(["syn"] * n_docs),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    d = tmp_path / "hotcorpus"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))
    pairs = q_ngram_jaccard_pairs(spark, str(d)).collect()
    got = {(r.doc_a, r.doc_b) for r in pairs}
    assert got == {(0, 1)}, got


def test_minhash_estimator_tracks_exact_jaccard(spark, sf_smoke):
    """The estimator gate must be informative, not decorative: across the
    LSH candidate pairs the 16-perm estimate correlates strongly with
    exact Jaccard and its mean absolute error stays within the
    1/sqrt(16)=0.25 theoretical stderr (measured on the fixture:
    corr 0.86, MAE 0.21). If either pin fails, the signature constants
    regressed and the dedup pipeline would mis-delete at scale."""
    import pyspark.sql.functions as F

    from tfm_taxitrips_spark.queries.text import q_minhash_estimate_eval

    row = (
        q_minhash_estimate_eval(spark, sf_smoke)
        .agg(
            F.corr("est_jaccard", "exact_jaccard").alias("corr"),
            F.avg(F.abs(F.col("est_jaccard") - F.col("exact_jaccard"))).alias("mae"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()[0]
    )
    assert row.n > 10, "candidate set collapsed — LSH constants changed?"
    assert row.corr > 0.6, row
    assert row.mae < 0.3, row


def test_setsim_prefix_join_threshold_boundary(spark, tmp_path):
    """Boundary pin for q_setsim_prefix_join: pairs at exactly τ=0.8
    (4 shared of 5 union) are kept, pairs just below (4 of 6) dropped,
    identical docs score 1.0 — all found through the prefix filter."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tfm_taxitrips_spark.queries.text import q_setsim_prefix_join

    texts = [
        "a b c d e",   # 0: vs 1 -> 4/6 (<τ); vs 2 -> 4/5 (=τ)
        "a b c d f",   # 1: vs 2 -> 4/5 (=τ)
        "a b c d",     # 2
        "zz yy xx",    # 3: unrelated
        "p q r",       # 4: identical to 5 -> 1.0
        "p q r",       # 5
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["syn"] * len(texts)),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    d = tmp_path / "setsim"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))
    rows = q_setsim_prefix_join(spark, str(d)).collect()
    got = {(r.doc_a, r.doc_b): r.jaccard_ppm for r in rows}
    assert got == {(0, 2): 800000, (1, 2): 800000, (4, 5): 1000000}, got


def test_pair_filter_equals_post_filter(spark):
    """r18 ``pair_filter`` pushdown: filtering inside the expansion
    lambdas must emit exactly the pairs a post-hoc filter would keep —
    across both the narrow (tri) and salted (cross) branches."""
    widths = [1, 2, 5, 9]
    rows = [
        (b, b * 100_000 + i, (b + i) % 4)
        for b, w in enumerate(widths)
        for i in range(w)
    ]
    bands = spark.createDataFrame(rows, "bucket int, id long, sz int")
    item = F.struct("id", "sz")
    pf = lambda a, b: (a["sz"] + b["sz"]) % 3 == 0  # noqa: E731 symmetric
    for max_width in (512, 3):  # 3 forces salting (cross branch)
        pushed = {
            (r.a, r.b)
            for r in bucket_pairs(
                bands, ["bucket"], item, max_width=max_width, pair_filter=pf
            )
            .select(F.col("p.a.id").alias("a"), F.col("p.b.id").alias("b"))
            .collect()
        }
        post = {
            (r.a, r.b)
            for r in bucket_pairs(bands, ["bucket"], item, max_width=max_width)
            .where((F.col("p.a.sz") + F.col("p.b.sz")) % 3 == 0)
            .select(F.col("p.a.id").alias("a"), F.col("p.b.id").alias("b"))
            .collect()
        }
        assert pushed == post, f"max_width={max_width}"
        assert pushed  # non-trivial: the predicate keeps some pairs


def test_join_strategy_pair_set_identical(spark):
    """r18 ``strategy="join"``: the co-partitioned self-join expansion
    must emit exactly the collect path's pair set — across narrow (tri),
    salted (cross), and pair_filter combinations — with the same
    a < b struct orientation (set compare on ordered tuples)."""
    widths = [1, 2, 3, 9, 40]
    rows = [
        (b, b * 100_000 + i, (b + i) % 4)
        for b, w in enumerate(widths)
        for i in range(w)
    ]
    bands = spark.createDataFrame(rows, "bucket int, id long, sz int")
    item = F.struct("id", "sz")
    pf = lambda a, b: (a["sz"] + b["sz"]) % 3 == 0  # noqa: E731 symmetric

    def pairs(strategy, max_width, pair_filter):
        return {
            (r.a, r.b)
            for r in bucket_pairs(
                bands, ["bucket"], item, max_width=max_width,
                pair_filter=pair_filter, strategy=strategy,
            )
            .select(F.col("p.a.id").alias("a"), F.col("p.b.id").alias("b"))
            .collect()
        }

    for max_width in (512, 3):  # 3 forces salting (off-diagonal groups)
        for filt in (None, pf):
            got = pairs("join", max_width, filt)
            want = pairs("collect", max_width, filt)
            assert got == want, f"max_width={max_width} filt={filt}"
            assert want  # non-trivial fixture


def test_unknown_strategy_raises(spark):
    import pytest as _pytest

    bands = _bands(spark, [3])
    with _pytest.raises(ValueError, match="strategy"):
        bucket_pairs(bands, ["bucket"], F.col("item"), strategy="nope").collect()


def test_join_strategy_expansion_not_aqe_coalescible(spark):
    """r18: the join-strategy expansion must hash-spread its group key
    with an EXPLICIT partition count (REPARTITION_BY_NUM) — AQE coalesces
    shuffles on input bytes and cannot see that the join's output is the
    quadratic pair expansion, so a coalescible exchange funnels the whole
    emission (and the map-side half of any downstream distinct) through
    one task (measured: all 28.7M sf0.1 set-similarity pairs in
    partition 0 before the pin)."""
    from tfm_taxitrips_spark.plans.explain import explain_formatted

    rows = [(t % 5, t * 31 % 97, t % 7) for t in range(80)]
    bands = spark.createDataFrame(rows, "bucket int, id long, sz int")
    df = bucket_pairs(
        bands, ["bucket"], F.struct("id", "sz"), strategy="join")
    plan = explain_formatted(df)
    assert "REPARTITION_BY_NUM" in plan
    # and the expansion actually spreads: with >1 shuffle partition the
    # pair output must occupy more than one partition on a multi-bucket
    # input (the regression ran everything in partition 0)
    n_parts = (
        df.select(F.spark_partition_id().alias("p"))
        .where(F.col("p") >= 0).distinct().count()
    )
    assert n_parts > 1, "pair expansion collapsed to a single partition"


def test_collect_strategy_expansion_not_aqe_coalescible(spark):
    """r19 (ADVICE r18): the collect-strategy expansion gets the SAME
    explicit-count protection — its repartition carried no count, so AQE
    could coalesce the compact banded exchange and run every group's
    quadratic in-task array expansion on one core."""
    from tfm_taxitrips_spark.plans.explain import explain_formatted

    rows = [(t % 5, t * 31 % 97, t % 7) for t in range(80)]
    bands = spark.createDataFrame(rows, "bucket int, id long, sz int")
    df = bucket_pairs(
        bands, ["bucket"], F.struct("id", "sz"), strategy="collect")
    plan = explain_formatted(df)
    assert "REPARTITION_BY_NUM" in plan
    n_parts = (
        df.select(F.spark_partition_id().alias("p"))
        .where(F.col("p") >= 0).distinct().count()
    )
    assert n_parts > 1, "pair expansion collapsed to a single partition"
    # the adaptive opt-out (narrow-by-design callers, e.g. LSH banding)
    # keeps the coalescible column form — same pair set either way
    df_a = bucket_pairs(
        bands, ["bucket"], F.struct("id", "sz"), strategy="collect",
        spread="adaptive")
    assert "REPARTITION_BY_NUM" not in explain_formatted(df_a)
    assert sorted(map(str, df.collect())) == sorted(map(str, df_a.collect()))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="spread"):
        bucket_pairs(bands, ["bucket"], F.struct("id", "sz"),
                     spread="nope")
