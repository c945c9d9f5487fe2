"""Behavioral tests for the round-4 pipeline additions: split assignment,
inverted-index build, and SemDeDup pruning. Oracle parity for all three is
covered by the registry-wide differential sweep; these pin the semantics
the oracle comparison alone can't express (disjointness, stability, cap
enforcement, guard-path equivalence).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tfm_taxitrips_spark.plans.explain import explain_formatted

from tfm_taxitrips_spark.queries.dataprep import (
    _SPLIT_TRAIN_END,
    _SPLIT_VAL_END,
    q_dataset_split,
)
from tfm_taxitrips_spark.queries.retrieval import (
    IDX_MIN_DF,
    IDX_TOPK_POSTINGS,
    q_inverted_index,
)
from tfm_taxitrips_spark.queries.vectors import SEM_TAU, q_semantic_dedup
from tfm_taxitrips_spark.sources.readers import table


def test_dataset_split_is_disjoint_total_and_stable(spark, sf_smoke):
    docs_n = table(spark, sf_smoke, "documents").count()
    audit = q_dataset_split(spark, sf_smoke)
    # disjoint + total: per-(source,split) doc counts add back to the corpus
    assert audit.agg(F.sum("n_docs")).collect()[0][0] == docs_n
    # only the three split labels exist
    labels = {r["split"] for r in audit.select("split").distinct().collect()}
    assert labels <= {"train", "val", "test"}
    # stability: a second independent evaluation assigns identically
    again = q_dataset_split(spark, sf_smoke)
    assert sorted(map(tuple, audit.collect())) == sorted(
        map(tuple, again.collect())
    )
    # proportions: train dominates at the configured 90/5/5 boundaries
    by_split = {
        r["split"]: r["n"]
        for r in audit.groupBy("split").agg(F.sum("n_docs").alias("n")).collect()
    }
    assert by_split["train"] > by_split.get("val", 0)
    assert by_split["train"] > by_split.get("test", 0)
    assert _SPLIT_TRAIN_END < _SPLIT_VAL_END <= 100


def test_inverted_index_caps_and_ordering(spark, sf_smoke):
    idx = q_inverted_index(spark, sf_smoke).collect()
    per_term: dict[str, list] = {}
    for r in idx:
        per_term.setdefault(r["term"], []).append(r)
    for term, rows in per_term.items():
        assert len(rows) <= IDX_TOPK_POSTINGS
        assert all(r["df"] >= IDX_MIN_DF for r in rows)
        # impact ordering: rank follows (tf DESC, doc_id ASC)
        rows.sort(key=lambda r: r["rnk"])
        keys = [(-r["tf"], r["doc_id"]) for r in rows]
        assert keys == sorted(keys)


def test_semantic_dedup_salted_path_equals_plain_self_join(spark, sf_smoke):
    """The bucket_pairs-guarded pair stage must reproduce the naive
    within-cell self-join exactly (that equivalence is what lets the
    DuckDB oracle stay uncapped)."""
    from pyspark.sql import Window

    from tfm_taxitrips_spark.functions.similarity import as_double, cosine, dot, l2_norm
    from tfm_taxitrips_spark.queries.vectors import IVF_NLIST, N_QUERY_VECS

    emb = table(spark, sf_smoke, "embeddings")
    cents = emb.where(
        (F.col("vec_id") >= N_QUERY_VECS)
        & (F.col("vec_id") < N_QUERY_VECS + IVF_NLIST)
    ).select(
        (F.col("vec_id") - N_QUERY_VECS).alias("cid"),
        F.col("embedding").alias("c_embedding"),
    )
    scored = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id", "embedding", "cid",
        cosine(as_double("embedding"), as_double("c_embedding")).alias("c_sim"),
    )
    wv = Window.partitionBy("vec_id").orderBy(
        F.col("c_sim").desc(), F.col("cid").asc()
    )
    assign = (
        scored.withColumn("crn", F.row_number().over(wv))
        .where(F.col("crn") == 1)
        .select("cid", "vec_id", as_double("embedding").alias("emb"),
                l2_norm(as_double("embedding")).alias("nrm"))
    )
    a, b = assign.alias("a"), assign.alias("b")
    naive = (
        a.join(b, (F.col("a.cid") == F.col("b.cid"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.cid").alias("cid"),
            F.col("a.vec_id").alias("va"),
            F.col("b.vec_id").alias("vb"),
            (dot(F.col("a.emb"), F.col("b.emb"))
             / (F.col("a.nrm") * F.col("b.nrm"))).alias("sim"),
        )
        .where(F.col("sim") >= SEM_TAU)
        .groupBy("cid")
        .agg(F.count(F.lit(1)).alias("n_dup_pairs"),
             F.sum("vb").alias("vb_mass"))
    )
    naive_rows = {r["cid"]: (r["n_dup_pairs"]) for r in naive.collect()}
    audit = {
        r["cid"]: r["n_dup_pairs"]
        for r in q_semantic_dedup(spark, sf_smoke).collect()
        if r["n_dup_pairs"] > 0
    }
    assert naive_rows == audit


def test_semantic_dedup_prune_counts_consistent(spark, sf_smoke):
    for r in q_semantic_dedup(spark, sf_smoke).collect():
        # pruned docs are a subset of pair endpoints; counts can't exceed
        assert 0 <= r["n_pruned"] <= r["n_dup_pairs"]
        assert r["n_pruned"] <= r["n_members"]
        if r["n_dup_pairs"] == 0:
            assert r["n_pruned"] == 0 and r["pruned_checksum"] == 0


def test_random_projection_preserves_neighborhood_signal(spark, sf_smoke):
    """JL sanity: distances in 8-dim sketch space must correlate with
    64-dim distances (rank correlation well above chance on a sample) —
    the property that makes the sketch usable as an ANN pre-filter."""
    import math

    from tfm_taxitrips_spark.queries.vectors import RP_K, q_random_projection
    from tfm_taxitrips_spark.sources.readers import table

    emb = {
        r["vec_id"]: r["embedding"]
        for r in table(spark, sf_smoke, "embeddings").limit(40).collect()
    }
    proj = {
        r["vec_id"]: [r[f"proj_{j}"] for j in range(RP_K)]
        for r in q_random_projection(spark, sf_smoke).collect()
        if r["vec_id"] in emb
    }
    ids = sorted(emb)
    d_full, d_sk = [], []
    for i in range(0, len(ids) - 1, 2):
        a, b = ids[i], ids[i + 1]
        d_full.append(math.dist(emb[a], emb[b]))
        d_sk.append(math.dist(proj[a], proj[b]))
    # Spearman-ish: compare orderings pairwise
    concord = disc = 0
    for i in range(len(d_full)):
        for j in range(i + 1, len(d_full)):
            s = (d_full[i] - d_full[j]) * (d_sk[i] - d_sk[j])
            if s > 0:
                concord += 1
            elif s < 0:
                disc += 1
    assert concord > disc  # better than chance, robustly


def test_token_diversity_invariants(spark, sf_smoke):
    """Exact integer invariants of the diversity triple: TTR and shares
    are proper ppm fractions, Simpson concentration is bounded below by
    1/n_types (uniform) and above by the top-token share (Cauchy-Schwarz
    ordering survives the integer floors)."""
    from tfm_taxitrips_spark.queries.text import q_token_diversity

    rows = q_token_diversity(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_types"] <= r["n_tokens"]
        assert 0 < r["ttr_ppm"] <= 1_000_000
        assert 0 < r["simpson_ppm"] <= 1_000_000
        assert 0 < r["top_share_ppm"] <= 1_000_000
        # sum(c^2)/n^2 <= max_c/n exactly, and floor preserves <=
        assert r["simpson_ppm"] <= r["top_share_ppm"]
        # uniform lower bound: sum(p^2) >= 1/n_types (floor slack of 1)
        assert r["simpson_ppm"] >= 1_000_000 // r["n_types"] - 1


def test_fuzzy_editdist_blocking_finds_true_pairs_only(spark, sf_smoke):
    """FastSS completeness at k=1 on the fixture: a known distance-1 pair
    is found, everything emitted verifies at distance <= 1, pairs are
    canonical (a < b, no self-pairs, no duplicates)."""
    from tfm_taxitrips_spark.queries.dataprep import q_fuzzy_dedup_editdist

    rows = q_fuzzy_dedup_editdist(spark, sf_smoke).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r["cust_a"] < r["cust_b"]
        assert r["edit_dist"] <= 1
        key = (r["cust_a"], r["cust_b"])
        assert key not in seen
        seen.add(key)
    # names are Customer#NNNNNNNNN: ids 0 and 1 differ in the last digit
    assert (0, 1) in seen
    # distance-2 neighbours must not appear: ids differing in two digits
    assert (0, 11) not in seen


def test_fuzzy_editdist_plan_blocked_equi_join(spark, sf_smoke):
    """Candidate generation must be an equi join on the variant hash with
    the hot-variant guard as a broadcast anti-join — no cartesian or
    nested-loop path exists."""
    from tfm_taxitrips_spark.queries.dataprep import q_fuzzy_dedup_editdist

    plan = explain_formatted(q_fuzzy_dedup_editdist(spark, sf_smoke))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftAnti" in plan


def test_zorder_buckets_are_local_on_both_dims(spark, sf_smoke):
    """The payoff claim: a contiguous z-range (one file bucket) covers a
    SMALL min/max span on BOTH quantized dimensions, so zone maps prune
    range predicates on either column. A 1-D sort gives locality only on
    its leading key; z-order must keep the mean per-bucket span well
    under the full 16-bit domain on x AND y."""
    from tfm_taxitrips_spark.queries.analytics import Z_BITS, q_zorder_layout

    rows = q_zorder_layout(spark, sf_smoke).collect()
    assert rows
    by_bucket: dict[int, list[tuple[int, int]]] = {}
    for r in rows:
        qx = qy = 0
        for i in range(Z_BITS):
            qx |= ((r.zval >> (2 * i)) & 1) << i
            qy |= ((r.zval >> (2 * i + 1)) & 1) << i
        by_bucket.setdefault(r.file_bucket, []).append((qx, qy))
    domain = (1 << Z_BITS) - 1
    spans_x, spans_y = [], []
    for pts in by_bucket.values():
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        spans_x.append(max(xs) - min(xs))
        spans_y.append(max(ys) - min(ys))
    assert sum(spans_x) / len(spans_x) < domain / 4
    assert sum(spans_y) / len(spans_y) < domain / 4


def test_copurchase_output_invariants(spark, sf_smoke):
    """Support floor holds, pairs are canonically ordered, marginals
    bound support, and lift is the exact integer form."""
    from tfm_taxitrips_spark.queries.analytics import (
        BASKET_MINSUP,
        q_copurchase_lift,
    )

    rows = q_copurchase_lift(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert r.brand_a < r.brand_b
        assert r.support >= BASKET_MINSUP
        assert r.support <= min(r.n_a, r.n_b)
        assert r.lift_ppm > 0


def test_hybrid_fusion_scores_are_exact_rrf(spark, sf_smoke):
    """Every fused row carries at least one list rank, and rrf_ppb is
    exactly the integer RRF formula over the present ranks."""
    from tfm_taxitrips_spark.queries.retrieval import (
        FUSION_TOPK,
        RRF_K,
        q_hybrid_rank_fusion,
    )

    rows = q_hybrid_rank_fusion(spark, sf_smoke).collect()
    assert 0 < len(rows) <= FUSION_TOPK
    for r in rows:
        assert r.bm25_rnk is not None or r.ann_rnk is not None
        expect = 0
        if r.bm25_rnk is not None:
            expect += 10**9 // (RRF_K + r.bm25_rnk)
        if r.ann_rnk is not None:
            expect += 10**9 // (RRF_K + r.ann_rnk)
        assert r.rrf_ppb == expect


def test_cusum_closed_form_equals_recursion(spark, sf_smoke):
    """The windowed closed form S = C - min(0, running-min C) must equal
    the textbook recursion S_i = max(0, S_{i-1} + y_i) replayed
    sequentially, for both sides, on every type."""
    from collections import defaultdict

    from tfm_taxitrips_spark.queries.temporal import q_cusum_drift
    from tfm_taxitrips_spark.sources.readers import table
    import pyspark.sql.functions as F

    rows = q_cusum_drift(spark, sf_smoke).collect()
    hc = (
        table(spark, sf_smoke, "events")
        .groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("h"))
        .count()
        .collect()
    )
    series = defaultdict(dict)
    for r in hc:
        series[r.event_type][r.h] = r["count"]
    expect = {}
    for et, by_h in series.items():
        n = len(by_h)
        tot = sum(by_h.values())
        su = sd = 0
        for h in sorted(by_h):
            su = max(0, su + 2 * n * by_h[h] - 3 * tot)
            sd = max(0, sd + tot - 2 * n * by_h[h])
            expect[(et, h)] = (su, sd)
    assert rows
    for r in rows:
        assert (r.cusum_up, r.cusum_dn) == expect[(r.event_type, r.window_start)]


def test_mad_fence_matches_float_reference(spark, sf_smoke):
    """The integer fence 20000·d2 > 44478·mad4 must reproduce the float
    rule |x − med| > 3·1.4826·MAD computed naively in Python, and some
    segment must have both inliers and outliers on the fixture."""
    import statistics

    from tfm_taxitrips_spark.queries.analytics import q_mad_outlier_flags
    from tfm_taxitrips_spark.sources.readers import table
    import pyspark.sql.functions as F

    rows = q_mad_outlier_flags(spark, sf_smoke).collect()
    by_type: dict[str, list[int]] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r.cents)
    for r in rows:
        vals = by_type[r.event_type]
        med = statistics.median(vals)
        mad = statistics.median(abs(v - med) for v in vals)
        expect = abs(r.cents - med) > 3 * 1.4826 * mad
        assert r.is_outlier == expect, (r, med, mad)
    assert any(r.is_outlier for r in rows)
    assert any(not r.is_outlier for r in rows)


def test_twap_excludes_last_obs_and_divides_exactly(spark, sf_smoke):
    """span_us must equal last-first per (type, day), and twap_cents must
    be the floor of the exact weighted sum — recomputed naively."""
    from collections import defaultdict

    from tfm_taxitrips_spark.queries.temporal import q_time_weighted_avg
    from tfm_taxitrips_spark.sources.readers import table
    import math
    import pyspark.sql.functions as F

    ev = (
        table(spark, sf_smoke, "events")
        .select("event_type", F.date_trunc("day", "ts").alias("day"),
                F.unix_micros("ts").alias("us"), "event_id",
                F.floor(F.col("value") * 100).cast("long").alias("cents"))
        .collect()
    )
    series = defaultdict(list)
    for r in ev:
        series[(r.event_type, r.day)].append((r.us, r.event_id, r.cents))
    rows = q_time_weighted_avg(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        obs = sorted(series[(r.event_type, r.day)])
        assert r.n_obs == len(obs)
        wsum = sum(
            c * (obs[i + 1][0] - u)
            for i, (u, _e, c) in enumerate(obs[:-1])
        )
        span = obs[-1][0] - obs[0][0]
        assert r.span_us == span
        if span > 0:
            sign = 1 if wsum >= 0 else -1
            assert r.twap_cents == sign * (abs(wsum) // span)
        else:
            assert r.twap_cents is None


def test_attribution_credit_sums_to_unit_per_purchase(spark, sf_smoke):
    """Each attributed purchase's credits are equal shares of 1e6 (up to
    the div truncation: k·credit ≤ 1e6 < k·(credit+1)), every touch is a
    same-user click within the lookback, and n_touches matches the row
    count per purchase."""
    from collections import Counter

    from tfm_taxitrips_spark.queries.temporal import (
        ATTR_WINDOW_US,
        q_touch_attribution,
    )

    rows = q_touch_attribution(spark, sf_smoke).collect()
    assert rows
    per_purchase = Counter(r.purchase_id for r in rows)
    for r in rows:
        k = per_purchase[r.purchase_id]
        assert r.n_touches == k
        assert r.credit_ppm == 10**6 // k


def test_type_correlation_r2_in_range_and_symmetric_grid(spark, sf_smoke):
    """r2_bp stays within [-10000, 10000], every unordered type pair
    appears exactly once, and all pairs share the same densified hour
    count."""
    from tfm_taxitrips_spark.queries.analytics import q_type_correlation

    rows = q_type_correlation(spark, sf_smoke).collect()
    assert rows
    seen = set()
    n_hours = {r.n_hours for r in rows}
    assert len(n_hours) == 1  # same dense grid for every pair
    for r in rows:
        assert r.type_a < r.type_b
        assert (r.type_a, r.type_b) not in seen
        seen.add((r.type_a, r.type_b))
        if r.r2_bp is not None:
            assert -10000 <= r.r2_bp <= 10000


def test_decayed_engagement_is_exact_bitshift_sum(spark, sf_smoke):
    """Scores must equal the naive per-event 2^(H-age) sum and never
    include beyond-horizon contributions."""
    from collections import defaultdict

    from tfm_taxitrips_spark.queries.temporal import (
        DECAY_HORIZON_DAYS,
        q_decayed_engagement,
    )
    from tfm_taxitrips_spark.sources.readers import table
    import pyspark.sql.functions as F

    ev = (
        table(spark, sf_smoke, "events")
        .select("user_id", F.expr("unix_micros(ts) div 86400000000").alias("d"))
        .collect()
    )
    maxday = max(r.d for r in ev)
    expect: dict[int, int] = defaultdict(int)
    n_rec: dict[int, int] = defaultdict(int)
    for r in ev:
        age = maxday - r.d
        if age <= DECAY_HORIZON_DAYS:
            expect[r.user_id] += 1 << (DECAY_HORIZON_DAYS - age)
            n_rec[r.user_id] += 1
    rows = q_decayed_engagement(spark, sf_smoke).collect()
    assert {r.user_id: r.score for r in rows} == dict(expect)
    assert {r.user_id: r.n_recent for r in rows} == dict(n_rec)


def test_corpus_prep_waterfall_drops_at_each_stage(spark):
    """On a constructed corpus the report must drop the gate failure at
    stage 1, the exact duplicate at stage 2 (canonical = min doc_id),
    and place every survivor in exactly one split."""
    from tfm_taxitrips_spark.queries.dataprep import corpus_prep_report

    good = " ".join(f"word{i}" for i in range(30))  # passes the gate
    docs = spark.createDataFrame(
        [
            (1, "s1", good),
            (2, "s1", good),            # exact dup of doc 1 -> dropped
            (3, "s1", "too short"),     # fails the word-count gate
            (4, "s1", good + " tail"),  # distinct survivor
        ],
        "doc_id long, source string, text string",
    )
    [r] = corpus_prep_report(docs).collect()
    assert (r.n_raw, r.n_quality, r.n_dedup) == (4, 3, 2)
    assert r.n_train + r.n_val + r.n_test == r.n_dedup
    assert r.tok_final == 30 + 31
