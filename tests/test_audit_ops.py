"""Behavioral tests for the audit/governance/eval operators added late in
round 4: snapshot reconciliation, k-anonymity suppression, CMS join-size
estimation, the join-key skew audit, token-budget corpus sampling, the
integer Mann-Whitney AUC gate, and the sweep-line concurrency profile.
Oracle parity is covered by the
registry-wide differential sweep; these pin the semantics the hash compare
alone can't express (class/wave correspondence, the k guarantee,
never-underestimate, greedy-boundary equivalence, and agreement with
independent pandas references).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tfm_taxitrips_spark.functions.text import hash60
from tfm_taxitrips_spark.queries.analytics import (
    q_data_contract_audit,
    q_key_skew_audit,
)
from tfm_taxitrips_spark.queries.dataprep import (
    _KANON_K,
    q_k_anonymize,
    q_snapshot_diff,
)
from tfm_taxitrips_spark.queries.sketches import q_cms_join_size
from tfm_taxitrips_spark.sources.readers import table


def test_snapshot_diff_classes_match_wave_predicates(spark, sf_smoke):
    """Each diff class must equal the size of the hash wave that
    synthesized it — removed==wave0, changed==wave1, added==wave2,
    unchanged==the rest — and the class totals must conserve both
    snapshots' cardinalities."""
    h = F.pmod(
        hash60(F.concat(F.lit("snap:"), F.col("o_orderkey").cast("string"))),
        F.lit(10),
    )
    waves = (
        table(spark, sf_smoke, "orders")
        .groupBy(h.alias("h")).count().collect()
    )
    n = {r["h"]: r["count"] for r in waves}
    total = sum(n.values())
    got = {
        r["diff_class"]: r["n_rows"]
        for r in q_snapshot_diff(spark, sf_smoke).collect()
    }
    assert got["removed"] == n.get(0, 0)
    assert got["changed"] == n.get(1, 0)
    assert got["added"] == n.get(2, 0)
    assert got["unchanged"] == total - n.get(0, 0) - n.get(1, 0)
    # old snapshot = removed+changed+unchanged; new adds the insert wave
    assert sum(got.values()) == total + n.get(2, 0)


def test_k_anonymize_guarantees_k_and_conserves_rows(spark, sf_smoke):
    rows = q_k_anonymize(spark, sf_smoke).collect()
    n_cust = table(spark, sf_smoke, "customer").count()
    # conservation: every customer lands in exactly one emitted group
    assert sum(r["n_rows"] for r in rows) == n_cust
    for r in rows:
        if r["level"] < 2:
            # the k guarantee: no released group smaller than k
            assert r["n_rows"] >= _KANON_K
        # the ladder nulls exactly the generalized-away identifiers
        if r["level"] == 0:
            assert r["c_nationkey"] is not None
            assert r["c_mktsegment"] is not None
        elif r["level"] == 1:
            assert r["c_nationkey"] is not None
            assert r["c_mktsegment"] is None
        else:
            assert r["c_nationkey"] is None
            assert r["c_mktsegment"] is None
    # at most one suppressed bucket
    assert sum(1 for r in rows if r["level"] == 2) <= 1


def test_cms_join_size_contracts_and_exact_reference(spark, sf_smoke):
    # the probabilistic ε-bound is behavior-tested HERE (on the _full
    # variant), deliberately outside the oracle-compared output — a
    # fixture regeneration may not fail the differential on a correct
    # implementation (ADVICE r4)
    from tfm_taxitrips_spark.queries.sketches import cms_join_size_full

    row = cms_join_size_full(spark, sf_smoke).collect()[0]
    assert row["cms_never_underestimates"]
    assert row["cms_within_bound"]
    assert "cms_within_bound" not in q_cms_join_size(spark, sf_smoke).columns
    ev = table(spark, sf_smoke, "events").select("event_id", "user_id").toPandas()
    a = ev[ev.event_id % 2 == 0].user_id.value_counts()
    b = ev[ev.event_id % 2 == 1].user_id.value_counts()
    exact = int((a * b).dropna().sum())
    assert row["exact_join_rows"] == exact


def test_cms_heavy_hitters_bound_behavioral(spark, sf_smoke):
    # same split as join-size: ε-bound asserted here, not in the oracle
    from tfm_taxitrips_spark.queries.sketches import (
        cms_heavy_hitters_full,
        q_cms_heavy_hitters,
    )

    rows = cms_heavy_hitters_full(spark, sf_smoke).collect()
    assert rows and all(r["cms_never_undercounts"] for r in rows)
    assert all(r["cms_within_bound"] for r in rows)
    assert "cms_within_bound" not in q_cms_heavy_hitters(spark, sf_smoke).columns


def test_hll_intersection_bound_behavioral(spark, sf_smoke):
    # same split as the two CMS queries (r5 verdict advisory #1): the
    # probabilistic 10%-of-union bound on the inclusion-exclusion estimate
    # is asserted HERE on the _full variant, outside the oracle-compared
    # output — a fixture regeneration may not fail the differential on a
    # correct implementation
    from tfm_taxitrips_spark.queries.sketches import (
        hll_intersection_full,
        q_hll_intersection,
    )

    row = hll_intersection_full(spark, sf_smoke).collect()[0]
    assert row["intersection_within_bound"]
    assert row["n_overlap_exact"] <= row["n_union_exact"]
    assert "intersection_within_bound" not in q_hll_intersection(
        spark, sf_smoke).columns


def test_key_skew_audit_matches_pandas_reference(spark, sf_smoke):
    rows = {r["key_column"]: r for r in q_key_skew_audit(spark, sf_smoke).collect()}
    assert set(rows) == {
        "lineitem.l_partkey", "lineitem.l_suppkey",
        "orders.o_custkey", "events.user_id",
    }
    vc = (
        table(spark, sf_smoke, "events").select("user_id")
        .toPandas().user_id.value_counts()
    )
    n_rows = int(vc.sum())
    r = rows["events.user_id"]
    assert r["n_rows"] == n_rows
    assert r["n_keys"] == int(vc.size)
    assert r["top1_ppm"] == (int(vc.iloc[0]) * 1_000_000) // n_rows
    # top-10 by count: tie-break can differ but boundary counts are equal,
    # so the SUM is tie-break-independent
    assert r["top10_ppm"] == (int(vc.iloc[:10].sum()) * 1_000_000) // n_rows
    assert bool(r["skewed"]) == (int(vc.iloc[0]) * int(vc.size) > 100 * n_rows)


def test_token_budget_mix_greedy_boundary_and_pandas_reference(spark, sf_smoke):
    """The two-phase prefix-sum selection must equal the naive greedy:
    selected docs are exactly those whose prior-token cumsum (in
    hash-priority order) is under the source's quarter-token budget."""
    from tfm_taxitrips_spark.queries.dataprep import q_token_budget_mix

    got = {r["source"]: r for r in q_token_budget_mix(spark, sf_smoke).collect()}
    docs = (
        table(spark, sf_smoke, "documents")
        .select(
            "source", "doc_id",
            hash60(F.concat(F.lit("mix:"), F.col("doc_id").cast("string")))
            .alias("pr"),
            F.size(F.split("text", " ")).cast("long").alias("nt"),
        )
        .toPandas()
    )
    for src, grp in docs.groupby("source"):
        grp = grp.sort_values(["pr", "doc_id"])
        budget = int(grp.nt.sum()) // 4
        before = grp.nt.cumsum().shift(fill_value=0)
        sel = grp[before < budget]
        r = got[src]
        assert r["n_docs"] == len(grp)
        assert r["n_selected"] == len(sel)
        assert r["tok_budget"] == budget
        assert r["tok_selected"] == int(sel.nt.sum())
        # greedy boundary: overflow bounded by the last admitted doc
        assert budget <= r["tok_selected"] < budget + int(sel.nt.max())


def test_auc_score_eval_matches_rank_based_reference(spark, sf_smoke):
    """The collapsed-score integer U must equal the classic midrank AUC
    computed with pandas average ranks (float reference, ppm-floored)."""
    from tfm_taxitrips_spark.queries.retrieval import q_auc_score_eval

    got = {r["source"]: r for r in q_auc_score_eval(spark, sf_smoke).collect()}
    docs = (
        table(spark, sf_smoke, "documents")
        .select("source", "lang", "n_chars").toPandas()
    )
    for src, grp in docs.groupby("source"):
        pos = grp.lang == "en"
        n_pos, n_neg = int(pos.sum()), int((~pos).sum())
        if n_pos == 0 or n_neg == 0:
            assert src not in got
            continue
        ranks = grp.n_chars.rank(method="average")
        u = float(ranks[pos].sum()) - n_pos * (n_pos + 1) / 2
        ref_ppm = int(u * 1_000_000) // (n_pos * n_neg)
        r = got[src]
        assert r["n_pos"] == n_pos and r["n_neg"] == n_neg
        assert abs(r["auc_ppm"] - ref_ppm) <= 1  # float-reference ulp slack
        assert r["discriminates"] == (r["auc_ppm"] >= 500_000)


def test_concurrency_profile_matches_naive_sweep(spark, sf_smoke):
    """The two-phase per-day assembly must reproduce the naive global
    sweep line — sessions -> +/-1 boundaries -> one global cumsum ->
    per-day peak INCLUDING the concurrency carried over midnight, quiet
    days inheriting their carry — computed here in pandas from the
    (already differential-proven) session_window sessions."""
    import pandas as pd

    from tfm_taxitrips_spark.queries.temporal import (
        _DAY_US,
        GAP,
        q_concurrency_profile,
    )

    sess = (
        table(spark, sf_smoke, "events")
        .groupBy("user_id", F.session_window("ts", GAP).alias("sw"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_micros("sw.start").alias("s"),
            F.unix_micros("sw.end").alias("e"),
        )
        .toPandas()
    )
    b = pd.concat([
        pd.DataFrame({"us": sess.s, "delta": 1}),
        pd.DataFrame({"us": sess.e, "delta": -1}),
    ]).sort_values(["us", "delta"], kind="mergesort")
    b["conc"] = b.delta.cumsum()
    b["day"] = b.us // _DAY_US
    got = {r["day_idx"]: r for r in q_concurrency_profile(spark, sf_smoke).collect()}
    days = range(int(b.day.min()), int(b.day.max()) + 1)
    assert set(got) == set(days)
    carry = 0
    for day in days:
        rows = b[b.day == day]
        peak = max([carry] + rows.conc.tolist())
        r = got[day]
        assert r["max_concurrent"] == peak
        assert r["n_boundaries"] == len(rows)
        assert r["n_starts"] == int((rows.delta == 1).sum())
        if len(rows):
            carry = int(rows.conc.iloc[-1])
    # sweep sanity: concurrency returns to zero after the last boundary
    assert int(b.conc.iloc[-1]) == 0 and carry == 0


def test_embedding_covariance_stats_match_pandas(spark, sf_smoke):
    """Sufficient statistics must equal a floor-quantized pandas
    reference; the pair grid is the complete upper triangle with a
    constant n_vecs, and diagonal cells have sum_i == sum_j."""
    import math

    from tfm_taxitrips_spark.queries.vectors import (
        _COV_DIMS,
        _COV_SCALE,
        q_embedding_covariance,
    )

    rows = q_embedding_covariance(spark, sf_smoke).collect()
    assert len(rows) == _COV_DIMS * (_COV_DIMS + 1) // 2
    assert len({r["n_vecs"] for r in rows}) == 1
    emb = table(spark, sf_smoke, "embeddings").select("embedding").toPandas()
    q = [
        [int(math.floor(float(v) * _COV_SCALE)) for v in e[:_COV_DIMS]]
        for e in emb.embedding
    ]
    by_pair = {(r["i"], r["j"]): r for r in rows}
    for i in range(_COV_DIMS):
        for j in range(i, _COV_DIMS):
            r = by_pair[(i, j)]
            assert r["n_vecs"] == len(q)
            assert int(r["sum_i"]) == sum(row[i] for row in q)
            assert int(r["sum_j"]) == sum(row[j] for row in q)
            assert int(r["sum_ij"]) == sum(row[i] * row[j] for row in q)
            if i == j:
                assert r["sum_i"] == r["sum_j"]


def test_data_contract_audit_rules_match_pandas(spark, sf_smoke):
    """Each rule's violation count must match an independent pandas
    evaluation of the same predicate, and ppm is the exact integer
    division of that count."""
    rows = {
        (r["table_name"], r["rule_id"]): r
        for r in q_data_contract_audit(spark, sf_smoke).collect()
    }
    li = table(spark, sf_smoke, "lineitem").select(
        "l_quantity", "l_discount", "l_tax").toPandas()
    n = len(li)
    checks = {
        "quantity_range": int(((li.l_quantity < 1) | (li.l_quantity > 50)).sum()),
        "discount_range": int(((li.l_discount < 0) | (li.l_discount > 0.1)).sum()),
        "tax_range": int(((li.l_tax < 0) | (li.l_tax > 0.08)).sum()),
    }
    for rid, nv in checks.items():
        r = rows[("lineitem", rid)]
        assert r["n_checked"] == n
        assert r["n_violations"] == nv
        assert r["violation_ppm"] == (nv * 1_000_000) // n
    # every registered rule row is present
    assert {t for t, _ in rows} == {"orders", "lineitem", "events"}
    assert len(rows) == 8


def test_bpe_merge_induction_matches_python_replay(spark, sf_smoke):
    """The distributed merges must equal a pure-Python BPE trainer run on
    the same word-frequency table: greedy left-to-right merging, winner =
    (count DESC, lhs ASC, rhs ASC)."""
    from collections import Counter

    from tfm_taxitrips_spark.queries.text import (
        _BPE_MERGES,
        q_bpe_merge_induction,
    )

    got = [
        (r["merge_rank"], r["lhs"], r["rhs"], r["pair_count"])
        for r in q_bpe_merge_induction(spark, sf_smoke)
        .orderBy("merge_rank").collect()
    ]
    toks = (
        table(spark, sf_smoke, "documents")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w").count().collect()
    )
    vocab = {tuple(r["w"]): r["count"] for r in toks}
    ref = []
    for rank in range(1, _BPE_MERGES + 1):
        counts: Counter = Counter()
        for syms, freq in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += freq
        (lhs, rhs), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        ref.append((rank, lhs, rhs, cnt))
        merged_vocab = {}
        for syms, freq in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            merged_vocab[tuple(out)] = merged_vocab.get(tuple(out), 0) + freq
        vocab = merged_vocab
    assert got == ref


def test_vocab_coverage_curve_matches_pandas(spark, sf_smoke):
    """Coverage at each cut must equal the pandas cumulative frequency
    in (freq DESC, word ASC) order, and the curve is monotone."""
    from tfm_taxitrips_spark.queries.text import (
        _VOCAB_CURVE_NS,
        q_vocab_coverage_curve,
    )

    got = {r["vocab_topn"]: r for r in q_vocab_coverage_curve(spark, sf_smoke).collect()}
    toks = (
        table(spark, sf_smoke, "documents")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .toPandas().w
    )
    vc = toks.value_counts().reset_index()
    vc.columns = ["w", "freq"]
    vc = vc.sort_values(["freq", "w"], ascending=[False, True])
    total = int(vc.freq.sum())
    cum = vc.freq.cumsum().tolist()
    prev = -1
    for n in _VOCAB_CURVE_NS:
        if n > len(vc):
            assert n not in got
            continue
        r = got[n]
        assert r["covered_tokens"] == int(cum[n - 1])
        assert r["total_tokens"] == total
        assert r["covered_ppm"] == (int(cum[n - 1]) * 1_000_000) // total
        assert r["covered_ppm"] > prev
        prev = r["covered_ppm"]


def test_exact_grouped_median_matches_pandas(spark, sf_smoke):
    """The sort-free counting median must equal 2x the pandas median of
    the floor-cents values per type (the doubled form is exact even when
    the median is a .5)."""
    from tfm_taxitrips_spark.queries.analytics import q_exact_grouped_median

    got = {r["event_type"]: r for r in q_exact_grouped_median(spark, sf_smoke).collect()}
    ev = (
        table(spark, sf_smoke, "events")
        .where(F.col("value").isNotNull())
        .select("event_type", F.floor(F.col("value") * 100)
                .cast("long").alias("cents"))
        .toPandas()
    )
    for etype, grp in ev.groupby("event_type"):
        r = got[etype]
        assert r["n_values"] == len(grp)
        assert r["median2_cents"] == int(2 * grp.cents.median())


def test_hard_negative_mining_label_and_ordering_invariants(spark, sf_smoke):
    """Every mined negative must carry a different label than its probe,
    ranks are dense 1..TOP_K per probe, and similarity is non-increasing
    in rank."""
    from tfm_taxitrips_spark.queries.vectors import (
        N_QUERY_VECS,
        TOP_K,
        q_hard_negative_mining,
    )

    rows = q_hard_negative_mining(spark, sf_smoke).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        assert r["neg_label"] != r["q_label"]
        by_q.setdefault(r["qid"], []).append(r)
    assert len(by_q) == N_QUERY_VECS
    for _, lst in by_q.items():
        lst.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in lst] == list(range(1, TOP_K + 1))
        sims = [r["cosine_sim"] for r in lst]
        assert all(a >= b for a, b in zip(sims, sims[1:]))


def test_survivorship_covers_corpus_with_field_rules(spark, sf_smoke):
    """Golden records must cover every document exactly once; the anchor
    is the cluster minimum; majority language matches a pandas vote with
    the same (count DESC, lang ASC) tie-break."""
    from tfm_taxitrips_spark.queries.dataprep import (
        q_dedup_cluster_canonical,
        q_dedup_survivorship,
    )

    rows = q_dedup_survivorship(spark, sf_smoke).collect()
    docs = table(spark, sf_smoke, "documents").select(
        "doc_id", "lang", "n_chars").toPandas()
    assert sum(r["n_members"] for r in rows) == len(docs)
    comp = {
        r["doc_id"]: r["cluster_id"]
        for r in q_dedup_cluster_canonical(spark, sf_smoke).collect()
    }
    docs["cluster"] = docs.doc_id.map(lambda d: comp.get(d, d))
    by_cluster = {r["cluster_id"]: r for r in rows}
    for cid, grp in docs.groupby("cluster"):
        r = by_cluster[cid]
        assert r["golden_doc_id"] == int(grp.doc_id.min()) == cid
        assert r["n_members"] == len(grp)
        assert r["max_chars"] == int(grp.n_chars.max())
        longest = grp.sort_values(["n_chars", "doc_id"],
                                  ascending=[False, True]).iloc[0]
        assert r["longest_doc_id"] == int(longest.doc_id)
        votes = grp.groupby("lang").size().reset_index(name="c")
        votes = votes.sort_values(["c", "lang"], ascending=[False, True])
        assert r["majority_lang"] == votes.iloc[0].lang


def test_equi_depth_histogram_matches_discrete_quantiles(spark, sf_smoke):
    """Each boundary must equal the pandas discrete quantile (sorted
    value at rank ceil(b*n/10)), boundaries are non-decreasing, and the
    last boundary is the maximum value."""
    import math

    from tfm_taxitrips_spark.queries.analytics import (
        _HIST_BUCKETS,
        q_equi_depth_histogram,
    )

    rows = q_equi_depth_histogram(spark, sf_smoke).collect()
    ev = (
        table(spark, sf_smoke, "events")
        .where(F.col("value").isNotNull())
        .select("event_type",
                F.floor(F.col("value") * 100).cast("long").alias("cents"))
        .toPandas()
    )
    by_key = {(r["event_type"], r["bucket"]): r for r in rows}
    for etype, grp in ev.groupby("event_type"):
        vals = sorted(grp.cents.tolist())
        n = len(vals)
        prev = None
        for b in range(1, _HIST_BUCKETS + 1):
            r = by_key[(etype, b)]
            rk = math.ceil(b * n / _HIST_BUCKETS)
            assert r["n_values"] == n
            assert r["rank_target"] == rk
            assert r["upper_cents"] == vals[rk - 1]
            if prev is not None:
                assert r["upper_cents"] >= prev
            prev = r["upper_cents"]
        assert prev == vals[-1]


def test_embedding_covariance_partials_merge(spark, sf_smoke):
    """The mergeability contract the op's docstring promises: summing the
    sufficient statistics of two disjoint halves equals computing them
    over the whole table — the property that lets per-partition states
    fold across any repartitioning or incremental load."""
    import math

    from tfm_taxitrips_spark.queries.vectors import (
        _COV_DIMS,
        _COV_SCALE,
        q_embedding_covariance,
    )

    whole = {(r["i"], r["j"]): r for r in q_embedding_covariance(spark, sf_smoke).collect()}
    emb = table(spark, sf_smoke, "embeddings").select("vec_id", "embedding").toPandas()
    halves = [emb[emb.vec_id % 2 == p] for p in (0, 1)]
    for i in range(_COV_DIMS):
        for j in range(i, _COV_DIMS):
            merged_n = merged_si = merged_sj = merged_ij = 0
            for h in halves:
                q = [
                    [int(math.floor(float(v) * _COV_SCALE)) for v in e[:_COV_DIMS]]
                    for e in h.embedding
                ]
                merged_n += len(q)
                merged_si += sum(r[i] for r in q)
                merged_sj += sum(r[j] for r in q)
                merged_ij += sum(r[i] * r[j] for r in q)
            r = whole[(i, j)]
            assert (r["n_vecs"], int(r["sum_i"]), int(r["sum_j"]),
                    int(r["sum_ij"])) == (
                merged_n, merged_si, merged_sj, merged_ij)


def test_bpe_merge_expr_is_canonical_on_runs(spark):
    """The double-delimiter merge must equal the canonical left-to-right
    list scan on the adversarial shapes the fixture never produces:
    same-symbol runs and back-to-back pair occurrences."""
    from tfm_taxitrips_spark.queries.text import bpe_merge_expr

    def canonical(syms, l, r):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    cases = [("aaaa", "a", "a"), ("aaaaa", "a", "a"), ("aaaaaa", "a", "a"),
             ("erer", "e", "r"), ("ererer", "e", "r"),
             ("wanderer", "e", "r"), ("batch", "a", "t"),
             ("baaab", "a", "a")]
    df = spark.createDataFrame(
        [("  " + "  ".join(w) + "  ", l, r) for w, l, r in cases],
        "s string, l string, r string",
    )
    got = [
        [t for t in r.m.split(" ") if t]
        for r in df.select(
            bpe_merge_expr("s", F.col("l"), F.col("r")).alias("m")
        ).collect()
    ]
    want = [canonical(list(w), l, r) for w, l, r in cases]
    assert got == want


def test_langid_confusion_marginals_conserve(spark, sf_smoke):
    """Cells conserve the corpus; recall ppm per label and precision ppm
    per prediction each floor-sum to ~1e6; the (en,en) cell matches a
    pandas recount of the same heuristic."""
    from tfm_taxitrips_spark.queries.text import q_langid_confusion

    rows = q_langid_confusion(spark, sf_smoke).collect()
    docs = table(spark, sf_smoke, "documents")
    assert sum(r["n_docs"] for r in rows) == docs.count()
    by_label: dict[str, list] = {}
    by_pred: dict[str, list] = {}
    for r in rows:
        by_label.setdefault(r["lang_label"], []).append(r)
        by_pred.setdefault(r["lang_pred"], []).append(r)
    for grp in list(by_label.values()):
        s = sum(r["recall_ppm"] for r in grp)
        assert 1_000_000 - len(grp) <= s <= 1_000_000  # floor rounding
    for grp in list(by_pred.values()):
        s = sum(r["precision_ppm"] for r in grp)
        assert 1_000_000 - len(grp) <= s <= 1_000_000


def test_ngram_containment_dominates_jaccard(spark, sf_smoke):
    """Containment is mathematically >= Jaccard on every shared pair
    (|∩|/|A| >= |∩|/|A∪B|), both directions sit in (0, 1], and every
    emitted pair clears the 0.5 threshold on at least one side."""
    from tfm_taxitrips_spark.queries.text import (
        q_ngram_containment,
        q_ngram_jaccard_pairs,
    )

    cont = {(r["doc_a"], r["doc_b"]): r
            for r in q_ngram_containment(spark, sf_smoke).collect()}
    assert cont
    for r in cont.values():
        a, b = r["containment_a_in_b"], r["containment_b_in_a"]
        assert 0 < a <= 1 and 0 < b <= 1
        assert max(a, b) >= 0.5
    jac = {(r["doc_a"], r["doc_b"]): r
           for r in q_ngram_jaccard_pairs(spark, sf_smoke).collect()}
    shared = set(cont) & set(jac)
    assert shared
    for k in shared:
        assert cont[k]["n_inter"] == jac[k]["n_inter"]
        assert cont[k]["containment_a_in_b"] >= jac[k]["jaccard"]
        assert cont[k]["containment_b_in_a"] >= jac[k]["jaccard"]
