"""Behavioral tests for the round-9 operators: pair-level label leakage,
the per-source dedup dashboard, the GK quantile drift gate, the Zipf
octave profile, and embedding whitening stats. Oracle parity is covered
by the registry-wide differential sweep; these pin the semantics a hash
compare against a formula-sharing oracle can't falsify (planted-pair
recovery, the DF-cap exclusion, injected exact dups, the type-1 rank
quantile on planted values, and the sufficient-statistics identity).
"""

from __future__ import annotations

import os

import pandas as pd

from tfm_taxitrips_spark.queries.dataprep import (
    LEAK_DF_CAP,
    LEAK_THRESHOLD_PPM,
    q_label_leakage_audit,
)
from tfm_taxitrips_spark.queries.sketches import (
    _DRIFT_QS_PPM,
    q_quantile_drift_gate,
)
from tfm_taxitrips_spark.queries.text import (
    per_source_dedup_rate_frame,
    q_zipf_vocab_fit,
)
from tfm_taxitrips_spark.queries.vectors import (
    _WHITEN_TOP_OFFENDERS,
    q_embedding_whitening_stats,
)


def _write_documents(tmp_path, rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    pdf["doc_id"] = pdf["doc_id"].astype("int64")
    pdf["lang"] = "en"
    pdf["n_chars"] = pdf["text"].str.len().astype("int64")
    pdf = pdf[["doc_id", "text", "lang", "source", "n_chars"]]
    pdf.to_parquet(os.path.join(tmp_path, "documents.parquet"))


def test_label_leakage_planted_pairs_and_df_cap(spark, tmp_path):
    """Planted corpus: an eval doc copied verbatim from one train doc must
    surface as exactly that pair at 10⁶ ppm; an eval doc with minority
    overlap stays below the threshold; and an eval doc made ONLY of a
    boilerplate 5-gram planted in > LEAK_DF_CAP train docs must vanish
    entirely — the Zipf-head exclusion is semantics, not a heuristic."""
    unique = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    other = "one two three four five six seven eight nine ten"
    boiler = "the quick brown fox jumps"
    rows = [
        (1, unique, "src0"),            # eval: verbatim copy of train 100
        (2, other + " zz yy xx ww vv uu tt ss rr qq", "src1"),  # low overlap
        (3, boiler, "src0"),            # eval: only the boilerplate 5-gram
        (100, unique, "src5"),          # train: the leaking doc
        (101, other + " aa bb cc dd ee ff gg hh ii jj", "src6"),
    ]
    # plant the boilerplate shingle in > LEAK_DF_CAP distinct train docs
    for k in range(LEAK_DF_CAP + 6):
        rows.append((200 + k, f"{boiler} filler{k} pad{k} tail{k}", "src7"))
    _write_documents(tmp_path, rows)
    out = q_label_leakage_audit(spark, str(tmp_path)).toPandas()
    out = out.sort_values(["eval_doc_id", "train_doc_id"]).reset_index(drop=True)
    # only the verbatim pair survives: doc 2's overlap with 101 is below
    # threshold, doc 3's only shingle is over the DF cap
    assert list(map(tuple, out[["eval_doc_id", "train_doc_id"]].values)) == [
        (1, 100)
    ]
    assert int(out.loc[0, "containment_ppm"]) == 1_000_000
    assert int(out.loc[0, "n_common"]) == int(out.loc[0, "n_eval_shingles"])
    assert LEAK_THRESHOLD_PPM <= 1_000_000


def test_per_source_dedup_counts_injected_exact_dups(spark):
    """The committed fixture has zero identical texts, so the exact-dup
    leg can only be falsified with injected duplicates: two sources
    sharing one text (cross-source exact pair) plus an in-source pair,
    with a disjoint near-dup pair frame, must produce exactly the
    hand-counted dashboard rows — including the all-zero clean source."""
    docs = spark.createDataFrame(
        [
            (1, "same text", "sa"), (2, "same text", "sb"),  # cross-source
            (3, "twin", "sa"), (4, "twin", "sa"),            # in-source
            (5, "unique one", "sb"),
            (6, "unique two", "sc"),                          # clean source
        ],
        "doc_id bigint, text string, source string",
    )
    pairs = spark.createDataFrame(
        [(5, 6)], "doc_a bigint, doc_b bigint"  # near-dup but not exact
    )
    out = {
        r["source"]: r.asDict()
        for r in per_source_dedup_rate_frame(docs, pairs).collect()
    }
    assert out["sa"]["n_exact_dup"] == 3  # docs 1, 3, 4
    assert out["sb"]["n_exact_dup"] == 1  # doc 2
    assert out["sc"]["n_exact_dup"] == 0
    assert out["sb"]["n_near_dup"] == 1 and out["sc"]["n_near_dup"] == 1
    assert out["sb"]["n_cross_near_dup"] == 1  # 5's partner 6 is in sc
    assert out["sa"]["n_near_dup"] == 0
    assert out["sa"]["exact_dup_ppm"] == 1_000_000  # 3 of 3 docs
    assert out["sc"]["near_dup_ppm"] == 1_000_000


def test_quantile_drift_type1_rank_on_planted_values(spark, tmp_path):
    """Planted snapshots with hand-computable type-1 quantiles: old =
    {1..100} dollars, new = old shifted +10% exactly. Every monitored
    quantile must land on ceil(p·n)-th smallest cents, drift must be
    100 000 ppm (10%) everywhere, and the gate must fire."""
    rows = []
    for v in range(1, 101):
        rows.append((float(v), pd.Timestamp("1997-01-01")))      # old
        rows.append((float(v) * 1.1, pd.Timestamp("1999-01-01")))  # new
    pdf = pd.DataFrame(rows, columns=["l_extendedprice", "l_shipdate"])
    pdf["l_orderkey"] = pdf.index.astype("int64")
    pdf["l_partkey"] = 1
    pdf["l_suppkey"] = 1
    pdf["l_linenumber"] = pd.array([1] * len(pdf), dtype="int32")
    pdf["l_quantity"] = 1.0
    pdf["l_discount"] = 0.0
    pdf["l_tax"] = 0.0
    pdf["l_returnflag"] = "A"
    pdf["l_linestatus"] = "F"
    pdf.to_parquet(os.path.join(tmp_path, "lineitem.parquet"))
    out = q_quantile_drift_gate(spark, str(tmp_path)).toPandas()
    out = out.set_index("q_ppm")
    assert set(out.index) == set(_DRIFT_QS_PPM)
    for p in _DRIFT_QS_PPM:
        rank = (p * 100 + 999_999) // 1_000_000  # ceil(p·n), n = 100
        assert int(out.loc[p, "q_old_cents"]) == rank * 100
        assert int(out.loc[p, "q_new_cents"]) == rank * 110
        assert int(out.loc[p, "drift_ppm"]) == 100_000
        assert bool(out.loc[p, "drift_exceeds_2pct"])
        assert bool(out.loc[p, "gk_old_within_2pct"])
        assert bool(out.loc[p, "gk_new_within_2pct"])


def test_zipf_octaves_partition_the_vocabulary(spark, sf_smoke):
    """Structural invariants a hash compare can't localize: the octave
    buckets are contiguous from 0, each opens at rank 2^bucket, the word
    counts sum to the vocabulary size, and every ratio except the last
    is a positive integer ppm."""
    from pyspark.sql import functions as F

    from tfm_taxitrips_spark.functions.text import tokens
    from tfm_taxitrips_spark.sources.readers import table

    out = (
        q_zipf_vocab_fit(spark, sf_smoke).toPandas()
        .sort_values("bucket").reset_index(drop=True)
    )
    vocab = (
        table(spark, sf_smoke, "documents")
        .select(F.explode(tokens("text")).alias("w"))
        .select("w").distinct().count()
    )
    assert list(out["bucket"]) == list(range(len(out)))
    assert all(int(out.loc[b, "min_rank"]) == 2 ** b for b in out["bucket"])
    assert int(out["n_words"].sum()) == vocab
    assert out["mass_ratio_ppm"].iloc[:-1].gt(0).all()
    assert pd.isna(out["mass_ratio_ppm"].iloc[-1])


def test_whitening_stats_identity_and_selection(spark, sf_smoke):
    """The emitted strings must satisfy the sufficient-statistics identity
    cov_num = n·Σxᵢxⱼ − Σxᵢ·Σxⱼ in exact Python ints, diagonals must be
    non-negative (they are n²·variance numerators), and the offenders
    must be the top-|abs| off-diagonal cells."""
    out = q_embedding_whitening_stats(spark, sf_smoke).toPandas()
    diag = out[out["is_diagonal"] == 1]
    off = out[out["is_diagonal"] == 0]
    assert len(diag) == 8 and len(off) == _WHITEN_TOP_OFFENDERS
    assert (diag["i"] == diag["j"]).all() and (off["i"] < off["j"]).all()
    for _, r in out.iterrows():
        n, si, sj, sij = (int(r["n_vecs"]), int(r["sum_i"]),
                          int(r["sum_j"]), int(r["sum_ij"]))
        assert int(r["cov_num"]) == n * sij - si * sj
    assert (diag["cov_num"].map(int) >= 0).all()
    # independent reference: recompute every off-diagonal cov numerator in
    # exact Python ints from the raw parquet; the emitted offenders must
    # be the true top-|abs| cells under the (abs desc, i, j) total order
    import math

    emb = pd.read_parquet(f"{sf_smoke}/embeddings.parquet")
    qs = [
        [int(math.floor(float(x) * 1_000_000.0)) for x in v[:8]]
        for v in emb["embedding"]
    ]
    ref = {}
    for i in range(8):
        for j in range(i + 1, 8):
            n = len(qs)
            si = sum(q[i] for q in qs)
            sj = sum(q[j] for q in qs)
            sij = sum(q[i] * q[j] for q in qs)
            ref[(i, j)] = n * sij - si * sj
    want = sorted(ref, key=lambda k: (-abs(ref[k]), k))[:_WHITEN_TOP_OFFENDERS]
    got = sorted(
        map(tuple, off[["i", "j"]].values),
        key=lambda k: (-abs(ref[k]), k),
    )
    assert [tuple(map(int, k)) for k in got] == want
