"""Behavioral tests for the round-10 operators: the cross-domain bigram
likelihood matrix, stratified k-fold assignment, the ECE reliability
diagram, corpus-order n-gram novelty, and the PQ codebook. Oracle parity
is covered by the registry-wide differential sweep; these pin the
semantics a hash compare against a formula-sharing oracle can't falsify
(planted-count arithmetic, hash-membership stability, bin folding,
first-seen attribution, and an independent exact-integer PQ reference).
"""

from __future__ import annotations

import hashlib
import os

import pandas as pd

from tfm_taxitrips_spark.queries.dataprep import (
    _KFOLD_K,
    _SPLIT_TRAIN_END,
    _SPLIT_VAL_END,
    q_per_domain_perplexity_gate,
    q_stratified_kfold,
)
from tfm_taxitrips_spark.queries.text import (
    _ECE_BINS,
    _NOVELTY_N,
    q_ngram_novelty_rate,
    q_quality_ece,
)
from tfm_taxitrips_spark.queries.vectors import (
    PQ_ITERS,
    PQ_K,
    PQ_SEED_BASE,
    PQ_SUBDIM,
    PQ_SUBSPACES,
    q_embedding_pq_codebook,
)


def _hash60_py(s: str) -> int:
    """Python twin of functions.text.hash60 (first 60 md5 bits)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _split_bucket(doc_id: int) -> int:
    return _hash60_py(f"split:{doc_id}") % 100


def _ids_in_split(split: str, n: int, start: int = 0) -> list[int]:
    """First n doc_ids at/after ``start`` whose hash bucket lands in the
    requested split — the test's way to PLACE documents in splits
    without touching the one shared assignment rule."""
    out, i = [], start
    while len(out) < n:
        b = _split_bucket(i)
        lab = ("train" if b < _SPLIT_TRAIN_END
               else "val" if b < _SPLIT_VAL_END else "test")
        if lab == split:
            out.append(i)
        i += 1
    return out


def _write_documents(tmp_path, rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    pdf["doc_id"] = pdf["doc_id"].astype("int64")
    pdf["lang"] = "en"
    pdf["n_chars"] = pdf["text"].str.len().astype("int64")
    pdf = pdf[["doc_id", "text", "lang", "source", "n_chars"]]
    pdf.to_parquet(os.path.join(tmp_path, "documents.parquet"))


def test_perplexity_gate_planted_bigram_arithmetic(spark, tmp_path):
    """Planted two-source corpus with hand-computable smoothed masses:
    an eval doc verbatim from srcA's train text must score fully
    in-vocab under srcA and fully OOV under srcB, with every prob_ppm
    reproduced by the add-one formula in exact Python ints."""
    t_train, = _ids_in_split("train", 1)
    u_train, = _ids_in_split("train", 1, t_train + 1)
    e_val, = _ids_in_split("val", 1)
    text_a = "red green blue red green"   # bigrams: rg gb br rg
    text_b = "one two three four"
    rows = [
        (t_train, text_a, "srcA"),
        (u_train, text_b, "srcB"),
        (e_val, text_a, "srcA"),          # eval doc = srcA train verbatim
    ]
    _write_documents(tmp_path, rows)
    out = q_per_domain_perplexity_gate(spark, str(tmp_path)).toPandas()
    out = out.set_index(["train_source", "eval_source"])
    # srcA model: c(red green)=2, c(green blue)=1, c(blue red)=1;
    # heads red:2, green:1, blue:1 → V = 3
    a = out.loc[("srcA", "srcA")]
    assert int(a["n_bigrams"]) == 4 and int(a["n_oov"]) == 0
    exp = ((2 + 1) * 10**6 // (2 + 3)) * 2 \
        + ((1 + 1) * 10**6 // (1 + 3)) * 2
    assert int(a["sum_prob_ppm"]) == exp
    assert int(a["avg_prob_ppm"]) == exp // 4
    # srcB model: every eval bigram OOV, every head unseen, V = 3
    b = out.loc[("srcB", "srcA")]
    assert int(b["n_oov"]) == 4 and int(b["oov_ppm"]) == 1_000_000
    assert int(b["sum_prob_ppm"]) == 4 * ((0 + 1) * 10**6 // (0 + 3))


def test_kfold_assignment_is_hash_stable_and_grid_complete(spark, tmp_path):
    """Fold membership must equal the doc_id hash (stable under
    re-ingestion by construction), absent folds must surface as zero
    rows, and the balance audit must count them."""
    # one source with a single doc: 4 of 5 folds empty → balance 0
    rows = [(7, "lonely doc text here", "tiny")]
    # a source with enough docs to touch several folds
    for i in range(20):
        rows.append((100 + i, f"doc number {i} with words", "big"))
    _write_documents(tmp_path, rows)
    out = q_stratified_kfold(spark, str(tmp_path)).toPandas()
    assert len(out) == 2 * _KFOLD_K  # full grid
    tiny = out[out["source"] == "tiny"].set_index("fold")
    lone_fold = _hash60_py("fold:7") % _KFOLD_K
    assert int(tiny.loc[lone_fold, "n_docs"]) == 1
    assert int(tiny["n_docs"].sum()) == 1
    assert (tiny["balance_ppm"] == 0).all()  # min 0, max 1
    big = out[out["source"] == "big"].set_index("fold")
    for i in range(20):
        f = _hash60_py(f"fold:{100 + i}") % _KFOLD_K
        assert int(big.loc[f, "n_docs"]) >= 1
    ref = pd.Series([_hash60_py(f"fold:{100 + i}") % _KFOLD_K
                     for i in range(20)]).value_counts()
    assert int(big["fold_max_docs"].iloc[0]) == int(ref.max())
    assert int(big["fold_min_docs"].iloc[0]) == int(
        min([int(ref.get(f, 0)) for f in range(_KFOLD_K)]))


def test_ece_bin_folding_and_gap_arithmetic(spark, tmp_path):
    """Planted stopword ratios with hand-computable confidences: the
    saturated doc must fold into the last bin (not an 11th), every
    gap_mass must equal |Σconf − pos·10⁶|, and the scalar ece_ppm must
    be the doc-weighted gap mean."""
    rows = [
        # 10 tokens, 0 stopwords → conf 0, bin 0
        (1, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10", "s"),
        # 10 tokens, 6 stopwords → ratio 0.6 ≫ sat → conf 10⁶, bin last
        (2, "the a of and to in x y z zz", "s"),
        # 200 tokens, 3 stopwords → conf (3·10⁸)//(200·6) = 250000, bin 2
        (3, "the a of " + " ".join(f"v{i}" for i in range(197)), "s"),
    ]
    _write_documents(tmp_path, rows)
    pdf = q_quality_ece(spark, str(tmp_path)).toPandas().set_index("bin")
    assert set(pdf.index) == {0, 2, _ECE_BINS - 1}
    assert int(pdf.loc[0, "sum_conf_ppm"]) == 0
    assert int(pdf.loc[_ECE_BINS - 1, "sum_conf_ppm"]) == 1_000_000
    assert int(pdf.loc[2, "sum_conf_ppm"]) == 250_000
    # all docs are lang='en' → every bin's accuracy is 10⁶
    for b in pdf.index:
        n, pos, sc = (int(pdf.loc[b, "n_docs"]), int(pdf.loc[b, "n_pos"]),
                      int(pdf.loc[b, "sum_conf_ppm"]))
        assert pos == n
        assert int(pdf.loc[b, "gap_mass_ppm"]) == abs(sc - pos * 10**6)
    total_gap = int(pdf["gap_mass_ppm"].sum())
    assert (pdf["ece_ppm"] == total_gap // 3).all()


def test_novelty_first_seen_attribution(spark, tmp_path):
    """Corpus-order semantics: the first doc gets full novelty, its
    verbatim copy zero, a half-overlapping doc the exact ppm, and a doc
    shorter than the shingle width drops out."""
    base = "alpha bravo charlie delta echo foxtrot"   # 2 distinct 5-grams
    rows = [
        (10, base, "s"),                 # 2 shingles, both first-seen
        (20, base, "s"),                 # verbatim copy → novelty 0
        (30, base + " golf", "s"),       # 3 shingles, 2 seen, 1 new
        (40, "too short text here", "s"),  # < NOVELTY_N words → no row
    ]
    _write_documents(tmp_path, rows)
    out = (q_ngram_novelty_rate(spark, str(tmp_path)).toPandas()
           .set_index("doc_id"))
    assert set(out.index) == {10, 20, 30}
    assert int(out.loc[10, "n_shingles"]) == 6 - _NOVELTY_N + 1
    assert int(out.loc[10, "novelty_ppm"]) == 1_000_000
    assert int(out.loc[20, "n_novel"]) == 0
    assert int(out.loc[30, "n_shingles"]) == 3
    assert int(out.loc[30, "n_novel"]) == 1
    assert int(out.loc[30, "novelty_ppm"]) == 10**6 // 3


def test_pq_codebook_matches_exact_python_reference(spark, sf_smoke):
    """Independent reference: rerun the whole PQ training loop in exact
    Python ints from the raw parquet (micro-quantize → seed → assign →
    truncating-mean update → final assign) and require the emitted
    audit — members, checksums, SSE — to match cell for cell."""
    import math

    emb = pd.read_parquet(f"{sf_smoke}/embeddings.parquet")
    sub = {}  # (vec_id, subspace) -> micro subvector
    for vid, vec in zip(emb["vec_id"], emb["embedding"]):
        q = [int(math.floor(float(x) * 1_000_000.0)) for x in vec]
        for s in range(PQ_SUBSPACES):
            sub[(int(vid), s)] = q[s * PQ_SUBDIM:(s + 1) * PQ_SUBDIM]
    cents = {
        s: {k: sub[(PQ_SEED_BASE + k, s)] for k in range(PQ_K)}
        for s in range(PQ_SUBSPACES)
    }

    def assign(cents):
        out = {}
        for (vid, s), v in sub.items():
            best = min(
                ((sum((a - b) ** 2 for a, b in zip(v, c)), k)
                 for k, c in cents[s].items()),
            )
            out[(vid, s)] = (best[1], best[0])  # (code, dist)
        return out

    def trunc_div(a: int, n: int) -> int:
        q = abs(a) // n
        return q if a >= 0 else -q

    a = None
    for i in range(PQ_ITERS):
        a = assign(cents)
        if i < PQ_ITERS - 1:
            nxt = {s: {} for s in range(PQ_SUBSPACES)}
            for s in range(PQ_SUBSPACES):
                for k in range(PQ_K):
                    members = [sub[(vid, ss)] for (vid, ss), (c, _) in a.items()
                               if ss == s and c == k]
                    if members:
                        nxt[s][k] = [
                            trunc_div(sum(m[d] for m in members), len(members))
                            for d in range(PQ_SUBDIM)
                        ]
            cents = nxt
    ref = {}
    for (vid, s), (code, dist) in a.items():
        r = ref.setdefault((s, code), [0, 0, 0])
        r[0] += 1
        r[1] += vid
        r[2] += dist

    out = q_embedding_pq_codebook(spark, sf_smoke).toPandas()
    got = {
        (int(r["subspace"]), int(r["code"])): (
            int(r["n_members"]), int(r["member_checksum"]),
            int(r["sum_dist_micro2"]))
        for _, r in out.iterrows()
    }
    assert got == {k: tuple(v) for k, v in ref.items()}


def test_vocab_rank_rewrite_on_octave_spanning_freq_group(spark, tmp_path):
    """The r10 histogram rewrite of the vocab rankers must stay exact
    when ONE frequency group spans several octaves — the case the
    fixture's smooth vocabulary barely exercises: 20 singleton words
    behind one triple word occupy ranks 2..21, crossing octaves 1-4.
    Hand-computed octave stats and coverage cuts (including a cut at a
    group's first and last rank) pin the range arithmetic."""
    from tfm_taxitrips_spark.queries.text import (
        q_vocab_coverage_curve,
        q_zipf_vocab_fit,
    )

    words = ["top top top"] + [f"u{i:02d}" for i in range(20)]
    _write_documents(tmp_path, [(1, " ".join(words), "s")])
    # vocabulary: 'top' freq 3 (rank 1), 20 words freq 1 (ranks 2..21)
    z = (q_zipf_vocab_fit(spark, str(tmp_path)).toPandas()
         .set_index("bucket").sort_index())
    assert list(z.index) == [0, 1, 2, 3, 4]
    assert [int(z.loc[b, "min_rank"]) for b in z.index] == [1, 2, 4, 8, 16]
    assert [int(z.loc[b, "n_words"]) for b in z.index] == [1, 2, 4, 8, 6]
    assert [int(z.loc[b, "bucket_mass"]) for b in z.index] == [3, 2, 4, 8, 6]
    c = (q_vocab_coverage_curve(spark, str(tmp_path)).toPandas()
         .set_index("vocab_topn").sort_index())
    # cuts 5/10/20/30: 20 lands mid-group, 30 beyond the vocab (no row)
    assert list(c.index) == [5, 10, 20]
    assert int(c.loc[5, "covered_tokens"]) == 3 + 4    # top + 4 singletons
    assert int(c.loc[10, "covered_tokens"]) == 3 + 9
    assert int(c.loc[20, "covered_tokens"]) == 3 + 19
    assert (c["total_tokens"] == 23).all()
    assert int(c.loc[20, "covered_ppm"]) == 22 * 10**6 // 23


def test_kfold_counts_null_source_stratum(spark, tmp_path):
    """groupBy treats a NULL source as a real stratum, so it is in the
    grid — but a plain-equality grid join never matches NULL = NULL, and
    the audit would emit all-zero fold rows for exactly the doc
    population it should flag, with the real counts silently dropped
    (the serving-merge NULL lesson, applied at this operator's birth).
    The null-safe match must carry the NULL stratum's true counts."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": pd.array([1, 2, 3], dtype="int64"),
            "text": ["one two", "three four", "five six"],
            "lang": ["en"] * 3,
            "source": ["named", None, None],
            "n_chars": pd.array([7, 10, 8], dtype="int64"),
        }
    )
    pdf.to_parquet(os.path.join(tmp_path, "documents.parquet"))
    out = q_stratified_kfold(spark, str(tmp_path)).toPandas()
    assert len(out) == 2 * _KFOLD_K  # named + NULL strata, full grids
    nul = out[out["source"].isna()]
    assert len(nul) == _KFOLD_K
    assert int(nul["n_docs"].sum()) == 2      # docs 2 and 3 are counted
    assert int(nul["n_tokens"].sum()) == 4
    assert int(nul["doc_checksum"].sum()) == 5
    assert int(nul["fold_max_docs"].iloc[0]) >= 1


def test_ece_null_label_counts_as_negative(spark, tmp_path):
    """A NULL lang label must count as NOT-'en' (the oracle's CASE…ELSE
    0), not propagate NULL through the bin's positive count — the bare
    Spark equality did exactly that (n_pos NULL where DuckDB says 0),
    found by the round-10 NULL probe."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": pd.array([1, 2], dtype="int64"),
            "text": ["w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"] * 2,
            "lang": [None, "en"],
            "source": ["s", "s"],
            "n_chars": pd.array([30, 30], dtype="int64"),
        }
    )
    pdf.to_parquet(os.path.join(tmp_path, "documents.parquet"))
    out = q_quality_ece(spark, str(tmp_path)).toPandas().set_index("bin")
    assert int(out.loc[0, "n_docs"]) == 2
    assert int(out.loc[0, "n_pos"]) == 1          # NULL label is negative
    assert int(out.loc[0, "acc_ppm"]) == 500_000  # not NULL


def test_ece_null_text_excluded_by_contract(spark, tmp_path):
    """r10 advisory #1 closed: a NULL text row must be EXCLUDED from the
    reliability diagram by the explicit guard, not land in the saturated
    bin through Spark's size(NULL) = -1 / DuckDB's LEAST(10⁶, NULL)
    double-accident. One real doc + one NULL-text doc → exactly one bin
    row counting exactly one doc."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": pd.array([1, 2], dtype="int64"),
            "text": ["w1 w2 w3 w4 w5 w6 w7 w8 w9 w10", None],
            "lang": ["en", "en"],
            "source": ["s", "s"],
            "n_chars": pd.array([30, 0], dtype="int64"),
        }
    )
    pdf.to_parquet(os.path.join(tmp_path, "documents.parquet"))
    out = q_quality_ece(spark, str(tmp_path)).toPandas()
    assert set(out["bin"]) == {0}                  # no saturated-bin ghost
    assert int(out["n_docs"].sum()) == 1           # the NULL row is gone
    assert int(out.set_index("bin").loc[0, "n_pos"]) == 1
