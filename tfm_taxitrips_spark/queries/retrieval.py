"""Text retrieval + corpus gating queries: BM25 ranking and a composite
Gopher-style quality filter (Rae et al. 2021, "Scaling Language Models" —
the published repetition/length heuristics, recomputed here from scratch
with built-in expressions only).

Float discipline: every ratio is a single IEEE division (correctly rounded,
so engine-identical); the one transcendental (BM25's idf log) is rounded to
micro-units before it can reach the hash, and ALL orderings carry doc_id
tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tfm_taxitrips_spark.functions.similarity import as_double, dot, l2_norm
from tfm_taxitrips_spark.functions.text import ascii_lower
from tfm_taxitrips_spark.queries.vectors import _emb_guard_sql, emb_table
from tfm_taxitrips_spark.queries.registry import QuerySpec
from tfm_taxitrips_spark.sources.readers import table

#: fixed query — terms present in the synthetic corpus vocabulary
BM25_TERMS = ("join", "hash", "scan")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 20


def _tokens(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id",
        F.explode(F.split(ascii_lower(F.col("text")), " ")).alias("term"),
    )


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, score_micros) for every document matching any BM25 term —
    the shared scoring frame behind ``q_bm25_search`` and the hybrid
    fusion query (one expression tree, so both rank identically)."""
    docs = table(spark, sf_dir, "documents")
    tok = _tokens(docs)
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_dl")
    )
    tf = (
        tok.where(F.col("term").isin(*BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    avgdl = F.col("total_dl") / F.col("n_docs")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    comp = idf * (
        F.col("tf")
        * (BM25_K1 + 1.0)
        / (
            F.col("tf")
            + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / avgdl)
        )
    )
    per_term = scored.select("doc_id", "term", comp.alias("comp"))
    # pivot to fixed columns => fixed-order addition, shuffle-independent
    agg_cols = [
        F.sum(F.when(F.col("term") == t, F.col("comp"))).alias(f"_c{i}")
        for i, t in enumerate(BM25_TERMS)
    ]
    total = per_term.groupBy("doc_id").agg(*agg_cols)
    score = F.coalesce(F.col("_c0"), F.lit(0.0))
    for i in range(1, len(BM25_TERMS)):
        score = score + F.coalesce(F.col(f"_c{i}"), F.lit(0.0))
    return total.select(
        "doc_id",
        F.round(score * 1_000_000).cast("long").alias("score_micros"),
    )


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k over the corpus for a fixed multi-term (disjunctive)
    query: documents matching ANY subset of BM25_TERMS are scored, with
    missing-term contributions coalescing to 0 — standard BM25 semantics,
    identical in the oracle.

    Scale shape: tokenization explodes map-side; ``tf`` filters to the
    QUERY TERMS before its aggregate, so the shuffled keyspace is
    O(matching docs × |query|), not the corpus vocabulary; ``df``/``N``/
    ``avgdl`` collapse to a 3-row / 1-row broadcast. The per-term score
    components pivot into fixed columns so the cross-term sum is a fixed
    left-to-right addition — not a ``SUM`` whose accumulation order the
    shuffle would pick — keeping the float bit-identical across engines;
    the idf ``ln`` (the one libm call, which IEEE does NOT promise
    cross-engine to the last ulp) is rounded to integer micro-score units
    on BOTH sides before ranking. Final top-k is TakeOrderedAndProject on
    (score_micros DESC, doc_id).
    """
    return _bm25_scored(spark, sf_dir).orderBy(
        F.col("score_micros").desc(), F.col("doc_id")
    ).limit(BM25_TOPK)


_BM25_TERM_LIST = ", ".join(f"'{t}'" for t in BM25_TERMS)
_BM25_COMPS = " + ".join(
    f"COALESCE(SUM(comp) FILTER (WHERE term = '{t}'), 0.0)" for t in BM25_TERMS
)

#: Shared CTE block: everything through the per-doc integer score frame
#: (`bm25_scored`), reused verbatim by the plain BM25 top-k and the
#: hybrid fusion oracle so both rank from the identical scores.
_BM25_SCORED_CTES = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')) AS term
  FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
stats AS (SELECT count(*) AS n_docs, sum(dl) AS total_dl FROM dl),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN ({_BM25_TERM_LIST}) GROUP BY 1, 2
),
dfr AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
comps AS (
  SELECT tf.doc_id, tf.term,
         ln(1.0 + (stats.n_docs - dfr.df + 0.5) / (dfr.df + 0.5))
           * (tf.tf * ({BM25_K1} + 1.0)
              / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
                   + {BM25_B} * dl.dl / (stats.total_dl / stats.n_docs))))
           AS comp
  FROM tf JOIN dfr USING (term) JOIN dl USING (doc_id), stats
),
bm25_scored AS (
  SELECT doc_id,
         CAST(round(({_BM25_COMPS}) * 1000000) AS BIGINT) AS score_micros
  FROM comps GROUP BY doc_id
)"""

_BM25_SQL = f"""{_BM25_SCORED_CTES}
SELECT doc_id, score_micros
FROM bm25_scored
ORDER BY score_micros DESC, doc_id
LIMIT {BM25_TOPK}
"""


#: Reciprocal-rank-fusion parameters: standard k=60 (Cormack et al.),
#: per-list depth 100, fused top-20, embedding probe = vec 0.
RRF_K = 60
RRF_DEPTH = 100
FUSION_TOPK = 20
FUSION_QID = 0


def q_hybrid_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion of the BM25 lexical list
    and the embedding-cosine semantic list — the standard way a RAG /
    search stack combines scorers whose raw scales are incomparable
    (RRF needs only ranks, so it is immune to score calibration).

    Each list is produced the scalable way FIRST — BM25 candidates and
    the broadcast-probe cosine scan both reduce through distributed
    TakeOrderedAndProject to their top-{RRF_DEPTH} — and only those ≤100
    rows enter the single-partition rank windows and the full-outer
    fusion join (driver-sized frames; the corpus never reaches a global
    sort). The fused score ``Σ 1e9 div (k + rank)`` is all-integer, so
    the result hashes identically across engines; doc_id breaks every
    tie. Docs missing from one list contribute 0 for it — standard RRF.

    Rank determinism: BM25 ranks on integer micro-scores (shared frame
    with q_bm25_search); the cosine ranks on the same double expression
    tree as q_ann_bruteforce, whose cross-engine bit-stability is already
    driver-proven.
    """
    bm_w = Window.orderBy(F.col("score_micros").desc(), F.col("doc_id"))
    bm_ranked = (
        _bm25_scored(spark, sf_dir)
        .orderBy(F.col("score_micros").desc(), F.col("doc_id"))
        .limit(RRF_DEPTH)
        .select("doc_id", F.row_number().over(bm_w).alias("bm25_rnk"))
    )
    emb = emb_table(spark, sf_dir)
    probe = emb.where(F.col("vec_id") == FUSION_QID).select(
        F.col("embedding").alias("q_embedding"),
        l2_norm(as_double("embedding")).alias("q_nrm"),
    )
    scored = (
        emb.where(F.col("vec_id") != FUSION_QID)
        .select("vec_id", "embedding",
                l2_norm(as_double("embedding")).alias("nrm"))
        .crossJoin(F.broadcast(probe))
        .select(
            "vec_id",
            (dot(as_double("q_embedding"), as_double("embedding"))
             / (F.col("q_nrm") * F.col("nrm"))).alias("cos"),
        )
    )
    ann_w = Window.orderBy(F.col("cos").desc(), F.col("vec_id"))
    ann_ranked = (
        scored.orderBy(F.col("cos").desc(), F.col("vec_id"))
        .limit(RRF_DEPTH)
        .select(F.col("vec_id").alias("doc_id"),
                F.row_number().over(ann_w).alias("ann_rnk"))
    )
    fused = bm_ranked.join(ann_ranked, "doc_id", "full_outer").select(
        "doc_id",
        "bm25_rnk",
        "ann_rnk",
        (
            F.coalesce(F.expr(f"{10**9} div ({RRF_K} + bm25_rnk)"), F.lit(0))
            + F.coalesce(F.expr(f"{10**9} div ({RRF_K} + ann_rnk)"), F.lit(0))
        ).cast("bigint").alias("rrf_ppb"),
    )
    return fused.orderBy(F.col("rrf_ppb").desc(), F.col("doc_id")).limit(
        FUSION_TOPK
    )


_FUSION_SQL = f"""{_BM25_SCORED_CTES},
bm_ranked AS (
  SELECT doc_id,
         CAST(ROW_NUMBER() OVER (ORDER BY score_micros DESC, doc_id) AS INT)
           AS bm25_rnk
  FROM bm25_scored
  ORDER BY score_micros DESC, doc_id
  LIMIT {RRF_DEPTH}
),
probe AS (
  SELECT embedding AS q_embedding FROM embeddings WHERE vec_id = {FUSION_QID}
),
ann_scored AS (
  SELECT e.vec_id,
         list_dot_product(p.q_embedding::DOUBLE[], e.embedding::DOUBLE[])
           / (sqrt(list_dot_product(p.q_embedding::DOUBLE[],
                                    p.q_embedding::DOUBLE[]))
              * sqrt(list_dot_product(e.embedding::DOUBLE[],
                                      e.embedding::DOUBLE[]))) AS cos
  FROM embeddings e CROSS JOIN probe p
  WHERE e.vec_id <> {FUSION_QID}
),
ann_ranked AS (
  SELECT vec_id AS doc_id,
         CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id) AS INT)
           AS ann_rnk
  FROM ann_scored
  ORDER BY cos DESC, vec_id
  LIMIT {RRF_DEPTH}
)
SELECT COALESCE(b.doc_id, a.doc_id) AS doc_id,
       b.bm25_rnk, a.ann_rnk,
       CAST(COALESCE({10**9} // ({RRF_K} + b.bm25_rnk), 0)
            + COALESCE({10**9} // ({RRF_K} + a.ann_rnk), 0) AS BIGINT)
         AS rrf_ppb
FROM bm_ranked b FULL OUTER JOIN ann_ranked a ON b.doc_id = a.doc_id
ORDER BY rrf_ppb DESC, doc_id
LIMIT {FUSION_TOPK}
"""


# Gopher-style gate thresholds, calibrated to the synthetic corpus so both
# keep and drop branches are exercised (word counts run 10-99, stop-token
# share 0-0.22 on the fixtures)
MIN_WORDS = 20
MAX_WORDS = 90
MIN_MEAN_WORD_LEN = 3.0
MAX_MEAN_WORD_LEN = 8.0
MAX_STOP_RATIO = 0.15
_STOP_TERMS = ("the", "a")


def quality_flags(docs: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
    """The gate's signal computation as a pure ``DataFrame → DataFrame``
    map — shared VERBATIM by the batch query below, the streaming form
    (queries.streamq.q_stream_quality_gate), and the end-to-end prep
    pipeline (queries.dataprep.q_corpus_prep_pipeline): map-only
    transformations are the class Structured Streaming runs unchanged,
    and sharing one builder is what guarantees batch/stream/pipeline
    parity by construction. ``carry`` lists extra input columns to pass
    through (e.g. source/text for downstream stages)."""
    toks = F.split(ascii_lower(F.col("text")), " ")
    n_words = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*_STOP_TERMS)))
    # mean word length over the space-split tokens: (chars - spaces)/words
    mean_wl = (
        (F.length("text") - (n_words - F.lit(1))).cast("double") / n_words
    )
    stop_ratio = n_stop.cast("double") / n_words
    words_ok = (n_words >= MIN_WORDS) & (n_words <= MAX_WORDS)
    word_len_ok = (mean_wl >= MIN_MEAN_WORD_LEN) & (
        mean_wl <= MAX_MEAN_WORD_LEN
    )
    stop_ok = stop_ratio <= MAX_STOP_RATIO
    return docs.select(
        "doc_id",
        *carry,
        n_words.cast("long").alias("n_words"),
        words_ok.alias("words_ok"),
        word_len_ok.alias("word_len_ok"),
        stop_ok.alias("stop_ok"),
        (words_ok & word_len_ok & stop_ok).alias("keep"),
    )


def q_gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite document-quality gate: word-count bounds, mean-word-length
    bounds, and a stop-token-share cap, emitted as per-rule booleans plus
    the conjunction (so downstream can audit WHICH rule dropped a doc).

    Scale shape: one map-only pass — every signal is computed from
    ``split``/``filter``/``length`` built-ins inside whole-stage codegen,
    no explode, no shuffle (the output is row-per-doc). The ratio
    comparisons are single correctly-rounded divisions, so the booleans
    are engine-exact.
    """
    return quality_flags(table(spark, sf_dir, "documents"))


_STOP_LIST = ", ".join(f"'{t}'" for t in _STOP_TERMS)

_GOPHER_SQL = f"""
WITH sig AS (
  SELECT doc_id,
         len(string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')) AS n_words,
         len(list_filter(string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' '),
                         t -> t IN ({_STOP_LIST}))) AS n_stop,
         length(text) AS n_chars
  FROM documents
),
r AS (
  SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
         (n_words >= {MIN_WORDS} AND n_words <= {MAX_WORDS}) AS words_ok,
         (CAST(n_chars - (n_words - 1) AS DOUBLE) / n_words
            >= {MIN_MEAN_WORD_LEN}
          AND CAST(n_chars - (n_words - 1) AS DOUBLE) / n_words
            <= {MAX_MEAN_WORD_LEN}) AS word_len_ok,
         (CAST(n_stop AS DOUBLE) / n_words <= {MAX_STOP_RATIO}) AS stop_ok
  FROM sig
)
SELECT doc_id, n_words, words_ok, word_len_ok, stop_ok,
       (words_ok AND word_len_ok AND stop_ok) AS keep
FROM r
"""


IDX_TOPK_POSTINGS = 4  # postings kept per term (impact-ordered index)
IDX_MIN_DF = 5         # terms rarer than this are left to exact lookup


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Impact-ordered inverted-index build: for every corpus term with
    document frequency ≥ IDX_MIN_DF, the top-IDX_TOPK_POSTINGS postings by
    (tf DESC, doc_id ASC) — the static index structure BM25 serving reads,
    materialized as (term, df, rank, doc_id, tf) rows. The per-term cap is
    standard impact-ordered/quantized index pruning (keep the documents a
    top-k scorer could ever return; WAND-style serving never looks past
    them).

    Plan (mirrors q_tfidf_distinctive_terms' single-scan diamond, with the
    window axes swapped — per-TERM top docs instead of per-DOC top terms):
    explode map-side; tf aggregates on (term, doc) with map-side combine;
    df is a COUNT window over the reduced tf rows on the term partition,
    and the top-k row_number rides the SAME term partitioning — Catalyst
    runs both in one Window stage, so there are exactly two exchanges
    ((term,doc) then term) and the per-term cap executes map-side via
    WindowGroupLimit before anything else moves. Postings for one term
    co-locate by construction — the index shard key at 100 TB.
    """
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(ascii_lower(F.col("text")), " ")).alias("term")
    )
    tf = toks.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    w_df = Window.partitionBy("term")
    w_rnk = Window.partitionBy("term").orderBy(
        F.col("tf").desc(), F.col("doc_id").asc()
    )
    return (
        tf.withColumn("df", F.count(F.lit(1)).over(w_df))
        .withColumn("rnk", F.row_number().over(w_rnk))
        .where((F.col("df") >= IDX_MIN_DF) & (F.col("rnk") <= IDX_TOPK_POSTINGS))
        .select("term", "df", "rnk", "doc_id", "tf")
    )


_INV_INDEX_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')) AS term FROM documents
),
tf AS (
  SELECT term, doc_id, COUNT(*) AS tf FROM toks GROUP BY 1, 2
)
SELECT term, df, rnk, doc_id, tf FROM (
  SELECT term, doc_id, tf,
         CAST(COUNT(*) OVER (PARTITION BY term) AS BIGINT) AS df,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY term ORDER BY tf DESC, doc_id ASC) AS INT) AS rnk
  FROM tf
) WHERE df >= {IDX_MIN_DF} AND rnk <= {IDX_TOPK_POSTINGS}
"""


def q_auc_score_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC per source, integer-only: does the length score
    (``n_chars``) discriminate English documents from the rest? The
    classifier-eval gate every filter-model iteration needs (is the new
    quality score better than the old one?), computed as the
    Mann-Whitney U statistic with exact tie handling.

    Exactness + scale come from the same trick: instead of ranking every
    document (a global sort per source — AUC's usual cost), the corpus
    first collapses to per-(source, score) positive/negative counts via
    a map-side-combined groupBy; U then needs only a window over that
    collapsed relation — |distinct scores| rows per source, bounded by
    the score DOMAIN rather than the corpus (at 100 TB you quantize the
    score to fix the domain; with integer scores, zero approximation).
    Ties contribute the exact half-credit via the doubled form
    ``2U = Σ_s pos_s · (2·neg_below_s + neg_s)`` — exact integers end to
    end (the U sum and the ppm division both run in DECIMAL(38,0) /
    HUGEINT, so neither wraps int64 even at ~1e9 docs per class), no 0.5
    float ever exists, and the ppm AUC is bit-identical across engines
    and partitionings.
    """
    # NULL score = unscorable, excluded by stated contract in BOTH
    # engines (r12 unicode/NULL sweep: a NULL-score positive sorted
    # NULLS FIRST in Spark's window but NULLS LAST in DuckDB's, moving
    # its tie-credit and shifting the AUC — an unrankable row has no
    # place in a ranking statistic)
    docs = table(spark, sf_dir, "documents").where(
        F.col("n_chars").isNotNull())
    # NULL lang belongs to NEITHER class (mirrors the oracle's FILTER
    # semantics, where NULL <> 'en' is NULL and the row is excluded)
    pos = F.when(F.col("lang") == "en", 1).otherwise(0)
    neg = F.when(F.col("lang") != "en", 1).otherwise(0)
    by_score = docs.groupBy("source", F.col("n_chars").alias("score")).agg(
        F.sum(pos).cast("bigint").alias("pos"),
        F.sum(neg).cast("bigint").alias("neg"),
    )
    w = (Window.partitionBy("source").orderBy("score")
         .rowsBetween(Window.unboundedPreceding, -1))
    agg = (
        by_score
        .withColumn("below", F.coalesce(F.sum("neg").over(w), F.lit(0)))
        .groupBy("source")
        .agg(
            # accumulate in DECIMAL(38,0) (mirrors the oracle's HUGEINT):
            # 2U approaches 2·n_pos·n_neg, which wraps int64 once a source
            # holds ~2.1e9 docs per class — the guard must cover the SUM
            # itself, not just the later ppm division
            F.sum(F.col("pos").cast("decimal(38,0)")
                  * (2 * F.col("below") + F.col("neg")))
            .alias("u2"),
            F.sum("pos").alias("n_pos"),
            F.sum("neg").alias("n_neg"),
        )
        .where((F.col("n_pos") > 0) & (F.col("n_neg") > 0))
    )
    # decimal domain: u2*1e6 (and 2·n_pos·n_neg) would wrap BIGINT once a
    # source holds ~2M docs per class — exactly the 100 TB regime
    ppm = F.expr(
        "CAST((CAST(u2 AS DECIMAL(38,0)) * 1000000) div "
        "(2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg) AS BIGINT)"
    )
    return agg.withColumn("auc_ppm", ppm).select(
        "source",
        F.col("n_pos").cast("bigint").alias("n_pos"),
        F.col("n_neg").cast("bigint").alias("n_neg"),
        "auc_ppm",
        (F.col("auc_ppm") >= 500000).alias("discriminates"),
    )


_AUC_SQL = """
WITH by_score AS (
  SELECT source, n_chars AS score,
         CAST(COUNT(*) FILTER (WHERE lang = 'en') AS BIGINT) AS pos,
         CAST(COUNT(*) FILTER (WHERE lang <> 'en') AS BIGINT) AS neg
  FROM documents
  WHERE n_chars IS NOT NULL  -- unscorable rows excluded (r12 contract)
  GROUP BY 1, 2
),
cum AS (
  SELECT source, pos, neg,
         CAST(COALESCE(SUM(neg) OVER (
           PARTITION BY source ORDER BY score
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS below
  FROM by_score
),
agg AS (
  SELECT source, SUM(CAST(pos AS HUGEINT) * (2 * below + neg)) AS u2,
         CAST(SUM(pos) AS BIGINT) AS n_pos, CAST(SUM(neg) AS BIGINT) AS n_neg
  FROM cum GROUP BY 1
)
SELECT source, n_pos, n_neg,
       CAST((CAST(u2 AS HUGEINT) * 1000000)
            // (2 * CAST(n_pos AS HUGEINT) * n_neg) AS BIGINT) AS auc_ppm,
       (CAST(u2 AS HUGEINT) * 1000000)
         // (2 * CAST(n_pos AS HUGEINT) * n_neg) >= 500000 AS discriminates
FROM agg WHERE n_pos > 0 AND n_neg > 0
"""


MMR_LAMBDA = 0.7
MMR_CANDIDATES = 10
MMR_PICKS = 3
MMR_PROBE = 0  # vec_id of the probe vector


def _mmr_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``MMR_CANDIDATES`` cosine candidates with their vectors
    attached. The ≤10-row candidate slice is the BROADCAST side of the
    vector-attach join and the corpus-sized embeddings scan the streamed
    side — never the reverse (a corpus broadcast is an executor OOM at
    scale); pinned in
    tests/test_plans.py::test_mmr_broadcasts_candidate_slice_not_corpus.
    Factored out of :func:`q_mmr_diverse_rerank` so the plan is
    inspectable before the lazy checkpoint hides it behind a LogicalRDD.
    """
    from tfm_taxitrips_spark.queries.vectors import _brute_force_scored

    emb = emb_table(spark, sf_dir).select(
        "vec_id", F.col("embedding").alias("c_emb"))
    cand_slice = (
        _brute_force_scored(spark, sf_dir)
        .where(F.col("qid") == MMR_PROBE)
        .orderBy(F.col("cosine_sim").desc(), F.col("vec_id").asc())
        .limit(MMR_CANDIDATES)
        .select("vec_id", F.col("cosine_sim").alias("rel"))
    )
    return (
        emb.join(F.broadcast(cand_slice), "vec_id")
        .select("vec_id", "rel", "c_emb")
    )


def q_mmr_diverse_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance re-ranking (Carbonell & Goldstein
    1998): greedily pick {picks} results from the probe's top-{cands}
    cosine candidates, each round maximizing ``λ·relevance − (1−λ)·max
    similarity to the already-selected`` — the diversity stage between
    retrieval and the context window (near-duplicate top hits waste
    prompt tokens; MMR spends them on coverage).

    Iterative like k-means/BPE: round 1 reduces to pure relevance;
    rounds 2-3 join the candidate slice (a broadcast of ≤{cands} rows)
    against the selected set, fold the max pairwise cosine, and take the
    arg-max with a vec_id tie-break. Every per-round relation is
    candidate-sized — the corpus is touched once, by the candidate
    generator (the proven capped brute-force scorer). Float discipline:
    the MMR score is the identical ``λ·rel − (1−λ)·maxsim`` expression
    tree in both engines over the same cosine doubles, and every
    ordering carries the vec_id tie-break. The oracle unrolls the rounds
    as CTEs.
    """
    cands = _mmr_candidates(spark, sf_dir).localCheckpoint(
        eager=False)  # every round reads the slice
    lam = F.lit(MMR_LAMBDA)
    picked = []
    remaining = cands
    for rank in range(1, MMR_PICKS + 1):
        if rank == 1:
            scored = remaining.select(
                "vec_id", "rel", "c_emb",
                (lam * F.col("rel")).alias("mmr_score"),
            )
        else:
            sel = picked_df.select(F.col("c_emb").alias("s_emb"))
            sims = (
                remaining.crossJoin(F.broadcast(sel))
                .select(
                    "vec_id", "rel", "c_emb",
                    (dot(as_double("c_emb"), as_double("s_emb"))
                     / (l2_norm(as_double("c_emb"))
                        * l2_norm(as_double("s_emb")))).alias("_sim"),
                )
                .groupBy("vec_id", "rel", "c_emb")
                .agg(F.max("_sim").alias("_maxsim"))
            )
            scored = sims.select(
                "vec_id", "rel", "c_emb",
                (lam * F.col("rel")
                 # Python-computed double, identical bits to the oracle's
                 # CAST(0.30000000000000004 AS DOUBLE) constant
                 - F.lit(1.0 - MMR_LAMBDA) * F.col("_maxsim")).alias("mmr_score"),
            )
        pick = (
            scored.orderBy(F.col("mmr_score").desc(), F.col("vec_id").asc())
            .limit(1)
            .localCheckpoint(eager=False)  # read by output + next round
        )
        picked.append(pick.select(
            F.lit(rank).alias("pick_rank"), "vec_id", "rel", "mmr_score"))
        picked_df = pick if rank == 1 else picked_df.unionByName(pick)
        remaining = remaining.join(
            F.broadcast(pick.select("vec_id")), "vec_id", "left_anti")
    out = picked[0]
    for p in picked[1:]:
        out = out.unionByName(p)
    return out


if q_mmr_diverse_rerank.__doc__:  # absent under python -OO
    q_mmr_diverse_rerank.__doc__ = (
        q_mmr_diverse_rerank.__doc__
        .replace("{picks}", str(MMR_PICKS))
        .replace("{cands}", str(MMR_CANDIDATES))
    )


def _mmr_sql() -> str:
    # bit-identical score constants: DuckDB parses bare `0.7` / `(1.0-0.7)`
    # as exact DECIMALs (0.3), while Spark folds `1.0 - lit(0.7)` in IEEE
    # doubles (0.30000000000000004) — a one-ulp constant difference that
    # can flip a greedy pick on a rounding boundary (observed at sf0.01).
    # Emitting the Python-computed doubles CAST AS DOUBLE pins both
    # engines to the same bits.
    lam = f"CAST({MMR_LAMBDA!r} AS DOUBLE)"
    oml = f"CAST({(1.0 - MMR_LAMBDA)!r} AS DOUBLE)"
    cos = (
        "list_dot_product(c.c_emb::DOUBLE[], s.c_emb::DOUBLE[])"
        " / (sqrt(list_dot_product(c.c_emb::DOUBLE[], c.c_emb::DOUBLE[]))"
        " * sqrt(list_dot_product(s.c_emb::DOUBLE[], s.c_emb::DOUBLE[])))"
    )
    parts = [f"""cand AS (
  SELECT e.vec_id, e.embedding AS c_emb,
         list_dot_product(q.embedding::DOUBLE[], e.embedding::DOUBLE[])
           / (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))
              * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])))
           AS rel
  FROM embeddings e,
       (SELECT embedding FROM embeddings WHERE vec_id = {MMR_PROBE}) q
  WHERE e.vec_id <> {MMR_PROBE}
  ORDER BY rel DESC, e.vec_id ASC LIMIT {MMR_CANDIDATES}
),
p1 AS (
  SELECT vec_id, c_emb, rel, {lam} * rel AS mmr_score
  FROM cand ORDER BY {lam} * rel DESC, vec_id ASC LIMIT 1
)"""]
    for r in range(2, MMR_PICKS + 1):
        sel_union = " UNION ALL ".join(
            f"SELECT vec_id, c_emb FROM p{i}" for i in range(1, r))
        parts.append(f"""s{r} AS ({sel_union}),
m{r} AS (
  SELECT c.vec_id, c.c_emb, c.rel, MAX({cos}) AS maxsim
  FROM cand c, s{r} s
  WHERE c.vec_id NOT IN (SELECT vec_id FROM s{r})
  GROUP BY c.vec_id, c.c_emb, c.rel
),
p{r} AS (
  SELECT vec_id, c_emb, rel,
         {lam} * rel - {oml} * maxsim AS mmr_score
  FROM m{r}
  ORDER BY mmr_score DESC, vec_id ASC LIMIT 1
)""")
    selects = " UNION ALL ".join(
        f"SELECT {r} AS pick_rank, vec_id, rel, mmr_score FROM p{r}"
        for r in range(1, MMR_PICKS + 1))
    return "WITH " + ",\n".join(parts) + "\n" + selects


_MMR_SQL = _mmr_sql()


QUERIES: dict[str, QuerySpec] = {
    "mmr_diverse_rerank": QuerySpec(
        q_mmr_diverse_rerank, _emb_guard_sql(_MMR_SQL), tags=("retrieval", "iterative")),
    "auc_score_eval": QuerySpec(
        q_auc_score_eval, _AUC_SQL, tags=("eval", "quality", "window")
    ),
    "bm25_search": QuerySpec(
        q_bm25_search, _BM25_SQL, tags=("text", "retrieval", "topk")
    ),
    "inverted_index_postings": QuerySpec(
        q_inverted_index, _INV_INDEX_SQL, tags=("text", "retrieval", "index")
    ),
    "gopher_quality_filter": QuerySpec(
        q_gopher_quality_filter, _GOPHER_SQL, tags=("text", "quality", "gopher")
    ),
    "hybrid_rank_fusion": QuerySpec(
        q_hybrid_rank_fusion, _emb_guard_sql(_FUSION_SQL), tags=("text", "retrieval", "hybrid")
    ),
}
