"""Text-analysis & deduplication queries over ``documents`` (SURVEY.md §2.10).

Each query has a bit-exact DuckDB oracle built from the SAME constants
(MinHash coefficients, stopword list) via the helpers in
:mod:`tfm_taxitrips_spark.functions.text`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tfm_taxitrips_spark.functions.text import (
    MINHASH_A,
    MINHASH_B,
    MINHASH_BANDS,
    MINHASH_PERMS,
    MINHASH_PRIME,
    SIMHASH_BITS,
    ascii_lower,
    ascii_lower_sql,
    hash60,
    hash60_sql,
    shingles,
    shingles_sql,
    stopword_count,
    stopword_count_sql,
    token_count,
    tokens,
)
from tfm_taxitrips_spark.operators.pairs import bucket_pairs
from tfm_taxitrips_spark.operators.partitioning import fan_out
from tfm_taxitrips_spark.operators.prefix import two_phase_prefix_sum
from tfm_taxitrips_spark.queries.registry import QuerySpec
from tfm_taxitrips_spark.sources.readers import table

_P = MINHASH_PRIME


# --------------------------------------------------------------------------
# token counting / quality / language-id / fingerprint
# --------------------------------------------------------------------------

def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counts + char length per document."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        F.length("text").cast("bigint").alias("text_len"),
    )


_TOKEN_COUNT_SQL = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS text_len
FROM documents
"""


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality heuristics: distinct-token ratio + stopword ratio → score.
    All ratios are single IEEE divisions of exact ints (cross-engine stable)."""
    docs = table(spark, sf_dir, "documents")
    w = tokens("text")
    n_tok = F.size(w).cast("double")
    n_distinct = F.size(F.array_distinct(w)).cast("double")
    n_stop = stopword_count("text").cast("double")
    distinct_ratio = n_distinct / n_tok
    stopword_ratio = n_stop / n_tok
    return docs.select(
        "doc_id",
        distinct_ratio.alias("distinct_ratio"),
        stopword_ratio.alias("stopword_ratio"),
        (distinct_ratio * 0.5 + (F.lit(1.0) - stopword_ratio) * 0.5).alias("quality_score"),
    )


_QUALITY_SQL = f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS n_distinct,
         CAST({stopword_count_sql('text')} AS DOUBLE) AS n_stop
  FROM documents
)
SELECT doc_id,
       n_distinct / n_tok AS distinct_ratio,
       n_stop / n_tok AS stopword_ratio,
       (n_distinct / n_tok) * 0.5 + (1.0 - n_stop / n_tok) * 0.5 AS quality_score
FROM t
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio language heuristic (n-gram-free lang-ID baseline):
    ratio ≥ 0.03 → 'en', else 'und'. Compared against the dataset label."""
    docs = table(spark, sf_dir, "documents")
    ratio = stopword_count("text").cast("double") / F.size(tokens("text")).cast("double")
    pred = F.when(ratio >= 0.03, F.lit("en")).otherwise(F.lit("und"))
    return docs.select(
        "doc_id",
        pred.alias("lang_pred"),
        F.col("lang").alias("lang_label"),
        (pred == F.col("lang")).alias("lang_match"),
    )


_LANG_ID_SQL = f"""
WITH t AS (
  SELECT doc_id, lang,
         CAST({stopword_count_sql('text')} AS DOUBLE)
           / CAST(len(string_split(text, ' ')) AS DOUBLE) AS ratio
  FROM documents
)
SELECT doc_id,
       CASE WHEN ratio >= 0.03 THEN 'en' ELSE 'und' END AS lang_pred,
       lang AS lang_label,
       (CASE WHEN ratio >= 0.03 THEN 'en' ELSE 'und' END) = lang AS lang_match
FROM t
"""


def q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-eval confusion matrix for the lang-ID heuristic
    (:func:`q_lang_id`'s stopword-ratio predictor vs the dataset label):
    per (label, prediction) cell count with exact integer recall ppm
    (cell / label total) and precision ppm (cell / prediction total) —
    the eval report every filter-model iteration reads before swapping
    classifiers (which languages leak through, which get over-flagged).

    Scale shape: one scan collapses the corpus into the
    |labels|×|predictions| matrix (map-side combine); both marginals are
    re-aggregations of the checkpointed matrix joined back by broadcast.
    No window, no second scan; the division is exact integer ppm.
    """
    docs = table(spark, sf_dir, "documents")
    ratio = (stopword_count("text").cast("double")
             / F.size(tokens("text")).cast("double"))
    pred = F.when(ratio >= 0.03, F.lit("en")).otherwise(F.lit("und"))
    m = (
        docs.groupBy(F.col("lang").alias("lang_label"),
                     pred.alias("lang_pred"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .localCheckpoint(eager=False)  # matrix + two marginals read it
    )
    lt = m.groupBy("lang_label").agg(F.sum("n_docs").alias("_lt"))
    pt = m.groupBy("lang_pred").agg(F.sum("n_docs").alias("_pt"))
    return (
        m.join(F.broadcast(lt), "lang_label")
        .join(F.broadcast(pt), "lang_pred")
        .select(
            "lang_label", "lang_pred", "n_docs",
            F.expr("(n_docs * 1000000) div _lt").alias("recall_ppm"),
            F.expr("(n_docs * 1000000) div _pt").alias("precision_ppm"),
        )
    )


_LANGID_CONFUSION_SQL = f"""
WITH p AS (
  SELECT lang AS lang_label,
         CASE WHEN CAST({stopword_count_sql('text')} AS DOUBLE)
                   / CAST(len(string_split(text, ' ')) AS DOUBLE) >= 0.03
              THEN 'en' ELSE 'und' END AS lang_pred
  FROM documents
),
m AS (
  SELECT lang_label, lang_pred, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM p GROUP BY 1, 2
),
lt AS (SELECT lang_label, CAST(SUM(n_docs) AS BIGINT) AS lt FROM m GROUP BY 1),
pt AS (SELECT lang_pred, CAST(SUM(n_docs) AS BIGINT) AS pt FROM m GROUP BY 1)
SELECT m.lang_label, m.lang_pred, m.n_docs,
       CAST((m.n_docs * 1000000) // lt.lt AS BIGINT) AS recall_ppm,
       CAST((m.n_docs * 1000000) // pt.pt AS BIGINT) AS precision_ppm
FROM m JOIN lt USING (lang_label) JOIN pt USING (lang_pred)
"""


#: reliability-diagram bin count (equal-width over [0, 1])
_ECE_BINS = 10

#: confidence denominator: the stopword-ratio score saturates to P(en)=1 at
#: ratio 0.06 — twice the `q_lang_id` decision threshold (0.03), so 0.5
#: confidence sits exactly on the classifier's decision boundary
_ECE_SAT_RATIO_PCT = 6


def q_quality_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected-calibration-error reliability diagram for the lang-ID
    confidence score — the eval-gate companion of `langid_confusion_eval`:
    that table says WHERE the classifier errs, this one says whether its
    CONFIDENCE can be trusted as a probability (the property a curation
    pipeline needs before thresholding on scores instead of hard labels).

    Confidence is the exact-integer ppm ``min(10⁶, (n_stop·10⁸) div
    (n_tok·{_ECE_SAT_RATIO_PCT}))`` — the stopword ratio rescaled so it
    saturates at {_ECE_SAT_RATIO_PCT}/100, i.e. P(en) = 0.5 exactly at
    the 0.03 decision threshold `q_lang_id` uses. Docs bin into
    {_ECE_BINS} equal-width confidence bins (top edge folded into the
    last bin); per bin the diagram emits count, positives (label 'en'),
    mean confidence, accuracy, and the integer gap mass
    ``|Σconf_ppm − n_pos·10⁶|``; the scalar gate
    ``ece_ppm = (Σ_b gap_mass) div N`` repeats on every row (the
    1-row-aggregate broadcast pattern). Counting-based and sort-free —
    every column is an exact integer, no transcendental anywhere.

    Scale shape: confidence, label, and bin are map-side expressions on
    the scan; ONE aggregation shuffle collapses the corpus into ≤
    {_ECE_BINS} rows; the ECE total and the join-back ride that
    aggregate (broadcast). Nothing else moves at 100 TB.

    NULL-text contract (r10 advisory #1 closed): a NULL text row is
    EXCLUDED outright — before the guard, Spark's ``size(NULL) = -1``
    and DuckDB's ``LEAST(10⁶, NULL)`` landed such rows in the same
    saturated bin by two DIFFERENT accidents. The explicit
    ``text IS NOT NULL`` in both engines replaces accident-alignment
    with a stated rule; NULL text itself is `data_contract_audit`'s
    defect to flag, not a confidence to calibrate.
    """
    docs = table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull())
    n_tok = F.size(tokens("text")).cast("bigint")
    n_stop = stopword_count("text").cast("bigint")
    # bin = min(conf div 100k, BINS-1); expressed with div to stay integral
    binned = docs.select(
        n_tok.alias("n_tok"), n_stop.alias("n_stop"),
        # a NULL label is NOT a positive — coalesce mirrors the oracle's
        # CASE…ELSE 0; a bare (lang = 'en') propagates NULL through SUM
        # and a NULL-labeled bin would emit n_pos NULL where the oracle
        # says 0 (found by the round-10 NULL probe, engine-divergent)
        F.coalesce((F.col("lang") == "en").cast("int"), F.lit(0))
        .alias("pos"),
    ).select(
        F.least(
            F.lit(_ECE_BINS - 1),
            F.expr(
                f"(least({1_000_000}, (n_stop * 100000000) "
                f"div (n_tok * {_ECE_SAT_RATIO_PCT}))) div 100000"
            ).cast("int"),
        ).cast("int").alias("bin"),
        F.expr(
            f"least({1_000_000}, (n_stop * 100000000) "
            f"div (n_tok * {_ECE_SAT_RATIO_PCT}))"
        ).cast("bigint").alias("conf_ppm"),
        "pos",
    )
    bins = (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("pos").cast("bigint").alias("n_pos"),
            F.sum("conf_ppm").cast("bigint").alias("sum_conf_ppm"),
        )
        .localCheckpoint(eager=False)  # rows + the ECE total read it
    )
    total = bins.agg(
        F.sum(F.abs(F.col("sum_conf_ppm") - F.col("n_pos") * 1_000_000))
        .alias("_gap"),
        F.sum("n_docs").alias("_n"),
    )
    return (
        bins.crossJoin(F.broadcast(total))
        .select(
            "bin", "n_docs", "n_pos", "sum_conf_ppm",
            F.expr("sum_conf_ppm div n_docs").alias("conf_avg_ppm"),
            F.expr("(n_pos * 1000000) div n_docs").alias("acc_ppm"),
            F.abs(F.col("sum_conf_ppm") - F.col("n_pos") * 1_000_000)
            .cast("bigint").alias("gap_mass_ppm"),
            F.expr("_gap div _n").cast("bigint").alias("ece_ppm"),
        )
    )


_ECE_CONF_SQL = (
    f"LEAST(1000000, ({stopword_count_sql('text')} * 100000000)"
    f" // (len(string_split(text, ' ')) * {_ECE_SAT_RATIO_PCT}))"
)

_ECE_SQL = f"""
WITH d AS (
  SELECT LEAST({_ECE_BINS - 1},
               CAST(({_ECE_CONF_SQL}) // 100000 AS INT)) AS bin,
         CAST({_ECE_CONF_SQL} AS BIGINT) AS conf_ppm,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM documents WHERE text IS NOT NULL
),
b AS (
  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(pos) AS BIGINT) AS n_pos,
         CAST(SUM(conf_ppm) AS BIGINT) AS sum_conf_ppm
  FROM d GROUP BY 1
),
t AS (
  SELECT CAST(SUM(ABS(sum_conf_ppm - n_pos * 1000000)) AS BIGINT) AS gap,
         CAST(SUM(n_docs) AS BIGINT) AS n FROM b
)
SELECT CAST(bin AS INT) AS bin, n_docs, n_pos, sum_conf_ppm,
       CAST(sum_conf_ppm // n_docs AS BIGINT) AS conf_avg_ppm,
       CAST((n_pos * 1000000) // n_docs AS BIGINT) AS acc_ppm,
       CAST(ABS(sum_conf_ppm - n_pos * 1000000) AS BIGINT) AS gap_mass_ppm,
       CAST(t.gap // t.n AS BIGINT) AS ece_ppm
FROM b CROSS JOIN t
"""


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: md5 of normalized text + min-shingle-hash
    (winnowing-style content fingerprint, robust to local edits)."""
    docs = table(spark, sf_dir, "documents")
    norm = ascii_lower(F.col("text"))
    sh = shingles(norm, 3)
    min_sh = F.array_min(F.transform(sh, lambda s: hash60(s)))
    return docs.select(
        "doc_id",
        F.md5(norm).alias("fp_md5"),
        min_sh.alias("fp_minshingle"),
    )


_FINGERPRINT_SQL = f"""
SELECT doc_id,
       md5(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')) AS fp_md5,
       list_min(list_transform({shingles_sql(ascii_lower_sql('text'))}, s -> {hash60_sql('s')})) AS fp_minshingle
FROM documents
"""


# --------------------------------------------------------------------------
# exact dedup (hash-groupBy)
# --------------------------------------------------------------------------

def q_dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content-hash groupBy: one group per distinct text;
    keeps the min doc_id as the canonical representative. At scale the
    shuffle key is the 32-char hash, never the document body."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.md5("text").alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("canonical_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


_DEDUP_EXACT_SQL = """
SELECT md5(text) AS content_hash,
       MIN(doc_id) AS canonical_doc_id,
       COUNT(*) AS n_copies
FROM documents GROUP BY 1
"""


# --------------------------------------------------------------------------
# n-gram Jaccard (exact pairwise verification step)
# --------------------------------------------------------------------------

#: Document-frequency cap for the shingle self-join. A shingle shared by
#: df documents contributes df·(df-1)/2 pairs, so an uncapped join is
#: Σ df(s)² — quadratic on any real corpus where stop-phrases ("of the
#: and") hit millions of documents. Dropping shingles with df > cap is
#: standard MinHash-LSH practice (they carry no near-dup signal — a
#: shingle in half the corpus distinguishes nothing) and bounds the join
#: output to cap × |shingle rows|, i.e. LINEAR in the input. The cap is
#: mirrored bit-exactly in the DuckDB oracle.
NGRAM_DF_CAP = 64


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard for candidate pairs: explode distinct shingles,
    drop shingles with document frequency > NGRAM_DF_CAP, self-join on the
    surviving shingles, |∩| / |∪| over the capped shingle universe.

    The df cap is what makes this runnable standalone at 100 TB: without it
    one hot shingle pairs nearly every document with every other (the
    round-3 verdict's one flagged scale-killer). With it the join output is
    provably ≤ NGRAM_DF_CAP × |shingle rows|.

    How the cap itself avoids the hot key: df counts come from a
    ``groupBy('s').count()`` whose MAP-SIDE partial aggregation collapses
    each task's copies of a hot shingle before the shuffle — the reducer
    merges small partial counts, never raw rows. The over-cap shingles
    (the Zipf head — bounded vocabulary, broadcastable at any corpus
    size, exactly a computed stopword list) then BROADCAST into a
    map-side anti-join. A window-count formulation was rejected: its
    ``partitionBy(s)`` exchange funnels every raw row of each hot shingle
    through one reducer — reintroducing at the filter the very funnel the
    filter removes from the join. The verification stage of the near-dup
    pipeline remains `minhash_lsh_candidates` composition; this form is
    the exact-Jaccard fallback that can no longer blow up.
    """
    joined = _capped_shingle_inter(spark, sf_dir)
    jac = joined.withColumn(
        "jaccard",
        F.col("n_inter").cast("double")
        / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")).cast("double"),
    )
    return jac.where(F.col("jaccard") >= 0.2).select("doc_a", "doc_b", "n_inter", "jaccard")


def _capped_shingle_inter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared df-capped shingle-pair machinery (see q_ngram_jaccard_pairs'
    docstring for the scale argument): candidate pairs with |∩| and both
    set sizes, over the capped distinct 3-gram universe.

    r18 (guide §2.4): ``sets`` is localCheckpoint-fenced — it feeds the
    df count, and (through the anti-join) the sizes aggregate and BOTH
    self-join sides, so the un-fenced plan re-ran the shingle
    explode+distinct once per consumer (~4×). Only ``sets`` is fenced:
    the downstream broadcast anti-join is a cheap map-side filter over
    the materialized rows, and keeping it in the visible plan is what
    lets tests/test_plans.py pin the df-cap/broadcast-anti shape. Pure
    materialization; pair set and every count are bit-identical."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    sets = docs.select(
        "doc_id", F.explode(shingles(ascii_lower(F.col("text")), 3)).alias("s")
    ).distinct().localCheckpoint(eager=False)
    hot = (
        sets.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df_s"))
        .where(F.col("df_s") > NGRAM_DF_CAP)
        .select("s")
    )
    kept = sets.join(F.broadcast(hot), "s", "left_anti")
    sizes = kept.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a, b = kept.alias("a"), kept.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return inter.join(sa, "doc_a").join(sb, "doc_b")


def q_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC containment for candidate pairs — ``|A∩B| / |A|`` and
    ``|A∩B| / |B|`` — the quote/subset-copy detector Jaccard structurally
    misses: a short document wholly quoted inside a long one has tiny
    Jaccard (the union is dominated by the long doc) but containment ≈ 1
    on the short side. Standard curation practice (e.g. boilerplate and
    quotation mining) keeps BOTH directions; the emitted pairs are those
    where either direction reaches 0.5.

    Rides the same df-capped shingle machinery as
    :func:`q_ngram_jaccard_pairs` (one shared builder — the cap bounds
    the pair join identically), so the scale argument is inherited, and
    the ratios are single IEEE divisions of exact ints.
    """
    joined = _capped_shingle_inter(spark, sf_dir)
    c = joined.select(
        "doc_a", "doc_b", "n_inter",
        (F.col("n_inter").cast("double") / F.col("sz_a").cast("double"))
        .alias("containment_a_in_b"),
        (F.col("n_inter").cast("double") / F.col("sz_b").cast("double"))
        .alias("containment_b_in_a"),
    )
    return c.where(
        F.greatest("containment_a_in_b", "containment_b_in_a") >= 0.5)


_NGRAM_JACCARD_SQL = f"""
WITH sets AS (
  SELECT DISTINCT doc_id, unnest({shingles_sql(ascii_lower_sql('text'))}) AS s
  FROM documents
),
kept AS (
  SELECT doc_id, s FROM (
    SELECT doc_id, s, COUNT(*) OVER (PARTITION BY s) AS df_s FROM sets
  ) WHERE df_s <= {NGRAM_DF_CAP}
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM kept GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_inter,
       CAST(n_inter AS DOUBLE) / CAST(sa.sz + sb.sz - n_inter AS DOUBLE) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_inter AS DOUBLE) / CAST(sa.sz + sb.sz - n_inter AS DOUBLE) >= 0.2
"""

_NGRAM_CONTAINMENT_SQL = f"""
WITH sets AS (
  SELECT DISTINCT doc_id, unnest({shingles_sql(ascii_lower_sql('text'))}) AS s
  FROM documents
),
kept AS (
  SELECT doc_id, s FROM (
    SELECT doc_id, s, COUNT(*) OVER (PARTITION BY s) AS df_s FROM sets
  ) WHERE df_s <= {NGRAM_DF_CAP}
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM kept GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_inter,
       CAST(n_inter AS DOUBLE) / CAST(sa.sz AS DOUBLE) AS containment_a_in_b,
       CAST(n_inter AS DOUBLE) / CAST(sb.sz AS DOUBLE) AS containment_b_in_a
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE GREATEST(CAST(n_inter AS DOUBLE) / CAST(sa.sz AS DOUBLE),
               CAST(n_inter AS DOUBLE) / CAST(sb.sz AS DOUBLE)) >= 0.5
"""


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

def _minhash_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distinct (doc_id, 60-bit-hashed-shingle mod _P) universe — the
    ONE corpus pass under the whole MinHash family. The shingle is hashed
    BEFORE the distinct, so the dedup shuffle moves (doc_id, bigint)
    instead of (doc_id, shingle-string) — at corpus scale that is the
    difference between shuffling ~8 bytes and ~40+ bytes per shingle.
    Collapsing distinct x (not distinct shingle) is semantics-preserving:
    MinHash operates on the hashed universe anyway."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    exploded = docs.select(
        "doc_id", F.explode(shingles(ascii_lower(F.col("text")), 3)).alias("s")
    )
    return exploded.select(
        "doc_id", (hash60(F.col("s")) % _P).alias("x")
    ).distinct()


def _minhash_signature(
    spark: SparkSession, sf_dir: str, hashed: DataFrame | None = None
) -> DataFrame:
    """k=16 MinHash signature per doc in one logical pass (see
    :func:`_minhash_hashed` for the hashed-universe shuffle argument).
    ``hashed`` lets a caller that ALSO consumes the hashed universe (the
    estimator gate) pass its own — typically checkpoint-fenced — frame so
    the corpus pass is shared instead of replayed.

    r19 (guide §2.3/§2.4): the standalone path SKIPS the (doc_id, x)
    distinct — MIN is multiplicity-insensitive, so the signature over
    the hashed multiset equals the signature over the hashed set
    bit-for-bit, and dropping the dedup removes a whole exchange: the
    groupBy's map-side partial aggregation collapses each doc to ONE
    16-long row before the wire (a doc's shingles are task-local after
    fan_out), where the distinct shuffled every distinct hash. Callers
    that need the true SET universe (the estimator's exact-Jaccard leg)
    pass their own distinct ``hashed`` frame, unchanged."""
    if hashed is None:
        docs = fan_out(table(spark, sf_dir, "documents"))
        exploded = docs.select(
            "doc_id",
            F.explode(shingles(ascii_lower(F.col("text")), 3)).alias("s"),
        )
        hashed = exploded.select(
            "doc_id", (hash60(F.col("s")) % _P).alias("x")
        )
    x = F.col("x")
    mins = [
        F.min((F.lit(MINHASH_A[j]) * x + F.lit(MINHASH_B[j])) % _P).alias(f"h{j}")
        for j in range(MINHASH_PERMS)
    ]
    return hashed.groupBy("doc_id").agg(*mins)


def q_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _minhash_signature(spark, sf_dir)


def _minhash_sig_sql() -> str:
    mins = ",\n       ".join(
        f"MIN(({MINHASH_A[j]} * x + {MINHASH_B[j]}) % {_P}) AS h{j}"
        for j in range(MINHASH_PERMS)
    )
    return f"""
WITH sets AS (
  SELECT DISTINCT doc_id, {hash60_sql('s')} % {_P} AS x
  FROM (SELECT doc_id, unnest({shingles_sql(ascii_lower_sql('text'))}) AS s FROM documents)
)
SELECT doc_id,
       {mins}
FROM sets GROUP BY doc_id
"""


_MINHASH_SIG_SQL = _minhash_sig_sql()


def _minhash_bands(sig: DataFrame) -> DataFrame:
    """LSH banding of a k=16 signature into 4 bands × 4 rows: one
    (doc_id, band_id, band_hash) row per band, built map-side."""
    rows_per_band = MINHASH_PERMS // MINHASH_BANDS
    band_cols = []
    for b in range(MINHASH_BANDS):
        cols = [F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band_id"), F.md5(F.concat_ws(",", *cols)).alias("bh"))
        )
    return sig.select("doc_id", F.explode(F.array(*band_cols)).alias("band")).select(
        "doc_id", F.col("band.band_id").alias("band_id"), F.col("band.bh").alias("bh")
    )


def _lsh_candidates_from(sig: DataFrame) -> DataFrame:
    """Candidate pairs of any k=16 signature frame — the one LSH
    expansion shared by `q_minhash_lsh_candidates` and the estimator
    gate (which feeds a fenced signature), so the two can never band
    differently."""
    bands = _minhash_bands(sig)
    # Bucket-group instead of self-join for narrow buckets (one shuffle, no
    # double execution of the signature pipeline); buckets wider than
    # LSH_MAX_BUCKET take a co-partitioned self-join so a degenerate corpus
    # can't OOM a single task — see operators/pairs.bucket_pairs.
    # spread="adaptive" (r19): LSH banding's buckets are narrow by
    # design (output ≈ input bytes), so AQE's input-byte coalescing is
    # the right sizing model; the explicit-count guard exists for
    # quadratic-output corpora and costs ~0.5 s of pure task overhead
    # here at fixture scale (rationale in bucket_pairs' docstring).
    return (
        bucket_pairs(bands, ["band_id", "bh"], F.col("doc_id"),
                     spread="adaptive")
        .select(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
        .distinct()
    )


def q_minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding (4 bands × 4 rows): docs sharing any band hash become
    candidate pairs. The self-join key is (band_id, band_hash) — at 100 TB
    the shuffle moves 16 ints per doc, and only same-bucket docs ever meet."""
    return _lsh_candidates_from(_minhash_signature(spark, sf_dir))


def _bands_union_sql() -> str:
    """DuckDB mirror of :func:`_minhash_bands` (over a CTE named ``sig``)."""
    rows_per_band = MINHASH_PERMS // MINHASH_BANDS
    band_selects = []
    for b in range(MINHASH_BANDS):
        cols = ", ".join(f"h{b * rows_per_band + r}" for r in range(rows_per_band))
        band_selects.append(
            f"SELECT doc_id, {b} AS band_id, md5(concat_ws(',', {cols})) AS bh FROM sig"
        )
    return "\nUNION ALL\n".join(band_selects)


def _minhash_lsh_sql() -> str:
    return f"""
WITH sig AS ({_MINHASH_SIG_SQL}),
bands AS ({_bands_union_sql()})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a
JOIN bands b ON a.band_id = b.band_id AND a.bh = b.bh AND a.doc_id < b.doc_id
"""


_MINHASH_LSH_SQL = _minhash_lsh_sql()


def q_cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix — the dataset-curation question
    behind every corpus merge: how many near-dup pairs link source A to
    source B (and each source to itself)? Composes the LSH candidate
    pairs with the documents' ``source`` labels and counts per unordered
    source pair.

    Scale shape: the candidate set is LSH-bounded (≪ corpus), so it
    BROADCASTS into two streaming scans of the (doc_id, source)
    projection — the corpus is never shuffled, and the only exchange is
    the final |sources|² aggregate. The alternative (explode pairs, one
    scan, regroup by pair id) would shuffle pair rows; this form keeps
    every big-table access a map-side broadcast probe.

    Round-12 probe fix (failing-first, tests/test_round12_ops.py): the
    unordered pair key was ``least``/``greatest`` — and BOTH engines'
    least/greatest SKIP NULLs, so a NULL-source doc near-duplicating a
    'web' doc silently landed in (web, web), misattributing the
    provenance-defect bucket's dup mass to web's INTERNAL duplication.
    The engines agreed (no oracle divergence — the worst kind of bug),
    but the semantics were an accident. Replaced with one shared
    NULLS-FIRST CASE in both engines: a NULL source is a real
    provenance bucket and its dup mass gets its own matrix row.
    """
    cands = q_minhash_lsh_candidates(spark, sf_dir)
    src = table(spark, sf_dir, "documents").select("doc_id", "source")
    a = src.join(F.broadcast(cands), src["doc_id"] == cands["doc_a"]).select(
        F.col("source").alias("source_a"), "doc_b"
    )
    b = src.join(F.broadcast(a), src["doc_id"] == a["doc_b"]).select(
        "source_a", F.col("source").alias("source_b")
    )
    ordered = F.expr(
        "source_a IS NULL OR (source_b IS NOT NULL AND source_a <= source_b)")
    return b.groupBy(
        F.when(ordered, F.col("source_a")).otherwise(F.col("source_b"))
        .alias("source_lo"),
        F.when(ordered, F.col("source_b")).otherwise(F.col("source_a"))
        .alias("source_hi"),
    ).agg(F.count(F.lit(1)).alias("n_dup_pairs"))


_CROSS_SOURCE_SQL = f"""
WITH cand AS ({_MINHASH_LSH_SQL}),
lab AS (
  SELECT da.source AS sa, db.source AS sb
  FROM cand c
  JOIN documents da ON da.doc_id = c.doc_a
  JOIN documents db ON db.doc_id = c.doc_b
)
SELECT CASE WHEN sa IS NULL OR (sb IS NOT NULL AND sa <= sb)
            THEN sa ELSE sb END AS source_lo,
       CASE WHEN sa IS NULL OR (sb IS NOT NULL AND sa <= sb)
            THEN sb ELSE sa END AS source_hi,
       COUNT(*) AS n_dup_pairs
FROM lab GROUP BY 1, 2
"""


def _null_first_lt(lo: str, hi: str):
    """Unordered-pair strict-< predicate over possibly-NULL source
    labels, NULLS FIRST (the shared r12 convention): NULL pairs before
    every non-NULL label and never with itself."""
    lo_c, hi_c = F.col(lo), F.col(hi)
    return (lo_c.isNull() & hi_c.isNotNull()) | (
        lo_c.isNotNull() & hi_c.isNotNull() & (lo_c < hi_c))


def _source_shingle_sets(spark, sf_dir: str):
    """The per-source DISTINCT 3-gram shingle universe shared by
    :func:`q_source_ngram_overlap_matrix` and
    :func:`q_source_ngram_containment_matrix` — ONE definition (the
    `_pack_layout` convention), so the containment matrix can never
    describe a different shingle universe than the overlap matrix it
    refines. Returns ``(sets, base)``: ``sets`` = (source, h) distinct
    60-bit shingle hashes, ``base`` = every source with its set size
    (zero-filled for shingle-free sources).

    Scale shape (the r13 overlap-matrix argument, inherited verbatim):
    shingles hash to 60-bit ints map-side, the per-source distinct
    collapses repeats BEFORE the wire — the shuffle carries the
    replication-invariant distinct set, never the shingle stream.

    r18 (guide §2.4): ``sets`` is localCheckpoint-fenced — it feeds the
    size aggregate and BOTH sides of the intersection self-join (and the
    containment twin adds the ordered mirror), so the un-fenced plan
    re-ran the corpus explode+hash+distinct once per consumer. The
    grid/intersection joins stay above the fence, keeping the
    plan-shape pins in tests/test_plans.py on the real joins."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    sets = (
        docs.select(
            "source",
            F.explode(shingles(ascii_lower(F.col("text")), 3)).alias("s"))
        .select("source", hash60(F.col("s")).alias("h"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    sizes = sets.groupBy("source").agg(F.count(F.lit(1)).alias("sz"))
    srcs = docs.select("source").distinct()
    base = (
        srcs.join(sizes.withColumnRenamed("source", "src"),
                  srcs["source"].eqNullSafe(F.col("src")), "left")
        .select("source", F.coalesce("sz", F.lit(0)).cast("bigint").alias("sz"))
    )
    return sets, base


def q_source_ngram_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source n-gram overlap matrix (round 13): pairwise Jaccard of
    the DISTINCT 3-gram shingle sets at SOURCE granularity — the corpus-
    merge dashboard that says which provenance buckets are telling the
    same stories (`cross_source_dup_matrix` counts near-dup PAIRS; this
    measures set overlap of the sources' whole n-gram vocabularies, so
    boilerplate shared across many non-duplicate docs still shows).

    Row contract: one row per UNORDERED source pair from the full source
    grid (NULL provenance is a real bucket, ordered FIRST by the shared
    r12 convention), zero-filled ``n_inter`` when nothing overlaps, and
    explicit-NULL ``jaccard_ppm`` when both sides are shingle-free (a
    pair of empty sets has no defined Jaccard — NULLIF contract, never a
    crash). ppm numerators cross-multiply in DECIMAL(38,0)/HUGEINT
    (distinct-shingle counts reach ~10¹³ at 100 TB; ×10⁶ overflows
    int64).

    Scale shape: shingles hash to 60-bit ints map-side, the per-source
    distinct collapses repeats before the wire, and the self-join on the
    shingle hash emits at most C(k,2) pairs per shingle for k = number
    of sources containing it — bounded by the SOURCE count, not document
    frequency, so no df cap is needed (contrast `ngram_jaccard_pairs`,
    where k is doc frequency and the cap is load-bearing). The grid and
    the final matrix are |sources|²-row aggregates.
    """
    sets, base = _source_shingle_sets(spark, sf_dir)
    strict = _null_first_lt
    # the |sources|²-row grid: non-equi pair predicate over an
    # aggregate-sized frame — broadcast the right side so the planner
    # emits a BroadcastNestedLoopJoin, never a shuffled Cartesian
    a, b = base.alias("a"), F.broadcast(base.alias("b"))
    grid = a.join(b, strict("a.source", "b.source")).select(
        F.col("a.source").alias("source_lo"),
        F.col("b.source").alias("source_hi"),
        F.col("a.sz").alias("sz_lo"), F.col("b.sz").alias("sz_hi"),
    )
    x, y = sets.alias("x"), sets.alias("y")
    inter = (
        x.join(y, (F.col("x.h") == F.col("y.h"))
               & strict("x.source", "y.source"))
        .groupBy(F.col("x.source").alias("source_lo"),
                 F.col("y.source").alias("source_hi"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    out = grid.join(
        F.broadcast(inter),
        grid["source_lo"].eqNullSafe(inter["source_lo"])
        & grid["source_hi"].eqNullSafe(inter["source_hi"]),
        "left",
    ).select(
        grid["source_lo"], grid["source_hi"], "sz_lo", "sz_hi",
        F.coalesce(inter["n_inter"], F.lit(0)).cast("bigint").alias("n_inter"),
    )
    return out.select(
        "source_lo", "source_hi", "sz_lo", "sz_hi", "n_inter",
        F.expr("CAST((CAST(n_inter AS DECIMAL(38,0)) * 1000000) div "
               "NULLIF(sz_lo + sz_hi - n_inter, 0) AS BIGINT)")
        .alias("jaccard_ppm"),
    )


# the oracle twin of _source_shingle_sets — a WITH-body fragment ending
# in the ``base`` CTE, prepended by BOTH source-matrix oracles so the
# two SQL sides share one shingle-universe definition exactly like the
# Spark side does (the _PACK_LAYOUT_CTES convention)
_SRC_SETS_CTES = f"""sets AS (
  SELECT DISTINCT source, {hash60_sql('s')} AS h FROM (
    SELECT source, unnest({shingles_sql(ascii_lower_sql('text'))}) AS s
    FROM documents
  )
),
sizes AS (SELECT source, COUNT(*) AS sz FROM sets GROUP BY 1),
srcs AS (SELECT DISTINCT source FROM documents),
base AS (
  SELECT s.source, CAST(COALESCE(z.sz, 0) AS BIGINT) AS sz
  FROM srcs s LEFT JOIN sizes z ON z.source IS NOT DISTINCT FROM s.source
)"""

_SRC_OVERLAP_SQL = f"""
WITH {_SRC_SETS_CTES},
grid AS (
  SELECT a.source AS source_lo, b.source AS source_hi,
         a.sz AS sz_lo, b.sz AS sz_hi
  FROM base a JOIN base b
    ON (a.source IS NULL AND b.source IS NOT NULL)
    OR (a.source IS NOT NULL AND b.source IS NOT NULL
        AND a.source < b.source)
),
inter AS (
  SELECT x.source AS source_lo, y.source AS source_hi, COUNT(*) AS n_inter
  FROM sets x JOIN sets y ON x.h = y.h
   AND ((x.source IS NULL AND y.source IS NOT NULL)
     OR (x.source IS NOT NULL AND y.source IS NOT NULL
         AND x.source < y.source))
  GROUP BY 1, 2
)
SELECT g.source_lo, g.source_hi, g.sz_lo, g.sz_hi,
       CAST(COALESCE(i.n_inter, 0) AS BIGINT) AS n_inter,
       CAST(CAST(COALESCE(i.n_inter, 0) AS HUGEINT) * 1000000
            // NULLIF(g.sz_lo + g.sz_hi - COALESCE(i.n_inter, 0), 0)
            AS BIGINT) AS jaccard_ppm
FROM grid g LEFT JOIN inter i
  ON i.source_lo IS NOT DISTINCT FROM g.source_lo
 AND i.source_hi IS NOT DISTINCT FROM g.source_hi
"""


def q_source_ngram_containment_matrix(
        spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source n-gram CONTAINMENT matrix (round 14 — the
    containment-direction twin of `source_ngram_overlap_matrix`, pairing
    with `ngram_containment_pairs` at SOURCE grain): for every ORDERED
    pair of distinct sources, ``containment_ppm = |A∩B|·10⁶ div |A|`` —
    the asymmetric subset question Jaccard structurally hides. A small
    curated source wholly re-crawled inside a big web dump has tiny
    Jaccard (the union is dominated by the dump) but containment ≈ 10⁶
    on the small side: that direction decides "drop A, it's already in
    B", which the symmetric matrix cannot.

    Row contract: the FULL ordered grid of distinct source pairs (both
    directions of every pair; NULL provenance is a real bucket),
    zero-filled ``n_inter``, and explicit-NULL ``containment_ppm`` when
    the CONTAINED side is shingle-free (containment of an empty set is
    undefined — NULLIF contract, never a crash; a real-but-disjoint pair
    reads 0). ppm numerators cross-multiply in DECIMAL(38,0)/HUGEINT
    (the shared convention — distinct-shingle intersections reach ~10¹³
    at 100 TB; ×10⁶ overflows int64).

    The shingle universe is :func:`_source_shingle_sets` — the SAME
    definition the overlap matrix consumes, in both engines, so the two
    matrices can never disagree about what a source's n-gram set IS.
    The intersection self-join is computed ONCE in unordered form
    (identical wire cost to the overlap matrix: ≤ C(k,2) pairs per
    shingle, k bounded by SOURCE count) and mirrored to ordered pairs by
    a zero-shuffle union of two projections of the aggregate-sized
    result; the only non-equi join is the broadcast ordered grid
    (one BNLJ over |sources|·(|sources|−1) rows, zero CartesianProduct).
    """
    sets, base = _source_shingle_sets(spark, sf_dir)
    a, b = base.alias("a"), F.broadcast(base.alias("b"))
    grid = a.join(b, ~F.col("a.source").eqNullSafe(F.col("b.source"))).select(
        F.col("a.source").alias("source_a"),
        F.col("b.source").alias("source_b"),
        F.col("a.sz").alias("sz_a"), F.col("b.sz").alias("sz_b"),
    )
    x, y = sets.alias("x"), sets.alias("y")
    half = (
        x.join(y, (F.col("x.h") == F.col("y.h"))
               & _null_first_lt("x.source", "y.source"))
        .groupBy(F.col("x.source").alias("lo"),
                 F.col("y.source").alias("hi"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    inter = half.select(
        F.col("lo").alias("source_a"), F.col("hi").alias("source_b"),
        "n_inter",
    ).unionAll(half.select(
        F.col("hi").alias("source_a"), F.col("lo").alias("source_b"),
        "n_inter",
    ))
    out = grid.join(
        F.broadcast(inter),
        grid["source_a"].eqNullSafe(inter["source_a"])
        & grid["source_b"].eqNullSafe(inter["source_b"]),
        "left",
    ).select(
        grid["source_a"], grid["source_b"], "sz_a", "sz_b",
        F.coalesce(inter["n_inter"], F.lit(0)).cast("bigint").alias("n_inter"),
    )
    return out.select(
        "source_a", "source_b", "sz_a", "sz_b", "n_inter",
        F.expr("CAST((CAST(n_inter AS DECIMAL(38,0)) * 1000000) div "
               "NULLIF(sz_a, 0) AS BIGINT)").alias("containment_ppm"),
    )


_SRC_CONTAINMENT_SQL = f"""
WITH {_SRC_SETS_CTES},
grid AS (
  SELECT a.source AS source_a, b.source AS source_b,
         a.sz AS sz_a, b.sz AS sz_b
  FROM base a JOIN base b ON a.source IS DISTINCT FROM b.source
),
half AS (
  SELECT x.source AS lo, y.source AS hi, COUNT(*) AS n_inter
  FROM sets x JOIN sets y ON x.h = y.h
   AND ((x.source IS NULL AND y.source IS NOT NULL)
     OR (x.source IS NOT NULL AND y.source IS NOT NULL
         AND x.source < y.source))
  GROUP BY 1, 2
),
inter AS (
  SELECT lo AS source_a, hi AS source_b, n_inter FROM half
  UNION ALL
  SELECT hi AS source_a, lo AS source_b, n_inter FROM half
)
SELECT g.source_a, g.source_b, g.sz_a, g.sz_b,
       CAST(COALESCE(i.n_inter, 0) AS BIGINT) AS n_inter,
       CAST(CAST(COALESCE(i.n_inter, 0) AS HUGEINT) * 1000000
            // NULLIF(g.sz_a, 0) AS BIGINT) AS containment_ppm
FROM grid g LEFT JOIN inter i
  ON i.source_a IS NOT DISTINCT FROM g.source_a
 AND i.source_b IS NOT DISTINCT FROM g.source_b
"""


#: containment threshold for the source prune plan — a source whose best
#: container already holds at least this share (ppm) of its distinct
#: shingles is declared redundant. A production corpus merge prunes near
#: 0.8·10⁶; the synthetic fixture's best-containment tops out near
#: 0.17·10⁶ (median ≈ 0.088·10⁶ at sf0.01), so the registered demo
#: threshold sits at 10% — between the fixture's median and max, keeping
#: REAL mass on both branches of the flag at every SF. Shared verbatim
#: with the DuckDB oracle.
PRUNE_TAU_PPM = 100_000


def q_source_prune_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment-threshold source-pruning plan (round 15 — the r14
    shortlist's decision layer over `source_ngram_containment_matrix`):
    for every source, its BEST container (the other source holding the
    largest share of its distinct 3-gram shingles), the containment ppm,
    and the verdict — ``prunable`` iff best containment ≥
    ``PRUNE_TAU_PPM`` — with token-mass accounting (``n_docs``,
    ``n_tokens``, and ``tokens_dropped`` = the source's token mass iff
    pruned). This is the actionable form of the matrix: "drop A, it's
    already in B" becomes a per-source row a corpus-merge job can apply
    directly, with the token budget freed stated next to it (the
    `training_data_mix` accounting convention: NULL text counts 0
    tokens via COALESCE, both engines).

    Determinism contract: the best container maximizes
    ``containment_ppm`` (``DESC NULLS LAST`` spelled out in both
    engines), ties break on larger ``sz_b`` then ``source_b ASC NULLS
    FIRST`` (the shared r12 NULL-label ordering), making the pick
    total. A shingle-free source has all-NULL ppm: its
    ``best_container`` degrades to the pure tie-break pick (largest
    container set, then label order) with explicit-NULL
    ``best_containment_ppm``, and it is never prunable — so a NULL
    ``best_container`` means exactly one thing: a single-source corpus
    (no pair rows at all; the source is kept, COALESCE → false, never
    a crash).

    One-definition property: the Spark side CALLS
    :func:`q_source_ngram_containment_matrix` and the oracle nests the
    SAME registered containment SQL as a CTE — the plan can never rank
    on a different containment definition than the matrix reports.

    Scale shape: the matrix pipeline is reused verbatim (its shuffle
    story is the r14 confirmation leg's — byte-identical to the overlap
    matrix); on top of it sit ONE map-side-combined token-mass groupBy
    (corpus → |sources| rows) and a window + broadcast join over the
    |sources|²-row aggregate. Output is |sources| rows.
    """
    m = q_source_ngram_containment_matrix(spark, sf_dir)
    docs = fan_out(table(spark, sf_dir, "documents"))
    tok = F.coalesce(token_count("text").cast("bigint"), F.lit(0))
    mass = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(tok).cast("bigint").alias("n_tokens"),
    )
    w = Window.partitionBy("source_a").orderBy(
        F.desc_nulls_last("containment_ppm"), F.desc("sz_b"),
        F.asc_nulls_first("source_b"))
    best = (
        m.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("source_a").alias("bsource"),
            F.col("source_b").alias("best_container"),
            F.col("containment_ppm").alias("best_containment_ppm"),
        )
    )
    joined = mass.join(
        F.broadcast(best),
        mass["source"].eqNullSafe(best["bsource"]), "left",
    ).select("source", "n_docs", "n_tokens", "best_container",
             "best_containment_ppm")
    prunable = F.coalesce(
        F.col("best_containment_ppm") >= PRUNE_TAU_PPM, F.lit(False))
    return joined.select(
        "source", "n_docs", "n_tokens", "best_container",
        "best_containment_ppm",
        prunable.alias("prunable"),
        F.when(prunable, F.col("n_tokens")).otherwise(F.lit(0))
        .cast("bigint").alias("tokens_dropped"),
    )


_SRC_PRUNE_SQL = f"""
WITH m AS ({_SRC_CONTAINMENT_SQL}),
mass AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(COALESCE(len(string_split(text, ' ')), 0)) AS BIGINT)
           AS n_tokens
  FROM documents GROUP BY 1
),
ranked AS (
  SELECT source_a AS source, source_b AS best_container,
         containment_ppm AS best_containment_ppm,
         ROW_NUMBER() OVER (
           PARTITION BY source_a
           ORDER BY containment_ppm DESC NULLS LAST, sz_b DESC,
                    source_b ASC NULLS FIRST) AS rn
  FROM m
)
SELECT s.source, s.n_docs, s.n_tokens, b.best_container,
       b.best_containment_ppm,
       COALESCE(b.best_containment_ppm >= {PRUNE_TAU_PPM}, FALSE)
         AS prunable,
       CAST(CASE WHEN COALESCE(b.best_containment_ppm >= {PRUNE_TAU_PPM},
                               FALSE)
                 THEN s.n_tokens ELSE 0 END AS BIGINT) AS tokens_dropped
FROM mass s LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) b
  ON b.source IS NOT DISTINCT FROM s.source
"""


def q_minhash_estimate_eval(
    spark: SparkSession, sf_dir: str, fence: bool = True
) -> DataFrame:
    """MinHash estimator gate — the dedup pipeline's analog of the ANN
    recall gate: for every LSH candidate pair, the signature-based Jaccard
    estimate (matching mins / 16) side by side with the EXACT Jaccard over
    the same hashed-shingle universe, plus the integer match count so the
    driver compares exact values. This is how you validate the 16-perm
    signature is accurate enough before trusting it to delete data at
    100 TB (expected stderr ≈ 1/√16 ≈ 0.25 per pair).

    Exact Jaccard here is the SAFE composition the standalone
    `ngram_jaccard_pairs` df-cap exists to avoid needing: the shingle
    self-join runs only over docs that appear in the LSH-bounded candidate
    set (broadcast semi-joins), so the pair space is candidates-only by
    construction — never corpus².

    r18 (guide §2.4/§1.1 "first-principles", replacing the r15
    "deliberately lazy" call): the whole gate needs exactly ONE corpus
    pass — the distinct hashed-shingle universe — because the signature
    pipeline AND the exact-Jaccard sets both derive from it. The shared
    :func:`_minhash_hashed` frame is localCheckpoint-fenced and feeds
    both legs; the LSH candidate pairs (feeding the estimate join and
    both id semi-joins) and the candidate-sliced signature (broadcast
    twice) are fenced too. The un-fenced plan replayed the LSH pipeline
    ~3× and the shingle explode+distinct ×3 (measured 194 Exchange
    nodes, 3.4 s at sf0.1). The fences are pure materialization: results
    bit-identical (``sets`` = the fenced universe semi-joined to
    candidate ids — distinct commutes with the doc filter), and
    ``fence=False`` re-exposes the full single-plan form so the
    semi-join/broadcast pins stay testable on the REAL composition
    (tests/test_plans.py::test_minhash_eval_broadcasts_only_candidate_slice).
    """
    _fence = (
        (lambda df: df.localCheckpoint(eager=False)) if fence
        else (lambda df: df)
    )
    hashed = _fence(_minhash_hashed(spark, sf_dir))
    cands = _fence(
        _lsh_candidates_from(_minhash_signature(spark, sf_dir, hashed=hashed))
    )
    a_ids = cands.select(F.col("doc_a").alias("doc_id"))
    b_ids = cands.select(F.col("doc_b").alias("doc_id"))
    cand_ids = a_ids.unionByName(b_ids).distinct()

    # restrict the signature table to candidate docs BEFORE broadcasting:
    # sig is corpus-sized (one row per document) and must never broadcast
    # whole — only the LSH-bounded candidate slice does
    sig = _fence(
        _minhash_signature(spark, sf_dir, hashed=hashed).join(
            F.broadcast(cand_ids), "doc_id", "left_semi"
        )
    )

    matches = sum(
        F.when(F.col(f"a.h{j}") == F.col(f"b.h{j}"), 1).otherwise(0)
        for j in range(MINHASH_PERMS)
    )
    est = (
        cands.join(F.broadcast(sig).alias("a"),
                   F.col("doc_a") == F.col("a.doc_id"))
        .join(F.broadcast(sig).alias("b"),
              F.col("doc_b") == F.col("b.doc_id"))
        .select("doc_a", "doc_b", matches.alias("n_match"))
    )

    # the exact leg rides the SAME fenced universe: semi-join to the
    # candidate ids (order of distinct vs doc-filter is immaterial), so
    # no second corpus explode exists anywhere in the gate
    sets = _fence(
        hashed.join(F.broadcast(cand_ids), "doc_id", "left_semi")
    )
    sizes = sets.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        sets.alias("sa")
        .join(sets.alias("sb"),
              (F.col("sa.x") == F.col("sb.x"))
              & (F.col("sa.doc_id") < F.col("sb.doc_id")))
        .groupBy(F.col("sa.doc_id").alias("doc_a"),
                 F.col("sb.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    exact = (
        est.join(inter, ["doc_a", "doc_b"], "left")
        .join(sizes.select(F.col("doc_id").alias("doc_a"),
                           F.col("sz").alias("sz_a")), "doc_a")
        .join(F.broadcast(sizes.select(F.col("doc_id").alias("doc_b"),
                                       F.col("sz").alias("sz_b"))), "doc_b")
    )
    n_inter = F.coalesce(F.col("n_inter"), F.lit(0))
    return exact.select(
        "doc_a",
        "doc_b",
        F.col("n_match").cast("int").alias("n_match"),
        (F.col("n_match") / F.lit(float(MINHASH_PERMS))).alias("est_jaccard"),
        (n_inter.cast("double")
         / (F.col("sz_a") + F.col("sz_b") - n_inter).cast("double")
         ).alias("exact_jaccard"),
    )


def _minhash_eval_sql() -> str:
    eq = " + ".join(
        f"CASE WHEN a.h{j} = b.h{j} THEN 1 ELSE 0 END"
        for j in range(MINHASH_PERMS)
    )
    return f"""
WITH sig AS ({_MINHASH_SIG_SQL}),
cand AS ({_MINHASH_LSH_SQL}),
est AS (
  SELECT c.doc_a, c.doc_b, CAST({eq} AS INT) AS n_match
  FROM cand c
  JOIN sig a ON a.doc_id = c.doc_a
  JOIN sig b ON b.doc_id = c.doc_b
),
ids AS (SELECT doc_a AS doc_id FROM cand UNION SELECT doc_b FROM cand),
sets AS (
  SELECT DISTINCT doc_id, {hash60_sql('s')} % {_P} AS x
  FROM (SELECT doc_id, unnest({shingles_sql(ascii_lower_sql('text'))}) AS s
        FROM documents WHERE doc_id IN (SELECT doc_id FROM ids))
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sets GROUP BY 1),
inter AS (
  SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM sets sa JOIN sets sb ON sa.x = sb.x AND sa.doc_id < sb.doc_id
  GROUP BY 1, 2
)
SELECT e.doc_a, e.doc_b, e.n_match,
       e.n_match / {float(MINHASH_PERMS)} AS est_jaccard,
       CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
         / CAST(sa.sz + sb.sz - COALESCE(i.n_inter, 0) AS DOUBLE)
         AS exact_jaccard
FROM est e
LEFT JOIN inter i ON i.doc_a = e.doc_a AND i.doc_b = e.doc_b
JOIN sizes sa ON sa.doc_id = e.doc_a
JOIN sizes sb ON sb.doc_id = e.doc_b
"""


_MINHASH_EVAL_SQL = _minhash_eval_sql()


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash: per-token 60-bit hash votes ±1 on each bit position
    (frequency-weighted — tokens explode non-distinct); sign → bit."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", F.explode(tokens(ascii_lower(F.col("text")))).alias("t"))
    x = hash60(F.col("t"))
    votes = [
        F.sum(
            F.when(F.shiftright(x, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = toks.groupBy("doc_id").agg(*votes)
    bits = [
        F.when(F.col(f"v{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        for b in range(SIMHASH_BITS)
    ]
    simhash = bits[0]
    for bit in bits[1:]:
        simhash = simhash + bit
    return agg.select("doc_id", simhash.cast("bigint").alias("simhash16"))


def _simhash_sql() -> str:
    x = hash60_sql("t")
    votes = ",\n         ".join(
        f"SUM(CASE WHEN ({x} >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(SIMHASH_BITS)
    )
    recompose = " + ".join(
        f"CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(SIMHASH_BITS)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')) AS t FROM documents
),
agg AS (
  SELECT doc_id,
         {votes}
  FROM toks GROUP BY doc_id
)
SELECT doc_id, CAST({recompose} AS BIGINT) AS simhash16 FROM agg
"""


_SIMHASH_SQL = _simhash_sql()


def q_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish pre-tokenization (regex word/digit/punct classes): the token
    counting a data pipeline runs before a real tokenizer."""
    from tfm_taxitrips_spark.functions.text import bpe_ish_tokens

    docs = table(spark, sf_dir, "documents")
    toks = bpe_ish_tokens("text")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_bpe_tokens"),
    )


_BPE_SQL = r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INT) AS n_bpe_tokens,
       CAST(len(list_distinct(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z]+|[0-9]+|[^a-z0-9\s]'))) AS INT) AS n_distinct_bpe_tokens
FROM documents
"""


SIMHASH_HAMMING_MAX = 1
_SIMHASH_BANDS = 4  # 16 bits → 4 nibbles; hamming ≤ 3 ⟹ ≥1 identical nibble
# (the pigeonhole bound covers up to 3; we filter at 1 because a 16-bit
# simhash — sized down so the oracle stays integer-exact — saturates a
# 500-doc corpus at hamming 3. A production simhash is 64-bit.)


def q_simhash_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs via the BIT-FLIP NEIGHBORHOOD equi-join
    (Manku, Jain & Sarma, "Detecting Near-Duplicates for Web Crawling",
    WWW 2007 — the rotated-table exact-match family): each doc emits its
    hash plus all {SIMHASH_HAMMING_MAX}-flip perturbations (17 keys at
    16 bits, radius 1), joined against the plain hashes; a key match
    CONSTRUCTS hamming ≤ {SIMHASH_HAMMING_MAX}, so no non-qualifying
    pair is ever generated.

    r18 rewrite (guide §2.3/§1.2; see OPTIMIZATION_r18.md): the previous
    form pigeonholed on 4-bit nibble bands and expanded intra-bucket
    pairs — sound at 64-bit hash width, but a 16-value band space over
    this corpus makes wide buckets the NORM (width 2081 at sf0.1), so
    the expansion built ~40M candidate structs to keep 313k pairs
    (measured 10.7 s). The neighborhood join shuffles 17 small rows per
    doc and generates each qualifying pair at most twice (once per
    direction, collapsed by the final distinct) — same pair set, same
    hamming column, bit-identical output; the DuckDB oracle keeps the
    band-join formulation as the independent mirror. The signature frame
    is lazily localCheckpointed: both join sides read it, and without
    the fence the tokenize→16-vote aggregation would execute twice
    (at corpus scale: two full scans)."""
    sig = q_simhash(spark, sf_dir).localCheckpoint(eager=False)
    probe = sig.select(
        "doc_id",
        "simhash16",
        F.explode(
            F.array(
                F.col("simhash16"),
                *[
                    F.col("simhash16").bitwiseXOR(F.lit(1 << b))
                    for b in range(SIMHASH_BITS)
                ],
            )
        ).alias("key"),
    )
    orig = sig.select(
        F.col("doc_id").alias("p_id"), F.col("simhash16").alias("key")
    )
    joined = probe.join(orig, "key").where(F.col("doc_id") != F.col("p_id"))
    # hamming directly: key == partner hash, so xor(simhash16, key) is the
    # pair's bit difference
    pairs = joined.select(
        F.least("doc_id", "p_id").alias("doc_a"),
        F.greatest("doc_id", "p_id").alias("doc_b"),
        F.bit_count(F.col("simhash16").bitwiseXOR(F.col("key")))
        .cast("int").alias("hamming"),
    )
    return pairs.where(F.col("hamming") <= SIMHASH_HAMMING_MAX).distinct()


def _simhash_pairs_sql() -> str:
    bands = "\nUNION ALL\n".join(
        f"SELECT doc_id, simhash16, {b} AS band_id,"
        f" (simhash16 >> {4 * b}) & 15 AS bv FROM sig"
        for b in range(_SIMHASH_BANDS)
    )
    return f"""
WITH sig AS ({_SIMHASH_SQL}),
bands AS ({bands})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash16, b.simhash16)) AS INT) AS hamming
FROM bands a
JOIN bands b ON a.band_id = b.band_id AND a.bv = b.bv AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash16, b.simhash16)) <= {SIMHASH_HAMMING_MAX}
"""


_SIMHASH_PAIRS_SQL = _simhash_pairs_sql()


def per_source_dedup_rate_frame(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Frame-level core of :func:`q_per_source_dedup_rate` — takes any
    documents-shaped frame (doc_id, source, text) plus a near-dup pair
    frame (doc_a, doc_b) so the exact-dup path is unit-testable with
    injected duplicates (the committed fixture has zero identical texts,
    so only a constructed frame can exercise n_exact_dup > 0)."""
    # ONE (doc_id, source) scan shared by the three id consumers below
    # (r19, guide §2.4): totals, the pair labeling and the partner
    # lookup each replayed the scan (plus its fan-out exchange) before.
    ids = docs.select("doc_id", "source").localCheckpoint(eager=False)
    # exact dups in ONE chain (r19): per-(md5, source) counts, a window
    # over the md5 partitions for the corpus-wide count, then the
    # per-source total — same n_exact_dup as the old over-1-groups
    # semi-join-back, without the second full docs scan (and its md5
    # re-computation) or the join. The window partitions by the hash —
    # |distinct md5| partitions of tiny count rows at any scale.
    g1 = (
        docs.select("source", F.md5("text").alias("ch"))
        .groupBy("ch", "source")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    exact = (
        g1.withColumn(
            "_n", F.sum("_c").over(Window.partitionBy("ch")))
        .where(F.col("_n") > 1)
        .groupBy("source")
        .agg(F.coalesce(F.sum("_c"), F.lit(0)).cast("bigint")
             .alias("n_exact_dup"))
    )
    # near dups: the candidate pair set is LSH/band-bounded (≪ corpus),
    # so it BROADCASTS into the (doc_id, source) projection — the corpus
    # is never shuffled (the cross_source_dup_matrix shape); per-doc
    # flags collapse pairs to ≤1 row per member doc before counting.
    # r18: both directions via ONE explode instead of a two-branch
    # union — the union form consumed ``pairs`` twice, which forced the
    # caller to localCheckpoint the (expensive) pair plan; the explode
    # keeps a single consumer so no checkpoint is needed at all
    # (measured: the lazy checkpoint's driver-side plan compilation
    # alone was ~12 s on the simhash pair plan). Row set identical:
    # union of the two projections == explode of the two structs.
    sided = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("doc_a").alias("doc_id"),
                    F.col("doc_b").alias("partner"),
                ),
                F.struct(
                    F.col("doc_b").alias("doc_id"),
                    F.col("doc_a").alias("partner"),
                ),
            )
        ).alias("_s")
    ).select("_s.doc_id", "_s.partner")
    lab = ids.join(F.broadcast(sided), "doc_id").select(
        "doc_id", F.col("source").alias("src"), "partner"
    )
    part = ids.select(
        F.col("doc_id").alias("partner"), F.col("source").alias("partner_src")
    )
    lab2 = part.join(F.broadcast(lab), "partner").select(
        "doc_id", "src", "partner_src"
    )
    flags = lab2.groupBy("doc_id", "src").agg(
        F.max(F.when(F.col("partner_src") != F.col("src"), 1).otherwise(0))
        .alias("is_cross")
    )
    near = flags.groupBy(F.col("src").alias("source")).agg(
        F.count(F.lit(1)).alias("n_near_dup"),
        F.sum("is_cross").cast("bigint").alias("n_cross_near_dup"),
    )
    totals = ids.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    z = F.lit(0).cast("bigint")
    return (
        totals.join(exact, "source", "left")
        .join(near, "source", "left")
        .select(
            "source", "n_docs",
            F.coalesce("n_exact_dup", z).alias("n_exact_dup"),
            F.coalesce("n_near_dup", z).alias("n_near_dup"),
            F.coalesce("n_cross_near_dup", z).alias("n_cross_near_dup"),
            F.expr("(1000000 * coalesce(n_exact_dup, 0)) div n_docs")
            .alias("exact_dup_ppm"),
            F.expr("(1000000 * coalesce(n_near_dup, 0)) div n_docs")
            .alias("near_dup_ppm"),
        )
    )


def q_per_source_dedup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation dashboard's main table: per document source, how many
    docs are exact duplicates (identical text anywhere in the corpus) and
    how many are near-duplicates (a SimHash hamming-≤1 partner), with the
    cross-source near-dup count (partner lives in a DIFFERENT source — the
    re-crawl / mirror signal) and integer-ppm rates. Every source emits a
    row even with zero dups (left joins off the per-source totals), so a
    clean source is visible, not absent. Categories are independent: an
    exact dup is normally also a near dup; the columns answer different
    questions (delete-now vs investigate).

    Composes the registered exact (md5 groupBy, `dedup_exact_docs`) and
    near (`simhash_dup_pairs` band machinery) paths; the per-source-PAIR
    view of the same signal is `cross_source_dup_matrix`. Scale shape in
    :func:`per_source_dedup_rate_frame`.
    """
    docs = fan_out(table(spark, sf_dir, "documents"))
    # r18: no checkpoint — the frame now consumes the pair set ONCE
    # (explode-to-both-directions in `sided`), so the simhash pair plan
    # is neither re-executed nor eagerly compiled on the driver (the old
    # lazy localCheckpoint forced whole-plan RDD compilation at
    # construction: ~12 s of driver time for this plan, measured r18)
    pairs = q_simhash_dup_pairs(spark, sf_dir)
    return per_source_dedup_rate_frame(docs, pairs)


_PER_SOURCE_DEDUP_SQL = f"""
WITH pairs AS ({_SIMHASH_PAIRS_SQL}),
dup_h AS (
  SELECT md5(text) AS ch FROM documents GROUP BY 1 HAVING COUNT(*) > 1
),
exact AS (
  SELECT source, COUNT(*) AS n_exact_dup
  FROM documents WHERE md5(text) IN (SELECT ch FROM dup_h)
  GROUP BY 1
),
sided AS (
  SELECT doc_a AS doc_id, doc_b AS partner FROM pairs
  UNION ALL
  SELECT doc_b AS doc_id, doc_a AS partner FROM pairs
),
flags AS (
  SELECT d.doc_id, d.source,
         MAX(CASE WHEN pd.source <> d.source THEN 1 ELSE 0 END) AS is_cross
  FROM sided s
  JOIN documents d ON d.doc_id = s.doc_id
  JOIN documents pd ON pd.doc_id = s.partner
  GROUP BY 1, 2
),
near AS (
  SELECT source, COUNT(*) AS n_near_dup,
         CAST(SUM(is_cross) AS BIGINT) AS n_cross_near_dup
  FROM flags GROUP BY 1
),
totals AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1)
SELECT t.source, t.n_docs,
       COALESCE(e.n_exact_dup, 0) AS n_exact_dup,
       COALESCE(n.n_near_dup, 0) AS n_near_dup,
       COALESCE(n.n_cross_near_dup, 0) AS n_cross_near_dup,
       CAST((1000000 * COALESCE(e.n_exact_dup, 0)) // t.n_docs AS BIGINT)
         AS exact_dup_ppm,
       CAST((1000000 * COALESCE(n.n_near_dup, 0)) // t.n_docs AS BIGINT)
         AS near_dup_ppm
FROM totals t
LEFT JOIN exact e ON e.source = t.source
LEFT JOIN near n ON n.source = t.source
"""


def q_token_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-200 BPE-ish tokens by term frequency with doc
    frequency — the counting pass a BPE/vocab trainer runs over the corpus.
    Plan: explode is map-side; one shuffle on token (partial counts
    combine map-side), top-k via TakeOrderedAndProject."""
    from tfm_taxitrips_spark.functions.text import bpe_ish_tokens

    docs = fan_out(table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.explode(bpe_ish_tokens(F.col("text"))).alias("token")
    )
    agg = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("tf"),
        F.count_distinct("doc_id").alias("df"),
    )
    return agg.orderBy(F.col("tf").desc(), F.col("token").asc()).limit(200)


_VOCAB_SQL = r"""
SELECT token, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
FROM (
  SELECT doc_id,
         unnest(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS token
  FROM documents
)
GROUP BY token
ORDER BY tf DESC, token ASC
LIMIT 200
"""


_OOV_VOCAB_K = 20


def q_token_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-coverage audit: derive the top-K corpus vocabulary, then
    score every document's out-of-vocabulary token fraction — the check a
    tokenizer/vocab change runs before retraining ("what % of the corpus
    does this vocab NOT cover, and which docs are worst").

    Plan: vocab = one map-side-combined count shuffle + TakeOrdered
    (deterministic tf-desc/token-asc tie-break); the vocab (tiny by
    construction) BROADCASTS back onto the exploded token stream, so the
    per-doc scoring pass adds only the doc-keyed aggregation shuffle. K is
    20 (not a production 50k) because the synthetic corpus vocabulary is
    ~30 words — the plan shape is identical at any K that fits a
    broadcast.
    """
    docs = fan_out(table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", F.explode(tokens("text")).alias("t"))
    vocab = (
        toks.groupBy("t").agg(F.count(F.lit(1)).alias("tf"))
        .orderBy(F.col("tf").desc(), F.col("t").asc())
        .limit(_OOV_VOCAB_K)
        .select("t", F.lit(1).alias("_v"))
    )
    n_tok = F.count(F.lit(1)).cast("bigint")
    n_oov = F.sum(F.when(F.col("_v").isNull(), 1).otherwise(0)).cast("bigint")
    return (
        toks.join(F.broadcast(vocab), "t", "left")
        .groupBy("doc_id")
        .agg(n_tok.alias("n_tokens"), n_oov.alias("n_oov"))
        .select(
            "doc_id", "n_tokens", "n_oov",
            (F.col("n_oov").cast("double")
             / F.col("n_tokens").cast("double")).alias("oov_rate"),
        )
    )


_OOV_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
),
v AS (
  SELECT t FROM tok GROUP BY t
  ORDER BY COUNT(*) DESC, t ASC LIMIT {_OOV_VOCAB_K}
),
d AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN t IN (SELECT t FROM v) THEN 0 ELSE 1 END)
              AS BIGINT) AS n_oov
  FROM tok GROUP BY doc_id
)
SELECT doc_id, n_tokens, n_oov,
       CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS oov_rate
FROM d
"""


# --------------------------------------------------------------------------
# Training-data prep composite
# --------------------------------------------------------------------------

# the go/no-go quality gate shared by q_training_mix (which FILTERS by
# it) and q_source_quality_mix_curve (which MEASURES it per source) —
# one pair of constants, so the curve can never describe a different
# gate than the mix pipeline applies
QGATE_MIN_TOKENS = 20
QGATE_MIN_CHARS = 100


def q_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical LLM-corpus prep pipeline as ONE declarative plan:
    quality filter → exact dedup (keep lowest doc_id per content hash) →
    deterministic 50% sample → hash-sharding → per-shard token accounting.

    Every stage is reproducible across runs and engines (md5-derived
    hashes, no rand()): re-running on an updated corpus keeps sample
    membership stable — the property that matters when a 100 TB corpus is
    re-mixed incrementally. Plan shape: one narrow scan+filter, one
    dedup shuffle on the content hash, one final agg shuffle.
    Gate constants shared with :func:`q_source_quality_mix_curve`.
    """
    docs = fan_out(table(spark, sf_dir, "documents"))
    n_tok = token_count("text")
    filtered = docs.where(
        (n_tok >= QGATE_MIN_TOKENS) & (F.length("text") >= QGATE_MIN_CHARS))
    keyed = filtered.withColumn("k", F.md5(ascii_lower(F.col("text"))))
    # r18 (guide §2.3 'aggregate before you shuffle'): keep-lowest-doc_id
    # dedup as a hash aggregate (min + min_by), not row_number()==1 over a
    # sort window. The window form ships EVERY duplicate row through the
    # exchange and then sorts each k-partition; the aggregate form
    # collapses duplicates map-side (partial min/min_by) and never sorts —
    # for an exact-dedup stage, duplicates are precisely the rows partial
    # aggregation kills before the wire. min_by is deterministic here
    # because doc_id is unique (no ties). Verified row-identical to the
    # window form at sf0.1 before the switch; the oracle keeps the
    # row_number formulation (engine-independent semantics spelled out).
    deduped = (
        keyed.groupBy("k")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min_by(F.struct("lang", "text"), F.col("doc_id")).alias("_s"),
        )
        .select("doc_id", F.col("_s.lang").alias("lang"),
                F.col("_s.text").alias("text"))
    )
    sample_h = hash60(F.concat(F.lit("sample:"), F.col("doc_id").cast("string")))
    shard_h = hash60(F.concat(F.lit("shard:"), F.col("doc_id").cast("string")))
    sampled = deduped.where(F.pmod(sample_h, F.lit(100)) < 50)
    sharded = sampled.withColumn("shard", F.pmod(shard_h, F.lit(8)))
    return sharded.groupBy("shard", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count("text").cast("bigint")).alias("total_tokens"),
    )


_TRAINING_MIX_SQL = f"""
WITH f AS (
  SELECT doc_id, lang, text FROM documents
  WHERE len(string_split(text, ' ')) >= {QGATE_MIN_TOKENS}
    AND length(text) >= {QGATE_MIN_CHARS}
),
d AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')) ORDER BY doc_id) AS rn
  FROM f
),
s AS (
  SELECT * FROM d
  WHERE rn = 1
    AND {hash60_sql("concat('sample:', CAST(doc_id AS VARCHAR))")} % 100 < 50
)
SELECT CAST({hash60_sql("concat('shard:', CAST(doc_id AS VARCHAR))")} % 8 AS BIGINT) AS shard,
       lang, COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
FROM s GROUP BY 1, 2
"""


def q_source_quality_mix_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality-gate pass rate × token mass, plus the cumulative
    mix curve (r12 shortlist, landed r12) — the go/no-go table
    :func:`q_training_mix` ASSUMES when it applies the gate corpus-wide:
    for each source, docs/tokens seen vs docs/tokens passing the SHARED
    gate (``QGATE_MIN_TOKENS``/``QGATE_MIN_CHARS`` — same constants, both
    engines, so the curve cannot describe a different gate than the mix
    pipeline applies), pass rates in exact ppm, and the running
    best-sources-first curve: sources ranked by token pass rate, each row
    carrying the cumulative surviving-token share — read off "the top k
    sources supply X% of the gated corpus" directly.

    Stated contracts: NULL text counts 0 tokens and FAILS the gate
    (COALESCE, both engines); a NULL source is a real audit row; a
    zero-token source has an explicit-NULL token pass rate (NULLIF) and
    ranks LAST (explicit ``DESC NULLS LAST`` in both engines — Spark
    defaults that for DESC, DuckDB's default null ordering is
    configurable, so it is spelled out); ties break on source ASC NULLS
    FIRST, making the rank total and deterministic (source is the group
    key, hence unique). Counts and token sums route through
    DECIMAL(38,0)/HUGEINT before the ×10⁶ ppm scaling — 10¹³ pass-tokens
    × 10⁶ overflows BIGINT at 100 TB.

    Scale shape: ONE map-side-combined groupBy collapses the corpus to
    |sources| rows (checkpointed so the ranking window and the unbounded
    total ride the aggregate, not the scan); the single-partition window
    is deliberate and aggregate-sized — the same convention as every
    |groups|-row window in the repo. Output is |sources| rows.
    """
    docs = table(spark, sf_dir, "documents")
    tok = F.coalesce(token_count("text").cast("bigint"), F.lit(0))
    gate = (
        (tok >= QGATE_MIN_TOKENS)
        & (F.coalesce(F.length("text"), F.lit(0)) >= QGATE_MIN_CHARS)
    ).cast("bigint")
    per = (
        docs.select(F.col("source"), tok.alias("tok"), gate.alias("p"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("n_docs"),
            F.sum("p").cast("decimal(38,0)").alias("n_pass"),
            F.sum("tok").cast("decimal(38,0)").alias("tok_total"),
            F.sum(F.col("tok") * F.col("p")).cast("decimal(38,0)")
            .alias("tok_pass"),
        )
        .withColumn(
            "tok_pass_ppm",
            F.expr("tok_pass * 1000000 div nullif(tok_total, 0)"))
        .localCheckpoint(eager=False)  # ranking window + unbounded total
    )
    w = Window.orderBy(
        F.desc_nulls_last("tok_pass_ppm"), F.asc_nulls_first("source"))
    staged = per.select(
        "*",
        F.row_number().over(w).cast("int").alias("quality_rank"),
        F.sum("tok_pass")
        .over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum_pass"),
        F.sum("tok_pass")
        .over(w.rowsBetween(Window.unboundedPreceding,
                            Window.unboundedFollowing)).alias("all_pass"),
    )
    return staged.select(
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("n_pass").cast("bigint").alias("n_pass_docs"),
        F.expr("n_pass * 1000000 div n_docs").cast("bigint")
        .alias("doc_pass_ppm"),
        F.col("tok_total").cast("bigint").alias("tok_total"),
        F.col("tok_pass").cast("bigint").alias("tok_pass"),
        F.col("tok_pass_ppm").cast("bigint").alias("tok_pass_ppm"),
        "quality_rank",
        F.col("cum_pass").cast("bigint").alias("cum_pass_tok"),
        F.expr("cum_pass * 1000000 div nullif(all_pass, 0)").cast("bigint")
        .alias("cum_share_ppm"),
    )


_QGATE_SQL_PRED = (
    f"COALESCE(len(string_split(text, ' ')), 0) >= {QGATE_MIN_TOKENS} "
    f"AND COALESCE(length(text), 0) >= {QGATE_MIN_CHARS}"
)

_QUALITY_MIX_CURVE_SQL = f"""
WITH per AS (
  SELECT source,
         CAST(COUNT(*) AS HUGEINT) AS n_docs,
         CAST(SUM(CASE WHEN {_QGATE_SQL_PRED} THEN 1 ELSE 0 END)
              AS HUGEINT) AS n_pass,
         CAST(SUM(COALESCE(len(string_split(text, ' ')), 0))
              AS HUGEINT) AS tok_total,
         CAST(SUM(CASE WHEN {_QGATE_SQL_PRED}
                       THEN COALESCE(len(string_split(text, ' ')), 0)
                       ELSE 0 END) AS HUGEINT) AS tok_pass
  FROM documents GROUP BY 1
),
r AS (
  SELECT *, tok_pass * 1000000 // NULLIF(tok_total, 0) AS tok_pass_ppm
  FROM per
),
wnd AS (
  SELECT *,
         CAST(ROW_NUMBER() OVER (ORDER BY tok_pass_ppm DESC NULLS LAST,
                                 source ASC NULLS FIRST) AS INT)
           AS quality_rank,
         SUM(tok_pass) OVER (ORDER BY tok_pass_ppm DESC NULLS LAST,
                             source ASC NULLS FIRST
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pass,
         SUM(tok_pass) OVER (ORDER BY tok_pass_ppm DESC NULLS LAST,
                             source ASC NULLS FIRST
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS all_pass
  FROM r
)
SELECT source,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_pass AS BIGINT) AS n_pass_docs,
       CAST(n_pass * 1000000 // n_docs AS BIGINT) AS doc_pass_ppm,
       CAST(tok_total AS BIGINT) AS tok_total,
       CAST(tok_pass AS BIGINT) AS tok_pass,
       CAST(tok_pass_ppm AS BIGINT) AS tok_pass_ppm,
       quality_rank,
       CAST(cum_pass AS BIGINT) AS cum_pass_tok,
       CAST(cum_pass * 1000000 // NULLIF(all_pass, 0) AS BIGINT)
         AS cum_share_ppm
FROM wnd
"""


def _top_gram_count(arr) -> F.Column:
    """Highest occurrence count of any element of ``arr`` — the longest run
    in the sorted array, via one ``aggregate`` fold.

    Deliberately NOT explode + groupBy(doc, gram) + max: that is two
    corpus-sized shuffles keyed by (doc, gram). Documents are row-bounded,
    so an O(L log L) in-row fold keeps the whole query shuffle-FREE — at
    100 TB this is a pure map job that scales linearly with input splits.
    (For pathological multi-GB single documents the explode form would be
    the fallback; corpus docs are capped far below that.)
    """
    s = F.array_sort(arr)
    zero = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(s, zero, step, lambda acc: acc["best"])


def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document (Rae et al. 2021,
    "Scaling Language Models", table A1): the occurrence fraction of the
    most frequent word 2-gram / 3-gram, and a ``repetitive`` flag at the
    paper's 0.20 / 0.18 thresholds. Boilerplate-heavy or looping docs
    (nav bars, keyword stuffing, decoding loops) score high and get
    filtered before training.

    Zero-shuffle design: see :func:`_top_gram_count`.

    r18 (guide §1.2 "per-task work"): STAGED projections. The one-select
    form repeated each O(L log L) fold per consuming output column —
    ``top_bigram_frac`` and ``repetitive`` each re-ran the whole
    sort+fold, and every ``size`` re-tokenized — because codegen
    subexpression elimination does not cover lambda-bearing higher-order
    expressions. Three chained selects materialize each array once, each
    fold once, and derive the fractions/flag from plain column
    references; Catalyst's CollapseProject keeps the stages apart
    exactly because the producing expressions are non-cheap and
    multiply-referenced. Output expressions and types are unchanged.
    """
    docs = table(spark, sf_dir, "documents")

    def frac(top, n):
        return F.when(
            n >= 1, top.cast("double") / n.cast("double")
        ).otherwise(F.lit(0.0))

    arrs = docs.select(
        "doc_id",
        shingles("text", 2).alias("_bi"),
        shingles("text", 3).alias("_tri"),
    )
    counts = arrs.select(
        "doc_id",
        F.size("_bi").alias("n_bigrams"),
        _top_gram_count(F.col("_bi")).alias("top_bigram_n"),
        F.size("_tri").alias("n_trigrams"),
        _top_gram_count(F.col("_tri")).alias("top_trigram_n"),
    )
    bi_frac = frac(F.col("top_bigram_n"), F.col("n_bigrams"))
    tri_frac = frac(F.col("top_trigram_n"), F.col("n_trigrams"))
    return counts.select(
        "doc_id",
        "n_bigrams",
        "top_bigram_n",
        bi_frac.alias("top_bigram_frac"),
        "n_trigrams",
        "top_trigram_n",
        tri_frac.alias("top_trigram_frac"),
        ((bi_frac > 0.20) | (tri_frac > 0.18)).alias("repetitive"),
    )


_DOC_REPETITION_SQL = f"""
WITH bg AS (
  SELECT doc_id, unnest({shingles_sql('text', 2)}) AS g FROM documents
),
tg AS (
  SELECT doc_id, unnest({shingles_sql('text', 3)}) AS g FROM documents
),
bc AS (
  SELECT doc_id, MAX(c) AS top_bg FROM (
    SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY 1, 2) GROUP BY 1
),
tc AS (
  SELECT doc_id, MAX(c) AS top_tg FROM (
    SELECT doc_id, g, COUNT(*) AS c FROM tg GROUP BY 1, 2) GROUP BY 1
),
base AS (
  SELECT doc_id,
         CAST(len({shingles_sql('text', 2)}) AS INT) AS n_bigrams,
         CAST(len({shingles_sql('text', 3)}) AS INT) AS n_trigrams
  FROM documents
)
SELECT b.doc_id, b.n_bigrams,
       CAST(COALESCE(bc.top_bg, 0) AS INT) AS top_bigram_n,
       CASE WHEN b.n_bigrams >= 1
            THEN CAST(COALESCE(bc.top_bg, 0) AS DOUBLE) / CAST(b.n_bigrams AS DOUBLE)
            ELSE 0.0 END AS top_bigram_frac,
       b.n_trigrams,
       CAST(COALESCE(tc.top_tg, 0) AS INT) AS top_trigram_n,
       CASE WHEN b.n_trigrams >= 1
            THEN CAST(COALESCE(tc.top_tg, 0) AS DOUBLE) / CAST(b.n_trigrams AS DOUBLE)
            ELSE 0.0 END AS top_trigram_frac,
       (CASE WHEN b.n_bigrams >= 1
             THEN CAST(COALESCE(bc.top_bg, 0) AS DOUBLE) / CAST(b.n_bigrams AS DOUBLE)
             ELSE 0.0 END > 0.20
        OR
        CASE WHEN b.n_trigrams >= 1
             THEN CAST(COALESCE(tc.top_tg, 0) AS DOUBLE) / CAST(b.n_trigrams AS DOUBLE)
             ELSE 0.0 END > 0.18) AS repetitive
FROM base b
LEFT JOIN bc ON b.doc_id = bc.doc_id
LEFT JOIN tc ON b.doc_id = tc.doc_id
"""


_SPLIT_MOD, _SPLIT_BASE = 10, 8  # deterministic 80/20 base/incoming split


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus dedup: flag each INCOMING document against the
    BASE corpus's fingerprint store — exact (content hash seen before) and
    near (any MinHash-LSH band bucket shared with a base doc). The shape
    every growing training corpus needs: a new crawl slice is admitted by
    probing fingerprints, never by re-pairing against the full corpus.

    Scale design: in production the two probe sets — base content hashes
    and DISTINCT base band buckets — are PRE-MATERIALIZED once and only
    appended to (each is a few bytes per doc); admitting a slice is then
    two semi-joins of the (small) incoming side against them, keyed on
    compact hashes, with no base re-scan and no pair generation at all.
    Here both sides derive from the one `documents` table via a
    deterministic hash split (80/20) so the DuckDB oracle can reproduce
    the exact decision for every incoming doc.

    Base membership is recomputed from ``doc_id`` wherever needed (a
    map-side hash) instead of joining a tag column around — one fewer
    corpus-sized join.
    """
    docs = fan_out(table(spark, sf_dir, "documents"))
    is_base = (
        F.pmod(hash60(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))),
               F.lit(_SPLIT_MOD)) < _SPLIT_BASE
    )
    keyed = docs.select("doc_id", F.md5(ascii_lower(F.col("text"))).alias("k"),
                        is_base.alias("_b"))
    base_keys = keyed.where("_b").select("k").distinct()
    incoming = keyed.where(~F.col("_b"))
    exact_ids = (
        incoming.join(base_keys, "k", "left_semi").select("doc_id")
        .withColumn("_e", F.lit(True))
    )
    bands = _minhash_bands(_minhash_signature(spark, sf_dir)).withColumn(
        "_b",
        F.pmod(hash60(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))),
               F.lit(_SPLIT_MOD)) < _SPLIT_BASE,
    )
    base_buckets = bands.where("_b").select("band_id", "bh").distinct()
    near_ids = (
        bands.where(~F.col("_b"))
        .join(base_buckets, ["band_id", "bh"], "left_semi")
        .select("doc_id").distinct()
        .withColumn("_n", F.lit(True))
    )
    out = (
        incoming.select("doc_id")
        .join(exact_ids, "doc_id", "left")
        .join(near_ids, "doc_id", "left")
    )
    e = F.coalesce(F.col("_e"), F.lit(False))
    n = F.coalesce(F.col("_n"), F.lit(False))
    return out.select(
        "doc_id",
        e.alias("is_exact_dup"),
        n.alias("is_near_dup"),
        F.when(e, "drop").when(n, "review").otherwise("keep").alias("action"),
    )


def _dedup_incremental_sql() -> str:
    split_hash = hash60_sql("concat('split:', CAST(doc_id AS VARCHAR))")
    split = f"{split_hash} % {_SPLIT_MOD} < {_SPLIT_BASE}"
    return f"""
WITH sig AS ({_MINHASH_SIG_SQL}),
bands AS ({_bands_union_sql()}),
t AS (
  SELECT doc_id, md5(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')) AS k, ({split}) AS is_base FROM documents
),
exact AS (
  SELECT DISTINCT i.doc_id FROM t i
  WHERE NOT i.is_base
    AND i.k IN (SELECT k FROM t WHERE is_base)
),
bb AS (
  SELECT DISTINCT band_id, bh
  FROM bands JOIN t USING (doc_id) WHERE t.is_base
),
near AS (
  SELECT DISTINCT bands.doc_id
  FROM bands JOIN t USING (doc_id) JOIN bb USING (band_id, bh)
  WHERE NOT t.is_base
)
SELECT t.doc_id,
       (e.doc_id IS NOT NULL) AS is_exact_dup,
       (n.doc_id IS NOT NULL) AS is_near_dup,
       CASE WHEN e.doc_id IS NOT NULL THEN 'drop'
            WHEN n.doc_id IS NOT NULL THEN 'review'
            ELSE 'keep' END AS action
FROM t
LEFT JOIN exact e ON t.doc_id = e.doc_id
LEFT JOIN near n ON t.doc_id = n.doc_id
WHERE NOT t.is_base
"""


_DEDUP_INCREMENTAL_SQL = _dedup_incremental_sql()


TFIDF_TOP_TERMS = 3


def q_tfidf_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document distinctive terms: the top-3 terms ranked by term
    frequency descending, then document frequency ascending (frequent in
    THIS doc, rare across the corpus) — the tf-idf ranking with the
    monotone ``ln(N/df)`` weight replaced by the exact lexicographic order
    ``(tf DESC, df ASC)``, so no transcendental float enters either
    engine's plan and the result is bit-reproducible. ``tf``/``df`` are
    emitted so any idf weighting can be applied downstream.

    Plan: explode is map-side; tf aggregates on (doc, term) with map-side
    combine; df is a COUNT WINDOW over the already-reduced tf rows (one
    row per distinct (doc, term)) rather than a groupBy+self-join — the
    join formulation makes Catalyst re-derive tf's whole lineage on the
    df side and scan the corpus twice (no ReuseExchange across the
    diamond), while the window keeps a single scan. Three exchanges
    total — (doc,term) for tf, term for df, doc for the top-k — each
    carrying only reduced rows; top-k per doc is row_number, which the
    engine caps map-side via WindowGroupLimit.
    """
    docs = fan_out(table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    w_df = Window.partitionBy("term")
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        tf.withColumn("df", F.count(F.lit(1)).over(w_df))
        .select(
            "doc_id", "term", "tf", "df",
            F.row_number().over(w).alias("rnk"),
        )
        .where(F.col("rnk") <= TFIDF_TOP_TERMS)
    )


_TFIDF_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
),
df AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
)
SELECT * FROM (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY tf.doc_id
           ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS INT) AS rnk
  FROM tf JOIN df USING (term)
) WHERE rnk <= {TFIDF_TOP_TERMS}
"""


def q_token_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-diversity corpus QC: per document, type-token ratio,
    Simpson concentration (Σp² — the inverse participation ratio; high =
    few token types dominate = repetition/gibberish), and top-token share.
    Together these catch the low-diversity failure modes a pretraining
    filter drops (boilerplate, keyword stuffing, decode loops) without
    any n-gram machinery.

    Float discipline: every ratio is integer ppm via ``div`` on exact
    bigint counts — unlike Shannon entropy there is NO transcendental
    anywhere, so the driver hash holds with zero rounding risk. Plan: one
    (doc, token) reduce with map-side combine, then a doc-keyed reduce of
    the already-reduced rows; the ppm projections are scalar expressions.
    """
    docs = fan_out(table(spark, sf_dir, "documents"))
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("t"))
    tf = tok.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("c"))
    agg = tf.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sum_c2"),
        F.max("c").cast("bigint").alias("max_c"),
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        "n_types",
        F.expr("(1000000 * n_types) div n_tokens").alias("ttr_ppm"),
        F.expr("(1000000 * sum_c2) div (n_tokens * n_tokens)").alias(
            "simpson_ppm"
        ),
        F.expr("(1000000 * max_c) div n_tokens").alias("top_share_ppm"),
    )


_TOKEN_DIVERSITY_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
),
tf AS (
  SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY 1, 2
),
agg AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_types,
         CAST(SUM(c * c) AS BIGINT) AS sum_c2,
         CAST(MAX(c) AS BIGINT) AS max_c
  FROM tf GROUP BY 1
)
SELECT doc_id, n_tokens, n_types,
       (1000000 * n_types) // n_tokens AS ttr_ppm,
       (1000000 * sum_c2) // (n_tokens * n_tokens) AS simpson_ppm,
       (1000000 * max_c) // n_tokens AS top_share_ppm
FROM agg
"""


#: Token-set Jaccard threshold for the prefix-filtered similarity join,
#: in parts-per-million (integer compare in both engines — no float
#: boundary can flip membership).
SETSIM_TAU_PPM = 800_000
SETSIM_TAU_NUM, SETSIM_TAU_DEN = 4, 5  # τ = 4/5, kept as a ratio for ceil()


def q_setsim_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set similarity join at Jaccard ≥ 0.8 via PREFIX
    FILTERING (Bayardo et al. "Scaling Up All Pairs", Xiao et al. PPJoin —
    public algorithms): the exact-result counterpart to the probabilistic
    MinHash-LSH pipeline, for when a curation rule needs *no* false
    negatives.

    Why it scales where the naive form cannot: J(A,B) ≥ τ forces
    |A∩B| ≥ ⌈τ·|A|⌉, so if the tokens of every doc are sorted by ONE
    global order (document frequency ascending, then token — rarest
    first), any qualifying pair must already collide inside the first
    ``|A| - ⌈τ·|A|⌉ + 1`` tokens of each side. Only those prefix tokens
    (≈ 20% of each set at τ=0.8, and by construction the RAREST ones, so
    Zipf-head tokens almost never drive candidates) enter the join; the
    exact |∩|/|∪| then runs on candidates only. The prefix join itself is
    intra-bucket pair generation keyed on the token, so it reuses the
    salted ``bucket_pairs`` guard — a freak hot prefix token salts into
    bounded sub-groups instead of funnelling one task (same guarantee as
    the LSH bucket path, pair set provably identical).

    The tokenized corpus (sorted token array + set size per doc) is
    materialized once via lazy ``localCheckpoint`` — three consumers read
    it (prefix explode, both verify sides); without it the plan would
    re-run scan→explode→df-join→collect per consumer (the pagerank edge
    lesson, tests/test_graph.py::test_pagerank_edge_pipeline_materialized_once).

    r18 (guide §2.3 'narrower types'; OPTIMIZATION_r18.md): token STRINGS
    leave the pipeline at the document-frequency table. Each distinct
    token gets a dense BIGINT rank via the engine's own distributed
    two-phase prefix sum over the global (df_t, token) order — the rank
    IS that total order, so per-doc arrays of sorted ranks have exactly
    the same prefixes, the same bucket keys, and the same intersection
    sizes as the string form (the mapping is bijective on the vocabulary
    and strictly order-preserving; prefix filtering is lossless under ANY
    consistent total order). Every downstream stage — the collect/sort,
    the prefix explode, the bucket hash, the pair expansion, and the
    ``array_intersect`` verify over millions of candidate pairs — then
    runs on 8-byte integers instead of variable-length strings. Pinned
    bit-identical to the string formulation by
    tests/test_r18_optimizations.py::test_setsim_rank_form_equals_string_form;
    the DuckDB oracle keeps the string-token brute force as the
    independent mirror.

    The oracle brute-forces the full shared-token self-join — quadratic,
    fine at oracle scale — proving the prefix filter is LOSSLESS
    (identical pair set), which is the whole point of registering it.
    """
    docs = fan_out(table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(ascii_lower(F.col("text")), " "))).alias("t"),
    )
    # vocab-sized relation; checkpointed because the prefix-sum operator
    # reads its input twice (operators/prefix.py caller contract)
    df_t = (
        toks.groupBy("t").agg(F.count(F.lit(1)).alias("df_t"))
        .localCheckpoint(eager=False)
    )
    ranked = two_phase_prefix_sum(
        df_t.withColumn("_one", F.lit(1)),
        bucket_col="df_t",
        order_cols=["t"],
        val_col="_one",
        out_col="rk",
    ).select("t", F.col("rk").cast("bigint").alias("rk"))
    doc_arr = (
        toks.join(ranked, "t")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("rk")).alias("ts"))
        .select(
            "doc_id",
            "ts",
            F.size("ts").alias("s"),
            F.slice(
                "ts",
                1,
                F.expr(
                    f"size(ts) - ((({SETSIM_TAU_NUM} * size(ts))"
                    f" + {SETSIM_TAU_DEN} - 1) div {SETSIM_TAU_DEN}) + 1"
                ),
            ).alias("prefix"),
        )
        .localCheckpoint(eager=False)
    )
    # r18 (guide §2.3 'shuffle fewer bytes'; numbers in
    # OPTIMIZATION_r18.md): the prefix tokens ride with the doc's SET
    # SIZE so the exact size-ratio filter — J(A,B) ≥ τ requires
    # τ·max(|A|,|B|) ≤ min(|A|,|B|), an integer-exact necessary
    # condition (J ≤ min/max since |∩| ≤ min) — prunes candidates
    # INSIDE the expansion, before the |∩| verify. On this
    # fixture's 31-token vocabulary the prefix filter alone keeps 97%
    # of all pairs (measured), and the size filter kills ~48% of those
    # in the expansion stage, halving the verify joins. Dropped pairs provably fail the final jaccard_ppm
    # gate, so the result set is unchanged (integer comparison
    # DEN·min ≥ NUM·max — no rounding anywhere).
    prefix_rows = doc_arr.select(
        "doc_id", "s", "prefix", F.explode("prefix").alias("t"))
    size_ratio_ok = lambda a, b: (  # noqa: E731 — symmetric, exact ints
        F.lit(SETSIM_TAU_DEN) * F.least(a["s"], b["s"])
        >= F.lit(SETSIM_TAU_NUM) * F.greatest(a["s"], b["s"])
    )
    # r19 (guide §2.3/§2.4 'remove shuffles outright'): EXACTLY-ONCE pair
    # emission replaces the global pair-distinct. A candidate pair is
    # generated once per SHARED prefix token (then deduped by a full
    # shuffle+aggregate over the ~15M expanded pairs); instead, each
    # item now carries its (short) prefix array and the expansion keeps
    # a pair only in the bucket of its MINIMUM common prefix token —
    # every shared-prefix pair has exactly one such bucket, so the
    # emitted set is exactly the old distinct set (pinned:
    # tests/test_r19_optimizations.py::test_setsim_min_token_emission
    # _matches_distinct; measured identical 6,471,621 pairs at sf0.1,
    # symmetric diff 0). The per-slot cost is an array_intersect over
    # two ≤⌈|set|/5⌉+1-token prefixes — map-side CPU traded for the
    # full pair exchange + final aggregate, which the plan no longer
    # contains.
    min_common_prefix = lambda a, b: (  # noqa: E731 — symmetric
        F.col("t") == F.array_min(F.array_intersect(a["prefix"],
                                                    b["prefix"]))
    )
    # strategy="join" (r18): wide buckets are the NORM on a prefix-token
    # key (the rarest-first prefix still shares tokens corpus-wide), so
    # the quadratic expansion runs as a codegen'd co-partitioned self-join
    # instead of per-group array building — identical pair set, measured
    # 26.5 s → ~4 s for the expansion stage at sf0.1 (operators/pairs.py)
    cands = (
        bucket_pairs(
            prefix_rows, ["t"], F.struct("doc_id", "s", "prefix"),
            pair_filter=lambda a, b: size_ratio_ok(a, b)
            & min_common_prefix(a, b),
            strategy="join",
        )
        .select(F.col("p.a.doc_id").alias("doc_a"),
                F.col("p.b.doc_id").alias("doc_b"))
    )
    a = doc_arr.select(F.col("doc_id").alias("doc_a"),
                       F.col("ts").alias("ts_a"), F.col("s").alias("s_a"))
    b = doc_arr.select(F.col("doc_id").alias("doc_b"),
                       F.col("ts").alias("ts_b"), F.col("s").alias("s_b"))
    verified = (
        cands.join(a, "doc_a").join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("ts_a", "ts_b")).cast("bigint").alias("n_inter"),
            "s_a",
            "s_b",
        )
        .withColumn(
            "jaccard_ppm",
            F.expr("(1000000 * n_inter) div (s_a + s_b - n_inter)"),
        )
    )
    return verified.where(F.col("jaccard_ppm") >= SETSIM_TAU_PPM).select(
        "doc_a", "doc_b", "n_inter", "jaccard_ppm"
    )


_SETSIM_SQL = f"""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')) AS t
  FROM documents
),
sz AS (SELECT doc_id, COUNT(*) AS s FROM toks GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM toks a JOIN toks b ON a.t = b.t AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_inter,
       (1000000 * n_inter) // (sa.s + sb.s - n_inter) AS jaccard_ppm
FROM inter
JOIN sz sa ON sa.doc_id = doc_a
JOIN sz sb ON sb.doc_id = doc_b
WHERE (1000000 * n_inter) // (sa.s + sb.s - n_inter) >= {SETSIM_TAU_PPM}
"""


def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM-perplexity quality filtering (the CCNet/Wenzek et al. 2020 recipe,
    public): score every document by its average bigram negative
    log-likelihood under a language model estimated FROM THE CORPUS
    ITSELF — high-NLL docs are the gibberish/boilerplate a pretraining
    pipeline drops.

    Model = MLE bigram LM: P(b|a) = c(a,b)/c(a·) over corpus bigram
    counts. Per-bigram NLL = ln(c(a·)/c(a,b)) ≥ 0, ROUNDED TO INTEGER
    MICRO-NATS per bigram *before* the per-doc sum — so the accumulation
    is an integer sum (order-independent under any shuffle; the BM25
    query's fixed-accumulation-order lesson applied the cheaper way) and
    the mean is one integer division. The single libm ln call rounds
    identically across engines at micro precision (same contract as
    `bm25_search`).

    Scale shape: bigram explode is map-side (shingles n=2 over the token
    array); both count tables come from map-side-combined groupBys; the
    scoring joins key on bigram/head — honest large-vocabulary hash
    joins, AQE-splittable, and the frequency tables ARE the model (no
    driver-side state). Docs with < 2 tokens have no bigrams and drop
    out, exactly as in the oracle.
    """
    docs = fan_out(table(spark, sf_dir, "documents"))
    bg = docs.select(
        "doc_id",
        F.explode(shingles(ascii_lower(F.col("text")), 2)).alias("bg"),
    ).withColumn("head", F.split(F.col("bg"), " ")[0])
    cb = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("c_bg"))
    ch = bg.groupBy("head").agg(F.count(F.lit(1)).alias("c_head"))
    scored = (
        bg.join(cb, "bg")
        .join(ch, "head")
        .withColumn(
            "nll_micro",
            F.round(
                F.log(F.col("c_head").cast("double") / F.col("c_bg").cast("double"))
                * 1_000_000
            ).cast("long"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum("nll_micro").cast("bigint").alias("sum_nll_micro"),
        )
        .withColumn("avg_nll_micro", F.expr("sum_nll_micro div n_bigrams"))
        .select("doc_id", "n_bigrams", "avg_nll_micro")
    )


_BIGRAM_LOGPROB_SQL = f"""
WITH bg AS (
  SELECT doc_id, unnest({shingles_sql(ascii_lower_sql('text'), 2)}) AS bg
  FROM documents
),
hb AS (SELECT doc_id, bg, string_split(bg, ' ')[1] AS head FROM bg),
cb AS (SELECT bg, COUNT(*) AS c_bg FROM hb GROUP BY 1),
ch AS (SELECT head, COUNT(*) AS c_head FROM hb GROUP BY 1),
scored AS (
  SELECT doc_id,
         CAST(round(1000000 * ln(CAST(c_head AS DOUBLE) / c_bg)) AS BIGINT)
           AS nll_micro
  FROM hb JOIN cb USING (bg) JOIN ch USING (head)
)
SELECT doc_id, COUNT(*) AS n_bigrams,
       CAST(SUM(nll_micro) AS BIGINT) // COUNT(*) AS avg_nll_micro
FROM scored GROUP BY doc_id
"""


PMI_MIN_COUNT = 5   # collocation frequency floor
PMI_TOPK = 100


def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation extraction: the corpus's top-{PMI_TOPK} word bigrams
    by pointwise mutual information with a frequency floor — the
    phrase-mining pass (multi-word entities, fixed expressions) a
    tokenizer/vocab pipeline runs before merges are chosen.

    Log-free PMI ranking: PMI = ln(c_xy·N²/(N_bg·c_x·c_y)) is MONOTONE
    in ``c_xy/(c_x·c_y)`` because N and N_bg are corpus constants — so
    the ranking key is the exact integer ``(1e9·c_xy) div (c_x·c_y)``
    and no transcendental ever runs (stronger than the micro-nat
    rounding `bigram_logprob_score` needs, because ranking doesn't
    require the calibrated value). Ties break on the bigram text.

    Scale shape: bigram explode is map-side; both count tables are
    map-side-combined groupBys; the scoring joins are hash joins on the
    word keys (AQE-splittable, same shape as the LM scorer); the floor
    prunes the long tail BEFORE the joins; final top-k is distributed
    TakeOrderedAndProject.
    """
    docs = fan_out(table(spark, sf_dir, "documents"))
    bg = docs.select(
        F.explode(shingles(ascii_lower(F.col("text")), 2)).alias("bg")
    ).select(
        "bg",
        F.split(F.col("bg"), " ")[0].alias("w1"),
        F.split(F.col("bg"), " ")[1].alias("w2"),
    )
    cb = (
        bg.groupBy("bg", "w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_xy"))
        .where(F.col("c_xy") >= PMI_MIN_COUNT)
    )
    cu = (
        docs.select(F.explode(tokens(ascii_lower(F.col("text")))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    scored = (
        cb.join(cu.select(F.col("w").alias("w1"), F.col("c").alias("c_x")), "w1")
        .join(cu.select(F.col("w").alias("w2"), F.col("c").alias("c_y")), "w2")
        .select(
            "w1", "w2", "c_xy", "c_x", "c_y",
            F.expr(f"({10**9} * c_xy) div (c_x * c_y)").alias("pmi_score_ppb"),
        )
    )
    return scored.orderBy(
        F.col("pmi_score_ppb").desc(), F.col("w1"), F.col("w2")
    ).limit(PMI_TOPK)


_PMI_SQL = f"""
WITH bg AS (
  SELECT unnest({shingles_sql(ascii_lower_sql('text'), 2)}) AS bg FROM documents
),
sp AS (SELECT bg, string_split(bg, ' ') AS ws FROM bg),
cb AS (
  SELECT ws[1] AS w1, ws[2] AS w2, CAST(COUNT(*) AS BIGINT) AS c_xy
  FROM sp GROUP BY 1, 2
  HAVING COUNT(*) >= {PMI_MIN_COUNT}
),
tok AS (SELECT unnest(string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')) AS w FROM documents),
cu AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1)
SELECT cb.w1, cb.w2, cb.c_xy, cx.c AS c_x, cy.c AS c_y,
       ({10**9} * cb.c_xy) // (cx.c * cy.c) AS pmi_score_ppb
FROM cb JOIN cu cx ON cb.w1 = cx.w JOIN cu cy ON cb.w2 = cy.w
ORDER BY pmi_score_ppb DESC, w1, w2
LIMIT {PMI_TOPK}
"""


_BPE_MERGES = 3

#: merge-training word-length cap — see q_bpe_merge_induction docstring
BPE_MAX_WORD_CHARS = 64


def bpe_merge_expr(s, lhs, rhs):
    """One canonical-greedy BPE merge over a DOUBLE-space-delimited
    symbol string: the pattern consumes one space from each side, so the
    boundary invariant survives and consecutive occurrences (including
    same-symbol runs) merge exactly as the left-to-right list scan
    would."""
    return F.replace(
        s,
        F.concat(F.lit(" "), lhs, F.lit("  "), rhs, F.lit(" ")),
        F.concat(F.lit(" "), lhs, rhs, F.lit(" ")),
    )


def _bpe_pair_counts(words: DataFrame) -> DataFrame:
    """Corpus-weighted adjacent-symbol-pair counts from the (symbol
    string, word freq) relation. Symbol strings are space-delimited with
    sentinel spaces at both ends (`" b a t c h "`)."""
    arr = F.filter(F.split("s", " "), lambda x: x != "")
    # guard the single-symbol word: Spark's sequence(1, 0) DESCENDS
    # instead of being empty (the shingles() lesson)
    pairs = F.when(
        F.size(arr) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(arr) - 1),
            lambda i: F.struct(
                F.element_at(arr, i).alias("lhs"),
                F.element_at(arr, (i + 1).cast("int")).alias("rhs"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<lhs:string,rhs:string>>"))
    return (
        words.select(F.explode(pairs).alias("p"), "freq")
        .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
        .agg(F.sum("freq").cast("bigint").alias("pair_count"))
    )


def q_bpe_merge_induction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEARN byte-pair-encoding merges from the corpus — the tokenizer
    TRAINING step (Sennrich et al. 2016), not just tokenization: 3
    iterations of (count adjacent symbol pairs weighted by word
    frequency → merge the most frequent pair everywhere), emitting the
    learned merge table (rank, lhs, rhs, pair_count).

    The scale trick is the classic one: BPE training never touches the
    raw corpus after ONE pass — the first aggregation collapses 100 TB
    of text into the word-FREQUENCY table (bounded by the vocabulary,
    not the corpus), and every merge iteration rides that collapsed
    relation: pair counting is a map-side-combined aggregate over
    |vocab| rows, the winning pair is a 1-row broadcast, and the merge
    itself is one ``replace`` over |vocab| symbol strings.

    Overlong-word cap (r12, closing a hazard the adversarial sweep
    MEASURED: one 50k-char no-space token stalled training ~10 min at
    sf0.001 — the per-word char-pair explode is quadratic-ish in word
    length): words longer than ``BPE_MAX_WORD_CHARS`` are excluded from
    merge training in BOTH engines. Such "words" (URLs, base64 blobs,
    DNA strings) are ingest noise every production trainer caps; the
    cap bounds the symbol-string width so no single pathological row
    can dominate a training round at any corpus size. Engine-exact
    by construction: symbols are joined with DOUBLE-space boundaries and
    the merge pattern consumes one space from each side, so consecutive
    occurrences never fight over a shared delimiter — plain
    non-overlapping left-to-right ``replace`` (identical in both
    engines) then equals canonical greedy BPE on every input, including
    same-symbol runs (``a a a a a`` → ``aa aa a``, review-verified
    against a list-based reference). The winner's tie-break is the total
    order (count DESC, lhs ASC, rhs ASC). The oracle unrolls the three
    rounds as CTEs, like the k-means oracle.
    """
    docs = table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(tokens("text")).alias("w"))
        .where(F.length("w") <= BPE_MAX_WORD_CHARS)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .select(
            # double-space boundaries: '  b  a  t  c  h  ' — see docstring
            F.concat(
                F.lit("  "), F.regexp_replace("w", "(.)", "$1  ")
            ).alias("s"),
            "freq",
        )
        .localCheckpoint(eager=False)  # the collapsed relation all rounds ride
    )
    merges = []
    for rank in range(1, _BPE_MERGES + 1):
        best = (
            _bpe_pair_counts(words)
            .orderBy(F.col("pair_count").desc(), F.col("lhs").asc(),
                     F.col("rhs").asc())
            .limit(1)
            .localCheckpoint(eager=False)  # 1 row; winner + merge both read it
        )
        merges.append(best.select(
            F.lit(rank).alias("merge_rank"), "lhs", "rhs", "pair_count"))
        words = (
            words.crossJoin(F.broadcast(best.select("lhs", "rhs")))
            .select(
                bpe_merge_expr("s", F.col("lhs"), F.col("rhs")).alias("s"),
                "freq",
            )
        )
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out


def _bpe_sql() -> str:
    def pairs(w: str) -> str:
        return f"""
  SELECT arr[t.i] AS lhs, arr[t.i + 1] AS rhs,
         CAST(SUM(freq) AS BIGINT) AS pair_count
  FROM (SELECT list_filter(string_split(s, ' '), x -> x <> '') AS arr, freq
        FROM {w}),
       UNNEST(range(1, len(arr))) t(i)
  GROUP BY 1, 2
"""

    def best(p: str) -> str:
        return (f"SELECT lhs, rhs, pair_count FROM {p} "
                f"ORDER BY pair_count DESC, lhs ASC, rhs ASC LIMIT 1")

    def merged(w: str, b: str) -> str:
        return f"""
  SELECT replace(s, ' ' || (SELECT lhs FROM {b}) || '  '
                    || (SELECT rhs FROM {b}) || ' ',
                 ' ' || (SELECT lhs FROM {b})
                    || (SELECT rhs FROM {b}) || ' ') AS s, freq
  FROM {w}
"""

    cap = BPE_MAX_WORD_CHARS
    ctes = [f"""w1 AS (
  SELECT '  ' || regexp_replace(w, '(.)', '\\1  ', 'g') AS s,
         CAST(COUNT(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE length(w) <= {cap}  -- overlong-word training cap (r12)
  GROUP BY w
)"""]
    for r in range(1, _BPE_MERGES + 1):
        ctes.append(f"p{r} AS ({pairs(f'w{r}')})")
        ctes.append(f"b{r} AS ({best(f'p{r}')})")
        if r < _BPE_MERGES:
            ctes.append(f"w{r + 1} AS ({merged(f'w{r}', f'b{r}')})")
    selects = " UNION ALL ".join(
        f"SELECT {r} AS merge_rank, lhs, rhs, pair_count FROM b{r}"
        for r in range(1, _BPE_MERGES + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + selects


_BPE_MERGE_SQL = _bpe_sql()


_VOCAB_CURVE_NS = (5, 10, 20, 30)


def q_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve — what fraction of all corpus tokens do
    the top-N most frequent words cover, at N ∈ {5, 10, 20, 30}
    (cut points sized to the fixture's 31-word synthetic vocabulary; at a
    real corpus they'd be 1k/8k/32k/128k — only literals change)? The
    tokenizer-sizing diagnostic (how big must the vocab be before OOV
    is negligible), and `bpe_merge_induction`'s sizing companion.

    Scale shape (r9 verdict item #4 — the per-word rank window is GONE):
    the corpus collapses into the (freq, n_w) HISTOGRAM (≤ √(2N) rows,
    see :func:`_freq_histogram`); TWO stacked two-phase prefix sums over
    frequency octaves give each group its rank range and the token mass
    before it; each cut N then joins to the ONE group whose range
    contains rank N (a broadcast of the 4 cut literals) and covers
    ``mass_before + (N − start)·freq`` tokens — exact for every tie
    order, because group members are interchangeable. Coverage is exact
    integer ppm; the oracle keeps the naive ranked-window form, so the
    registry differential proves the rewrite exact on every run.
    """
    docs = table(spark, sf_dir, "documents")
    hist = _freq_histogram(docs).withColumn(
        "mass", F.col("freq") * F.col("n_w")
    )
    h1 = _hist_with_rank_start(hist).localCheckpoint(
        eager=False  # input of the second stacked prefix (prefix.py rule)
    )
    h2 = two_phase_prefix_sum(
        h1.withColumn("neg_freq", -F.col("freq")).withColumn(
            "fb", -(F.length(F.bin("freq")) - 1).cast("int")
        ),
        bucket_col="fb",
        order_cols=["neg_freq"],
        val_col="mass",
        out_col="mass_before",
        inclusive=False,
    )
    cuts = spark.createDataFrame(
        [(n,) for n in _VOCAB_CURVE_NS], "vocab_topn int"
    )
    hit = F.broadcast(cuts).join(
        h2,
        (h2["start"] < cuts["vocab_topn"])
        & (cuts["vocab_topn"] <= h2["start"] + h2["n_w"]),
    )
    total = hist.agg(F.sum("mass").cast("bigint").alias("total_tokens"))
    return (
        hit.select(
            "vocab_topn",
            (
                F.col("mass_before")
                + (F.col("vocab_topn") - F.col("start")) * F.col("freq")
            ).cast("bigint").alias("covered_tokens"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "vocab_topn",
            "covered_tokens",
            "total_tokens",
            F.expr("(covered_tokens * 1000000) div total_tokens")
            .alias("covered_ppm"),
        )
    )


_VOCAB_CURVE_SQL = f"""
WITH f AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  GROUP BY 1
),
r AS (
  SELECT ROW_NUMBER() OVER (ORDER BY freq DESC, w ASC) AS vocab_topn,
         CAST(SUM(freq) OVER (ORDER BY freq DESC, w ASC
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS covered_tokens
  FROM f
)
SELECT CAST(vocab_topn AS INT) AS vocab_topn, covered_tokens,
       (SELECT CAST(SUM(freq) AS BIGINT) FROM f) AS total_tokens,
       CAST((covered_tokens * 1000000)
            // (SELECT CAST(SUM(freq) AS BIGINT) FROM f) AS BIGINT)
         AS covered_ppm
FROM r WHERE vocab_topn IN {_VOCAB_CURVE_NS}
"""


def _freq_histogram(docs: DataFrame) -> DataFrame:
    """Collapse the corpus twice: word-frequency table (vocabulary-
    bounded), then the (freq, n_w) HISTOGRAM — one row per DISTINCT
    frequency value. |distinct freqs| ≤ √(2·Σfreq) (k distinct values
    need at least 1+2+…+k tokens), so even a 10¹³-token corpus yields a
    ≤ ~5·10⁶-row relation — the frame every rank computation rides
    instead of per-word windows (r9 verdict item #4). Lazily
    checkpointed: every caller consumes it at least twice (the
    ``prefix.py`` contract)."""
    return (
        docs.select(F.explode(tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .groupBy("freq")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_w"))
        .localCheckpoint(eager=False)
    )


def _hist_with_rank_start(hist: DataFrame) -> DataFrame:
    """Add ``start`` = number of words ranked strictly before each
    frequency group under the (freq DESC, word ASC) total order — i.e.
    the group occupies ranks (start, start + n_w]. Words tie-break
    WITHIN a group only, and all group members share the same freq, so
    every rank-range statistic is tie-order-free by construction.

    The prefix runs through ``two_phase_prefix_sum`` over frequency-
    OCTAVE buckets (``-(bitlen(freq))`` — monotone in freq DESC): the
    offsets window rides the ≤64-row octave relation and the local
    window partitions per octave (≤ min(2^b, |distinct freqs|) rows
    each) — no single-partition pass over the vocabulary anywhere."""
    h = hist.withColumn("neg_freq", -F.col("freq")).withColumn(
        "fb", -(F.length(F.bin("freq")) - 1).cast("int")
    )
    return two_phase_prefix_sum(
        h,
        bucket_col="fb",
        order_cols=["neg_freq"],
        val_col="n_w",
        out_col="start",
        inclusive=False,
    ).drop("neg_freq", "fb")


def q_zipf_vocab_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency profile of the corpus vocabulary, log-free:
    words rank by frequency, ranks group into OCTAVE buckets
    (``floor(log2(rank))`` via bit length — no transcendental anywhere),
    and each bucket emits its word count, total token mass, and the
    integer-ppm mass ratio to the NEXT octave. Under a perfect Zipf
    s = 1 every octave carries equal mass (Σ 1/r over [2^b, 2^{b+1}) ≈
    ln 2), so ``mass_ratio_ppm ≈ 10⁶`` flat; a heavier slope reads as
    ratios > 10⁶ growing with the bucket — the corpus-health gate that
    catches boilerplate floods (head too heavy) or tokenizer damage
    (tail mass missing) without ever running a log. The octave ratios
    ARE the fit: slope over an octave is log2 of the ratio, a monotone
    rendering downstream can threshold in ppm directly.

    Scale shape (r9 verdict item #4 — the per-word rank window is GONE):
    the corpus collapses into the word-frequency table and then into the
    (freq, n_w) HISTOGRAM (≤ √(2N) rows — see :func:`_freq_histogram`);
    a two-phase prefix sum over frequency octaves turns the histogram
    into rank RANGES (a freq group's members are interchangeable, so
    octave counts/masses never depend on the within-group tie order),
    and each group map-side explodes over only the ≤ ~64 octaves its
    range overlaps. No row_number, no per-word window, no
    single-partition pass over anything larger than the octave relation.
    The oracle keeps the naive ranked-window form, so the registry
    differential proves the rewrite exact on every run.
    ``length(bin(x)) - 1`` is exact floor-log2 in both engines
    (verified: no zero padding).
    """
    docs = table(spark, sf_dir, "documents")
    hist = _hist_with_rank_start(_freq_histogram(docs))
    two_b = "shiftleft(CAST(1 AS BIGINT), bucket)"
    octs = (
        hist.select(
            "freq", "n_w", "start",
            # octaves overlapped by ranks (start, start + n_w]
            F.explode(
                F.sequence(
                    (F.length(F.bin(F.col("start") + 1)) - 1).cast("int"),
                    (F.length(F.bin(F.col("start") + F.col("n_w"))) - 1)
                    .cast("int"),
                )
            ).alias("bucket"),
        )
        .select(
            "bucket", "freq",
            F.expr(f"greatest(start + 1, {two_b})").alias("lo"),
            F.expr(
                f"least(start + n_w, shiftleft(CAST(1 AS BIGINT), "
                f"bucket + 1) - 1)"
            ).alias("hi"),
        )
        .select(
            "bucket",
            F.col("lo").alias("min_rank_part"),
            (F.col("hi") - F.col("lo") + 1).alias("n_in"),
            (F.col("freq") * (F.col("hi") - F.col("lo") + 1)).alias("mass_in"),
        )
    )
    buckets = octs.groupBy("bucket").agg(
        F.min("min_rank_part").cast("bigint").alias("min_rank"),
        F.sum("n_in").cast("bigint").alias("n_words"),
        F.sum("mass_in").cast("bigint").alias("bucket_mass"),
    )
    return buckets.select(
        "bucket", "min_rank", "n_words", "bucket_mass",
        F.expr(
            "CAST((1000000 * bucket_mass) div lead(bucket_mass) "
            "OVER (ORDER BY bucket) AS BIGINT)"
        ).alias("mass_ratio_ppm"),
    )


_ZIPF_SQL = """
WITH f AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  GROUP BY 1
),
r AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, w ASC) AS BIGINT)
           AS rank,
         freq
  FROM f
),
b AS (
  SELECT CAST(length(bin(rank)) - 1 AS INT) AS bucket,
         CAST(MIN(rank) AS BIGINT) AS min_rank,
         CAST(COUNT(*) AS BIGINT) AS n_words,
         CAST(SUM(freq) AS BIGINT) AS bucket_mass
  FROM r GROUP BY 1
)
SELECT bucket, min_rank, n_words, bucket_mass,
       CAST((1000000 * bucket_mass)
            // LEAD(bucket_mass) OVER (ORDER BY bucket) AS BIGINT)
         AS mass_ratio_ppm
FROM b
"""


#: shingle width for corpus-order novelty (matches the decontamination
#: family's 5-gram convention)
_NOVELTY_N = 5


def q_ngram_novelty_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-order novelty: per document, the fraction of its DISTINCT
    {_NOVELTY_N}-gram shingles that no lower-doc_id document contains —
    the marginal-information curve a curation pipeline reads to decide
    when a source stops adding new content (novelty decaying toward 0 =
    the crawl is re-crawling itself). Complements `dedup_incremental
    _incoming` (batch-level) at per-document grain: doc_id is the
    ingestion order, so "seen before" = "present in any earlier doc".

    Semantics: a shingle's FIRST document (min doc_id) counts it as
    novel there and nowhere else; a doc shorter than {_NOVELTY_N} words
    has no shingles and drops out (the oracle agrees).

    Scale shape: shingles hash to 60-bit ints map-side and collapse
    distinct per doc (one shuffle); the first-seen relation is a
    map-side-combined ``min(doc_id)`` groupBy of THAT — 1 row per
    distinct shingle; the novelty join keys on the shingle hash against
    the 1-row-per-shingle relation, so output = input shingle rows
    (provably linear — no df cap needed, nothing can pair
    quadratically); the per-doc rollup is the second and last shuffle.
    The doubly-consumed distinct relation is lazily checkpointed (the
    `prefix.py` caller discipline).
    """
    docs = fan_out(table(spark, sf_dir, "documents"))
    ds = (
        docs.select(
            "doc_id",
            F.explode(shingles(ascii_lower(F.col("text")), _NOVELTY_N)).alias("s"),
        )
        .select("doc_id", hash60(F.col("s")).alias("h"))
        .distinct()
        .localCheckpoint(eager=False)  # first-seen + the novelty join read it
    )
    first = ds.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    return (
        ds.join(first, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum((F.col("first_doc") == F.col("doc_id")).cast("int"))
            .cast("bigint").alias("n_novel"),
        )
        .select(
            "doc_id", "n_shingles", "n_novel",
            F.expr("(n_novel * 1000000) div n_shingles").alias("novelty_ppm"),
        )
    )


_NOVELTY_SQL = f"""
WITH ds AS (
  SELECT DISTINCT doc_id, {hash60_sql('s')} AS h
  FROM (SELECT doc_id, unnest({shingles_sql(ascii_lower_sql('text'), _NOVELTY_N)}) AS s
        FROM documents)
),
f AS (SELECT h, MIN(doc_id) AS first_doc FROM ds GROUP BY 1)
SELECT ds.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN f.first_doc = ds.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       CAST((SUM(CASE WHEN f.first_doc = ds.doc_id THEN 1 ELSE 0 END)
             * 1000000) // COUNT(*) AS BIGINT) AS novelty_ppm
FROM ds JOIN f USING (h)
GROUP BY 1
"""


def q_source_token_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-drift matrix: total-variation distance between the unigram
    token distributions of every PAIR of document sources — the
    distribution-shift monitor a training-data pipeline runs when a new
    source (or a re-crawl of an old one) lands, before it is allowed
    into the mix (companion to `training_data_mix`, which assumes the
    per-source distributions are already vetted).

    Log-free, integer-exact: TVD = ½·Σ_w |p_w − q_w| over the UNION of
    both vocabularies.  With integer counts c_w (source a, total Na) and
    d_w (source b, total Nb) the numerator splits into the matched part
    Σ|c_w·Nb − d_w·Na| plus the unmatched mass (Na − Σ_matched c)·Nb +
    (Nb − Σ_matched d)·Na — so ONE inner join on the word key covers the
    union with no full-outer join, and ``tvd_ppm = (10⁶·num) div
    (2·Na·Nb)`` never runs a float.  Products route through
    DECIMAL(38,0) (c·N ~ 10²¹ at trillion-token scale overflows BIGINT).
    A row is emitted for EVERY source pair, including pairs sharing zero
    vocabulary (tvd_ppm = 10⁶ exactly): the matched-mass aggregate is
    LEFT-joined onto the tiny all-pairs frame built from the per-source
    totals (unmatched sums coalesce to 0), so a fully-disjoint pair
    cannot silently vanish from the drift matrix.

    Scale shape: per-source counts are one map-side-combined groupBy;
    the pair join is a hash join keyed on the word (AQE-splittable; hot
    stopwords are bounded by the number of source PAIRS, not rows); the
    per-source totals are an aggregate-sized broadcast.  Output is
    |sources|²/2 rows.
    """
    docs = fan_out(table(spark, sf_dir, "documents"))
    # (source, word) counts feed THREE consumers (both pair-join sides and
    # the totals) — materialized once via lazy localCheckpoint so the
    # corpus tokenization pass runs once, not three times (the
    # copurchase_lift/column_profile discipline).
    wc = (
        docs.select("source", F.explode(tokens(ascii_lower(F.col("text")))).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=False)
    )
    # tot now has FOUR consumers (both pair-join broadcasts + both sides
    # of the all-pairs frame) — checkpoint the |sources|-row aggregate so
    # each consumer reads the tiny materialized result instead of
    # re-scanning the full (source, word) relation per reference
    tot = (
        wc.groupBy("source")
        .agg(F.sum("c").cast("decimal(38,0)").alias("n_tok"))
        .localCheckpoint(eager=False)
    )
    a = wc.join(F.broadcast(tot), "source").select(
        F.col("source").alias("source_a"), "w",
        F.col("c").cast("decimal(38,0)").alias("ca"), F.col("n_tok").alias("na"),
    )
    b = wc.join(F.broadcast(tot), "source").select(
        F.col("source").alias("source_b"), "w",
        F.col("c").cast("decimal(38,0)").alias("cb"), F.col("n_tok").alias("nb"),
    )
    m = (
        a.join(b, "w")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shared_terms"),
            F.sum(F.abs(F.col("ca") * F.col("nb") - F.col("cb") * F.col("na")))
            .alias("sum_abs"),
            F.sum("ca").alias("mca"),
            F.sum("cb").alias("mcb"),
        )
    )
    # all-pairs frame from the per-source totals (|sources|² rows — tiny
    # at any corpus scale), so zero-shared-vocabulary pairs still emit a
    # row (their TVD is exactly 1, i.e. 10⁶ ppm); the matched aggregate
    # joins back broadcast (bounded by the pair count, never by rows).
    pairs = (
        tot.select(F.col("source").alias("source_a"), F.col("n_tok").alias("na"))
        .crossJoin(tot.select(F.col("source").alias("source_b"),
                              F.col("n_tok").alias("nb")))
        .where(F.col("source_a") < F.col("source_b"))
    )
    zero = F.lit(0).cast("decimal(38,0)")
    return (
        pairs.join(F.broadcast(m), ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            F.coalesce(F.col("n_shared_terms"), F.lit(0).cast("bigint"))
            .alias("n_shared_terms"),
            F.coalesce(F.col("sum_abs"), zero).alias("sum_abs"),
            F.coalesce(F.col("mca"), zero).alias("mca"),
            F.coalesce(F.col("mcb"), zero).alias("mcb"),
            "na",
            "nb",
        )
        .select(
            "source_a",
            "source_b",
            "n_shared_terms",
            F.expr(
                "(1000000 * (sum_abs + (na - mca) * nb + (nb - mcb) * na))"
                " div (2 * na * nb)"
            ).cast("bigint").alias("tvd_ppm"),
        )
    )


_SOURCE_TVD_SQL = """
WITH wc AS (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT source, unnest(string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')) AS w
        FROM documents)
  GROUP BY 1, 2
),
tot AS (SELECT source, CAST(SUM(c) AS HUGEINT) AS n_tok FROM wc GROUP BY 1),
m AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(COUNT(*) AS BIGINT) AS n_shared_terms,
         SUM(abs(CAST(a.c AS HUGEINT) * tb.n_tok
                 - CAST(b.c AS HUGEINT) * ta.n_tok)) AS sum_abs,
         SUM(CAST(a.c AS HUGEINT)) AS mca,
         SUM(CAST(b.c AS HUGEINT)) AS mcb
  FROM wc a
  JOIN wc b ON a.w = b.w AND a.source < b.source
  JOIN tot ta ON ta.source = a.source
  JOIN tot tb ON tb.source = b.source
  GROUP BY 1, 2
),
pairs AS (
  SELECT ta.source AS source_a, tb.source AS source_b,
         ta.n_tok AS na, tb.n_tok AS nb
  FROM tot ta JOIN tot tb ON ta.source < tb.source
)
SELECT p.source_a, p.source_b,
       COALESCE(m.n_shared_terms, 0) AS n_shared_terms,
       CAST((1000000 * (COALESCE(m.sum_abs, 0)
                        + (p.na - COALESCE(m.mca, 0)) * p.nb
                        + (p.nb - COALESCE(m.mcb, 0)) * p.na))
            // (2 * p.na * p.nb) AS BIGINT) AS tvd_ppm
FROM pairs p
LEFT JOIN m ON m.source_a = p.source_a AND m.source_b = p.source_b
"""


# --------------------------------------------------------------------------
# degeneracy gate: longest run of consecutive identical tokens
# --------------------------------------------------------------------------

#: a run STRICTLY longer than this flags the document (the "the the the"
#: LM-degeneracy signature; shared with the oracle)
REPEAT_RUN_MAX = 3


def q_doc_repeat_run_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest run of CONSECUTIVE identical tokens per document — the
    degeneracy detector `doc_repetition_stats`' top-gram fraction can
    miss (a doc can repeat "the the the the" in one burst yet keep a
    modest global top-gram share, and vice versa). Flags docs whose
    longest run exceeds {REPEAT_RUN_MAX} — the classic neural-LM
    decode-loop signature a pretraining filter removes.

    The differential's best use (ROUND10_NOTES §17): the two engines
    compute the SAME semantics by structurally DIFFERENT algorithms —
    Spark as a pure ``F.aggregate`` carry (prev token, current run,
    best run) folded left over the token array, map-side only, no
    explode and no shuffle at all before the final projection; the
    oracle as the classic gaps-and-islands window (island id =
    pos − row_number within (doc, token); longest island per doc). A
    shared-formula hash match can't falsify either formulation — each
    proves the other.

    NULL-text contract: excluded outright in both engines (the ECE
    rule, r10 advisory #1's pattern — `data_contract_audit` owns NULL
    text; Spark's ``split(NULL)`` would otherwise ride a NULL carry
    into engine-divergent territory).

    Scale shape: ONE scan, zero exchanges before the output (the carry
    is whole-stage-codegen per row); at 100 TB this is the cheapest
    gate in the text family — strictly scan-bound.
    """
    docs = table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull())
    toks = tokens("text")
    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("int").alias("run"),
        F.lit(0).cast("int").alias("best"),
    )
    carry = F.aggregate(
        toks,
        init,
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1)
                .otherwise(F.lit(1)),
            ).alias("best"),
        ),
    )
    return docs.select(
        "doc_id",
        F.size(toks).cast("int").alias("n_tokens"),
        carry["best"].cast("int").alias("max_run"),
        (carry["best"] > REPEAT_RUN_MAX).cast("int").alias("is_degenerate"),
    )


_REPEAT_RUN_SQL = f"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS words
  FROM documents WHERE text IS NOT NULL
),
toks AS (
  SELECT doc_id, CAST(u.i AS INT) AS pos, words[CAST(u.i AS INT)] AS t
  FROM base, unnest(range(1, len(words) + 1)) u(i)
),
islands AS (
  SELECT doc_id, t,
         pos - ROW_NUMBER() OVER (PARTITION BY doc_id, t ORDER BY pos)
           AS island
  FROM toks
),
runs AS (
  SELECT doc_id, CAST(COUNT(*) AS INT) AS run_len
  FROM islands GROUP BY doc_id, t, island
)
SELECT b.doc_id,
       CAST(len(b.words) AS INT) AS n_tokens,
       CAST(MAX(r.run_len) AS INT) AS max_run,
       CAST(MAX(r.run_len) > {REPEAT_RUN_MAX} AS INT) AS is_degenerate
FROM base b JOIN runs r ON r.doc_id = b.doc_id
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# tokenizer fertility audit: subword cost per source
# --------------------------------------------------------------------------

def q_tokenizer_fertility_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source tokenizer-efficiency table — the numbers a vocabulary
    designer reads next to `vocab_coverage_curve` when sizing a
    tokenizer: whitespace words, BPE-ish subword tokens (the
    `text_bpe_tokens` regex classes, oracle-twinned), characters, and
    the two exact-ppm ratios that summarize them —
    ``fertility_ppm = (tokens·10⁶) div words`` (subwords per word: how
    much the tokenizer fragments this domain) and
    ``chars_per_token_ppm`` (compression: how much text one token
    carries). High-fertility sources burn sequence length; a mix
    designer reweights or retrains the vocab before paying that at
    100 TB.

    All-integer: the ratios divide per-SOURCE sums (never per-doc).
    Stated denominator contract (r11 advisory + r12 order #6): a source
    whose every doc is token-free CAN zero a denominator —
    ``n_bpe_tokens`` when all texts are whitespace/empty (the regex
    matches nothing while the whitespace split still yields the empty
    token), and ``n_words`` is 0 only in the degenerate no-rows-per-doc
    case — so BOTH ratios divide by ``NULLIF(denom, 0)`` in BOTH
    engines: the source keeps its audit row and the unratioable ratio
    is an EXPLICIT NULL, never an engine-accident. NULL text is
    excluded by the standing contract (`data_contract_audit` owns it);
    a NULL source is a REAL audit row (groupBy keeps it — the
    provenance-defect bucket gets its own fertility line, it does not
    silently vanish).

    Scale shape: tokenization is map-side expressions on the ONE scan;
    a single (source) groupBy with map-side combine collapses the
    corpus to |sources| rows; the ratios are projections on the
    aggregate. Nothing else moves.
    """
    from tfm_taxitrips_spark.functions.text import bpe_ish_tokens

    docs = table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull())
    return (
        docs.select(
            "source",
            token_count("text").cast("bigint").alias("nw"),
            F.size(bpe_ish_tokens("text")).cast("bigint").alias("nt"),
            F.length("text").cast("bigint").alias("nc"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("nw").cast("bigint").alias("n_words"),
            F.sum("nt").cast("bigint").alias("n_bpe_tokens"),
            F.sum("nc").cast("bigint").alias("n_chars"),
        )
        .select(
            "source", "n_docs", "n_words", "n_bpe_tokens", "n_chars",
            F.expr("(n_bpe_tokens * 1000000) div nullif(n_words, 0)")
            .alias("fertility_ppm"),
            F.expr("(n_chars * 1000000) div nullif(n_bpe_tokens, 0)")
            .alias("chars_per_token_ppm"),
        )
    )


_FERTILITY_SQL = r"""
WITH d AS (
  SELECT source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS nw,
         CAST(len(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'),
              '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS nt,
         CAST(length(text) AS BIGINT) AS nc
  FROM documents WHERE text IS NOT NULL
),
a AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(nw) AS BIGINT) AS n_words,
         CAST(SUM(nt) AS BIGINT) AS n_bpe_tokens,
         CAST(SUM(nc) AS BIGINT) AS n_chars
  FROM d GROUP BY 1
)
SELECT source, n_docs, n_words, n_bpe_tokens, n_chars,
       CAST((n_bpe_tokens * 1000000) // NULLIF(n_words, 0) AS BIGINT)
         AS fertility_ppm,
       CAST((n_chars * 1000000) // NULLIF(n_bpe_tokens, 0) AS BIGINT)
         AS chars_per_token_ppm
FROM a
"""


# --------------------------------------------------------------------------
# dedup threshold calibration (round 12)
# --------------------------------------------------------------------------

#: the dedup designer's calibration grid (ppm) — shared with the oracle
SWEEP_TAUS_PPM = (100_000, 300_000, 500_000, 700_000, 900_000)

#: shared oracle CTE skeleton: the df-capped distinct-shingle pair
#: machinery (_capped_shingle_inter's twin) ending in a `pairs`
#: relation (doc_a, doc_b, jacc_ppm) — integer-exact jaccard
_PAIRS_CTES = f"""
WITH sets AS (
  SELECT DISTINCT doc_id, unnest({shingles_sql(ascii_lower_sql('text'))}) AS s
  FROM documents
),
kept AS (
  SELECT doc_id, s FROM (
    SELECT doc_id, s, COUNT(*) OVER (PARTITION BY s) AS df_s FROM sets
  ) WHERE df_s <= {NGRAM_DF_CAP}
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM kept GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT doc_a, doc_b,
         (1000000 * n_inter) // (sa.sz + sb.sz - n_inter) AS jacc_ppm
  FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
)"""


def _verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a, doc_b, jacc_ppm) over the df-capped shingle machinery —
    `_capped_shingle_inter` with the integer-exact jaccard projected
    (the `_PAIRS_CTES` oracle twin)."""
    return _capped_shingle_inter(spark, sf_dir).select(
        "doc_a", "doc_b",
        F.expr("(1000000 * n_inter) div (sz_a + sz_b - n_inter)")
        .alias("jacc_ppm"),
    )


def q_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup threshold calibration curve: for each candidate Jaccard
    cutoff τ in `SWEEP_TAUS_PPM`, the number of qualifying pairs and the
    number of documents a keep-the-lower-id dedup pass would flag
    (distinct higher-id pair members) — computed from ONE pass over the
    bounded pair stream. This is the table a dedup designer reads to
    PICK τ before running `dedup_cluster_canonical` at 100 TB: the knee
    of the curve is the threshold, and sweeping it must not cost five
    corpus scans.

    Every τ emits a row even when nothing qualifies (the curve's tail
    is exactly where the decision happens — a silently absent row reads
    as 'not computed', so the τ spine LEFT-joins the aggregates and
    zero-fills). Integer ppm throughout; the ×|taus| explode multiplies
    only the BOUNDED pair stream, never the corpus.

    Scale shape: `_capped_shingle_inter` (the measured `leakage`-leg
    shape) once; the τ fan-out and both aggregates run on pair-sized
    relations; output is |taus| rows.
    """
    pairs = _verified_pairs(spark, sf_dir).localCheckpoint(eager=False)
    taus = F.array(*[F.lit(t).cast("bigint") for t in SWEEP_TAUS_PPM])
    per_tau = (
        pairs.select(F.explode(taus).alias("tau_ppm"), "jacc_ppm", "doc_b")
        .where(F.col("jacc_ppm") >= F.col("tau_ppm"))
        .groupBy("tau_ppm")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.countDistinct("doc_b").cast("bigint").alias("n_docs_flagged"),
        )
    )
    spine = pairs.sparkSession.range(1).select(
        F.explode(taus).alias("tau_ppm"))
    return (
        spine.join(F.broadcast(per_tau), "tau_ppm", "left")
        .select(
            "tau_ppm",
            F.coalesce("n_pairs", F.lit(0).cast("bigint")).alias("n_pairs"),
            F.coalesce("n_docs_flagged", F.lit(0).cast("bigint"))
            .alias("n_docs_flagged"),
        )
    )


_SWEEP_SQL = f"""{_PAIRS_CTES},
spine AS (SELECT CAST(unnest({list(SWEEP_TAUS_PPM)}) AS BIGINT) AS tau_ppm),
per_tau AS (
  SELECT s.tau_ppm,
         CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(COUNT(DISTINCT p.doc_b) AS BIGINT) AS n_docs_flagged
  FROM spine s JOIN pairs p ON p.jacc_ppm >= s.tau_ppm
  GROUP BY 1
)
SELECT s.tau_ppm,
       COALESCE(t.n_pairs, 0) AS n_pairs,
       COALESCE(t.n_docs_flagged, 0) AS n_docs_flagged
FROM spine s LEFT JOIN per_tau t ON t.tau_ppm = s.tau_ppm
"""


QUERIES: dict[str, QuerySpec] = {
    "doc_repeat_run_gate": QuerySpec(
        q_doc_repeat_run_gate, _REPEAT_RUN_SQL,
        tags=("text", "quality", "gate")),
    "dedup_threshold_sweep": QuerySpec(
        q_dedup_threshold_sweep, _SWEEP_SQL,
        tags=("text", "dedup", "calibration", "pipeline")),
    "tokenizer_fertility_audit": QuerySpec(
        q_tokenizer_fertility_audit, _FERTILITY_SQL,
        tags=("text", "vocab", "audit")),
    "vocab_coverage_curve": QuerySpec(
        q_vocab_coverage_curve, _VOCAB_CURVE_SQL,
        tags=("text", "vocab", "window")),
    "bpe_merge_induction": QuerySpec(
        q_bpe_merge_induction, _BPE_MERGE_SQL,
        tags=("text", "vocab", "iterative", "pipeline")),
    "tfidf_distinctive_terms": QuerySpec(q_tfidf_distinctive_terms, _TFIDF_SQL,
                                         tags=("text", "vocab", "topk")),
    "doc_repetition_stats": QuerySpec(q_doc_repetition, _DOC_REPETITION_SQL,
                                      tags=("text", "quality", "gopher")),
    "dedup_incremental_incoming": QuerySpec(
        q_dedup_incremental, _DEDUP_INCREMENTAL_SQL,
        tags=("text", "dedup", "pipeline", "incremental")),
    "token_oov_rate": QuerySpec(q_token_oov_rate, _OOV_SQL,
                                tags=("text", "vocab", "pipeline")),
    "token_diversity_stats": QuerySpec(
        q_token_diversity, _TOKEN_DIVERSITY_SQL,
        tags=("text", "quality", "pipeline")),
    "training_data_mix": QuerySpec(q_training_mix, _TRAINING_MIX_SQL, bench=True,
                                   tags=("text", "dedup", "sample", "pipeline")),
    "source_quality_mix_curve": QuerySpec(
        q_source_quality_mix_curve, _QUALITY_MIX_CURVE_SQL,
        tags=("text", "quality", "audit", "window")),
    "text_token_count": QuerySpec(q_token_count, _TOKEN_COUNT_SQL, tags=("text",)),
    "text_bpe_tokens": QuerySpec(q_bpe_tokens, _BPE_SQL, tags=("text",)),
    "pmi_collocations": QuerySpec(q_pmi_collocations, _PMI_SQL,
                                  tags=("text", "vocab", "topk")),
    "token_vocab_top200": QuerySpec(q_token_vocab, _VOCAB_SQL,
                                    tags=("text", "vocab", "topk")),
    "simhash_dup_pairs": QuerySpec(q_simhash_dup_pairs, _SIMHASH_PAIRS_SQL,
                                   tags=("text", "dedup", "simhash")),
    "text_quality_score": QuerySpec(q_quality_score, _QUALITY_SQL, tags=("text",)),
    "text_lang_id": QuerySpec(q_lang_id, _LANG_ID_SQL, tags=("text",)),
    "langid_confusion_eval": QuerySpec(
        q_langid_confusion, _LANGID_CONFUSION_SQL, tags=("text", "eval")),
    "ngram_containment_pairs": QuerySpec(
        q_ngram_containment, _NGRAM_CONTAINMENT_SQL,
        tags=("text", "dedup")),
    "text_fingerprint": QuerySpec(q_fingerprint, _FINGERPRINT_SQL, tags=("text",)),
    "dedup_exact_docs": QuerySpec(q_dedup_exact_docs, _DEDUP_EXACT_SQL, bench=True,
                                  tags=("dedup",)),
    "ngram_jaccard_pairs": QuerySpec(q_ngram_jaccard_pairs, _NGRAM_JACCARD_SQL,
                                     tags=("dedup",)),
    "minhash_signature": QuerySpec(q_minhash_signature, _MINHASH_SIG_SQL, bench=True,
                                   tags=("dedup",)),
    "minhash_lsh_candidates": QuerySpec(q_minhash_lsh_candidates, _MINHASH_LSH_SQL,
                                        bench=True, tags=("dedup",)),
    "cross_source_dup_matrix": QuerySpec(q_cross_source_dup_matrix,
                                         _CROSS_SOURCE_SQL,
                                         tags=("dedup", "curation")),
    "source_ngram_overlap_matrix": QuerySpec(
        q_source_ngram_overlap_matrix, _SRC_OVERLAP_SQL,
        tags=("text", "dedup", "curation", "audit")),
    "source_ngram_containment_matrix": QuerySpec(
        q_source_ngram_containment_matrix, _SRC_CONTAINMENT_SQL,
        tags=("text", "dedup", "curation", "audit")),
    "source_prune_plan": QuerySpec(
        q_source_prune_plan, _SRC_PRUNE_SQL,
        tags=("text", "dedup", "curation", "audit", "pipeline")),
    "minhash_estimate_eval": QuerySpec(q_minhash_estimate_eval,
                                       _MINHASH_EVAL_SQL,
                                       tags=("dedup", "eval")),
    "simhash": QuerySpec(q_simhash, _SIMHASH_SQL, tags=("dedup",)),
    "setsim_prefix_join": QuerySpec(q_setsim_prefix_join, _SETSIM_SQL,
                                    tags=("text", "dedup", "pipeline")),
    "bigram_logprob_score": QuerySpec(q_bigram_logprob, _BIGRAM_LOGPROB_SQL,
                                      tags=("text", "quality", "pipeline")),
    "source_token_tvd": QuerySpec(
        q_source_token_tvd, _SOURCE_TVD_SQL,
        tags=("text", "drift", "curation", "pipeline")),
    "per_source_dedup_rate": QuerySpec(
        q_per_source_dedup_rate, _PER_SOURCE_DEDUP_SQL,
        tags=("text", "dedup", "curation", "audit")),
    "zipf_vocab_fit": QuerySpec(
        q_zipf_vocab_fit, _ZIPF_SQL,
        tags=("text", "vocab", "drift", "window")),
    "quality_ece_calibration": QuerySpec(
        q_quality_ece, _ECE_SQL,
        tags=("text", "quality", "eval")),
    "ngram_novelty_rate": QuerySpec(
        q_ngram_novelty_rate, _NOVELTY_SQL,
        tags=("text", "dedup", "curation", "pipeline")),
}
