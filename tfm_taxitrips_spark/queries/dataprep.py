"""Training-data pipeline operators beyond the per-doc stages: near-dup
clustering with canonical-survivor selection, stratified corpus sampling,
per-group quantile outlier trimming, and incremental merge (SCD-1 upsert).

These extend the reference's surface per BASELINE.json's north star (the
reference's own dedup is whole-row ``.distinct()``,
/root/reference/TransformTaxiTrips.py:42; its views are full overwrites,
/root/reference/TransformTaxiTrips.py:115-119 — no incremental path).
Each query is deterministic (md5-derived hashing, no rand()) and paired
with a bit-exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tfm_taxitrips_spark.functions.aggregates import dsum, dsum_sql
from tfm_taxitrips_spark.functions.text import (
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
from tfm_taxitrips_spark.operators.analytics import cdc_collapse
from tfm_taxitrips_spark.operators.clustering import connected_components
from tfm_taxitrips_spark.operators.partitioning import fan_out
from tfm_taxitrips_spark.operators.prefix import two_phase_prefix_sum
from tfm_taxitrips_spark.queries.registry import QuerySpec
from tfm_taxitrips_spark.queries.text import (
    _MINHASH_LSH_SQL,
    q_minhash_lsh_candidates,
)
from tfm_taxitrips_spark.sources.readers import table


# --------------------------------------------------------------------------
# near-dup clustering: LSH pairs → connected components → canonical doc
# --------------------------------------------------------------------------

def q_dedup_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs → transitive closure → one surviving
    (minimum-id) document per near-dup cluster.

    The iterative Spark side (min-label propagation,
    :mod:`tfm_taxitrips_spark.operators.clustering`) must agree exactly
    with the oracle's recursive-CTE reachability — both compute
    ``cluster_id = min(id reachable from doc)``.
    """
    pairs = q_minhash_lsh_candidates(spark, sf_dir)
    comp = connected_components(pairs, src="doc_a", dst="doc_b")
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("comp").alias("cluster_id"),
        (F.col("node") == F.col("comp")).cast("int").alias("keep"),
    )


_DEDUP_CLUSTER_SQL = f"""
WITH RECURSIVE pairs AS ({_MINHASH_LSH_SQL}),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION
  SELECT doc_b AS u, doc_a AS v FROM pairs
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u AND e.v <> r.u
)
SELECT u AS doc_id,
       LEAST(u, MIN(v)) AS cluster_id,
       CAST(u = LEAST(u, MIN(v)) AS INT) AS keep
FROM reach
GROUP BY u
"""


def q_embedding_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same pairs→survivors closure over the *embedding* near-dup pairs
    (cosine ≥ threshold within LSH buckets): semantic dedup of a vector
    store, where transitive duplicates (A≈B, B≈C) collapse to one
    representative even when A and C sit in different buckets."""
    from tfm_taxitrips_spark.queries.vectors import q_embedding_dup_pairs

    pairs = q_embedding_dup_pairs(spark, sf_dir).select("vec_a", "vec_b")
    comp = connected_components(pairs, src="vec_a", dst="vec_b")
    return comp.select(
        F.col("node").alias("vec_id"),
        F.col("comp").alias("cluster_id"),
        (F.col("node") == F.col("comp")).cast("int").alias("keep"),
    )


def _emb_cluster_sql() -> str:
    from tfm_taxitrips_spark.queries.vectors import (
        _DUP_PAIRS_SQL,
        _emb_guard_sql,
    )

    # the vector family's malformed-vector guard (r11 probe finding)
    # shadows the view here too — the Spark side inherits it through
    # q_embedding_dup_pairs' guarded scan
    return _emb_guard_sql(f"""
WITH RECURSIVE pairs AS ({_DUP_PAIRS_SQL}),
edges AS (
  SELECT vec_a AS u, vec_b AS v FROM pairs
  UNION
  SELECT vec_b AS u, vec_a AS v FROM pairs
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u AND e.v <> r.u
)
SELECT u AS vec_id,
       LEAST(u, MIN(v)) AS cluster_id,
       CAST(u = LEAST(u, MIN(v)) AS INT) AS keep
FROM reach
GROUP BY u
""")


# --------------------------------------------------------------------------
# stratified sampling: per-language quota rates, deterministic membership
# --------------------------------------------------------------------------

#: per-language sampling rate in percent; languages outside the map get the
#: default. Deterministic hash-threshold membership means re-running on a
#: grown corpus keeps every previously-sampled doc sampled (incremental
#: corpus re-mixes don't churn).
_STRAT_RATES = {"en": 25, "es": 50, "fr": 50, "de": 100, "zh": 75}
_STRAT_DEFAULT = 10


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum (language) quota sampling over ``documents``: each doc
    draws a stable 0-99 bucket from md5(doc_id) and is sampled iff the
    bucket is under its language's rate. One narrow scan + one agg shuffle;
    the membership decision never leaves the map side."""
    docs = table(spark, sf_dir, "documents")
    bucket = F.pmod(
        hash60(F.concat(F.lit("strat:"), F.col("doc_id").cast("string"))), F.lit(100)
    )
    rate_map = F.create_map(
        *[F.lit(x) for kv in _STRAT_RATES.items() for x in kv]
    )
    rate = F.coalesce(
        F.element_at(rate_map, F.col("lang")), F.lit(_STRAT_DEFAULT)
    )
    sampled = (bucket < rate).cast("int")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(sampled).cast("bigint").alias("n_sampled"),
        F.max(rate).alias("rate_pct"),
    )


_STRAT_RATE_CASE = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in _STRAT_RATES.items())
    + f" ELSE {_STRAT_DEFAULT} END"
)

_STRAT_SAMPLE_SQL = f"""
SELECT lang,
       COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN {hash60_sql("concat('strat:', CAST(doc_id AS VARCHAR))")} % 100
                     < {_STRAT_RATE_CASE} THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       MAX({_STRAT_RATE_CASE}) AS rate_pct
FROM documents
GROUP BY lang
"""


# --------------------------------------------------------------------------
# per-group quantile trim: drop tail outliers before aggregation
# --------------------------------------------------------------------------

def q_quantile_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep each return-flag group's P5-P95 price band, then aggregate —
    the quality-filter shape used to trim length/score outliers from a
    training corpus.

    ``percent_rank`` ties-safely reproduces DuckDB's PERCENT_RANK (equal
    values share a rank), so the 0.05/0.95 boundary is engine-independent.

    NULL trim-key rows are EXCLUDED from banding, explicitly, in both
    engines (r16 batch residual #2, ROUND15_NOTES §13): Spark windows
    sort NULLS FIRST by default while DuckDB sorts NULLS LAST, so the
    moment NULL ``l_extendedprice`` values coexist with live rows inside
    one percent_rank group (which the star guard's NOT-finite → NULL
    rewrite makes reachable), the implicit placements diverge — and a
    row with no price has no defensible position in a price band anyway.
    The contract is stated as a filter instead of inherited from either
    engine's NULL-ordering default.

    Scale note: one window sort per group partition. At 100 TB the exact
    window is replaced by a two-pass plan — ``approx_percentile`` per group
    (map-side sketch, one tiny agg), broadcast the thresholds back, filter —
    trading exactness of the cut point for zero global sorts; the exact
    variant stays the correctness oracle.
    """
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_extendedprice").isNotNull())
    w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    pr = F.percent_rank().over(w)
    trimmed = li.withColumn("pr", pr).where(
        (F.col("pr") >= 0.05) & (F.col("pr") <= 0.95)
    )
    return trimmed.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_kept"),
        dsum("l_extendedprice").alias("kept_revenue"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


_QUANTILE_TRIM_SQL = f"""
WITH r AS (
  SELECT l_returnflag, l_extendedprice,
         PERCENT_RANK() OVER (PARTITION BY l_returnflag
                              ORDER BY l_extendedprice) AS pr
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL
)
SELECT l_returnflag,
       COUNT(*) AS n_kept,
       {dsum_sql('l_extendedprice')} AS kept_revenue,
       MIN(l_extendedprice) AS min_price,
       MAX(l_extendedprice) AS max_price
FROM r
WHERE pr >= 0.05 AND pr <= 0.95
GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# incremental merge: SCD-1 upsert of a change batch onto a base table
# --------------------------------------------------------------------------

def q_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-style upsert: a deterministic 10% change batch (status → 'U')
    is applied onto ``orders`` as anti-join(base, keys) ∪ changes, then the
    merged table is aggregated per status.

    This is the incremental path the reference lacks (it overwrites whole
    per-year views, /root/reference/TransformTaxiTrips.py:115-119). Scale
    note: the join strategy is left to Catalyst/AQE on purpose — a change
    batch that fits ``autoBroadcastJoinThreshold`` broadcasts its keys (the
    base is never shuffled); one that doesn't (this query's deterministic
    10%-of-base batch at 100 TB would) correctly falls back to a shuffled
    anti join. A forced broadcast hint here would OOM at scale. With a
    bucketed base table the fallback is shuffle-free too.
    """
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    base = table(spark, sf_dir, "orders").select(*cols)
    is_chg = (
        F.pmod(hash60(F.concat(F.lit("chg:"), F.col("o_orderkey").cast("string"))), F.lit(10))
        == 0
    )
    changes = base.where(is_chg).withColumn("o_orderstatus", F.lit("U"))
    merged = base.join(
        changes.select("o_orderkey"), "o_orderkey", "left_anti"
    ).unionByName(changes)
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("total_price"),
    )


_CHG_HASH = hash60_sql("concat('chg:', CAST(o_orderkey AS VARCHAR))")
_CHG_PRED = f"{_CHG_HASH} % 10 = 0"

_INCR_MERGE_SQL = f"""
WITH changes AS (
  SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice
  FROM orders WHERE {_CHG_PRED}
),
merged AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
  WHERE NOT EXISTS (SELECT 1 FROM changes c WHERE c.o_orderkey = orders.o_orderkey)
  UNION ALL
  SELECT * FROM changes
)
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       {dsum_sql('o_totalprice')} AS total_price
FROM merged
GROUP BY o_orderstatus
"""


# --------------------------------------------------------------------------
# train/eval contamination: n-gram overlap between two corpus splits
# --------------------------------------------------------------------------

#: sources held out as the "eval" split; everything else is "train"
_EVAL_SOURCES = ("src0", "src1")
_CONTAM_N = 5  # shingle width for overlap detection


def q_contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: for every eval-split document, the
    fraction of its 5-gram shingles that also occur anywhere in the train
    split. The exact op behind decontaminating a pretraining corpus
    against held-out benchmarks.

    Plan shape: both splits shingle map-side into 60-bit ints; the overlap
    is one equi-join on the shingle hash (semi-join against the distinct
    train-shingle set) + a per-doc agg. At 100 TB the train set is the big
    side — the join shuffles hashed ints only, Catalyst inserts a bloom
    filter on the eval side, and the distinct collapses repeats before the
    wire (shingle reuse across docs is high in a real corpus).

    r19 (guide §2.5 input skew): ``fan_out`` on the scan — the shingle
    explode + 60-bit hash is the query's CPU and it runs BEFORE the
    first exchange, so on a single-file fixture both splits shingled on
    ONE task (the column_profile lesson). The source predicates still
    push to the scan (Catalyst moves filters through the repartition);
    no-op on any real multi-split table.
    """
    docs = fan_out(table(spark, sf_dir, "documents"))
    sh = F.explode(shingles(ascii_lower(F.col("text")), _CONTAM_N)).alias("s")
    is_eval = F.col("source").isin(*_EVAL_SOURCES)

    eval_sh = (
        docs.where(is_eval)
        .select("doc_id", sh)
        .select("doc_id", hash60(F.col("s")).alias("h"))
        .distinct()
    )
    train_sh = (
        docs.where(~is_eval)
        .select(sh)
        .select(hash60(F.col("s")).alias("h"))
        .distinct()
    )
    # one eval-side pass: mark each distinct (doc, shingle) as hit/miss via
    # a left join against the distinct train set (train_sh is distinct on h,
    # so the join never multiplies rows), then a single per-doc aggregate —
    # vs. the naive totals⋈hits formulation that shingles and distinct-
    # shuffles the eval split twice.
    marked = eval_sh.join(train_sh.withColumn("hit", F.lit(1)), "h", "left")
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.coalesce("hit", F.lit(0))).cast("bigint").alias("n_hit"),
        (
            F.sum(F.coalesce("hit", F.lit(0))) * 2 >= F.count(F.lit(1))
        )
        .cast("int")
        .alias("contaminated"),
    )


_EVAL_PRED = "source IN ({})".format(", ".join(f"'{s}'" for s in _EVAL_SOURCES))

_CONTAM_SQL = f"""
WITH eval_sh AS (
  SELECT DISTINCT doc_id, {hash60_sql('s')} AS h
  FROM (SELECT doc_id, unnest({shingles_sql(ascii_lower_sql('text'), _CONTAM_N)}) AS s
        FROM documents WHERE {_EVAL_PRED})
),
train_sh AS (
  SELECT DISTINCT {hash60_sql('s')} AS h
  FROM (SELECT unnest({shingles_sql(ascii_lower_sql('text'), _CONTAM_N)}) AS s
        FROM documents WHERE NOT ({_EVAL_PRED}))
),
marked AS (
  SELECT e.doc_id, CASE WHEN t.h IS NULL THEN 0 ELSE 1 END AS hit
  FROM eval_sh e LEFT JOIN (SELECT h, 1 AS one FROM train_sh) t ON e.h = t.h
)
SELECT doc_id, COUNT(*) AS n_shingles,
       CAST(SUM(hit) AS BIGINT) AS n_hit,
       CAST(SUM(hit) * 2 >= COUNT(*) AS INT) AS contaminated
FROM marked
GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# label leakage: pair-level train/eval contamination
# --------------------------------------------------------------------------

#: shingles occurring in more than this many TRAIN documents are excluded
#: from leakage matching — the same Zipf-head rationale as
#: ``text.NGRAM_DF_CAP``: a 5-gram present in thousands of documents is
#: boilerplate, not evidence that one specific train doc leaks one
#: specific eval doc, and it is exactly the hot key that would make the
#: pair join quadratic. Mirrored bit-exactly in the oracle.
LEAK_DF_CAP = 64

#: a (eval, train) pair is reported when ≥ this fraction (ppm) of the
#: eval doc's distinct shingles occur in that ONE train doc
LEAK_THRESHOLD_PPM = 500_000


def q_label_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination at the PAIR level: for every (eval doc,
    train doc) pair, the fraction of the eval doc's distinct 5-gram
    shingles contained in that single train doc, reported when it
    crosses ``LEAK_THRESHOLD_PPM`` — the audit that answers not just
    "is this eval doc contaminated" (`contamination_overlap`'s
    corpus-level answer) but "WHICH train document leaks it", the row a
    curation pipeline needs to actually delete something.

    Semantics: shingles with train document-frequency > ``LEAK_DF_CAP``
    are excluded from MATCHING (numerator) — standard decontamination
    practice (rare n-grams carry the signal) — while the denominator
    stays the eval doc's full distinct-shingle count, so boilerplate
    can never push a pair over the threshold.

    Scale shape (the reason the pair form stays linear at 100 TB): both
    splits shingle map-side into 60-bit ints and collapse distinct; the
    over-cap shingle set is a computed stop-list (bounded by the
    vocabulary head, broadcast anti-join); every surviving shingle joins
    to ≤ LEAK_DF_CAP train docs, so the pair join output is provably
    ≤ cap × |eval shingle rows|. Per-eval-doc totals broadcast (the
    eval split is a benchmark set — small by construction).
    """
    docs = fan_out(table(spark, sf_dir, "documents"))
    sh = F.explode(shingles(ascii_lower(F.col("text")), _CONTAM_N)).alias("s")
    is_eval = F.col("source").isin(*_EVAL_SOURCES)
    # each distinct-shingle relation feeds TWO consumers (totals/df-count
    # + the pair join) — lazy localCheckpoint so the shingle explode and
    # distinct-shuffle run once per split (the prefix.py discipline)
    eval_sh = (
        docs.where(is_eval)
        .select("doc_id", sh)
        .select("doc_id", hash60(F.col("s")).alias("h"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    train_sh = (
        docs.where(~is_eval)
        .select("doc_id", sh)
        .select("doc_id", hash60(F.col("s")).alias("h"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # train_sh is distinct on (doc_id, h) so COUNT(*) per h IS the doc
    # frequency; map-side partial agg collapses hot shingles before the
    # wire, and the over-cap head broadcasts into an anti-join (the
    # ngram_jaccard_pairs rationale — never a window over raw rows)
    hot = (
        train_sh.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > LEAK_DF_CAP)
        .select("h")
    )
    train_kept = train_sh.join(F.broadcast(hot), "h", "left_anti")
    tot = eval_sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_eval_shingles")
    )
    common = (
        eval_sh.withColumnRenamed("doc_id", "eval_doc_id")
        .join(train_kept.withColumnRenamed("doc_id", "train_doc_id"), "h")
        .groupBy("eval_doc_id", "train_doc_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(
            F.broadcast(tot.withColumnRenamed("doc_id", "eval_doc_id")),
            "eval_doc_id",
        )
        .withColumn(
            "containment_ppm",
            F.expr("(1000000 * n_common) div n_eval_shingles"),
        )
        .where(F.col("containment_ppm") >= LEAK_THRESHOLD_PPM)
        .select(
            "eval_doc_id", "train_doc_id", "n_common", "n_eval_shingles",
            "containment_ppm",
        )
    )


_LEAK_SQL = f"""
WITH eval_sh AS (
  SELECT DISTINCT doc_id, {hash60_sql('s')} AS h
  FROM (SELECT doc_id, unnest({shingles_sql(ascii_lower_sql('text'), _CONTAM_N)}) AS s
        FROM documents WHERE {_EVAL_PRED})
),
train_sh AS (
  SELECT DISTINCT doc_id, {hash60_sql('s')} AS h
  FROM (SELECT doc_id, unnest({shingles_sql(ascii_lower_sql('text'), _CONTAM_N)}) AS s
        FROM documents WHERE NOT ({_EVAL_PRED}))
),
kept AS (
  SELECT doc_id, h FROM train_sh
  WHERE h NOT IN (SELECT h FROM train_sh GROUP BY h
                  HAVING COUNT(*) > {LEAK_DF_CAP})
),
tot AS (SELECT doc_id, COUNT(*) AS n_eval_shingles FROM eval_sh GROUP BY 1),
common AS (
  SELECT e.doc_id AS eval_doc_id, k.doc_id AS train_doc_id,
         COUNT(*) AS n_common
  FROM eval_sh e JOIN kept k ON e.h = k.h
  GROUP BY 1, 2
)
SELECT eval_doc_id, train_doc_id, n_common, n_eval_shingles,
       CAST((1000000 * n_common) // n_eval_shingles AS BIGINT)
         AS containment_ppm
FROM common JOIN tot ON tot.doc_id = common.eval_doc_id
WHERE (1000000 * n_common) // n_eval_shingles >= {LEAK_THRESHOLD_PPM}
"""


# --------------------------------------------------------------------------
# cross-domain LM quality matrix: per-(train_source, eval_source) bigram
# likelihood mass over the held-out split
# --------------------------------------------------------------------------

#: integer scale for the smoothed per-bigram probability; one ppm unit =
#: 10⁻⁶ probability mass (mirrored in the oracle)
_PPLX_SCALE = 1_000_000


def q_per_domain_perplexity_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-domain LM quality matrix: every source's HELD-OUT (val-split)
    documents scored under every source's train-split bigram LM — the
    |sources|² table a data-mix designer reads next to `source_token_tvd`
    (distribution distance) to decide which domains model each other and
    which are noise. The diagonal is the in-domain baseline each row's
    off-diagonal cells read against. Splits come from the ONE shared
    :func:`split_label` rule, so the matrix can never disagree with
    `dataset_split_assign` about membership.

    Log-free by design (the `pmi_collocations` stance, not the micro-nat
    one): each eval bigram contributes its add-one-smoothed probability
    as the exact integer ``((c(a,b)+1)·10⁶) div (c(a·)+V)`` — an
    arithmetic-mean likelihood-mass gate that needs no transcendental and
    therefore compares bit-for-bit across engines. `bigram_logprob_score`
    is the calibrated-NLL sibling for single-corpus scoring; this matrix
    trades the geometric mean for exactness at 400 cells. V is the number
    of distinct bigram HEADS in the train source (the conditioning
    contexts — derivable from the same collapse, see below); OOV cells
    (c(a,b)=0) are also counted explicitly per pair.

    NULL-source contract: a NULL source is a real rollup group, but the
    model joins key on train_source with PLAIN equality in BOTH engines
    (so they always agree) — a NULL-source model is therefore
    unreachable and its matrix row reads as all-OOV. The documented
    stance: NULL provenance is a data-quality defect to fix upstream
    (`data_contract_audit` flags it), not a domain to score against.

    Scale shape (one corpus pass per split): the train side collapses
    ONCE into the (source, bigram) frequency table — vocabulary-bounded,
    lazily checkpointed — and *everything else derives from it*:
    c(a·) re-aggregates it on the head, V re-aggregates the heads, and
    the source list broadcasts off V. The eval side explodes map-side,
    fans out ×|sources| against the broadcast source list (a mix-design
    constant, dozens not millions), and hash-joins on the bigram /
    head keys (AQE-splittable; the tables ARE the model, no driver
    state). Output is |sources|² rows.
    """
    docs = fan_out(table(spark, sf_dir, "documents"))
    split = split_label(F.col("doc_id"))
    bg_t = (
        docs.where(split == "train")
        .select(
            F.col("source").alias("train_source"),
            F.explode(shingles(ascii_lower(F.col("text")), 2)).alias("bg"),
        )
    )
    # the ONE train-side collapse every model table derives from
    c_bg = (
        bg_t.groupBy("train_source", "bg")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_bg"))
        .withColumn("head", F.split(F.col("bg"), " ")[0])
        .localCheckpoint(eager=False)  # c_head + the scoring join read it
    )
    c_head = (
        c_bg.groupBy("train_source", "head")
        .agg(F.sum("c_bg").cast("bigint").alias("c_head"))
        .localCheckpoint(eager=False)  # vocab + the scoring join read it
    )
    vocab = c_head.groupBy("train_source").agg(
        F.count(F.lit(1)).cast("bigint").alias("v_size")
    )
    eb = (
        docs.where(split == "val")
        .select(
            F.col("source").alias("eval_source"),
            F.explode(shingles(ascii_lower(F.col("text")), 2)).alias("bg"),
        )
        .withColumn("head", F.split(F.col("bg"), " ")[0])
    )
    scored = (
        eb.crossJoin(F.broadcast(vocab))  # |sources| rows: the ×S fan-out
        .join(c_bg.select("train_source", "bg", "c_bg"),
              ["train_source", "bg"], "left")
        .join(c_head, ["train_source", "head"], "left")
        .select(
            "train_source",
            "eval_source",
            F.when(F.col("c_bg").isNull(), F.lit(1)).otherwise(F.lit(0))
            .alias("oov"),
            F.expr(
                f"((coalesce(c_bg, 0) + 1) * {_PPLX_SCALE}) "
                "div (coalesce(c_head, 0) + v_size)"
            ).alias("prob_ppm"),
        )
    )
    # sum_prob_ppm accumulates in DECIMAL(38,0) (the
    # embedding_whitening_stats convention, r10 advisory #2): each bigram
    # contributes up to 10⁶ ppm, so a single in-domain cell overflows
    # int64 past ~9.2·10¹² eval bigrams — plausible at the documented
    # 100 TB corpus. The exact sum renders as a lossless string; the ppm
    # averages div back to BIGINT (always < 10⁶·scale headroom).
    d38 = "decimal(38,0)"
    return (
        scored.groupBy("train_source", "eval_source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum("oov").cast("bigint").alias("n_oov"),
            F.sum(F.col("prob_ppm").cast(d38)).cast(d38).alias("_sum_prob"),
        )
        .select(
            "train_source", "eval_source", "n_bigrams", "n_oov",
            F.expr("(n_oov * 1000000) div n_bigrams").alias("oov_ppm"),
            F.col("_sum_prob").cast("string").alias("sum_prob_ppm"),
            F.expr("_sum_prob div n_bigrams").cast("bigint")
            .alias("avg_prob_ppm"),
        )
    )


# template: the split-bucket expression and boundaries are defined with the
# dataset-split family below; rendered into _PPLX_SQL right after them
_PPLX_SQL_T = f"""
WITH bg_t AS (
  SELECT source AS train_source,
         unnest({shingles_sql(ascii_lower_sql('text'), 2)}) AS bg
  FROM documents WHERE {{split_bucket}} < {{train_end}}
),
c_bg AS (
  SELECT train_source, bg, CAST(COUNT(*) AS BIGINT) AS c_bg,
         string_split(bg, ' ')[1] AS head
  FROM bg_t GROUP BY 1, 2
),
c_head AS (
  SELECT train_source, head, CAST(SUM(c_bg) AS BIGINT) AS c_head
  FROM c_bg GROUP BY 1, 2
),
vocab AS (
  SELECT train_source, CAST(COUNT(*) AS BIGINT) AS v_size
  FROM c_head GROUP BY 1
),
eb AS (
  SELECT source AS eval_source,
         unnest({shingles_sql(ascii_lower_sql('text'), 2)}) AS bg
  FROM documents
  WHERE {{split_bucket}} >= {{train_end}}
    AND {{split_bucket}} < {{val_end}}
),
he AS (SELECT eval_source, bg, string_split(bg, ' ')[1] AS head FROM eb),
scored AS (
  SELECT v.train_source, he.eval_source,
         CASE WHEN cb.c_bg IS NULL THEN 1 ELSE 0 END AS oov,
         ((COALESCE(cb.c_bg, 0) + 1) * {_PPLX_SCALE})
           // (COALESCE(ch.c_head, 0) + v.v_size) AS prob_ppm
  FROM he CROSS JOIN vocab v
  LEFT JOIN c_bg cb
    ON cb.train_source = v.train_source AND cb.bg = he.bg
  LEFT JOIN c_head ch
    ON ch.train_source = v.train_source AND ch.head = he.head
)
SELECT train_source, eval_source,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(oov) AS BIGINT) AS n_oov,
       CAST((SUM(oov) * 1000000) // COUNT(*) AS BIGINT) AS oov_ppm,
       CAST(SUM(CAST(prob_ppm AS HUGEINT)) AS VARCHAR) AS sum_prob_ppm,
       CAST(SUM(CAST(prob_ppm AS HUGEINT)) // COUNT(*) AS BIGINT)
         AS avg_prob_ppm
FROM scored GROUP BY 1, 2
"""  # rendered into _PPLX_SQL below the split-family constants


# --------------------------------------------------------------------------
# stratified k-fold assignment with fold-balance audit
# --------------------------------------------------------------------------

_KFOLD_K = 5


def q_stratified_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified k-fold cross-validation assignment: every document draws
    a stable fold 0..{k−1} from md5(doc_id) WITHIN its stratum (source) —
    the CV completion of `dataset_split_assign`'s single split, with the
    same stability property (a doc never migrates folds under
    re-ingestion, repartitioning, or corpus growth; the hash is keyed on
    identity, not position). Output is the per-(source, fold) audit —
    doc count, token mass, doc_id checksum — on the FULL source × fold
    grid (absent folds emit zero rows: a stratum too small to populate
    every fold is exactly what the balance audit must surface, not
    silently omit), plus the per-stratum min/max fold occupancy and
    ``balance_ppm = (min·10⁶) div max`` — the one number a CV harness
    gates on before trusting per-fold metrics.

    Plan: fold and stratum are map-side expressions on the scan; ONE
    aggregation shuffle on (source, fold) with map-side combine. The
    grid, the per-stratum extremes, and the join-back all ride the
    |sources|·k-row aggregate (broadcast; the `langid_confusion_eval`
    pattern). At 100 TB nothing but the one collapse ever shuffles.
    """
    docs = table(spark, sf_dir, "documents")
    fold = F.pmod(
        hash60(F.concat(F.lit("fold:"), F.col("doc_id").cast("string"))),
        F.lit(_KFOLD_K),
    ).cast("int")
    m = (
        docs.select(
            "source",
            fold.alias("fold"),
            "doc_id",
            token_count("text").cast("bigint").alias("n_tok"),
        )
        .groupBy("source", "fold")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.sum("doc_id").cast("bigint").alias("doc_checksum"),
        )
        .localCheckpoint(eager=False)  # grid left-join + extremes read it
    )
    # sources come from the collapsed matrix (a source with ≥1 doc is in
    # m by construction) — never a second corpus scan
    grid = (
        m.select("source").distinct()
        .select(
            "source",
            F.explode(F.sequence(F.lit(0), F.lit(_KFOLD_K - 1))).alias("_f"),
        )
        .select("source", F.col("_f").cast("int").alias("fold"))
    )
    # NULL-SAFE stratum match (the serving-merge lesson applied at birth):
    # groupBy treats a NULL source as a real stratum, so it IS in the
    # grid — but a plain-equality join never matches NULL = NULL, and the
    # audit would show all-zero folds for exactly the doc population it
    # should flag, with the real counts silently dropped. Matched with
    # eqNullSafe / IS NOT DISTINCT FROM in both engines.
    full = (
        grid.alias("g").join(
            m.alias("m"),
            F.col("g.source").eqNullSafe(F.col("m.source"))
            & (F.col("g.fold") == F.col("m.fold")),
            "left",
        )
        .select(
            F.col("g.source").alias("source"), F.col("g.fold").alias("fold"),
            F.coalesce("m.n_docs", F.lit(0)).cast("bigint").alias("n_docs"),
            F.coalesce("m.n_tokens", F.lit(0)).cast("bigint")
            .alias("n_tokens"),
            F.coalesce("m.doc_checksum", F.lit(0)).cast("bigint")
            .alias("doc_checksum"),
        )
        .localCheckpoint(eager=False)  # rows + per-stratum extremes read it
    )
    ext = full.groupBy("source").agg(
        F.min("n_docs").alias("fold_min_docs"),
        F.max("n_docs").alias("fold_max_docs"),
    )
    return (
        full.alias("f").join(
            F.broadcast(ext).alias("e"),
            F.col("f.source").eqNullSafe(F.col("e.source")),
        )
        .select(
            F.col("f.source").alias("source"), "fold", "n_docs", "n_tokens",
            "doc_checksum",
            F.col("fold_min_docs").cast("bigint").alias("fold_min_docs"),
            F.col("fold_max_docs").cast("bigint").alias("fold_max_docs"),
            F.expr("(fold_min_docs * 1000000) div fold_max_docs")
            .alias("balance_ppm"),
        )
    )


_KFOLD_SQL = f"""
WITH a AS (
  SELECT source,
         CAST({hash60_sql("concat('fold:', CAST(doc_id AS VARCHAR))")}
              % {_KFOLD_K} AS INT) AS fold,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
         CAST(SUM(doc_id) AS BIGINT) AS doc_checksum
  FROM documents GROUP BY 1, 2
),
grid AS (
  SELECT source, CAST(f AS INT) AS fold
  FROM (SELECT DISTINCT source FROM documents)
  CROSS JOIN (SELECT unnest(range({_KFOLD_K})) AS f)
),
full_grid AS (
  SELECT g.source, g.fold,
         COALESCE(a.n_docs, 0) AS n_docs,
         COALESCE(a.n_tokens, 0) AS n_tokens,
         COALESCE(a.doc_checksum, 0) AS doc_checksum
  FROM grid g LEFT JOIN a
    ON a.source IS NOT DISTINCT FROM g.source AND a.fold = g.fold
),
ext AS (
  SELECT source, CAST(MIN(n_docs) AS BIGINT) AS fold_min_docs,
         CAST(MAX(n_docs) AS BIGINT) AS fold_max_docs
  FROM full_grid GROUP BY 1
)
SELECT f.source, f.fold, f.n_docs, f.n_tokens, f.doc_checksum,
       e.fold_min_docs, e.fold_max_docs,
       CAST((e.fold_min_docs * 1000000) // e.fold_max_docs AS BIGINT)
         AS balance_ppm
FROM full_grid f JOIN ext e ON e.source IS NOT DISTINCT FROM f.source
"""


# --------------------------------------------------------------------------
# sequence packing: fixed-token-budget packs per shard
# --------------------------------------------------------------------------

_PACK_BUDGET = 2048


def _pack_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pack layout shared by :func:`q_sequence_packing` and
    :func:`q_packing_efficiency_report` — ONE definition, so the report
    cannot audit a different layout than the packer emits: within each
    hash shard, docs are laid out in doc_id order and a doc's pack is
    ``tokens_before_it div budget`` (integer div in BOTH engines — the
    r12 rewrite retires the float ``FLOOR(x / 2048)`` form whose double
    rounding is only accidentally exact below 2⁵³ prefix tokens).

    Stated contract (r12, previously an engine accident): NULL text
    counts 0 tokens via COALESCE in both engines, so a NULL-text doc
    occupies a pack slot with zero token mass instead of poisoning the
    prefix sum differently per engine.

    Columns: ``shard, doc_id, n_tokens, pack_id``.
    """
    docs = table(spark, sf_dir, "documents")
    shard = F.pmod(
        hash60(F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))), F.lit(8)
    )
    toks = F.coalesce(token_count("text").cast("bigint"), F.lit(0))
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        docs.select(shard.alias("shard"), F.col("doc_id"), toks.alias("n_tokens"))
        .withColumn("before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .withColumn("pack_id", F.expr(f"before div {_PACK_BUDGET}"))
        .drop("before")
    )


def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign documents to fixed-token-budget training packs: within each
    hash shard, docs are laid out in doc_id order and a doc's pack is
    ``tokens_before_it div budget`` — streaming greedy packing whose
    boundary pack may overflow by at most one doc (the standard pack-then-
    truncate layout). One window per shard partition, no global sort; at
    100 TB each shard's prefix sum is an independent partition-local scan.
    Layout shared with :func:`q_packing_efficiency_report` via
    :func:`_pack_layout`.
    """
    return _pack_layout(spark, sf_dir).groupBy("shard", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("pack_tokens"),
    )


_SHARD_EXPR = (
    hash60_sql("concat('shard:', CAST(doc_id AS VARCHAR))") + " % 8"
)

# the oracle twin of _pack_layout — a WITH-body fragment ending in the
# ``layout`` CTE, prepended by both pack queries' SQL so the two oracles
# share one layout definition exactly like the Spark side does
_PACK_LAYOUT_CTES = f"""t AS (
  SELECT {_SHARD_EXPR} AS shard, doc_id,
         CAST(COALESCE(len(string_split(text, ' ')), 0) AS BIGINT) AS n_tokens
  FROM documents
),
layout AS (
  SELECT shard, doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           // {_PACK_BUDGET} AS pack_id
  FROM t
)"""

_SEQ_PACK_SQL = f"""
WITH {_PACK_LAYOUT_CTES}
SELECT shard, CAST(pack_id AS BIGINT) AS pack_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
FROM layout
GROUP BY 1, 2
"""


_UTIL_BUCKETS = 10  # utilization deciles; bucket 10 = full-or-overflowing


def q_packing_efficiency_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack-utilization histogram over :func:`q_sequence_packing`'s packs
    (r12 shortlist, landed r12) — the table that decides whether the pack
    budget is sized right before a training run: per utilization decile
    ``util_bucket = least(pack_tokens·10 div budget, 10)``, the number of
    packs, their doc and token mass, the padding a pad-to-budget collator
    would burn (``Σ max(budget − pack_tokens, 0)``) and the overflow a
    pack-then-truncate collator would cut (``Σ max(pack_tokens − budget,
    0)``). All exact integers; bucket 10 collects the full-or-overflowing
    packs (a pack overflows by at most its boundary doc), the low buckets
    expose shard-tail fragmentation.

    The layout is :func:`_pack_layout` — the SAME definition
    `sequence_packing` aggregates, in both engines, so the report can
    never describe packs the packer didn't build. NULL text counts 0
    tokens by that layout's stated contract.

    Scale shape: the per-shard prefix-sum window (partition-local scan),
    one map-side-combined groupBy to |packs| rows, then an 11-row bucket
    collapse — the histogram tail is aggregate-sized at any corpus size.
    """
    packs = _pack_layout(spark, sf_dir).groupBy("shard", "pack_id").agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum("n_tokens").cast("bigint").alias("pt"),
    )
    bucketed = packs.select(
        F.least(
            F.expr(f"pt * {_UTIL_BUCKETS} div {_PACK_BUDGET}"),
            F.lit(_UTIL_BUCKETS).cast("bigint"),
        ).cast("int").alias("util_bucket"),
        "nd", "pt",
        F.greatest(F.lit(_PACK_BUDGET).cast("bigint") - F.col("pt"),
                   F.lit(0).cast("bigint")).alias("pad"),
        F.greatest(F.col("pt") - F.lit(_PACK_BUDGET).cast("bigint"),
                   F.lit(0).cast("bigint")).alias("ovf"),
    )
    return bucketed.groupBy("util_bucket").agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.sum("nd").cast("bigint").alias("n_docs"),
        F.sum("pt").cast("bigint").alias("pack_tokens"),
        F.sum("pad").cast("bigint").alias("padding_tokens"),
        F.sum("ovf").cast("bigint").alias("overflow_tokens"),
    )


_PACK_REPORT_SQL = f"""
WITH {_PACK_LAYOUT_CTES},
packs AS (
  SELECT shard, pack_id, COUNT(*) AS nd,
         CAST(SUM(n_tokens) AS BIGINT) AS pt
  FROM layout GROUP BY 1, 2
)
SELECT CAST(LEAST(pt * {_UTIL_BUCKETS} // {_PACK_BUDGET}, {_UTIL_BUCKETS})
            AS INT) AS util_bucket,
       COUNT(*) AS n_packs,
       CAST(SUM(nd) AS BIGINT) AS n_docs,
       CAST(SUM(pt) AS BIGINT) AS pack_tokens,
       CAST(SUM(GREATEST({_PACK_BUDGET} - pt, 0)) AS BIGINT) AS padding_tokens,
       CAST(SUM(GREATEST(pt - {_PACK_BUDGET}, 0)) AS BIGINT) AS overflow_tokens
FROM packs
GROUP BY 1
"""


def q_pack_attention_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document attention waste per shard (round 13 — the other
    half of the packing audit, completing `packing_efficiency_report`):
    when packed sequences are trained WITHOUT block-diagonal document
    masking, causal attention spends compute on cross-doc (query, key)
    pairs that carry no training signal. Per pack the exact pair
    accounting is

    - ``total_pairs``   = T·(T+1)/2 for pack token mass T (full causal),
    - ``intra_pairs``   = Σᵢ Lᵢ·(Lᵢ+1)/2 over its docs (masked causal),
    - ``cross_pairs``   = total − intra (the waste a doc mask reclaims),

    aggregated per shard with ``waste_ppm = cross·10⁶ div total`` — the
    number that decides whether the collator needs the mask. All exact
    integers; the ppm numerator cross-multiplies in DECIMAL(38,0)
    (Σ pair counts reach ~2·10¹⁶ at 100 TB, ×10⁶ overflows int64 — the
    `embedding_whitening_stats` convention).

    The layout is :func:`_pack_layout` — the SAME definition
    `sequence_packing` and `packing_efficiency_report` consume, in both
    engines, so the waste report can never describe packs the packer
    didn't build. NULL text counts 0 tokens by that layout's stated
    contract: a zero-token doc contributes zero pairs on both sides of
    the subtraction. A shard whose packs are ALL zero-token yields
    explicit-NULL waste_ppm via NULLIF (division by a zero pair count
    is a contract, not an accident).

    Scale shape: identical to the report's — the per-shard prefix-sum
    window (partition-local), one map-side-combined (shard, pack_id)
    collapse that REUSES the window's shard partitioning (no exchange
    between), then an 8-row shard collapse. Aggregate-sized tail at any
    corpus size; the shard modulus is the same documented scale knob.
    """
    d38 = "decimal(38,0)"
    per_doc = _pack_layout(spark, sf_dir).select(
        "shard", "pack_id", "n_tokens",
        F.expr("n_tokens * (n_tokens + 1) div 2").alias("doc_pairs"),
    )
    packs = per_doc.groupBy("shard", "pack_id").agg(
        F.sum("n_tokens").cast("bigint").alias("pt"),
        F.sum("doc_pairs").cast("bigint").alias("intra"),
    ).select(
        "shard", "intra",
        F.expr("pt * (pt + 1) div 2").alias("total"),
    )
    return packs.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.sum("total").cast("bigint").alias("total_pairs"),
        F.sum("intra").cast("bigint").alias("intra_pairs"),
        (F.sum("total") - F.sum("intra")).cast("bigint").alias("cross_pairs"),
    ).select(
        "shard", "n_packs", "total_pairs", "intra_pairs", "cross_pairs",
        F.expr(f"CAST((CAST(cross_pairs AS {d38}) * 1000000) "
               "div NULLIF(total_pairs, 0) AS BIGINT)").alias("waste_ppm"),
    )


_PACK_WASTE_SQL = f"""
WITH {_PACK_LAYOUT_CTES},
packs AS (
  SELECT shard, pack_id,
         CAST(SUM(n_tokens) AS BIGINT) AS pt,
         CAST(SUM(n_tokens * (n_tokens + 1) // 2) AS BIGINT) AS intra
  FROM layout GROUP BY 1, 2
),
per_shard AS (
  SELECT shard, COUNT(*) AS n_packs,
         CAST(SUM(pt * (pt + 1) // 2) AS BIGINT) AS total_pairs,
         CAST(SUM(intra) AS BIGINT) AS intra_pairs
  FROM packs GROUP BY 1
)
SELECT shard, n_packs, total_pairs, intra_pairs,
       total_pairs - intra_pairs AS cross_pairs,
       CAST(CAST(total_pairs - intra_pairs AS HUGEINT) * 1000000
            // NULLIF(total_pairs, 0) AS BIGINT) AS waste_ppm
FROM per_shard
"""


def q_pack_waste_by_utilization(
        spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack waste × utilization decile (round 14 — the join of the two
    packing audits): `packing_efficiency_report` says how FULL the packs
    are, `pack_attention_waste` says how much attention compute crosses
    document boundaries; this table says both PER UTILIZATION DECILE —
    for each ``util_bucket`` the pack/doc/token mass, the pad-to-budget
    padding and truncation overflow, AND the exact causal-pair
    accounting with its ``waste_ppm``. The decision table the two
    marginals can't give: low buckets show whether shard-tail
    fragmentation wastes more compute as PADDING than full packs waste
    as CROSS-DOC ATTENTION — i.e. which fix (re-sharding vs a document
    mask) buys more, per band.

    No physical join is needed or wanted: both audits aggregate the SAME
    per-pack collapse of :func:`_pack_layout` (the ONE-definition seam),
    so the "join" is a single aggregation carrying both column families
    — the report provably describes one set of packs, not two audits
    that could drift. All exact integers; ppm numerators in
    DECIMAL(38,0)/HUGEINT (the `pack_attention_waste` convention); an
    all-zero-token bucket yields explicit-NULL waste_ppm via NULLIF.

    Scale shape: the per-shard prefix-sum window (partition-local), one
    map-side-combined (shard, pack_id) collapse that REUSES the window's
    shard partitioning, then an 11-row bucket collapse — the ONLY
    exchange past the window's is over the aggregate-sized |packs| frame
    (plan-pinned: exactly two exchanges, zero joins).
    """
    d38 = "decimal(38,0)"
    per_doc = _pack_layout(spark, sf_dir).select(
        "shard", "pack_id", "n_tokens",
        F.expr("n_tokens * (n_tokens + 1) div 2").alias("doc_pairs"),
    )
    packs = per_doc.groupBy("shard", "pack_id").agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum("n_tokens").cast("bigint").alias("pt"),
        F.sum("doc_pairs").cast("bigint").alias("intra"),
    )
    bucketed = packs.select(
        F.least(
            F.expr(f"pt * {_UTIL_BUCKETS} div {_PACK_BUDGET}"),
            F.lit(_UTIL_BUCKETS).cast("bigint"),
        ).cast("int").alias("util_bucket"),
        "nd", "pt", "intra",
        F.greatest(F.lit(_PACK_BUDGET).cast("bigint") - F.col("pt"),
                   F.lit(0).cast("bigint")).alias("pad"),
        F.greatest(F.col("pt") - F.lit(_PACK_BUDGET).cast("bigint"),
                   F.lit(0).cast("bigint")).alias("ovf"),
        F.expr("pt * (pt + 1) div 2").alias("total"),
    )
    return bucketed.groupBy("util_bucket").agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.sum("nd").cast("bigint").alias("n_docs"),
        F.sum("pt").cast("bigint").alias("pack_tokens"),
        F.sum("pad").cast("bigint").alias("padding_tokens"),
        F.sum("ovf").cast("bigint").alias("overflow_tokens"),
        F.sum("total").cast("bigint").alias("total_pairs"),
        F.sum("intra").cast("bigint").alias("intra_pairs"),
        (F.sum("total") - F.sum("intra")).cast("bigint").alias("cross_pairs"),
    ).select(
        "util_bucket", "n_packs", "n_docs", "pack_tokens",
        "padding_tokens", "overflow_tokens",
        "total_pairs", "intra_pairs", "cross_pairs",
        F.expr(f"CAST((CAST(cross_pairs AS {d38}) * 1000000) "
               "div NULLIF(total_pairs, 0) AS BIGINT)").alias("waste_ppm"),
    )


_PACK_UTIL_WASTE_SQL = f"""
WITH {_PACK_LAYOUT_CTES},
packs AS (
  SELECT shard, pack_id, COUNT(*) AS nd,
         CAST(SUM(n_tokens) AS BIGINT) AS pt,
         CAST(SUM(n_tokens * (n_tokens + 1) // 2) AS BIGINT) AS intra
  FROM layout GROUP BY 1, 2
),
bucketed AS (
  SELECT CAST(LEAST(pt * {_UTIL_BUCKETS} // {_PACK_BUDGET},
                    {_UTIL_BUCKETS}) AS INT) AS util_bucket,
         nd, pt, intra,
         GREATEST({_PACK_BUDGET} - pt, 0) AS pad,
         GREATEST(pt - {_PACK_BUDGET}, 0) AS ovf,
         pt * (pt + 1) // 2 AS total
  FROM packs
)
SELECT util_bucket,
       COUNT(*) AS n_packs,
       CAST(SUM(nd) AS BIGINT) AS n_docs,
       CAST(SUM(pt) AS BIGINT) AS pack_tokens,
       CAST(SUM(pad) AS BIGINT) AS padding_tokens,
       CAST(SUM(ovf) AS BIGINT) AS overflow_tokens,
       CAST(SUM(total) AS BIGINT) AS total_pairs,
       CAST(SUM(intra) AS BIGINT) AS intra_pairs,
       CAST(SUM(total) - SUM(intra) AS BIGINT) AS cross_pairs,
       CAST(CAST(SUM(total) - SUM(intra) AS HUGEINT) * 1000000
            // NULLIF(CAST(SUM(total) AS HUGEINT), 0) AS BIGINT)
         AS waste_ppm
FROM bucketed
GROUP BY 1
"""


CHUNK_W = 64      # tokens per chunk (the training context window)
CHUNK_STRIDE = 48  # chunk start step → 16-token overlap between chunks
CHUNK_MIN = 8      # drop tail chunks shorter than this (unless sole chunk)


def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking — the context-window preparation
    step every LLM training pipeline runs between cleaning and packing:
    each document becomes overlapping CHUNK_W-token chunks starting every
    CHUNK_STRIDE tokens (16-token overlap), tail chunks shorter than
    CHUNK_MIN dropped unless they are the document's only chunk.

    ``chunk_id = (start-1) / stride`` is derived arithmetically, never
    from explode order, so the output is deterministic under any
    partitioning. Complements :func:`q_sequence_packing` (which packs
    whole docs into budgets; this splits docs into windows).

    Scale shape: map-only — token split, start generation
    (``sequence``), and slice all happen inside the scan task; NO shuffle
    at any corpus size. The ~W/stride output multiplier is the
    unavoidable payload fan-out, not a key explosion.
    """
    # NULL text has nothing to chunk — excluded by stated contract in
    # both engines (r12, registry-wide NULL-probe sweep: the row used to
    # survive as one ghost chunk whose text was '' in Spark via
    # concat_ws(NULL) but NULL in DuckDB via array_to_string — an
    # engine-divergent accident, now a contract)
    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    w = tokens("text")
    n = F.size(w)
    starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(CHUNK_STRIDE))
    exploded = docs.select(
        "doc_id", "lang", w.alias("w"), F.explode(starts).alias("st")
    )
    chunk = F.slice(F.col("w"), F.col("st"), CHUNK_W)
    return (
        exploded.select(
            "doc_id",
            "lang",
            ((F.col("st") - 1) / CHUNK_STRIDE).cast("int").alias("chunk_id"),
            F.size(chunk).cast("int").alias("n_chunk_tokens"),
            F.concat_ws(" ", chunk).alias("chunk_text"),
        )
        .where((F.col("n_chunk_tokens") >= CHUNK_MIN) | (F.col("chunk_id") == 0))
    )


_DOC_CHUNK_SQL = f"""
WITH t AS (
  SELECT doc_id, lang, string_split(text, ' ') AS w,
         len(string_split(text, ' ')) AS n
  FROM documents
  WHERE text IS NOT NULL  -- nothing to chunk, by contract (r12)
),
e AS (
  SELECT doc_id, lang, w,
         CAST(st AS BIGINT) AS st
  FROM t, unnest(range(1, greatest(n, 1) + 1, {CHUNK_STRIDE})) AS u(st)
)
SELECT doc_id, lang,
       CAST((st - 1) // {CHUNK_STRIDE} AS INT) AS chunk_id,
       CAST(len(w[st : st + {CHUNK_W - 1}]) AS INT) AS n_chunk_tokens,
       array_to_string(w[st : st + {CHUNK_W - 1}], ' ') AS chunk_text
FROM e
WHERE len(w[st : st + {CHUNK_W - 1}]) >= {CHUNK_MIN}
   OR (st - 1) // {CHUNK_STRIDE} = 0
"""


# --------------------------------------------------------------------------
# PII redaction: regex scrub with audit counts
# --------------------------------------------------------------------------

_EMAIL_RE = r"[a-z0-9.]+@[a-z0-9.]+"


def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII scrub with an audit trail: e-mail-shaped spans are
    replaced by ``[EMAIL]`` and counted per doc. The testdata has no PII,
    so a deterministic fake address is planted on every 5th doc first —
    the query then proves the scrub finds exactly those. Pure built-in
    regexp ops: map-side only, no shuffle except the final hash audit."""
    docs = table(spark, sf_dir, "documents")
    planted = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact: user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com"),
        ),
    ).otherwise(F.col("text"))
    with_text = docs.select("doc_id", planted.alias("text2"))
    return with_text.select(
        "doc_id",
        F.size(F.regexp_extract_all("text2", F.lit(_EMAIL_RE), 0)).alias("n_emails"),
        F.md5(F.regexp_replace("text2", _EMAIL_RE, "[EMAIL]")).alias("redacted_md5"),
    )


_REDACT_SQL = f"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0
              THEN concat(text, ' contact: user', CAST(doc_id AS VARCHAR), '@example.com')
              ELSE text END AS text2
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text2, '{_EMAIL_RE}')) AS INT) AS n_emails,
       md5(regexp_replace(text2, '{_EMAIL_RE}', '[EMAIL]', 'g')) AS redacted_md5
FROM t
"""


# --------------------------------------------------------------------------
# fixed-size per-stratum sample (the quota sibling of the rate sampler)
# --------------------------------------------------------------------------

SAMPLE_K = 5


def q_per_group_sample_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTLY-k docs per stratum (language): rank docs inside each
    language by a stable md5-derived draw and keep the first k — the
    deterministic replacement for per-group reservoir sampling (eval-set
    carving, per-source few-shot pools). Complements
    ``stratified_sample``, which admits a RATE and so has binomial size
    jitter per stratum.

    Plan: one hash exchange on ``lang`` + in-partition sort for the
    row_number window. Strata counts are assumed executor-sized (here: 5
    languages); a skewed mega-stratum would make one sort wide — the
    fix at scale is a two-phase pre-filter (keep each task's local top-k
    via the same window over (lang, partition-salt), union, re-rank),
    which multiplies the kept rows by the task count but never sorts a
    full stratum in one place.
    """
    docs = table(spark, sf_dir, "documents")
    draw = hash60(F.concat(F.lit("sampk:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(draw.asc(), F.col("doc_id").asc())
    return (
        docs.select("doc_id", "lang", draw.alias("draw"))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= SAMPLE_K)
        .select("lang", "rnk", "doc_id", "draw")
    )


_SAMPLE_K_DRAW = hash60_sql("concat('sampk:', CAST(doc_id AS VARCHAR))")

_SAMPLE_K_SQL = f"""
SELECT lang, rnk, doc_id, draw FROM (
  SELECT lang, doc_id, {_SAMPLE_K_DRAW} AS draw,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY {_SAMPLE_K_DRAW} ASC, doc_id ASC) AS INT) AS rnk
  FROM documents
) WHERE rnk <= {SAMPLE_K}
"""


# --------------------------------------------------------------------------
# corpus mix rebalancing: per-language target epochs
# --------------------------------------------------------------------------

#: target epochs per language: >1 upsamples (repeat), <1 downsamples.
#: The LLM data-mixture knob (e.g. Llama upsampling Wikipedia ~x2 while
#: sampling CommonCrawl <1 epoch). Fractions are expressed as integer
#: per-mille thresholds so no float arithmetic enters either engine's plan.
_MIX_EPOCHS: dict[str, float] = {
    "en": 0.5, "de": 1.0, "es": 2.0, "fr": 1.5, "zh": 2.5,
}


def q_corpus_mix_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebalance the corpus to per-language target epochs: each doc yields
    ``floor(e)`` full copies plus one more iff its deterministic hash
    falls under the fractional remainder — so re-runs are stable and the
    realized epochs converge to the target as the corpus grows.

    The audit aggregates ``copies`` map-side (one shuffle on the 5-value
    lang key) — materializing the rebalanced corpus itself is
    ``explode(sequence(1, copies))``, a Generate with no shuffle at all,
    so the expensive path costs exactly the output size.
    """
    docs = table(spark, sf_dir, "documents")
    whole = F.lit(None).cast("bigint")
    thresh = F.lit(None).cast("bigint")
    for lang, e in _MIX_EPOCHS.items():
        w, t = int(e), round((e - int(e)) * 1000)
        whole = F.when(F.col("lang") == lang, F.lit(w)).otherwise(whole)
        thresh = F.when(F.col("lang") == lang, F.lit(t)).otherwise(thresh)
    h = F.pmod(
        hash60(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))), F.lit(1000)
    )
    copies = whole + F.when(h < thresh, 1).otherwise(0)
    return (
        docs.select("lang", copies.alias("c"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs_in"),
            F.sum("c").cast("bigint").alias("n_examples_out"),
        )
        .select(
            "lang", "n_docs_in", "n_examples_out",
            (F.col("n_examples_out").cast("double")
             / F.col("n_docs_in").cast("double")).alias("realized_epochs"),
        )
    )


def _mix_rebalance_sql() -> str:
    whole = " ".join(
        f"WHEN lang = '{lang}' THEN {int(e)}" for lang, e in _MIX_EPOCHS.items()
    )
    thresh = " ".join(
        f"WHEN lang = '{lang}' THEN {round((e - int(e)) * 1000)}"
        for lang, e in _MIX_EPOCHS.items()
    )
    h = hash60_sql("concat('mix:', CAST(doc_id AS VARCHAR))")
    return f"""
WITH c AS (
  SELECT lang,
         (CASE {whole} END)
         + (CASE WHEN {h} % 1000 < (CASE {thresh} END) THEN 1 ELSE 0 END)
           AS copies
  FROM documents
)
SELECT lang, COUNT(*) AS n_docs_in,
       CAST(SUM(copies) AS BIGINT) AS n_examples_out,
       CAST(SUM(copies) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         AS realized_epochs
FROM c GROUP BY lang
"""


_MIX_REBALANCE_SQL = _mix_rebalance_sql()


# --------------------------------------------------------------------------
# SCD-2 history: validity-interval upsert (the SCD-1 merge's sibling)
# --------------------------------------------------------------------------

def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row Bernoulli sample with probability proportional to document
    LENGTH (the standard long-docs-oversampled training mix), fully
    deterministic: keep iff ``hash60('ws:'||doc_id) % 1e6 <
    n_chars*1e6 // max_chars``. Pure integer arithmetic end to end — no
    float probability, no RNG — so membership is reproducible across
    retries, partitionings, and engines.

    Scale shape: the corpus max is ONE broadcast scalar; the gate is a
    map-side filter fused into the scan. Weighted-without-replacement
    variants (A-ES exponential keys) need transcendental per-row math
    that is NOT cross-engine bit-stable — this thresholded form is the
    deterministic subset that is, which is why the engine ships it.
    """
    docs = table(spark, sf_dir, "documents")
    mx = docs.agg(F.max("n_chars").alias("mx"))
    # integer threshold (floored quotient) keeps both engines exact
    gate = (
        F.pmod(
            hash60(F.concat(F.lit("ws:"), F.col("doc_id").cast("string"))),
            F.lit(1_000_000),
        )
        < F.floor((F.col("n_chars") * F.lit(1_000_000)) / F.col("mx")).cast(
            "long"
        )
    )
    return (
        docs.crossJoin(F.broadcast(mx))
        .where(gate)
        .select("doc_id", "lang", "n_chars")
    )


_WEIGHTED_SAMPLE_SQL = f"""
WITH m AS (SELECT max(n_chars) AS mx FROM documents)
SELECT doc_id, lang, n_chars
FROM documents, m
WHERE {hash60_sql("concat('ws:', CAST(doc_id AS VARCHAR))")} % 1000000
      < (n_chars * 1000000) // mx
"""


def _fp_table(df: DataFrame, name: str, row_repr) -> DataFrame:
    return df.agg(
        F.lit(name).alias("table_name"),
        F.count(F.lit(1)).alias("n_rows"),
        F.bit_xor(hash60(row_repr)).alias("fingerprint"),
    )


def q_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table fingerprints — the anti-entropy primitive
    for verifying a replica, migration, or backfill WITHOUT sorting or
    moving the data: per-row hash60 over a canonical string encoding,
    folded with ``bit_xor`` (commutative, associative, overflow-free at
    any row count — unlike a modular SUM, there is no scale at which the
    accumulator wraps differently between engines).

    Canonical encoding discipline: only types whose string form is
    engine-identical go into the row representation (bigints, strings,
    DECIMAL-cast money — never raw doubles, whose scientific-notation
    thresholds differ between Spark and DuckDB).

    Scale shape: three independent map-side-combined single-row
    aggregates unioned — each table's fingerprint is one scan, no
    shuffle beyond the 1-row partials.
    """
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    sep = "|"
    o_repr = F.concat_ws(
        sep,
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
    )
    c_repr = F.concat_ws(
        sep,
        F.col("c_custkey").cast("string"),
        F.col("c_name"),
        F.col("c_nationkey").cast("string"),
    )
    n_repr = F.concat_ws(
        sep,
        F.col("n_nationkey").cast("string"),
        F.col("n_name"),
        F.col("n_regionkey").cast("string"),
    )
    return (
        _fp_table(orders, "orders", o_repr)
        .unionByName(_fp_table(customer, "customer", c_repr))
        .unionByName(_fp_table(nation, "nation", n_repr))
    )


def _fp_sql(tbl: str, repr_sql: str) -> str:
    return (
        f"SELECT '{tbl}' AS table_name, COUNT(*) AS n_rows,\n"
        f"       bit_xor({hash60_sql(repr_sql)}) AS fingerprint\n"
        f"FROM {tbl}"
    )


_FINGERPRINT_SQL = (
    _fp_sql(
        "orders",
        "concat_ws('|', CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR), "
        "o_orderstatus, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR))",
    )
    + "\nUNION ALL\n"
    + _fp_sql(
        "customer",
        "concat_ws('|', CAST(c_custkey AS VARCHAR), c_name, "
        "CAST(c_nationkey AS VARCHAR))",
    )
    + "\nUNION ALL\n"
    + _fp_sql(
        "nation",
        "concat_ws('|', CAST(n_nationkey AS VARCHAR), n_name, "
        "CAST(n_regionkey AS VARCHAR))",
    )
)


#: sentinel for "this op carries no payload" (D rows) — lets the last-wins
#: aggregate stay null-free, since DuckDB's arg_max skips NULL arguments
#: while Spark's max_by carries them, and the two must agree
_CDC_DEL = "<del>"


def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply-changes: collapse an ordered insert/update/delete change
    log (op, seq) to each key's FINAL state — last writer wins, delete
    tombstones null the payload. The missing third of the merge family:
    :func:`q_incremental_merge` is a single unordered upsert batch and
    :func:`q_scd2_history` keeps every version; this is the Debezium-style
    replay that produces the current snapshot from a multi-op log.

    The log is synthesized deterministically from ``orders`` (four
    hash-gated op waves — I at seq 0, U at 1, D at 2, U at 3 — so all
    three op kinds are exercised, keys overlap, and real multi-op
    collapses happen). Plan: map-side union of the waves,
    then ONE key exchange for a ``max_by`` aggregate — never a
    row_number-over-log sort, and the log's width (ops per key) only
    affects the map side. At 100 TB of log this is the shape you want:
    partial aggregation collapses each key's ops within every scan task
    before anything shuffles.

    Cross-engine null discipline: payloads are sentinel-encoded before the
    aggregate (see ``_CDC_DEL``) because DuckDB's ``arg_max`` ignores
    NULL-argument rows while Spark's ``max_by`` returns them — the
    sentinel keeps both engines on the total ops set, decoded after.
    """
    key = F.col("o_orderkey")
    h = F.pmod(
        hash60(F.concat(F.lit("cdc:"), key.cast("string"))), F.lit(105)
    )
    base = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", h.alias("_h")
    )

    def wave(mod, seq, op, status):
        return base.where(F.col("_h") % mod == 0).select(
            "o_orderkey",
            F.lit(seq).alias("seq"),
            F.lit(op).alias("op"),
            status.alias("status"),
        )

    ops = (
        wave(2, 0, "I", F.concat(F.lit("i0-"), F.col("o_orderstatus")))
        .unionByName(wave(5, 1, "U", F.concat(F.lit("u1-"), F.col("o_orderstatus"))))
        .unionByName(wave(7, 2, "D", F.lit(_CDC_DEL)))
        .unionByName(wave(3, 3, "U", F.lit("u2")))
    )
    return cdc_collapse(ops, key="o_orderkey")


_CDC_HASH = hash60_sql("concat('cdc:', CAST(o_orderkey AS VARCHAR))")

_CDC_APPLY_SQL = f"""
WITH ops AS (
  SELECT o_orderkey, 0 AS seq, 'I' AS op,
         'i0-' || o_orderstatus AS status
  FROM orders WHERE ({_CDC_HASH} % 105) % 2 = 0
  UNION ALL
  SELECT o_orderkey, 1, 'U',
         'u1-' || o_orderstatus
  FROM orders WHERE ({_CDC_HASH} % 105) % 5 = 0
  UNION ALL
  SELECT o_orderkey, 2, 'D', '{_CDC_DEL}'
  FROM orders WHERE ({_CDC_HASH} % 105) % 7 = 0
  UNION ALL
  SELECT o_orderkey, 3, 'U', 'u2'
  FROM orders WHERE ({_CDC_HASH} % 105) % 3 = 0
),
last AS (
  SELECT o_orderkey,
         arg_max(op, seq) AS last_op,
         arg_max(status, seq) AS status_enc,
         max(seq) AS last_seq
  FROM ops GROUP BY 1
)
SELECT o_orderkey, last_op,
       CASE WHEN status_enc <> '{_CDC_DEL}' THEN status_enc END AS final_status,
       CAST(last_seq AS INT) AS last_seq,
       (last_op <> 'D') AS alive
FROM last
"""


def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2: apply the deterministic change
    batch of :func:`q_incremental_merge` as NEW VERSIONS instead of
    overwrites — every key keeps its full history as half-open validity
    intervals (``valid_from``, ``valid_to``), with ``is_current`` marking
    the open row. The warehouse pattern for auditable dimensions; the
    reference only ever overwrites (TransformTaxiTrips.py:115-119).

    Plan: one union (map-side), one hash exchange on the key, one
    in-partition sort shared by ``row_number``/``lead`` — interval
    construction costs exactly one offset-window pass, never a self-join
    of history against itself. Per-key partitions are version counts
    (here ≤2, in practice small), so the sort cannot skew.
    """
    base = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").alias("price"),
        F.col("o_orderdate").alias("valid_from"),
    )
    is_chg = (
        F.pmod(hash60(F.concat(F.lit("chg:"), F.col("o_orderkey").cast("string"))),
               F.lit(10)) == 0
    )
    changes = base.where(is_chg).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("price") * 1.1).alias("price"),
        (F.col("valid_from") + F.expr("INTERVAL 30 DAYS")).alias("valid_from"),
    )
    hist = base.unionByName(changes)
    w = Window.partitionBy("o_orderkey").orderBy("valid_from")
    valid_to = F.lead("valid_from").over(w)
    return hist.select(
        "o_orderkey",
        F.row_number().over(w).alias("version"),
        "o_orderstatus",
        "price",
        "valid_from",
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )


_SCD2_SQL = f"""
WITH hist AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice AS price,
         o_orderdate AS valid_from
  FROM orders
  UNION ALL
  SELECT o_orderkey, 'U', o_totalprice * 1.1,
         o_orderdate + INTERVAL 30 DAY
  FROM orders WHERE {_CHG_PRED}
)
SELECT o_orderkey,
       CAST(ROW_NUMBER() OVER w AS INT) AS version,
       o_orderstatus, price, valid_from,
       LEAD(valid_from) OVER w AS valid_to,
       (LEAD(valid_from) OVER w IS NULL) AS is_current
FROM hist
WINDOW w AS (PARTITION BY o_orderkey ORDER BY valid_from)
"""


# --------------------------------------------------------------------------
# corpus-level exact-substring dedup (ExactSubstr / MassiveText style)
# --------------------------------------------------------------------------

_NGRAM_N = 8  # window width in words; MassiveText uses 50 tokens at web scale


def q_corpus_ngram_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document exact-substring dedup: remove every word that sits
    inside an 8-word window occurring verbatim in ≥2 distinct documents
    (Lee et al. 2021 "Deduplicating Training Data Makes Language Models
    Better" ExactSubstr; MassiveText §A.1.2 uses the same construction at
    50 tokens). Emits per doc the surviving text plus dup-coverage stats —
    the downstream filter typically drops docs above a coverage threshold
    and keeps the cleaned text for the rest.

    Scale design (the suffix-array of the paper is replaced by its
    shuffle-native equivalent):
    - windows are HASHED (``hash60``) before the shuffle — 8 bytes per
      window on the wire instead of ~50 chars, at a collision risk of
      2^-60 per pair (collisions only ever over-mark, never corrupt);
    - duplicated-window detection is ONE map-side-combined groupBy on the
      hash — never a self-join of the window stream;
    - covered-position reassembly is doc-keyed: ``collect_set`` of covered
      positions is bounded by document length (same bound as a MinHash
      signature row), then a single in-row ``filter``/``transform``
      rebuilds the cleaned text with no further shuffle;
    - total: 3 exchanges (window-hash agg, candidate join-back, doc
      regroup) + 1 doc-keyed join, each on a uniformly-hashed key — no
      global sort, no driver collect, linear in corpus size.
    """
    docs = fan_out(table(spark, sf_dir, "documents"))
    base = docs.select("doc_id", tokens("text").alias("w"))
    n_starts = F.size("w") - (_NGRAM_N - 1)
    g = (
        base.where(n_starts >= 1)
        .select("doc_id", "w", F.explode(F.sequence(F.lit(1), n_starts)).alias("s"))
        .select(
            "doc_id",
            "s",
            hash60(F.concat_ws(" ", F.slice("w", F.col("s"), _NGRAM_N))).alias("h"),
        )
    )
    dup = (
        g.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("_nd"))
        .where(F.col("_nd") >= 2)
        .select("h")
    )
    cov = (
        g.join(dup, "h")
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("s"), F.col("s") + (_NGRAM_N - 1))).alias("p"),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("p").alias("_cov"))
    )
    joined = base.join(cov, "doc_id", "left")
    covc = F.coalesce(F.col("_cov"), F.array().cast("array<int>"))
    keep = F.filter(
        F.sequence(F.lit(1), F.size("w")),
        lambda p: ~F.array_contains(covc, p),
    )
    return joined.select(
        "doc_id",
        F.size("w").cast("int").alias("n_tokens"),
        F.coalesce(F.size("_cov"), F.lit(0)).cast("int").alias("n_dup_tokens"),
        (F.coalesce(F.size("_cov"), F.lit(0)).cast("double")
         / F.size("w").cast("double")).alias("dup_frac"),
        F.concat_ws(
            " ", F.transform(keep, lambda p: F.element_at(F.col("w"), p))
        ).alias("clean_text"),
    )


_CORPUS_NGRAM_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
g AS (
  SELECT doc_id, s,
         {hash60_sql(f"array_to_string(w[s:s+{_NGRAM_N - 1}], ' ')")} AS h
  FROM t, unnest(range(1, len(w) - {_NGRAM_N - 2})) AS u(s)
),
dup AS (
  SELECT h FROM g GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
),
cov AS (
  SELECT DISTINCT doc_id, s + i AS p
  FROM g JOIN dup USING (h), unnest(range(0, {_NGRAM_N})) AS r(i)
),
ca AS (
  SELECT doc_id, list(p) AS cl, COUNT(*) AS n_dup FROM cov GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(len(w) AS INT) AS n_tokens,
       CAST(COALESCE(ca.n_dup, 0) AS INT) AS n_dup_tokens,
       CAST(COALESCE(ca.n_dup, 0) AS DOUBLE) / CAST(len(w) AS DOUBLE) AS dup_frac,
       COALESCE(array_to_string(
         list_transform(
           list_filter(range(1, len(w) + 1),
                       p -> ca.cl IS NULL OR NOT list_contains(ca.cl, p)),
           p -> w[p]),
         ' '), '') AS clean_text
FROM t LEFT JOIN ca USING (doc_id)
"""


# --------------------------------------------------------------------------
# dataset split assignment: deterministic, disjoint train/val/test
# --------------------------------------------------------------------------

#: bucket boundaries out of 100: < 90 train, < 95 val, rest test
_SPLIT_TRAIN_END = 90
_SPLIT_VAL_END = 95


def split_label(doc_id_col: F.Column) -> F.Column:
    """The deterministic train/val/test label for a document id — the ONE
    bucket-hash + boundary rule, shared by `q_dataset_split` and the
    prep-chain capstone so the two can never assign a doc to different
    splits (eval-set contamination with no failing test)."""
    bucket = F.pmod(
        hash60(F.concat(F.lit("split:"), doc_id_col.cast("string"))),
        F.lit(100),
    )
    return (
        F.when(bucket < _SPLIT_TRAIN_END, F.lit("train"))
        .when(bucket < _SPLIT_VAL_END, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split assignment: every document draws
    a stable 0-99 bucket from md5(doc_id) and lands in exactly one split
    (90/5/5) — the DISJOINT-partition counterpart of q_stratified_sample's
    quota sampling. Keying the hash on doc_id (not position or load order)
    keeps membership stable under re-ingestion, repartitioning, and corpus
    growth: a doc never migrates between splits, so eval sets stay
    uncontaminated as the corpus is re-built — the property a
    training-data pipeline actually needs from its splitter.

    Output is the per-(source, split) audit: doc count, token mass, and a
    doc_id checksum so two pipeline runs can be diffed cheaply.

    Plan: the bucket and split label are map-side expressions on the scan;
    ONE aggregation shuffle on (source, split) with map-side combine —
    nothing else moves. At 100 TB the split column is written back
    partitioned-by-split; the assignment itself never shuffles.
    """
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(
            "source",
            split_label(F.col("doc_id")).alias("split"),
            "doc_id",
            token_count("text").cast("bigint").alias("n_tok"),
        )
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.sum("doc_id").alias("doc_checksum"),
        )
    )


_SPLIT_BUCKET = (
    hash60_sql("concat('split:', CAST(doc_id AS VARCHAR))") + " % 100"
)

_DATASET_SPLIT_SQL = f"""
SELECT source,
       CASE WHEN {_SPLIT_BUCKET} < {_SPLIT_TRAIN_END} THEN 'train'
            WHEN {_SPLIT_BUCKET} < {_SPLIT_VAL_END} THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
       CAST(SUM(doc_id) AS BIGINT) AS doc_checksum
FROM documents
GROUP BY 1, 2
"""

_PPLX_SQL = _PPLX_SQL_T.format(
    split_bucket=_SPLIT_BUCKET,
    train_end=_SPLIT_TRAIN_END,
    val_end=_SPLIT_VAL_END,
)


# --------------------------------------------------------------------------
# fuzzy record linkage: FastSS deletion-neighborhood blocking + verify
# --------------------------------------------------------------------------

#: deletion-variant document-frequency cap — the same Zipf-head guard as
#: the n-gram df cap: a variant shared by more than this many records is
#: dropped from blocking (its pairs, if real, surface through the other
#: 18 variants of each name), bounding join output per variant.
FUZZY_DF_CAP = 64


def q_fuzzy_dedup_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy record linkage over customer names: all pairs within
    Levenshtein distance 1, found via FastSS deletion-neighborhood
    blocking (Bocek et al. 2007): two strings are within edit distance 1
    iff their {self} ∪ {one-char-deleted} variant sets intersect, so
    candidate generation is an EQUI-join on a variant hash — never an
    all-pairs scan — and the exact ``levenshtein`` verify (built-in in
    both engines) runs only on blocked candidates.

    Scale design: variants are generated in-row (explode of a
    length-bounded sequence), hashed to 60-bit ints before the shuffle
    (8 bytes on the wire), and hot variants above FUZZY_DF_CAP are
    dropped via a map-side-combined count + broadcast anti-join — the
    ngram_jaccard df-cap pattern — so no variant can pair quadratically.
    Candidate pairs dedupe on (a, b) before the verify. The oracle
    mirrors blocking, cap, and verify bit-exactly.

    r18 (guide §2.3/§2.4): the variant table is INTEGER-ONLY — ``c_name``
    is dropped before the dedup shuffle (it is functionally determined by
    ``c_custkey``, so the distinct and the pair set are unchanged) and
    re-attached per pair side by an equi-join on the key AFTER the pair
    dedup, so every wide stage (variant distinct, pair self-join, pair
    distinct) moves two bigints instead of carrying name strings. The
    variant table is also localCheckpoint-fenced: it feeds three
    consumers (the hot-variant count and both self-join sides), and the
    un-fenced plan replayed the explode+distinct per consumer (measured
    5.9 s → the fence plus integer pairs cut it to ~1.5 s at sf0.1).
    """
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    variant = F.expr(
        "CASE WHEN i = 0 THEN c_name "
        "ELSE concat(substring(c_name, 1, i-1), substring(c_name, i+1, 1000)) "
        "END"
    )
    v = (
        cust.select(
            "c_custkey",
            "c_name",
            F.explode(F.sequence(F.lit(0), F.length("c_name"))).alias("i"),
        )
        .select(
            "c_custkey",
            hash60(variant).alias("vh"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    hot = (
        v.groupBy("vh")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > FUZZY_DF_CAP)
        .select("vh")
    )
    blocked = v.join(F.broadcast(hot), "vh", "left_anti")
    a, b = blocked.alias("a"), blocked.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.vh") == F.col("b.vh"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .select(
            F.col("a.c_custkey").alias("cust_a"),
            F.col("b.c_custkey").alias("cust_b"),
        )
        .distinct()
    )
    names_a = cust.select(
        F.col("c_custkey").alias("cust_a"), F.col("c_name").alias("name_a")
    )
    names_b = cust.select(
        F.col("c_custkey").alias("cust_b"), F.col("c_name").alias("name_b")
    )
    return (
        cands.join(names_a, "cust_a")
        .join(names_b, "cust_b")
        .select(
            "cust_a",
            "cust_b",
            F.levenshtein("name_a", "name_b").cast("int").alias("edit_dist"),
        )
        .where(F.col("edit_dist") <= 1)
    )


_FUZZY_VARIANT = (
    "CASE WHEN i = 0 THEN c_name "
    "ELSE substr(c_name, 1, i-1) || substr(c_name, i+1) END"
)

_FUZZY_SQL = f"""
WITH v AS (
  SELECT DISTINCT c_custkey, c_name,
         {hash60_sql(_FUZZY_VARIANT)} AS vh
  FROM customer, UNNEST(generate_series(0, length(c_name))) AS t(i)
),
hot AS (
  SELECT vh FROM v GROUP BY vh HAVING COUNT(*) > {FUZZY_DF_CAP}
),
blocked AS (
  SELECT * FROM v WHERE vh NOT IN (SELECT vh FROM hot)
),
cands AS (
  SELECT DISTINCT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
                  a.c_name AS name_a, b.c_name AS name_b
  FROM blocked a JOIN blocked b
    ON a.vh = b.vh AND a.c_custkey < b.c_custkey
)
SELECT cust_a, cust_b,
       CAST(levenshtein(name_a, name_b) AS INT) AS edit_dist
FROM cands
WHERE levenshtein(name_a, name_b) <= 1
"""


#: Feature-hashing dimensionality (the hashing trick's bucket count).
FH_DIM = 64


def q_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (Weinberger et al. 2009, public): token streams →
    fixed-``FH_DIM``-dimensional SIGNED count features without a
    vocabulary pass. Bucket = ``hash60(token) mod FH_DIM``; the sign comes
    from the next hash bit, so colliding tokens cancel in expectation
    instead of biasing the bucket upward — the property that makes hashed
    features usable by a downstream linear model.

    Scale shape: pure map-side explode→project (no vocabulary table, no
    df join — that's the trick's entire point vs. a count-vectorizer),
    then ONE aggregation keyed (doc_id, bucket) with map-side combine;
    output is the sparse (nonzero) feature triplet form. Everything is
    integer (md5-derived hash, ±1 signs, integer sums) → bit-stable
    across engines and partitionings.
    """
    docs = fan_out(table(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id",
        F.explode(F.split(ascii_lower(F.col("text")), " ")).alias("t"),
    )
    h = tok.select("doc_id", hash60(F.col("t")).alias("h"))
    feats = (
        h.select(
            "doc_id",
            F.expr(f"h % {FH_DIM}").alias("bucket"),
            F.expr(f"1 - 2 * ((h div {FH_DIM}) % 2)").alias("sgn"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.sum("sgn").cast("bigint").alias("feat_val"))
        .where(F.col("feat_val") != 0)
    )
    return feats


_FEATURE_HASHING_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')) AS t FROM documents
),
h AS (SELECT doc_id, {hash60_sql('t')} AS h FROM tok)
SELECT doc_id, h % {FH_DIM} AS bucket,
       CAST(SUM(1 - 2 * ((h // {FH_DIM}) % 2)) AS BIGINT) AS feat_val
FROM h
GROUP BY 1, 2
HAVING CAST(SUM(1 - 2 * ((h // {FH_DIM}) % 2)) AS BIGINT) != 0
"""


#: Nucleus (top-p) retention share, in percent, for q_group_top_p.
TOP_P_PCT = 80


def q_group_top_p(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-nucleus curation (top-p per source): within each source,
    keep the highest-quality documents until they account for
    ``TOP_P_PCT`` % of the source's total quality mass — the
    quality-weighted downsampling step of a pretraining mix (better than
    a fixed top-k because prolific low-quality sources shrink more).

    All-integer lineage: the quality heuristic collapses to ppm —
    ``(1e6·(n_distinct + n_tok − n_stop)) div (2·n_tok)`` (the
    `text_quality_score` formula cleared of its two divisions) — and the
    nucleus test is the cross-multiplied ``100·cum_before < p·total`` on
    exact BIGINTs: no division anywhere, so no rounding boundary exists
    to disagree across engines. Ordering ties break on doc_id (total
    order).

    Scale shape: scoring is pure per-row codegen on the scan; the
    cumulative window sorts each SOURCE's doc-level rows (already one row
    per doc — never token rows). At extreme per-source cardinality the
    documented fallback is an approx-quantile score threshold per source
    (the `rfm_segmentation` note) — same selection, no sort.
    """
    docs = fan_out(table(spark, sf_dir, "documents"))
    w = tokens("text")
    scored = docs.select(
        "source",
        "doc_id",
        F.size(F.array_distinct(w)).cast("bigint").alias("n_distinct"),
        F.size(w).cast("bigint").alias("n_tok"),
        stopword_count("text").cast("bigint").alias("n_stop"),
    ).select(
        "source",
        "doc_id",
        F.expr(
            "(1000000 * (n_distinct + n_tok - n_stop)) div (2 * n_tok)"
        ).alias("score_ppm"),
    )
    order = [F.col("score_ppm").desc(), F.col("doc_id")]
    cum_w = (
        Window.partitionBy("source").orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tot_w = Window.partitionBy("source")
    st = scored.select(
        "source",
        "doc_id",
        "score_ppm",
        F.coalesce(F.sum("score_ppm").over(cum_w), F.lit(0))
        .cast("bigint").alias("cum_before"),
        F.sum("score_ppm").over(tot_w).cast("bigint").alias("total"),
    )
    return st.where(
        F.lit(100) * F.col("cum_before") < F.lit(TOP_P_PCT) * F.col("total")
    ).select("source", "doc_id", "score_ppm")


_GROUP_TOP_P_SQL = f"""
WITH scored AS (
  SELECT source, doc_id,
         (1000000 * (CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
                     + CAST(len(string_split(text, ' ')) AS BIGINT)
                     - CAST({stopword_count_sql('text')} AS BIGINT)))
           // (2 * CAST(len(string_split(text, ' ')) AS BIGINT)) AS score_ppm
  FROM documents
),
st AS (
  SELECT source, doc_id, score_ppm,
         CAST(COALESCE(SUM(score_ppm) OVER (
           PARTITION BY source ORDER BY score_ppm DESC, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_before,
         CAST(SUM(score_ppm) OVER (PARTITION BY source) AS BIGINT) AS total
  FROM scored
)
SELECT source, doc_id, score_ppm
FROM st
WHERE 100 * cum_before < {TOP_P_PCT} * total
"""


def q_corpus_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end pretraining-corpus prep chain as ONE plan: Gopher
    quality gate → exact dedup (canonical = min doc_id per text hash,
    among gate survivors) → deterministic train/val/test assignment →
    per-source waterfall + split audit. This is the capstone
    composition: a user runs the whole prep as a single query and gets
    the filter-ablation table (how many docs each stage dropped) plus
    the final split masses — the artifact a data-curation review reads.

    Reuses the proven stages verbatim: `retrieval.quality_flags` (the
    gate builder shared with the batch query and the streaming gate),
    `hash60` content hashing (the `dedup_exact_docs` key), and the
    `dataset_split_assign` bucket hash — so each stage's semantics stay
    pinned by its own oracle while this query pins their composition.

    Scale shape: the gate and both hashes are map-side on one scan; the
    dedup canonicalization is ONE window over the content-hash
    partitioning (survivors only); every stage count is a conditional
    aggregate in a SINGLE groupBy(source) — the waterfall costs one
    shuffle more than the dedup itself.
    """
    return corpus_prep_report(table(spark, sf_dir, "documents"))


def corpus_prep_report(docs: DataFrame) -> DataFrame:
    """The pipeline body over any (doc_id, source, text, ...) frame —
    factored out so tests can feed synthetic corpora (the driver fixture
    contains no exact-dup texts, so the dedup stage's drop branch is
    proven on constructed input; see tests/test_pipeline_ops.py)."""
    from tfm_taxitrips_spark.queries.retrieval import quality_flags

    flagged = quality_flags(docs, carry=("source", "text")).select(
        "doc_id", "source", "text", "keep"
    )
    # rejected docs get a unique synthetic key (-doc_id-1) so they never
    # funnel into one NULL-hash window partition — a skew hazard at scale
    h = hash60(F.col("text"))
    w = Window.partitionBy("th").orderBy("doc_id")
    staged = (
        flagged.withColumn(
            "th", F.when(F.col("keep"), h).otherwise(-F.col("doc_id") - 1)
        )
        .withColumn(
            "canon",
            F.when(F.col("keep"),
                   F.row_number().over(w) == 1).otherwise(F.lit(False)),
        )
    )
    final = F.col("keep") & F.col("canon")
    return (
        staged.select(
            "source",
            "keep",
            "canon",
            split_label(F.col("doc_id")).alias("split"),
            token_count("text").cast("bigint").alias("n_tok"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_raw"),
            F.count(F.when(F.col("keep"), 1)).cast("bigint")
            .alias("n_quality"),
            F.count(F.when(final, 1)).cast("bigint").alias("n_dedup"),
            F.count(F.when(final & (F.col("split") == "train"), 1))
            .cast("bigint").alias("n_train"),
            F.count(F.when(final & (F.col("split") == "val"), 1))
            .cast("bigint").alias("n_val"),
            F.count(F.when(final & (F.col("split") == "test"), 1))
            .cast("bigint").alias("n_test"),
            F.sum(F.when(final, F.col("n_tok")).otherwise(F.lit(0)))
            .cast("bigint").alias("tok_final"),
        )
    )


def _corpus_prep_sql() -> str:
    from tfm_taxitrips_spark.queries.retrieval import (
        MAX_MEAN_WORD_LEN,
        MAX_STOP_RATIO,
        MAX_WORDS,
        MIN_MEAN_WORD_LEN,
        MIN_WORDS,
        _STOP_LIST,
    )

    return f"""
WITH sig AS (
  SELECT doc_id, source, text,
         len(string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')) AS n_words,
         len(list_filter(string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' '),
                         t -> t IN ({_STOP_LIST}))) AS n_stop,
         length(text) AS n_chars
  FROM documents
),
flagged AS (
  SELECT doc_id, source, text,
         (n_words >= {MIN_WORDS} AND n_words <= {MAX_WORDS}
          AND CAST(n_chars - (n_words - 1) AS DOUBLE) / n_words
                >= {MIN_MEAN_WORD_LEN}
          AND CAST(n_chars - (n_words - 1) AS DOUBLE) / n_words
                <= {MAX_MEAN_WORD_LEN}
          AND CAST(n_stop AS DOUBLE) / n_words <= {MAX_STOP_RATIO}) AS keep
  FROM sig
),
staged AS (
  SELECT *,
         CASE WHEN keep THEN
           ROW_NUMBER() OVER (
             PARTITION BY CASE WHEN keep THEN {hash60_sql('text')}
                          ELSE -doc_id - 1 END
             ORDER BY doc_id) = 1
         ELSE FALSE END AS canon,
         CASE
           WHEN {hash60_sql("concat('split:', CAST(doc_id AS VARCHAR))")}
                % 100 < {_SPLIT_TRAIN_END} THEN 'train'
           WHEN {hash60_sql("concat('split:', CAST(doc_id AS VARCHAR))")}
                % 100 < {_SPLIT_VAL_END} THEN 'val'
           ELSE 'test' END AS split,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM flagged
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_raw,
       CAST(COUNT(*) FILTER (WHERE keep) AS BIGINT) AS n_quality,
       CAST(COUNT(*) FILTER (WHERE keep AND canon) AS BIGINT) AS n_dedup,
       CAST(COUNT(*) FILTER (WHERE keep AND canon AND split = 'train')
            AS BIGINT) AS n_train,
       CAST(COUNT(*) FILTER (WHERE keep AND canon AND split = 'val')
            AS BIGINT) AS n_val,
       CAST(COUNT(*) FILTER (WHERE keep AND canon AND split = 'test')
            AS BIGINT) AS n_test,
       CAST(COALESCE(SUM(n_tok) FILTER (WHERE keep AND canon), 0) AS BIGINT)
         AS tok_final
FROM staged GROUP BY 1
"""


# --------------------------------------------------------------------------
# snapshot reconciliation: classify added / removed / changed / unchanged
# --------------------------------------------------------------------------


def _snap_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = F.pmod(
        hash60(F.concat(F.lit("snap:"), F.col("o_orderkey").cast("string"))),
        F.lit(10),
    )
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        h.alias("_h"),
    )


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation report — classify every key across two
    table versions as added / removed / changed / unchanged and emit
    per-class row counts with an order-independent key checksum. The
    read side of the merge family: :func:`q_incremental_merge` applies a
    delta, :func:`q_cdc_apply` replays a log; this op *derives* the delta
    two full snapshots imply (the backfill-audit / replica-drift primitive,
    pairing with :func:`q_table_fingerprint` — the fingerprint tells you
    THAT replicas diverged, the diff tells you WHERE).

    The "new" snapshot is synthesized deterministically from ``orders``
    (hash-gated: 1/10 of keys deleted, 1/10 payload-mutated, 1/10 re-keyed
    as inserts shifted past the OBSERVED max key — a 1-row broadcast, so
    insert keys cannot collide with live keys at any SF), so all four
    classes occur at any scale.

    Scale shape: ONE full-outer shuffle join on the primary key — both
    sides big, so this is the honest co-partitioned merge (bucket both
    snapshots on the key at 100 TB and the exchange disappears); the
    classification is a map-side CASE over the joined row, and the output
    collapses to 4 rows via a map-side-combined aggregate. Payload
    comparison happens in DECIMAL, never raw double. At 100 TB you'd
    first prune unchanged partitions with per-partition fingerprints and
    full-outer-join only the partitions whose fingerprints differ.
    """
    base = _snap_base(spark, sf_dir)
    old = base.select("o_orderkey", "o_orderstatus", "price",
                      F.lit(1).alias("_o"))
    mut = F.col("_h") == 1
    new = (
        base.where(F.col("_h") != 0)
        .select(
            "o_orderkey",
            F.when(mut, F.concat(F.lit("X"), F.col("o_orderstatus")))
            .otherwise(F.col("o_orderstatus")).alias("n_status"),
            F.when(mut, F.col("price") + F.lit(1).cast("decimal(18,2)"))
            .otherwise(F.col("price")).cast("decimal(19,2)").alias("n_price"),
        )
        .unionByName(
            base.where(F.col("_h") == 2)
            .crossJoin(F.broadcast(
                base.agg((F.max("o_orderkey") + 1).alias("_shift"))
            ))
            .select(
                (F.col("o_orderkey") + F.col("_shift")).alias("o_orderkey"),
                F.col("o_orderstatus").alias("n_status"),
                F.col("price").cast("decimal(19,2)").alias("n_price"),
            )
        )
        .withColumn("_n", F.lit(1))
    )
    joined = old.join(new, "o_orderkey", "full_outer")
    classified = joined.select(
        "o_orderkey",
        F.when(F.col("_o").isNull(), F.lit("added"))
        .when(F.col("_n").isNull(), F.lit("removed"))
        .when(
            (F.col("o_orderstatus") != F.col("n_status"))
            | (F.col("price").cast("decimal(19,2)") != F.col("n_price")),
            F.lit("changed"),
        )
        .otherwise(F.lit("unchanged"))
        .alias("diff_class"),
    )
    return classified.groupBy("diff_class").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.bit_xor(hash60(F.col("o_orderkey").cast("string")))
        .alias("key_checksum"),
    )


_SNAP_HASH = hash60_sql("concat('snap:', CAST(o_orderkey AS VARCHAR))")

_SNAPSHOT_DIFF_SQL = f"""
WITH base AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price,
         {_SNAP_HASH} % 10 AS h
  FROM orders
),
new AS (
  SELECT o_orderkey,
         CASE WHEN h = 1 THEN 'X' || o_orderstatus
              ELSE o_orderstatus END AS n_status,
         CAST(CASE WHEN h = 1 THEN price + CAST(1 AS DECIMAL(18,2))
              ELSE price END AS DECIMAL(19,2)) AS n_price
  FROM base WHERE h <> 0
  UNION ALL
  SELECT o_orderkey + (SELECT MAX(o_orderkey) + 1 FROM orders),
         o_orderstatus, CAST(price AS DECIMAL(19,2))
  FROM base WHERE h = 2
),
d AS (
  SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS k,
         CASE WHEN o.o_orderkey IS NULL THEN 'added'
              WHEN n.o_orderkey IS NULL THEN 'removed'
              WHEN o.o_orderstatus <> n.n_status
                   OR CAST(o.price AS DECIMAL(19,2)) <> n.n_price
                THEN 'changed'
              ELSE 'unchanged' END AS diff_class
  FROM base o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
)
SELECT diff_class, CAST(COUNT(*) AS BIGINT) AS n_rows,
       bit_xor({hash60_sql("CAST(k AS VARCHAR)")}) AS key_checksum
FROM d GROUP BY 1
"""


# --------------------------------------------------------------------------
# k-anonymity suppression over a generalization ladder
# --------------------------------------------------------------------------

_KANON_K = 5


def q_k_anonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity grouping over customer quasi-identifiers with a
    generalization ladder — the privacy gate a training-data pipeline
    runs before releasing per-group statistics. Level 0 keeps
    (nation, market segment) groups with at least k={_k} members; records
    in smaller groups generalize to level 1 (nation only); nations still
    under k collapse into one suppressed bucket (level 2) rather than leak
    a small-group count. Emits (level, quasi-ids, n_rows) — every
    non-suppressed row is guaranteed n_rows >= k by construction.

    Scale shape: one scan, one map-side-combined exchange on the level-0
    quasi-id pair; everything after operates on GROUP counts (bounded by
    |nations| x |segments|, never by |customers|), so the ladder re-aggs
    are driver-free single-row-ish plans. No window, no join. The
    collapsed level-0 relation is materialized ONCE via lazy
    ``localCheckpoint`` — three ladder branches read it, and without the
    checkpoint each branch would replay the customer scan.
    """
    k = F.lit(_KANON_K)
    g0 = (
        table(spark, sf_dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
        .localCheckpoint(eager=False)
    )
    lvl0 = g0.where(F.col("n_rows") >= k).select(
        F.lit(0).alias("level"), "c_nationkey", "c_mktsegment", "n_rows"
    )
    g1 = (
        g0.where(F.col("n_rows") < k)
        .groupBy("c_nationkey")
        .agg(F.sum("n_rows").cast("bigint").alias("n_rows"))
    )
    lvl1 = g1.where(F.col("n_rows") >= k).select(
        F.lit(1).alias("level"), "c_nationkey",
        F.lit(None).cast("string").alias("c_mktsegment"), "n_rows",
    )
    lvl2 = (
        g1.where(F.col("n_rows") < k)
        .agg(F.sum("n_rows").cast("bigint").alias("n_rows"))
        .where(F.col("n_rows").isNotNull())
        .select(
            F.lit(2).alias("level"),
            F.lit(None).cast("bigint").alias("c_nationkey"),
            F.lit(None).cast("string").alias("c_mktsegment"), "n_rows",
        )
    )
    return lvl0.unionByName(lvl1).unionByName(lvl2)


if q_k_anonymize.__doc__:  # absent under python -OO
    q_k_anonymize.__doc__ = q_k_anonymize.__doc__.replace(
        "{_k}", str(_KANON_K))

_K_ANONYMIZE_SQL = f"""
WITH g0 AS (
  SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM customer GROUP BY 1, 2
),
g1 AS (
  SELECT c_nationkey, CAST(SUM(n_rows) AS BIGINT) AS n_rows
  FROM g0 WHERE n_rows < {_KANON_K} GROUP BY 1
)
SELECT 0 AS level, c_nationkey, c_mktsegment, n_rows
FROM g0 WHERE n_rows >= {_KANON_K}
UNION ALL
SELECT 1, c_nationkey, NULL, n_rows FROM g1 WHERE n_rows >= {_KANON_K}
UNION ALL
SELECT 2, NULL, NULL, CAST(SUM(n_rows) AS BIGINT)
FROM g1 WHERE n_rows < {_KANON_K}
HAVING SUM(n_rows) IS NOT NULL
"""


# --------------------------------------------------------------------------
# token-budget corpus sampling via a distributed two-phase prefix sum
# --------------------------------------------------------------------------

_MIX_BUCKETS = 16
_MIX_BUCKET_SPAN = (1 << 60) // _MIX_BUCKETS  # priority domain / buckets


def q_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus sampling: per source, admit documents in
    deterministic hash-priority order until 1/4 of the source's tokens
    are selected — the TOKEN-weighted companion to
    :func:`q_corpus_mix_rebalance` (training mixes are token budgets, not
    doc counts). Greedy boundary convention matches
    :func:`q_sequence_packing`: a doc is admitted iff the tokens BEFORE
    it are under budget, so the last pack may overflow by one doc.

    The interesting part is HOW the running total is computed. A naive
    per-source window is one sort per source — and a source is exactly
    the kind of key that goes hot (half of 100 TB can be one crawl).
    This rides
    :func:`~tfm_taxitrips_spark.operators.prefix.two_phase_prefix_sum`
    instead: the 60-bit priority domain splits into {nb} contiguous
    ranges, per-(source, range) token sums collapse map-side into a
    |sources|×{nb} relation whose prefix offsets come from a window over
    THAT tiny relation, and each (source, range) partition computes its
    local running total independently plus the broadcast offset. The
    heavy window's partition key gains {nb}× the parallelism, the global
    sort never happens, and the per-range local sort is AQE-splittable.
    The oracle states the naive one-window-per-source form — the
    differential proves the rewrite exactly.
    """
    docs = table(spark, sf_dir, "documents")
    pr = hash60(F.concat(F.lit("mix:"), F.col("doc_id").cast("string")))
    base = (
        docs.select(
            "source", "doc_id", pr.alias("pr"),
            token_count("text").cast("bigint").alias("nt"),
        )
        # integer div — a float division would lose 60-bit precision
        .withColumn("rng", F.expr(f"pr div {_MIX_BUCKET_SPAN}"))
        .localCheckpoint(eager=False)
    )
    budgets = base.groupBy("source").agg(
        F.expr("sum(nt) div 4").alias("budget"),
        F.sum("nt").alias("tok_total"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    with_before = two_phase_prefix_sum(
        base, partition_cols=("source",), bucket_col="rng",
        order_cols=("pr", "doc_id"), val_col="nt", out_col="before",
        inclusive=False,
    )
    sel = with_before.join(F.broadcast(budgets), "source").where(
        F.col("before") < F.col("budget"))
    return sel.groupBy("source").agg(
        F.max("n_docs").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_selected"),
        F.max("tok_total").cast("bigint").alias("tok_total"),
        F.max("budget").cast("bigint").alias("tok_budget"),
        F.sum("nt").cast("bigint").alias("tok_selected"),
    )


_MIX_PR = hash60_sql("concat('mix:', CAST(doc_id AS VARCHAR))")

_TOKEN_BUDGET_SQL = f"""
WITH base AS (
  SELECT source, doc_id, {_MIX_PR} AS pr,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
  FROM documents
),
cum AS (
  SELECT source, doc_id, nt,
         COALESCE(SUM(nt) OVER (PARTITION BY source ORDER BY pr, doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS before
  FROM base
),
tot AS (
  SELECT source, CAST(SUM(nt) AS BIGINT) // 4 AS budget,
         CAST(SUM(nt) AS BIGINT) AS tok_total,
         CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM base GROUP BY 1
)
SELECT c.source, MAX(t.n_docs) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_selected,
       MAX(t.tok_total) AS tok_total,
       MAX(t.budget) AS tok_budget,
       CAST(SUM(c.nt) AS BIGINT) AS tok_selected
FROM cum c JOIN tot t USING (source)
WHERE c.before < t.budget
GROUP BY 1
"""

if q_token_budget_mix.__doc__:  # absent under python -OO
    q_token_budget_mix.__doc__ = q_token_budget_mix.__doc__.replace(
        "{nb}", str(_MIX_BUCKETS))


def q_dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship merge (the MDM "golden record"): near-dup clusters
    don't just pick ONE surviving row (:func:`q_dedup_cluster_canonical`
    does that) — each golden field follows its own rule, combined across
    the cluster: anchor id = MIN member, text provenance = LONGEST
    member (ties to the smaller id), language = MAJORITY vote (ties to
    the lexicographically smallest), completeness = MAX length.
    Singleton documents are their own golden record, so the output
    covers the whole corpus.

    Scale shape: clusters come from the proven LSH→connected-components
    path; field rules are per-cluster windows/aggregates with TOTAL
    tie-break orders (deterministic under any shuffle). The two
    row_number windows partition by cluster — near-dup clusters are
    small by construction (LSH buckets are salted/bounded upstream), so
    no window partition scales with the corpus; the three collapsed
    relations join back on the cluster key.
    """
    docs = table(spark, sf_dir, "documents")
    comp = q_dedup_cluster_canonical(spark, sf_dir).select(
        "doc_id", "cluster_id")
    base = docs.join(comp, "doc_id", "left").select(
        F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
        "doc_id", "lang", "n_chars",
    )
    # r19 (guide §1.2/§2.4): every field rule is an argmax/argmin over a
    # TOTAL order, so the whole golden record collapses to TWO stacked
    # aggregations over ONE consumer of ``base`` — no fence, no
    # row_number windows, no join-backs. Level 1 groups by
    # (cluster, lang) and carries each group's partial stats; level 2
    # re-aggregates per cluster. Tie-breaks are encoded in struct
    # extrema exactly as the old windows ordered:
    # - longest:  max(struct(n_chars, -doc_id)) — largest n_chars, then
    #   smallest doc_id; NULL n_chars sorts below any value (the old
    #   DESC put NULLs last), and an all-NULL cluster falls back to the
    #   smallest doc_id via the negated id field.
    # - majority: min(struct(-c, lang)) — largest count, then
    #   lexicographically smallest lang with NULL FIRST (the old
    #   window's ASC null ordering; struct comparison sorts a NULL
    #   field before any value).
    lvl1 = base.groupBy("cluster_id", "lang").agg(
        F.count(F.lit(1)).alias("_c"),
        F.min("doc_id").alias("_min_id"),
        F.max("n_chars").alias("_max_chars"),
        F.max(F.struct(F.col("n_chars").alias("nc"),
                       (-F.col("doc_id")).alias("nid"))).alias("_len"),
    )
    golden = lvl1.groupBy("cluster_id").agg(
        # coalesce keeps the column NON-NULL like the old count() form
        # (groups are non-empty, so the value is unchanged)
        F.coalesce(F.sum("_c"), F.lit(0)).cast("bigint").alias("n_members"),
        F.min("_min_id").alias("golden_doc_id"),
        F.max("_max_chars").cast("bigint").alias("max_chars"),
        (-F.max("_len")["nid"]).alias("longest_doc_id"),
        F.min(F.struct((-F.col("_c")).alias("nc"),
                       F.col("lang").alias("lang")))["lang"]
        .alias("majority_lang"),
    )
    return golden.select(
        "cluster_id", "n_members", "golden_doc_id", "max_chars",
        "longest_doc_id", "majority_lang",
    )


_SURVIVORSHIP_SQL = f"""
WITH RECURSIVE pairs AS ({_MINHASH_LSH_SQL}),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION
  SELECT doc_b AS u, doc_a AS v FROM pairs
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u AND e.v <> r.u
),
comp AS (
  SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_id FROM reach GROUP BY u
),
members AS (
  SELECT COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
         d.doc_id, d.lang, d.n_chars
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
),
main AS (
  SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members,
         MIN(doc_id) AS golden_doc_id,
         CAST(MAX(n_chars) AS BIGINT) AS max_chars
  FROM members GROUP BY 1
),
longest AS (
  SELECT cluster_id, doc_id AS longest_doc_id FROM (
    SELECT cluster_id, doc_id,
           ROW_NUMBER() OVER (PARTITION BY cluster_id
             ORDER BY n_chars DESC, doc_id ASC) AS rn
    FROM members) WHERE rn = 1
),
maj AS (
  SELECT cluster_id, lang AS majority_lang FROM (
    SELECT cluster_id, lang,
           ROW_NUMBER() OVER (PARTITION BY cluster_id
             ORDER BY COUNT(*) DESC, lang ASC) AS rn
    FROM members GROUP BY cluster_id, lang) WHERE rn = 1
)
SELECT m.cluster_id, m.n_members, m.golden_doc_id, l.longest_doc_id,
       j.majority_lang, m.max_chars
FROM main m JOIN longest l USING (cluster_id) JOIN maj j USING (cluster_id)
"""


def q_loo_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe categorical feature encoding: LEAVE-ONE-OUT mean
    target encoding of ``o_orderpriority`` against the binary target
    "order is fulfilled" (``o_orderstatus = 'F'``) — the standard
    high-cardinality-categorical encoder for tabular training data,
    where each row's own label is EXCLUDED from its encoding so the
    feature can't memorize the target (the leakage plain mean-encoding
    has).

    Within a category of n rows with s positives, LOO takes exactly TWO
    values — (s−1)/(n−1) on positive rows, s/(n−1) on negative rows — so
    the per-ROW encoding collapses losslessly to one row per (category,
    y) with its row count: the verification surface stays aggregate-
    sized while the math is the per-row encoder's.  Integer-exact:
    ``loo_enc_ppm = (10⁶·(s − y)) div (n − 1)``, no float in the
    lineage.

    Scale shape: ONE map-side-combined groupBy over the fact table
    (count + conditional count), then a width-2 explode of the
    aggregate-sized result — the same single-shuffle shape at any scale;
    the per-row encoded column would be a broadcast hash join of this
    tiny table back onto the facts.
    """
    orders = table(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows_cat"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
        .cast("bigint").alias("s_pos"),
    )
    per_y = agg.select(
        "o_orderpriority", "n_rows_cat", "s_pos",
        F.explode(F.array(F.lit(0).cast("bigint"),
                          F.lit(1).cast("bigint"))).alias("y"),
    ).withColumn(
        "n_rows",
        F.when(F.col("y") == 1, F.col("s_pos"))
        .otherwise(F.col("n_rows_cat") - F.col("s_pos")),
    )
    return (
        per_y.where(F.col("n_rows") > 0)
        .select(
            "o_orderpriority",
            "y",
            "n_rows",
            F.when(
                F.col("n_rows_cat") > 1,
                F.expr("(1000000 * (s_pos - y)) div (n_rows_cat - 1)"),
            ).cast("bigint").alias("loo_enc_ppm"),
        )
    )


_LOO_ENCODING_SQL = """
WITH agg AS (
  SELECT o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS n_rows_cat,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
           AS s_pos
  FROM orders GROUP BY 1
),
per_y AS (
  SELECT a.o_orderpriority, a.n_rows_cat, a.s_pos, y.y,
         CASE WHEN y.y = 1 THEN a.s_pos ELSE a.n_rows_cat - a.s_pos END
           AS n_rows
  FROM agg a CROSS JOIN (SELECT CAST(0 AS BIGINT) AS y
                         UNION ALL SELECT CAST(1 AS BIGINT)) y
)
SELECT o_orderpriority, y, n_rows,
       CASE WHEN n_rows_cat > 1
            THEN CAST((1000000 * (s_pos - y)) // (n_rows_cat - 1) AS BIGINT)
       END AS loo_enc_ppm
FROM per_y WHERE n_rows > 0
"""


# --------------------------------------------------------------------------
# k-fold exchangeability audit: per-fold label-distribution drift
# --------------------------------------------------------------------------

def q_kfold_label_balance_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-fold exchangeability audit — the k-fold family's completion
    (r10 shortlist, landed r12): for each of the ``stratified_kfold_assign``
    folds (SAME fold hash, SAME k), the total-variation distance between
    the fold's per-source distribution and the GLOBAL per-source
    distribution, for BOTH doc counts and token mass. If the folds are
    exchangeable these drifts sit near zero; a fold whose source mix has
    drifted invalidates every per-fold metric a CV harness reads, which
    is why this gate runs before the folds are trusted, not after a
    model disagrees.

    Integer-exact via `source_token_tvd`'s cross-multiplication: with
    fold cells c_{f,s} (fold total N_f) against global C_s (total N),
    ``doc_tvd_ppm = (10⁶·Σ_s |c·N − C_s·N_f|) div (2·N_f·N)`` — the ½ is
    inside the denominator, no float anywhere. Products route through
    DECIMAL(38,0) (c·N ≈ 10²² at 100 TB doc counts, 10²⁸ for token
    mass — both overflow BIGINT, both fit 38 digits with the 10⁶
    scaling). Stated contracts: NULL text counts 0 tokens (COALESCE in
    both engines — `data_contract_audit` owns flagging it); a NULL
    source is a REAL stratum (null-safe grid join, the r10 k-fold
    lesson); an EMPTY fold (possible only on a corpus smaller than k
    effective hash buckets) reports explicit-NULL drift via
    ``NULLIF(2·N_f·N, 0)``, never a div-by-zero accident.

    Scale shape: fold and token count are map-side expressions on the
    ONE corpus scan; a single (source, fold) groupBy with map-side
    combine collapses everything to a |sources|·k matrix, checkpointed
    once. The source×fold grid, the per-source/per-fold/global totals,
    and every join after that collapse are aggregate-sized (broadcast;
    the `stratified_kfold_assign` pattern). Output is k rows.
    """
    docs = table(spark, sf_dir, "documents")
    fold = F.pmod(
        hash60(F.concat(F.lit("fold:"), F.col("doc_id").cast("string"))),
        F.lit(_KFOLD_K),
    ).cast("int")
    zero = F.lit(0).cast("decimal(38,0)")
    m = (
        docs.select(
            "source",
            fold.alias("fold"),
            F.coalesce(token_count("text"), F.lit(0)).cast("bigint")
            .alias("nt"),
        )
        .groupBy("source", "fold")
        .agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("c"),
            F.sum("nt").cast("decimal(38,0)").alias("t"),
        )
        .localCheckpoint(eager=False)  # grid join + per-source totals
    )
    stot = (
        m.groupBy("source")
        .agg(F.sum("c").alias("cs"), F.sum("t").alias("ts"))
        .localCheckpoint(eager=False)  # grid spine + global totals
    )
    g = stot.agg(F.sum("cs").alias("n_all"), F.sum("ts").alias("t_all"))
    # full source × fold grid (|sources|·k rows — aggregate-sized cross
    # join), so a fold missing a source still contributes that source's
    # full global mass to the drift instead of silently vanishing
    grid = stot.crossJoin(
        spark.range(_KFOLD_K).select(F.col("id").cast("int").alias("fold")))
    cells = (
        grid.alias("g").join(
            F.broadcast(m).alias("m"),
            F.col("g.source").eqNullSafe(F.col("m.source"))
            & (F.col("g.fold") == F.col("m.fold")),
            "left",
        )
        .select(
            F.col("g.source").alias("source"), F.col("g.fold").alias("fold"),
            F.coalesce("m.c", zero).alias("c"),
            F.coalesce("m.t", zero).alias("t"),
            F.col("g.cs").alias("cs"), F.col("g.ts").alias("ts"),
        )
        .localCheckpoint(eager=False)  # fold totals + the drift sum
    )
    ftot = cells.groupBy("fold").agg(
        F.sum("c").alias("nf"), F.sum("t").alias("tf"))
    return (
        cells.join(F.broadcast(ftot), "fold")
        .crossJoin(F.broadcast(g))
        .groupBy("fold")
        .agg(
            F.sum(F.when(F.col("c") > 0, 1).otherwise(0)).cast("bigint")
            .alias("n_sources_present"),
            F.max("nf").alias("nf"), F.max("tf").alias("tf"),
            F.max("n_all").alias("n_all"), F.max("t_all").alias("t_all"),
            F.sum(F.abs(F.col("c") * F.col("n_all")
                        - F.col("cs") * F.col("nf"))).alias("dnum"),
            F.sum(F.abs(F.col("t") * F.col("t_all")
                        - F.col("ts") * F.col("tf"))).alias("tnum"),
        )
        .select(
            "fold",
            "n_sources_present",
            F.col("nf").cast("bigint").alias("n_docs"),
            F.col("tf").cast("bigint").alias("n_tokens"),
            F.expr("(1000000 * dnum) div nullif(2 * nf * n_all, 0)")
            .cast("bigint").alias("doc_tvd_ppm"),
            F.expr("(1000000 * tnum) div nullif(2 * tf * t_all, 0)")
            .cast("bigint").alias("tok_tvd_ppm"),
        )
    )


_KFOLD_DRIFT_SQL = f"""
WITH m AS (
  SELECT source,
         CAST({hash60_sql("concat('fold:', CAST(doc_id AS VARCHAR))")}
              % {_KFOLD_K} AS INT) AS fold,
         CAST(COUNT(*) AS HUGEINT) AS c,
         CAST(SUM(COALESCE(len(string_split(text, ' ')), 0)) AS HUGEINT) AS t
  FROM documents GROUP BY 1, 2
),
stot AS (SELECT source, SUM(c) AS cs, SUM(t) AS ts FROM m GROUP BY 1),
g AS (SELECT SUM(cs) AS n_all, SUM(ts) AS t_all FROM stot),
grid AS (
  SELECT s.source, s.cs, s.ts, CAST(f AS INT) AS fold
  FROM stot s CROSS JOIN (SELECT unnest(range({_KFOLD_K})) AS f)
),
cells AS (
  SELECT gr.source, gr.fold, gr.cs, gr.ts,
         COALESCE(m.c, 0) AS c, COALESCE(m.t, 0) AS t
  FROM grid gr LEFT JOIN m
    ON m.source IS NOT DISTINCT FROM gr.source AND m.fold = gr.fold
),
ftot AS (SELECT fold, SUM(c) AS nf, SUM(t) AS tf FROM cells GROUP BY 1)
SELECT c2.fold,
       CAST(SUM(CASE WHEN c2.c > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_sources_present,
       CAST(MAX(f.nf) AS BIGINT) AS n_docs,
       CAST(MAX(f.tf) AS BIGINT) AS n_tokens,
       CAST((1000000 * SUM(abs(c2.c * g.n_all - c2.cs * f.nf)))
            // NULLIF(2 * MAX(f.nf) * MAX(g.n_all), 0) AS BIGINT)
         AS doc_tvd_ppm,
       CAST((1000000 * SUM(abs(c2.t * g.t_all - c2.ts * f.tf)))
            // NULLIF(2 * MAX(f.tf) * MAX(g.t_all), 0) AS BIGINT)
         AS tok_tvd_ppm
FROM cells c2 JOIN ftot f USING (fold) CROSS JOIN g
GROUP BY 1
"""


# --------------------------------------------------------------------------
# domain mix water-filling: the allocation step token_budget_mix samples under
# --------------------------------------------------------------------------

#: global budget = total corpus tokens div this (shared with the oracle)
_WATERFILL_SHARE_DIV = 2


def q_domain_mix_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Water-filling token allocation across sources — the
    aggregate-sized allocation step `token_budget_mix` SAMPLES under
    (r10 shortlist, landed r12): given per-source token totals T_s and a
    global budget B = (Σ T_s) div 2 (``_WATERFILL_SHARE_DIV``,
    oracle-shared), find the water
    level L such that every source gets ``alloc_s = min(T_s, L)`` and
    Σ alloc_s ≤ B is maximal — small domains are taken whole, large
    crawls are capped at the common level, and no float or iteration is
    involved: on the |sources|-row aggregate, sort ascending by
    (T, source), take the inclusive prefix sum P_i, and source i is
    UNCAPPED iff ``P_{i−1} + T_i·(n−i+1) ≤ B`` (monotone, so the
    uncapped set is a prefix — the classic exact waterfill); then
    ``L = (B − P_k) div (n − k)`` for k uncapped sources. The floor
    remainder (< n−k tokens) is deliberately left unallocated —
    deterministic, documented, and negligible at any scale.

    Stated contracts: NULL text counts 0 tokens (COALESCE, both
    engines); a NULL source is a real allocation row and sorts FIRST
    (explicit NULLS FIRST both engines — DuckDB defaults NULLS LAST,
    Spark ASC defaults NULLS FIRST: left implicit this would be a
    silent cross-engine row-order divergence inside row_number);
    ``water_level`` is explicit NULL when the budget covers every
    source whole (k = n — ``NULLIF(n − k, 0)``). Products route through
    DECIMAL(38,0): T·n ≈ 10¹⁴·10⁶ overflows nothing here but BIGINT has
    only ~10¹⁸·⁹ headroom a 100 TB corpus with many sources would
    consume.

    Scale shape: ONE map-side-combined groupBy collapses the corpus to
    |sources| rows; the rank/prefix window, the scalar totals, and the
    k/P_k fold all run on that aggregate (the single-partition window
    is deliberate and aggregate-sized — the same convention as every
    |groups|-row window in the repo). Output is |sources| rows.
    """
    docs = table(spark, sf_dir, "documents")
    tot = (
        docs.groupBy("source")
        .agg(
            F.sum(F.coalesce(token_count("text"), F.lit(0)))
            .cast("decimal(38,0)").alias("t"))
        .localCheckpoint(eager=False)  # ranked window + global totals
    )
    w = Window.orderBy(F.col("t").asc(), F.asc_nulls_first("source"))
    ranked = tot.select(
        "source", "t",
        F.row_number().over(w).cast("decimal(38,0)").alias("i"),
        F.sum("t").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("p"),
    )
    g = tot.agg(
        F.sum("t").alias("t_all"),
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
    )
    flags = (
        ranked.crossJoin(F.broadcast(g))
        .withColumn(
            "budget",
            F.expr(f"t_all div {_WATERFILL_SHARE_DIV}")
            .cast("decimal(38,0)"))
        .withColumn(
            "unc",
            (F.col("p") - F.col("t")
             + F.col("t") * (F.col("n") - F.col("i") + 1)
             <= F.col("budget")).cast("int"))
        .localCheckpoint(eager=False)  # the k/P_k fold + the output rows
    )
    ks = flags.agg(
        F.sum("unc").cast("decimal(38,0)").alias("k"),
        F.coalesce(
            F.max(F.when(F.col("unc") == 1, F.col("p"))),
            F.lit(0).cast("decimal(38,0)")).alias("pk"),
    )
    return (
        flags.crossJoin(F.broadcast(ks))
        .withColumn(
            "level",
            F.expr("(budget - pk) div nullif(n - k, 0)").cast("bigint"))
        .select(
            "source",
            F.col("t").cast("bigint").alias("n_tok"),
            F.when(F.col("unc") == 1, F.col("t").cast("bigint"))
            .otherwise(F.col("level")).alias("alloc_tok"),
            (F.lit(1) - F.col("unc")).cast("int").alias("capped"),
            F.col("level").alias("water_level"),
            F.col("budget").cast("bigint").alias("tok_budget"),
        )
    )


_WATERFILL_SQL = f"""
WITH tot AS (
  SELECT source,
         CAST(SUM(COALESCE(len(string_split(text, ' ')), 0)) AS HUGEINT) AS t
  FROM documents GROUP BY 1
),
g AS (SELECT SUM(t) AS t_all, CAST(COUNT(*) AS HUGEINT) AS n FROM tot),
ranked AS (
  SELECT source, t,
         CAST(ROW_NUMBER() OVER (ORDER BY t, source NULLS FIRST)
              AS HUGEINT) AS i,
         SUM(t) OVER (ORDER BY t, source NULLS FIRST
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
  FROM tot
),
flags AS (
  SELECT r.*, g.n, g.t_all // {_WATERFILL_SHARE_DIV} AS budget,
         CASE WHEN r.p - r.t + r.t * (g.n - r.i + 1)
                   <= g.t_all // {_WATERFILL_SHARE_DIV}
              THEN 1 ELSE 0 END AS unc
  FROM ranked r CROSS JOIN g
),
ks AS (
  SELECT CAST(SUM(unc) AS HUGEINT) AS k,
         COALESCE(MAX(CASE WHEN unc = 1 THEN p END), 0) AS pk
  FROM flags
)
SELECT f.source,
       CAST(f.t AS BIGINT) AS n_tok,
       CAST(CASE WHEN f.unc = 1 THEN f.t
                 ELSE (f.budget - ks.pk) // NULLIF(f.n - ks.k, 0)
            END AS BIGINT) AS alloc_tok,
       CAST(1 - f.unc AS INT) AS capped,
       CAST((f.budget - ks.pk) // NULLIF(f.n - ks.k, 0) AS BIGINT)
         AS water_level,
       CAST(f.budget AS BIGINT) AS tok_budget
FROM flags f CROSS JOIN ks
"""


QUERIES: dict[str, QuerySpec] = {
    "loo_target_encoding": QuerySpec(
        q_loo_target_encoding, _LOO_ENCODING_SQL,
        tags=("dataprep", "feature", "encoding", "pipeline"),
    ),
    "dedup_survivorship_merge": QuerySpec(
        q_dedup_survivorship, _SURVIVORSHIP_SQL,
        tags=("dedup", "merge", "pipeline"),
    ),
    "token_budget_mix": QuerySpec(
        q_token_budget_mix, _TOKEN_BUDGET_SQL,
        tags=("text", "sample", "pipeline", "window"),
    ),
    "snapshot_diff": QuerySpec(
        q_snapshot_diff, _SNAPSHOT_DIFF_SQL,
        tags=("merge", "integrity", "pipeline"),
    ),
    "k_anonymize": QuerySpec(
        q_k_anonymize, _K_ANONYMIZE_SQL, tags=("privacy", "pipeline"),
    ),
    "corpus_prep_pipeline": QuerySpec(
        q_corpus_prep_pipeline, _corpus_prep_sql(),
        tags=("text", "dedup", "pipeline", "capstone")),
    "feature_hashing": QuerySpec(
        q_feature_hashing, _FEATURE_HASHING_SQL, tags=("pipeline", "features"),
    ),
    "group_top_p": QuerySpec(
        q_group_top_p, _GROUP_TOP_P_SQL, tags=("sample", "quality", "pipeline"),
    ),
    "fuzzy_dedup_editdist": QuerySpec(
        q_fuzzy_dedup_editdist, _FUZZY_SQL,
        tags=("dedup", "linkage", "pipeline"),
    ),
    "dataset_split_assign": QuerySpec(
        q_dataset_split, _DATASET_SPLIT_SQL, tags=("sample", "pipeline"),
    ),
    "dedup_cluster_canonical": QuerySpec(
        q_dedup_cluster_canonical, _DEDUP_CLUSTER_SQL,
        tags=("dedup", "clustering", "pipeline"),
    ),
    "stratified_sample": QuerySpec(
        q_stratified_sample, _STRAT_SAMPLE_SQL, tags=("sample", "pipeline"),
    ),
    "quantile_trim_outliers": QuerySpec(
        q_quantile_trim, _QUANTILE_TRIM_SQL, tags=("quality", "window"),
    ),
    "incremental_merge": QuerySpec(
        q_incremental_merge, _INCR_MERGE_SQL, tags=("merge", "pipeline"),
    ),
    "embedding_dup_clusters": QuerySpec(
        q_embedding_dup_clusters, _emb_cluster_sql(),
        tags=("dedup", "clustering", "vectors"),
    ),
    "contamination_overlap": QuerySpec(
        q_contamination_overlap, _CONTAM_SQL, tags=("text", "dedup", "pipeline"),
    ),
    "label_leakage_audit": QuerySpec(
        q_label_leakage_audit, _LEAK_SQL,
        tags=("text", "dedup", "pipeline", "audit"),
    ),
    "per_domain_perplexity_gate": QuerySpec(
        q_per_domain_perplexity_gate, _PPLX_SQL,
        tags=("text", "quality", "eval", "curation", "pipeline"),
    ),
    "stratified_kfold_assign": QuerySpec(
        q_stratified_kfold, _KFOLD_SQL,
        tags=("sample", "eval", "pipeline"),
    ),
    "kfold_label_balance_drift": QuerySpec(
        q_kfold_label_balance_drift, _KFOLD_DRIFT_SQL,
        tags=("sample", "eval", "audit", "pipeline"),
    ),
    "domain_mix_waterfill": QuerySpec(
        q_domain_mix_waterfill, _WATERFILL_SQL,
        tags=("sample", "curation", "pipeline", "window"),
    ),
    "sequence_packing": QuerySpec(
        q_sequence_packing, _SEQ_PACK_SQL, tags=("text", "pipeline", "window"),
    ),
    "packing_efficiency_report": QuerySpec(
        q_packing_efficiency_report, _PACK_REPORT_SQL,
        tags=("text", "pipeline", "audit", "window"),
    ),
    "pack_attention_waste": QuerySpec(
        q_pack_attention_waste, _PACK_WASTE_SQL,
        tags=("text", "pipeline", "audit", "window"),
    ),
    "pack_waste_by_utilization": QuerySpec(
        q_pack_waste_by_utilization, _PACK_UTIL_WASTE_SQL,
        tags=("text", "pipeline", "audit", "window"),
    ),
    "doc_chunking": QuerySpec(
        q_doc_chunking, _DOC_CHUNK_SQL, tags=("text", "pipeline"),
    ),
    "text_redact_pii": QuerySpec(
        q_redact_pii, _REDACT_SQL, tags=("text", "pipeline"),
    ),
    "corpus_ngram_dedup": QuerySpec(
        q_corpus_ngram_dedup, _CORPUS_NGRAM_SQL,
        tags=("text", "dedup", "pipeline"),
    ),
    "scd2_history": QuerySpec(
        q_scd2_history, _SCD2_SQL, tags=("merge", "pipeline", "window"),
    ),
    "cdc_apply_changes": QuerySpec(
        q_cdc_apply, _CDC_APPLY_SQL, tags=("merge", "pipeline", "cdc"),
    ),
    "weighted_sample": QuerySpec(
        q_weighted_sample, _WEIGHTED_SAMPLE_SQL, tags=("sample", "pipeline"),
    ),
    "table_fingerprint": QuerySpec(
        q_table_fingerprint, _FINGERPRINT_SQL, tags=("integrity", "pipeline"),
    ),
    "corpus_mix_rebalance": QuerySpec(
        q_corpus_mix_rebalance, _MIX_REBALANCE_SQL,
        tags=("text", "sample", "pipeline"),
    ),
    "per_group_sample_k": QuerySpec(
        q_per_group_sample_k, _SAMPLE_K_SQL, tags=("sample", "pipeline"),
    ),
}
