"""Similarity-search queries over ``embeddings`` (SURVEY.md §2.10).

Pattern: brute-force cosine top-k is the exact baseline; hyperplane-LSH
bucketing is the scale path (bucket join instead of all-pairs). Query
vectors are broadcast — the 100 TB plan is a broadcast-hash join against
the full store, never a shuffle of the embedding table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tfm_taxitrips_spark.functions.similarity import (
    LSH_PLANES,
    as_double,
    cosine,
    dot,
    l2_norm,
    lsh_bucket,
    lsh_bucket_sql,
)
from tfm_taxitrips_spark.queries.registry import QuerySpec
from tfm_taxitrips_spark.sources.readers import table

N_QUERY_VECS = 5  # vec_id < 5 are the probe queries
TOP_K = 10

#: Hard cap on the brute-force probe batch. The `vec_id != qid` join has no
#: equi key, so Catalyst plans a BroadcastNestedLoopJoin — O(|store|·|probes|)
#: work and a broadcast of the probe set. That is the INTENDED plan for the
#: exact baseline / rerank path, and it only stays sane while the probe
#: batch is tiny; a large probe set would silently turn it into a cartesian
#: scan. Larger batches belong on the bucketed paths (q_ann_lsh / q_ann_ivf).
MAX_PROBE_VECS = 64

#: Malformed-vector floor: the deepest fixed-dimension slice any family
#: member reads (the covariance/whitening/PQ 8-dim prefix). See
#: :func:`emb_table`.
EMB_MIN_DIMS = 8


def emb_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The vector family's ONE guarded ``embeddings`` scan: NULL,
    shorter-than-{EMB_MIN_DIMS}, NULL-ELEMENT, and ZERO-NORM vectors
    are excluded at the seam, with the oracle-side twin injected by
    :func:`_emb_guard_sql`.

    Round-11 probe finding (failing-first, the r9/r10 NULL-probe
    practice applied to this family's birth defect): planting ONE NULL
    embedding and ONE 3-dim embedding split the family three ways —
    13 cosine/dot queries returned Spark results while DuckDB refused
    (``list_dot_product: argument can not contain NULL values``), the
    two fixed-slice audits (covariance, whitening) CRASHED Spark
    outright (strict ``element_at`` past the array end), and six
    aggregate-shaped queries agreed only by accident. One shared guard
    replaces three accidents with a stated contract: a malformed vector
    is an upstream ingest defect to flag, never a candidate, a probe,
    a centroid seed, or a quantization input.

    Round-12 extension (tools/null_probe_sweep.py, the registry-wide
    form of the same practice): the r11 contract was incomplete — a
    ZERO-NORM vector crashed Spark's ANSI divide in every cosine-path
    query (15 of them: ``dot/(n_q·n_e)`` with a 0 denominator), and a
    vector with one NULL ELEMENT passed the is-null+length guard yet
    crashed DuckDB's whole-batch ``list_inner_product`` validation in
    3 more. Both are the same defect class (an embedding model never
    emits an exactly-zero or element-NULL vector; a zeroed/holed row is
    an ingest or storage fault), so both join the seam contract: a
    guarded vector has ≥{EMB_MIN_DIMS} dims, no NULL elements, and at
    least one non-zero element.

    Round-16 extension (the non-finite ingest contract batch —
    ROUND15_NOTES §13, found by the staged ``--nonfinite`` sweep
    phase): a full-width vector carrying ONE NaN/±inf COMPONENT passes
    the is-null+length+non-zero guard yet poisons every downstream dot
    product and crashed both vector audits' fixed-slice sums. Same
    defect class (no embedding model emits a non-finite component; a
    corrupted row is an ingest or storage fault), same disposition: the
    guarded contract is ≥{EMB_MIN_DIMS} dims, no NULL elements, no
    NON-FINITE elements, at least one non-zero element. Vectors that
    pass the guard but disagree on dimensionality remain the ingest
    schema's promise (a fixed-width embedding column), not per-query
    defense. (Theoretical residue, documented not defended: a vector of
    denormal-tiny elements whose squared norm underflows to 0.0 would
    still divide by zero — not reachable from any real embedding
    model's output range.)
    """
    e = F.col("embedding")
    inf = float("inf")
    return table(spark, sf_dir, "embeddings").where(
        e.isNotNull()
        & (F.size(e) >= EMB_MIN_DIMS)
        & ~F.exists(e, lambda x: x.isNull())
        & ~F.exists(e, lambda x: F.isnan(x) | (F.abs(x) == inf))
        & F.exists(e, lambda x: x != 0)
    )


def _emb_guard_sql(sql: str) -> str:
    """Rewrite an oracle to read the GUARDED embeddings relation:
    every table-position ``FROM/JOIN embeddings`` becomes the
    ``embeddings_g`` CTE prepended here — :func:`emb_table`'s oracle
    twin. (DuckDB rejects a CTE that shadows the view it reads —
    'circular reference' — so the guard needs its own name plus the
    reference rewrite.)"""
    # the REPLACE rebuilds the list column (list_transform over a
    # coalesced list): DuckDB 1.0's list_inner_product validates the
    # WHOLE input vector batch — including rows a same-pipeline filter
    # already deselected — so a guard that merely filters still trips
    # "argument can not contain NULL values" on the raw scan batch; a
    # rebuilt vector physically contains only surviving rows' data.
    # r12: elements coalesce to 0.0 inside the rebuild (a deselected
    # NULL-ELEMENT row would otherwise still poison the batch), typed
    # FLOAT so survivors keep the scan's exact element type; for every
    # row that passes the guard the rebuild is the identity, because
    # the guard excludes NULL elements. The filter itself mirrors
    # emb_table: not-NULL, >= EMB_MIN_DIMS dims, zero NULL elements,
    # at least one non-zero element (zero-norm exclusion); r16: zero
    # non-finite elements (the non-finite ingest contract — NULL
    # elements are already excluded by the previous predicate, so
    # isfinite's NULL→NULL never weakens this one). The rebuild
    # coalesces deselected non-finite components to 0.0 too, for the
    # same whole-batch-validation reason as the NULL case.
    guard = (
        f"embeddings_g AS (SELECT * REPLACE (list_transform("
        f"COALESCE(embedding, []), x -> CASE WHEN isfinite(x) THEN x "
        f"ELSE CAST(0 AS FLOAT) END) "
        f"AS embedding) FROM embeddings "
        f"WHERE embedding IS NOT NULL AND len(embedding) >= "
        f"{EMB_MIN_DIMS} "
        f"AND len(list_filter(embedding, x -> x IS NULL)) = 0 "
        f"AND len(list_filter(embedding, x -> NOT isfinite(x))) = 0 "
        f"AND len(list_filter(embedding, x -> x != 0)) > 0)"
    )
    # the rewrite itself (case-insensitivity, WITH RECURSIVE handling,
    # loud zero-rewrite failure) is the shared seam machinery — the
    # events guard uses the same function (queries/guards.py, r12)
    from tfm_taxitrips_spark.queries.guards import guarded_scan_sql

    return guarded_scan_sql(sql, "embeddings", "embeddings_g", guard)


def q_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 norms — the array-fold primitive in isolation."""
    emb = emb_table(spark, sf_dir)
    e = as_double("embedding")
    return emb.select("vec_id", "label", l2_norm(e).alias("l2_norm"))


_NORMS_SQL = """
SELECT vec_id, label,
       sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS l2_norm
FROM embeddings
"""


def q_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: broadcast the query set, rank candidates per
    query. At scale this is one pass over the store per query batch.

    This is the oracle/rerank path ONLY: the deliberate
    BroadcastNestedLoopJoin (see MAX_PROBE_VECS) is exact but scales as
    |store| × |probes|; recall-bounded large-batch serving goes through
    the LSH/IVF bucket equi-joins instead. Plan pinned by
    tests/test_plans.py::test_ann_broadcasts_queries."""
    scored = _brute_force_scored(spark, sf_dir).select(
        "qid", "vec_id", "label", "cosine_sim")
    w = Window.partitionBy("qid").orderBy(F.col("cosine_sim").desc(), F.col("vec_id").asc())
    return scored.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= TOP_K)


def _brute_force_scored(
    spark: SparkSession, sf_dir: str, *, negatives_only: bool = False
) -> DataFrame:
    """Shared capped exact-path scorer (broadcast probes, one store
    pass): norms are computed ONCE per row before the join (store side)
    / per query (broadcast side), so the per-pair work is a single dot
    fold — the identical ``dot/(n_q·n_e)`` expression tree as
    ``cosine()``, keeping oracle hashes stable. With ``negatives_only``
    the label-disagreement predicate joins the pair filter, pruning
    before scoring (the hard-negative miner's form)."""
    if N_QUERY_VECS > MAX_PROBE_VECS:
        raise ValueError(
            f"brute-force probe batch {N_QUERY_VECS} exceeds MAX_PROBE_VECS="
            f"{MAX_PROBE_VECS}; use q_ann_lsh/q_ann_ivf for large batches"
        )
    emb = emb_table(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_embedding"),
        l2_norm(as_double("embedding")).alias("q_nrm"),
    )
    cands = emb.select(
        "vec_id", "label", "embedding", l2_norm(as_double("embedding")).alias("nrm")
    )
    pred = F.col("vec_id") != F.col("qid")
    if negatives_only:
        pred = pred & (F.col("label") != F.col("q_label"))
    joined = cands.join(F.broadcast(queries), pred)
    return joined.select(
        "qid",
        "q_label",
        "vec_id",
        "label",
        (
            dot(as_double("q_embedding"), as_double("embedding"))
            / (F.col("q_nrm") * F.col("nrm"))
        ).alias("cosine_sim"),
    )


_ANN_BRUTE_SQL = f"""
WITH q AS (
  SELECT vec_id AS qid, embedding AS q_embedding FROM embeddings WHERE vec_id < {N_QUERY_VECS}
),
scored AS (
  SELECT q.qid, e.vec_id, e.label,
         list_dot_product(q.q_embedding::DOUBLE[], e.embedding::DOUBLE[])
           / (sqrt(list_dot_product(q.q_embedding::DOUBLE[], q.q_embedding::DOUBLE[]))
              * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))) AS cosine_sim
  FROM embeddings e JOIN q ON e.vec_id <> q.qid
)
SELECT * FROM (
  SELECT qid, vec_id, label, cosine_sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine_sim DESC, vec_id ASC) AS INT) AS rnk
  FROM scored
) WHERE rnk <= {TOP_K}
"""


def q_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH bucket assignment (the partitioning key of the ANN
    scale path)."""
    emb = emb_table(spark, sf_dir)
    return emb.select(
        "vec_id", "label", lsh_bucket(as_double("embedding")).alias("bucket")
    )


_LSH_BUCKETS_SQL = f"""
SELECT vec_id, label, {lsh_bucket_sql('embedding::DOUBLE[]')} AS bucket
FROM embeddings
"""


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed ANN: candidates meet queries only inside their LSH bucket,
    then exact cosine reranks. Recall < 1 by design ({LSH_PLANES} planes);
    the join key (bucket) is what shards a 100 TB store."""
    emb = emb_table(spark, sf_dir)
    with_bucket = emb.select(
        "vec_id",
        "label",
        "embedding",
        lsh_bucket(as_double("embedding")).alias("bucket"),
        l2_norm(as_double("embedding")).alias("nrm"),
    )
    queries = with_bucket.where(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_embedding"),
        F.col("bucket").alias("q_bucket"),
        F.col("nrm").alias("q_nrm"),
    )
    joined = with_bucket.join(
        F.broadcast(queries),
        (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != F.col("qid")),
    )
    scored = joined.select(
        "qid",
        "vec_id",
        "bucket",
        (
            dot(as_double("q_embedding"), as_double("embedding"))
            / (F.col("q_nrm") * F.col("nrm"))
        ).alias("cosine_sim"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine_sim").desc(), F.col("vec_id").asc())
    return scored.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= TOP_K)


_ANN_LSH_SQL = f"""
WITH wb AS (
  SELECT vec_id, label, embedding,
         {lsh_bucket_sql('embedding::DOUBLE[]')} AS bucket
  FROM embeddings
),
q AS (
  SELECT vec_id AS qid, embedding AS q_embedding, bucket AS q_bucket
  FROM wb WHERE vec_id < {N_QUERY_VECS}
),
scored AS (
  SELECT q.qid, e.vec_id, e.bucket,
         list_dot_product(q.q_embedding::DOUBLE[], e.embedding::DOUBLE[])
           / (sqrt(list_dot_product(q.q_embedding::DOUBLE[], q.q_embedding::DOUBLE[]))
              * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))) AS cosine_sim
  FROM wb e JOIN q ON e.bucket = q.q_bucket AND e.vec_id <> q.qid
)
SELECT * FROM (
  SELECT qid, vec_id, bucket, cosine_sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine_sim DESC, vec_id ASC) AS INT) AS rnk
  FROM scored
) WHERE rnk <= {TOP_K}
"""


IVF_NLIST = 16  # coarse-quantizer lists (cells)
IVF_NPROBE = 4  # lists probed per query


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: coarse-quantize the store into {IVF_NLIST} inverted lists,
    probe the {IVF_NPROBE} lists nearest each query, exact-rerank inside.

    Centroids are {IVF_NLIST} deterministic seed vectors (vec_id right after
    the probe range) rather than k-means output, so the DuckDB oracle is
    exact; at scale you'd fit them with MLlib k-means|| and the list
    assignment becomes the store's partitioning/clustering key — a query
    then touches nprobe/nlist of the data instead of all of it.
    """
    emb = emb_table(spark, sf_dir)
    cents = emb.where(
        (F.col("vec_id") >= N_QUERY_VECS)
        & (F.col("vec_id") < N_QUERY_VECS + IVF_NLIST)
    ).select(
        (F.col("vec_id") - N_QUERY_VECS).alias("cid"),
        F.col("embedding").alias("c_embedding"),
    )
    scored = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "label",
        "embedding",
        "cid",
        cosine(as_double("embedding"), as_double("c_embedding")).alias("c_sim"),
    )
    wv = Window.partitionBy("vec_id").orderBy(F.col("c_sim").desc(), F.col("cid").asc())
    ranked = scored.withColumn("crn", F.row_number().over(wv))
    assign = ranked.where(F.col("crn") == 1).select("vec_id", "label", "embedding", "cid")
    probes = (
        ranked.where((F.col("vec_id") < N_QUERY_VECS) & (F.col("crn") <= IVF_NPROBE))
        .select(F.col("vec_id").alias("qid"), F.col("cid").alias("p_cid"))
    )
    queries = emb.where(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_embedding")
    )
    probe_q = probes.join(F.broadcast(queries), "qid")
    cands = assign.join(
        F.broadcast(probe_q),
        (F.col("cid") == F.col("p_cid")) & (F.col("vec_id") != F.col("qid")),
    )
    rescored = cands.select(
        "qid",
        "vec_id",
        "label",
        cosine(as_double("q_embedding"), as_double("embedding")).alias("cosine_sim"),
    )
    wq = Window.partitionBy("qid").orderBy(F.col("cosine_sim").desc(), F.col("vec_id").asc())
    return rescored.withColumn("rnk", F.row_number().over(wq)).where(F.col("rnk") <= TOP_K)


_COS = (
    "list_dot_product({a}::DOUBLE[], {b}::DOUBLE[])"
    " / (sqrt(list_dot_product({a}::DOUBLE[], {a}::DOUBLE[]))"
    " * sqrt(list_dot_product({b}::DOUBLE[], {b}::DOUBLE[])))"
)

_ANN_IVF_SQL = f"""
WITH cents AS (
  SELECT vec_id - {N_QUERY_VECS} AS cid, embedding AS c_embedding
  FROM embeddings
  WHERE vec_id >= {N_QUERY_VECS} AND vec_id < {N_QUERY_VECS + IVF_NLIST}
),
scored AS (
  SELECT e.vec_id, e.label, e.embedding, c.cid,
         {_COS.format(a='e.embedding', b='c.c_embedding')} AS c_sim,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
                            ORDER BY {_COS.format(a='e.embedding', b='c.c_embedding')} DESC,
                                     c.cid ASC) AS crn
  FROM embeddings e CROSS JOIN cents c
),
assign AS (SELECT vec_id, label, embedding, cid FROM scored WHERE crn = 1),
probes AS (
  SELECT vec_id AS qid, cid FROM scored
  WHERE vec_id < {N_QUERY_VECS} AND crn <= {IVF_NPROBE}
),
q AS (
  SELECT vec_id AS qid, embedding AS q_embedding FROM embeddings
  WHERE vec_id < {N_QUERY_VECS}
),
rescored AS (
  SELECT p.qid, a.vec_id, a.label,
         {_COS.format(a='q.q_embedding', b='a.embedding')} AS cosine_sim
  FROM assign a
  JOIN probes p ON a.cid = p.cid AND a.vec_id <> p.qid
  JOIN q ON q.qid = p.qid
)
SELECT * FROM (
  SELECT qid, vec_id, label, cosine_sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine_sim DESC, vec_id ASC) AS INT) AS rnk
  FROM rescored
) WHERE rnk <= {TOP_K}
"""


def q_embedding_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup detection *within LSH buckets*: the
    full near-dup pipeline (bucket → pairwise cosine → threshold) in one
    query. All-pairs never happens — only same-bucket pairs are scored."""
    emb = emb_table(spark, sf_dir)
    wb = emb.select(
        "vec_id",
        "embedding",
        lsh_bucket(as_double("embedding")).alias("bucket"),
        l2_norm(as_double("embedding")).alias("nrm"),
    )
    a, b = wb.alias("a"), wb.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    )
    scored = pairs.select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        (
            dot(as_double(F.col("a.embedding")), as_double(F.col("b.embedding")))
            / (F.col("a.nrm") * F.col("b.nrm"))
        ).alias("cosine_sim"),
    )
    return scored.where(F.col("cosine_sim") >= 0.35)


_DUP_PAIRS_SQL = f"""
WITH wb AS (
  SELECT vec_id, embedding, {lsh_bucket_sql('embedding::DOUBLE[]')} AS bucket
  FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
         / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
            * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) AS cosine_sim
FROM wb a JOIN wb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
         / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
            * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) >= 0.35
"""


def q_knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN classification: majority label among the exact top-10 neighbors
    (ties → smaller label). Composes the brute-force ANN with a vote."""
    topk = q_ann_bruteforce(spark, sf_dir)
    votes = topk.groupBy("qid", "label").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("qid").orderBy(F.col("n").desc(), F.col("label").asc())
    return (
        votes.withColumn("r", F.row_number().over(w))
        .where(F.col("r") == 1)
        .select("qid", F.col("label").alias("predicted_label"), F.col("n").alias("n_votes"))
    )


_KNN_VOTE_SQL = f"""
WITH topk AS ({_ANN_BRUTE_SQL}),
votes AS (SELECT qid, label, COUNT(*) AS n FROM topk GROUP BY 1, 2)
SELECT qid, label AS predicted_label, n AS n_votes
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY n DESC, label ASC) AS r
  FROM votes
) WHERE r = 1
"""


def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization of the embedding store with a per-vector
    reconstruction-error audit — the compression step before an ANN index
    ships (4× smaller store; IVF/LSH probes rerank against it).

    Two-pass shape: pass 1 computes per-DIMENSION min/max (posexplode is
    map-side; the stats aggregate returns one row per dimension — 64 here,
    4096 for a big model — so it always broadcasts); pass 2 quantizes and
    immediately dequantizes each coordinate against the broadcast stats
    and audits ``|x - deq(q(x))| <= step/2`` per vector. The emitted
    columns are the audit (max error + bound flag), not the int8 blobs —
    engine-portable and oracle-checkable.

    Determinism: both engines evaluate the identical double-precision
    expression tree on the same (dim, x) pairs; ``round`` is
    half-away-from-zero in Spark and DuckDB alike.
    """
    emb = emb_table(spark, sf_dir)
    coords = emb.select(
        "vec_id", F.posexplode(as_double("embedding")).alias("dim", "x")
    )
    stats = coords.groupBy("dim").agg(
        F.min("x").alias("mn"), F.max("x").alias("mx")
    )
    j = coords.join(F.broadcast(stats), "dim")
    step = (F.col("mx") - F.col("mn")) / F.lit(255.0)
    q = F.round((F.col("x") - F.col("mn")) / step) - 128
    deq = F.col("mn") + (q + 128) * step
    err = F.when(F.col("mx") == F.col("mn"), F.lit(0.0)).otherwise(
        F.abs(F.col("x") - deq)
    )
    bound = F.when(F.col("mx") == F.col("mn"), F.lit(0.0)).otherwise(step / 2)
    return (
        j.select("vec_id", err.alias("e"), (err <= bound + 1e-12).alias("ok"))
        .groupBy("vec_id")
        .agg(
            F.max("e").alias("max_abs_err"),
            F.min("ok").alias("within_half_step"),
            F.count(F.lit(1)).cast("int").alias("n_dims"),
        )
    )


_QUANTIZE_SQL = """
WITH coords AS (
  SELECT vec_id, CAST(i AS INT) - 1 AS dim, embedding[i]::DOUBLE AS x
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
),
stats AS (
  SELECT dim, MIN(x) AS mn, MAX(x) AS mx FROM coords GROUP BY dim
),
audit AS (
  SELECT vec_id,
         CASE WHEN mx = mn THEN 0.0
              ELSE abs(x - (mn + (round((x - mn) / ((mx - mn) / 255.0)) - 128
                                  + 128) * ((mx - mn) / 255.0))) END AS e,
         (CASE WHEN mx = mn THEN 0.0
               ELSE abs(x - (mn + (round((x - mn) / ((mx - mn) / 255.0)) - 128
                                   + 128) * ((mx - mn) / 255.0))) END
          <= CASE WHEN mx = mn THEN 0.0
                  ELSE ((mx - mn) / 255.0) / 2 END + 1e-12) AS ok
  FROM coords JOIN stats USING (dim)
)
SELECT vec_id, MAX(e) AS max_abs_err, MIN(ok) AS within_half_step,
       CAST(COUNT(*) AS INT) AS n_dims
FROM audit GROUP BY vec_id
"""


def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid (mean vector) — the k-means/mean-pooling
    primitive, one output row per (label, dimension).

    Determinism: a float mean is order-dependent (shuffle order varies
    between runs AND engines), so each coordinate is accumulated as
    ``floor(x * 1e6)`` integer micros — float→double is exact, the double
    multiply/floor are IEEE-determined, and the bigint sum is associative.
    The final centroid is one integer÷double division, bit-identical in
    both engines (documented micro-quantized mean, max 1e-6 bias per
    coordinate).

    Plan: posexplode is map-side (dim× row multiply, but partial aggs
    combine per task before the exchange), so the single shuffle carries
    only |labels|×dim partially-summed rows — independent of corpus size.
    """
    emb = emb_table(spark, sf_dir)
    coords = emb.select(
        "label", F.posexplode("embedding").alias("dim", "x")
    )
    micro = F.floor(F.col("x").cast("double") * F.lit(1000000.0)).cast("long")
    return (
        coords.groupBy("label", "dim")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(micro).alias("sum_micro"),
        )
        .select(
            "label",
            "dim",
            "n_vecs",
            (F.col("sum_micro").cast("double")
             / (F.col("n_vecs").cast("double") * F.lit(1000000.0))
             ).alias("centroid"),
        )
    )


_CENTROIDS_SQL = """
WITH coords AS (
  SELECT label, CAST(i AS INT) - 1 AS dim,
         CAST(FLOOR(embedding[i]::DOUBLE * 1000000.0) AS BIGINT) AS micro
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
)
SELECT label, dim, COUNT(*) AS n_vecs,
       CAST(SUM(micro) AS DOUBLE)
         / (CAST(COUNT(*) AS DOUBLE) * 1000000.0) AS centroid
FROM coords GROUP BY label, dim
"""


def q_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k evaluation of the LSH ANN path against the exact
    brute-force ranking — the acceptance gate every approximate-similarity
    deployment needs before pointing it at production traffic. Emits the
    integer contingency per probe (exact-set size, approx-set size, hit
    count) so the driver hash compares exact numbers and downstream can
    derive recall@k = n_hits / n_brute.

    Composes the two ALREADY-ORACLE-PROVEN rankings (q_ann_bruteforce,
    q_ann_lsh) and intersects per qid — the eval itself adds one
    broadcast-sized join on (qid, vec_id). At 100 TB you run it on a
    sampled probe set; the statistic is the same.

    Measured finding on the synthetic fixture: recall@10 ≈ 0-10% — the
    corpus is UNIFORM random vectors (all pairwise cosines ≈ 0, no
    cluster structure), the adversarial case for hyperplane LSH. That is
    the eval doing its job: on such data the correct deployment answer is
    brute-force/IVF-rerank, and this query is the gate that tells you so
    BEFORE production does.
    """
    brute = q_ann_bruteforce(spark, sf_dir).select("qid", "vec_id")
    approx = q_ann_lsh(spark, sf_dir).select(
        "qid", F.col("vec_id").alias("a_vec_id")
    )
    return _recall_contingency(brute, approx)


def _recall_contingency(brute: DataFrame, approx: DataFrame) -> DataFrame:
    """Shared recall@k contingency: per qid, exact-set size, approx-set
    size, and |exact ∩ approx|. ``approx`` must carry (qid, a_vec_id).

    Both joins BROADCAST the approx side: it is ≤ |probes|·k rows by
    construction (every producer ranks to top-k over a capped probe
    set), so a sort-merge join here would shuffle the brute ranking for
    nothing — r11 fix, previously Catalyst planned SMJ for all three
    recall evals. ``approx`` is lazily checkpointed by its callers when
    recomputing it is expensive (the PQ gate's training loop)."""
    hits = brute.join(
        F.broadcast(approx),
        (brute["qid"] == approx["qid"])
        & (brute["vec_id"] == approx["a_vec_id"]),
        "left",
    ).select(
        brute["qid"].alias("q"),
        "vec_id",
        F.col("a_vec_id").isNotNull().cast("int").alias("hit"),
    )
    per_q = hits.groupBy("q").agg(
        F.count(F.lit(1)).alias("n_brute"),
        F.sum("hit").alias("n_hits"),
    )
    n_approx = approx.groupBy("qid").agg(
        F.count(F.lit(1)).alias("n_approx")
    )
    return per_q.join(
        F.broadcast(n_approx), per_q["q"] == n_approx["qid"], "left"
    ).select(
        F.col("q").alias("qid"),
        "n_brute",
        F.coalesce("n_approx", F.lit(0)).alias("n_approx"),
        "n_hits",
    )


def _recall_sql(approx_sql: str) -> str:
    return f"""
WITH brute AS (
  SELECT qid, vec_id FROM ({_ANN_BRUTE_SQL}) b
),
approx AS (
  SELECT qid, vec_id FROM ({approx_sql}) a
),
per_q AS (
  SELECT b.qid, COUNT(*) AS n_brute,
         CAST(SUM(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_hits
  FROM brute b LEFT JOIN approx a ON a.qid = b.qid AND a.vec_id = b.vec_id
  GROUP BY 1
),
na AS (SELECT qid, COUNT(*) AS n_approx FROM approx GROUP BY 1)
SELECT p.qid, p.n_brute, COALESCE(na.n_approx, 0) AS n_approx, p.n_hits
FROM per_q p LEFT JOIN na ON na.qid = p.qid
"""


_ANN_RECALL_SQL = _recall_sql(_ANN_LSH_SQL)


def q_ann_recall_eval_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k gate for the IVF path (round-3 verdict item #4): same
    contingency as q_ann_recall_eval but grading q_ann_ivf.

    Why this matters beyond coverage: on the uniform-random fixture the
    hyperplane-LSH gate honestly reports ≈0 recall (no cluster structure —
    the adversarial case). IVF probes the nprobe nearest coarse cells and
    exact-reranks inside them, so it retains substantial recall on the SAME
    data. Grading both paths through one eval proves the gate
    *discriminates* between index designs rather than merely reporting a
    number — exactly what you need when choosing the index for a 100 TB
    store. Measured on the fixture: IVF recall@10 ≈ nprobe/nlist-bounded
    but well above LSH's ≈0 (pinned in tests/test_clustering.py).
    """
    brute = q_ann_bruteforce(spark, sf_dir).select("qid", "vec_id")
    approx = q_ann_ivf(spark, sf_dir).select(
        "qid", F.col("vec_id").alias("a_vec_id")
    )
    return _recall_contingency(brute, approx)


_ANN_RECALL_IVF_SQL = _recall_sql(_ANN_IVF_SQL)


KM_K = 8           # clusters
KM_SEED_BASE = 100  # deterministic init: embeddings of vec_id 100..107
KM_ITERS = 3        # fixed Lloyd iterations (unrolled in the oracle)


def _km_assign(emb: DataFrame, cents: DataFrame) -> DataFrame:
    """One Lloyd assignment: nearest centroid by cosine, ties to the
    smallest cid. Centroids broadcast (K rows); the window partitions by
    vec_id over exactly K candidate rows each."""
    scored = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "embedding",
        "cid",
        cosine(as_double("embedding"), F.col("c_emb")).alias("sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("sim").desc(), F.col("cid").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "embedding", "cid")
    )


def _km_update(assign: DataFrame) -> DataFrame:
    """One Lloyd update: micro-quantized per-dimension mean (the
    label_centroids determinism trick — exact bigint sums, one final
    division), re-packed into an ordered array."""
    coords = assign.select(
        "cid", F.posexplode("embedding").alias("dim", "x")
    )
    micro = F.floor(F.col("x").cast("double") * F.lit(1000000.0)).cast("long")
    per_dim = (
        coords.groupBy("cid", "dim")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(micro).alias("sm"))
        .select(
            "cid",
            "dim",
            (
                F.col("sm").cast("double")
                / (F.col("n").cast("double") * F.lit(1000000.0))
            ).alias("m"),
        )
    )
    packed = per_dim.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "m"))),
            lambda s: s["m"],
        ).alias("c_emb")
    )
    return packed


def q_kmeans_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means with 8 clusters (KM_K), 3 fixed Lloyd iterations (KM_ITERS),
    deterministic seed centroids — the ITERATIVE-algorithm pattern (the
    trainer `q_ann_ivf` stubs out) made oracle-exact: cosine assignment
    uses the proven sequential-fold ≡ list_dot_product identity, centroid
    means are micro-quantized integer sums (order-independent, engine-
    identical), and the oracle unrolls all the rounds as CTEs.

    Output is the integer signature of the final clustering (sizes +
    vec_id checksums) rather than float centroids, so the driver hash
    compares exact values. Empty clusters drop out naturally (standard
    Lloyd); seeds are real data points so iteration 1 never starts empty.

    Scale shape per iteration: assignment is a broadcast of K centroid
    rows against the store (map-side, no shuffle); the update shuffles
    only (K × dim) partially-summed rows thanks to map-side combine on
    the posexploded coords. The registered form runs
    ``truncate_every=1`` (r18, guide §2.4; lazily fenced since r19 per
    ADVICE — the K-row frame materializes at the next round's broadcast
    instead of a dedicated per-round job): each round's centroid frame
    is ``localCheckpoint``-ed, so every Lloyd round
    executes exactly once — the fully-lazy plan NESTED one full
    assignment+update under the next (analysis cost super-linear in
    iterations, and the store re-scanned per nesting level; measured
    ~4.3 s → ~1.3 s at sf0.1, 22 → 8 Exchanges). Results are IDENTICAL
    (pinned by tests/test_clustering.py::test_kmeans_lineage_truncation,
    which proves the truncated and lazy forms bit-equal). Swap the seeds
    for k-means|| at real scale — the per-iteration plan is unchanged.
    """
    return kmeans_clustering(spark, sf_dir, truncate_every=1)


def kmeans_clustering(
    spark: SparkSession,
    sf_dir: str,
    iters: int = KM_ITERS,
    truncate_every: int = 0,
) -> DataFrame:
    """Parameterized Lloyd loop behind q_kmeans_fixed. ``truncate_every=n``
    localCheckpoints the centroid frame every n updates: results are
    IDENTICAL (checkpointing only swaps lineage for materialized K rows),
    but the logical plan stops nesting — mandatory past ~5 iterations,
    free at any scale because only K × dim values materialize."""
    emb = emb_table(spark, sf_dir).select("vec_id", "embedding")
    cents = emb.where(
        (F.col("vec_id") >= KM_SEED_BASE)
        & (F.col("vec_id") < KM_SEED_BASE + KM_K)
    ).select(
        (F.col("vec_id") - KM_SEED_BASE).cast("int").alias("cid"),
        as_double("embedding").alias("c_emb"),
    )
    assign = None
    for i in range(iters):
        assign = _km_assign(emb, cents)
        if i < iters - 1:
            cents = _km_update(assign)
            if truncate_every and (i + 1) % truncate_every == 0:
                # eager=False (r19, ADVICE r18): construction-laziness
                # parity with every other fence — the K-row frame is
                # materialized by the next round's broadcast instead of
                # a dedicated per-round job; results bit-identical
                # (test_kmeans_lineage_truncation)
                cents = cents.localCheckpoint(eager=False)
    return assign.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum("vec_id").alias("member_checksum"),
    )


def _km_sql() -> str:
    seed = (
        f"SELECT CAST(vec_id - {KM_SEED_BASE} AS INT) AS cid,\n"
        f"       list_transform(embedding, x -> x::DOUBLE) AS c_emb\n"
        f"FROM embeddings WHERE vec_id >= {KM_SEED_BASE}"
        f" AND vec_id < {KM_SEED_BASE + KM_K}"
    )

    def assign(cent_cte: str, out: str) -> str:
        sim = _COS.format(a="e.embedding", b=f"{cent_cte}.c_emb")
        return (
            f"{out} AS (\n"
            f"  SELECT vec_id, embedding, cid FROM (\n"
            f"    SELECT e.vec_id, e.embedding, {cent_cte}.cid,\n"
            f"           ROW_NUMBER() OVER (PARTITION BY e.vec_id\n"
            f"             ORDER BY {sim} DESC, {cent_cte}.cid ASC) AS rn\n"
            f"    FROM embeddings e CROSS JOIN {cent_cte}\n"
            f"  ) WHERE rn = 1\n"
            f")"
        )

    def update(assign_cte: str, out: str) -> str:
        return (
            f"{out} AS (\n"
            f"  SELECT cid, list(m ORDER BY dim) AS c_emb FROM (\n"
            f"    SELECT cid, dim,\n"
            f"           CAST(SUM(micro) AS DOUBLE)\n"
            f"             / (CAST(COUNT(*) AS DOUBLE) * 1000000.0) AS m\n"
            f"    FROM (\n"
            f"      SELECT cid, CAST(i AS INT) - 1 AS dim,\n"
            f"             CAST(FLOOR(embedding[i]::DOUBLE * 1000000.0)"
            f" AS BIGINT) AS micro\n"
            f"      FROM {assign_cte}, unnest(range(1, len(embedding) + 1))"
            f" AS u(i)\n"
            f"    ) GROUP BY cid, dim\n"
            f"  ) GROUP BY cid\n"
            f")"
        )

    ctes = [f"c0 AS (\n{seed}\n)"]
    for i in range(1, KM_ITERS + 1):
        ctes.append(assign(f"c{i - 1}", f"a{i}"))
        if i < KM_ITERS:
            ctes.append(update(f"a{i}", f"c{i}"))
    body = ",\n".join(ctes)
    return (
        f"WITH {body}\n"
        f"SELECT cid, COUNT(*) AS n_members,\n"
        f"       CAST(SUM(vec_id) AS BIGINT) AS member_checksum\n"
        f"FROM a{KM_ITERS} GROUP BY cid"
    )


# --------------------------------------------------------------------------
# product-quantization codebook: per-subspace integer Lloyd + SSE audit
# --------------------------------------------------------------------------

PQ_SUBSPACES = 2   # subspaces over the first PQ_SUBSPACES·PQ_SUBDIM dims
PQ_SUBDIM = 4      # dims per subspace (8 total — the covariance family's slice)
PQ_K = 4           # codes per subspace codebook
PQ_SEED_BASE = 200  # deterministic init: subvectors of vec_id 200..203
PQ_ITERS = 2       # assignment rounds (seed-assign → update → final assign)

_PQ_MICRO = 1_000_000.0


def _pq_subvectors(emb: DataFrame) -> DataFrame:
    """(vec_id, subspace, v) — each embedding's per-subspace slice,
    micro-quantized to exact bigints (``floor(x·10⁶)``, the whitening
    convention). The explode is map-side: |subspaces| rows per vector.

    Malformed-vector contract (round-11 NULL probe, found failing-first):
    a NULL or short (< {PQ_SUBSPACES·PQ_SUBDIM} dims) embedding is
    EXCLUDED here, mirrored by the oracle's ``sub`` CTE guard. Before
    the guard the two engines didn't just diverge — Spark's strict
    ``element_at`` CRASHED the whole query on a 3-dim vector
    (INVALID_ARRAY_INDEX) while a NULL embedding would have ridden
    NULL distances into the assignment window, where Spark orders
    NULLS FIRST and DuckDB NULLS LAST (opposite winners). A malformed
    vector is upstream's data defect to flag, not a codepoint to train
    on."""
    dims = PQ_SUBSPACES * PQ_SUBDIM
    emb = emb.where(
        F.col("embedding").isNotNull() & (F.size("embedding") >= dims))
    parts = F.array(*[
        F.struct(
            F.lit(s).cast("int").alias("subspace"),
            F.transform(
                F.slice("embedding", s * PQ_SUBDIM + 1, PQ_SUBDIM),
                lambda x: F.floor(x.cast("double") * F.lit(_PQ_MICRO))
                .cast("long"),
            ).alias("v"),
        )
        for s in range(PQ_SUBSPACES)
    ])
    return emb.select("vec_id", F.explode(parts).alias("p")).select(
        "vec_id",
        F.col("p.subspace").alias("subspace"),
        F.col("p.v").alias("v"),
    )


def _pq_dist() -> F.Column:
    """Exact integer squared L2 between the micro subvector ``v`` and the
    micro centroid ``c`` — an explicit {PQ_SUBDIM}-term sum, no float
    compare anywhere (the tie order is therefore engine-identical)."""
    terms = [
        (F.element_at("v", i + 1) - F.element_at("c", i + 1)) *
        (F.element_at("v", i + 1) - F.element_at("c", i + 1))
        for i in range(PQ_SUBDIM)
    ]
    d = terms[0]
    for t in terms[1:]:
        d = d + t
    return d.cast("bigint")


def _pq_assign(sub: DataFrame, cents: DataFrame) -> DataFrame:
    """One PQ assignment: nearest codebook entry per (vector, subspace)
    by exact integer squared L2, ties to the smallest code. Codebooks
    broadcast (|subspaces|·K rows); the window partitions by
    (vec_id, subspace) over exactly K candidate rows."""
    scored = sub.join(F.broadcast(cents), "subspace").select(
        "vec_id", "subspace", "v", "code", _pq_dist().alias("dist")
    )
    w = Window.partitionBy("vec_id", "subspace").orderBy(
        F.col("dist").asc(), F.col("code").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "subspace", "v", "code", "dist")
    )


def _pq_update(assign: DataFrame) -> DataFrame:
    """One codebook update: per-(subspace, code, dim) integer mean of the
    micro coordinates (``sum div n`` — Spark ``div`` and DuckDB ``//``
    both truncate toward zero, see SCALE.md §Determinism), re-packed
    into an ordered array. Map-side combine collapses the posexploded
    coords to |subspaces|·K·dims partial rows before the wire."""
    coords = assign.select(
        "subspace", "code", F.posexplode("v").alias("dim", "q")
    )
    per_dim = (
        coords.groupBy("subspace", "code", "dim")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("q").alias("sm"))
        .select("subspace", "code", "dim", F.expr("sm div n").alias("m"))
    )
    return per_dim.groupBy("subspace", "code").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "m"))),
            lambda s: s["m"],
        ).alias("c")
    )


def q_embedding_pq_codebook(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codebook training + assignment audit — the
    ANN-index build step downstream of `embedding_whitening_stats`
    (Jégou et al. 2011, public): the first {PQ_SUBSPACES·PQ_SUBDIM} dims
    split into {PQ_SUBSPACES} subspaces of {PQ_SUBDIM}; each subspace
    learns a {PQ_K}-entry codebook by {PQ_ITERS} fixed Lloyd rounds from
    deterministic data-point seeds (the `kmeans_fixed_iters` recipe),
    and the output is the per-(subspace, code) audit: member count,
    vec_id checksum, and the exact integer SSE in micro² units — the
    reconstruction-error table an index designer reads to size K.

    Everything is EXACT integers end-to-end (stronger than the float
    k-means): coordinates micro-quantize once (``floor(x·10⁶)``),
    distances are explicit integer squared L2, and centroid means are
    truncating integer division — so both engines agree bit-for-bit on
    every assignment including ties, and the oracle unrolls the rounds
    as CTEs with the same arithmetic. Empty codes drop out (standard
    Lloyd); seeds are real subvectors so round 1 never starts empty.

    Scale shape per round: assignment broadcasts |subspaces|·K codebook
    rows against the map-side-exploded store (no shuffle on the store);
    the update shuffles only |subspaces|·K·{PQ_SUBDIM} partially-summed
    rows (map-side combine on the posexploded coords). At real scale
    raise iterations/K and ``localCheckpoint`` the codebook per round
    exactly as :func:`kmeans_clustering` documents — the per-round plan
    is constant-size either way.

    r18 (guide §2.4): lazy fences on ``sub`` (the exploded store feeds
    the seed filter and every round's assignment — unfenced, the plan
    replayed the explode per consumer) and on each round's
    |subspaces|·K-row codebook (unfenced, round i's whole lineage nested
    under round i+1). Pure materialization; assignments, ties, and the
    audit are bit-identical (pinned by the oracle's unrolled CTE chain).
    """
    emb = emb_table(spark, sf_dir).select("vec_id", "embedding")
    sub = _pq_subvectors(emb).localCheckpoint(eager=False)
    cents = sub.where(
        (F.col("vec_id") >= PQ_SEED_BASE)
        & (F.col("vec_id") < PQ_SEED_BASE + PQ_K)
    ).select(
        "subspace",
        (F.col("vec_id") - PQ_SEED_BASE).cast("int").alias("code"),
        F.col("v").alias("c"),
    )
    assign = None
    for i in range(PQ_ITERS):
        assign = _pq_assign(sub, cents)
        if i < PQ_ITERS - 1:
            cents = _pq_update(assign).localCheckpoint(eager=False)
    return assign.groupBy("subspace", "code").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.sum("vec_id").cast("bigint").alias("member_checksum"),
        F.sum("dist").cast("bigint").alias("sum_dist_micro2"),
    )


def _pq_dist_sql(v: str, c: str) -> str:
    """The oracle's explicit integer squared-L2 sum — shared by the
    codebook trainer's CTE chain and the recall eval's ADC lookup."""
    return " + ".join(
        f"({v}[{i}] - {c}[{i}]) * ({v}[{i}] - {c}[{i}])"
        for i in range(1, PQ_SUBDIM + 1)
    )


def _pq_ctes() -> list[str]:
    """The unrolled PQ training CTE chain (sub → c0 → a1 → c1 → … →
    a{PQ_ITERS}) — shared verbatim by the codebook audit oracle and the
    recall-eval oracle so the two can never train different codebooks."""
    dist = _pq_dist_sql

    def assign(cent_cte: str, out: str) -> str:
        return (
            f"{out} AS (\n"
            f"  SELECT vec_id, subspace, v, code, dist FROM (\n"
            f"    SELECT s.vec_id, s.subspace, s.v, c.code,\n"
            f"           CAST({dist('s.v', 'c.c')} AS BIGINT) AS dist,\n"
            f"           ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.subspace\n"
            f"             ORDER BY {dist('s.v', 'c.c')} ASC, c.code ASC)"
            f" AS rn\n"
            f"    FROM sub s JOIN {cent_cte} c ON c.subspace = s.subspace\n"
            f"  ) WHERE rn = 1\n"
            f")"
        )

    def update(assign_cte: str, out: str) -> str:
        return (
            f"{out} AS (\n"
            f"  SELECT subspace, code, list(m ORDER BY dim) AS c FROM (\n"
            f"    SELECT subspace, code, CAST(i AS INT) AS dim,\n"
            f"           CAST(SUM(v[i]) AS BIGINT) // COUNT(*) AS m\n"
            f"    FROM {assign_cte}, unnest(range(1, {PQ_SUBDIM + 1})) u(i)\n"
            f"    GROUP BY 1, 2, 3\n"
            f"  ) GROUP BY 1, 2\n"
            f")"
        )

    ctes = [
        f"""sub AS (
  SELECT vec_id, CAST(s.subspace AS INT) AS subspace,
         list_transform(
           embedding[s.subspace * {PQ_SUBDIM} + 1
                     : s.subspace * {PQ_SUBDIM} + {PQ_SUBDIM}],
           x -> CAST(FLOOR(x::DOUBLE * {_PQ_MICRO}) AS BIGINT)) AS v
  FROM embeddings
  CROSS JOIN (SELECT unnest(range({PQ_SUBSPACES})) AS subspace) s
  WHERE embedding IS NOT NULL
    AND len(embedding) >= {PQ_SUBSPACES * PQ_SUBDIM}
)""",
        f"""c0 AS (
  SELECT subspace, CAST(vec_id - {PQ_SEED_BASE} AS INT) AS code, v AS c
  FROM sub WHERE vec_id >= {PQ_SEED_BASE}
    AND vec_id < {PQ_SEED_BASE + PQ_K}
)""",
    ]
    for i in range(1, PQ_ITERS + 1):
        ctes.append(assign(f"c{i - 1}", f"a{i}"))
        if i < PQ_ITERS:
            ctes.append(update(f"a{i}", f"c{i}"))
    return ctes


def _pq_sql() -> str:
    body = ",\n".join(_pq_ctes())
    return (
        f"WITH {body}\n"
        f"SELECT subspace, code, CAST(COUNT(*) AS BIGINT) AS n_members,\n"
        f"       CAST(SUM(vec_id) AS BIGINT) AS member_checksum,\n"
        f"       CAST(SUM(dist) AS BIGINT) AS sum_dist_micro2\n"
        f"FROM a{PQ_ITERS} GROUP BY 1, 2"
    )


_PQ_SQL = _pq_sql()


def q_embedding_pq_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k gate for the PQ/ADC path — the consumer that makes
    `embedding_pq_codebook` earn its keep (r10 verdict item #1): train
    the SAME {PQ_ITERS}-round exact-integer codebook (identical helper
    calls, identical seeds), PQ-ENCODE the store — each vector collapses
    to {PQ_SUBSPACES} small codes, the 256-bytes-of-floats → 2-bytes
    memory story that lets a 100 TB store's index live in RAM — then
    score every probe by ASYMMETRIC distance (ADC, Jégou et al. 2011,
    public: exact integer squared L2 between the probe's RAW micro
    subvector and each candidate's centroid, summed over subspaces) and
    grade the approximate top-{TOP_K} against the exact brute-force
    cosine top-{TOP_K} with the SAME per-probe contingency as
    `ann_recall_eval{,_ivf}` (recall@k = n_hits / n_brute).

    Grading three index designs through ONE contingency (hyperplane LSH
    ≈ 0 on this clusterless fixture, IVF well above it, and now PQ-ADC
    over {PQ_SUBSPACES}·{PQ_SUBDIM} of 64 dims at {PQ_K} codes each) is
    what proves the gate DISCRIMINATES: the PQ number isolates pure
    quantization loss — tiny K on a prefix slice — rather than probe
    miss, which is exactly the trade an index designer reads this table
    to size (raise K / subspaces until recall clears the bar).

    All-integer determinism: distances and ties ((adc_dist, vec_id)
    ascending) are exact ints on both engines; the oracle reuses the
    codebook trainer's unrolled CTE chain verbatim (``_pq_ctes``) plus
    `_recall_sql`'s contingency, so the two queries can never train
    different codebooks.

    Scale shape: training/encode is the codebook query's plan (broadcast
    codebooks per Lloyd round; the encode is ONE groupBy collapse of the
    final assignment to (vec_id, code₀..)); the ADC lookup table is
    |probes|·{PQ_SUBSPACES}·{PQ_K} rows (probe-capped — built by joining
    the probe subvectors against the broadcast codebook); scoring is
    {PQ_SUBSPACES} BROADCAST hash joins of the encoded store against LUT
    slices plus an integer add — map-side on the encoded store, no
    per-pair vector arithmetic anywhere (pinned:
    tests/test_plans.py::test_pq_recall_adc_joins_are_broadcast).
    """
    # r18 (guide §2.4), same fences as the codebook trainer: ``sub``
    # feeds the seed filter, every assignment round, AND ``probes``;
    # each round's tiny codebook otherwise nests the prior round's
    # whole lineage under the next plan. Bit-identical training.
    emb = emb_table(spark, sf_dir).select("vec_id", "embedding")
    sub = _pq_subvectors(emb).localCheckpoint(eager=False)
    cents = sub.where(
        (F.col("vec_id") >= PQ_SEED_BASE)
        & (F.col("vec_id") < PQ_SEED_BASE + PQ_K)
    ).select(
        "subspace",
        (F.col("vec_id") - PQ_SEED_BASE).cast("int").alias("code"),
        F.col("v").alias("c"),
    )
    assign = None
    for i in range(PQ_ITERS):
        assign = _pq_assign(sub, cents)
        if i < PQ_ITERS - 1:
            cents = _pq_update(assign).localCheckpoint(eager=False)
    # cents is now the FINAL codebook — the one the final assignment used
    enc = assign.groupBy("vec_id").agg(*[
        F.max(F.when(F.col("subspace") == s, F.col("code")))
        .cast("int").alias(f"code{s}")
        for s in range(PQ_SUBSPACES)
    ])
    probes = sub.where(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("qid"), "subspace", "v"
    )
    # ADC lookup table: one exact integer distance per
    # (probe, subspace, code) — |probes|·|subspaces|·K rows
    lut = probes.join(F.broadcast(cents), "subspace").select(
        "qid", "subspace", "code", _pq_dist().alias("d")
    ).localCheckpoint(eager=False)  # one slice per subspace reads it
    scored = enc
    for s in range(PQ_SUBSPACES):
        lut_s = lut.where(F.col("subspace") == s).select(
            "qid", F.col("code").alias(f"code{s}"), F.col("d").alias(f"d{s}")
        )
        scored = scored.join(
            F.broadcast(lut_s),
            [f"code{s}"] if s == 0 else ["qid", f"code{s}"],
        )
    adc_dist = F.col("d0")
    for s in range(1, PQ_SUBSPACES):
        adc_dist = adc_dist + F.col(f"d{s}")
    ranked = scored.where(F.col("vec_id") != F.col("qid")).select(
        "qid", "vec_id", adc_dist.cast("bigint").alias("adc_dist")
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("adc_dist").asc(), F.col("vec_id").asc())
    approx = (
        ranked.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= TOP_K)
        .select("qid", F.col("vec_id").alias("a_vec_id"))
        # the contingency reads approx TWICE (hit join + size agg);
        # without the checkpoint the whole training loop re-runs
        .localCheckpoint(eager=False)
    )
    brute = q_ann_bruteforce(spark, sf_dir).select("qid", "vec_id")
    return _recall_contingency(brute, approx)


def _pq_approx_sql() -> str:
    """The ADC approximate top-k as a standalone query (its own WITH
    chain), shaped for `_recall_sql`'s ``approx`` slot."""
    enc_cols = ",\n         ".join(
        f"MAX(CASE WHEN subspace = {s} THEN code END) AS code{s}"
        for s in range(PQ_SUBSPACES)
    )
    lut_joins = "\n  ".join(
        f"JOIN lut l{s} ON l{s}.subspace = {s} AND l{s}.code = e.code{s}"
        + ("" if s == 0 else f" AND l{s}.qid = l0.qid")
        for s in range(PQ_SUBSPACES)
    )
    adc = " + ".join(f"l{s}.d" for s in range(PQ_SUBSPACES))
    body = ",\n".join(_pq_ctes())
    return f"""
WITH {body},
enc AS (
  SELECT vec_id,
         {enc_cols}
  FROM a{PQ_ITERS} GROUP BY 1
),
probes AS (
  SELECT vec_id AS qid, subspace, v FROM sub
  WHERE vec_id < {N_QUERY_VECS}
),
lut AS (
  SELECT p.qid, p.subspace, c.code,
         CAST({_pq_dist_sql('p.v', 'c.c')} AS BIGINT) AS d
  FROM probes p JOIN c{PQ_ITERS - 1} c ON c.subspace = p.subspace
),
scored AS (
  SELECT l0.qid, e.vec_id, CAST({adc} AS BIGINT) AS adc_dist
  FROM enc e
  {lut_joins}
  WHERE e.vec_id <> l0.qid
)
SELECT qid, vec_id FROM (
  SELECT qid, vec_id,
         ROW_NUMBER() OVER (PARTITION BY qid
           ORDER BY adc_dist ASC, vec_id ASC) AS rnk
  FROM scored
) WHERE rnk <= {TOP_K}
"""


_PQ_RECALL_SQL = _recall_sql(_pq_approx_sql())


RP_K = 8  # target dims for the random-projection sketch

#: Deterministic Rademacher (+/-1) sign matrix for the JL projection,
#: derived from md5 in PYTHON at import time — both engines receive the
#: SAME literals, so no hash function has to agree across engines.
import hashlib as _hashlib

_RP_SIGNS: tuple[tuple[int, ...], ...] = tuple(
    tuple(
        1 if int(_hashlib.md5(f"rp:{i}:{j}".encode()).hexdigest(), 16) % 2 == 0
        else -1
        for j in range(RP_K)
    )
    for i in range(64)
)


def q_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss random projection: 64-dim embeddings sketched
    to RP_K=8 dims with a Rademacher (+/-1) sign matrix (Achlioptas 2003 —
    database-friendly random projections). The cheap-ANN / near-dup
    pre-filter primitive: distances are approximately preserved at 1/8 the
    vector width, so a 100 TB store can be first bucketed/pruned in sketch
    space and only candidates touch the full vectors.

    Float discipline: each coordinate is micro-quantized (floor ×1e6 —
    one float multiply + floor, engine-identical) BEFORE the signed sum,
    so every projection is an integer sum — order-independent, bit-exact.
    Plan: a pure map-side projection (in-row zip_with/aggregate folds) —
    ZERO shuffles, no explode; the sketch rides along with whatever scan
    already reads the store (pinned, tests/test_plans.py).
    """
    emb = emb_table(spark, sf_dir)
    micro = F.transform(
        as_double("embedding"),
        lambda x: F.floor(x * F.lit(1000000.0)).cast("long"),
    )
    base = emb.select("vec_id", "label", micro.alias("m"))
    projs = []
    for j in range(RP_K):
        signs = F.array(
            *[F.lit(_RP_SIGNS[i][j]).cast("long") for i in range(64)]
        )
        pj = F.aggregate(
            F.zip_with(F.col("m"), signs, lambda m, s: m * s),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        projs.append(pj.alias(f"proj_{j}"))
    return base.select("vec_id", "label", *projs)


def _rp_sql() -> str:
    cols = []
    for j in range(RP_K):
        terms = " + ".join(
            f"({_RP_SIGNS[i][j]})*CAST(FLOOR(embedding[{i + 1}]::DOUBLE"
            f"*1000000) AS BIGINT)"
            for i in range(64)
        )
        cols.append(f"CAST({terms} AS BIGINT) AS proj_{j}")
    return "SELECT vec_id, label,\n  " + ",\n  ".join(cols) + "\nFROM embeddings"


_RANDOM_PROJECTION_SQL = _rp_sql()


SEM_TAU = 0.30  # within-cell cosine above which the higher-id vec is pruned


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): coarse-quantize the embedding store into cells,
    compute pairwise cosine ONLY within each cell, and prune the higher-id
    member of every pair above SEM_TAU (0.30). Output is the per-cell
    audit a corpus build records: member count, above-threshold pair
    count, pruned count, and a pruned-id checksum.

    The cells are the IVF coarse quantizer's (same deterministic seed
    centroids as q_ann_ivf, so the oracle stays exact; at scale they come
    from k-means|| and `nlist` grows with the corpus so expected cell
    width stays bounded). The within-cell pairing goes through
    :func:`~tfm_taxitrips_spark.operators.pairs.bucket_pairs` — the same
    salted, width-capped expansion the MinHash-LSH path uses — so a
    degenerate cell (every vector near one centroid) fans out across
    tasks instead of materializing an O(w²) batch on one core; the pair
    SET is provably identical to the plain self-join the oracle runs.
    No all-pairs path exists at any corpus shape.
    """
    emb = emb_table(spark, sf_dir)
    cents = emb.where(
        (F.col("vec_id") >= N_QUERY_VECS)
        & (F.col("vec_id") < N_QUERY_VECS + IVF_NLIST)
    ).select(
        (F.col("vec_id") - N_QUERY_VECS).alias("cid"),
        F.col("embedding").alias("c_embedding"),
    )
    scored = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "embedding",
        "cid",
        cosine(as_double("embedding"), as_double("c_embedding")).alias("c_sim"),
    )
    wv = Window.partitionBy("vec_id").orderBy(
        F.col("c_sim").desc(), F.col("cid").asc()
    )
    # r18 (guide §2.4): `assign` feeds the pair expansion AND the member
    # count, and `pairs` (below) feeds the pair count AND the pruned-set
    # aggregate — lazy localCheckpoint fences compute each once instead
    # of replaying the centroid-scoring window (resp. the bucket_pairs
    # expansion) per consumer. Pure materialization, results identical.
    assign = (
        scored.withColumn("crn", F.row_number().over(wv))
        .where(F.col("crn") == 1)
        .select(
            "cid",
            "vec_id",
            as_double("embedding").alias("emb"),
            l2_norm(as_double("embedding")).alias("nrm"),
        )
        .localCheckpoint(eager=False)
    )
    from tfm_taxitrips_spark.operators.pairs import bucket_pairs

    item = F.struct(
        F.col("cid").alias("cid"),
        F.col("vec_id").alias("vec_id"),
        F.col("emb").alias("emb"),
        F.col("nrm").alias("nrm"),
    )
    pairs = (
        bucket_pairs(assign, ["cid"], item)
        .select(
            F.col("p.a.cid").alias("cid"),
            F.col("p.a.vec_id").alias("va"),
            F.col("p.b.vec_id").alias("vb"),
            (
                dot(F.col("p.a.emb"), F.col("p.b.emb"))
                / (F.col("p.a.nrm") * F.col("p.b.nrm"))
            ).alias("sim"),
        )
        .where(F.col("sim") >= SEM_TAU)
        .localCheckpoint(eager=False)
    )
    members = assign.groupBy("cid").agg(F.count(F.lit(1)).alias("n_members"))
    pair_agg = pairs.groupBy("cid").agg(F.count(F.lit(1)).alias("n_dup_pairs"))
    pruned = (
        pairs.select("cid", "vb").distinct()
        .groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n_pruned"),
            F.sum("vb").alias("pruned_checksum"),
        )
    )
    return (
        members.join(F.broadcast(pair_agg), "cid", "left")
        .join(F.broadcast(pruned), "cid", "left")
        .select(
            "cid",
            "n_members",
            F.coalesce("n_dup_pairs", F.lit(0)).cast("bigint").alias("n_dup_pairs"),
            F.coalesce("n_pruned", F.lit(0)).cast("bigint").alias("n_pruned"),
            F.coalesce("pruned_checksum", F.lit(0)).cast("bigint").alias(
                "pruned_checksum"
            ),
        )
    )


_SEMDEDUP_SQL = f"""
WITH cents AS (
  SELECT vec_id - {N_QUERY_VECS} AS cid, embedding AS c_embedding
  FROM embeddings
  WHERE vec_id >= {N_QUERY_VECS} AND vec_id < {N_QUERY_VECS + IVF_NLIST}
),
scored AS (
  SELECT e.vec_id, e.embedding, c.cid,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
           ORDER BY {_COS.format(a='e.embedding', b='c.c_embedding')} DESC,
                    c.cid ASC) AS crn
  FROM embeddings e CROSS JOIN cents c
),
assign AS (SELECT vec_id, embedding, cid FROM scored WHERE crn = 1),
pairs AS (
  SELECT a.cid, a.vec_id AS va, b.vec_id AS vb
  FROM assign a JOIN assign b ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE {_COS.format(a='a.embedding', b='b.embedding')} >= {SEM_TAU}
),
members AS (SELECT cid, COUNT(*) AS n_members FROM assign GROUP BY 1),
pa AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_dup_pairs FROM pairs GROUP BY 1),
pr AS (
  SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_pruned,
         CAST(SUM(vb) AS BIGINT) AS pruned_checksum
  FROM (SELECT DISTINCT cid, vb FROM pairs) GROUP BY 1
)
SELECT m.cid, m.n_members,
       COALESCE(pa.n_dup_pairs, 0) AS n_dup_pairs,
       COALESCE(pr.n_pruned, 0) AS n_pruned,
       COALESCE(pr.pruned_checksum, 0) AS pruned_checksum
FROM members m
LEFT JOIN pa ON pa.cid = m.cid
LEFT JOIN pr ON pr.cid = m.cid
"""


def q_retrieval_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-relevance retrieval eval: per probe, the mean-reciprocal-rank
    statistic of the exact cosine top-k, treating "same label as the
    probe" as relevance — the second acceptance gate (after recall@k)
    a similarity deployment reports, because recall measures agreement
    with brute force while MRR measures whether the ranking surfaces
    RELEVANT items at all.

    Composes the already-oracle-proven q_ann_bruteforce ranking; the eval
    adds one broadcast probe-label join and a per-qid aggregate. All
    outputs integer (mrr_ppm = 1e6 div first_hit_rank, 0 when no hit in
    the top-k), so the driver hash compare is exact. On the uniform
    random fixture labels are independent of geometry, so MRR hovers
    near the by-chance level — like the LSH recall gate, the honest
    reading IS the gate's value.
    """
    brute = q_ann_bruteforce(spark, sf_dir)
    emb = emb_table(spark, sf_dir)
    probes = emb.where(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("qid"), F.col("label").alias("probe_label")
    )
    j = brute.join(F.broadcast(probes), "qid")
    per_q = j.groupBy("qid", "probe_label").agg(
        F.min(F.when(F.col("label") == F.col("probe_label"), F.col("rnk")))
        .cast("int").alias("first_hit_rank"),
        F.count(F.when(F.col("label") == F.col("probe_label"), F.lit(1)))
        .cast("bigint").alias("n_label_hits"),
    )
    return per_q.select(
        "qid",
        "probe_label",
        "first_hit_rank",
        "n_label_hits",
        F.coalesce(
            F.expr(f"{10**6} div first_hit_rank"), F.lit(0)
        ).cast("bigint").alias("mrr_ppm"),
    )


_MRR_SQL = f"""
WITH base AS ({_ANN_BRUTE_SQL}),
probes AS (
  SELECT vec_id AS qid, label AS probe_label FROM embeddings
  WHERE vec_id < {N_QUERY_VECS}
),
per_q AS (
  SELECT b.qid, p.probe_label,
         CAST(MIN(CASE WHEN b.label = p.probe_label THEN b.rnk END) AS INT)
           AS first_hit_rank,
         CAST(COUNT(CASE WHEN b.label = p.probe_label THEN 1 END) AS BIGINT)
           AS n_label_hits
  FROM base b JOIN probes p ON b.qid = p.qid
  GROUP BY 1, 2
)
SELECT qid, probe_label, first_hit_rank, n_label_hits,
       CAST(COALESCE({10**6} // first_hit_rank, 0) AS BIGINT) AS mrr_ppm
FROM per_q
"""


def q_centroid_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding distribution-shift monitor: per label, the squared
    distance between the centroids of the corpus's two halves (vec_id
    parity stands in for before/after ingestion batches) — the drift
    check an embedding pipeline runs before trusting that a re-ingested
    or re-encoded corpus still lands where the old one did.

    Integer-exact comparison of two RATIONAL centroids: with per-half
    per-dim sums s and counts n (milli-quantized coordinates — floor
    (x·1e3), chosen so the cross-multiplied squares stay inside BIGINT
    at 64 dims), the per-dim difference (s_a/n_a − s_b/n_b) cross-
    multiplies to (s_a·n_b − s_b·n_a), and ``shift_num = Σ_d (s_a·n_b −
    s_b·n_a)²`` is an exact integer whose normalized value is
    shift_num/(n_a·n_b)²·1e-6 in coordinate units². No division ever
    happens, so no rounding boundary exists to disagree across engines.

    Scale shape: posexplode is map-side and the ONE aggregation's
    partial combine reduces each task to |labels|·dim rows before the
    single exchange (the `label_centroids` shape); both halves come from
    conditional aggregation — no self-join. Labels present in only one
    half are excluded (no centroid to compare).
    """
    emb = emb_table(spark, sf_dir)
    coords = emb.select(
        "label",
        (F.col("vec_id") % 2 == 0).alias("is_a"),
        F.posexplode("embedding").alias("dim", "x"),
    )
    milli = F.floor(F.col("x").cast("double") * F.lit(1000.0)).cast("long")
    per_dim = coords.groupBy("label", "dim").agg(
        F.count(F.when(F.col("is_a"), 1)).cast("bigint").alias("n_a"),
        F.coalesce(F.sum(F.when(F.col("is_a"), milli)), F.lit(0))
        .cast("bigint").alias("s_a"),
        F.count(F.when(~F.col("is_a"), 1)).cast("bigint").alias("n_b"),
        F.coalesce(F.sum(F.when(~F.col("is_a"), milli)), F.lit(0))
        .cast("bigint").alias("s_b"),
    )
    d = F.col("s_a") * F.col("n_b") - F.col("s_b") * F.col("n_a")
    return (
        per_dim.where((F.col("n_a") > 0) & (F.col("n_b") > 0))
        .groupBy("label")
        .agg(
            F.max("n_a").cast("bigint").alias("n_a"),
            F.max("n_b").cast("bigint").alias("n_b"),
            F.sum(d * d).cast("bigint").alias("shift_num"),
        )
    )


_CENTROID_SHIFT_SQL = """
WITH coords AS (
  SELECT label, vec_id % 2 = 0 AS is_a, CAST(i AS INT) - 1 AS dim,
         CAST(FLOOR(embedding[i]::DOUBLE * 1000.0) AS BIGINT) AS milli
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
),
per_dim AS (
  SELECT label, dim,
         CAST(COUNT(*) FILTER (WHERE is_a) AS BIGINT) AS n_a,
         CAST(COALESCE(SUM(milli) FILTER (WHERE is_a), 0) AS BIGINT) AS s_a,
         CAST(COUNT(*) FILTER (WHERE NOT is_a) AS BIGINT) AS n_b,
         CAST(COALESCE(SUM(milli) FILTER (WHERE NOT is_a), 0) AS BIGINT) AS s_b
  FROM coords GROUP BY 1, 2
)
SELECT label,
       CAST(MAX(n_a) AS BIGINT) AS n_a,
       CAST(MAX(n_b) AS BIGINT) AS n_b,
       CAST(SUM((s_a * n_b - s_b * n_a) * (s_a * n_b - s_b * n_a))
            AS BIGINT) AS shift_num
FROM per_dim
WHERE n_a > 0 AND n_b > 0
GROUP BY 1
"""


_COV_DIMS = 8
_COV_SCALE = 1_000_000.0


def q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE covariance sufficient statistics for the embedding
    table's leading 8-dimension block — the whitening / PCA input
    (n, Σxᵢ, Σxⱼ, Σxᵢxⱼ per dimension pair) computed exactly in integer
    micro-units (``floor(x·1e6)``, the repo's standard quantization).
    Emitting SUFFICIENT STATISTICS rather than the covariance itself is
    the 100 TB contract: the per-pair partials are associative integer
    sums, so per-partition states merge across any repartitioning, new
    data folds in without a re-scan, and no float accumulation order can
    flip a bit. Deriving the covariance is one driver-side division per
    pair (36 of them) — never a data-side operation.

    Scale shape: ONE scan; the 36 pair cells explode map-side and
    collapse immediately in the map-side-combined aggregate, so the only
    shuffle carries ≤ 36 partial rows per task regardless of corpus
    size. No join, no window. (A full d×d Gram at higher dimension would
    go through a BLAS-backed ``mapInPandas`` accumulating per-batch
    outer products — same mergeable-partials contract, documented here
    as the scale-out path; the exact-integer form is the leading-block
    gate both engines can verify bit-for-bit.)
    """
    emb = emb_table(spark, sf_dir)
    micro = F.transform(
        F.slice("embedding", 1, _COV_DIMS),
        lambda x: F.floor(x.cast("double") * F.lit(_COV_SCALE)).cast("long"),
    )
    base = emb.select(micro.alias("q"))
    cells = []
    for i in range(_COV_DIMS):
        for j in range(i, _COV_DIMS):
            qi = F.element_at("q", i + 1)
            qj = F.element_at("q", j + 1)
            cells.append(F.struct(
                F.lit(i).alias("i"), F.lit(j).alias("j"),
                qi.alias("qi"), qj.alias("qj"),
            ))
    ex = base.select(F.explode(F.array(*cells)).alias("c")).select(
        "c.i", "c.j", "c.qi", "c.qj")
    # DECIMAL(38,0) accumulators rendered as exact integer STRINGS:
    # Σqᵢqⱼ exceeds int64 past ~1e7 rows of unit-scale micro products
    # (the silent-wrap regime the exactness claim must survive), and
    # >18-digit decimals lose exactness through pandas/Arrow as numbers
    # — the string form is the lossless wire format on both engines
    # (DuckDB mirrors with HUGEINT sums cast to VARCHAR).
    d38 = "decimal(38,0)"
    return ex.groupBy("i", "j").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.sum(F.col("qi").cast(d38)).cast(d38).cast("string").alias("sum_i"),
        F.sum(F.col("qj").cast(d38)).cast(d38).cast("string").alias("sum_j"),
        F.sum((F.col("qi") * F.col("qj")).cast(d38)).cast(d38).cast("string")
        .alias("sum_ij"),
    )


_EMB_COV_SQL = f"""
WITH q AS (
  SELECT list_transform(embedding[1:{_COV_DIMS}],
           x -> CAST(FLOOR(CAST(x AS DOUBLE) * {_COV_SCALE}) AS BIGINT)) AS q
  FROM embeddings
),
p AS (
  SELECT CAST(ti.x AS INTEGER) AS i, CAST(tj.x AS INTEGER) AS j,
         q[CAST(ti.x AS INTEGER) + 1] AS qi,
         q[CAST(tj.x AS INTEGER) + 1] AS qj
  FROM q, range({_COV_DIMS}) ti(x), range({_COV_DIMS}) tj(x)
  WHERE tj.x >= ti.x
)
SELECT i, j, CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(CAST(SUM(qi) AS HUGEINT) AS VARCHAR) AS sum_i,
       CAST(CAST(SUM(qj) AS HUGEINT) AS VARCHAR) AS sum_j,
       CAST(CAST(SUM(qi * qj) AS HUGEINT) AS VARCHAR) AS sum_ij
FROM p GROUP BY 1, 2
"""


_WHITEN_TOP_OFFENDERS = 3


def q_embedding_whitening_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decision layer a whitening / PCA-preprocessing step runs over
    `embedding_covariance`'s sufficient statistics: every DIAGONAL cell
    (the per-dimension mean/variance inputs — n, Σxᵢ, Σxᵢ²) plus the
    top-3 OFF-DIAGONAL offenders by |covariance numerator|
    ``n·Σxᵢxⱼ − Σxᵢ·Σxⱼ`` — the dimension pairs most in need of
    decorrelation before an index build treats dimensions as
    independent. Same integer micro-unit quantization and DECIMAL(38,0)
    accumulators (rendered as exact strings — the lossless wire format);
    the cov numerator is the n²-scaled covariance, sign-exact, so the
    offender ranking never runs a float. Overflow headroom: |q| ≤ 10⁶,
    n ≤ 10¹² ⇒ Σqᵢqⱼ ≤ 10²⁴ and n·Σqᵢqⱼ ≤ 10³⁶ < 10³⁸ (DECIMAL(38,0)
    Spark-side, HUGEINT < 1.7·10³⁸ DuckDB-side).

    Scale shape: identical to `embedding_covariance` — ONE scan, 36 pair
    cells explode map-side and collapse in the map-side-combined
    aggregate (≤ 36 partial rows per task on the wire); the offender
    ranking window then runs over the 28-row off-diagonal relation
    (aggregate-sized, the deliberate cardinality-collapsed choice).
    """
    emb = emb_table(spark, sf_dir)
    micro = F.transform(
        F.slice("embedding", 1, _COV_DIMS),
        lambda x: F.floor(x.cast("double") * F.lit(_COV_SCALE)).cast("long"),
    )
    base = emb.select(micro.alias("q"))
    cells = []
    for i in range(_COV_DIMS):
        for j in range(i, _COV_DIMS):
            qi = F.element_at("q", i + 1)
            qj = F.element_at("q", j + 1)
            cells.append(F.struct(
                F.lit(i).alias("i"), F.lit(j).alias("j"),
                qi.alias("qi"), qj.alias("qj"),
            ))
    ex = base.select(F.explode(F.array(*cells)).alias("c")).select(
        "c.i", "c.j", "c.qi", "c.qj")
    d38 = "decimal(38,0)"
    stats = (
        ex.groupBy("i", "j")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.sum(F.col("qi").cast(d38)).cast(d38).alias("si"),
            F.sum(F.col("qj").cast(d38)).cast(d38).alias("sj"),
            F.sum((F.col("qi") * F.col("qj")).cast(d38)).cast(d38).alias("sij"),
        )
        .withColumn(
            "cov_num",
            (F.col("n_vecs").cast(d38) * F.col("sij")
             - F.col("si") * F.col("sj")).cast(d38),
        )
        # 36-row aggregate feeds two consumers (diagonal slice + ranked
        # off-diagonals) — checkpoint so the scan runs once
        .localCheckpoint(eager=False)
    )
    diag = stats.where(F.col("i") == F.col("j"))
    w = Window.orderBy(
        F.abs(F.col("cov_num")).desc(), F.col("i").asc(), F.col("j").asc())
    offenders = (
        stats.where(F.col("i") != F.col("j"))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= _WHITEN_TOP_OFFENDERS)
        .drop("_rn")
    )

    def render(df: DataFrame, is_diag: int) -> DataFrame:
        return df.select(
            "i", "j", "n_vecs",
            F.col("si").cast("string").alias("sum_i"),
            F.col("sj").cast("string").alias("sum_j"),
            F.col("sij").cast("string").alias("sum_ij"),
            F.col("cov_num").cast("string").alias("cov_num"),
            F.lit(is_diag).alias("is_diagonal"),
        )

    return render(diag, 1).unionByName(render(offenders, 0))


_WHITEN_SQL = f"""
WITH q AS (
  SELECT list_transform(embedding[1:{_COV_DIMS}],
           x -> CAST(FLOOR(CAST(x AS DOUBLE) * {_COV_SCALE}) AS BIGINT)) AS q
  FROM embeddings
),
p AS (
  SELECT CAST(ti.x AS INTEGER) AS i, CAST(tj.x AS INTEGER) AS j,
         q[CAST(ti.x AS INTEGER) + 1] AS qi,
         q[CAST(tj.x AS INTEGER) + 1] AS qj
  FROM q, range({_COV_DIMS}) ti(x), range({_COV_DIMS}) tj(x)
  WHERE tj.x >= ti.x
),
s AS (
  SELECT i, j, CAST(COUNT(*) AS BIGINT) AS n_vecs,
         CAST(SUM(qi) AS HUGEINT) AS si,
         CAST(SUM(qj) AS HUGEINT) AS sj,
         CAST(SUM(qi * qj) AS HUGEINT) AS sij
  FROM p GROUP BY 1, 2
),
x AS (
  SELECT *, CAST(n_vecs AS HUGEINT) * sij - si * sj AS cov_num FROM s
),
offenders AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY abs(cov_num) DESC, i ASC, j ASC)
              AS rn
  FROM x WHERE i <> j
)
SELECT i, j, n_vecs,
       CAST(si AS VARCHAR) AS sum_i, CAST(sj AS VARCHAR) AS sum_j,
       CAST(sij AS VARCHAR) AS sum_ij, CAST(cov_num AS VARCHAR) AS cov_num,
       1 AS is_diagonal
FROM x WHERE i = j
UNION ALL
SELECT i, j, n_vecs, CAST(si AS VARCHAR), CAST(sj AS VARCHAR),
       CAST(sij AS VARCHAR), CAST(cov_num AS VARCHAR), 0 AS is_diagonal
FROM offenders WHERE rn <= {_WHITEN_TOP_OFFENDERS}
"""


def q_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each probe
    vector, the TOP_K most-similar embeddings with a DIFFERENT label —
    the near-misses that make embedding models learn (random negatives
    are trivially separable; hard negatives carry the gradient signal).

    Composition of proven parts: the capped brute-force cosine shape of
    :func:`q_ann_bruteforce` (broadcast probes, one store pass, the
    deliberate capped BNLJ) plus a label-disagreement predicate IN the
    join condition — the filter prunes pairs before scoring, not after
    ranking, so a label-skewed store never wastes rank slots. At corpus
    scale the same label filter composes with the LSH/IVF bucket
    equi-joins (mine negatives inside each bucket), exactly like the
    exact-vs-bucketed split for ANN; this registered form is the exact
    path the bucketed miner is validated against.
    """
    scored = _brute_force_scored(spark, sf_dir, negatives_only=True).select(
        "qid", "q_label", "vec_id",
        F.col("label").alias("neg_label"), "cosine_sim",
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("cosine_sim").desc(), F.col("vec_id").asc())
    return scored.withColumn(
        "rnk", F.row_number().over(w)).where(F.col("rnk") <= TOP_K)


_HARD_NEG_SQL = f"""
WITH q AS (
  SELECT vec_id AS qid, label AS q_label, embedding AS q_embedding
  FROM embeddings WHERE vec_id < {N_QUERY_VECS}
),
scored AS (
  SELECT q.qid, q.q_label, e.vec_id, e.label AS neg_label,
         list_dot_product(q.q_embedding::DOUBLE[], e.embedding::DOUBLE[])
           / (sqrt(list_dot_product(q.q_embedding::DOUBLE[], q.q_embedding::DOUBLE[]))
              * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))) AS cosine_sim
  FROM embeddings e
  JOIN q ON e.vec_id <> q.qid AND e.label <> q.q_label
)
SELECT * FROM (
  SELECT qid, q_label, vec_id, neg_label, cosine_sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid
              ORDER BY cosine_sim DESC, vec_id ASC) AS INT) AS rnk
  FROM scored
) WHERE rnk <= {TOP_K}
"""


QUERIES: dict[str, QuerySpec] = {
    "hard_negative_mining": QuerySpec(
        q_hard_negative_mining, _emb_guard_sql(_HARD_NEG_SQL),
        tags=("vector", "training", "topk"),
    ),
    "embedding_whitening_stats": QuerySpec(
        q_embedding_whitening_stats, _emb_guard_sql(_WHITEN_SQL),
        tags=("vectors", "stats", "audit")),
    "embedding_pq_codebook": QuerySpec(
        q_embedding_pq_codebook, _emb_guard_sql(_PQ_SQL),
        tags=("vector", "compression", "iterative", "pipeline")),
    "embedding_pq_recall_eval": QuerySpec(
        q_embedding_pq_recall_eval, _emb_guard_sql(_PQ_RECALL_SQL),
        tags=("vector", "compression", "eval")),
    "embedding_covariance": QuerySpec(
        q_embedding_covariance, _emb_guard_sql(_EMB_COV_SQL),
        tags=("vector", "stats", "pipeline"),
    ),
    "random_projection_sketch": QuerySpec(
        q_random_projection, _emb_guard_sql(_RANDOM_PROJECTION_SQL),
        tags=("vector", "compression", "pipeline"),
    ),
    "semantic_dedup_prune": QuerySpec(
        q_semantic_dedup, _emb_guard_sql(_SEMDEDUP_SQL), tags=("vector", "dedup", "pipeline")
    ),
    "kmeans_fixed_iters": QuerySpec(
        q_kmeans_fixed, _emb_guard_sql(_km_sql()), tags=("vector", "clustering", "iterative")
    ),
    "ann_recall_eval": QuerySpec(
        q_ann_recall_eval, _emb_guard_sql(_ANN_RECALL_SQL), tags=("vector", "eval")
    ),
    "ann_recall_eval_ivf": QuerySpec(
        q_ann_recall_eval_ivf, _emb_guard_sql(_ANN_RECALL_IVF_SQL), tags=("vector", "eval")
    ),
    "retrieval_mrr_eval": QuerySpec(
        q_retrieval_mrr_eval, _emb_guard_sql(_MRR_SQL), tags=("vector", "eval")
    ),
    "centroid_shift": QuerySpec(
        q_centroid_shift, _emb_guard_sql(_CENTROID_SHIFT_SQL), tags=("vector", "monitoring")
    ),
    "embedding_norms": QuerySpec(
        q_embedding_norms, _emb_guard_sql(_NORMS_SQL), tags=("vector",)),
    "label_centroids": QuerySpec(
        q_label_centroids, _emb_guard_sql(_CENTROIDS_SQL),
                                 tags=("vector", "agg")),
    "embedding_quantize_int8": QuerySpec(
        q_embedding_quantize, _emb_guard_sql(_QUANTIZE_SQL),
                                         tags=("vector", "compression")),
    "knn_label_vote": QuerySpec(
        q_knn_label_vote, _emb_guard_sql(_KNN_VOTE_SQL), tags=("vector",)),
    "ann_bruteforce": QuerySpec(
        q_ann_bruteforce, _emb_guard_sql(_ANN_BRUTE_SQL), bench=True, tags=("vector",)),
    "lsh_buckets": QuerySpec(
        q_lsh_buckets, _emb_guard_sql(_LSH_BUCKETS_SQL), tags=("vector",)),
    "ann_lsh": QuerySpec(
        q_ann_lsh, _emb_guard_sql(_ANN_LSH_SQL), bench=True, tags=("vector",)),
    "ann_ivf": QuerySpec(
        q_ann_ivf, _emb_guard_sql(_ANN_IVF_SQL), tags=("vector",)),
    "embedding_dup_pairs": QuerySpec(
        q_embedding_dup_pairs, _emb_guard_sql(_DUP_PAIRS_SQL), tags=("vector", "dedup")),
}
