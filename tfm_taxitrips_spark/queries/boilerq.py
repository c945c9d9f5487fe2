"""CCNet line/boilerplate family — the REGISTERED query surface over
the machinery pre-landed in :mod:`functions.boilerplate` (r16), made
gradeable by the planted-punctuation fixture adapter (r18, closing the
seven-round TESTDATA deadlock the r17 verdict ordered decided).

The blocker: the driver fixture's ``documents.text`` has no sentence
punctuation or newlines at any SF, so the CCNet line operators
(Wenzek et al. 2020 — line-level dedup of web text before document
dedup; see the :mod:`functions.boilerplate` docstring) degenerate to
one-line documents and the family sat register-ready but unregistered
for seven rounds. The precedent that breaks it (``url_dedup_gate`` /
``encoding_damage_audit``): derive the missing feature
DETERMINISTICALLY from the fixture with the identical expression in
both engines, and grade the REAL logic over the derived corpus. Here
the adapter:

- **chunks** the document into sentence units by rewriting every 8th
  word boundary to ``'. '`` (one global regex, non-overlapping
  left-to-right in both Java regex and RE2 — no ``\\s``, no
  lookbehind, per the standing cross-engine regex discipline);
- **plants boilerplate** — three fixed banner sentences (the
  nav/footer/cookie text CCNet exists to remove) attached per doc by
  bits of ``hash60('bp:' || doc_id)``, so each banner lands in ~half
  the corpus and is boilerplate at any ``min_docs``; docs without the
  suffix banner keep an unterminated tail line, so terminal-punct
  ratios stay discriminative.

The GRADED logic — sentence splitting, ASCII line normalization,
fingerprinting, the ≥k-distinct-docs boilerplate table, and
strip-with-reassembly — is exactly the pre-landed machinery; the
adapter only manufactures its input. Natural repetition is graded too:
short word-tail lines (doc length % 8) recur across documents of the
small-vocabulary fixture and are flagged alongside the planted
banners, which is precisely CCNet's behavior on genuinely repetitive
short lines.

Scale design (100 TB): the adapter is a per-row projection fused into
the scan; everything after it is the :mod:`functions.boilerplate`
shape — map-side posexplode, ONE map-side-combined fingerprint
aggregation, an AQE-broadcast (small flagged set) anti-join, and a
per-doc reassembly aggregation. No windows, no cross join, no Python.

Reference context: the reference engine has no line-dedup surface —
this family is part of the beyond-reference LLM-data-pipeline charter
(SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tfm_taxitrips_spark.functions.boilerplate import (
    BOILERPLATE_MIN_DOCS,
    boilerplate_lines,
    boilerplate_lines_sql,
    strip_boilerplate,
    strip_boilerplate_sql,
    terminal_punct_stats,
    terminal_punct_stats_sql,
)
from tfm_taxitrips_spark.functions.text import hash60, hash60_sql
from tfm_taxitrips_spark.operators.partitioning import fan_out
from tfm_taxitrips_spark.queries.registry import QuerySpec
from tfm_taxitrips_spark.sources.readers import table

#: every 8th word boundary becomes a sentence boundary: match 8 words
#: and the following space, put the words back with ``'. '``. Scanning
#: resumes after the consumed space in BOTH engines (leftmost,
#: non-overlapping), so chunking is deterministic and identical.
CHUNK_WORDS = 8
_CHUNK_RE = rf"((?:[^ ]+ ){{{CHUNK_WORDS - 1}}}[^ ]+) "

#: the planted banner sentences (lowercase ASCII — they survive
#: ``norm_line`` as three distinct fingerprints; none contains a star
#: table name, so the oracle-guard triggers never see them)
BANNER_A = "all rights reserved worldwide."
BANNER_B = "subscribe to our newsletter today."
BANNER_C = "by continuing you agree to the cookie notice."


def _derived_text() -> Column:
    """The planted-punctuation adapter (identical expression in
    :func:`_derived_text_sql`): banner A/B prefixed and banner C
    suffixed by bits 0/1/2 of ``hash60('bp:' || doc_id)``, around the
    8-word-chunked body. The suffix leg supplies the body tail's
    terminal ``'. '`` — without it the tail line stays unterminated
    (deliberate: keeps ``terminal_ppm`` < 1e6 on half the corpus).
    ``concat`` is NULL-propagating on a NULL ``text`` body in Spark,
    and the oracle's ``||`` likewise — a NULL document stays NULL and
    produces no lines on either engine."""
    h = hash60(F.concat(F.lit("bp:"), F.col("doc_id").cast("string")))
    chunked = F.regexp_replace(F.col("text"), _CHUNK_RE, "$1. ")
    return F.concat(
        F.when(h.bitwiseAND(F.lit(1)) != 0, F.lit(BANNER_A + " "))
        .otherwise(F.lit("")),
        F.when(h.bitwiseAND(F.lit(2)) != 0, F.lit(BANNER_B + " "))
        .otherwise(F.lit("")),
        chunked,
        F.when(h.bitwiseAND(F.lit(4)) != 0, F.lit(". " + BANNER_C))
        .otherwise(F.lit("")),
    )


def _derived_text_sql() -> str:
    h = hash60_sql("concat('bp:', CAST(doc_id AS VARCHAR))")
    chunked = f"regexp_replace(text, '{_CHUNK_RE}', '\\1. ', 'g')"
    return (
        f"(CASE WHEN (({h}) & 1) != 0 THEN '{BANNER_A} ' ELSE '' END || "
        f"CASE WHEN (({h}) & 2) != 0 THEN '{BANNER_B} ' ELSE '' END || "
        f"{chunked} || "
        f"CASE WHEN (({h}) & 4) != 0 THEN '. {BANNER_C}' ELSE '' END)"
    )


#: the oracle-side planted relation, passed as ``source_sql`` to the
#: :mod:`functions.boilerplate` SQL builders
_PLANTED_SQL = (
    f"(SELECT doc_id, source, {_derived_text_sql()} AS text "
    "FROM documents) AS planted"
)


def _planted_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(table(spark, sf_dir, "documents"))
    return docs.select("doc_id", "source", _derived_text().alias("text"))


def q_boilerplate_line_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CCNet boilerplate table over the planted corpus: per
    normalized-line fingerprint, distinct-doc and occurrence counts,
    flagged at ≥ BOILERPLATE_MIN_DOCS distinct documents."""
    return boilerplate_lines(_planted_docs(spark, sf_dir))


def q_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet removal with reassembly: per document, total/removed line
    counts and the boilerplate-free text rebuilt in line order (empty
    string when every line was flagged — removal is an edit, not a
    delete)."""
    return strip_boilerplate(_planted_docs(spark, sf_dir))


def q_line_terminal_punct_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document terminal-punctuation line ratio (the CCNet/Gopher
    paragraph-quality rule) over the planted corpus, as integer ppm."""
    return terminal_punct_stats(_planted_docs(spark, sf_dir))


QUERIES: dict[str, QuerySpec] = {
    "boilerplate_line_table": QuerySpec(
        q_boilerplate_line_table,
        boilerplate_lines_sql(BOILERPLATE_MIN_DOCS, source_sql=_PLANTED_SQL),
        tags=("text", "dedup", "curation")),
    "boilerplate_strip": QuerySpec(
        q_boilerplate_strip,
        strip_boilerplate_sql(BOILERPLATE_MIN_DOCS, source_sql=_PLANTED_SQL),
        tags=("text", "dedup", "curation")),
    "line_terminal_punct_ppm": QuerySpec(
        q_line_terminal_punct_ppm,
        terminal_punct_stats_sql(source_sql=_PLANTED_SQL),
        tags=("text", "quality")),
}
