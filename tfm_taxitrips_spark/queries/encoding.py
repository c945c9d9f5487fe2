"""Encoding-damage audit (REGISTERED at the r18 freeze, after landing
fully staged in r17): the ftfy-style ingest gate a CommonCrawl-scale text pipeline
runs before any tokenizer sees the corpus — per-source ppm of
characters lost to the four classic encoding-damage classes:

- **mojibake** — UTF-8 decoded as Latin-1/cp1252 ("Ã©" where "é"
  belongs, "â€™" where "'" belongs): the signature of a
  double-encoding hop anywhere in the crawl → WARC → ETL chain;
- **replacement characters** (U+FFFD) — a lossy decode already
  happened; the original bytes are unrecoverable;
- **C1 controls** (U+0085, U+0092 here) — cp1252 bytes smuggled
  through an ISO-8859-1 decode, invisible in most renderers but
  tokenizer-visible;
- **NBSP substitution** (U+00A0 for U+0020) — copy-paste/HTML
  artifacts that silently split token streams.

The fixture's ``documents.text`` is clean ASCII, so — the
``url_dedup_gate`` / ``watermark_lateness_audit`` fixture-adapter
precedent — damage is PLANTED deterministically: ``hash60('enc:' ||
doc_id) % 20`` picks a damage mode (two mojibake slots, one each of
the others, 15 clean), with the identical expression in the oracle.
The GRADED logic is the detector + aggregation, not the derivation.

Detectors are pure string built-ins with NO regex at all: occurrences
count as ``length(t) - length(replace-chain(t))`` — length-difference
over literal ``replace``, which has identical semantics in Spark and
DuckDB (no cross-engine regex-class/lookbehind surface to discipline).
The counts are damaged CHARS, so ppm = damaged-chars per million
corpus chars, computed with integer ``div`` end-to-end (bit-stable
oracle); an all-empty source short-circuits to 0 ppm instead of
dividing by zero (DuckDB's integer ``// 0`` errors where Spark's
``div`` returns NULL — the guard keeps both engines off that seam).

Staging history: same as :mod:`queries.blobdedup` — built + fully
tested in r17 after that round's freeze, registered at the r18 freeze
(one import in the registry's merge list; the staging pin flipped with
it).

Scale design (100 TB): the audit is scan-shaped — per-row string
expressions in whole-stage codegen (the replace-chains are a fixed
small number of passes over each value), then ONE map-side-combined
groupBy(source) whose output is |sources| rows. No joins, no windows,
no Python, nothing but per-source sums on the wire.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tfm_taxitrips_spark.functions.text import hash60, hash60_sql
from tfm_taxitrips_spark.operators.partitioning import fan_out
from tfm_taxitrips_spark.queries.registry import QuerySpec
from tfm_taxitrips_spark.sources.readers import table

#: UTF-8-as-Latin-1/cp1252 signatures (é è ñ ' respectively). Strip
#: order matters only for determinism — the chain is identical in both
#: engines by construction.
MOJIBAKE_SEQS: tuple[str, ...] = ("Ã©", "Ã¨",
                                  "Ã±", "â€™")
REPLACEMENT_CHAR = "\ufffd"
C1_CHARS: tuple[str, ...] = ("\u0085", "\u0092")
NBSP = "\u00a0"

#: the planted-damage tails / modes (fixture adapter, mirrored in SQL)
_MOJI_TAIL = " " + "".join(MOJIBAKE_SEQS)
_REPL_TAIL = REPLACEMENT_CHAR * 2
_C1_TAIL = "".join(C1_CHARS)
_MODES = 20


def _ppm_int64(num: str, den: str) -> str:
    """Exact ``floor(num * 1e6 / den)`` in pure int64-safe integer ops
    (both engines' ``div``/``%`` agree on non-negative args). The naive
    ``(num * 1000000) div den`` overflows int64 once a source carries
    > ~9.2e12 damaged chars in one class — inside the module's own
    100 TB design point — so the multiply is decomposed into three
    exact terms (num = a·den + r; r·1e6 split as two ·1000 steps),
    every intermediate < 2^63 for den < 9.2e15 (~9 PB of text per
    source; property-checked over 200k random (num, den) pairs before
    landing). The DuckDB oracle keeps the naive form — its SUM() is
    already HUGEINT, so the naive product is exact there and provably
    equal to this decomposition."""
    a = f"(({num}) div ({den}))"
    r = f"(({num}) % ({den}))"
    s1 = f"(({r} * 1000) div ({den}))"
    rem1 = f"(({r} * 1000) % ({den}))"
    return f"{a} * 1000000 + {s1} * 1000 + ({rem1} * 1000) div ({den})"


def _strip_chain(col: Column, seqs: tuple[str, ...]) -> Column:
    for s in seqs:
        col = F.replace(col, F.lit(s), F.lit(""))
    return col


def _strip_chain_sql(expr: str, seqs: tuple[str, ...]) -> str:
    for s in seqs:
        expr = f"replace({expr}, '{s}', '')"
    return expr


def damage_char_counts(text: Column) -> dict[str, Column]:
    """Damaged-char counts per class on an arbitrary text column — the
    detector proper, exposed for tests to drive on hand-written damaged
    strings independently of the fixture-adapter derivation.

    Documented limitation (inherent to any fixed-order replace chain,
    identical across Spark/DuckDB/the replay, pinned by
    ``test_interleaved_splice_undercounts_by_design``): removing one
    sequence can splice a NEW occurrence of an earlier sequence
    together (e.g. ``'Ã' + 'â€™' + '©'`` — stripping ``'â€™'`` leaves
    ``'Ã©'``, which the already-run ``'Ã©'`` pass never sees), so
    interleaved damage under-counts. The alternative — iterate-to-
    fixpoint or regex alternation — buys a pathological-input edge at
    the cost of the regex-free cross-engine guarantee; the audit is a
    corpus-health METER, and a meter that strictly under-counts on
    adversarial splices still gates real damage correctly."""
    n = F.length(text)
    return {
        "moji_chars": n - F.length(_strip_chain(text, MOJIBAKE_SEQS)),
        "repl_chars": n - F.length(_strip_chain(text, (REPLACEMENT_CHAR,))),
        "c1_chars": n - F.length(_strip_chain(text, C1_CHARS)),
        "nbsp_chars": n - F.length(_strip_chain(text, (NBSP,))),
    }


def _derived_text() -> Column:
    """The planted-damage fixture adapter (identical expression in the
    oracle): mode = hash60('enc:'||doc_id) % 20 → 0/1 mojibake tail,
    2 replacement tail, 3 C1 tail, 4 NBSP-for-space substitution,
    else clean."""
    mode = hash60(
        F.concat(F.lit("enc:"), F.col("doc_id").cast("string"))) % _MODES
    t = F.col("text")
    return (
        F.when(mode <= 1, F.concat(t, F.lit(_MOJI_TAIL)))
        .when(mode == 2, F.concat(t, F.lit(_REPL_TAIL)))
        .when(mode == 3, F.concat(t, F.lit(_C1_TAIL)))
        .when(mode == 4, F.replace(t, F.lit(" "), F.lit(NBSP)))
        .otherwise(t)
    )


def q_encoding_damage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source encoding-damage profile: doc counts, damaged-doc
    counts, and integer ppm of corpus characters in each damage class."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    t = _derived_text()
    counts = damage_char_counts(t)
    per_doc = (
        docs.where(F.col("text").isNotNull())  # no payload, no audit row
        .select(
            "source",
            F.length(t).alias("n_chars"),
            *[c.alias(k) for k, c in counts.items()],
        )
    )
    bad_total = sum(F.col(k) for k in ("moji_chars", "repl_chars",
                                       "c1_chars", "nbsp_chars"))
    agg = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((bad_total > 0).cast("bigint")).alias("damaged_docs"),
        F.sum("n_chars").alias("chars_total"),
        F.sum("moji_chars").alias("moji_chars"),
        F.sum("repl_chars").alias("repl_chars"),
        F.sum("c1_chars").alias("c1_chars"),
        F.sum("nbsp_chars").alias("nbsp_chars"),
    )

    def ppm(num: str, alias: str) -> Column:
        # the all-empty-source guard (DuckDB's `// 0` errors and
        # Spark's `div` NULLs — semantic, not cosmetic) around the
        # int64-safe exact floor decomposition
        return F.expr(
            f"CASE WHEN chars_total = 0 THEN CAST(0 AS BIGINT) "
            f"ELSE CAST({_ppm_int64(num, 'chars_total')} AS BIGINT) END"
        ).alias(alias)

    return agg.select(
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("damaged_docs").cast("bigint").alias("damaged_docs"),
        F.col("chars_total").cast("bigint").alias("chars_total"),
        ppm("repl_chars", "replacement_ppm"),
        ppm("moji_chars", "mojibake_ppm"),
        ppm("c1_chars", "c1_ppm"),
        ppm("nbsp_chars", "nbsp_ppm"),
    )


def _oracle_ppm(num: str, alias: str) -> str:
    """The oracle twin of the Spark-side ``ppm()``: DuckDB's SUM() is
    already HUGEINT so the NAIVE product is exact (provably equal to
    the Spark side's :func:`_ppm_int64` decomposition); the outer CAST
    covers the whole CASE because a bare hugeint round-trips to pandas
    as float64, breaking the dtype leg of the schema compare."""
    return (f"CAST(CASE WHEN chars_total = 0 THEN 0 "
            f"ELSE ({num} * 1000000) // chars_total END AS BIGINT) "
            f"AS {alias}")


def _audit_sql() -> str:
    h = hash60_sql("concat('enc:', CAST(doc_id AS VARCHAR))")
    mode = f"{h} % {_MODES}"
    derived = f"""CASE
      WHEN ({mode}) <= 1 THEN text || '{_MOJI_TAIL}'
      WHEN ({mode}) = 2 THEN text || '{_REPL_TAIL}'
      WHEN ({mode}) = 3 THEN text || '{_C1_TAIL}'
      WHEN ({mode}) = 4 THEN replace(text, ' ', '{NBSP}')
      ELSE text END"""
    moji = _strip_chain_sql("t", MOJIBAKE_SEQS)
    repl = _strip_chain_sql("t", (REPLACEMENT_CHAR,))
    c1 = _strip_chain_sql("t", C1_CHARS)
    nbsp = _strip_chain_sql("t", (NBSP,))
    return f"""
WITH d AS (
  SELECT source, {derived} AS t
  FROM documents WHERE text IS NOT NULL
),
c AS (
  SELECT source, length(t) AS n_chars,
         length(t) - length({moji}) AS moji_chars,
         length(t) - length({repl}) AS repl_chars,
         length(t) - length({c1}) AS c1_chars,
         length(t) - length({nbsp}) AS nbsp_chars
  FROM d
),
a AS (
  SELECT source,
         COUNT(*) AS n_docs,
         SUM(CASE WHEN moji_chars + repl_chars + c1_chars + nbsp_chars > 0
                  THEN 1 ELSE 0 END) AS damaged_docs,
         SUM(n_chars) AS chars_total,
         SUM(moji_chars) AS moji_chars,
         SUM(repl_chars) AS repl_chars,
         SUM(c1_chars) AS c1_chars,
         SUM(nbsp_chars) AS nbsp_chars
  FROM c GROUP BY source
)
SELECT source,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(damaged_docs AS BIGINT) AS damaged_docs,
       CAST(chars_total AS BIGINT) AS chars_total,
       {_oracle_ppm("repl_chars", "replacement_ppm")},
       {_oracle_ppm("moji_chars", "mojibake_ppm")},
       {_oracle_ppm("c1_chars", "c1_ppm")},
       {_oracle_ppm("nbsp_chars", "nbsp_ppm")}
FROM a
"""


_ENCODING_AUDIT_SQL = _audit_sql()


#: merged into the registry at the r18 freeze (see module docstring).
QUERIES: dict[str, QuerySpec] = {
    "encoding_damage_audit": QuerySpec(
        q_encoding_damage_audit, _ENCODING_AUDIT_SQL,
        tags=("text", "quality", "audit")),
}
