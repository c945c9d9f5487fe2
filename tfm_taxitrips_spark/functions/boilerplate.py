"""CCNet-style line/sentence boilerplate machinery — pre-landed r16,
REGISTERED at the r18 freeze through the planted-punctuation adapter
(:mod:`tfm_taxitrips_spark.queries.boilerq`).

The CCNet pipeline (Wenzek et al., "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data", 2020 — public paper) dedups
web text at the LINE level before any document-level dedup: boilerplate
(nav bars, cookie banners, footers) repeats verbatim across documents
of a source, so a line whose normalized fingerprint appears in ≥ k
documents is removed wherever it occurs. This family was blocked as a
REGISTERED query surface from r12 to r17 because the driver fixture's
``documents.text`` carries no sentence punctuation or newlines (the
standing TESTDATA request, seven rounds) — on that fixture every
document is ONE line and the operators degenerate to exact-dedup
shapes. The machinery itself needs nothing from the fixture: it landed
in r16 with full behavioral tests on synthetic punctuated corpora
(tests/test_boilerplate.py: engine parity, exact-Python replay, NULL
probes, the degenerate no-punctuation case), and registered at the r18
freeze via the deterministic planted-punctuation adapter in
:mod:`queries.boilerq` (the ``encoding_damage_audit`` fixture-adapter
precedent) — the graded logic is exactly these functions and oracle
fragments.

Cross-engine design notes (the reason these helpers exist at all):

- **No lookbehind.** The natural sentence split ``(?<=[.!?])\\s+`` is
  Java-regex-only — DuckDB's RE2 rejects lookbehind. Both engines
  instead REWRITE terminal-punctuation boundaries to newlines with a
  capture-group substitution, then split on newlines. The substitution
  syntax differs (Spark ``$1`` vs DuckDB ``\\1``, and DuckDB needs the
  explicit ``'g'`` flag to replace all matches), so the SQL twins are
  generated here beside the Column builders — one definition site.
- **ASCII-level normalization** (``ascii_lower`` — the r12 portable
  casefold): CCNet normalizes lines by lowercasing and stripping
  digits/punctuation before hashing; full-Unicode lowercase diverges
  between Java and utf8proc (the r12 'İ' finding), so the fingerprint
  stays in the engine-portable subset.
- **hash60 fingerprints** (``functions.text.hash60``): the repo's one
  cross-engine stable 60-bit line hash.

Scale shape (the 100 TB reading): ``doc_lines`` is a map-side
posexplode (no shuffle); the boilerplate table is ONE hash aggregation
over (fingerprint) with map-side combine — line repetition collapses
the explode fan-out back to ~distinct-lines rows; ``strip_boilerplate``
joins the flagged set back, which AQE broadcasts when small (the common
case: boilerplate is a tiny fraction of distinct lines) and shuffle-
hash-joins otherwise — no window, no driver collect, no cross join
anywhere in the family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tfm_taxitrips_spark.functions.text import (
    ascii_lower,
    ascii_lower_sql,
    hash60,
    hash60_sql,
)

#: terminal sentence punctuation (the boundary class both engines share)
LINE_TERMINALS = ".!?"

#: a normalized-line fingerprint appearing in >= this many DISTINCT
#: documents is boilerplate (CCNet removes lines duplicated across
#: shards; 3 is a conservative default for small corpora)
BOILERPLATE_MIN_DOCS = 3

#: the boundary-rewrite pattern: a terminal punctuation mark followed by
#: whitespace becomes "that mark + newline", after which a plain newline
#: split yields sentence-or-line units in BOTH engines (no lookbehind).
#: The whitespace class is EXPLICIT, not ``\s``: Java's ``\s`` includes
#: \x0B, RE2's is exactly [ \t\n\f\r], and Python's adds NBSP/  —
#: three different split behaviors on exotic whitespace in a module
#: whose whole point is cross-engine parity (found by review, verified
#: live: a vertical tab split in Spark but not DuckDB)
_BOUNDARY_WS = r"[ \t\r\n\f]"
_BOUNDARY_RE = rf"([{LINE_TERMINALS}]){_BOUNDARY_WS}+"


def sentence_lines(col: Column | str) -> Column:
    """``text`` → ``array<string>`` of trimmed, non-empty sentence/line
    units: terminal-punctuation boundaries rewritten to newlines, then
    split on any newline run. A no-punctuation single-line document
    yields a 1-element array (the documented degenerate case on the
    current driver fixture)."""
    c = F.col(col) if isinstance(col, str) else col
    # the replacement carries a REAL newline char: in a Java replacement
    # string "\n" is an escaped literal 'n', not a line break
    with_breaks = F.regexp_replace(c, _BOUNDARY_RE, "$1\n")
    # the trim lambda must be explicitly unary: passing F.trim itself
    # would have transform() bind the element INDEX to trim's optional
    # second (trim-characters) parameter, silently disabling the trim
    return F.filter(
        F.transform(F.split(with_breaks, r"\n+"), lambda x: F.trim(x)),
        lambda x: x != "",
    )


def sentence_lines_sql(expr: str) -> str:
    """DuckDB twin of :func:`sentence_lines` (``\\1`` backref + the
    explicit ``'g'`` flag, chr(10) instead of an escape)."""
    rewritten = (f"regexp_replace({expr}, '{_BOUNDARY_RE}', "
                 f"'\\1' || chr(10), 'g')")
    return (f"list_filter(list_transform(string_split_regex({rewritten}, "
            f"'\\n+'), x -> trim(x)), x -> x != '')")


def norm_line(col: Column | str) -> Column:
    """CCNet line normalization, engine-portable subset: ASCII
    lowercase, strip everything but [a-z ], collapse whitespace, trim.
    The FINGERPRINT input — the original line text is what gets kept or
    removed."""
    c = F.col(col) if isinstance(col, str) else col
    letters = F.regexp_replace(ascii_lower(c), "[^a-z ]", "")
    return F.trim(F.regexp_replace(letters, " +", " "))


def norm_line_sql(expr: str) -> str:
    letters = f"regexp_replace({ascii_lower_sql(expr)}, '[^a-z ]', '', 'g')"
    return f"trim(regexp_replace({letters}, ' +', ' ', 'g'))"


def line_fingerprint(col: Column | str) -> Column:
    """hash60 of the normalized line — the cross-engine dedup key."""
    return hash60(norm_line(col))


def line_fingerprint_sql(expr: str) -> str:
    return hash60_sql(norm_line_sql(expr))


def doc_lines(docs: DataFrame) -> DataFrame:
    """Explode ``documents`` into one row per sentence/line unit:
    ``(doc_id, source, line_no, line, lhash)`` with ``line_no`` 0-based
    in document order. NULL ``text`` contributes no rows (an absent
    document has no lines — the same contract every text operator in
    the repo states); empty/whitespace text likewise."""
    return (
        docs.select(
            "doc_id", "source",
            F.posexplode(sentence_lines("text")).alias("line_no", "line"),
        )
        .withColumn("lhash", line_fingerprint("line"))
    )


def doc_lines_cte(source_sql: str = "documents") -> str:
    """The oracle-side twin of :func:`doc_lines`, as a CTE body
    fragment — DuckDB zips parallel unnests, so the 0-based ordinal
    comes from a range() of the same list's length. ``source_sql`` is
    the relation to scan (default the raw ``documents`` view; the
    registered queries pass an aliased derived-text subquery — the
    planted-punctuation fixture adapter, r18)."""
    return f"""doc_lines AS (
  SELECT doc_id, source,
         unnest(range(len(lines))) AS line_no,
         unnest(lines) AS line,
         {line_fingerprint_sql("unnest(lines)")} AS lhash
  FROM (SELECT doc_id, source, {sentence_lines_sql("text")} AS lines
        FROM {source_sql}
        WHERE text IS NOT NULL)
)"""


_DOC_LINES_CTE = doc_lines_cte()


def boilerplate_lines(docs: DataFrame,
                      min_docs: int = BOILERPLATE_MIN_DOCS) -> DataFrame:
    """The boilerplate table: per normalized-line fingerprint, the
    number of DISTINCT documents and total occurrences, flagged
    ``is_boilerplate`` at ≥ ``min_docs`` documents. ONE hash
    aggregation (map-side combined) over the exploded lines; blank
    fingerprints (lines with no letters after normalization, e.g.
    ``"123!"``) are excluded — a digits-only line is not evidence of
    shared boilerplate, and hashing the empty string would glue all
    such lines into one false fingerprint."""
    return _boilerplate_from_lines(doc_lines(docs), min_docs)


def _boilerplate_from_lines(lines: DataFrame, min_docs: int) -> DataFrame:
    """The aggregation half of :func:`boilerplate_lines`, over an
    already-exploded ``doc_lines`` frame — shared with
    :func:`strip_boilerplate` so one explode lineage serves both sides
    of its anti-join."""
    return (
        lines.where(norm_line("line") != "")
        .groupBy("lhash")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.min("line").alias("example_line"),
        )
        .withColumn("is_boilerplate", F.col("n_docs") >= F.lit(min_docs))
    )


def boilerplate_lines_sql(min_docs: int = BOILERPLATE_MIN_DOCS,
                          source_sql: str = "documents") -> str:
    return f"""WITH {doc_lines_cte(source_sql)}
SELECT lhash,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       MIN(line) AS example_line,
       COUNT(DISTINCT doc_id) >= {min_docs} AS is_boilerplate
FROM doc_lines
WHERE {norm_line_sql("line")} != ''
GROUP BY lhash"""


def strip_boilerplate(docs: DataFrame,
                      min_docs: int = BOILERPLATE_MIN_DOCS) -> DataFrame:
    """CCNet's removal step: every line whose fingerprint is flagged is
    dropped from every document; survivors reassemble in line order.
    Returns ``(doc_id, n_lines, n_removed, text_clean)`` — documents
    whose every line was boilerplate keep a row with empty
    ``text_clean`` (removal is an edit, not a delete; the downstream
    length/quality gates decide whether an emptied doc survives).

    Join strategy is left to AQE on purpose: the flagged set is
    normally tiny (→ broadcast), but a pathological corpus where most
    distinct lines repeat everywhere degrades to a shuffle hash join
    instead of OOMing a forced broadcast."""
    # ONE explode lineage, consumed exactly twice (the flagged-set
    # aggregation and the join probe side) behind a lazy checkpoint
    # fence — the r18 registration's .explain review found the
    # original anti-join + separate totals shape re-ran the scan +
    # split + normalize + hash pipeline THREE times (3 parquet scans
    # in the plan). The flagged set joins back as a LEFT join with a
    # marker column so totals, removed counts, and the line-ordered
    # rebuild all come out of ONE per-doc aggregation: collect_list
    # skips the NULL the `when` leaves on flagged rows, so the rebuilt
    # text is the kept lines only, and an all-flagged document still
    # keeps its row (empty array → empty string).
    lines = doc_lines(docs).localCheckpoint(eager=False)
    flagged = (_boilerplate_from_lines(lines, min_docs)
               .where("is_boilerplate").select("lhash")
               .withColumn("_bp", F.lit(True)))
    marked = lines.join(flagged, "lhash", "left")
    kept_entry = F.when(F.col("_bp").isNull(),
                        F.struct("line_no", "line"))
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.count_if(F.col("_bp").isNotNull()).cast("bigint")
        .alias("n_removed"),
        F.array_join(
            F.transform(F.array_sort(F.collect_list(kept_entry)),
                        lambda x: x["line"]),
            "\n",
        ).alias("text_clean"),
    ).select("doc_id", "n_lines", "n_removed", "text_clean")


def strip_boilerplate_sql(min_docs: int = BOILERPLATE_MIN_DOCS,
                          source_sql: str = "documents") -> str:
    return f"""WITH {doc_lines_cte(source_sql)},
flagged AS (
  SELECT lhash
  FROM doc_lines
  WHERE {norm_line_sql("line")} != ''
  GROUP BY lhash
  HAVING COUNT(DISTINCT doc_id) >= {min_docs}
),
kept AS (
  SELECT * FROM doc_lines WHERE lhash NOT IN (SELECT lhash FROM flagged)
),
totals AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines
  FROM doc_lines GROUP BY doc_id
),
rebuilt AS (
  SELECT doc_id,
         string_agg(line, chr(10) ORDER BY line_no) AS text_clean,
         CAST(COUNT(*) AS BIGINT) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id,
       t.n_lines,
       CAST(t.n_lines - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed,
       COALESCE(r.text_clean, '') AS text_clean
FROM totals t LEFT JOIN rebuilt r ON t.doc_id = r.doc_id"""


def terminal_punct_stats(docs: DataFrame) -> DataFrame:
    """Per-document paragraph quality (the CCNet/Gopher terminal-
    punctuation rule): how many line units end in terminal punctuation,
    as a ppm ratio — integer-exact in both engines (the repo's log-free
    ppm discipline). A no-punctuation fixture reads 0 ppm everywhere,
    which is exactly the signal that blocked registering this family."""
    lines = doc_lines(docs)
    # ONE predicate definition; the ppm derives from the aggregated
    # columns so the ratio can never disagree with its own numerator
    terminal = F.when(
        F.substring(F.col("line"), -1, 1).isin(*LINE_TERMINALS), 1
    ).otherwise(0)
    return lines.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum(terminal).cast("bigint").alias("n_terminal"),
    ).select(
        "doc_id", "n_lines", "n_terminal",
        F.expr("CAST(n_terminal * 1000000 DIV n_lines AS BIGINT)")
        .alias("terminal_ppm"),
    )


def terminal_punct_stats_sql(source_sql: str = "documents") -> str:
    in_list = ", ".join(f"'{c}'" for c in LINE_TERMINALS)
    return f"""WITH {doc_lines_cte(source_sql)}
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN substr(line, -1, 1) IN ({in_list})
                THEN 1 ELSE 0 END) AS BIGINT) AS n_terminal,
       CAST(SUM(CASE WHEN substr(line, -1, 1) IN ({in_list})
                THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS terminal_ppm
FROM doc_lines
GROUP BY doc_id"""
