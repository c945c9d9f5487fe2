"""Registered CCNet boilerplate family (``queries/boilerq.py``, r18):
driver-style differential on the real fixture, a pure-Python replay of
the planted-punctuation adapter + full strip pipeline (the
third-opinion discipline that caught the blob family's
descending-sequence bug), banner-planting semantics, and the
registration pin that replaces the seven-round staging block.

The underlying line machinery's own behavioral suite (synthetic
punctuated corpora, NULL/empty/degenerate probes, engine parity of
every SQL twin) lives in ``tests/test_boilerplate.py`` — these tests
cover what registration adds: the adapter and the registered bundle.
"""

from __future__ import annotations

import hashlib
import re

from tests.oracle import compare
from tfm_taxitrips_spark.queries.boilerq import (
    _CHUNK_RE,
    BANNER_A,
    BANNER_B,
    BANNER_C,
    CHUNK_WORDS,
    QUERIES,
    q_boilerplate_line_table,
    q_boilerplate_strip,
    q_line_terminal_punct_ppm,
)

# --------------------------------------------------------------------------
# differential twins on the real fixture
# --------------------------------------------------------------------------


def test_line_table_matches_oracle_and_banners_fire(spark, sf_smoke):
    df = q_boilerplate_line_table(spark, sf_smoke)
    compare(df, QUERIES["boilerplate_line_table"].oracle, sf_smoke,
            name="boilerplate_line_table")
    rows = {r.example_line: r for r in df.collect() if r.is_boilerplate}
    # every planted banner is flagged (each lands in ~half the corpus)
    for banner in (BANNER_A, BANNER_B, BANNER_C):
        assert banner.rstrip(".") + "." in {ln for ln in rows}, banner
    # and natural repetition (short word-tail lines) is flagged too —
    # the family grades more than its own plants
    assert len(rows) > 3


def test_strip_matches_oracle_and_removes(spark, sf_smoke):
    df = q_boilerplate_strip(spark, sf_smoke)
    compare(df, QUERIES["boilerplate_strip"].oracle, sf_smoke,
            name="boilerplate_strip")
    rows = df.collect()
    assert sum(r.n_removed for r in rows) > 0
    # reassembly invariant: clean text never contains a banner line
    for r in rows:
        for banner in (BANNER_A, BANNER_B, BANNER_C):
            assert banner not in r.text_clean, r.doc_id


def test_terminal_ppm_matches_oracle(spark, sf_smoke):
    df = q_line_terminal_punct_ppm(spark, sf_smoke)
    compare(df, QUERIES["line_terminal_punct_ppm"].oracle, sf_smoke,
            name="line_terminal_punct_ppm")
    by_ppm = [r.terminal_ppm for r in df.collect()]
    # suffix-banner docs read 1e6; the rest keep an unterminated tail
    assert max(by_ppm) == 1_000_000
    assert min(by_ppm) < 1_000_000


# --------------------------------------------------------------------------
# pure-Python replay (adapter + machinery, engine-free third opinion)
# --------------------------------------------------------------------------


def _py_hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_derived(doc_id: int, text: str) -> str | None:
    if text is None:
        return None
    h = _py_hash60(f"bp:{doc_id}")
    chunked = re.sub(_CHUNK_RE, r"\1. ", text)
    return ((BANNER_A + " " if h & 1 else "")
            + (BANNER_B + " " if h & 2 else "")
            + chunked
            + (". " + BANNER_C if h & 4 else ""))


def _py_lines(text: str) -> list[str]:
    # the EXPLICIT whitespace class, mirroring _BOUNDARY_WS (Python's
    # \s includes NBSP — the replay must split like the engines)
    with_breaks = re.sub(r"([.!?])[ \t\r\n\f]+",
                         lambda m: m.group(1) + "\n", text)
    return [x.strip() for x in re.split(r"\n+", with_breaks) if x.strip()]


def _py_norm(line: str) -> str:
    low = "".join(chr(ord(c) + 32) if "A" <= c <= "Z" else c for c in line)
    return re.sub(" +", " ", re.sub("[^a-z ]", "", low)).strip()


def test_exact_python_replay_of_strip(spark, sf_smoke):
    import duckdb

    docs = duckdb.sql(
        "SELECT doc_id, text FROM "
        f"'{sf_smoke}/documents.parquet' ORDER BY doc_id"
    ).fetchall()

    # replay the whole pipeline: derive → split → fingerprint →
    # boilerplate table (>=3 distinct docs) → strip
    per_doc: dict[int, list[tuple[int, str, int]]] = {}
    doc_sets: dict[int, set[int]] = {}
    for doc_id, text in docs:
        derived = _py_derived(doc_id, text)
        if derived is None:
            continue
        lines = _py_lines(derived)
        entries = []
        for i, ln in enumerate(lines):
            fp = _py_hash60(_py_norm(ln))
            entries.append((i, ln, fp))
            if _py_norm(ln) != "":
                doc_sets.setdefault(fp, set()).add(doc_id)
        per_doc[doc_id] = entries
    flagged = {fp for fp, s in doc_sets.items() if len(s) >= 3}
    expected = {}
    for doc_id, entries in per_doc.items():
        kept = [ln for _i, ln, fp in entries if fp not in flagged]
        expected[doc_id] = (len(entries), len(entries) - len(kept),
                            "\n".join(kept))

    got = {r.doc_id: (r.n_lines, r.n_removed, r.text_clean)
           for r in q_boilerplate_strip(spark, sf_smoke).collect()}
    assert got == expected


def test_chunker_is_nonoverlapping_every_eighth_word():
    text = " ".join(f"w{i}" for i in range(CHUNK_WORDS * 2 + 3))
    out = re.sub(_CHUNK_RE, r"\1. ", text)
    lines = _py_lines(out)
    assert lines == [
        " ".join(f"w{i}" for i in range(CHUNK_WORDS)) + ".",
        " ".join(f"w{i}" for i in range(CHUNK_WORDS, 2 * CHUNK_WORDS)) + ".",
        " ".join(f"w{i}" for i in range(2 * CHUNK_WORDS,
                                        2 * CHUNK_WORDS + 3)),
    ]


# --------------------------------------------------------------------------
# registration pin (replaces the seven-round staging block)
# --------------------------------------------------------------------------


def test_family_is_registered_and_oracle_paired():
    """The r18 pin: the family is REGISTERED through the
    planted-punctuation adapter (the seven-round TESTDATA deadlock is
    closed — if the fixture ever gains real punctuation, the adapter
    still applies deterministically; the driver re-grades on fixture
    regeneration as with every query)."""
    from tfm_taxitrips_spark.queries.registry import all_queries

    merged = all_queries()
    for name in ("boilerplate_line_table", "boilerplate_strip",
                 "line_terminal_punct_ppm"):
        assert name in merged, name
        assert merged[name].oracle and "SELECT" in merged[name].oracle.upper()
