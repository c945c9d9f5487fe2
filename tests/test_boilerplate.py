"""CCNet line/sentence boilerplate family — behavioral tests for the
PRE-LANDED (unregistered) machinery in ``functions/boilerplate.py``.

The driver fixture's ``documents.text`` has no punctuation (the
standing TESTDATA request), so these tests build their own punctuated
corpora: full engine parity (Spark vs the DuckDB twins the future
oracles will use), an exact-Python replay of the whole strip pipeline,
NULL/empty/whitespace probes, and the degenerate no-punctuation case
the driver fixture would exercise today. Registration when the fixture
gains punctuation = one QUERIES entry per operator over these exact
functions and SQL fragments.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from tests.oracle import compare_result

#: (doc_id, text, lang, source) — three docs share the cookie-banner
#: line (boilerplate at min_docs=3), everything else is unique; plus a
#: NULL text, a whitespace-only text, a no-punctuation single-liner, a
#: digits-only line (blank fingerprint), and a multibyte line
_DOCS = [
    (1, "Hello world. Cookie banner text. Unique line one!", "en", "web"),
    (2, "Cookie banner text. Another unique thing?", "en", "web"),
    (3, "Cookie banner text. Third doc body here.", "en", "blog"),
    (4, None, "en", "web"),
    (5, "   ", "en", "web"),
    (6, "no punctuation single line doc", "en", "web"),
    (7, "123! 456? COOKIE banner TEXT.  trailing bit", "en", "web"),
    (8, "héllo wörld straße. Cookie   Banner, text!", "intl", "web"),
]


def _write_docs(d) -> str:
    rows = [(i, t, lg, s, None if t is None else len(t))
            for i, t, lg, s in _DOCS]
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array([r[3] for r in rows], pa.string()),
        "n_chars": pa.array([r[4] for r in rows], pa.int64()),
    })
    pq.write_table(tbl, f"{d}/documents.parquet")
    return str(d)


def _oracle(d: str, sql: str) -> pd.DataFrame:
    conn = duckdb.connect()
    conn.sql("CREATE VIEW documents AS SELECT * FROM "
             f"'{d}/documents.parquet'")
    try:
        return conn.sql(sql).df()
    finally:
        conn.close()


# -- pure-Python reference ---------------------------------------------------

def _py_lines(text: str) -> list[str]:
    import re

    if text is None:
        return []
    # the EXPLICIT whitespace class, mirroring _BOUNDARY_WS: Python's
    # \s includes NBSP and unicode separators that neither engine's
    # regex dialect shares — the reference must split exactly like the
    # engines, not like Python
    with_breaks = re.sub(r"([.!?])[ \t\r\n\f]+",
                         lambda m: m.group(1) + "\n", text)
    return [x.strip() for x in re.split(r"\n+", with_breaks) if x.strip()]


def _py_norm(line: str) -> str:
    import re

    low = "".join(c.lower() if "A" <= c <= "Z" else c for c in line)
    return re.sub(" +", " ", re.sub("[^a-z ]", "", low)).strip()


def _py_fingerprint(line: str) -> int:
    import hashlib

    return int(hashlib.md5(_py_norm(line).encode()).hexdigest()[:15], 16)


def test_sentence_lines_and_fingerprints_match_python(spark, tmp_path):
    """doc_lines == the pure-Python splitter+normalizer+hash on every
    document, in both engines — including the multibyte doc (the
    ASCII-level normalization must pass non-ASCII through untouched so
    both engines agree, the r12 casefold lesson)."""
    from tfm_taxitrips_spark.functions.boilerplate import (
        _DOC_LINES_CTE,
        doc_lines,
    )

    d = _write_docs(tmp_path)
    sdf = (doc_lines(spark.read.parquet(f"{d}/documents.parquet"))
           .toPandas())
    ddf = _oracle(d, f"WITH {_DOC_LINES_CTE} SELECT * FROM doc_lines")
    assert compare_result(sdf.copy(), ddf.copy())["hash_match"]

    want = []
    for doc_id, text, _lg, src in _DOCS:
        for i, line in enumerate(_py_lines(text)):
            want.append((doc_id, src, i, line, _py_fingerprint(line)))
    got = sorted(map(tuple, sdf[["doc_id", "source", "line_no", "line",
                                 "lhash"]].itertuples(index=False)))
    assert got == sorted(want)
    # NULL and whitespace-only docs contribute no rows
    assert not any(r[0] in (4, 5) for r in got)
    # the no-punctuation doc is exactly one line (the driver-fixture
    # degenerate case)
    assert sum(1 for r in got if r[0] == 6) == 1


def test_boilerplate_flagging_matches_oracle_and_python(spark, tmp_path):
    """The shared cookie-banner line is flagged at min_docs=3 across
    its THREE case/whitespace/punctuation variants (docs 1-3 verbatim,
    doc 7 SHOUTED with extra digits-line noise, doc 8 comma-spaced):
    the normalized fingerprint unifies them; nothing else is flagged;
    blank fingerprints (digits-only lines) are excluded."""
    from tfm_taxitrips_spark.functions.boilerplate import (
        boilerplate_lines,
        boilerplate_lines_sql,
    )

    d = _write_docs(tmp_path)
    docs = spark.read.parquet(f"{d}/documents.parquet")
    sdf = boilerplate_lines(docs, 3).toPandas()
    ddf = _oracle(d, boilerplate_lines_sql(3))
    assert compare_result(sdf.copy(), ddf.copy())["hash_match"]

    banner = _py_fingerprint("Cookie banner text.")
    by_hash = {int(r["lhash"]): r for _, r in sdf.iterrows()}
    assert bool(by_hash[banner]["is_boilerplate"])
    # docs 1,2,3,7,8 all carry a banner variant; 5 distinct docs
    assert int(by_hash[banner]["n_docs"]) == 5
    assert int(by_hash[banner]["n_occurrences"]) == 5
    flagged = {h for h, r in by_hash.items() if r["is_boilerplate"]}
    assert flagged == {banner}
    # digits-only lines ('123!', '456?') normalize to '' and are
    # excluded: the empty fingerprint must not appear at all
    assert _py_fingerprint("123!") not in by_hash


def test_strip_boilerplate_matches_oracle_and_python(spark, tmp_path):
    """End-to-end removal parity + replay: flagged lines vanish from
    every document, survivors keep document order, emptied docs keep a
    row with empty text_clean, untouched docs reassemble verbatim."""
    from tfm_taxitrips_spark.functions.boilerplate import (
        strip_boilerplate,
        strip_boilerplate_sql,
    )

    d = _write_docs(tmp_path)
    docs = spark.read.parquet(f"{d}/documents.parquet")
    sdf = strip_boilerplate(docs, 3).toPandas()
    ddf = _oracle(d, strip_boilerplate_sql(3))
    assert compare_result(sdf.copy(), ddf.copy())["hash_match"]

    banner = _py_fingerprint("Cookie banner text.")
    want = {}
    for doc_id, text, _lg, _src in _DOCS:
        lines = _py_lines(text)
        if not lines:
            continue
        kept = [x for x in lines if _py_fingerprint(x) != banner]
        want[doc_id] = (len(lines), len(lines) - len(kept),
                        "\n".join(kept))
    got = {int(r["doc_id"]): (int(r["n_lines"]), int(r["n_removed"]),
                              r["text_clean"])
           for _, r in sdf.iterrows()}
    assert got == want
    # the no-punctuation doc is untouched and reassembles verbatim
    assert got[6] == (1, 0, "no punctuation single line doc")


def test_strip_with_high_threshold_is_identity_and_can_empty_docs(
        spark, tmp_path):
    """Two boundary probes: a threshold above every count removes
    nothing (n_removed == 0 for every doc); a corpus whose only content
    IS boilerplate (three one-line duplicate docs) strips to empty
    text_clean rather than dropping the rows."""
    from tfm_taxitrips_spark.functions.boilerplate import strip_boilerplate

    d = _write_docs(tmp_path)
    docs = spark.read.parquet(f"{d}/documents.parquet")
    untouched = strip_boilerplate(docs, 99).toPandas()
    assert (untouched["n_removed"] == 0).all()

    only = tmp_path / "only"
    only.mkdir()
    rows = [(i, "Subscribe to our newsletter!", "en", "web",
             28) for i in (1, 2, 3)]
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array([r[3] for r in rows], pa.string()),
        "n_chars": pa.array([r[4] for r in rows], pa.int64()),
    }), f"{only}/documents.parquet")
    emptied = strip_boilerplate(
        spark.read.parquet(f"{only}/documents.parquet"), 3).toPandas()
    assert len(emptied) == 3
    assert (emptied["n_removed"] == 1).all()
    assert (emptied["text_clean"] == "").all()


def test_terminal_punct_stats_parity(spark, tmp_path):
    """The paragraph-quality ppm in both engines, integer-exact; the
    no-punctuation doc reads 0 ppm — the registered-surface blocker
    this family documents."""
    from tfm_taxitrips_spark.functions.boilerplate import (
        terminal_punct_stats,
        terminal_punct_stats_sql,
    )

    d = _write_docs(tmp_path)
    docs = spark.read.parquet(f"{d}/documents.parquet")
    sdf = terminal_punct_stats(docs).toPandas()
    ddf = _oracle(d, terminal_punct_stats_sql())
    assert compare_result(sdf.copy(), ddf.copy())["hash_match"]
    by_id = {int(r["doc_id"]): r for _, r in sdf.iterrows()}
    assert int(by_id[6]["terminal_ppm"]) == 0
    assert int(by_id[2]["terminal_ppm"]) == 1_000_000
    # doc 7: '123!', '456?', banner '.', then an unterminated tail
    assert int(by_id[7]["n_lines"]) == 4
    assert int(by_id[7]["n_terminal"]) == 3
    assert int(by_id[7]["terminal_ppm"]) == 750_000


def test_whitespace_class_is_engine_portable(spark, tmp_path):
    """The boundary whitespace class is EXPLICIT ([ \\t\\r\\n\\f]), not
    ``\\s`` — Java's ``\\s`` includes \\x0B, RE2's does not, and
    Python's adds NBSP/unicode separators, so a ``\\s`` split would
    three-way-diverge on exotic whitespace (review finding, verified
    live). Pin the contract: tab/newline after terminal punctuation
    split in BOTH engines; vertical tab and NBSP do NOT split in
    EITHER."""
    from tfm_taxitrips_spark.functions.boilerplate import (
        _DOC_LINES_CTE,
        doc_lines,
    )

    rows = [
        (1, "Tab.\tsplits.", "en", "web"),
        (2, "Newline.\nsplits.", "en", "web"),
        (3, "Vtab.\x0bstays.", "en", "web"),
        (4, "Nbsp.\xa0stays.", "en", "web"),
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array([r[3] for r in rows], pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
    }), f"{tmp_path}/documents.parquet")

    sdf = (doc_lines(spark.read.parquet(f"{tmp_path}/documents.parquet"))
           .toPandas())
    ddf = _oracle(str(tmp_path),
                  f"WITH {_DOC_LINES_CTE} SELECT * FROM doc_lines")
    assert compare_result(sdf.copy(), ddf.copy())["hash_match"]
    n_lines = sdf.groupby("doc_id").size().to_dict()
    assert n_lines == {1: 2, 2: 2, 3: 1, 4: 1}
    # and the Python reference agrees line-for-line
    for doc_id, text, _lg, _src in rows:
        got = list(sdf[sdf["doc_id"] == doc_id]
                   .sort_values("line_no")["line"])
        assert got == _py_lines(text), doc_id


def test_family_is_registered_via_adapter(spark):
    """Flipped at the r18 freeze: the family IS registered — through
    the planted-punctuation adapter (``queries/boilerq.py``), closing
    the seven-round TESTDATA deadlock the r17 verdict ordered decided.
    The adapter derives sentence boundaries + planted banners
    deterministically from the fixture with identical expressions in
    both engines (see test_boilerq.py for the registered bundle's own
    suite); this machinery-level suite keeps grading the raw operators
    on synthetic punctuated corpora."""
    from tfm_taxitrips_spark.queries.registry import all_queries

    names = set(all_queries())
    assert {"boilerplate_line_table", "boilerplate_strip",
            "line_terminal_punct_ppm"} <= names


if __name__ == "__main__":
    import pytest

    raise SystemExit(pytest.main([__file__, "-q"]))
