"""Behavioral tests for the round-12 fixes and operators. Oracle parity
is covered by the registry-wide differential sweep; these pin the
round's probe findings and advisory closures:

- the tokenizer-fertility denominator contract (r12 order #6): a
  token-free source keeps its audit row with an EXPLICIT NULL ratio in
  both engines;
- the hardened ``_emb_guard_sql`` rewriter (r11 advisory #2):
  case-insensitive scan matching, whitespace-tolerant ``WITH
  RECURSIVE`` detection, and a loud failure when no scan matched;
- the ``tools.symbols`` leftover-binding edge (r11 advisory #1): edits
  to a name bound inside top-level control flow must stale its users.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest


def _write_docs(tmp_path, rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    pdf["doc_id"] = pdf["doc_id"].astype("int64")
    pdf["lang"] = "en"
    pdf["n_chars"] = pdf["text"].str.len().astype("int64")
    pdf.to_parquet(os.path.join(tmp_path, "documents.parquet"))


def test_fertility_token_free_source_keeps_row_with_null_ratio(
        spark, tmp_path):
    """Round-12 planted probe (r11 advisory #3 + verdict order #6): a
    source whose every doc is whitespace/punctuation-free-of-BPE-tokens
    — here pure whitespace, so the BPE regex matches nothing while the
    whitespace split still yields empty tokens — must keep its audit
    row, carry n_bpe_tokens = 0, and emit an EXPLICIT NULL
    chars_per_token_ppm in BOTH engines (never an engine-accident or a
    crash)."""
    from tfm_taxitrips_spark.queries.text import (
        _FERTILITY_SQL,
        q_tokenizer_fertility_audit,
    )
    from tests.oracle import compare_result

    _write_docs(tmp_path, [
        (1, "web", "the quick brown fox"),
        (2, "web", "jumps over 42 lazy dogs!"),
        (3, "blank", " "),       # splits to ['', ''] — zero BPE tokens
        (4, "blank", "  "),
        (5, None, "null source stays a real audit row"),
    ])
    actual = q_tokenizer_fertility_audit(spark, str(tmp_path)).toPandas()
    conn = duckdb.connect()
    conn.sql("CREATE VIEW documents AS SELECT * FROM "
             f"'{tmp_path}/documents.parquet'")
    try:
        expected = conn.sql(_FERTILITY_SQL).df()
    finally:
        conn.close()
    rec = compare_result(actual.copy(), expected)
    assert rec["hash_match"], rec

    blank = actual[actual["source"] == "blank"].iloc[0]
    assert int(blank["n_bpe_tokens"]) == 0
    assert pd.isna(blank["chars_per_token_ppm"])     # explicit, contractual
    assert int(blank["fertility_ppm"]) == 0          # 0 tokens / 4 words
    assert len(actual) == 3                          # no row vanished


def test_emb_guard_sql_case_and_whitespace_tolerant():
    """r11 advisory #2, pinned: the oracle rewriter must guard a
    lowercase ``from embeddings`` scan, survive a ``WITH`` / ``WITH
    <newline> RECURSIVE`` prefix in any case, and refuse loudly when the
    SQL reads embeddings some way the rewrite can't see."""
    from tfm_taxitrips_spark.queries.vectors import _emb_guard_sql

    # lowercase scan: must be rewritten, not silently left unguarded
    g = _emb_guard_sql("select vec_id from embeddings")
    assert "embeddings_g" in g.split("WITH", 1)[1]
    assert "from embeddings_g" in g

    # WITH with a newline before RECURSIVE: the guard CTE must land
    # AFTER the RECURSIVE keyword, producing valid SQL
    sql = ("WITH\n  RECURSIVE r AS (SELECT 1 AS n)\n"
           "SELECT n FROM r JOIN embeddings ON true")
    g = _emb_guard_sql(sql)
    head = g[:g.index("embeddings_g AS")]
    assert "RECURSIVE" in head.upper()
    assert "JOIN embeddings_g" in g

    # lowercase 'with' CTE prefix
    g = _emb_guard_sql("with x as (select 1) select * from embeddings")
    assert g.lower().count("with") >= 1
    assert "from embeddings_g" in g
    # the guard CTE is spliced into the EXISTING with-list (no second
    # top-level WITH keyword introduced before the original list)
    assert "embeddings_g AS" in g.split("x as", 1)[0]

    # no embeddings scan at all: a caller bug — refuse, don't no-op
    with pytest.raises(ValueError):
        _emb_guard_sql("SELECT 1")


def test_emb_guard_sql_rewrites_execute_in_duckdb(tmp_path):
    """The hardened rewriter's output must still be SQL DuckDB runs —
    for the recursive, lowercase, and plain shapes — against a store
    with a planted malformed row the guard must exclude."""
    import numpy as np

    from tfm_taxitrips_spark.queries.vectors import (
        EMB_MIN_DIMS,
        _emb_guard_sql,
    )

    rng = np.random.RandomState(3)
    rows = [(i, rng.rand(EMB_MIN_DIMS).astype("float32").tolist(), 0)
            for i in range(4)]
    rows.append((99, None, 0))
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    pdf.to_parquet(os.path.join(tmp_path, "embeddings.parquet"))
    conn = duckdb.connect()
    conn.sql("CREATE VIEW embeddings AS SELECT * FROM "
             f"'{tmp_path}/embeddings.parquet'")
    try:
        for sql in (
            "select count(*) as n from embeddings",
            "with c as (select vec_id from embeddings) "
            "select count(*) as n from c",
            "WITH\nRECURSIVE r AS (SELECT 1 AS i UNION ALL "
            "SELECT i + 1 FROM r WHERE i < 2) "
            "SELECT count(*) AS n FROM r JOIN embeddings ON true",
        ):
            out = conn.sql(_emb_guard_sql(sql)).df()
            assert int(out["n"].iloc[0]) % 4 == 0   # 99 excluded everywhere
    finally:
        conn.close()


def test_symbols_leftover_bound_names_edge_to_module_sym():
    """r11 advisory #1, failing-first before the fix: a constant bound
    by top-level control flow (try/except, if) pools into <module>, and
    its REFERENCING symbols must edge there — editing the block must
    stale the users, preserving the module's 'extra staleness, never
    missed' guarantee."""
    from tools.symbols import (
        changed_symbols,
        closure,
        index_files,
        symbol_graph,
    )

    path = os.path.join("tfm_taxitrips_spark", "queries", "fake.py")
    old = {path: (
        "try:\n    SPEED = 1\nexcept Exception:\n    SPEED = 2\n"
        "\n"
        "def q_user(spark, sf_dir):\n    return SPEED\n"
        "\n"
        "def q_unrelated(spark, sf_dir):\n    return 7\n"
    )}
    new = {path: old[path].replace("SPEED = 1", "SPEED = 10")}

    ch = changed_symbols(old, new)
    assert ch == {(path, "<module>")}

    graph = symbol_graph(index_files(old))
    user_closure = closure(graph, {(path, "q_user")})
    assert (path, "<module>") in user_closure          # the fixed edge
    other = closure(graph, {(path, "q_unrelated")})
    assert (path, "<module>") not in other             # no blanket edge
