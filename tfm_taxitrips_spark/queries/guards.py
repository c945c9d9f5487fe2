"""Shared scan-seam guard machinery for DuckDB oracles.

A *guard seam* is the repo's answer to malformed ingest rows: ONE stated
contract applied where a table is scanned, in BOTH engines, instead of
N per-query accidents. The Spark side is a guarded reader
(``vectors.emb_table``, ``readers.events_guard``); the oracle side is a
mechanical rewrite that routes every table-position scan through a guard
CTE. This module holds the ONE rewriter both seams share — the r11
vector rewriter (hardened r12: case-insensitive, ``WITH RECURSIVE``
aware, loud on zero rewrites) generalized over the table name.
"""

from __future__ import annotations

import re


def guarded_scan_sql(
    sql: str, table_name: str, guard_name: str, guard_cte: str
) -> str:
    """Rewrite every table-position ``FROM/JOIN <table_name>`` in ``sql``
    to ``<guard_name>`` and prepend ``guard_cte`` (a complete
    ``name AS (...)`` clause) to the WITH list.

    Case-INSENSITIVE on both legs (a lowercase ``from events`` or a
    ``WITH\\n  RECURSIVE`` oracle must never silently skip the guard or
    emit invalid SQL), and the rewrite must land: every caller is, by
    definition, a reader of the guarded table, so zero rewritten scans
    means the regex missed a shape — fail loudly at import time rather
    than grade an unguarded oracle. (The guard CTE may not shadow the
    view it reads — DuckDB rejects that as a circular reference — hence
    the distinct ``guard_name``.)

    Constraints on oracle SQL passed here (the rewrite is textual over
    raw SQL, not a parse):

    - no ``<table_name>.`` qualified column references — the scan is
      renamed to ``<guard_name>``, so a leftover qualifier would fail to
      bind. Enforced below: any surviving qualifier raises at import
      time (use an alias: ``FROM events e`` + ``e.col``).
    - the table name must not appear in table-scan position inside
      string literals or comments — the regex cannot distinguish those
      and would rewrite them too (harmless for comments, corrupting for
      literals). No current oracle does either; keep it that way.
    """
    sql, n_scans = re.subn(
        rf"\b(FROM|JOIN)(\s+){table_name}\b",
        rf"\1\2{guard_name}", sql, flags=re.I)
    if not n_scans:
        raise ValueError(
            f"guarded_scan_sql: no FROM/JOIN {table_name} scan found — "
            "the oracle reads the table some other way; extend the rewrite")
    # check binding positions only: a label like '<table>.col' inside a
    # string literal, or a mention in a -- comment, is not a reference
    bindable = re.sub(r"'(?:[^']|'')*'", "''",
                      re.sub(r"--[^\n]*", "", sql))
    if re.search(rf"\b{table_name}\s*\.", bindable, flags=re.I):
        raise ValueError(
            f"guarded_scan_sql: '{table_name}.' qualified reference "
            "survives the scan rewrite and would fail to bind — alias "
            "the scan and qualify through the alias")
    stripped = sql.lstrip()
    head_len = len(sql) - len(stripped)
    m = re.match(r"WITH\b(\s+RECURSIVE\b)?", stripped, re.I)
    if m:
        # RECURSIVE qualifies the whole WITH list; the guard CTE itself
        # is non-recursive and must come after the keyword
        n = m.end()
        return f"{sql[:head_len + n]} {guard_cte},{stripped[n:]}"
    return f"WITH {guard_cte}\n{sql}"
