"""Shared scan-seam guard machinery for DuckDB oracles.

A *guard seam* is the repo's answer to malformed ingest rows: ONE stated
contract applied where a table is scanned, in BOTH engines, instead of
N per-query accidents. The Spark side is a guarded reader
(``vectors.emb_table``, ``readers.events_guard``, and — since the r16
non-finite ingest contract — ``contracts.star_guard`` inside
``readers.table()``); the oracle side is a mechanical rewrite that
routes every table-position scan through a guard CTE. This module holds
the ONE rewriter all seams share — the r11 vector rewriter (hardened
r12: case-insensitive, ``WITH RECURSIVE`` aware, loud on zero rewrites;
r16: single-pass binding mask, position-exact rewrites, qualified-
reference rename) generalized over the table name.
"""

from __future__ import annotations

import re

#: ONE left-to-right alternation: a string literal ('' escapes included)
#: or a ``--`` line comment, whichever starts first. Single-pass, so a
#: ``--`` INSIDE a literal is consumed as literal text and an apostrophe
#: inside a comment is consumed as comment text — the two-pass ordering
#: hazard (comments stripped first chopped a literal containing ``--``,
#: unbalancing the quote mask; r13/r14 ADVICE) cannot occur.
_MASK_RE = re.compile(r"'(?:[^']|'')*'|--[^\n]*")


def _binding_mask(sql: str) -> str:
    """LENGTH-PRESERVING binding mask: literal and comment spans become
    spaces, so a regex match position in the masked text is valid in the
    raw text — rewrites found here splice into the original SQL without
    ever touching a literal or comment."""
    return _MASK_RE.sub(lambda m: " " * len(m.group(0)), sql)


def _mask_cross_check(sql: str) -> None:
    """Import-time tripwire (r14 ADVICE #2's second half): the retired
    two-pass mask and the single-pass mask must agree on every oracle
    that reaches the guard. They diverge only when a literal contains
    ``--`` or a comment contains an unpaired apostrophe — shapes no
    registered oracle uses and that historically corrupted the binding
    mask silently. The single-pass mask IS correct on such input, but a
    first occurrence should be a deliberate, reviewed decision (delete
    this check then), not a silent behavior change."""
    two_pass = re.sub(r"'(?:[^']|'')*'", "''", re.sub(r"--[^\n]*", "", sql))
    single_pass = _MASK_RE.sub(
        lambda m: "''" if m.group(0).startswith("'") else "", sql)
    if two_pass != single_pass:
        raise ValueError(
            "guarded_scan_sql: oracle contains a literal/comment shape "
            "where comment-vs-literal masking order matters (a '--' "
            "inside a string literal, or a stray apostrophe in a "
            "comment). The single-pass mask handles it correctly, but "
            "review the oracle and drop this tripwire deliberately "
            "before relying on that."
        )


def guarded_scan_sql(
    sql: str, table_name: str, guard_name: str, guard_cte: str
) -> str:
    """Rewrite every table-position ``FROM/JOIN <table_name>`` AND every
    ``<table_name>.``-qualified column reference in ``sql`` to
    ``<guard_name>``, then prepend ``guard_cte`` (a complete
    ``name AS (...)`` clause) to the WITH list.

    Case-INSENSITIVE on every leg (a lowercase ``from events`` or a
    ``WITH\\n  RECURSIVE`` oracle must never silently skip the guard or
    emit invalid SQL), and the rewrite must land: every caller is, by
    definition, a reader of the guarded table, so zero rewritten scans
    means the regex missed a shape — fail loudly at import time rather
    than grade an unguarded oracle. (The guard CTE may not shadow the
    view it reads — DuckDB rejects that as a circular reference — hence
    the distinct ``guard_name``.)

    The rewrite is textual over raw SQL, not a parse, made safe by the
    length-preserving single-pass binding mask: match positions are
    found in the MASKED text (literals/comments blanked) and spliced
    into the raw text, so a table name inside a string literal or
    comment is never rewritten — a label like ``'events.user_id'``
    (key_skew_audit's key_column values) or a ``--`` comment mention
    stays byte-identical, while every BINDING occurrence is renamed.
    Qualified references are renamed rather than rejected (r16 — the
    star oracles qualify through the table name, unlike the
    alias-disciplined events oracles), and a post-condition re-masks
    the rewritten SQL to prove no binding qualifier survived.
    """
    _mask_cross_check(sql)
    masked = _binding_mask(sql)

    scan_re = re.compile(rf"\b(?:FROM|JOIN)\s+({table_name})\b", re.I)
    scan_spans = [m.span(1) for m in scan_re.finditer(masked)]
    if not scan_spans:
        raise ValueError(
            f"guarded_scan_sql: no FROM/JOIN {table_name} scan found — "
            "the oracle reads the table some other way; extend the rewrite")

    qual_re = re.compile(rf"\b({table_name})\s*\.", re.I)
    qual_spans = [m.span(1) for m in qual_re.finditer(masked)]

    out, pos = [], 0
    # set-dedupe (r16 ADVICE #1): a token can match BOTH regexes — in
    # ``x IS DISTINCT FROM orders.o_clerk`` the ``FROM`` of the operator
    # puts the span in scan_spans while the qualifier dot puts the SAME
    # span in qual_spans — and a doubled span would splice the guard
    # name twice (``orders_gorders_g.…``), a corruption the re-mask
    # post-condition below cannot see (no word boundary survives inside
    # the doubled name).
    for start, end in sorted(set(scan_spans + qual_spans)):
        out.append(sql[pos:start])
        out.append(guard_name)
        pos = end
    out.append(sql[pos:])
    sql = "".join(out)
    # post-condition: every binding occurrence was renamed — a survivor
    # in the re-masked text means the span arithmetic broke, and the
    # oracle would fail to bind (or bind to the unguarded view) at the
    # sweep; refuse here instead
    if qual_re.search(_binding_mask(sql)):
        raise AssertionError(
            f"guarded_scan_sql: a binding '{table_name}.' reference "
            "survived the rename — rewrite positions out of sync")

    stripped = sql.lstrip()
    head_len = len(sql) - len(stripped)
    m = re.match(r"WITH\b(\s+RECURSIVE\b)?", stripped, re.I)
    if m:
        # RECURSIVE qualifies the whole WITH list; the guard CTE itself
        # is non-recursive and must come after the keyword
        n = m.end()
        return f"{sql[:head_len + n]} {guard_cte},{stripped[n:]}"
    return f"WITH {guard_cte}\n{sql}"
