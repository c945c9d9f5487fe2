"""Property-based hardening for the r16 guard rewriter
(``queries/guards.py``) — the one piece of the contract batch that is
TEXTUAL rewriting rather than typed plan construction, so its failure
modes are string-shaped and best hunted by generation, not examples.

Invariants (each a property over generated SQL-ish inputs):

1. the binding mask is LENGTH-PRESERVING and idempotent, and never
   invents non-space characters;
2. string literals and ``--`` comments survive ``guarded_scan_sql``
   byte-for-byte (the rewrite must never touch them);
3. every binding scan/qualifier is renamed — re-masking the output
   finds zero survivors — and the number of guard-name occurrences
   equals the number of binding occurrences in the input;
4. the output always parses as ``WITH <cte>, ...`` / ``WITH <cte>\\n``
   (the guard CTE is really prepended, RECURSIVE stays first).

Kept deliberately independent of DuckDB (no engine in the loop): these
are the STRING contracts the engine tests build on.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from tfm_taxitrips_spark.queries.guards import (
    _binding_mask,
    guarded_scan_sql,
)

# -- input generators --------------------------------------------------------

#: identifier-ish words that are NOT the guarded table
_WORDS = st.sampled_from(
    ["SELECT", "count(*)", "AS", "n", "x", "y", "col_a", "WHERE",
     "GROUP BY", "ORDER BY", "events_like", "preevents", "tbl", ","])

#: literal bodies: anything without quotes/newlines, plus '' escapes
_LIT_BODY = st.text(
    alphabet=st.characters(
        codec="ascii", exclude_characters="'\n\r"),
    max_size=12)

#: a guarded-table mention INSIDE a literal or comment (must survive)
_TRICKY = st.sampled_from(
    ["'FROM events'", "'events.user_id'", "-- join events tail\n",
     "'part'", "' JOIN events '"])


@st.composite
def sql_with_scans(draw):
    """A SQL-ish string with ≥1 binding ``FROM events`` scan, a random
    mix of filler words, literals, comments, tricky mentions, and
    optional qualified references — plus the ground-truth counts."""
    pieces: list[str] = ["SELECT a FROM events"]
    n_scans, n_quals = 1, 0
    for _ in range(draw(st.integers(0, 8))):
        kind = draw(st.integers(0, 6))
        if kind == 0:
            pieces.append(draw(_WORDS))
        elif kind == 1:
            pieces.append("'" + draw(_LIT_BODY) + "'")
        elif kind == 2:
            pieces.append(draw(_TRICKY))
        elif kind == 3:
            pieces.append("JOIN events")
            n_scans += 1
        elif kind == 4:
            pieces.append("events.user_id")
            n_quals += 1
        elif kind == 5:
            # the r16 ADVICE #1 overlap shape: the FROM of the operator
            # matches scan_re and the qualifier dot matches qual_re on
            # the SAME span — exactly ONE rename must come out
            pieces.append("x IS DISTINCT FROM events.user_id")
            n_quals += 1
        else:
            pieces.append("-- note\n")
    return " ".join(pieces), n_scans, n_quals


# -- properties ---------------------------------------------------------------

@settings(max_examples=300, deadline=None)
@given(st.text(max_size=200))
def test_mask_is_length_preserving_and_idempotent(s):
    m = _binding_mask(s)
    assert len(m) == len(s)
    assert _binding_mask(m) == m or "'" in m or "--" in m
    # masking only ever turns characters into spaces
    assert all(a == b or b == " " for a, b in zip(s, m))


@settings(max_examples=200, deadline=None)
@given(sql_with_scans())
def test_rewrite_preserves_literals_and_lands_every_binding(case):
    sql, n_scans, n_quals = case
    cte = "events_g AS (SELECT * FROM events)"
    try:
        out = guarded_scan_sql(sql, "events", "events_g", cte)
    except ValueError:
        # only the mask-order tripwire may fire, and only when the
        # generated text actually carries the hazard shape
        two = re.sub(r"'(?:[^']|'')*'", "''", re.sub(r"--[^\n]*", "", sql))
        one = re.sub(r"'(?:[^']|'')*'|--[^\n]*",
                     lambda m: "''" if m.group(0).startswith("'") else "",
                     sql)
        assert two != one
        return

    # (1) every string literal of the input survives byte-for-byte
    for lit in re.findall(r"'(?:[^']|'')*'", sql):
        assert lit in out, lit
    # (2) zero binding mentions of the bare table survive; the guard
    #     name appears exactly scans+qualifiers times (+1 inside the
    #     prepended CTE name itself, +1 for its body scan is NOT
    #     renamed — the body reads the raw view)
    body = out[out.index(cte) + len(cte):]
    masked_body = _binding_mask(body)
    assert not re.search(r"\bevents\b(?!_g)", masked_body, re.I)
    assert len(re.findall(r"\bevents_g\b", masked_body)) == (
        n_scans + n_quals)
    # (3) the output starts with the WITH list carrying our CTE
    assert out.lstrip().upper().startswith("WITH")
    assert cte in out


@settings(max_examples=100, deadline=None)
@given(sql_with_scans(), st.booleans())
def test_existing_with_lists_absorb_the_cte(case, recursive):
    sql, _n_scans, _n_quals = case
    kw = "WITH RECURSIVE" if recursive else "WITH"
    wrapped = (f"{kw} base AS (SELECT 1 AS a)\n"
               f"SELECT * FROM ({sql}) q JOIN base USING (a)")
    cte = "events_g AS (SELECT * FROM events)"
    try:
        out = guarded_scan_sql(wrapped, "events", "events_g", cte)
    except ValueError:
        return  # hazard tripwire, covered above
    head = out.lstrip()
    assert head.upper().startswith(kw)
    # the guard CTE is spliced right after the (RECURSIVE-qualified)
    # keyword, before the existing CTE
    assert head.upper().index("EVENTS_G AS") < head.upper().index(
        "BASE AS")


def test_overlap_span_renames_once_not_doubled():
    """r16 ADVICE #1 regression: when a token matches BOTH the scan and
    qualifier regexes (``x IS DISTINCT FROM orders.o_clerk``), the span
    used to be spliced twice, emitting ``orders_gorders_g.o_clerk`` —
    undetectable by the re-mask post-condition (no word boundary inside
    the doubled name). The set-dedupe renames it exactly once."""
    sql = "SELECT * FROM orders WHERE x IS DISTINCT FROM orders.o_clerk"
    cte = "orders_g AS (SELECT * FROM orders)"
    out = guarded_scan_sql(sql, "orders", "orders_g", cte)
    assert "orders_gorders_g" not in out
    body = out[out.index(cte) + len(cte):]
    assert "orders_g.o_clerk" in body
    assert not re.search(r"\borders\b(?!_g)", _binding_mask(body), re.I)


def test_star_bare_mention_outside_scan_position_refuses():
    """r16 ADVICE #2 regression: an oracle that reaches a star table
    through a shape the narrow FROM/JOIN trigger misses (comma join)
    must refuse at registration, not silently grade Spark-guarded
    against oracle-unguarded; a masked (literal) mention stays fine,
    and 'raw-ingest' opts out."""
    import pytest

    from tfm_taxitrips_spark.queries.registry import (
        QuerySpec,
        _guard_ingest_oracles,
    )

    def fn(spark, sf_dir):  # pragma: no cover — never invoked
        raise AssertionError

    comma_join = QuerySpec(fn, "SELECT * FROM region, orders")
    with pytest.raises(ValueError, match="outside FROM/JOIN scan"):
        _guard_ingest_oracles(comma_join)

    literal_only = QuerySpec(
        fn, "SELECT 'orders' AS label, r_name FROM region")
    assert _guard_ingest_oracles(literal_only).oracle \
        == literal_only.oracle

    raw = QuerySpec(fn, "SELECT * FROM region, orders",
                    tags=("raw-ingest",))
    assert _guard_ingest_oracles(raw).oracle == raw.oracle
