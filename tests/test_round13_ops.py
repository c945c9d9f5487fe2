"""Round-13 operator and guard-seam tests.

Covers the r12 ADVICE closures first (the guard seam's loud-failure
guarantees); the round's new operators append below.
"""

from __future__ import annotations

import dataclasses

import pytest

from tfm_taxitrips_spark.queries.guards import guarded_scan_sql
from tfm_taxitrips_spark.queries.registry import (
    QuerySpec,
    _guard_ingest_oracles,
)


def _noop_fn(spark, sf_dir):  # pragma: no cover - never executed
    raise NotImplementedError


def test_events_guard_detector_broader_than_rewrite():
    """r12 ADVICE #1: an oracle that reaches events through a scan shape
    the rewriter misses (comma join) must fail LOUDLY at merge time, not
    silently grade Spark-guarded vs oracle-unguarded. The detector
    triggers on ``\\bevents\\b`` anywhere; guarded_scan_sql's
    zero-rewrites ValueError then fires."""
    comma_join = QuerySpec(
        fn=_noop_fn,
        oracle="SELECT count(*) AS n FROM (SELECT 1 AS x) a, events",
    )
    with pytest.raises(ValueError, match="no FROM/JOIN events"):
        _guard_ingest_oracles(comma_join)

    # the plain scan shape still rewrites (the existing 47 oracles)
    plain = QuerySpec(fn=_noop_fn,
                      oracle="SELECT count(*) AS n FROM events")
    guarded = _guard_ingest_oracles(plain)
    assert "FROM events_g" in guarded.oracle
    assert "events_g AS (" in guarded.oracle

    # raw-ingest opt-out and no-mention oracles pass through untouched
    raw = dataclasses.replace(plain, tags=("raw-ingest",))
    assert _guard_ingest_oracles(raw).oracle == plain.oracle
    other = QuerySpec(fn=_noop_fn, oracle="SELECT 1 AS x FROM documents")
    assert _guard_ingest_oracles(other).oracle == other.oracle


def test_guard_ingest_applies_star_ctes_in_scan_position_only():
    """The r16 star seam: a FROM/JOIN-position star scan is routed
    through its guard CTE; a star table name inside a literal (words
    like 'part' appear in labels across the registry) neither triggers
    the guard nor gets rewritten — the deliberate narrowing vs the
    events trigger (ROUND15_NOTES §13), with the default-on non-finite
    sweep as the compensating detector for exotic scan shapes."""
    star = QuerySpec(
        fn=_noop_fn,
        oracle="SELECT count(*) AS n FROM lineitem JOIN orders "
               "ON lineitem.l_orderkey = orders.o_orderkey",
    )
    guarded = _guard_ingest_oracles(star)
    assert "FROM lineitem_g" in guarded.oracle
    assert "JOIN orders_g" in guarded.oracle
    assert "lineitem_g.l_orderkey = orders_g.o_orderkey" in guarded.oracle
    assert "lineitem_g AS (" in guarded.oracle
    assert "orders_g AS (" in guarded.oracle

    literal_only = QuerySpec(
        fn=_noop_fn,
        oracle="SELECT 'part' AS label, count(*) AS n FROM documents",
    )
    assert _guard_ingest_oracles(literal_only).oracle == literal_only.oracle


def test_guarded_scan_sql_renames_qualified_references():
    """r16 (supersedes the r12 reject-with-message behavior): a
    ``<table>.col`` qualifier is RENAMED with the scan — the star
    oracles qualify through the table name, and a rejected oracle
    would have forced an alias rewrite of half the SQL suite."""
    sql = "SELECT events.user_id AS u FROM events"
    out = guarded_scan_sql(sql, "events", "events_g",
                           "events_g AS (SELECT * FROM events)")
    assert "SELECT events_g.user_id AS u FROM events_g" in out


def test_guarded_scan_sql_ignores_literal_and_comment_mentions():
    """The qualifier check must see BINDING positions only: a string
    literal label like 'events.user_id' (key_skew_audit's key_column)
    or a -- comment mention is not a reference."""
    sql = ("SELECT 'events.user_id' AS key_column,\n"
           "       count(*) AS n  -- counts events.user_id keys\n"
           "FROM events")
    out = guarded_scan_sql(sql, "events", "events_g",
                           "events_g AS (SELECT * FROM events)")
    assert "FROM events_g" in out
    assert "'events.user_id'" in out  # literal untouched


# --------------------------------------------------------------------------
# round-13 operators: exact-Python replays + NULL probes
# --------------------------------------------------------------------------

import hashlib
import os

import duckdb
import pandas as pd


def _write_docs(tmp_path, rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    pdf["doc_id"] = pdf["doc_id"].astype("int64")
    pdf["text"] = pdf["text"].astype("string")
    pdf["source"] = pdf["source"].astype("string")
    pdf["lang"] = "en"
    pdf["n_chars"] = pdf["text"].str.len().astype("Int64")
    pdf.to_parquet(os.path.join(tmp_path, "documents.parquet"))


def _write_events(tmp_path, rows):
    """rows: list[(event_id, ts_or_None, user_id, event_type, value,
    props)] — ts as pandas Timestamp or None."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array([r[5] for r in rows], pa.string()),
    })
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))


def _shard(doc_id: int) -> int:
    """Python twin of the pack-layout shard: hash60('shard:'||id) % 8."""
    h = hashlib.md5(f"shard:{doc_id}".encode()).hexdigest()
    return int(h[:15], 16) % 8


def _tok(text):
    """Whitespace token count with the NULL→0 contract."""
    return 0 if text is None else len(text.split(" "))


_PA_DOCS = [
    # sized so packs fill/overflow the 2048 budget: boundary-straddling
    # docs, underfull shard tails, and a NULL-text doc (0 tokens)
    (i, "web", " ".join(["w"] * n))
    for i, n in enumerate([1500, 1300, 900, 2500, 700, 60, 1800, 2100,
                           400, 1200, 2047, 5, 1, 3000, 800], start=1)
] + [(16, "web", None), (17, "web", "tail doc"),
     (18, "web", " ".join(["x"] * 300))]


def test_pack_attention_waste_matches_exact_python_reference(
        spark, tmp_path):
    """pack_attention_waste replayed in exact Python ints over the
    planted pack corpus: the shared _pack_layout re-derived, then the
    causal-pair accounting (total T(T+1)/2, intra Σ L(L+1)/2, cross =
    total − intra) and the floor-div waste ppm — engine parity AND
    replay agreement, NULL-text doc contributing zero pairs to both
    sides of the subtraction."""
    from tests.oracle import compare_result
    from tfm_taxitrips_spark.queries.dataprep import (
        _PACK_BUDGET,
        _PACK_WASTE_SQL,
        q_pack_attention_waste,
    )

    _write_docs(tmp_path, _PA_DOCS)
    actual = q_pack_attention_waste(spark, str(tmp_path)).toPandas()
    conn = duckdb.connect()
    conn.sql("CREATE VIEW documents AS SELECT * FROM "
             f"'{tmp_path}/documents.parquet'")
    try:
        expected = conn.sql(_PACK_WASTE_SQL).df()
    finally:
        conn.close()
    assert compare_result(actual.copy(), expected)["hash_match"]

    packs: dict = {}
    before: dict = {}
    for doc_id, _src, text in sorted(_PA_DOCS):
        sh, nt = _shard(doc_id), _tok(text)
        pid = before.get(sh, 0) // _PACK_BUDGET
        pt, intra = packs.get((sh, pid), (0, 0))
        packs[(sh, pid)] = (pt + nt, intra + nt * (nt + 1) // 2)
        before[sh] = before.get(sh, 0) + nt
    shards: dict = {}
    for (sh, _pid), (pt, intra) in packs.items():
        np_, tot, intr = shards.get(sh, (0, 0, 0))
        shards[sh] = (np_ + 1, tot + pt * (pt + 1) // 2, intr + intra)
    got = {
        int(r["shard"]): (
            int(r["n_packs"]), int(r["total_pairs"]), int(r["intra_pairs"]),
            int(r["cross_pairs"]),
            None if pd.isna(r["waste_ppm"]) else int(r["waste_ppm"]))
        for _, r in actual.iterrows()
    }
    want = {
        sh: (np_, tot, intr, tot - intr,
             None if tot == 0 else (tot - intr) * 1_000_000 // tot)
        for sh, (np_, tot, intr) in shards.items()
    }
    assert got == want
    # non-degenerate: real cross-doc waste exists somewhere
    assert any(v[3] > 0 for v in got.values())


def test_pack_attention_waste_zero_token_shard_null_ppm(spark, tmp_path):
    """NULL probe: a shard whose only docs are NULL-text packs zero
    token mass — zero pairs on both sides, waste_ppm explicit NULL via
    the NULLIF contract (never a div-by-zero), both engines."""
    from tests.oracle import compare_result
    from tfm_taxitrips_spark.queries.dataprep import (
        _PACK_WASTE_SQL,
        q_pack_attention_waste,
    )

    # find doc_ids landing in distinct shards; make one shard all-NULL
    by_shard: dict = {}
    for doc_id in range(1, 200):
        by_shard.setdefault(_shard(doc_id), []).append(doc_id)
    null_shard = _shard(1)
    rows = [(d, "web", None) for d in by_shard[null_shard][:2]]
    other = [s for s in by_shard if s != null_shard][0]
    rows += [(d, "web", "a b c d e") for d in by_shard[other][:2]]
    _write_docs(tmp_path, rows)

    actual = q_pack_attention_waste(spark, str(tmp_path)).toPandas()
    conn = duckdb.connect()
    conn.sql("CREATE VIEW documents AS SELECT * FROM "
             f"'{tmp_path}/documents.parquet'")
    try:
        expected = conn.sql(_PACK_WASTE_SQL).df()
    finally:
        conn.close()
    assert compare_result(actual.copy(), expected)["hash_match"]
    nrow = actual[actual["shard"] == null_shard].iloc[0]
    assert int(nrow["total_pairs"]) == 0
    assert pd.isna(nrow["waste_ppm"])  # explicit contract, not a crash


def _ascii_lower_py(s: str) -> str:
    return "".join(
        chr(ord(c) + 32) if "A" <= c <= "Z" else c for c in s)


def _shingles3(text):
    if text is None:
        return []
    words = _ascii_lower_py(text).split(" ")
    if len(words) < 3:
        return []
    return [" ".join(words[i:i + 3]) for i in range(len(words) - 2)]


_OVL_DOCS = [
    # 'a' and 'b' share a long boilerplate run (set overlap without
    # near-dup pairs); 'c' is disjoint; NULL source is a real bucket
    # overlapping 'a'; 'empty' has only NULL/short text (zero shingles)
    (1, "a", "the quick brown fox jumps over the lazy dog"),
    (2, "a", "completely different stuff in source a here now"),
    (3, "b", "the quick brown fox jumps over a sleeping cat"),
    (4, "b", "unrelated b content words here"),
    (5, "c", "nothing shared with anyone else at all ever"),
    (6, None, "the quick brown fox appears again verbatim"),
    (7, "empty", None),
    (8, "empty", "too short"),
]


def test_source_ngram_overlap_matrix_matches_exact_python_reference(
        spark, tmp_path):
    """source_ngram_overlap_matrix replayed in exact Python: per-source
    DISTINCT 3-gram sets, pairwise |∩| over the full NULLS-FIRST-ordered
    source grid, zero-filled misses, floor-div jaccard ppm, and the
    explicit-NULL row for a pair of shingle-free sources."""
    from tests.oracle import compare_result
    from tfm_taxitrips_spark.queries.registry import all_queries

    _write_docs(tmp_path, _OVL_DOCS)
    spec = all_queries()["source_ngram_overlap_matrix"]
    actual = spec.fn(spark, str(tmp_path)).toPandas()
    conn = duckdb.connect()
    conn.sql("CREATE VIEW documents AS SELECT * FROM "
             f"'{tmp_path}/documents.parquet'")
    try:
        expected = conn.sql(spec.oracle).df()
    finally:
        conn.close()
    assert compare_result(actual.copy(), expected)["hash_match"]

    sets: dict = {}
    for _id, src, text in _OVL_DOCS:
        sets.setdefault(src, set()).update(_shingles3(text))
    srcs = sorted((s for s in sets if s is not None))
    if None in sets:
        srcs = [None] + srcs  # NULLS FIRST pair convention
    want = {}
    for i, lo in enumerate(srcs):
        for hi in srcs[i + 1:]:
            inter = len(sets[lo] & sets[hi])
            denom = len(sets[lo]) + len(sets[hi]) - inter
            want[(lo, hi)] = (
                len(sets[lo]), len(sets[hi]), inter,
                None if denom == 0 else inter * 1_000_000 // denom)
    got = {
        (None if pd.isna(r["source_lo"]) else r["source_lo"],
         None if pd.isna(r["source_hi"]) else r["source_hi"]): (
            int(r["sz_lo"]), int(r["sz_hi"]), int(r["n_inter"]),
            None if pd.isna(r["jaccard_ppm"]) else int(r["jaccard_ppm"]))
        for _, r in actual.iterrows()
    }
    assert got == want
    # probes: NULL source overlaps 'a' for real; disjoint pair zero-
    # filled; shingle-free source present with explicit-NULL vs itself
    assert got[(None, "a")][2] > 0
    assert got[("b", "c")][2] == 0 and got[("b", "c")][3] == 0
    assert got[("a", "empty")] == (got[("a", "empty")][0], 0, 0, 0)


_TTL_T0 = pd.Timestamp("2024-01-01 00:00:00")
_H = pd.Timedelta(hours=1)
_US = pd.Timedelta(microseconds=1)

_TTL_EVENTS = [
    # user 1: admit t0; +1h suppressed; +25h re-arms; duplicate ts at
    # +25h suppressed; +49h0s1us > (+25h)+24h admitted
    (1, _TTL_T0, 1, "click", 1.0, "{}"),
    (2, _TTL_T0 + 1 * _H, 1, "click", 1.0, "{}"),
    (3, _TTL_T0 + 25 * _H, 1, "view", 1.0, "{}"),
    (4, _TTL_T0 + 25 * _H, 1, "view", 2.0, "{}"),
    (5, _TTL_T0 + 49 * _H + _US, 1, "view", 1.0, "{}"),
    # user 2: the strict-> boundary — exactly anchor+TTL is SUPPRESSED,
    # one µs past it is admitted
    (6, _TTL_T0, 2, "click", 1.0, "{}"),
    (7, _TTL_T0 + 24 * _H, 2, "click", 1.0, "{}"),
    (8, _TTL_T0 + 24 * _H + _US, 2, "click", 1.0, "{}"),
    # NULL user: a real key, two events inside one window
    (9, _TTL_T0, None, "view", 1.0, "{}"),
    (10, _TTL_T0 + 2 * _H, None, "view", 1.0, "{}"),
    # user 3: one NULL-ts row (excluded by the events guard in BOTH
    # engines) + one NaN value (normalized; value unused here)
    (11, None, 3, "click", 1.0, "{}"),
    (12, _TTL_T0, 3, "click", float("nan"), "{}"),
]


def test_stream_dedup_ttl_matches_exact_python_reference(spark, tmp_path):
    """stream_dedup_ttl replayed as an exact greedy anchor walk per key:
    first event admits and anchors, ts ≤ anchor+TTL suppresses (without
    refreshing), strictly-past re-arms. Engine parity runs the
    REGISTERED (events-guarded) oracle so the NULL-ts row is excluded on
    both sides; the NULL user key is a real state key."""
    from tests.oracle import compare_result
    from tfm_taxitrips_spark.operators.temporal import _duration_us
    from tfm_taxitrips_spark.queries.registry import all_queries
    from tfm_taxitrips_spark.queries.streamq import STREAM_DEDUP_TTL

    _write_events(tmp_path, _TTL_EVENTS)
    spec = all_queries()["stream_dedup_ttl"]
    actual = spec.fn(spark, str(tmp_path)).toPandas()
    conn = duckdb.connect()
    conn.sql("CREATE VIEW events AS SELECT * FROM "
             f"'{tmp_path}/events.parquet'")
    try:
        expected = conn.sql(spec.oracle).df()
    finally:
        conn.close()
    assert compare_result(actual.copy(), expected)["hash_match"]

    ttl_us = _duration_us(STREAM_DEDUP_TTL)
    chains: dict = {}
    for _eid, ts, uid, _et, _v, _p in _TTL_EVENTS:
        if ts is None:
            continue  # the events-guard exclusion
        chains.setdefault(uid, []).append(ts.value // 1000)  # ns → µs
    want = {}
    for uid, uss in chains.items():
        anchor, adm = None, 0
        for us in sorted(uss):
            if anchor is None or us > anchor + ttl_us:
                anchor, adm = us, adm + 1
        want[uid] = (len(uss), adm,
                     (len(uss) - adm) * 1_000_000 // len(uss))
    got = {
        (None if pd.isna(r["user_id"]) else int(r["user_id"])): (
            int(r["n_events"]), int(r["n_admitted"]),
            int(r["suppressed_ppm"]))
        for _, r in actual.iterrows()
    }
    assert got == want
    assert got[1] == (5, 3, 400_000)      # dup-ts + in-window suppressed
    assert got[2] == (3, 2, 333_333)      # exact-boundary suppressed
    assert got[None] == (2, 1, 500_000)   # NULL key is a real state key
    assert got[3] == (1, 1, 0)            # NULL-ts row never counted


# --------------------------------------------------------------------------
# r13 star-table sweep findings, pinned failing-first (ROUND13_NOTES §5)
# --------------------------------------------------------------------------

import pyarrow as pa
import pyarrow.parquet as pq


def _write_table(tmp_path, name, typed_cols):
    """typed_cols: {col: (pa_type, [values])}."""
    t = pa.table({c: pa.array(v, typ) for c, (typ, v) in typed_cols.items()})
    pq.write_table(t, os.path.join(tmp_path, f"{name}.parquet"))


_TS = pa.timestamp("us")


def _orders(tmp_path, rows):
    """rows: (o_orderkey, o_custkey, status, totalprice, orderdate,
    priority)."""
    _write_table(tmp_path, "orders", {
        "o_orderkey": (pa.int64(), [r[0] for r in rows]),
        "o_custkey": (pa.int64(), [r[1] for r in rows]),
        "o_orderstatus": (pa.string(), [r[2] for r in rows]),
        "o_totalprice": (pa.float64(), [r[3] for r in rows]),
        "o_orderdate": (_TS, [None if r[4] is None else pd.Timestamp(r[4])
                              for r in rows]),
        "o_orderpriority": (pa.string(), [r[5] for r in rows]),
    })


def _lineitem(tmp_path, rows):
    """rows: (l_orderkey, linenumber, quantity, extendedprice, discount,
    tax, returnflag, linestatus, shipdate)."""
    _write_table(tmp_path, "lineitem", {
        "l_orderkey": (pa.int64(), [r[0] for r in rows]),
        "l_partkey": (pa.int64(), [1] * len(rows)),
        "l_suppkey": (pa.int64(), [1] * len(rows)),
        "l_linenumber": (pa.int32(), [r[1] for r in rows]),
        "l_quantity": (pa.float64(), [r[2] for r in rows]),
        "l_extendedprice": (pa.float64(), [r[3] for r in rows]),
        "l_discount": (pa.float64(), [r[4] for r in rows]),
        "l_tax": (pa.float64(), [r[5] for r in rows]),
        "l_returnflag": (pa.string(), [r[6] for r in rows]),
        "l_linestatus": (pa.string(), [r[7] for r in rows]),
        "l_shipdate": (_TS, [None if r[8] is None else pd.Timestamp(r[8])
                             for r in rows]),
    })


def _duck_compare(tmp_path, name, tables=("orders",)):
    from tests.oracle import compare_result
    from tfm_taxitrips_spark.queries.registry import all_queries

    spec = all_queries()[name]
    conn = duckdb.connect()
    for t in tables:
        conn.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                 f"'{tmp_path}/{t}.parquet'")
    try:
        expected = conn.sql(spec.oracle).df()
    finally:
        conn.close()
    return spec, expected, compare_result


def test_benford_null_digit_gets_null_expectation(spark, tmp_path):
    """r13 sweep findings, both phases: (a) Spark's element_at with a
    NULL COLUMN index returns the LAST array element (45757, the
    digit-9 expectation) — not NULL like the literal form and DuckDB's
    CASE; (b) a negative price's leading '-' crashed the ANSI
    string→int cast, and an exactly-zero price has no significant
    digit. Contract: digits come from abs(cents); zero and NULL fold
    into the NULL-digit bucket with explicit-NULL expectation, both
    engines."""
    _lineitem(tmp_path, [
        (1, 1, 1.0, 310.0, 0.0, 0.0, "N", "O", "1995-01-01"),
        (1, 2, 1.0, 110.0, 0.0, 0.0, "N", "O", "1995-01-02"),
        (1, 3, None, None, None, None, None, None, None),  # NULL group
        # phase-2 probes: negative reversal (digit from magnitude → 1),
        # exactly-zero price (no significant digit → NULL bucket)
        (1, 4, 1.0, -123.45, 0.5, 0.1, "R", "F", "1995-01-03"),
        (1, 5, 1.0, 0.0, 1.0, 0.0, "R", "F", "1995-01-04"),
    ])
    spec, expected, compare_result = _duck_compare(
        tmp_path, "benford_digit_audit", ("lineitem",))
    actual = spec.fn(spark, str(tmp_path)).toPandas()
    assert compare_result(actual.copy(), expected)["hash_match"]
    nrow = actual[actual["segment"].isna()].iloc[0]
    assert pd.isna(nrow["exp_ppm"]) and pd.isna(nrow["abs_dev_ppm"])
    assert int(nrow["obs_ppm"]) == 1_000_000  # its own (NULL) segment
    r = actual[actual["segment"] == "R"]
    neg = r[r["digit"] == 1].iloc[0]
    assert int(neg["n"]) == 1                  # |-123.45| leads with 1
    zero = r[r["digit"].isna()].iloc[0]
    assert int(zero["n"]) == 1                 # zero price: NULL bucket
    assert pd.isna(zero["exp_ppm"])


def test_pareto_excludes_null_axis_parts(spark, tmp_path):
    """r13 sweep finding: an all-NULL part is vacuously undominated
    under SQL NOT EXISTS but dropped by the skyline composition —
    stated contract: unrankable rows are excluded in BOTH engines."""
    _write_table(tmp_path, "part", {
        "p_partkey": (pa.int64(), [1, 2, 3]),
        "p_name": (pa.string(), ["a", "b", None]),
        "p_brand": (pa.string(), ["B#1", "B#1", None]),
        "p_type": (pa.string(), ["t", "t", None]),
        "p_size": (pa.int32(), [5, 9, None]),
        "p_retailprice": (pa.float64(), [10.0, 20.0, None]),
    })
    spec, expected, compare_result = _duck_compare(
        tmp_path, "pareto_frontier", ("part",))
    actual = spec.fn(spark, str(tmp_path)).toPandas()
    assert compare_result(actual.copy(), expected)["hash_match"]
    keys = set(actual["p_partkey"])
    assert 3 not in keys          # NULL-axis part excluded, both engines
    assert keys == {1, 2}         # cheap-small and pricey-big both survive


def test_quantile_bounds_null_price_group_explicit_null(spark, tmp_path):
    """r13 sweep finding: a returnflag group whose prices are ALL NULL
    has no quantiles — within-bound booleans are explicit NULL in both
    engines (the oracle's literal TRUE now guards on a price existing);
    the group row itself is kept. The dated group is dense and tight so
    the GK 2% value bound genuinely holds (observed-vs-interpolated gap
    ≪ 2% of the value scale)."""
    _lineitem(tmp_path, [
        (1, i, 1.0, 1000.0 + i, 0.0, 0.0, "N", "O", "1995-01-01")
        for i in range(1, 51)
    ] + [(1, 99, None, None, None, None, None, None, None)])
    spec, expected, compare_result = _duck_compare(
        tmp_path, "quantile_sketch_bounds", ("lineitem",))
    actual = spec.fn(spark, str(tmp_path)).toPandas()
    assert compare_result(actual.copy(), expected)["hash_match"]
    nrow = actual[actual["l_returnflag"].isna()].iloc[0]
    assert int(nrow["n_rows"]) == 1
    assert pd.isna(nrow["p50_within_2pct"])
    assert pd.isna(nrow["p95_within_2pct"])


def test_running_revenue_excludes_undated_orders(spark, tmp_path):
    """r13 sweep finding: an undated order has no place on a revenue
    timeline — Spark sorted its NULL month FIRST (running sum starts
    NULL), DuckDB LAST (it inherits the grand total). Excluded in both
    engines by stated contract; dated months are unaffected."""
    _orders(tmp_path, [
        (1, 1, "O", 100.0, "1995-01-15", "1-URGENT"),
        (2, 1, "O", 50.0, "1995-02-15", "1-URGENT"),
        (3, 1, "O", 999.0, None, "1-URGENT"),  # undated: excluded
    ])
    _write_table(tmp_path, "customer", {
        "c_custkey": (pa.int64(), [1]),
        "c_name": (pa.string(), ["c1"]),
        "c_nationkey": (pa.int32(), [1]),
        "c_acctbal": (pa.float64(), [0.0]),
        "c_mktsegment": (pa.string(), ["BUILDING"]),
    })
    spec, expected, compare_result = _duck_compare(
        tmp_path, "running_revenue", ("orders", "customer"))
    actual = spec.fn(spark, str(tmp_path)).toPandas()
    assert compare_result(actual.copy(), expected)["hash_match"]
    assert len(actual) == 2                     # no NULL-month row
    assert actual["cum_revenue"].max() == 150.0  # 999 never entered


def test_to_json_struct_omits_null_fields_like_spark(spark, tmp_path):
    """r13 sweep finding: Spark's to_json OMITS null struct fields; the
    oracle's || chain NULLed the whole payload on one NULL field. Both
    engines must now serialize a NULL status as {"o_orderkey":N}."""
    _orders(tmp_path, [
        (1, 1, "O", 10.0, "1995-01-01", "1-URGENT"),
        (2, 1, None, None, None, None),         # NULL status
    ])
    spec, expected, compare_result = _duck_compare(
        tmp_path, "to_json_struct", ("orders",))
    actual = spec.fn(spark, str(tmp_path)).toPandas()
    assert compare_result(actual.copy(), expected)["hash_match"]
    p2 = actual[actual["o_orderkey"] == 2]["payload"].iloc[0]
    assert p2 == '{"o_orderkey":2}'


def test_window_lag_lead_null_date_placement_pinned(spark, tmp_path):
    """r13 sweep finding: Spark ASC defaults NULLS FIRST inside the
    window order, DuckDB NULLS LAST — an undated order silently moved
    across the ntile boundary. Both engines now pin NULLS FIRST: the
    undated order ranks first, keeps its row, NULL lag/diff."""
    _orders(tmp_path, [
        (1, 7, "O", 10.0, "1995-01-01", "1-URGENT"),
        (2, 7, "O", 20.0, "1995-06-01", "1-URGENT"),
        (3, 7, "O", 30.0, None, "1-URGENT"),    # undated: ranks FIRST
    ])
    spec, expected, compare_result = _duck_compare(
        tmp_path, "window_lag_lead", ("orders",))
    actual = spec.fn(spark, str(tmp_path)).toPandas()
    assert compare_result(actual.copy(), expected)["hash_match"]
    undated = actual[actual["o_orderkey"] == 3].iloc[0]
    assert int(undated["order_quartile"]) == 1  # NULLS FIRST, both engines
    assert undated["next_order_date"] == pd.Timestamp("1995-01-01")


def test_drift_gate_excludes_unassignable_rows(spark, tmp_path):
    """r13 sweep finding: a NULL ship date cannot be assigned to a
    snapshot (the oracle's CASE ELSE silently counted it as 'new' while
    Spark's ~NULL dropped it) and a NULL price cannot rank in a price
    quantile — both excluded in BOTH engines by stated contract."""
    rows = [(1, i, 1.0, 100.0 * i, 0.0, 0.0, "N", "O", "1994-01-0%d" % i)
            for i in range(1, 6)]
    rows += [(1, 10 + i, 1.0, 110.0 * i, 0.0, 0.0, "N", "O",
              "1999-01-0%d" % i) for i in range(1, 6)]
    rows += [
        (1, 98, 1.0, 77777.0, 0.0, 0.0, "N", "O", None),  # NULL shipdate
        (1, 99, 1.0, None, 0.0, 0.0, "N", "O", "1999-01-01"),  # NULL price
    ]
    _lineitem(tmp_path, rows)
    spec, expected, compare_result = _duck_compare(
        tmp_path, "quantile_drift_gate", ("lineitem",))
    actual = spec.fn(spark, str(tmp_path)).toPandas()
    assert compare_result(actual.copy(), expected)["hash_match"]
    assert int(actual["n_old"].iloc[0]) == 5    # neither defect row counted
    assert int(actual["n_new"].iloc[0]) == 5
