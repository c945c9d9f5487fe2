"""Round-14 operator tests and ADVICE closures.

The r13 ADVICE pins come first (streaming TTL dedup NULL-ts tolerance
and the eviction-timestamp ceil/clamp; the guards literal-constraint pin
— the non-staling half of a fix deferred to the NaN-contract round);
the round's three new operators' exact-Python replays follow.
"""

from __future__ import annotations

import re

import duckdb
import pandas as pd
import pytest

from tests.test_round13_ops import (
    _OVL_DOCS,
    _PA_DOCS,
    _shard,
    _shingles3,
    _tok,
    _write_docs,
    _write_events,
)

# --------------------------------------------------------------------------
# r13 ADVICE closures
# --------------------------------------------------------------------------


class _StubState:
    """GroupState stand-in exposing only what _evict_ms reads."""

    def __init__(self, watermark_ms: int):
        self._wm = watermark_ms

    def getCurrentWatermarkMs(self) -> int:
        return self._wm


def test_evict_ms_ceils_and_clamps():
    """r13 ADVICE #2: flooring anchor+ttl µs→ms can land the timeout
    ~1 ms below the watermark (Spark rejects 'timeout timestamp cannot
    be earlier than the current watermark'); _evict_ms must CEIL, and
    clamp one past the watermark for coarser drifts."""
    from tfm_taxitrips_spark.streaming.stateful import _evict_ms

    # non-divisible µs expiry: floor would give 2000 — a rejectable ms
    assert _evict_ms(_StubState(0), 1_000_001, 1_000_000) == 2001
    # exactly divisible: ceil == floor, no over-shift
    assert _evict_ms(_StubState(0), 1_000_000, 1_000_000) == 2000
    # watermark already past the expiry: clamp strictly past it
    assert _evict_ms(_StubState(10_000), 1_000_001, 1_000_000) == 10_001


_NULLTS_T0 = pd.Timestamp("2024-01-01 00:00:00")
_NULLTS_H = pd.Timedelta(hours=1)

_NULLTS_EVENTS = [
    # user 1: NULL ts mixed with real ones — the ADVICE crash vector
    (1, None, 1, "click", 1.0, "{}"),
    (2, _NULLTS_T0, 1, "click", 1.0, "{}"),
    (3, _NULLTS_T0 + 2 * _NULLTS_H, 1, "view", 1.0, "{}"),
    # user 2: ONLY NULL ts — all rows dropped, key emits nothing
    (4, None, 2, "click", 1.0, "{}"),
    (5, None, 2, "view", 1.0, "{}"),
]


@pytest.mark.parametrize("op_name", ["streaming_ttl_dedup",
                                     "streaming_debounce_dedup"])
def test_stateful_dedup_tolerates_null_event_times(
        spark, tmp_path, op_name):
    """r13 ADVICE #1: the dedup operators are public APIs that accept
    ANY stream — a NULL event time (NaN µs in the pandas frame) must be
    dropped defensively inside the operator, not crash int(us), even
    when the caller skipped the registered pipeline's events guard."""
    from tfm_taxitrips_spark import schemas
    from tfm_taxitrips_spark.sources.readers import (
        _read_events_raw,
        conform_to_pinned,
        normalize_event_ts,
    )
    from tfm_taxitrips_spark.streaming import stateful
    from tfm_taxitrips_spark.streaming.pipeline import (
        run_to_memory,
        stream_table,
    )

    _write_events(tmp_path, _NULLTS_EVENTS)
    raw, raw_ts = _read_events_raw(spark, f"{tmp_path}/events.parquet")
    src = stream_table(spark, str(tmp_path), "events", raw.schema)
    # deliberately NO events_guard — the raw public-API path
    stream = conform_to_pinned(
        normalize_event_ts(src, raw_ts),
        schemas.DRIVER_TABLES["events"], "events")
    op = getattr(stateful, op_name)
    out = run_to_memory(op(stream, ttl="1 hour"), spark,
                        output_mode="append").toPandas()
    got = {int(r["user_id"]): (int(r["n_events"]), int(r["n_admitted"]))
           for _, r in out.iterrows()}
    # NULL-ts rows never counted; both real events admitted (2 h > 1 h)
    assert got == {1: (2, 2)}


def _mask_two_pass(sql: str) -> str:
    """The RETIRED (pre-r16) binding mask: comments stripped first,
    then literals — the order the r13 ADVICE flagged (a literal
    containing '--' loses its tail, unbalancing the quote mask)."""
    return re.sub(r"'(?:[^']|'')*'", "''", re.sub(r"--[^\n]*", "", sql))


def _mask_single_pass(sql: str) -> str:
    """The r16 implementation (guards._MASK_RE): ONE left-to-right
    alternation, literals first —
    a '--' inside a literal is consumed as literal, an apostrophe inside
    a comment is consumed as comment, no ordering hazard."""
    return re.sub(
        r"'(?:[^']|'')*'|--[^\n]*",
        lambda m: "''" if m.group(0).startswith("'") else "", sql)


def test_registered_oracles_respect_guard_literal_constraint():
    """r13 ADVICE #3, CLOSED by the r16 contract batch: guarded_scan_sql
    now masks single-pass (guards._binding_mask) and raises its own
    import-time tripwire when the two-pass and single-pass masks would
    disagree. This pin stays as the independent re-statement of the
    invariant on REAL input — every registered oracle must be a shape
    where masking order cannot matter — so a hazard-bearing oracle
    fails here (and at registry import) before it ever grades."""
    from tfm_taxitrips_spark.queries.registry import all_queries

    offenders = [
        name for name, spec in all_queries().items()
        if spec.oracle is not None
        and _mask_two_pass(spec.oracle) != _mask_single_pass(spec.oracle)
    ]
    assert not offenders, (
        "oracle(s) where comment/literal stripping order changes the "
        f"binding mask (land the single-pass guard fix first): {offenders}")
    # the planted hazard the masks disagree on — proves the pin detects
    hazard = "SELECT 'a--b' AS x FROM events  -- trailing 'note'"
    assert _mask_two_pass(hazard) != _mask_single_pass(hazard)


# --------------------------------------------------------------------------
# round-14 operators: exact-Python replays + NULL probes
# --------------------------------------------------------------------------


# _OVL_DOCS plus a source whose shingle set is a strict SUBSET of 'a's
# (doc 1's opening 5-gram run) — the asymmetric case the containment
# matrix exists for and the symmetric Jaccard matrix structurally hides
_CNT_DOCS = _OVL_DOCS + [
    (9, "sub", "the quick brown fox jumps"),
]


def test_source_ngram_containment_matrix_matches_exact_python_reference(
        spark, tmp_path):
    """source_ngram_containment_matrix replayed in exact Python: the
    full ORDERED grid of distinct sources, |∩|·10⁶ div |contained| per
    direction, zero-filled misses, explicit-NULL ppm for a shingle-free
    contained side — and the subset probe reads 10⁶ in exactly one
    direction."""
    from tests.oracle import compare_result
    from tfm_taxitrips_spark.queries.registry import all_queries

    _write_docs(tmp_path, _CNT_DOCS)
    spec = all_queries()["source_ngram_containment_matrix"]
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
    for _id, src, text in _CNT_DOCS:
        sets.setdefault(src, set()).update(_shingles3(text))
    want = {}
    for sa in sets:
        for sb in sets:
            if sa == sb:  # None == None too: the grid is DISTINCT pairs
                continue
            inter = len(sets[sa] & sets[sb])
            want[(sa, sb)] = (
                len(sets[sa]), len(sets[sb]), inter,
                None if len(sets[sa]) == 0
                else inter * 1_000_000 // len(sets[sa]))
    got = {
        (None if pd.isna(r["source_a"]) else r["source_a"],
         None if pd.isna(r["source_b"]) else r["source_b"]): (
            int(r["sz_a"]), int(r["sz_b"]), int(r["n_inter"]),
            None if pd.isna(r["containment_ppm"])
            else int(r["containment_ppm"]))
        for _, r in actual.iterrows()
    }
    assert got == want
    # the reason this operator exists: subset direction reads 10⁶,
    # the reverse direction reads well under it (asymmetry)
    assert got[("sub", "a")][3] == 1_000_000
    assert 0 < got[("a", "sub")][3] < 1_000_000
    # shingle-free contained side → explicit NULL; as container → 0
    assert got[("empty", "a")][3] is None
    assert got[("a", "empty")][3] == 0
    # NULL provenance is a real bucket in BOTH directions
    assert got[(None, "a")][2] > 0 and got[("a", None)][2] > 0
    # disjoint ordered pair zero-filled
    assert got[("b", "c")] == (got[("b", "c")][0], got[("b", "c")][1], 0, 0)


def test_containment_and_overlap_matrices_share_one_universe(
        spark, tmp_path):
    """The seam contract: both matrices consume _source_shingle_sets, so
    their set sizes and intersections must agree row-for-row — the
    containment matrix of pair (lo, hi) carries the same n_inter and
    sizes as the overlap matrix's unordered row."""
    from tfm_taxitrips_spark.queries.registry import all_queries

    _write_docs(tmp_path, _CNT_DOCS)
    qs = all_queries()
    ovl = qs["source_ngram_overlap_matrix"].fn(spark, str(tmp_path)).toPandas()
    cnt = qs["source_ngram_containment_matrix"].fn(
        spark, str(tmp_path)).toPandas()
    ckey = {
        (None if pd.isna(r["source_a"]) else r["source_a"],
         None if pd.isna(r["source_b"]) else r["source_b"]):
        (int(r["sz_a"]), int(r["sz_b"]), int(r["n_inter"]))
        for _, r in cnt.iterrows()
    }
    for _, r in ovl.iterrows():
        lo = None if pd.isna(r["source_lo"]) else r["source_lo"]
        hi = None if pd.isna(r["source_hi"]) else r["source_hi"]
        assert ckey[(lo, hi)] == (
            int(r["sz_lo"]), int(r["sz_hi"]), int(r["n_inter"]))
        assert ckey[(hi, lo)] == (
            int(r["sz_hi"]), int(r["sz_lo"]), int(r["n_inter"]))


_DB_T0 = pd.Timestamp("2024-01-01 00:00:00")
_DB_H = pd.Timedelta(hours=1)
_DB_US = pd.Timedelta(microseconds=1)

# STREAM_DEBOUNCE_TTL is 8 hours; every case below is stated against it
_DB_EVENTS = [
    # user 1 — THE debounce discriminator: a 30-hour drip of 6-hour gaps.
    # Refreshing anchor suppresses everything after the first event (the
    # episode never ends); the anchored twin would re-admit mid-burst.
    (1, _DB_T0, 1, "click", 1.0, "{}"),
    (2, _DB_T0 + 6 * _DB_H, 1, "click", 1.0, "{}"),
    (3, _DB_T0 + 12 * _DB_H, 1, "click", 1.0, "{}"),
    (4, _DB_T0 + 18 * _DB_H, 1, "click", 1.0, "{}"),
    (5, _DB_T0 + 24 * _DB_H, 1, "click", 1.0, "{}"),
    (6, _DB_T0 + 30 * _DB_H, 1, "click", 1.0, "{}"),
    # user 2 — the strict-> boundary: a gap of exactly TTL suppresses
    # (and refreshes); one µs past the refreshed anchor admits
    (7, _DB_T0, 2, "click", 1.0, "{}"),
    (8, _DB_T0 + 8 * _DB_H, 2, "click", 1.0, "{}"),
    (9, _DB_T0 + 16 * _DB_H + _DB_US, 2, "click", 1.0, "{}"),
    # user 3 — duplicate timestamps: dup suppressed, refresh is a no-op,
    # a 9-hour gap from the duplicate re-admits
    (10, _DB_T0, 3, "view", 1.0, "{}"),
    (11, _DB_T0, 3, "view", 2.0, "{}"),
    (12, _DB_T0 + 9 * _DB_H, 3, "view", 1.0, "{}"),
    # NULL user: a real state key
    (13, _DB_T0, None, "view", 1.0, "{}"),
    (14, _DB_T0 + 2 * _DB_H, None, "view", 1.0, "{}"),
    # user 4: NULL-ts row excluded by the events guard in BOTH engines
    (15, None, 4, "click", 1.0, "{}"),
    (16, _DB_T0, 4, "click", 1.0, "{}"),
]


def test_stream_dedup_debounce_matches_exact_python_reference(
        spark, tmp_path):
    """stream_dedup_debounce replayed as the exact refreshing-anchor
    walk: admitted iff first or gap-from-previous strictly exceeds TTL,
    EVERY event refreshes. Engine parity runs the REGISTERED
    (events-guarded) oracle; the long drip collapses to one admission —
    the behavior that separates this policy from the anchored twin."""
    from tests.oracle import compare_result
    from tfm_taxitrips_spark.operators.temporal import _duration_us
    from tfm_taxitrips_spark.queries.registry import all_queries
    from tfm_taxitrips_spark.queries.streamq import STREAM_DEBOUNCE_TTL

    _write_events(tmp_path, _DB_EVENTS)
    spec = all_queries()["stream_dedup_debounce"]
    actual = spec.fn(spark, str(tmp_path)).toPandas()
    conn = duckdb.connect()
    conn.sql("CREATE VIEW events AS SELECT * FROM "
             f"'{tmp_path}/events.parquet'")
    try:
        expected = conn.sql(spec.oracle).df()
    finally:
        conn.close()
    assert compare_result(actual.copy(), expected)["hash_match"]

    ttl_us = _duration_us(STREAM_DEBOUNCE_TTL)
    by_key: dict = {}
    for _eid, ts, uid, _et, _v, _p in _DB_EVENTS:
        if ts is None:
            continue  # the events-guard exclusion
        by_key.setdefault(uid, []).append(ts.value // 1000)  # ns → µs
    want = {}
    for uid, uss in by_key.items():
        prev, adm = None, 0
        for us in sorted(uss):
            if prev is None or us > prev + ttl_us:
                adm += 1
            prev = us  # refresh on EVERY event
        want[uid] = (len(uss), adm,
                     (len(uss) - adm) * 1_000_000 // len(uss))
    got = {
        (None if pd.isna(r["user_id"]) else int(r["user_id"])): (
            int(r["n_events"]), int(r["n_admitted"]),
            int(r["suppressed_ppm"]))
        for _, r in actual.iterrows()
    }
    assert got == want
    assert got[1] == (6, 1, 833_333)     # the drip: one episode, ever
    assert got[2] == (3, 2, 333_333)     # exact-TTL gap suppressed
    assert got[3] == (3, 2, 333_333)     # dup-ts no-op refresh
    assert got[None] == (2, 1, 500_000)  # NULL key is a real state key
    assert got[4] == (1, 1, 0)           # NULL-ts row never counted


def test_debounce_and_anchored_policies_differ_on_a_drip(spark, tmp_path):
    """The policy-pair contract, demonstrated: on user 1's 6-hour drip
    the anchored twin (fixed 24 h anchor) re-admits mid-burst while the
    refreshing twin never does. Run BOTH operators on the same fixture
    with the same 8-hour TTL and compare admissions."""
    from tfm_taxitrips_spark.queries.streamq import (
        STREAM_DEBOUNCE_TTL,
        read_events_stream,
        run_to_memory,
    )
    from tfm_taxitrips_spark.streaming.stateful import (
        streaming_debounce_dedup,
        streaming_ttl_dedup,
    )

    _write_events(tmp_path, [e for e in _DB_EVENTS if e[2] == 1])
    adm = {}
    for name, op in (("anchored", streaming_ttl_dedup),
                     ("refreshing", streaming_debounce_dedup)):
        stream = read_events_stream(spark, str(tmp_path))
        out = run_to_memory(op(stream, ttl=STREAM_DEBOUNCE_TTL), spark,
                            output_mode="append").toPandas()
        adm[name] = int(out["n_admitted"].sum())
    # anchored, 8 h TTL over 6 h gaps: admits t0, t12 (>t0+8h),
    # t24 (>t12+8h) — then t30 ≤ t24+8h suppressed → 3 admissions
    assert adm["anchored"] == 3
    assert adm["refreshing"] == 1


def test_pack_waste_by_utilization_matches_exact_python_reference(
        spark, tmp_path):
    """pack_waste_by_utilization replayed in exact Python ints over the
    planted pack corpus, plus the reconciliation the operator exists
    for: its marginals must equal packing_efficiency_report (pack/doc/
    pad/overflow mass per bucket) and pack_attention_waste (pair totals
    across buckets == pair totals across shards) — one layout, three
    audits, zero drift."""
    from tests.oracle import compare_result
    from tfm_taxitrips_spark.queries.dataprep import (
        _PACK_BUDGET,
        _UTIL_BUCKETS,
        q_pack_attention_waste,
        q_packing_efficiency_report,
        q_pack_waste_by_utilization,
    )
    from tfm_taxitrips_spark.queries.registry import all_queries

    _write_docs(tmp_path, _PA_DOCS)
    spec = all_queries()["pack_waste_by_utilization"]
    actual = spec.fn(spark, str(tmp_path)).toPandas()
    conn = duckdb.connect()
    conn.sql("CREATE VIEW documents AS SELECT * FROM "
             f"'{tmp_path}/documents.parquet'")
    try:
        expected = conn.sql(spec.oracle).df()
    finally:
        conn.close()
    assert compare_result(actual.copy(), expected)["hash_match"]

    # exact-Python replay: the same pack walk as the r13 waste test,
    # re-keyed by utilization decile
    packs: dict = {}
    before: dict = {}
    for doc_id, _src, text in sorted(_PA_DOCS):
        sh, nt = _shard(doc_id), _tok(text)
        pid = before.get(sh, 0) // _PACK_BUDGET
        nd, pt, intra = packs.get((sh, pid), (0, 0, 0))
        packs[(sh, pid)] = (nd + 1, pt + nt, intra + nt * (nt + 1) // 2)
        before[sh] = before.get(sh, 0) + nt
    buckets: dict = {}
    for (nd, pt, intra) in packs.values():
        b = min(pt * _UTIL_BUCKETS // _PACK_BUDGET, _UTIL_BUCKETS)
        np_, snd, spt, pad, ovf, tot, intr = buckets.get(
            b, (0, 0, 0, 0, 0, 0, 0))
        buckets[b] = (np_ + 1, snd + nd, spt + pt,
                      pad + max(_PACK_BUDGET - pt, 0),
                      ovf + max(pt - _PACK_BUDGET, 0),
                      tot + pt * (pt + 1) // 2, intr + intra)
    got = {
        int(r["util_bucket"]): (
            int(r["n_packs"]), int(r["n_docs"]), int(r["pack_tokens"]),
            int(r["padding_tokens"]), int(r["overflow_tokens"]),
            int(r["total_pairs"]), int(r["intra_pairs"]),
            int(r["cross_pairs"]),
            None if pd.isna(r["waste_ppm"]) else int(r["waste_ppm"]))
        for _, r in actual.iterrows()
    }
    want = {
        b: (np_, snd, spt, pad, ovf, tot, intr, tot - intr,
            None if tot == 0 else (tot - intr) * 1_000_000 // tot)
        for b, (np_, snd, spt, pad, ovf, tot, intr) in buckets.items()
    }
    assert got == want

    # reconciliation against the two parent audits on the same fixture
    report = q_packing_efficiency_report(spark, str(tmp_path)).toPandas()
    rep = {int(r["util_bucket"]): (
        int(r["n_packs"]), int(r["n_docs"]), int(r["pack_tokens"]),
        int(r["padding_tokens"]), int(r["overflow_tokens"]))
        for _, r in report.iterrows()}
    assert rep == {b: v[:5] for b, v in got.items()}
    waste = q_pack_attention_waste(spark, str(tmp_path)).toPandas()
    assert int(waste["total_pairs"].sum()) == sum(
        v[5] for v in got.values())
    assert int(waste["intra_pairs"].sum()) == sum(
        v[6] for v in got.values())


def test_pack_waste_by_utilization_zero_token_bucket_null_ppm(
        spark, tmp_path):
    """NULL probe: an all-NULL-text corpus packs zero token mass into
    bucket 0 — zero pairs on both sides, waste_ppm explicit NULL via the
    NULLIF contract, padding equal to the full budget per pack, both
    engines."""
    from tests.oracle import compare_result
    from tfm_taxitrips_spark.queries.dataprep import _PACK_BUDGET
    from tfm_taxitrips_spark.queries.registry import all_queries

    _write_docs(tmp_path, [(1, "web", None), (2, "web", None)])
    spec = all_queries()["pack_waste_by_utilization"]
    actual = spec.fn(spark, str(tmp_path)).toPandas()
    conn = duckdb.connect()
    conn.sql("CREATE VIEW documents AS SELECT * FROM "
             f"'{tmp_path}/documents.parquet'")
    try:
        expected = conn.sql(spec.oracle).df()
    finally:
        conn.close()
    assert compare_result(actual.copy(), expected)["hash_match"]
    assert set(actual["util_bucket"]) == {0}
    row = actual.iloc[0]
    assert int(row["total_pairs"]) == 0
    assert pd.isna(row["waste_ppm"])  # explicit contract, not a crash
    assert int(row["padding_tokens"]) == _PACK_BUDGET * int(row["n_packs"])
