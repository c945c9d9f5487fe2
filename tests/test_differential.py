"""Oracle-differential tests (SURVEY.md §5.1): every registered query with
an oracle is compared Spark-vs-DuckDB at sf0.001 (fast) — the driver redoes
this at sf0.01. Queries without an oracle are smoke-run (rows ≥ 0).
"""

from __future__ import annotations

import pytest

from tfm_taxitrips_spark.queries.registry import all_queries
from tests.oracle import compare

_ALL = all_queries()


@pytest.mark.parametrize("name", sorted(_ALL))
def test_query_matches_oracle(spark, sf_smoke, name):
    spec = _ALL[name]
    df = spec.fn(spark, sf_smoke)
    if spec.oracle is None:
        assert df.count() >= 0
    else:
        compare(df, spec.oracle, sf_smoke, name=name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_registry_contract():
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 20  # coverage floor, grows with SURVEY §2


def test_grading_window_rotation():
    """The driver verifies the FIRST 50 ``queries()`` entries in dict order.
    Invariant: every registered query that has NO row in any prior round's
    CORRECTNESS_r*.json must either sit inside this round's window or carry
    an explicit rotation IOU (registry.PENDING_ROTATION) — so never-graded
    debt cannot silently grow. The graded set is derived from the
    CORRECTNESS files themselves, not a name heuristic."""
    import glob
    import json
    import os

    from tfm_taxitrips_spark.queries.registry import (
        GRADING_PRIORITY,
        PENDING_ROTATION,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    graded: set[str] = set()
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        with open(path) as fh:
            graded |= set(json.load(fh))
    assert graded, "no CORRECTNESS_r*.json found — driver layout changed?"

    names = list(_ALL)
    window = set(names[:50])
    assert len(GRADING_PRIORITY) == len(set(GRADING_PRIORITY))
    assert set(GRADING_PRIORITY) <= window
    never_graded = set(names) - graded - set(PENDING_ROTATION)
    assert never_graded <= window, sorted(never_graded - window)
    assert set(PENDING_ROTATION) <= set(names), "rotation IOU names must exist"
    assert set(PENDING_ROTATION).isdisjoint(window)


def test_mixed_batch_stream_event_reads(spark, sf_smoke):
    """readers.read_events footer-probes how ``ts`` is physically stored
    (native TIMESTAMP vs legacy TIMESTAMP(NANOS)-as-LONG) and only touches
    the session-global ``nanosAsLong`` toggle in the legacy branch. A
    session that interleaves a STREAMING events read, a BATCH events read,
    and a batch read of a non-events timestamp table must stay
    oracle-correct with either storage, and with a native-timestamp
    fixture the toggle must stay untouched."""
    from tests.oracle import compare

    import pyarrow.parquet as pq

    for name in ("stream_window_rollup", "windowed_agg_batch", "date_parts"):
        spec = _ALL[name]
        compare(spec.fn(spark, sf_smoke), spec.oracle, sf_smoke, name=name)
    ts_unit = pq.read_schema(f"{sf_smoke}/events.parquet").field("ts").type
    if getattr(ts_unit, "unit", None) in ("us", "ms"):
        # native-timestamp fixture: the legacy toggle must not have been set
        assert (
            spark.conf.get(
                "spark.sql.legacy.parquet.nanosAsLong", "false"
            )
            == "false"
        )


def test_date_queries_survive_non_utc_session(spark, sf_smoke):
    """The grading driver's session inherits the HOST timezone; table()
    pins UTC at the read seam so year()/date_trunc() stay aligned with
    DuckDB's naive timestamps even if the host is not UTC."""
    from tests.oracle import compare
    from tfm_taxitrips_spark.queries.registry import all_queries

    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        for name in ("date_parts", "date_trunc_day", "running_revenue"):
            spec = all_queries()[name]
            compare(spec.fn(spark, sf_smoke), spec.oracle, sf_smoke, name=name)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_rotation_planner_matches_invariant():
    """The rotation planner (queries/rotation.py) must front every
    never-graded query — the same hard debt the rotation invariant
    enforces — and never recommend more slots than the window."""
    from tfm_taxitrips_spark.queries.rotation import latest_graded_round, plan

    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest = latest_graded_round(repo)
    rows = plan(50, repo)
    assert len(rows) == 50
    recommended = [n for n, _r, _s in rows]
    never = [n for n in _ALL if n not in latest]
    if len(never) <= len(recommended):
        assert set(never) <= set(recommended)
    else:
        # more hard debt than one window absorbs: the window must be spent
        # ENTIRELY on never-graded queries, and every spilled one must
        # carry an IOU (PENDING_ROTATION) or already sit in the frozen
        # round window (GRADING_PRIORITY) for the upcoming grading
        from tfm_taxitrips_spark.queries.registry import (
            GRADING_PRIORITY,
            PENDING_ROTATION,
        )

        assert set(recommended) <= set(never)
        spilled = set(never) - set(recommended)
        assert spilled <= set(PENDING_ROTATION) | set(GRADING_PRIORITY)
    # FRONTED names lead the window in FRONTED order (they deliberately
    # jump the class ranking — that is the mechanism's whole point), so
    # the class-monotonicity invariant applies to the NON-fronted tail
    from tfm_taxitrips_spark.queries.registry import FRONTED

    head = [n for n, _r, _s in rows if n in FRONTED]
    assert head == [n for n in FRONTED if n in {m for m, _r, _s in rows}]
    assert [n for n, _r, _s in rows[:len(head)]] == head
    # stalest-first WITHIN each class: never-graded (0), then code-stale
    # rows oldest-first, then clean rows oldest-first
    classes = [(0 if r == 0 else (1 if s else 2), r)
               for _n, r, s in rows[len(head):]]
    assert classes == sorted(classes)


def test_rotation_planner_code_change_awareness(monkeypatch):
    """r9 verdict item #3 (symbol-level since r11): a query whose
    dependency closure changed after its latest driver row must rank as
    stale REGARDLESS of round number — above every clean row — with the
    changed-symbol → query mapping derived from the tools.symbols
    graph, not a hand list. Pinned with a controlled diff injection:
    pretending every symbol of the streaming serving layer changed
    after every round must pull exactly the serving-closure queries
    ahead of every clean row, while a pretend empty diff must restore
    pure round-age order."""
    # isolate the STALENESS mechanism: the live registry FRONTED would
    # occupy the head regardless of the injected diff, so pin it empty
    from tfm_taxitrips_spark.queries import registry

    monkeypatch.setattr(registry, "FRONTED", ())

    import os

    from tfm_taxitrips_spark.queries import rotation

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    serving = os.path.join("tfm_taxitrips_spark", "streaming", "serving.py")
    latest = rotation.latest_graded_round(repo)

    # every round's rows are stale exactly when their SYMBOL closure
    # reaches any serving.py symbol (the per-file wildcard)
    monkeypatch.setattr(
        rotation, "symbols_changed_since_round",
        lambda _repo, base=None: {r: {(serving, "*")}
                                  for r in set(latest.values())},
    )
    rows = rotation.plan(210, repo)
    stale = [n for n, _r, s in rows if s]
    closures = rotation.query_symbol_closures(repo)
    expect = {n for n, c in closures.items()
              if any(f == serving for f, _s in c) and latest.get(n, 0) > 0}
    assert set(stale) == expect          # graph-derived, nothing hand-listed
    assert "stream_topk" in expect        # the r9 verdict's named example
    # class order: every stale row precedes every clean graded row
    order = {n: i for i, (n, _r, _s) in enumerate(rows)}
    clean_positions = [order[n] for n, _r, s in rows
                       if not s and latest.get(n, 0) > 0]
    assert max(order[n] for n in stale) < min(clean_positions)

    # empty diff ⇒ no stale class, pure round-age order
    monkeypatch.setattr(
        rotation, "symbols_changed_since_round",
        lambda _repo, base=None: {r: set() for r in set(latest.values())},
    )
    rows2 = rotation.plan(50, repo)
    assert not any(s for _n, _r, s in rows2)
    rounds2 = [r for _n, r, _s in rows2]
    assert rounds2 == sorted(rounds2)

    # git unavailable ⇒ module-granular fallback still ranks staleness
    monkeypatch.setattr(
        rotation, "symbols_changed_since_round",
        lambda _repo, base=None: None,
    )
    monkeypatch.setattr(
        rotation, "files_changed_since_round",
        lambda _repo: {r: {serving} for r in set(latest.values())},
    )
    rows3 = rotation.plan(210, repo)
    stale3 = {n for n, _r, s in rows3 if s}
    fclosures = rotation.query_closures(repo)
    assert stale3 == {n for n, c in fclosures.items()
                      if serving in c and latest.get(n, 0) > 0}


def test_symbol_staleness_single_def_diff():
    """r10 verdict item #3's Done criterion: with function-level
    closures, APPENDING a new operator must not mark untouched sibling
    queries stale, while EDITING one def must stale exactly its
    dependents. Controlled diffs over the real tree, no git needed."""
    import os

    from tfm_taxitrips_spark.queries import rotation
    from tfm_taxitrips_spark.queries.registry import all_queries
    from tools.symbols import (
        changed_symbols,
        intersects,
        query_symbol_closures,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    text_py = os.path.join("tfm_taxitrips_spark", "queries", "text.py")
    files = rotation._tree_files(repo, None)
    modules = {
        name: spec.fn.__module__.replace(".", os.sep) + ".py"
        for name, spec in all_queries().items()
    }

    # 1) append-only diff: one new def → one new symbol, zero stale rows
    appended = dict(files)
    appended[text_py] += (
        "\n\ndef q_r11_probe(spark, sf_dir):\n"
        "    return table(spark, sf_dir, 'documents')\n"
    )
    ch = changed_symbols(files, appended)
    assert ch == {(text_py, "q_r11_probe")}
    closures = query_symbol_closures(appended, modules)
    assert not any(intersects(c, ch) for c in closures.values()), [
        n for n, c in closures.items() if intersects(c, ch)]

    # 2) single-def edit: rename an output alias inside q_token_count →
    # exactly that symbol changes, and exactly its dependents go stale
    edited = dict(files)
    assert '.alias("text_len")' in edited[text_py]
    edited[text_py] = edited[text_py].replace(
        '.alias("text_len")', '.alias("text_len2")')
    ch2 = changed_symbols(files, edited)
    assert ch2 == {(text_py, "q_token_count")}
    stale = {n for n, c in closures.items() if intersects(c, ch2)}
    assert "text_token_count" in stale
    assert "text_quality_score" not in stale
    assert "dedup_exact_docs" not in stale

    # 3) comment/whitespace edits are NOT changes (unparse-normalized)
    cosmetic = dict(files)
    cosmetic[text_py] = cosmetic[text_py].replace(
        "# token counting / quality / language-id / fingerprint",
        "# token counting / quality / language-id / fingerprint (edited)")
    assert changed_symbols(files, cosmetic) == set()


def test_compare_result_contract():
    """The non-asserting comparison core (shared by tests/oracle.compare
    and tools/selfcheck.py) must gate exactly like the driver: row count
    first, then case-insensitive column names, then canonicalized values
    (order-insensitive rows, float canon, NULL sentinel)."""
    import pandas as pd

    from tests.oracle import compare_result

    def rec(a, b):
        return compare_result(a.copy(), b.copy())

    base = pd.DataFrame({"K": [1, 2], "v": [1.5, None]})
    # identical up to column case and row order
    r = rec(base, pd.DataFrame({"k": [2, 1], "V": [None, 1.5]}))
    assert (r["rows_match"], r["schema_match"], r["hash_match"]) == (
        True, True, True)
    # row-count mismatch short-circuits the hash
    r = rec(base, pd.DataFrame({"K": [1], "v": [1.5]}))
    assert r["rows_match"] is False and r["hash_match"] is False
    assert (r["spark_rows"], r["oracle_rows"]) == (2, 1)
    # schema mismatch (extra/renamed column)
    r = rec(base, pd.DataFrame({"K": [1, 2], "w": [1.5, None]}))
    assert r["schema_match"] is False and r["hash_match"] is False
    # value mismatch with matching shape
    r = rec(base, pd.DataFrame({"K": [1, 2], "v": [1.5, 9.0]}))
    assert (r["rows_match"], r["schema_match"], r["hash_match"]) == (
        True, True, False)
    # integral floats canonicalize equal across int-ish representations
    r = rec(pd.DataFrame({"x": [2.0]}), pd.DataFrame({"x": [2.0]}))
    assert r["hash_match"] is True


def test_selfcheck_artifact_current_and_green():
    """The committed SELFCHECK_r*.json (tools/selfcheck.py output) is the
    judge-facing signal for queries outside the 50-slot grading window.
    Forcing function in the spirit of the rotation test: the LATEST
    artifact must cover exactly the current registry, carry a source
    fingerprint matching CURRENT code (ADVICE r5: a key-set check alone
    lets an implementation change silently stale the artifact), and
    contain no failures — including silently-empty rows-only results
    (ADVICE r5)."""
    import glob
    import json
    import os
    import re

    from tfm_taxitrips_spark.queries.registry import all_queries
    from tools.selfcheck import failed, source_fingerprint

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = glob.glob(os.path.join(repo, "SELFCHECK_r*.json"))
    assert files, "no SELFCHECK artifact — run tools/selfcheck.py"
    latest = max(
        files,
        key=lambda p: int(re.search(r"SELFCHECK_r(\d+)", p).group(1)),
    )
    with open(latest) as fh:
        rows = json.load(fh)
    meta = rows.pop("__meta__", None)
    assert meta is not None, (
        f"{os.path.basename(latest)} predates the fingerprint scheme — "
        "regenerate with tools/selfcheck.py"
    )
    assert meta["fingerprint"] == source_fingerprint(), (
        f"{os.path.basename(latest)} was generated from DIFFERENT source "
        "code — regenerate with tools/selfcheck.py"
    )
    assert set(rows) == set(all_queries()), (
        f"{os.path.basename(latest)} out of sync with the registry — "
        "regenerate with tools/selfcheck.py"
    )
    for name, r in rows.items():
        assert not failed(r), (name, r)
        if r["hash_match"] is not None:
            assert r["err"] is None and r["hash_match"], (name, r)
    # the per-file splice baseline (ADVICE r8) must exist and describe
    # the SAME tree the global fingerprint stamps
    from tools.selfcheck import source_file_hashes

    assert meta.get("file_hashes") == source_file_hashes(), (
        f"{os.path.basename(latest)} lacks (or has stale) per-file "
        "hashes — regenerate with tools/selfcheck.py"
    )


def test_splice_admissibility_maps_files_to_queries():
    """The --only splice guard (ADVICE r8): changed files map onto the
    queries whose import closure reaches them; harness files,
    registration hubs, and unknown files refuse outright (None = run
    the full sweep). This is what replaced the manual reviewer audit of
    splice soundness."""
    import hashlib

    from tools.selfcheck import (
        affected_queries,
        source_file_hashes,
        source_fingerprint,
    )

    assert affected_queries(set()) == set()
    a = affected_queries({"tfm_taxitrips_spark/streaming/serving.py"})
    assert "stream_topk" in a
    # serving.py reaches only queries registered in the streaming query
    # module (was a name-prefix check until r15's debounce_episode_audit
    # joined streamq without the stream_ prefix)
    streamq_regs = {
        n for n, s in all_queries().items()
        if s.fn.__module__ == "tfm_taxitrips_spark.queries.streamq"
    }
    assert set(a) <= streamq_regs
    b = affected_queries({"tfm_taxitrips_spark/queries/sketches.py"})
    assert "quantile_drift_gate" in b and "flagship_view" not in b
    assert affected_queries({"tests/oracle.py"}) is None
    assert affected_queries(
        {"tfm_taxitrips_spark/queries/registry.py"}) is None
    assert affected_queries(
        {"tfm_taxitrips_spark/queries/does_not_exist.py"}) is None
    # the global fingerprint IS the digest of the per-file hashes — the
    # two can never describe different trees
    h = hashlib.sha256()
    for rel, hexd in source_file_hashes().items():
        h.update(rel.encode())
        h.update(bytes.fromhex(hexd))
    assert h.hexdigest() == source_fingerprint()
