"""Registry-wide NULL/adversarial-input differential sweep.

The per-operator NULL-probe practice (standing since r9) has found a
real defect in three consecutive rounds — r10's ECE NULL-text
double-accident, r11's malformed-vector family split (13 divergent, 2
crashing), r12's `cross_source_dup_matrix` least/greatest NULL
misattribution. Each was found by hand-planting adversarial rows into
ONE operator's fixture. This tool institutionalizes the practice
registry-wide: it builds an sf0.001 fixture whose `documents` and
`embeddings` tables are augmented with the full adversarial menagerie,
then runs EVERY oracle-paired query that reads either table through the
same Spark-vs-DuckDB compare the driver uses.

What it can and cannot catch:

- CATCHES cross-engine divergence (the two engines disagree on the
  planted rows) and hard crashes (either engine throws) — the r11
  finding class.
- CANNOT catch engine-AGREEING semantic bugs (the r12 dup-matrix class:
  both engines wrong the same way) — those still need the per-operator
  exact-Python replays every new op ships with.

Planted rows (documents, doc_id 900001+):
  NULL text / NULL lang+source on a gate-passing text / whitespace-only
  text / empty-string text / an exact-dup pair spanning a NULL source
  (the r12 bug class) / the all-NULL row.
Planted rows (embeddings, vec_id 900001+):
  NULL vector / 3-dim short vector (both excluded by the r11 guard
  contract) / zero-norm full-width vector / NULL label / full-width
  vector containing one NULL ELEMENT (passes the is-null + length
  guard — probes whether per-element nulls are a contract gap).
Planted rows (events, event_id 900001+):
  NULL user_id (anonymous event) / NULL event_type / NULL value / NULL
  props / malformed-JSON props / NULL ts (the event-time probe:
  watermarked streaming DROPS NULL event times while a batch oracle
  keeps them) / NaN value (ANSI casts of NaN crash where DuckDB
  saturates) / the all-NULL row.
Planted rows (TPC-H star tables, keys 900001+ — round 13, the r12
verdict's order #4; NULL keys and strings per that order, plus NULL
measures/dates — no NaN, which would demand a loader-level contract
and re-stale the whole registry mid-burn-down):
  customer: NULL name / NULL nationkey FK / NULL mktsegment (a GROUP BY
  key every segment rollup keeps but a plain equi-join drops — the r12
  event_type finding class) + NULL acctbal / all-NULL-but-key.
  orders: NULL custkey (orphan FK) / NULL status+priority+date+price on
  a VALID custkey (NULL measures must flow through live joins) /
  all-NULL-but-key.
  lineitem: NULL l_orderkey (NULL join key) / NULL returnflag+
  linestatus+shipdate+all measures on VALID keys (the q1 group-key and
  SUM/AVG probe) / all-NULL-but-keys.
  supplier / part: NULL name, FK, and every attribute column.
Phase 2 (extreme VALUES — still legal doubles, no NaN): a zero-price
  full-discount line (leading digit '0', zero denominators), a negative
  reversal line (leading '-' crashes strict VARCHAR→INT casts; found
  the benford abs() gap), a ~10^13 price (found the q9 DECIMAL(12,2)
  ANSI overflow AND DuckDB's INT64-backed DECIMAL(18,2) multiply
  overflow), epoch/far-future order dates, zero/huge totals, and an
  EMPTY-string (not NULL) customer name/segment with negative balance.

Phase 3 (NON-FINITE values — DEFAULT-ON since r16; staged opt-in at
  r15): NaN AND ±inf planted in EVERY loader-allowlisted float64
  measure column (``contracts.STAR_MEASURE_COLUMNS`` — the ingest
  contract's own column list, so the sweep and the contract cannot
  drift apart), plus non-finite COMPONENTS inside otherwise-valid
  embeddings. At the r15 tree this phase reproduced the six documented
  crash classes (ROUND14_NOTES §6) by design; with the r16 wiring
  (``star_guard`` in the loader + auto-applied oracle CTEs, the
  widened events guard, the emb_table non-finite predicate) exit 0 IS
  the contract's acceptance gate. ``--skip-nonfinite`` restores the
  phase-1/2-only baseline fixture (for bisecting a finding to the
  non-finite phase vs the standing menagerie).

Run: ``python tools/null_probe_sweep.py [--keep] [--only a,b,c]
[--skip-nonfinite]`` (~4-8 min). Exit 0 = full parity on the
adversarial fixture; exit 1 = at least one divergence or crash,
printed per query. Part of the standing per-round probe checklist
(ROUND12_NOTES §9 onward).
"""

from __future__ import annotations

import os
import re
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_SF = "/root/testdata/sf0.001"
TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)

#: a gate-passing text (≥20 tokens, ≥100 chars) for the NULL-source /
#: NULL-lang planted row, and the exact-dup pair text
_LONG_TEXT = " ".join(f"planted{i}" for i in range(24))
_DUP_TEXT = " ".join(f"dupword{i}" for i in range(24))


def _augment_documents(src: str, dst: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = pq.read_table(src)
    rows = [
        # doc_id, text, lang, source
        (900001, None, "en", "web"),          # NULL text
        (900002, _LONG_TEXT, None, None),     # NULL lang AND NULL source
        (900003, " ", "en", "probe"),         # whitespace-only
        (900004, "", "zh", "probe"),          # empty string
        (900005, _DUP_TEXT, "en", None),      # exact dup, NULL source...
        (900006, _DUP_TEXT, "en", "web"),     # ...vs a real source (r12 class)
        (900007, None, None, None),           # all NULL but the key
        # multibyte UTF-8 (multilingual corpora are the 100 TB norm):
        # probes lower()/length()/md5 byte-vs-char semantics cross-engine
        (900008, ("héllo wörld straße 中文 处理 русский ТЕКСТ naïve "
                  "ÇOĞU İstanbul φύση ΜΕΓΑ " * 3).strip(), "intl", "web"),
        # one pathological 50k-char single token (no spaces): stresses
        # shingle/regex/token paths without any split boundary. This
        # token originally stalled bpe_merge_induction ~10 min at
        # sf0.001 (per-word char-pair explode, quadratic-ish in word
        # length) — closed by the BPE_MAX_WORD_CHARS training cap, and
        # the probe stays at 50k so a cap regression re-stalls the
        # sweep loudly instead of passing quietly.
        (900009, "x" * 50_000, "en", "web"),
    ]
    cols = {
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array([r[3] for r in rows], pa.string()),
        "n_chars": pa.array(
            [None if r[1] is None else len(r[1]) for r in rows], pa.int64()),
    }
    extra = pa.table(cols).select(base.column_names)
    extra = extra.cast(pa.schema([base.schema.field(n)
                                  for n in base.column_names]))
    pq.write_table(pa.concat_tables([base, extra]), dst)


def _augment_embeddings(src: str, dst: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = pq.read_table(src)
    dim = len(base.column("embedding")[0].as_py())
    emb_t = base.schema.field("embedding").type
    lab_t = base.schema.field("label").type
    rows = [
        (900001, None, 0),                                 # NULL vector
        (900002, [0.25, 0.5, 0.75], 1),                    # short vector
        (900003, [0.0] * dim, 2),                          # zero-norm
        (900004, [0.5] * dim, None),                       # NULL label
        (900005, [0.5] * (dim - 1) + [None], 3),           # NULL element
    ]
    extra = pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array([r[1] for r in rows], emb_t),
        "label": pa.array([r[2] for r in rows], lab_t),
    }).select(base.column_names)
    pq.write_table(pa.concat_tables([base, extra]), dst)


def _augment_events(src: str, dst: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = pq.read_table(src)
    ts_t = base.schema.field("ts").type
    mid = base.column("ts")[0].as_py()  # a real in-range event time
    rows = [
        # event_id, ts, user_id, event_type, value, props
        (900001, mid, None, "click", 1.5, '{"k": 1}'),     # anonymous
        (900002, mid, 7, None, 2.5, '{"k": 2}'),           # NULL type
        (900003, mid, 7, "click", None, '{"k": 3}'),       # NULL value
        (900004, mid, 8, "click", 3.5, None),              # NULL props
        (900005, mid, 8, "click", 4.5, "not json {"),      # broken JSON
        (900006, None, 9, "click", 5.5, '{"k": 6}'),       # NULL ts
        (900007, mid, 9, "click", float("nan"), '{"k": 7}'),  # NaN
        (900008, None, None, None, None, None),            # all NULL
    ]
    extra = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], ts_t),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array([r[5] for r in rows], pa.string()),
    }).select(base.column_names)
    pq.write_table(pa.concat_tables([base, extra]), dst)


#: star-table menagerie: {table: [row dicts]} — only named columns are
#: set, everything else NULL; keys 900001+ stay clear of real data
_STAR_ROWS: dict[str, list[dict]] = {
    "customer": [
        {"c_custkey": 900001, "c_nationkey": 1, "c_acctbal": 100.0,
         "c_mktsegment": "BUILDING"},                     # NULL name
        {"c_custkey": 900002, "c_name": "Probe Customer#2",
         "c_acctbal": 200.0, "c_mktsegment": "AUTOMOBILE"},  # NULL FK
        {"c_custkey": 900003, "c_name": "Probe Customer#3",
         "c_nationkey": 1},      # NULL mktsegment (group key) + acctbal
        {"c_custkey": 900004},                            # all-NULL row
        # extreme-value probe (r13 phase 2): EMPTY strings are not NULL
        # (a segment named '' is a real group key) + negative balance
        {"c_custkey": 900005, "c_name": "", "c_nationkey": 1,
         "c_acctbal": -999.99, "c_mktsegment": ""},
    ],
    "orders": [
        {"o_orderkey": 900001, "o_orderstatus": "O",
         "o_totalprice": 123.45, "o_orderdate": "1995-06-15",
         "o_orderpriority": "1-URGENT"},                  # orphan: NULL FK
        {"o_orderkey": 900002, "o_custkey": 1},  # NULL strings/date/price
        {"o_orderkey": 900003},                           # all-NULL row
        # extreme-value probes (r13 phase 2): boundary dates + zero and
        # huge totals — date arithmetic/truncation at the epoch and far
        # future, zero-denominator revenue ratios, DECIMAL headroom
        {"o_orderkey": 900004, "o_custkey": 1, "o_orderstatus": "F",
         "o_totalprice": 0.0, "o_orderdate": "1970-01-01",
         "o_orderpriority": "5-LOW"},
        {"o_orderkey": 900005, "o_custkey": 1, "o_orderstatus": "F",
         "o_totalprice": 9.99e12, "o_orderdate": "2099-12-31",
         "o_orderpriority": "5-LOW"},
    ],
    "lineitem": [
        {"l_partkey": 1, "l_suppkey": 1, "l_linenumber": 900001,
         "l_quantity": 1.0, "l_extendedprice": 10.0, "l_discount": 0.0,
         "l_tax": 0.0, "l_returnflag": "N", "l_linestatus": "O",
         "l_shipdate": "1995-06-15"},                 # NULL l_orderkey
        {"l_orderkey": 1, "l_partkey": 1, "l_suppkey": 1,
         "l_linenumber": 900002},  # NULL flags/date/ALL measures, live keys
        {"l_linenumber": 900003},                         # all-NULL row
        # extreme-value probes (r13 phase 2 — legal doubles, no NaN):
        {"l_orderkey": 1, "l_partkey": 1, "l_suppkey": 1,
         "l_linenumber": 900004, "l_quantity": 0.0,
         "l_extendedprice": 0.0, "l_discount": 1.0, "l_tax": 0.0,
         "l_returnflag": "N", "l_linestatus": "O",
         "l_shipdate": "1995-06-15"},   # zero price, FULL discount:
        #   leading digit '0' (element_at index-0 crash class), zero
        #   denominators in averages/ratios
        {"l_orderkey": 1, "l_partkey": 1, "l_suppkey": 1,
         "l_linenumber": 900005, "l_quantity": -5.0,
         "l_extendedprice": -123.45, "l_discount": 0.5, "l_tax": 0.1,
         "l_returnflag": "R", "l_linestatus": "F",
         "l_shipdate": "1995-06-16"},   # negative reversal line:
        #   leading '-' (strict VARCHAR→INT casts crash in DuckDB where
        #   Spark non-ANSI yields NULL), sign-sensitive aggregates
        {"l_orderkey": 1, "l_partkey": 1, "l_suppkey": 1,
         "l_linenumber": 900006, "l_quantity": 1.0,
         "l_extendedprice": 9.99e12, "l_discount": 0.0, "l_tax": 0.0,
         "l_returnflag": "N", "l_linestatus": "O",
         "l_shipdate": "1995-06-17"},   # magnitude probe: cents fit
        #   DECIMAL(18,2) with zero headroom to spare
    ],
    "supplier": [
        {"s_suppkey": 900001},    # NULL name, FK, acctbal
        {"s_suppkey": 900002, "s_name": "Probe Supplier#2",
         "s_acctbal": 50.0},      # NULL nationkey only
    ],
    "part": [
        {"p_partkey": 900001},    # NULL name/brand/type/size/price
        {"p_partkey": 900002, "p_name": "probe part", "p_brand": "Brand#9",
         "p_size": 7, "p_retailprice": 9.99},             # NULL p_type
    ],
}


def _augment_star(table: str, src: str, dst: str,
                  extra_rows: list[dict] | None = None) -> None:
    """Append `_STAR_ROWS[table]` (+ phase-gated extras) to the base
    parquet, casting each sparse row dict onto the base schema (unnamed
    columns NULL)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = pq.read_table(src)
    rows = _STAR_ROWS[table] + (extra_rows or [])
    cols = {}
    for field in base.schema:
        vals = [r.get(field.name) for r in rows]
        if pa.types.is_timestamp(field.type):
            import pandas as pd

            vals = [None if v is None else pd.Timestamp(v) for v in vals]
        cols[field.name] = pa.array(vals, field.type)
    pq.write_table(pa.concat_tables([base, pa.table(cols)]), dst)


#: key column per star table for the non-finite phase's planted rows
#: (fresh 910000+ keys so phase-3 rows never collide with phases 1-2)
_NONFINITE_KEYS = {
    "customer": "c_custkey",
    "orders": "o_orderkey",
    "lineitem": "l_linenumber",
    "supplier": "s_suppkey",
    "part": "p_partkey",
}

#: live FK/flag context so non-finite measures FLOW through joins and
#: group keys instead of dropping out at the first equi-join
_NONFINITE_CONTEXT: dict[str, dict] = {
    "customer": {"c_name": "NonFinite Probe", "c_nationkey": 1,
                 "c_mktsegment": "BUILDING"},
    "orders": {"o_custkey": 1, "o_orderstatus": "O",
               "o_orderdate": "1995-06-15", "o_orderpriority": "1-URGENT"},
    "lineitem": {"l_orderkey": 1, "l_partkey": 1, "l_suppkey": 1,
                 "l_returnflag": "N", "l_linestatus": "O",
                 "l_shipdate": "1995-06-15"},
    "supplier": {"s_name": "NonFinite Supplier", "s_nationkey": 1},
    "part": {"p_name": "nonfinite part", "p_brand": "Brand#9",
             "p_type": "PROBE", "p_size": 7},
}


def _nonfinite_star_rows() -> dict[str, list[dict]]:
    """Phase-3 rows: for EVERY loader-allowlisted measure column
    (``contracts.STAR_MEASURE_COLUMNS`` — one definition for the sweep AND
    the r16 contract), one row each carrying NaN, +inf, -inf in that
    column with live join context. events.value is planted by
    `_augment_events_nonfinite` (its menagerie already carries NaN)."""
    from tfm_taxitrips_spark.contracts import STAR_MEASURE_COLUMNS

    out: dict[str, list[dict]] = {}
    for table, cols in STAR_MEASURE_COLUMNS.items():
        if table == "events":
            continue
        key, ctx = _NONFINITE_KEYS[table], _NONFINITE_CONTEXT[table]
        rows = []
        k = 910_001
        for col in cols:
            for v in (float("nan"), float("inf"), float("-inf")):
                rows.append({key: k, col: v, **ctx})
                k += 1
        out[table] = rows
    return out


def _augment_events_nonfinite(path: str) -> None:
    """Append ±inf events.value rows (NaN is already in the base
    menagerie) — the r14 probe's four event crash classes, now a
    standing phase."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = pq.read_table(path)
    ts_t = base.schema.field("ts").type
    mid = base.column("ts")[0].as_py()
    rows = [
        (910001, mid, 7, "click", float("inf"), '{"k": 1}'),
        (910002, mid, 7, "click", float("-inf"), '{"k": 2}'),
    ]
    extra = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], ts_t),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array([r[5] for r in rows], pa.string()),
    }).select(base.column_names)
    pq.write_table(pa.concat_tables([base, extra]), path)


def _augment_embeddings_nonfinite(path: str) -> None:
    """Append full-width vectors with ONE non-finite COMPONENT (passes
    the r11 is-null/length/non-zero guard — the r14 probe's two
    vector-audit crash classes)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = pq.read_table(path)
    dim = len(base.column("embedding")[0].as_py())
    emb_t = base.schema.field("embedding").type
    lab_t = base.schema.field("label").type
    rows = [
        (910001, [0.5] * (dim - 1) + [float("nan")], 0),
        (910002, [0.5] * (dim - 1) + [float("inf")], 1),
        (910003, [float("-inf")] + [0.5] * (dim - 1), 2),
    ]
    extra = pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array([r[1] for r in rows], emb_t),
        "label": pa.array([r[2] for r in rows], lab_t),
    }).select(base.column_names)
    pq.write_table(pa.concat_tables([base, extra]), path)


def build_fixture(dst: str, nonfinite: bool = False) -> None:
    nf_rows = _nonfinite_star_rows() if nonfinite else {}
    for t in TABLES:
        src = os.path.join(BASE_SF, f"{t}.parquet")
        out = os.path.join(dst, f"{t}.parquet")
        if t == "documents":
            _augment_documents(src, out)
        elif t == "embeddings":
            _augment_embeddings(src, out)
            if nonfinite:
                _augment_embeddings_nonfinite(out)
        elif t == "events":
            _augment_events(src, out)
            if nonfinite:
                _augment_events_nonfinite(out)
        elif t in _STAR_ROWS:
            _augment_star(t, src, out, nf_rows.get(t))
        else:
            shutil.copyfile(src, out)


def main() -> int:
    keep = "--keep" in sys.argv
    # default-on since the r16 contract landing; --nonfinite is still
    # accepted (a no-op) so r15-era checklists don't error
    nonfinite = "--skip-nonfinite" not in sys.argv
    only: set[str] | None = None
    for a in sys.argv[1:]:
        if a.startswith("--only"):
            only = set(a.split("=", 1)[1].split(",")) if "=" in a else set(
                sys.argv[sys.argv.index(a) + 1].split(","))

    import duckdb

    from tests.oracle import compare_result
    from tfm_taxitrips_spark.queries.registry import all_queries
    from tfm_taxitrips_spark.session import get_spark

    fixture = tempfile.mkdtemp(prefix="nullprobe_")
    build_fixture(fixture, nonfinite=nonfinite)
    print(f"adversarial fixture: {fixture}"
          + (" (+ non-finite phase)" if nonfinite else ""))

    specs = all_queries()
    sel = {
        n: s for n, s in specs.items()
        if s.oracle and re.search(
            r"\b(documents|embeddings|events|customer|orders|supplier"
            r"|part|lineitem)\b", s.oracle, re.I)
        and (only is None or n in only)
    }
    print(f"sweeping {len(sel)} oracle-paired queries over the augmented "
          f"tables (of {len(specs)} registered)")

    spark = get_spark(app_name="null-probe-sweep", master="local[8]",
                      shuffle_partitions=8)
    conn = duckdb.connect()
    for t in TABLES:
        conn.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                 f"'{fixture}/{t}.parquet'")

    bad: list[tuple[str, str]] = []
    for i, (name, spec) in enumerate(sorted(sel.items()), 1):
        try:
            actual = spec.fn(spark, fixture).toPandas()
        except Exception as exc:  # noqa: BLE001 - report, don't mask
            bad.append((name, f"SPARK CRASH: {type(exc).__name__}: "
                              f"{str(exc).splitlines()[0][:200]}"))
            print(f"[{i}/{len(sel)}] {name}: SPARK CRASH")
            continue
        try:
            expected = conn.sql(spec.oracle).df()
        except Exception as exc:  # noqa: BLE001
            bad.append((name, f"ORACLE CRASH: {type(exc).__name__}: "
                              f"{str(exc).splitlines()[0][:200]}"))
            print(f"[{i}/{len(sel)}] {name}: ORACLE CRASH")
            continue
        rec = compare_result(actual.copy(), expected.copy())
        if rec["hash_match"]:
            print(f"[{i}/{len(sel)}] {name}: MATCH ({rec['spark_rows']})")
        else:
            bad.append((name, f"DIVERGE: {rec}"))
            print(f"[{i}/{len(sel)}] {name}: DIVERGE {rec}")

    print()
    if bad:
        print(f"{len(bad)} FINDINGS on the adversarial fixture:")
        for name, why in bad:
            print(f"  {name}: {why}")
    else:
        print("full parity: every swept query agrees cross-engine on the "
              "adversarial fixture")
    if not keep:
        shutil.rmtree(fixture, ignore_errors=True)
    else:
        print(f"fixture kept at {fixture}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
