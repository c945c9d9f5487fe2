"""Property-based tests (SURVEY.md §5.5): randomized frames checked against
naive Python models. These pin the operator *semantics* — the differential
oracle pins them on fixed data, hypothesis pins them on adversarial shapes
(dup timestamps, singleton groups, all-rows-one-key skew)."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tfm_taxitrips_spark.operators.skew import null_split_join, salted_agg
from tfm_taxitrips_spark.operators.temporal import (
    asof_join,
    sessionize,
    time_range_join,
)

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_EPOCH = dt.datetime(2024, 1, 1)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(-10**6, 10**6)),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_salted_agg_equals_direct_groupby(spark, rows):
    """Salting is result-invariant: decimal sums are associative, so the
    two-phase aggregation equals the direct one on any distribution —
    including everything-on-one-key skew."""
    df = spark.createDataFrame(
        [(f"k{k}", v / 100.0) for k, v in rows], "k string, v double"
    )
    got = {
        r.k: (r.sv, r.n_rows)
        for r in salted_agg(df, keys=["k"], sum_cols=[("v", "sv")], salt_buckets=4).collect()
    }
    direct = {
        r.k: (r.sv, r.n_rows)
        for r in df.groupBy("k")
        .agg(
            F.sum(F.col("v").cast("decimal(18,2)")).cast("double").alias("sv"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .collect()
    }
    assert got == direct


@given(
    left=st.lists(
        st.tuples(st.one_of(st.none(), st.integers(0, 4)), st.integers(0, 99)),
        min_size=1,
        max_size=25,
    ),
    right=st.lists(st.tuples(st.integers(0, 4), st.text("ab", max_size=2)),
                   min_size=0, max_size=8),
)
@settings(**_SETTINGS)
def test_null_split_join_equals_direct_left_join(spark, left, right):
    """Routing null keys around the shuffle must not change the result —
    including duplicate right-side keys (row multiplication)."""
    l_df = spark.createDataFrame(left, "k int, lv int")
    r_df = spark.createDataFrame(right, "k int, rv string")
    got = sorted(
        map(tuple, null_split_join(l_df, r_df, "k").collect()),
        key=str,
    )
    direct = sorted(map(tuple, l_df.join(r_df, "k", "left").collect()), key=str)
    assert got == direct


@given(
    events=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 500)),  # (user, minute)
        min_size=1,
        max_size=30,
        unique=True,
    )
)
@settings(**_SETTINGS)
def test_sessionize_matches_python_model(spark, events):
    """Gap-based session ids equal the obvious sequential model, including
    duplicate timestamps (tie-broken by event id)."""
    rows = [
        (uid, i, _EPOCH + dt.timedelta(minutes=minute))
        for i, (uid, minute) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, "user_id int, event_id int, ts timestamp")
    got = {
        (r.user_id, r.event_id): r.session_id
        for r in sessionize(df, gap="30 minutes").collect()
    }

    expected = {}
    by_user: dict[int, list[tuple[int, dt.datetime]]] = {}
    for uid, eid, ts in rows:
        by_user.setdefault(uid, []).append((eid, ts))
    for uid, evs in by_user.items():
        evs.sort(key=lambda e: (e[1], e[0]))
        sid, last = 0, None
        for eid, ts in evs:
            if last is None or (ts - last) > dt.timedelta(minutes=30):
                sid += 1
            last = ts
            expected[(uid, eid)] = sid
    assert got == expected


@given(
    probe_ts=st.lists(st.integers(0, 40), min_size=1, max_size=12, unique=True),
    cand_ts=st.lists(st.integers(0, 40), min_size=1, max_size=12, unique=True),
    range_us=st.sampled_from([1, 7, 10]),
)
@settings(**_SETTINGS)
def test_time_range_join_matches_naive(spark, probe_ts, cand_ts, range_us):
    """The bucketed rewrite returns exactly the pairs with cand ∈
    [probe, probe+range] — including pairs on bucket boundaries (ts values
    deliberately near multiples of range_us)."""
    p_df = spark.createDataFrame([(t, 100 + i) for i, t in enumerate(probe_ts)],
                                 "p_us bigint, p_id int")
    c_df = spark.createDataFrame([(t, 200 + i) for i, t in enumerate(cand_ts)],
                                 "c_us bigint, c_id int")
    got = {
        (r.p_id, r.c_id)
        for r in time_range_join(p_df, c_df, "p_us", "c_us", range_us).collect()
    }
    expected = {
        (100 + i, 200 + j)
        for i, pt in enumerate(probe_ts)
        for j, ct in enumerate(cand_ts)
        if pt <= ct <= pt + range_us
    }
    assert got == expected


@given(
    probes=st.lists(st.integers(0, 200), min_size=1, max_size=15, unique=True),
    cands=st.lists(
        st.tuples(st.integers(0, 200), st.integers(0, 100)),  # (minute, payload)
        min_size=1,
        max_size=15,
    ),
)
@settings(**_SETTINGS)
def test_asof_join_matches_python_model(spark, probes, cands):
    """asof payload = candidate with the greatest ts <= probe ts (ties:
    larger id wins), or null when no candidate precedes the probe."""
    p_rows = [(1, 1000 + i, _EPOCH + dt.timedelta(minutes=m)) for i, m in enumerate(probes)]
    c_rows = [
        (1, i, _EPOCH + dt.timedelta(minutes=m), p) for i, (m, p) in enumerate(cands)
    ]
    p_df = spark.createDataFrame(p_rows, "k int, id bigint, ts timestamp")
    c_df = spark.createDataFrame(c_rows, "k int, id bigint, ts timestamp, payload bigint")
    got = {
        r.id: r.asof_value
        for r in asof_join(p_df, c_df, "k", "ts", "id", "payload").collect()
    }

    expected = {}
    for _, pid, pts in p_rows:
        best = None  # (ts, id, payload)
        for _, cid, cts, pay in c_rows:
            if cts <= pts and (best is None or (cts, cid) > (best[0], best[1])):
                best = (cts, cid, pay)
        expected[pid] = best[2] if best else None
    assert got == expected


# --------------------------------------------------------------------------
# connected components vs a union-find model
# --------------------------------------------------------------------------

def _uf_components(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(lambda p: p[0] != p[1]),
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_connected_components_equals_union_find(spark, pairs):
    """Min-label propagation must equal the union-find transitive closure on
    any graph shape — multi-edges, cycles, long chains, dense blobs."""
    from tfm_taxitrips_spark.operators.clustering import connected_components

    edges = spark.createDataFrame(pairs, "src long, dst long")
    got = {
        r["node"]: r["comp"] for r in connected_components(edges).collect()
    }
    assert got == _uf_components(pairs)


@given(
    build=st.lists(st.integers(-(2**62), 2**62), min_size=0, max_size=60),
    probe=st.lists(st.integers(-(2**62), 2**62), min_size=0, max_size=60),
)
@settings(**_SETTINGS)
def test_bloom_probe_never_drops_a_match(spark, build, probe):
    """Bloom pruning keeps EVERY probe key present in the build set (no
    false negatives) — including negatives, zero, and shared keys — and the
    surviving superset never exceeds the probe input."""
    from tfm_taxitrips_spark.operators.bloom import bloom_build, bloom_probe

    b = spark.createDataFrame([(k,) for k in build] or [(0,)], "k bigint")
    if not build:
        b = b.limit(0)
    p = spark.createDataFrame([(k,) for k in probe] or [(0,)], "k bigint")
    if not probe:
        p = p.limit(0)
    kept = {r.k for r in bloom_probe(p, "k", bloom_build(b, "k")).collect()}
    assert set(build) & set(probe) <= kept <= set(probe)


@given(
    left=st.lists(st.tuples(st.integers(0, 5), st.integers(0, 99)),
                  min_size=0, max_size=40),
    right=st.lists(st.tuples(st.integers(0, 5), st.integers(0, 99)),
                   min_size=0, max_size=10),
    how=st.sampled_from(["inner", "left"]),
)
@settings(**_SETTINGS)
def test_salted_join_equals_direct_join(spark, left, right, how):
    """salted_join is row-identical (as a multiset) to the direct join for
    inner and left, including duplicate keys on both sides."""
    from tfm_taxitrips_spark.operators.skew import salted_join

    ldf = spark.createDataFrame(left or [(0, 0)], "k int, lv int")
    rdf = spark.createDataFrame(right or [(0, 0)], "rk int, rv int")
    if not left:
        ldf = ldf.limit(0)
    if not right:
        rdf = rdf.limit(0)
    got = salted_join(ldf, rdf, "k", "rk", how=how).collect()
    exp = ldf.join(rdf, ldf.k == rdf.rk, how).collect()
    key = lambda r: tuple(-1 if v is None else v for v in r)
    assert sorted(map(key, got)) == sorted(map(key, exp))


def test_salted_join_spreads_clustered_hot_key(spark):
    """A hot key whose rows all sit in ONE input partition must still fan
    out over multiple salt values — the regression the content-derived
    salt fixes (a partition-id salt gives every row of a partition the
    same salt, so clustered/sorted input re-funnels the hot key into one
    reducer)."""
    from pyspark.sql import functions as F

    from tfm_taxitrips_spark.operators.skew import salted_join

    hot = spark.range(1000).select(
        F.lit(7).alias("k"), F.col("id").alias("lv")
    ).coalesce(1)  # the whole hot key in a single input partition
    dim = spark.createDataFrame([(7, "x")], "rk int, rv string")
    joined = salted_join(hot, dim, "k", "rk", salt_buckets=8)
    n_salts = (
        hot.withColumn("_salt", F.pmod(F.xxhash64(*hot.columns), F.lit(8)))
        .select("_salt").distinct().count()
    )
    assert n_salts >= 6, "content salt must spread a clustered hot key"
    assert joined.count() == 1000  # and stay row-identical to the direct join


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)),
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_skyline_matches_naive_dominance(spark, rows):
    """The running-max skyline rewrite equals the O(n²) dominance model on
    any point set — including all-ties, one-group, and duplicate points."""
    from tfm_taxitrips_spark.operators.analytics import skyline_2d

    df = spark.createDataFrame(
        [(i, p, s) for i, (p, s) in enumerate(rows)],
        "id int, price int, size int",
    )
    got = sorted(
        (r.id, r.price, r.size)
        for r in skyline_2d(df, "price", "size").collect()
    )
    expect = sorted(
        (i, p, s)
        for i, (p, s) in enumerate(rows)
        if not any(
            (q <= p and t >= s and (q < p or t > s)) for q, t in rows
        )
    )
    assert got == expect


@given(
    ops=st.lists(
        st.tuples(
            st.integers(0, 5),          # key
            st.integers(0, 9),          # seq
            st.sampled_from(["U", "D"]),
            st.sampled_from(["a", "b", "<del>"]),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_cdc_collapse_matches_replay(spark, ops):
    """cdc_collapse equals a per-key ordered replay for any log — dup
    keys, delete-then-update, single-op keys. (key, seq) is deduped first
    (the operator contract: seq is unique per key)."""
    from tfm_taxitrips_spark.operators.analytics import cdc_collapse

    uniq = {(k, s): (o, p) for k, s, o, p in ops}
    rows = [(k, s, o, p) for (k, s), (o, p) in uniq.items()]
    df = spark.createDataFrame(
        rows, "k int, seq int, op string, status string"
    )
    got = {
        r.k: (r.last_op, r.final_status, r.last_seq, r.alive)
        for r in cdc_collapse(df, key="k").collect()
    }
    expect = {}
    for k in {r[0] for r in rows}:
        key_ops = sorted(r for r in rows if r[0] == k)
        _, seq, op, payload = max(key_ops, key=lambda r: r[1])
        expect[k] = (op, payload if op != "D" else None, seq, op != "D")
    assert got == expect


@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 2),                     # user
            st.sampled_from(["click", "purchase"]),
            st.integers(0, 100),                   # minutes offset
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_asof_forward_matches_python_model(spark, events):
    """asof_forward_join equals the naive per-click scan for any event
    mix — same-timestamp click/purchase ties (at-or-after includes them),
    no-purchase users, out-of-tolerance gaps."""
    import pyspark.sql.functions as F

    from tfm_taxitrips_spark.operators.temporal import asof_forward_join
    from tfm_taxitrips_spark.queries.temporal import FWD_TOL_US

    rows = [
        (eid, u, ty, _EPOCH + dt.timedelta(minutes=m))
        for eid, (u, ty, m) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    clicks = df.where(F.col("event_type") == "click")
    purchases = df.where(F.col("event_type") == "purchase")
    got = {
        r.event_id: r.next_id
        for r in asof_forward_join(
            clicks, purchases, key_col="user_id", ts_col="ts",
            id_col="event_id", tolerance_us=FWD_TOL_US,
        ).collect()
    }

    # naive model: for each click, earliest (us, event_id) purchase of the
    # same user with p_us >= c_us and gap <= tolerance
    us_of = {eid: int((ts - _EPOCH).total_seconds() * 1_000_000)
             for eid, _, _, ts in rows}
    expect = {}
    for eid, u, ty, _ in rows:
        if ty != "click":
            continue
        cands = [
            (us_of[pid], pid)
            for pid, pu, pty, _ in rows
            if pty == "purchase" and pu == u and us_of[pid] >= us_of[eid]
            and us_of[pid] - us_of[eid] <= FWD_TOL_US
        ]
        expect[eid] = min(cands)[1] if cands else None
    assert got == expect


# ---------------------------------------------------------------------------
# fixture-drift conform layer: random drift combinations (round-4 armor)
# ---------------------------------------------------------------------------

#: per-column drift choices for the `customer` pin (bigint, string, int,
#: double, string): each entry maps a pinned column to the arrow types the
#: generator could plausibly ship it as, all value-preserving for the
#: values below
_CUST_DRIFTS = {
    "c_custkey": ["int64", "int32"],
    "c_name": ["string"],
    "c_nationkey": ["int32", "int64", "int16"],
    "c_acctbal": ["float64", "float32"],
    "c_mktsegment": ["string"],
}


@given(
    drift=st.fixed_dictionaries(
        {c: st.sampled_from(ts) for c, ts in _CUST_DRIFTS.items()}
    ),
    add_extra=st.booleans(),
)
@settings(**_SETTINGS)
def test_conform_survives_random_drift_combinations(
    spark, tmp_path_factory, drift, add_extra
):
    """Any combination of value-preserving per-column drifts (int widths,
    float/double, plus an optional added column) must conform to the
    pinned customer schema with values intact. One property run covers
    drift combinations the per-class simulations never enumerate."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tfm_taxitrips_spark import schemas
    from tfm_taxitrips_spark.sources.readers import table

    # values chosen exact in every sampled type (small ints, 0.5-steps)
    rows = {
        "c_custkey": [1, 2, 3],
        "c_name": ["a", "b", "c"],
        "c_nationkey": [7, 8, 9],
        "c_acctbal": [1.5, -2.0, 0.25],
        "c_mktsegment": ["X", "Y", "Z"],
    }
    cols = {
        c: pa.array(v, getattr(pa, drift[c])() if drift[c] != "string" else pa.string())
        for c, v in rows.items()
    }
    if add_extra:
        cols["c_comment"] = pa.array(["n1", "n2", "n3"])
    d = tmp_path_factory.mktemp("hypdrift")
    pq.write_table(pa.table(cols), str(d / "customer.parquet"))
    df = table(spark, str(d), "customer")
    pinned = schemas.DRIVER_TABLES["customer"]
    assert df.schema.fields[: len(pinned.fields)] == list(pinned.fields)
    got = sorted(
        (r.c_custkey, r.c_name, r.c_nationkey, r.c_acctbal, r.c_mktsegment)
        for r in df.collect()
    )
    assert got == sorted(zip(*rows.values()))


@given(n_tokens=st.integers(min_value=0, max_value=300))
@settings(**_SETTINGS)
def test_doc_chunking_covers_every_token(spark, tmp_path_factory, n_tokens):
    """Chunking invariants for any document length: (a) every token
    position is covered by at least one kept chunk; (b) consecutive
    chunks overlap by exactly CHUNK_W - CHUNK_STRIDE tokens while both
    are full-width; (c) chunk_ids are dense from 0. Tail-dropping
    (< CHUNK_MIN) must never orphan tokens — a dropped tail's tokens all
    appear in the previous (overlapping) chunk."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tfm_taxitrips_spark.queries.dataprep import (
        CHUNK_MIN,
        CHUNK_STRIDE,
        CHUNK_W,
        q_doc_chunking,
    )

    text = " ".join(f"t{i}" for i in range(n_tokens))  # unique tokens
    t = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array([text]),
            "lang": pa.array(["en"]),
            "source": pa.array(["syn"]),
            "n_chars": pa.array([len(text)], pa.int64()),
        }
    )
    d = tmp_path_factory.mktemp("chunkprop")
    pq.write_table(t, str(d / "documents.parquet"))
    rows = sorted(
        q_doc_chunking(spark, str(d)).collect(), key=lambda r: r.chunk_id
    )
    assert [r.chunk_id for r in rows] == list(range(len(rows)))  # dense
    covered = set()
    for r in rows:
        # mirrors the engines' split semantics: ''.split(' ') == ['']
        toks = r.chunk_text.split(" ")
        assert len(toks) == r.n_chunk_tokens
        covered.update(toks)
    expected = {f"t{i}" for i in range(n_tokens)} or {""}
    # every token of the doc appears in some kept chunk: a dropped tail
    # (< CHUNK_MIN tokens) is always a suffix of the previous chunk
    # because stride < W - CHUNK_MIN... unless the tail extends BEYOND
    # the previous chunk's reach; assert the real invariant directly
    missing = expected - covered
    assert not missing, f"orphaned tokens: {sorted(missing)[:5]} (n={n_tokens})"


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 1),      # partition key
            st.integers(0, 3),      # bucket (coarse monotone split)
            st.integers(0, 5),      # within-bucket order key (dups allowed)
            st.integers(-100, 100), # value
        ),
        min_size=1,
        max_size=40,
    ),
    inclusive=st.booleans(),
)
@settings(**_SETTINGS)
def test_two_phase_prefix_sum_equals_naive_cumsum(spark, rows, inclusive):
    """The two-phase decomposition is order-exact on any distribution —
    empty buckets, dup order keys, everything-in-one-bucket — against a
    naive Python running sum over the same total order. Rows get a unique
    id as the window tie-break so both sides walk the identical order."""
    from tfm_taxitrips_spark.operators.prefix import two_phase_prefix_sum

    data = [(p, b, o, v, i) for i, (p, b, o, v) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "p int, b int, o int, v long, rid int"
    )
    got = {
        r.rid: r.run
        for r in two_phase_prefix_sum(
            df, partition_cols=("p",), bucket_col="b",
            order_cols=("o", "rid"), val_col="v", out_col="run",
            inclusive=inclusive,
        ).collect()
    }
    ref: dict[int, int] = {}
    for p in {r[0] for r in data}:
        acc = 0
        for (_, _, _, v, rid) in sorted(
            (r for r in data if r[0] == p), key=lambda r: (r[1], r[2], r[4])
        ):
            ref[rid] = (acc + v) if inclusive else acc
            acc += v
    assert got == ref


@given(
    batches=st.lists(
        st.lists(
            st.tuples(
                st.integers(0, 4),          # window index (4 → NULL window)
                st.integers(0, 3),          # event-type index (3 → NULL key)
                st.integers(1, 50),         # n_events
                st.integers(-10**4, 10**4), # total_value (cents-ish)
            ),
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=4,
    )
)
@settings(**_SETTINGS)
def test_serving_merge_equals_dict_upsert(spark, tmp_path_factory, batches):
    """The round-9 serving upsert is semantically a dict upsert keyed on
    (window_start, event_type): after ANY sequence of micro-batches —
    duplicate keys across batches, multiple dates per batch, re-touched
    windows, NULL event-type keys (groupBy's NULL group is a real upsert
    key — the null-safe-match regression class), and NULL window_start
    rows (the NULL date partition is a real, overwritable partition —
    the round-10 null-safe touched-date read) — the table equals
    replaying the batches into a plain dict (last write per key wins;
    within a batch the update-mode contract is one row per key, so later
    tuples for the same key overwrite). The example-based tests pin
    chosen traps (sibling survival, re-delivery, NULL-key re-emission,
    NULL-date sibling loss); this pins the semantics on adversarial
    shapes."""
    import datetime as _dt

    from tfm_taxitrips_spark.streaming.serving import topk_view, upsert_to_serving

    serving = str(tmp_path_factory.mktemp("serving_prop") / "table")
    refresh = upsert_to_serving(serving)
    model: dict[tuple, tuple] = {}
    base = _dt.datetime(2024, 1, 1)
    for bid, batch in enumerate(batches):
        rows = []
        seen_in_batch: dict[tuple, tuple] = {}
        for w, t, n, v in batch:
            # windows 12h apart -> the 4 real windows span 2 calendar
            # dates, so every example exercises the multi-date merge
            # path; index 4 is the NULL window (Hive default partition)
            key = (
                None if w == 4 else base + _dt.timedelta(hours=12 * w),
                None if t == 3 else f"type{t}",
            )
            seen_in_batch[key] = (n, float(v))
        for (ws, et), (n, v) in seen_in_batch.items():
            rows.append((ws, et, n, v))
            model[(ws, et)] = (n, v)
        refresh(
            spark.createDataFrame(
                rows,
                "window_start timestamp, event_type string, "
                "n_events bigint, total_value double",
            ),
            bid,
        )
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in topk_view(spark, serving, 1000).collect()
    }
    assert got == model
