"""Behavioral tests for the round-11 operators and the round's probe
findings. Oracle parity is covered by the registry-wide differential
sweep; these pin semantics a formula-sharing hash compare can't falsify
(an independent exact-Python ADC/brute replay for the PQ recall gate)
plus the malformed-embedding contract the round-11 NULL probe forced on
the whole vector family (failing-first: before the guard, one NULL
embedding made 13 cosine queries return Spark results DuckDB refused,
and one 3-dim embedding CRASHED Spark's fixed-slice audits outright).
"""

from __future__ import annotations

import math
import os

import duckdb
import numpy as np
import pandas as pd

from tfm_taxitrips_spark.queries.vectors import (
    N_QUERY_VECS,
    PQ_ITERS,
    PQ_K,
    PQ_SEED_BASE,
    PQ_SUBDIM,
    PQ_SUBSPACES,
    TOP_K,
    q_embedding_pq_recall_eval,
)


def _seq_dot(a, b):
    """Python twin of functions.similarity.dot — the same sequential
    left fold from 0.0, so IEEE results match bit for bit."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def test_pq_recall_eval_matches_exact_python_reference(spark, sf_smoke):
    """Independent reference for the whole gate: replay PQ training
    (exact ints), encoding, the ADC lookup scoring, the brute-force
    cosine ranking (the identical sequential-fold float arithmetic),
    and the recall contingency in plain Python from the raw parquet —
    and require the emitted (qid, n_brute, n_approx, n_hits) table to
    match cell for cell."""
    emb = pd.read_parquet(f"{sf_smoke}/embeddings.parquet")
    vecs = {int(v): [float(x) for x in e]
            for v, e in zip(emb["vec_id"], emb["embedding"])}

    # --- training replay (the r10 codebook test's loop, verbatim rules)
    sub = {}
    for vid, vec in vecs.items():
        q = [int(math.floor(x * 1_000_000.0)) for x in vec]
        for s in range(PQ_SUBSPACES):
            sub[(vid, s)] = q[s * PQ_SUBDIM:(s + 1) * PQ_SUBDIM]
    cents = {
        s: {k: sub[(PQ_SEED_BASE + k, s)] for k in range(PQ_K)}
        for s in range(PQ_SUBSPACES)
    }

    def assign(cents):
        out = {}
        for (vid, s), v in sub.items():
            best = min(
                (sum((a - b) ** 2 for a, b in zip(v, c)), k)
                for k, c in cents[s].items()
            )
            out[(vid, s)] = best[1]
        return out

    def trunc_div(a: int, n: int) -> int:
        q = abs(a) // n
        return q if a >= 0 else -q

    a = None
    for i in range(PQ_ITERS):
        a = assign(cents)
        if i < PQ_ITERS - 1:
            nxt = {s: {} for s in range(PQ_SUBSPACES)}
            for s in range(PQ_SUBSPACES):
                for k in range(PQ_K):
                    members = [sub[(vid, ss)] for (vid, ss), c in a.items()
                               if ss == s and c == k]
                    if members:
                        nxt[s][k] = [
                            trunc_div(sum(m[d] for m in members),
                                      len(members))
                            for d in range(PQ_SUBDIM)
                        ]
            cents = nxt

    # --- ADC top-k per probe over the encoded store
    approx: dict[int, set[int]] = {}
    for qid in range(N_QUERY_VECS):
        scored = []
        for vid in vecs:
            if vid == qid:
                continue
            d = 0
            for s in range(PQ_SUBSPACES):
                cent = cents[s][a[(vid, s)]]
                d += sum((x - c) ** 2 for x, c in zip(sub[(qid, s)], cent))
            scored.append((d, vid))
        scored.sort()
        approx[qid] = {vid for _d, vid in scored[:TOP_K]}

    # --- brute-force cosine top-k (same sequential-fold IEEE ops)
    brute: dict[int, list[int]] = {}
    for qid in range(N_QUERY_VECS):
        qv = vecs[qid]
        qn = math.sqrt(_seq_dot(qv, qv))
        scored = []
        for vid, ev in vecs.items():
            if vid == qid:
                continue
            cos = _seq_dot(qv, ev) / (qn * math.sqrt(_seq_dot(ev, ev)))
            scored.append((-cos, vid))
        scored.sort()
        brute[qid] = [vid for _c, vid in scored[:TOP_K]]

    ref = {
        qid: (len(brute[qid]), len(approx[qid]),
              sum(1 for v in brute[qid] if v in approx[qid]))
        for qid in range(N_QUERY_VECS)
    }

    out = q_embedding_pq_recall_eval(spark, sf_smoke).toPandas()
    got = {
        int(r["qid"]): (int(r["n_brute"]), int(r["n_approx"]),
                        int(r["n_hits"]))
        for _, r in out.iterrows()
    }
    assert got == ref
    # the gate must measure a real, non-degenerate number: every probe
    # produced a full candidate slate
    assert all(nb == TOP_K for nb, _na, _nh in got.values())


def _write_embeddings(tmp_path, extra_rows=()):
    rng = np.random.RandomState(7)
    rows = []
    for vid in (list(range(21)) + list(range(PQ_SEED_BASE, PQ_SEED_BASE + PQ_K))
                + list(range(300, 320))):
        rows.append((vid, rng.rand(64).astype("float32").tolist(),
                     int(vid % 3)))
    rows.extend(extra_rows)
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    pdf["vec_id"] = pdf["vec_id"].astype("int64")
    pdf["label"] = pdf["label"].astype("int32")
    pdf.to_parquet(os.path.join(tmp_path, "embeddings.parquet"))


def test_malformed_embedding_contract_both_engines(spark, tmp_path):
    """Round-11 probe finding, pinned post-fix: ONE planted NULL
    embedding plus ONE 3-dim embedding must leave every vector-family
    query engine-AGREEING (before `emb_table`/`_emb_guard_sql`, the
    cosine family returned Spark results DuckDB refused with
    'list_inner_product: argument can not contain NULL values', and the
    fixed-slice audits crashed Spark with INVALID_ARRAY_INDEX). The
    whole family is probed — every vectors-module query — not just the
    round's new op."""
    from tfm_taxitrips_spark.queries import vectors as V
    from tests.oracle import compare_result

    rng = np.random.RandomState(11)
    _write_embeddings(tmp_path, extra_rows=[
        (400, None, 1),
        (401, rng.rand(3).astype("float32").tolist(), 1),
    ])
    conn = duckdb.connect()
    conn.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{tmp_path}/embeddings.parquet'"
    )
    try:
        for name, spec in V.QUERIES.items():
            actual = spec.fn(spark, str(tmp_path)).toPandas()
            expected = conn.sql(spec.oracle).df()
            rec = compare_result(actual, expected)
            assert rec["hash_match"], (name, rec)
    finally:
        conn.close()


def test_emb_guard_excludes_exactly_the_malformed_rows(spark, tmp_path):
    """The guard's contract is exclusion, not repair: with 45 clean +
    2 malformed vectors, the guarded scan returns exactly the 45, and a
    clean-only store is untouched (the guard is a no-op on data that
    honors the ingest schema)."""
    from tfm_taxitrips_spark.queries.vectors import EMB_MIN_DIMS, emb_table

    rng = np.random.RandomState(11)
    _write_embeddings(tmp_path, extra_rows=[
        (400, None, 1),
        (401, rng.rand(EMB_MIN_DIMS - 1).astype("float32").tolist(), 1),
    ])
    got = emb_table(spark, str(tmp_path)).select("vec_id").toPandas()
    assert len(got) == 45
    assert not {400, 401} & set(got["vec_id"])
