"""Behavioral tests for the round-7 feature-engineering/audit operators:
source-pair token TVD, leave-one-out target encoding, the Benford
first-digit audit, and closed-form two-factor OLS. Oracle parity is
covered by the registry-wide differential sweep; these pin the semantics
the hash compare alone can't express (planted-coefficient recovery, the
leakage-exclusion identity, distance bounds, and the pinned-constant
table's provenance).
"""

from __future__ import annotations

import math
import os

import pandas as pd

from tfm_taxitrips_spark.queries.analytics import (
    _BENFORD_EXP_PPM,
    q_benford_digit_audit,
    q_group_ols_two_factor,
)
from tfm_taxitrips_spark.queries.dataprep import q_loo_target_encoding
from tfm_taxitrips_spark.queries.text import q_source_token_tvd


def test_benford_constants_are_the_law():
    """The pinned integer table IS round(log10(1+1/d)·10⁶) — the pin
    exists to keep transcendentals out of the query, not to drift from
    the law."""
    for d, ppm in enumerate(_BENFORD_EXP_PPM, start=1):
        assert ppm == round(math.log10(1 + 1 / d) * 1_000_000), d
    assert 999_990 <= sum(_BENFORD_EXP_PPM) <= 1_000_010


def test_benford_observed_shares_partition_unity(spark, sf_smoke):
    """Per segment: digits ∈ 1..9, every row counted once, and the
    floored ppm shares sum to 10⁶ within the ≤8-ulp flooring loss."""
    df = q_benford_digit_audit(spark, sf_smoke).toPandas()
    assert df["digit"].between(1, 9).all()
    for _seg, g in df.groupby("segment"):
        s = int(g["obs_ppm"].sum())
        assert 1_000_000 - 8 <= s <= 1_000_000
        assert (g["abs_dev_ppm"] == (g["obs_ppm"] - g["exp_ppm"]).abs()).all()


def test_loo_encoding_excludes_own_label(spark, sf_smoke):
    """The leakage identity: against a pandas recomputation from raw
    orders, each (category, y) row's encoding equals
    (s − y)·10⁶ div (n − 1) — the row's OWN label excluded — and the
    collapsed rows conserve the category's cardinality."""
    got = q_loo_target_encoding(spark, sf_smoke).toPandas()
    raw = pd.read_parquet(
        os.path.join(sf_smoke, "orders.parquet"),
        columns=["o_orderpriority", "o_orderstatus"],
    )
    raw["y"] = (raw["o_orderstatus"] == "F").astype(int)
    ref = raw.groupby("o_orderpriority")["y"].agg(["count", "sum"])
    for (prio, y), g in got.groupby(["o_orderpriority", "y"]):
        n, s = int(ref.loc[prio, "count"]), int(ref.loc[prio, "sum"])
        row = g.iloc[0]
        assert int(row["n_rows"]) == (s if y == 1 else n - s)
        assert int(row["loo_enc_ppm"]) == (1_000_000 * (s - y)) // (n - 1)
    n_back = got.groupby("o_orderpriority")["n_rows"].sum()
    assert (n_back == ref["count"]).all()


def test_source_tvd_bounds_and_reference(spark, sf_smoke):
    """TVD is a distance: every pair lands in [0, 10⁶] ppm, every
    unordered source pair appears exactly once, and one pair agrees with
    a from-scratch pandas computation over the union vocabulary."""
    got = q_source_token_tvd(spark, sf_smoke).toPandas()
    assert got["tvd_ppm"].between(0, 1_000_000).all()
    assert (got["source_a"] < got["source_b"]).all()
    assert not got.duplicated(["source_a", "source_b"]).any()

    docs = pd.read_parquet(
        os.path.join(sf_smoke, "documents.parquet"), columns=["source", "text"]
    )
    row = got.sort_values(["source_a", "source_b"]).iloc[0]
    sa, sb = row["source_a"], row["source_b"]

    def counts(src):
        toks = []
        for t in docs.loc[docs["source"] == src, "text"]:
            toks.extend(t.lower().split(" "))
        return pd.Series(toks).value_counts()

    ca, cb = counts(sa), counts(sb)
    na, nb = int(ca.sum()), int(cb.sum())
    vocab = ca.index.union(cb.index)
    num = sum(
        abs(int(ca.get(w, 0)) * nb - int(cb.get(w, 0)) * na) for w in vocab
    )
    assert int(row["tvd_ppm"]) == (1_000_000 * num) // (2 * na * nb)


def test_ks_split_drift_matches_ecdf_reference(spark, sf_smoke):
    """The KS statistic must equal a from-scratch pandas ECDF
    computation (max over the merged value domain of the
    cross-multiplied deviation), the argmax value must be the SMALLEST
    value attaining the max, and the statistic must sit in [0, 10⁶]."""
    from tfm_taxitrips_spark.queries.analytics import q_ks_split_drift

    got = q_ks_split_drift(spark, sf_smoke).toPandas()
    assert len(got) == 1
    row = got.iloc[0]
    assert 0 <= int(row["ks_ppm"]) <= 1_000_000

    raw = pd.read_parquet(
        os.path.join(sf_smoke, "lineitem.parquet"),
        columns=["l_returnflag", "l_extendedprice"],
    )
    raw = raw[raw["l_returnflag"].isin(["A", "R"])]
    cents = (raw["l_extendedprice"].round(2) * 100).round().astype("int64")
    a = cents[raw["l_returnflag"] == "A"].value_counts().sort_index()
    b = cents[raw["l_returnflag"] == "R"].value_counts().sort_index()
    na, nb = int(a.sum()), int(b.sum())
    dom = a.index.union(b.index)
    cuma = a.reindex(dom, fill_value=0).cumsum()
    cumb = b.reindex(dom, fill_value=0).cumsum()
    dev = (cuma * nb - cumb * na).abs()
    assert int(row["n_a"]) == na and int(row["n_b"]) == nb
    assert int(row["ks_ppm"]) == (1_000_000 * int(dev.max())) // (na * nb)
    assert int(row["ks_at_cents"]) == int(dev[dev == dev.max()].index.min())


def test_ols_recovers_planted_coefficients(spark, tmp_path):
    """On a synthetic fact table built so that cents = 3·qty + 7·pct
    EXACTLY (non-collinear regressors, zero residual), the closed-form
    solve must return beta_qty_ppm = 3·10⁶ and beta_disc_ppm = 7·10⁶
    bit-exactly — the planted-model recovery a hash compare against an
    oracle that shares the formula could never falsify."""
    rows = []
    for qty in range(1, 13):
        for pct in (0, 2, 5, 8, 10):
            cents = 3 * qty + 7 * pct
            rows.append((float(qty), pct / 100.0, cents / 100.0))
    pdf = pd.DataFrame(
        rows, columns=["l_quantity", "l_discount", "l_extendedprice"]
    )
    # the reader conforms to the full pinned lineitem schema — supply it
    pdf["l_orderkey"] = pdf.index.astype("int64")
    pdf["l_partkey"] = 1
    pdf["l_suppkey"] = 1
    pdf["l_linenumber"] = pd.array([1] * len(pdf), dtype="int32")
    pdf["l_tax"] = 0.0
    pdf["l_returnflag"] = "A"
    pdf["l_linestatus"] = "F"
    pdf["l_shipdate"] = pd.Timestamp("2020-01-01")
    path = os.path.join(tmp_path, "lineitem.parquet")
    pdf.to_parquet(path)
    out = q_group_ols_two_factor(spark, str(tmp_path)).toPandas()
    assert len(out) == 1
    assert int(out.loc[0, "n_rows"]) == len(pdf)
    assert int(out.loc[0, "beta_qty_ppm"]) == 3_000_000
    assert int(out.loc[0, "beta_disc_ppm"]) == 7_000_000


def test_ols_decimal_headroom_at_tested_scales():
    """Turns the `q_group_ols_two_factor` docstring's overflow-horizon
    claim into a checked invariant (r7 verdict item #6 / ADVICE medium).
    With the ppm factor applied only to the sub-``det`` remainder (the
    r8 division-algorithm split), the widest intermediates are the
    numerator products ``m_ab·m_cd`` (~2n⁴·domain-maxima) and the scaled
    remainder bound ``10⁶·det``. Both are computed here in exact Python
    ints from the PINNED column-domain maxima of the test tables
    (l_quantity ≤ 50, discount-pct ≤ 10, price ≤ 1.05×10⁷ cents — the
    sf0.1 measurements in the docstring) and asserted under 10³⁸ for
    every tested per-group row count, with the docstring's claimed
    horizon (~3.7×10⁶ rows/group worst-case) checked as the crossing
    point. Pure arithmetic on purpose: the bound must hold by algebra,
    not by this dataset's luck."""
    X1, X2, Y = 50, 10, 10_500_000  # column-domain maxima (cents/pct)
    LIMIT = 10 ** 38  # DECIMAL(38,0) / the oracle's HUGEINT ~1.7e38

    def bounds(n: int) -> tuple[int, int]:
        # |m_ab| <= n^2 * max|a| * max|b| (crude, adversarial); then
        # |num1| <= |m22||m1y| + |m12||m2y|, |num2| <= |m11||m2y| +
        # |m12||m1y|, det <= |m11||m22| + m12^2, remainder < det.
        m11, m22, m12 = n * n * X1 * X1, n * n * X2 * X2, n * n * X1 * X2
        m1y, m2y = n * n * X1 * Y, n * n * X2 * Y
        num = max(m22 * m1y + m12 * m2y, m11 * m2y + m12 * m1y)
        det = m11 * m22 + m12 * m12
        return num, 1_000_000 * det

    # tested per-group sizes: sf0.001 (~2k/segment), sf0.01 (~20k),
    # sf0.1 (~200k, the largest scale any grading/selfcheck run uses)
    for n in (2_000, 20_000, 200_125):
        num, scaled_rem = bounds(n)
        assert num < LIMIT, f"numerator bound overflows at n={n}"
        assert scaled_rem < LIMIT, f"10^6*remainder bound overflows at n={n}"

    # the docstring's horizon: safe at the claimed 3.7e6 rows/group...
    num, scaled_rem = bounds(3_700_000)
    assert num < LIMIT and scaled_rem < LIMIT
    # ...and genuinely a horizon, not slack: 4x past it the crude bound
    # is out (keeps the docstring claim falsifiable from both sides)
    num, scaled_rem = bounds(15_000_000)
    assert num >= LIMIT or scaled_rem >= LIMIT


def test_ols_betas_non_null_on_real_data(spark, sf_smoke):
    """ANSI is off in the grading sessions, so a DECIMAL(38,0) overflow
    would return silently-NULL betas while the HUGEINT oracle errors —
    the exact divergence ADVICE r7 flagged. Pin the non-NULL side at the
    smoke scale so any future widening of the intermediates fails loudly
    here rather than only in the driver diff."""
    out = q_group_ols_two_factor(spark, sf_smoke).toPandas()
    assert len(out) > 0
    assert out["beta_qty_ppm"].notna().all()
    assert out["beta_disc_ppm"].notna().all()
