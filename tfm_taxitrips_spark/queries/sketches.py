"""Sketch / approximate aggregates — the 100 TB scale path.

At cluster scale, exact COUNT(DISTINCT) is an expand + two-phase shuffle on
every distinct value, and exact percentiles need a full sort; both are
routinely the most expensive operators in a pipeline. Spark ships
mergeable, one-pass, bounded-memory sketches for these (HyperLogLog++ via
``approx_count_distinct``, Greenwald-Khanna via ``percentile_approx``) whose
partial states combine associatively — a single map-side-combined shuffle of
kilobyte-sized state regardless of cardinality. The reference never needs
them (its data is one city-year of taxi trips), but its data-model doc
claims "número de taxis activos" per area — exactly the distinct-count that
stops being exactly computable cheaply at 100 TB (SURVEY.md §2.6 A4).

Oracle strategy: sketch estimates are engine-specific, so instead of
comparing the estimate itself we emit the *accuracy contract* — a boolean
"estimate within the documented error bound of the exact answer", computed
Spark-side against Spark's own exact aggregate — alongside exact,
oracle-checkable columns. The DuckDB oracle asserts the boolean is TRUE and
recomputes the exact columns, so a hash match proves both the exact values
AND that the sketch met its bound.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tfm_taxitrips_spark.functions.text import tokens
from tfm_taxitrips_spark.operators.partitioning import fan_out
from tfm_taxitrips_spark.queries.registry import QuerySpec
from tfm_taxitrips_spark.sources.readers import table


def q_hll_distinct_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct users per event_type, checked against exact.

    ``approx_count_distinct(rsd=0.02)`` keeps ~`1.04/rsd`² registers
    (~2.7 k) per group — constant memory however many distinct users exist.
    The 5% assertion bound is looser than the 2% rsd (rsd is a standard
    deviation, not a hard cap).
    """
    ev = table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("_hll"),
    )
    return agg.select(
        "event_type",
        "n_users",
        (F.abs(F.col("_hll") - F.col("n_users"))
         <= 0.05 * F.col("n_users")).alias("hll_within_5pct"),
    )


_HLL_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
       TRUE AS hll_within_5pct
FROM events GROUP BY event_type
"""


def q_quantile_sketch_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna approximate p50/p95 of l_extendedprice, checked
    against Spark's exact ``percentile``.

    accuracy=1000 bounds the *rank* error at N/1000; we assert the looser
    *value* bound of 2% relative error, which holds for this data because
    the price distribution has no heavy point masses.

    Stated contract (r13 star-table sweep): a group with ZERO non-NULL
    prices has no quantiles — its within-bound booleans are explicit
    NULL in both engines (Spark's percentile of an all-NULL group is
    already NULL; the oracle's literal TRUE now guards on a non-NULL
    price existing). The group row itself is kept: n_rows counts rows,
    not prices.
    """
    li = table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.percentile_approx("l_extendedprice", [0.5, 0.95], 1000).alias("_gk"),
        F.expr(
            "percentile(l_extendedprice, array(0.5D, 0.95D))"
        ).alias("_exact"),
    )
    within = [
        (F.abs(F.col("_gk")[i] - F.col("_exact")[i])
         <= 0.02 * F.col("_exact")[i]).alias(alias)
        for i, alias in ((0, "p50_within_2pct"), (1, "p95_within_2pct"))
    ]
    return agg.select("l_returnflag", "n_rows", *within)


_QUANTILE_SQL = """
SELECT l_returnflag, COUNT(*) AS n_rows,
       CASE WHEN COUNT(l_extendedprice) > 0 THEN TRUE END
         AS p50_within_2pct,
       CASE WHEN COUNT(l_extendedprice) > 0 THEN TRUE END
         AS p95_within_2pct
FROM lineitem GROUP BY l_returnflag
"""


def q_hll_partitioned_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MERGEABILITY contract that makes sketches the 100 TB path:
    per-(event_type, day) DataSketches HLL states built once, then
    ``hll_union_agg``-combined into a per-type distinct estimate WITHOUT
    re-scanning the fact — the pattern for incremental rollups, where each
    day's partition is sketched on arrival and historical totals are
    re-derived from kilobyte states.

    ``sum_daily_users`` (the naive re-aggregation: summing per-day distinct
    counts) is emitted alongside to show why the union is needed — users
    recur across days, so the sum overcounts; only the sketch union
    deduplicates across partitions without the raw data.

    Oracle strategy (module docstring): the estimate is engine-specific,
    so the emitted column is the accuracy-contract boolean, computed
    Spark-side against Spark's own exact distinct; the exact columns
    hash-match DuckDB bit-for-bit.
    """
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.hll_sketch_agg("user_id").alias("_sk"),
        F.count_distinct("user_id").alias("_n_day"),
    )
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias("_est"),
        F.sum("_n_day").cast("bigint").alias("sum_daily_users"),
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users")
    )
    # few event types — the merged side broadcasts
    return exact.join(F.broadcast(merged), "event_type").select(
        "event_type",
        "n_users",
        "sum_daily_users",
        (F.abs(F.col("_est") - F.col("n_users"))
         <= 0.05 * F.col("n_users")).alias("union_within_5pct"),
    )


_HLL_UNION_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         COUNT(DISTINCT user_id) AS n_day
  FROM events GROUP BY 1, 2
)
SELECT e.event_type, e.n_users,
       CAST(d.sum_daily_users AS BIGINT) AS sum_daily_users,
       TRUE AS union_within_5pct
FROM (SELECT event_type, COUNT(DISTINCT user_id) AS n_users
      FROM events GROUP BY 1) e
JOIN (SELECT event_type, SUM(n_day) AS sum_daily_users
      FROM daily GROUP BY 1) d
  ON e.event_type = d.event_type
"""


_CMS_D = 4        # sketch depth (independent hash rows)
_CMS_W = 2048     # sketch width (buckets per row)
_CMS_TOPK = 20


def _cms_cells(tok: Column) -> Column:
    """The token's ``(row, bucket)`` coordinates, one per hash row.
    ``xxhash64(tok, row)`` hashes the (token, row-literal) tuple, so the
    rows are independent and build/probe agree by construction."""
    return F.array(*[
        F.struct(
            F.lit(i).alias("d"),
            F.pmod(F.xxhash64(tok, F.lit(i)), F.lit(_CMS_W)).alias("b"),
        )
        for i in range(_CMS_D)
    ])


def cms_heavy_hitters_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch term frequencies, checked against exact counts for
    the corpus's top-20 tokens (Cormode & Muthukrishnan 2005).

    The sketch is a d×w grid of counters (d=4, w=2048 → 8 k cells, ~64 KB)
    built in ONE map-side-combined shuffle of at most d·w rows, however
    large the corpus — the frequency analog of HLL's bounded state, and the
    100 TB path for "how often does each of these terms occur" when the
    full term distribution is too wide to shuffle. Estimate = min over the
    d counters a token hashes to; it NEVER undercounts, and overshoots
    ``2e·N/w`` with probability ≤ (2e)⁻ᵈ per query.

    Oracle strategy (module docstring): estimates are engine-specific, so
    the emitted columns are the exact per-token counts plus the
    never-undercounts boolean — a HARD guarantee (min over counters that
    each include the true count), safe for the oracle to assert TRUE on
    any fixture. The ε-overshoot bound is PROBABILISTIC (per-probe failure
    ~(2e)⁻ᵈ, hash-seed and fixture dependent), so it lives in
    ``cms_heavy_hitters_full`` and is asserted by the behavioral test
    (tests/test_audit_ops.py), not the differential — a fixture
    regeneration must not be able to fail a correct implementation. The
    heavy-hitter set uses a (count desc, token asc) total order on both
    engines, so the LIMIT window is deterministic across ties.
    """
    docs = fan_out(table(spark, sf_dir, "documents"))
    toks = docs.select(F.explode(tokens("text")).alias("tok"))
    cells = (
        toks.select(F.explode(_cms_cells(F.col("tok"))).alias("c"))
        .groupBy(F.col("c.d").alias("d"), F.col("c.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = (
        toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n_exact"))
        .orderBy(F.col("n_exact").desc(), F.col("tok").asc())
        .limit(_CMS_TOPK)
    )
    probes = top.select(
        "tok", "n_exact", F.explode(_cms_cells(F.col("tok"))).alias("c")
    ).select("tok", "n_exact", F.col("c.d").alias("d"), F.col("c.b").alias("b"))
    est = (
        cells.join(F.broadcast(probes), ["d", "b"])
        .groupBy("tok", "n_exact")
        .agg(F.min("cnt").alias("_est"))
    )
    total = toks.agg(F.count(F.lit(1)).alias("_n_total"))
    eps = 2.0 * math.e / _CMS_W
    return est.join(F.broadcast(total)).select(
        "tok",
        "n_exact",
        (F.col("_est") >= F.col("n_exact")).alias("cms_never_undercounts"),
        (F.col("_est") <= F.col("n_exact") + eps * F.col("_n_total"))
        .alias("cms_within_bound"),
    )


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-compared face of :func:`cms_heavy_hitters_full` — the exact
    counts plus the hard never-undercounts guarantee; the probabilistic
    ε-bound column stays behavior-test-only (see the full variant's
    docstring)."""
    return cms_heavy_hitters_full(spark, sf_dir).drop("cms_within_bound")


_CMS_SQL = f"""
SELECT tok, n_exact,
       TRUE AS cms_never_undercounts
FROM (
  SELECT t AS tok, CAST(COUNT(*) AS BIGINT) AS n_exact
  FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
  GROUP BY t
  ORDER BY n_exact DESC, tok ASC
  LIMIT {_CMS_TOPK}
)
"""


def hll_intersection_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch SET ALGEBRA: estimate the user overlap between two event
    types by inclusion-exclusion over HLL states —
    ``|A∩B| ≈ est(A) + est(B) − est(A∪B)`` — no raw-data join, just three
    kilobyte sketches. The audience-overlap question every dashboard asks,
    answered at 100 TB from pre-built per-segment sketches.

    Error note (docstring'd, contract-checked): inclusion-exclusion
    SUBTRACTS estimates, so relative error amplifies as the overlap
    shrinks relative to the union — the emitted contract bounds the
    ABSOLUTE error by a fraction of the union size (the quantity HLL
    actually controls), which is the honest guarantee. Exact counts ride
    along for the oracle's bit-exact columns.

    Oracle split (module discipline, same as the two CMS queries): the
    ``intersection_within_bound`` column is PROBABILISTIC — the 10%-of-
    union slack is 5–20× HLL's ~2% rsd so the flip risk per fixture
    regeneration is tiny, but it is not a hard guarantee, and a
    regeneration must not be able to fail a correct implementation in the
    differential. It therefore lives only in this full variant and is
    asserted by the behavioral test (tests/test_audit_ops.py); the
    registered ``q_hll_intersection`` emits only the bit-exact counts.
    """
    ev = table(spark, sf_dir, "events")
    a = ev.where(F.col("event_type") == "click")
    b = ev.where(F.col("event_type") == "purchase")
    sk = (
        a.select(F.col("user_id"))
        .agg(F.hll_sketch_agg("user_id").alias("_ska"))
        .crossJoin(b.agg(F.hll_sketch_agg("user_id").alias("_skb")))
    )
    est = sk.select(
        F.hll_sketch_estimate("_ska").alias("_ea"),
        F.hll_sketch_estimate("_skb").alias("_eb"),
        F.hll_sketch_estimate(
            F.hll_union("_ska", "_skb")
        ).alias("_eu"),
    )
    exact = (
        a.select("user_id").intersect(b.select("user_id")).agg(
            F.count(F.lit(1)).alias("n_overlap_exact")
        )
        .crossJoin(
            a.select("user_id").union(b.select("user_id")).distinct().agg(
                F.count(F.lit(1)).alias("n_union_exact")
            )
        )
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "n_overlap_exact",
        "n_union_exact",
        (
            F.abs((F.col("_ea") + F.col("_eb") - F.col("_eu"))
                  - F.col("n_overlap_exact"))
            <= F.greatest(0.1 * F.col("n_union_exact"), F.lit(3.0))
        ).alias("intersection_within_bound"),
    )


def q_hll_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-compared face of :func:`hll_intersection_full` — the
    bit-exact overlap/union counts only; the probabilistic
    ``intersection_within_bound`` stays behavior-test-only (see the full
    variant's docstring)."""
    return hll_intersection_full(spark, sf_dir).drop(
        "intersection_within_bound")


_HLL_INTERSECT_SQL = """
WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
SELECT
  (SELECT COUNT(*) FROM (SELECT user_id FROM a INTERSECT SELECT user_id FROM b))
    AS n_overlap_exact,
  (SELECT COUNT(*) FROM (SELECT user_id FROM a UNION SELECT user_id FROM b))
    AS n_union_exact
"""


def cms_join_size_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation from Count-Min sketch inner products
    (Cormode & Muthukrishnan 2005, §4.2) — the optimizer-style "how big
    would A ⋈ B be?" answered WITHOUT running the join. Each side is
    sketched into a d×w counter grid in one map-side-combined pass;
    ``est = min_d Σ_b cntA[d,b]·cntB[d,b]`` touches only the two 8 k-cell
    grids. The estimate NEVER undershoots (hash collisions only add
    cross-terms), and overshoots by at most ``2e·|A|·|B|/w`` per row with
    probability ≤ (2e)⁻ᵈ — the pre-flight check that tells you a join will
    explode before you shuffle 100 TB to find out.

    The two sides are the event stream split by event_id parity, joined on
    ``user_id`` — a genuinely multiplicity-on-both-sides join (join size =
    Σ_u cntA(u)·cntB(u), not a FK count). The exact size rides along for
    the oracle (computed from per-key counts, NOT by materializing the
    join). Contract split per the module docstring: never-underestimates
    is a hard guarantee and is oracle-compared; the ε-overshoot bound is
    probabilistic (hash-seed/fixture dependent — a regeneration could
    flip it on a correct implementation), so it is emitted only by this
    full variant and asserted in tests/test_audit_ops.py.

    Scale shape: the CMS path is two scans → two d×w-bounded
    map-side-combined aggregations — it never shuffles on the join key
    (that being the point); the grid-grid join is broadcast (both sides
    ≤ d·w rows by construction, any data scale). The exact baseline
    shuffles per-key COUNTS (|keys| rows, not |rows|), materialized once
    per side via lazy ``localCheckpoint`` so the size totals reuse them
    instead of replaying the event scans; at 100 TB you'd skip the
    baseline and trust the sketch.
    """
    ev = table(spark, sf_dir, "events")
    a = ev.where(F.col("event_id") % 2 == 0).select(
        F.col("user_id").cast("string").alias("k"))
    b = ev.where(F.col("event_id") % 2 == 1).select(
        F.col("user_id").cast("string").alias("k"))

    def grid(side: DataFrame) -> DataFrame:
        return (
            side.select(F.explode(_cms_cells(F.col("k"))).alias("c"))
            .groupBy(F.col("c.d").alias("d"), F.col("c.b").alias("b"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    est = (
        grid(a).withColumnRenamed("cnt", "ca")
        .join(F.broadcast(grid(b).withColumnRenamed("cnt", "cb")), ["d", "b"])
        .groupBy("d").agg(F.sum(F.col("ca") * F.col("cb")).alias("ip"))
        .agg(F.min("ip").alias("_est"))
    )
    ka = (a.groupBy("k").agg(F.count(F.lit(1)).alias("ca"))
          .localCheckpoint(eager=False))
    kb = (b.groupBy("k").agg(F.count(F.lit(1)).alias("cb"))
          .localCheckpoint(eager=False))
    exact = ka.join(kb, "k").agg(
        F.sum(F.col("ca") * F.col("cb")).cast("bigint").alias("exact_join_rows")
    )
    sizes = ka.agg(F.sum("ca").alias("_na")).crossJoin(
        kb.agg(F.sum("cb").alias("_nb")))
    eps = 2.0 * math.e / _CMS_W
    return exact.crossJoin(F.broadcast(est)).crossJoin(F.broadcast(sizes)).select(
        "exact_join_rows",
        (F.col("_est") >= F.col("exact_join_rows"))
        .alias("cms_never_underestimates"),
        # cast before the product: |A|·|B| in BIGINT would overflow long
        # before the double-domain bound does
        (F.col("_est") <= F.col("exact_join_rows")
         + eps * F.col("_na").cast("double") * F.col("_nb").cast("double"))
        .alias("cms_within_bound"),
    )


def q_cms_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-compared face of :func:`cms_join_size_full` — exact join
    size plus the hard never-underestimates guarantee; the probabilistic
    ε-bound column stays behavior-test-only."""
    return cms_join_size_full(spark, sf_dir).drop("cms_within_bound")


_CMS_JOIN_SQL = """
WITH a AS (SELECT user_id AS k FROM events WHERE event_id % 2 = 0),
b AS (SELECT user_id AS k FROM events WHERE event_id % 2 = 1),
ka AS (SELECT k, COUNT(*) AS ca FROM a GROUP BY 1),
kb AS (SELECT k, COUNT(*) AS cb FROM b GROUP BY 1)
SELECT CAST(SUM(ka.ca * kb.cb) AS BIGINT) AS exact_join_rows,
       TRUE AS cms_never_underestimates
FROM ka JOIN kb USING (k)
"""


# --------------------------------------------------------------------------
# quantile drift gate: GK-sketch deltas between two snapshots, exact-checked
# --------------------------------------------------------------------------

#: snapshot pivot: rows shipped before this date are the "old" snapshot
_DRIFT_PIVOT = "1998-07-01"
#: monitored quantiles, in ppm (p25 / p50 / p75 / p90)
_DRIFT_QS_PPM = (250_000, 500_000, 750_000, 900_000)
#: drift gate: flag a quantile that moved more than 2% between snapshots
_DRIFT_GATE_PPM = 20_000


def q_quantile_drift_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric-distribution drift gate at SKETCH cost: per monitored
    quantile (p25/p50/p75/p90), the exact type-1 quantile of
    ``l_extendedprice`` in two snapshots (shipped before/after
    ``_DRIFT_PIVOT``), the integer-ppm drift between them, the >2% gate
    decision, and the accuracy-contract booleans asserting the GK sketch
    (``percentile_approx``, the production one-pass path) lands within
    2% of each exact value. Completes `ks_split_drift` the way GK
    complements the exact counting medians: KS is the exact
    whole-distribution statistic; this is the per-quantile dashboard a
    pipeline runs every batch, with the sketch path VALIDATED against
    the exact path in the same relation.

    Integer-exact: values collapse to cents; the exact quantile is
    rank-based (smallest value whose running count reaches
    ``ceil(p·n)`` — no interpolation, engine-agnostic); ``drift_ppm =
    (10⁶·|q_new − q_old|) div q_old``. GK estimates are engine-specific,
    so per the module's oracle strategy they surface only through the
    within-bound booleans (GK returns an observed value with rank error
    ≤ n/1000, far inside 2% value error on this price distribution).

    Scale shape: one scan collapses to the |distinct cents| value
    domain with BOTH snapshot counts (map-side combine); cumulatives
    ride the two-phase distributed prefix sum on a coarse monotone
    value bucket — no global sort; the 4 rank targets broadcast into
    rank-lookup filters (the `exact_grouped_median` shape). The GK leg
    is one independent map-side-combined pass (bounded sketch state),
    exactly what it costs in production.
    """
    from tfm_taxitrips_spark.operators.prefix import two_phase_prefix_sums

    # stated contract (r13 star-table sweep finding): a row with a NULL
    # ship date cannot be assigned to a snapshot and a NULL price cannot
    # rank in a price quantile — both are excluded in BOTH engines
    # (previously the oracle's CASE ELSE silently counted NULL dates as
    # "new" while Spark's ~NULL dropped them — an accident either way)
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").isNotNull()
        & F.col("l_extendedprice").isNotNull())
    is_old = F.col("l_shipdate") < F.lit(_DRIFT_PIVOT).cast("timestamp")
    # value-domain collapse feeds the prefix sums (each reads its input
    # twice — operators/prefix.py caller contract) → lazy checkpoints at
    # every fan-out, the ks_split_drift discipline
    vals = (
        li.select(
            (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("bigint").alias("v"),
            is_old.alias("is_old"),
        )
        .groupBy("v")
        .agg(
            F.sum(F.when(F.col("is_old"), 1).otherwise(0))
            .cast("decimal(38,0)").alias("c_old"),
            F.sum(F.when(~F.col("is_old"), 1).otherwise(0))
            .cast("decimal(38,0)").alias("c_new"),
        )
        .withColumn("vb", F.expr("v div 1000000"))  # ~$10k monotone buckets
        .localCheckpoint(eager=False)
    )
    # BOTH cumulative counts ride ONE two-phase pass (r19, guide
    # §1.2/§2.4 — the ks_split_drift rewrite): stacked single-column
    # calls re-read their input twice each and forced a fence between
    # them; the multi form pays the bucket collapse, offset join, local
    # window and fence once, bit-identical per column.
    cum = two_phase_prefix_sums(
        vals, bucket_col="vb", order_cols=["v"],
        cols=[("c_old", "cum_old"), ("c_new", "cum_new")],
    ).localCheckpoint(eager=False)
    tot = cum.agg(
        F.sum("c_old").cast("decimal(38,0)").alias("n_old"),
        F.sum("c_new").cast("decimal(38,0)").alias("n_new"),
    )
    qs = spark.createDataFrame(
        [(i, p) for i, p in enumerate(_DRIFT_QS_PPM)], "pos int, q_ppm bigint"
    )
    # rank = ceil(p·n) in exact integers: (p_ppm·n + 999999) div 10⁶.
    # No fence (r19): the merged rank lookup below is now the ONLY
    # consumer — n_old/n_new ride through its aggregate.
    targets = qs.crossJoin(F.broadcast(tot)).select(
        "pos", "q_ppm", "n_old", "n_new",
        F.expr("(q_ppm * n_old + 999999) div 1000000").alias("r_old"),
        F.expr("(q_ppm * n_new + 999999) div 1000000").alias("r_new"),
    )
    # BOTH snapshots' rank lookups in ONE pass over cum (r19): the
    # filter keeps every row either lookup needs, conditional MINs split
    # them back out — same values as the old per-snapshot crossJoin +
    # groupBy pair, one pass and two joins fewer.
    looked = (
        cum.crossJoin(F.broadcast(targets))
        .where((F.col("cum_old") >= F.col("r_old"))
               | (F.col("cum_new") >= F.col("r_new")))
        .groupBy("pos", "q_ppm")
        .agg(
            F.max("n_old").alias("n_old"),
            F.max("n_new").alias("n_new"),
            F.min(F.when(F.col("cum_old") >= F.col("r_old"), F.col("v")))
            .alias("q_old_cents"),
            F.min(F.when(F.col("cum_new") >= F.col("r_new"), F.col("v")))
            .alias("q_new_cents"),
        )
    )
    # GK leg: one raw pass, nulls (other snapshot) ignored by the sketch
    ps = [p / 1_000_000 for p in _DRIFT_QS_PPM]
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("bigint")
    gk1 = li.select(cents.alias("v"), is_old.alias("is_old")).agg(
        F.percentile_approx(F.when(F.col("is_old"), F.col("v")), ps, 1000)
        .alias("go"),
        F.percentile_approx(F.when(~F.col("is_old"), F.col("v")), ps, 1000)
        .alias("gn"),
    )
    gk = gk1.select(
        F.posexplode(F.arrays_zip(F.col("go"), F.col("gn"))).alias("pos", "z")
    ).select("pos", F.col("z.go").alias("gk_old"), F.col("z.gn").alias("gk_new"))
    return (
        looked.join(F.broadcast(gk), "pos")
        .select(
            "q_ppm",
            F.col("n_old").cast("bigint").alias("n_old"),
            F.col("n_new").cast("bigint").alias("n_new"),
            "q_old_cents", "q_new_cents",
            F.expr(
                "CAST((1000000 * abs(q_new_cents - q_old_cents)) "
                "div q_old_cents AS BIGINT)"
            ).alias("drift_ppm"),
            F.expr(
                f"(1000000 * abs(q_new_cents - q_old_cents)) div q_old_cents"
                f" > {_DRIFT_GATE_PPM}"
            ).alias("drift_exceeds_2pct"),
            (F.abs(F.col("gk_old") - F.col("q_old_cents")) * 100
             <= F.col("q_old_cents") * 2).alias("gk_old_within_2pct"),
            (F.abs(F.col("gk_new") - F.col("q_new_cents")) * 100
             <= F.col("q_new_cents") * 2).alias("gk_new_within_2pct"),
        )
    )


_DRIFT_SQL = f"""
WITH c AS (
  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
         (l_shipdate < TIMESTAMP '{_DRIFT_PIVOT}') AS is_old
  FROM lineitem
  WHERE l_shipdate IS NOT NULL AND l_extendedprice IS NOT NULL
),
g AS (
  SELECT v,
         CAST(SUM(CASE WHEN is_old THEN 1 ELSE 0 END) AS HUGEINT) AS c_old,
         CAST(SUM(CASE WHEN is_old THEN 0 ELSE 1 END) AS HUGEINT) AS c_new
  FROM c GROUP BY 1
),
cum AS (
  SELECT v,
         SUM(c_old) OVER (ORDER BY v) AS cum_old,
         SUM(c_new) OVER (ORDER BY v) AS cum_new
  FROM g
),
t AS (SELECT SUM(c_old) AS n_old, SUM(c_new) AS n_new FROM g),
q AS (SELECT unnest({list(_DRIFT_QS_PPM)}) AS q_ppm),
tgt AS (
  SELECT q_ppm, n_old, n_new,
         (q_ppm * n_old + 999999) // 1000000 AS r_old,
         (q_ppm * n_new + 999999) // 1000000 AS r_new
  FROM q, t
),
qo AS (
  SELECT t.q_ppm, MIN(c.v) AS q_old_cents
  FROM tgt t JOIN cum c ON c.cum_old >= t.r_old GROUP BY 1
),
qn AS (
  SELECT t.q_ppm, MIN(c.v) AS q_new_cents
  FROM tgt t JOIN cum c ON c.cum_new >= t.r_new GROUP BY 1
)
SELECT CAST(t.q_ppm AS BIGINT) AS q_ppm,
       CAST(t.n_old AS BIGINT) AS n_old,
       CAST(t.n_new AS BIGINT) AS n_new,
       qo.q_old_cents, qn.q_new_cents,
       CAST((1000000 * abs(qn.q_new_cents - qo.q_old_cents))
            // qo.q_old_cents AS BIGINT) AS drift_ppm,
       ((1000000 * abs(qn.q_new_cents - qo.q_old_cents))
            // qo.q_old_cents) > {_DRIFT_GATE_PPM} AS drift_exceeds_2pct,
       TRUE AS gk_old_within_2pct,
       TRUE AS gk_new_within_2pct
FROM tgt t
JOIN qo ON qo.q_ppm = t.q_ppm
JOIN qn ON qn.q_ppm = t.q_ppm
"""


QUERIES: dict[str, QuerySpec] = {
    "cms_join_size_estimate": QuerySpec(
        q_cms_join_size, _CMS_JOIN_SQL, tags=("sketch", "cardinality")),
    "hll_distinct_bounds": QuerySpec(
        q_hll_distinct_bounds, _HLL_SQL, tags=("sketch", "A4")),
    "quantile_sketch_bounds": QuerySpec(
        q_quantile_sketch_bounds, _QUANTILE_SQL, tags=("sketch",)),
    "hll_partitioned_union": QuerySpec(
        q_hll_partitioned_union, _HLL_UNION_SQL, tags=("sketch", "merge", "A4")),
    "cms_heavy_hitters": QuerySpec(
        q_cms_heavy_hitters, _CMS_SQL, tags=("sketch", "heavy-hitters")),
    "hll_intersection_estimate": QuerySpec(
        q_hll_intersection, _HLL_INTERSECT_SQL, tags=("sketch", "set-algebra")),
    "quantile_drift_gate": QuerySpec(
        q_quantile_drift_gate, _DRIFT_SQL, tags=("sketch", "drift", "audit")),
}
