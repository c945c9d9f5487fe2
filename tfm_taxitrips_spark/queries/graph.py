"""Graph operators over the relational star: PageRank power iteration on
the customer–supplier interaction graph.

The reference has no graph surface (its five scripts are scan/join/agg
pipelines, /root/reference/TransformTaxiTrips.py:39-192); this family
extends the engine the same way the dedup/ANN families do — an iterative
algorithm a 100 TB training-data pipeline needs (influence scoring for
source weighting, seed selection for crawl frontiers), expressed as
DataFrame ops with an exact unrolled-CTE oracle.

Float discipline: the entire iteration runs in 64-bit integer micro-units
(rank × 1e6). Each edge contribution is ``(r*85) div (100*deg)`` — integer
multiply then integer floor-division, identical in Spark (``div``) and
DuckDB (``//``) on non-negative operands — and the per-node combine is an
integer SUM, order-independent under any shuffle. No float exists anywhere
in the lineage, so the driver's bit-exact hash compare holds by
construction (the same reason ``q_kmeans_fixed`` micro-quantizes its
means). Headroom: ranks are bounded by total mass ``1e6 × |V|``; at
``|V| = 1e9`` the pre-division product stays < 1e17 « 2^63.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tfm_taxitrips_spark.queries.registry import QuerySpec
from tfm_taxitrips_spark.sources.readers import table

PR_ITERS = 3        # fixed power iterations (unrolled in the oracle)
PR_DAMP_PCT = 85    # damping d = 0.85, carried as an integer percentage
PR_UNIT = 1_000_000  # rank micro-unit scale
PR_BASE = PR_UNIT * (100 - PR_DAMP_PCT) // 100  # (1-d) teleport mass


def _pr_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected customer–supplier edge list with disjoint node ids
    (customer → 2k, supplier → 2k+1). One distinct over the join output,
    then a union of both directions — every node therefore has degree ≥ 1
    and appears on both the src and dst side (no dangling mass)."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cs = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("u"),
            (F.col("l_suppkey") * 2 + 1).alias("v"),
        )
        .distinct()
    )
    return cs.selectExpr("u AS src", "v AS dst").unionByName(
        cs.selectExpr("v AS src", "u AS dst")
    )


def pagerank(
    spark: SparkSession,
    sf_dir: str,
    iters: int = PR_ITERS,
    truncate_every: int = 0,
    materialize_edges: bool = True,
) -> DataFrame:
    """Parameterized power-iteration loop behind ``q_pagerank_fixed``.

    The degree-annotated edge list is MATERIALIZED once (lazy
    ``localCheckpoint`` — the GraphX-style edge cache) before the loop:
    every iteration and the rank initialization then read the same
    computed partitions instead of replaying the scan→join→distinct
    lineage. Without this the static plan embeds the edge pipeline once
    per consumer — measured 8 lineitem scans for 3 iterations — which is
    exactly the plan you cannot ship against a 100 TB fact table (pinned:
    tests/test_graph.py asserts the source tables appear at most once in
    the default plan). ``materialize_edges=False`` keeps the pure-lineage
    form; results are bit-identical either way (integer lineage).

    Shape per iteration: ONE join (ranks onto the cached edge partitions)
    and ONE aggregation shuffle on ``dst`` with map-side combine over
    integer partial sums. Caveat the checkpoint cannot fix: a
    DataFrame-level checkpoint drops hash-partitioning METADATA, so the
    join still re-exchanges the (cheap, cached) edge rows each round. At
    100 TB — where |E| dominates — store the edge list BUCKETED by
    ``src`` instead and run :func:`pagerank_iterations` over it: the edge
    side then plans no exchange at all (pinned:
    tests/test_graph.py::test_pagerank_bucketed_edges_no_edge_exchange),
    leaving only the |V|-sized rank shuffle per round. Hub skew on
    ``dst`` is AQE-splittable (aggregation, not join — see SCALE.md
    §Joins for why the salt belongs on joins only).

    ``truncate_every=n`` localCheckpoints the rank frame every n
    iterations — same contract as :func:`~tfm_taxitrips_spark.queries.
    vectors.kmeans_clustering`: identical results, constant-size
    per-iteration plan instead of one that nests every prior round, AND
    (because the checkpoint is eager) the iterations execute as separate
    sequential jobs — without it Spark schedules every iteration's
    independent edge-side stages concurrently, so they contend for cores
    and read as task skew.
    """
    edges = _pr_edges(spark, sf_dir)
    # Degree via map-side-combined groupBy + join-back — NOT a count
    # window. A window partitions AND SORTS every edge row by src with no
    # skew mitigation available (AQE cannot split a window partition);
    # the aggregation form reduces hub rows map-side before they move,
    # and the join-back is AQE-skew-splittable (broadcast at small |V|).
    # Strictly less shuffled-and-sorted work on a hub-heavy graph — the
    # ~sf4 smoke's wall-time wobble on the window form prompted the look,
    # though the measured imbalance there was core contention (CPU-time
    # ratio ~1.6), not data skew; see the smoke's straggler-metric note.
    deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    )
    edges_deg = edges.join(deg, "src")
    if materialize_edges:
        edges_deg = edges_deg.localCheckpoint(eager=False)
    ranks = (
        edges_deg.select("src").distinct()
        .select(F.col("src").alias("node"),
                F.lit(PR_UNIT).cast("bigint").alias("r"))
    )
    ranks = pagerank_iterations(edges_deg, ranks, iters, truncate_every)
    return ranks.select(
        F.expr("node div 2").cast("bigint").alias("entity_id"),
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        F.col("r").alias("rank_micro"),
    )


def pagerank_iterations(
    edges_deg: DataFrame,
    ranks: DataFrame,
    iters: int,
    truncate_every: int = 0,
) -> DataFrame:
    """The power-iteration core over any degree-annotated edge frame
    (columns ``src``, ``dst``, ``deg``) and initial ranks (``node``,
    ``r``). Factored out so the 100 TB deployment shape — ``edges_deg``
    read from a table BUCKETED by ``src``, which removes the edge-side
    exchange from every iteration's join (pinned:
    tests/test_graph.py::test_pagerank_bucketed_edges_no_edge_exchange) —
    runs the identical loop."""
    for i in range(iters):
        contrib = edges_deg.join(
            ranks.withColumnRenamed("node", "src"), "src"
        ).select(
            "dst",
            F.expr(f"(r * {PR_DAMP_PCT}) div (100 * deg)").alias("c"),
        )
        ranks = (
            contrib.groupBy("dst")
            .agg(
                (F.lit(PR_BASE) + F.sum("c")).cast("bigint").alias("r")
            )
            .select(F.col("dst").alias("node"), "r")
        )
        if truncate_every and (i + 1) % truncate_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def q_pagerank_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank, 3 fixed power iterations, damping 0.85, over the
    undirected bipartite customer–supplier graph derived from
    lineitem ⋈ orders. Integer micro-unit arithmetic end to end (module
    docstring); the oracle unrolls the three rounds as CTEs.

    EAGER-ISH CONTRACT: runs with ``truncate_every=1`` — each iteration
    materializes its (|V|-row) rank frame as a sequential job when the
    DataFrame is BUILT, so calling this function executes iterations
    1..N-1 eagerly and the returned plan holds only the final round.
    That sequencing is what keeps the iterations from contending for
    cores (function docstring above); results are pinned bit-identical
    to the fully-lazy form."""
    return pagerank(spark, sf_dir, truncate_every=1)


def _pr_iter_sql(prev: str, out: str) -> str:
    return (
        f"{out} AS (\n"
        f"  SELECT e.dst AS node,\n"
        f"         CAST({PR_BASE} + SUM((r.r * {PR_DAMP_PCT})"
        f" // (100 * d.deg)) AS BIGINT) AS r\n"
        f"  FROM edges e\n"
        f"  JOIN deg d ON d.node = e.src\n"
        f"  JOIN {prev} r ON r.node = e.src\n"
        f"  GROUP BY e.dst\n"
        f")"
    )


_PAGERANK_SQL = f"""
WITH cs AS (
  SELECT DISTINCT o_custkey * 2 AS u, l_suppkey * 2 + 1 AS v
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
edges AS (
  SELECT u AS src, v AS dst FROM cs
  UNION ALL
  SELECT v AS src, u AS dst FROM cs
),
deg AS (
  SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY 1
),
r0 AS (
  SELECT node, CAST({PR_UNIT} AS BIGINT) AS r FROM deg
),
{_pr_iter_sql('r0', 'r1')},
{_pr_iter_sql('r1', 'r2')},
{_pr_iter_sql('r2', 'r3')}
SELECT CAST(node // 2 AS BIGINT) AS entity_id,
       CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
       r AS rank_micro
FROM r3
"""


#: Hub-context cap for the bipartite→co-supply projection. A part supplied
#: by d suppliers projects to C(d,2) edges, so the projection of the whole
#: table is Σ d(p)² — quadratic in hub parts, the same blow-up shape as the
#: ngram shingle join (queries/text.py NGRAM_DF_CAP). Dropping hub contexts
#: is the standard fix for co-occurrence graphs (a part everyone supplies
#: carries no affinity signal), and it bounds the projection to
#: C(cap,2) × |parts| — LINEAR in the part table. Mirrored in the oracle.
TRI_PART_CAP = 16


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts over an undirected simple edge list
    (columns ``a`` < ``b``, one row per edge) — degree-ordered enumeration
    (Suri & Vassilvitskii's MR orientation; public algorithm).

    Each undirected edge is ORIENTED from its lower-(degree, id) endpoint
    to the higher one. The orientation is acyclic and bounds every node's
    out-degree by O(√m) on any graph, so the wedge self-join below fans
    out O(m^1.5) total instead of Σ deg² — the difference between a plan
    that survives a power-law graph at 100 TB and one that funnels a hub's
    entire neighborhood through one join key. Every triangle then has
    exactly one vertex with two out-edges inside it (its minimum), so
    joining wedges (u→v, u→w) against the closing oriented edge (v→w)
    counts each triangle once — no /3 correction, no duplicate pairs.

    Shuffles: one degree aggregation (map-side combined), one join-back,
    the wedge self-join on ``src``, and the closing equi-join on
    ``(src, dst)`` — all hash joins on node keys, AQE-skew-splittable;
    no cartesian anywhere (pinned in tests/test_plans.py).

    r18 (guide §2.4/§3.3): two lazy ``localCheckpoint`` fences. The input
    edge list feeds THREE consumers (the degree union's two branches and
    the orientation join) and ``oriented`` feeds three more (both wedge
    sides and the closing edge), so the un-fenced plan replayed the whole
    upstream edge derivation — for `q_triangle_count` the lineitem
    projection + hub-cap anti-join + pair self-join + distinct — once per
    consumer (measured: 998 Exchange nodes in the sf0.1 plan, ~4.1 s).
    The fences compute each relation once; results are bit-identical
    (integer lineage, checkpoint is pure materialization).
    """
    edges = edges.localCheckpoint(eager=False)
    deg = (
        edges.select(F.col("a").alias("n")).unionByName(edges.select(F.col("b").alias("n")))
        .groupBy("n").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    ed = (
        edges
        .join(deg.select(F.col("n").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("n").alias("b"), F.col("d").alias("db")), "b")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = ed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dd"),
    ).localCheckpoint(eager=False)
    x, y = oriented.alias("x"), oriented.alias("y")
    lt = (F.col("x.dd") < F.col("y.dd")) | (
        (F.col("x.dd") == F.col("y.dd")) & (F.col("x.dst") < F.col("y.dst"))
    )
    wedges = x.join(y, (F.col("x.src") == F.col("y.src")) & lt).select(
        F.col("x.src").alias("u"), F.col("x.dst").alias("v"), F.col("y.dst").alias("w")
    )
    closing = oriented.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    tri = wedges.join(closing, ["v", "w"])
    nodes = (
        tri.select(F.col("u").alias("node"))
        .unionByName(tri.select(F.col("v").alias("node")))
        .unionByName(tri.select(F.col("w").alias("node")))
    )
    return nodes.groupBy("node").agg(F.count(F.lit(1)).cast("bigint").alias("tri_cnt"))


def _cosupply_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected (a < b) edges of the hub-capped co-supply graph —
    the ONE edge derivation shared by q_triangle_count and
    kcore_membership so a cap/dedup change can never de-synchronize
    the two graph operators."""
    ps = (
        table(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    hub = (
        ps.groupBy("p").agg(F.count(F.lit(1)).alias("d_p"))
        .where(F.col("d_p") > TRI_PART_CAP)
        .select("p")
    )
    kept = ps.join(F.broadcast(hub), "p", "left_anti")
    ka, kb = kept.alias("ka"), kept.alias("kb")
    return (
        ka.join(kb, (F.col("ka.p") == F.col("kb.p"))
                & (F.col("ka.s") < F.col("kb.s")))
        .select(F.col("ka.s").alias("a"), F.col("kb.s").alias("b"))
        .distinct()
    )


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier triangle counts on the co-supply graph: suppliers are
    adjacent iff they ship the same part (lineitem projection, hub parts
    with > TRI_PART_CAP distinct suppliers dropped — module constant).

    Triangle density is the classic community/cohesion signal a crawl- or
    source-weighting pipeline derives per entity; counts are exact
    integers, so the driver hash compare is bit-stable by construction.
    The oracle enumerates id-ordered triples (a < b < c) over the same
    capped edge set — a different, brute-force enumeration order that
    provably yields the identical triangle set, which is the point: the
    degree-oriented Spark plan is pure optimization, not semantics.
    """
    return triangle_counts(_cosupply_edges(spark, sf_dir)).select(
        F.col("node").alias("supp_id"), "tri_cnt"
    )


_TRIANGLE_SQL = f"""
WITH ps AS (
  SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
),
keep AS (
  SELECT p FROM ps GROUP BY p HAVING COUNT(*) <= {TRI_PART_CAP}
),
eg AS (
  SELECT DISTINCT a.s AS a, b.s AS b
  FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
  WHERE a.p IN (SELECT p FROM keep)
),
tri AS (
  SELECT e1.a AS a, e1.b AS b, e2.b AS c
  FROM eg e1
  JOIN eg e2 ON e2.a = e1.b
  JOIN eg e3 ON e3.a = e1.a AND e3.b = e2.b
),
nodes AS (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT node AS supp_id, CAST(COUNT(*) AS BIGINT) AS tri_cnt
FROM nodes GROUP BY node
"""


KCORE_K = 16      # degree floor
KCORE_ITERS = 4   # fixed peeling rounds (unrolled in the oracle)


def _cosupply_sym_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric (u, v) adjacency of the hub-capped co-supply graph —
    `_cosupply_edges` doubled for degree counting. The underlying edge
    list is fenced BEFORE the union (r18): the union's two branches are
    separate consumers, so without the inner fence the outer checkpoint's
    one materialization still executed the pair self-join + distinct
    twice."""
    eg = _cosupply_edges(spark, sf_dir).localCheckpoint(eager=False)
    return (
        eg.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionByName(eg.select(F.col("b").alias("u"), F.col("a").alias("v")))
        .localCheckpoint(eager=False)
    )


def q_kcore_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core after {KCORE_ITERS} peeling rounds on the co-supply graph:
    iteratively drop suppliers with fewer than {KCORE_K} co-supply
    neighbors, then report the survivors with their within-core degree —
    the cohesion filter that separates a dense supplier community from
    its periphery (the well-connectedness criterion crawl/source
    pipelines use above `pagerank`'s popularity and `triangle_count`'s
    local density).

    Fixed-iteration semantics (like `pagerank_fixed_iters`): "the core
    after N peels" is the defined result, identical in the unrolled-CTE
    oracle, so cross-engine equality is exact-integer by construction.
    At sf0.001 the 10-node co-supply graph is near-complete and the
    K={KCORE_K} core is empty — the discriminating fixture is sf0.01
    (83/100 suppliers survive), pinned in tests/test_graph.py.

    Scale shape: each peel is one map-side-combined degree count plus two
    semi-joins keyed on the node id (AQE-splittable); the edge list is
    checkpointed once and only SHRINKS per round, so per-iteration cost
    is bounded by the first. No windows, no sorts, no cartesian.

    r18 (guide §2.4): each round's survivor frame is fenced with a lazy
    ``localCheckpoint``. The un-fenced loop embedded round i's lineage
    TWICE in round i+1 (under the degree count and under the semi-join
    probe), so the final plan held ~2^N replays of the adjacency scan
    (measured: 322 Exchange nodes at sf0.1); the fences make the plan
    linear in N. Same truncate-per-iteration contract as
    ``pagerank(truncate_every=1)``; results are bit-identical.
    """
    sym = _cosupply_sym_edges(spark, sf_dir)
    surv = sym
    for _ in range(KCORE_ITERS):
        deg = surv.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
        keep = deg.where(F.col("d") >= KCORE_K).select("u")
        surv = (
            surv.join(keep, "u", "left_semi")
            .join(keep.withColumnRenamed("u", "v"), "v", "left_semi")
            .localCheckpoint(eager=False)
        )
    return (
        surv.groupBy("u")
        .agg(F.count(F.lit(1)).cast("bigint").alias("core_degree"))
        .where(F.col("core_degree") >= KCORE_K)
        .select(F.col("u").alias("supp_id"), "core_degree")
    )


def _kcore_sql() -> str:
    s = f"""
WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
keep AS (SELECT p FROM ps GROUP BY p HAVING COUNT(*) <= {TRI_PART_CAP}),
eg AS (
  SELECT DISTINCT a.s AS a, b.s AS b
  FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
  WHERE a.p IN (SELECT p FROM keep)
),
sym0 AS (SELECT a AS u, b AS v FROM eg UNION ALL SELECT b, a FROM eg)"""
    prev = "sym0"
    for i in range(1, KCORE_ITERS + 1):
        s += f""",
deg{i} AS (SELECT u, COUNT(*) AS d FROM {prev} GROUP BY u),
keepn{i} AS (SELECT u FROM deg{i} WHERE d >= {KCORE_K}),
sym{i} AS (
  SELECT s.u, s.v FROM {prev} s
  WHERE s.u IN (SELECT u FROM keepn{i})
    AND s.v IN (SELECT u FROM keepn{i})
)"""
        prev = f"sym{i}"
    s += f"""
SELECT u AS supp_id, CAST(COUNT(*) AS BIGINT) AS core_degree
FROM {prev} GROUP BY 1 HAVING COUNT(*) >= {KCORE_K}"""
    return s


QUERIES: dict[str, QuerySpec] = {
    "pagerank_fixed_iters": QuerySpec(
        q_pagerank_fixed, _PAGERANK_SQL,
        tags=("graph", "iterative", "pipeline"),
    ),
    "triangle_count": QuerySpec(
        q_triangle_count, _TRIANGLE_SQL,
        tags=("graph", "pipeline"),
    ),
    "kcore_membership": QuerySpec(
        q_kcore_membership, _kcore_sql(),
        tags=("graph", "iterative", "pipeline"),
    ),
}
