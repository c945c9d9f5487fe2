"""Graph-family tests: PageRank invariants, lineage truncation, plan shape.

The bit-exact Spark-vs-DuckDB agreement is covered by the registry-wide
differential sweep (tests/test_differential.py); these pin the properties
that make the operator safe to scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tfm_taxitrips_spark.plans.explain import explain_formatted
from tfm_taxitrips_spark.queries.graph import (
    PR_BASE,
    PR_UNIT,
    _pr_edges,
    pagerank,
    q_pagerank_fixed,
)


def test_pagerank_mass_bounds(spark, sf_smoke):
    """Integer floor-division only LOSES mass: every node stays within
    [teleport base, total initial mass]; the total never grows."""
    ranks = q_pagerank_fixed(spark, sf_smoke)
    stats = ranks.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rank_micro").alias("total"),
        F.min("rank_micro").alias("mn"),
    ).collect()[0]
    assert stats["mn"] >= PR_BASE
    assert stats["total"] <= stats["n"] * PR_UNIT
    # damping redistributes, never zeroes: total stays above teleport floor
    assert stats["total"] >= stats["n"] * PR_BASE


def test_pagerank_node_universe_stable(spark, sf_smoke):
    """Every graph node gets a rank every iteration (undirected edges ⇒
    no dangling loss of rows)."""
    n_nodes = _pr_edges(spark, sf_smoke).select("src").distinct().count()
    assert q_pagerank_fixed(spark, sf_smoke).count() == n_nodes


def test_pagerank_truncation_bit_identical(spark, sf_smoke):
    """localCheckpoint lineage truncation (rank frame) and the edge-cache
    toggle change the plan, never the integers (same contract as
    kmeans_clustering's truncate_every)."""
    base = {
        (r["entity_id"], r["node_type"]): r["rank_micro"]
        for r in pagerank(spark, sf_smoke, iters=3).collect()
    }
    trunc = {
        (r["entity_id"], r["node_type"]): r["rank_micro"]
        for r in pagerank(spark, sf_smoke, iters=3, truncate_every=1).collect()
    }
    pure = {
        (r["entity_id"], r["node_type"]): r["rank_micro"]
        for r in pagerank(
            spark, sf_smoke, iters=3, materialize_edges=False
        ).collect()
    }
    assert base == trunc == pure


def test_pagerank_plan_no_cartesian_integer_lineage(spark, sf_smoke):
    # the fully-lazy loop (the plan-shape surface; the registered form
    # sequences iterations eagerly and returns only the final projection)
    plan = explain_formatted(pagerank(spark, sf_smoke))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # per-node combine must partially aggregate before each dst shuffle
    assert plan.count("HashAggregate") >= 2
    # rank column is integral end to end — no float cast anywhere
    assert q_pagerank_fixed(spark, sf_smoke).schema["rank_micro"].dataType.simpleString() == "bigint"


def test_pagerank_edge_pipeline_materialized_once(spark, sf_smoke):
    """The edge cache must hide the scan→join→distinct lineage from the
    iteration consumers: without it the static plan embeds 8 lineitem
    scans for 3 iterations (measured) — unshippable against a 100 TB
    fact table."""
    plan = explain_formatted(pagerank(spark, sf_smoke))
    assert plan.count("lineitem.parquet") <= 1
    assert plan.count("orders.parquet") <= 1
    # the pure-lineage form really is the shape being guarded against
    pure = explain_formatted(
        pagerank(spark, sf_smoke, materialize_edges=False)
    )
    assert pure.count("lineitem.parquet") > 1


def test_pagerank_bucketed_edges_no_edge_exchange(spark, sf_smoke, tmp_path):
    """The 100 TB deployment shape: the degree-annotated edge list lives
    in a table BUCKETED by src, so every iteration's rank join reads it
    co-located — the edge side of the join must plan NO exchange (the
    only shuffles are the small rank side and the dst aggregation)."""
    import re

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from tfm_taxitrips_spark.operators.bucketing import write_bucketed
    from tfm_taxitrips_spark.queries.graph import (
        PR_UNIT,
        _pr_edges,
        pagerank_iterations,
    )

    edges = _pr_edges(spark, sf_smoke)
    edges_deg = edges.select(
        "src", "dst",
        F.count(F.lit(1)).over(Window.partitionBy("src"))
        .cast("bigint").alias("deg"),
    )
    write_bucketed(
        edges_deg, "pr_edges_bkt", ["src"], 8, path=str(tmp_path / "edges")
    )
    try:
        bkt = spark.table("pr_edges_bkt")
        ranks = bkt.select("src").distinct().select(
            F.col("src").alias("node"),
            F.lit(PR_UNIT).cast("bigint").alias("r"),
        )
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            out = pagerank_iterations(bkt, ranks, iters=1)
            plan = explain_formatted(out)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        # the bucketed scan side must sit under the join WITHOUT an
        # exchange: every Exchange in the plan keys on node/dst lineage,
        # never re-shuffling the bucketed edge columns
        join_tree = plan.split("SortMergeJoin")[1] if "SortMergeJoin" in plan else plan
        assert "Scan parquet" in plan  # bucketed table scan present
        # count exchanges: rank-side sort-merge prep + dst aggregation =
        # at most 2; an edge-side exchange would make it 3
        assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 2, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS pr_edges_bkt")


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "a bigint, b bigint"
    )


def test_triangle_counts_known_graph(spark):
    """K4 ∪ pendant edge: K4 has C(4,3)=4 triangles, each K4 node sits in
    3 of them; the pendant node closes nothing and must not appear."""
    from tfm_taxitrips_spark.queries.graph import triangle_counts

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    out = {
        r["node"]: r["tri_cnt"]
        for r in triangle_counts(_edges_df(spark, k4 + [(4, 5)])).collect()
    }
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_star_is_triangle_free(spark):
    """A star (one hub, leaves only) has wedges everywhere but zero
    triangles — the closing-edge join must yield nothing, and the hub's
    huge wedge set must not fabricate counts."""
    from tfm_taxitrips_spark.queries.graph import triangle_counts

    star = [(0, i) for i in range(1, 30)]
    assert triangle_counts(_edges_df(spark, star)).count() == 0


def test_triangle_orientation_counts_each_once(spark):
    """Degree-tied cycle C5 (every deg=2): orientation falls back to id
    order and must still count the 0 triangles of C5 and the 1 triangle
    of C3 exactly once each."""
    from tfm_taxitrips_spark.queries.graph import triangle_counts

    c5 = [(1, 2), (2, 3), (3, 4), (4, 5), (1, 5)]
    assert triangle_counts(_edges_df(spark, c5)).count() == 0
    c3 = [(7, 8), (8, 9), (7, 9)]
    out = {r["node"]: r["tri_cnt"] for r in triangle_counts(_edges_df(spark, c3)).collect()}
    assert out == {7: 1, 8: 1, 9: 1}


def test_triangle_plan_no_cartesian_hub_cap_broadcast(spark, sf_smoke):
    """The registered co-supply form: hub-part anti-join broadcasts (the
    over-cap set is Zipf-head-bounded), and nothing in the plan degenerates
    to a cartesian/BNLJ — every triangle join is an equi hash join.

    r18: the edge list and the oriented edges are localCheckpoint-fenced
    inside ``triangle_counts`` (each feeds 3 consumers), so the hub-cap
    anti-join pins move to the edge-derivation component plan and the
    final plan is pinned on the fence plus equi-joins only."""
    from tfm_taxitrips_spark.queries.graph import (
        _cosupply_edges,
        q_triangle_count,
    )

    edge_plan = explain_formatted(_cosupply_edges(spark, sf_smoke))
    assert "CartesianProduct" not in edge_plan
    assert "BroadcastNestedLoopJoin" not in edge_plan
    assert "BroadcastHashJoin" in edge_plan  # the hub-cap anti-join
    assert edge_plan.count("LeftAnti") >= 1

    plan = explain_formatted(q_triangle_count(spark, sf_smoke))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Scan ExistingRDD" in plan  # the r18 checkpoint fences


def test_kcore_discriminates_and_is_fixpoint_consistent(spark, sf_correct):
    """At sf0.01 the K=16 core keeps a proper nonempty subset of
    suppliers, every survivor's within-core degree honors the floor, and
    replaying the peeling sequentially over the collected edge set gives
    the same membership."""
    from tfm_taxitrips_spark.queries.graph import (
        KCORE_ITERS,
        KCORE_K,
        _cosupply_sym_edges,
        q_kcore_membership,
    )

    rows = q_kcore_membership(spark, sf_correct).collect()
    assert rows
    got = {r.supp_id: r.core_degree for r in rows}
    assert all(d >= KCORE_K for d in got.values())

    sym = {(r.u, r.v) for r in _cosupply_sym_edges(spark, sf_correct).collect()}
    all_nodes = {u for u, _ in sym}
    assert set(got) < all_nodes  # proper subset: peeling dropped someone
    for _ in range(KCORE_ITERS):
        from collections import Counter
        deg = Counter(u for u, _ in sym)
        keep = {u for u, d in deg.items() if d >= KCORE_K}
        sym = {(u, v) for u, v in sym if u in keep and v in keep}
    from collections import Counter
    deg = Counter(u for u, _ in sym)
    assert {u: d for u, d in deg.items() if d >= KCORE_K} == got
