"""Opt-in ~sf1 scale smoke (round-3 verdict item #6).

local[32] at sf0.1 hides two failure classes the 100 TB deployment would
hit: driver-side pathologies (plan blowup, collect-sized state) and task
skew (one straggler task dominating a stage). This module replicates the
sf0.1 fixtures 10× with key offsets into a throwaway dir (~sf1: ~6M
lineitem rows, 10-way-duplicated documents — deliberately adversarial for
the LSH bucket paths, which must salt) and runs the five most expensive
headline queries, asserting:

1. completion — every query materializes through the noop sink;
2. no straggler — for every completed stage of substance (max task
   executorRunTime ≥ 500 ms and ≥ 4 tasks), the MAX task runtime is
   ≤ 4× the MEDIAN task runtime (pulled from Spark's own REST API task
   summaries).

Opt-in because it takes minutes, not seconds:

    SPARK_GRAFT_SCALE_SMOKE=1 python -m pytest tests/test_scale_smoke.py -q

Run it standalone (its own pytest invocation) — it builds its OWN
UI-enabled SparkSession, which must not race the shared test session.
"""

from __future__ import annotations

import json
import os
import urllib.request
from functools import reduce

import pytest

SCALE_OPT_IN = os.environ.get("SPARK_GRAFT_SCALE_SMOKE")

pytestmark = pytest.mark.skipif(
    not SCALE_OPT_IN, reason="opt-in: set SPARK_GRAFT_SCALE_SMOKE=1"
)

SRC = "/root/testdata/sf0.1"
#: replication factor: 10 → ~sf1 (default). Raise via env for deeper
#: one-off validations (e.g. SPARK_GRAFT_SCALE_COPIES=40 → ~sf4; r4 ran
#: both green, see ROUND4_NOTES).
COPIES = int(os.environ.get("SPARK_GRAFT_SCALE_COPIES", "10"))
OFFSET = 100_000_000  # > any source key; keeps replicated keys disjoint

#: table -> key columns that get the per-copy offset (so joins stay
#: referentially intact within each copy and copies never collide)
REPLICATED = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
#: dims stay single-copy (broadcast-sized at any scale)
PASSTHROUGH = ("region", "nation", "supplier", "part")

HEADLINE = (
    "flagship_view",
    "rollup_family",
    "minhash_lsh_candidates",
    "ann_lsh",
    "stream_window_rollup",
    # round-4 additions with real scale surface: replicated embeddings
    # push IVF cells ~10x past LSH_MAX_BUCKET (salting must engage), and
    # the replicated graph grows edges ~10x for the iterative path
    "semantic_dedup_prune",
    "pagerank_fixed_iters",
    # late-round-4 additions: the basket pair self-join (replication
    # multiplies baskets, the cap must keep pair output linear) and the
    # densified-grid pair join behind the correlation matrix
    "copurchase_lift",
    "type_correlation",
    # two-phase prefix-sum ops: replication grows each source's doc list
    # and each day's boundary list ~10x — the heavy windows must stay on
    # their (source, range) / day split, not a global sort
    "token_budget_mix",
    "concurrency_profile",
    # round-5 broadcast-policy change: customer (REPLICATED) lost its hard
    # broadcast hint, so the optimizer now sizes the join from the scan
    # statistics. Measured (x80 one-off): the estimate is post-pruning —
    # a 19 MB customer file projects 2 of 8 columns to ~4 MB, still under
    # the 10 MB threshold, so it rightly keeps broadcasting far past the
    # file-size crossing; the threshold-disabled plan test proves the
    # fallback mechanism. This entry keeps the hint-free form in the
    # replicated-scale straggler gate.
    "running_revenue",
    # round-7 addition: replication multiplies every (source, word) count
    # ~10x and the duplicated docs keep the vocabulary fixed — the pair
    # join's fan-out must stay bounded by |sources|^2 and the tokenization
    # pass must run ONCE (lazy localCheckpoint), not per consumer
    "source_token_tvd",
    # round-7 prefix-sum addition: replicated lineitem repeats the same
    # prices, so the distinct-cents value domain stays FIXED while per-
    # value counts grow ~10x — the two-phase prefix sum must keep its
    # windows on the (bucket, value) split and the four lazy
    # localCheckpoints must hold the scan to one pass (without them the
    # fan-out re-executes the scan 16x, which at this scale reads as a
    # multi-minute stall, not a subtle slowdown)
    "ks_split_drift",
    # round-9 serving-layout change: the top-k serving table now
    # partitions by window DATE with a key-merge upsert. Replicated
    # events keep the SAME timestamps (ids offset only), so x10 means
    # 10x denser windows over the same calendar span — the availableNow
    # bootstrap must stay bounded by the date count, and the merge must
    # stay aggregate-sized, not fan out per (window, type) key
    "stream_topk",
    # round-10 addition: the cross-domain LM matrix. Replication grows
    # BOTH splits ~10x (fresh doc_ids re-hash into train/val) while the
    # vocabulary stays fixed, so the bigram model tables saturate and the
    # eval side's x|sources| fan-out is the measured axis — the scoring
    # joins must stay bigram-keyed hash joins off the single checkpointed
    # train collapse, never a re-scan per model relation
    "per_domain_perplexity_gate",
)

STRAGGLER_FACTOR = 4.0
MIN_TASKS = 4
MIN_MAX_RUNTIME_MS = 500.0


@pytest.fixture(scope="module")
def scale_spark():
    from tfm_taxitrips_spark.session import get_spark

    s = get_spark(
        app_name="tfm-taxitrips-scale-smoke",
        master="local[8]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "true"},
    )
    yield s


@pytest.fixture(scope="module", autouse=True)
def _warm(scale_spark):
    """JIT/page-cache warmup at the SOURCE scale before anything is
    measured: without it the first measured query pays whole-stage-codegen
    compilation inside its first tasks, which reads as a >4x 'straggler'
    that is really cold-start skew (observed once at 40x: flagship flagged
    in a cold session, clean when re-run warm)."""
    from tfm_taxitrips_spark.queries.registry import all_queries

    qs = all_queries()
    for name in HEADLINE:
        qs[name].fn(scale_spark, SRC).write.format("noop").mode(
            "overwrite"
        ).save()


@pytest.fixture(scope="module")
def scale_dir(scale_spark, tmp_path_factory):
    from pyspark.sql import DataFrame
    from pyspark.sql import functions as F

    out = str(tmp_path_factory.mktemp("sfscale"))
    for name, keys in REPLICATED.items():
        src = scale_spark.read.parquet(f"{SRC}/{name}.parquet")
        parts = []
        for i in range(COPIES):
            d = src
            for k in keys:
                d = d.withColumn(k, F.col(k) + F.lit(i * OFFSET))
            parts.append(d)
        reduce(DataFrame.unionByName, parts).write.parquet(
            f"{out}/{name}.parquet", mode="overwrite"
        )
    for name in PASSTHROUGH:
        scale_spark.read.parquet(f"{SRC}/{name}.parquet").write.parquet(
            f"{out}/{name}.parquet", mode="overwrite"
        )
    return out


def _api(scale_spark, path: str):
    base = scale_spark.sparkContext.uiWebUrl
    app = scale_spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}") as r:
        return json.load(r)


def _completed_stage_ids(scale_spark) -> set[int]:
    return {
        s["stageId"] for s in _api(scale_spark, "/stages?status=complete")
    }


def _assert_no_stragglers(scale_spark, new_stages: set[int], label: str):
    flagged, skipped = [], []
    for sid in sorted(new_stages):
        try:
            # use the LATEST completed attempt, not a hardcoded attempt 0 —
            # a retried stage's attempt 0 is dead and would hide real skew
            attempts = _api(scale_spark, f"/stages/{sid}")
            done = [a for a in attempts if a.get("status") == "COMPLETE"]
            if not done:
                continue
            att = max(a["attemptId"] for a in done)
            summary = _api(
                scale_spark,
                f"/stages/{sid}/{att}/taskSummary?quantiles=0.5,1.0",
            )
            stage = _api(scale_spark, f"/stages/{sid}/{att}")
        except Exception:
            skipped.append(sid)  # evicted from the UI store
            continue
        if stage.get("numCompleteTasks", 0) < MIN_TASKS:
            continue
        med_wall, mx_wall = summary["executorRunTime"]
        if mx_wall < MIN_MAX_RUNTIME_MS:
            continue  # sub-500ms stages are scheduler noise, not skew
        # Skew = WORK imbalance, so the ratio is taken on executorCpuTime
        # (ns), not wall time: on local[8] several independent stages of
        # one query run concurrently and oversubscribe the cores, so a
        # descheduled task's WALL time reads 10x its siblings while its
        # CPU time is ordinary (measured on pagerank at x40: flagged
        # stage max wall 4330ms vs median 457ms, but max CPU 453ms vs
        # median 284ms — scheduling wait, not work). A data-skewed task
        # does proportionally more WORK and shows it in CPU time. Trade:
        # purely IO-bound reducer skew would be invisible here; at this
        # smoke's scale every heavy stage is codegen-CPU-bound, so CPU is
        # the faithful signal.
        med, mx = summary["executorCpuTime"]
        med, mx = med / 1e6, mx / 1e6  # ns → ms
        if med > 0 and mx > STRAGGLER_FACTOR * med:
            flagged.append(f"{label} stage {sid}: max cpu {mx:.0f}ms > "
                           f"{STRAGGLER_FACTOR}x median {med:.0f}ms")
    assert not flagged, "\n".join(flagged)
    # an entirely-unreadable run must not pass vacuously
    assert len(skipped) < max(1, len(new_stages)), (
        f"{label}: all {len(new_stages)} stages unreadable from the UI API"
    )


def _assert_data_flowed(scale_spark, new_stages: set[int], label: str):
    """Vacuousness guard: a query whose source resolves to ZERO files
    (round-8 finding: the stream reader's pathGlobFilter matched leaf
    file names only, so directory-form events tables streamed empty)
    completes, writes an empty sink, and sails through the straggler
    gate — its stages just have no records. Require that SOME new stage
    actually read data at the replicated scale."""
    total = 0
    for s in _api(scale_spark, "/stages?status=complete"):
        if s["stageId"] in new_stages:
            total += s.get("inputRecords", 0) + s.get("shuffleReadRecords", 0)
    assert total > 0, (
        f"{label}: no records flowed through any of its {len(new_stages)} "
        "stages — the source resolved to nothing (vacuous pass)"
    )


@pytest.mark.parametrize("name", HEADLINE)
def test_headline_completes_without_stragglers(scale_spark, scale_dir, name):
    from tfm_taxitrips_spark.queries.registry import all_queries

    spec = all_queries()[name]
    before = _completed_stage_ids(scale_spark)
    spec.fn(scale_spark, scale_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    after = _completed_stage_ids(scale_spark)
    _assert_data_flowed(scale_spark, after - before, name)
    _assert_no_stragglers(scale_spark, after - before, name)
