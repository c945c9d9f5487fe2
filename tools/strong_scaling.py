"""Strong-scaling experiment: fixed data (~sf1), growing core counts.

Replicates the scale smoke's ×10 dataset once, then times FIFTEEN plan
shapes (the docstring lists the first eleven; ``waterfill``,
``packreport``, ``srcoverlap`` and ``ttldedup`` are documented at their
``_shapes()`` entries) on fresh
``local[N]`` sessions for N in 4/8/16/32 and prints a speedup table
plus per-stage shuffle-write bytes per shape:

- ``flagship``  — fact⨝header shuffle join + broadcast dims + 6-key agg
  with countDistinct (the headline join+agg shape);
- ``rollup``    — one-pass 2-grouping-set rollup with per-level distinct
  counts (shuffle-heavy: the grouping-set expand multiplies shuffle
  rows, the shape most sensitive to data movement);
- ``minhash``   — MinHash signature → LSH banding → salted bucketed
  self-join over ``documents`` (iterative-flavored multi-stage text
  shape: explode/agg/bucket-join chain; replication duplicates every
  doc N×, so every LSH bucket guard is exercised);
- ``pagerank``  — fixed-iteration PageRank (truly iterative: per-round
  join + agg with localCheckpoint lineage truncation);
- ``stream``    — availableNow drain of the watermarked windowed
  rollup (stateful Structured Streaming; AQE off, fixed state-store
  partitioning);
- ``prefix``    — exact two-sample KS via the two-phase distributed
  prefix sum (``operators/prefix.py``): value-domain collapse, two
  nested prefix sums on coarse monotone buckets, broadcast extrema —
  the engine's signature sort-free cumulative rewrite (r7 verdict
  item #5: the one plan shape still missing a measured curve);
- ``leakage``   — pair-level train/eval contamination
  (round 9's flagship addition): shingle explode → distinct collapse →
  df-cap stop-list (broadcast anti-join) → bounded pair join — the
  shape every dedup/contamination operator in the repo shares, measured
  at its maximal admissible fan-out (copies ≤ LEAK_DF_CAP);
- ``topk``      — the end-to-end serving drain (update-mode rollup →
  foreachBatch key-merge upsert → date-partitioned parquet → top-k
  read): the r9 serving layout measured whole, on top of the
  micro-batch floor the ``stream`` shape isolates;
- ``pplx``      — the cross-domain LM quality matrix (round 10's
  flagship addition): one checkpointed train-side bigram collapse, eval
  side fanned ×|sources| through bigram-keyed hash joins;
- ``vocabrank`` — the de-serialized vocabulary ranker (round 10's
  histogram rewrite): corpus → frequency histogram → octave-bucketed
  prefix ranks, measured at a replication where the scan dominates
  (×600 — at ×40 the whole query is sub-second fixed overhead);
- ``novelty``   — corpus-order first-seen n-gram novelty (round 10):
  shingle explode → map-side-combined min(doc_id) first-seen collapse
  → 1-row-per-shingle equi-join back (output = input, provably linear
  with no df cap), measured at the adversarial ×100 every-doc-copied
  extreme where all join traffic scores zero novelty.

The point is measured evidence for SCALE.md: each plan parallelizes
with cores at fixed data (scale-UP here, the same property that scales
OUT across executors on a cluster), and its shuffle volume grows with
data, not with parallelism. (r5 verdict item #6 / r6 item #5 / r7
item #5 extended the covered shapes.)

Run: ``python tools/strong_scaling.py [copies] [shape,...]``
(default 10 ≈ sf1, all shapes).

Round 9 (r8 verdict optional item #7): only the tables the requested
shapes actually read are replicated (×800 of five tables for a
lineitem-only leg would be pure build cost), and large copy counts
replicate via a range cross-join instead of an N-way union (an 800-arm
union is an optimizer stress test, not a data generator) — enabling the
minute-scale ``prefix`` scan leg where the Gustafson structure shows in
the speedup curve itself, not only in the ×10-vs-×40 wall-clock ratio.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import urllib.request
from functools import reduce

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"
OFFSET = 100_000_000
# documents replicates like the fact tables (doc_id is pinned BIGINT);
# copy i keeps the same text → identical MinHash signature → N-wide LSH
# buckets, stressing the bounded-bucket guard exactly like a
# near-dup-heavy corpus would.
REPLICATED = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "documents": ["doc_id"],
    # events replicates with the SAME timestamps (copies offset only the
    # ids) — the event-time windows get 10x denser rather than longer,
    # which is what a higher ingest rate looks like to the streaming
    # rollup's watermarked state store
    "events": ["event_id", "user_id"],
}
PASSTHROUGH = ("region", "nation", "supplier", "part")
#: override to run a core subset (long legs chunked across invocations):
#: STRONGSCALE_CORES=4,8 python tools/strong_scaling.py ...
CORES = tuple(
    int(c) for c in os.environ.get("STRONGSCALE_CORES", "4,8,16,32").split(",")
)
REPS = 3

#: fact tables each shape reads (replication set when running a subset —
#: passthrough dims are always copied; they are KB-sized)
SHAPE_TABLES = {
    "flagship": ("lineitem", "orders", "customer"),
    "rollup": ("lineitem", "orders", "customer"),
    "minhash": ("documents",),
    "pagerank": ("events",),
    "stream": ("events",),
    "topk": ("events",),
    "prefix": ("lineitem",),
    "leakage": ("documents",),
    "pplx": ("documents",),
    "vocabrank": ("documents",),
    "novelty": ("documents",),
    "waterfill": ("documents",),
    "packreport": ("documents",),
    "srcoverlap": ("documents",),
    "ttldedup": ("events",),
    "srccontain": ("documents",),
    "debounce": ("events",),
    "packutil": ("documents",),
    "srcprune": ("documents",),
    "epaudit": ("events",),
    "blobsim": ("documents",),
    "encaudit": ("documents",),
    "boilstrip": ("documents",),
}

#: shapes whose stress can silently vanish under replication (the
#: leakage pair join collapses to zero output once the df-cap stop-list
#: absorbs every replicated shingle, at copies > LEAK_DF_CAP): assert
#: rows actually flowed once per leg, per the records-flowed rule the
#: ×10/×40 streaming smokes adopted in round 8
NONEMPTY_SHAPES = {"leakage", "blobsim"}


def build_dataset(copies: int, tables: tuple[str, ...] | None = None) -> str:
    from pyspark.sql import DataFrame, SparkSession
    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix="strongscale_")
    # driver.memory must be set on the FIRST session of the process — the
    # in-process JVM persists across spark.stop(), so later sessions
    # inherit this heap (a 1 g default OOMs the 16-thread leg at ~sf1)
    spark = (
        SparkSession.builder.master("local[16]").appName("strongscale-gen")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name, keys in REPLICATED.items():
        if tables is not None and name not in tables:
            continue
        src = spark.read.parquet(f"{SRC}/{name}.parquet")
        if copies > 64:
            # minute-scale legs: replicate via a range cross-join (one
            # 2-arm join plan) — an N-way union with per-arm projections
            # stresses the optimizer, not the shape under test. The
            # SOURCE is the streamed side at 64 partitions (the tiny
            # range broadcasts), so the 600x expansion parallelizes
            # instead of funneling through the source's 3 input splits.
            rep = src.repartition(64).crossJoin(F.broadcast(
                spark.range(copies).select(F.col("id").alias("_copy"))))
            for k in keys:
                rep = rep.withColumn(
                    k, F.col(k) + F.col("_copy") * F.lit(OFFSET))
            rep.drop("_copy").write.parquet(
                f"{out}/{name}.parquet", mode="overwrite")
        else:
            parts = []
            for i in range(copies):
                d = src
                for k in keys:
                    d = d.withColumn(k, F.col(k) + F.lit(i * OFFSET))
                parts.append(d)
            reduce(DataFrame.unionByName, parts).write.parquet(
                f"{out}/{name}.parquet", mode="overwrite")
    for name in PASSTHROUGH:
        spark.read.parquet(f"{SRC}/{name}.parquet").write.parquet(
            f"{out}/{name}.parquet", mode="overwrite")
    spark.stop()
    return out


def shuffle_write_bytes(spark) -> int:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app}/stages?status=complete"
    ) as r:
        stages = json.load(r)
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def _shapes() -> dict:
    from tfm_taxitrips_spark.queries.analytics import q_ks_split_drift
    from tfm_taxitrips_spark.queries.blobdedup import q_blob_dup_candidates
    from tfm_taxitrips_spark.queries.boilerq import q_boilerplate_strip
    from tfm_taxitrips_spark.queries.encoding import q_encoding_damage_audit
    from tfm_taxitrips_spark.queries.dataprep import (
        q_domain_mix_waterfill,
        q_label_leakage_audit,
        q_pack_waste_by_utilization,
        q_packing_efficiency_report,
        q_per_domain_perplexity_gate,
    )
    from tfm_taxitrips_spark.queries.graph import q_pagerank_fixed
    from tfm_taxitrips_spark.queries.streamq import (
        q_debounce_episode_audit,
        q_stream_dedup_debounce,
        q_stream_dedup_ttl,
    )
    from tfm_taxitrips_spark.queries.text import (
        q_source_ngram_containment_matrix,
        q_source_ngram_overlap_matrix,
        q_source_prune_plan,
    )
    from tfm_taxitrips_spark.queries.relational import (
        q_flagship_view,
        q_rollup_family,
    )
    from tfm_taxitrips_spark.queries.streamq import (
        q_stream_topk,
        q_stream_window_rollup,
    )
    from tfm_taxitrips_spark.queries.text import (
        q_minhash_lsh_candidates,
        q_ngram_novelty_rate,
        q_zipf_vocab_fit,
    )

    return {
        "flagship": q_flagship_view,
        "rollup": q_rollup_family,
        "minhash": q_minhash_lsh_candidates,
        # truly ITERATIVE shape: fixed-iteration PageRank re-joins the
        # rank frame against the cached edge list every round, with
        # periodic localCheckpoint lineage truncation — measures whether
        # per-iteration scheduling overhead (the cluster's per-stage
        # fixed cost) swamps the per-core speedup
        "pagerank": q_pagerank_fixed,
        # STREAMING stateful shape: the availableNow drain of the
        # watermarked windowed rollup (A5). AQE is off in streaming, the
        # state store partitioning is fixed at plan time, and the drain
        # pays micro-batch scheduling — the question this leg answers is
        # whether the streaming path still parallelizes with cores or is
        # serialized on the state store / sink
        "stream": q_stream_window_rollup,
        # PREFIX-SUM shape: replicated lineitem multiplies per-value
        # counts ~N× while the distinct-cents value domain stays fixed,
        # so the nested two-phase prefix sums run on a constant-size
        # collapsed relation — the leg measures whether the heavy part
        # (the raw scan + value-domain groupBy) parallelizes and the
        # bucket-window phase stays off the critical path
        "prefix": q_ks_split_drift,
        # SERVING-DRAIN shape (round 9): the full stream → update-mode
        # rollup → foreachBatch key-merge upsert → date-partitioned
        # parquet → top-k read pipeline, i.e. the r9 serving layout end
        # to end. Replicated events = N× denser windows over the same
        # calendar span, so every date partition is rewritten with N×
        # the rows — the drain measures whether the merge's batch jobs
        # scale with cores on top of the fixed micro-batch floor the
        # plain `stream` shape isolates.
        "topk": q_stream_topk,
        # BOUNDED-PAIR-JOIN shape (round 9): train/eval contamination at
        # the pair level. Replication makes every doc an exact copy with
        # a fresh doc_id, so each kept shingle's train document-frequency
        # is ~copies and the pair join fans out ~copies× per eval shingle
        # row — the maximal stress the LEAK_DF_CAP(64) admits. Run at
        # copies ≤ 64: beyond the cap the stop-list absorbs every
        # replicated shingle and the join output collapses to zero (the
        # guard working, but a vacuous measurement — NONEMPTY_SHAPES
        # pins that rows actually flowed).
        "leakage": q_label_leakage_audit,
        # CROSS-DOMAIN LM MATRIX shape (round 10): the train side
        # collapses once into the vocabulary-bounded bigram tables
        # (replication multiplies counts, never vocab), so the measured
        # axis is the eval side — every val-split doc's bigrams fan out
        # ×|sources| against broadcast model tables and hash-join on the
        # bigram key. Output is |sources|² rows at any replication
        # (structurally non-empty — no vacuousness risk).
        "pplx": q_per_domain_perplexity_gate,
        # HISTOGRAM-RANK shape (round 10): the de-serialized vocabulary
        # ranker. Replication multiplies every word's frequency ~N× while
        # the vocabulary (and so the histogram and octave relations) stays
        # fixed — the leg measures that the rewrite's critical path is the
        # parallel corpus explode+collapse, with the rank phase a
        # constant-size tail (the claim the r10 rewrite makes against the
        # old single-partition row_number).
        "vocabrank": q_zipf_vocab_fit,
        # FIRST-SEEN-JOIN shape (round 10): corpus-order novelty. The
        # claim under test is the NO-CAP linearity argument — the join's
        # right side is the 1-row-per-shingle min(doc_id) relation, so
        # output = input shingle rows at ANY duplication level (here
        # every shingle's first-seen doc is its lowest-id copy and all
        # other copies score zero novelty — maximal join traffic per
        # shingle with zero pair blowup, the adversarial case for an
        # uncapped join).
        "novelty": q_ngram_novelty_rate,
        # COLLAPSE-THEN-AGGREGATE-TAIL shape (round 12): water-filling
        # token allocation. Replication multiplies every source's token
        # mass ~N× while |sources| stays fixed, so the measured axis is
        # the ONE map-side-combined corpus groupBy — the rank window,
        # scalar totals, and k/P_k fold all run on the constant
        # |sources|-row aggregate and must stay off the critical path
        # (the same collapse shape kfold_label_balance_drift rides, so
        # this leg carries the claim for both r12 operators).
        "waterfill": q_domain_mix_waterfill,
        # FIXED-MODULUS WINDOW shape (round 12): the pack-utilization
        # report's prefix-sum window partitions on an 8-way hash shard —
        # a DELIBERATE parallelism cap this leg measures honestly: the
        # scan + token count + partial aggregation scale with cores, the
        # 8-partition window phase does not, so speedup should flatten
        # past 8 cores exactly as SCALE.md's "the shard modulus is the
        # scale knob" paragraph predicts (at 100 TB the modulus is set
        # to O(cluster cores); at fixture scale it is pinned to 8 for
        # oracle determinism).
        "packreport": q_packing_efficiency_report,
        # DISTINCT-COLLAPSE-DOMINATED shape (round 13): the source n-gram
        # overlap matrix. Replication multiplies shingle ROWS N× but the
        # distinct (source, hash60) set is replication-INVARIANT (copies
        # carry identical text), so the measured axis is the scan +
        # explode + map-side distinct collapse; the intersection
        # self-join and the |sources|² grid ride the collapsed set and
        # must stay off the critical path at any corpus size.
        "srcoverlap": q_source_ngram_overlap_matrix,
        # STATEFUL PYTHON-WORKER shape (round 13): the anchored-TTL
        # dedup drain. Replication offsets user ids, so state KEYS (and
        # Arrow batches into the pandas chain walk) grow N× while
        # per-key chains stay fixture-length — measures the
        # applyInPandasWithState hash shuffle + per-key Python work
        # scaling with cores, on top of the micro-batch floor the
        # ``stream`` shape isolates.
        "ttldedup": q_stream_dedup_ttl,
        # round-14 CONFIRMATION legs: each new operator inherits a
        # measured r13 shape; these legs measure the DELTA the twin adds
        # on the identical dataset, not a new curve family.
        #
        # srccontain = srcoverlap + the ordered mirror (a Union of two
        # projections of the aggregate-sized intersection) + the ordered
        # grid. If the mirror is really zero-shuffle, wall time and
        # shuffle volume must match srcoverlap's within noise.
        "srccontain": q_source_ngram_containment_matrix,
        # debounce = ttldedup with a refreshing anchor: same state size
        # (one bigint per key), same stateful hash shuffle, same pandas
        # walk length — the policy change must not change the curve.
        "debounce": q_stream_dedup_debounce,
        # packutil = packreport's window + per-pack collapse carrying
        # the waste columns too — same 8-shard window cap, one extra
        # aggregate-sized bucket exchange.
        "packutil": q_pack_waste_by_utilization,
        # round-15 CONFIRMATION legs (the r14 side-by-side discipline):
        #
        # srcprune CALLS the containment matrix and adds one map-side-
        # combined token-mass groupBy plus a window + broadcast join
        # over the |sources|² aggregate. Run side by side with
        # srccontain on the same dataset: the corpus-scale shuffle must
        # match the sibling's, the decision layer's delta is the tiny
        # mass-agg partials.
        "srcprune": q_source_prune_plan,
        # epaudit = the debounce policy's BATCH window form: ONE events
        # hash shuffle on user_id feeding the lag/episode windows, the
        # (user_id, ep) collapse reusing that partitioning, then
        # aggregate-sized tails. Side by side with the streaming
        # debounce drain: same key shuffle, but all-JVM (no Python
        # worker traffic, no micro-batch floor) — the leg quantifies
        # what the stateful API costs when the question is
        # retrospective, not live.
        "epaudit": q_debounce_episode_audit,
        # BLOB NEAR-DUP shape (round 17, staged family): in-row 60-bit
        # byte SimHash over every payload (the single heavy map pass —
        # ~210 windows × 60 vote adds per sf0.1 doc, zero shuffle), then
        # the LSH band equi-join + Hamming verify. Replication makes
        # every payload an exact copy under a fresh doc_id, so each band
        # bucket holds ~copies members and the pair join fans out
        # C(copies, 2)× per original doc — run at copies <= BAND_DF_CAP
        # (64): beyond it the bucket cap absorbs every replicated band
        # and the output collapses to zero (the guard working, but a
        # vacuous leg — NONEMPTY_SHAPES pins that rows flowed).
        "blobsim": q_blob_dup_candidates,
        # ENCODING-AUDIT shape (round 17, staged family): the purest
        # scan-shaped leg in the set — per-row replace-chain detectors
        # in whole-stage codegen feeding ONE map-side-combined
        # groupBy(source) that emits |sources| rows. The leg exists to
        # show the audit rides the scan: wall should track cores until
        # the fixed floor, and shuffle volume is per-source sums only
        # (KB-scale, flat in both cores AND data).
        "encaudit": q_encoding_damage_audit,
        # BOILERPLATE-STRIP shape (round 18 registration): the heaviest
        # member of the CCNet line family — planted-punctuation adapter
        # fused into the scan, ONE fenced explode lineage, flagged-set
        # marker join (AQE-broadcast), ONE per-doc rebuild aggregation.
        # Under replication every replicated line crosses min_docs, so
        # the flagged set grows to ~all distinct lines and the strip
        # removes everything — the leg stresses the rebuild agg with a
        # worst-case flagged join side; output stays |docs| rows by
        # construction (every doc keeps its row).
        "boilstrip": q_boilerplate_strip,
    }


def run_at(cores: int, data_dir: str, shape: str) -> tuple[float, int]:
    from pyspark.sql import SparkSession

    fn = _shapes()[shape]
    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"strongscale-{shape}-{cores}")
        .config("spark.sql.shuffle.partitions", str(max(cores, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "true")
        # normally inherited from build_dataset's first-session heap, but
        # a STRONGSCALE_DATA reuse run SKIPS the build — its first JVM
        # then came up on the 1 g default and the x100 legs OOMed in the
        # first aggregate (found measuring the novelty shape); setting it
        # here too is a no-op when the JVM already exists
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    if shape in NONEMPTY_SHAPES:
        n = fn(spark, data_dir).count()
        assert n > 0, (
            f"[{shape}] produced 0 rows at this replication — the leg is "
            "vacuous (for leakage: copies must stay <= LEAK_DF_CAP)"
        )
        print(f"[{shape}] local[{cores:>2}]: non-empty check — {n} rows",
              flush=True)
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn(spark, data_dir).write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
    sw = shuffle_write_bytes(spark)
    spark.stop()
    return min(times), sw


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    shapes = sys.argv[2].split(",") if len(sys.argv) > 2 else list(_shapes())
    tables = None
    if set(shapes) < set(SHAPE_TABLES):
        tables = tuple({t for s in shapes for t in SHAPE_TABLES[s]})
    # reuse a prior build (minute-scale legs chunk measurement across
    # invocations): STRONGSCALE_DATA=/tmp/strongscale_xyz
    data_dir = os.environ.get("STRONGSCALE_DATA")
    if data_dir:
        print(f"dataset: reusing {data_dir} (caller asserts {copies}x)")
    else:
        data_dir = build_dataset(copies, tables)
        print(f"dataset: {copies}x sf0.1 at {data_dir}"
              + (f" (tables: {','.join(tables)})" if tables else ""))
    for shape in shapes:
        rows = []
        for c in CORES:
            best, sw = run_at(c, data_dir, shape)
            rows.append((c, best, sw))
            print(f"[{shape}] local[{c:>2}]: best {best:6.2f} s   "
                  f"shuffle-write {sw/1e6:8.1f} MB (cumulative over reps)",
                  flush=True)
        base = rows[0][1]
        print(f"\n[{shape}] cores  time_s  speedup_vs_4")
        for c, t, _ in rows:
            print(f"{c:>5}  {t:6.2f}  {base / t:10.2f}x")
        print(flush=True)


if __name__ == "__main__":
    main()
