"""Structured-Streaming pipelines (SURVEY.md §2.9, §2.6 A5).

The reference delegates its real-time rollup to Druid
(/root/reference/druid/kafkaIngestionTaxiTrips.json:42-87); here the engine
owns it natively: watermarked event-time windows over a streaming source.

``run_to_memory`` drains a streaming DataFrame with ``availableNow`` into a
memory sink and returns the result as a batch DataFrame — the test/backfill
path (production uses the kafka/parquet sinks in ``sinks.writers``).
"""

from __future__ import annotations

import os
import shutil
import threading
import uuid
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tfm_taxitrips_spark.functions.aggregates import dsum

#: serializes the scoped shuffle-partition override below: the override
#: mutates a SESSION-global conf, so two concurrent drains (a threaded
#: bench, a parallel test plugin) would otherwise race it and silently
#: plan each other's queries with the wrong partition count
_SHUFFLE_SCOPE_LOCK = threading.Lock()


@contextmanager
def _scoped_shuffle_partitions(spark: SparkSession, n: int | None):
    """Temporarily set ``spark.sql.shuffle.partitions`` for one streaming
    drain (r8 verdict advisory #1 / ADVICE r8). ``None`` = no override.

    What the guard does and does not close: the non-blocking lock turns
    the silent-plan-degradation race between two concurrent DRAINS in
    this process into a loud error. A concurrent BATCH plan built on the
    same session from another thread while a drain holds the override is
    still exposed — the conf is session-global by Spark's design — which
    is why the invariant stays documented at every call seam: one
    planning query at a time per session; full isolation requires
    ``SparkSession.newSession()`` per drain (not the default because the
    memory-sink result table registers in the session that reads it).
    """
    if n is None:
        yield
        return
    if not _SHUFFLE_SCOPE_LOCK.acquire(blocking=False):
        raise RuntimeError(
            "concurrent scoped shuffle-partition overrides on one session: "
            "a drain holding the override is already in flight — serialize "
            "drains, or isolate with SparkSession.newSession() per drain"
        )
    try:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
        try:
            yield
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    finally:
        _SHUFFLE_SCOPE_LOCK.release()


def _path_is_directory(spark: SparkSession, path: str) -> bool:
    """Layout-resolve ``path`` through the Hadoop FileSystem API, so the
    answer is correct for ANY scheme the cluster can read (s3://, hdfs://,
    file:/) — ``os.path.isdir`` sees only driver-local paths, and a remote
    directory-form table misclassified as single-file would stream zero
    rows, the exact silent-empty class this module exists to prevent
    (ADVICE r8). A missing table raises loudly instead of returning an
    empty stream.

    ``spark._jvm``/``_jsc`` are private PySpark attributes (stable for a
    decade, absent under Spark Connect): the supported-API alternative
    is to attempt the read and inspect the error class (PATH_NOT_FOUND)
    — switch if a connect-only deployment ever matters (ADVICE r9
    note)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        raise FileNotFoundError(
            f"stream source {path!r} does not exist — a missing table must "
            "fail the pipeline, not stream zero rows"
        )
    return fs.getFileStatus(hpath).isDirectory()


def stream_table(spark: SparkSession, sf_dir: str, name: str, schema) -> DataFrame:
    """Streaming parquet scan of one table that handles BOTH on-disk
    layouts a table ships in: a single file named ``<name>.parquet``
    (the driver fixtures) or a directory of part files under
    ``<name>.parquet/`` (every Spark-written dataset — sinks, the
    replicated scale fixtures, real deployments). Layout detection goes
    through the Hadoop FileSystem API (:func:`_path_is_directory`), so
    remote URIs resolve correctly and a missing table raises instead of
    silently streaming nothing.

    The old single-layout form (``pathGlobFilter=<name>.parquet`` over
    ``sf_dir``) matched LEAF FILE names only, so a directory-form table
    streamed ZERO rows — silently: the drain completes, the sink holds an
    empty table, and only a non-emptiness assertion downstream can notice
    (found by the round-8 strong-scaling stream leg finishing a ×10 drain
    in 0.29 s with zero shuffle). Directory-form tables stream from the
    table root directly, which also keeps partitioned layouts readable.
    """
    path = f"{sf_dir}/{name}.parquet"
    reader = spark.readStream.schema(schema)
    if _path_is_directory(spark, path):
        return reader.parquet(path)
    # single-file fixture: the file source requires a directory, so scan
    # the parent glob-filtered to the one leaf file
    return reader.option("pathGlobFilter", f"{name}.parquet").parquet(sf_dir)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming scan of the events table (file source stands in for Kafka,
    SURVEY.md §2.1 S5).

    The file source needs an explicit schema, and the fixture's ``ts`` has
    shipped both as TIMESTAMP(NANOS) (readable only as a raw LONG) and as
    plain TIMESTAMP(MICROS) — so probe with the batch twin
    (:func:`tfm_taxitrips_spark.sources.readers.read_events`, which owns
    the type-adaptation logic) and lift ITS already-normalized schema into
    the stream. The probe is one footer read, not a data scan.

    The stream then passes through the SAME ``conform_to_pinned`` layer as
    the batch reader (a pure projection, streaming-safe): without it a
    regen that drifts a non-``ts`` column (e.g. ``value`` to decimal)
    would leave the 10 stream queries computing on raw drifted types
    while batch/oracle paths use the pinned ones."""
    from tfm_taxitrips_spark import schemas
    from tfm_taxitrips_spark.sources.readers import (
        _read_events_raw,
        conform_to_pinned,
        normalize_event_ts,
    )

    from tfm_taxitrips_spark.sources.readers import events_guard

    raw, raw_ts = _read_events_raw(spark, f"{sf_dir}/events.parquet")
    src = stream_table(spark, sf_dir, "events", raw.schema)
    # same r12 telemetry ingest contract as the batch reader (NULL-ts
    # rows excluded, NaN value → NULL): without it the watermark layer
    # silently dropped NULL event times that every batch oracle kept,
    # and a single NaN value crashed the stateful agg's ANSI cents cast
    return events_guard(conform_to_pinned(
        normalize_event_ts(src, raw_ts), schemas.DRIVER_TABLES["events"], "events"
    ))


def windowed_rollup(
    stream: DataFrame,
    ts_col: str = "ts",
    dims: tuple[str, ...] = ("event_type",),
    window_duration: str = "15 minutes",
    watermark_delay: str = "15 minutes",
    value_col: str = "value",
) -> DataFrame:
    """A5 — the Druid rollup owned natively: watermarked tumbling window ×
    dims with count + sum metrics. Partial (map-side) aggregation applies;
    state is bounded by the watermark."""
    return (
        stream.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(ts_col, window_duration).alias("w"), *dims)
        .agg(F.count(F.lit(1)).alias("n_events"), dsum(value_col).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), *dims, "n_events", "total_value")
    )


def _ephemeral_checkpoint_dir() -> str:
    """Scratch checkpoint dir for a ONE-SHOT drain, preferring RAM-backed
    storage (r18, guide §1.2 'per-task work' applied to the driver/IO
    path): an ``availableNow`` drain into a memory sink writes its
    offsets/commit WAL and one state-store delta+snapshot per partition
    per batch, all fsynced — and then :func:`run_to_memory` deletes the
    whole directory before returning. Durability of that checkpoint
    buys nothing (the result table lives in memory; the checkpoint has
    no reader after the drain), so pointing it at tmpfs removes pure
    fsync/IO latency from every streaming drain. Production streams
    (``sinks.writers``) take caller-provided durable checkpoint
    locations and are unaffected. Override with
    ``$SPARK_GRAFT_CHK_SCRATCH`` (e.g. a fast local disk when /dev/shm
    is small); falls back to the system tempdir when no tmpfs exists.
    (Shared policy lives in :func:`session.ephemeral_scratch_dir` — the
    eager-contract audit queries use the same scratch for their
    throwaway datasets.)"""
    from tfm_taxitrips_spark.session import ephemeral_scratch_dir

    return ephemeral_scratch_dir("tfm_chk_")


def run_to_memory(
    df: DataFrame,
    spark: SparkSession,
    output_mode: str = "complete",
    state_partitions: int | None = None,
) -> DataFrame:
    """Drain a streaming DataFrame (availableNow) into a memory sink; return
    the materialized result as a batch DataFrame.

    ``state_partitions`` overrides ``spark.sql.shuffle.partitions`` for
    THIS drain only (set before ``start()`` — the moment the state-store
    partition count freezes into the new checkpoint — and restored after
    the drain; each call uses a fresh checkpoint, so no stored state ever
    sees a mismatched count).  Use it for stateful queries whose state
    cardinality is AGGREGATE-sized (windows × dims, time-linear): the
    per-partition HDFS state-store commit (one delta file create+rename
    per partition per batch) is pure overhead past the handful of
    partitions the state needs, and the heavy pre-exchange work (scan +
    map-side partial aggregation) runs at source parallelism regardless.
    Measured on the A5 rollup at sf0.1 (14k state rows): 8 partitions
    drain ~2× faster than 32 (median 1.09 s vs 1.57 s, 4-rep
    round-robin).  Key-scaled streams (dedup, sessionization, the
    stream-stream join) pass ``queries.streamq.drain_state_partitions()``
    — the r18 policy: over a bounded replay the per-partition commit
    overhead dominates long before state volume does, and the env
    override (``$SPARK_GRAFT_STREAM_STATE_PARTITIONS``) re-sizes a
    replay whose key space outgrows that assumption.  Leave ``None``
    only when the inherited session count is genuinely the right order
    for the state.  The override rides
    :func:`_scoped_shuffle_partitions` — the conf is session-visible, the
    entry points here run queries sequentially, and the scope's
    non-blocking lock turns any future concurrent drain into a loud
    error instead of a silently mis-planned query (r8 advisory #1)."""
    name = f"mem_{uuid.uuid4().hex[:12]}"
    chk = _ephemeral_checkpoint_dir()
    # r19 (guide §1.2 applied to the micro-batch machinery): COMPLETE-mode
    # drains skip the trailing no-data micro-batch — complete mode
    # re-emits the full state table every batch, so a zero-row batch
    # cannot change the sink (measured identical 14,385-row result,
    # −13% per drain at sf0.1: one fewer round of offsets WAL + per-
    # partition state commits). APPEND-mode drains keep it: that batch
    # advances the watermark and FLUSHES final rows — skipping it loses
    # results. Conf is scoped+restored like the partition override; the
    # drain entry points run one query at a time per session (the
    # _scoped_shuffle_partitions invariant).
    _ND_KEY = "spark.sql.streaming.noDataMicroBatches.enabled"
    skip_no_data = output_mode == "complete"
    with _scoped_shuffle_partitions(spark, state_partitions):
        prev_nd = spark.conf.get(_ND_KEY)
        if skip_no_data:
            spark.conf.set(_ND_KEY, "false")
        try:
            query = (
                df.writeStream.format("memory")
                .queryName(name)
                .outputMode(output_mode)
                .option("checkpointLocation", chk)
                .trigger(availableNow=True)
                .start()
            )
            query.awaitTermination()
        finally:
            if skip_no_data:
                spark.conf.set(_ND_KEY, prev_nd)
    # the drain is complete: the checkpoint (offsets/state WAL) has no
    # further reader — remove it rather than leaking one dir per call
    shutil.rmtree(chk, ignore_errors=True)
    return spark.table(name)
