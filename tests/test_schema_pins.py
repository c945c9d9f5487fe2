"""Fixture-drift armor (round-4 verdict item #1).

The driver regenerates /root/testdata between rounds and has already
changed physical encodings once (events.ts: TIMESTAMP(NANOS) →
TIMESTAMP_NTZ), which silently broke every events query until a footer
probe was added. These tests pin the contract that prevents a repeat for
ANY table:

1. every driver table, loaded through ``sources.readers.table``, matches
   the pinned logical schema in ``schemas.DRIVER_TABLES`` exactly — the
   failure message is a per-column diff, not a downstream AnalysisException;
2. the known drift classes (timestamp flavor, nanos-as-long, int width,
   float↔double array elements, added columns) are absorbed by
   ``conform_to_pinned`` with values preserved;
3. semantic drift (a type no value-preserving cast can fix) fails loudly
   with ``SchemaDriftError`` naming the column.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tfm_taxitrips_spark import schemas
from tfm_taxitrips_spark.sources.readers import (
    SchemaDriftError,
    conform_to_pinned,
    table,
)


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001",
                                    "/root/testdata/sf0.01"])
@pytest.mark.parametrize("name", sorted(schemas.DRIVER_TABLES))
def test_table_matches_pinned_schema(spark, sf_dir, name):
    """table() must return exactly the pinned logical schema (same names,
    same order, same types) for every driver table on the CURRENT fixtures
    — at BOTH the test SF and the driver's grading SF (generators have no
    obligation to keep SFs consistent). A failing diff here means the
    generator drifted in a way the conform layer didn't absorb — fix
    schemas.DRIVER_TABLES or the conform rules BEFORE grading day, guided
    by the diff below."""
    got = table(spark, sf_dir, name).schema
    pinned = schemas.DRIVER_TABLES[name]
    diff = [
        f"{name}.{p.name}: pinned={p.dataType.simpleString()} "
        f"got={g.dataType.simpleString() if g else 'MISSING'}"
        for p, g in zip(
            pinned.fields,
            [next((f for f in got.fields if f.name == p.name), None)
             for p in pinned.fields],
        )
        if g is None or g.dataType != p.dataType
    ]
    assert not diff, "\n".join(diff)
    # pinned columns must lead in pinned order (extras, if any, trail)
    assert [f.name for f in got.fields[: len(pinned.fields)]] == [
        f.name for f in pinned.fields
    ]


def test_all_star_tables_are_pinned():
    assert set(schemas.DRIVER_TABLES) == set(schemas.STAR_TABLES)


# ---------------------------------------------------------------------------
# drift simulations — each writes a physically-drifted twin of a driver
# table and asserts table() still returns the pinned schema with the same
# values the true fixture yields.
# ---------------------------------------------------------------------------


def _write(tmp_path, name: str, arrow_table: pa.Table, **write_kw) -> str:
    d = tmp_path / "drift"
    d.mkdir(exist_ok=True)
    pq.write_table(arrow_table, str(d / f"{name}.parquet"), **write_kw)
    return str(d)


def test_drift_orders_date_as_nanos(spark, tmp_path):
    """orders.o_orderdate shipped as TIMESTAMP(NANOS): the probe must flip
    the legacy toggle, and conform must truncate nanos→micros onto the
    pinned NTZ type."""
    ts = [datetime.datetime(2024, 1, 1, 12, 0, 0), datetime.datetime(2024, 6, 2, 3, 4, 5)]
    t = pa.table(
        {
            "o_orderkey": pa.array([1, 2], pa.int64()),
            "o_custkey": pa.array([10, 20], pa.int64()),
            "o_orderstatus": pa.array(["O", "F"]),
            "o_totalprice": pa.array([1.5, 2.5], pa.float64()),
            "o_orderdate": pa.array(ts, pa.timestamp("ns")),
            "o_orderpriority": pa.array(["1-URGENT", "2-HIGH"]),
        }
    )
    sf_dir = _write(tmp_path, "orders", t, coerce_timestamps=None, version="2.6")
    # confirm the fixture really is NANOS on disk (else the test is vacuous)
    phys = pq.read_schema(f"{sf_dir}/orders.parquet").field("o_orderdate").type
    assert phys == pa.timestamp("ns")
    try:
        df = table(spark, sf_dir, "orders")
        assert df.schema == schemas.DRIVER_TABLES["orders"]
        got = sorted((r.o_orderkey, r.o_orderdate) for r in df.collect())
        assert got == [(1, ts[0]), (2, ts[1])]
    finally:
        # never leak legacy mode into the shared session on failure
        spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")


def test_drift_int_width_and_added_column(spark, tmp_path):
    """region keys shipped as int64 (pinned int32) plus a NEW column the
    queries don't know about: widths cast down value-preserving, the extra
    column trails without breaking pinned-prefix order."""
    t = pa.table(
        {
            "r_regionkey": pa.array([0, 1], pa.int64()),
            "r_name": pa.array(["AFRICA", "ASIA"]),
            "r_comment": pa.array(["new", "col"]),
        }
    )
    sf_dir = _write(tmp_path, "region", t)
    df = table(spark, sf_dir, "region")
    assert [f.name for f in df.schema.fields] == ["r_regionkey", "r_name", "r_comment"]
    assert df.schema["r_regionkey"].dataType.simpleString() == "int"
    assert sorted((r.r_regionkey, r.r_name) for r in df.collect()) == [
        (0, "AFRICA"), (1, "ASIA"),
    ]


def test_drift_embedding_double(spark, tmp_path):
    """embeddings.embedding shipped as array<double> (pinned array<float>):
    cast element-wise, values preserved to float precision."""
    t = pa.table(
        {
            "vec_id": pa.array([1], pa.int64()),
            "embedding": pa.array([[0.25, -1.5]], pa.list_(pa.float64())),
            "label": pa.array([3], pa.int32()),
        }
    )
    sf_dir = _write(tmp_path, "embeddings", t)
    df = table(spark, sf_dir, "embeddings")
    assert df.schema == schemas.DRIVER_TABLES["embeddings"]
    [row] = df.collect()
    assert row.embedding == [0.25, -1.5]


def test_drift_semantic_fails_loudly(spark, tmp_path):
    """documents.n_chars shipped as STRING — no value-preserving cast rule;
    the error names table+column+both types instead of letting 30 queries
    die downstream."""
    t = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array(["hello"]),
            "lang": pa.array(["en"]),
            "source": pa.array(["web"]),
            "n_chars": pa.array(["5"]),
        }
    )
    sf_dir = _write(tmp_path, "documents", t)
    with pytest.raises(SchemaDriftError, match="documents.n_chars"):
        table(spark, sf_dir, "documents")


def test_drift_missing_column_fails_loudly(spark, tmp_path):
    t = pa.table({"r_regionkey": pa.array([0], pa.int32())})
    sf_dir = _write(tmp_path, "region", t)
    with pytest.raises(SchemaDriftError, match="region.r_name: MISSING"):
        table(spark, sf_dir, "region")


def test_conform_is_noop_projection_when_matched(spark, sf_smoke):
    """On matching fixtures the conform layer must not add casts — the
    analyzed plans with and without conform are identical, so the armor is
    free at 100 TB."""
    raw = spark.read.parquet(f"{sf_smoke}/customer.parquet")
    conformed = conform_to_pinned(raw, schemas.DRIVER_TABLES["customer"], "customer")
    assert conformed.schema == raw.schema
    assert "cast" not in conformed._jdf.queryExecution().analyzed().toString().lower()


def test_drift_events_nanos_streaming_and_batch(spark, tmp_path):
    """The STREAMING events reader must absorb a TIMESTAMP(NANOS) regen
    exactly like the batch reader: the footer probe flips the legacy
    toggle, the raw LONG nanos surface normalizes to session-TZ TIMESTAMP,
    and a watermarked windowed rollup over the stream equals the same
    rollup over the batch read. This is the one drift path the current
    (native-timestamp) fixtures never exercise."""
    from pyspark.sql import functions as F

    from tfm_taxitrips_spark.streaming.pipeline import (
        read_events_stream,
        run_to_memory,
    )

    base = datetime.datetime(2024, 3, 1, 0, 0, 0)
    ts = [base + datetime.timedelta(minutes=7 * i) for i in range(40)]
    t = pa.table(
        {
            "event_id": pa.array(range(40), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("ns")),
            "user_id": pa.array([i % 5 for i in range(40)], pa.int64()),
            "event_type": pa.array(["click", "view"] * 20),
            "value": pa.array([float(i) for i in range(40)], pa.float64()),
            "props": pa.array(["{}"] * 40),
        }
    )
    d = tmp_path / "nanos_events"
    d.mkdir()
    pq.write_table(t, str(d / "events.parquet"),
                   coerce_timestamps=None, version="2.6")
    assert pq.read_schema(str(d / "events.parquet")).field("ts").type \
        == pa.timestamp("ns")
    try:
        batch = table(spark, str(d), "events")
        assert batch.schema == schemas.DRIVER_TABLES["events"]

        def rollup(df):
            return (
                df.withWatermark("ts", "30 minutes")
                if df.isStreaming else df
            ).groupBy(
                F.window("ts", "15 minutes").alias("w"), "event_type"
            ).agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("value").alias("s"),
            ).select(
                F.col("w.start").alias("ws"), "event_type", "n", "s"
            )

        expected = sorted(map(tuple, rollup(batch).collect()))
        streamed = run_to_memory(
            rollup(read_events_stream(spark, str(d))), spark
        )
        assert sorted(map(tuple, streamed.collect())) == expected
        # first window starts at the true wall clock, not 1970 / ÷1000
        assert expected[0][0].year == 2024
    finally:
        spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")


def test_drift_integral_double_absorbed_fractional_raises(spark, tmp_path):
    """fractional→integral drift: embeddings.label shipped as double. With
    integral values the cast absorbs it; a NON-integral value must raise
    (ANSI does not protect this pair — plain cast truncates 2.5→2 and
    corrupts keys silently), naming the column."""
    import pyarrow as pa

    ok = pa.table(
        {
            "vec_id": pa.array([1, 2], pa.int64()),
            "embedding": pa.array([[0.5], [1.5]], pa.list_(pa.float32())),
            "label": pa.array([3.0, 4.0], pa.float64()),
        }
    )
    d_ok = tmp_path / "ok"; d_ok.mkdir()
    pq.write_table(ok, str(d_ok / "embeddings.parquet"))
    df = table(spark, str(d_ok), "embeddings")
    assert df.schema == schemas.DRIVER_TABLES["embeddings"]
    assert sorted(r.label for r in df.collect()) == [3, 4]

    bad = pa.table(
        {
            "vec_id": pa.array([1], pa.int64()),
            "embedding": pa.array([[0.5]], pa.list_(pa.float32())),
            "label": pa.array([2.5], pa.float64()),
        }
    )
    d_bad = tmp_path / "bad"; d_bad.mkdir()
    pq.write_table(bad, str(d_bad / "embeddings.parquet"))
    with pytest.raises(Exception, match="non-integral value in 'label'"):
        table(spark, str(d_bad), "embeddings").collect()
