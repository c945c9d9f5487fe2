"""Kafka options surface (S5/K3) — assertable without a broker.

The broker-gated reader/writer never run in this sandbox; what CAN be
pinned is the exact option maps and the wire projection they hand Spark,
mirroring /root/reference/StreamingTaxiTrips.py:79-86 (source) and
144-153 (sink).
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from tfm_taxitrips_spark.sinks.writers import kafka_payload, kafka_sink_options
from tfm_taxitrips_spark.sources.streams import (
    kafka_source_options,
    parse_json_payload,
)


def test_source_options_match_reference():
    """subscribe + failOnDataLoss=false, exactly as the reference sets them."""
    assert kafka_source_options("b1:9092,b2:9092", "taxitrips") == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "taxitrips",
        "failOnDataLoss": "false",
    }


def test_source_backpressure_knob_is_opt_in():
    opts = kafka_source_options("b:9092", "t", max_offsets_per_trigger=50_000)
    assert opts["maxOffsetsPerTrigger"] == "50000"
    assert "maxOffsetsPerTrigger" not in kafka_source_options("b:9092", "t")


def test_sink_options_match_reference():
    """topic + per-sink checkpointLocation, exactly as the reference."""
    assert kafka_sink_options("b:9092", "taxitrips_out", "/chk/kafka") == {
        "kafka.bootstrap.servers": "b:9092",
        "topic": "taxitrips_out",
        "checkpointLocation": "/chk/kafka",
    }


def test_sink_payload_shape(spark):
    """key = CAST(taxi_id AS STRING), value = to_json(struct(*)) — and the
    value round-trips through the source-side from_json parse."""
    df = spark.createDataFrame(
        [(7, "t1", 12.5)], "taxi_id int, trip_id string, fare double"
    )
    out = kafka_payload(df)
    assert out.columns == ["key", "value"]
    row = out.collect()[0]
    assert row.key == "7" and isinstance(row.key, str)
    assert json.loads(row.value) == {"taxi_id": 7, "trip_id": "t1", "fare": 12.5}

    parsed = parse_json_payload(
        out, "taxi_id int, trip_id string, fare double"
    ).collect()[0]
    assert (parsed.taxi_id, parsed.trip_id, parsed.fare) == (7, "t1", 12.5)


def test_payload_parses_reference_wire_format(spark):
    """The producer wire format (all-string fields, AM/PM timestamps,
    $-money — kafkaTaxiTripsProducer.py) must parse through the declared
    JSON schema + timestampFormat."""
    from tests.taxi_fixtures import make_trips, trip_json_row
    from tfm_taxitrips_spark import schemas

    trips = make_trips(5, seed=7)
    rows = [(json.dumps(trip_json_row(t)),) for t in trips]
    df = spark.createDataFrame(rows, "value string")
    parsed = parse_json_payload(
        df, schemas.TRIPS_RAW_JSON, timestamp_format=schemas.TRIPS_TIMESTAMP_FORMAT
    )
    got = parsed.select("trip_id", "trip_start_timestamp", "fare").collect()
    assert len(got) == 5
    assert all(r.trip_start_timestamp is not None for r in got)
    assert got[0].trip_id == trips[0].trip_id
    assert got[0].trip_start_timestamp == trips[0].start
