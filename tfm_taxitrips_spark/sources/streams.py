"""Streaming sources (SURVEY.md §2.1: S5-S6).

The production path is Kafka (``/root/reference/StreamingTaxiTrips.py:79-86``);
tests use a JSON-lines file source with identical downstream semantics —
both yield an untyped ``value: string`` column that ``parse_json_payload``
turns into typed columns with ``from_json``
(``/root/reference/StreamingTaxiTrips.py:89-91``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def kafka_source_options(
    brokers: str,
    topic: str,
    fail_on_data_loss: bool = False,
    max_offsets_per_trigger: int | None = None,
) -> dict[str, str]:
    """The exact option map of the reference's Kafka source
    (/root/reference/StreamingTaxiTrips.py:79-86: subscribe +
    failOnDataLoss=False), factored out so the broker-gated reader's
    surface is assertable without a broker
    (tests/test_kafka_surface.py)."""
    opts = {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "failOnDataLoss": str(fail_on_data_loss).lower(),
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def read_kafka_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    fail_on_data_loss: bool = False,
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """S5 — Kafka stream source → ``key``, ``value`` strings.

    Mirrors /root/reference/StreamingTaxiTrips.py:79-86 (subscribe + CAST
    value AS STRING + failOnDataLoss=False). ``maxOffsetsPerTrigger`` bounds
    micro-batch size — the backpressure knob the reference leaves unset.
    Requires the spark-sql-kafka package on the classpath; tests use
    :func:`read_json_file_stream` instead.
    """
    reader = spark.readStream.format("kafka").options(
        **kafka_source_options(brokers, topic, fail_on_data_loss, max_offsets_per_trigger)
    )
    return reader.load().selectExpr(
        "CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value"
    )


def read_json_file_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Kafka stand-in: JSON-lines files dropped into ``path``, surfaced with
    the same ``value: string`` shape as the Kafka source so the rest of the
    pipeline is source-agnostic."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path).select(F.col("value").cast("string").alias("value"))


def parse_json_payload(
    df: DataFrame,
    schema: StructType,
    timestamp_format: str | None = None,
) -> DataFrame:
    """S6 — ``from_json`` parse + flatten (/root/reference/StreamingTaxiTrips.py:89-91)."""
    options = {"timestampFormat": timestamp_format} if timestamp_format else {}
    return (
        df.select(F.from_json(F.col("value"), schema, options).alias("parsed_value"))
        .select("parsed_value.*")
    )
