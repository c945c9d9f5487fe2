"""End-to-end pipelines — the reference's four scripts as engine entry
points (SURVEY.md §3). A user of the reference maps:

- ``IngestHistoricTrips.py``  → :func:`ingest_historic`
- ``TransformTaxiTrips.py``   → :func:`transform_views`
- ``AreasLoc.py``             → :func:`build_areas`
- ``StreamingTaxiTrips.py``   → :func:`streaming_job`
- ``kafkaTaxiTripsProducer.py`` → :func:`tfm_taxitrips_spark.sources.simulator.replay_csv_as_json`

Differences from the reference, all deliberate (SURVEY.md §4):
- partition pruning is declarative (``.where(year==y)``), not path-munging;
- dedup is ``dropDuplicates(['trip_id'])`` — key-only shuffle — instead of
  whole-row ``.distinct()``;
- the four views are ONE rollup pass with true distinct counts (the
  reference's A4 re-aggregation counts distinct *counts*; documented in
  ``operators.views``);
- the enrichment subtree is cached across view materializations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tfm_taxitrips_spark.config import EngineConfig
from tfm_taxitrips_spark.operators.cleaning import clean_trips, trip_start_date
from tfm_taxitrips_spark.operators.enrich import (
    build_areas_dimension,
    enrich_trips_with_areas,
)
from tfm_taxitrips_spark.operators.views import agg_view, rollup_views
from tfm_taxitrips_spark.sinks.writers import (
    write_parquet_partitioned,
    write_single_csv,
    write_view,
)
from tfm_taxitrips_spark.sources.readers import (
    read_comm_areas_csv,
    read_dimension_csv,
    read_trips_csv,
    read_trips_parquet,
)


def ingest_historic(
    spark: SparkSession, cfg: EngineConfig, year: int | None = None
) -> dict[str, int]:
    """Historic CSV → clean → partitioned parquet
    (/root/reference/IngestHistoricTrips.py:66-102).

    Returns data-quality counters (rows written, null keys, unmapped
    areas) collected via ``Observation`` — piggybacked on the write job
    itself, NO second pass over the input (at 100 TB a separate count()
    would double the ingest cost)."""
    from pyspark.sql import Observation

    raw = read_trips_csv(spark, cfg.csv_input_path)
    clean = clean_trips(raw)
    if year is not None:
        clean = clean.where(F.col("year") == int(year))
    obs = Observation("ingest_quality")
    observed = clean.observe(
        obs,
        F.count(F.lit(1)).alias("rows_written"),
        F.sum(F.col("trip_id").isNull().cast("long")).alias("null_trip_ids"),
        F.sum(
            F.col("pickup_community_area").isNull().cast("long")
        ).alias("unmapped_pickup_areas"),
    )
    write_parquet_partitioned(observed, cfg.trips_path)
    return {k: int(v or 0) for k, v in obs.get.items()}


def trip_views(
    trips: DataFrame,
    areas: DataFrame,
    caches: list[DataFrame] | None = None,
) -> dict[str, DataFrame]:
    """The four-view family (/root/reference/TransformTaxiTrips.py:98-192)
    from an enriched trips frame, in two rollup passes (pickup + dropoff)
    instead of four full pipelines.

    Returns named DataFrames keyed like the reference's PostgreSQL tables.
    The intermediate frames are cached (each feeds two outputs); pass
    ``caches`` to receive them for ``unpersist()`` once the views are
    materialized — a long-lived session must not accumulate them.
    """
    enriched = enrich_trips_with_areas(trips, areas, how="left").withColumn(
        "trip_start_date", trip_start_date()
    )
    enriched = enriched.cache()
    if caches is not None:
        caches.append(enriched)

    money = [
        ("fare", "fare"),
        ("tips", "tips"),
        ("tolls", "tolls"),
        ("extras", "extras"),
        ("trip_total", "trip_total"),
    ]
    out: dict[str, DataFrame] = {}
    for role in ("pickup", "dropoff"):
        rolled = rollup_views(
            enriched,
            rollup_key="company",
            keys=[
                "trip_start_date",
                f"{role}_community_area",
                f"{role}_community_area_name",
                f"{role}_area_centroid_latitude",
                f"{role}_area_centroid_longitude",
            ],
            sum_cols=money,
            count_col=("trip_id", "trips"),
            distinct_col=("taxi_id", "taxis"),
        ).cache()
        if caches is not None:
            caches.append(rolled)
        out[f"companies_{role}_area_view"] = rolled.where(F.col("lvl") == 0).drop("lvl")
        out[f"{role}_area_view"] = (
            rolled.where(F.col("lvl") == 1).drop("lvl", "company")
        )
    return out


def transform_views(
    spark: SparkSession, cfg: EngineConfig, year: int
) -> dict[str, DataFrame]:
    """Daily batch transform (/root/reference/TransformTaxiTrips.py): scan
    one year (declaratively pruned), dedup by trip_id, enrich, materialize
    the four views via the configured sink seam."""
    trips = read_trips_parquet(spark, cfg.trips_path, year=year).dropDuplicates(
        ["trip_id"]
    )
    areas = read_dimension_csv(spark, cfg.area_path)
    caches: list[DataFrame] = []
    views = trip_views(trips, areas, caches=caches)
    try:
        for name, df in views.items():
            write_view(df, cfg, f"{name}_{year}")
    finally:
        # the caches only exist to share work across the four writes; a
        # long-lived daily-job session must not accumulate them
        for df in caches:
            df.unpersist()
    return views


def build_areas(spark: SparkSession, cfg: EngineConfig, trips_year: int = 2017) -> DataFrame:
    """Derive the areas master (/root/reference/AreasLoc.py): mappable-trip
    centroids ⨝ CommAreas names → single-file CSV."""
    trips = read_trips_parquet(spark, cfg.trips_path, year=trips_year)
    comm = read_comm_areas_csv(spark, cfg.extra.get("comm_areas_path", cfg.area_path))
    areas = build_areas_dimension(trips, comm)
    write_single_csv(areas, cfg.extra.get("areas_out_path", cfg.area_path + ".out"))
    return areas


def streaming_clean(stream_values: DataFrame) -> DataFrame:
    """Wire-format JSON values → clean typed trips
    (/root/reference/StreamingTaxiTrips.py:89-120)."""
    from tfm_taxitrips_spark import schemas
    from tfm_taxitrips_spark.sources.streams import parse_json_payload

    parsed = parse_json_payload(
        stream_values, schemas.TRIPS_RAW_JSON, schemas.TRIPS_TIMESTAMP_FORMAT
    )
    return clean_trips(parsed)


def streaming_job(spark: SparkSession, cfg: EngineConfig, available_now: bool = False):
    """The real-time path (/root/reference/StreamingTaxiTrips.py): source →
    clean → inner-join areas → two sinks (kafka analog + partitioned
    parquet), each with its own checkpoint. Returns the started queries.

    With no Kafka configured, the source is a JSON-lines file drop at
    ``cfg.csv_input_path`` and the kafka sink is skipped.
    """
    from tfm_taxitrips_spark.sinks.writers import write_kafka_stream, write_parquet_stream
    from tfm_taxitrips_spark.sources.streams import read_json_file_stream, read_kafka_stream

    if cfg.kafka_brokers:
        values = read_kafka_stream(spark, cfg.kafka_brokers, cfg.kafka_in_topic)
    else:
        values = read_json_file_stream(spark, cfg.csv_input_path)

    areas = read_dimension_csv(spark, cfg.area_path)
    clean = streaming_clean(values)
    enriched = enrich_trips_with_areas(clean, areas, how="inner")

    queries = []
    if cfg.kafka_brokers:
        queries.append(
            write_kafka_stream(
                enriched, cfg.kafka_brokers, cfg.kafka_out_topic, cfg.checkpoint_kafka_path
            )
        )
    queries.append(
        write_parquet_stream(
            enriched,
            cfg.trips_path,
            cfg.checkpoint_hdfs_path,
            trigger=cfg.parquet_trigger,
            available_now=available_now,
        )
    )
    return queries
