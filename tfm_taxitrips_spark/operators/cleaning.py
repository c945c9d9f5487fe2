"""Cleaning operators (SURVEY.md §2.3-2.4: P3-P6, F1-F2).

Pure ``DataFrame -> DataFrame`` functions, all built-in expressions (full
whole-stage codegen; no Python in the hot path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: characters stripped from money strings — the reference's exact class
#: r'[\$,)]' (/root/reference/IngestHistoricTrips.py:82-86,
#: /root/reference/StreamingTaxiTrips.py:105-109)
_MONEY_JUNK = r"[\$,)]"


def parse_money(col: Column | str) -> Column:
    """P4 — '$1,234.56' → 1234.56 (double)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, _MONEY_JUNK, "").cast("double")


def with_year_month(df: DataFrame, ts_col: str = "trip_start_timestamp") -> DataFrame:
    """P6 — derive the year/month partition columns
    (/root/reference/IngestHistoricTrips.py:95-96)."""
    return df.withColumn("year", F.year(ts_col)).withColumn("month", F.month(ts_col))


def clean_trips(df: DataFrame, legacy_int_miles: bool = False) -> DataFrame:
    """The canonical trips cleaning projection: casts, money normalization,
    partition-column derivation (/root/reference/IngestHistoricTrips.py:71-97,
    /root/reference/StreamingTaxiTrips.py:94-120).

    ``legacy_int_miles=True`` reproduces the reference's int-cast of
    trip_miles (truncates fractional miles — a quirk, SURVEY.md §1.2);
    default keeps miles as double.
    """
    miles = F.col("trip_miles").cast("int" if legacy_int_miles else "double")
    cleaned = df.select(
        F.col("trip_id"),
        F.col("taxi_id"),
        F.col("trip_start_timestamp"),
        F.col("trip_end_timestamp"),
        F.col("trip_seconds").cast("int").alias("trip_seconds"),
        miles.alias("trip_miles"),
        F.col("pickup_census_tract").cast("string").alias("pickup_census_tract"),
        F.col("dropoff_census_tract").cast("string").alias("dropoff_census_tract"),
        F.col("pickup_community_area").cast("int").alias("pickup_community_area"),
        F.col("dropoff_community_area").cast("int").alias("dropoff_community_area"),
        parse_money("fare").alias("fare"),
        parse_money("tips").alias("tips"),
        parse_money("tolls").alias("tolls"),
        parse_money("extras").alias("extras"),
        parse_money("trip_total").alias("trip_total"),
        F.col("payment_type"),
        F.col("company"),
        F.col("pickup_centroid_latitude").cast("string").alias("pickup_centroid_latitude"),
        F.col("pickup_centroid_longitude").cast("string").alias("pickup_centroid_longitude"),
        F.col("pickup_centroid_location"),
        F.col("dropoff_centroid_latitude").cast("string").alias("dropoff_centroid_latitude"),
        F.col("dropoff_centroid_longitude").cast("string").alias("dropoff_centroid_longitude"),
        F.col("dropoff_centroid_location"),
    )
    return with_year_month(cleaned)


def trip_start_date(ts_col: str = "trip_start_timestamp") -> Column:
    """P5 — timestamp → midnight-of-day timestamp.

    The reference round-trips through a string:
    ``to_timestamp(date_format(ts, 'yyyy-MM-dd 00:00:00'))``
    (/root/reference/TransformTaxiTrips.py:47). ``date_trunc('day', ts)``
    has identical semantics and stays numeric (no string alloc per row).
    """
    return F.date_trunc("day", F.col(ts_col))


def filter_unmapped_areas(df: DataFrame) -> DataFrame:
    """F1 — the AreasLoc candidate filter: company present, pickup area
    present, census tract absent (/root/reference/AreasLoc.py:51-52)."""
    return df.filter(
        F.col("company").isNotNull()
        & F.col("pickup_community_area").isNotNull()
        & F.col("pickup_census_tract").isNull()
    )
