"""Explicit StructType schema registry.

The reference declares every schema explicitly and never infers
(SURVEY.md §1.4; ``/root/reference/IngestHistoricTrips.py:38-62``,
``/root/reference/StreamingTaxiTrips.py:49-72``,
``/root/reference/AreasLoc.py:22-46``). Same policy here: a central registry,
one canonical schema per table, raw (wire) and clean (at-rest) variants for
the trips fact.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

# --------------------------------------------------------------------------
# Taxi domain (reference parity)
# --------------------------------------------------------------------------

#: Raw historic CSV schema — /root/reference/IngestHistoricTrips.py:38-62.
#: Money columns arrive as strings with '$'/',' (cleaned by operators.cleaning).
TRIPS_RAW_CSV = StructType(
    [
        StructField("trip_id", StringType(), False),
        StructField("taxi_id", StringType(), False),
        StructField("trip_start_timestamp", TimestampType(), True),
        StructField("trip_end_timestamp", TimestampType(), True),
        StructField("trip_seconds", IntegerType(), True),
        StructField("trip_miles", DoubleType(), True),
        StructField("pickup_census_tract", StringType(), True),
        StructField("dropoff_census_tract", StringType(), True),
        StructField("pickup_community_area", IntegerType(), True),
        StructField("dropoff_community_area", IntegerType(), True),
        StructField("fare", StringType(), True),
        StructField("tips", StringType(), True),
        StructField("tolls", StringType(), True),
        StructField("extras", StringType(), True),
        StructField("trip_total", StringType(), True),
        StructField("payment_type", StringType(), True),
        StructField("company", StringType(), True),
        StructField("pickup_centroid_latitude", StringType(), True),
        StructField("pickup_centroid_longitude", StringType(), True),
        StructField("pickup_centroid_location", StringType(), True),
        StructField("dropoff_centroid_latitude", StringType(), True),
        StructField("dropoff_centroid_longitude", StringType(), True),
        StructField("dropoff_centroid_location", StringType(), True),
    ]
)

#: Kafka JSON wire schema — all strings except timestamps
#: (/root/reference/StreamingTaxiTrips.py:49-72).
TRIPS_RAW_JSON = StructType(
    [
        StructField(f.name, StringType() if not isinstance(f.dataType, TimestampType) else TimestampType(), True)
        for f in TRIPS_RAW_CSV.fields
    ]
)

#: Reference timestamp wire format (12-hour AM/PM) —
#: /root/reference/IngestHistoricTrips.py:68, StreamingTaxiTrips.py:75.
TRIPS_TIMESTAMP_FORMAT = "MM/dd/yyyy hh:mm:ss a"

#: Clean at-rest schema (post operators.cleaning.clean_trips). Partitioned
#: by year, month at rest. Note: the reference casts trip_miles to INT
#: (truncating fractions — /root/reference/IngestHistoricTrips.py:77);
#: we keep DOUBLE and expose the quirk as an option (SURVEY.md §1.2).
TRIPS_CLEAN = StructType(
    [
        StructField("trip_id", StringType(), False),
        StructField("taxi_id", StringType(), False),
        StructField("trip_start_timestamp", TimestampType(), True),
        StructField("trip_end_timestamp", TimestampType(), True),
        StructField("trip_seconds", IntegerType(), True),
        StructField("trip_miles", DoubleType(), True),
        StructField("pickup_census_tract", StringType(), True),
        StructField("dropoff_census_tract", StringType(), True),
        StructField("pickup_community_area", IntegerType(), True),
        StructField("dropoff_community_area", IntegerType(), True),
        StructField("fare", DoubleType(), True),
        StructField("tips", DoubleType(), True),
        StructField("tolls", DoubleType(), True),
        StructField("extras", DoubleType(), True),
        StructField("trip_total", DoubleType(), True),
        StructField("payment_type", StringType(), True),
        StructField("company", StringType(), True),
        StructField("pickup_centroid_latitude", StringType(), True),
        StructField("pickup_centroid_longitude", StringType(), True),
        StructField("pickup_centroid_location", StringType(), True),
        StructField("dropoff_centroid_latitude", StringType(), True),
        StructField("dropoff_centroid_longitude", StringType(), True),
        StructField("dropoff_centroid_location", StringType(), True),
        StructField("year", IntegerType(), True),
        StructField("month", IntegerType(), True),
    ]
)

#: Areas dimension — /root/reference/TransformTaxiTrips.py:62-68,
#: built by AreasLoc.py:76-80.
AREAS = StructType(
    [
        StructField("area_number", IntegerType(), False),
        StructField("community", StringType(), False),
        StructField("area_centroid_latitude", StringType(), True),
        StructField("area_centroid_longitude", StringType(), True),
        StructField("the_geom", StringType(), True),
    ]
)

#: Headerless ';'-separated CommAreas source — /root/reference/AreasLoc.py:60-74.
COMM_AREAS_RAW = StructType(
    [
        StructField("the_geom", StringType(), True),
        StructField("perimeter", StringType(), True),
        StructField("area", StringType(), True),
        StructField("comarea_", StringType(), True),
        StructField("comarea_id", StringType(), True),
        StructField("area_number", IntegerType(), False),
        StructField("community", StringType(), False),
        StructField("area_num_1", IntegerType(), True),
        StructField("shape_area", StringType(), True),
        StructField("shape_len", StringType(), True),
    ]
)

# --------------------------------------------------------------------------
# Driver star-schema testdata (TESTDATA.md) — read via sources.readers.table
# --------------------------------------------------------------------------

STAR_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _st(*fields: tuple[str, object]) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])


#: Pinned LOGICAL schema per driver table — what every query in the repo is
#: written against, and what ``sources.readers.table`` guarantees to return
#: regardless of how the fixture generator physically encoded the parquet
#: that round. The generator has already drifted once (events.ts shipped as
#: TIMESTAMP(NANOS), then TIMESTAMP_NTZ — see sources/readers.py probe);
#: this registry is the contract that absorbs the next drift for EVERY
#: table, not just events. ``readers.conform_to_pinned`` casts
#: value-preserving drift classes (timestamp flavors, int widths,
#: float↔double, array element types) to these types and fails with a
#: readable diff on anything semantic.
DRIVER_TABLES: dict[str, StructType] = {
    "region": _st(("r_regionkey", IntegerType()), ("r_name", StringType())),
    "nation": _st(
        ("n_nationkey", IntegerType()),
        ("n_name", StringType()),
        ("n_regionkey", IntegerType()),
    ),
    "customer": _st(
        ("c_custkey", LongType()),
        ("c_name", StringType()),
        ("c_nationkey", IntegerType()),
        ("c_acctbal", DoubleType()),
        ("c_mktsegment", StringType()),
    ),
    "supplier": _st(
        ("s_suppkey", LongType()),
        ("s_name", StringType()),
        ("s_nationkey", IntegerType()),
        ("s_acctbal", DoubleType()),
    ),
    "part": _st(
        ("p_partkey", LongType()),
        ("p_name", StringType()),
        ("p_brand", StringType()),
        ("p_type", StringType()),
        ("p_size", IntegerType()),
        ("p_retailprice", DoubleType()),
    ),
    "orders": _st(
        ("o_orderkey", LongType()),
        ("o_custkey", LongType()),
        ("o_orderstatus", StringType()),
        ("o_totalprice", DoubleType()),
        ("o_orderdate", TimestampNTZType()),
        ("o_orderpriority", StringType()),
    ),
    "lineitem": _st(
        ("l_orderkey", LongType()),
        ("l_partkey", LongType()),
        ("l_suppkey", LongType()),
        ("l_linenumber", IntegerType()),
        ("l_quantity", DoubleType()),
        ("l_extendedprice", DoubleType()),
        ("l_discount", DoubleType()),
        ("l_tax", DoubleType()),
        ("l_returnflag", StringType()),
        ("l_linestatus", StringType()),
        ("l_shipdate", TimestampNTZType()),
    ),
    # events is pinned POST-normalization: read_events always lands ts on
    # session-TZ TIMESTAMP (the streaming engine needs TIMESTAMP, not NTZ,
    # for watermarks) whatever the parquet stored.
    "events": _st(
        ("event_id", LongType()),
        ("ts", TimestampType()),
        ("user_id", LongType()),
        ("event_type", StringType()),
        ("value", DoubleType()),
        ("props", StringType()),
    ),
    "documents": _st(
        ("doc_id", LongType()),
        ("text", StringType()),
        ("lang", StringType()),
        ("source", StringType()),
        ("n_chars", LongType()),
    ),
    "embeddings": _st(
        ("vec_id", LongType()),
        ("embedding", ArrayType(FloatType(), True)),
        ("label", IntegerType()),
    ),
}
