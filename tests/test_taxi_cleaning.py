"""Unit tests for the taxi cleaning operators (SURVEY.md §2 P3-P6, F1-F2,
S1-S3) on the dirty fixtures — the quirks SQL-on-clean-parquet can't reach
(FIXTURES.md §A): $-money with commas, AM/PM timestamps, DROPMALFORMED,
the legacy int-miles cast.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.taxi_fixtures import (
    make_trips,
    write_areas_csv,
    write_comm_areas_csv,
    write_trips_csv,
)
from tfm_taxitrips_spark.operators.cleaning import clean_trips
from tfm_taxitrips_spark.sources.readers import (
    read_comm_areas_csv,
    read_dimension_csv,
    read_trips_csv,
)

N_MALFORMED = 3


@pytest.fixture(scope="module")
def trips():
    return make_trips(400, seed=42)


@pytest.fixture(scope="module")
def trips_csv(trips, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("taxi") / "trips.csv")
    write_trips_csv(trips, path, malformed=N_MALFORMED)
    return path


def test_csv_scan_drops_malformed(spark, trips, trips_csv):
    """S1 + F2: explicit schema, AM/PM format, DROPMALFORMED.

    Materializes every column: Spark's CSV column pruning means malformed
    detection only applies to parsed columns (a bare count() sees all lines).
    """
    df = read_trips_csv(spark, trips_csv)
    assert len(df.collect()) == len(trips)  # malformed rows gone, good kept
    # and the malformed trip_ids are really absent from a full parse
    ids = {r.trip_id for r in df.select(*df.columns).collect()}
    assert not any(i.startswith("bad") for i in ids)


def test_money_parsing_with_commas(spark, trips, trips_csv):
    """P4: '$1,234.56' → 1234.56; the [$,)] strip must handle commas."""
    clean = clean_trips(read_trips_csv(spark, trips_csv))
    got = {r.trip_id: r.fare for r in clean.select("trip_id", "fare").collect()}
    big = [t for t in trips if t.fare >= 1000]
    assert big, "fixture must contain comma-money rows"
    for t in big:
        assert got[t.trip_id] == pytest.approx(t.fare)


def test_ampm_timestamps_and_partition_cols(spark, trips, trips_csv):
    """P6 + timestampFormat: hh:mm:ss a parses; year/month derived."""
    clean = clean_trips(read_trips_csv(spark, trips_csv))
    row = clean.where(F.col("trip_id") == trips[0].trip_id).first()
    assert row.trip_start_timestamp == trips[0].start
    assert row.year == trips[0].start.year
    assert row.month == trips[0].start.month
    # PM hour round-trips (12-hour parse is the classic failure mode)
    pm = [t for t in trips if t.start.hour >= 13]
    got = {
        r.trip_id: r.trip_start_timestamp
        for r in clean.select("trip_id", "trip_start_timestamp").collect()
    }
    for t in pm[:20]:
        assert got[t.trip_id] == t.start


def test_null_handling(spark, trips, trips_csv):
    """Empty CSV fields → typed nulls (seconds, areas, company)."""
    clean = clean_trips(read_trips_csv(spark, trips_csv))
    null_secs = clean.where(F.col("trip_seconds").isNull()).count()
    expected = len({t.trip_id for t in trips if t.seconds is None})
    # duplicated trips share trip_id; count rows not ids
    expected_rows = sum(1 for t in trips if t.seconds is None)
    assert null_secs == expected_rows
    assert expected >= 1


def test_legacy_int_miles_quirk(spark, trips, trips_csv):
    """The reference casts trip_miles to INT (truncation,
    /root/reference/IngestHistoricTrips.py:77). Both behaviors available."""
    raw = read_trips_csv(spark, trips_csv)
    modern = clean_trips(raw).where(F.col("trip_id") == trips[0].trip_id).first()
    legacy = (
        clean_trips(raw, legacy_int_miles=True)
        .where(F.col("trip_id") == trips[0].trip_id)
        .first()
    )
    assert modern.trip_miles == pytest.approx(trips[0].miles)
    assert legacy.trip_miles == int(trips[0].miles)


def test_dimension_csv_scan(spark, tmp_path):
    """S2: areas dimension read with explicit schema."""
    path = str(tmp_path / "areas.csv")
    write_areas_csv(path)
    areas = read_dimension_csv(spark, path)
    assert areas.count() == 77
    row = areas.where(F.col("area_number") == 5).first()
    assert row.community == "COMMUNITY_5"


def test_comm_areas_headerless_scan(spark, tmp_path):
    """S3: ';'-separated headerless scan (/root/reference/AreasLoc.py:73-74)."""
    path = str(tmp_path / "comm.csv")
    write_comm_areas_csv(path)
    comm = read_comm_areas_csv(spark, path)
    assert comm.count() == 77
    row = comm.where(F.col("area_number") == 9).first()
    assert row.community == "COMMUNITY_9"
    assert row.the_geom.startswith("MULTIPOLYGON")


def test_quarantine_captures_malformed_rows(spark, tmp_path):
    """PERMISSIVE + corrupt-record capture: good rows parse to the declared
    schema, malformed lines land in the quarantine frame verbatim."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    from tfm_taxitrips_spark.sources.readers import read_csv_with_quarantine

    p = tmp_path / "in.csv"
    p.write_text("1,10\n2,notanint\n3,30\ncompletely,broken,extra\n")
    schema = StructType(
        [StructField("id", IntegerType()), StructField("v", IntegerType())]
    )
    good, quarantine = read_csv_with_quarantine(spark, str(p), schema)
    assert {(r.id, r.v) for r in good.collect()} == {(1, 10), (3, 30)}
    bad = [r.raw_line for r in quarantine.collect()]
    assert len(bad) == 2
    assert "notanint" in bad[0] or "notanint" in bad[1]
