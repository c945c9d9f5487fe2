"""Enrichment + view-family tests (SURVEY.md §2.5 J1-J3, §2.6 A3-A4) with
independently-computed Python goldens, including the A4 countDistinct
semantics decision (SURVEY.md §2.6: we compute TRUE distinct taxis; the
reference counts distinct per-company taxi-counts)."""

from __future__ import annotations

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from tests.taxi_fixtures import make_trips, write_areas_csv, write_trips_csv
from tfm_taxitrips_spark.operators.cleaning import clean_trips
from tfm_taxitrips_spark.operators.enrich import enrich_trips_with_areas
from tfm_taxitrips_spark.pipelines import trip_views
from tfm_taxitrips_spark.sources.readers import read_dimension_csv, read_trips_csv


@pytest.fixture(scope="module")
def trips():
    return make_trips(400, seed=7)


@pytest.fixture(scope="module")
def frames(spark, trips, tmp_path_factory):
    d = tmp_path_factory.mktemp("taxi_views")
    trips_path, areas_path = str(d / "trips.csv"), str(d / "areas.csv")
    write_trips_csv(trips, trips_path, malformed=0)
    write_areas_csv(areas_path)
    clean = clean_trips(read_trips_csv(spark, trips_path)).dropDuplicates(["trip_id"])
    areas = read_dimension_csv(spark, areas_path)
    return clean, areas


def test_left_join_keeps_unknown_areas(spark, trips, frames):
    """J1 batch semantics: trips with null pickup area survive with null name."""
    clean, areas = frames
    enriched = enrich_trips_with_areas(clean, areas, how="left")
    assert enriched.count() == clean.count()
    null_named = enriched.where(F.col("pickup_community_area_name").isNull()).count()
    expected = len({t.trip_id for t in trips if t.pickup_area is None})
    assert null_named == expected
    assert expected > 0


def test_inner_join_drops_unknown_areas(spark, trips, frames):
    """J2 streaming semantics: unknown areas are dropped (the reference's
    Druid feed, /root/reference/StreamingTaxiTrips.py:140-141)."""
    clean, areas = frames
    enriched = enrich_trips_with_areas(clean, areas, how="inner")
    expected = len(
        {t.trip_id for t in trips if t.pickup_area is not None and t.dropoff_area is not None}
    )
    assert enriched.count() == expected


def test_view_family_golden(spark, trips, frames):
    """A3+A4: the rollup family vs Python-computed goldens."""
    clean, areas = frames
    views = trip_views(clean, areas)
    companies_view = views["companies_pickup_area_view"].toPandas()
    area_view = views["pickup_area_view"].toPandas()

    # golden from the fixture rows (first occurrence per trip_id = dedup)
    seen, rows = set(), []
    for t in trips:
        if t.trip_id not in seen:
            seen.add(t.trip_id)
            rows.append(t)

    g_fare = defaultdict(float)
    g_trips = defaultdict(int)
    g_taxis = defaultdict(set)
    for t in rows:
        key = (t.start.date(), t.company, t.pickup_area)
        g_fare[key] += t.fare
        g_trips[key] += 1
        g_taxis[key].add(t.taxi_id)

    import pandas as pd

    def norm_area(v):
        return None if pd.isna(v) else int(v)

    got = {
        (
            r.trip_start_date.date(),
            None if pd.isna(r.company) else r.company,
            norm_area(r.pickup_community_area),
        ): r
        for r in companies_view.itertuples()
    }
    assert len(got) == len(g_fare)
    for key, fare in g_fare.items():
        r = got[key]
        assert r.fare == pytest.approx(fare, abs=1e-6), key
        assert r.trips == g_trips[key], key
        assert r.taxis == len(g_taxis[key]), key

    # A4 decision: area view counts TRUE distinct taxis (not the reference's
    # distinct-of-per-company-counts bug)
    a_taxis = defaultdict(set)
    for t in rows:
        a_taxis[(t.start.date(), t.pickup_area)].update([t.taxi_id])
    got_area = {
        (r.trip_start_date.date(), norm_area(r.pickup_community_area)): r.taxis
        for r in area_view.itertuples()
    }
    for key, taxis in a_taxis.items():
        assert got_area[key] == len(taxis), key


def test_rollup_level_sums_consistent(spark, frames):
    """Property (SURVEY.md §5.5): lvl-1 totals equal the sum of lvl-0 rows."""
    clean, areas = frames
    views = trip_views(clean, areas)
    lvl0 = views["companies_pickup_area_view"]
    lvl1 = views["pickup_area_view"]
    s0 = lvl0.agg(F.sum("fare").alias("f"), F.sum("trips").alias("t")).first()
    s1 = lvl1.agg(F.sum("fare").alias("f"), F.sum("trips").alias("t")).first()
    assert s0.f == pytest.approx(s1.f, abs=1e-6)
    assert s0.t == s1.t
