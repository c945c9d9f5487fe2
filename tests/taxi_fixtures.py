"""Deterministic dirty taxi fixtures (FIXTURES.md §A).

Replicates the reference's input quirks: $-money with commas, 12-hour
AM/PM timestamps, empty census tracts, null community areas/companies,
duplicate trip_ids, and fully malformed CSV rows.
"""

from __future__ import annotations

import random
from dataclasses import dataclass

COMPANIES = [
    "Flash Cab", "Taxi Affiliation Services", "Yellow Cab", "Blue Diamond",
    "Chicago Carriage", "City Service", "Sun Taxi", "Star North",
    "Medallion Leasing", "Top Cab", "Globe Taxi", "Patriot Taxi",
]
PAYMENT_TYPES = ["Cash", "Credit Card", "Prcard", "Unknown"]

CSV_HEADER = (
    "Trip ID,Taxi ID,Trip Start Timestamp,Trip End Timestamp,Trip Seconds,"
    "Trip Miles,Pickup Census Tract,Dropoff Census Tract,Pickup Community Area,"
    "Dropoff Community Area,Fare,Tips,Tolls,Extras,Trip Total,Payment Type,"
    "Company,Pickup Centroid Latitude,Pickup Centroid Longitude,"
    "Pickup Centroid Location,Dropoff Centroid Latitude,"
    "Dropoff Centroid Longitude,Dropoff Centroid Location"
)


@dataclass
class Trip:
    trip_id: str
    taxi_id: str
    start: "object"  # datetime
    seconds: int | None
    miles: float
    pickup_area: int | None
    dropoff_area: int | None
    fare: float
    tips: float
    tolls: float
    extras: float
    payment_type: str
    company: str | None

    @property
    def total(self) -> float:
        return round(self.fare + self.tips + self.tolls + self.extras, 2)


def _money(v: float) -> str:
    return f"${v:,.2f}"


def _ts(dt) -> str:
    # MM/dd/yyyy hh:mm:ss a — 12-hour with AM/PM (IngestHistoricTrips.py:68)
    return dt.strftime("%m/%d/%Y %I:%M:%S %p")


def make_trips(n: int = 400, seed: int = 42) -> list[Trip]:
    from datetime import datetime, timedelta

    rng = random.Random(seed)
    base = datetime(2017, 1, 1, 0, 0, 0)
    trips: list[Trip] = []
    for i in range(n):
        start = base + timedelta(minutes=15 * rng.randrange(0, 4 * 24 * 180))
        fare = round(rng.uniform(3.25, 80.0), 2)
        if rng.random() < 0.1:
            fare = round(rng.uniform(1000.0, 2000.0), 2)  # comma territory
        trips.append(
            Trip(
                trip_id=f"{i:040x}",
                taxi_id=str(rng.randrange(1, 101)),
                start=start,
                seconds=None if rng.random() < 0.03 else rng.randrange(60, 7200),
                miles=round(rng.uniform(0.0, 30.0), 1),
                pickup_area=None if rng.random() < 0.05 else rng.randrange(1, 78),
                dropoff_area=None if rng.random() < 0.05 else rng.randrange(1, 78),
                fare=fare,
                tips=round(rng.uniform(0, 20.0), 2),
                tolls=0.0 if rng.random() < 0.9 else round(rng.uniform(0.5, 5.0), 2),
                extras=round(rng.choice([0.0, 0.0, 1.0, 1.5, 2.0]), 2),
                payment_type=rng.choice(PAYMENT_TYPES),
                company=None if rng.random() < 0.08 else rng.choice(COMPANIES),
            )
        )
    # ~10% duplicate trip_ids (streaming double-writes; FIXTURES.md A1)
    dupes = rng.sample(trips, n // 10)
    trips.extend(dupes)
    return trips


def trip_csv_row(t: Trip) -> str:
    from datetime import timedelta

    end = t.start + timedelta(seconds=t.seconds or 0)
    lat_p = f"41.8{(t.pickup_area or 0):02d}"
    lon_p = f"-87.6{(t.pickup_area or 0):02d}"
    lat_d = f"41.8{(t.dropoff_area or 0):02d}"
    lon_d = f"-87.6{(t.dropoff_area or 0):02d}"
    fields = [
        t.trip_id,
        t.taxi_id,
        _ts(t.start),
        _ts(end),
        "" if t.seconds is None else str(t.seconds),
        str(t.miles),
        "",  # pickup census tract (mostly empty — FIXTURES.md A1)
        "",
        "" if t.pickup_area is None else str(t.pickup_area),
        "" if t.dropoff_area is None else str(t.dropoff_area),
        _money(t.fare),
        _money(t.tips),
        _money(t.tolls),
        _money(t.extras),
        _money(t.total),
        t.payment_type,
        t.company or "",
        lat_p if t.pickup_area else "",
        lon_p if t.pickup_area else "",
        f"POINT ({lon_p} {lat_p})" if t.pickup_area else "",
        lat_d if t.dropoff_area else "",
        lon_d if t.dropoff_area else "",
        f"POINT ({lon_d} {lat_d})" if t.dropoff_area else "",
    ]
    return ",".join(f'"{f}"' if "," in f else f for f in fields)


def write_trips_csv(trips: list[Trip], path: str, malformed: int = 3) -> None:
    lines = [CSV_HEADER] + [trip_csv_row(t) for t in trips]
    # malformed rows: garbage timestamps (DROPMALFORMED must reject them)
    for i in range(malformed):
        lines.append(f"bad{i},42,not-a-timestamp,also-bad,x,y,,,1,2,$1.00,$0.00,$0.00,$0.00,$1.00,Cash,Flash Cab,,,,,,")
    with open(path, "w") as f:
        f.write("\n".join(lines))


def trip_json_row(t: Trip) -> dict:
    """Wire format of the Kafka producer: all strings, raw CSV values
    (/root/reference/kafkaTaxiTripsProducer.py:33-47)."""
    from datetime import timedelta

    end = t.start + timedelta(seconds=t.seconds or 0)
    return {
        "trip_id": t.trip_id,
        "taxi_id": t.taxi_id,
        "trip_start_timestamp": _ts(t.start),
        "trip_end_timestamp": _ts(end),
        "trip_seconds": None if t.seconds is None else str(t.seconds),
        "trip_miles": str(t.miles),
        "pickup_census_tract": None,
        "dropoff_census_tract": None,
        "pickup_community_area": None if t.pickup_area is None else str(t.pickup_area),
        "dropoff_community_area": None if t.dropoff_area is None else str(t.dropoff_area),
        "fare": _money(t.fare),
        "tips": _money(t.tips),
        "tolls": _money(t.tolls),
        "extras": _money(t.extras),
        "trip_total": _money(t.total),
        "payment_type": t.payment_type,
        "company": t.company,
        "pickup_centroid_latitude": None,
        "pickup_centroid_longitude": None,
        "pickup_centroid_location": None,
        "dropoff_centroid_latitude": None,
        "dropoff_centroid_longitude": None,
        "dropoff_centroid_location": None,
    }


def write_areas_csv(path: str) -> None:
    lines = ["area_number,community,area_centroid_latitude,area_centroid_longitude,the_geom"]
    for a in range(1, 78):
        lines.append(
            f"{a},COMMUNITY_{a},41.8{a:02d},-87.6{a:02d},MULTIPOLYGON (({a} {a}))"
        )
    with open(path, "w") as f:
        f.write("\n".join(lines))


def write_comm_areas_csv(path: str) -> None:
    """Headerless ';'-separated, 10 cols, area_number at position 6 and
    community at 7, matching the reference layout exactly
    (/root/reference/AreasLoc.py:60-74)."""
    lines = []
    for a in range(1, 78):
        lines.append(
            f"MULTIPOLYGON (({a} {a}));p{a};ar{a};ca{a};id{a};{a};COMMUNITY_{a};{a};sa{a};sl{a}"
        )
    with open(path, "w") as f:
        f.write("\n".join(lines))
