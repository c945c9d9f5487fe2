"""Dimension enrichment (SURVEY.md §2.3 P2, §2.5 J1-J3).

The areas dimension is tiny (77 rows; Chicago community areas) and
role-played twice per query (pickup/dropoff). At 100 TB of fact data the
only sane physical plan is a broadcast-hash join on each role — never a
shuffle of the fact table — so ``F.broadcast`` is explicit rather than left
to the autoBroadcastJoinThreshold heuristic.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def role_play(dim: DataFrame, renames: Mapping[str, str]) -> DataFrame:
    """P2 — rename-project a dimension into one role (pickup/dropoff)
    (/root/reference/TransformTaxiTrips.py:77-89,
    /root/reference/StreamingTaxiTrips.py:33-45)."""
    return dim.select([F.col(src).alias(dst) for src, dst in renames.items()])


def pickup_areas(areas: DataFrame) -> DataFrame:
    return role_play(
        areas,
        {
            "area_number": "pickup_community_area",
            "community": "pickup_community_area_name",
            "area_centroid_latitude": "pickup_area_centroid_latitude",
            "area_centroid_longitude": "pickup_area_centroid_longitude",
        },
    )


def dropoff_areas(areas: DataFrame) -> DataFrame:
    return role_play(
        areas,
        {
            "area_number": "dropoff_community_area",
            "community": "dropoff_community_area_name",
            "area_centroid_latitude": "dropoff_area_centroid_latitude",
            "area_centroid_longitude": "dropoff_area_centroid_longitude",
        },
    )


def enrich_trips_with_areas(
    trips: DataFrame, areas: DataFrame, how: str = "left"
) -> DataFrame:
    """J1/J2 — the double role-playing join.

    ``how='left'`` is the batch path (/root/reference/TransformTaxiTrips.py:93-94:
    trips with unknown areas survive with null names); ``how='inner'`` is the
    streaming path (/root/reference/StreamingTaxiTrips.py:140-141: unknown
    areas are dropped before Druid). The semantic difference is intentional
    and preserved (SURVEY.md §2.5).

    USING-column semantics: the join key appears once in the output.
    """
    return trips.join(
        F.broadcast(pickup_areas(areas)), "pickup_community_area", how
    ).join(F.broadcast(dropoff_areas(areas)), "dropoff_community_area", how)


def build_areas_dimension(trips_2017: DataFrame, comm_areas: DataFrame) -> DataFrame:
    """J3 + A2 + F1 — derive the areas master the way AreasLoc does
    (/root/reference/AreasLoc.py:47-80): filter mappable trips, project
    distinct (area, centroid) triples, inner-join the CommAreas names.
    """
    from tfm_taxitrips_spark.operators.cleaning import filter_unmapped_areas

    # min_by pair keyed on (lat, lon): ONE deterministic centroid per area
    # regardless of partition order (a bare dropDuplicates(['area_number'])
    # would keep an arbitrary row when dirty data carries several distinct
    # centroid strings for an area; the reference's full-row dropDuplicates
    # instead keeps ALL variants, duplicating the area in the master).
    centroids = (
        filter_unmapped_areas(trips_2017)
        .select(
            F.col("pickup_community_area").alias("area_number"),
            F.struct(
                F.col("pickup_centroid_latitude").alias("area_centroid_latitude"),
                F.col("pickup_centroid_longitude").alias("area_centroid_longitude"),
            ).alias("_c"),
        )
        .groupBy("area_number")
        .agg(F.min("_c").alias("_c"))
        .select("area_number", "_c.area_centroid_latitude", "_c.area_centroid_longitude")
    )
    names = comm_areas.select(
        F.col("area_number"), F.col("community"), F.col("the_geom")
    )
    return centroids.join(names, "area_number").select(
        "area_number",
        "community",
        "area_centroid_latitude",
        "area_centroid_longitude",
        "the_geom",
    )
