"""Placeholder — populated in a later milestone."""
from tfm_taxitrips_spark.queries.registry import QuerySpec

QUERIES: dict[str, QuerySpec] = {}
