from tfm_taxitrips_spark.queries.registry import QuerySpec, all_queries  # noqa: F401
