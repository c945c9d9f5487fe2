from tfm_taxitrips_spark.functions.aggregates import dsum, money_sum  # noqa: F401
