from tfm_taxitrips_spark.plans.explain import explain_formatted, plan_contains  # noqa: F401
