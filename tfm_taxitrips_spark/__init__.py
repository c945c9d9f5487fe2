"""tfm_taxitrips_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference pipeline (albercn/tfm_taxitrips: Kafka/CSV taxi-trip ingestion,
cleaning, star-schema enrichment, rollup views, streaming), re-expressed
Spark-first: DataFrame/SQL logical plans optimized by Catalyst, Structured
Streaming for the real-time path, and built-in (JVM/codegen) expressions in
every hot path.

Layout
------
- ``session``    SparkSession factory (AQE, tuned shuffle, UTC)
- ``config``     engine config surface (mirrors the reference's
                 ``taxi_trips_config`` keys; SURVEY.md §0)
- ``schemas``    explicit StructType registry (SURVEY.md §1.4)
- ``sources``    batch + streaming readers (SURVEY.md §2.1)
- ``sinks``      batch + streaming writers (SURVEY.md §2.2)
- ``operators``  cleaning / enrichment / dedup / rollup / top-k operators
- ``functions``  scalar & vector function library (text, similarity)
- ``streaming``  windowed rollups, stream pipelines (SURVEY.md §2.9)
- ``queries``    the query registry exported through ``__spark_entry__``
"""

__version__ = "0.1.0"
