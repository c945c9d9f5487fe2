from tfm_taxitrips_spark.sinks.writers import (  # noqa: F401
    write_jdbc_view,
    write_kafka_stream,
    write_parquet_partitioned,
    write_parquet_stream,
    write_single_csv,
    write_view,
)
