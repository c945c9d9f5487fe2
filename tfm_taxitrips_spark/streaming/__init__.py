from tfm_taxitrips_spark.streaming.pipeline import (  # noqa: F401
    read_events_stream,
    run_to_memory,
    windowed_rollup,
)
