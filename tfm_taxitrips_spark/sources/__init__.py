from tfm_taxitrips_spark.sources.readers import (  # noqa: F401
    read_comm_areas_csv,
    read_dimension_csv,
    read_trips_csv,
    read_trips_parquet,
    table,
)
from tfm_taxitrips_spark.sources.streams import (  # noqa: F401
    read_json_file_stream,
    read_kafka_stream,
    parse_json_payload,
)
