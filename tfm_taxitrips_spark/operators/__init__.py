from tfm_taxitrips_spark.operators.cleaning import (  # noqa: F401
    clean_trips,
    parse_money,
    with_year_month,
)
from tfm_taxitrips_spark.operators.enrich import (  # noqa: F401
    enrich_trips_with_areas,
    role_play,
)
from tfm_taxitrips_spark.operators.dedup import dedup_exact  # noqa: F401
from tfm_taxitrips_spark.operators.topk import top_k_by_group  # noqa: F401
