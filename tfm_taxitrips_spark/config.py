"""Engine configuration surface.

The reference imports a (missing) ``taxi_trips_config`` module
(``/root/reference/StreamingTaxiTrips.py:5``,
``/root/reference/TransformTaxiTrips.py:11``,
``/root/reference/IngestHistoricTrips.py:12``) whose keys are: ``trips_path``,
``area_path``, ``csv_input_path``, ``jbdc_url`` (sic), ``jdbc_user``,
``kafka_brokers``, ``kafka_inTopic``, ``kafka_outTopic``,
``checkpointKafka_path``, ``checkpointHDFS_path``.

This module is the equivalent surface, as a dataclass with environment
overrides (``TAXI_<FIELD>``), so the same pipeline code runs against local
dirs in tests and s3/hdfs/kafka/jdbc endpoints in production.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field, fields


@dataclass
class EngineConfig:
    # batch storage
    trips_path: str = "/tmp/tfm_taxitrips/trips"          # canonical parquet, partitioned year/month
    area_path: str = "/tmp/tfm_taxitrips/areas.csv"       # areas dimension csv
    csv_input_path: str = "/tmp/tfm_taxitrips/raw"        # yearly historic csv dumps
    views_path: str = "/tmp/tfm_taxitrips/views"          # materialized rollup views (parquet seam)

    # jdbc serving layer (reference: PostgreSQL; `jbdc_url` typo fixed)
    jdbc_url: str = ""
    jdbc_user: str = ""
    jdbc_password: str = ""
    jdbc_driver: str = "org.postgresql.Driver"

    # kafka real-time path
    kafka_brokers: str = ""
    kafka_in_topic: str = "taxi-trips-in"
    kafka_out_topic: str = "taxi-trips-out"

    # streaming checkpoints (one dir per sink — SURVEY.md §2.9)
    checkpoint_kafka_path: str = "/tmp/tfm_taxitrips/chk/kafka"
    checkpoint_hdfs_path: str = "/tmp/tfm_taxitrips/chk/parquet"

    # streaming knobs
    parquet_trigger: str = "15 minutes"   # reference: StreamingTaxiTrips.py:158
    watermark_delay: str = "15 minutes"   # owns the Druid-rollup lateness budget (SURVEY §2.9)
    window_duration: str = "15 minutes"   # Druid segment granularity analog

    extra: dict = field(default_factory=dict)

    @classmethod
    def from_env(cls, **overrides) -> "EngineConfig":
        kwargs = {}
        for f in fields(cls):
            if f.name == "extra":
                continue
            env_key = f"TAXI_{f.name.upper()}"
            if env_key in os.environ:
                kwargs[f.name] = os.environ[env_key]
        kwargs.update(overrides)
        return cls(**kwargs)
