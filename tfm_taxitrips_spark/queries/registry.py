"""Query registry — the single source for ``__spark_entry__.queries()`` /
``oracle_sql()`` and for ``bench.py``.

Each entry pairs a PySpark query (``fn(spark, sf_dir) -> DataFrame``) with
the ANSI-SQL oracle DuckDB runs on the same parquet. Column aliases match
exactly on both sides (the driver's compare sorts columns by name and
hashes values). Entries with ``oracle=None`` are non-SQL-expressible and get
the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


def all_queries() -> dict[str, QuerySpec]:
    from tfm_taxitrips_spark.queries import (
        dataprep,
        multimodal,
        relational,
        sketches,
        sqlsuite,
        streamq,
        temporal,
        text,
        vectors,
    )

    merged: dict[str, QuerySpec] = {}
    for module in (relational, text, vectors, streamq, multimodal, temporal,
                   sqlsuite, sketches, dataprep):
        for name, spec in module.QUERIES.items():
            if name in merged:
                raise ValueError(f"duplicate query name: {name}")
            merged[name] = spec
    return merged
