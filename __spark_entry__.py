"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`tfm_taxitrips_spark.queries.registry` — the engine's
query registry is the single source of truth; this file only adapts it to
the driver's ``entry`` / ``queries`` / ``oracle_sql`` interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tfm_taxitrips_spark.queries.registry import all_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §3.1 analog) on sf0.001; driver checks rows>0."""
    from tfm_taxitrips_spark.queries.relational import q_flagship_view

    return q_flagship_view(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted → rows-only check)."""
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
