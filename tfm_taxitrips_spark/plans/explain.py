"""Plan-inspection helpers (SURVEY.md §4).

The engine's performance contract is expressed as plan properties —
"dimension joins broadcast", "filters reach the scan", "top-k never global
sorts" — and asserted in tests (tests/test_plans.py) so a regression in
join strategy or pushdown fails CI, not a 100 TB run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    """The `.explain('formatted')` text, returned instead of printed."""
    jdf = df._jdf
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return jdf.queryExecution().explainString(mode)


def plan_contains(df: DataFrame, *needles: str) -> dict[str, bool]:
    plan = explain_formatted(df)
    return {n: (n in plan) for n in needles}
