"""Deterministic aggregate helpers.

Floating-point SUM is order-dependent, and shuffle order is not: the same
query can hash differently between runs/engines. Money/quantity columns are
summed in DECIMAL (exact, associative) and cast back to DOUBLE, which is
bit-identical across Spark partitionings AND across engines (the DuckDB
oracle uses the same ``CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)``
shape). The reference sums raw doubles
(/root/reference/TransformTaxiTrips.py:106-110) — fine for dashboards,
not for a correctness gate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, precision: int = 18, scale: int = 2) -> Column:
    """Order-independent SUM: sum in decimal, return double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


#: alias with the domain name used by the view builders
money_sum = dsum


def dsum_sql(expr: str, precision: int = 18, scale: int = 2) -> str:
    """The DuckDB-side rendering of :func:`dsum` for oracle SQL strings."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS DOUBLE)"
