"""Round-trip tests for the format-agnostic batch sink/source seams
(write_table / read_table): every supported format must reproduce the
written rows exactly, text formats must honor an explicit schema (no
inference pass), and unsupported formats fail loudly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tfm_taxitrips_spark.sinks.writers import write_table
from tfm_taxitrips_spark.sources.readers import read_table, table


def _sample(spark, sf_smoke):
    return (
        table(spark, sf_smoke, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .limit(200)
    )


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_roundtrip_exact(spark, sf_smoke, tmp_path, fmt):
    df = _sample(spark, sf_smoke)
    path = str(tmp_path / fmt)
    opts = {"header": "true"} if fmt == "csv" else {}
    write_table(df, path, fmt=fmt, **opts)
    schema = (
        None if fmt in ("parquet", "orc")
        else "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
             "o_totalprice double"
    )
    back = read_table(spark, path, fmt=fmt, schema=schema, **opts)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_partitioned_write_prunes(spark, sf_smoke, tmp_path):
    df = _sample(spark, sf_smoke)
    path = str(tmp_path / "part")
    write_table(df, path, fmt="orc", partition_by=("o_orderstatus",))
    back = read_table(spark, path, fmt="orc").where(F.col("o_orderstatus") == "F")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert back.count() == df.where("o_orderstatus = 'F'").count()
    # partition filter must reach the scan as a partition (not data) filter
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan


def test_unsupported_format_raises(spark, sf_smoke, tmp_path):
    df = _sample(spark, sf_smoke)
    with pytest.raises(ValueError, match="unsupported batch format"):
        write_table(df, str(tmp_path / "x"), fmt="avro")
