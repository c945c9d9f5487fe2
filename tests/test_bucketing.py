"""Bucketed co-located join: the shuffle paid at write time must not be
paid again at join time (operators/bucketing.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tfm_taxitrips_spark.operators.bucketing import bucketed_join, write_bucketed
from tfm_taxitrips_spark.plans.explain import explain_formatted
from tfm_taxitrips_spark.sources.readers import table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_smoke, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    write_bucketed(
        table(spark, sf_smoke, "lineitem"), "li_bkt", ["l_orderkey"], 8,
        path=str(base / "li"),
    )
    write_bucketed(
        table(spark, sf_smoke, "orders").withColumnRenamed("o_orderkey", "l_orderkey"),
        "ord_bkt", ["l_orderkey"], 8, path=str(base / "ord"),
    )
    yield "li_bkt", "ord_bkt"
    spark.sql("DROP TABLE IF EXISTS li_bkt")
    spark.sql("DROP TABLE IF EXISTS ord_bkt")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    # force the sort-merge path: a broadcast join would trivially have no
    # exchange and prove nothing about bucketing
    with_conf = spark.conf
    old = with_conf.get("spark.sql.autoBroadcastJoinThreshold")
    with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, left, right, "l_orderkey")
        plan = explain_formatted(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
    finally:
        with_conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_plain_join(spark, sf_smoke, bucketed_tables):
    left, right = bucketed_tables
    got = bucketed_join(spark, left, right, "l_orderkey").count()
    li = table(spark, sf_smoke, "lineitem")
    ords = table(spark, sf_smoke, "orders")
    expected = li.join(ords, li.l_orderkey == ords.o_orderkey).count()
    assert got == expected


def test_bucketed_agg_has_no_exchange(spark, bucketed_tables):
    """Grouping on the bucket key also reuses the write-time distribution."""
    left, _ = bucketed_tables
    agg = spark.table(left).groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = explain_formatted(agg)
    assert "Exchange" not in plan, plan
