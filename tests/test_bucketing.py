"""Bucketing demo: pre-bucketed tables join WITHOUT a shuffle — the
co-located-join strategy for repeated big-big joins at scale (bucket
both fact tables by the join key at write time; every subsequent join
reads co-located buckets)."""

import shutil

import pytest
from pyspark.sql import functions as F

from aws_pandas_etl_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    load_table(spark, SF, "lineitem").write.bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).mode("overwrite").saveAsTable("li_bucketed")
    load_table(spark, SF, "orders").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    ).write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
        "overwrite"
    ).saveAsTable("ord_bucketed")
    yield
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    shutil.rmtree("/root/repo/spark-warehouse", ignore_errors=True)


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    li = spark.table("li_bucketed")
    orders = spark.table("ord_bucketed")
    joined = li.join(orders, "l_orderkey").where(F.col("o_totalprice") > 0)
    # disable broadcast so the join strategy decision is about buckets
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # co-located buckets: no shuffle
    assert joined.count() == 6000
