"""Scale-posture assertions: the *plans* must have the shape we'd want
on a 1000-executor cluster — pushdown reaching the scan, broadcasts for
small dims, no Exchange in pure projections.
"""

from pyspark.sql import functions as F

from aws_pandas_etl_spark.plans.queries import QUERIES
from aws_pandas_etl_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushed_to_parquet_scan(spark):
    df = QUERIES["q1_pricing_summary"](spark, SF)
    ex = df._jdf.queryExecution().toString()
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in ex


def test_q1_column_pruning(spark):
    df = QUERIES["q1_pricing_summary"](spark, SF)
    ex = df._jdf.queryExecution().toString()
    # ReadSchema must not include unused columns like l_partkey/l_comment
    read_schema = [l for l in ex.splitlines() if "ReadSchema" in l][0]
    assert "l_partkey" not in read_schema
    assert "l_orderkey" not in read_schema


def test_q3_q5_broadcast_dims(spark):
    for q in ("q3_shipping_priority", "q5_region_revenue"):
        plan = _plan(QUERIES[q](spark, SF))
        assert "BroadcastHashJoin" in plan, f"{q} should broadcast its dims"


def test_etl_projection_no_shuffle(spark):
    plan = _plan(QUERIES["etl_enriched_events"](spark, SF))
    assert "Exchange" not in plan


def test_topk_uses_take_ordered(spark):
    plan = _plan(QUERIES["q3_shipping_priority"](spark, SF))
    assert "TakeOrderedAndProject" in plan  # no global sort for LIMIT k


def test_scan_projection_only_needed_columns(spark):
    df = load_table(spark, SF, "lineitem").select("l_orderkey")
    ex = df._jdf.queryExecution().toString()
    read_schema = [l for l in ex.splitlines() if "ReadSchema" in l][0]
    assert "l_quantity" not in read_schema


def test_semi_join_for_exists(spark):
    plan = _plan(QUERIES["order_priority_counts"](spark, SF))
    assert "LeftSemi" in plan


def test_anti_join_for_not_exists(spark):
    plan = _plan(QUERIES["customers_without_urgent_orders"](spark, SF))
    assert "LeftAnti" in plan
