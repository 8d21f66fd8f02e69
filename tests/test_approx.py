"""Approximate algorithms (HLL count-distinct, approximate quantiles).

These are first-class at 100 TB (exact distinct on a hot key is a
shuffle; HLL is a mergeable sketch) but their outputs are
engine-specific, so they get tolerance tests against the exact answers
rather than DuckDB oracles (SURVEY §5: driver records rows-only checks
for non-SQL-expressible ops — here we keep them out of the registry and
pin accuracy in tests instead)."""

from pyspark.sql import functions as F

from aws_pandas_etl_spark.sources.readers import load_table

SF = "/root/testdata/sf0.01"


def test_hll_distinct_within_tolerance(spark):
    ev = load_table(spark, SF, "events")
    exact = ev.select(F.countDistinct("user_id").alias("n")).first()["n"]
    approx = ev.select(
        F.approx_count_distinct("user_id", rsd=0.02).alias("n")
    ).first()["n"]
    assert abs(approx - exact) <= max(3, 0.06 * exact)


def test_hll_distinct_per_key_within_tolerance(spark):
    ev = load_table(spark, SF, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    approx = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(3, 0.06 * n), k


def test_approx_percentile_within_tolerance(spark):
    ev = load_table(spark, SF, "events")
    [p50, p95] = ev.select(
        F.percentile_approx("value", [0.5, 0.95], 10_000).alias("p")
    ).first()["p"]
    exact = ev.approxQuantile("value", [0.5, 0.95], 0.0)  # 0.0 = exact
    assert abs(p50 - exact[0]) <= 0.01 * max(1.0, abs(exact[0]))
    assert abs(p95 - exact[1]) <= 0.01 * max(1.0, abs(exact[1]))
