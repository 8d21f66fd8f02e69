#!/usr/bin/env python
"""Verify WHERE AQE's skew-join mitigation engages — measured, not assumed.

Two join shapes on the p=90 skew clone, AQE skew-join on vs off, with
the executed plan's own markers (``SortMergeJoin(skew=true)`` /
``AQEShuffleRead ... skewed``):

1. scan ⋈ scan (events ⋈ customer on user_id) — the canonical
   OptimizeSkewedJoin pattern: Sort directly over the shuffle stage on
   both sides.  ENGAGES.
2. scan ⋈ aggregate (events ⋈ per-user totals) — a HashAggregate sits
   between the shuffle stage and the join's Sort, so the rule's
   pattern match fails and the hot partition is NOT split.  DOES NOT
   ENGAGE — the measured reason the engine carries its own skew-immune
   twins (prefix sums, pre-aggregation, affine scans) instead of
   delegating "join skew" wholesale to AQE.

AQE's byte thresholds are scaled to the harness corpus (1 MB floor vs
the 256 MB production default — the clone's hot partition compresses
to single-digit MB: repeated offset-id copies are lz4 candy); at
100 TB the defaults see the same skew without tuning.

Usage: python tools/aqe_skew_probe.py [--dir /tmp/spark_graft_probe/x10_skew90]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aws_pandas_etl_spark.session import get_spark
from aws_pandas_etl_spark.sources.readers import load_table

_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "512k",
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/spark_graft_probe/x10_skew90")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark(app_name="aqe_skew_probe")
    ev = load_table(spark, args.dir, "events").select("user_id", "value")
    cust = load_table(spark, args.dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_acctbal"
    )

    def shapes():
        totals = ev.groupBy("user_id").agg(F.sum("value").alias("tot"))
        return {
            "scan⋈scan (events⋈customer)": ev.join(cust, "user_id"),
            "scan⋈aggregate (events⋈user_totals)": ev.join(totals, "user_id"),
        }

    def run(df) -> tuple[float, bool]:
        best, marker = None, False
        for _ in range(args.repeats):
            qe = df._jdf.queryExecution()
            t0 = time.monotonic()
            qe.toRdd().count()  # executes THIS QueryExecution (final AQE plan)
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
            marker = marker or ("skew=true" in qe.executedPlan().toString())
        return best, marker

    for k, v in _CONFS.items():
        spark.conf.set(k, v)
    try:
        for label in list(shapes()):
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
            t_off, _ = run(shapes()[label])
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
            t_on, marker = run(shapes()[label])
            print(
                f"| {label} @p=90 | {t_off:.1f} s (skewJoin off) | "
                f"{t_on:.1f} s (on, {t_off / max(t_on, 1e-9):.1f}x) | "
                f"engaged: {marker} |"
            )
            sys.stdout.flush()
    finally:
        for k in (*_CONFS, "spark.sql.adaptive.skewJoin.enabled"):
            spark.conf.unset(k)


if __name__ == "__main__":
    main()
