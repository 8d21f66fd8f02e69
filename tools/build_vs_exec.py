#!/usr/bin/env python
"""Decompose per-query bench time into BUILD (Python DataFrame
construction: load_table, py4j column building, analysis) vs EXEC
(noop-sink execution: optimization, scheduling, compute) — guide §1
"measure first": the bench's per-query number is build+exec, and the
two have completely different remedies (driver-side Python/py4j/
planning vs distributed execution), so optimizing without this split
is guesswork.

Usage:
    python tools/build_vs_exec.py [--only a,b,c] [--repeats 3]
Writes one JSON line {query: {"build": s, "exec": s}} to stdout and
tools/build_vs_exec.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from aws_pandas_etl_spark.session import get_spark  # noqa: E402
from aws_pandas_etl_spark.plans import queries as Q  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--only", default=None)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(REPO, "tools", "build_vs_exec.json"))
    args = ap.parse_args()

    spark = get_spark(app_name="build_vs_exec")
    # same warmup path as bench.py (JIT/codegen/python-worker pools)
    spark.range(1000).selectExpr("sum(id)").collect()
    warm = "/root/testdata/sf0.001"
    if os.path.isdir(warm):
        from aws_pandas_etl_spark.sources.readers import load_table

        w = load_table(spark, warm, "events")
        w.groupBy("event_type").count().collect()
        w.limit(64).mapInPandas(lambda it: it, schema=w.schema).write.format(
            "noop"
        ).mode("overwrite").save()
    try:
        Q.prebuild_shared_artifacts(spark, args.sf)
    except Exception as exc:
        print(f"# prebuild failed: {exc}", file=sys.stderr)

    names = sorted(Q.QUERIES)
    if args.only:
        names = [n for n in args.only.split(",") if n in Q.QUERIES]
    rows: dict[str, dict[str, float]] = {}
    for name in names:
        fn = Q.QUERIES[name]
        builds, execs = [], []
        ok = True
        for _ in range(args.repeats):
            t0 = time.monotonic()
            try:
                df = fn(spark, args.sf)
                t1 = time.monotonic()
                df.write.format("noop").mode("overwrite").save()
                t2 = time.monotonic()
            except Exception as exc:
                print(f"# {name}: ERROR {exc}", file=sys.stderr)
                ok = False
                break
            finally:
                spark.catalog.clearCache()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        if ok and builds:
            rows[name] = {
                "build": round(min(builds), 3),
                "exec": round(min(execs), 3),
                # min of the SUM is what bench.py reports; keep it too
                "total": round(min(b + e for b, e in zip(builds, execs)), 3),
            }
            print(
                f"# {name}: build {rows[name]['build']}s exec {rows[name]['exec']}s",
                file=sys.stderr,
            )
    tb = round(sum(r["build"] for r in rows.values()), 1)
    te = round(sum(r["exec"] for r in rows.values()), 1)
    out = {"n": len(rows), "sum_build": tb, "sum_exec": te, "queries": rows}
    with open(args.out, "w") as fh:
        json.dump(out, fh)
    print(json.dumps({"n": len(rows), "sum_build": tb, "sum_exec": te}))


if __name__ == "__main__":
    main()
