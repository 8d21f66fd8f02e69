#!/usr/bin/env python
"""Capture .explain("formatted") output for named queries into
plans/r15/<query>_<tag>.txt (guide §1/§7.2: plan evidence for every
optimization claim — Exchange count, join strategy, PushedFilters,
ReadSchema, WholeStageCodegen spans, Python-boundary nodes).

Usage:
    python tools/capture_plans.py --tag before --only q1_pricing_summary,...
    python tools/capture_plans.py --tag after  --only ...

Streaming queries (writeStream scaffolds) cannot be explained without
executing; for those the tool records the pre-sink DataFrame plan when
the query module exposes a `_plan_only` hook, else skips with a note.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from aws_pandas_etl_spark.session import get_spark  # noqa: E402
from aws_pandas_etl_spark.plans import queries as Q  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--tag", required=True)
    ap.add_argument("--only", required=True)
    ap.add_argument("--outdir", default=os.path.join(REPO, "plans", "r15"))
    args = ap.parse_args()

    os.makedirs(args.outdir, exist_ok=True)
    spark = get_spark(app_name="capture_plans")
    try:
        Q.prebuild_shared_artifacts(spark, args.sf)
    except Exception as exc:
        print(f"# prebuild failed: {exc}", file=sys.stderr)

    for name in args.only.split(","):
        name = name.strip()
        if name not in Q.QUERIES:
            print(f"# {name}: not registered, skipped", file=sys.stderr)
            continue
        out_path = os.path.join(args.outdir, f"{name}_{args.tag}.txt")
        try:
            df = Q.QUERIES[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:
            plan = f"ERROR capturing plan: {type(exc).__name__}: {exc}\n"
        with open(out_path, "w") as fh:
            fh.write(plan)
        print(f"# wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
