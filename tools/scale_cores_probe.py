#!/usr/bin/env python
"""Core-count scaling at the 10x clone (r15 VERDICT item 3): the
driver's 8-vs-32-core leg is uninformative at sf0.1 — per-query fixed
overhead dominates and every ratio sits near 1 — so this probe times
queries on the 10x uniform clone (sf1-equivalent fact volume), where
parallel work is large enough for core count to matter.

Run once per core count (the master is fixed at session creation):

    SPARK_GRAFT_CPUS=32 python tools/scale_cores_probe.py --out A.json <names...>
    SPARK_GRAFT_CPUS=8  python tools/scale_cores_probe.py --out B.json <names...>

then merge with --merge A.json B.json --out SCALING_10X.json, which
records per-query sec@32, sec@8 and the 8/32 ratio (a parallel query
shows ratio ~3-4; ratio ~1 means serial/driver/floor-bound and needs a
named cause).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def merge(a_path: str, b_path: str, out: str) -> None:
    a = json.load(open(a_path))
    b = json.load(open(b_path))
    hi, lo = (a, b) if a["cpus"] >= b["cpus"] else (b, a)
    rows = {}
    for n, t_hi in hi["queries"].items():
        t_lo = lo["queries"].get(n)
        if t_lo is None:
            continue
        rows[n] = {
            f"sec_{hi['cpus']}c": t_hi,
            f"sec_{lo['cpus']}c": t_lo,
            "ratio_lowcore": round(t_lo / t_hi, 2) if t_hi > 0 else None,
        }
    payload = {
        "factor": hi.get("factor"),
        "cpus_high": hi["cpus"],
        "cpus_low": lo["cpus"],
        "queries": rows,
    }
    with open(out, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps({"n": len(rows), "out": out}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--workdir", default="/tmp/spark_graft_probe")
    ap.add_argument("--out", required=True)
    ap.add_argument("--merge", nargs=2, metavar=("HIGH", "LOW"))
    args = ap.parse_args()

    if args.merge:
        merge(args.merge[0], args.merge[1], args.out)
        return

    from aws_pandas_etl_spark.plans import queries as Q  # noqa: PLC0415
    from aws_pandas_etl_spark.session import get_spark  # noqa: PLC0415
    from tools.scale_probe import build_clone, time_query  # noqa: PLC0415

    spark = get_spark(app_name="scale_cores_probe")
    cpus = spark.sparkContext.defaultParallelism
    clone_dir = os.path.join(args.workdir, f"x{args.factor}")
    build_clone(spark, args.base, clone_dir, args.factor)
    try:
        Q.prebuild_shared_artifacts(spark, clone_dir)
    except Exception as exc:
        print(f"# prebuild failed: {exc}", file=sys.stderr)

    rows = {}
    for name in args.names:
        try:
            rows[name] = round(time_query(spark, name, clone_dir, args.repeats), 3)
            print(f"# {name}: {rows[name]}s @ {cpus} cores", file=sys.stderr)
        except Exception as exc:
            print(f"# {name}: ERROR {exc}", file=sys.stderr)
    with open(args.out, "w") as fh:
        json.dump({"cpus": cpus, "factor": args.factor, "queries": rows}, fh)
    print(json.dumps({"cpus": cpus, "n": len(rows)}))


if __name__ == "__main__":
    main()
