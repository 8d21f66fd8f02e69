#!/usr/bin/env python
"""Scaling-probe harness (BASELINE.md protocol, now committed instead
of ad-hoc): time registry queries at 1x (sf0.1) and at an N x clone of
sf0.1 built with offset ids, min-of-M each, and print a markdown table
row per query ready to append to BASELINE.md.

Clone protocol (identical to the r6-r8 probe sections):
- fact tables (events, documents, orders, customer) are cloned N times
  with every id column offset by ``clone_index * 10**9`` so keys stay
  unique and clone-i facts join clone-i dimensions;
- dimension-ish tables (region, nation, supplier, part, lineitem,
  embeddings) are kept at 1x (copied verbatim);
- timestamps are untouched, so calendar-bounded state (days, hours)
  does not grow -- that is the point of probing those operators.

Usage:
    python tools/scale_probe.py ks_drift_split_halves psi_value_drift
    python tools/scale_probe.py --factor 10 --repeats 2 <names...>
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from aws_pandas_etl_spark.plans import queries as Q  # noqa: E402
from aws_pandas_etl_spark.session import get_spark  # noqa: E402

# fact table -> id columns to offset per clone
CLONED = {
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
}
KEPT = ("region", "nation", "supplier", "part", "lineitem", "embeddings")
STRIDE = 10**9


HOT_USER = 77  # skew mode routes ~50% of events to this user_id
HOT_LANG = "en"  # skew mode routes ~90% of documents to this lang


def build_clone(
    spark,
    src_dir: str,
    out_dir: str,
    factor: int,
    clone_embeddings: bool = False,
    skew: bool = False,
    hot_pct: int = 50,
) -> None:
    """``skew=True`` builds the ADVERSARIAL clone (VERDICT r10 #5): the
    same N× offset-id union, then one hot key takes ~``hot_pct``% of
    events (user_id := HOT_USER where event_id % 100 < hot_pct) and one
    lang takes ~90% of documents (lang := HOT_LANG where
    doc_id % 10 < 9).  Wall times against the uniform clone at the same
    factor expose whether the salting / AQE-skew paths actually engage;
    ``hot_pct=90`` is the r11 verdict #6 escalation for the operators
    whose serial-unit bound is linear in the hot share."""
    cloned = dict(CLONED)
    kept = KEPT
    if clone_embeddings:
        # embedding-family probes (ANN/clustering/hard-negative) need
        # the vector corpus itself to grow, not just the fact tables
        cloned["embeddings"] = ["vec_id"]
        kept = tuple(t for t in KEPT if t != "embeddings")
    os.makedirs(out_dir, exist_ok=True)
    for name in kept:
        src = os.path.join(src_dir, f"{name}.parquet")
        dst = os.path.join(out_dir, f"{name}.parquet")
        if os.path.exists(dst):
            continue
        if os.path.isdir(src):
            shutil.copytree(src, dst)
        else:
            shutil.copy2(src, dst)
    for name, id_cols in cloned.items():
        dst = os.path.join(out_dir, f"{name}.parquet")
        if os.path.exists(dst):
            continue
        base = spark.read.parquet(os.path.join(src_dir, f"{name}.parquet"))
        clones = None
        for i in range(factor):
            ci = base
            if i:
                ci = ci.withColumns(
                    {c: F.col(c) + F.lit(i * STRIDE) for c in id_cols}
                )
            clones = ci if clones is None else clones.unionByName(ci)
        if skew and name == "events":
            clones = clones.withColumn(
                "user_id",
                F.when(
                    F.pmod("event_id", F.lit(100)) < hot_pct, F.lit(HOT_USER)
                ).otherwise(F.col("user_id")),
            )
        if skew and name == "documents":
            clones = clones.withColumn(
                "lang",
                F.when(
                    F.pmod("doc_id", F.lit(10)) < 9, F.lit(HOT_LANG)
                ).otherwise(F.col("lang")),
            )
        clones.write.mode("overwrite").parquet(dst)


def time_query(spark, name: str, sf_dir: str, repeats: int) -> float:
    fn = Q.QUERIES[name]
    samples = []
    for _ in range(repeats):
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        samples.append(time.monotonic() - t0)
        spark.catalog.clearCache()
    return min(samples)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--workdir", default="/tmp/spark_graft_probe")
    ap.add_argument("--clone-embeddings", action="store_true")
    ap.add_argument(
        "--skew",
        action="store_true",
        help="ALSO build an adversarially skewed clone at the same "
        "factor (hot user ~--hot-pct%% of events, hot lang ~90%% of "
        "documents) and print uniform-vs-skew columns instead of "
        "1x-vs-Nx",
    )
    ap.add_argument(
        "--hot-pct",
        type=int,
        default=50,
        help="hot-user share of events in the skew clone (default 50; "
        "90 = the serial-unit escalation probe)",
    )
    args = ap.parse_args()

    unknown = [n for n in args.names if n not in Q.QUERIES]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = get_spark(app_name="scale_probe")
    suffix = "e" if args.clone_embeddings else ""
    clone_dir = os.path.join(args.workdir, f"x{args.factor}{suffix}")
    print(f"# building {args.factor}x clone at {clone_dir}", file=sys.stderr)
    build_clone(
        spark, args.base, clone_dir, args.factor, args.clone_embeddings
    )

    skew_dir = None
    if args.skew:
        tag = f"_skew{args.hot_pct}" if args.hot_pct != 50 else "_skew"
        skew_dir = os.path.join(args.workdir, f"x{args.factor}{suffix}{tag}")
        print(f"# building skewed clone at {skew_dir}", file=sys.stderr)
        build_clone(
            spark,
            args.base,
            skew_dir,
            args.factor,
            args.clone_embeddings,
            skew=True,
            hot_pct=args.hot_pct,
        )

    for name in args.names:
        if args.skew:
            tu = time_query(spark, name, clone_dir, args.repeats)
            tsk = time_query(spark, name, skew_dir, args.repeats)
            ratio = tsk / tu if tu > 0 else float("inf")
            print(
                f"| `{name}` | {tu:.1f} s | {tsk:.1f} s ({ratio:.1f}x) |  |"
            )
        else:
            t1 = time_query(spark, name, args.base, args.repeats)
            tn = time_query(spark, name, clone_dir, args.repeats)
            ratio = tn / t1 if t1 > 0 else float("inf")
            print(
                f"| `{name}` | {t1:.1f} s | {tn:.1f} s ({ratio:.1f}x) |  |"
            )
        sys.stdout.flush()


if __name__ == "__main__":
    main()
