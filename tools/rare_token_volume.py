#!/usr/bin/env python
"""Measure rare_token_blocked_pairs candidate volume vs corpus size
(VERDICT r10 #4): the query docstring's "~8% of all pairs at sf0.1"
adjudication, backed with data at 1x and 10x.

For each scale this counts, without timing noise:
- n_docs, total possible pairs n(n-1)/2
- rare-gram vocabulary (df in [2, RARE_DF_CAP]) and total gram vocab
- bucket pairs enumerated by the equi-join (sum over rare grams of
  df(df-1)/2 — the work the blocking actually does)
- pairs surviving the PPJoin length filter (pre-distinct)
- distinct candidate pairs (what gets rescored)
- final pairs with exact Jaccard >= threshold

The df<=cap bound means bucket pairs grow with the RARE VOCABULARY
(each gram contributes at most cap(cap-1)/2 pairs), not with corpus^2;
the 1x vs 10x ratio is the auditable form of that claim.

Usage: python tools/rare_token_volume.py [--factor 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from aws_pandas_etl_spark.plans import queries as Q  # noqa: E402
from aws_pandas_etl_spark.session import get_spark  # noqa: E402
from tools.scale_probe import build_clone  # noqa: E402


def measure(spark, sf_dir: str) -> dict:
    t = (
        Q._shingle3_table(spark, sf_dir)
        .select("doc_id", F.col("hashes").alias("g"))
        .repartition(32, "doc_id")
        .localCheckpoint(eager=False)
    )
    n_docs = t.count()
    e = t.select("doc_id", F.size("g").alias("sz"), F.explode("g").alias("h"))
    dfreq = e.groupBy("h").agg(F.count("*").cast("bigint").alias("df"))
    vocab = dfreq.count()
    rare = dfreq.filter(F.col("df").between(2, Q.RARE_DF_CAP))
    rare_vocab = rare.count()
    # bucket pairs = sum_h df(df-1)/2 over rare grams — exact join volume
    bucket_pairs = rare.agg(
        F.sum((F.col("df") * (F.col("df") - 1) / 2).cast("bigint")).alias("s")
    ).collect()[0]["s"]
    blk = (
        e.join(dfreq, "h")
        .filter(F.col("df").between(2, Q.RARE_DF_CAP))
        .select("doc_id", "sz", "h")
    )
    mn = F.least("x.sz", "y.sz")
    joined = (
        blk.alias("x")
        .join(blk.alias("y"), "h")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
    )
    after_len = joined.filter(
        mn.cast("double") / (F.col("x.sz") + F.col("y.sz") - mn)
        >= F.lit(Q.RARE_JACCARD) - 1e-6
    )
    n_after_len = after_len.count()
    cand = after_len.select(
        F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b")
    ).distinct()
    n_cand = cand.count()
    n_final = Q.QUERIES["rare_token_blocked_pairs"](spark, sf_dir).count()
    total_pairs = n_docs * (n_docs - 1) // 2
    return {
        "n_docs": n_docs,
        "total_pairs": total_pairs,
        "gram_vocab": vocab,
        "rare_vocab": rare_vocab,
        "bucket_pairs": int(bucket_pairs),
        "after_length_filter": n_after_len,
        "distinct_candidates": n_cand,
        "final_pairs": n_final,
        "cand_pct_of_all_pairs": round(100.0 * n_cand / total_pairs, 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--workdir", default="/tmp/spark_graft_probe")
    args = ap.parse_args()

    spark = get_spark(app_name="rare_token_volume")
    clone_dir = os.path.join(args.workdir, f"x{args.factor}")
    build_clone(spark, args.base, clone_dir, args.factor)

    out = {
        "1x": measure(spark, args.base),
        f"{args.factor}x": measure(spark, clone_dir),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
