#!/usr/bin/env python
"""CDC-merge economics probe (VERDICT r11 #4): measure per-batch merge
cost as a function of how many target partitions the batch's keys
touch — flat ``merge_load`` (cost ∝ target size) vs
``merge_load_partitioned`` (cost ∝ touched-partition bytes).

Setup: a 10x events clone (same offset-id union as tools/scale_probe)
seeds two upsert targets keyed (user_id, event_type) — one flat, one
partitioned by ``bkt = pmod(user_id, NB)``.  Then key-LOCALIZED update
batches (every key in the batch lives in k specific buckets, the CDC
locality a real feed has) are merged for k in {1, 4, 16, 32}, timing
each merge against both layouts.

Expected shape (what BASELINE.md records): flat cost is ~constant in k
(every merge reads+rewrites the whole target); partitioned cost grows
~linearly in k and sits far below flat at small k.  At 100 TB the flat
line is a full-table rewrite per micro-batch; the partitioned line is
the deployable one.

Usage:
    python tools/merge_probe.py [--factor 10] [--buckets 32]
        [--sf /root/testdata/sf0.1] [--workdir /tmp/spark_graft_merge]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from aws_pandas_etl_spark.session import get_spark  # noqa: E402
from aws_pandas_etl_spark.sources.readers import load_table  # noqa: E402
from aws_pandas_etl_spark.sources.sinks import (  # noqa: E402
    merge_load,
    merge_load_partitioned,
    stamp_layout,
)

STRIDE = 10**9
KEYS = ["user_id", "event_type"]
COLS = ["user_id", "event_type", "event_id", "ts", "props"]


def tenx_events(spark, sf_dir: str, factor: int):
    """N× key-offset clone COMPACTED to latest-row-per-key — an upsert
    target holds one row per key by definition; seeding raw history
    would make the first merge collapse it and skew every later
    measurement (the bug the first draft of this probe had)."""
    from pyspark.sql import Window

    base = load_table(spark, sf_dir, "events").select(*COLS)
    clones = None
    for i in range(factor):
        ci = base
        if i:
            ci = ci.withColumns(
                {
                    c: F.col(c) + F.lit(i * STRIDE)
                    for c in ("event_id", "user_id")
                }
            )
        clones = ci if clones is None else clones.unionByName(ci)
    w = Window.partitionBy(*KEYS).orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        clones.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--workdir", default="/tmp/spark_graft_merge")
    args = ap.parse_args()

    spark = get_spark(app_name="merge_probe")
    nb = args.buckets
    shutil.rmtree(args.workdir, ignore_errors=True)
    flat = os.path.join(args.workdir, "flat")
    part = os.path.join(args.workdir, "part")

    ev = tenx_events(spark, args.sf, args.factor)
    bkt = F.pmod(F.col("user_id"), F.lit(nb)).cast("int")

    t0 = time.monotonic()
    ev.write.mode("overwrite").parquet(flat)
    ev.withColumn("bkt", bkt).write.mode("overwrite").partitionBy(
        "bkt"
    ).parquet(part)
    # the partitioned target was seeded by a plain writer, so it has no
    # _layout.json — stamp it explicitly (r14: data-bearing unstamped
    # targets REFUSE by default; this is the documented migration path)
    stamp_layout(
        spark, part, keys=KEYS, order_col="ts", partition_col="bkt",
        layout_spec=f"pmod(user_id,{nb})",
    )
    seed_sec = round(time.monotonic() - t0, 2)
    n_rows = spark.read.parquet(flat).count()
    print(f"# seeded {n_rows} rows x2 targets in {seed_sec}s", file=sys.stderr)

    def du(p: str) -> int:
        total = 0
        for root, _dirs, files in os.walk(p):
            total += sum(
                os.path.getsize(os.path.join(root, f))
                for f in files
                if f.startswith("part-")
            )
        return total

    rows = []
    for k in (1, 4, 16, 32):
        if k > nb:
            continue
        # key-localized batch: update rows whose keys live in buckets
        # [0, k), hash-thinned ∝ 1/k so batch SIZE stays ~constant
        # (~1/(16*nb) of the corpus) while TOUCHED partitions vary
        batch = (
            spark.read.parquet(flat)
            .filter(F.pmod(F.col("user_id"), F.lit(nb)) < k)
            .filter(
                F.pmod(F.abs(F.xxhash64(F.col("event_id"))), F.lit(16 * k))
                == 0
            )
            .withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 HOUR"))
            .localCheckpoint(eager=True)  # batch build excluded from timing
        )
        n_batch = batch.count()

        # bytes the two layouts must READ+REWRITE for this batch — the
        # scale-invariant economics (local wall clocks sit on a ~1 s
        # machinery floor that hides them at harness size)
        bytes_full = du(flat)
        bytes_touched = sum(
            du(os.path.join(part, f"bkt={i}")) for i in range(k)
        )

        t0 = time.monotonic()
        merge_load(batch, flat, keys=KEYS, order_col="ts", tiebreak_col="event_id")
        flat_sec = round(time.monotonic() - t0, 2)

        t0 = time.monotonic()
        merge_load_partitioned(
            batch.withColumn("bkt", bkt),
            part,
            keys=KEYS,
            order_col="ts",
            partition_col="bkt",
            tiebreak_col="event_id",
            layout_spec=f"pmod(user_id,{nb})",
        )
        part_sec = round(time.monotonic() - t0, 2)

        rows.append(
            {
                "touched_buckets": k,
                "of_buckets": nb,
                "batch_rows": n_batch,
                "flat_merge_sec": flat_sec,
                "partitioned_merge_sec": part_sec,
                "flat_bytes_rw": bytes_full,
                "partitioned_bytes_rw": bytes_touched,
                "bytes_ratio": round(bytes_full / max(bytes_touched, 1), 2),
            }
        )
        print(f"# {rows[-1]}", file=sys.stderr)

    # end-state parity: both layouts must hold identical rows
    a = spark.read.parquet(flat).groupBy().agg(
        F.count("*").alias("n"), F.sum(F.hash(*COLS).cast("long")).alias("h")
    ).first()
    b = spark.read.parquet(part).drop("bkt").groupBy().agg(
        F.count("*").alias("n"), F.sum(F.hash(*COLS).cast("long")).alias("h")
    ).first()
    parity = (a["n"], a["h"]) == (b["n"], b["h"])

    out = {
        "probe": "cdc_merge_partition_pruning",
        "sf": args.sf,
        "factor": args.factor,
        "target_rows": n_rows,
        "buckets": nb,
        "rows": rows,
        "end_state_parity": parity,
    }
    print(json.dumps(out))
    if not parity:
        sys.exit(1)


if __name__ == "__main__":
    main()
