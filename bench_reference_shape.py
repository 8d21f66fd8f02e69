#!/usr/bin/env python
"""Head-to-head: the reference's single-threaded pandas dataflow vs
this engine's Spark plan, on the same input and the same semantics.

The pandas side reimplements the reference's HistoryLoad chunk loop
shape (/root/reference/utils/rdbms_operations.py:197-248 +
dataframe_operations.py:16-112) idiomatically — NOT a code copy:
read in 1M-row chunks, cast value to decimal-ish, add run-constant
audit columns, md5 row hash via per-row apply (the reference hashes
row-by-row, dataframe_operations.py:83-85), serialize each chunk to
parquet bytes.  Single process, single thread, every byte through one
loop — the physical profile SURVEY.md §6 documents.

The Spark side is the engine's `etl_enriched_events` plan (casts +
audit + row hash as one whole-stage-codegen projection) written to
parquet.

Prints one JSON line with both wall times and the speedup.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import io
import json
import os
import sys
import tempfile
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CHUNK = 1_000_000  # the reference's chunksize (rdbms_operations.py:227)


def pandas_reference_shape() -> tuple[float, int]:
    """Reference dataflow: chunked read -> casts -> audit -> row hash
    (per-row md5, as the reference does) -> parquet bytes."""
    t0 = time.monotonic()
    pf = pq.ParquetFile(os.path.join(SF_DIR, "events.parquet"))
    run_ts = dt.datetime.now(dt.timezone.utc)
    rows = 0
    for batch in pf.iter_batches(batch_size=CHUNK):
        df = batch.to_pandas()
        rows += len(df)
        # casts (dataframe_operations.py:16-50 shape)
        df["value_dec"] = df["value"].astype("float64").round(4)
        # audit columns (dataframe_operations.py:53-70)
        df["updatedby"] = "redshiftadmin"
        df["updated_utc_ts"] = run_ts
        df["runid"] = 1
        # row hash, per-row like the reference (dataframe_operations.py:73-90)
        cols = ["event_id", "user_id", "event_type", "value"]
        df["row_hash_code"] = df[cols].astype("string").fillna("").agg(",".join, axis=1).map(
            lambda s: hashlib.md5(f"({s})".encode()).hexdigest()
        )
        # serialize chunk to parquet bytes (get_parquet_bytes shape)
        sink = io.BytesIO()
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), sink)
    return time.monotonic() - t0, rows


def spark_engine_shape() -> tuple[float, int]:
    from pyspark.sql import functions as F

    from aws_pandas_etl_spark import get_spark
    from aws_pandas_etl_spark.functions.hashing import row_hash
    from aws_pandas_etl_spark.operators.transforms import add_audit_columns
    from aws_pandas_etl_spark.sources.readers import load_table

    spark = get_spark(app_name="bench-ref-shape")
    # warm the session so the comparison is dataflow vs dataflow, not
    # JVM startup vs warm pandas
    spark.range(1000).selectExpr("sum(id)").collect()
    ev = load_table(spark, SF_DIR, "events")
    t0 = time.monotonic()
    out = add_audit_columns(
        ev.withColumn("value_dec", F.round(F.col("value"), 4))
    ).withColumn(
        "row_hash_code", row_hash(["event_id", "user_id", "event_type", "value"])
    )
    target = os.path.join(tempfile.mkdtemp(), "out")
    out.write.mode("overwrite").parquet(target)
    elapsed = time.monotonic() - t0
    n = spark.read.parquet(target).count()
    return elapsed, n


def main() -> None:
    p_sec, p_rows = pandas_reference_shape()
    s_sec, s_rows = spark_engine_shape()
    print(
        json.dumps(
            {
                "metric": "reference_shape_head_to_head",
                "sf_dir": SF_DIR,
                "rows": p_rows,
                "pandas_single_thread_sec": round(p_sec, 2),
                "spark_engine_sec": round(s_sec, 2),
                "speedup": round(p_sec / s_sec, 2) if s_sec > 0 else None,
                "spark_rows_written": s_rows,
            }
        )
    )


if __name__ == "__main__":
    main()
