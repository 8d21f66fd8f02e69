"""Multi-micro-batch state test: the stateful sessionizer must carry
(last_ts, session_no) across micro-batches.  Events are split into 4
time-ordered files streamed with maxFilesPerTrigger=1; per-batch
session fragments, merged by (user, session_no), must reproduce the
batch result exactly.  If state were lost between batches, session
numbering would restart and the merge would disagree."""

import os
import tempfile
import uuid

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

from aws_pandas_etl_spark.plans.queries import QUERIES
from aws_pandas_etl_spark.streaming.events_stream import EVENTS_LONG_TS_SCHEMA
from aws_pandas_etl_spark.streaming.sessionize import (
    OUTPUT_SCHEMA,
    STATE_SCHEMA,
    _sessionize_group,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def split_events_dir(spark, tmp_path):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{SF}/events.parquet")
    q = raw.withColumn("q", F.ntile(4).over(Window.orderBy("ts")))
    d = str(tmp_path)
    for i in range(1, 5):
        part = f"{d}/part{i}"
        q.filter(F.col("q") == i).drop("q").coalesce(1).write.parquet(part)
        src = next(f for f in os.listdir(part) if f.endswith(".parquet"))
        os.rename(f"{part}/{src}", f"{d}/batch_{i}.parquet")
    return d


def test_state_carries_across_micro_batches(spark, split_events_dir):
    stream = (
        spark.readStream.schema(EVENTS_LONG_TS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "batch_*.parquet")
        .parquet(split_events_dir)
    )
    stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    sess = stream.groupBy("user_id").applyInPandasWithState(
        _sessionize_group, OUTPUT_SCHEMA, STATE_SCHEMA, "append",
        GroupStateTimeout.NoTimeout,
    )
    name = f"mb_{uuid.uuid4().hex[:6]}"
    q = (
        sess.writeStream.format("memory").queryName(name).outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp())
        .trigger(availableNow=True).start()
    )
    try:
        q.awaitTermination(300)
    finally:
        q.stop()
    merged = (
        spark.table(name)
        .groupBy("user_id", "session_no")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.min("session_start").alias("session_start"),
            F.max("session_end").alias("session_end"),
        )
    )
    s = sorted(tuple(r) for r in merged.collect())
    b = sorted(tuple(r) for r in QUERIES["sessionize_events"](spark, SF).collect())
    assert s == b
