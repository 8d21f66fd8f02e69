"""Custom stateful streaming operator: per-key EWMA.

``applyInPandasWithState`` over a user-keyed event stream: per-user
state carries (running ewma, events seen) across micro-batches; each
batch folds its rows (sorted by ts, event_id) into the recurrence
s = alpha*x + (1-alpha)*s and emits the running value — the streaming
twin of ``operators.timeseries.ewma_last_per_key`` (tests assert the
bounded-backlog run agrees with the batch operator exactly; alpha=1/2
keeps the float64 recurrence bit-reproducible).

Emit-partial/compact-later: a key spanning micro-batches emits one
running row per batch; the final value is the row with the largest
n_events per key (the same fragment-merge contract as the stateful
sessionizer).  State is two numbers per key — on a cluster the state
store shuffles by key and RocksDB handles large keyspaces; a
watermark timeout would evict idle keys on an unbounded stream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from aws_pandas_etl_spark.streaming.events_stream import events_stream

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, ewma double"
STATE_SCHEMA = "s double, n bigint"

ALPHA = 0.5  # power-of-two weights -> bit-reproducible recurrence


def _ewma_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    events = pd.concat(list(pdfs), ignore_index=True)
    events = events.sort_values(["ts", "event_id"])
    if state.exists:
        s, n = state.get
    else:
        s, n = None, 0
    for x in events["value"].to_numpy():
        x = float(x)
        s = x if s is None else ALPHA * x + (1.0 - ALPHA) * s
        n += 1
    state.update((s, n))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "ewma": [s]})


def ewma_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = events_stream(spark, sf_dir, with_watermark=None).select(
        "user_id", "ts", "event_id", "value"
    )
    return stream.groupBy("user_id").applyInPandasWithState(
        _ewma_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_ewma_stream(
    spark: SparkSession, sf_dir: str, timeout_sec: int = 300
) -> DataFrame:
    """Execute via availableNow into a parquet sink, then compact
    fragments to the final row per key (max n_events — n is strictly
    increasing across a key's fragments, so the arg-max row IS the
    final state)."""
    from aws_pandas_etl_spark.streaming.events_stream import _run_to_parquet_sink

    frags = _run_to_parquet_sink(
        spark, ewma_stream(spark, sf_dir), "ewma", timeout_sec
    )
    # arg-max by struct ordering: n is strictly increasing across a
    # key's fragments, so max(struct(n, ewma)) IS the final state —
    # one aggregation, no self-join
    latest = frags.groupBy("user_id").agg(
        F.max(F.struct("n_events", "ewma")).alias("___m")
    )
    return latest.select(
        "user_id",
        F.col("___m.n_events").alias("n_events"),
        F.round(F.col("___m.ewma"), 6).alias("ewma"),
    )


# ---------------------------------------------------------------------------
# transformWithState twin — the Spark 4 arbitrary-state API
# ---------------------------------------------------------------------------

OUTPUT_STRUCT = (
    "user_id bigint, n_events bigint, ewma double"
)


class _EwmaProcessor:
    """``StatefulProcessor`` running the identical per-key recurrence
    as ``_ewma_group`` — the migration target Spark 4 recommends over
    ``applyInPandasWithState`` (typed state handles, timers, RocksDB-
    only).  State is one ValueState of (s, n); the fold order (sort by
    ts, event_id; sequential replay) is byte-identical to the GroupState
    form, so both streaming twins and the batch operator share one
    oracle at alpha = 1/2 (power-of-two weights, bit-reproducible)."""

    def init(self, handle) -> None:  # StatefulProcessorHandle
        self._state = handle.getValueState("ewma", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        events = pd.concat(list(rows), ignore_index=True)
        events = events.sort_values(["ts", "event_id"])
        if self._state.exists():
            s, n = self._state.get()
        else:
            s, n = None, 0
        for x in events["value"].to_numpy():
            x = float(x)
            s = x if s is None else ALPHA * x + (1.0 - ALPHA) * s
            n += 1
        self._state.update((s, n))
        yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "ewma": [s]})

    def close(self) -> None:
        pass


def tws_available() -> bool:
    """transformWithState's Python worker speaks protobuf to the JVM
    state server (pyspark.sql.streaming.proto) — without the
    ``protobuf`` package the driver worker crashes AFTER the query
    starts, so the capability must be probed up front."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def ewma_stream_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    if not tws_available():
        raise RuntimeError(
            "transformWithStateInPandas needs the 'protobuf' package "
            "(pyspark.sql.streaming.proto.StateMessage_pb2) — not "
            "installed in this environment; use ewma_stream (the "
            "applyInPandasWithState twin, identical semantics) instead"
        )

    # subclassing at call time keeps the module importable on PySpark
    # versions without the API (the class body above is plain Python)
    proc = type("_EwmaTws", (_EwmaProcessor, StatefulProcessor), {})()
    stream = events_stream(spark, sf_dir, with_watermark=None).select(
        "user_id", "ts", "event_id", "value"
    )
    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=OUTPUT_STRUCT,
        outputMode="append",
        timeMode="none",
    )


class _scoped_rocksdb:
    """Set/restore the RocksDB state-store provider around a
    transformWithState run (the API is built on RocksDB column
    families; the conf is read at query START, so a session-scoped
    set works for availableNow runs that start and finish inside the
    scope).  The engine's other stateful queries keep the HDFS-backed
    default that measured faster at harness state sizes (BASELINE.md
    r12 A/B)."""

    _KEY = "spark.sql.streaming.stateStore.providerClass"
    _PROVIDER = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def __enter__(self):
        self.prev = self.spark.conf.get(self._KEY, None)
        self.spark.conf.set(self._KEY, self._PROVIDER)
        return self

    def __exit__(self, *exc):
        if self.prev is None:
            self.spark.conf.unset(self._KEY)
        else:
            self.spark.conf.set(self._KEY, self.prev)
        return False


def run_ewma_stream_tws(
    spark: SparkSession, sf_dir: str, timeout_sec: int = 300
) -> DataFrame:
    """availableNow execution + fragment compaction, exactly like
    ``run_ewma_stream``; RocksDB provider scoped to the run."""
    from aws_pandas_etl_spark.streaming.events_stream import _run_to_parquet_sink

    with _scoped_rocksdb(spark):
        frags = _run_to_parquet_sink(
            spark, ewma_stream_tws(spark, sf_dir), "ewma_tws", timeout_sec
        )
    latest = frags.groupBy("user_id").agg(
        F.max(F.struct("n_events", "ewma")).alias("___m")
    )
    return latest.select(
        "user_id",
        F.col("___m.n_events").alias("n_events"),
        F.round(F.col("___m.ewma"), 6).alias("ewma"),
    )
