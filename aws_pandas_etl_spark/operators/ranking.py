"""Scale-safe global ranking.

A bare ``Window.orderBy(...)`` (no partitionBy) computes a global rank
by sorting the ENTIRE frame in one task — fine on 10^4 aggregated rows,
serial on 10^9.  ``global_rank`` produces identical ranks from fully
distributed stages:

1. ``repartitionByRange`` on the order key (one shuffle; the range
   partitioner gives ascending, non-overlapping key ranges per
   ascending partition id),
2. ``sortWithinPartitions`` + an Arrow-batched running counter
   (``mapInPandas``) for partition-local row numbers — a narrow stage,
   no second shuffle (a ``Window.partitionBy(pid)`` here would
   re-shuffle the whole frame on pid),
3. per-partition counts -> prefix-sum offsets (a ``num_partitions``-row
   frame; the only single-partition work in the plan),
4. broadcast join of the offsets back: ``rank = offset + local_rn``.

Requires the composite order key to be unique (ties would make rank
partition-boundary-dependent); callers append a tiebreaker column —
exactly what a deterministic global rank needs anyway.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PID = "_gr_pid"
_LRN = "_gr_lrn"


def _with_local_row_numbers(ranged: DataFrame, order_cols: list[str]) -> DataFrame:
    """Partition-local 1-based row numbers via a running Arrow-batch
    counter.  Rows were range-partitioned and sorted within partitions;
    mapInPandas streams each partition's batches in order, so a plain
    cumulative counter is the partition-local row_number."""
    pid_tagged = ranged.withColumn(_PID, F.spark_partition_id()).sortWithinPartitions(
        *order_cols
    )
    out_schema = T.StructType(
        pid_tagged.schema.fields + [T.StructField(_LRN, T.LongType())]
    )

    def number_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen = 0
        for pdf in batches:
            n = len(pdf)
            pdf[_LRN] = range(seen + 1, seen + n + 1)
            seen += n
            yield pdf

    return pid_tagged.mapInPandas(number_batches, schema=out_schema)


def _global_rank_with_total(
    df: DataFrame,
    order_cols: list[str],
    out_col: str,
    num_partitions: int | None,
) -> DataFrame:
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = df.repartitionByRange(num_partitions, *order_cols)
    local = _with_local_row_numbers(ranged, order_cols)
    # tiny: one row per non-empty partition (map-side combine reduces
    # each partition to one row before this shuffle)
    counts = local.groupBy(_PID).agg(F.count(F.lit(1)).alias("_cnt"))
    w_prev = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        _PID,
        F.coalesce(F.sum("_cnt").over(w_prev), F.lit(0)).alias("_off"),
        F.sum("_cnt").over(Window.partitionBy()).alias("_n_total"),
    )
    return (
        local.join(F.broadcast(offsets), _PID)
        .withColumn(out_col, (F.col("_off") + F.col(_LRN)).cast("long"))
        .drop(_PID, _LRN, "_off")
    )


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "global_rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Dense global 1-based rank over a UNIQUE composite order key,
    without a single-partition global sort.  Equivalent to
    ``row_number() OVER (ORDER BY order_cols)`` (== rank(), since the
    key is unique)."""
    return _global_rank_with_total(df, order_cols, out_col, num_partitions).drop(
        "_n_total"
    )


def global_percent_rank(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "percent_rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """``percent_rank() OVER (ORDER BY order_cols)`` — (rank-1)/(n-1),
    0.0 for a single row — scale-safely (see module docstring).  The
    order key must be unique."""
    ranked = _global_rank_with_total(df, order_cols, "_grank", num_partitions)
    pct = (F.col("_grank") - F.lit(1)).cast("double") / F.greatest(
        F.col("_n_total") - F.lit(1), F.lit(1)
    )
    return ranked.withColumn(out_col, pct).drop("_grank", "_n_total")
