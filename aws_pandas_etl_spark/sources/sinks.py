"""Sinks.

K1 (parquet to S3 time-partitioned prefix, /root/reference/main.py:52-65
+ s3_operations.py:49-61) and K2 (Redshift TRUNCATE+COPY,
redshift_operations.py:121-167) re-expressed as Spark distributed
writes: executors write part-files directly to the object store (no
driver-funneled bytes), and the TRUNCATE+COPY full refresh becomes
``mode("overwrite")`` with a post-write count reconciliation
(PG_LAST_COPY_COUNT parity, redshift_operations.py:154-155).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession

# Reference chunk size: 1M rows per parquet file (rdbms_operations.py:227).
ROWS_PER_FILE = 1_000_000


def landing_path(base: str, table: str, ts: _dt.datetime | None = None) -> str:
    """Reference key layout ``{prefix}{table}/{Y/m/d/H}/`` (main.py:52-57)."""
    ts = ts or _dt.datetime.now(_dt.timezone.utc)
    return f"{base.rstrip('/')}/{table}/{ts:%Y/%m/%d/%H}"


def write_parquet_sink(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
    rows_per_file: int = ROWS_PER_FILE,
) -> None:
    """K1 — distributed parquet write.

    ``maxRecordsPerFile`` echoes the reference's 1M-row chunk files at
    any scale without a repartition shuffle.  ``partition_by`` gives
    partition pruning to downstream readers (the reference's Y/m/d/H
    key prefix, but catalog-visible).
    """
    writer = df.write.mode(mode).option("maxRecordsPerFile", str(rows_per_file))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def overwrite_load(df: DataFrame, path: str) -> int:
    """K2 — full-refresh load (TRUNCATE+COPY parity): overwrite the
    target and return the loaded row count read back from the target
    (reconciliation reads what actually landed, like
    PG_LAST_COPY_COUNT)."""
    df.write.mode("overwrite").option("maxRecordsPerFile", str(ROWS_PER_FILE)).parquet(path)
    spark = df.sparkSession
    return spark.read.parquet(path).count()


def read_back(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
