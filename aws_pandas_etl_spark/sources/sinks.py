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


def append_load(df: DataFrame, path: str) -> int:
    """Incremental append (beyond the reference's full-refresh-only
    surface): add this batch's rows to the target, return the batch
    row count (counted from the input — the target total is not this
    load's responsibility)."""
    n = df.count()
    df.write.mode("append").option("maxRecordsPerFile", str(ROWS_PER_FILE)).parquet(path)
    return n


def merge_load(
    df: DataFrame, path: str, keys: list[str], order_col: str
) -> int:
    """Incremental upsert (CDC compaction): union the incoming batch
    with the existing target and keep the latest row per key
    (``order_col`` descending, ties to the incoming batch).  Returns
    the target row count after the merge.

    Without a transactional table format this is read-union-overwrite —
    correct but not atomic under concurrent writers; production swaps
    the final step for Delta/Iceberg MERGE INTO, keeping the identical
    dedup plan.  The compaction is one shuffle on the merge keys."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    spark = df.sparkSession
    try:
        existing = spark.read.parquet(path).withColumn("_src", F.lit(0))
    except Exception:
        existing = None
    incoming = df.withColumn("_src", F.lit(1))
    allrows = incoming if existing is None else existing.unionByName(incoming)
    w = Window.partitionBy(*keys).orderBy(
        F.col(order_col).desc(), F.col("_src").desc()
    )
    merged = (
        allrows.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
        # materialize before overwriting the path we just read
        .localCheckpoint()
    )
    merged.write.mode("overwrite").option(
        "maxRecordsPerFile", str(ROWS_PER_FILE)
    ).parquet(path)
    return spark.read.parquet(path).count()


def overwrite_partitions_load(
    df: DataFrame, path: str, partition_by: list[str]
) -> int:
    """Dynamic partition overwrite: replace ONLY the partitions present
    in this batch, leave every other partition untouched — the
    incremental pattern that matters at 100 TB (a daily batch rewrites
    one date partition, not the table).  Uses Spark's
    ``partitionOverwriteMode=dynamic`` scoped to this write.  Returns
    the batch row count."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        n = df.count()
        (
            df.write.mode("overwrite")
            .option("maxRecordsPerFile", str(ROWS_PER_FILE))
            .partitionBy(*partition_by)
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return n
