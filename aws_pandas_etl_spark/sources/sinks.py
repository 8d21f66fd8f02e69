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
    row count.  The count rides the write job itself via observe() —
    a separate count() would execute the whole upstream plan twice."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation()
    write_parquet_sink(
        df.observe(obs, F.count(F.lit(1)).alias("n")), path, mode="append"
    )
    return int(obs.get["n"])


def merge_load(
    df: DataFrame, path: str, keys: list[str], order_col: str
) -> int:
    """Incremental upsert (CDC compaction): union the incoming batch
    with the existing target and keep the latest row per key
    (``order_col`` descending, ties to the incoming batch).  Returns
    the target row count after the merge.

    Without a transactional table format the merged result is written
    to a temp sibling path and swapped in with two filesystem metadata
    ops (delete + rename) — a write failure leaves the existing target
    fully intact (the failure window is the delete->rename gap, not the
    whole write).  Production swaps the final step for Delta/Iceberg
    MERGE INTO, keeping the identical dedup plan.  The compaction is
    one shuffle on the merge keys."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pyspark.errors import AnalysisException

    spark = df.sparkSession
    # helper columns must not collide with user columns — pick names
    # that are guaranteed absent (a "_src" column in the data would
    # otherwise be clobbered and then dropped)
    src_col, rn_col = "_merge_src", "_merge_rn"
    while src_col in df.columns:
        src_col = "_" + src_col
    while rn_col in df.columns:
        rn_col = "_" + rn_col
    try:
        existing = spark.read.parquet(path).withColumn(src_col, F.lit(0))
    except AnalysisException as exc:
        # ONLY a missing target means "first load"; any other read
        # failure (transient FS error, corrupt footer, permissions)
        # must propagate — falling through would overwrite the target
        # with just this batch and silently destroy merged history
        if "PATH_NOT_FOUND" not in str(exc):
            raise
        existing = None
    incoming = df.withColumn(src_col, F.lit(1))
    allrows = incoming if existing is None else existing.unionByName(incoming)
    w = Window.partitionBy(*keys).orderBy(
        F.col(order_col).desc(), F.col(src_col).desc()
    )
    merged = (
        allrows.withColumn(rn_col, F.row_number().over(w))
        .filter(F.col(rn_col) == 1)
        .drop(rn_col, src_col)
    )
    # Write to a temp sibling, then swap: the full distributed write
    # (the risky, long part) never touches the live target; no
    # localCheckpoint materialization needed since the target is only
    # read, not overwritten, during the write.
    tmp_path = path.rstrip("/") + "._merge_tmp"
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(tmp_path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(jpath, True)  # leftover from a previously failed run
    write_parquet_sink(merged, tmp_path, mode="overwrite")
    final = jvm.org.apache.hadoop.fs.Path(path)
    fs.delete(final, True)
    if not fs.rename(jpath, final):
        raise IOError(f"merge_load: rename {tmp_path} -> {path} failed")
    return spark.read.parquet(path).count()


def overwrite_partitions_load(
    df: DataFrame, path: str, partition_by: list[str]
) -> int:
    """Dynamic partition overwrite: replace ONLY the partitions present
    in this batch, leave every other partition untouched — the
    incremental pattern that matters at 100 TB (a daily batch rewrites
    one date partition, not the table).  Uses Spark's
    ``partitionOverwriteMode=dynamic`` scoped to this write.  Returns
    the batch row count (via observe — no second plan execution).

    The mode is set as a PER-WRITE option, not a session conf: a
    session-global set/restore races with concurrent writers on the
    same SparkSession (another thread restoring "static" mid-flight
    would make this overwrite delete EVERY partition)."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation()
    (
        df.observe(obs, F.count(F.lit(1)).alias("n"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .option("maxRecordsPerFile", str(ROWS_PER_FILE))
        .partitionBy(*partition_by)
        .parquet(path)
    )
    return int(obs.get["n"])
