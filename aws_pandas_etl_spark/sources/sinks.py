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

# Compaction in-progress marker (underscore prefix: hidden from Spark's
# file listing, like _SUCCESS / _layout.json).  compact_table creates it
# before scanning and removes it only on SUCCESS; every incremental
# writer checks it and refuses loudly, which excludes the
# scan-vs-late-append race (a batch landing between compaction's
# snapshot and its keep-aside swap would otherwise be deleted with the
# old directory — silent row loss).  A marker left behind by a CRASHED
# compaction keeps writers refusing (the safe direction) until the
# operator inspects the target and calls clear_compaction_marker().
_COMPACTING_MARKER = "_COMPACTING"


def _compacting_marker_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(
        path.rstrip("/") + "/" + _COMPACTING_MARKER
    )
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def compaction_in_progress(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` carries compact_table's in-progress marker."""
    fs, jpath = _compacting_marker_path(spark, path)
    return bool(fs.exists(jpath))


def clear_compaction_marker(spark: SparkSession, path: str) -> bool:
    """Remove a stale ``_COMPACTING`` marker left by a crashed
    compaction — the explicit operator action after inspecting the
    target (compact_table's keep-aside swap means every crash point
    leaves a complete copy: either the live dir or the hidden
    ``._compact_old`` sibling).  Returns whether a marker existed."""
    fs, jpath = _compacting_marker_path(spark, path)
    return bool(fs.delete(jpath, False))


def _refuse_if_compacting(spark: SparkSession, path: str) -> None:
    """Single-writer guard: incremental writers refuse while a
    compaction holds the target (one FS exists() RPC, ~ms).  Without
    this, rows appended between compact_table's snapshot and its
    directory swap are silently deleted with the superseded copy."""
    if compaction_in_progress(spark, path):
        raise IOError(
            f"target {path!r} is being compacted (found "
            f"{_COMPACTING_MARKER!r} marker): writers must wait for "
            f"compact_table to finish; if the compaction crashed, "
            f"inspect the target and call clear_compaction_marker()"
        )


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

    _refuse_if_compacting(df.sparkSession, path)
    obs = Observation()
    write_parquet_sink(
        df.observe(obs, F.count(F.lit(1)).alias("n")), path, mode="append"
    )
    return int(obs.get["n"])


def jdbc_overwrite_load(
    df: DataFrame,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    truncate: bool = False,
    create_table_column_types: str | None = None,
) -> int:
    """K2 against a LIVE JDBC database — the reference's TRUNCATE+COPY
    full refresh (/root/reference/utils/redshift_operations.py:121-167)
    executed through Spark's JDBC sink instead of a driver-side COPY
    statement: every partition opens its own connection and batch-
    inserts in parallel (the distributed analogue of COPY's parallel
    slices), ``truncate=True`` keeps the table definition and issues
    TRUNCATE (the reference's exact refresh semantics; False re-creates
    the table, picking up schema changes), and the returned count is
    read BACK from the database — reconciliation counts what actually
    landed, the PG_LAST_COPY_COUNT parity read
    (redshift_operations.py:154-155), not what the writer thinks it
    sent.  Unlike PG_LAST_COPY_COUNT (same-transaction) the read-back
    is a separate post-commit statement, so the count reflects TABLE
    STATE at read time, not rows-written: a concurrent writer landing
    between save() and the read-back is included.  Single-writer
    refresh jobs (the reference's deployment) are unaffected; callers
    needing writer-isolated counts should reconcile inside the
    database's own transaction machinery.

    ``table`` is interpolated into the COUNT subquery, so it must be a
    plain (optionally schema-qualified) identifier — validated loudly;
    names needing quoting should be passed pre-quoted by the caller
    with their database's quote character.

    Scale shape: the write is numPartitions-parallel with batchsize-d
    inserts; nothing funnels through the driver.  The read-back count
    pushes COUNT(*) aggregation to the database (one row returns)."""
    import re

    # permit bare/qualified identifiers and caller-prequoted parts;
    # refuse anything that could smuggle SQL into the subquery
    if not re.fullmatch(r'[A-Za-z0-9_."`]+', table):
        raise ValueError(
            f"jdbc_overwrite_load: table {table!r} is not a plain "
            f"identifier; pre-quote exotic names with the database's "
            f"quote character"
        )
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .mode("overwrite")
    )
    if truncate:
        writer = writer.option("truncate", "true")
    if create_table_column_types:
        writer = writer.option(
            "createTableColumnTypes", create_table_column_types
        )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
    spark = df.sparkSession
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        # push COUNT(*) into the database: ship 1 row, not the table
        .option("dbtable", f"(SELECT COUNT(*) AS n FROM {table}) t")
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    # positional access: case-folding of the alias differs per database
    # (Derby uppercases unquoted identifiers)
    return int(reader.load().collect()[0][0])


def _merge_side_paths(path: str) -> tuple[str, str]:
    """Dot-prefixed tmp/old sibling paths for ``merge_load``'s swap.
    The dot prefix matters: Spark's file index skips paths starting
    with ``.`` or ``_``, so a parent-directory glob reader never picks
    up an in-flight tmp write or the kept-aside previous copy."""
    base = path.rstrip("/")
    head, _, tail = base.rpartition("/")
    prefix = f"{head}/" if head else ""
    return f"{prefix}.{tail}._merge_tmp", f"{prefix}.{tail}._merge_old"


class _SwapTarget:
    """Crash-safe rewrite of a live parquet target via hidden siblings:
    write to ``.<name>._merge_tmp``, rename the live target ASIDE to
    ``.<name>._merge_old``, rename the tmp in, drop the old copy.
    Every crash point leaves a full copy on disk; ``recover()`` (run
    BEFORE reading the existing target) restores the kept-aside copy
    if a previous run died between the two renames.  Rename is still
    non-atomic on object stores — production swaps ``publish`` for a
    transactional table commit (Delta/Iceberg), keeping the same plan.
    Shared by merge_load (CDC upsert) and delete_load (key scrub)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.tmp_path, self.old_path = _merge_side_paths(path)
        jvm = spark._jvm
        self.jtmp = jvm.org.apache.hadoop.fs.Path(self.tmp_path)
        self.jold = jvm.org.apache.hadoop.fs.Path(self.old_path)
        self.jfinal = jvm.org.apache.hadoop.fs.Path(path)
        self.fs = self.jfinal.getFileSystem(spark._jsc.hadoopConfiguration())

    def recover(self) -> None:
        fs = self.fs
        if not fs.exists(self.jfinal) and fs.exists(self.jold):
            if not fs.rename(self.jold, self.jfinal):
                raise IOError(
                    f"swap: crash recovery {self.old_path} -> {self.path} failed"
                )
        fs.delete(self.jtmp, True)  # leftover tmp from a failed write

    def publish(self, df: DataFrame) -> None:
        fs = self.fs
        write_parquet_sink(df, self.tmp_path, mode="overwrite")
        fs.delete(self.jold, True)  # stale kept-aside copy from an old success
        if fs.exists(self.jfinal) and not fs.rename(self.jfinal, self.jold):
            raise IOError(f"swap: keep-aside {self.path} -> {self.old_path} failed")
        if not fs.rename(self.jtmp, self.jfinal):
            raise IOError(f"swap: rename {self.tmp_path} -> {self.path} failed")
        fs.delete(self.jold, True)


def delete_load(spark: SparkSession, path: str, keys_df: DataFrame, keys: list[str]) -> int:
    """GDPR-style hard delete: remove every row of the live parquet
    target whose key tuple appears in ``keys_df`` — the
    right-to-be-forgotten / bad-batch-retraction operation every
    long-lived landing zone eventually needs (the reference can only
    TRUNCATE).  One LEFT ANTI join against the distinct key set, then
    the same crash-safe sibling swap as merge_load; deleting from a
    missing target is an error, not a no-op (a typo'd path silently
    "succeeding" would mask an unexecuted legal request).  Returns the
    surviving row count.

    Scale shape: the anti join shuffles on the keys (AQE broadcasts
    the key set while it measures small — a deletion list usually is);
    the rewrite cost is the price of immutable files, amortized by
    batching requests — production on Delta/Iceberg swaps the publish
    for DELETE WHERE with the identical anti-join plan."""
    _refuse_if_compacting(spark, path)
    swap = _SwapTarget(spark, path)
    swap.recover()
    existing = spark.read.parquet(path)  # missing target must raise
    remaining = existing.join(
        keys_df.select(*keys).distinct(), keys, "left_anti"
    )
    swap.publish(remaining)
    return spark.read.parquet(path).count()


def merge_load(
    df: DataFrame,
    path: str,
    keys: list[str],
    order_col: str,
    tiebreak_col: str | None = None,
) -> int:
    """Incremental upsert (CDC compaction): union the incoming batch
    with the existing target and keep the latest row per key
    (``order_col`` descending, ties to the incoming batch, then to the
    largest ``tiebreak_col`` when given — without one, rows tied on
    (keys, order_col) INSIDE a single batch are kept arbitrarily, so
    callers with possible in-batch ties should always pass it).
    Returns the target row count after the merge.

    Without a transactional table format the merged result is written
    to a hidden temp sibling and swapped in with metadata ops only:
    the live target is first renamed ASIDE (to ``.<name>._merge_old``),
    then the tmp renamed in, then the old copy dropped.  Every crash
    point leaves a full copy of the data on disk: a write failure
    leaves the target untouched; a crash between the two renames leaves
    the ``._merge_old`` copy, which the next run restores before
    merging (see the recovery step below).  Rename is still non-atomic
    on object stores — production swaps the final step for
    Delta/Iceberg MERGE INTO, keeping the identical dedup plan.  The
    compaction is one shuffle on the merge keys."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pyspark.errors import AnalysisException

    spark = df.sparkSession
    _refuse_if_compacting(spark, path)
    swap = _SwapTarget(spark, path)
    swap.recover()
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
        # ONLY absence means "first load" — a missing path, or an
        # existing directory holding no parquet (mkdir'ed target,
        # metadata-only: UNABLE_TO_INFER_SCHEMA) — there is no history
        # to destroy in either.  Any other read failure (transient FS
        # error, corrupt footer, permissions) must propagate: falling
        # through would overwrite the target with just this batch and
        # silently destroy merged history
        if "PATH_NOT_FOUND" not in str(exc) and (
            "UNABLE_TO_INFER_SCHEMA" not in str(exc)
        ):
            raise
        existing = None
    incoming = df.withColumn(src_col, F.lit(1))
    allrows = incoming if existing is None else existing.unionByName(incoming)
    order = [F.col(order_col).desc(), F.col(src_col).desc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).desc())
    w = Window.partitionBy(*keys).orderBy(*order)
    merged = (
        allrows.withColumn(rn_col, F.row_number().over(w))
        .filter(F.col(rn_col) == 1)
        .drop(rn_col, src_col)
    )
    # Write to the hidden temp sibling, then swap: the full distributed
    # write (the risky, long part) never touches the live target; no
    # localCheckpoint materialization needed since the target is only
    # read, not overwritten, during the write.
    swap.publish(merged)
    return spark.read.parquet(path).count()


_LAYOUT_MARKER = "_layout.json"


def _layout_marker_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "/" + _LAYOUT_MARKER)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def read_layout_marker(spark: SparkSession, path: str) -> dict | None:
    """Read the ``_layout.json`` stamp of a ``merge_load_partitioned``
    target (None if absent — pre-stamp target or first write).  The
    leading underscore makes Spark's parquet reader skip the file, so
    the stamp rides inside the target directory itself and travels
    with copies/renames of the target."""
    import json

    fs, jpath = _layout_marker_path(spark, path)
    if not fs.exists(jpath):
        return None
    stream = fs.open(jpath)
    try:
        # commons-io rides on Spark's classpath; a py4j bytearray read
        # would NOT round-trip (Java-side writes into a passed byte[]
        # never propagate back to Python)
        data = spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()
    return json.loads(data)


def _write_layout_marker(spark: SparkSession, path: str, spec: dict) -> None:
    import json

    fs, jpath = _layout_marker_path(spark, path)
    stream = fs.create(jpath, True)
    try:
        stream.write(json.dumps(spec, sort_keys=True).encode("utf-8"))
    finally:
        stream.close()


def _target_has_data(spark: SparkSession, path: str) -> bool:
    """True iff the target directory exists and holds anything besides
    hidden/metadata entries (``_layout.json``, ``_SUCCESS``, dotfiles).
    One FileSystem listStatus RPC — no data read."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return False
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if not name.startswith("_") and not name.startswith("."):
            return True
    return False


def stamp_layout(
    spark: SparkSession,
    path: str,
    keys: list[str],
    order_col: str,
    partition_col: str,
    layout_spec: str | None = None,
) -> dict:
    """One-shot migration/re-stamp API for ``merge_load_partitioned``
    targets: write (or overwrite) the ``_layout.json`` stamp with the
    given spec.  Two legitimate uses, both explicit caller decisions:

    1. adopting a genuine pre-stamp target (data written before the
       stamp existed, or a copy that dropped underscore-hidden files)
       whose key→partition mapping the caller KNOWS matches ``spec``;
    2. a declaration-only change — e.g. a caller starts passing
       ``layout_spec`` against a target stamped without one, or
       reformats the spec string for the IDENTICAL physical mapping —
       where the whole-dict equality check would otherwise demand a
       full rewrite.

    This deliberately does NOT verify the data against the spec (the
    old mapping is unrecoverable from data alone — that's why the
    stamp exists); it is the loud, auditable escape hatch that
    replaces the old silent grandfathering.  Returns the stamped
    spec."""
    layout = {
        "partition_col": partition_col,
        "keys": sorted(keys),
        "order_col": order_col,
        "layout_spec": layout_spec,
    }
    _write_layout_marker(spark, path, layout)
    return layout


def merge_load_partitioned(
    df: DataFrame,
    path: str,
    keys: list[str],
    order_col: str,
    partition_col: str,
    tiebreak_col: str | None = None,
    layout_spec: str | None = None,
    adopt_layout: bool = False,
) -> int:
    """Partition-pruned incremental upsert — ``merge_load`` for targets
    that matter at 100 TB: the flat merge reads and REWRITES the whole
    target every batch (cost ∝ target size), so a micro-batch CDC
    apply degenerates to a full-table rewrite per trigger.  This
    version touches only the partitions whose keys appear in the
    batch:

    1. collect the batch's distinct ``partition_col`` values (bounded
       by partitions-touched-per-batch — the quantity a CDC feed keeps
       small by construction; NOT corpus-scaling),
    2. read the target pruned to those partitions (`isin` on the
       partition column ⇒ directory-level partition pruning — the
       untouched 99% of the table is never opened),
    3. same latest-row-per-key compaction as ``merge_load``,
    4. write back with dynamic partition overwrite — only the touched
       partitions are replaced; every other partition's files are not
       rewritten, moved, or read.

    CONTRACT: ``partition_col`` must be a deterministic, NON-NULL
    function of the merge ``keys`` (e.g. a key hash-bucket or the
    key's date) and be present in ``df`` — otherwise a key could live
    in two partitions and the pruned merge would miss its older copy.
    NULL partition values are rejected loudly: ``isin(touched)`` can
    never match NULL (three-valued logic), so rows in a null partition
    would be invisible to the pruned read yet still overwritten by the
    dynamic-partition commit — a silent row-loss mode, converted here
    into an error.  Per-batch cost is ∝ touched-partition bytes, not
    target bytes (measured: tools/merge_probe.py, BASELINE.md r12).

    LAYOUT STAMP: the per-batch guard proves the CONTRACT for each
    batch, and induction extends it to the target — but the induction
    breaks if the key→partition mapping itself CHANGES between runs
    (e.g. ``pmod(key, 32)`` becomes ``pmod(key, 16)``: a key's old
    copy lives in a bucket the new mapping never reads, and the merge
    silently resurrects stale rows).  The first write therefore stamps
    ``_layout.json`` (partition_col, sorted keys, order_col, and the
    caller's ``layout_spec`` — a free-form description of HOW
    partition_col derives from the keys, e.g. ``"pmod(user_id,32)"``)
    into the target directory; every later merge refuses loudly on any
    mismatch.  Callers that compute the partition column from a
    parameter (bucket count, date granularity) should always pass
    ``layout_spec`` — without it only the column/key NAMES are pinned
    and a re-bucketing under the same column name is undetectable.
    A data-bearing UNSTAMPED target (marker absent but data present)
    is REFUSED by default: silently adopting the current spec would
    mean that losing ``_layout.json`` (a copy that drops
    underscore-hidden files, a cleanup job) re-enables exactly the
    cross-layout merge the stamp exists to refuse.  Genuine pre-stamp
    targets migrate explicitly — either pass ``adopt_layout=True`` on
    the first merge after migration, or run the one-shot
    ``stamp_layout(path, ...)`` API.  A declaration-only upgrade
    (target stamped with ``layout_spec=None``, caller now declares
    one, everything else identical) proceeds and re-stamps with the
    declared spec — no physical mapping changed.

    The merged touched-partition rows are localCheckpointed before the
    write (bounded by touched-partition size) — that breaks the
    read-the-path-being-overwritten cycle without the flat merge's
    whole-target tmp+rename swap.  Dynamic partition overwrite commits
    per job, not transactionally across partitions; production swaps
    in Delta/Iceberg MERGE INTO for the commit, keeping this identical
    pruned plan.  Returns the post-merge row count of the TOUCHED
    partitions (the untouched remainder was provably not modified)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pyspark.errors import AnalysisException

    spark = df.sparkSession
    _refuse_if_compacting(spark, path)
    # layout stamp: refuse a target whose recorded key→partition layout
    # differs from this call's — the silent-resurrection mode the
    # per-batch guard's induction can't see (see docstring).
    layout = {
        "partition_col": partition_col,
        "keys": sorted(keys),
        "order_col": order_col,
        "layout_spec": layout_spec,
    }
    stamped = read_layout_marker(spark, path)
    if stamped is None:
        # marker absent: only an EMPTY target is a first write.  A
        # data-bearing unstamped target is refused unless the caller
        # explicitly adopts — silent adoption would mean losing
        # _layout.json re-enables the exact cross-layout merge the
        # stamp refuses.
        if not adopt_layout and _target_has_data(spark, path):
            raise ValueError(
                f"merge_load_partitioned: target {path!r} holds data but "
                f"no {_LAYOUT_MARKER} stamp — its key→partition mapping is "
                f"unknown, so merging could silently resurrect stale rows "
                f"under a changed layout. If this is a genuine pre-stamp "
                f"target whose mapping you KNOW matches this merge's, pass "
                f"adopt_layout=True once (or run stamp_layout(path, ...)); "
                f"otherwise rewrite the target under the declared layout."
            )
    elif stamped != layout:
        upgrade = dict(stamped, layout_spec=layout_spec)
        if stamped.get("layout_spec") is None and upgrade == layout:
            # declaration-only upgrade: identical physical mapping, the
            # caller merely STARTED declaring layout_spec — proceed and
            # re-stamp with the richer spec after the write
            stamped = None
        else:
            raise ValueError(
                f"merge_load_partitioned: target {path!r} was written with "
                f"layout {stamped!r} but this merge declares {layout!r} — a "
                f"changed key→partition mapping would make the pruned read "
                f"miss keys' old copies and silently resurrect stale rows. "
                f"Rewrite the target under the new layout (full merge_load "
                f"+ re-stamp), or for a declaration-only change re-stamp "
                f"via stamp_layout(path, ...)."
            )
    # contract guard + touched-partition set + NULL rejection, folded
    # into ONE job (r12 ran guard and touched as two separate actions
    # — two scans of the un-materialized micro-batch source — per
    # trigger): per key, min(partition) != max(partition) proves
    # partition_col is NOT a function of the keys (the pruned read
    # would miss that key's copy in the unread partition); the per-key
    # null flag catches NULL partition values (min/max ignore NULLs,
    # so nulls need their own channel); and because every valid key
    # carries exactly ONE partition value, collect_set of the per-key
    # min IS the batch's touched set.  Both aggregates are bounded:
    # one row per batch key, then one row total.  (The target side is
    # covered by induction: every prior merge enforced the same check
    # on its batch, and the layout stamp pins the mapping across runs.)
    stats = (
        df.groupBy(*keys)
        .agg(
            # two distinct values per key ⟺ min != max — cheaper than a
            # per-key count_distinct (no per-key hash set); min/max
            # ignore NULLs, so nulls get their own channel, and an
            # all-null key yields NULL != NULL -> NULL, which max()
            # ignores (the null channel still raises)
            F.min(F.col(partition_col)).alias("_mn"),
            F.max(F.col(partition_col)).alias("_mx"),
            F.max(F.col(partition_col).isNull()).alias("_kn"),
        )
        .agg(
            F.max(F.col("_mn") != F.col("_mx")).alias("_viol"),
            F.max("_kn").alias("_any_null"),
            F.collect_set("_mn").alias("_touched"),
        )
        .collect()[0]
    )
    if stats["_any_null"]:
        bad = (
            df.filter(F.col(partition_col).isNull())
            .select(*keys)
            .limit(1)
            .collect()
        )
        raise ValueError(
            f"merge_load_partitioned: key "
            f"{tuple(bad[0][k] for k in keys) if bad else '?'} carries a "
            f"NULL {partition_col!r} — isin-pruning can never read a null "
            f"partition back, so its prior rows would be silently lost on "
            f"overwrite; make partition_col a non-null function of the keys"
        )
    if stats["_viol"]:
        # error path only: re-derive WHICH key violated (cost is fine
        # here; the happy path stays one job)
        viol = (
            df.groupBy(*keys)
            .agg(F.count_distinct(F.col(partition_col)).alias("_np"))
            .filter(F.col("_np") > 1)
            .limit(1)
            .collect()
        )
        raise ValueError(
            f"merge_load_partitioned: key {tuple(viol[0][k] for k in keys)!r} "
            f"maps to {viol[0]['_np']} distinct {partition_col!r} values in "
            f"this batch — partition_col must be a deterministic function "
            f"of the merge keys"
        )
    touched = list(stats["_touched"])
    if not touched:
        return 0
    src_col, rn_col = "_merge_src", "_merge_rn"
    while src_col in df.columns:
        src_col = "_" + src_col
    while rn_col in df.columns:
        rn_col = "_" + rn_col
    try:
        existing = (
            spark.read.parquet(path)
            .filter(F.col(partition_col).isin(touched))
            .withColumn(src_col, F.lit(0))
        )
    except AnalysisException as exc:
        # absence is benign in two spellings: no path at all, or a
        # path holding only metadata (the stamp-before-data crash
        # window below leaves _layout.json with no parquet yet, which
        # reads as UNABLE_TO_INFER_SCHEMA)
        if "PATH_NOT_FOUND" not in str(exc) and (
            "UNABLE_TO_INFER_SCHEMA" not in str(exc)
        ):
            raise  # same posture as merge_load: only absence is benign
        existing = None
    incoming = df.withColumn(src_col, F.lit(1))
    allrows = incoming if existing is None else existing.unionByName(incoming)
    order = [F.col(order_col).desc(), F.col(src_col).desc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).desc())
    w = Window.partitionBy(*keys).orderBy(*order)
    merged = (
        allrows.withColumn(rn_col, F.row_number().over(w))
        .filter(F.col(rn_col) == 1)
        .drop(rn_col, src_col)
    ).localCheckpoint(eager=True)
    if stamped is None:
        # first write, explicit adopt_layout migration, or a
        # declaration-only layout_spec upgrade: pin the layout BEFORE
        # the data write.  The other order (r13) left a crash window
        # — data landed, stamp pending — that the unstamped-target
        # refusal above would turn into a hard error on the retry; a
        # stamp-without-data crash instead reads back as an empty
        # existing side (UNABLE_TO_INFER_SCHEMA handled above) and the
        # retry heals it.
        _write_layout_marker(spark, path, layout)
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )
    return merged.count()


def _partition_subdirs(fs, jpath) -> list:
    """Hive-style ``col=value`` child directories of ``jpath`` (hidden
    entries excluded) — the marker of a partitioned target."""
    out = []
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if st.isDirectory() and "=" in name and not name.startswith((".", "_")):
            out.append(st.getPath())
    return out


def _batch_subdirs(fs, jpath) -> list:
    """``batch-<id>`` child directories of ``jpath`` — the marker of an
    ``idempotent_append_load`` (batched) target."""
    out = []
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("batch-"):
            out.append(st.getPath())
    return out


def _compact_side_paths(path: str) -> tuple[str, str]:
    """Dot-prefixed tmp/old siblings for the batched-target compaction
    swap (distinct from ``_merge_side_paths`` so a compaction crash
    can never be confused with a merge crash during recovery)."""
    base = path.rstrip("/")
    head, _, tail = base.rpartition("/")
    prefix = f"{head}/" if head else ""
    return f"{prefix}.{tail}._compact_tmp", f"{prefix}.{tail}._compact_old"


def compact_table(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 512,
    parallelism: int = 4,
    _after_snapshot=None,
) -> tuple[int, int]:
    """Small-files compaction: rewrite a parquet target into
    ``ceil(bytes / target_file_mb)`` files.

    (``_after_snapshot`` is a test-only seam: called once right after
    each swap's snapshot listing so tests can deterministically land an
    in-flight write in the snapshot-to-swap window and verify the
    stray rescue — the race itself is excluded for real writers by the
    marker, and cannot be staged reliably with threads.)

    Every incremental pattern (append_load batches, streaming sinks,
    dynamic partition re-loads) accretes small files, and at 100 TB
    the resulting per-file open/footer overhead dominates scans long
    before data volume does.  The rewrite is one job per compacted
    directory — scan, round-robin ``repartition`` to the target file
    count, write to the hidden ``merge_load`` tmp sibling,
    metadata-swap in (same crash-safe keep-aside dance, so a failed
    compaction never damages the live target).

    PARTITIONED targets (Hive-style ``col=value`` subdirectories) are
    compacted PER LEAF PARTITION, preserving the layout: each leaf
    directory gets its own size-targeted rewrite with its own hidden
    swap siblings (dot-prefixed, so a concurrent reader of the parent
    never sees in-flight tmp files).  Earlier versions globbed
    ``part-*`` at the top level only — a partitioned target reported
    "already compact" (0, 0) while holding thousands of small files
    per partition.  A target that MIXES top-level part-files with
    partition subdirectories is refused loudly: a flat rewrite would
    flatten the partition layout, and no consistent reading of such a
    target exists.  Returns total (files_before, files_after).

    Leaf partitions compact CONCURRENTLY (``parallelism`` driver
    threads, each submitting independent Spark jobs against the shared
    scheduler — the standard multi-job pattern): a 100 TB table has
    thousands of partitions, and one-job-at-a-time leaves the cluster
    idle between tiny per-partition rewrites.  Each leaf keeps its own
    crash-safe hidden-sibling swap, so concurrency never widens the
    blast radius of a failure past that leaf.

    BATCHED targets (``idempotent_append_load``'s ``batch-<id>``
    subdirectories) are compacted manifest-aware: the snapshot batch
    dirs merge into one size-targeted ``batch-compacted-<uuid>`` dir,
    and every superseded batch id keeps a TOMBSTONE directory (holding
    a durable ``_compacted_into_*`` marker file — empty dirs don't
    survive object stores), so redelivery of a compacted batch id is
    STILL a no-op: the idempotence contract survives compaction.
    Earlier versions silently reported a batched target "already
    compact" (0, 0) — batch dirs carry no ``=`` so the partition walk
    skipped them and the top-level ``part-*`` glob saw nothing.

    WRITER EXCLUSION: the whole call holds a ``_COMPACTING`` marker at
    the target root that every incremental writer (append_load,
    idempotent_append_load, merge_load, merge_load_partitioned,
    delete_load, overwrite_partitions_load) checks and refuses on —
    without it, rows landing between this call's snapshot and its
    directory swap would be deleted with the superseded copy.  As
    defense in depth each swap also reads its SNAPSHOT file list
    explicitly (never the directory) and, after the swap, RESCUES any
    stray file/batch-dir that an already-in-flight writer landed after
    the snapshot by moving it into the new copy.  The marker is
    removed only on success; after a crash it keeps writers refusing
    (the safe direction) until the operator inspects the target and
    calls ``clear_compaction_marker`` — re-running compact_table then
    restores any kept-aside copy before proceeding.
    """
    import math

    jvm = spark._jvm
    jfinal = jvm.org.apache.hadoop.fs.Path(path)
    fs = jfinal.getFileSystem(spark._jsc.hadoopConfiguration())

    def _jpath(s: str):
        return jvm.org.apache.hadoop.fs.Path(s)

    # recovery from a previous compaction that died between its two
    # top-level renames: live dir missing, keep-aside complete — restore
    # before any listing (leaf-level crashes recover inside _compact_flat)
    for side_tmp, side_old in (_merge_side_paths(path), _compact_side_paths(path)):
        jold_prev = _jpath(side_old)
        if not fs.exists(jfinal) and fs.exists(jold_prev):
            if not fs.rename(jold_prev, jfinal):
                raise IOError(
                    f"compact_table: crash recovery {side_old} -> {path} failed"
                )
        fs.delete(_jpath(side_tmp), True)  # leftover tmp from a dead run

    if not fs.exists(jfinal):
        raise IOError(f"compact_table: target {path!r} does not exist")

    def _part_files(p) -> list:
        # FileStatus of part-files only (not _SUCCESS / hidden)
        hits = fs.globStatus(_jpath(p.toString() + "/part-*"))
        return [] if hits is None else list(hits)

    def _n_out(total_bytes: int) -> int:
        return max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))

    def _compact_flat(jdir) -> tuple[int, int]:
        dir_path = jdir.toString()
        tmp_path, old_path = _merge_side_paths(dir_path)
        jtmp, jold = _jpath(tmp_path), _jpath(old_path)
        if not fs.exists(jdir) and fs.exists(jold):  # leaf crash recovery
            if not fs.rename(jold, jdir):
                raise IOError(
                    f"compact_table: crash recovery {old_path} -> {dir_path} failed"
                )
        snapshot = _part_files(jdir)
        if _after_snapshot is not None:
            _after_snapshot()
        files_before = len(snapshot)
        n_out = _n_out(sum(st.getLen() for st in snapshot))
        if files_before <= n_out:
            return files_before, files_before  # already compact: no rewrite
        # read the SNAPSHOT explicitly, not the directory: a file landing
        # after this listing is never double-read, so the stray rescue
        # below can move it into the new copy without duplicating rows
        df = spark.read.parquet(
            *[st.getPath().toString() for st in snapshot]
        ).repartition(n_out)
        fs.delete(jtmp, True)
        df.write.mode("overwrite").parquet(tmp_path)
        fs.delete(jold, True)
        if not fs.rename(jdir, jold):
            raise IOError(
                f"compact_table: keep-aside {dir_path} -> {old_path} failed"
            )
        if not fs.rename(jtmp, jdir):
            raise IOError(
                f"compact_table: rename {tmp_path} -> {dir_path} failed"
            )
        # stray rescue: an append already in flight when the marker
        # appeared may have landed files after the snapshot; they rode
        # aside with the old copy — move them in instead of deleting
        snap_names = {st.getPath().getName() for st in snapshot}
        for st in _part_files(jold):
            name = st.getPath().getName()
            if name not in snap_names:
                if not fs.rename(st.getPath(), _jpath(dir_path + "/" + name)):
                    raise IOError(
                        f"compact_table: stray rescue of {name} into "
                        f"{dir_path} failed"
                    )
        fs.delete(jold, True)
        return files_before, len(_part_files(jdir))

    def _compact_batched(batch_dirs) -> tuple[int, int]:
        import uuid as _uuid

        snap = {d.getName(): _part_files(d) for d in batch_dirs}
        if _after_snapshot is not None:
            _after_snapshot()
        files_before = sum(len(v) for v in snap.values())
        n_out = _n_out(sum(st.getLen() for v in snap.values() for st in v))
        if files_before <= n_out:
            return files_before, files_before
        compact_name = f"batch-compacted-{_uuid.uuid4().hex[:12]}"
        tmp_path, old_path = _compact_side_paths(path)
        jtmp, jold = _jpath(tmp_path), _jpath(old_path)
        fs.delete(jtmp, True)
        merged = spark.read.parquet(
            *[st.getPath().toString() for v in snap.values() for st in v]
        ).repartition(n_out)
        merged.write.mode("overwrite").parquet(tmp_path + "/" + compact_name)
        # tombstones: every superseded batch id keeps its directory so
        # idempotent_append_load's exists() check still sees it applied
        for name in snap:
            fs.mkdirs(_jpath(tmp_path + "/" + name))
            fs.create(
                _jpath(f"{tmp_path}/{name}/_compacted_into_{compact_name}"),
                True,
            ).close()
        fs.delete(jold, True)
        if not fs.rename(jfinal, jold):
            raise IOError(
                f"compact_table: keep-aside {path} -> {old_path} failed"
            )
        if not fs.rename(jtmp, jfinal):
            raise IOError(
                f"compact_table: rename {tmp_path} -> {path} failed"
            )
        # stray rescue: a batch dir published after the snapshot by an
        # in-flight writer rode aside with the old copy — move it in
        base = path.rstrip("/")
        for st in fs.listStatus(jold):
            name = st.getPath().getName()
            if (
                st.isDirectory()
                and name.startswith("batch-")
                and name not in snap
            ):
                if not fs.rename(st.getPath(), _jpath(base + "/" + name)):
                    raise IOError(
                        f"compact_table: stray rescue of batch dir {name} "
                        f"into {path} failed"
                    )
        fs.delete(jold, True)
        after = fs.globStatus(_jpath(base + "/batch-*/part-*"))
        return files_before, 0 if after is None else len(after)

    def _leaf_dirs(jdir) -> list:
        # multi-level partitioning: descend until a dir has no
        # col=value children
        subs = _partition_subdirs(fs, jdir)
        if not subs:
            return [jdir]
        leaves = []
        for s in subs:
            leaves.extend(_leaf_dirs(s))
        return leaves

    def _done(result: tuple[int, int]) -> tuple[int, int]:
        fs.delete(jmarker, False)  # success: release the writer guard
        return result

    part_dirs = _partition_subdirs(fs, jfinal)
    batch_dirs = _batch_subdirs(fs, jfinal)
    top_files = len(_part_files(jfinal))
    kinds = {
        "top-level part-files": top_files,
        "col=value partition subdirectories": len(part_dirs),
        "batch-<id> subdirectories": len(batch_dirs),
    }
    present = [k for k, v in kinds.items() if v]
    if len(present) > 1:
        raise ValueError(
            f"compact_table: target {path!r} mixes "
            + " with ".join(f"{kinds[k]} {k}" for k in present)
            + " — no single rewrite preserves both layouts; repair the "
            "target layout first"
        )
    _, jmarker = _compacting_marker_path(spark, path)
    if fs.exists(jmarker):
        raise IOError(
            f"compact_table: target {path!r} already carries "
            f"{_COMPACTING_MARKER!r} (another compaction live, or a "
            f"crashed one) — inspect and clear_compaction_marker() first"
        )
    fs.create(jmarker, False).close()  # no-overwrite: loses races loudly
    if batch_dirs:
        return _done(_compact_batched(batch_dirs))
    if not part_dirs:
        return _done(_compact_flat(jfinal))
    from concurrent.futures import ThreadPoolExecutor

    leaves = _leaf_dirs(jfinal)
    workers = max(1, min(parallelism, len(leaves)))
    if workers == 1:
        results = [_compact_flat(leaf) for leaf in leaves]
    else:
        with ThreadPoolExecutor(max_workers=workers) as pool:
            results = list(pool.map(_compact_flat, leaves))
    return _done(
        (
            sum(b for b, _ in results),
            sum(a for _, a in results),
        )
    )


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

    _refuse_if_compacting(df.sparkSession, path)
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


def idempotent_append_load(df: DataFrame, path: str, batch_id: str) -> tuple[int, bool]:
    """Exactly-once append under retries: each batch lands as its own
    subdirectory ``batch-<id>`` published by atomic tmp-dir rename, so
    a RETRY of an already-committed batch is a no-op instead of a
    duplicate — the at-least-once-delivery reality of every queue/
    scheduler, solved with a directory-per-batch manifest (the pattern
    foreachBatch sinks use with batchId; Delta/Iceberg replace the
    rename with a txn-log commit carrying the same id).  A crash
    mid-write leaves only a dot-prefixed tmp (invisible to readers —
    Spark's listing skips '.'/'_' paths) that the winner's publish or
    the next retry ignores.  Read the target back with
    ``read_batched_target`` (recursive lookup).  Returns (total rows
    now live, whether THIS call applied the batch)."""
    import uuid as _uuid

    spark = df.sparkSession
    _refuse_if_compacting(spark, path)
    jvm = spark._jvm
    dest = path.rstrip("/") + f"/batch-{batch_id}"
    jdest = jvm.org.apache.hadoop.fs.Path(dest)
    fs = jdest.getFileSystem(spark._jsc.hadoopConfiguration())
    applied = False
    if not fs.exists(jdest):
        tmp = path.rstrip("/") + f"/.batch-{batch_id}.__tmp_{_uuid.uuid4().hex[:8]}"
        write_parquet_sink(df, tmp, mode="overwrite")
        jtmp = jvm.org.apache.hadoop.fs.Path(tmp)
        if fs.rename(jtmp, jdest):
            applied = True
        else:  # lost the race to a concurrent retry — its commit stands
            fs.delete(jtmp, True)
            if not fs.exists(jdest):
                raise IOError(f"idempotent append: publish {dest} failed")
    total = read_batched_target(spark, path).count()
    return total, applied


def read_batched_target(spark: SparkSession, path: str) -> DataFrame:
    """Read a batch-per-subdirectory target (idempotent_append_load's
    layout): recursive lookup, no partition-column inference."""
    return spark.read.option("recursiveFileLookup", "true").parquet(path)
