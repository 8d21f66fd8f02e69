from pyspark.sql import types as T

from aws_pandas_etl_spark.functions.types import build_struct_type
from aws_pandas_etl_spark.sources.readers import (
    jdbc_scan,
    load_table,
    read_csv,
    read_json,
    register_temp_views,
)

SF = "/root/testdata/sf0.001"


def test_load_table_all(spark):
    for name, rows in [("region", 5), ("nation", 25), ("events", 1000)]:
        assert load_table(spark, SF, name).count() == rows


def test_events_nanos_ts_converted(spark):
    df = load_table(spark, SF, "events")
    assert dict((f.name, f.dataType) for f in df.schema.fields)["ts"] == T.TimestampType()


def test_register_temp_views_sql(spark):
    register_temp_views(spark, SF, ["region", "nation"])
    got = spark.sql(
        "SELECT r_name, count(*) AS n FROM nation JOIN region "
        "ON n_regionkey = r_regionkey GROUP BY r_name ORDER BY r_name"
    ).collect()
    assert len(got) == 5 and sum(r["n"] for r in got) == 25


def test_read_csv_with_schema(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("id,amount,when\n1,12.50,2024-01-02\n2,,2024-01-03\n")
    schema = build_struct_type(["id bigint not null", "amount decimal(10,2)", "when date"])
    df = read_csv(spark, str(p), schema=schema)
    rows = df.orderBy("id").collect()
    assert rows[0]["amount"] is not None and rows[1]["amount"] is None
    # file sources force nullable=true; compare names and types
    assert [(f.name, f.dataType) for f in df.schema.fields] == [
        (f.name, f.dataType) for f in schema.fields
    ]


def test_read_json(spark, tmp_path):
    p = tmp_path / "in.json"
    p.write_text('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n')
    assert read_json(spark, str(p)).count() == 2


def test_jdbc_scan_requires_bounds(spark):
    import pytest

    with pytest.raises(ValueError, match="lower_bound"):
        jdbc_scan(spark, "jdbc:postgresql://x/db", "t", partition_column="id")

def test_orc_round_trip(spark, tmp_path):
    from aws_pandas_etl_spark.sources.readers import load_table, read_orc

    src = load_table(spark, "/root/testdata/sf0.001", "nation")
    p = str(tmp_path / "nation_orc")
    src.write.orc(p)
    back = read_orc(spark, p)
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in src.collect()
    )
    # pushdown works on ORC scans too
    ex = read_orc(spark, p).filter("n_nationkey = 3")._jdf.queryExecution().toString()
    assert "PushedFilters: [IsNotNull(n_nationkey), EqualTo(n_nationkey,3)]" in ex


def test_binary_file_source_feeds_multimodal(spark, tmp_path):
    from aws_pandas_etl_spark.operators.multimodal import sample_frames
    from aws_pandas_etl_spark.sources.readers import read_binary_files

    (tmp_path / "a.bin").write_bytes(b"x" * 150)
    (tmp_path / "b.bin").write_bytes(b"y" * 40)
    (tmp_path / "skip.txt").write_text("nope")
    df = read_binary_files(spark, str(tmp_path), glob="*.bin")
    assert df.count() == 2
    assert dict(df.select("length").toPandas()["length"].value_counts()) == {150: 1, 40: 1}
    # feed the blobs straight into the frame sampler (64-byte frames)
    from pyspark.sql import functions as F

    blobs = df.select(
        F.monotonically_increasing_id().alias("doc_id"),
        F.col("content").alias("payload"),
    )
    frames = sample_frames(blobs, every_n_bytes=64, max_frames=8)
    per_doc = sorted(
        r["n"] for r in frames.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    )
    assert per_doc == [1, 2]  # 40 bytes -> 1 frame, 150 bytes -> 2 frames


def test_batch_and_stream_agree_on_event_instants(spark, tmp_path):
    """Fixture-drift canary: the batch reader (load_table) and the
    streaming reader (open_events_stream) must agree on min/max(ts)
    instants for the SAME fixture file.  Round 4 regressed exactly
    here — the fixtures moved from TIMESTAMP(NANOS) to TIMESTAMP(µs),
    the batch reader was adapted, the streaming reader was not, and
    every streamed event collapsed to ~1970.  Any future testdata
    regeneration that changes the physical timestamp unit trips this
    at commit time."""
    import uuid

    from pyspark.sql import functions as F

    from aws_pandas_etl_spark.sources.readers import load_table
    from aws_pandas_etl_spark.streaming.events_stream import open_events_stream

    sf = "/root/testdata/sf0.001"
    [b] = (
        load_table(spark, sf, "events")
        .agg(F.min("ts").alias("mn"), F.max("ts").alias("mx"))
        .collect()
    )

    name = f"canary_{uuid.uuid4().hex[:8]}"
    q = (
        open_events_stream(spark, sf)
        .select("ts")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(120)
    finally:
        q.stop()
    [s] = spark.table(name).agg(F.min("ts").alias("mn"), F.max("ts").alias("mx")).collect()
    assert (s["mn"], s["mx"]) == (b["mn"], b["mx"])
    # and the events really are in the fixtures' 2024 range, not 1970
    assert b["mn"].year >= 2020, f"batch reader itself drifted: {b['mn']}"


def test_stream_reads_directory_shaped_events_table(spark, tmp_path):
    """``events.parquet`` as a DIRECTORY of part files — any
    distributed writer's output, and every scale-probe clone's layout
    — must stream the same rows as the single-file fixture.  Found
    live in r14: ``pathGlobFilter`` matches LEAF file names, so
    filtering the parent listing by "events.parquet" matched zero
    part files inside the directory and the stream silently processed
    an EMPTY source (the footer probe handled directories, the source
    construction did not — streaming probe numbers came back BELOW
    the machinery floor, which is how it surfaced)."""
    import uuid

    from pyspark.sql import functions as F

    from aws_pandas_etl_spark.sources.readers import load_table
    from aws_pandas_etl_spark.streaming.events_stream import open_events_stream

    sf = "/root/testdata/sf0.001"
    base = load_table(spark, sf, "events")
    # directory-shaped twin of the fixture, multiple part files
    d = str(tmp_path / "dir_sf")
    base.repartition(3).write.parquet(d + "/events.parquet")

    name = f"dirshape_{uuid.uuid4().hex[:8]}"
    q = (
        open_events_stream(spark, d)
        .select("event_id", "ts")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(120)
    finally:
        q.stop()
    got = spark.table(name)
    assert got.count() == base.count()  # not an empty source
    [s] = got.agg(F.min("ts").alias("mn"), F.max("ts").alias("mx")).collect()
    [b] = base.agg(F.min("ts").alias("mn"), F.max("ts").alias("mx")).collect()
    assert (s["mn"], s["mx"]) == (b["mn"], b["mx"])


def test_legacy_int96_timestamps_read_natively(spark, tmp_path):
    """Legacy INT96 timestamps (Spark's own historical default output
    type, still everywhere in old lakes) surface as timestamp[ns] in
    pyarrow schemas — but Spark decodes INT96 natively, so both the
    batch and streaming probes must route them to the plain
    TimestampType path, never nanosAsLong (found live in round 6: the
    streaming probe misclassified a Spark-written INT96 file and the
    micro-batch failed on the long-schema mismatch)."""
    import os
    import shutil as _sh
    import uuid as _uuid

    from pyspark.sql import functions as F

    from aws_pandas_etl_spark.sources.readers import load_table
    from aws_pandas_etl_spark.streaming.events_stream import (
        _probe_ts_type,
        open_events_stream,
    )

    src = load_table(spark, "/root/testdata/sf0.001", "events")
    d = tmp_path / "int96"
    prior = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try:
        src.coalesce(1).write.mode("overwrite").parquet(str(d / "w"))
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", prior)
    [part] = [f for f in os.listdir(d / "w") if f.endswith(".parquet")]
    _sh.move(str(d / "w" / part), str(d / "events.parquet"))

    assert _probe_ts_type(spark, str(d), "events.parquet") == "tz"
    [want] = src.agg(F.min("ts").alias("mn"), F.max("ts").alias("mx")).collect()
    got = load_table(spark, str(d), "events")
    [b] = got.agg(F.min("ts").alias("mn"), F.max("ts").alias("mx")).collect()
    assert (b["mn"], b["mx"]) == (want["mn"], want["mx"])

    name = f"int96_{_uuid.uuid4().hex[:8]}"
    q = (
        open_events_stream(spark, str(d))
        .select("ts")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(120)
    finally:
        q.stop()
    [s] = spark.table(name).agg(F.min("ts").alias("mn"), F.max("ts").alias("mx")).collect()
    assert (s["mn"], s["mx"]) == (want["mn"], want["mx"])


def test_stream_probe_speaks_hadoop_fs_schemes(spark):
    """The streaming footer probe must go through the Hadoop
    FileSystem API (like load_config_from_url), not os.listdir — an
    s3a:// or hdfs:// stream source would otherwise fail at the probe.
    Proven two ways: (a) the probe resolves a scheme-qualified
    file:// directory; (b) the _HadoopFooterFile range-read wrapper
    feeds pyarrow the same schema a direct local read yields (the
    exact path a remote scheme takes)."""
    import pyarrow.parquet as pq

    from aws_pandas_etl_spark.streaming.events_stream import (
        _HadoopFooterFile,
        _probe_ts_type,
    )

    sf = "/root/testdata/sf0.001"
    assert _probe_ts_type(spark, f"file://{sf}", "events.parquet") == _probe_ts_type(
        spark, sf, "events.parquet"
    )

    jvm = spark.sparkContext._jvm
    local = f"{sf}/events.parquet"
    jpath = jvm.org.apache.hadoop.fs.Path(f"file://{local}")
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    st = fs.getFileStatus(jpath)
    f = _HadoopFooterFile(jvm, fs, jpath, st.getLen())
    try:
        assert pq.read_schema(f).equals(pq.read_schema(local))
    finally:
        f.close()


def test_parquet_sink_scaffold_cleans_checkpoint_and_reports_real_errors(spark):
    """_run_to_parquet_sink must (a) delete its per-call checkpoint
    dir (they accumulated in /tmp across bench and test runs), and
    (b) return empty ONLY for genuinely-uncommitted output — a
    read-back failure on committed files must propagate, not
    masquerade as zero rows."""
    import glob as globmod
    import os
    import tempfile

    from aws_pandas_etl_spark.streaming.events_stream import (
        _run_to_parquet_sink,
        events_stream,
    )

    tmp = tempfile.gettempdir()
    before = set(globmod.glob(os.path.join(tmp, "ckpt_probe6_*")))
    stream = events_stream(spark, "/root/testdata/sf0.001").select(
        "event_id", "ts", "event_type"
    )
    out = _run_to_parquet_sink(spark, stream, "probe6", 120)
    assert out.count() > 0
    after = set(globmod.glob(os.path.join(tmp, "ckpt_probe6_*")))
    assert after == before, f"leaked checkpoint dirs: {after - before}"


def test_jdbc_scan_executes_against_embedded_derby(spark, tmp_path):
    """S1 production path actually executed: write the orders table
    into an embedded Derby database (on Spark's classpath for the Hive
    metastore), then ``jdbc_scan`` it back partitioned — schema derived
    from JDBC metadata (the reference's S2 catalog_scan, done by hand
    there: /root/reference/utils/rdbms_operations.py:47-122), the scan
    split into numPartitions ranges on partitionColumn (replacing the
    reference's single-cursor chunksize=1000000 loop at :224-227).
    Compares row-for-row against the parquet twin."""
    from pyspark.sql import functions as F

    from aws_pandas_etl_spark.sources.readers import jdbc_scan, load_table

    url = f"jdbc:derby:{tmp_path}/ordersdb;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    orders = load_table(spark, "/root/testdata/sf0.001", "orders")

    writer = (
        orders.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "orders")
        # Derby maps StringType to CLOB by default, and CLOB columns
        # cannot appear in a pushed-down WHERE comparison — declare
        # VARCHAR so the pushdown proof below executes in-database
        .option(
            "createTableColumnTypes",
            "o_orderstatus VARCHAR(4), o_orderpriority VARCHAR(20)",
        )
    )
    for k, v in props.items():
        writer = writer.option(k, v)
    writer.mode("overwrite").save()

    lo, hi = orders.agg(F.min("o_orderkey"), F.max("o_orderkey")).collect()[0]
    scanned = jdbc_scan(
        spark,
        url,
        "orders",
        partition_column="o_orderkey",
        num_partitions=4,
        lower_bound=lo,
        upper_bound=hi,
        properties=props,
    )
    # the scan is genuinely range-partitioned, not one cursor
    assert scanned.rdd.getNumPartitions() == 4
    want = sorted(tuple(r) for r in orders.collect())
    got = sorted(tuple(r) for r in scanned.collect())
    assert got == want

    # Predicate + projection pushdown must reach the JDBC source: the
    # scan node (not a Spark-side Filter) carries the predicate, and
    # its ReadSchema/output holds only the selected columns — i.e. the
    # database evaluates `WHERE o_orderpriority = ...` and ships two
    # columns, matching the reference's pushed-down catalog queries
    # (/root/reference/utils/rdbms_operations.py:56-94).
    pruned = scanned.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_totalprice"
    )
    ex = pruned._jdf.queryExecution().toString()
    scan_lines = [l for l in ex.splitlines() if "JDBCRelation" in l]
    assert scan_lines, ex
    pushed = [l for l in scan_lines if "PushedFilters" in l]
    assert any("EqualTo(o_orderpriority,1-URGENT)" in l for l in pushed), ex
    # projection pruned at the source: the scan's column list must not
    # include unselected columns like o_comment/o_custkey
    scan_line = pushed[-1]
    assert "o_comment" not in scan_line and "o_custkey" not in scan_line, scan_line
    # and the pushed plan still returns correct rows
    want_n = orders.filter("o_orderpriority = '1-URGENT'").count()
    assert pruned.count() == want_n


def test_jdbc_overwrite_load_roundtrip_derby(spark, tmp_path):
    """K2 write-back e2e (VERDICT r10 #7): the JDBC overwrite-load
    production posture proved against a real database engine, not
    parquet — write orders into embedded Derby, reconcile the returned
    count against an in-database COUNT(*), overwrite AGAIN with
    truncate=True (the reference's TRUNCATE+COPY refresh) and verify
    no duplication and value-level parity with the source."""
    from aws_pandas_etl_spark.sources.readers import load_table
    from aws_pandas_etl_spark.sources.sinks import jdbc_overwrite_load

    url = f"jdbc:derby:{tmp_path}/k2db;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    n_src = orders.count()

    # first load: table created by the writer
    n1 = jdbc_overwrite_load(
        orders,
        url,
        "orders_k2",
        properties=props,
        create_table_column_types=(
            "o_orderstatus VARCHAR(4), o_orderpriority VARCHAR(20)"
        ),
    )
    assert n1 == n_src

    # refresh load with TRUNCATE semantics: same count, NOT doubled —
    # the overwrite is a truncate+reload, not an append
    n2 = jdbc_overwrite_load(orders, url, "orders_k2", properties=props, truncate=True)
    assert n2 == n_src

    # value-level parity read back through JDBC
    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "orders_k2")
        .option("driver", props["driver"])
        .load()
    )
    want = sorted(tuple(r) for r in orders.collect())
    got = sorted(tuple(r) for r in back.collect())
    assert got == want


def test_schema_evolution_merge_on_read(spark, tmp_path):
    """Schema evolution across appended batches: an old batch written
    without a column and a new batch with it must read back as one
    table under mergeSchema, old rows NULL-filled — the evolution path
    the reference's cast-or-fail schema enforcement cannot express
    (its answer is a full TRUNCATE+reload).  Also pins the default:
    without mergeSchema Spark serves ONE footer's schema, so relying
    on implicit merging is a silent-data-loss bug, not a feature."""
    from pyspark.sql import functions as F

    old = spark.range(3).select(F.col("id").alias("k"), F.lit("old").alias("v"))
    new = spark.range(3, 5).select(
        F.col("id").alias("k"), F.lit("new").alias("v"), F.lit(7).alias("extra")
    )
    old.write.mode("append").parquet(str(tmp_path / "t"))
    new.write.mode("append").parquet(str(tmp_path / "t"))

    merged = spark.read.option("mergeSchema", "true").parquet(str(tmp_path / "t"))
    assert set(merged.columns) == {"k", "v", "extra"}
    rows = {r["k"]: (r["v"], r["extra"]) for r in merged.collect()}
    assert rows[0] == ("old", None) and rows[4] == ("new", 7)
    assert len(rows) == 5


def test_hadoop_footer_file_drives_remote_probe_branch(spark, tmp_path):
    """The non-local branch of the streaming ts probe (events_stream.py::
    _probe_ts_type) reads parquet footers through a py4j file-like over
    the Hadoop FileSystem API.  No remote scheme exists in the harness,
    so drive the SAME machinery over a Hadoop ``file:`` path directly:
    _HadoopFooterFile must satisfy pyarrow's seek/read footer protocol
    and _ts_kind must classify the column identically to the fast path
    (the Derby treatment of the JDBC claim, applied to streaming)."""
    import pyarrow.parquet as pq

    from aws_pandas_etl_spark.streaming.events_stream import (
        _HadoopFooterFile,
        _ts_kind,
    )

    src = "/root/testdata/sf0.001/events.parquet"
    fast = _ts_kind(pq.ParquetFile(src))

    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(f"file://{src}")
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    st = fs.getFileStatus(jpath)
    f = _HadoopFooterFile(jvm, fs, jpath, st.getLen())
    try:
        # protocol surface pyarrow relies on
        assert f.readable() and f.seekable() and not f.writable()
        assert f.seek(0, 2) == st.getLen()  # SEEK_END
        assert f.read() == b""              # read at EOF -> empty
        f.seek(0)
        assert f.read(4) == b"PAR1" and f.tell() == 4
        f.seek(-4, 2)
        assert f.read(4) == b"PAR1"         # parquet tail magic
        f.seek(0)
        assert _ts_kind(pq.ParquetFile(f)) == fast
    finally:
        f.close()
    assert f.closed


def test_load_table_metadata_cache_and_invalidation(spark, tmp_path):
    """The (path, fingerprint)-keyed schema cache serves repeat reads
    without re-inference, and a rewrite of the table (new fingerprint)
    invalidates it — the cache can never pin a stale schema; rows are
    re-scanned from parquet either way (metadata-only cache)."""
    import os
    import time as _time

    from pyspark.sql import functions as F

    from aws_pandas_etl_spark.sources import readers

    sf_dir = str(tmp_path)
    path = os.path.join(sf_dir, "t.parquet")
    spark.range(5).select(
        F.col("id"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).cast("timestamp_ntz").alias("ts"),
    ).coalesce(1).write.mode("overwrite").parquet(path)

    df1 = load_table(spark, sf_dir, "t")
    assert path in readers._META_CACHE
    fields1 = {f.name: f.dataType for f in df1.schema.fields}
    assert fields1["ts"] == T.TimestampType()  # NTZ normalized
    # cached second read: identical schema and data
    df2 = load_table(spark, sf_dir, "t")
    assert df2.schema == df1.schema
    assert df2.count() == 5

    # rewrite with a DIFFERENT schema; bump mtime so the fingerprint
    # cannot collide even on a coarse-mtime filesystem
    spark.range(3).select(
        F.col("id"), F.lit("x").alias("extra")
    ).coalesce(1).write.mode("overwrite").parquet(path)
    future = _time.time() + 5
    os.utime(path, (future, future))
    df3 = load_table(spark, sf_dir, "t")
    assert "extra" in df3.columns and df3.count() == 3


def test_load_table_missing_path_raises_spark_error(spark, tmp_path):
    """A missing table surfaces Spark's usual AnalysisException (the
    pre-cache contract), not a FileNotFoundError from the fingerprint
    stat (r15 ADVICE): callers that catch Spark errors keep working."""
    import pytest
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        load_table(spark, str(tmp_path), "no_such_table")


def test_fingerprint_invalidates_on_nested_rewrite(spark, tmp_path):
    """Rewriting a file two levels deep (partition=X/part-*.parquet)
    changes the fingerprint even though the table dir's own mtime and
    direct-child stats do not — the recursive walk closes the stale-
    schema window the r15 ADVICE flagged for partitioned layouts."""
    import os
    import time as _time

    from pyspark.sql import functions as F

    from aws_pandas_etl_spark.sources import readers

    sf_dir = str(tmp_path)
    path = os.path.join(sf_dir, "p.parquet")
    spark.range(4).select(
        F.col("id"), (F.col("id") % 2).alias("part")
    ).write.mode("overwrite").partitionBy("part").parquet(path)
    df1 = load_table(spark, sf_dir, "p")
    assert set(df1.columns) == {"id", "part"}
    fp1 = readers._META_CACHE[path][0]

    # rewrite ONE leaf file inside partition part=0 with an extra
    # column, then pin the table dir's and partition dirs' mtimes back
    # so only the leaf's stat differs (the exact stale case flagged)
    stats = {
        p: os.stat(p)
        for p in (
            path,
            *(os.path.join(path, d) for d in os.listdir(path)
              if os.path.isdir(os.path.join(path, d))),
        )
    }
    part0 = os.path.join(path, "part=0")
    leaf = [f for f in os.listdir(part0) if f.endswith(".parquet")][0]
    spark.range(2).select(
        F.col("id"), F.lit("x").alias("extra")
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(sf_dir, "tmp1"))
    tmp_leaf = [
        f
        for f in os.listdir(os.path.join(sf_dir, "tmp1"))
        if f.endswith(".parquet")
    ][0]
    os.replace(
        os.path.join(sf_dir, "tmp1", tmp_leaf), os.path.join(part0, leaf)
    )
    # drop Hadoop's checksum sidecar for the replaced leaf — it still
    # describes the OLD bytes and local reads would fail on it (the
    # rewrite-in-place here is test plumbing, not an engine path)
    crc = os.path.join(part0, f".{leaf}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    future = _time.time() + 5
    os.utime(os.path.join(part0, leaf), (future, future))
    for p, st in stats.items():
        os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns))

    fp2 = readers._path_fingerprint(path)
    assert fp2 != fp1  # recursive walk sees the leaf rewrite
    load_table(spark, sf_dir, "p")  # re-infers (cache miss), no stale serve
    assert readers._META_CACHE[path][0] == fp2  # entry re-keyed, not stale
