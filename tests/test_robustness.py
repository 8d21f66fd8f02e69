"""Robustness: skewed inputs and idempotent reloads."""

import decimal

from pyspark.sql import Row
from pyspark.sql import functions as F

from aws_pandas_etl_spark.functions.skew import exact_distinct_by_key, salted_sum
from aws_pandas_etl_spark.plans.pipeline import TableSpec, run
from aws_pandas_etl_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


def _skewed_df(spark, hot_rows=20_000, cold_rows=200):
    """One key owns ~99% of rows — the shape that pins a reducer."""
    hot = spark.range(hot_rows).select(
        F.lit("HOT").alias("k"),
        (F.col("id") % 1000).alias("v"),
        (F.col("id").cast("double") / 100).alias("amount"),
    )
    cold = spark.range(cold_rows).select(
        F.concat(F.lit("c"), (F.col("id") % 20).cast("string")).alias("k"),
        F.col("id").alias("v"),
        F.col("id").cast("double").alias("amount"),
    )
    return hot.unionAll(cold)


def test_salted_sum_correct_on_skew(spark):
    df = _skewed_df(spark)
    got = {
        r["k"]: r["total"]
        for r in salted_sum(
            df, ["k"], F.col("amount").cast("decimal(18,4)"), "total", num_salts=16
        ).collect()
    }
    exact = {
        r["k"]: r["total"]
        for r in df.groupBy("k")
        .agg(F.sum(F.col("amount").cast("decimal(18,4)")).alias("total"))
        .collect()
    }
    assert got == exact  # decimal: split-independent exactness
    assert got["HOT"] == decimal.Decimal("1999900")  # sum(id/100, id<20000)


def test_exact_distinct_correct_on_skew(spark):
    df = _skewed_df(spark)
    got = {
        r["k"]: r["n_distinct"]
        for r in exact_distinct_by_key(df, "k", "v").collect()
    }
    exact = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    assert got == exact
    assert got["HOT"] == 1000


def test_exact_distinct_null_semantics(spark):
    """COUNT(DISTINCT) parity: NULLs excluded; all-NULL keys keep a
    0-count row (regression from code review)."""
    df = spark.createDataFrame(
        [Row(k="a", v=1), Row(k="a", v=None), Row(k="a", v=2), Row(k="b", v=None)]
    )
    got = {r["k"]: r["n_distinct"] for r in exact_distinct_by_key(df, "k", "v").collect()}
    ref = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    assert got == ref == {"a": 2, "b": 0}


def test_pipeline_rerun_idempotent(spark, tmp_path):
    """Full-refresh semantics (TRUNCATE+COPY parity): re-running the
    load must not duplicate rows."""
    tables = {"events": TableSpec("events")}
    src = lambda s, n: load_table(s, SF, n)
    r1 = run(spark, tables, src, str(tmp_path / "out"))
    r2 = run(spark, tables, src, str(tmp_path / "out"))
    assert r1[0].rows == r2[0].rows == 1000
    assert spark.read.parquet(str(tmp_path / "out" / "events")).count() == 1000


def test_results_invariant_under_partitioning(spark):
    """The exactness contract: decimal aggregation makes results
    identical no matter how the data is partitioned — rerunning with a
    different shuffle width must be bit-equal (this is what lets the
    same query run on 32 or 20,000 partitions at 100 TB)."""
    from aws_pandas_etl_spark.plans.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    names = [
        "q1_pricing_summary",
        "salted_sum_by_event_type",
        "grouping_sets_revenue",
        # late-round-6 operators whose reductions must also be
        # order-independent: DECIMAL-summed PageRank contributions,
        # per-term BM25 scores, micro-unit interpolation checksums,
        # merged sketch buckets
        "pagerank_knn_graph",
        "bm25_topk_docs",
        "interpolate_hourly_values",
        "rolling_7d_distinct_users",
    ]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        narrow = {
            n: sorted(map(tuple, QUERIES[n](spark, sf).collect()), key=repr)
            for n in names
        }
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        wide = {
            n: sorted(map(tuple, QUERIES[n](spark, sf).collect()), key=repr)
            for n in names
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    for n in names:
        assert narrow[n] == wide[n], f"{n} changed under repartitioning"


def test_correlation_zero_variance_yields_null_not_crash(spark, tmp_path):
    """ANSI double division raises DIVIDE_BY_ZERO on a zero-variance
    user; the query must emit NULL (matching the oracle's NULLIF)
    instead of aborting — and the clamped radicand keeps DuckDB's
    sqrt from hard-erroring on catastrophic cancellation."""
    import datetime as dt

    import duckdb

    from aws_pandas_etl_spark.plans.queries import ORACLES, QUERIES

    rows = []
    # user 1: constant value (zero variance); user 2: varying
    for i in range(12):
        rows.append((i, dt.datetime(2024, 1, 1, 0, 0, i), 1, "view", 5.0, "{}"))
        rows.append((100 + i, dt.datetime(2024, 1, 1, 0, 0, i), 2, "view", float(i), "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    d = str(tmp_path)
    df.coalesce(1).write.parquet(f"{d}/events.parquet")

    out = {r["user_id"]: r["value_trend_corr"]
           for r in QUERIES["value_trend_correlation_per_user"](spark, d).collect()}
    assert out[1] is None          # zero variance -> NULL, not a crash
    assert abs(out[2] - 1.0) < 1e-9  # strictly increasing -> corr 1

    con = duckdb.connect()
    try:
        con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet/*.parquet')")
        want = {u: c for u, c in con.execute(ORACLES["value_trend_correlation_per_user"]).fetchall()}
    finally:
        con.close()
    assert want[1] is None and abs(want[2] - out[2]) == 0.0


def test_ngram_jaccard_block_guard_excludes_hot_block(spark):
    """A block above max_block_docs would be quadratic inside the
    equi-join — the guard must drop it entirely while leaving small
    blocks' pairs untouched."""
    from aws_pandas_etl_spark.plans.queries import _ngram_jaccard_pairs_blocked

    text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(i, "en", "web", text) for i in range(50)]          # hot block
    rows += [(1000, "fr", "web", text), (1001, "fr", "web", text)]  # small block
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    )
    guarded = _ngram_jaccard_pairs_blocked(docs, max_block_docs=10).collect()
    # en/web (50 docs > cap) contributes nothing; fr/web pair survives
    assert {(r["a"], r["b"]) for r in guarded} == {(1000, 1001)}
    assert guarded[0]["jaccard"] == 1.0
    # with the cap lifted the hot block's identical docs all pair up
    unguarded = _ngram_jaccard_pairs_blocked(docs, max_block_docs=10_000)
    assert unguarded.count() == 50 * 49 // 2 + 1


def test_salted_join_matches_plain_join_on_skew(spark):
    """salted_join must produce exactly the plain join's rows on a
    one-hot-key input, for inner and left."""
    from aws_pandas_etl_spark.functions.skew import salted_join

    big = _skewed_df(spark, hot_rows=5_000, cold_rows=100)
    dim_rows = [("HOT", "hot-dim")] + [(f"c{i}", f"dim{i}") for i in range(10)]
    small = spark.createDataFrame(dim_rows, "k string, label string")
    for how in ("inner", "left"):
        got = (
            salted_join(big, small, ["k"], num_salts=8, how=how)
            .groupBy("k", "label")
            .count()
        )
        want = big.join(small, ["k"], how).groupBy("k", "label").count()
        g = {(r["k"], r["label"]): r["count"] for r in got.collect()}
        w = {(r["k"], r["label"]): r["count"] for r in want.collect()}
        assert g == w, how
    # cold keys c10..c19 have no dim row: inner drops them, left keeps
    inner_keys = {r["k"] for r in salted_join(big, small, ["k"], how="inner").select("k").distinct().collect()}
    left_keys = {r["k"] for r in salted_join(big, small, ["k"], how="left").select("k").distinct().collect()}
    assert "c15" not in inner_keys and "c15" in left_keys


def test_compact_table_reduces_files_and_preserves_rows(spark, tmp_path):
    """Compaction: many small part-files -> few, same rows, live target
    swapped atomically-ish (keep-aside dance), idempotent second call."""
    from aws_pandas_etl_spark.sources.sinks import compact_table

    p = str(tmp_path / "t")
    df = spark.range(10_000).selectExpr("id", "id % 7 AS v")
    df.repartition(64).write.parquet(p)  # 64 tiny part-files
    before, after = compact_table(spark, p, target_file_mb=512)
    assert before == 64 and after == 1
    back = spark.read.parquet(p)
    assert back.count() == 10_000
    assert back.agg(F.sum("v")).collect()[0][0] == df.agg(F.sum("v")).collect()[0][0]
    # already compact: no rewrite
    assert compact_table(spark, p, target_file_mb=512) == (1, 1)


def test_compact_table_partitioned_target_per_partition(spark, tmp_path):
    """A Hive-partitioned target compacts PER LEAF PARTITION with the
    layout preserved (r13 verdict #4: the old top-level part-* glob
    reported (0, 0) "already compact" for a partitioned table full of
    small files), and a mixed flat+partitioned layout refuses loudly
    instead of flattening."""
    import os

    import pytest

    from aws_pandas_etl_spark.sources.sinks import compact_table

    p = str(tmp_path / "t")
    df = spark.range(9_000).selectExpr("id", "CAST(id % 3 AS INT) AS bkt")
    # 16 small files in each of 3 partitions
    df.repartition(16).write.partitionBy("bkt").parquet(p)
    before, after = compact_table(spark, p, target_file_mb=512)
    assert before == 48 and after == 3
    back = spark.read.parquet(p)
    assert back.count() == 9_000
    # layout preserved: partition dirs still exist, pruning still works
    assert sorted(
        d for d in os.listdir(p) if d.startswith("bkt=")
    ) == ["bkt=0", "bkt=1", "bkt=2"]
    assert back.filter(F.col("bkt") == 1).count() == 3_000
    assert (
        back.agg(F.sum("id")).collect()[0][0]
        == df.agg(F.sum("id")).collect()[0][0]
    )
    # idempotent second call: nothing left to do
    assert compact_table(spark, p, target_file_mb=512) == (3, 3)
    # mixed layout: top-level part-file + partition dirs -> refuse
    spark.range(5).selectExpr("id", "CAST(0 AS INT) AS bkt").coalesce(
        1
    ).write.mode("append").parquet(p)
    with pytest.raises(ValueError, match="mixes"):
        compact_table(spark, p, target_file_mb=512)


def test_bloom_decontaminate_invariant_under_partitioning(spark):
    """The bloom bitmap is built from collected positions and the
    membership test is per-row math, so the flagged set must be
    bit-identical whatever the input partitioning (3 vs 32) — a
    partition-dependent result would mean the bitmap build raced or
    the probe arithmetic touched partition state."""
    from aws_pandas_etl_spark.operators.dedup import decontaminate_bloom
    from aws_pandas_etl_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    a = sorted(
        tuple(r)
        for r in decontaminate_bloom(docs.repartition(3), benchmark_max_id=50).collect()
    )
    b = sorted(
        tuple(r)
        for r in decontaminate_bloom(docs.repartition(32), benchmark_max_id=50).collect()
    )
    assert a == b and len(a) > 0


def test_cell_pair_cos_invariant_under_partitioning_and_matches_fold(spark):
    """The Arrow-batched pair scorer must be (a) partitioning-invariant
    (cogroup shuffles by cell; per-cell math is vectorized but
    order-fixed) and (b) bit-identical to the interpreted Column fold
    it replaces — per-dimension outer-product accumulation IS the same
    IEEE left fold, so every cosine must compare equal as a raw
    double, not just after rounding."""
    from pyspark.sql import functions as F

    from aws_pandas_etl_spark.operators.clustering import cell_pair_cos
    from aws_pandas_etl_spark.operators.similarity import dot
    from aws_pandas_etl_spark.sources.readers import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    lab = emb.select(
        "vec_id",
        (F.col("vec_id") % 4).alias("cl"),
        "label",
        "embedding",
        F.sqrt(dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
    )
    x = lab.filter(F.col("label") == 0).select(
        F.col("vec_id").alias("a"),
        "cl",
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    y = lab.filter(F.col("label") == 1).select(
        F.col("vec_id").alias("b"),
        "cl",
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )

    def run(xdf, ydf):
        out = cell_pair_cos(
            xdf, ydf, cell_col="cl", x_id="a", y_id="b",
            x_vec="ea", y_vec="eb", x_nrm="na", y_nrm="nb",
        )
        return sorted((r["a"], r["b"], r["cos"]) for r in out.collect())

    got = run(x, y)
    assert got == run(x.repartition(13), y.repartition(3))

    fold = (
        x.join(y, "cl")
        .select(
            "a",
            "b",
            (
                dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
            ).alias("cos"),
        )
    )
    want = sorted((r["a"], r["b"], r["cos"]) for r in fold.collect())
    assert len(got) > 100
    assert got == want  # raw-double equality, no rounding


def test_cell_pair_cos_neq_high_cardinality_fallback_identical(spark):
    """The neq mask's two physical paths — per-label blocking (low
    cardinality) and single-block + post-mask (above NEQ_MAX_DISTINCT)
    — must emit the SAME pair set with bit-identical cosines, and both
    must equal the unmasked scorer filtered by ``!=`` afterwards
    (including NULL-label three-valued-logic: null-left rows emit no
    pairs either way)."""
    from pyspark.sql import functions as F

    from aws_pandas_etl_spark.operators import clustering as CL
    from aws_pandas_etl_spark.operators.similarity import dot
    from aws_pandas_etl_spark.sources.readers import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    # high-cardinality label: vec_id % 97 (> NEQ_MAX_DISTINCT=64 per
    # cell), with some NULLs injected on both sides
    lab = emb.limit(400).select(
        "vec_id",
        (F.col("vec_id") % 2).alias("cl"),
        F.when(F.col("vec_id") % 19 != 0, F.col("vec_id") % 97).alias("lb"),
        "embedding",
        F.sqrt(dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
    )
    x = lab.select(
        F.col("vec_id").alias("a"), "cl", F.col("lb").alias("la"),
        F.col("embedding").alias("ea"), F.col("nrm").alias("na"),
    )
    y = lab.select(
        F.col("vec_id").alias("b"), "cl", F.col("lb").alias("lbb"),
        F.col("embedding").alias("eb"), F.col("nrm").alias("nb"),
    )

    def run(threshold):
        old = CL.NEQ_MAX_DISTINCT
        CL.NEQ_MAX_DISTINCT = threshold
        try:
            out = cell_pair_cos(
                x, y, cell_col="cl", x_id="a", y_id="b",
                x_vec="ea", y_vec="eb", x_nrm="na", y_nrm="nb",
                x_extra=("la",), y_extra=("lbb",), neq=("la", "lbb"),
            )
            return {
                (r["a"], r["b"]): r["cos"]
                for r in out.filter(F.col("la") != F.col("lbb")).collect()
            }
        finally:
            CL.NEQ_MAX_DISTINCT = old

    from aws_pandas_etl_spark.operators.clustering import cell_pair_cos

    per_label = run(10_000)   # forces the per-label path
    post_mask = run(0)        # forces the fallback path
    assert per_label == post_mask and len(per_label) > 1000

    unmasked = cell_pair_cos(
        x, y, cell_col="cl", x_id="a", y_id="b",
        x_vec="ea", y_vec="eb", x_nrm="na", y_nrm="nb",
        x_extra=("la",), y_extra=("lbb",),
    )
    want = {
        (r["a"], r["b"]): r["cos"]
        for r in unmasked.filter(F.col("la") != F.col("lbb")).collect()
    }
    assert per_label == want


def test_sliding_range_sum_matches_window_on_skew(spark):
    """The skew-robust trailing-sum (two range-partitioned prefix sums
    with probe rows, timeseries.sliding_range_sum) must equal the
    per-key RANGE window bit-for-bit on a hot-key frame — including
    peer rows at equal timestamps and NULL-frame semantics (a window
    sum is NULL iff the frame holds no non-null value)."""
    from pyspark.sql import Window

    from aws_pandas_etl_spark.operators.timeseries import sliding_range_sum

    rows = []
    # hot key: 500 rows, some ts ties, some NULL values
    for i in range(500):
        rows.append(("HOT", 1_000_000 * (i // 3), None if i % 7 == 0 else decimal.Decimal(i)))
    for i in range(40):
        rows.append((f"c{i % 5}", 1_000_000 * i, decimal.Decimal(i)))
    # a key whose early frame is ALL NULL values (window sum -> NULL)
    rows.append(("NULLY", 0, None))
    rows.append(("NULLY", 10_000_000, decimal.Decimal(5)))
    df = spark.createDataFrame(
        rows, "k string, t bigint, v decimal(18,4)"
    ).withColumn("rid", F.monotonically_increasing_id())
    W_US = 2_500_000
    w = (
        Window.partitionBy("k")
        .orderBy("t")
        .rangeBetween(-W_US, Window.currentRow)
    )
    want = {
        r["rid"]: r["sl"]
        for r in df.select(
            "rid", F.sum("v").over(w).alias("sl")
        ).collect()
    }
    got = {
        r["rid"]: r["sl"]
        for r in sliding_range_sum(df, "k", "t", "v", W_US, "sl")
        .select("rid", "sl")
        .collect()
    }
    assert got == want and len(got) == len(rows)


def test_sliding_prefix_plan_has_no_per_key_window(spark):
    """Plan shape: the skew-robust twin must not contain a window
    partitioned by the skewable user key (that is exactly the per-key
    serialization it exists to avoid); its exchanges are range
    repartitions plus the pid-hash window of the prefix machinery."""
    from aws_pandas_etl_spark.plans.queries import QUERIES

    df = QUERIES["sliding_1h_user_value_prefix"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the range exchange lives inside the prefix machinery's pinned
    # localCheckpoint subtree, which the outer plan reads back as an
    # existing RDD — assert that boundary is present...
    assert "existingrdd" in plan.lower()
    # ...and that NO window in the outer plan partitions by the
    # skewable user key (peer grouping happens via groupBy(user, ts)
    # with map-side partials, never a per-user sort frame)
    for line in plan.splitlines():
        if "Window" in line and "user_id" in line and "partition" in line.lower():
            raise AssertionError(f"per-user window found: {line}")


def test_sliding_range_sum_null_key_and_ts_match_window(spark):
    """r11 ADVICE (medium): the join back used null-unequal conditions,
    so NULL-keyed / NULL-ts rows vanished from the output while the
    RANGE window keeps them (NULL key = its own partition; NULL order
    keys are mutual peers).  Now null-safe: every row survives and the
    values match the window bit-for-bit."""
    from pyspark.sql import Window

    from aws_pandas_etl_spark.operators.timeseries import sliding_range_sum

    rows = [
        # NULL key partition with ties and a null value
        (None, 0, decimal.Decimal(1)),
        (None, 1_000_000, decimal.Decimal(2)),
        (None, 1_000_000, None),
        (None, 9_000_000, decimal.Decimal(4)),
        # NULL timestamps: mutual peers within their key
        ("a", None, decimal.Decimal(10)),
        ("a", None, decimal.Decimal(20)),
        ("a", 0, decimal.Decimal(3)),
        ("a", 2_000_000, decimal.Decimal(7)),
        # NULL ts in NULL key too
        (None, None, decimal.Decimal(100)),
        ("b", 5_000_000, decimal.Decimal(9)),
    ]
    df = spark.createDataFrame(
        rows, "k string, t bigint, v decimal(18,4)"
    ).withColumn("rid", F.monotonically_increasing_id())
    W_US = 2_500_000
    w = (
        Window.partitionBy("k")
        .orderBy("t")
        .rangeBetween(-W_US, Window.currentRow)
    )
    want = {
        r["rid"]: r["sl"]
        for r in df.select("rid", F.sum("v").over(w).alias("sl")).collect()
    }
    got = {
        r["rid"]: r["sl"]
        for r in sliding_range_sum(df, "k", "t", "v", W_US, "sl")
        .select("rid", "sl")
        .collect()
    }
    assert got == want and len(got) == len(rows)


def test_running_rows_sum_matches_window(spark):
    """The skew-robust running total (one global prefix sum minus
    per-key offsets, timeseries.running_rows_sum) must equal the
    per-key ROWS frame bit-for-bit — including NULL keys (their own
    partition), NULL values (running sum NULL until the first non-null)
    and a hot key owning most rows."""
    from pyspark.sql import Window

    from aws_pandas_etl_spark.operators.timeseries import running_rows_sum

    rows = []
    for i in range(300):  # hot key, leading NULL values
        rows.append(("HOT", i, None if i < 5 or i % 11 == 0 else decimal.Decimal(i)))
    for i in range(40):
        rows.append((f"c{i % 7}", i, decimal.Decimal(2 * i)))
    rows.append((None, 0, decimal.Decimal(1)))
    rows.append((None, 1, None))
    rows.append((None, 2, decimal.Decimal(3)))
    rows.append(("ALLNULL", 0, None))
    rows.append(("ALLNULL", 1, None))
    df = spark.createDataFrame(rows, "k string, o bigint, v decimal(18,4)")
    w = (
        Window.partitionBy("k")
        .orderBy("o")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        (r["k"], r["o"]): r["rs"]
        for r in df.select("k", "o", F.sum("v").over(w).alias("rs")).collect()
    }
    got = {
        (r["k"], r["o"]): r["rs"]
        for r in running_rows_sum(df, "k", ["o"], "v", "rs")
        .select("k", "o", "rs")
        .collect()
    }
    assert got == want and len(got) == len(rows)


def test_running_total_prefix_plan_and_float_refusal(spark):
    """The registered twin's outer plan must not window-partition by
    the skewable user key, and the operator refuses float accumulation
    (same posture as sliding_range_sum)."""
    import pytest as _pytest

    from aws_pandas_etl_spark.operators.timeseries import running_rows_sum
    from aws_pandas_etl_spark.plans.queries import QUERIES

    df = QUERIES["running_total_prefix"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "existingrdd" in plan.lower()
    for line in plan.splitlines():
        if "Window" in line and "user_id" in line and "partition" in line.lower():
            raise AssertionError(f"per-user window found: {line}")

    fdf = spark.createDataFrame([("k", 0, 1.5)], "k string, o bigint, v double")
    with _pytest.raises(TypeError, match="order-independent"):
        running_rows_sum(fdf, "k", ["o"], "v")


def test_sliding_range_sum_rejects_float_accumulation(spark):
    """Float values would drift in the last ulps across the two prefix
    passes vs the sequential window frame — the operator must refuse
    loudly rather than return almost-right sums."""
    import pytest as _pytest

    from aws_pandas_etl_spark.operators.timeseries import sliding_range_sum

    df = spark.createDataFrame(
        [("k", 0, 1.5)], "k string, t bigint, v double"
    )
    with _pytest.raises(TypeError, match="order-independent"):
        sliding_range_sum(df, "k", "t", "v", 1000)


def test_attribution_prefix_twin_constructed_boundary_ties(spark, tmp_path):
    """The prefix-decomposed attribution twin must equal the pair-join
    form on CONSTRUCTED window-boundary ties the harness fixtures never
    exercise (microsecond timestamps make exact ties vanishingly rare;
    r6's constructed-rounding-tie bugs motivate pinning these):

    - a touch exactly AT the purchase ts (inclusive right edge),
    - a touch exactly at pts - 7 DAYS (inclusive left edge) and one
      1 microsecond outside it,
    - degenerate counts cnt=1 / cnt=2 (same and different channels),
    - a purchase with zero in-window touches (must drop),
    - two purchases of one user with overlapping windows sharing
      touches,
    - equal-ts touches disambiguated by event_id (first/last tiebreak).
    """
    import datetime as dt

    from pyspark.sql import Row

    from aws_pandas_etl_spark.plans import queries as Q

    T0 = dt.datetime(2024, 6, 15, 12, 0, 0)
    D7 = dt.timedelta(days=7)
    us = dt.timedelta(microseconds=1)

    def ev(eid, uid, typ, ts):
        return Row(
            event_id=eid, ts=ts, user_id=uid, event_type=typ,
            value=float(eid), props="{}",
        )

    rows = [
        # user 1: edges + tiebreak.  purchase at T0
        ev(100, 1, "purchase", T0),
        ev(1, 1, "view", T0),            # exactly AT pts -> in (<=)
        ev(2, 1, "click", T0 - D7),      # exactly at pts-7d -> in (>=)
        ev(3, 1, "view", T0 - D7 - us),  # 1us outside -> out
        ev(4, 1, "click", T0 - dt.timedelta(days=1)),
        ev(5, 1, "view", T0 - dt.timedelta(days=1)),  # same-ts pair as 4?
        # equal-ts pair: touches 6 and 7 share a ts; event_id breaks ties
        ev(6, 1, "view", T0 - dt.timedelta(days=2)),
        ev(7, 1, "click", T0 - dt.timedelta(days=2)),
        # user 2: cnt=1
        ev(200, 2, "purchase", T0),
        ev(8, 2, "click", T0 - dt.timedelta(hours=1)),
        # user 3: cnt=2 same channel
        ev(300, 3, "purchase", T0),
        ev(9, 3, "view", T0 - dt.timedelta(hours=2)),
        ev(10, 3, "view", T0 - dt.timedelta(hours=1)),
        # user 4: cnt=2 different channels
        ev(400, 4, "purchase", T0),
        ev(11, 4, "view", T0 - dt.timedelta(hours=2)),
        ev(12, 4, "click", T0 - dt.timedelta(hours=1)),
        # user 5: zero in-window touches (one far outside)
        ev(500, 5, "purchase", T0),
        ev(13, 5, "view", T0 - dt.timedelta(days=30)),
        # user 6: two purchases, overlapping windows share touches
        ev(600, 6, "purchase", T0),
        ev(601, 6, "purchase", T0 + dt.timedelta(days=3)),
        ev(14, 6, "view", T0 - dt.timedelta(days=1)),
        ev(15, 6, "click", T0 + dt.timedelta(days=1)),
        ev(16, 6, "view", T0 + dt.timedelta(days=2)),
    ]
    d = str(tmp_path / "sf_ties")
    spark.createDataFrame(rows).write.parquet(d + "/events.parquet")

    pair = {
        r["channel"]: (r["n_touches"], r["total_credit"])
        for r in Q.QUERIES["attribution_position_based"](spark, d).collect()
    }
    pref = {
        r["channel"]: (r["n_touches"], r["total_credit"])
        for r in Q.QUERIES["attribution_position_based_prefix"](
            spark, d
        ).collect()
    }
    assert pair == pref, (pair, pref)
    # the edge rows really participated: user 1 contributes 6 in-window
    # pairs (touch 3 excluded); user 6's second purchase sees all three
    # touches (its window spans T0-4d..T0+3d), the first only touch 14
    assert sum(n for n, _ in pair.values()) == 6 + 1 + 2 + 2 + 0 + (1 + 3)
