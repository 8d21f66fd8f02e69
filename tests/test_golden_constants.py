"""Golden literal vectors for every md5-derived determinism constant
(VERDICT r10 #6).

The python-vs-spark-vs-duckdb parity properties (test_parity_property.py)
catch divergence BETWEEN engines but not a coordinated shift — e.g. a
refactor of ``minhash_params`` or ``hyperplane`` that changes all three
twins together would silently re-bucket every LSH band, re-assign every
train/val/test split, and flip every sign-LSH code while staying
self-consistent.  These assertions pin the actual values as literals so
splits/buckets/signatures are provably stable across engine, library,
and code changes: if one fails, either revert the change or accept that
every persisted artifact derived from these constants is invalidated.
"""

from pyspark.sql import Row
from pyspark.sql import functions as F

from aws_pandas_etl_spark.functions.hashing import (
    MINHASH_PRIME,
    base_hash,
    hash_bucket,
    hash_bucket_sql,
    md5_bigint,
    minhash_params,
    minhash_signature,
    row_hash,
    shingles,
)
from aws_pandas_etl_spark.operators.similarity import hyperplane
from aws_pandas_etl_spark.operators.text import assign_split


def test_minhash_affine_params_golden():
    # h_i(x) = (a_i*x + b_i) mod (2^31 - 1); (a, b) from md5 of
    # "minhash-{a,b}-{i}" — pinned for the first 4 families
    assert MINHASH_PRIME == 2_147_483_647
    assert [minhash_params(i) for i in range(4)] == [
        (150286067, 178841760),
        (169091989, 154858500),
        (144629443, 80664922),
        (62633995, 210451053),
    ]


def test_hyperplane_golden():
    # component d = (md5_int("{plane}:{d}") % 2001 - 1000) / 1000
    assert hyperplane(0, 4) == [-0.775, 0.75, 0.198, -0.003]
    assert hyperplane(7, 3) == [-0.944, -0.137, -0.817]


def test_md5_bigint_and_buckets_golden(spark):
    df = spark.createDataFrame([Row(s="hello", i=42)])
    got = df.select(
        md5_bigint(F.col("s")).alias("h0"),
        md5_bigint(F.col("s"), seed=3).alias("h3"),
        base_hash(F.col("s")).alias("b28"),
        hash_bucket("i", "split").alias("bucket_i"),
    ).collect()[0]
    assert got["h0"] == 419982666956583591
    assert got["h3"] == 422794869081991295
    # 28-bit base hash = first 7 hex digits of md5("hello")
    assert got["b28"] == int("5d41402", 16)
    assert got["bucket_i"] == 61


def test_split_assignment_golden(spark):
    """The exact train/val/test assignment for literal ids — the values
    persisted splits depend on.  bucket = md5('split|id') % 100;
    <80 train, <90 val, else test."""
    df = spark.createDataFrame([Row(doc_id=i) for i in (1, 2, 3, 42, 99999)])
    got = {
        r["doc_id"]: (r["bucket"], r["split"])
        for r in df.select(
            "doc_id",
            hash_bucket("doc_id", "split").alias("bucket"),
            assign_split("doc_id").alias("split"),
        ).collect()
    }
    assert got == {
        1: (5, "train"),
        2: (1, "train"),
        3: (46, "train"),
        42: (61, "train"),
        99999: (56, "train"),
    }
    # and a val/test witness so the when-chain boundaries stay pinned:
    # scan small ids for one bucket in [80,90) and one >= 90
    rows = spark.createDataFrame(
        [Row(doc_id=i) for i in range(200)]
    ).select(
        "doc_id", hash_bucket("doc_id", "split").alias("bucket")
    ).collect()
    by_bucket = {r["doc_id"]: r["bucket"] for r in rows}
    val_id = next(i for i, b in by_bucket.items() if 80 <= b < 90)
    test_id = next(i for i, b in by_bucket.items() if b >= 90)
    got2 = {
        r["doc_id"]: r["split"]
        for r in spark.createDataFrame(
            [Row(doc_id=val_id), Row(doc_id=test_id)]
        ).select("doc_id", assign_split("doc_id").alias("split")).collect()
    }
    assert got2 == {val_id: "val", test_id: "test"}


def test_hash_bucket_sql_twin_golden():
    """The DuckDB twin must produce the identical literal buckets."""
    import duckdb

    con = duckdb.connect()
    try:
        for key, want in ((1, 5), (2, 1), (3, 46), (42, 61), (99999, 56)):
            got = con.execute(
                f"SELECT {hash_bucket_sql(str(key), 'split')}"
            ).fetchone()[0]
            assert got == want, (key, got, want)
    finally:
        con.close()


def test_minhash_signature_golden(spark):
    """First 4 signature slots for a literal 3-shingle text — pins the
    whole chain: normalize -> shingle -> 28-bit base hash -> affine."""
    df = spark.createDataFrame([Row(text="the quick brown fox jumps over")])
    sig = (
        df.select(
            minhash_signature(
                F.transform(shingles("text", n=5), base_hash), num_hashes=4
            ).alias("sig")
        )
        .collect()[0]["sig"]
    )
    # recompute driver-side from the same pinned constructions
    import hashlib

    texts = [
        "the quick brown fox jumps",
        "quick brown fox jumps over",
    ]
    base = [int(hashlib.md5(t.encode()).hexdigest()[:7], 16) for t in texts]
    want = []
    for i in range(4):
        a, b = minhash_params(i)
        want.append(min((a * x + b) % MINHASH_PRIME for x in base))
    assert sig == want


def test_row_hash_golden(spark):
    """Reference-parity '(v1,v2,...)' md5 format, nulls as ''."""
    import hashlib

    df = spark.createDataFrame(
        [(1, None, "x")], "a bigint, b string, c string"
    )
    got = df.select(row_hash(["a", "b", "c"])).collect()[0][0]
    assert got == hashlib.md5(b"(1,,x)").hexdigest()
