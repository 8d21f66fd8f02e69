"""Deduplication operators (SURVEY §2b X1/X2 + simhash + n-gram Jaccard).

Scale posture (100 TB):
- Exact dedup is a hash ``groupBy`` on the dedup key — one shuffle,
  map-side partial aggregation, AQE-coalesced.
- Near-dup avoids O(n²): MinHash-LSH bands candidate pairs with an
  equi-join on (band_index, band_hash) — shuffle is proportional to
  candidate volume, not n².  Skewed bands (boilerplate text) are
  handled by AQE skew-join; a ``max_bucket`` guard drops degenerate
  buckets (standard practice — boilerplate buckets are near-useless
  and quadratic).
- All hashing is the engine-portable md5-based 60-bit family
  (functions/hashing.py) so the DuckDB oracle can replicate results
  exactly — xxhash64 would be faster but engine-specific; swap in
  production via ``hash_expr``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from aws_pandas_etl_spark.functions.hashing import (
    md5_bigint,
    minhash_signature,
    normalize_text,
    shingles,
)

# Default MinHash geometry: 16 hashes = 4 bands x 4 rows.
# P(candidate | jaccard=j) = 1 - (1 - j^4)^4  ->  ~0.5 at j~0.66.
NUM_HASHES = 16
NUM_BANDS = 4


def dedup_exact(df: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """X1 — exact dedup: one survivor per key group (keys=None -> full
    row).  ``dropDuplicates`` keeps an arbitrary row; for deterministic
    survivors use ``dedup_exact_survivors``."""
    return df.dropDuplicates(keys)


def dedup_exact_survivors(
    df: DataFrame, key: str, id_col: str
) -> DataFrame:
    """Deterministic exact dedup report: per distinct ``key`` value the
    minimal ``id_col`` survives; emits group size.  Single shuffle."""
    return df.groupBy(key).agg(
        F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = NUM_HASHES,
) -> DataFrame:
    """Per-doc shingle set + MinHash signature.

    The shingle projection is persisted before the signature step:
    inlining the shingle expression into all ``num_hashes`` minhash
    lambdas explodes generated-code size (janino compile time dominated
    the whole pipeline), and at scale the materialized shingle/signature
    table is the standard intermediate of a MinHash pipeline anyway.
    """
    base = df.select(
        F.col(id_col).alias("doc_id"),
        shingles(text_col, n=shingle_n).alias("shingles"),
    ).persist()
    return base.withColumn(
        "sig", minhash_signature(F.col("shingles"), num_hashes=num_hashes)
    )


def lsh_candidate_pairs(
    sigs: DataFrame,
    num_bands: int = NUM_BANDS,
    num_hashes: int = NUM_HASHES,
    max_bucket: int = 1000,
) -> DataFrame:
    """Band signatures, bucket-join to candidate pairs (a < b).

    One explode (rows x num_bands), one equi-join shuffle on
    (band, band_hash).  ``max_bucket`` drops degenerate buckets
    (boilerplate) to keep the join linear-ish at scale.
    """
    rpb = num_hashes // num_bands
    banded = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ",", *[F.element_at("sig", b * rpb + r + 1).cast("string") for r in range(rpb)]
                            )
                        ).alias("band_hash"),
                    )
                    for b in range(num_bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.band_hash")
    sized = banded.withColumn(
        "bucket_n", F.count("*").over(Window.partitionBy("band", "band_hash"))
    ).filter(F.col("bucket_n") <= max_bucket)
    a = sized.select(F.col("doc_id").alias("a"), "band", "band_hash")
    b = sized.select(F.col("doc_id").alias("b"), "band", "band_hash")
    return (
        a.join(b, ["band", "band_hash"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def exact_jaccard(pairs: DataFrame, sigs: DataFrame) -> DataFrame:
    """Re-score candidate pairs with exact shingle-set Jaccard."""
    sa = sigs.select(F.col("doc_id").alias("a"), F.col("shingles").alias("sh_a"))
    sb = sigs.select(F.col("doc_id").alias("b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        pairs.join(sa, "a")
        .join(sb, "b")
        .select(
            "a",
            "b",
            (inter.cast("double") / F.greatest(union, F.lit(1))).alias("jaccard"),
        )
    )


def dedup_near_minhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    shingle_n: int = 3,
) -> DataFrame:
    """X2 — near-duplicate pairs with exact-Jaccard >= threshold,
    LSH-blocked.  Returns (a, b, jaccard), a < b."""
    # Signatures feed three consumers (banding + both sides of the
    # re-score join); persist so the 16-hash projection runs once.
    # At 100 TB this materialization is the standard "signature table"
    # stage of a MinHash pipeline (tiny vs the corpus: ids + hashes).
    sigs = minhash_signatures(df, id_col, text_col, shingle_n).persist()
    pairs = lsh_candidate_pairs(sigs)
    return exact_jaccard(pairs, sigs).filter(F.col("jaccard") >= threshold)


def simhash64(text_col: str, num_bits: int = 32) -> "F.Column":
    """SimHash over whitespace tokens: bit i is set when the sum over
    tokens of (bit_i(token_hash) ? +1 : -1) is positive.  Pure array
    aggregate — no explode, no shuffle."""
    toks = F.filter(F.split(normalize_text(F.coalesce(F.col(text_col), F.lit(""))), " "), lambda t: t != "")
    hashed = F.transform(toks, lambda t: md5_bigint(t))
    counts = F.aggregate(
        hashed,
        F.array_repeat(F.lit(0).cast("long"), num_bits),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(num_bits - 1)),
                lambda i: F.getbit(h, i) * 2 - 1,
            ),
            lambda x, y: x + y.cast("long"),
        ),
    )
    powers = F.array(*[F.lit(1 << i).cast("long") for i in range(num_bits)])
    return F.aggregate(
        F.zip_with(
            counts,
            powers,
            lambda cnt, p: F.when(cnt > 0, p).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )


def dedup_simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", num_bits: int = 32
) -> DataFrame:
    """SimHash dedup report: docs sharing an identical simhash are
    near-dup candidates; one shuffle on the 64-bit key."""
    return (
        df.select(F.col(id_col).alias("doc_id"), simhash64(text_col, num_bits).alias("simhash"))
        .groupBy("simhash")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_docs"))
    )
