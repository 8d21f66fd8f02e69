"""Deterministic sampling for training-data mixing.

``mixture_sample`` downsamples each group toward a target mixture —
the data-mixing step of an LLM corpus pipeline ("50% web, 20% code,
…").  Two properties matter at 100 TB:

- **Deterministic membership.**  Keep/drop is a pure function of the
  row id (md5 hash fraction), never ``rand()``: re-runs, task retries,
  and different partitionings all select the same rows, and the DuckDB
  oracle can replay the exact choice.
- **No data shuffle.**  The keep-rates come from a group-count
  aggregate (rows = number of groups, broadcast back); the sampling
  itself is a scan-side filter, so sampled-out rows die at the
  projection without ever being shuffled.

The mixture is the largest corpus achievable without upsampling:
``scale = min_g(count_g / share_g)`` is the total size at which the
scarcest group exactly meets its target share; every group keeps
``share_g * scale`` rows (rate ≤ 1 by construction, clamped for float
safety).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aws_pandas_etl_spark.functions.hashing import md5_bigint

_HASH_SPACE = float(1 << 60)  # md5_bigint is a 60-bit hash


def hash_fraction(col: F.Column, salt: str) -> F.Column:
    """Uniform-ish [0, 1) fraction from a deterministic 60-bit md5 hash
    of ``salt || ':' || col`` — DuckDB twin:
    ``('0x'||substr(md5('salt:'||CAST(col AS VARCHAR)),1,15))::BIGINT
    / 1152921504606846976.0``."""
    tagged = F.concat(F.lit(f"{salt}:"), col.cast("string"))
    return md5_bigint(tagged) / F.lit(_HASH_SPACE)


def mixture_sample(
    df: DataFrame,
    group_col: str,
    target_shares: dict[str, float],
    id_col: str,
    salt: str = "mix",
) -> DataFrame:
    """Downsample ``df`` so group proportions match ``target_shares``
    (groups absent from the dict are dropped), keeping the largest
    corpus the targets allow without upsampling.  Returns the sampled
    rows with all original columns."""
    spark = df.sparkSession
    shares = spark.createDataFrame(
        [(k, float(v)) for k, v in target_shares.items()],
        f"{group_col} string, _share double",
    )
    counts = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("double").alias("_n")
    )
    sized = counts.join(shares, group_col)  # inner: untargeted groups drop
    scale = sized.agg(F.min(F.col("_n") / F.col("_share")).alias("_scale"))
    rates = (
        sized.crossJoin(F.broadcast(scale))
        .select(
            group_col,
            F.least(
                F.lit(1.0), F.col("_share") * F.col("_scale") / F.col("_n")
            ).alias("_rate"),
        )
    )
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(hash_fraction(F.col(id_col), salt) < F.col("_rate"))
        .drop("_rate")
    )


def neyman_sample(
    df: DataFrame,
    group_col: str,
    value_col: str,
    total_target: int,
    id_col: str,
    salt: str = "neyman",
) -> DataFrame:
    """Optimal-allocation stratified sampling (Neyman): stratum sample
    sizes ∝ n_h·σ_h, so strata whose measured variable varies more get
    proportionally more of the budget — the minimum-variance estimator
    allocation for a fixed total sample, vs plain proportional
    stratification (operators with constant per-stratum rates).

    Determinism contract: σ_h comes from exact BIGINT moments through
    one shared IEEE expression; weights round to 6 digits and
    DECIMAL-sum into the normalizer; allocations floor (no rounding-tie
    rule); membership is the usual md5-fraction — retry-, partitioning-
    and engine-invariant, replayable by the oracle.

    Degenerate strata: when EVERY stratum has zero variance the Neyman
    normalizer W is 0 and the optimal rule is undefined — the sampler
    falls back to proportional allocation (floor(T·n_h/N)) instead of
    silently returning zero rows.  Flooring systematically
    under-allocates: the realized total is total_target minus up to
    |strata| rows (fractional remainders are dropped, never
    redistributed) — callers needing an exact total should bump
    total_target by |strata| and trim.

    Scale shape: one moment aggregate (|strata| rows), rates broadcast
    back, scan-side filter — sampled-out rows never shuffle (the
    mixture_sample posture).  Returns sampled rows with their
    stratum's planned allocation in ``_alloc``."""
    st = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum(F.col(value_col).cast("long")).cast("bigint").alias("_s"),
        F.sum(F.col(value_col).cast("long") * F.col(value_col).cast("long"))
        .cast("bigint")
        .alias("_ss"),
    )
    nd = F.col("_n").cast("double")
    var = (
        F.col("_ss").cast("double")
        - F.col("_s").cast("double") * F.col("_s").cast("double") / nd
    ) / nd
    wdf = st.select(
        group_col, "_n", F.round(nd * F.sqrt(var), 6).alias("_wh")
    )
    tot = wdf.agg(
        F.sum(F.col("_wh").cast("decimal(18,6)")).cast("double").alias("_W"),
        F.sum("_n").cast("double").alias("_ntot"),
    )
    share = F.when(
        F.col("_W") > 0, F.col("_wh") / F.col("_W")
    ).otherwise(F.col("_n").cast("double") / F.col("_ntot"))
    al = (
        wdf.crossJoin(F.broadcast(tot))
        .select(
            group_col,
            "_n",
            F.floor(F.lit(float(total_target)) * share)
            .cast("bigint")
            .alias("_alloc"),
        )
    )
    rates = al.select(
        group_col,
        "_alloc",
        F.least(
            F.lit(1.0), F.col("_alloc").cast("double") / F.col("_n").cast("double")
        ).alias("_rate"),
    )
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(hash_fraction(F.col(id_col), salt) < F.col("_rate"))
        .drop("_rate")
    )
