"""Frozen r15 implementations of queries being restructured in r16,
kept verbatim so tools/ab_interleave.py can time old vs new shape
inside one session (the only protocol that beats this host's
cross-session noise).  Not part of the engine; never registered."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_pandas_etl_spark.plans import queries as Q
from aws_pandas_etl_spark.sources.readers import load_table

TX = Q.TX


def pmi_bigrams_top20_r15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 shape: corpus-scale tokens-array frame pinned (b5ca85b)."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(TX.tokens("text").alias("toks")).localCheckpoint(
        eager=False
    )
    uni = (
        t.select(F.explode("toks").alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    n_uni = uni.agg(F.sum("c").cast("bigint").alias("n_uni"))
    k = F.size("toks") - F.lit(1)
    idx = F.when(k >= 1, F.sequence(F.lit(1), k)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", F.element_at(F.col("toks"), i), F.element_at(F.col("toks"), i + 1)
        ),
    )
    all_bi = t.select(F.explode(grams).alias("bigram")).groupBy("bigram").agg(
        F.count("*").cast("bigint").alias("c_ab")
    )
    n_bi = all_bi.agg(F.sum("c_ab").cast("bigint").alias("n_bi"))
    bi = all_bi.filter(F.col("c_ab") >= Q.PMI_MIN_COUNT).select(
        "bigram",
        "c_ab",
        F.split("bigram", " ").getItem(0).alias("term_a"),
        F.split("bigram", " ").getItem(1).alias("term_b"),
    )
    ua = uni.select(F.col("term").alias("term_a"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("term").alias("term_b"), F.col("c").alias("c_b"))
    p_ab = F.col("c_ab").cast("double") / F.col("n_bi")
    p_a = F.col("c_a").cast("double") / F.col("n_uni")
    p_b = F.col("c_b").cast("double") / F.col("n_uni")
    return (
        bi.join(ua, "term_a")
        .join(ub, "term_b")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
        .select(
            "bigram",
            "c_ab",
            F.round(F.log(p_ab / (p_a * p_b)), 6).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "bigram")
        .limit(Q.PMI_TOP)
    )


def unigram_logprob_quality_r15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 shape: raw exploded token-occurrence frame pinned."""
    docs = load_table(spark, sf_dir, "documents")
    e = docs.select(
        "doc_id", F.explode(TX.tokens("text")).alias("term")
    ).localCheckpoint(eager=False)
    freq = e.groupBy("term").agg(F.count("*").cast("bigint").alias("c"))
    total = e.agg(F.count("*").cast("bigint").alias("total"))
    nlp = F.round(
        -F.log(F.col("c").cast("double") / F.col("total")), 6
    ).cast("decimal(18,6)")
    return (
        e.join(freq, "term")
        .crossJoin(F.broadcast(total))
        .select("doc_id", nlp.alias("nlp"))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.round(
                F.sum("nlp").cast("double") / F.count("*"), 6
            ).alias("avg_neg_logprob"),
        )
    )


def unigram_kl_by_source_r15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 shape: raw token-occurrence frame ``occ`` pinned."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    occ = docs.select(
        "source", F.explode(TX.tokens("text")).alias("token")
    ).localCheckpoint(eager=False)
    vocab = (
        occ.groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cq"))
        .orderBy(F.col("cq").desc(), "token")
        .limit(Q.KL_TOP_V)
    )
    srcs = occ.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occ_all")
    )
    cs = (
        occ.join(F.broadcast(vocab.select("token")), "token")
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    spine = (
        srcs.crossJoin(F.broadcast(vocab))
        .join(cs, ["source", "token"], "left")
        .select(
            "source",
            "n_occ_all",
            "token",
            "cq",
            F.coalesce("c", F.lit(0)).alias("c"),
        )
    )
    qden = vocab.agg(F.sum(F.col("cq") + F.lit(0.5)).alias("qd"))
    wsrc = Window.partitionBy("source")
    nrm = spine.crossJoin(F.broadcast(qden)).select(
        "source",
        "n_occ_all",
        ((F.col("c") + 0.5) / F.sum(F.col("c") + 0.5).over(wsrc)).alias("p"),
        ((F.col("cq") + 0.5) / F.col("qd")).alias("q"),
    )
    term = nrm.select(
        "source",
        "n_occ_all",
        F.round(
            F.col("p") * F.log(F.col("p") / F.col("q")) / F.log(F.lit(2.0)),
            8,
        )
        .cast("decimal(20,8)")
        .alias("h"),
    )
    return (
        term.groupBy("source", "n_occ_all")
        .agg(F.round(F.sum("h").cast("double"), 6).alias("kl_bits"))
        .select(
            "source",
            F.col("n_occ_all").alias("n_tokens"),
            "kl_bits",
        )
        .orderBy("source")
    )


def fk_orphan_audit_r15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15 shape: anti-join orphans + separate total (child scanned 2x)."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % Q.FK_MOD != 3
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    def _audit(name, child, ck, dim, dk):
        orphans = child.join(
            dim, child[ck] == dim[dk], "left_anti"
        ).agg(F.count("*").cast("bigint").alias("n_orphans"))
        total = child.agg(F.count("*").cast("bigint").alias("n_child"))
        return total.crossJoin(orphans).select(
            F.lit(name).alias("fk"), "n_child", "n_orphans"
        )

    return _audit(
        "orders->customer", orders, "o_custkey", cust, "c_custkey"
    ).unionByName(_audit("lineitem->orders", li, "l_orderkey", orders, "o_orderkey"))
