"""Declarative data-quality expectations (contract validation).

The reference's only quality gate is cast-or-fail during load
(dataframe_operations.py:103); a production landing zone wants
CONTRACTS checked per batch — nullability, ranges, domains, key
uniqueness, referential integrity — with one report row per rule, so
a violation pages before it propagates.  Each expectation compiles to
ONE aggregate (count + conditional violation count) over the frame;
no rule ever materializes violating rows (callers drill in with the
predicate when a rule fails).

Scale shape: every rule is a map-side-combined scalar aggregate; the
uniqueness rule adds a count-by-key shuffle bounded by |distinct
keys|; the FK rule is a LEFT ANTI count against the (usually
broadcast-small) dimension's key set.  A report over r rules scans
the frame r times at most — at 100 TB, callers batch rules per scan
by unioning the conditional columns (the profile_events_columns
posture); the per-rule form here keeps rules independently testable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _report_row(df: DataFrame, rule: str, violation: Column) -> DataFrame:
    """One report row: (rule, n_rows, n_violations, passed)."""
    return df.agg(
        F.lit(rule).alias("rule"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(violation.cast("bigint")).cast("bigint").alias("n_violations"),
    ).select(
        "rule",
        "n_rows",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


def expect_not_null(df: DataFrame, col: str) -> DataFrame:
    return _report_row(df, f"not_null({col})", F.col(col).isNull())


def expect_in_range(df: DataFrame, col: str, lo, hi) -> DataFrame:
    """NULLs do not violate a range rule (that's not_null's job)."""
    v = F.col(col).isNotNull() & ~F.col(col).between(F.lit(lo), F.lit(hi))
    return _report_row(df, f"in_range({col},{lo},{hi})", v)


def expect_values_in(df: DataFrame, col: str, allowed: list) -> DataFrame:
    v = F.col(col).isNotNull() & ~F.col(col).isin(*allowed)
    return _report_row(
        df, f"values_in({col},{'|'.join(map(str, sorted(allowed)))})", v
    )


def expect_unique(df: DataFrame, cols: list[str]) -> DataFrame:
    """Violations = rows carrying a key that occurs more than once
    (so 3 copies of one key report 3 violations, not 1 or 2)."""
    dup = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).cast("bigint").alias("___n"))
        .select(
            F.lit(f"unique({','.join(cols)})").alias("rule"),
            F.sum("___n").cast("bigint").alias("n_rows"),
            F.sum(F.when(F.col("___n") > 1, F.col("___n")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("n_violations"),
        )
    )
    return dup.select(
        "rule", "n_rows", "n_violations", (F.col("n_violations") == 0).alias("passed")
    )


def expect_fk(
    df: DataFrame, col: str, dim: DataFrame, dim_col: str, rule_name: str
) -> DataFrame:
    """Violations = rows whose non-NULL key has no match in the
    dimension (LEFT ANTI count — the EXISTS shape, no wide rows)."""
    keys = dim.select(F.col(dim_col).alias(col)).distinct()
    orphans = (
        df.filter(F.col(col).isNotNull())
        .join(keys, col, "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_violations"))
    )
    total = df.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    return (
        total.crossJoin(F.broadcast(orphans))
        .select(
            F.lit(rule_name).alias("rule"),
            "n_rows",
            "n_violations",
            (F.col("n_violations") == 0).alias("passed"),
        )
    )


def expectations_report(rules: list[DataFrame]) -> DataFrame:
    """Union the per-rule report rows, ordered by rule name."""
    out = rules[0]
    for r in rules[1:]:
        out = out.unionByName(r)
    return out.orderBy("rule")
