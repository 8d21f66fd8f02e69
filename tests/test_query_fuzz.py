"""Property-based cross-engine query fuzzing: a random (table, filter,
group-by, aggregate) spec is compiled to BOTH a Spark DataFrame plan
and a DuckDB SQL string from the same source, and the results must
match exactly — the oracle-parity contract extended from 90
hand-written queries to the whole spec space.

Aggregates follow the engine's exactness rules (decimal-cast sums,
bigint counts, min/max which need no rule), so any mismatch is a real
translation/semantics bug, not float noise.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from aws_pandas_etl_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"

# (table, categorical group cols, numeric measure cols, filterable cols)
TABLES = {
    "events": (
        ["event_type", "user_id"],
        ["value"],
        [("value", "num"), ("event_type", "cat_event"), ("user_id", "num")],
    ),
    "lineitem": (
        ["l_returnflag", "l_linestatus", "l_suppkey"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        [("l_quantity", "num"), ("l_returnflag", "cat_flag"), ("l_partkey", "num")],
    ),
}

CAT_VALUES = {
    "cat_event": ["click", "view", "purchase", "error", "signup"],
    "cat_flag": ["A", "N", "R"],
}

AGGS = ["sum_dec", "count", "min", "max", "count_distinct"]


@st.composite
def query_spec(draw):
    table = draw(st.sampled_from(sorted(TABLES)))
    groups, measures, filterables = TABLES[table]
    group = draw(st.sampled_from(groups))
    measure = draw(st.sampled_from(measures))
    agg = draw(st.sampled_from(AGGS))
    filt = None
    if draw(st.booleans()):
        col, kind = draw(st.sampled_from(filterables))
        if kind == "num":
            op = draw(st.sampled_from(["<", ">=", "!="]))
            val = draw(st.integers(min_value=0, max_value=50))
            filt = (col, op, val)
        else:
            val = draw(st.sampled_from(CAT_VALUES[kind]))
            filt = (col, "=", f"'{val}'")
    return (table, group, measure, agg, filt)


def _spark_query(spark, spec):
    table, group, measure, agg, filt = spec
    df = load_table(spark, SF, table)
    if filt:
        col, op, val = filt
        expr = f"{col} {'<>' if op == '!=' else op} {val}"
        df = df.filter(expr)
    if agg == "sum_dec":
        a = F.sum(F.col(measure).cast("decimal(18,4)")).cast("double").alias("m")
    elif agg == "count":
        a = F.count("*").cast("bigint").alias("m")
    elif agg == "min":
        a = F.min(measure).alias("m")
    elif agg == "max":
        a = F.max(measure).alias("m")
    else:
        a = F.count_distinct(F.col(measure)).cast("bigint").alias("m")
    return df.groupBy(F.col(group).alias("g")).agg(a)


def _duck_sql(spec) -> str:
    table, group, measure, agg, filt = spec
    where = ""
    if filt:
        col, op, val = filt
        where = f"WHERE {col} {'<>' if op == '!=' else op} {val}"
    if agg == "sum_dec":
        a = f"CAST(SUM(CAST({measure} AS DECIMAL(18,4))) AS DOUBLE)"
    elif agg == "count":
        a = "CAST(COUNT(*) AS BIGINT)"
    elif agg == "min":
        a = f"min({measure})"
    elif agg == "max":
        a = f"max({measure})"
    else:
        a = f"CAST(COUNT(DISTINCT {measure}) AS BIGINT)"
    return f"SELECT {group} AS g, {a} AS m FROM {table} {where} GROUP BY {group}"


def _norm(v):
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        return ("f", "nan") if math.isnan(v) else ("f", repr(v))
    if isinstance(v, (dt.datetime, dt.date)):
        return ("t", v.isoformat())
    return v


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    # events.ts is TIMESTAMP(NANOS) in the file; none of the fuzzed
    # columns touch it, so the raw view is fine
    yield con
    con.close()


@given(query_spec())
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_agg_query_matches_duckdb(spark, duck, spec):
    sdf = _spark_query(spark, spec)
    srows = sorted((tuple(_norm(v) for v in r) for r in sdf.collect()), key=repr)
    drows = sorted(
        (tuple(_norm(v) for v in r) for r in duck.execute(_duck_sql(spec)).fetchall()),
        key=repr,
    )
    assert srows == drows, f"spec={spec}\nspark={srows[:3]}\nduck={drows[:3]}"


@st.composite
def having_spec(draw):
    table = draw(st.sampled_from(sorted(TABLES)))
    groups, measures, _ = TABLES[table]
    g = draw(st.lists(st.sampled_from(groups), min_size=1, max_size=2, unique=True))
    measure = draw(st.sampled_from(measures))
    threshold = draw(st.integers(min_value=1, max_value=100))
    return (table, tuple(g), measure, threshold)


@given(having_spec())
@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_having_query_matches_duckdb(spark, duck, spec):
    """Multi-column grouping + HAVING on the exact-decimal sum."""
    table, groups, measure, threshold = spec
    df = load_table(spark, SF, table)
    sdf = (
        df.groupBy(*[F.col(c) for c in groups])
        .agg(
            F.sum(F.col(measure).cast("decimal(18,4)")).alias("s_dec"),
            F.count("*").cast("bigint").alias("n"),
        )
        .filter(F.col("s_dec") > threshold)
        .select(*groups, F.col("s_dec").cast("double").alias("s"), "n")
    )
    gcols = ", ".join(groups)
    sql = (
        f"SELECT {gcols}, CAST(SUM(CAST({measure} AS DECIMAL(18,4))) AS DOUBLE) AS s,"
        f" CAST(COUNT(*) AS BIGINT) AS n FROM {table} GROUP BY {gcols}"
        f" HAVING SUM(CAST({measure} AS DECIMAL(18,4))) > {threshold}"
    )
    srows = sorted((tuple(_norm(v) for v in r) for r in sdf.collect()), key=repr)
    drows = sorted(
        (tuple(_norm(v) for v in r) for r in duck.execute(sql).fetchall()), key=repr
    )
    assert srows == drows, f"spec={spec}"
