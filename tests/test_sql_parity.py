"""Dual-API proof: the oracle SQL texts are ANSI enough that Spark's
OWN SQL analyzer runs them, and `spark.sql(<oracle>)` returns exactly
what the DataFrame twin returns.

`sql_interface_revenue` proves temp-view + spark.sql once; this widens
the surface to the relational family — the same SQL text a reference
user would port runs unchanged on both DuckDB (the cross-engine
correctness gate) and Spark SQL (this test), and the DataFrame plan is
value-identical to the SQL plan.  Catches analyzer-surface gaps the
DataFrame path hides (alias scoping, scalar-subquery decorrelation,
HAVING-over-aggregate resolution).
"""

import pytest

from aws_pandas_etl_spark.plans.queries import ORACLES, QUERIES
from aws_pandas_etl_spark.sources.readers import register_temp_views

# sf0.01: the selective TPC-H predicates (q11 threshold, q20 nested
# IN, q22 anti join) produce empty results at sf0.001, which can't
# prove parity
SF = "/root/testdata/sf0.01"

# relational oracles whose SQL is engine-portable ANSI (no DuckDB-only
# syntax such as list_transform/unnest-struct/RECURSIVE replay)
PARITY_QUERIES = [
    "q12_priority_line_counts",
    "q14_promo_revenue",
    "q16_parts_supplier_counts",
    "q13_customer_distribution",
    "q11_important_stock",
    "q20_part_promotion_suppliers",
]


@pytest.mark.parametrize("name", PARITY_QUERIES)
def test_oracle_sql_runs_on_spark_and_matches_dataframe_twin(spark, name):
    register_temp_views(spark, SF)
    via_sql = spark.sql(ORACLES[name])
    via_df = QUERIES[name](spark, SF)
    assert [f.name for f in via_sql.schema.fields] == [
        f.name for f in via_df.schema.fields
    ]
    s_rows = sorted(tuple(r) for r in via_sql.collect())
    d_rows = sorted(tuple(r) for r in via_df.collect())
    assert s_rows == d_rows, f"{name}: spark.sql != DataFrame twin"
    assert s_rows, f"{name}: empty result can't prove parity"
