"""Scalar/column helper functions (JVM-side Column expressions only)."""

from aws_pandas_etl_spark.functions.hashing import (
    md5_bigint,
    row_hash,
    shingles,
)
from aws_pandas_etl_spark.functions.types import (
    MSSQL_TYPE_MAP,
    REDSHIFT_TYPE_MAP,
    build_struct_type,
    spark_type_for,
)

__all__ = [
    "MSSQL_TYPE_MAP",
    "REDSHIFT_TYPE_MAP",
    "build_struct_type",
    "spark_type_for",
    "md5_bigint",
    "row_hash",
    "shingles",
]
