"""DataFrame -> DataFrame operators (composable, pure, lazily planned)."""

from aws_pandas_etl_spark.operators.transforms import (
    add_audit_columns,
    add_row_hash,
    cast_bit_columns,
    cast_date_columns,
    cast_decimal_columns,
    cast_tinyint_columns,
    enforce_schema,
    standardize_column_names,
)

__all__ = [
    "add_audit_columns",
    "add_row_hash",
    "cast_bit_columns",
    "cast_date_columns",
    "cast_decimal_columns",
    "cast_tinyint_columns",
    "enforce_schema",
    "standardize_column_names",
]
