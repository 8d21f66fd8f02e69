"""Sources and sinks (parquet/CSV/JSON/JDBC readers, partitioned sinks)."""

from aws_pandas_etl_spark.sources.readers import load_table, load_tables, TABLES
from aws_pandas_etl_spark.sources.sinks import write_parquet_sink, overwrite_load

__all__ = ["load_table", "load_tables", "TABLES", "write_parquet_sink", "overwrite_load"]
