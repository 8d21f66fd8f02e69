"""aws_pandas_etl_spark — a PySpark-native analytics/ETL engine.

Re-expresses the capabilities of the reference repo
``sagadevanmi/aws-pandas-etl`` (a single-process pandas chunk ETL:
RDBMS scan -> type casts -> audit columns -> parquet -> S3 -> Redshift
COPY; see /root/reference/main.py:35-80) as an idiomatic, distributed
Spark engine, plus the LLM-training-data extension surface (dedup,
similarity search, multimodal columns, text analysis).

Design stance (100 TB posture):
- Declarative DataFrame plans; Catalyst does pushdown/pruning/join
  selection. No driver-side data loops.
- Partitions replace the reference's 1M-row pandas chunks
  (/root/reference/utils/rdbms_operations.py:227).
- Broadcast small dimensions; AQE on for skew/coalesce; salting helpers
  for skewed keys.
- Python only at Arrow-batched boundaries (pandas UDFs / mapInPandas),
  never row-at-a-time in the hot path.
"""

from aws_pandas_etl_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
