"""Pipeline runner and the query registry backing __spark_entry__.py."""
