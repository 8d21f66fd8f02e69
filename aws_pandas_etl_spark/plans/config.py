"""YAML job config -> pipeline specs.

Parity with the reference's ConfigGen (/root/reference/utils/
config_gen.py:36-174) minus its failure modes: no hard-coded credential
fallbacks (config_gen.py:86-123 — never replicated), no filename
mismatch (:54 opens a file the repo doesn't ship), schemas as data not
eval.  Remote configs come through ``load_config_from_url`` (S5 —
Hadoop FS, any scheme the cluster speaks).  Secrets/connection
resolution stays out of engine scope (SURVEY S6): pass connection
options through ``source``/``target`` maps, or inject a ``fetcher``
that resolves them however your platform does.

Config shape::

    source: {type: parquet, path: /data/sf0.001}   # or type: jdbc, url, ...
    target: {path: /out}
    runid: 1
    updatedby: redshiftadmin
    tables:
      events:   {active_flag: "T", red_schema: "T"}
      lineitem: {active_flag: "T", red_schema: "F", date_cols: [l_shipdate]}
"""

from __future__ import annotations

from dataclasses import dataclass, field

import yaml

from aws_pandas_etl_spark.plans.pipeline import TableSpec


@dataclass
class JobConfig:
    source: dict
    target: dict
    tables: dict[str, TableSpec]
    runid: int = 1
    updatedby: str = "redshiftadmin"
    extra: dict = field(default_factory=dict)


_SPEC_KEYS = {
    "active_flag",
    "red_schema",
    "bit_cols",
    "tinyint_cols",
    "decimal_cols",
    "date_cols",
    "hash_cols",
    "load_mode",
    "merge_keys",
    "order_col",
}


def load_config(path: str) -> JobConfig:
    with open(path) as f:
        return parse_config(f.read(), origin=path)


def load_config_from_url(url: str, spark=None, fetcher=None) -> JobConfig:
    """S5 counterpart — fetch the YAML job config from a storage URL
    (reference: s3_operations.py:22-46 regex-parses an ``s3://`` path
    and ``get_object``'s it with boto3).

    Spark-first resolution, pluggable for tests:

    - ``fetcher(url) -> str`` if given (dependency injection; also the
      seam for an organization's own config service);
    - otherwise the Hadoop FileSystem API of the active session, which
      speaks every scheme the cluster does (``s3a://``, ``hdfs://``,
      ``file://``) with the cluster's own credential providers — no
      separate boto3 client or hand-rolled bucket/key regex."""
    if fetcher is not None:
        return parse_config(fetcher(url), origin=url)
    if spark is None:
        raise ValueError("load_config_from_url needs a SparkSession or a fetcher")
    jvm = spark.sparkContext._jvm
    path = jvm.org.apache.hadoop.fs.Path(url)
    fs = path.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    stream = fs.open(path)
    try:
        text = jvm.org.apache.commons.io.IOUtils.toString(
            stream, jvm.java.nio.charset.StandardCharsets.UTF_8
        )
    finally:
        stream.close()
    return parse_config(text, origin=url)


def parse_config(text: str, origin: str = "<config>") -> JobConfig:
    raw = yaml.safe_load(text) or {}
    tables = {}
    for name, spec in (raw.get("tables") or {}).items():
        spec = spec or {}
        unknown = set(spec) - _SPEC_KEYS
        if unknown:
            raise ValueError(f"table {name!r}: unknown config keys {sorted(unknown)}")
        mode = spec.get("load_mode", "overwrite")
        if mode not in ("overwrite", "append", "merge"):
            raise ValueError(
                f"table {name!r}: load_mode must be overwrite|append|merge, got {mode!r}"
            )
        # YAML scalar -> list (merge_keys: event_id would otherwise be
        # char-unpacked by Window.partitionBy(*keys))
        if isinstance(spec.get("merge_keys"), str):
            spec["merge_keys"] = [spec["merge_keys"]]
        tables[name] = TableSpec(name=name, **spec)
    if not tables:
        raise ValueError(f"{origin}: no tables configured")
    return JobConfig(
        source=raw.get("source") or {},
        target=raw.get("target") or {},
        tables=tables,
        runid=int(raw.get("runid", 1)),
        updatedby=raw.get("updatedby", "redshiftadmin"),
        extra={k: v for k, v in raw.items()
               if k not in {"source", "target", "tables", "runid", "updatedby"}},
    )
