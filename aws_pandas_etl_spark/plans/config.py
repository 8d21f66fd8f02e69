"""YAML job config -> pipeline specs.

Parity with the reference's ConfigGen (/root/reference/utils/
config_gen.py:36-174) minus its failure modes: no hard-coded credential
fallbacks (config_gen.py:86-123 — never replicated), no filename
mismatch (:54 opens a file the repo doesn't ship), schemas as data not
eval.  Secrets/connection resolution is out of engine scope (SURVEY
S5/S6): pass connection options through ``source``/``target`` maps.

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
        raw = yaml.safe_load(f) or {}
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
        raise ValueError(f"{path}: no tables configured")
    return JobConfig(
        source=raw.get("source") or {},
        target=raw.get("target") or {},
        tables=tables,
        runid=int(raw.get("runid", 1)),
        updatedby=raw.get("updatedby", "redshiftadmin"),
        extra={k: v for k, v in raw.items()
               if k not in {"source", "target", "tables", "runid", "updatedby"}},
    )
