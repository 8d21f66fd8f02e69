"""YAML job config -> pipeline specs.

Parity with the reference's ConfigGen (/root/reference/utils/
config_gen.py:36-174) minus its failure modes: no hard-coded credential
fallbacks (config_gen.py:86-123 — never replicated), no filename
mismatch (:54 opens a file the repo doesn't ship), schemas as data not
eval.  Remote configs come through ``load_config_from_url`` (S5 —
Hadoop FS, any scheme the cluster speaks).  Secrets (SURVEY S6,
reference secrets_manager_operations.py:10-30: fetch a named secret,
JSON-decode it, merge the connection fields into the job settings)
resolve through an injectable ``SecretProvider`` —
``resolve_secrets`` merges a provider-fetched dict under any
``source``/``target`` map that names a ``secret``; ship-your-own
provider (JSON file, env var, or your platform's secret manager) and
NO hard-coded credential fallbacks (config_gen.py:86-123 is the
anti-pattern this replaces: same local-fallback *structure*, zero
baked-in passwords).

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


# --------------------------------------------------------------------------
# S6 — secrets_scan (reference utils/secrets_manager_operations.py:10-30):
# fetch a named secret, JSON-decode it, hand the dict to config assembly
# (config_gen.py:75-82).  Engine rendition: a provider PROTOCOL (anything
# with get_secret(name) -> dict) injected into resolve_secrets, with two
# in-tree providers that need no AWS — and, unlike the reference's local
# branch (config_gen.py:86-123), no hard-coded credentials anywhere.
# --------------------------------------------------------------------------


class MappingSecretProvider:
    """Secrets from an in-memory mapping — the unit-test double and the
    programmatic-injection path."""

    def __init__(self, secrets: dict[str, dict]):
        self._secrets = dict(secrets)

    def get_secret(self, name: str) -> dict:
        try:
            return dict(self._secrets[name])
        except KeyError:
            raise KeyError(f"secret {name!r} not found in provider") from None


class JsonFileSecretProvider:
    """Secrets from a local JSON file ``{secret_name: {...fields...}}`` —
    the local-run fallback with the reference's *structure* (a dict of
    connection fields per secret name) but the operator supplies the
    file; nothing ships baked in."""

    def __init__(self, path: str):
        self._path = path

    def get_secret(self, name: str) -> dict:
        import json

        with open(self._path) as fh:
            data = json.load(fh)
        if name not in data:
            raise KeyError(f"secret {name!r} not found in {self._path}")
        val = data[name]
        if not isinstance(val, dict):
            raise ValueError(f"secret {name!r} must be a JSON object")
        return dict(val)


class EnvJsonSecretProvider:
    """Secrets from environment variables: ``<PREFIX><NAME>`` (name
    upper-cased, non-alnum -> ``_``) holding a JSON object — the
    container-orchestrator injection path (secrets mounted as env)."""

    def __init__(self, prefix: str = "AWSPE_SECRET_"):
        self._prefix = prefix

    def get_secret(self, name: str) -> dict:
        import json
        import os
        import re

        var = self._prefix + re.sub(r"[^A-Za-z0-9]", "_", name).upper()
        raw = os.environ.get(var)
        if raw is None:
            raise KeyError(f"secret {name!r}: env var {var} not set")
        val = json.loads(raw)
        if not isinstance(val, dict):
            raise ValueError(f"secret {name!r} must be a JSON object")
        return val


def aws_secrets_manager_provider(region_name: str):
    """Production provider with the reference's exact semantics
    (secrets_manager_operations.py:18-30: client.get_secret_value,
    json.loads(SecretString), ClientError propagates).  Gated behind an
    import-try — boto3 is not a dependency of this engine; the returned
    object satisfies the same ``get_secret`` protocol."""
    try:
        import boto3  # noqa: PLC0415
    except ImportError as exc:  # pragma: no cover - boto3 absent in CI
        raise ImportError(
            "aws_secrets_manager_provider requires boto3; install it or "
            "inject a JsonFileSecretProvider/EnvJsonSecretProvider"
        ) from exc

    class _AwsProvider:  # pragma: no cover - needs live AWS
        def __init__(self, region: str):
            self._client = boto3.session.Session().client(
                service_name="secretsmanager", region_name=region
            )

        def get_secret(self, name: str) -> dict:
            import json

            resp = self._client.get_secret_value(SecretId=name)
            return json.loads(resp["SecretString"])

    return _AwsProvider(region_name)


def resolve_secrets(cfg: JobConfig, provider) -> JobConfig:
    """Return a JobConfig whose ``source``/``target`` maps have any
    ``secret: <name>`` reference resolved through ``provider`` and
    merged UNDER the explicit keys (an explicit config value always
    wins over a secret field — the reference merges the other way
    only because its config carries no connection fields at all).
    The ``secret`` key itself is dropped from the resolved map."""
    if provider is None:
        raise ValueError("resolve_secrets needs a SecretProvider")

    def _resolve(section: dict) -> dict:
        name = section.get("secret")
        if not name:
            return dict(section)
        fetched = provider.get_secret(name)
        if not isinstance(fetched, dict):
            raise ValueError(f"secret {name!r} must resolve to a dict")
        out = dict(fetched)
        out.update({k: v for k, v in section.items() if k != "secret"})
        return out

    return JobConfig(
        source=_resolve(cfg.source),
        target=_resolve(cfg.target),
        tables=cfg.tables,
        runid=cfg.runid,
        updatedby=cfg.updatedby,
        extra=cfg.extra,
    )


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
