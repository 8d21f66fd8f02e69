import json
import subprocess
import sys

import pytest

from aws_pandas_etl_spark.operators import multimodal as MM
from aws_pandas_etl_spark.plans.config import load_config
from aws_pandas_etl_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"

CFG = """
source: {{type: parquet, path: {sf}}}
target: {{path: {out}}}
runid: 7
updatedby: etl_user
tables:
  events: {{active_flag: "T", red_schema: "T"}}
  documents: {{active_flag: "F"}}
"""


def test_load_config(tmp_path):
    p = tmp_path / "job.yaml"
    p.write_text(CFG.format(sf=SF, out=tmp_path / "out"))
    cfg = load_config(str(p))
    assert cfg.runid == 7 and cfg.updatedby == "etl_user"
    assert cfg.tables["events"].active_flag == "T"
    assert cfg.tables["documents"].active_flag == "F"


def test_load_config_from_url_with_injected_fetcher(tmp_path):
    """S5 counterpart, DI seam: the fetcher receives the URL verbatim
    and its payload goes through the same parser/validation as local
    files (reference: s3_operations.py:22-46)."""
    from aws_pandas_etl_spark.plans.config import load_config_from_url

    seen = {}

    def fetcher(url):
        seen["url"] = url
        return CFG.format(sf=SF, out=tmp_path / "out")

    cfg = load_config_from_url("s3://bucket/prefix/job.yaml", fetcher=fetcher)
    assert seen["url"] == "s3://bucket/prefix/job.yaml"
    assert cfg.runid == 7 and cfg.tables["events"].red_schema == "T"

    with pytest.raises(ValueError, match="no tables configured"):
        load_config_from_url("s3://b/empty.yaml", fetcher=lambda u: "source: {}")


def test_load_config_from_url_via_hadoop_fs(spark, tmp_path):
    """The default (no fetcher) path goes through the cluster's Hadoop
    FileSystem — same code path an s3a:// URL takes on a real cluster,
    exercised here with the file:// scheme."""
    from aws_pandas_etl_spark.plans.config import load_config_from_url

    p = tmp_path / "job.yaml"
    p.write_text(CFG.format(sf=SF, out=tmp_path / "out"))
    cfg = load_config_from_url(f"file://{p}", spark=spark)
    assert cfg.runid == 7 and cfg.tables["documents"].active_flag == "F"


def test_load_config_rejects_unknown_keys(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("tables:\n  t: {activ_flag: T}\nsource: {}\ntarget: {}\n")
    with pytest.raises(ValueError, match="unknown config keys"):
        load_config(str(p))


def test_cli_end_to_end(tmp_path):
    p = tmp_path / "job.yaml"
    p.write_text(CFG.format(sf=SF, out=tmp_path / "out"))
    proc = subprocess.run(
        [sys.executable, "-m", "aws_pandas_etl_spark.run_pipeline", str(p)],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [json.loads(l) for l in proc.stderr.splitlines()
             if l.startswith("{") and "pipeline" in l]
    by_table = {l.get("table"): l for l in lines if "table" in l}
    assert by_table["events"]["status"] == "loaded" and by_table["events"]["rows"] == 1000
    assert by_table["documents"]["status"] == "skipped"


def test_cli_failure_exit_code(tmp_path):
    p = tmp_path / "job.yaml"
    p.write_text(
        f"source: {{type: parquet, path: {SF}}}\n"
        f"target: {{path: {tmp_path / 'out'}}}\n"
        "tables:\n  no_such_table: {active_flag: \"T\"}\n"
    )
    proc = subprocess.run(
        [sys.executable, "-m", "aws_pandas_etl_spark.run_pipeline", str(p)],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert proc.returncode == 1


def test_multimodal_resize_and_frames(spark):
    docs = load_table(spark, SF, "documents").limit(10)
    bin_df = MM.documents_as_binary(docs)
    resized = MM.resize_batch(bin_df, width=8, height=4).collect()
    assert all(len(r["payload"]) == 32 for r in resized)
    assert all(r["out_width"] == 8 and r["out_height"] == 4 for r in resized)
    frames = MM.sample_frames(bin_df, every_n_bytes=64, max_frames=3)
    rows = frames.collect()
    assert len(rows) > 10  # 1->N explode happened
    assert frames.columns == ["doc_id", "frame_no", "frame"]
    assert all(r["frame_no"] < 3 for r in rows)


def test_config_load_mode_keys(tmp_path):
    from aws_pandas_etl_spark.plans.config import load_config

    p = tmp_path / "job.yaml"
    p.write_text(
        "source: {type: parquet, path: /data}\n"
        "target: {path: /out}\n"
        "tables:\n"
        "  events: {load_mode: merge, merge_keys: [event_id], order_col: ts}\n"
        "  region: {load_mode: append}\n"
    )
    cfg = load_config(str(p))
    assert cfg.tables["events"].load_mode == "merge"
    assert cfg.tables["events"].merge_keys == ["event_id"]
    assert cfg.tables["events"].order_col == "ts"
    assert cfg.tables["region"].load_mode == "append"


def test_config_rejects_bad_load_mode_and_listifies_scalar_keys(tmp_path):
    import pytest as _pytest

    from aws_pandas_etl_spark.plans.config import load_config

    bad = tmp_path / "bad.yaml"
    bad.write_text("tables:\n  t: {load_mode: upsert}\n")
    with _pytest.raises(ValueError, match="load_mode"):
        load_config(str(bad))
    ok = tmp_path / "ok.yaml"
    ok.write_text("tables:\n  t: {load_mode: merge, merge_keys: event_id, order_col: ts}\n")
    assert load_config(str(ok)).tables["t"].merge_keys == ["event_id"]


def test_driver_window_spans_operator_families():
    """The first 50 registry entries are the driver-verified window; it
    must stay an explicit, family-spanning choice (one row per SURVEY
    §2/§2b family), not an accident of registration order."""
    from aws_pandas_etl_spark.plans import queries as Q

    names = list(Q.QUERIES)
    assert names[: len(Q._DRIVER_WINDOW)] == Q._DRIVER_WINDOW
    assert len(Q._DRIVER_WINDOW) == 50
    assert len(set(Q._DRIVER_WINDOW)) == 50
    # every windowed query still has its oracle twin, same order
    assert list(Q.ORACLES)[:50] == Q._DRIVER_WINDOW
    # spot-pin the seats that must never drift back out of the window
    # (round-15 rotation: 6 re-seats for queries the r15 work changed
    # — clamped PSI bin grid, TWS state_api certification column,
    # compaction writer guard on the merge write path — 6 seats
    # covering every other sinks.py write entry point behind the same
    # hardening, and 38 stalest driver-green entries: all 10 r7
    # survivors + the 28 oldest r8)
    for must in [
        "psi_value_drift",               # reworked (clamped bin grid)
        "streaming_psi_value_drift",     # reworked (same clamp, stream side)
        "streaming_ewma_per_user_tws",   # reworked (state_api audit column)
        "streaming_sessionize_tws",      # reworked (state_api audit column)
        "streaming_partitioned_merge",   # reworked (compaction writer guard)
        "streaming_foreach_batch_merge", # reworked (same write path)
        "pipeline_compact_batched",      # r15-born (batched compaction)
        "knn_graph_degree_powerlaw",     # reworked (negated-zero fix, 10x find)
        "pipeline_roundtrip",            # sinks.py entry point (K1/K2)
        "pipeline_error_isolation",      # sinks.py entry point
        "pipeline_merge_roundtrip",      # sinks.py entry point (merge_load)
        "pipeline_delete_roundtrip",     # sinks.py entry point (delete_load)
        "pipeline_idempotent_append",    # sinks.py entry point (batched)
        "pipeline_partition_overwrite",  # sinks.py entry point (dyn overwrite)
        "window_value_distribution",     # stalest (r7), window family rep
        "fk_orphan_audit",               # stalest (r7), data-quality rep
        "key_skew_report",               # stalest (r7), the skew pre-flight
        "attribution_last_touch",        # stalest (r8), attribution rep
        "neyman_sample_by_lang",         # stalest (r8), sampling rep
        "decontaminate_benchmark",       # stalest (r8), dedup/curation rep
        "udaf_weighted_mean_value",      # stalest (r8), UDAF rep
        "ivf_cell_balance",              # stalest (r8), ANN family rep
        "knn_graph_incremental_batch",   # stalest (r8), graph family rep
        "q11_important_stock",           # stalest (r8), TPC-H rep
        "schema_evolution_ingest",       # stalest (r8), format/ingest rep
        "twap_user_value",               # stalest (r8), timeseries rep
    ]:
        assert must in Q._DRIVER_WINDOW, must


def test_coverage_doc_cites_live_registry_count():
    """COVERAGE.md's cited registry size must equal ``len(queries())``
    — r13 shipped a mid-round "288/288" that was stale by close (r13
    verdict #6); the count the doc cites is now guard-tested the same
    way the driver window is."""
    import os
    import re

    from aws_pandas_etl_spark.plans import queries as Q

    cov = os.path.join(os.path.dirname(__file__), "..", "COVERAGE.md")
    with open(cov) as fh:
        text = fh.read()
    m = re.search(r"all (\d+) registered queries", text)
    assert m, "COVERAGE.md no longer cites a registry count"
    assert int(m.group(1)) == len(Q.QUERIES), (
        f"COVERAGE.md cites {m.group(1)} registered queries but the live "
        f"registry holds {len(Q.QUERIES)} — update the doc"
    )
    readme = os.path.join(os.path.dirname(__file__), "..", "README.md")
    with open(readme) as fh:
        rm = re.search(r"the registry: (\d+) queries", fh.read())
    assert rm, "README.md no longer cites the registry count"
    assert int(rm.group(1)) == len(Q.QUERIES), (
        f"README.md cites {rm.group(1)} queries; registry holds "
        f"{len(Q.QUERIES)}"
    )


# -- S6 secrets_scan (reference secrets_manager_operations.py:10-30) --------


SECRET_CFG = """
source: {type: jdbc, secret: src-mssql, database: appdb}
target: {path: /out, secret: dest-redshift}
tables:
  events: {active_flag: "T"}
"""


def test_resolve_secrets_merges_under_explicit_keys():
    """The provider's fields land in the section map; explicit config
    keys win; the `secret` reference itself is dropped."""
    from aws_pandas_etl_spark.plans.config import (
        MappingSecretProvider,
        parse_config,
        resolve_secrets,
    )

    cfg = parse_config(SECRET_CFG)
    provider = MappingSecretProvider(
        {
            "src-mssql": {"host": "h1", "port": "1433", "database": "IGNORED"},
            "dest-redshift": {"host": "h2", "iam_role": "r"},
        }
    )
    out = resolve_secrets(cfg, provider)
    assert out.source["host"] == "h1" and out.source["port"] == "1433"
    assert out.source["database"] == "appdb"  # explicit key wins
    assert "secret" not in out.source and "secret" not in out.target
    assert out.target["iam_role"] == "r" and out.target["path"] == "/out"
    # original config untouched; table specs carried through
    assert cfg.source.get("secret") == "src-mssql"
    assert out.tables["events"].active_flag == "T"


def test_resolve_secrets_missing_secret_raises():
    from aws_pandas_etl_spark.plans.config import (
        MappingSecretProvider,
        parse_config,
        resolve_secrets,
    )

    cfg = parse_config(SECRET_CFG)
    with pytest.raises(KeyError, match="dest-redshift"):
        resolve_secrets(
            cfg, MappingSecretProvider({"src-mssql": {"host": "h"}})
        )


def test_json_file_secret_provider(tmp_path):
    from aws_pandas_etl_spark.plans.config import JsonFileSecretProvider

    p = tmp_path / "secrets.json"
    p.write_text(json.dumps({"src-mssql": {"host": "localhost"}, "bad": 3}))
    prov = JsonFileSecretProvider(str(p))
    assert prov.get_secret("src-mssql") == {"host": "localhost"}
    with pytest.raises(KeyError):
        prov.get_secret("nope")
    with pytest.raises(ValueError, match="JSON object"):
        prov.get_secret("bad")


def test_env_json_secret_provider(monkeypatch):
    from aws_pandas_etl_spark.plans.config import EnvJsonSecretProvider

    monkeypatch.setenv(
        "AWSPE_SECRET_DEST_REDSHIFT", json.dumps({"host": "h2"})
    )
    prov = EnvJsonSecretProvider()
    assert prov.get_secret("dest-redshift") == {"host": "h2"}
    with pytest.raises(KeyError, match="AWSPE_SECRET_MISSING"):
        prov.get_secret("missing")
