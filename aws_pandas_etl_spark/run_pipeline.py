"""Job entry point: ``python -m aws_pandas_etl_spark.run_pipeline cfg.yaml``.

The reference's ``python3 main.py`` flow (/root/reference/main.py:83-87:
load config -> HistoryLoad.process loop) as a Spark job: one structured
JSON log line per table, exit code 1 if any table failed (the reference
wrote "No failures in this run" unconditionally, main.py:79-80 — here
the exit code and the log tell the truth).
"""

from __future__ import annotations

import argparse
import sys

from aws_pandas_etl_spark.plans.config import load_config
from aws_pandas_etl_spark.plans.logging_support import setup_logger
from aws_pandas_etl_spark.plans.pipeline import run
from aws_pandas_etl_spark.session import get_spark
from aws_pandas_etl_spark.sources.readers import jdbc_scan, load_table


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="Run the multi-table ETL pipeline")
    ap.add_argument("config", help="YAML job config path")
    args = ap.parse_args(argv)

    cfg = load_config(args.config)
    log = setup_logger("pipeline")
    spark = get_spark(app_name="history-load")

    stype = cfg.source.get("type", "parquet")
    if stype == "parquet":
        src_path = cfg.source["path"]
        source = lambda s, name: load_table(s, src_path, name)
    elif stype == "jdbc":
        opts = {k: v for k, v in cfg.source.items() if k not in {"type", "url"}}
        source = lambda s, name: jdbc_scan(s, cfg.source["url"], name, **opts)
    else:
        raise ValueError(f"unknown source type {stype!r}")

    results = run(
        spark,
        cfg.tables,
        source,
        cfg.target["path"],
        runid=cfg.runid,
        updatedby=cfg.updatedby,
    )
    failed = 0
    for r in results:
        extra = {"table": r.table, "status": r.status, "rows": r.rows}
        if r.status == "failed":
            failed += 1
            log.error(r.error or "failed", extra=extra)
        else:
            log.info("table processed", extra=extra)
    log.info(
        "run complete",
        extra={
            "loaded": sum(1 for r in results if r.status == "loaded"),
            "skipped": sum(1 for r in results if r.status == "skipped"),
            "failed": failed,
        },
    )
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
