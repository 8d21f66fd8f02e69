"""Structured JSON logging — parity with the reference's L1 operator
(/root/reference/utils/log_support.py:8-46: JSONFormatter with custom
extra fields JobName/AffectedPipeline/ServiceName).

Driver-side only; executors log through Spark's log4j as usual.
"""

from __future__ import annotations

import datetime as _dt
import json
import logging


class JSONFormatter(logging.Formatter):
    """Format records as one JSON object per line, merging any
    ``extra`` fields passed at the call site (the reference attaches
    JobName/AffectedPipeline/ServiceName, main.py:26-32)."""

    _RESERVED = frozenset(
        logging.LogRecord(None, None, "", 0, "", (), None).__dict__
    ) | {"message", "asctime"}

    def format(self, record: logging.LogRecord) -> str:
        out = {
            "timestamp": _dt.datetime.fromtimestamp(
                record.created, _dt.timezone.utc
            ).isoformat(),
            "level": record.levelname,
            "logger": record.name,
            "message": record.getMessage(),
        }
        for k, v in record.__dict__.items():
            if k not in self._RESERVED and not k.startswith("_"):
                out[k] = v
        if record.exc_info:
            out["exception"] = self.formatException(record.exc_info)
        return json.dumps(out, default=str)


def setup_logger(
    name: str = "aws_pandas_etl_spark", level: int = logging.INFO
) -> logging.Logger:
    """Reference ``setup_logger`` twin: stream handler + JSON format."""
    logger = logging.getLogger(name)
    logger.setLevel(level)
    if not any(
        isinstance(h.formatter, JSONFormatter) for h in logger.handlers
    ):
        handler = logging.StreamHandler()
        handler.setFormatter(JSONFormatter())
        logger.addHandler(handler)
        logger.propagate = False
    return logger
