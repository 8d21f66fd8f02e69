"""Load the r14 checkout's query functions side by side with the
current package, for interleaved old-vs-new re-timing of queries the
r15 verdict flagged as regressed-in-untouched-code (item 4).

Imports the r14 worktree's ``aws_pandas_etl_spark`` under a temporary
sys.modules swap, grabs the two flagged query functions, then restores
the current package's modules; the r14 functions keep references to
their own module objects, so both versions run in one SparkSession.
"""

from __future__ import annotations

import sys

R14_PATH = "/tmp/r14wt"


def _load_r14_queries():
    saved = {
        k: v for k, v in sys.modules.items()
        if k.startswith("aws_pandas_etl_spark")
    }
    for k in saved:
        del sys.modules[k]
    sys.path.insert(0, R14_PATH)
    try:
        from aws_pandas_etl_spark.plans import queries as q14  # noqa: PLC0415
        return q14
    finally:
        sys.path.remove(R14_PATH)
        for k in [k for k in sys.modules if k.startswith("aws_pandas_etl_spark")]:
            del sys.modules[k]
        sys.modules.update(saved)


_Q14 = _load_r14_queries()
hard_negative_mining_r14 = _Q14.QUERIES["hard_negative_mining"]
bootstrap_ci_mean_value_r14 = _Q14.QUERIES["bootstrap_ci_mean_value"]
