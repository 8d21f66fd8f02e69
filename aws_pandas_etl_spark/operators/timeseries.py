"""Sequential per-key time-series operators (linear recurrences).

An exponentially-weighted moving average is the textbook operator SQL
windows cannot express exactly: s_t = alpha*x_t + (1-alpha)*s_{t-1} is
a linear RECURRENCE, not a frame aggregate.  The closed form
sum(alpha*(1-alpha)^(t-i) * x_i) exists but pow()-based evaluation
overflows/underflows for long histories and its summation order is
engine-dependent — so the portable exact form is the recurrence
itself, run sequentially WITHIN each key and in parallel ACROSS keys.

Spark shape: repartition by key (explicit partition count — the
shuffle is tiny in BYTES so AQE would coalesce it to one task, but
the downstream work is CPU-bound Python; see docs/SCALE.md), sort
within partitions by (key, order...), then ONE ``mapInPandas`` scan
per partition that detects key boundaries and replays each key's
recurrence in order.  This costs one Python call per Arrow batch
instead of one per GROUP (``applyInPandas`` pays ~ms of pandas
overhead per key — 1500 keys made that the whole runtime), while the
per-key float operation ORDER is identical, so results stay
bit-reproducible.  State is O(1) per key carried across batch
boundaries inside the generator; a single pathologically long key is
the only serial unit (same bound as any order-dependent per-key scan).
With alpha = 0.5 every weight is a power of two, so the float64
recurrence is exact IEEE arithmetic reproducible across engines (the
DuckDB oracle twin replays the identical recurrence via a recursive
CTE).

The per-row Python loop is deliberate: pandas ``ewm(adjust=False)``
computes the same value through a different operation order (weighted
running sums), which breaks bit-parity; production code chasing speed
can swap it in at the cost of last-ulp drift.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def ewma_last_per_key(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Final EWMA value per key after replaying that key's history in
    (order_cols) order.  Returns (key_col, n_events, ewma)."""
    schema = f"{key_col} bigint, n_events bigint, ewma double"
    beta = 1.0 - alpha
    n_parts = df.sparkSession.sparkContext.defaultParallelism

    src = (
        df.select(key_col, *order_cols, value_col)
        .repartition(n_parts, key_col)
        .sortWithinPartitions(key_col, *order_cols)
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        started = False
        cur = 0
        s = 0.0
        n = 0
        out_k: list[int] = []
        out_n: list[int] = []
        out_s: list[float] = []
        for pdf in batches:
            keys = pdf[key_col].to_numpy()
            vals = pdf[value_col].to_numpy()
            for k, x in zip(keys.tolist(), vals.tolist()):
                if not started or k != cur:
                    if started:
                        out_k.append(cur)
                        out_n.append(n)
                        out_s.append(s)
                    started = True
                    cur = k
                    s = float(x)
                    n = 1
                else:
                    s = alpha * float(x) + beta * s
                    n += 1
        if started:
            out_k.append(cur)
            out_n.append(n)
            out_s.append(s)
            yield pd.DataFrame(
                {key_col: out_k, "n_events": out_n, "ewma": out_s}
            )
        # empty partition: yield nothing (an object-dtype empty frame would
        # trip Arrow's concat dtype inference)

    return src.mapInPandas(scan, schema=schema)
