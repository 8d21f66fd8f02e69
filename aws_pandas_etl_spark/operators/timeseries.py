"""Sequential per-key time-series operators (linear recurrences).

An exponentially-weighted moving average is the textbook operator SQL
windows cannot express exactly: s_t = alpha*x_t + (1-alpha)*s_{t-1} is
a linear RECURRENCE, not a frame aggregate.  The closed form
sum(alpha*(1-alpha)^(t-i) * x_i) exists but pow()-based evaluation
overflows/underflows for long histories and its summation order is
engine-dependent — so the portable exact form is the recurrence
itself, run sequentially WITHIN each key and in parallel ACROSS keys.

Spark shape: ``applyInPandas`` grouped by key — one hash shuffle, then
Arrow-batched per-group evaluation.  State is O(1) per key and each
group is processed by exactly one task, so this scales to any number
of keys; a single pathologically long key is the only serial unit
(same bound as any order-dependent per-key scan).  With alpha = 0.5
every weight is a power of two, so the float64 recurrence is exact
IEEE arithmetic reproducible across engines (the DuckDB oracle twin
replays the identical recurrence via a recursive CTE).

The per-group Python loop is deliberate: pandas ``ewm(adjust=False)``
computes the same value through a different operation order (weighted
running sums), which breaks bit-parity; production code chasing speed
can swap it in at the cost of last-ulp drift.
"""

from __future__ import annotations

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

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols)
        s = None
        for x in pdf[value_col].to_numpy():
            x = float(x)
            s = x if s is None else alpha * x + (1.0 - alpha) * s
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "n_events": [len(pdf)],
                "ewma": [s],
            }
        )

    return df.select(key_col, *order_cols, value_col).groupBy(key_col).applyInPandas(
        fn, schema=schema
    )
