"""Stream-shaped operators over an ordered, partitioned log (events table).

Ray Data has no event-time windows/watermarks (SURVEY §2.8: the
reference has none either — "streaming" there is SSE progress). These
are the batch re-expressions of the standard window shapes, per the
public Ray Data guidance: treat the input as a partitioned log, bucket
event-time in ``map_batches`` for tumbling windows, and do gap-based
sessionization inside ``groupby(key).map_groups`` over the ts-sorted
group. Ordering assumption: windows are per-key; only the rows of one
key must co-locate (the groupby shuffle guarantees it).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Max, Min


def add_tumbling_bucket(batch: pa.Table, ts_col: str = "ts",
                        unit: str = "hour") -> pa.Table:
    """Event-time tumbling bucket column (vectorized floor_temporal)."""
    b = pc.floor_temporal(batch.column(ts_col), unit=unit)
    return batch.append_column("window_start", b)


def tumbling_window_agg(ds, key_col: str = "event_type", ts_col: str = "ts",
                        unit: str = "hour"):
    """count/min/max per (key, window) — pre-bucketed, single groupby shuffle."""
    ds = ds.map_batches(lambda t: add_tumbling_bucket(t, ts_col, unit),
                        batch_format="pyarrow")
    return (ds.groupby([key_col, "window_start"])
              .aggregate(Count(alias_name="n_events"),
                         Min("value", alias_name="min_value"),
                         Max("value", alias_name="max_value")))


def session_count(ds, user_col: str = "user_id", ts_col: str = "ts",
                  gap_minutes: float = 30.0):
    """Gap-based sessionization: per user, a new session starts when the gap
    from the previous event exceeds ``gap_minutes``. Returns
    (user_id, n_sessions)."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        ts = g[ts_col].sort_values()
        new_sess = (ts.diff() > gap) | ts.diff().isna()
        return pd.DataFrame({user_col: [g[user_col].iloc[0]],
                             "n_sessions": [int(new_sess.sum())]})

    return ds.groupby(user_col).map_groups(per_user, batch_format="pandas")


def sliding_window_counts(ds, ts_col: str = "ts", size_minutes: int = 60,
                          hop_minutes: int = 30):
    """Sliding windows = explode each row into the size/hop windows it
    belongs to, then one groupby — the shuffle-minimal batch form."""
    assert size_minutes % hop_minutes == 0
    k = size_minutes // hop_minutes
    hop_us = hop_minutes * 60 * 1_000_000

    def explode(t: pa.Table) -> pa.Table:
        # normalize to µs first (from_pandas inputs arrive as timestamp[ns])
        ts = t.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        hops = ts // hop_us  # hop index containing the event
        starts = []
        for j in range(k):
            starts.append((hops - j) * hop_us)
        win = np.concatenate(starts)
        return pa.table({"window_start": pa.array(win).cast(pa.timestamp("us"))})

    return (ds.map_batches(explode, batch_format="pyarrow")
              .groupby("window_start").aggregate(Count(alias_name="n_events")))


def rolling_mean_per_key(ds, key_col: str = "user_id", ts_col: str = "ts",
                         order_col: str = "event_id", value_col: str = "value",
                         preceding: int = 3, out_col: str = "rolling_avg",
                         round_to: int = 6):
    """Per-key rolling mean over the current row and the ``preceding``
    rows in (ts, order) order — the batch form of
    ``AVG(v) OVER (PARTITION BY key ORDER BY ts, order
    ROWS BETWEEN n PRECEDING AND CURRENT ROW)``.

    Scale shape: one ``groupby(key)`` shuffle, vectorized cumsum kernel
    per group; keys are high-cardinality (users), so groups are small.
    Means are float64 sums of <= preceding+1 values rounded to
    ``round_to`` — summation-order differences vs a SQL engine are
    below the rounding quantum.
    """

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, order_col], kind="mergesort")
        v = g[value_col].to_numpy(dtype=np.float64)
        cs = np.concatenate([[0.0], np.cumsum(v)])
        n = len(v)
        lo = np.maximum(np.arange(n) - preceding, 0)
        means = (cs[np.arange(n) + 1] - cs[lo]) / (np.arange(n) - lo + 1)
        out = g[[key_col, order_col]].copy()
        out[out_col] = np.round(means, round_to)
        return out

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")
