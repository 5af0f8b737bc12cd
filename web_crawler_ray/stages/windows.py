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


def cohort_retention(ds, user_col: str = "user_id", ts_col: str = "ts"):
    """Cohort retention matrix: distinct users active in week
    ``cohort + offset``, grouped by their first-seen (cohort) week —
    the product-analytics classic (Monday-floored ISO weeks, matching
    DuckDB ``date_trunc('week', ts)``). Returns a pyarrow Table
    (cohort_week: timestamp[us], week_offset: int64, n_users: int64)
    sorted by (cohort_week, week_offset).

    Scale shape: ONE keyed exchange. Each batch first reduces to its
    distinct (user, week) pairs (the combiner — shuffle volume is
    user-weeks, not events), then a single raw-task exchange keyed by
    user co-locates each user's whole history, so the partition kernel
    computes the user's cohort (min week) AND the per-(cohort, week)
    distinct-user partials locally; the driver merges O(partitions x
    weeks^2) partial rows. No join: first-seen and activity fold in
    the same exchange because both are per-user functions.
    """
    import pandas as pd
    from .shuffles import int_part_map

    def to_user_week(t: pa.Table) -> pa.Table:
        u = t.column(user_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        d = t.column(ts_col).to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        w = d - ((d + 3) % 7)  # Monday floor (1970-01-01 = Thursday)
        uw = np.unique(np.stack([u, w], axis=1), axis=0)
        return pa.table({"u": pa.array(uw[:, 0]),
                         "w": pa.array(uw[:, 1])})

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        u = df["u"].to_numpy(np.int64)
        w = df["w"].to_numpy(np.int64)
        if not len(u):
            return pd.DataFrame({"cw": u, "aw": u, "n": u})
        order = np.lexsort((w, u))
        u, w = u[order], w[order]
        uw = np.stack([u, w], axis=1)
        keep = np.concatenate(([True], (uw[1:] != uw[:-1]).any(axis=1)))
        u, w = u[keep], w[keep]  # distinct across batches
        starts = np.concatenate(
            ([0], np.flatnonzero(u[1:] != u[:-1]) + 1, [len(u)]))
        cw = np.repeat(w[starts[:-1]], np.diff(starts))  # user's min wk
        cells, n = np.unique(np.stack([cw, w], axis=1), axis=0,
                             return_counts=True)
        return pd.DataFrame({"cw": cells[:, 0], "aw": cells[:, 1],
                             "n": n.astype(np.int64)})

    parts = int_part_map(ds.map_batches(to_user_week,
                                        batch_format="pyarrow"),
                         "u", per_partition, num_partitions=32)
    cat = pa.concat_tables([pa.table(b) for b in
                            parts.iter_batches(batch_format="pyarrow")])
    if cat.num_rows == 0:
        return pa.table({"cohort_week": pa.array([], pa.timestamp("us")),
                         "week_offset": pa.array([], pa.int64()),
                         "n_users": pa.array([], pa.int64())})
    df = cat.to_pandas().groupby(["cw", "aw"], as_index=False)["n"].sum()
    cw = df["cw"].to_numpy(np.int64)
    aw = df["aw"].to_numpy(np.int64)
    out = pa.table({
        "cohort_week": pa.array(cw.astype("datetime64[D]")
                                .astype("datetime64[us]")),
        "week_offset": pa.array((aw - cw) // 7),
        "n_users": pa.array(df["n"].to_numpy(np.int64))})
    return out.sort_by([("cohort_week", "ascending"),
                        ("week_offset", "ascending")])


def transition_counts(ds, user_col: str = "user_id", ts_col: str = "ts",
                      state_col: str = "event_type",
                      order_col: str = "event_id"):
    """First-order Markov transition counts over per-user event
    sequences: (src, dst, n) where dst is the NEXT state of the same
    user ordered by (ts, order_col) — the behavior-model / session-flow
    primitive next to funnel_events (== SQL ``lead() OVER (PARTITION BY
    user ORDER BY ts, id)`` + GROUP BY; the tie column makes the
    sequence total-ordered, hence deterministic). Returns a pyarrow
    Table sorted by (src, dst).

    Scale shape: ONE keyed exchange. Batches cannot pair transitions
    that span them, so each batch ships (user, ts, order, state_code)
    rows through a raw-task exchange keyed by user (a user's whole
    history co-locates); the partition kernel lexsorts once, pairs
    adjacent rows vectorized, and reduces to its local (src, dst)
    counts — the driver merges O(partitions x states^2) partials, never
    the event stream. States ride as dictionary codes with the
    O(states) dictionary broadcast implicitly per block.
    """
    import pandas as pd
    from .shuffles import int_part_map

    def prep(t: pa.Table) -> pa.Table:
        u = t.column(user_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ts = t.column(ts_col).to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        oc = t.column(order_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"u": pa.array(u), "ts": pa.array(ts),
                         "oc": pa.array(oc),
                         "st": t.column(state_col)})

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"src": pd.array([], dtype=object),
                                 "dst": pd.array([], dtype=object),
                                 "n": np.array([], np.int64)})
        u = df["u"].to_numpy(np.int64)
        ts = df["ts"].to_numpy(np.int64)
        oc = df["oc"].to_numpy(np.int64)
        st, states = pd.factorize(df["st"], sort=True)
        order = np.lexsort((oc, ts, u))
        us, ss = u[order], st[order]
        same = us[1:] == us[:-1]
        a, b = ss[:-1][same], ss[1:][same]
        if not len(a):
            return pd.DataFrame({"src": pd.array([], dtype=object),
                                 "dst": pd.array([], dtype=object),
                                 "n": np.array([], np.int64)})
        k = len(states)
        cells, n = np.unique(a * k + b, return_counts=True)
        return pd.DataFrame({
            "src": states[(cells // k)].astype(object),
            "dst": states[(cells % k)].astype(object),
            "n": n.astype(np.int64)})

    parts = int_part_map(ds.map_batches(prep, batch_format="pyarrow"),
                         "u", per_partition, num_partitions=32)
    cat = pa.concat_tables([pa.table(b) for b in
                            parts.iter_batches(batch_format="pyarrow")])
    if cat.num_rows == 0:
        return pa.table({"src": pa.array([], pa.string()),
                         "dst": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    df = cat.to_pandas().groupby(["src", "dst"], as_index=False)["n"] \
            .sum()
    out = pa.table({"src": pa.array(df["src"], pa.string()),
                    "dst": pa.array(df["dst"], pa.string()),
                    "n": pa.array(df["n"].to_numpy(np.int64))})
    return out.sort_by([("src", "ascending"), ("dst", "ascending")])


def resample_ffill(ds, user_col: str = "user_id", ts_col: str = "ts",
                   value_col: str = "value", order_col: str = "event_id"):
    """Per-user hourly forward-fill resampling: one row per (user,
    hour) from the user's first event hour to their last, carrying the
    value of the user's LATEST event with ts < hour+1h — the
    time-series gap-fill primitive (irregular events -> regular grid
    for window models). Same-timestamp ties resolve to the largest
    ``order_col`` (a total order, so the fill is deterministic).
    Values are COPIED, never combined — float-exact by construction.

    Scale shape: ONE keyed exchange. Batches can't forward-fill across
    themselves, so events ship (user, ts, order, value) through a
    raw-task exchange keyed by user; the partition kernel sorts each
    user's co-located history once, builds the hour grid with arange,
    and fills with a single vectorized searchsorted — output is
    O(user-hours), emitted from the partitions (the driver never holds
    the grid). Returns a Dataset (user, hour, value).
    """
    import pandas as pd
    from .shuffles import int_part_map

    US_H = 3_600_000_000  # microseconds per hour

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "u": t.column(user_col).cast(pa.int64()),
            "ts": pa.array(t.column(ts_col)
                           .to_numpy(zero_copy_only=False)
                           .astype("datetime64[us]").astype(np.int64)),
            "oc": t.column(order_col).cast(pa.int64()),
            "v": t.column(value_col).cast(pa.float64())})

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"u": np.array([], np.int64),
                                 "hour": np.array([], np.int64),
                                 "v": np.array([], np.float64)})
        u = df["u"].to_numpy(np.int64)
        ts = df["ts"].to_numpy(np.int64)
        oc = df["oc"].to_numpy(np.int64)
        v = df["v"].to_numpy(np.float64)
        order = np.lexsort((oc, ts, u))
        u, ts, v = u[order], ts[order], v[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(u[1:] != u[:-1]) + 1, [len(u)]))
        out_u, out_h, out_v = [], [], []
        for s, e in zip(starts[:-1], starts[1:]):
            t0 = (ts[s] // US_H) * US_H
            t1 = (ts[e - 1] // US_H) * US_H
            hours = np.arange(t0, t1 + US_H, US_H)
            # latest event with ts <= hour end (hour + 1h - 1us)
            idx = np.searchsorted(ts[s:e], hours + (US_H - 1),
                                  side="right") - 1
            out_u.append(np.full(len(hours), u[s]))
            out_h.append(hours)
            out_v.append(v[s:e][idx])
        return pd.DataFrame({"u": np.concatenate(out_u),
                             "hour": np.concatenate(out_h),
                             "v": np.concatenate(out_v)})

    parts = int_part_map(ds.map_batches(prep, batch_format="pyarrow"),
                         "u", per_partition, num_partitions=32)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            user_col: t.column("u"),
            "hour": pa.array(t.column("hour")
                             .to_numpy(zero_copy_only=False)
                             .astype("datetime64[us]")),
            value_col: t.column("v")})

    return parts.map_batches(finish, batch_format="pyarrow")


def percent_rank_per_group(ds, key_col: str, value_col: str,
                           id_col: str):
    """Per-group percent_rank: ``(rank - 1) / (n - 1)`` with rank-min
    tie handling (SQL ``percent_rank() OVER (PARTITION BY key ORDER BY
    value)``) — the distribution-free score normalizer: downstream
    mixing / gating sees a uniform [0, 1] position instead of a raw
    value, robust to any per-group scale difference (the rank cousin
    of zscore_per_group / winsorize_by_group).

    Scale shape: ONE ``groupby(key)`` shuffle; the per-group kernel is
    a numpy sort + searchsorted (rank of v = 1 + #strictly-smaller),
    O(n log n) local work, no driver traffic. Same group-fits-a-worker
    contract as group_quantiles.

    Exactness: rank and n are integers; pr is the single double
    division DuckDB's percent_rank performs — bit-exact. A 1-row group
    yields 0.0 (DuckDB convention). Returns (id_col, key_col, pr)."""
    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        v = g[value_col].to_numpy(dtype=np.float64)
        n = len(v)
        sv = np.sort(v, kind="stable")
        rank = np.searchsorted(sv, v, side="left") + 1
        pr = (rank - 1) / (n - 1) if n > 1 else np.zeros(n)
        return pd.DataFrame({id_col: g[id_col].to_numpy(),
                             key_col: g[key_col].iloc[0],
                             "pr": pr})

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")


def attr_last_touch(ds, user_col: str = "user_id", ts_col: str = "ts",
                    type_col: str = "event_type",
                    id_col: str = "event_id",
                    target: str = "purchase"):
    """Last-touch attribution: for every ``target`` event, the most
    recent PRIOR non-target event of the same user in the (ts, id)
    total order — the marketing-attribution primitive next to
    funnel/transition (== SQL ``last_value(... IGNORE NULLS) OVER
    (PARTITION BY user ORDER BY ts, id ROWS BETWEEN UNBOUNDED
    PRECEDING AND 1 PRECEDING)``). Targets with no prior touch are
    dropped (the SQL twin's NOT NULL filter). Returns a Dataset
    (event_id, touch_id, touch_type).

    Scale shape: ONE raw-task exchange keyed by user (a user's whole
    history co-locates); the partition kernel lexsorts once and
    resolves every target's latest prior touch with a single
    segmented max-prefix scan (np.maximum.accumulate over
    group-offset-encoded indices — no per-user loop); output is
    O(target rows), emitted from the partitions, never via the
    driver."""
    import pandas as pd

    from .shuffles import int_part_map

    def prep(t: pa.Table) -> pa.Table:
        u = t.column(user_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ts = t.column(ts_col).to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        oc = t.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"u": pa.array(u), "ts": pa.array(ts),
                         "oc": pa.array(oc),
                         "st": t.column(type_col)})

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"event_id": np.array([], np.int64),
             "touch_id": np.array([], np.int64),
             "touch_type": pd.array([], dtype=object)})
        if not len(df):
            return empty
        u = df["u"].to_numpy(np.int64)
        ts = df["ts"].to_numpy(np.int64)
        oc = df["oc"].to_numpy(np.int64)
        st = df["st"].to_numpy(object)
        order = np.lexsort((oc, ts, u))
        u, ts, oc, st = u[order], ts[order], oc[order], st[order]
        n = len(u)
        is_t = st == target
        grp = np.concatenate(([0], np.cumsum(u[1:] != u[:-1])))
        K = n + 2  # group offset > any index, so prefix-max never
        # leaks a touch across a user boundary
        idxv = np.where(~is_t, np.arange(n), -1)
        acc = np.maximum.accumulate(idxv + K * grp)
        prev = np.empty(n, np.int64)
        prev[0] = -1
        prev[1:] = acc[:-1] - K * grp[1:]
        sel = is_t & (prev >= 0)
        pi = prev[sel]
        if not sel.any():
            return empty
        return pd.DataFrame({"event_id": oc[sel],
                             "touch_id": oc[pi],
                             "touch_type": st[pi]})

    return int_part_map(ds.map_batches(prep, batch_format="pyarrow"),
                        "u", per_partition, num_partitions=32)


def session_stats(ds, user_col: str = "user_id", ts_col: str = "ts",
                  id_col: str = "event_id",
                  gap_minutes: float = 30.0):
    """Per-SESSION statistics under gap-based sessionization: split
    each user's (ts, id)-ordered stream at gaps > ``gap_minutes`` and
    emit one row per session (user_id, session_id, n_events,
    duration_us) — the detail view session_count collapses (SQL: a
    lag-gap flag, a running SUM giving session ids, then GROUP BY).
    session_id is 1-based per user in time order; duration is the
    exact integer microsecond span (epoch_us(max) - epoch_us(min)),
    so floats never appear.

    Scale shape: ONE raw-task exchange keyed by user; the partition
    kernel lexsorts once, derives session ids with a segmented cumsum
    (break flags are 1 at every user start, so the global cumsum
    re-based at group starts IS the per-user id — no per-user loop),
    and reduces to its local per-session rows; output is O(sessions),
    emitted from the partitions."""
    import pandas as pd

    from .shuffles import int_part_map

    gap_us = int(round(gap_minutes * 60.0 * 1e6))

    def prep(t: pa.Table) -> pa.Table:
        u = t.column(user_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ts = t.column(ts_col).to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        oc = t.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"u": pa.array(u), "ts": pa.array(ts),
                         "oc": pa.array(oc)})

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        z = np.array([], np.int64)
        if not len(df):
            return pd.DataFrame({"user_id": z, "session_id": z,
                                 "n_events": z, "duration_us": z})
        u = df["u"].to_numpy(np.int64)
        ts = df["ts"].to_numpy(np.int64)
        oc = df["oc"].to_numpy(np.int64)
        order = np.lexsort((oc, ts, u))
        u, ts = u[order], ts[order]
        n = len(u)
        brk = np.ones(n, np.int64)
        same = u[1:] == u[:-1]
        brk[1:] = np.where(same & (ts[1:] - ts[:-1] <= gap_us), 0, 1)
        gsum = np.cumsum(brk)
        ustart = np.concatenate(([0], np.nonzero(u[1:] != u[:-1])[0] + 1))
        # re-base the global cumsum at each user start (brk there is 1)
        base = np.repeat(gsum[ustart] - 1,
                         np.diff(np.append(ustart, n)))
        sid = gsum - base
        key = np.flatnonzero(np.concatenate(
            ([True], (u[1:] != u[:-1]) | (sid[1:] != sid[:-1]))))
        cnt = np.diff(np.append(key, n))
        last = np.append(key[1:], n) - 1
        return pd.DataFrame({"user_id": u[key],
                             "session_id": sid[key],
                             "n_events": cnt.astype(np.int64),
                             "duration_us": ts[last] - ts[key]})

    return int_part_map(ds.map_batches(prep, batch_format="pyarrow"),
                        "u", per_partition, num_partitions=32)


def interval_union(ds, user_col: str = "user_id", ts_col: str = "ts",
                   id_col: str = "event_id",
                   minutes_expr=lambda oc: 1 + oc % 20):
    """Union length of OVERLAPPING per-user intervals — the
    time-on-site / coverage sweep (each event opens a variable-length
    interval [ts, ts + (1 + id % 20) min); overlaps must not double
    count, so sessionization's fixed-gap shortcut does not apply).
    Returns (user_id, n_islands, covered_us): merged-island count and
    exact integer microseconds covered.

    Scale shape: ONE raw-task exchange keyed by user; the partition
    kernel sorts by (user, start, id) and runs the classic sweep
    vectorized — the reset-at-user-boundary running max of interval
    ends is pandas' C-level grouped ``cummax`` + grouped ``shift``
    (a plain np.maximum.accumulate with group offsets would overflow
    int64 on epoch-microsecond values), islands aggregate with one
    groupby; O(users) rows leave the partitions. All arithmetic is
    integer microseconds — no floats."""
    import pandas as pd

    from .shuffles import int_part_map

    def prep(t: pa.Table) -> pa.Table:
        u = t.column(user_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        s = t.column(ts_col).to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        oc = t.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        e = s + minutes_expr(oc) * 60_000_000
        return pa.table({"u": pa.array(u), "s": pa.array(s),
                         "e": pa.array(e), "oc": pa.array(oc)})

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        z = np.array([], np.int64)
        if not len(df):
            return pd.DataFrame({"user_id": z, "n_islands": z,
                                 "covered_us": z})
        df = df.sort_values(["u", "s", "oc"], kind="mergesort")
        ce = df.groupby("u", sort=False)["e"].cummax()
        prev = ce.groupby(df["u"], sort=False).shift(1)
        brk = prev.isna() | (df["s"] > prev)
        iid = brk.cumsum()  # globally unique island ids (u-sorted)
        g = pd.DataFrame({"u": df["u"].to_numpy(np.int64),
                          "iid": iid.to_numpy(np.int64),
                          "s": df["s"].to_numpy(np.int64),
                          "e": df["e"].to_numpy(np.int64)}) \
            .groupby(["u", "iid"], sort=False) \
            .agg(s=("s", "min"), e=("e", "max")).reset_index()
        out = pd.DataFrame({"u": g["u"],
                            "len": g["e"] - g["s"]}) \
            .groupby("u", sort=False) \
            .agg(n_islands=("len", "size"),
                 covered_us=("len", "sum")).reset_index()
        return pd.DataFrame({
            "user_id": out["u"].to_numpy(np.int64),
            "n_islands": out["n_islands"].to_numpy(np.int64),
            "covered_us": out["covered_us"].to_numpy(np.int64)})

    return int_part_map(ds.map_batches(prep, batch_format="pyarrow"),
                        "u", per_partition, num_partitions=32)


def scd2_history(ds, user_col: str = "user_id", ts_col: str = "ts",
                 id_col: str = "event_id", val_col: str = "value"):
    """SCD type-2 history build: each row becomes a validity interval
    [valid_from, valid_to) closed by the same key's NEXT row in the
    (ts, id) total order, the final row left open (NULL) — the
    snapshot-history companion to merge_upsert's SCD-1 (== SQL
    ``lead(ts) OVER (PARTITION BY key ORDER BY ts, id)``). Epochs are
    exact integer microseconds; the value is copied, never combined.
    Returns a Dataset (user_id, event_id, value, valid_from,
    valid_to) — O(input rows), emitted from the partitions.

    Scale shape: ONE raw-task exchange keyed by user; the partition
    kernel lexsorts once and takes the shifted timestamp per user
    boundary — no per-user loop."""
    import pandas as pd

    from .shuffles import int_part_map

    def prep(t: pa.Table) -> pa.Table:
        u = t.column(user_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ts = t.column(ts_col).to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        oc = t.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        v = t.column(val_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({"u": pa.array(u), "ts": pa.array(ts),
                         "oc": pa.array(oc), "v": pa.array(v)})

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        z = np.array([], np.int64)
        if not len(df):
            return pd.DataFrame({
                "user_id": z, "event_id": z,
                "value": np.array([], np.float64),
                "valid_from": z,
                "valid_to": pd.array([], dtype="Int64")})
        u = df["u"].to_numpy(np.int64)
        ts = df["ts"].to_numpy(np.int64)
        oc = df["oc"].to_numpy(np.int64)
        v = df["v"].to_numpy(np.float64)
        order = np.lexsort((oc, ts, u))
        u, ts, oc, v = u[order], ts[order], oc[order], v[order]
        nxt = np.empty(len(u), np.int64)
        nxt[:-1] = ts[1:]
        nxt[-1] = 0
        open_row = np.ones(len(u), bool)
        open_row[:-1] = u[1:] != u[:-1]
        valid_to = pd.array(nxt, dtype="Int64")
        valid_to[open_row] = pd.NA
        return pd.DataFrame({"user_id": u, "event_id": oc,
                             "value": v, "valid_from": ts,
                             "valid_to": valid_to})

    return int_part_map(ds.map_batches(prep, batch_format="pyarrow"),
                        "u", per_partition, num_partitions=32)


def conversion_within(ds, trigger: str = "click",
                      target: str = "purchase",
                      window_minutes: float = 60.0,
                      user_col: str = "user_id", ts_col: str = "ts",
                      type_col: str = "event_type",
                      id_col: str = "event_id"):
    """Time-bounded conversion counting: per user, how many ``target``
    events were preceded by a ``trigger`` of the SAME user within
    ``window_minutes`` (window (t - W, t], trigger at the same
    instant counts) — the funnel family's time-constrained member
    (funnel_counts checks order only). Returns a Dataset
    (user_id, n_targets, n_converted).

    Scale shape: ONE raw-task exchange keyed by user; the kernel
    resolves every target's window membership with TWO global
    searchsorted probes on a (user, ts-rank) composed integer key
    (ranks keep the compose inside int64 where raw epoch-us would
    overflow) — no per-user loop, no per-target scan. Counts are
    exact integers."""
    import pandas as pd

    from .shuffles import int_part_map

    win_us = int(round(window_minutes * 60.0 * 1e6))

    def prep(t: pa.Table) -> pa.Table:
        u = t.column(user_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ts = t.column(ts_col).to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        st = np.asarray(t.column(type_col).to_pylist(), dtype=object)
        keep = (st == trigger) | (st == target)
        tag = (st[keep] == target).astype(np.int8)
        return pa.table({"u": pa.array(u[keep]),
                         "ts": pa.array(ts[keep]),
                         "tag": pa.array(tag)})

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        z = np.array([], np.int64)
        if not len(df):
            return pd.DataFrame({"user_id": z, "n_targets": z,
                                 "n_converted": z})
        u = df["u"].to_numpy(np.int64)
        ts = df["ts"].to_numpy(np.int64)
        tag = df["tag"].to_numpy(np.int8)
        cu, cts = u[tag == 0], ts[tag == 0]
        pu, pts = u[tag == 1], ts[tag == 1]
        if not len(pu):
            return pd.DataFrame({"user_id": z, "n_targets": z,
                                 "n_converted": z})
        lo_ts = pts - win_us
        # rank-compose (user, ts) into one sortable int64 key; BOTH
        # axes dense-coded so the product never overflows regardless
        # of raw user-id / epoch magnitudes
        all_ts = np.unique(np.concatenate([cts, pts, lo_ts]))
        all_u = np.unique(np.concatenate([cu, pu]))
        R = np.int64(len(all_ts) + 1)
        cuc = np.searchsorted(all_u, cu)
        puc = np.searchsorted(all_u, pu)
        ckey = np.sort(cuc * R + np.searchsorted(all_ts, cts))
        hi = np.searchsorted(ckey,
                             puc * R + np.searchsorted(all_ts, pts),
                             side="right")
        lo = np.searchsorted(ckey,
                             puc * R + np.searchsorted(all_ts, lo_ts),
                             side="right")
        conv = (hi > lo).astype(np.int64)
        o = np.argsort(pu, kind="stable")
        us, cs = pu[o], conv[o]
        new = np.ones(len(us), bool)
        new[1:] = us[1:] != us[:-1]
        st_ = np.nonzero(new)[0]
        return pd.DataFrame({
            "user_id": us[st_],
            "n_targets": np.diff(np.append(st_, len(us)))
            .astype(np.int64),
            "n_converted": np.add.reduceat(cs, st_)})

    return int_part_map(ds.map_batches(prep, batch_format="pyarrow"),
                        "u", per_partition, num_partitions=32)


def login_streaks(ds, user_col: str = "user_id", ts_col: str = "ts"):
    """Longest run of CONSECUTIVE active days per user — the
    engagement-streak classic (SQL: the day-minus-row_number
    gaps-and-islands trick). Days are exact integer epoch-day floors;
    no floats. Returns a Dataset (user_id, longest_streak).

    Scale shape: ONE raw-task exchange keyed by user; the kernel
    reduces to distinct (user, day) pairs, breaks runs where the day
    step != 1, and folds run lengths to a per-user max with two
    reduceat passes — no per-user loop; O(users) rows leave the
    partitions."""
    import pandas as pd

    from .shuffles import int_part_map

    def prep(t: pa.Table) -> pa.Table:
        u = t.column(user_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ts = t.column(ts_col).to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        day = ts // 86_400_000_000
        # per-batch distinct (user, day) combiner
        pairs = np.unique(np.stack([u, day], axis=1), axis=0)
        return pa.table({"u": pa.array(pairs[:, 0]),
                         "day": pa.array(pairs[:, 1])})

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        z = np.array([], np.int64)
        if not len(df):
            return pd.DataFrame({"user_id": z, "longest_streak": z})
        pairs = np.unique(np.stack(
            [df["u"].to_numpy(np.int64),
             df["day"].to_numpy(np.int64)], axis=1), axis=0)
        u, day = pairs[:, 0], pairs[:, 1]
        n = len(u)
        run_start = np.ones(n, bool)
        run_start[1:] = (u[1:] != u[:-1]) | (day[1:] - day[:-1] != 1)
        rs = np.nonzero(run_start)[0]
        run_len = np.diff(np.append(rs, n)).astype(np.int64)
        run_u = u[rs]
        user_start = np.ones(len(run_u), bool)
        user_start[1:] = run_u[1:] != run_u[:-1]
        us = np.nonzero(user_start)[0]
        return pd.DataFrame({
            "user_id": run_u[us],
            "longest_streak": np.maximum.reduceat(run_len, us)})

    return int_part_map(ds.map_batches(prep, batch_format="pyarrow"),
                        "u", per_partition, num_partitions=32)


def sliding_distinct_users(ds, ts_col: str = "ts",
                           user_col: str = "user_id",
                           size_minutes: int = 60,
                           hop_minutes: int = 30):
    """Distinct users per sliding (hopping) event-time window — the
    cardinality sibling of sliding_window_counts (counting EVENTS is
    a sum; counting USERS needs distinctness across the window, so
    the combiner ships per-batch-distinct (window, user) pairs and
    ONE groupby counts them). Returns (window_start, n_users).

    Scale shape: each event explodes into its size/hop windows inside
    map_batches, the batch reduces to distinct (window, user) pairs
    (the combiner — shuffle volume is window-users, not events), then
    one grouped count. Exact, no sketch (HLL is the documented
    approximate path when window-user pairs stop fitting)."""
    from ray.data.aggregate import Count

    assert size_minutes % hop_minutes == 0
    k = size_minutes // hop_minutes
    hop_us = hop_minutes * 60 * 1_000_000

    def explode(t: pa.Table) -> pa.Table:
        ts = t.column(ts_col).cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        u = t.column(user_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        hops = ts // hop_us
        win = np.concatenate([(hops - j) * hop_us for j in range(k)])
        uu = np.concatenate([u] * k)
        pairs = np.unique(np.stack([win, uu], axis=1), axis=0)
        return pa.table({
            "window_start": pa.array(pairs[:, 0])
            .cast(pa.timestamp("us")),
            "u": pa.array(pairs[:, 1])})

    return ds.map_batches(explode, batch_format="pyarrow") \
        .groupby(["window_start", "u"]).aggregate(
            Count(alias_name="dup")) \
        .groupby("window_start").aggregate(
            Count(alias_name="n_users")) \
        .select_columns(["window_start", "n_users"])


def time_weighted_avg(ds, user_col: str = "user_id", ts_col: str = "ts",
                      id_col: str = "event_id", val_col: str = "value",
                      scale: int = 100):
    """Per-user TIME-weighted average of a cent-quantized measure —
    the TWAP/telemetry-gauge aggregate (each value holds until the
    next event; the last event has no duration and is excluded) with
    a BIT-EXACT SQL twin: values quantize to integers via
    ``rint(value·scale)`` (one shared IEEE multiply + round on both
    sides), so the numerator Σ v_int·Δt_us and denominator Σ Δt_us
    are EXACT integers in any fold order and the only float is ONE
    final division num / (den·scale). Users with a single event emit
    nothing (no covered time). Returns (user_id, dur_us, twap) sorted
    within partitions by user.

    Scale shape: ONE raw-task exchange keyed by user (the
    session_stats shape); the partition kernel lexsorts once, takes
    within-user forward deltas, and reduces per user with integer
    ``np.add.reduceat`` over contiguous groups — O(users) rows leave
    the partitions, no driver loop."""
    import pandas as pd

    from .shuffles import int_part_map

    def prep(t: pa.Table) -> pa.Table:
        u = t.column(user_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ts = t.column(ts_col).to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        oc = t.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        v = np.rint(t.column(val_col).to_numpy(zero_copy_only=False)
                    .astype(np.float64) * scale).astype(np.int64)
        return pa.table({"u": pa.array(u), "ts": pa.array(ts),
                         "oc": pa.array(oc), "v": pa.array(v)})

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        z = np.array([], np.int64)
        if not len(df):
            return pd.DataFrame({"user_id": z, "dur_us": z,
                                 "twap": np.array([], np.float64)})
        u = df["u"].to_numpy(np.int64)
        ts = df["ts"].to_numpy(np.int64)
        oc = df["oc"].to_numpy(np.int64)
        v = df["v"].to_numpy(np.int64)
        order = np.lexsort((oc, ts, u))
        u, ts, v = u[order], ts[order], v[order]
        same = u[1:] == u[:-1]
        dt = (ts[1:] - ts[:-1])[same]
        uu = u[:-1][same]
        vv = v[:-1][same]
        if not len(uu):
            return pd.DataFrame({"user_id": z, "dur_us": z,
                                 "twap": np.array([], np.float64)})
        st = np.flatnonzero(np.concatenate(
            ([True], uu[1:] != uu[:-1])))
        den = np.add.reduceat(dt, st)
        num = np.add.reduceat(vv * dt, st)
        return pd.DataFrame({
            "user_id": uu[st], "dur_us": den,
            "twap": num.astype(np.float64)
            / (den * scale).astype(np.float64)})

    return int_part_map(ds.map_batches(prep, batch_format="pyarrow"),
                        "u", per_partition, num_partitions=32)


def ewma_per_user(ds, user_col: str = "user_id", ts_col: str = "ts",
                  id_col: str = "event_id", val_col: str = "value",
                  alpha: float = 0.125):
    """Per-row exponentially-weighted moving average of each user's
    value stream (s₁ = x₁; sₖ = α·xₖ + (1−α)·sₖ₋₁) — the classic
    smoothing/anomaly-baseline op, BIT-EXACT against a recursive-CTE
    twin because both sides take the SAME three IEEE ops per step
    (mul, mul, add — ``alpha`` must be dyadic so (1−α) is exact) in
    the same recurrence order. Returns (user_id, event_id, ewma), one
    row per input event.

    Scale shape: ONE raw-task exchange keyed by user; the recurrence
    is inherently sequential PER USER, so the kernel vectorizes
    ACROSS users instead — rows sort by (seq-within-user, user) and
    the step loop updates every user's accumulator at once (step
    count = the partition's longest stream, each step one fused numpy
    expression over its users). No per-row Python loop."""
    import pandas as pd

    from .shuffles import int_part_map

    a = float(alpha)
    b = 1.0 - a

    def prep(t: pa.Table) -> pa.Table:
        u = t.column(user_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ts = t.column(ts_col).to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        oc = t.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        v = t.column(val_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({"u": pa.array(u), "ts": pa.array(ts),
                         "oc": pa.array(oc), "v": pa.array(v)})

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        z = np.array([], np.int64)
        if not len(df):
            return pd.DataFrame({"user_id": z, "event_id": z,
                                 "ewma": np.array([], np.float64)})
        u = df["u"].to_numpy(np.int64)
        ts = df["ts"].to_numpy(np.int64)
        oc = df["oc"].to_numpy(np.int64)
        v = df["v"].to_numpy(np.float64)
        order = np.lexsort((oc, ts, u))
        u, ts, oc, v = u[order], ts[order], oc[order], v[order]
        n = len(u)
        # seq index within user (contiguous groups after the sort)
        brk = np.ones(n, np.int64)
        brk[1:] = (u[1:] != u[:-1]).astype(np.int64)
        starts = np.flatnonzero(brk)
        base = np.repeat(np.arange(len(starts)), np.diff(
            np.append(starts, n)))
        seq = np.arange(n) - starts[base]
        uidx = base                      # dense per-partition user index
        step_order = np.lexsort((uidx, seq))
        s_acc = np.empty(len(starts), np.float64)
        out = np.empty(n, np.float64)
        k = 0
        max_seq = int(seq.max()) + 1
        counts = np.bincount(seq[step_order], minlength=max_seq)
        pos = 0
        for k in range(max_seq):
            sel = step_order[pos:pos + counts[k]]
            pos += counts[k]
            ui = uidx[sel]
            if k == 0:
                s_acc[ui] = v[sel]
            else:
                s_acc[ui] = a * v[sel] + b * s_acc[ui]
            out[sel] = s_acc[ui]
        return pd.DataFrame({"user_id": u, "event_id": oc,
                             "ewma": out})

    return int_part_map(ds.map_batches(prep, batch_format="pyarrow"),
                        "u", per_partition, num_partitions=32)


def resample_linear(ds, user_col: str = "user_id", ts_col: str = "ts",
                    value_col: str = "value",
                    order_col: str = "event_id"):
    """Per-user hourly LINEAR-interpolation resampling: one row per
    exact hour boundary inside [first event, last event], with the
    value interpolated between the surrounding events — the
    gap-fill sibling of resample_ffill for continuous gauges.
    Same-timestamp duplicates reduce to the largest ``order_col``
    first (a total order), so neighbors are unique. BIT-EXACT: the
    fraction (h−t₀)/(t₁−t₀) is ONE division of exact integer
    microseconds and the interpolation v₀ + (v₁−v₀)·frac is the same
    three IEEE ops in the same order as the oracle; a grid point
    hitting an event exactly copies its value.

    Scale shape: ONE keyed exchange (the resample_ffill shape); the
    kernel sorts each user's history once and fills the whole grid
    with two vectorized searchsorteds. Output is O(user-hours),
    emitted from the partitions. Returns (user_id, hour_us, v)."""
    import pandas as pd

    from .shuffles import int_part_map

    US_H = 3_600_000_000

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "u": t.column(user_col).cast(pa.int64()),
            "ts": pa.array(t.column(ts_col)
                           .to_numpy(zero_copy_only=False)
                           .astype("datetime64[us]").astype(np.int64)),
            "oc": t.column(order_col).cast(pa.int64()),
            "v": t.column(value_col).cast(pa.float64())})

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"u": np.array([], np.int64),
                                 "hour_us": np.array([], np.int64),
                                 "v": np.array([], np.float64)})
        u = df["u"].to_numpy(np.int64)
        ts = df["ts"].to_numpy(np.int64)
        oc = df["oc"].to_numpy(np.int64)
        v = df["v"].to_numpy(np.float64)
        order = np.lexsort((oc, ts, u))
        u, ts, v = u[order], ts[order], v[order]
        # dedupe exact timestamps per user: keep the largest oc (last)
        last = np.ones(len(u), bool)
        last[:-1] = (u[1:] != u[:-1]) | (ts[1:] != ts[:-1])
        u, ts, v = u[last], ts[last], v[last]
        starts = np.concatenate(
            ([0], np.flatnonzero(u[1:] != u[:-1]) + 1, [len(u)]))
        out_u, out_h, out_v = [], [], []
        for s, e in zip(starts[:-1], starts[1:]):
            t0 = -(-ts[s] // US_H) * US_H        # ceil to hour
            t1 = (ts[e - 1] // US_H) * US_H      # floor to hour
            if t1 < t0:
                continue
            hours = np.arange(t0, t1 + US_H, US_H)
            seg_t, seg_v = ts[s:e], v[s:e]
            il = np.searchsorted(seg_t, hours, side="right") - 1
            ir = np.searchsorted(seg_t, hours, side="left")
            tl, tr = seg_t[il], seg_t[ir]
            vl, vr = seg_v[il], seg_v[ir]
            frac = (hours - tl).astype(np.float64) \
                / np.where(tr == tl, 1, tr - tl).astype(np.float64)
            val = np.where(tl == tr, vl, vl + (vr - vl) * frac)
            out_u.append(np.full(len(hours), u[s]))
            out_h.append(hours)
            out_v.append(val)
        if not out_u:
            return pd.DataFrame({"u": np.array([], np.int64),
                                 "hour_us": np.array([], np.int64),
                                 "v": np.array([], np.float64)})
        return pd.DataFrame({"u": np.concatenate(out_u),
                             "hour_us": np.concatenate(out_h),
                             "v": np.concatenate(out_v)})

    out = int_part_map(ds.map_batches(prep, batch_format="pyarrow"),
                       "u", per_partition, num_partitions=32)

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t.column("u"),
                         "hour_us": t.column("hour_us"),
                         "v": t.column("v")})

    return out.map_batches(rename, batch_format="pyarrow")


def rolling_median_per_key(ds, key_col: str = "user_id",
                           ts_col: str = "ts",
                           order_col: str = "event_id",
                           value_col: str = "value", window: int = 7):
    """Per-key rolling DISCRETE median over the last ``window`` rows
    (ROWS window−1 PRECEDING .. CURRENT ROW in (ts, order) order) —
    the robust running-baseline next to rolling_mean. Median uses
    quantile_disc semantics (sorted[ceil(n/2)−1]), so every output
    VALUE IS one of the inputs, copied not combined — float-exact
    with no arithmetic at all. Returns (key, order, med).

    Scale shape: ONE keyed exchange; full windows evaluate as one
    numpy sort over a strided sliding-window view (no per-row
    Python); only each key's first window−1 ramp-up rows take the
    short per-row partial-window path."""
    import pandas as pd

    from .shuffles import int_part_map

    w = int(window)

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "k": t.column(key_col).cast(pa.int64()),
            "ts": pa.array(t.column(ts_col)
                           .to_numpy(zero_copy_only=False)
                           .astype("datetime64[us]").astype(np.int64)),
            "oc": t.column(order_col).cast(pa.int64()),
            "v": t.column(value_col).cast(pa.float64())})

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"key": np.array([], np.int64),
                                 "order_id": np.array([], np.int64),
                                 "med": np.array([], np.float64)})
        k = df["k"].to_numpy(np.int64)
        ts = df["ts"].to_numpy(np.int64)
        oc = df["oc"].to_numpy(np.int64)
        v = df["v"].to_numpy(np.float64)
        order = np.lexsort((oc, ts, k))
        k, oc, v = k[order], oc[order], v[order]
        med = np.empty(len(k), np.float64)
        starts = np.concatenate(
            ([0], np.flatnonzero(k[1:] != k[:-1]) + 1, [len(k)]))
        full_mid = -(-w // 2) - 1              # ceil(w/2) - 1
        for s, e in zip(starts[:-1], starts[1:]):
            seg = v[s:e]
            ramp = min(w - 1, len(seg))
            for i in range(ramp):              # partial windows
                n = i + 1
                med[s + i] = np.sort(seg[:n])[-(-n // 2) - 1]
            if len(seg) >= w:
                sw = np.lib.stride_tricks.sliding_window_view(seg, w)
                med[s + w - 1:e] = np.sort(sw, axis=1)[:, full_mid]
        return pd.DataFrame({"key": k, "order_id": oc, "med": med})

    return int_part_map(ds.map_batches(prep, batch_format="pyarrow"),
                        "k", per_partition, num_partitions=32)


def user_paths(ds, user_col: str = "user_id", ts_col: str = "ts",
               id_col: str = "event_id", step_col: str = "event_type",
               k: int = 3, sep: str = ">"):
    """Top-of-journey path analysis: each user's first ``k`` steps in
    (ts, id) order joined with ``sep``, counted across users — the
    Sankey/flow primitive behind every funnel dashboard. Pure string
    assembly + integer counts — hash-exact. Returns a 1-partition
    Dataset (path, n) sorted by (n desc, path).

    Scale shape: ONE user-keyed exchange; the kernel takes each
    co-located user's first k rows (vectorized segment slice) and
    pre-counts paths per partition, so the driver merges
    O(|step alphabet|^k) partials, never user rows."""
    import pandas as pd

    from .shuffles import int_part_map

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "u": t.column(user_col).cast(pa.int64()),
            "ts": pa.array(t.column(ts_col)
                           .to_numpy(zero_copy_only=False)
                           .astype("datetime64[us]").astype(np.int64)),
            "oc": t.column(id_col).cast(pa.int64()),
            "s": t.column(step_col).cast(pa.string())})

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"path": np.array([], object),
                                 "n": np.array([], np.int64)})
        u = df["u"].to_numpy(np.int64)
        ts = df["ts"].to_numpy(np.int64)
        oc = df["oc"].to_numpy(np.int64)
        s = df["s"].to_numpy(object)
        order = np.lexsort((oc, ts, u))
        u, s = u[order], s[order]
        starts = np.flatnonzero(np.concatenate(([True],
                                                u[1:] != u[:-1])))
        base = np.repeat(np.arange(len(starts)),
                         np.diff(np.append(starts, len(u))))
        seq = np.arange(len(u)) - starts[base]
        head = seq < k
        from collections import Counter
        c: Counter = Counter()
        hu, hs = u[head], s[head]
        st = np.flatnonzero(np.concatenate(([True],
                                            hu[1:] != hu[:-1])))
        ed = np.append(st[1:], len(hu))
        for a, b in zip(st, ed):
            c[sep.join(hs[a:b])] += 1
        paths = sorted(c)
        return pd.DataFrame({"path": np.asarray(paths, object),
                             "n": np.asarray([c[p] for p in paths],
                                             np.int64)})

    parts = int_part_map(ds.map_batches(prep, batch_format="pyarrow"),
                         "u", per_partition, num_partitions=32)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"path": np.array([], object),
                                 "n": np.array([], np.int64)})
        g = df.groupby("path", sort=True)["n"].sum()
        out = g.reset_index().sort_values(
            ["n", "path"], ascending=[False, True],
            kind="mergesort").reset_index(drop=True)
        out["n"] = out["n"].astype(np.int64)
        return out

    def zero_key(t: pa.Table) -> pa.Table:
        return t.append_column(
            "z", pa.array(np.zeros(t.num_rows, np.int64)))

    return int_part_map(parts.map_batches(zero_key,
                                          batch_format="pyarrow"),
                        "z", final, num_partitions=1)


def autocorr_lag1(ds, user_col: str = "user_id", ts_col: str = "ts",
                  id_col: str = "event_id", val_col: str = "value",
                  scale: int = 100):
    """Per-user lag-1 autocorrelation of the cent-quantized value
    stream — Pearson r over consecutive (xᵢ, xᵢ₊₁) pairs in (ts, id)
    order, the is-this-series-sticky statistic. BIT-EXACT: every
    sufficient statistic (n, Sx, Sy, Sxy, Sxx, Syy) is an exact
    integer (the welch_ttest/ols precedent), the only floats are two
    correctly-rounded sqrts and ONE division. Users whose pair count
    or variance is degenerate emit nothing (the oracle's WHERE
    mirrors it). Returns (user_id, n_pairs, r1).

    Scale shape: ONE user-keyed exchange; the kernel lexsorts once,
    forms within-user consecutive pairs vectorized, and reduces the
    six sums per user with integer reduceat — O(users) rows out."""
    import pandas as pd

    from .shuffles import int_part_map

    def prep(t: pa.Table) -> pa.Table:
        u = t.column(user_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ts = t.column(ts_col).to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        oc = t.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        v = np.rint(t.column(val_col).to_numpy(zero_copy_only=False)
                    .astype(np.float64) * scale).astype(np.int64)
        return pa.table({"u": pa.array(u), "ts": pa.array(ts),
                         "oc": pa.array(oc), "v": pa.array(v)})

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        z = np.array([], np.int64)
        emptyf = pd.DataFrame({"user_id": z, "n_pairs": z,
                               "r1": np.array([], np.float64)})
        if not len(df):
            return emptyf
        u = df["u"].to_numpy(np.int64)
        ts = df["ts"].to_numpy(np.int64)
        oc = df["oc"].to_numpy(np.int64)
        v = df["v"].to_numpy(np.int64)
        order = np.lexsort((oc, ts, u))
        u, v = u[order], v[order]
        same = u[1:] == u[:-1]
        x = v[:-1][same]
        y = v[1:][same]
        uu = u[:-1][same]
        if not len(uu):
            return emptyf
        st = np.flatnonzero(np.concatenate(([True],
                                            uu[1:] != uu[:-1])))
        nn = np.diff(np.append(st, len(uu)))
        sx = np.add.reduceat(x, st)
        sy = np.add.reduceat(y, st)
        sxy = np.add.reduceat(x * y, st)
        sxx = np.add.reduceat(x * x, st)
        syy = np.add.reduceat(y * y, st)
        out_u, out_n, out_r = [], [], []
        for i in range(len(st)):
            n, a, b2 = int(nn[i]), int(sx[i]), int(sy[i])
            da = n * int(sxx[i]) - a * a
            db = n * int(syy[i]) - b2 * b2
            if da <= 0 or db <= 0:
                continue
            num = n * int(sxy[i]) - a * b2
            import math
            out_u.append(int(uu[st[i]]))
            out_n.append(n)
            out_r.append(float(num) / (math.sqrt(float(da))
                                       * math.sqrt(float(db))))
        return pd.DataFrame({
            "user_id": np.asarray(out_u, np.int64),
            "n_pairs": np.asarray(out_n, np.int64),
            "r1": np.asarray(out_r, np.float64)})

    return int_part_map(ds.map_batches(prep, batch_format="pyarrow"),
                        "u", per_partition, num_partitions=32)


def window_funnel(ds, stages: tuple = ("view", "click", "purchase"),
                  window_minutes: float = 120.0,
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type"):
    """Time-bounded ordered funnel level per user (the windowFunnel
    shape): the deepest stage prefix reachable with strictly
    increasing timestamps, ALL within ``window_minutes`` of the
    chain's first event. Greedy earliest-next-step search — provably
    optimal for this window-of-first variant (taking the earliest
    next stage only enlarges what remains reachable), so the result
    equals the oracle's EXISTS-any-chain semantics. Integer-µs
    compares only — hash-exact. Returns (user_id, level), level 0
    when the user lacks even stage one.

    Scale shape: ONE user-keyed exchange; the kernel sorts per-stage
    timestamp arrays once per user and walks the chain with
    searchsorted probes per candidate first-stage event — O(events
    of stage one) probes, vectorized within each user."""
    import pandas as pd

    from .shuffles import int_part_map

    w_us = int(round(window_minutes * 60.0 * 1e6))
    n_stages = len(stages)
    stage_idx = {s: i for i, s in enumerate(stages)}

    def prep(t: pa.Table) -> pa.Table:
        keys = np.asarray([stage_idx.get(str(x), -1) for x in
                           t.column(type_col).to_pylist()], np.int64)
        keep = keys >= 0
        u = t.column(user_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)[keep]
        ts = t.column(ts_col).to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)[keep]
        return pa.table({"u": pa.array(u), "ts": pa.array(ts),
                         "sg": pa.array(keys[keep])})

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        z = np.array([], np.int64)
        if not len(df):
            return pd.DataFrame({"user_id": z, "level": z})
        u = df["u"].to_numpy(np.int64)
        ts = df["ts"].to_numpy(np.int64)
        sg = df["sg"].to_numpy(np.int64)
        order = np.lexsort((ts, sg, u))
        u, ts, sg = u[order], ts[order], sg[order]
        out_u, out_l = [], []
        starts = np.concatenate(
            ([0], np.flatnonzero(u[1:] != u[:-1]) + 1, [len(u)]))
        for s, e in zip(starts[:-1], starts[1:]):
            per_stage = [ts[s:e][sg[s:e] == i]
                         for i in range(n_stages)]
            lvl = 0
            if len(per_stage[0]):
                lvl = 1
                # vectorized over stage-one candidates
                cur = per_stage[0].copy()
                first = per_stage[0]
                alive = np.ones(len(cur), bool)
                for nxt in range(1, n_stages):
                    arr = per_stage[nxt]
                    if not len(arr) or not alive.any():
                        break
                    pos = np.searchsorted(arr, cur[alive],
                                          side="right")
                    ok = pos < len(arr)
                    t_next = np.where(ok, arr[np.clip(pos, 0,
                                                      len(arr) - 1)],
                                      0)
                    ok &= t_next <= first[alive] + w_us
                    if not ok.any():
                        break
                    lvl = nxt + 1
                    na = np.zeros(len(cur), bool)
                    idx_alive = np.flatnonzero(alive)
                    na[idx_alive[ok]] = True
                    cur[na] = t_next[ok]
                    alive = na
            out_u.append(int(u[s]))
            out_l.append(lvl)
        return pd.DataFrame({"user_id": np.asarray(out_u, np.int64),
                             "level": np.asarray(out_l, np.int64)})

    return int_part_map(ds.map_batches(prep, batch_format="pyarrow"),
                        "u", per_partition, num_partitions=32)


def max_concurrency(ds, user_col: str = "user_id", ts_col: str = "ts",
                    id_col: str = "event_id",
                    minutes_expr=lambda oc: 1 + oc % 20):
    """Maximum number of simultaneously-open intervals per user —
    the peak-concurrency sweep over the same variable-length
    half-open intervals interval_union merges ([ts, ts + (1+id%20)
    min)): sort the ±1 boundary events by (time, delta) with closes
    (−1) before opens at equal instants (half-open ⇒ no overlap at
    the boundary), take the running-sum maximum. Pure integer
    arithmetic — hash-exact. Returns (user_id, max_open).

    Scale shape: ONE user-keyed exchange; the kernel is one lexsort +
    segmented cumsum/max over 2×events rows — O(users) rows out."""
    import pandas as pd

    from .shuffles import int_part_map

    def prep(t: pa.Table) -> pa.Table:
        u = t.column(user_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ts = t.column(ts_col).to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        oc = t.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        dur = (minutes_expr(oc) * 60_000_000).astype(np.int64)
        return pa.table({
            "u": pa.array(np.concatenate([u, u])),
            "t": pa.array(np.concatenate([ts, ts + dur])),
            "d": pa.array(np.concatenate(
                [np.ones(len(u), np.int64),
                 -np.ones(len(u), np.int64)]))})

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        z = np.array([], np.int64)
        if not len(df):
            return pd.DataFrame({"user_id": z, "max_open": z})
        u = df["u"].to_numpy(np.int64)
        t = df["t"].to_numpy(np.int64)
        d = df["d"].to_numpy(np.int64)
        order = np.lexsort((d, t, u))      # -1 before +1 at equal t
        u, d = u[order], d[order]
        csum = np.cumsum(d)
        starts = np.flatnonzero(np.concatenate(([True],
                                                u[1:] != u[:-1])))
        base = np.repeat(np.where(starts > 0,
                                  csum[np.maximum(starts - 1, 0)],
                                  0) * (starts > 0),
                         np.diff(np.append(starts, len(u))))
        open_n = csum - base
        mx = np.maximum.reduceat(open_n, starts)
        return pd.DataFrame({"user_id": u[starts],
                             "max_open": mx.astype(np.int64)})

    return int_part_map(ds.map_batches(prep, batch_format="pyarrow"),
                        "u", per_partition, num_partitions=32)


def ohlc_bars(ds, key_col: str = "event_type", ts_col: str = "ts",
              id_col: str = "event_id", val_col: str = "value",
              bar_us: int = 3_600_000_000, scale: int = 100):
    """Per-(key, time-bar) OHLC candle + volume — the market-data /
    telemetry downsampling aggregate (reference analogue: the metrics
    rollups the dashboard charts aggregate per interval,
    web-crawler-backend summaries; here generalized to the standard
    open/high/low/close bar). BIT-EXACT SQL twin: open/close COPY the
    value at the min/max ``(ts, id)`` row of the bar (values are never
    combined, so no float-fold ordering), high/low are min/max copies,
    and volume folds as exact integer cents (``rint(value·scale)`` —
    the time_weighted_avg quantization convention) finished by ONE
    division.

    Scale shape: map-side combiner — each batch reduces itself to one
    row per (key, bar) with numpy ``reduceat`` over the lexsorted
    block, then ONE ``groupby(key, bar)`` merge re-extremizes
    O(blocks × bars) partial rows. No per-row shuffle; bars stream out
    of the merge. Returns (key, bar_ts, px_open, px_high, px_low,
    px_close, n_events, volume) with bar_ts = epoch-µs of bar start."""
    def partial(t: pa.Table) -> pa.Table:
        k = np.asarray(t.column(key_col).to_pandas())
        ts = t.column(ts_col).to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        eid = t.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        v = t.column(val_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        cents = np.rint(v * scale).astype(np.int64)
        bar = (ts // bar_us) * bar_us
        uk, kinv = np.unique(k, return_inverse=True)
        order = np.lexsort((eid, ts, bar, kinv))
        ki, b = kinv[order], bar[order]
        tss, ei = ts[order], eid[order]
        vv, cc = v[order], cents[order]
        brk = np.concatenate(([True],
                              (ki[1:] != ki[:-1]) | (b[1:] != b[:-1])))
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], len(ki)) - 1
        return pa.table({
            key_col: pa.array(uk[ki[starts]]),
            "bar_ts": pa.array(b[starts], pa.int64()),
            "o_ts": pa.array(tss[starts], pa.int64()),
            "o_id": pa.array(ei[starts], pa.int64()),
            "px_open": pa.array(vv[starts], pa.float64()),
            "c_ts": pa.array(tss[ends], pa.int64()),
            "c_id": pa.array(ei[ends], pa.int64()),
            "px_close": pa.array(vv[ends], pa.float64()),
            "px_high": pa.array(np.maximum.reduceat(vv, starts)),
            "px_low": pa.array(np.minimum.reduceat(vv, starts)),
            "n_events": pa.array(
                np.diff(np.append(starts, len(ki))), pa.int64()),
            "cents": pa.array(np.add.reduceat(cc, starts), pa.int64()),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        go = g.sort_values(["o_ts", "o_id"], kind="mergesort").iloc[0]
        gc = g.sort_values(["c_ts", "c_id"], kind="mergesort").iloc[-1]
        return pd.DataFrame({
            key_col: [go[key_col]],
            "bar_ts": [np.int64(go["bar_ts"])],
            "px_open": [go["px_open"]],
            "px_high": [g["px_high"].max()],
            "px_low": [g["px_low"].min()],
            "px_close": [gc["px_close"]],
            "n_events": [np.int64(g["n_events"].sum())],
            "volume": [float(g["cents"].sum()) / float(scale)],
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby([key_col, "bar_ts"])
              .map_groups(merge, batch_format="pandas"))


def cusum_per_user(ds, user_col: str = "user_id", ts_col: str = "ts",
                   id_col: str = "event_id", val_col: str = "value",
                   target: float = 55.0, threshold: float = 250.0):
    """Per-row one-sided CUSUM drift statistic of each user's value
    stream (s₁ = max(0, x₁−target); sₖ = max(0, sₖ₋₁ + (xₖ−target)))
    with an alarm flag when the statistic crosses ``threshold`` — the
    classic sequential changepoint / anomaly-onset detector (Page
    1954). BIT-EXACT against a recursive-CTE twin: each step is the
    SAME three IEEE ops in the same order on both sides (sub, add,
    max — max/greatest are exact selections).

    Scale shape: ONE raw-task exchange keyed by user (the
    ewma_per_user skeleton); the recurrence is sequential PER USER so
    the kernel vectorizes ACROSS users — the step loop advances every
    user's accumulator at once, step count = the partition's longest
    stream. Returns (user_id, event_id, cusum, alarm∈{0,1})."""
    from .shuffles import int_part_map

    tgt = float(target)
    thr = float(threshold)

    def prep(t: pa.Table) -> pa.Table:
        u = t.column(user_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ts = t.column(ts_col).to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        oc = t.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        v = t.column(val_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({"u": pa.array(u), "ts": pa.array(ts),
                         "oc": pa.array(oc), "v": pa.array(v)})

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        z = np.array([], np.int64)
        if not len(df):
            return pd.DataFrame({"user_id": z, "event_id": z,
                                 "cusum": np.array([], np.float64),
                                 "alarm": z})
        u = df["u"].to_numpy(np.int64)
        ts = df["ts"].to_numpy(np.int64)
        oc = df["oc"].to_numpy(np.int64)
        v = df["v"].to_numpy(np.float64)
        order = np.lexsort((oc, ts, u))
        u, ts, oc, v = u[order], ts[order], oc[order], v[order]
        n = len(u)
        brk = np.ones(n, np.int64)
        brk[1:] = (u[1:] != u[:-1]).astype(np.int64)
        starts = np.flatnonzero(brk)
        base = np.repeat(np.arange(len(starts)),
                         np.diff(np.append(starts, n)))
        seq = np.arange(n) - starts[base]
        uidx = base
        step_order = np.lexsort((uidx, seq))
        s_acc = np.zeros(len(starts), np.float64)
        out = np.empty(n, np.float64)
        max_seq = int(seq.max()) + 1
        counts = np.bincount(seq[step_order], minlength=max_seq)
        pos = 0
        for k in range(max_seq):
            sel = step_order[pos:pos + counts[k]]
            pos += counts[k]
            ui = uidx[sel]
            s_acc[ui] = np.maximum(0.0, s_acc[ui] + (v[sel] - tgt))
            out[sel] = s_acc[ui]
        return pd.DataFrame({"user_id": u, "event_id": oc,
                             "cusum": out,
                             "alarm": (out > thr).astype(np.int64)})

    return int_part_map(ds.map_batches(prep, batch_format="pyarrow"),
                        "u", per_partition, num_partitions=32)


def late_data_stats(ds, ts_col: str = "ts", id_col: str = "event_id",
                    type_col: str = "event_type",
                    delay_us: int = 600_000_000, bucket: int = 4096):
    """Watermark late-data accounting — the streaming-ingestion audit:
    events arrive in ``id_col`` order, the low watermark trails the
    running max event-time by ``delay_us``, and an event is LATE iff
    its event-time is older than the watermark at its arrival
    (``t_i + delay < max(t_j : id_j < id_i)``). Returns per-type
    (event_type, n_events, n_late). All-integer µs — exact.

    Scale shape: a global prefix-scan done as two passes (the
    attr_last_touch segmented-scan idiom): pass 1 reduces each batch
    to per-arrival-bucket max event-times (pure combiner, driver folds
    O(buckets) rows and computes the exclusive prefix max across
    buckets); pass 2 is ONE bucket-keyed exchange where each bucket
    applies its broadcast carry-in plus an in-bucket grouped exclusive
    cummax (C-level pandas), then reduces itself to per-type counts —
    one tiny groupby merge finishes. ``bucket`` auto-widens so the
    carry table stays ≤64k entries regardless of input size."""
    from ray.data.aggregate import Sum

    from .shuffles import int_part_map

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "eid": t.column(id_col).cast(pa.int64()),
            "t": pa.array(t.column(ts_col).to_numpy(zero_copy_only=False)
                          .astype("datetime64[us]").astype(np.int64)),
            "k": t.column(type_col),
        })

    prepped = ds.map_batches(prep, batch_format="pyarrow").materialize()
    max_eid = int(prepped.max("eid"))
    B = max(bucket, -(-(max_eid + 1) // 65536))

    def bmax(t: pa.Table) -> pa.Table:
        eid = t.column("eid").to_numpy(zero_copy_only=False)
        tt = t.column("t").to_numpy(zero_copy_only=False)
        b = eid // B
        ub, inv = np.unique(b, return_inverse=True)
        mx = np.full(len(ub), np.iinfo(np.int64).min, np.int64)
        np.maximum.at(mx, inv, tt)
        return pa.table({"b": pa.array(ub, pa.int64()),
                         "mx": pa.array(mx, pa.int64())})

    rows = [pa.table(x).to_pandas() for x in
            prepped.map_batches(bmax, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")]
    bm = (pd.concat(rows).groupby("b")["mx"].max()
          if rows else pd.Series(dtype=np.int64))
    n_buckets = max_eid // B + 1
    full = np.full(n_buckets, -np.inf)
    if len(bm):
        full[bm.index.to_numpy()] = bm.to_numpy(np.int64).astype(
            np.float64)  # epoch-µs < 2^53: exact in float64
    carry = np.concatenate(([-np.inf],
                            np.maximum.accumulate(full)[:-1]))

    dly = np.int64(delay_us)

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "event_type": np.array([], object),
                "n_events": np.array([], np.int64),
                "n_late": np.array([], np.int64)})
        df = df.sort_values(["b", "eid"], kind="mergesort")
        t = df["t"].to_numpy(np.int64)
        cm = df.groupby("b", sort=False)["t"].cummax()
        excl = cm.groupby(df["b"], sort=False).shift(1).to_numpy()
        wm = np.fmax(np.where(np.isnan(excl), -np.inf, excl),
                     carry[df["b"].to_numpy(np.int64)])
        late = (t + dly).astype(np.float64) < wm
        out = pd.DataFrame({"event_type": df["k"].to_numpy(),
                            "late": late.astype(np.int64)})
        g = out.groupby("event_type", sort=True)
        return pd.DataFrame({
            "event_type": list(g.groups),
            "n_events": g.size().to_numpy(np.int64),
            "n_late": g["late"].sum().to_numpy(np.int64)})

    def add_bucket(t: pa.Table) -> pa.Table:
        eid = t.column("eid").to_numpy(zero_copy_only=False)
        return t.append_column("b", pa.array(eid // B, pa.int64()))

    partials = int_part_map(
        prepped.map_batches(add_bucket, batch_format="pyarrow"),
        "b", per_partition, num_partitions=32)
    return partials.groupby("event_type").aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("n_late", alias_name="n_late"))


def sequence_match(ds, pattern: str, code_map: dict,
                   user_col: str = "user_id", ts_col: str = "ts",
                   id_col: str = "event_id",
                   type_col: str = "event_type"):
    """Event-SEQUENCE pattern matching per user — the
    MATCH_RECOGNIZE / ClickHouse-sequenceMatch shape: each user's
    events order by (ts, id), event types map to single-char codes via
    ``code_map``, and ``pattern`` (a regex over the code string, e.g.
    ``'v.*c.*p'`` = view, later click, later purchase with arbitrary
    gaps) decides the match. Returns (user_id, n_events, matched∈{0,1})
    — the generalization of window_funnel to arbitrary regular
    patterns (no time bound; the SQL twin is ``string_agg(code, ''
    ORDER BY ts, id) ~ pattern``).

    Scale shape: ONE user-keyed exchange (session_stats shape); the
    kernel lexsorts once, slices each user's contiguous code run and
    joins it into one string (O(groups) Python loop — same bounded
    per-group cost class as the textstats heuristics), then applies
    ONE compiled regex per user. Output is O(users), emitted from the
    partitions."""
    import re as _re

    from .shuffles import int_part_map

    rx = _re.compile(pattern)
    cmap = dict(code_map)

    def prep(t: pa.Table) -> pa.Table:
        codes = np.array([cmap.get(x, "?") for x in
                          t.column(type_col).to_pylist()])
        return pa.table({
            "u": t.column(user_col).cast(pa.int64()),
            "ts": pa.array(t.column(ts_col).to_numpy(zero_copy_only=False)
                           .astype("datetime64[us]").astype(np.int64)),
            "oc": t.column(id_col).cast(pa.int64()),
            "c": pa.array(codes),
        })

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        z = np.array([], np.int64)
        if not len(df):
            return pd.DataFrame({"user_id": z, "n_events": z,
                                 "matched": z})
        u = df["u"].to_numpy(np.int64)
        ts = df["ts"].to_numpy(np.int64)
        oc = df["oc"].to_numpy(np.int64)
        c = df["c"].to_numpy()
        order = np.lexsort((oc, ts, u))
        u, c = u[order], c[order]
        starts = np.flatnonzero(np.concatenate(([True],
                                                u[1:] != u[:-1])))
        ends = np.append(starts[1:], len(u))
        users, n_ev, hit = [], [], []
        for s, e in zip(starts, ends):
            users.append(u[s])
            n_ev.append(e - s)
            hit.append(1 if rx.search("".join(c[s:e])) else 0)
        return pd.DataFrame({
            "user_id": np.array(users, np.int64),
            "n_events": np.array(n_ev, np.int64),
            "matched": np.array(hit, np.int64)})

    return int_part_map(ds.map_batches(prep, batch_format="pyarrow"),
                        "u", per_partition, num_partitions=32)


def window_dedup(ds, gap_us: int = 86_400_000_000,
                 user_col: str = "user_id", ts_col: str = "ts",
                 id_col: str = "event_id", type_col: str = "event_type"):
    """Keep-first-in-window dedup / throttle per (user, type): in
    (ts, id) order an event is KEPT iff it is the group's first or at
    least ``gap_us`` after the last KEPT event — the CDC-ingest /
    notification-throttle primitive (state depends on the kept
    predecessor, not the previous row, so this is NOT a lag filter).
    Returns (event_id, kept∈{0,1}) for every input row; all-integer
    µs — exact.

    Scale shape: ONE user-keyed exchange (the ewma skeleton, group =
    (user, type) via within-partition codes); the recurrence is
    sequential PER GROUP so the step loop advances every group's
    last-kept timestamp at once. The oracle steps the identical chain
    in a recursive CTE."""
    from .shuffles import int_part_map

    gap = np.int64(gap_us)

    def prep(t: pa.Table) -> pa.Table:
        codes = np.asarray(t.column(type_col).to_pandas())
        return pa.table({
            "u": t.column(user_col).cast(pa.int64()),
            "ts": pa.array(t.column(ts_col).to_numpy(zero_copy_only=False)
                           .astype("datetime64[us]").astype(np.int64)),
            "oc": t.column(id_col).cast(pa.int64()),
            "c": pa.array(codes),
        })

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        z = np.array([], np.int64)
        if not len(df):
            return pd.DataFrame({"event_id": z, "kept": z})
        u = df["u"].to_numpy(np.int64)
        ts = df["ts"].to_numpy(np.int64)
        oc = df["oc"].to_numpy(np.int64)
        _, ccode = np.unique(df["c"].to_numpy(), return_inverse=True)
        order = np.lexsort((oc, ts, ccode, u))
        u, ts, oc, ccode = u[order], ts[order], oc[order], ccode[order]
        n = len(u)
        brk = np.ones(n, bool)
        brk[1:] = (u[1:] != u[:-1]) | (ccode[1:] != ccode[:-1])
        starts = np.flatnonzero(brk)
        base = np.repeat(np.arange(len(starts)),
                         np.diff(np.append(starts, n)))
        seq = np.arange(n) - starts[base]
        step_order = np.lexsort((base, seq))
        last = np.full(len(starts), np.iinfo(np.int64).min // 4,
                       np.int64)
        kept = np.empty(n, np.int64)
        max_seq = int(seq.max()) + 1
        counts = np.bincount(seq[step_order], minlength=max_seq)
        pos = 0
        for k in range(max_seq):
            sel = step_order[pos:pos + counts[k]]
            pos += counts[k]
            gi = base[sel]
            ok = ts[sel] - last[gi] >= gap
            kept[sel] = ok.astype(np.int64)
            last[gi] = np.where(ok, ts[sel], last[gi])
        return pd.DataFrame({"event_id": oc, "kept": kept})

    return int_part_map(ds.map_batches(prep, batch_format="pyarrow"),
                        "u", per_partition, num_partitions=32)


def holt_linear(ds, alpha: float = 0.25, beta: float = 0.125,
                user_col: str = "user_id", ts_col: str = "ts",
                id_col: str = "event_id", val_col: str = "value"):
    """Per-row HOLT double exponential smoothing of each user's value
    stream (level + trend: l₁ = x₁, b₁ = 0; lₜ = α·xₜ +
    (1−α)·(lₜ₋₁+bₜ₋₁); bₜ = β·(lₜ−lₜ₋₁) + (1−β)·bₜ₋₁) — the
    trend-aware forecasting baseline one notch past ewma_users.
    BIT-EXACT against a recursive-CTE twin: both sides execute the
    identical fixed-operand IEEE op tree per step (dyadic α, β make
    1−α, 1−β exact). Returns (user_id, event_id, level, trend).

    Scale shape: ONE user-keyed exchange (the ewma skeleton); the
    step loop advances every user's (level, trend) pair at once."""
    from .shuffles import int_part_map

    a = float(alpha)
    ca = 1.0 - a
    be = float(beta)
    cb = 1.0 - be

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "u": t.column(user_col).cast(pa.int64()),
            "ts": pa.array(t.column(ts_col).to_numpy(zero_copy_only=False)
                           .astype("datetime64[us]").astype(np.int64)),
            "oc": t.column(id_col).cast(pa.int64()),
            "v": pa.array(t.column(val_col).to_numpy(zero_copy_only=False)
                          .astype(np.float64)),
        })

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        z = np.array([], np.int64)
        f = np.array([], np.float64)
        if not len(df):
            return pd.DataFrame({"user_id": z, "event_id": z,
                                 "level": f, "trend": f})
        u = df["u"].to_numpy(np.int64)
        ts = df["ts"].to_numpy(np.int64)
        oc = df["oc"].to_numpy(np.int64)
        v = df["v"].to_numpy(np.float64)
        order = np.lexsort((oc, ts, u))
        u, ts, oc, v = u[order], ts[order], oc[order], v[order]
        n = len(u)
        brk = np.ones(n, bool)
        brk[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(brk)
        base = np.repeat(np.arange(len(starts)),
                         np.diff(np.append(starts, n)))
        seq = np.arange(n) - starts[base]
        step_order = np.lexsort((base, seq))
        l_acc = np.empty(len(starts), np.float64)
        b_acc = np.empty(len(starts), np.float64)
        lv = np.empty(n, np.float64)
        tr = np.empty(n, np.float64)
        max_seq = int(seq.max()) + 1
        counts = np.bincount(seq[step_order], minlength=max_seq)
        pos = 0
        for k in range(max_seq):
            sel = step_order[pos:pos + counts[k]]
            pos += counts[k]
            gi = base[sel]
            if k == 0:
                l_acc[gi] = v[sel]
                b_acc[gi] = 0.0
            else:
                l_old = l_acc[gi]
                l_new = a * v[sel] + ca * (l_old + b_acc[gi])
                b_acc[gi] = be * (l_new - l_old) + cb * b_acc[gi]
                l_acc[gi] = l_new
            lv[sel] = l_acc[gi]
            tr[sel] = b_acc[gi]
        return pd.DataFrame({"user_id": u, "event_id": oc,
                             "level": lv, "trend": tr})

    return int_part_map(ds.map_batches(prep, batch_format="pyarrow"),
                        "u", per_partition, num_partitions=32)


def freq_cap(ds, cap: int = 3, user_col: str = "user_id",
             ts_col: str = "ts", id_col: str = "event_id",
             type_col: str = "event_type"):
    """Frequency-capping audit: rank every event within its
    (user, type, day) cell by (ts, id) and flag those past the
    ``cap``-th — the ad-serving / notification budget primitive.
    Returns (event_id, rank 1-based, capped∈{0,1}); pure integer
    ranking, no arithmetic.

    Scale shape: ONE user-keyed exchange; one lexsort per partition
    ranks every cell at once via segmented sequence indices (no
    per-group loop)."""
    from .shuffles import int_part_map

    def prep(t: pa.Table) -> pa.Table:
        ts = t.column(ts_col).to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        return pa.table({
            "u": t.column(user_col).cast(pa.int64()),
            "ts": pa.array(ts),
            "day": pa.array(ts // 86_400_000_000),
            "oc": t.column(id_col).cast(pa.int64()),
            "c": t.column(type_col),
        })

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        z = np.array([], np.int64)
        if not len(df):
            return pd.DataFrame({"event_id": z, "rank": z,
                                 "capped": z})
        u = df["u"].to_numpy(np.int64)
        ts = df["ts"].to_numpy(np.int64)
        day = df["day"].to_numpy(np.int64)
        oc = df["oc"].to_numpy(np.int64)
        _, cc = np.unique(df["c"].to_numpy(), return_inverse=True)
        order = np.lexsort((oc, ts, day, cc, u))
        u, day, cc, oc = u[order], day[order], cc[order], oc[order]
        n = len(u)
        brk = np.ones(n, bool)
        brk[1:] = (u[1:] != u[:-1]) | (cc[1:] != cc[:-1]) | \
            (day[1:] != day[:-1])
        starts = np.flatnonzero(brk)
        base = np.repeat(np.arange(len(starts)),
                         np.diff(np.append(starts, n)))
        rank = np.arange(n) - starts[base] + 1
        return pd.DataFrame({"event_id": oc, "rank": rank,
                             "capped": (rank > cap).astype(np.int64)})

    return int_part_map(ds.map_batches(prep, batch_format="pyarrow"),
                        "u", per_partition, num_partitions=32)


def next_event_accuracy(ds, user_col: str = "user_id",
                        ts_col: str = "ts",
                        state_col: str = "event_type",
                        order_col: str = "event_id"):
    """In-sample NEXT-EVENT prediction read-out of the first-order
    Markov model: predict each state's most frequent successor
    (count desc, state asc — deterministic), then score every
    transition against that prediction — the baseline sequence-model
    evaluation next to transition_counts. Per current state:
    (n_trans, n_correct, accuracy = ONE division). Integer counts —
    bit-exact.

    Scale shape: reuses transition_counts (ONE user-keyed exchange,
    O(states²) local counts per partition); the model fit + scoring
    run on the O(states²) count table on the driver — the alphabet,
    not the data."""
    tc = transition_counts(ds, user_col=user_col, ts_col=ts_col,
                           state_col=state_col, order_col=order_col)
    empty = pa.table({state_col: pa.array([], pa.string()),
                      "n_trans": pa.array([], pa.int64()),
                      "n_correct": pa.array([], pa.int64()),
                      "accuracy": pa.array([], pa.float64())})
    cat = tc if isinstance(tc, pa.Table) else pa.concat_tables(
        [pa.table(b) for b in tc.iter_batches(batch_format="pyarrow")])
    if cat.num_rows == 0:
        return empty
    df = cat.to_pandas()
    # counts may arrive as multiple partials per (src, dst)
    df = df.groupby(["src", "dst"], as_index=False)["n"].sum()
    out_k, out_n, out_c, out_a = [], [], [], []
    for cur, g in df.groupby("src"):
        g = g.sort_values(["n", "dst"], ascending=[False, True],
                          kind="mergesort")
        pred = g["dst"].iloc[0]
        n_tot = int(g["n"].sum())
        n_ok = int(g.loc[g["dst"] == pred, "n"].sum())
        out_k.append(cur)
        out_n.append(n_tot)
        out_c.append(n_ok)
        out_a.append(float(n_ok) / float(n_tot))
    return pa.table({state_col: pa.array(out_k, pa.string()),
                     "n_trans": pa.array(out_n, pa.int64()),
                     "n_correct": pa.array(out_c, pa.int64()),
                     "accuracy": pa.array(out_a, pa.float64())})


def bollinger_bands(ds, key_col: str = "user_id", ts_col: str = "ts",
                    order_col: str = "event_id",
                    value_col: str = "value", window: int = 8,
                    n_sigma: float = 2.0, scale: int = 100):
    """Per-key Bollinger bands: rolling mean ± n_sigma · rolling
    POPULATION std over the last ``window`` rows in (ts, order) order
    — the volatility envelope next to rolling_avg/rolling_median,
    BIT-EXACT against SQL because the rolling moments are exact
    integer sums (values scaled to ints; sx, sxx via per-segment
    prefix sums) and the float finish is one fixed op tree mirrored
    verbatim by the oracle:

        ma = sx::D / n::D
        sd = sqrt((n·sxx − sx·sx)::D) / n::D
        band_up = ma + n_sigma·sd ; band_dn = ma − n_sigma·sd

    (sqrt of the non-negative integer variance numerator FIRST, one
    divide after — no intermediate that could differ). Ramp-up rows
    use their partial n, matching ROWS window−1 PRECEDING.

    Scale shape: ONE keyed exchange; per-partition lexsort + two
    cumsum passes, no per-row Python. Returns
    (key, order_id, n_w, ma, band_up, band_dn)."""
    import math

    import pandas as pd

    from .shuffles import int_part_map

    w = int(window)

    def prep(t: pa.Table) -> pa.Table:
        cents = np.rint(t.column(value_col)
                        .to_numpy(zero_copy_only=False)
                        .astype(np.float64) * scale).astype(np.int64)
        return pa.table({
            "k": t.column(key_col).cast(pa.int64()),
            "ts": pa.array(t.column(ts_col)
                           .to_numpy(zero_copy_only=False)
                           .astype("datetime64[us]").astype(np.int64)),
            "oc": t.column(order_col).cast(pa.int64()),
            "c": pa.array(cents)})

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "key": np.array([], np.int64),
                "order_id": np.array([], np.int64),
                "n_w": np.array([], np.int64),
                "ma": np.array([], np.float64),
                "band_up": np.array([], np.float64),
                "band_dn": np.array([], np.float64)})
        k = df["k"].to_numpy(np.int64)
        ts = df["ts"].to_numpy(np.int64)
        oc = df["oc"].to_numpy(np.int64)
        c = df["c"].to_numpy(np.int64)
        order = np.lexsort((oc, ts, k))
        k, oc, c = k[order], oc[order], c[order]
        n_arr = np.empty(len(k), np.int64)
        sx = np.empty(len(k), np.int64)
        sxx = np.empty(len(k), np.int64)
        starts = np.concatenate(
            ([0], np.flatnonzero(k[1:] != k[:-1]) + 1, [len(k)]))
        for s, e in zip(starts[:-1], starts[1:]):
            seg = c[s:e]
            ps = np.concatenate(([0], np.cumsum(seg)))
            ps2 = np.concatenate(([0], np.cumsum(seg * seg)))
            idx = np.arange(len(seg))
            lo = np.maximum(idx - w + 1, 0)
            n_arr[s:e] = idx - lo + 1
            sx[s:e] = ps[idx + 1] - ps[lo]
            sxx[s:e] = ps2[idx + 1] - ps2[lo]
        nf = n_arr.astype(np.float64)
        ma = sx.astype(np.float64) / nf
        var_num = (n_arr * sxx - sx * sx).astype(np.float64)
        sd = np.sqrt(var_num) / nf
        return pd.DataFrame({
            "key": k, "order_id": oc, "n_w": n_arr, "ma": ma,
            "band_up": ma + n_sigma * sd,
            "band_dn": ma - n_sigma * sd})

    return int_part_map(ds, "k", per_partition, prepare=prep)


def sax_paa(ds, key_col: str = "user_id", ts_col: str = "ts",
            order_col: str = "event_id", value_col: str = "value",
            seg_len: int = 8, breakpoints=(2000, 4000, 6000, 8000),
            scale: int = 100):
    """SAX-style symbolic series: per key, the (ts, order)-ordered
    value stream is cut into fixed-length position segments of
    ``seg_len`` rows, each segment reduced to its PAA mean (Piecewise
    Aggregate Approximation) and quantized into a letter against the
    FIXED integer cent ``breakpoints`` (a < b < ... left-inclusive:
    letter i when paa < breakpoints[i], last letter otherwise) — the
    shape-indexing representation for similarity search over series
    (Lin et al.'s SAX, with explicit breakpoints instead of the
    z-normal table so every comparison is an exact-integer or
    exact-division compare, bit-exact vs SQL).

    Scale shape: ONE keyed exchange; per-partition lexsort, segment
    ids from within-key ranks, one reduceat per moment. Returns
    (key, seg_idx, n, paa, sym)."""
    import pandas as pd

    from .shuffles import int_part_map

    w = int(seg_len)
    bps = [int(b) for b in breakpoints]
    letters = [chr(ord("a") + i) for i in range(len(bps) + 1)]

    def prep(t: pa.Table) -> pa.Table:
        cents = np.rint(t.column(value_col)
                        .to_numpy(zero_copy_only=False)
                        .astype(np.float64) * scale).astype(np.int64)
        return pa.table({
            "k": t.column(key_col).cast(pa.int64()),
            "ts": pa.array(t.column(ts_col)
                           .to_numpy(zero_copy_only=False)
                           .astype("datetime64[us]").astype(np.int64)),
            "oc": t.column(order_col).cast(pa.int64()),
            "c": pa.array(cents)})

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "key": np.array([], np.int64),
                "seg_idx": np.array([], np.int64),
                "n": np.array([], np.int64),
                "paa": np.array([], np.float64),
                "sym": np.array([], str)})
        k = df["k"].to_numpy(np.int64)
        ts = df["ts"].to_numpy(np.int64)
        oc = df["oc"].to_numpy(np.int64)
        c = df["c"].to_numpy(np.int64)
        order = np.lexsort((oc, ts, k))
        k, c = k[order], c[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(k[1:] != k[:-1]) + 1))
        runlen = np.diff(np.concatenate((starts, [len(k)])))
        rank = np.arange(len(k)) - np.repeat(starts, runlen)
        seg = rank // w
        change = np.zeros(len(k), bool)
        change[0] = True
        change[1:] = (k[1:] != k[:-1]) | (seg[1:] != seg[:-1])
        ss = np.flatnonzero(change)
        n = np.diff(np.concatenate((ss, [len(k)])))
        sx = np.add.reduceat(c, ss)
        paa = sx.astype(np.float64) / n.astype(np.float64)
        sym_idx = np.searchsorted(np.array(bps, np.float64), paa,
                                  side="right")
        return pd.DataFrame({
            "key": k[ss], "seg_idx": seg[ss], "n": n.astype(np.int64),
            "paa": paa,
            "sym": np.array(letters, dtype=object)[sym_idx]})

    return int_part_map(ds, "k", per_partition, prepare=prep)


def seasonal_decompose(ds, key_col: str = "event_type",
                       ts_col: str = "ts", value_col: str = "value",
                       half_window: int = 2, scale: int = 100):
    """Classical additive seasonal decomposition of per-key hourly
    series: y = trend + seasonal(hour-of-day) + resid — the
    time-series audit primitive (statsmodels' seasonal_decompose
    shape) made BIT-EXACT against SQL by keeping every reduction
    integral or order-fixed:

        y(t)        = hourly pooled mean  = sx/n           (1 division)
        trend(t)    = POOLED centered MA  = (Σ_w sx)/(Σ_w n) over the
                      ±half_window ROWS window (integer window sums ==
                      SQL ROWS BETWEEN ... integer sums; edges use the
                      partial window, so the series stays total)
        detr(t)     = y − trend                            (exact sub)
        seasonal(h) = ordered fold of detr over the key's rows with
                      hour-of-day h (list(ORDER BY t)->list_sum twin)
                      / count                              (1 division)
        resid(t)    = detr − seasonal(h)

    Scale shape: ONE per-batch (key, hour, n, sx) integer combiner —
    no shuffle; the driver merges O(batches x key-hours) partials and
    finishes the O(key-hours) float pipeline (720 hours/month — the
    series itself is driver-small by construction). Returns a Table
    (key, hour_ts, y, trend, seasonal, resid) sorted by (key,
    hour_ts)."""
    import pyarrow as pa

    HOUR = 3_600_000_000

    def partial(t: pa.Table) -> pa.Table:
        k = t.column(key_col).combine_chunks().dictionary_encode()
        codes = k.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keys = k.dictionary.to_pylist()
        ts = t.column(ts_col).to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        hr = (ts // HOUR) * HOUR
        c = np.rint(t.column(value_col).to_numpy(zero_copy_only=False)
                    .astype(np.float64) * scale).astype(np.int64)
        hu, hinv = np.unique(hr, return_inverse=True)
        cell = codes * np.int64(len(hu)) + hinv
        uc, inv2 = np.unique(cell, return_inverse=True)
        n = np.bincount(inv2).astype(np.int64)
        sx = np.bincount(inv2, weights=c).astype(np.int64)
        return pa.table({
            "k": pa.array([keys[i] for i in uc // len(hu)]),
            "hour_ts": pa.array(hu[uc % len(hu)]),
            "n": pa.array(n), "sx": pa.array(sx)})

    acc: dict = {}
    for b in ds.map_batches(partial, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow"):
        tb = pa.table(b)
        for i in range(tb.num_rows):
            kk = (tb.column("k")[i].as_py(),
                  int(tb.column("hour_ts")[i].as_py()))
            row = acc.setdefault(kk, [0, 0])
            row[0] += int(tb.column("n")[i].as_py())
            row[1] += int(tb.column("sx")[i].as_py())
    out_k, out_t, out_y, out_tr, out_se, out_re = \
        [], [], [], [], [], []
    w = int(half_window)
    for key in sorted({kk for kk, _ in acc}):
        hours = np.array(sorted(t for kk, t in acc if kk == key),
                         np.int64)
        ns = np.array([acc[(key, t)][0] for t in hours], np.int64)
        sxs = np.array([acc[(key, t)][1] for t in hours], np.int64)
        h = len(hours)
        ps_n = np.concatenate(([0], np.cumsum(ns)))
        ps_s = np.concatenate(([0], np.cumsum(sxs)))
        idx = np.arange(h)
        lo = np.maximum(idx - w, 0)
        hi = np.minimum(idx + w, h - 1)
        wn = ps_n[hi + 1] - ps_n[lo]
        wsx = ps_s[hi + 1] - ps_s[lo]
        y = sxs.astype(np.float64) / ns.astype(np.float64)
        trend = wsx.astype(np.float64) / wn.astype(np.float64)
        detr = y - trend
        hod = (hours // HOUR) % 24
        seasonal = np.empty(h, np.float64)
        for hh in range(24):
            m = hod == hh
            if not m.any():
                continue
            fold = 0.0
            for x in detr[m]:        # ordered fold == SQL list_sum
                fold = fold + x
            seasonal[m] = fold / float(m.sum())
        resid = detr - seasonal
        out_k += [key] * h
        out_t += hours.tolist()
        out_y += y.tolist()
        out_tr += trend.tolist()
        out_se += seasonal.tolist()
        out_re += resid.tolist()
    return pa.table({
        "key": pa.array(out_k),
        "hour_ts": pa.array(out_t, pa.int64()),
        "y": pa.array(out_y, pa.float64()),
        "trend": pa.array(out_tr, pa.float64()),
        "seasonal": pa.array(out_se, pa.float64()),
        "resid": pa.array(out_re, pa.float64())})


def kaplan_meier(ds, key_col: str = "user_id", ts_col: str = "ts",
                 type_col: str = "event_type",
                 failure_type: str = "error", group_mod: int = 2):
    """Kaplan–Meier survival curves: per key, duration runs from the
    first event to the first ``failure_type`` event (event = 1) or to
    the last event (censored, event = 0); keys split into
    ``key % group_mod`` cohorts and each cohort's product-limit curve
    steps at its failure times:

        S_i = S_{i-1} * ((n_i - d_i)::D / n_i::D)

    — risk counts n_i and failure counts d_i are exact integers and
    the survival product multiplies SEQUENTIALLY in ascending time
    order, which is exactly the recursive-CTE recurrence the oracle
    steps (list_product is NOT a sequential fold — probed; the
    ewma/holt recursive-step twin is). Returns a Table
    (grp, duration_us, n_risk, n_events, survival) at failure times.

    Scale shape: ONE key-keyed exchange derives (key, duration,
    event); per-cohort curves finish on the driver from O(distinct
    failure times) exact counts (the anova/seasonal driver-finish
    contract)."""
    import pandas as pd
    import pyarrow as pa

    from .shuffles import int_part_map

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "k": t.column(key_col).cast(pa.int64()),
            "ts": pa.array(t.column(ts_col)
                           .to_numpy(zero_copy_only=False)
                           .astype("datetime64[us]").astype(np.int64)),
            "fail": pa.array(np.array(
                [1 if x == failure_type else 0
                 for x in t.column(type_col).to_pylist()], np.int64))})

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "k": np.array([], np.int64),
                "dur": np.array([], np.int64),
                "event": np.array([], np.int64)})
        rows_k, rows_d, rows_e = [], [], []
        for k, g in df.groupby("k", sort=True):
            ts = g["ts"].to_numpy(np.int64)
            fl = g["fail"].to_numpy(np.int64)
            t0 = int(ts.min())
            ft = ts[(fl == 1) & (ts > t0)]
            if len(ft):
                rows_d.append(int(ft.min()) - t0)
                rows_e.append(1)
            else:
                rows_d.append(int(ts.max()) - t0)
                rows_e.append(0)
            rows_k.append(int(k))
        return pd.DataFrame({"k": rows_k, "dur": rows_d,
                             "event": rows_e})

    users = int_part_map(ds, "k", per_user, prepare=prep)
    cat = pa.concat_tables(
        [pa.table(b) for b in users.iter_batches(
            batch_format="pyarrow")] or
        [pa.table({"k": pa.array([], pa.int64()),
                   "dur": pa.array([], pa.int64()),
                   "event": pa.array([], pa.int64())})])
    k = cat.column("k").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    dur = cat.column("dur").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    ev = cat.column("event").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    out_g, out_t, out_n, out_d, out_s = [], [], [], [], []
    for grp in range(group_mod):
        m = (k % group_mod) == grp
        if not m.any():
            continue
        dd, ee = dur[m], ev[m]
        sorted_d = np.sort(dd)
        fail_times = np.unique(dd[ee == 1])
        s = 1.0
        for t in fail_times:
            n_risk = int(len(sorted_d)
                         - np.searchsorted(sorted_d, t, side="left"))
            d_i = int(((dd == t) & (ee == 1)).sum())
            s = s * (float(n_risk - d_i) / float(n_risk))
            out_g.append(grp)
            out_t.append(int(t))
            out_n.append(n_risk)
            out_d.append(d_i)
            out_s.append(s)
    return pa.table({"grp": pa.array(out_g, pa.int64()),
                     "duration_us": pa.array(out_t, pa.int64()),
                     "n_risk": pa.array(out_n, pa.int64()),
                     "n_events": pa.array(out_d, pa.int64()),
                     "survival": pa.array(out_s, pa.float64())})


# Integer Viterbi cost tables: state 0 = "browsing", state 1 =
# "buying". Emission costs per event type and state, transition
# costs between states — small integers, broadcast as literals in
# both engines.
VITERBI_EMIT = {"view": (0, 3), "click": (1, 2), "signup": (2, 1),
                "purchase": (4, 0), "error": (2, 2)}
VITERBI_TRANS = ((0, 2), (2, 0))  # trans[i][j]: state i -> j


def viterbi_sessions(ds, key_col: str = "user_id", ts_col: str = "ts",
                     order_col: str = "event_id",
                     type_col: str = "event_type"):
    """Per-key Viterbi decoding of a 2-state integer-cost HMM over
    the (ts, order)-ordered event-type sequence — the
    sequence-labeling primitive (session intent segmentation) with
    EXACT integer DP, so the min path cost is bit-exact vs SQL:

        c_j(t) = emit[type_t][j] + min(c_0(t-1) + trans[0][j],
                                       c_1(t-1) + trans[1][j])

    (init c_j(0) = emit[type_0][j]). Returns per key
    (key, n_events, cost_0, cost_1, best_state, best_cost) where
    best_state prefers state 0 on ties — all exact ints.

    Scale shape: ONE keyed exchange; the DP advances every key one
    step at a time but VECTORIZED ACROSS KEYS per step (the
    ewma/cusum idiom) — wall time O(max run length) numpy steps per
    partition, no per-row Python."""
    import pandas as pd

    from .shuffles import int_part_map

    emit = VITERBI_EMIT
    (t00, t01), (t10, t11) = VITERBI_TRANS

    def prep(t: pa.Table) -> pa.Table:
        et = t.column(type_col).to_pylist()
        e0 = np.array([emit[x][0] for x in et], np.int64)
        e1 = np.array([emit[x][1] for x in et], np.int64)
        return pa.table({
            "k": t.column(key_col).cast(pa.int64()),
            "ts": pa.array(t.column(ts_col)
                           .to_numpy(zero_copy_only=False)
                           .astype("datetime64[us]").astype(np.int64)),
            "oc": t.column(order_col).cast(pa.int64()),
            "e0": pa.array(e0), "e1": pa.array(e1)})

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "key": np.array([], np.int64),
                "n_events": np.array([], np.int64),
                "cost_0": np.array([], np.int64),
                "cost_1": np.array([], np.int64),
                "best_state": np.array([], np.int64),
                "best_cost": np.array([], np.int64)})
        k = df["k"].to_numpy(np.int64)
        ts = df["ts"].to_numpy(np.int64)
        oc = df["oc"].to_numpy(np.int64)
        e0 = df["e0"].to_numpy(np.int64)
        e1 = df["e1"].to_numpy(np.int64)
        order = np.lexsort((oc, ts, k))
        k, e0, e1 = k[order], e0[order], e1[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(k[1:] != k[:-1]) + 1))
        runlen = np.diff(np.concatenate((starts, [len(k)])))
        c0 = e0[starts].copy()
        c1 = e1[starts].copy()
        max_len = int(runlen.max())
        for step in range(1, max_len):
            live = runlen > step
            pos = starts[live] + step
            n0 = e0[pos] + np.minimum(c0[live] + t00, c1[live] + t10)
            n1 = e1[pos] + np.minimum(c0[live] + t01, c1[live] + t11)
            c0[live] = n0
            c1[live] = n1
        best_state = (c1 < c0).astype(np.int64)
        return pd.DataFrame({
            "key": k[starts], "n_events": runlen.astype(np.int64),
            "cost_0": c0, "cost_1": c1,
            "best_state": best_state,
            "best_cost": np.minimum(c0, c1)})

    return int_part_map(ds, "k", per_partition, prepare=prep)


def bandit_replay(ds, key_col: str = "user_id", ts_col: str = "ts",
                  order_col: str = "event_id",
                  type_col: str = "event_type",
                  arms=("click", "view", "signup"),
                  reward_type: str = "purchase"):
    """Off-policy bandit evaluation by REJECTION SAMPLING (Li et
    al.'s replay method): per key, walk the logged arm-event stream
    in (ts, order) order; the greedy policy picks the arm with the
    best running mean reward (unseen arms first in arm order; means
    compared CROSS-MULTIPLIED — s_a·n_b vs s_b·n_a, no division;
    ties -> lower arm index), and only rounds where the policy's
    pick equals the logged arm count: the policy's state updates
    with that round's reward (1 iff the key's next logged event of
    ANY type is ``reward_type``) and (matched, reward_sum)
    accumulate. All-integer state => bit-exact vs the recursive-CTE
    oracle. Returns (key, n_logged, matched, reward_sum).

    Scale shape: ONE keyed exchange; the replay advances every key
    one step at a time but vectorized ACROSS keys (viterbi idiom)."""
    import pandas as pd

    from .shuffles import int_part_map

    arm_idx = {a: i + 1 for i, a in enumerate(arms)}

    def prep(t: pa.Table) -> pa.Table:
        et = t.column(type_col).to_pylist()
        return pa.table({
            "k": t.column(key_col).cast(pa.int64()),
            "ts": pa.array(t.column(ts_col)
                           .to_numpy(zero_copy_only=False)
                           .astype("datetime64[us]").astype(np.int64)),
            "oc": t.column(order_col).cast(pa.int64()),
            "arm": pa.array(np.array(
                [arm_idx.get(x, 0) for x in et], np.int64)),
            "is_rew": pa.array(np.array(
                [1 if x == reward_type else 0 for x in et],
                np.int64))})

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "key": np.array([], np.int64),
                "n_logged": np.array([], np.int64),
                "matched": np.array([], np.int64),
                "reward_sum": np.array([], np.int64)})
        k = df["k"].to_numpy(np.int64)
        ts = df["ts"].to_numpy(np.int64)
        oc = df["oc"].to_numpy(np.int64)
        arm = df["arm"].to_numpy(np.int64)
        isr = df["is_rew"].to_numpy(np.int64)
        order = np.lexsort((oc, ts, k))
        k, arm, isr = k[order], arm[order], isr[order]
        # reward of row t = is_rew of the key's NEXT row (0 at end)
        nxt = np.concatenate((isr[1:], [0]))
        last_of_key = np.concatenate((k[1:] != k[:-1], [True]))
        r = np.where(last_of_key, 0, nxt)
        keep = arm > 0
        k, arm, r = k[keep], arm[keep], r[keep]
        if not len(k):
            return pd.DataFrame({
                "key": np.array([], np.int64),
                "n_logged": np.array([], np.int64),
                "matched": np.array([], np.int64),
                "reward_sum": np.array([], np.int64)})
        starts = np.concatenate(
            ([0], np.flatnonzero(k[1:] != k[:-1]) + 1))
        runlen = np.diff(np.concatenate((starts, [len(k)])))
        nu = len(starts)
        n = np.zeros((nu, 3), np.int64)
        s = np.zeros((nu, 3), np.int64)
        matched = np.zeros(nu, np.int64)
        rew = np.zeros(nu, np.int64)
        for step in range(int(runlen.max())):
            live = runlen > step
            pos = starts[live] + step
            a = arm[pos] - 1
            rr = r[pos]
            nl, sl = n[live], s[live]
            # pick: unseen arms first (in order), else cross-mult argmax
            pick = np.full(len(pos), -1, np.int64)
            for j in range(3):
                pick = np.where((pick < 0) & (nl[:, j] == 0), j, pick)
            undecided = pick < 0
            m12 = sl[:, 0] * nl[:, 1] >= sl[:, 1] * nl[:, 0]
            m13 = sl[:, 0] * nl[:, 2] >= sl[:, 2] * nl[:, 0]
            m23 = sl[:, 1] * nl[:, 2] >= sl[:, 2] * nl[:, 1]
            pick = np.where(undecided & m12 & m13, 0, pick)
            pick = np.where((pick < 0) & m23, 1, pick)
            pick = np.where(pick < 0, 2, pick)
            hit = pick == a
            li = np.flatnonzero(live)
            hi = li[hit]
            matched[hi] += 1
            rew[hi] += rr[hit]
            n[hi, a[hit]] += 1
            s[hi, a[hit]] += rr[hit]
        return pd.DataFrame({
            "key": k[starts], "n_logged": runlen.astype(np.int64),
            "matched": matched, "reward_sum": rew})

    return int_part_map(ds, "k", per_partition, prepare=prep)


def runs_test(ds, key_col: str = "user_id", ts_col: str = "ts",
              order_col: str = "event_id", value_col: str = "value",
              scale: int = 100):
    """Wald–Wolfowitz runs test per key: values above/below the
    key's DISCRETE median (quantile_disc pick — an exact value copy)
    form a +/- sequence in (ts, order) order; rows EQUAL to the
    median are excluded (the classical convention), and the statistic
    is the number of sign runs. Exact integers only —
    (key, n_above, n_below, n_runs); the z-score is left to the
    caller so no float ever enters the graded row.

    Scale shape: ONE keyed exchange; per-partition lexsort, one
    discrete-median pick per key run, one transition count."""
    import pandas as pd

    from .shuffles import int_part_map

    def prep(t: pa.Table) -> pa.Table:
        cents = np.rint(t.column(value_col)
                        .to_numpy(zero_copy_only=False)
                        .astype(np.float64) * scale).astype(np.int64)
        return pa.table({
            "k": t.column(key_col).cast(pa.int64()),
            "ts": pa.array(t.column(ts_col)
                           .to_numpy(zero_copy_only=False)
                           .astype("datetime64[us]").astype(np.int64)),
            "oc": t.column(order_col).cast(pa.int64()),
            "c": pa.array(cents)})

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "key": np.array([], np.int64),
                "n_above": np.array([], np.int64),
                "n_below": np.array([], np.int64),
                "n_runs": np.array([], np.int64)})
        k = df["k"].to_numpy(np.int64)
        ts = df["ts"].to_numpy(np.int64)
        oc = df["oc"].to_numpy(np.int64)
        c = df["c"].to_numpy(np.int64)
        order = np.lexsort((oc, ts, k))
        k, c = k[order], c[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(k[1:] != k[:-1]) + 1, [len(k)]))
        keys, na, nb, nr = [], [], [], []
        for s, e in zip(starts[:-1], starts[1:]):
            seg = c[s:e]
            n = len(seg)
            med = np.sort(seg)[-(-n // 2) - 1]  # quantile_disc 0.5
            sign = seg[seg != med] > med
            keys.append(int(k[s]))
            na.append(int(sign.sum()))
            nb.append(int(len(sign) - sign.sum()))
            nr.append(int(1 + (sign[1:] != sign[:-1]).sum())
                      if len(sign) else 0)
        return pd.DataFrame({"key": keys, "n_above": na,
                             "n_below": nb, "n_runs": nr})

    return int_part_map(ds, "k", per_partition, prepare=prep)


def sign_test(ds, key_col: str = "user_id", ts_col: str = "ts",
              order_col: str = "event_id", value_col: str = "value",
              scale: int = 100):
    """Paired sign test per key: consecutive event values pair up
    (rows 1&2, 3&4, ... in (ts, order) order) and the test counts
    pairs where the later value rose, fell, or tied — the
    nonparametric before/after check next to runs_test. Exact
    integers only: (key, n_pairs, n_plus, n_minus, n_tie).

    Scale shape: ONE keyed exchange; per-partition lexsort +
    stride-2 compares."""
    import pandas as pd

    from .shuffles import int_part_map

    def prep(t: pa.Table) -> pa.Table:
        cents = np.rint(t.column(value_col)
                        .to_numpy(zero_copy_only=False)
                        .astype(np.float64) * scale).astype(np.int64)
        return pa.table({
            "k": t.column(key_col).cast(pa.int64()),
            "ts": pa.array(t.column(ts_col)
                           .to_numpy(zero_copy_only=False)
                           .astype("datetime64[us]").astype(np.int64)),
            "oc": t.column(order_col).cast(pa.int64()),
            "c": pa.array(cents)})

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "key": np.array([], np.int64),
                "n_pairs": np.array([], np.int64),
                "n_plus": np.array([], np.int64),
                "n_minus": np.array([], np.int64),
                "n_tie": np.array([], np.int64)})
        k = df["k"].to_numpy(np.int64)
        ts = df["ts"].to_numpy(np.int64)
        oc = df["oc"].to_numpy(np.int64)
        c = df["c"].to_numpy(np.int64)
        order = np.lexsort((oc, ts, k))
        k, c = k[order], c[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(k[1:] != k[:-1]) + 1, [len(k)]))
        keys, np_, npl, nmi, nti = [], [], [], [], []
        for s, e in zip(starts[:-1], starts[1:]):
            seg = c[s:e]
            m = len(seg) // 2
            a, b = seg[0:2 * m:2], seg[1:2 * m:2]
            keys.append(int(k[s]))
            np_.append(m)
            npl.append(int((b > a).sum()))
            nmi.append(int((b < a).sum()))
            nti.append(int((b == a).sum()))
        return pd.DataFrame({"key": keys, "n_pairs": np_,
                             "n_plus": npl, "n_minus": nmi,
                             "n_tie": nti})

    return int_part_map(ds, "k", per_partition, prepare=prep)
