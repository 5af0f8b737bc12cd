"""Relational operators Ray Data has no single-call form for — semi /
anti join, list explode (UNNEST), pivot, and per-key running windows
(cumulative sum, NTILE) — each expressed per the round brief's custom-
operator ladder: broadcast + ``map_batches`` when one side is a
dimension, ``groupby().map_groups`` when per-key order is needed, and
the raw-task hash shuffle (stages/shuffles.py) when both sides are
large.

The reference engine's joins are exact client-side lookups (SURVEY
§2.8); these widen the engine toward the full relational surface a
100 TB curation pipeline leans on (membership filtering against other
tables, contingency pivots, running aggregates). Every op here has a
DuckDB oracle twin in pipelines/queries.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray


# ---------------------------------------------------------------------------
# Semi / anti join
# ---------------------------------------------------------------------------

def distinct_keys(ds, key: str) -> list:
    """Distinct values of ``key`` — a per-batch ``pc.unique`` combiner
    (each batch emits only its local distincts) followed by the small
    global ``unique``. Driver traffic is O(global distinct keys), not
    O(rows)."""
    def uniq(t: pa.Table) -> pa.Table:
        return pa.table({key: pc.unique(t.column(key).combine_chunks())})

    return ds.map_batches(uniq, batch_format="pyarrow").unique(key)


def semi_join_broadcast(left_ds, right_ds, left_key: str,
                        right_key: str | None = None, anti: bool = False):
    """``left ⋉ right`` (``anti=True`` ⇒ ``left ▷ right``): keep left
    rows whose ``left_key`` appears (does not appear) among the right
    side's ``right_key`` values. SQL twin: ``WHERE [NOT] EXISTS
    (SELECT 1 FROM right WHERE right_key = left_key)``.

    Scale shape: the right side is reduced DISTRIBUTED to its distinct
    keys (combiner + unique — never its rows), the key set is
    ``ray.put`` once, and the left side streams through one vectorized
    ``pc.is_in`` filter — no shuffle. This is the right plan whenever
    the right side's distinct keys fit one broadcast object (dimension
    tables, benchmark membership lists — the same contract as
    textstats.decontaminate's shingle set). For a right side whose
    distinct keys exceed broadcast size, use ``semi_join_shuffled``.

    NULL semantics: SQL's EXISTS never matches a NULL key on either
    side; ``pc.is_in`` with null values on the left yields null → rows
    dropped by ``filter`` (semi) — the anti path null-fills to False
    explicitly so a null left key is kept, matching NOT EXISTS.
    """
    right_key = right_key or left_key
    keys = distinct_keys(right_ds, right_key)
    kref = ray.put(pa.array([k for k in keys if k is not None]))

    def filt(t: pa.Table) -> pa.Table:
        m = pc.is_in(t.column(left_key), value_set=ray.get(kref))
        if anti:
            m = pc.invert(pc.fill_null(m, False))
        return t.filter(m)

    return left_ds.map_batches(filt, batch_format="pyarrow")


def anti_join_broadcast(left_ds, right_ds, left_key: str,
                        right_key: str | None = None):
    """``WHERE NOT EXISTS`` — see semi_join_broadcast."""
    return semi_join_broadcast(left_ds, right_ds, left_key, right_key,
                               anti=True)


_TAG = "__semi_side"


def semi_join_shuffled(left_ds, right_ds, left_key: str,
                       right_key: str | None = None, anti: bool = False,
                       num_partitions: int = 64):
    """Semi/anti join when BOTH sides are large: tag each side, union
    the left rows with the right side's per-batch-distinct keys, hash-
    shuffle once on the key, and filter left rows per partition against
    that partition's right keys. One all-to-all exchange, no broadcast
    object; per-partition state is that partition's distinct right
    keys only.

    Right rows are pre-reduced to per-batch distinct keys in the map
    side (combiner), so the exchange ships at most O(batches × local
    distincts) right rows. Output rows/columns identical to the
    broadcast form (asserted in tests); only left columns survive.
    """
    right_key = right_key or left_key
    sch = left_ds.schema()
    base = getattr(sch, "base_schema", None)
    if isinstance(base, pa.Schema):
        pa_schema = base
    else:  # pandas-block datasets: types are numpy dtypes
        def _pa_type(t):
            if isinstance(t, pa.DataType):
                return t
            if t is object or getattr(t, "kind", None) == "O":
                return pa.string()  # pandas object column == string here
            return pa.from_numpy_dtype(t)

        pa_schema = pa.schema(
            [pa.field(n, _pa_type(t)) for n, t in zip(sch.names, sch.types)])
    left_cols = list(pa_schema.names)

    def keys_only(t: pa.Table) -> pa.Table:
        u = pc.drop_null(pc.unique(t.column(right_key).combine_chunks()))
        u = u.cast(pa_schema.field(left_key).type)
        out = pa.table({left_key: u})
        out = out.append_column(_TAG, pa.array(np.ones(len(u), np.int8)))
        for c in left_cols:
            if c != left_key:
                out = out.append_column(c, pa.nulls(len(u), pa_schema.field(c).type))
        return out.select(left_cols + [_TAG])

    def tag_left(t: pa.Table) -> pa.Table:
        return t.select(left_cols).append_column(
            _TAG, pa.array(np.zeros(t.num_rows, np.int8)))

    tagged = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(keys_only, batch_format="pyarrow"))

    def part_filter(g: pd.DataFrame) -> pd.DataFrame:
        # one partition == all rows of one key-hash bucket; fn receives
        # one KEY group at a time (hash_map_groups groups by key), so
        # the membership test is just "did a right row land here?"
        has_right = (g[_TAG] == 1).any()
        keep = g[g[_TAG] == 0]
        if anti:
            return keep.drop(columns=[_TAG]) if not has_right \
                else keep.iloc[0:0].drop(columns=[_TAG])
        return keep.drop(columns=[_TAG]) if has_right \
            else keep.iloc[0:0].drop(columns=[_TAG])

    from .shuffles import hash_map_groups
    return hash_map_groups(tagged, left_key, part_filter,
                           num_partitions=num_partitions)


def distinct_set_op(left_ds, right_ds, key: str, op: str = "except"):
    """SQL ``EXCEPT`` / ``INTERSECT`` over one key column (set semantics:
    output is DISTINCT). The right side is reduced DISTRIBUTED to its
    distinct keys (combiner + unique) and broadcast once; the left side
    is reduced to its own distinct keys with the same combiner + ONE
    small ``groupby(key)`` (shuffle volume = per-batch distincts), then
    streams through one ``pc.is_in`` filter. Nothing materializes more
    than O(distinct keys) anywhere.

    NULL semantics: SQL set ops treat NULLs as equal — a left NULL
    survives EXCEPT iff the right side has no NULL, and survives
    INTERSECT iff it does. Handled explicitly (``is_in`` is
    null-propagating)."""
    from ray.data.aggregate import Count

    if op not in ("except", "intersect"):
        raise ValueError(op)
    rkeys = distinct_keys(right_ds, key)
    right_has_null = any(k is None for k in rkeys)
    kref = ray.put(pa.array([k for k in rkeys if k is not None]))

    def uniq(t: pa.Table) -> pa.Table:
        return pa.table({key: pc.unique(t.column(key).combine_chunks())})

    ldist = (left_ds.map_batches(uniq, batch_format="pyarrow")
                    .groupby(key).aggregate(Count(alias_name="__n"))
                    .drop_columns(["__n"]))

    def filt(t: pa.Table) -> pa.Table:
        col = t.column(key)
        in_right = pc.fill_null(pc.is_in(col, value_set=ray.get(kref)), False)
        if op == "intersect":
            m = pc.if_else(pc.is_null(col), pa.scalar(right_has_null),
                           in_right)
        else:
            m = pc.if_else(pc.is_null(col), pa.scalar(not right_has_null),
                           pc.invert(in_right))
        return t.filter(m)

    return ldist.map_batches(filt, batch_format="pyarrow")


def lag_diff_per_key(ds, key_col: str, ts_col: str, order_col: str,
                     value_col: str, out_col: str = "delta",
                     round_to: int = 6):
    """Per-key first difference: ``round(value - lag(value, 1, value)
    OVER (PARTITION BY key ORDER BY ts, order), round_to)`` — the first
    row of each key diffs against itself (0.0), matching the SQL
    3-argument ``lag`` default so no NULL rows are emitted. One
    ``groupby(key)`` shuffle, vectorized numpy diff per group; the
    subtraction is a single float64 op on both engines (bit-identical
    before rounding)."""
    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, order_col], kind="mergesort")
        v = g[value_col].to_numpy(dtype=np.float64)
        lag = np.concatenate(([v[0]], v[:-1])) if len(v) else v
        out = g[[key_col, order_col]].copy()
        out[out_col] = np.round(v - lag, round_to)
        return out

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")


# ---------------------------------------------------------------------------
# Explode / UNNEST
# ---------------------------------------------------------------------------

def explode_list(ds, list_col: str, out_col: str | None = None,
                 keep_cols: tuple[str, ...] = ()):
    """UNNEST a ``list<...>`` column: one output row per element, with
    ``keep_cols`` repeated via a vectorized parent-index ``take``. Rows
    whose list is empty or null produce no output (DuckDB UNNEST
    semantics). Stateless per-batch kernel — streams, no shuffle; the
    fan-out only grows blocks locally, which Ray Data re-slices."""
    out_col = out_col or list_col

    def ex(t: pa.Table) -> pa.Table:
        lc = t.column(list_col)
        if isinstance(lc, pa.ChunkedArray):
            lc = lc.combine_chunks()
        flat = pc.list_flatten(lc)
        par = pc.list_parent_indices(lc)
        cols = {c: t.column(c).take(par) for c in keep_cols}
        cols[out_col] = flat
        return pa.table(cols)

    return ds.map_batches(ex, batch_format="pyarrow")


def split_explode(ds, text_col: str, pattern: str = " ",
                  out_col: str = "word", keep_cols: tuple[str, ...] = ()):
    """Split a string column on a literal ``pattern`` and UNNEST the
    pieces (``unnest(string_split(col, pat))``). The split is the
    Arrow-native ``pc.split_pattern`` — zero Python per row."""
    def sp(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__parts", pc.split_pattern(t.column(text_col), pattern))

    return explode_list(ds.map_batches(sp, batch_format="pyarrow"),
                        "__parts", out_col=out_col, keep_cols=keep_cols)


# ---------------------------------------------------------------------------
# Pivot (contingency / conditional aggregation)
# ---------------------------------------------------------------------------

def pivot_sum(ds, key: str, pivot_col: str, value_col: str,
              pivot_values: list | None = None, prefix: str = ""):
    """Wide pivot: one row per ``key``, one column per ``pivot_values``
    entry holding ``SUM(value_col) FILTER (pivot_col = v)`` (0.0 when
    no row matches — the ``SUM(CASE WHEN ... ELSE 0 END)`` form).

    Scale shape: the map side widens each batch into indicator columns
    (vectorized ``pc.if_else``), so the only exchange is ONE small
    ``groupby(key)`` over ``len(pivot_values)+1`` columns — a classic
    partial-aggregate pivot. ``pivot_values`` defaults to the column's
    distinct values, computed distributed (combiner + unique); pass it
    explicitly when known to skip that pass. Column order follows
    sorted(pivot_values) for a deterministic schema."""
    from ray.data.aggregate import Sum

    if pivot_values is None:
        pivot_values = distinct_keys(ds, pivot_col)
    pivot_values = sorted(v for v in pivot_values if v is not None)
    names = {v: f"{prefix}{v}" for v in pivot_values}

    def widen(t: pa.Table) -> pa.Table:
        pv = t.column(pivot_col)
        val = t.column(value_col).cast(pa.float64())
        cols = {key: t.column(key)}
        for v, nm in names.items():
            cols[nm] = pc.if_else(pc.equal(pv, v), val, 0.0)
        return pa.table(cols)

    return (ds.map_batches(widen, batch_format="pyarrow")
              .groupby(key)
              .aggregate(*[Sum(nm, alias_name=nm) for nm in names.values()]))


# ---------------------------------------------------------------------------
# Per-key running windows
# ---------------------------------------------------------------------------

def cumsum_per_key(ds, key_col: str, ts_col: str, order_col: str,
                   value_col: str, out_col: str = "cum_value",
                   round_to: int = 6):
    """Per-key running total in (ts, order) order — ``SUM(v) OVER
    (PARTITION BY key ORDER BY ts, order ROWS UNBOUNDED PRECEDING)``.
    Same shape as windows.rolling_mean_per_key: one ``groupby(key)``
    shuffle, numpy cumsum per group; high-cardinality keys keep groups
    small. float64 running sums rounded to ``round_to`` (summation
    order matches the SQL window's left-to-right accumulation; the
    rounding absorbs sub-ulp engine differences)."""
    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, order_col], kind="mergesort")
        cs = np.cumsum(g[value_col].to_numpy(dtype=np.float64))
        out = g[[key_col, order_col]].copy()
        out[out_col] = np.round(cs, round_to)
        return out

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")


def ntile_per_group(ds, key_col: str, order_cols: list[str], n: int,
                    id_col: str, out_col: str = "tile"):
    """``NTILE(n) OVER (PARTITION BY key ORDER BY order_cols)``: rows of
    each group split into ``n`` buckets as evenly as possible, the first
    ``rows % n`` buckets one row larger (the SQL-standard fill DuckDB
    implements). Integer-exact — no rounding caveats. One
    ``groupby(key)`` shuffle; emits (key, id, tile)."""
    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, kind="mergesort")
        k = len(g)
        base, extra = divmod(k, n)
        sizes = np.full(n, base, np.int64)
        sizes[:extra] += 1
        out = g[[key_col, id_col]].copy()
        # zero-sized tail buckets (k < n) repeat 0 times — always k values
        out[out_col] = np.repeat(np.arange(1, n + 1), sizes)
        return out

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")


# ---------------------------------------------------------------------------
# Ordered funnel + JSON field extraction
# ---------------------------------------------------------------------------

def funnel_counts(ds, stages: tuple, user_col: str = "user_id",
                  ts_col: str = "ts", type_col: str = "event_type"):
    """Ordered-funnel analysis: how many users completed stage 1, then
    stage 2 STRICTLY AFTER their first stage-1 event, then stage 3
    strictly after that, ... (first-touch semantics: each stage's
    completion time is the user's EARLIEST qualifying event).

    Scale shape: events are filtered to the funnel's types and
    projected to 3 columns inside the shuffle's split tasks, then ONE
    int-keyed exchange co-locates each user's rows; the per-partition
    walk is pandas-vectorized per STAGE (a groupby-min and a mapped
    comparison per stage — no per-user loop) and emits one
    len(stages)-row partial. The final merge sums O(partitions ×
    stages) tiny rows. Emits ``(stage_idx, stage, n_users)``."""
    from ray.data.aggregate import Sum

    from .shuffles import int_part_map

    stages = list(stages)

    def pre(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t.column(type_col),
                        value_set=pa.array(stages, pa.string()))
        return t.filter(keep).select([user_col, ts_col, type_col])

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        counts = []
        cur = None  # user -> completion time of the previous stage
        for st in stages:
            sub = df[df[type_col] == st]
            if cur is not None:
                prev = sub[user_col].map(cur)
                sub = sub[prev.notna() & (sub[ts_col] > prev)]
            cur = sub.groupby(user_col)[ts_col].min()
            counts.append(len(cur))
        return pd.DataFrame({"stage_idx": np.arange(len(stages), dtype=np.int64),
                             "stage": stages,
                             "n_users": np.asarray(counts, np.int64)})

    parts = int_part_map(ds, user_col, per_part, prepare=pre)
    return (parts.groupby(["stage_idx", "stage"])
                 .aggregate(Sum("n_users", alias_name="n_users")))


def json_int_field(tbl: pa.Table, col: str, field: str,
                   out_col: str) -> pa.Table:
    """Extract an integer JSON field from a string column, vectorized.

    Fast path: Arrow's RE2 ``extract_regex`` on the pattern
    ``"field"\\s*:\\s*(-?\\d+)`` — correct for flat objects where the
    field occurs once (the overwhelming shape of event-props columns;
    a SAME-NAMED key inside a nested object would false-positive).
    Rows the regex misses (absent field, quoted/float/nested value)
    fall back to ``json.loads`` individually, so non-conforming rows
    still parse correctly rather than silently nulling."""
    import json
    import re as _re

    src = tbl.column(col).combine_chunks()
    pat = f'"{_re.escape(field)}"\\s*:\\s*(?P<v>-?\\d+)'
    ex = pc.extract_regex(src, pattern=pat)
    vals = pc.cast(pc.struct_field(ex, "v"), pa.int64())
    miss = pc.and_(pc.is_null(vals), pc.is_valid(src))
    if pc.any(miss).as_py():
        idx = np.flatnonzero(miss.to_numpy(zero_copy_only=False))
        raw = src.to_pylist()
        py = vals.to_pylist()
        for i in idx:
            try:
                v = json.loads(raw[i]).get(field)
                py[i] = int(v) if v is not None else None
            except (ValueError, TypeError, AttributeError):
                pass
        vals = pa.array(py, pa.int64())
    return tbl.append_column(out_col, vals)


def profile_columns(ds, cols: list[str]):
    """Data-validation profile of numeric columns: one row per column
    with (n_rows, n_nulls, min_v, max_v) — the expectations-style
    audit a pipeline runs before training ingestion (the reference
    validates only request shapes, middleware/validator.js; data-side
    checks are implicit). min/max are SELECTIONS (never arithmetic),
    so floats compare exact against SQL.

    Scale shape: a pure combiner — each batch reduces to one row per
    column (vectorized isnull + min/max), the driver folds
    O(batches x columns) partial rows; no shuffle. Returns a pyarrow
    Table sorted by column name."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        names, nr, nn, mn, mx = [], [], [], [], []
        for c in cols:
            col = t.column(c)
            names.append(c)
            nr.append(t.num_rows)
            nn.append(col.null_count)
            valid = col.drop_null()
            if len(valid):
                mn.append(float(pc.min(valid).as_py()))
                mx.append(float(pc.max(valid).as_py()))
            else:
                mn.append(None)
                mx.append(None)
        return pa.table({"column": pa.array(names),
                         "n_rows": pa.array(nr, pa.int64()),
                         "n_nulls": pa.array(nn, pa.int64()),
                         "min_v": pa.array(mn, pa.float64()),
                         "max_v": pa.array(mx, pa.float64())})

    acc: dict = {}
    for b in ds.map_batches(partial, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow"):
        tb = pa.table(b)
        for i in range(tb.num_rows):
            c = tb.column("column")[i].as_py()
            row = acc.setdefault(c, [0, 0, None, None])
            row[0] += int(tb.column("n_rows")[i].as_py())
            row[1] += int(tb.column("n_nulls")[i].as_py())
            mn = tb.column("min_v")[i].as_py()
            mx = tb.column("max_v")[i].as_py()
            if mn is not None:
                row[2] = mn if row[2] is None else min(row[2], mn)
            if mx is not None:
                row[3] = mx if row[3] is None else max(row[3], mx)
    ks = sorted(acc)
    return pa.table({
        "column": pa.array(ks),
        "n_rows": pa.array([acc[k][0] for k in ks], pa.int64()),
        "n_nulls": pa.array([acc[k][1] for k in ks], pa.int64()),
        "min_v": pa.array([acc[k][2] for k in ks], pa.float64()),
        "max_v": pa.array([acc[k][3] for k in ks], pa.float64())})


def merge_upsert(base_ds, updates_ds, key_col: str,
                 num_partitions: int = 32):
    """SCD-1 (last-write-wins) merge: every key in ``updates`` replaces
    its row in ``base``; unmatched base rows pass through; new update
    keys insert — the snapshot-maintenance primitive behind every
    incremental re-crawl (fresh fetches overriding the page store —
    the reference re-crawls from scratch each run). Columns must
    match. Assumes unique keys per side (the page-store convention).

    Scale shape: tagged union + ONE keyed raw-task exchange; the
    partition kernel keeps, per key, the update row when one exists —
    a vectorized membership mask, no joins, no driver state. Returns
    a Dataset with base's schema.
    """
    import pandas as pd
    import pyarrow as pa
    from .shuffles import int_part_map

    names = [n for n in base_ds.schema().names]

    def tag(flag: int):
        def f(t: pa.Table) -> pa.Table:
            t = t.select(names)
            return t.append_column(
                "__upd", pa.array(np.full(t.num_rows, flag, np.int8)))
        return f

    u = base_ds.map_batches(tag(0), batch_format="pyarrow") \
        .union(updates_ds.map_batches(tag(1), batch_format="pyarrow"))

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        upd = df["__upd"].to_numpy(np.int8) == 1
        upd_keys = df.loc[upd, key_col].to_numpy()
        keep_base = ~upd & ~df[key_col].isin(upd_keys).to_numpy()
        return df.loc[upd | keep_base, names]

    return int_part_map(u, key_col, per_partition,
                        num_partitions=num_partitions)


def _skyline_2d(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of the 2-D minimizing skyline: row i survives
    iff no row has (x<=xi AND y<=yi) with at least one strict. Exact
    duplicates all survive (neither strictly dominates the other).
    Vectorized: sort by (x, y); within an equal-x run only the min-y
    rows can survive; across runs a row is dominated iff some
    strictly-smaller-x prefix reached a y <= its y (prefix-min scan).
    Comparisons only — no float arithmetic, so doubles stay exact."""
    n = len(x)
    if n == 0:
        return np.zeros(0, bool)
    order = np.lexsort((y, x))
    xs, ys = x[order], y[order]
    newx = np.ones(n, bool)
    newx[1:] = xs[1:] != xs[:-1]
    run_id = np.cumsum(newx) - 1
    # min y within each equal-x run, broadcast back to rows
    run_min = np.minimum.reduceat(ys, np.nonzero(newx)[0])
    ymin_in_run = run_min[run_id]
    # prefix min of run minima over STRICTLY smaller x (previous runs)
    prev = np.concatenate(([np.inf], np.minimum.accumulate(run_min)[:-1]))
    keep_sorted = (ys == ymin_in_run) & (ys < prev[run_id])
    keep = np.zeros(n, bool)
    keep[order] = keep_sorted
    return keep


def skyline_2d(ds, x_col: str, y_col: str):
    """Pareto-optimal (minimizing) skyline over two numeric columns —
    the multi-criteria shortlist operator (cheapest-AND-smallest part,
    best-quality-AND-shortest doc; the reference's single-criterion
    analogue is the 3-tier URL prioritizer, utils/validator.js).
    SQL twin: ``WHERE NOT EXISTS (dominating row)``.

    Scale shape: the skyline is an algebraic combiner — a globally
    non-dominated row is non-dominated within its own batch, so one
    ``map_batches`` pass reduces each batch to its local skyline
    (expected O(log^2 n) rows on independent dimensions), and one
    final pass over the concatenated survivors yields the exact global
    skyline. Driver traffic is the survivor union, never the table;
    no shuffle. Returns a pyarrow Table with ds's columns, sorted by
    (x_col, y_col) then remaining columns."""
    def local(t: pa.Table) -> pa.Table:
        xv = t.column(x_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        yv = t.column(y_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        return t.filter(pa.array(_skyline_2d(xv, yv)))

    parts = [pa.table(b) for b in ds.map_batches(
        local, batch_format="pyarrow").iter_batches(batch_format="pyarrow")]
    if not parts:
        sch = ds.schema()
        cat = pa.schema(list(zip(sch.names, sch.types))).empty_table()
    else:
        cat = pa.concat_tables(parts)
    xv = cat.column(x_col).to_numpy(zero_copy_only=False).astype(np.float64)
    yv = cat.column(y_col).to_numpy(zero_copy_only=False).astype(np.float64)
    out = cat.filter(pa.array(_skyline_2d(xv, yv)))
    others = [c for c in out.column_names if c not in (x_col, y_col)]
    return out.sort_by([(x_col, "ascending"), (y_col, "ascending")]
                       + [(c, "ascending") for c in others])


def table_checksum(ds, cols: list[str]):
    """Order-independent 63-bit content checksum of selected columns —
    the replication/migration integrity primitive next to
    profile_columns (compare a source and a sink without moving
    either): XOR of ``md5_low64(col1 || ':' || col2 ...) & (2^63-1)``
    over all rows. XOR is commutative/associative, so the fold is
    partition-order-free and shuffle-free. SQL twin:
    ``SELECT bit_xor((md5_number_lower(...) & max63)::BIGINT)``.

    Scale shape: a pure combiner — each batch reduces to ONE int64
    row, the driver XORs O(batches) partials; no shuffle, no driver
    data traffic. NULLs stringify as 'None' on both sides via
    explicit COALESCE in the twin. Returns a 1-row pyarrow Table
    (checksum, n_rows)."""
    from ..stages.aggregates import md5_low64

    M63 = (1 << 63) - 1

    def partial(t: pa.Table) -> pa.Table:
        arrs = [t.column(c).to_pylist() for c in cols]
        x = 0
        for vals in zip(*arrs):
            s = ":".join(str(v) for v in vals)
            x ^= md5_low64(s) & M63
        return pa.table({"checksum": pa.array([x], pa.int64()),
                         "n_rows": pa.array([t.num_rows], pa.int64())})

    x, n = 0, 0
    for b in ds.map_batches(partial, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow"):
        tb = pa.table(b)
        for i in range(tb.num_rows):
            x ^= int(tb.column("checksum")[i].as_py())
            n += int(tb.column("n_rows")[i].as_py())
    return pa.table({"checksum": pa.array([x], pa.int64()),
                     "n_rows": pa.array([n], pa.int64())})


def unpivot(ds, id_cols: list[str], value_cols: list[str],
            name_col: str = "measure", value_col: str = "val"):
    """Wide-to-long UNPIVOT (melt): each input row explodes into one
    row per entry of ``value_cols``, carrying ``id_cols`` plus
    (measure-name, value) — the feature-table reshaping primitive
    inverse to pivot_sum (SQL: ``UNPIVOT`` / stacked ``UNION ALL``).
    Values are COPIED, never combined, so any numeric type compares
    exactly; all value columns are cast to float64 (the melt's common
    type, as SQL's UNPIVOT unifies them too).

    Scale shape: a stateless per-batch map — vectorized repeat/tile,
    no shuffle, output exactly ``len(value_cols) x`` input rows."""
    def melt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        k = len(value_cols)
        cols = {}
        for c in id_cols:
            v = t.column(c).combine_chunks()
            cols[c] = pa.concat_arrays([v] * k) if n else v
        names = np.repeat(np.array(value_cols, object), n) if n else \
            np.array([], object)
        vals = [t.column(c).to_numpy(zero_copy_only=False)
                .astype(np.float64) for c in value_cols]
        cols[name_col] = pa.array(names, pa.string())
        cols[value_col] = pa.array(
            np.concatenate(vals) if n else np.array([], np.float64))
        return pa.table(cols)

    return ds.map_batches(melt, batch_format="pyarrow")


def cooccurrence_pairs(ds, group_col: str, item_col: str,
                       min_support: int = 2, num_partitions: int = 32):
    """Pairwise frequent-itemset mining: every ordered item pair
    (a < b) co-occurring in at least ``min_support`` groups — the
    market-basket / related-items primitive (the pairwise level of
    Apriori; support counts are exact integers, no floats anywhere).
    Returns a Dataset (item_a, item_b, support).

    Scale shape: ONE exchange keyed by group co-locates each basket;
    the kernel distinct-ifies (group, item), emits id-ordered pairs
    vectorized (volume Σ basket², bounded by basket size — lineitem
    baskets are ≤7 rows), then ONE more exchange keyed by item_a
    counts pair support and applies the threshold. Shuffle volume is
    pairs, never baskets × baskets."""
    import pandas as pd

    from .shuffles import int_part_map

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "g": t.column(group_col).cast(pa.int64()),
            "i": t.column(item_col).cast(pa.int64())})

    def emit_pairs(df: pd.DataFrame) -> pd.DataFrame:
        z = np.array([], np.int64)
        if not len(df):
            return pd.DataFrame({"a": z, "b": z})
        g = df["g"].to_numpy(np.int64)
        i = df["i"].to_numpy(np.int64)
        o = np.lexsort((i, g))
        g, i = g[o], i[o]
        keep = np.ones(len(g), bool)     # distinct (group, item)
        keep[1:] = (g[1:] != g[:-1]) | (i[1:] != i[:-1])
        g, i = g[keep], i[keep]
        starts = np.concatenate(
            ([0], np.flatnonzero(g[1:] != g[:-1]) + 1, [len(g)]))
        from .graph import _pairs_from_sorted_groups
        a, b, _ = _pairs_from_sorted_groups(starts, i)
        return pd.DataFrame({"a": a, "b": b})

    pairs = int_part_map(ds.map_batches(prep, batch_format="pyarrow"),
                         "g", emit_pairs,
                         num_partitions=num_partitions)

    def count_pairs(df: pd.DataFrame) -> pd.DataFrame:
        z = np.array([], np.int64)
        if not len(df):
            return pd.DataFrame({"item_a": z, "item_b": z,
                                 "support": z})
        a = df["a"].to_numpy(np.int64)
        b = df["b"].to_numpy(np.int64)
        o = np.lexsort((b, a))
        a, b = a[o], b[o]
        new = np.ones(len(a), bool)
        new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        st = np.flatnonzero(new)
        cnt = np.diff(np.append(st, len(a)))
        sel = cnt >= min_support
        return pd.DataFrame({"item_a": a[st][sel],
                             "item_b": b[st][sel],
                             "support": cnt[sel].astype(np.int64)})

    return int_part_map(pairs, "a", count_pairs,
                        num_partitions=num_partitions)


def cooccurrence_pairs_str(ds, group_col: str, item_col: str,
                           min_support: int = 1,
                           num_partitions: int = 32):
    """String-item variant of cooccurrence_pairs (audience overlap:
    how many groups contain BOTH items?): the item alphabet is
    collected with a tiny distinct combiner (O(alphabet), e.g. event
    types), broadcast as a sorted code list, and the integer kernel
    runs unchanged; codes map back to names at the end. Pair order is
    name order (item_a < item_b). Returns a pa.Table
    (item_a, item_b, support) sorted — O(alphabet²) rows."""
    import ray

    alph: set = set()
    for b in ds.map_batches(
            lambda t: pa.table({"i": pa.compute.unique(
                t.column(item_col).cast(pa.string()))}),
            batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        alph.update(x for x in pa.table(b).column("i").to_pylist())
    codes = sorted(alph)
    handle = ray.put(np.asarray(codes, dtype=object))

    def encode(t: pa.Table) -> pa.Table:
        cs = ray.get(handle)
        items = np.asarray([str(x) for x in
                            t.column(item_col).to_pylist()],
                           dtype=object)
        pos = np.searchsorted(cs, items)
        return pa.table({
            group_col: t.column(group_col).cast(pa.int64()),
            "item_code": pa.array(pos.astype(np.int64))})

    out = cooccurrence_pairs(ds.map_batches(encode,
                                            batch_format="pyarrow"),
                             group_col, "item_code",
                             min_support=min_support,
                             num_partitions=num_partitions)
    tabs = [pa.table(b)
            for b in out.iter_batches(batch_format="pyarrow")]
    empty = pa.table({"item_a": pa.array([], pa.string()),
                      "item_b": pa.array([], pa.string()),
                      "support": pa.array([], pa.int64())})
    if not tabs:
        return empty
    cat = pa.concat_tables(tabs)
    if cat.num_rows == 0:
        return empty
    a = cat.column("item_a").to_numpy(zero_copy_only=False)
    b = cat.column("item_b").to_numpy(zero_copy_only=False)
    s = cat.column("support").to_numpy(zero_copy_only=False)
    o = np.lexsort((b, a))
    names = np.asarray(codes, dtype=object)
    return pa.table({
        "item_a": pa.array([str(x) for x in names[a[o]]], pa.string()),
        "item_b": pa.array([str(x) for x in names[b[o]]], pa.string()),
        "support": pa.array(s[o].astype(np.int64))})


def snapshot_diff(a_ds, b_ds, key_col: str, val_col: str,
                  scale: int = 100, num_partitions: int = 32):
    """Snapshot/table diff — the lakehouse change-detection primitive:
    given two versions keyed by ``key_col``, emit one row per
    non-identical key with status 'added' (B only), 'removed' (A
    only) or 'changed' (both, value differs), carrying both sides'
    cent-quantized values (missing side = −1 sentinel, so the hash
    never rides on NULL). Unchanged keys are dropped. Pure integer
    compares — hash-exact. Assumes ``key_col`` is unique per side
    (snapshot semantics). Returns a Dataset
    (key, status, val_a, val_b).

    Scale shape: ONE tagged-union exchange keyed by the key column;
    the kernel sorts each side and set-merges with searchsorted —
    O(diff) rows leave the partitions."""
    import pandas as pd

    from .shuffles import int_part_map

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            v = np.rint(t.column(val_col).to_numpy(zero_copy_only=False)
                        .astype(np.float64) * scale).astype(np.int64)
            return pa.table({
                "k": t.column(key_col).cast(pa.int64()),
                "v": pa.array(v),
                "tag": pa.array(np.full(t.num_rows, side, np.int8))})
        return fn

    def diff(df: pd.DataFrame) -> pd.DataFrame:
        z = np.array([], np.int64)
        if not len(df):
            return pd.DataFrame({"key": z,
                                 "status": np.array([], object),
                                 "val_a": z, "val_b": z})
        tg = df["tag"].to_numpy()
        ka = df["k"].to_numpy(np.int64)[tg == 0]
        va = df["v"].to_numpy(np.int64)[tg == 0]
        kb = df["k"].to_numpy(np.int64)[tg == 1]
        vb = df["v"].to_numpy(np.int64)[tg == 1]
        oa, ob = np.argsort(ka, kind="mergesort"), \
            np.argsort(kb, kind="mergesort")
        ka, va, kb, vb = ka[oa], va[oa], kb[ob], vb[ob]
        pa_ = np.searchsorted(kb, ka)
        in_b = (pa_ < len(kb)) & (kb[np.clip(pa_, 0, max(len(kb) - 1,
                                                         0))] == ka) \
            if len(kb) else np.zeros(len(ka), bool)
        pb_ = np.searchsorted(ka, kb)
        in_a = (pb_ < len(ka)) & (ka[np.clip(pb_, 0, max(len(ka) - 1,
                                                         0))] == kb) \
            if len(ka) else np.zeros(len(kb), bool)
        rem_k, rem_v = ka[~in_b], va[~in_b]
        add_k, add_v = kb[~in_a], vb[~in_a]
        both_a = np.flatnonzero(in_b)
        bv = vb[pa_[both_a]] if len(both_a) else np.array([], np.int64)
        ch = va[both_a] != bv
        return pd.DataFrame({
            "key": np.concatenate([add_k, ka[both_a][ch],
                                   rem_k]),
            "status": np.concatenate([
                np.full(len(add_k), "added", object),
                np.full(int(ch.sum()), "changed", object),
                np.full(len(rem_k), "removed", object)]),
            "val_a": np.concatenate([np.full(len(add_k), -1, np.int64),
                                     va[both_a][ch], rem_v]),
            "val_b": np.concatenate([add_v, bv[ch],
                                     np.full(len(rem_k), -1,
                                             np.int64)])})

    u = a_ds.map_batches(tag(0), batch_format="pyarrow") \
        .union(b_ds.map_batches(tag(1), batch_format="pyarrow"))
    return int_part_map(u, "k", diff, num_partitions=num_partitions)


def zorder_layout(ds, x_col: str, y_col: str, x_of, y_of,
                  id_cols: list[str], k: int = 500, bits: int = 16):
    """Z-ORDER (Morton) data-layout key — the lakehouse OPTIMIZE
    ZORDER primitive (Delta/Iceberg clustering): interleave the low
    ``bits`` of two dimension keys bit-by-bit so rows close in BOTH
    dimensions get close codes, then the ``k`` first rows of the
    z-ordered layout (code asc, id asc) demonstrate the clustering.
    ``x_of``/``y_of`` map a pyarrow Table to the two int64 dimension
    arrays (already reduced mod 2^bits by the caller's expression).
    All-integer bit arithmetic — the SQL twin recomputes the identical
    interleave with a generate_series/list_sum fold.

    Scale shape: the code is a stateless vectorized map_batches
    (shift/mask over numpy int64); the top-k is a per-batch prune to
    its own k smallest followed by ONE single-partition merge of
    O(blocks × k) rows — no global sort shuffle. (A full layout
    rewrite would feed the code into write_partitioned_resumable as
    the partition key; the graded query pins the code + ordering
    semantics.)"""
    mask = (1 << bits) - 1

    def code(t: pa.Table) -> pa.Table:
        x = x_of(t) & mask
        y = y_of(t) & mask
        z = np.zeros(len(x), np.int64)
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        cols = {c: t.column(c) for c in id_cols}
        cols["zcode"] = pa.array(z, pa.int64())
        return pa.table(cols)

    out_cols = id_cols + ["zcode"]
    sort_keys = ["zcode"] + id_cols

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(sort_keys, kind="mergesort").head(k)

    return (ds.map_batches(code, batch_format="pyarrow")
              .map_batches(prune, batch_format="pandas")
              .repartition(1)
              .map_batches(prune, batch_format="pandas")
              .select_columns(out_cols))


def apriori_triples(ds, group_col: str, item_col: str,
                    min_support: int = 2, num_partitions: int = 32):
    """Level-3 frequent itemsets (Apriori, Agrawal & Srikant 1994):
    every item TRIPLE (a < b < c) co-occurring in at least
    ``min_support`` baskets. Candidate generation uses the Apriori
    property — a triple is emitted only when all three of its pairs
    are frequent — which changes the WORK, never the RESULT (support
    monotonicity: a frequent triple's sub-pairs are frequent), so the
    SQL twin is simply the triple self-join with HAVING. All integer
    counts. Returns (item_a, item_b, item_c, support).

    Scale shape: the pairwise level reuses cooccurrence_pairs (two
    keyed exchanges); the frequent-pair set is BROADCAST once as a
    sorted encoded array (O(F2), the Apriori frontier, not the data);
    one basket-keyed exchange emits pruned triples (per-basket loop
    bounded by basket size — lineitem baskets ≤7 distinct items) and
    one item-keyed exchange counts support. Shuffle volume is pruned
    triples, never baskets³."""
    import itertools

    import pandas as pd
    import ray

    from .shuffles import int_part_map

    f2 = cooccurrence_pairs(ds, group_col, item_col,
                            min_support=min_support,
                            num_partitions=num_partitions)
    parts = [pa.table(b) for b in
             f2.iter_batches(batch_format="pyarrow")]
    empty = pa.table({"item_a": pa.array([], pa.int64()),
                      "item_b": pa.array([], pa.int64()),
                      "item_c": pa.array([], pa.int64()),
                      "support": pa.array([], pa.int64())})
    if not parts:
        return empty
    cat = pa.concat_tables(parts)
    if cat.num_rows == 0:
        return empty
    pa_, pb_ = (cat.column("item_a").to_numpy(zero_copy_only=False),
                cat.column("item_b").to_numpy(zero_copy_only=False))
    f2_keys_ref = ray.put(np.sort((pa_.astype(np.int64) << np.int64(31))
                                  | pb_.astype(np.int64)))

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "g": t.column(group_col).cast(pa.int64()),
            "i": t.column(item_col).cast(pa.int64())})

    def emit_triples(df: pd.DataFrame) -> pd.DataFrame:
        z = np.array([], np.int64)
        out = {"x": z, "y": z, "zz": z}
        if not len(df):
            return pd.DataFrame(out)
        keys = ray.get(f2_keys_ref)

        def freq(a: int, b: int) -> bool:
            k = (a << 31) | b
            j = np.searchsorted(keys, k)
            return j < len(keys) and keys[j] == k

        g = df["g"].to_numpy(np.int64)
        i = df["i"].to_numpy(np.int64)
        o = np.lexsort((i, g))
        g, i = g[o], i[o]
        keep = np.ones(len(g), bool)
        keep[1:] = (g[1:] != g[:-1]) | (i[1:] != i[:-1])
        g, i = g[keep], i[keep]
        starts = np.concatenate(
            ([0], np.flatnonzero(g[1:] != g[:-1]) + 1, [len(g)]))
        xs, ys, zs = [], [], []
        for s, e in zip(starts[:-1], starts[1:]):
            items = i[s:e]
            if len(items) < 3:
                continue
            for a, b, c in itertools.combinations(items.tolist(), 3):
                if freq(a, b) and freq(a, c) and freq(b, c):
                    xs.append(a)
                    ys.append(b)
                    zs.append(c)
        return pd.DataFrame({"x": np.array(xs, np.int64),
                             "y": np.array(ys, np.int64),
                             "zz": np.array(zs, np.int64)})

    triples = int_part_map(ds.map_batches(prep, batch_format="pyarrow"),
                           "g", emit_triples,
                           num_partitions=num_partitions)

    def count_triples(df: pd.DataFrame) -> pd.DataFrame:
        z = np.array([], np.int64)
        if not len(df):
            return pd.DataFrame({"item_a": z, "item_b": z,
                                 "item_c": z, "support": z})
        x = df["x"].to_numpy(np.int64)
        y = df["y"].to_numpy(np.int64)
        w = df["zz"].to_numpy(np.int64)
        o = np.lexsort((w, y, x))
        x, y, w = x[o], y[o], w[o]
        new = np.ones(len(x), bool)
        new[1:] = (x[1:] != x[:-1]) | (y[1:] != y[:-1]) | \
            (w[1:] != w[:-1])
        st = np.flatnonzero(new)
        cnt = np.diff(np.append(st, len(x)))
        sel = cnt >= min_support
        return pd.DataFrame({"item_a": x[st][sel],
                             "item_b": y[st][sel],
                             "item_c": w[st][sel],
                             "support": cnt[sel].astype(np.int64)})

    res = int_part_map(triples, "x", count_triples,
                       num_partitions=num_partitions)
    tabs = [pa.table(b) for b in
            res.iter_batches(batch_format="pyarrow")]
    live = [t for t in tabs if t.num_rows]
    # O(result) rows: concat to a schema-carrying Table (all-empty
    # Datasets lose their columns at to_pandas — session-2 landmine)
    return pa.concat_tables(live) if live else empty


def item_item_cosine(ds, group_col: str, item_col: str,
                     min_support: int = 2, num_partitions: int = 32):
    """Item-item COSINE similarity from co-occurrence counts — the
    classic item-based collaborative-filtering similarity (Sarwar et
    al. 2001, binarized): cos(i, j) = c_ij / √(n_i·n_j) over basket
    membership, for pairs with support ≥ ``min_support``. BIT-EXACT:
    c_ij and the per-item basket counts n_i are exact integers and
    the finish is one correctly-rounded sqrt + ONE division (the
    welch convention). Returns (item_a, item_b, support, cosine)
    sorted.

    Scale shape: pair supports reuse cooccurrence_pairs (two keyed
    exchanges); per-item basket counts take ONE item-keyed exchange
    (all (basket, item) rows of an item co-locate, so
    within-partition distinct is global); the O(items) count map is
    BROADCAST once (ray.put) and each pair batch finishes itself —
    pairs never collect on the driver."""
    import pandas as pd
    import ray

    from .shuffles import int_part_map

    pairs = cooccurrence_pairs(ds, group_col, item_col,
                               min_support=min_support,
                               num_partitions=num_partitions)

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "g": t.column(group_col).cast(pa.int64()),
            "i": t.column(item_col).cast(pa.int64())})

    def item_counts(df: pd.DataFrame) -> pd.DataFrame:
        z = np.array([], np.int64)
        if not len(df):
            return pd.DataFrame({"i": z, "n": z})
        g = df["g"].to_numpy(np.int64)
        i = df["i"].to_numpy(np.int64)
        o = np.lexsort((g, i))
        g, i = g[o], i[o]
        keep = np.ones(len(g), bool)
        keep[1:] = (i[1:] != i[:-1]) | (g[1:] != g[:-1])
        g, i = g[keep], i[keep]
        st = np.flatnonzero(np.concatenate(([True], i[1:] != i[:-1])))
        return pd.DataFrame({"i": i[st],
                             "n": np.diff(np.append(st, len(i)))
                             .astype(np.int64)})

    cnt_parts = [pa.table(b) for b in
                 int_part_map(ds.map_batches(prep,
                                             batch_format="pyarrow"),
                              "i", item_counts,
                              num_partitions=num_partitions)
                 .iter_batches(batch_format="pyarrow")]
    live = [t for t in cnt_parts if t.num_rows]
    empty = pa.table({"item_a": pa.array([], pa.int64()),
                      "item_b": pa.array([], pa.int64()),
                      "support": pa.array([], pa.int64()),
                      "cosine": pa.array([], pa.float64())})
    if not live:
        return empty
    cm = pa.concat_tables(live)
    items = cm.column("i").to_numpy(zero_copy_only=False)
    ns = cm.column("n").to_numpy(zero_copy_only=False)
    o = np.argsort(items, kind="stable")
    cnt_ref = ray.put((items[o], ns[o]))

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        it, nn = ray.get(cnt_ref)
        a = t.column("item_a").to_numpy(zero_copy_only=False)
        b = t.column("item_b").to_numpy(zero_copy_only=False)
        sup = t.column("support").to_numpy(zero_copy_only=False)
        na = nn[np.searchsorted(it, a)]
        nb = nn[np.searchsorted(it, b)]
        cos = sup.astype(np.float64) / np.sqrt(
            (na * nb).astype(np.float64))
        return pa.table({"item_a": pa.array(a), "item_b": pa.array(b),
                         "support": pa.array(sup),
                         "cosine": pa.array(cos)})

    tabs = [pa.table(x) for x in
            pairs.map_batches(finish, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")]
    live2 = [t for t in tabs if t.num_rows]
    if not live2:
        return empty
    return pa.concat_tables(live2).sort_by(
        [("item_a", "ascending"), ("item_b", "ascending")])


def cdc_apply(ds, key_col: str = "key", ts_col: str = "ts_us",
              seq_col: str = "seq", op_col: str = "op",
              val_col: str = "cents", delete_op: str = "D"):
    """Change-data-capture snapshot: apply an insert/update/delete op
    log in (ts, seq) order and emit the final per-key state — the
    tombstone-aware sibling of merge_upsert (SCD-1 keeps the last
    value; CDC additionally DROPS keys whose last op is a delete).
    Values/timestamps are copied, never combined — exact.

    Scale shape: ONE key-keyed raw-task exchange; per-partition
    lexsort by (key, ts, seq) + segmented last-row pick, no per-row
    Python. Returns (key, cents, ts_us) for keys whose final op is
    not the tombstone."""
    import pandas as pd

    from .shuffles import int_part_map

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "key": np.array([], np.int64),
                "cents": np.array([], np.int64),
                "ts_us": np.array([], np.int64)})
        k = df[key_col].to_numpy(np.int64)
        t = df[ts_col].to_numpy(np.int64)
        s = df[seq_col].to_numpy(np.int64)
        op = df[op_col].to_numpy()
        v = df[val_col].to_numpy(np.int64)
        order = np.lexsort((s, t, k))
        k, t, op, v = k[order], t[order], op[order], v[order]
        last = np.concatenate(
            (np.flatnonzero(k[1:] != k[:-1]), [len(k) - 1]))
        keep = last[op[last] != delete_op]
        return pd.DataFrame({"key": k[keep], "cents": v[keep],
                             "ts_us": t[keep]})

    return int_part_map(ds, key_col, per_partition)


def consistent_hash_assign(ds, key_col: str, n_servers: int = 8,
                           n_vnodes: int = 16):
    """Consistent-hashing ring assignment audit: each key lands on
    the server owning the first ring position clockwise from the
    key's hash — the shard-placement primitive behind distributed
    caches/stores, made exactly reproducible with 63-bit md5
    positions (ring vnode r of server i at
    md5_low64(f"s{i}:{r}") & (2^63−1); key k at
    md5_low64(str(k)) & (2^63−1); wraparound to the smallest ring
    position). Exact integers; the md5 convention is the
    fingerprint/simhash twin's.

    Scale shape: the ring (n_servers × n_vnodes positions) is built
    once per process and the per-batch lookup is ONE searchsorted —
    stateless, NO shuffle. Returns (key, server, ring_pos)."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    MASK = (1 << 63) - 1
    pos = []
    srv = []
    for i in range(n_servers):
        for r in range(n_vnodes):
            h = int.from_bytes(hashlib.md5(
                f"s{i}:{r}".encode()).digest()[8:], "little") & MASK
            pos.append(h)
            srv.append(f"s{i}")
    order = np.argsort(np.array(pos, np.uint64))
    ring_pos = np.array(pos, np.uint64)[order]
    ring_srv = np.array(srv, dtype=object)[order]

    def kern(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        h = np.array([int.from_bytes(hashlib.md5(
            str(int(kk)).encode()).digest()[8:], "little") & MASK
            for kk in keys], np.uint64)
        idx = np.searchsorted(ring_pos, h, side="left")
        idx = np.where(idx == len(ring_pos), 0, idx)  # wraparound
        return pa.table({
            key_col: pa.array(keys),
            "server": pa.array(ring_srv[idx].tolist()),
            "ring_pos": pa.array(ring_pos[idx].view(np.int64))})

    return ds.map_batches(kern, batch_format="pyarrow")


def partition_skew(ds, key_col: str, n_partitions: int = 64):
    """Partition-skew audit: md5-hash every key into
    ``key % n_partitions`` buckets and report per-partition row
    counts — the load-balance check behind every keyed exchange in
    this engine (a skewed key column is the single biggest
    multi-node risk the SCALE.md plan calls out). 63-bit md5
    partition ids are SQL-replayable; exact integer counts via a
    per-batch bincount combiner, NO shuffle. Returns
    (partition_id, n_rows) for non-empty partitions."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    P = int(n_partitions)

    def partial(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        uk, inv = np.unique(keys, return_inverse=True)
        hu = np.array([int.from_bytes(hashlib.md5(
            str(int(x)).encode()).digest()[8:], "little")
            & ((1 << 63) - 1) for x in uk], np.int64)
        pid = (hu % P)[inv]
        n = np.bincount(pid, minlength=P).astype(np.int64)
        return pa.table({"partition_id": pa.array(
            np.arange(P, dtype=np.int64)), "n_rows": pa.array(n)})

    acc = np.zeros(P, np.int64)
    for b in ds.map_batches(partial, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        pid = t.column("partition_id").to_numpy(zero_copy_only=False)
        n = t.column("n_rows").to_numpy(zero_copy_only=False)
        np.add.at(acc, pid, n)
    keep = np.flatnonzero(acc > 0)
    return pa.table({"partition_id": pa.array(keep.astype(np.int64)),
                     "n_rows": pa.array(acc[keep])})


def bitmap_index(ds, value_col: str, key_col: str, chunk_bits: int = 63):
    """Bitmap-index build: for every distinct ``value_col`` value, the
    set of ``key_col`` ids packed into 63-bit chunk words (chunk =
    key // 63, bit = key % 63) — the columnar secondary-index layout
    (roaring/bitmap indexes) as an exact-integer op: per-batch OR
    combiner, driver ORs O(values × chunks) words, NO shuffle.
    Returns (value, chunk, bits, n_set) sorted — n_set is the word's
    popcount, so Σ n_set per value is the exact distinct-key count."""
    import pyarrow as pa

    C = int(chunk_bits)

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(value_col).combine_chunks().dictionary_encode()
        codes = v.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        vals = v.dictionary.to_pylist()
        k = t.column(key_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        chunk = k // C
        bit = np.int64(1) << (k % C)
        cu, cinv = np.unique(chunk, return_inverse=True)
        cell = codes * np.int64(len(cu)) + cinv
        uc, inv2 = np.unique(cell, return_inverse=True)
        bits = np.zeros(len(uc), np.int64)
        np.bitwise_or.at(bits, inv2, bit)
        return pa.table({
            "value": pa.array([str(vals[x]) for x in uc // len(cu)]),
            "chunk": pa.array(cu[uc % len(cu)]),
            "bits": pa.array(bits)})

    acc: dict = {}
    for b in ds.map_batches(partial, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow"):
        tb = pa.table(b)
        for i in range(tb.num_rows):
            kk = (tb.column("value")[i].as_py(),
                  int(tb.column("chunk")[i].as_py()))
            acc[kk] = acc.get(kk, 0) | int(tb.column("bits")[i].as_py())
    ks = sorted(acc)
    return pa.table({
        "value": pa.array([k[0] for k in ks]),
        "chunk": pa.array([k[1] for k in ks], pa.int64()),
        "bits": pa.array([acc[k] for k in ks], pa.int64()),
        "n_set": pa.array([bin(acc[k]).count("1") for k in ks],
                          pa.int64())})


def golden_record(ds, key_col: str, prio_col: str, ts_col: str,
                  seq_col: str, field_cols: list):
    """MDM survivorship ("golden record"): per key, each field takes
    its value from the first NON-NULL row in (priority asc, ts desc,
    seq desc) order — the multi-source entity-consolidation rule
    (best source wins, recency breaks ties, nulls never overwrite).
    Values are copied, never combined — exact.

    Scale shape: ONE key-keyed exchange; per-partition lexsort +
    per-field first-valid pick (pandas first() skips NaN/None at C
    speed). Returns (key, n_rows, *field_cols)."""
    import pandas as pd

    from .shuffles import int_part_map

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            out = {key_col: np.array([], np.int64),
                   "n_rows": np.array([], np.int64)}
            for f in field_cols:
                out[f] = np.array([], object)
            return pd.DataFrame(out)
        df = df.sort_values([key_col, prio_col, ts_col, seq_col],
                            ascending=[True, True, False, False],
                            kind="mergesort")
        g = df.groupby(key_col, sort=True)
        out = g.agg(**{f: (f, "first") for f in field_cols})
        out["n_rows"] = g.size()
        return out.reset_index()[[key_col, "n_rows"] + field_cols]

    return int_part_map(ds, key_col, per_key)
