"""Temporal (as-of) and range (interval) joins — operators Ray Data has
no native form for, re-expressed per the round brief's custom-operator
ladder: broadcast + ``map_batches`` where one side is small, else a
keyed co-partitioning shuffle via ``groupby(key).map_groups``.

The reference has only exact joins (client-side lookups,
SURVEY §2.8); these extend the engine for the log-analytics /
training-data shapes the 100 TB brief calls out (as-of join, range
join). Partitioning assumptions are documented per op.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


# ---------------------------------------------------------------------------
# As-of join, broadcast form (small right side)
# ---------------------------------------------------------------------------

def asof_join_broadcast(ds, right: pd.DataFrame, left_on: str,
                        right_on: str, right_cols: list[str]):
    """For each left row, attach the right row with the LARGEST
    ``right_on`` <= ``left_on`` (DuckDB ``ASOF JOIN`` / pandas
    ``merge_asof`` semantics, inner: unmatched left rows are dropped).

    Scale shape: the right side is a dimension table (rate tables,
    config epochs — thousands of rows); it is ``ray.put`` ONCE and every
    batch does one vectorized ``np.searchsorted`` against it. No
    shuffle; the left side streams.
    """
    right = right.sort_values(right_on, kind="mergesort").reset_index(drop=True)
    # int64 µs domain for searchsorted (timestamps) or raw float/int
    rk = _as_orderable(right[right_on].to_numpy())
    rref = ray.put((rk, {c: right[c].to_numpy() for c in right_cols}))

    def attach(t: pa.Table) -> pa.Table:
        keys, vals = ray.get(rref)
        lk = _as_orderable(_col_np(t, left_on))
        idx = np.searchsorted(keys, lk, side="right") - 1
        keep = idx >= 0
        out = t.filter(pa.array(keep))
        idx = idx[keep]
        for c, arr in vals.items():
            out = out.append_column(c, pa.array(arr[idx]))
        return out

    return ds.map_batches(attach, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# As-of join, keyed form (both sides large)
# ---------------------------------------------------------------------------

def asof_join_keyed(left_ds, right_ds, key: str, left_on: str,
                    right_on: str, left_cols: list[str],
                    right_cols: list[str], shuffle: str = "auto",
                    num_partitions: int = 64):
    """Distributed as-of join: for each left row, the right row of the
    SAME ``key`` with the largest ``right_on`` <= ``left_on`` (inner).

    Scale shape: tag each side, align schemas, ``union``, then ONE
    keyed shuffle co-partitions both sides. Two shuffle routes:

    - ``"hash"`` (default for integer keys): the raw-task hash shuffle
      (``shuffles.int_part_map``), ``key % P`` partitioning, and ONE
      vectorized ``pd.merge_asof(..., by=key)`` over ALL keys of the
      partition at once — no per-group pandas dispatch, no sort-barrier
      sampling. Eager-execution caveat as per shuffles module docstring.
    - ``"sort"`` (default for non-integer keys): native
      ``groupby(key).map_groups`` with a per-group sorted merge_asof.

    Assumption (documented, same as sessionization): one PARTITION's
    rows fit a worker — keys here are users/hosts, not the whole table.
    Right-side timestamp ties are broken deterministically BEFORE the
    join (keep the largest ``right_cols`` tuple per ``(key, right_on)``),
    so output does not depend on shuffle arrival order.
    """
    lt = left_ds.select_columns(list(dict.fromkeys([key, left_on] + left_cols)))
    rt = right_ds.select_columns(list(dict.fromkeys([key, right_on] + right_cols)))
    lschema, rschema = lt.schema(), rt.schema()
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))

    def tag_left(t: pa.Table) -> pa.Table:
        t = t.rename_columns([("__on" if c == left_on else c)
                              for c in t.column_names])
        for c in right_cols:
            t = t.append_column(c, pa.nulls(t.num_rows, rtypes[c]))
        return t.append_column("__side", pa.array([0] * t.num_rows, pa.int8()))

    def tag_right(t: pa.Table) -> pa.Table:
        t = t.rename_columns([("__on" if c == right_on else c)
                              for c in t.column_names])
        for c in left_cols:
            t = t.append_column(c, pa.nulls(t.num_rows, ltypes[c]))
        return t.append_column("__side", pa.array([1] * t.num_rows, pa.int8()))

    cols = [key, "__on"] + left_cols + right_cols + ["__side"]
    u = (lt.map_batches(tag_left, batch_format="pyarrow")
           .select_columns(cols)
         .union(rt.map_batches(tag_right, batch_format="pyarrow")
                  .select_columns(cols)))

    out_cols = [key, "__on"] + left_cols + right_cols

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["__side"] == 0]
        r = g[g["__side"] == 1]
        # deterministic right-tie break: among equal __on, keep the row
        # with the LARGEST right_cols tuple (lexicographic) — input
        # arrival order never leaks into the result
        r = (r.sort_values(["__on"] + right_cols, kind="mergesort")
              .drop_duplicates("__on", keep="last"))
        l = l.sort_values("__on", kind="mergesort")
        m = pd.merge_asof(l[[key, "__on"] + left_cols],
                          r[["__on"] + right_cols], on="__on")
        m = m.dropna(subset=right_cols[:1])  # inner semantics
        return m[out_cols]

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        """One vectorized merge_asof(by=key) across every key in the
        partition — same semantics as per_key, zero per-group calls."""
        l = df[df["__side"] == 0]
        r = df[df["__side"] == 1]
        r = (r.sort_values([key, "__on"] + right_cols, kind="mergesort")
              .drop_duplicates([key, "__on"], keep="last"))
        # merge_asof(by=...) requires BOTH frames globally sorted on __on
        l = l.sort_values("__on", kind="mergesort")
        r = r.sort_values("__on", kind="mergesort")
        m = pd.merge_asof(l[[key, "__on"] + left_cols],
                          r[[key, "__on"] + right_cols], on="__on", by=key)
        m = m.dropna(subset=right_cols[:1])  # inner semantics
        return m[out_cols]

    if shuffle == "auto":
        shuffle = "hash" if pa.types.is_integer(ltypes[key]) else "sort"
    if shuffle == "hash":
        from .shuffles import int_part_map
        out = int_part_map(u, key, per_part, num_partitions=num_partitions)
    else:
        out = u.groupby(key).map_groups(per_key, batch_format="pandas")

    # restore source arrow types: the union's typed nulls float int
    # columns through pandas, and map_groups re-infers timestamps as ns
    want = pa.schema(
        [(key, ltypes[key]), ("__on", ltypes[left_on])]
        + [(c, ltypes[c]) for c in left_cols]
        + [(c, rtypes[c]) for c in right_cols])

    def recast(t: pa.Table) -> pa.Table:
        return pa.table({f.name: t.column(f.name).cast(f.type) for f in want})

    return out.map_batches(recast, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Interval (range) join, broadcast form
# ---------------------------------------------------------------------------

def interval_join_broadcast(ds, intervals: pd.DataFrame, value_col: str,
                            lo_col: str = "lo", hi_col: str = "hi",
                            tag_cols: list[str] | None = None):
    """Inner range join: one output row per (left row, interval) with
    ``lo <= value < hi``. Intervals MAY overlap (a row can match
    several).

    Scale shape: the interval table is small (tiers, buckets, SLAs) —
    broadcast once; each batch evaluates one vectorized mask per
    interval (O(|intervals|) kernels per batch, no shuffle). For large
    NON-overlapping interval sets this reduces to one ``searchsorted``
    (use :func:`asof_join_broadcast` on ``lo`` and post-filter on
    ``hi``).
    """
    tag_cols = tag_cols or [c for c in intervals.columns
                            if c not in (lo_col, hi_col)]
    iv = ray.put((intervals[lo_col].to_numpy(),
                  intervals[hi_col].to_numpy(),
                  {c: intervals[c].to_numpy() for c in tag_cols}))

    def attach(t: pa.Table) -> pa.Table:
        lo, hi, tags = ray.get(iv)
        v = _col_np(t, value_col)
        parts, tagged = [], {c: [] for c in tags}
        for j in range(len(lo)):
            m = (v >= lo[j]) & (v < hi[j])
            if not m.any():
                continue
            piece = t.filter(pa.array(m))
            parts.append(piece)
            for c in tags:
                tagged[c].append(np.repeat(tags[c][j], piece.num_rows))
        if not parts:
            out = t.slice(0, 0)
            for c in tags:
                out = out.append_column(c, pa.array(tags[c]).slice(0, 0))
            return out
        out = pa.concat_tables(parts)
        for c in tags:
            out = out.append_column(c, pa.array(np.concatenate(tagged[c])))
        return out

    return ds.map_batches(attach, batch_format="pyarrow")


# ---------------------------------------------------------------------------

def _col_np(t: pa.Table, name: str) -> np.ndarray:
    return t.column(name).to_numpy(zero_copy_only=False)


def _as_orderable(a: np.ndarray) -> np.ndarray:
    """datetime64 → int64 µs so searchsorted domains always align."""
    if np.issubdtype(a.dtype, np.datetime64):
        return a.astype("datetime64[us]").astype(np.int64)
    return a


# ---------------------------------------------------------------------------
# Approximate string join: blocked banded-Levenshtein pairs
# ---------------------------------------------------------------------------

def _edit_distances_banded(s1_mat: np.ndarray, l1: np.ndarray,
                           s2_mat: np.ndarray, l2: np.ndarray,
                           k: int) -> np.ndarray:
    """Levenshtein distance for P string pairs simultaneously, exact up
    to ``k`` (pairs beyond the band report k+1). Ukkonen's diagonal
    band vectorized ACROSS the pair axis: the DP state is a (P, 2k+1)
    int matrix (band offset d = j - i + k); the loops run over string
    POSITIONS (max len) and band offsets (2k+1), never over pairs.
    Inputs: uint8 char matrices right-padded, per-pair lengths.
    Caller guarantees l1 >= l2 and l1 - l2 <= k (cheap prefilters)."""
    P = len(l1)
    INF = np.int64(k + 1)
    width = 2 * k + 1
    row = np.full((P, width), INF)
    # dp[0][j] = j for j <= k  (offset d = j + k - 0... i=0: d = j + k)
    for j in range(0, k + 1):
        row[:, j + k] = np.minimum(j, INF)
    out = np.full(P, INF)
    done0 = l1 == 0
    out[done0] = np.minimum(l2[done0], INF)  # empty s1: distance = l2
    max_l1 = int(l1.max()) if P else 0
    for i in range(1, max_l1 + 1):
        prev = row
        row = np.full((P, width), INF)
        c1 = s1_mat[:, i - 1]  # current char of s1 (garbage past l1;
        # masked because finished pairs never update `out` again)
        for d in range(width):
            j = i + d - k  # actual column this offset represents
            if j < 0:
                continue
            jj = np.int64(j)
            # j must be within [0, l2] per pair
            valid = (jj <= l2) & (np.int64(i) <= l1)
            if not valid.any():
                continue
            if j == 0:
                cand = np.full(P, INF)
                cand[valid] = np.minimum(np.int64(i), INF)
            else:
                # delete from s1: dp[i-1][j] -> prev offset d+1
                cand = (prev[:, d + 1] if d + 1 < width
                        else np.full(P, INF)) + 1
                # insert into s1: dp[i][j-1] -> same row offset d-1
                if d - 1 >= 0:
                    cand = np.minimum(cand, row[:, d - 1] + 1)
                # substitute/match: dp[i-1][j-1] -> prev same offset d
                sub = prev[:, d] + (c1 != s2_mat[:, j - 1])
                cand = np.minimum(cand, sub)
            cand = np.minimum(cand, INF)
            row[:, d] = np.where(valid, cand, INF)
        fin = l1 == i
        if fin.any():
            dres = l2[fin] - l1[fin] + k  # offset of (l1, l2)
            out[fin] = row[fin, dres]
    return out


def edit_distance_pairs(ds, block_col: str, text_col: str, id_col: str,
                        max_dist: int = 2, num_partitions: int = 64):
    """Approximate-string join: all within-block pairs whose
    Levenshtein distance is <= ``max_dist`` — the record-linkage /
    entity-resolution primitive (the reference fuzzy-matches location
    names with substring heuristics, enhanced-deduplication.service.js
    similarity; this is the principled form). Returns a Dataset
    (id_a, id_b, dist) with id_a < id_b.

    Scale shape: one hash exchange on ``block_col`` (the blocking key
    — same idiom as the fuzzy-dedup host blocking), then per block a
    vectorized candidate generation (length-difference <= max_dist
    prefilter on the sorted length array, O(pairs) not O(n^2) when
    lengths spread) and ONE banded DP over all surviving pairs at
    once (_edit_distances_banded: loops over string positions x band
    width, never over pairs). Exact: band width 2k+1 covers every
    distance <= k; prefiltered pairs can only be > k.
    """
    import pandas as pd
    from .shuffles import int_part_map
    from ..functions.hashing import hash64_many

    def per_block(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        txt = g[text_col].astype(str).tolist()
        n = len(txt)
        empty = pd.DataFrame({"id_a": np.array([], np.int64),
                              "id_b": np.array([], np.int64),
                              "dist": np.array([], np.int64)})
        if n < 2:
            return empty
        bs = [t.encode("utf-8") for t in txt]
        ln = np.array([len(b) for b in bs], np.int64)
        L = int(ln.max()) if n else 0
        mat = np.zeros((n, max(L, 1)), np.uint8)
        for r, b in enumerate(bs):
            mat[r, : len(b)] = np.frombuffer(b, np.uint8)
        # candidates: upper-triangle pairs with |len diff| <= k
        ii, jj = np.triu_indices(n, 1)
        keep = np.abs(ln[ii] - ln[jj]) <= max_dist
        ii, jj = ii[keep], jj[keep]
        if not len(ii):
            return empty
        # orient so s1 is the longer string (band assumes l1 >= l2)
        swap = ln[ii] < ln[jj]
        a = np.where(swap, jj, ii)
        b = np.where(swap, ii, jj)
        d = _edit_distances_banded(mat[a], ln[a], mat[b], ln[b],
                                   max_dist)
        hit = d <= max_dist
        ia, ib = ids[ii[hit]], ids[jj[hit]]
        lo = np.minimum(ia, ib)
        hi = np.maximum(ia, ib)
        out = pd.DataFrame({"id_a": lo, "id_b": hi,
                            "dist": d[hit].astype(np.int64)})
        return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        # a hash partition can hold several blocks (collisions only
        # co-locate); run the pair kernel per ORIGINAL block key
        outs = [per_block(g) for _, g in df.groupby(block_col,
                                                    sort=True)]
        if not outs:
            return per_block(df)  # empty partition: schema from kernel
        return pd.concat(outs, ignore_index=True)

    def prepare(t: pa.Table) -> pa.Table:
        # int64 partition key from the (arbitrary-typed) block column,
        # computed inside the split tasks (shuffles.int_part_map's
        # schema-stable reduce runs the kernel on EMPTY partitions too,
        # unlike hash_map_groups whose key-less partitions surface
        # input-schema blocks that empty-block-skipping map_batches
        # can never normalize)
        kv = hash64_many([str(v) for v in
                          t.column(block_col).to_pylist()])
        return t.append_column("__blk",
                               pa.array(kv.view(np.int64)))

    return int_part_map(ds, "__blk", per_partition,
                        num_partitions=num_partitions, prepare=prepare)


# ---------------------------------------------------------------------------
# Spatial distance join: grid-cell blocked planar near-pairs
# ---------------------------------------------------------------------------

def grid_distance_pairs(ds, id_col: str, lat_col: str, lon_col: str,
                        radius_deg: float, cos_ref: float = 0.75,
                        num_partitions: int = 64):
    """Spatial self-join: all pairs within ``radius_deg`` under the
    equirectangular metric dist^2 = (dlat)^2 + (dlon*cos_ref)^2 — the
    location-data near-pair primitive (the reference dedups locations
    by exact coordinate match, enhanced-deduplication.service.js;
    this is the radius form its geo data calls for). ``cos_ref`` is a
    FIXED literal latitude-correction factor, so the whole predicate
    is subtractions/multiplies/one add — correctly-rounded IEEE,
    bit-identical to a SQL twin (no trig, no sqrt: compare squared).

    Scale shape: the classic grid-cell blocking. Each point lands in
    cell (floor(lat/s), floor(lon/(s/cos_ref))) with s = radius_deg,
    so any qualifying pair's cells differ by <= 1 per axis; every
    point is replicated to its 3x3 cell neighborhood (constant 9x)
    and ONE keyed exchange co-locates candidates. Each pair is
    counted exactly once: the kernel scores a pair only in the
    lexicographically-smaller of the two home cells. Per cell the
    candidate set is O(density), never O(n).

    Returns a pyarrow Table (id_a, id_b, dist2) with id_a < id_b,
    sorted; dist2 is the exact squared degree distance.
    """
    import pandas as pd
    from .shuffles import int_part_map

    s_lat = float(radius_deg)
    s_lon = float(radius_deg) / float(cos_ref)
    r2 = float(radius_deg) * float(radius_deg)
    C = np.int64(1 << 20)  # cell key packing (lat cells offset-folded)

    def replicate(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        la = t.column(lat_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        lo = t.column(lon_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        cx = np.floor(la / s_lat).astype(np.int64)
        cy = np.floor(lo / s_lon).astype(np.int64)
        home = (cx + C // 2) * C + (cy + C // 2)
        outs = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                cell = (cx + dx + C // 2) * C + (cy + dy + C // 2)
                outs.append(pa.table({
                    "cell": pa.array(cell), "home": pa.array(home),
                    "id": pa.array(ids), "la": pa.array(la),
                    "lo": pa.array(lo)}))
        return pa.concat_tables(outs)

    def per_cells(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": np.array([], np.int64),
                              "id_b": np.array([], np.int64),
                              "dist2": np.array([], np.float64)})
        if len(df) < 2:
            return empty
        outs = [empty]
        for cell, g in df.groupby("cell", sort=True):
            n = len(g)
            if n < 2:
                continue
            ids = g["id"].to_numpy(np.int64)
            la = g["la"].to_numpy(np.float64)
            lo = g["lo"].to_numpy(np.float64)
            hm = g["home"].to_numpy(np.int64)
            ii, jj = np.triu_indices(n, 1)
            # count each pair once: only in the smaller home cell
            keep = np.minimum(hm[ii], hm[jj]) == cell
            # drop same-point duplicates (a point replicated into this
            # cell 9x never pairs with itself: ids are unique)
            ii, jj = ii[keep], jj[keep]
            if not len(ii):
                continue
            dla = la[ii] - la[jj]
            dlo = (lo[ii] - lo[jj]) * float(cos_ref)
            d2 = dla * dla + dlo * dlo
            hit = d2 <= r2
            if not hit.any():
                continue
            a, b = ids[ii[hit]], ids[jj[hit]]
            outs.append(pd.DataFrame({
                "id_a": np.minimum(a, b), "id_b": np.maximum(a, b),
                "dist2": d2[hit]}))
        out = pd.concat(outs, ignore_index=True)
        # a pair replicated into the same partition through several
        # cells is impossible (unique counting cell), but two points
        # sharing coordinates are fine — ids differ
        return out

    pairs = int_part_map(
        ds.map_batches(replicate, batch_format="pyarrow"),
        "cell", per_cells, num_partitions=num_partitions)
    tabs = [pa.table(b) for b in
            pairs.iter_batches(batch_format="pyarrow")]
    if not tabs:
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64()),
                         "dist2": pa.array([], pa.float64())})
    return pa.concat_tables(tabs).sort_by(
        [("id_a", "ascending"), ("id_b", "ascending")])


def stream_window_join(ds, key_col: str, ts_col: str, id_col: str,
                       type_col: str, left_type: str, right_type: str,
                       window_us: int, num_partitions: int = 32):
    """STREAM-STREAM time-window equi-join: pair every ``left_type``
    event with every ``right_type`` event of the SAME key whose
    event-times differ by at most ``window_us`` — the Flink/Beam
    interval-join shape (each side buffers the other's window). Emits
    (key, left_id, right_id, dt_us = right − left), exact integer µs.

    Scale shape: ONE exchange keyed by ``key_col`` co-locates each
    key's events (the as-of join idiom); the kernel sorts both sides
    once per partition and emits pairs with two vectorized
    searchsorteds (lo/hi bounds per left row) + a repeat-gather — no
    per-row loop, output volume = true pair count. The window bound
    keeps state finite; at stream scale the same kernel runs per
    (key, coarse-time-bucket) with window-overlap replication."""
    from .shuffles import int_part_map

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "k": t.column(key_col).cast(pa.int64()),
            "t": pa.array(t.column(ts_col).to_numpy(zero_copy_only=False)
                          .astype("datetime64[us]").astype(np.int64)),
            "i": t.column(id_col).cast(pa.int64()),
            "s": pa.array(np.where(
                np.asarray(t.column(type_col).to_pandas()) == left_type,
                0, np.where(np.asarray(t.column(type_col).to_pandas())
                            == right_type, 1, -1)).astype(np.int64)),
        })

    w = np.int64(window_us)

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        z = np.array([], np.int64)
        empty = pd.DataFrame({"key": z, "left_id": z,
                              "right_id": z, "dt_us": z})
        df = df[df["s"].to_numpy(np.int64) >= 0]
        if not len(df):
            return empty
        k = df["k"].to_numpy(np.int64)
        t = df["t"].to_numpy(np.int64)
        i = df["i"].to_numpy(np.int64)
        s = df["s"].to_numpy(np.int64)
        L, R = s == 0, s == 1
        # rights sorted by (key, ts, id) for the windowed probe
        ro = np.lexsort((i[R], t[R], k[R]))
        rk, rt, ri = k[R][ro], t[R][ro], i[R][ro]
        if not len(rk) or not L.any():
            return empty
        lk, lt, li = k[L], t[L], i[L]
        # per-key slices of the right side
        ks = np.flatnonzero(np.concatenate(([True], rk[1:] != rk[:-1])))
        key_vals = rk[ks]
        key_end = np.append(ks[1:], len(rk))
        kpos = np.searchsorted(key_vals, lk)
        valid = (kpos < len(key_vals))
        valid[valid] = key_vals[kpos[valid]] == lk[valid]
        lk, lt, li, kpos = lk[valid], lt[valid], li[valid], kpos[valid]
        if not len(lk):
            return empty
        # rt is sorted only WITHIN each key slice, so the window
        # bisection runs per key slice (vectorized over that key's
        # lefts — the bounded per-group class); order lefts by key so
        # each slice is probed once
        lo_ = np.argsort(lk, kind="stable")
        lk, lt, li, kpos = lk[lo_], lt[lo_], li[lo_], kpos[lo_]
        lstarts = np.flatnonzero(np.concatenate(
            ([True], lk[1:] != lk[:-1])))
        lends = np.append(lstarts[1:], len(lk))
        lo = np.empty(len(lk), np.int64)
        hi = np.empty(len(lk), np.int64)
        for s0, e0 in zip(lstarts, lends):
            b, e = ks[kpos[s0]], key_end[kpos[s0]]
            seg = rt[b:e]
            lo[s0:e0] = b + np.searchsorted(seg, lt[s0:e0] - w,
                                            side="left")
            hi[s0:e0] = b + np.searchsorted(seg, lt[s0:e0] + w,
                                            side="right")
        cnt = hi - lo
        tot = int(cnt.sum())
        if tot == 0:
            return empty
        rep = np.repeat(np.arange(len(lk)), cnt)
        # index of each pair's right row: lo[rep] + intra-run offset
        offs = np.arange(tot) - np.repeat(
            np.cumsum(np.concatenate(([0], cnt[:-1]))), cnt)
        ridx = lo[rep] + offs
        return pd.DataFrame({"key": lk[rep], "left_id": li[rep],
                             "right_id": ri[ridx],
                             "dt_us": rt[ridx] - lt[rep]})

    return int_part_map(ds.map_batches(prep, batch_format="pyarrow"),
                        "k", per_partition,
                        num_partitions=num_partitions)


@ray.remote
def _snm_tail(tbl: pa.Table, name_col: str, id_col: str,
              w: int) -> pa.Table:
    n = tbl.num_rows
    return tbl.select([name_col, id_col]).slice(max(0, n - w))


@ray.remote
def _snm_block(tbl: pa.Table, prev_tail: pa.Table, name_col: str,
               id_col: str, w: int, max_dist: int) -> pa.Table:
    """Windowed candidate emit + banded verify over one sorted block
    prefixed with the previous w global rows; only pairs whose LATER
    element lies in this block are emitted (no double counting)."""
    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "dist": pa.array([], pa.int64())})
    tail_n = prev_tail.num_rows
    cat = pa.concat_tables([prev_tail,
                            tbl.select([name_col, id_col])])
    n = cat.num_rows
    if n < 2 or tbl.num_rows == 0:
        return empty
    ids = cat.column(id_col).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    txt = cat.column(name_col).to_pylist()
    bs = [str(t).encode("utf-8") for t in txt]
    ln = np.array([len(b) for b in bs], np.int64)
    L = max(int(ln.max()), 1)
    mat = np.zeros((n, L), np.uint8)
    for r, b in enumerate(bs):
        mat[r, : len(b)] = np.frombuffer(b, np.uint8)
    iis, jjs = [], []
    for d in range(1, w + 1):
        i = np.arange(0, n - d)
        j = i + d
        sel = j >= tail_n          # later element in THIS block
        iis.append(i[sel])
        jjs.append(j[sel])
    ii = np.concatenate(iis)
    jj = np.concatenate(jjs)
    keep = np.abs(ln[ii] - ln[jj]) <= max_dist
    ii, jj = ii[keep], jj[keep]
    if not len(ii):
        return empty
    swap = ln[ii] < ln[jj]
    a = np.where(swap, jj, ii)
    b = np.where(swap, ii, jj)
    dist = _edit_distances_banded(mat[a], ln[a], mat[b], ln[b],
                                  max_dist)
    hit = dist <= max_dist
    ia, ib = ids[ii[hit]], ids[jj[hit]]
    lo = np.minimum(ia, ib)
    hi = np.maximum(ia, ib)
    return pa.table({"id_a": pa.array(lo), "id_b": pa.array(hi),
                     "dist": pa.array(dist[hit].astype(np.int64))})


def sorted_neighborhood_pairs(ds, name_col: str, id_col: str,
                              window: int = 5, max_dist: int = 2):
    """Sorted-Neighborhood Method record linkage (Hernández & Stolfo
    1995): sort all records by the blocking key (here the name
    itself), slide a ``window``-rank window, and verify candidates
    with banded Levenshtein ≤ ``max_dist`` — the classic alternative
    to hash blocking (edit_distance_pairs) when typos cluster
    lexicographically. Returns a ``pyarrow.Table``
    (id_a, id_b, dist) with id_a < id_b, sorted.

    Scale shape: ONE distributed sample-ranged ``Dataset.sort``, then
    one raw task per sorted block; the cross-block boundary is handled
    by chaining each block's last ``window`` (name, id) rows through
    the driver (O(blocks × window) tiny tables) and prefixing the next
    block — pairs whose later element is in the block are emitted
    exactly once. The banded DP vectorizes across the candidate axis
    (the edit_distance_pairs kernel)."""
    sorted_ds = ds.sort([name_col, id_col]).materialize()
    refs = sorted_ds.to_arrow_refs()
    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "dist": pa.array([], pa.int64())})
    if not refs:
        return empty
    tails = ray.get([_snm_tail.remote(r, name_col, id_col, window)
                     for r in refs])
    running = tails[0].schema.empty_table()
    prev_tails = []
    for t in tails:
        prev_tails.append(running)
        cat = pa.concat_tables([running, t])
        running = cat.slice(max(0, cat.num_rows - window))
    outs = ray.get([_snm_block.remote(r, pt, name_col, id_col,
                                      window, max_dist)
                    for r, pt in zip(refs, prev_tails)])
    live = [t for t in outs if t.num_rows]
    if not live:
        return empty
    return pa.concat_tables(live).sort_by(
        [("id_a", "ascending"), ("id_b", "ascending"),
         ("dist", "ascending")])
