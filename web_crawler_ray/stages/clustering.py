"""Distributed k-means (Lloyd's) over an embedding column — the
cluster-based curation step of large training-data pipelines
(cluster-then-balance / SemDeDup-style semantic grouping, public
techniques). The reference engine has no clustering; this extends the
similarity family (SURVEY §2 LLM-pipeline add-ons) the same way ANN and
near-dup do.

Scale shape per iteration: centroids (k x dim floats) are ``ray.put``
ONCE and every batch computes assignments + per-cluster partial sums
vectorized (one matmul); the driver reduces k x dim partials per batch —
O(k * dim * n_batches) driver traffic, NO shuffle, the dataset streams.
Assignment is a final stateless map_batches pass.

Determinism: init = k-means++ on a bounded hash-sampled subset with a
FIXED seed (hash ordering decorrelates the sample from id/block layout,
so sequential/planted id ranges don't collapse the init into one blob);
partial sums are combined in a deterministic order (sorted by each
batch's min id) so float addition order — hence every centroid — is
reproducible run to run for a fixed dataset.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..functions.hashing import hash64_many


def _stack(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = a.values.to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(a), -1)


def _plusplus_init(sample: np.ndarray, k: int, seed: int) -> np.ndarray:
    """Deterministic k-means++ over the driver-side sample (m x dim)."""
    rng = np.random.default_rng(seed)
    idx = [int(rng.integers(len(sample)))]
    for _ in range(1, k):
        C = sample[idx]
        d2 = ((sample[:, None, :] - C[None]) ** 2).sum(-1).min(1)
        tot = d2.sum()
        p = d2 / tot if tot > 0 else None
        idx.append(int(rng.choice(len(sample), p=p)))
    return sample[idx].copy()


def kmeans_fit(ds, k: int = 4, iters: int = 10, col: str = "embedding",
               id_col: str = "vec_id", init_sample: int = 1024,
               seed: int = 0xC0FFEE) -> np.ndarray:
    """Fit k centroids with Lloyd's iterations; returns (k, dim) float64.

    Init: the ``init_sample`` rows with the smallest blake2b(id) (a
    deterministic uniform sample whatever the id/block layout — a
    driver pull bounded at m x dim floats), then k-means++ with a fixed
    seed. Empty clusters keep their previous centroid (deterministic,
    no reseeding). ``iters`` is fixed (no data-dependent stopping) so
    the pass count is known and the job is resumable mid-schedule.
    """
    def add_h(t: pa.Table) -> pa.Table:
        h = hash64_many([str(v) for v in t.column(id_col).to_pylist()])
        return t.append_column("__h", pa.array(h.astype(np.uint64)))

    samp = (ds.map_batches(add_h, batch_format="pyarrow")
              .sort("__h").limit(init_sample).to_pandas())
    sample = np.stack([np.asarray(v, np.float64) for v in samp[col]])
    cent = _plusplus_init(sample, k, seed)

    for _ in range(iters):
        ref = ray.put(cent)

        def partial(t: pa.Table) -> pa.Table:
            C = ray.get(ref)
            X = _stack(t.column(col))
            d2 = (X * X).sum(1)[:, None] - 2.0 * (X @ C.T)
            a = (d2 + (C * C).sum(1)[None, :]).argmin(1)
            sums = np.zeros_like(C)
            np.add.at(sums, a, X)
            counts = np.bincount(a, minlength=len(C)).astype(np.int64)
            order = np.int64(t.column(id_col).to_numpy().min())
            return pa.table({
                "cluster": pa.array(np.arange(len(C), dtype=np.int64)),
                "count": pa.array(counts),
                "sum": pa.array(list(sums), pa.list_(pa.float64())),
                "batch_min_id": pa.array(np.full(len(C), order)),
            })

        parts = (ds.map_batches(partial, batch_format="pyarrow")
                   .to_pandas())  # k rows per batch — small by design
        parts = parts.sort_values(["batch_min_id", "cluster"],
                                  kind="mergesort")
        sums = np.zeros_like(cent)
        counts = np.zeros(k, np.int64)
        for _, row in parts.iterrows():
            c = int(row["cluster"])
            sums[c] += np.asarray(row["sum"], np.float64)
            counts[c] += int(row["count"])
        nonzero = counts > 0
        cent = cent.copy()
        cent[nonzero] = sums[nonzero] / counts[nonzero, None]
    return cent


def kmeans_assign(ds, centroids: np.ndarray, col: str = "embedding",
                  id_col: str = "vec_id"):
    """Assign every row to its nearest centroid — stateless streaming
    map_batches against the broadcast (k x dim) matrix."""
    ref = ray.put(np.asarray(centroids, np.float64))

    def assign(t: pa.Table) -> pa.Table:
        C = ray.get(ref)
        X = _stack(t.column(col))
        d2 = (X * X).sum(1)[:, None] - 2.0 * (X @ C.T) + (C * C).sum(1)[None, :]
        return pa.table({
            id_col: t.column(id_col),
            "cluster": pa.array(d2.argmin(1).astype(np.int64)),
        })

    return ds.map_batches(assign, batch_format="pyarrow")


def dbscan_geo(pts_ds, eps_deg: float, min_pts: int,
               cos_ref: float = 0.75, id_col: str = "id",
               lat_col: str = "la", lon_col: str = "lo"):
    """Deterministic DBSCAN over 2-D coordinates under the
    equirectangular metric — density clustering with noise, the
    spatial sibling of k-means (Ester et al.; the first-found border
    assignment of the textbook algorithm is made order-free here:
    border points take the MINIMUM cluster label among their core
    neighbors, and a cluster's label is the MINIMUM core id in its
    component, so output is independent of visit order). A point is
    CORE iff its closed eps-neighborhood has ≥ ``min_pts`` points
    (self included); core points cluster by eps-connectivity; border
    points attach; everything else is noise (label −1). All decisions
    are integer/compare-only on top of the exact squared-degree
    distances grid_distance_pairs emits — bit-exact vs SQL.

    Scale shape: candidate pairs come from grid_distance_pairs' 3×3
    cell-blocked exchange (O(density) per cell, one shuffle);
    core-core connectivity routes through connected_components
    (driver union-find below DRIVER_CC_MAX edges, distributed
    min-label propagation above); the driver holds O(points + pairs)
    — the per-point labeling IS the result. Returns a pyarrow Table
    (id, label, is_core) sorted by id."""
    import ray.data as rd

    from .graph import connected_components
    from .joins import grid_distance_pairs

    pts_ds = pts_ds.materialize()
    ids_parts = [pa.table(b).column(id_col).to_numpy(
        zero_copy_only=False).astype(np.int64)
        for b in pts_ds.select_columns([id_col])
        .iter_batches(batch_format="pyarrow")]
    empty = pa.table({"id": pa.array([], pa.int64()),
                      "label": pa.array([], pa.int64()),
                      "is_core": pa.array([], pa.int64())})
    if not ids_parts:
        return empty
    ids = np.sort(np.concatenate(ids_parts))
    n = len(ids)
    if n == 0:
        return empty

    pairs = grid_distance_pairs(pts_ds, id_col, lat_col, lon_col,
                                eps_deg, cos_ref=cos_ref)
    ia = pairs.column("id_a").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    ib = pairs.column("id_b").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    xa = np.searchsorted(ids, ia)
    xb = np.searchsorted(ids, ib)
    deg = (np.bincount(xa, minlength=n)
           + np.bincount(xb, minlength=n)).astype(np.int64)
    is_core = deg + 1 >= min_pts

    label = np.full(n, -1, np.int64)
    cc_mask = is_core[xa] & is_core[xb]
    if cc_mask.any():
        cc = connected_components(rd.from_arrow(pa.table({
            "src": pa.array(ia[cc_mask]),
            "dst": pa.array(ib[cc_mask])})))
        cn = cc.column("node").to_numpy(zero_copy_only=False)
        cl = cc.column("component").to_numpy(zero_copy_only=False)
        label[np.searchsorted(ids, cn)] = cl
    # isolated core points (no core neighbor) form singleton clusters
    lone = is_core & (label == -1)
    label[lone] = ids[lone]

    # border points: min core-neighbor cluster label
    half = is_core[xa] ^ is_core[xb]
    bidx = np.where(is_core[xa], xb, xa)[half]
    blbl = np.where(is_core[xa], label[xa], label[xb])[half]
    border = np.full(n, np.iinfo(np.int64).max, np.int64)
    np.minimum.at(border, bidx, blbl)
    take = (~is_core) & (border != np.iinfo(np.int64).max)
    label[take] = border[take]

    return pa.table({"id": pa.array(ids),
                     "label": pa.array(label),
                     "is_core": pa.array(is_core.astype(np.int64))})
