"""Similarity search over embedding columns (ANN for training pipelines).

- ``BruteForceTopK``: baseline exact cosine top-k — the query matrix is
  broadcast ONCE via ``ray.put`` and read zero-copy in every task; each
  batch does one float64 matmul and a local top-k, and the global top-k
  is reduced from the (tiny) per-batch candidate sets. No shuffle of the
  embedding table.
- ``lsh_bucket_topk``: scale path — random-hyperplane signatures bucket
  vectors; search only the query's bucket (plus Hamming-1 probes).
  Recall measured against brute force in tests.
- ``near_dup_pairs``: embedding-cosine near-duplicate detection.

Scores are rounded to 6 decimals so the DuckDB oracle
(list_cosine_similarity) reproduces them bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def _as_matrix(col) -> np.ndarray:
    """list<float> column -> (n, d) float64 matrix."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class BruteForceTopK:
    """map_batches stage: emits per-batch top-k candidates per query."""

    def __init__(self, queries_ref, k: int, id_col: str = "vec_id",
                 vec_col: str = "embedding"):
        q = ray.get(queries_ref)  # dict: query_id -> np vector (broadcast once)
        self.qids = list(q.keys())
        self.qm = _normalize(np.stack([np.asarray(v, np.float64) for v in q.values()]))
        self.k = k
        self.id_col, self.vec_col = id_col, vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy()
        m = _normalize(_as_matrix(batch.column(self.vec_col)))
        if m.size == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             self.id_col: pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        sims = self.qm @ m.T  # (nq, nb)
        k = min(self.k, sims.shape[1])
        out_q, out_i, out_s = [], [], []
        for qi, qid in enumerate(self.qids):
            row = sims[qi]
            top = np.argpartition(-row, k - 1)[:k] if k < len(row) else np.arange(len(row))
            for j in top:
                out_q.append(qid)
                out_i.append(int(ids[j]))
                out_s.append(round(float(row[j]), 6))
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         self.id_col: pa.array(out_i, pa.int64()),
                         "score": pa.array(out_s, pa.float64())})


def brute_force_topk(ds, queries: dict[int, np.ndarray], k: int,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> pd.DataFrame:
    """Exact cosine top-k per query. Deterministic tie-break: score desc,
    id asc. Returns a small pandas result (nq × k rows)."""
    qref = ray.put(queries)
    cand = ds.map_batches(BruteForceTopK(qref, k, id_col, vec_col),
                          batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["query_id", "score", id_col],
                            ascending=[True, False, True])
    return cand.groupby("query_id", sort=True).head(k).reset_index(drop=True)


# --- LSH-bucketed variant (scale path) ---------------------------------------

def _sign_bucket(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (m @ planes.T) > 0  # (n, nbits)
    return (bits * (1 << np.arange(planes.shape[0]))).sum(axis=1).astype(np.int64)


class LshBucketStage:
    def __init__(self, planes_ref, vec_col: str = "embedding"):
        self.planes = ray.get(planes_ref)
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_as_matrix(batch.column(self.vec_col)))
        b = _sign_bucket(m, self.planes) if m.size else np.zeros(0, np.int64)
        return batch.append_column("lsh_bucket", pa.array(b, pa.int64()))


def lsh_bucket_topk(ds, queries: dict[int, np.ndarray], k: int, n_bits: int = 8,
                    seed: int = 13, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> pd.DataFrame:
    """ANN: search only buckets matching the query signature (±1-bit probes).
    Sub-linear at scale (bucket groupby is the only shuffle); approximate —
    recall vs brute force asserted ≥0.6 in tests at 8 bits."""
    dim = len(next(iter(queries.values())))
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_bits, dim))
    pref = ray.put(planes)
    bucketed = ds.map_batches(LshBucketStage(pref, vec_col), batch_format="pyarrow")

    qm = _normalize(np.stack([np.asarray(v, np.float64) for v in queries.values()]))
    qb = _sign_bucket(qm, planes)
    probe: dict[int, set[int]] = {}
    for qi, b in enumerate(qb):
        s = {int(b)} | {int(b) ^ (1 << i) for i in range(n_bits)}
        probe[qi] = s
    wanted = sorted(set().union(*probe.values()))
    sub = bucketed.filter(lambda r, w=frozenset(wanted): r["lsh_bucket"] in w)
    tbl = sub.to_pandas()  # probed buckets only — small by construction
    out = []
    ids = tbl[id_col].to_numpy() if len(tbl) else np.array([], np.int64)
    if len(tbl):
        m = _normalize(np.stack(tbl[vec_col].to_numpy()).astype(np.float64))
    for qi, qid in enumerate(queries.keys()):
        if not len(tbl):
            continue
        mask = tbl["lsh_bucket"].isin(probe[qi]).to_numpy()
        if not mask.any():
            continue
        sims = qm[qi] @ m[mask].T
        sel_ids = ids[mask]
        order = np.lexsort((sel_ids, -sims))[:k]
        for j in order:
            out.append((qid, int(sel_ids[j]), round(float(sims[j]), 6)))
    return pd.DataFrame(out, columns=["query_id", id_col, "score"])


# --- IVF variant (coarse k-means quantizer, the classic scale path) ----------

def _kmeans(sample: np.ndarray, k: int, iters: int = 10,
            seed: int = 17) -> np.ndarray:
    """Tiny deterministic k-means on normalized vectors (cosine ≙ dot)."""
    rng = np.random.default_rng(seed)
    centroids = sample[rng.choice(len(sample), size=min(k, len(sample)),
                                  replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ centroids.T, axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    centroids[c] = v / n
    return centroids


class IvfAssignStage:
    def __init__(self, centroids_ref, vec_col: str = "embedding"):
        self.centroids = ray.get(centroids_ref)
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_as_matrix(batch.column(self.vec_col)))
        lists = (np.argmax(m @ self.centroids.T, axis=1).astype(np.int32)
                 if m.size else np.zeros(0, np.int32))
        return batch.append_column("ivf_list", pa.array(lists, pa.int32()))


def ivf_topk(ds, queries: dict[int, np.ndarray], k: int, n_lists: int = 16,
             n_probe: int = 4, sample_size: int = 2048, seed: int = 17,
             id_col: str = "vec_id", vec_col: str = "embedding") -> pd.DataFrame:
    """IVF ANN: train a coarse quantizer on a sample (driver-side, tiny),
    broadcast centroids, assign vectors to inverted lists in map_batches,
    search only the query's n_probe nearest lists. At scale the assignment
    is the only full pass (no shuffle: the list id rides as a column and
    the probe filter prunes blocks)."""
    sample_df = ds.limit(sample_size).to_pandas()
    sample = _normalize(np.stack(sample_df[vec_col].to_numpy()).astype(np.float64))
    centroids = _kmeans(sample, n_lists, seed=seed)
    cref = ray.put(centroids)
    assigned = ds.map_batches(IvfAssignStage(cref, vec_col), batch_format="pyarrow")

    qm = _normalize(np.stack([np.asarray(v, np.float64) for v in queries.values()]))
    qsims = qm @ centroids.T
    probe = {qi: set(np.argsort(-qsims[qi])[:n_probe].tolist())
             for qi in range(len(queries))}
    wanted = sorted(set().union(*probe.values()))
    tbl = assigned.filter(
        lambda r, w=frozenset(wanted): r["ivf_list"] in w).to_pandas()
    out = []
    if len(tbl):
        ids = tbl[id_col].to_numpy()
        m = _normalize(np.stack(tbl[vec_col].to_numpy()).astype(np.float64))
        for qi, qid in enumerate(queries.keys()):
            mask = tbl["ivf_list"].isin(probe[qi]).to_numpy()
            if not mask.any():
                continue
            sims = qm[qi] @ m[mask].T
            sel = ids[mask]
            order = np.lexsort((sel, -sims))[:k]
            out.extend((qid, int(sel[j]), round(float(sims[j]), 6)) for j in order)
    return pd.DataFrame(out, columns=["query_id", id_col, "score"])


# --- embedding-cosine near-dup pairs -----------------------------------------

def near_dup_pairs(ds, threshold: float = 0.95, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> pd.DataFrame:
    """All pairs (id_a < id_b) with cosine ≥ threshold.

    Implementation: block-diagonal + cross-block matmuls over materialized
    normalized blocks. At 100 TB scale this becomes LSH-bucketed candidate
    generation (lsh_bucket_topk's bucketing) + exact verify per bucket;
    the exact all-pairs form here is the oracle-checkable baseline.
    """
    parts = [(b.column(id_col).to_numpy(),
              _normalize(_as_matrix(b.column(vec_col))))
             for b in ds.iter_batches(batch_size=4096, batch_format="pyarrow")]
    out = []
    for i, (ids_a, ma) in enumerate(parts):
        for j in range(i, len(parts)):
            ids_b, mb = parts[j]
            sims = ma @ mb.T
            ii, jj = np.where(sims >= threshold)
            for a, b in zip(ii, jj):
                id1, id2 = int(ids_a[a]), int(ids_b[b])
                if id1 < id2:
                    out.append((id1, id2, round(float(sims[a, b]), 6)))
    df = pd.DataFrame(out, columns=["id_a", "id_b", "score"])
    return df.sort_values(["id_a", "id_b"]).reset_index(drop=True)
