"""Mergeable sketches for 100 TB-scale approximate analytics.

The reference engine has no sketch layer (its aggregates are exact and
single-process, e.g. data-quality.service.js:114-136); at cluster scale
the LLM-pipeline brief needs cardinality answers whose EXACT form is an
all-to-all shuffle of every distinct key. A sketch turns that into a
combiner: every batch folds into a few KB of state, merges are
associative/commutative (order-free — safe under Ray's nondeterministic
reduce order), and the driver sees O(groups × sketch_size) bytes no
matter the input size.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa


HLL_P = 12  # 4096 registers / 4 KB per sketch; rel. error ~1.04/sqrt(m) = 1.6%


def _hash_u64(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Uniform uint64 hash of an int or string column, vectorized."""
    from ..functions.hashing import hash64_many
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_integer(arr.type):
        # splitmix64 finalizer: bijective, passes avalanche — integer
        # keys (user ids) are far from uniform in their low bits
        x = arr.to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            return x ^ (x >> np.uint64(31))
    return hash64_many(arr.to_pylist())


def _hll_fold(h: np.ndarray, p: int = HLL_P) -> np.ndarray:
    """Fold uint64 hashes into a fresh (2^p,) uint8 register array."""
    m = 1 << p
    reg = np.zeros(m, np.uint8)
    if not len(h):
        return reg
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)  # low 64-p bits, left-aligned
    # rank = leading zeros of the remaining bits + 1 (all-zero rest =>
    # the max rank 64-p+1). Exact bit_length via a hi/lo 32-bit split:
    # every uint32 is exactly representable in float64, so frexp's
    # exponent IS the bit length (frexp(0) returns exponent 0).
    hi = (rest >> np.uint64(32)).astype(np.int64)
    lo = (rest & np.uint64(0xFFFFFFFF)).astype(np.int64)
    bl = np.where(hi > 0,
                  np.frexp(hi.astype(np.float64))[1] + 32,
                  np.frexp(lo.astype(np.float64))[1])
    rank = (64 - bl + 1).clip(max=64 - p + 1).astype(np.uint8)
    np.maximum.at(reg, idx, rank)
    return reg


def _hll_estimate(reg: np.ndarray) -> float:
    """Standard HLL estimator with the small-range linear-counting
    correction (Flajolet et al. 2007; 64-bit variant needs no
    large-range correction)."""
    m = float(len(reg))
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.ldexp(1.0, -reg.astype(np.int64)))
    zeros = int(np.count_nonzero(reg == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def hll_distinct(ds, key: str, value: str, p: int = HLL_P):
    """Approximate COUNT(DISTINCT value) GROUP BY key via HyperLogLog.

    Scale shape: pass 1 is a pure combiner — each batch folds its rows
    into one 2^p-byte register array PER KEY seen in the batch (numpy
    ``maximum.at``), so the shuffle carries O(keys_per_batch × 2^p)
    bytes per batch regardless of row count. The merge is an
    elementwise register max (associative + commutative — block arrival
    order cannot change the estimate), and the final estimate is
    O(groups) driver work. Exact distinct at this shape would shuffle
    every distinct (key, value) pair instead.

    Returns (key, approx_distinct: int64 rounded estimate). Accuracy
    pinned in tests (rel. error ≲ 2% at p=12 against the exact count).
    """

    def partial(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({key: t.column(key),
                             "reg": pa.array([], pa.binary())})
        h = _hash_u64(t.column(value))
        # group rows by key code: one dictionary encode + one argsort,
        # then a per-GROUP fold loop (keys per batch, not rows)
        codes_arr = t.column(key).combine_chunks().dictionary_encode()
        codes = codes_arr.indices.to_numpy(zero_copy_only=False)
        dictionary = codes_arr.dictionary.to_pylist()
        order = np.argsort(codes, kind="stable")
        sc = codes[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(sc[1:] != sc[:-1]) + 1, [len(sc)]))
        h_sorted = h[order]
        out_k = [dictionary[sc[s]] for s in starts[:-1]]
        out_r = [_hll_fold(h_sorted[s:e], p).tobytes()
                 for s, e in zip(starts[:-1], starts[1:])]
        return pa.table({key: pa.array(out_k),
                         "reg": pa.array(out_r, pa.binary())})

    def merge(g) -> "pd.DataFrame":
        import pandas as pd
        regs = np.stack([np.frombuffer(b, np.uint8)
                         for b in g["reg"].tolist()])
        est = _hll_estimate(regs.max(axis=0))
        return pd.DataFrame({key: [g[key].iloc[0]],
                             "approx_distinct": [int(round(est))]})

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(key)
              .map_groups(merge, batch_format="pandas"))
