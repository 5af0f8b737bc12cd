"""Raw-task hash shuffle for keyed map_groups on small-row datasets.

``Dataset.groupby(key).map_groups(fn)`` routes through the sort-based
all-to-all: boundary sampling, a sort-map and a sort-reduce barrier, and
O(blocks x partitions) intermediate objects — measured ~4.4 s of wall
for ~1 s of task time on a 27k-row locations table (96 blocks, 32 cpus).
When the partition key is known and the grouped rows are small, a plain
two-stage raw-task hash shuffle does the same exchange with two task
waves and no sampling/barrier machinery (the same idiom as the crawl's
candidate explode/reduce, pipelines/crawl.py).

Semantics vs ``groupby().map_groups``: identical iff ``fn`` is
insensitive to row order WITHIN its group (arrival order differs from
the sort-based path). Every ``fn`` routed here must either impose its
own total order (fuzzy dedup sorts by (discovery_seq, within_page_idx))
or be order-free; output ROWS are deterministic: groups key-sorted
within each partition, partitions emitted largest-first (a
deterministic function of the data — see below).

Scale shape: map tasks fan each input block into P hash parts (tiny
Arrow slices, zero-copy), one reduce task per part concats + runs fn
per key-group. Objects created = G x P (G = map tasks, default <=32);
both stages are flat task waves with no driver data traffic (the only
driver round-trip is the P-length per-part row counts, used to submit
reduce tasks largest-first so the straggler partition — e.g. the
biggest host's all-pairs dedup — starts in the first scheduling wave
instead of adding its full runtime to the tail).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.hashing import hash64_ints, hash64_many


@ray.remote
def _hash_split(key: str, P: int, prepare, *tbls: pa.Table):
    """Split the concatenated input blocks into P hash(key) parts.
    Returns P tables + one int64 row-count vector (the last return).
    ``prepare`` (optional) is applied to the concatenated table first —
    the key/annotation columns are computed here, inside the task wave,
    instead of in a separate upstream map_batches job."""
    live = [t for t in tbls if t.num_rows]
    tbl = pa.concat_tables(live) if len(live) > 1 else (
        live[0] if live else tbls[0])
    if prepare is not None:
        tbl = prepare(tbl)
    if tbl.num_rows == 0:
        empty = tbl.schema.empty_table()
        return tuple(empty for _ in range(P)) + (np.zeros(P, np.int64),)
    kcol = tbl.column(key)
    if pa.types.is_integer(kcol.type):  # vectorized mix for int keys
        kv = kcol.combine_chunks().to_numpy(zero_copy_only=False)
        h = (hash64_ints(kv) % np.uint64(P)).astype(np.int64)
    else:
        h = (hash64_many(kcol.to_pylist()) % np.uint64(P)).astype(np.int64)
    parts = tuple(tbl.filter(pa.array(h == p)) for p in range(P))
    return parts + (np.array([p.num_rows for p in parts], np.int64),)


@ray.remote
def _int_split(key: str, P: int, prepare, part: int, n_parts: int,
               *tbls: pa.Table):
    """_hash_split sibling for SMALL-INT key columns (bucket ids): the
    partition is ``key % P`` directly — no string hashing. ``part`` /
    ``n_parts`` slice the input INSIDE the task (zero extra data
    movement) so prepare-heavy splits parallelize past the input block
    count (a one-block parquet read otherwise serializes the whole
    prepare pass into one task)."""
    live = [t for t in tbls if t.num_rows]
    tbl = pa.concat_tables(live) if len(live) > 1 else (
        live[0] if live else tbls[0])
    if n_parts > 1:
        step = -(-tbl.num_rows // n_parts)
        tbl = tbl.slice(part * step, step)
    if prepare is not None:
        tbl = prepare(tbl)
    if tbl.num_rows == 0:
        empty = tbl.schema.empty_table()
        return tuple(empty for _ in range(P)) + (np.zeros(P, np.int64),)
    h = (tbl.column(key).to_numpy().astype(np.int64)) % P
    parts = tuple(tbl.filter(pa.array(h == p)) for p in range(P))
    return parts + (np.array([p.num_rows for p in parts], np.int64),)


@ray.remote
def _reduce_table_fn(fn, *parts: pa.Table) -> pa.Table:
    """Reduce for int_part_map: ``fn`` is applied ONCE to the whole
    partition (a pandas frame) — for kernels that are already
    vectorized across the groups inside their partition. fn also runs
    on an empty partition so the output schema is always fn's."""
    live = [p for p in parts if p.num_rows]
    tbl = (pa.concat_tables(live).combine_chunks() if live else parts[0])
    out = fn(tbl.to_pandas())
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


def int_part_map(ds: rd.Dataset, key: str, fn,
                 num_partitions: int = 64,
                 max_map_tasks: int = 32,
                 prepare=None) -> rd.Dataset:
    """Partition ``ds`` by the small-int ``key`` column (% num_partitions)
    via the raw-task shuffle and apply ``fn`` (pandas frame -> pandas
    frame) ONCE per partition. For per-group kernels that vectorize
    internally over many groups (candidate triu-emit, batched pair
    verify) this replaces the Dataset sort-shuffle's ~2 s fixed cost per
    call with two flat task waves. Same eager-execution caveat as
    hash_map_groups (module docstring)."""
    refs = ds.to_arrow_refs()
    if not refs:
        return ds
    P = num_partitions
    splits = []
    count_refs = []
    if len(refs) >= max_map_tasks:
        step = -(-len(refs) // max_map_tasks)
        tasks = [(refs[i:i + step], 0, 1)
                 for i in range(0, len(refs), step)]
    else:  # fewer blocks than slots: slice blocks inside the tasks
        per = -(-max_map_tasks // len(refs))
        tasks = [([r], p, per) for r in refs for p in range(per)]
    for grp, part, n_parts in tasks:
        o = _int_split.options(num_returns=P + 1).remote(
            key, P, prepare, part, n_parts, *grp)
        splits.append(o[:P])
        count_refs.append(o[P])
    per_part = np.sum(ray.get(count_refs), axis=0)
    order = np.argsort(-per_part, kind="stable")
    out = [_reduce_table_fn.remote(fn, *[s[p] for s in splits])
           for p in order if per_part[p] > 0]
    if not out:
        out = [_reduce_table_fn.remote(fn, *[s[order[0]] for s in splits])]
    return rd.from_arrow_refs(out)


@ray.remote
def _reduce_apply(fn, key: str, *parts: pa.Table) -> pa.Table:
    live = [p for p in parts if p.num_rows]
    if not live:
        return parts[0].schema.empty_table()
    tbl = pa.concat_tables(live).combine_chunks()
    df = tbl.to_pandas()
    outs = [fn(g) for _, g in df.groupby(key, sort=True)]
    out = pd.concat(outs, ignore_index=True) if outs else df.iloc[0:0]
    # drop the pandas schema metadata: blocks with it defeat Ray Data's
    # schema dedup (unhashable-dict log storm + per-block schema churn)
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


def hash_map_groups(ds: rd.Dataset, key: str, fn,
                    num_partitions: int = 96,
                    max_map_tasks: int = 32,
                    prepare=None) -> rd.Dataset:
    """Group ``ds`` by ``key`` via raw-task hash shuffle and apply ``fn``
    (a pandas group -> pandas frame callable, the map_groups contract)
    to each group. ``prepare`` (pa.Table -> pa.Table) is applied inside
    the split tasks before hashing — use it to compute the key column
    without a separate upstream map job. See module docstring for the
    exact-semantics condition.

    EXECUTION TIMING (ADVICE r3): calling this EAGERLY executes the whole
    upstream pipeline — ``to_arrow_refs()`` materializes ``ds`` and the
    split wave is submitted at call time (ray.get on the part counts).
    The returned Dataset is lazy only over the REDUCE outputs. Callers
    that need streaming overlap with upstream stages should use the
    native ``groupby().map_groups`` sort path instead; this shuffle
    trades that laziness for two flat task waves with no sort barrier."""
    refs = ds.to_arrow_refs()
    if not refs:
        return ds
    g = min(max_map_tasks, len(refs))
    step = -(-len(refs) // g)
    P = num_partitions
    splits = []
    count_refs = []
    for i in range(0, len(refs), step):
        o = _hash_split.options(num_returns=P + 1).remote(
            key, P, prepare, *refs[i:i + step])
        splits.append(o[:P])
        count_refs.append(o[P])
    per_part = np.sum(ray.get(count_refs), axis=0)
    order = np.argsort(-per_part, kind="stable")
    out = [_reduce_apply.remote(fn, key, *[s[p] for s in splits])
           for p in order]
    return rd.from_arrow_refs(out)
