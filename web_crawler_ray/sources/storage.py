"""Storage layer: one interface, parquet backend now, lance behind the
same switch (SURVEY §7.0 — the `lance` package is not installed in this
sandbox; the north rule's "Lance-backed frontier table" is honored by
writing the IDENTICAL logical schema through this switch, with the
lance branch import-gated).

Layout contract (resumability): every logical table is a DIRECTORY of
part files (or a lance dataset dir) plus an optional ``_COMPLETE``
marker — a rerun lists complete partitions and skips them.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

try:  # pragma: no cover - not installed in this sandbox
    import lance  # type: ignore
    HAS_LANCE = True
except ImportError:
    lance = None
    HAS_LANCE = False

DEFAULT_FORMAT = os.environ.get("GRAFT_STORAGE_FORMAT", "parquet")


def write_table(table: pa.Table, path: str, fmt: str = DEFAULT_FORMAT,
                complete_marker: bool = False) -> None:
    """Write one pyarrow Table as a dataset directory at ``path``."""
    if fmt == "lance":
        if not HAS_LANCE:
            raise NotImplementedError(
                "lance is not installed in this environment; the logical "
                "schema is identical — use fmt='parquet' (default)")
        lance.write_dataset(table, path, mode="overwrite")  # pragma: no cover
    elif fmt == "parquet":
        os.makedirs(path, exist_ok=True)
        pq.write_table(table, os.path.join(path, "part-0.parquet"))
    else:
        raise ValueError(f"unknown storage format: {fmt}")
    if complete_marker:
        with open(os.path.join(path, "_COMPLETE"), "w") as f:
            f.write("ok")


def read_table(path: str, fmt: str = DEFAULT_FORMAT,
               columns: list[str] | None = None) -> pa.Table:
    if fmt == "lance":
        if not HAS_LANCE:
            raise NotImplementedError("lance is not installed")
        return lance.dataset(path).to_table(columns=columns)  # pragma: no cover
    if os.path.isdir(path):
        return pq.read_table(path, columns=columns)
    return pq.read_table(path, columns=columns)


def write_dataset(ds, path: str, fmt: str = DEFAULT_FORMAT) -> None:
    """Ray Dataset sink through the same switch (streaming, many parts)."""
    if fmt == "lance":
        if not HAS_LANCE:
            raise NotImplementedError("lance is not installed")
        ds.write_lance(path)  # pragma: no cover (ray>=2.38 API)
    else:
        ds.write_parquet(path)


def read_dataset(path: str, fmt: str = DEFAULT_FORMAT, **kw):
    import ray.data as rd
    if fmt == "lance":
        if not HAS_LANCE:
            raise NotImplementedError("lance is not installed")
        return rd.read_lance(path, **kw)  # pragma: no cover
    return rd.read_parquet(path, **kw)


def read_parquet_clean(path: str, columns: list[str] | None = None, **kw):
    """``read_parquet`` with the file's (pandas) schema metadata stripped.

    Schemas carrying metadata are unhashable in pyarrow (``Schema.__hash__``
    raises on the metadata dict), which defeats Ray's shuffle-stage schema
    deduplication and logs ``Failed to hash the schemas`` once per
    aggregator. Passing an explicit metadata-free (and column-projected)
    schema keeps every downstream block's schema hashable."""
    import glob

    import pyarrow as pa
    import ray.data as rd
    f = path
    if os.path.isdir(path):
        hits = sorted(glob.glob(os.path.join(path, "**", "*.parquet"),
                                recursive=True))
        if not hits:  # fall through to ray's own error handling
            return rd.read_parquet(path, columns=columns, **kw)
        f = hits[0]
    full = pq.read_schema(f).remove_metadata()
    schema = pa.schema([full.field(c) for c in columns]) if columns else full
    return rd.read_parquet(path, schema=schema, columns=columns, **kw)


def is_complete(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_COMPLETE"))


def write_partitioned_resumable(ds, out_dir: str, key: str,
                                clean_stale: bool = True) -> dict:
    """Resumable hive-partitioned parquet sink (the brief's 'failed
    run skips finished partitions' contract, generalized from the
    crawl checkpoints' per-round ``_COMPLETE`` convention): rows land
    under ``out_dir/<key>=<value>/`` and each partition directory
    gets a ``_COMPLETE`` marker only after its files are durable. A
    re-run (same out_dir): (1) partitions WITH a marker are skipped —
    their rows never leave the scan (filtered by a broadcast key set
    inside map_batches); (2) partition dirs WITHOUT a marker are
    stale partials from a crashed writer — deleted before rewriting,
    so the sink is effectively exactly-once per partition.

    Scale shape: distinct keys come from the per-batch-unique
    combiner (driver sees O(distinct keys), never rows); the write is
    Ray's native partitioned ``write_parquet`` (streaming, one file
    per block per partition); markers are O(pending partitions)
    driver-side touches. Returns {"written": [...], "skipped": [...]}
    with the partition values, both sorted."""
    import ray
    import ray.data as rd

    from ..stages.relational import distinct_keys

    os.makedirs(out_dir, exist_ok=True)
    keys = sorted(str(k) for k in distinct_keys(ds, key))
    done, pending = [], []
    for k in keys:
        pdir = os.path.join(out_dir, f"{key}={k}")
        if os.path.exists(os.path.join(pdir, "_COMPLETE")):
            done.append(k)
        else:
            pending.append(k)
            if clean_stale and os.path.isdir(pdir):  # crashed writer
                import shutil
                shutil.rmtree(pdir)
    if pending:
        pend_ref = ray.put(set(pending))

        def only_pending(t: pa.Table) -> pa.Table:
            want = ray.get(pend_ref)
            kv = t.column(key).to_pylist()
            import numpy as np
            return t.filter(pa.array(
                np.array([str(v) in want for v in kv], bool)))

        ds.map_batches(only_pending, batch_format="pyarrow") \
          .write_parquet(out_dir, partition_cols=[key])
        for k in pending:
            pdir = os.path.join(out_dir, f"{key}={k}")
            os.makedirs(pdir, exist_ok=True)  # empty partitions too
            with open(os.path.join(pdir, "_COMPLETE"), "w") as f:
                f.write("ok")
    return {"written": pending, "skipped": done}
