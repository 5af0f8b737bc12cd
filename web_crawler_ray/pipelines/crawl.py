"""Round-based BFS crawl frontier on Ray Data (F6/F7/F10/F11/F12/F14).

The reference's sequential FIFO BFS (site-crawler.service.js:129-194)
is re-expressed as frontier ROUNDS: each round gates the frontier
through robots + politeness actors, fetches the granted slice as a Ray
Dataset ``map_batches`` actor-pool stage, extracts links, and feeds the
seen-set shards to build the next frontier. Crawl ordering parity with
the sequential loop comes from ``discovery_seq``: a FIFO BFS queue is
exactly (depth, discovery_seq) order, so processing rounds in
discovery_seq order reproduces the reference fetch order bit-for-bit
(proved against the oracle in tests/test_crawl_parity.py).

Scale notes (10^10-URL frontier, multi-node):
- Page CONTENT never touches the driver: fetch → link-extract →
  extract/spans/write runs as streaming Dataset stages; per-round pages
  are checkpointed to partitioned parquet (resume = skip complete
  rounds).
- Frontier METADATA (url, host, depth, seq — tens of bytes/row) is
  handled per-round; in this single-node build the round bookkeeping
  (sort by seq, per-host budget take, seq assignment) runs vectorized
  on the driver, which holds only the CURRENT round's frontier. At
  10^10 scale the same three ops are the documented shuffle plan:
  ``sort(discovery_seq)`` + ``groupby(host).map_groups(head(grant))``
  + a distributed prefix-sum for seq assignment — all keyed by `host`,
  the single partitioning key reused across rounds (skew: Zipf hosts
  are capped per round by the politeness budget itself, which is the
  natural salt).
- Seen set / robots / politeness are actor pools; ONE batched RPC per
  shard per round.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from urllib.parse import urlsplit

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..functions.hashing import hash64_many
from ..functions.urltools import (
    canonicalize, host_of, priority_tier, resolve_href, same_domain,
    should_exclude,
)
from ..state.politeness import Politeness
from ..state.robots_cache import RobotsCache
from ..state.seen import SeenSet
from ..stages.extract import extract_hrefs

FRONTIER_COLS = ("url", "url_hash", "host", "path", "depth", "discovery_seq",
                 "parent_url_hash")


def _fast_path(url: str) -> str:
    """Path of a canonical http(s) URL (scheme://host[/path], no query/frag)."""
    i = url.find("/", 8)  # skip 'https://'
    return url[i:] if i >= 0 else "/"


def _frontier_table(urls, hosts, depths, seqs, parent_hashes=None) -> pa.Table:
    urls = list(urls)
    paths = [_fast_path(u) for u in urls]
    if parent_hashes is None:
        parent_hashes = np.zeros(len(urls), dtype=np.uint64)  # seeds: no parent
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "url_hash": pa.array(hash64_many(urls), pa.uint64()),
        "host": pa.array(list(hosts), pa.string()),
        "path": pa.array(paths, pa.string()),
        "depth": pa.array(list(depths), pa.int32()),
        "discovery_seq": pa.array(list(seqs), pa.int64()),
        "priority": pa.array([priority_tier(u) for u in urls], pa.int8()),
        "parent_url_hash": pa.array(np.asarray(parent_hashes, dtype=np.uint64),
                                    pa.uint64()),
    })


# Per-worker zero-copy cache of the page store: ray.get of a pyarrow Table is
# zero-copy from the object store, and caching by ObjectRef avoids re-resolving
# it for every task. In production this stage is an HTTP/browser fetch actor
# pool (the reference's Puppeteer/Playwright singletons); the page-store join
# exists only as the sandbox stand-in for the network.
_PAGES_CACHE: dict[str, tuple[pa.Table, np.ndarray]] = {}


def _page_store(pages_ref) -> tuple[pa.Table, np.ndarray]:
    key = pages_ref.hex()
    hit = _PAGES_CACHE.get(key)
    if hit is None:
        tbl: pa.Table = ray.get(pages_ref)
        hit = (tbl, tbl.column("url_hash").to_numpy())  # sorted keys
        _PAGES_CACHE.clear()
        _PAGES_CACHE[key] = hit
    return hit


class FetchStage:
    """Stateless fetch stage (S1/S2 stand-in): frontier rows -> page rows via
    searchsorted lookup against the shared page store (no per-task copy).

    Link extraction (F1-F4) is FUSED into the fetch task — one Dataset job
    per frontier round instead of two — emitting the canonical same-domain
    non-excluded outlinks as a per-page list column (in-page first-seen
    dedup preserved, document order = discovery_seq tiebreak)."""

    def __init__(self, pages_ref):
        self.pages_ref = pages_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        pages, keys = _page_store(self.pages_ref)
        h = batch.column("url_hash").to_numpy()
        pos = np.searchsorted(keys, h)
        pos_c = np.clip(pos, 0, len(keys) - 1)
        found = keys[pos_c] == h
        rows = pages.take(pa.array(pos_c[found]))
        # align: found rows get page content; missing get 404-like empties
        n = len(batch)
        status = np.full(n, 404, dtype=np.int16)
        status[found] = rows.column("status").to_numpy()
        html = [""] * n
        xhr = [None] * n
        fi = np.flatnonzero(found)
        h_col = rows.column("html").to_pylist()
        x_col = rows.column("xhr_json").to_pylist()
        for k, i in enumerate(fi):
            html[i] = h_col[k] or ""
            xhr[i] = x_col[k]
        urls = batch.column("url").to_pylist()
        hosts = batch.column("host").to_pylist()
        links: list[list[str]] = []
        for i in range(n):
            if status[i] != 200 or not html[i]:
                links.append([])
                continue
            links.append(_canonical_links(html[i], urls[i], hosts[i]))
        out = batch.append_column("status", pa.array(status, pa.int16()))
        out = out.append_column("html", pa.array(html, pa.large_string()))
        out = out.append_column("xhr_json", pa.array(xhr, pa.large_string()))
        out = out.append_column("links_canon", pa.array(links, pa.list_(pa.string())))
        ok = [bool(status[i] == 200 and html[i]) for i in range(n)]
        out = out.append_column("fetch_ok", pa.array(ok, pa.bool_()))
        return out


def _canonical_links(html: str, url: str, host: str) -> list[str]:
    """F1-F4 for one page: document order, in-page first-seen dedup."""
    local: set[str] = set()
    out: list[str] = []
    for href in extract_hrefs(html):
        absu = resolve_href(href, url)
        if absu is None:
            continue
        canon = canonicalize(absu)
        if canon is None or canon in local:
            continue
        if not same_domain(host_of(canon), host) or should_exclude(canon):
            continue
        local.add(canon)
        out.append(canon)
    return out


@dataclass
class CrawlResult:
    visited: pa.Table                 # (round, discovery_seq, url, host, depth)
    pages: "rd.Dataset | None"        # fetched pages (url, html, xhr, provenance)
    seen_snapshot: np.ndarray         # sorted uint64 url hashes
    stats: dict = field(default_factory=dict)
    metrics: list = field(default_factory=list)


# ---------------------------------------------------------------------------
# Distributed frontier ops (frontier_mode="dataset"): the documented
# 10^10-scale plan — sort(discovery_seq) + groupby(host).head(grant) +
# distributed prefix-sum seq assignment — implemented as Dataset ops and
# parity-tested bit-for-bit against the driver-side form. The frontier
# lives in the OBJECT STORE between rounds; the driver handles only
# per-host grant dicts, per-block row counts, and the fetched slice's
# metadata (never html).
# ---------------------------------------------------------------------------

@ray.remote(num_cpus=0)
def _tbl_rows(t: pa.Table) -> int:
    return t.num_rows


@ray.remote(num_cpus=0)
def _tbl_add_range(t: pa.Table, name: str, start: int) -> pa.Table:
    return t.append_column(
        name, pa.array(np.arange(start, start + t.num_rows), pa.int64()))


def _assign_contiguous(ds_sorted: "rd.Dataset", name: str, start: int):
    """Distributed prefix-sum rank assignment over an (already sorted)
    Dataset: ordered block refs stay in the object store; the driver sees
    only per-block row COUNTS, computes the (tiny) offset vector, and
    each block appends its contiguous range in a remote task."""
    refs = ds_sorted.to_arrow_refs()
    counts = ray.get([_tbl_rows.remote(r) for r in refs])
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1])) + start
    out = [_tbl_add_range.remote(r, name, int(o))
           for r, o, c in zip(refs, offsets, counts) if c]
    if not out:
        return None, 0
    return rd.from_arrow_refs(out), int(sum(counts))


def _ds_to_table(ds: "rd.Dataset") -> pa.Table | None:
    """Ordered driver collect (metadata-sized tables only)."""
    blocks = ray.get(ds.to_arrow_refs())
    if not blocks:
        return None
    parts = [t for t in blocks if t.num_rows]
    return pa.concat_tables(parts).combine_chunks() if parts else blocks[0]


class _RobotsGateStage:
    """map_batches filter through the shared robots actor (one RPC per
    block — the per-round batched-RPC contract, now per partition)."""

    def __init__(self, robots):
        self.robots = robots

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        allowed = ray.get(self.robots.check.remote(
            batch.column("host").to_pylist(), batch.column("path").to_pylist()))
        return batch.filter(pa.array(allowed))


class _SeenFilterStage:
    """map_batches seen-set gate: routes url hashes to the shard actors
    (check_and_add). Correctness across parallel tasks relies on the
    round's candidates being globally unique (the groupby(url) first-seen
    dedup runs upstream), making shard results arrival-order independent."""

    def __init__(self, shards: list):
        self.shards = shards

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("url_hash", pa.array([], pa.uint64()))
        from ..state.seen import scatter_check_and_add
        h = hash64_many(batch.column("url").to_pylist())
        keep = scatter_check_and_add(self.shards, h)
        out = batch.append_column("url_hash", pa.array(h, pa.uint64()))
        return out.filter(pa.array(keep))


def _explode_links_batch(batch: pa.Table) -> pa.Table:
    """Vectorized link explode for the dataset-mode next-frontier build:
    one output row per (page, link) with the page's provenance."""
    lc = batch.column("links_canon")
    lc = lc.combine_chunks() if isinstance(lc, pa.ChunkedArray) else lc
    flat = pc.list_flatten(lc)
    if len(flat) == 0:
        return pa.table({"url": pa.array([], pa.string()),
                         "host": pa.array([], pa.string()),
                         "depth": pa.array([], pa.int32()),
                         "parent_rank": pa.array([], pa.int64()),
                         "link_idx": pa.array([], pa.int32()),
                         "parent_url_hash": pa.array([], pa.uint64())})
    parents = pc.list_parent_indices(lc)
    lens = pc.list_value_length(lc).to_numpy(zero_copy_only=False).astype(np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    link_idx = np.arange(int(lens.sum()), dtype=np.int64) - \
        np.repeat(starts, lens)
    return pa.table({
        "url": flat,
        "host": pc.take(batch.column("host"), parents),
        "depth": pc.cast(pc.add(pc.take(batch.column("depth"), parents), 1),
                         pa.int32()),
        "parent_rank": pc.cast(pc.take(batch.column("fetch_rank"), parents),
                               pa.int64()),
        "link_idx": pa.array(link_idx.astype(np.int32), pa.int32()),
        "parent_url_hash": pc.take(batch.column("url_hash"), parents),
    })


def _first_seen_group(g):
    return g.sort_values(["parent_rank", "link_idx"]).head(1)


def _cand_to_frontier(batch: pa.Table) -> pa.Table:
    """Candidate rows (post seen-filter, post seq-assign) -> frontier rows."""
    urls = batch.column("url").to_pylist()
    return pa.table({
        "url": batch.column("url"),
        "url_hash": batch.column("url_hash"),
        "host": batch.column("host"),
        "path": pa.array([_fast_path(u) for u in urls], pa.string()),
        "depth": batch.column("depth"),
        "discovery_seq": batch.column("discovery_seq"),
        "priority": pa.array([priority_tier(u) for u in urls], pa.int8()),
        "parent_url_hash": batch.column("parent_url_hash"),
    })


def crawl(pages_store: pa.Table, robots_by_host: dict[str, str], seeds: list[str],
          max_pages: int = 10_000, max_depth: int = 3,
          round_seconds: float | None = None,
          n_seen_shards: int = 4, fetch_concurrency: int = 4,
          checkpoint_dir: str | None = None,
          keep_pages: bool = True,
          resume_from: str | None = None,
          backoff: bool = False,
          order: str = "fifo",
          frontier_mode: str = "driver",
          seen_spill_threshold: int | None = None) -> CrawlResult:
    """Run the round-based BFS. ``pages_store`` must be sorted by url_hash.

    ``round_seconds=None`` ⇒ infinite politeness budget (pure reference
    BFS order); otherwise per-host budget = floor(round_seconds / delay)
    on the deterministic virtual clock (see state/politeness.py).

    ``order``: ``"fifo"`` (default) reproduces the reference BFS order;
    ``"priority"`` processes each round in (F4 priority tier,
    discovery_seq) order — the "priority frontier" form, folding the
    reference's phase-2 prioritizeUrls ordering (site-crawler:84-124)
    into the frontier itself. Both orders are oracle-parity-tested.

    ``backoff=True`` enables the F12 implied-API exponential failure
    backoff: a host's next-round budget is halved per fetch failure
    recorded this round (floor 1), reset on an all-success round — the
    oracle mirrors this exactly (parity-tested).

    ``resume_from``: a checkpoint dir from a prior run — the crawl
    continues from the max complete round (frontier + seen set + fetched
    count restored; earlier rounds' pages are already on disk there).
    The resumed run's fetch order is exactly the rounds the interrupted
    run would have executed next (tests/test_checkpoint.py asserts
    capped-run + resumed-run ≡ one uninterrupted run).
    """
    pages_ref = ray.put(pages_store)
    robots = RobotsCache.options(num_cpus=0.1).remote(robots_by_host)
    seen = SeenSet(n_shards=n_seen_shards,
                   spill_threshold=seen_spill_threshold)
    politeness = Politeness.options(num_cpus=0.1).remote(
        round_seconds if round_seconds is not None else float("inf"))

    info = resume_info(resume_from) if resume_from else None
    round_delta: list[np.ndarray] = []  # hashes newly seen this round (checkpoint delta)
    if info is not None:
        frontier = info["frontier"]
        seen.bulk_add(info["seen"])
        n_fetched = info["fetched"]
        rnd = info["round"] + 1
        if info.get("next_seq") is not None:
            next_seq = int(info["next_seq"])
        else:  # legacy checkpoint without next_seq: infer (can reuse seqs
            # when the max-seq entry was fetched in the last round — new
            # checkpoints always persist next_seq in metrics.json)
            seqs = frontier.column("discovery_seq")
            next_seq = int(pc.max(seqs).as_py()) + 1 if frontier.num_rows else 0
        s_hosts = frontier.column("host").to_pylist()
    else:
        # seed the frontier (enqueue-time seen insertion, reference :136).
        # First-seen dedup of the canonical seeds BEFORE hashing: the seen
        # shards' check_and_add contract requires within-batch-unique input,
        # and the oracle's `canon in seen: continue` skips dup seeds too.
        s_urls, s_hosts = [], []
        seed_local: set[str] = set()
        for s in seeds:
            c = canonicalize(s)
            if c is not None and c not in seed_local:
                seed_local.add(c)
                s_urls.append(c)
                s_hosts.append(host_of(c))
        s_hashes = hash64_many(s_urls)
        new_mask = seen.check_and_add(s_hashes)
        keep = np.flatnonzero(new_mask)
        frontier = _frontier_table(
            [s_urls[i] for i in keep], [s_hosts[i] for i in keep],
            [0] * len(keep), list(range(len(keep))))
        next_seq = len(keep)
        n_fetched = 0
        rnd = 0
        round_delta.append(s_hashes[keep])  # seeds enter the round-0 delta

    # install explicit robots crawl-delays into the politeness buckets
    all_hosts = sorted(set(s_hosts))
    ray.get(politeness.set_delays.remote(ray.get(robots.delays.remote(all_hosts))))
    delays_known: set[str] = set(all_hosts)

    if frontier_mode == "dataset":
        return _crawl_rounds_dataset(
            pages_ref, robots, seen, politeness, frontier, next_seq,
            n_fetched, rnd, round_delta, delays_known, max_pages, max_depth,
            checkpoint_dir, keep_pages, backoff, order)

    visited_parts: list[pa.Table] = []
    page_datasets: list[rd.Dataset] = []
    metrics: list[dict] = []
    max_rounds = rnd + 10_000

    while frontier.num_rows and n_fetched < max_pages and rnd < max_rounds:
        rows_in = frontier.num_rows
        # depth gate (permanent drop; already in seen)
        active = frontier.filter(pc.less_equal(frontier.column("depth"), max_depth))
        if active.num_rows == 0:
            break
        if order == "priority":
            active = active.sort_by([("priority", "ascending"),
                                     ("discovery_seq", "ascending")])
        else:
            active = active.sort_by("discovery_seq")

        # robots gate — ONE batched actor call for the round
        hosts_l = active.column("host").to_pylist()
        new_hosts = sorted(set(hosts_l) - delays_known)
        if new_hosts:
            ray.get(politeness.set_delays.remote(ray.get(robots.delays.remote(new_hosts))))
            delays_known.update(new_hosts)
        allowed = ray.get(robots.check.remote(hosts_l, active.column("path").to_pylist()))
        active = active.filter(pa.array(allowed))
        if active.num_rows == 0:
            break

        # politeness: per-host grant, take first g per host in seq order
        hosts_l = active.column("host").to_pylist()
        counts: dict[str, int] = {}
        for h in hosts_l:
            counts[h] = counts.get(h, 0) + 1
        grant = ray.get(politeness.grant.remote(counts))
        taken_mask = np.zeros(active.num_rows, dtype=bool)
        used: dict[str, int] = {}
        for i, h in enumerate(hosts_l):
            u = used.get(h, 0)
            if u < grant.get(h, 0):
                used[h] = u + 1
                taken_mask[i] = True
        fetch_tbl = active.filter(pa.array(taken_mask))
        deferred = active.filter(pa.array(~taken_mask))

        # global cap in seq order; the sliced-off remainder goes back to the
        # deferred frontier so a checkpoint written this round is complete
        # for resume (the capped run itself never fetches them)
        room = max_pages - n_fetched
        if fetch_tbl.num_rows > room:
            overflow = fetch_tbl.slice(room)
            fetch_tbl = fetch_tbl.slice(0, room)
            deferred = (pa.concat_tables([deferred, overflow])
                        if deferred.num_rows else overflow)
        if fetch_tbl.num_rows == 0:
            break
        fetch_tbl = fetch_tbl.append_column(
            "fetch_rank", pa.array(np.arange(fetch_tbl.num_rows), pa.int64()))

        # --- the distributed part: fetch + link-extract as Dataset stages ---
        # blocks sized ~192 pages: small enough to balance the downstream
        # extract stage (its per-page cost dwarfs fetch), large enough to
        # amortize task dispatch. fetch_concurrency bounds the round's task
        # fan-out (the production knob: HTTP/browser pool size), results are
        # identical at any value (determinism test).
        n_blocks = max(1, min(max(16, fetch_concurrency * 8),
                              fetch_tbl.num_rows // 192 + 1))
        ds = rd.from_arrow(fetch_tbl, override_num_blocks=n_blocks)
        ds = ds.map_batches(FetchStage(pages_ref),
                            batch_format="pyarrow", batch_size=256, num_cpus=1)
        ds = ds.materialize()  # pinned once; reused for links + downstream extract
        # link metadata only (html stays in the object store); vectorized
        # explode: list_flatten + list_parent_indices instead of row loops
        meta_parts = list(ds.select_columns(
            ["host", "depth", "fetch_rank", "fetch_ok", "links_canon"])
            .iter_batches(batch_size=65536, batch_format="pyarrow"))
        meta = pa.concat_tables(meta_parts).combine_chunks() if meta_parts else None
        if backoff and meta is not None:
            import collections
            ok_arr = meta.column("fetch_ok").to_numpy(zero_copy_only=False)
            host_arr = meta.column("host").to_pylist()
            fails = collections.Counter(h for h, ok in zip(host_arr, ok_arr) if not ok)
            ok_hosts = {h for h, ok in zip(host_arr, ok_arr) if ok}
            calls = [politeness.record_failure.remote(h, n) for h, n in fails.items()]
            calls += [politeness.record_success.remote(h) for h in ok_hosts - set(fails)]
            if calls:
                ray.get(calls)
        links_tbl = None
        if meta is not None and meta.num_rows:
            lc = meta.column("links_canon")
            lc = lc.combine_chunks() if isinstance(lc, pa.ChunkedArray) else lc
            flat = pc.list_flatten(lc)
            if len(flat):
                parents = pc.list_parent_indices(lc)
                lens = pc.list_value_length(lc).to_numpy(zero_copy_only=False).astype(np.int64)
                starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
                link_idx = np.arange(int(lens.sum()), dtype=np.int32) -                     np.repeat(starts, lens).astype(np.int64)
                links_tbl = pa.table({
                    "url": flat,
                    "host": pc.take(meta.column("host"), parents),
                    "depth": pc.add(pc.take(meta.column("depth"), parents), 1),
                    "parent_rank": pc.take(meta.column("fetch_rank"), parents),
                    "link_idx": pa.array(link_idx, pa.int32()),
                })

        if checkpoint_dir:
            ds.write_parquet(os.path.join(checkpoint_dir, f"round={rnd}", "pages"))
        if keep_pages:
            page_datasets.append(ds)

        visited_parts.append(pa.table({
            "round": pa.array([rnd] * fetch_tbl.num_rows, pa.int32()),
            "discovery_seq": fetch_tbl.column("discovery_seq"),
            "url": fetch_tbl.column("url"),
            "host": fetch_tbl.column("host"),
            "depth": fetch_tbl.column("depth"),
            "parent_url_hash": fetch_tbl.column("parent_url_hash"),
        }))
        n_fetched += fetch_tbl.num_rows

        # --- next frontier: dedup in-round, seen-filter, assign seqs ---
        # Runs even when the cap was just reached: the reference enqueues the
        # final fetched pages' links into allDiscoveredUrls BEFORE the loop
        # exits (site-crawler.service.js:163-168 runs for page #maxPages) —
        # the seen set must include them for bit-for-bit parity.
        new_frontier = deferred
        if links_tbl is not None:
            lt = links_tbl.sort_by([("parent_rank", "ascending"),
                                    ("link_idx", "ascending")])
            # in-round first-seen dedup, vectorized (stable keep="first")
            dfu = lt.column("url").to_pandas()
            lt = lt.take(pa.array(np.flatnonzero(~dfu.duplicated().to_numpy())))
            cand_urls = lt.column("url").to_pylist()
            cand_hashes = hash64_many(cand_urls)
            fresh = seen.check_and_add(cand_hashes)  # one RPC per shard
            ix = np.flatnonzero(fresh)
            if checkpoint_dir and len(ix):
                round_delta.append(cand_hashes[ix])
            if len(ix):
                lt2 = lt.take(pa.array(ix))
                seqs = list(range(next_seq, next_seq + lt2.num_rows))
                next_seq += lt2.num_rows
                # lineage: parent_url_hash = hash of the fetching page
                fetched_hashes = fetch_tbl.column("url_hash").to_numpy()
                parents = fetched_hashes[lt2.column("parent_rank").to_numpy()]
                add = _frontier_table(lt2.column("url").to_pylist(),
                                      lt2.column("host").to_pylist(),
                                      lt2.column("depth").to_pylist(), seqs,
                                      parent_hashes=parents)
                new_frontier = pa.concat_tables([deferred, add]) if deferred.num_rows else add
        frontier = new_frontier

        per_host: dict[str, int] = {}
        for h in fetch_tbl.column("host").to_pylist():
            per_host[h] = per_host.get(h, 0) + 1
        metrics.append({"round": rnd, "stage": "fetch", "rows_in": rows_in,
                        "rows_out": int(fetch_tbl.num_rows),
                        "frontier_next": int(frontier.num_rows),
                        "seen": seen.cardinality(),
                        "n_hosts": len(per_host),
                        "next_seq": next_seq,  # persisted for exact resume
                        "per_host": per_host})  # per-partition lineage (host = partition key)
        if checkpoint_dir:
            delta = (np.sort(np.concatenate(round_delta)) if round_delta
                     else np.zeros(0, np.uint64))
            _write_checkpoint(checkpoint_dir, rnd, frontier, visited_parts[-1],
                              delta, metrics[-1])
            round_delta = []
        rnd += 1

    visited = (pa.concat_tables(visited_parts) if visited_parts
               else pa.table({"round": pa.array([], pa.int32()),
                              "discovery_seq": pa.array([], pa.int64()),
                              "url": pa.array([], pa.string()),
                              "host": pa.array([], pa.string()),
                              "depth": pa.array([], pa.int32()),
                              "parent_url_hash": pa.array([], pa.uint64())}))
    pages = None
    if keep_pages and page_datasets:
        pages = page_datasets[0]
        for d in page_datasets[1:]:
            pages = pages.union(d)
    stats = {"fetched": n_fetched, "rounds": rnd, "seen": seen.cardinality(),
             "politeness": ray.get(politeness.get_all_stats.remote())}
    return CrawlResult(visited=visited, pages=pages,
                       seen_snapshot=seen.snapshot(), stats=stats, metrics=metrics)


_FR_COLS = ["url", "url_hash", "host", "path", "depth", "discovery_seq",
            "priority", "parent_url_hash"]


def _crawl_rounds_dataset(pages_ref, robots, seen, politeness,
                          frontier_tbl: pa.Table, next_seq: int,
                          n_fetched: int, rnd: int, round_delta: list,
                          delays_known: set, max_pages: int, max_depth: int,
                          checkpoint_dir: str | None, keep_pages: bool,
                          backoff: bool, order: str) -> CrawlResult:
    """frontier_mode="dataset": the round bookkeeping — depth gate, order
    sort, robots gate, per-host grant take, global cap, in-round link
    dedup, seen filter, and discovery_seq assignment — runs as Dataset
    ops; the frontier lives in the object store between rounds. Driver
    state per round: per-host count/grant dicts, per-block row counts
    (prefix sums), and the fetched slice's METADATA for the visited
    table + checkpoints (bounded by the politeness budget — exactly the
    round's work list; html never leaves the workers).

    Bit-for-bit parity with frontier_mode="driver" (and therefore with
    the reference oracle) is asserted in tests/test_crawl_parity.py for
    fifo + priority orders, budgets, caps and backoff.

    Note on the seen gate: check_and_add both tests AND inserts, so the
    _SeenFilterStage dataset is materialized exactly once and only the
    materialized result is consumed. (A production deploy with task
    retries would split this into contains-filter + insert-after-commit;
    single execution is deterministic because the round's candidates are
    globally unique before the gate.)"""
    visited_parts: list[pa.Table] = []
    page_datasets: list[rd.Dataset] = []
    metrics: list[dict] = []
    max_rounds = rnd + 10_000
    order_cols = (["priority", "discovery_seq"] if order == "priority"
                  else ["discovery_seq"])

    frontier_ds = (rd.from_arrow(frontier_tbl).materialize()
                   if frontier_tbl.num_rows else None)

    while frontier_ds is not None and n_fetched < max_pages and rnd < max_rounds:
        rows_in = frontier_ds.count()
        if rows_in == 0:
            break
        # depth gate + robots gate FUSED into one pass (one actor RPC per
        # block); per-host counts computed once and reused for both the
        # crawl-delay install and the politeness grant. Parity note: the
        # driver loop installs delays for robots-blocked hosts too, but a
        # fully-blocked host never enters grant counts, so its delay is
        # never consulted — skipping the install is behavior-identical.
        gate = _RobotsGateStage(robots)
        active = frontier_ds.map_batches(
            lambda t, md=max_depth, g=gate: g(
                t.filter(pc.less_equal(t.column("depth"), md))),
            batch_format="pyarrow").materialize()
        counts_df = active.groupby("host").count().to_pandas()
        if len(counts_df) == 0:
            break
        new_hosts = sorted(set(counts_df["host"]) - delays_known)
        if new_hosts:
            ray.get(politeness.set_delays.remote(
                ray.get(robots.delays.remote(new_hosts))))
            delays_known.update(new_hosts)
        cnt_col = [c for c in counts_df.columns if c != "host"][0]
        counts = {h: int(c) for h, c in zip(counts_df["host"], counts_df[cnt_col])}
        grant = ray.get(politeness.grant.remote(counts))

        def mark(g, grant=grant, oc=tuple(order_cols)):
            g = g.sort_values(list(oc))
            b = int(grant.get(g["host"].iloc[0], 0))
            tk = np.zeros(len(g), dtype=bool)
            tk[:b] = True
            return g.assign(__taken=tk)

        marked = active.groupby("host").map_groups(
            mark, batch_format="pandas").materialize()
        taken = marked.map_batches(
            lambda t: t.filter(t.column("__taken")).drop_columns(["__taken"]),
            batch_format="pyarrow")
        deferred_ds = marked.map_batches(
            lambda t: t.filter(pc.invert(t.column("__taken")))
                       .drop_columns(["__taken"]),
            batch_format="pyarrow").select_columns(_FR_COLS)
        # global order + contiguous fetch_rank (distributed prefix-sum),
        # then the global cap in that order
        ranked, n_taken = _assign_contiguous(taken.sort(order_cols),
                                             "fetch_rank", 0)
        if ranked is None:
            break
        room = max_pages - n_fetched
        fetch_ds = ranked.map_batches(
            lambda t, r=room: t.filter(pc.less(t.column("fetch_rank"), r)),
            batch_format="pyarrow")
        if n_taken > room:
            overflow = ranked.map_batches(
                lambda t, r=room: t.filter(
                    pc.greater_equal(t.column("fetch_rank"), r))
                .drop_columns(["fetch_rank"]),
                batch_format="pyarrow").select_columns(_FR_COLS)
            deferred_ds = deferred_ds.union(overflow)
        n_fetch = min(n_taken, room)
        if n_fetch == 0:
            break

        fetched = fetch_ds.map_batches(FetchStage(pages_ref),
                                       batch_format="pyarrow",
                                       batch_size=256, num_cpus=1).materialize()
        # visited METADATA, ordered by fetch_rank (= round fetch order)
        meta = _ds_to_table(
            fetched.select_columns(["url", "host", "depth", "discovery_seq",
                                    "parent_url_hash", "fetch_rank", "fetch_ok"])
            .sort("fetch_rank"))
        visited_parts.append(pa.table({
            "round": pa.array([rnd] * meta.num_rows, pa.int32()),
            "discovery_seq": pc.cast(meta.column("discovery_seq"), pa.int64()),
            "url": pc.cast(meta.column("url"), pa.string()),
            "host": pc.cast(meta.column("host"), pa.string()),
            "depth": pc.cast(meta.column("depth"), pa.int32()),
            "parent_url_hash": pc.cast(meta.column("parent_url_hash"),
                                       pa.uint64()),
        }))
        n_fetched += meta.num_rows
        if backoff:
            import collections
            ok_arr = meta.column("fetch_ok").to_numpy(zero_copy_only=False)
            host_arr = meta.column("host").to_pylist()
            fails = collections.Counter(
                h for h, ok in zip(host_arr, ok_arr) if not ok)
            ok_hosts = {h for h, ok in zip(host_arr, ok_arr) if ok}
            calls = [politeness.record_failure.remote(h, n)
                     for h, n in fails.items()]
            calls += [politeness.record_success.remote(h)
                      for h in ok_hosts - set(fails)]
            if calls:
                ray.get(calls)

        if checkpoint_dir:
            fetched.write_parquet(
                os.path.join(checkpoint_dir, f"round={rnd}", "pages"))
        if keep_pages:
            page_datasets.append(fetched)

        # next frontier: explode links -> in-round first-seen dedup
        # (groupby(url), min (parent_rank, link_idx)) -> seen gate ->
        # order-sort -> distributed prefix-sum seq assignment
        cand = fetched.map_batches(_explode_links_batch, batch_format="pyarrow")
        cand = cand.groupby("url").map_groups(_first_seen_group,
                                              batch_format="pandas")
        fresh = cand.map_batches(_SeenFilterStage(seen.shards),
                                 batch_format="pyarrow").materialize()
        n_new = fresh.count()
        new_frontier = None
        if n_new:
            if checkpoint_dir:
                round_delta.append(
                    _ds_to_table(fresh.select_columns(["url_hash"]))
                    .column("url_hash").to_numpy())
            seqd, _ = _assign_contiguous(
                fresh.sort(["parent_rank", "link_idx"]),
                "discovery_seq", next_seq)
            next_seq += n_new
            new_frontier = seqd.map_batches(_cand_to_frontier,
                                            batch_format="pyarrow") \
                               .select_columns(_FR_COLS)
        nxt = deferred_ds.union(new_frontier) if new_frontier is not None \
            else deferred_ds
        frontier_ds = nxt.materialize()

        per_host: dict[str, int] = {}
        for h in meta.column("host").to_pylist():
            per_host[h] = per_host.get(h, 0) + 1
        metrics.append({"round": rnd, "stage": "fetch", "rows_in": rows_in,
                        "rows_out": int(meta.num_rows),
                        "frontier_next": int(frontier_ds.count()),
                        "seen": seen.cardinality(),
                        "n_hosts": len(per_host),
                        "next_seq": next_seq,
                        "per_host": per_host})
        if checkpoint_dir:
            delta = (np.sort(np.concatenate(round_delta)) if round_delta
                     else np.zeros(0, np.uint64))
            fr_tbl = _ds_to_table(frontier_ds.select_columns(_FR_COLS))
            if fr_tbl is None or fr_tbl.num_rows == 0:
                fr_tbl = _frontier_table([], [], [], [])
            _write_checkpoint(checkpoint_dir, rnd, fr_tbl, visited_parts[-1],
                              delta, metrics[-1])
            round_delta = []
        rnd += 1

    visited = (pa.concat_tables(visited_parts) if visited_parts
               else pa.table({"round": pa.array([], pa.int32()),
                              "discovery_seq": pa.array([], pa.int64()),
                              "url": pa.array([], pa.string()),
                              "host": pa.array([], pa.string()),
                              "depth": pa.array([], pa.int32()),
                              "parent_url_hash": pa.array([], pa.uint64())}))
    pages = None
    if keep_pages and page_datasets:
        pages = page_datasets[0]
        for d in page_datasets[1:]:
            pages = pages.union(d)
    stats = {"fetched": n_fetched, "rounds": rnd, "seen": seen.cardinality(),
             "politeness": ray.get(politeness.get_all_stats.remote())}
    return CrawlResult(visited=visited, pages=pages,
                       seen_snapshot=seen.snapshot(), stats=stats,
                       metrics=metrics)


def _write_checkpoint(ckpt_dir: str, rnd: int, frontier: pa.Table,
                      visited_delta: pa.Table, seen_delta: np.ndarray,
                      metric: dict) -> None:
    """Per-round, per-partition resumable layout (SURVEY §4.2.4):
    checkpoint/round=R/{frontier,visited,seen_delta}.parquet + _COMPLETE.
    The seen set is checkpointed as per-round sorted-hash DELTAS (the
    hashes first seen that round) — O(new keys) per round instead of
    O(total), which is what makes checkpointing affordable at 10^10 keys;
    the full set is the union of deltas (resume_info reconstructs it, and
    bit-for-bit comparison concatenates + sorts them). Goes through the
    storage switch (parquet default; lance when available, SURVEY §7.0)."""
    from ..sources.storage import DEFAULT_FORMAT, HAS_LANCE, write_table
    fmt = DEFAULT_FORMAT if (DEFAULT_FORMAT != "lance" or HAS_LANCE) else "parquet"
    d = os.path.join(ckpt_dir, f"round={rnd}")
    os.makedirs(d, exist_ok=True)
    seen_tbl = pa.table({"url_hash": pa.array(seen_delta, pa.uint64())})
    if fmt == "parquet":  # flat single-file layout kept for resume_info compat
        pq.write_table(frontier, os.path.join(d, "frontier.parquet"))
        pq.write_table(visited_delta, os.path.join(d, "visited.parquet"))
        pq.write_table(seen_tbl, os.path.join(d, "seen_delta.parquet"))
    else:  # pragma: no cover - lance path (not installed in sandbox)
        write_table(frontier, os.path.join(d, "frontier"), fmt=fmt)
        write_table(visited_delta, os.path.join(d, "visited"), fmt=fmt)
        write_table(seen_tbl, os.path.join(d, "seen_delta"), fmt=fmt)
    with open(os.path.join(d, "metrics.json"), "w") as f:
        json.dump(metric, f)
    with open(os.path.join(d, "_COMPLETE"), "w") as f:
        f.write("ok")


def resume_info(ckpt_dir: str) -> dict | None:
    """Max complete round's frontier + seen + fetched count (resume entry)."""
    if not os.path.isdir(ckpt_dir):
        return None
    rounds = sorted(int(n.split("=")[1]) for n in os.listdir(ckpt_dir)
                    if n.startswith("round=")
                    and os.path.exists(os.path.join(ckpt_dir, n, "_COMPLETE")))
    if not rounds:
        return None
    r = rounds[-1]
    d = os.path.join(ckpt_dir, f"round={r}")
    deltas = [pq.read_table(os.path.join(ckpt_dir, f"round={i}",
                                         "seen_delta.parquet"))
              .column("url_hash").to_numpy() for i in rounds]
    seen_all = (np.sort(np.concatenate(deltas)) if deltas
                else np.zeros(0, np.uint64))
    next_seq = None
    mpath = os.path.join(d, "metrics.json")
    if os.path.exists(mpath):
        with open(mpath) as f:
            next_seq = json.load(f).get("next_seq")
    return {
        "round": r,
        "frontier": pq.read_table(os.path.join(d, "frontier.parquet")),
        "seen": seen_all,
        "next_seq": next_seq,
        "fetched": sum(pq.read_table(os.path.join(ckpt_dir, f"round={i}", "visited.parquet")).num_rows
                       for i in rounds),
    }
