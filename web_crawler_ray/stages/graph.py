"""Distributed connected components — the clustering step every
near-duplicate pipeline needs at scale.

The reference clusters duplicate groups single-process inside
enhanced-deduplication.service.js (pairwise similarity -> greedy
groups); the minhash/LSH ops in ``stages/dedup.py`` produce PAIRS and
today resolve them into components with a driver union-find over
O(pairs) rows. That is the right call while pairs fit on the driver;
this module adds the 100 TB form: min-label propagation expressed as
iterated keyed exchanges (tagged-union raw-task hash shuffle +
grouped ``min()``), with
the driver seeing only an O(1) convergence scalar per round.

Rounds needed = O(log diameter) with the pointer jump (near-dup
clusters are star-ish: diameter 2-3 in practice). Each round is a
keyed exchange of the undirected edge list with the current labels
plus one grouped min — O(E)-row shuffles; no driver materialization.
Dataset.join is deliberately avoided: its hash shuffle fails on
fully-empty partitions, which converged label columns produce.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

DRIVER_CC_MAX = 500_000  # edge count below which union-find runs driver-
# side: O(E alpha(N)) on one core beats 2 keyed shuffles per round, and
# the input is the SAME O(E) row stream a single reduce task would see.


def _owner_lookup(df: pd.DataFrame) -> pd.DataFrame:
    """Partition kernel for the keyed owner-lookup exchange (the
    join-free form of ``edges JOIN labels``): rows with tag=1 define a
    unique gkey -> lab mapping; rows with tag=0 carry (gkey, dst) and
    emit (node=dst, label=lab[gkey]). Fully vectorized (argsort +
    searchsorted); every follower's owner is co-partitioned by
    construction (same gkey => same partition)."""
    tag = df["tag"].to_numpy()
    own, fol = df[tag == 1], df[tag == 0]
    if not len(fol):
        return pd.DataFrame({"node": np.array([], np.int64),
                             "label": np.array([], np.int64)})
    ok = own["gkey"].to_numpy(np.int64)
    ol = own["lab"].to_numpy(np.int64)
    o = np.argsort(ok, kind="stable")
    ok, ol = ok[o], ol[o]
    fg = fol["gkey"].to_numpy(np.int64)
    idx = np.searchsorted(ok, fg)
    if len(ok) == 0 or not np.array_equal(ok[np.clip(idx, 0,
                                                     len(ok) - 1)], fg):
        raise ValueError("owner-lookup exchange: follower key without "
                         "an owner row (caller must key owners by "
                         "every follower gkey)")
    return pd.DataFrame({"node": fol["dst"].to_numpy(np.int64),
                         "label": ol[idx]})


def _min_per_node(df: pd.DataFrame) -> pd.DataFrame:
    """Partition kernel: MIN(label) GROUP BY node, vectorized."""
    n = df["node"].to_numpy(np.int64)
    lb = df["label"].to_numpy(np.int64)
    if not len(n):
        return pd.DataFrame({"node": n, "label": lb})
    order = np.lexsort((lb, n))
    ns, ls = n[order], lb[order]
    starts = np.concatenate(([0], np.flatnonzero(ns[1:] != ns[:-1]) + 1))
    return pd.DataFrame({"node": ns[starts], "label": ls[starts]})


@ray.remote
def _isin_count(t: pa.Table, seed_arr) -> int:
    return int(np.isin(t.column("node").to_numpy(zero_copy_only=False),
                       seed_arr).sum())


@ray.remote
def _label_sum(t: pa.Table) -> int:
    import pyarrow.compute as pc
    return int(pc.sum(t.column("label")).as_py() or 0)


def _distinct_edges(df: pd.DataFrame) -> pd.DataFrame:
    """Partition kernel: DISTINCT (src, dst). Partitioned by src, so
    within-partition dedup IS global dedup."""
    u = df["src"].to_numpy(np.int64)
    v = df["dst"].to_numpy(np.int64)
    if not len(u):
        return pd.DataFrame({"src": u, "dst": v})
    uv = np.unique(np.stack([u, v], axis=1), axis=0)
    return pd.DataFrame({"src": uv[:, 0], "dst": uv[:, 1]})


def _init_labels_kernel(df: pd.DataFrame) -> pd.DataFrame:
    """Partition kernel: DISTINCT src as (node, label=node)."""
    n = np.unique(df["src"].to_numpy(np.int64))
    return pd.DataFrame({"node": n, "label": n})


def _distinct_nodes(df: pd.DataFrame) -> pd.DataFrame:
    n = np.unique(df["node"].to_numpy(np.int64))
    return pd.DataFrame({"node": n})


def _union_find(u: np.ndarray, v: np.ndarray):
    """Exact union-find with path halving; union-by-min so every root
    is its component's minimum node id. Returns (nodes, component)."""
    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    parent = np.arange(len(nodes))
    ui, vi = inv[: len(u)], inv[len(u):]

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(ui.tolist(), vi.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    comp = np.array([find(i) for i in range(len(nodes))], np.int64)
    # union-by-min keeps the root at the smallest dense index, and
    # np.unique sorts ascending, so nodes[root] IS the component min.
    return nodes, nodes[comp]


def connected_components(edges_ds, src: str = "src", dst: str = "dst",
                         driver_limit: int = DRIVER_CC_MAX,
                         max_iters: int = 64,
                         num_partitions: int = 8):
    """Connected components of the undirected graph given by an edge
    Dataset. Returns a ``pyarrow.Table`` (node, component) sorted by
    node, where ``component`` is the minimum node id in the component.

    Below ``driver_limit`` edges the exact union-find runs driver-side
    (see DRIVER_CC_MAX). Above it — or when ``driver_limit=0`` forces
    it — the distributed plan runs min-label propagation:

        labels   <- distinct nodes, label = node
        repeat:  msgs  = (und_edges + labels) GROUP BY src:
                         each edge row gets its src's label
                 labels = msgs GROUP BY dst MIN(label), then one
                         pointer-jump indirection
        until    sum(label) stops decreasing   (one scalar per round)

    The undirected edge list carries self-loops so every node hears its
    own current label, and each round ends with a pointer jump
    (label <- label(label)), so convergence takes O(log diameter)
    rounds. The label sum is monotonically non-increasing and integer,
    so the fixed point is detected exactly. Each round's labels are
    materialized — iterative lineage would otherwise recompute all
    prior rounds.
    """
    import ray
    import pyarrow.compute as pc
    from ray.data.aggregate import Min, Sum

    # Pin the edge list once: count() would otherwise execute the
    # upstream pipeline and the real consumer would re-execute it.
    edges_ds = edges_ds.materialize()
    n_edges = edges_ds.count()
    if n_edges == 0:
        return pa.table({"node": pa.array([], pa.int64()),
                         "component": pa.array([], pa.int64())})

    if n_edges <= driver_limit:
        cols = [pa.table(b) for b in
                edges_ds.select_columns([src, dst])
                        .iter_batches(batch_format="pyarrow")]
        cat = pa.concat_tables(cols)
        u = cat.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
        v = cat.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
        nodes, comp = _union_find(u, v)
        return pa.table({"node": nodes, "component": comp})

    def to_und(t: pa.Table) -> pa.Table:
        a = t.column(src).cast(pa.int64()).combine_chunks()
        b = t.column(dst).cast(pa.int64()).combine_chunks()
        return pa.table({
            "src": pa.concat_arrays([a, b, a, b]),
            "dst": pa.concat_arrays([b, a, a, b]),  # + self-loops
        })

    from .shuffles import int_part_map as _ipm

    und = _ipm(edges_ds.map_batches(to_und, batch_format="pyarrow"),
               "src", _distinct_edges, num_partitions=num_partitions)
    labels = _ipm(und, "src", _init_labels_kernel,
                  num_partitions=num_partitions)
    # Every keyed exchange below rides the raw-task hash shuffle
    # (shuffles.int_part_map — two flat task waves, vectorized kernel
    # per partition), never Dataset.join or the sort-based groupby:
    # the join's hash shuffle breaks on fully-empty partitions
    # (schema-less blocks), which converged label columns (all rows
    # sharing one value) produce routinely, and the sort path pays a
    # multi-second fixed job cost PER EXCHANGE — ruinous in a loop
    # that runs three exchanges per round.
    from .shuffles import int_part_map

    def tag_und(t: pa.Table) -> pa.Table:
        z = np.zeros(t.num_rows, np.int64)
        return pa.table({"gkey": t.column("src"), "dst": t.column("dst"),
                         "lab": pa.array(z),
                         "tag": pa.array(np.zeros(t.num_rows, np.int8))})

    def tag_own(t: pa.Table) -> pa.Table:
        return pa.table({"gkey": t.column("node"),
                         "dst": pa.array(np.zeros(t.num_rows, np.int64)),
                         "lab": t.column("label"),
                         "tag": pa.array(np.ones(t.num_rows, np.int8))})

    def tag_fol(t: pa.Table) -> pa.Table:
        # pointer-jump followers: keyed by their LABEL, payload = node
        return pa.table({"gkey": t.column("label"),
                         "dst": t.column("node"),
                         "lab": pa.array(np.zeros(t.num_rows, np.int64)),
                         "tag": pa.array(np.zeros(t.num_rows, np.int8))})

    prev_sum = None
    for _ in range(max_iters):
        tagged = und.map_batches(tag_und, batch_format="pyarrow") \
                    .union(labels.map_batches(tag_own,
                                              batch_format="pyarrow"))
        msgs = int_part_map(tagged, "gkey", _owner_lookup,
                            num_partitions=num_partitions)
        l1 = int_part_map(msgs, "node", _min_per_node,
                          num_partitions=num_partitions)
        # Pointer jump (label <- label(label)): every label IS a node
        # id (init = self, propagated = min of node ids), and labels
        # are monotone non-increasing, so one extra indirection doubles
        # the effective propagation distance — O(log diameter) rounds
        # on path-like graphs instead of O(diameter).
        jt = l1.map_batches(tag_fol, batch_format="pyarrow") \
               .union(l1.map_batches(tag_own, batch_format="pyarrow"))
        labels = int_part_map(jt, "gkey", _owner_lookup,
                              num_partitions=num_partitions)
        # Convergence scalar: per-block remote sums — the label vector
        # itself never reaches the driver.
        s = sum(ray.get([_label_sum.remote(r)
                         for r in labels.to_arrow_refs()]))
        if prev_sum is not None and s == prev_sum:
            break
        prev_sum = s
    else:
        import warnings
        warnings.warn(
            f"connected_components: label propagation did not stabilize "
            f"within max_iters={max_iters}; components may be "
            f"non-converged (raise max_iters)", RuntimeWarning)
    # Stays a Dataset: the labeling is O(nodes) — a sink or the
    # O(components) summary below consumes it, never the driver.
    return labels.map_batches(
        lambda t: t.rename_columns(["node", "component"]),
        batch_format="pyarrow")


def component_sizes(cc) -> pa.Table:
    """(component, n_nodes) summary of a connected_components result
    (pyarrow Table or Ray Dataset), sorted by component — the
    O(components) report a driver can hold."""
    if isinstance(cc, pa.Table):
        g = (cc.select(["component"])
               .group_by(["component"], use_threads=False)
               .aggregate([([], "count_all")]))
        return g.rename_columns(["component", "n_nodes"]) \
                .sort_by("component")
    from ray.data.aggregate import Count
    parts = [pa.table(b) for b in
             cc.groupby("component").aggregate(Count(alias_name="n_nodes"))
               .iter_batches(batch_format="pyarrow")]
    cat = pa.concat_tables(parts) if parts else pa.table(
        {"component": pa.array([], pa.int64()),
         "n_nodes": pa.array([], pa.int64())})
    return cat.select(["component", "n_nodes"]).sort_by("component")


def pagerank(edges_ds, src: str = "src", dst: str = "dst",
             n_iters: int = 3, damping: float = 0.85,
             driver_limit: int = DRIVER_CC_MAX,
             num_partitions: int = 8, seeds=None):
    """Fixed-iteration PageRank over a directed edge Dataset — the
    classic crawl-frontier ranking signal (the reference ranks links
    with regex heuristics, link-explorer.service.js; at 100 TB the
    graph signal is computed like this). Returns (node, rank) with the
    full-precision float; callers round for reporting.

    Semantics (mirrored exactly by the DuckDB oracle): distinct edges;
    rank_0 = 1/N; rank_{t+1}(u) = (1-d)/N + d * sum over in-edges
    (v,u) of rank_t(v)/outdeg(v). Dangling nodes simply leak their
    mass (no redistribution) — the documented choice. With ``seeds``
    (an iterable of node ids) the walk is PERSONALIZED: rank_0 and the
    teleport term concentrate uniformly on the seed set (seeds absent
    from the graph are ignored; at least one must be present) — the
    seeded-relevance form a crawl frontier would use to rank hosts
    around a trust set.

    Below ``driver_limit`` edges the loop is numpy on the driver
    (np.add.at scatter — same O(E) stream a reduce task sees). Above,
    each iteration is one keyed exchange of the static distinct edge
    table with the current ranks (tagged-union sort-groupby; out-degree
    counted inside the src group) plus one grouped sum, with a
    zero-contribution self row per node so rank-starved nodes keep the
    base term; the driver never sees the rank vector.
    """
    import ray
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    edges_ds = edges_ds.materialize()  # one execution; count() is metadata
    n_edges = edges_ds.count()
    if n_edges == 0:
        return pa.table({"node": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.float64())})

    if n_edges <= driver_limit:
        cat = pa.concat_tables(
            [pa.table(b) for b in edges_ds.select_columns([src, dst])
                                          .iter_batches(batch_format="pyarrow")])
        u = cat.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
        v = cat.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
        uv = np.unique(np.stack([u, v], axis=1), axis=0)  # distinct edges
        u, v = uv[:, 0], uv[:, 1]
        nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
        ui, vi = inv[: len(u)], inv[len(u):]
        n = len(nodes)
        deg = np.bincount(ui, minlength=n).astype(np.float64)
        if seeds is not None:
            sarr = np.unique(np.asarray(list(seeds), np.int64))
            is_seed = np.isin(nodes, sarr)
            ns = float(is_seed.sum())
            if not ns:
                raise ValueError("pagerank: no seed is a graph node")
            r = np.where(is_seed, 1.0 / ns, 0.0)
            basev = np.where(is_seed, (1.0 - damping) / ns, 0.0)
        else:
            r = np.full(n, 1.0 / n)
            basev = (1.0 - damping) / n
        for _ in range(n_iters):
            acc = np.zeros(n)
            np.add.at(acc, vi, r[ui] / deg[ui])
            r = basev + damping * acc
        return pa.table({"node": nodes, "rank": r})

    # ---- distributed path ------------------------------------------------
    def to_e(t: pa.Table) -> pa.Table:
        return pa.table({"src": t.column(src).cast(pa.int64()),
                         "dst": t.column(dst).cast(pa.int64())})

    from .shuffles import int_part_map as _ipm

    e = _ipm(edges_ds.map_batches(to_e, batch_format="pyarrow"),
             "src", _distinct_edges, num_partitions=num_partitions)

    def node_rows(t: pa.Table) -> pa.Table:
        a = t.column("src").combine_chunks()
        b = t.column("dst").combine_chunks()
        return pa.table({"node": pa.concat_arrays([a, b])})

    nodes = _ipm(e.map_batches(node_rows, batch_format="pyarrow"),
                 "node", _distinct_nodes, num_partitions=num_partitions)
    n = nodes.count()

    if seeds is not None:
        sarr = np.unique(np.asarray(list(seeds), np.int64))
        seed_ref = ray.put(sarr)
        ns = sum(ray.get([_isin_count.remote(r_, seed_ref)
                          for r_ in nodes.to_arrow_refs()]))
        if not ns:
            raise ValueError("pagerank: no seed is a graph node")

        def init_r(t: pa.Table) -> pa.Table:
            sa = ray.get(seed_ref)
            nd = t.column("node").to_numpy(zero_copy_only=False)
            return pa.table({"node": t.column("node"),
                             "rank": pa.array(np.where(
                                 np.isin(nd, sa), 1.0 / ns, 0.0))})

        ranks = nodes.map_batches(init_r,
                                  batch_format="pyarrow").materialize()
        base = 0.0  # per-node teleport added after the grouped sum
    else:
        ranks = nodes.map_batches(
            lambda t: t.append_column("rank", pa.array(
                np.full(t.num_rows, 1.0 / n))),
            batch_format="pyarrow").materialize()
        base = (1.0 - damping) / n

    # Raw-task keyed exchanges instead of Dataset.join / sort-groupby
    # (see connected_components: the join breaks on empty partitions,
    # the sort pays seconds of fixed cost per exchange). The out-degree
    # is counted INSIDE each src group, so no degree join exists.
    from .shuffles import int_part_map

    def tag_e(t: pa.Table) -> pa.Table:
        return pa.table({"gkey": t.column("src"), "dst": t.column("dst"),
                         "r": pa.array(np.zeros(t.num_rows)),
                         "tag": pa.array(np.zeros(t.num_rows, np.int8))})

    def tag_r(t: pa.Table) -> pa.Table:
        return pa.table({"gkey": t.column("node"),
                         "dst": pa.array(np.zeros(t.num_rows, np.int64)),
                         "r": t.column("rank"),
                         "tag": pa.array(np.ones(t.num_rows, np.int8))})

    def contrib_kernel(df: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd
        tag = df["tag"].to_numpy()
        own, fol = df[tag == 1], df[tag == 0]
        if not len(fol):  # partition of pure dangling owners
            return pd.DataFrame({"node": np.array([], np.int64),
                                 "c": np.array([], np.float64)})
        ok = own["gkey"].to_numpy(np.int64)
        orr = own["r"].to_numpy(np.float64)
        o = np.argsort(ok, kind="stable")
        ok, orr = ok[o], orr[o]
        g = fol["gkey"].to_numpy(np.int64)
        d = fol["dst"].to_numpy(np.int64)
        so = np.argsort(g, kind="stable")
        g, d = g[so], d[so]
        starts = np.concatenate(
            ([0], np.flatnonzero(g[1:] != g[:-1]) + 1, [len(g)]))
        deg = np.diff(starts)
        idx = np.searchsorted(ok, g)
        if len(ok) == 0 or not np.array_equal(
                ok[np.clip(idx, 0, len(ok) - 1)], g):
            raise ValueError("pagerank contribution exchange: edge src "
                             "without a rank row")
        c = orr[idx] / np.repeat(deg, deg)
        return pd.DataFrame({"node": d, "c": c})

    def rank_kernel(df: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd
        n = df["node"].to_numpy(np.int64)
        c = df["c"].to_numpy(np.float64)
        if not len(n):
            return pd.DataFrame({"node": n,
                                 "rank": np.array([], np.float64)})
        order = np.argsort(n, kind="stable")
        ns, cs = n[order], c[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(ns[1:] != ns[:-1]) + 1))
        sums = np.add.reduceat(cs, starts)
        return pd.DataFrame({"node": ns[starts],
                             "rank": base + damping * sums})

    zero = nodes.map_batches(
        lambda t: pa.table({"node": t.column("node"),
                            "c": pa.array(np.zeros(t.num_rows))}),
        batch_format="pyarrow").materialize()
    def add_seed_base(t: pa.Table) -> pa.Table:
        sa = ray.get(seed_ref)
        nd = t.column("node").to_numpy(zero_copy_only=False)
        bv = np.where(np.isin(nd, sa), (1.0 - damping) / ns, 0.0)
        # kernel produced 0.0 + damping*sum, so this single add is the
        # same float op order as the driver path's basev + damping*acc
        return pa.table({"node": t.column("node"),
                         "rank": pa.array(
                             bv + t.column("rank").to_numpy(
                                 zero_copy_only=False))})

    for _ in range(n_iters):
        tagged = e.map_batches(tag_e, batch_format="pyarrow") \
                  .union(ranks.map_batches(tag_r,
                                           batch_format="pyarrow"))
        msgs = int_part_map(tagged, "gkey", contrib_kernel,
                            num_partitions=num_partitions)
        ranks = int_part_map(msgs.union(zero), "node", rank_kernel,
                             num_partitions=num_partitions)
        if seeds is not None:
            ranks = ranks.map_batches(
                add_seed_base, batch_format="pyarrow").materialize()
    out = pa.concat_tables(
        [pa.table(b) for b in ranks.iter_batches(batch_format="pyarrow")])
    return out.sort_by("node")


def host_pagerank(visited, n_iters: int = 3, damping: float = 0.85,
                  num_partitions: int = 8) -> pa.Table:
    """Host-level PageRank over a crawl's REAL link graph — ranks the
    crawled hosts by their parent->child fetch lineage (CrawlResult
    .visited carries ``parent_url_hash``; the reference ranks links
    with per-URL regex heuristics only, link-explorer.service.js).

    Each visited row is an edge host(parent) -> host(child). Parent
    hosts are resolved hash->host with the same owner-lookup exchange
    the component/rank loops use (owners = every visited url_hash,
    followers = every parent_url_hash), so a spilled visited Dataset
    (crawl(visited_spill_dir=...), the 10^10-URL form) streams through
    without driver materialization; a driver-held visited Table takes
    the same path via a one-block Dataset. Host names ride as signed
    64-bit host hashes through ``pagerank`` and are joined back from
    the O(hosts) distinct map at the end.

    Returns (host, pr) sorted by pr descending, host ascending.
    """
    import ray.data as rd
    from .shuffles import int_part_map
    from ..functions.hashing import hash64_many

    if isinstance(visited, pa.Table):
        visited = rd.from_arrow(visited)

    def tag_rows(t: pa.Table) -> pa.Table:
        urls = t.column("url").to_pylist()
        hosts = t.column("host").to_pylist()
        uh = hash64_many(urls).view(np.int64)  # bit reinterpret:
        hh = hash64_many(hosts).view(np.int64)  # uint64 -> int64 keys
        ph = t.column("parent_url_hash").to_numpy(
            zero_copy_only=False).astype(np.uint64).view(np.int64)
        live = ph != 0  # seeds have no parent
        own = pa.table({"gkey": pa.array(uh), "dst": pa.array(uh),
                        "lab": pa.array(hh),
                        "tag": pa.array(np.ones(len(uh), np.int8))})
        fol = pa.table({"gkey": pa.array(ph[live]),
                        "dst": pa.array(hh[live]),  # child host hash
                        "lab": pa.array(np.zeros(int(live.sum()),
                                                 np.int64)),
                        "tag": pa.array(np.zeros(int(live.sum()),
                                                 np.int8))})
        return pa.concat_tables([own, fol])

    tagged = visited.map_batches(tag_rows, batch_format="pyarrow")
    # owner-lookup emits (node=child_host_hash, label=parent_host_hash)
    edges = int_part_map(tagged, "gkey", _owner_lookup,
                         num_partitions=num_partitions) \
        .map_batches(lambda t: pa.table({"src": t.column("label"),
                                         "dst": t.column("node")}),
                     batch_format="pyarrow")
    ranks = pagerank(edges, n_iters=n_iters, damping=damping,
                     num_partitions=num_partitions)

    names = {}  # O(hosts) driver map, hash -> host string
    for b in visited.select_columns(["host"]) \
                    .iter_batches(batch_format="pyarrow"):
        hs = sorted(set(pa.table(b).column("host").to_pylist()))
        for k, h in zip(hash64_many(hs).view(np.int64).tolist(), hs):
            names.setdefault(k, h)
    out = pa.table({
        "host": pa.array([names[k] for k in
                          ranks.column("node").to_pylist()]),
        "pr": ranks.column("rank"),
    })
    return out.sort_by([("pr", "descending"), ("host", "ascending")])


@ray.remote
def _float_sum(t: pa.Table, col: str) -> float:
    import pyarrow.compute as pc
    return float(pc.sum(t.column(col)).as_py() or 0.0)


def hits(edges_ds, src: str = "src", dst: str = "dst",
         n_iters: int = 2, driver_limit: int = DRIVER_CC_MAX,
         num_partitions: int = 8):
    """HITS hubs & authorities (Kleinberg) over a directed edge
    Dataset, L1-normalized per half-step (sum-normalization keeps the
    oracle plain SQL — no sqrt subqueries; the ranking order equals
    the L2 form's). h_0 = 1/N; per iteration: a = E^T h then a /= sum,
    h = E a then h /= sum. Returns (node, hub, authority).

    Same two-path shape as pagerank: numpy scatter below
    ``driver_limit`` edges; above, each half-step is one owner-lookup
    keyed exchange (raw-task hash shuffle, no joins) plus a grouped
    sum with zero self-rows, and the normalizer is an O(blocks) remote
    scalar reduction — the driver never holds a vector.
    """
    import pyarrow.compute as pc

    if n_iters < 1:
        raise ValueError("hits: n_iters must be >= 1")
    edges_ds = edges_ds.materialize()
    n_edges = edges_ds.count()
    if n_edges == 0:
        return pa.table({"node": pa.array([], pa.int64()),
                         "hub": pa.array([], pa.float64()),
                         "authority": pa.array([], pa.float64())})

    if n_edges <= driver_limit:
        cat = pa.concat_tables(
            [pa.table(b) for b in edges_ds.select_columns([src, dst])
                                          .iter_batches(batch_format="pyarrow")])
        u = cat.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
        v = cat.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
        uv = np.unique(np.stack([u, v], axis=1), axis=0)
        u, v = uv[:, 0], uv[:, 1]
        nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
        ui, vi = inv[: len(u)], inv[len(u):]
        n = len(nodes)
        h = np.full(n, 1.0 / n)
        a = np.zeros(n)
        for _ in range(n_iters):
            a = np.zeros(n)
            np.add.at(a, vi, h[ui])
            sa = a.sum()
            if sa > 0:
                a = a / sa
            h = np.zeros(n)
            np.add.at(h, ui, a[vi])
            sh = h.sum()
            if sh > 0:
                h = h / sh
        return pa.table({"node": nodes, "hub": h, "authority": a})

    # ---- distributed path ------------------------------------------------
    from .shuffles import int_part_map as _ipm

    def to_e(t: pa.Table) -> pa.Table:
        return pa.table({"src": t.column(src).cast(pa.int64()),
                         "dst": t.column(dst).cast(pa.int64())})

    e = _ipm(edges_ds.map_batches(to_e, batch_format="pyarrow"),
             "src", _distinct_edges, num_partitions=num_partitions)

    def node_rows(t: pa.Table) -> pa.Table:
        aa = t.column("src").combine_chunks()
        bb = t.column("dst").combine_chunks()
        return pa.table({"node": pa.concat_arrays([aa, bb])})

    nodes = _ipm(e.map_batches(node_rows, batch_format="pyarrow"),
                 "node", _distinct_nodes, num_partitions=num_partitions)
    n = nodes.count()
    zero = nodes.map_batches(
        lambda t: pa.table({"node": t.column("node"),
                            "c": pa.array(np.zeros(t.num_rows))}),
        batch_format="pyarrow").materialize()

    def sum_kernel(df: "pd.DataFrame") -> "pd.DataFrame":
        nd = df["node"].to_numpy(np.int64)
        c = df["c"].to_numpy(np.float64)
        if not len(nd):
            return pd.DataFrame({"node": nd, "val": c})
        order = np.argsort(nd, kind="stable")
        ns_, cs = nd[order], c[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(ns_[1:] != ns_[:-1]) + 1))
        return pd.DataFrame({"node": ns_[starts],
                             "val": np.add.reduceat(cs, starts)})

    def spread(vec_ds, key_col: str, out_col: str):
        """One E-multiply half-step: vec keyed by ``key_col`` end of
        each edge, mass lands on the other (``out_col``) end."""
        def tag_edge(t: pa.Table) -> pa.Table:
            return pa.table({"gkey": t.column(key_col),
                             "dst": t.column(out_col),
                             "r": pa.array(np.zeros(t.num_rows)),
                             "tag": pa.array(np.zeros(t.num_rows,
                                                      np.int8))})

        def tag_vec(t: pa.Table) -> pa.Table:
            return pa.table({"gkey": t.column("node"),
                             "dst": pa.array(np.zeros(t.num_rows,
                                                      np.int64)),
                             "r": t.column("val"),
                             "tag": pa.array(np.ones(t.num_rows,
                                                     np.int8))})

        def emit(df: "pd.DataFrame") -> "pd.DataFrame":
            tg = df["tag"].to_numpy()
            own, fol = df[tg == 1], df[tg == 0]
            if not len(fol):
                return pd.DataFrame({"node": np.array([], np.int64),
                                     "c": np.array([], np.float64)})
            ok = own["gkey"].to_numpy(np.int64)
            ov = own["r"].to_numpy(np.float64)
            o = np.argsort(ok, kind="stable")
            ok, ov = ok[o], ov[o]
            g = fol["gkey"].to_numpy(np.int64)
            idx = np.searchsorted(ok, g)
            if len(ok) == 0 or not np.array_equal(
                    ok[np.clip(idx, 0, len(ok) - 1)], g):
                raise ValueError("hits spread: edge end without a "
                                 "vector row")
            return pd.DataFrame({"node": fol["dst"].to_numpy(np.int64),
                                 "c": ov[idx]})

        tagged = e.map_batches(tag_edge, batch_format="pyarrow") \
                  .union(vec_ds.map_batches(tag_vec,
                                            batch_format="pyarrow"))
        msgs = _ipm(tagged, "gkey", emit,
                    num_partitions=num_partitions)
        summed = _ipm(msgs.union(zero), "node", sum_kernel,
                      num_partitions=num_partitions)
        total = sum(ray.get([_float_sum.remote(r_, "val")
                             for r_ in summed.to_arrow_refs()]))

        def norm(t: pa.Table) -> pa.Table:
            vv = t.column("val").to_numpy(zero_copy_only=False)
            return pa.table({"node": t.column("node"),
                             "val": pa.array(vv / total if total > 0
                                             else vv)})

        return summed.map_batches(norm,
                                  batch_format="pyarrow").materialize()

    h = nodes.map_batches(
        lambda t: pa.table({"node": t.column("node"),
                            "val": pa.array(np.full(t.num_rows,
                                                    1.0 / n))}),
        batch_format="pyarrow").materialize()
    a = None
    for _ in range(n_iters):
        a = spread(h, "src", "dst")   # authorities gather from hubs
        h = spread(a, "dst", "src")   # hubs gather from authorities
    at = pa.concat_tables([pa.table(b) for b in
                           a.iter_batches(batch_format="pyarrow")]) \
        .sort_by("node")
    ht = pa.concat_tables([pa.table(b) for b in
                           h.iter_batches(batch_format="pyarrow")]) \
        .sort_by("node")
    return pa.table({"node": ht.column("node"),
                     "hub": ht.column("val"),
                     "authority": at.column("val")})
