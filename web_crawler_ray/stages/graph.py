"""Distributed connected components — the clustering step every
near-duplicate pipeline needs at scale.

The reference clusters duplicate groups single-process inside
enhanced-deduplication.service.js (pairwise similarity -> greedy
groups); the minhash/LSH ops in ``stages/dedup.py`` produce PAIRS and
today resolve them into components with a driver union-find over
O(pairs) rows. That is the right call while pairs fit on the driver;
this module adds the 100 TB form: min-label propagation expressed as
iterated Ray ``join`` + ``groupby().min()`` jobs, with the driver
seeing only an O(1) convergence scalar per round.

Rounds needed = graph diameter (near-dup clusters are star-ish:
diameter 2-3 in practice). Each round is one hash join of the
undirected edge list against the current labels plus one grouped min —
two keyed shuffles of O(E) rows; no driver materialization.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

DRIVER_CC_MAX = 500_000  # edge count below which union-find runs driver-
# side: O(E alpha(N)) on one core beats 2 keyed shuffles per round, and
# the input is the SAME O(E) row stream a single reduce task would see.


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
        repeat:  msgs  = und_edges JOIN labels ON src == node
                 labels = msgs GROUP BY dst MIN(label)
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

    from ray.data.aggregate import Count

    und = (edges_ds.map_batches(to_und, batch_format="pyarrow")
           .groupby(["src", "dst"])
           .aggregate(Count(alias_name="_n"))
           .select_columns(["src", "dst"])
           .materialize())

    def init_labels(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("src"),
                         "label": t.column("src")})

    labels = (und.groupby("src").aggregate(Count(alias_name="_n"))
              .map_batches(init_labels, batch_format="pyarrow")
              .materialize())
    prev_sum = None
    for _ in range(max_iters):
        msgs = und.join(labels, join_type="inner",
                        num_partitions=num_partitions,
                        on=("src",), right_on=("node",))
        l1 = (msgs.groupby("dst")
                  .aggregate(Min("label", alias_name="label"))
                  .map_batches(lambda t: t.rename_columns(
                      ["node", "label"]),
                      batch_format="pyarrow")
                  .materialize())
        # Pointer jump (label <- label(label)): every label IS a node
        # id (init = self, propagated = min of node ids), and labels
        # are monotone non-increasing, so one extra self-join doubles
        # the effective propagation distance — O(log diameter) rounds
        # on path-like graphs instead of O(diameter).
        jump = l1.map_batches(
            lambda t: t.rename_columns(["jnode", "jlabel"]),
            batch_format="pyarrow")
        labels = (l1.join(jump, join_type="inner",
                          num_partitions=num_partitions,
                          on=("label",), right_on=("jnode",))
                    .map_batches(lambda t: pa.table(
                        {"node": t.column("node"),
                         "label": t.column("jlabel")}),
                        batch_format="pyarrow")
                    .materialize())
        s = labels.aggregate(Sum("label", alias_name="s"))["s"]
        if prev_sum is not None and s == prev_sum:
            break
        prev_sum = s
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
             num_partitions: int = 8):
    """Fixed-iteration PageRank over a directed edge Dataset — the
    classic crawl-frontier ranking signal (the reference ranks links
    with regex heuristics, link-explorer.service.js; at 100 TB the
    graph signal is computed like this). Returns (node, rank) with the
    full-precision float; callers round for reporting.

    Semantics (mirrored exactly by the DuckDB oracle): distinct edges;
    rank_0 = 1/N; rank_{t+1}(u) = (1-d)/N + d * sum over in-edges
    (v,u) of rank_t(v)/outdeg(v). Dangling nodes simply leak their
    mass (no redistribution) — the documented choice.

    Below ``driver_limit`` edges the loop is numpy on the driver
    (np.add.at scatter — same O(E) stream a reduce task sees). Above,
    each iteration is one hash join of the static (src, dst, outdeg)
    edge table against the current ranks plus one grouped sum, with a
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
        r = np.full(n, 1.0 / n)
        for _ in range(n_iters):
            acc = np.zeros(n)
            np.add.at(acc, vi, r[ui] / deg[ui])
            r = (1.0 - damping) / n + damping * acc
        return pa.table({"node": nodes, "rank": r})

    # ---- distributed path ------------------------------------------------
    def to_e(t: pa.Table) -> pa.Table:
        return pa.table({"src": t.column(src).cast(pa.int64()),
                         "dst": t.column(dst).cast(pa.int64())})

    e = (edges_ds.map_batches(to_e, batch_format="pyarrow")
         .groupby(["src", "dst"]).aggregate(Count(alias_name="_n"))
         .select_columns(["src", "dst"]).materialize())
    deg = e.groupby("src").aggregate(Count(alias_name="outdeg"))
    ewd = e.join(deg, join_type="inner", num_partitions=num_partitions,
                 on=("src",)).materialize()  # (src, dst, outdeg), static

    def node_rows(t: pa.Table) -> pa.Table:
        a = t.column("src").combine_chunks()
        b = t.column("dst").combine_chunks()
        return pa.table({"node": pa.concat_arrays([a, b])})

    nodes = (e.map_batches(node_rows, batch_format="pyarrow")
             .groupby("node").aggregate(Count(alias_name="_n"))
             .select_columns(["node"]).materialize())
    n = nodes.count()

    ranks = nodes.map_batches(
        lambda t: t.append_column("rank", pa.array(
            np.full(t.num_rows, 1.0 / n))),
        batch_format="pyarrow").materialize()
    base = (1.0 - damping) / n
    for _ in range(n_iters):
        msgs = ewd.join(ranks, join_type="inner",
                        num_partitions=num_partitions,
                        on=("src",), right_on=("node",))

        def contrib(t: pa.Table) -> pa.Table:
            c = pc.divide(t.column("rank"),
                          pc.cast(t.column("outdeg"), pa.float64()))
            return pa.table({"node": t.column("dst"), "c": c})

        zero = nodes.map_batches(
            lambda t: t.append_column("c", pa.array(
                np.zeros(t.num_rows))),
            batch_format="pyarrow")
        summed = (msgs.map_batches(contrib, batch_format="pyarrow")
                  .union(zero)
                  .groupby("node").aggregate(Sum("c", alias_name="c")))
        ranks = summed.map_batches(
            lambda t: pa.table({
                "node": t.column("node"),
                "rank": pc.add(pa.scalar(base), pc.multiply(
                    pa.scalar(damping), t.column("c")))}),
            batch_format="pyarrow").materialize()
    out = pa.concat_tables(
        [pa.table(b) for b in ranks.iter_batches(batch_format="pyarrow")])
    return out.sort_by("node")
