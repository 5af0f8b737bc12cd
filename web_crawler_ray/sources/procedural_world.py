"""Procedural (storage-free) crawl world: the network as a deterministic
function of the URL — the shape a 10^7–10^10-URL frontier demo actually
needs, since a materialized page store at that scale IS the dataset the
engine exists to avoid holding anywhere.

``ProceduralFetchStage`` plugs into ``crawl(fetch_stage=...)`` and emits
the same output schema as the page-store FetchStage (status, html,
xhr_json, links_canon, fetch_ok), but generates each page's outlinks
in-task from its URL:

- **Zipf hosts**: host ``i`` of ``n_hosts`` has
  ``ceil(base / (i+1)**skew)`` pages (``/`` is page 0, then ``/p{j}``).
- **B-ary tree links**: page ``j`` links to ``j*B+1 .. j*B+B`` (that
  exist) — BFS depth ~ log_B(host size), every page discovered exactly
  once through the tree.
- **Ghost links**: ``ghosts`` distinct links per page into ``/x/...``,
  which every host's robots.txt disallows. They flow through the full
  candidate pipeline — shuffle, first-seen dedup, SEEN-SET INSERT,
  discovery_seq assignment — and are dropped by the insert-time robots
  gate, exactly like the overwhelming majority of discovered-but-
  never-crawled URLs on the real web. seen keys ~= pages * (1+ghosts).
- **Duplicate links**: a deterministic already-seen intra-host link per
  page (dedup pressure), plus the child links' natural re-discovery.

All link URLs are canonicalize() fixed points (pinned in tests), so
bypassing the html parser changes nothing downstream. The stage is
~100 bytes of state (host-size array) — each fetch task regenerates its
slice of the world, nothing is stored or shipped.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def host_name(i: int) -> str:
    return f"s{i:05d}.example"


def procedural_robots(n_hosts: int) -> dict[str, str]:
    """Every host disallows /x (the ghost namespace)."""
    return {host_name(i): "User-agent: *\nDisallow: /x\n"
            for i in range(n_hosts)}


def procedural_seeds(n_hosts: int) -> list[str]:
    return [f"https://{host_name(i)}/" for i in range(n_hosts)]


class ProceduralFetchStage:
    """Deterministic network function over the Zipf/B-ary-tree world."""

    def __init__(self, n_hosts: int = 256, base: int = 68_000,
                 skew: float = 0.7, branching: int = 8, ghosts: int = 7):
        self.n_hosts = n_hosts
        self.branching = branching
        self.ghosts = ghosts
        self.sizes = np.ceil(
            base / np.arange(1, n_hosts + 1, dtype=np.float64) ** skew
        ).astype(np.int64)

    def total_pages(self) -> int:
        return int(self.sizes.sum())

    def _page_id(self, path: str) -> int:
        return 0 if path == "/" else int(path[2:])

    def __call__(self, batch: pa.Table) -> pa.Table:
        hosts = batch.column("host").to_pylist()
        paths = batch.column("path").to_pylist()
        n = len(hosts)
        status = np.full(n, 200, dtype=np.int16)
        links: list[list[str]] = []
        B, G = self.branching, self.ghosts
        for r in range(n):
            host = hosts[r]
            hi = int(host[1:6])
            size = int(self.sizes[hi]) if hi < self.n_hosts else 0
            j = self._page_id(paths[r])
            if j >= size:
                status[r] = 404
                links.append([])
                continue
            out = [f"https://{host}/p{c}"
                   for c in range(j * B + 1, min(j * B + B + 1, size))]
            # ghost links: globally distinct per (host, page)
            out += [f"https://{host}/x/{j}_{g}" for g in range(G)]
            # one deterministic duplicate link (already-seen w.h.p.)
            out.append(f"https://{host}/p{(j * 2654435761) % size}"
                       if (j * 2654435761) % size else f"https://{host}/")
            links.append(out)
        out_t = batch.append_column("status", pa.array(status, pa.int16()))
        out_t = out_t.append_column(
            "html", pa.array([""] * n, pa.large_string()))
        out_t = out_t.append_column(
            "xhr_json", pa.array([None] * n, pa.large_string()))
        out_t = out_t.append_column(
            "links_canon", pa.array(links, pa.list_(pa.string())))
        out_t = out_t.append_column(
            "fetch_ok", pa.array((status == 200).tolist(), pa.bool_()))
        return out_t
