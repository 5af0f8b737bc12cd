"""Frozen recorded traces (FIXTURES.md §6): the engine must match the
checked-in oracle trace bit-for-bit — guards against the engine and the
live oracle drifting together."""

import json
import os

import numpy as np

from web_crawler_ray.functions.domlite import parse
from web_crawler_ray.pipelines.crawl import crawl
from web_crawler_ray.sources import synth_world as W
from web_crawler_ray.stages.extract import assemble_spans

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def test_golden_crawl_trace():
    with open(os.path.join(FIX, "golden_crawl_trace.json")) as f:
        golden = json.load(f)
    w = golden["world"]
    p = golden["params"]
    tbl, robots, seeds = W.world(seed=w["seed"], n_hosts=w["n_hosts"],
                                 pages_per_host_base=w["pages_per_host_base"])
    res = crawl(tbl, robots, seeds, max_pages=p["max_pages"],
                max_depth=p["max_depth"], round_seconds=p["round_seconds"],
                keep_pages=False)
    got = [[r, s, u] for r, s, u in
           zip(res.visited.column("round").to_pylist(),
               res.visited.column("discovery_seq").to_pylist(),
               res.visited.column("url").to_pylist())]
    assert got == golden["fetch_order"]
    assert np.array_equal(res.seen_snapshot,
                          np.array([int(h) for h in golden["seen_hashes"]],
                                   dtype=np.uint64))
    assert res.stats["fetched"] == golden["stats"]["fetched"]


def test_golden_spans():
    with open(os.path.join(FIX, "golden_spans.json")) as f:
        golden = json.load(f)
    w_tbl, _, _ = W.world(seed=42, n_hosts=5, pages_per_host_base=20)
    by_url = {r["url"]: r for r in w_tbl.to_pylist()}
    for case in golden:
        page = by_url[case["url"]]
        got = assemble_spans(parse(page["html"]))
        assert got == case["spans"], case["url"]
