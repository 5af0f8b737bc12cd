"""World generator v2 (mirrors / long docs / media galleries) + the
crawl-path content dedup and multimodal query they exercise."""

import json
import os

import numpy as np
import pytest
import ray
import ray.data as rd

from web_crawler_ray.oracle.reference_oracle import oracle_crawl
from web_crawler_ray.pipelines.crawl import crawl
from web_crawler_ray.sources import synth_world as W

FIX = os.path.join(os.path.dirname(__file__), "fixtures",
                   "golden_crawl_trace_v2.json")


@pytest.fixture(scope="module")
def v2_world():
    with open(FIX) as f:
        g = json.load(f)
    tbl, robots, seeds = W.world(**g["world"])
    return g, tbl, robots, seeds


def test_v2_world_properties(v2_world):
    _, tbl, _, _ = v2_world
    urls = tbl.column("url").to_pylist()
    htmls = tbl.column("html").to_pylist()
    kinds = tbl.column("page_kind").to_pylist()
    by_url = dict(zip(urls, htmls))
    mirrors = [u for u in urls if "/mirror" in u]
    assert mirrors and all(
        by_url[m] == by_url[m.replace("/mirror", "")] for m in mirrors)
    longdocs = [len(h) for u, h in zip(urls, htmls) if "/docs/" in u]
    assert longdocs and min(longdocs) > 50_000
    spans = tbl.column("expected_spans").to_pylist()
    gal = [s for u, s in zip(urls, spans) if u.endswith("/gallery")]
    assert gal and all(sum(1 for x in g if x["kind"] == "media") >= 12
                       for g in gal)
    assert "mirror" in kinds and "gallery" in kinds and "longdoc" in kinds


def test_v2_golden_trace(v2_world):
    """Engine == frozen v2 trace == oracle (both modes)."""
    g, tbl, robots, seeds = v2_world
    by_url = {r["url"]: r for r in tbl.to_pylist()}
    o_order, o_seen, _ = oracle_crawl(by_url, robots, seeds, **{
        "max_pages": g["crawl"]["max_pages"], "max_depth": g["crawl"]["max_depth"],
        "round_seconds": g["crawl"]["round_seconds"]})
    assert [list(t) for t in o_order] == g["fetch_order"]
    res = crawl(tbl, robots, seeds, keep_pages=False, **g["crawl"])
    order = list(zip(res.visited.column("round").to_pylist(),
                     res.visited.column("discovery_seq").to_pylist(),
                     res.visited.column("url").to_pylist()))
    assert [list(t) for t in order] == g["fetch_order"]
    assert [int(h) for h in res.seen_snapshot] == g["seen_hashes"]


def test_v2_content_dedup_drops_mirrors(v2_world):
    """The crawl-path content dedup (stateful shard actors over content
    hashes) collapses byte-identical mirror pages into one document."""
    from web_crawler_ray.pipelines.flagship import assemble_documents
    g, tbl, robots, seeds = v2_world
    res = crawl(tbl, robots, seeds, keep_pages=True, **g["crawl"])
    plain = assemble_documents(res.pages).to_pandas()
    deduped = assemble_documents(res.pages, content_dedup=True).to_pandas()
    fetched_urls = set(res.visited.column("url").to_pylist())
    n_mirror_pairs = sum(1 for u in fetched_urls
                         if "/mirror" in u and u.replace("/mirror", "") in fetched_urls)
    assert n_mirror_pairs > 0
    assert len(deduped) <= len(plain) - n_mirror_pairs
    # exactly one representative per mirrored content survives
    kept = set(deduped["doc_id"])
    for u in fetched_urls:
        if "/mirror" in u and u.replace("/mirror", "") in fetched_urls:
            assert not (u in kept and u.replace("/mirror", "") in kept)


def test_media_features_query(ray_session, tmp_path):
    from web_crawler_ray.pipelines.queries import q_media_features
    out = q_media_features("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 30
    assert set(out["media_type"]) <= {"image", "audio", "video"}
    assert out["media_ref"].is_unique
    assert ((out["feat_mean"] > 0) & (out["feat_mean"] < 1)).all()
    # deterministic across runs
    out2 = q_media_features("/root/testdata/sf0.001").to_pandas()
    a = out.sort_values("media_ref").reset_index(drop=True)
    b = out2.sort_values("media_ref").reset_index(drop=True)
    assert a.equals(b)


@pytest.fixture(scope="module")
def ray_session():
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    yield
