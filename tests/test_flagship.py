"""End-to-end flagship pipeline: output determinism across parallelism."""

import pandas as pd

from web_crawler_ray.pipelines.flagship import run_flagship


def _locations(fetch_concurrency: int) -> pd.DataFrame:
    out = run_flagship(seed=42, n_hosts=4, pages_per_host_base=14,
                       max_pages=1000, round_seconds=30.0,
                       fetch_concurrency=fetch_concurrency)
    df = out["locations"].to_pandas()
    cols = sorted(c for c in df.columns if c not in ("fuzzy_block", "fuzzy_host"))
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_flagship_deterministic_across_concurrency():
    a = _locations(1)
    b = _locations(4)
    assert len(a) == len(b) > 0
    pd.testing.assert_frame_equal(a, b)


def test_flagship_outputs_shape():
    out = run_flagship(seed=42, n_hosts=3, pages_per_host_base=10,
                       max_pages=100, round_seconds=30.0)
    locs = out["locations"].to_pandas()
    assert {"location_name", "location_address", "latitude", "longitude",
            "country_iso3", "footprint", "quality_score", "extraction_method",
            "confidence"} <= set(locs.columns)
    assert (locs["confidence"] >= 0.70).all()  # P1 gate applied
    docs = out["documents"].to_pandas()
    assert set(docs.columns) == {"doc_id", "spans"}
    assert out["crawl"].stats["fetched"] == len(docs)


def test_content_dedup_documents():
    """North-star content-hash dedup service wired into the document path:
    mirror pages (identical html at different urls) collapse to one doc."""
    import pyarrow as pa
    import ray.data as rd
    from web_crawler_ray.pipelines.flagship import assemble_documents
    html = "<html><body><p> the same mirrored body </p></body></html>"
    pages = rd.from_arrow(pa.table({
        "url": [f"https://h.example/mirror{i}" for i in range(4)] + ["https://h.example/other"],
        "html": [html] * 4 + ["<html><body><p> unique </p></body></html>"],
    }))
    docs = assemble_documents(pages, content_dedup=True).to_pandas()
    assert len(docs) == 2
    no_dedup = assemble_documents(pages, content_dedup=False).to_pandas()
    assert len(no_dedup) == 5


def test_bulk_pipeline(tmp_path):
    """SURVEY §3.3: bulk CSV -> combined crawl -> per-company summary +
    2-sheet workbook."""
    import pyarrow as pa
    import zipfile
    from web_crawler_ray.pipelines.bulk import process_bulk
    from web_crawler_ray.sources import synth_world as W
    tbl, robots, seeds = W.world(seed=42, n_hosts=3, pages_per_host_base=12)
    companies = pa.table({
        "Company Name": ["Comp0", "Comp1", "Ghost Co"],
        "URL": [seeds[0], seeds[1], "https://nonexistent.example/"],
    })
    wb = str(tmp_path / "bulk.xlsx")
    out = process_bulk(companies, tbl, robots, workbook_path=wb,
                       round_seconds=30.0)
    by_name = {s["companyName"]: s for s in out["summary"]}
    assert by_name["Comp0"]["status"] == "success"
    assert by_name["Comp0"]["locationsCount"] > 0
    # the ghost host IS fetched (404-like) so it counts visited; its
    # locations are zero
    assert by_name["Ghost Co"]["locationsCount"] == 0
    assert out["totals"]["total"] == 3
    assert out["totals"]["totalLocations"] == sum(
        s["locationsCount"] for s in out["summary"])
    with zipfile.ZipFile(wb) as z:
        assert "xl/worksheets/sheet2.xml" in z.namelist()


def test_flagship_v2_defaults_content_dedup(ray_session):
    """run_flagship(profile='v2') drops mirror-page documents by default
    (content dedup auto-enabled for mirror-bearing v2 worlds)."""
    out = run_flagship(seed=77, n_hosts=3, pages_per_host_base=14,
                       round_seconds=6.0, profile="v2")
    docs = out["documents"].to_pandas()
    visited = set(out["crawl"].visited.column("url").to_pylist())
    mirror_pairs = [(u, u.replace("/mirror", "")) for u in visited
                    if "/mirror" in u and u.replace("/mirror", "") in visited]
    assert mirror_pairs, "v2 world must fetch at least one mirror pair"
    kept = set(docs["doc_id"])
    for m, orig in mirror_pairs:
        assert not (m in kept and orig in kept)
    # explicit override keeps both copies
    out2 = run_flagship(seed=77, n_hosts=3, pages_per_host_base=14,
                        round_seconds=6.0, profile="v2", content_dedup=False)
    kept2 = set(out2["documents"].to_pandas()["doc_id"])
    assert all(m in kept2 and o in kept2 for m, o in mirror_pairs)


def test_overlap_extract_equals_barrier_path(ray_session):
    """run_flagship(overlap_extract=True) — per-round extraction tasks
    overlapping later crawl rounds — must produce exactly the barrier
    path's locations (fuzzy dedup imposes its own total scan order, so
    block-boundary differences cannot leak)."""
    a = run_flagship(seed=42, n_hosts=4, pages_per_host_base=14,
                     round_seconds=6.0)
    b = run_flagship(seed=42, n_hosts=4, pages_per_host_base=14,
                     round_seconds=6.0, overlap_extract=True)
    la = a["locations"].to_pandas().sort_values(
        ["discovery_seq", "location_address"]).reset_index(drop=True)
    lb = b["locations"].to_pandas().sort_values(
        ["discovery_seq", "location_address"]).reset_index(drop=True)
    assert len(la) > 0
    assert la.equals(lb)


def test_overlap_assembler_equals_post_crawl_documents(ray_session):
    """OverlapAssembler (span assembly running as a page_hook during the
    crawl) must produce exactly assemble_documents(res.pages) — span
    assembly is a per-page pure map, so block slicing is invisible."""
    from web_crawler_ray.pipelines.crawl import crawl
    from web_crawler_ray.pipelines.flagship import (MultiHook,
                                                    OverlapAssembler,
                                                    assemble_documents)
    from web_crawler_ray.sources import synth_world as W

    ps, rb, sd = W.world(seed=11, n_hosts=4, pages_per_host_base=14)
    oa = OverlapAssembler()
    res = crawl(ps, rb, sd, max_pages=10_000, max_depth=3,
                round_seconds=6.0, frontier_mode="dataset",
                page_hook=MultiHook(oa))
    got = oa.dataset().to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = assemble_documents(res.pages).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(got) > 0
    assert sorted(got.columns) == sorted(want.columns)
    assert got[sorted(got.columns)].equals(want[sorted(want.columns)])
