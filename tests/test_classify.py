"""F13 page classifier (page-classifier.service.js tables)."""

from web_crawler_ray.stages import classify as C


def test_url_patterns():
    assert C.classify_by_url("https://a.example/locations/") == ("locations", 0.95)
    assert C.classify_by_url("https://a.example/contact-us/") == ("contact", 0.90)
    assert C.classify_by_url("https://a.example/global-offices/") == ("locations", 0.90)
    assert C.classify_by_url("https://a.example/about/") == ("about", 0.75)
    assert C.classify_by_url("https://a.example/investors/") == ("investor", 0.60)
    assert C.classify_by_url("https://a.example/store-locator/") == ("locations", 0.95)
    assert C.classify_by_url("https://a.example/pricing") == (None, 0.0)


def test_content_keywords_scoring():
    html = "<h1> Our Locations </h1><h2> Find us worldwide </h2>"
    t, conf = C.classify_by_content(html)
    assert t == "locations"
    # 'location' + 'find us' + 'worldwide' = 3 keyword hits -> .60 + 3*.10 = .90 capped .85
    assert conf == 0.85
    t2, c2 = C.classify_by_content("<h3> enterprise </h3>")
    assert t2 == "company" and c2 == 0.70
    assert C.classify_by_content("<p> no headings at all </p>") == (None, 0.0)


def test_combined_classification_url_wins_type():
    # URL says contact (.90), content says locations (.85): type=contact,
    # confidence = max of both (page-classifier:20-27)
    c = C.classify_page("https://a.example/contact-us/",
                        "<h1> our locations worldwide office </h1>")
    assert c["page_type"] == "contact"
    assert c["page_confidence"] == 0.90
    assert c["page_priority"] == 1


def test_extraction_strategy_gates():
    assert C.extraction_strategy("locations", 0.95) == "aggressive"
    assert C.extraction_strategy("about", 0.75) == "medium"
    assert C.extraction_strategy("general", 0.95) == "conservative"
    assert C.extraction_strategy("locations", 0.70) == "medium"


def test_max_depth_zero_crawl():
    """Depth-0 crawl: only seeds fetched; their links enter seen (reference
    enqueues them; they are skipped at pop) but are never fetched."""
    import numpy as np
    from web_crawler_ray.oracle.reference_oracle import oracle_crawl
    from web_crawler_ray.pipelines.crawl import crawl
    from web_crawler_ray.sources import synth_world as W
    tbl, robots, seeds = W.world(seed=3, n_hosts=3, pages_per_host_base=10)
    by_url = {r["url"]: r for r in tbl.to_pylist()}
    res = crawl(tbl, robots, seeds, max_pages=100, max_depth=0, keep_pages=False)
    assert res.stats["fetched"] == len(seeds)
    assert res.stats["seen"] > len(seeds)  # links recorded in the seen set
    o_order, o_seen, _ = oracle_crawl(by_url, robots, seeds,
                                      max_pages=100, max_depth=0)
    assert np.array_equal(res.seen_snapshot, np.array(o_seen, dtype=np.uint64))
