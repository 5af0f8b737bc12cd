"""Synthetic-world determinism + span-sequence equality (input_hint invariant)."""

from web_crawler_ray.functions.domlite import parse
from web_crawler_ray.sources import synth_world as W
from web_crawler_ray.stages.extract import assemble_spans


def test_world_deterministic():
    t1, r1, s1 = W.world(seed=7, n_hosts=3, pages_per_host_base=10)
    t2, r2, s2 = W.world(seed=7, n_hosts=3, pages_per_host_base=10)
    assert t1.equals(t2) and r1 == r2 and s1 == s2
    t3, _, _ = W.world(seed=8, n_hosts=3, pages_per_host_base=10)
    assert not t1.equals(t3)


def test_world_exercises_patterns():
    t, robots, seeds = W.world(seed=42, n_hosts=8, pages_per_host_base=30)
    kinds = set(t.column("page_kind").to_pylist())
    # every extractor-pattern family appears in the world
    for k in ("jsonld", "microdata", "heading_addr", "h3_seq", "map_iframe",
              "inline_script", "react_xhr", "plain"):
        assert k in kinds, k
    assert any("Disallow" in r for r in robots.values())
    assert any("Crawl-delay" in r for r in robots.values())
    assert any(r == "" for r in robots.values())
    statuses = set(t.column("status").to_pylist())
    assert 200 in statuses


def test_span_sequence_equality():
    """Engine span assembly over generated html == generator ground truth,
    per-row (kind, text, media_ref, order) equality for EVERY page."""
    t, _, _ = W.world(seed=42, n_hosts=6, pages_per_host_base=25)
    mismatches = []
    for row in t.to_pylist():
        if row["status"] != 200:
            continue
        got = assemble_spans(parse(row["html"]))
        exp = row["expected_spans"]
        if got != exp:
            mismatches.append((row["url"], exp, got))
    assert not mismatches, mismatches[:2]


def test_media_spans_present():
    t, _, _ = W.world(seed=42, n_hosts=6, pages_per_host_base=25)
    n_media = sum(1 for row in t.to_pylist()
                  for s in row["expected_spans"] if s["kind"] == "media")
    assert n_media > 10
