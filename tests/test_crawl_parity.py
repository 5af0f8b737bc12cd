"""Crawl-ordering + URL-seen-set parity (the north-rule correctness gate).

Three-way check:
1. ``reference_bfs`` (literal transcription of the reference FIFO loop)
   == ``oracle_crawl`` with infinite politeness budget, per seed.
2. Ray engine ``crawl()`` == ``oracle_crawl``: fetch order bit-for-bit
   (round, discovery_seq, url) and seen-set sorted-hash equality, both
   with infinite budget and with a finite politeness budget.
3. Determinism across parallelism: same result at different fetch
   concurrency.
"""

import numpy as np
import pytest

from web_crawler_ray.oracle.reference_oracle import oracle_crawl, reference_bfs
from web_crawler_ray.pipelines.crawl import crawl
from web_crawler_ray.sources import synth_world as W


@pytest.fixture(scope="module")
def small_world():
    tbl, robots, seeds = W.world(seed=42, n_hosts=5, pages_per_host_base=20)
    pages_by_url = {r["url"]: r for r in tbl.to_pylist()}
    return tbl, robots, seeds, pages_by_url


def test_oracle_matches_reference_bfs(small_world):
    tbl, robots, seeds, by_url = small_world
    for seed_url in seeds:
        ref_visited, ref_seen = reference_bfs(by_url, seed_url, max_pages=50, max_depth=3)
        order, seen_hashes, _ = oracle_crawl(
            by_url, {}, [seed_url], max_pages=50, max_depth=3, round_seconds=None)
        assert [u for (_, _, u) in order] == ref_visited
        from web_crawler_ray.functions.hashing import hash64
        assert seen_hashes == sorted(hash64(u) for u in ref_seen)


def _run_engine(tbl, robots, seeds, **kw):
    res = crawl(tbl, robots, seeds, keep_pages=False, **kw)
    order = list(zip(res.visited.column("round").to_pylist(),
                     res.visited.column("discovery_seq").to_pylist(),
                     res.visited.column("url").to_pylist()))
    return order, res.seen_snapshot, res.stats


def test_engine_matches_oracle_unbounded(small_world):
    tbl, robots, seeds, by_url = small_world
    o_order, o_seen, o_stats = oracle_crawl(by_url, robots, seeds,
                                            max_pages=200, max_depth=3,
                                            round_seconds=None)
    e_order, e_seen, e_stats = _run_engine(tbl, robots, seeds,
                                           max_pages=200, max_depth=3,
                                           round_seconds=None)
    assert e_order == o_order
    assert np.array_equal(e_seen, np.array(o_seen, dtype=np.uint64))
    assert e_stats["fetched"] == o_stats["fetched"]


def test_engine_matches_oracle_politeness_budget(small_world):
    tbl, robots, seeds, by_url = small_world
    o_order, o_seen, _ = oracle_crawl(by_url, robots, seeds,
                                      max_pages=120, max_depth=3, round_seconds=4.0)
    e_order, e_seen, _ = _run_engine(tbl, robots, seeds,
                                     max_pages=120, max_depth=3, round_seconds=4.0)
    assert e_order == o_order
    assert np.array_equal(e_seen, np.array(o_seen, dtype=np.uint64))


def test_engine_deterministic_across_concurrency(small_world):
    tbl, robots, seeds, _ = small_world
    a = _run_engine(tbl, robots, seeds, max_pages=80, max_depth=2,
                    round_seconds=4.0, fetch_concurrency=1, n_seen_shards=2)
    b = _run_engine(tbl, robots, seeds, max_pages=80, max_depth=2,
                    round_seconds=4.0, fetch_concurrency=4, n_seen_shards=8)
    assert a[0] == b[0]
    assert np.array_equal(a[1], b[1])


def test_max_pages_cap(small_world):
    tbl, robots, seeds, by_url = small_world
    e_order, _, stats = _run_engine(tbl, robots, seeds, max_pages=7, max_depth=3)
    assert len(e_order) == 7 == stats["fetched"]
    o_order, _, _ = oracle_crawl(by_url, robots, seeds, max_pages=7, max_depth=3)
    assert e_order == o_order


def test_robots_disallow_respected(small_world):
    tbl, robots, seeds, _ = small_world
    e_order, _, _ = _run_engine(tbl, robots, seeds, max_pages=500, max_depth=3)
    # hosts with 'Disallow: /private' must never fetch /private paths
    blocked = [h for h, r in robots.items() if "Disallow: /private" in r]
    for _, _, url in e_order:
        for h in blocked:
            assert not (h in url and "/private" in url), url


def test_engine_matches_oracle_with_backoff(small_world):
    """F12 exponential failure backoff: engine == oracle under budgeted
    politeness with per-host failure halving."""
    tbl, robots, seeds, by_url = small_world
    o_order, o_seen, _ = oracle_crawl(by_url, robots, seeds, max_pages=150,
                                      max_depth=3, round_seconds=4.0, backoff=True)
    res = crawl(tbl, robots, seeds, max_pages=150, max_depth=3,
                round_seconds=4.0, backoff=True, keep_pages=False)
    e_order = list(zip(res.visited.column("round").to_pylist(),
                       res.visited.column("discovery_seq").to_pylist(),
                       res.visited.column("url").to_pylist()))
    assert e_order == o_order
    assert np.array_equal(res.seen_snapshot, np.array(o_seen, dtype=np.uint64))


def test_engine_matches_oracle_medium_world():
    """Zipf-skewed 12-host world (~500 pages): ordering + seen parity under a
    politeness budget — exercises multi-round deferral on the skewed host."""
    tbl, robots, seeds = W.world(seed=77, n_hosts=12, pages_per_host_base=60)
    by_url = {r["url"]: r for r in tbl.to_pylist()}
    o_order, o_seen, o_stats = oracle_crawl(by_url, robots, seeds,
                                            max_pages=100_000, max_depth=3,
                                            round_seconds=8.0)
    e_order, e_seen, e_stats = _run_engine(tbl, robots, seeds,
                                           max_pages=100_000, max_depth=3,
                                           round_seconds=8.0,
                                           fetch_concurrency=4, n_seen_shards=8)
    assert e_order == o_order
    assert np.array_equal(e_seen, np.array(o_seen, dtype=np.uint64))
    assert e_stats["fetched"] == o_stats["fetched"] > 200


def test_engine_matches_oracle_priority_order(small_world):
    """Priority-frontier mode: rounds ordered by (F4 tier, discovery_seq)."""
    tbl, robots, seeds, by_url = small_world
    o_order, o_seen, _ = oracle_crawl(by_url, robots, seeds, max_pages=60,
                                      max_depth=3, round_seconds=4.0,
                                      order="priority")
    res = crawl(tbl, robots, seeds, max_pages=60, max_depth=3,
                round_seconds=4.0, order="priority", keep_pages=False)
    e_order = list(zip(res.visited.column("round").to_pylist(),
                       res.visited.column("discovery_seq").to_pylist(),
                       res.visited.column("url").to_pylist()))
    assert e_order == o_order
    assert np.array_equal(res.seen_snapshot, np.array(o_seen, dtype=np.uint64))
    # priority mode actually reorders vs fifo at the same budget
    f_order, _, _ = oracle_crawl(by_url, robots, seeds, max_pages=60,
                                 max_depth=3, round_seconds=4.0, order="fifo")
    assert f_order != o_order


def test_engine_dedups_duplicate_and_case_variant_seeds(small_world):
    """ADVICE r1: duplicate seeds (and case/slash variants canonicalizing to
    the same URL) are first-seen-deduped before the seen set — the engine
    fetches each page once, matching the oracle's `canon in seen` skip."""
    tbl, robots, seeds, by_url = small_world
    s0 = seeds[0]  # e.g. https://h0000.example/
    noisy = [s0, s0, s0.rstrip("/"), s0.replace("https://h", "https://H")] + seeds[1:]
    o_order, o_seen, _ = oracle_crawl(by_url, robots, noisy,
                                      max_pages=40, max_depth=2, round_seconds=None)
    e_order, e_seen, _ = _run_engine(tbl, robots, noisy,
                                     max_pages=40, max_depth=2, round_seconds=None)
    assert e_order == o_order
    assert len([u for (_, _, u) in e_order]) == len({u for (_, _, u) in e_order})
    assert np.array_equal(e_seen, np.array(o_seen, dtype=np.uint64))


def test_dataset_frontier_mode_parity(small_world):
    """frontier_mode='dataset' (distributed sort + groupby(host).head(grant)
    + prefix-sum seq assignment) is bit-for-bit identical to the driver-side
    form — fifo and priority orders, budgeted, with backoff."""
    tbl, robots, seeds, _ = small_world
    for kw in ({"round_seconds": None, "max_pages": 60, "max_depth": 2},
               {"round_seconds": 4.0, "max_pages": 120, "max_depth": 3},
               {"round_seconds": 4.0, "max_pages": 80, "max_depth": 3,
                "order": "priority"},
               {"round_seconds": 4.0, "max_pages": 100, "max_depth": 3,
                "backoff": True}):
        d_order, d_seen, d_stats = _run_engine(tbl, robots, seeds, **kw)
        e_order, e_seen, e_stats = _run_engine(tbl, robots, seeds,
                                               frontier_mode="dataset", **kw)
        assert e_order == d_order, kw
        assert np.array_equal(e_seen, d_seen), kw
        assert e_stats["fetched"] == d_stats["fetched"]


def test_dataset_frontier_mode_cap_parity(small_world):
    """Global max_pages cap lands on the identical seq boundary in both
    modes (overflow returns to the deferred frontier)."""
    tbl, robots, seeds, _ = small_world
    d = _run_engine(tbl, robots, seeds, max_pages=7, max_depth=3)
    e = _run_engine(tbl, robots, seeds, max_pages=7, max_depth=3,
                    frontier_mode="dataset")
    assert e[0] == d[0]
    assert np.array_equal(e[1], d[1])


def test_dataset_mode_distributed_rank_parity(small_world, monkeypatch):
    """rank_assign='distributed' (state/distrank.py sample-merge-rank —
    the 10^8-rows/round path where the driver sees only samples+counts)
    is bit-for-bit identical to the driver argsort path, fifo and
    priority. DEFAULT_CHUNK is shrunk so multiple range tasks are
    actually exercised at test scale (R > 1)."""
    from web_crawler_ray.state import distrank
    monkeypatch.setattr(distrank, "DEFAULT_CHUNK", 8)
    tbl, robots, seeds, _ = small_world
    for kw in ({"round_seconds": None, "max_pages": 60, "max_depth": 2},
               {"round_seconds": 4.0, "max_pages": 80, "max_depth": 3,
                "order": "priority"}):
        d = _run_engine(tbl, robots, seeds, frontier_mode="dataset",
                        rank_assign="driver", **kw)
        e = _run_engine(tbl, robots, seeds, frontier_mode="dataset",
                        rank_assign="distributed", **kw)
        assert e[0] == d[0], kw
        assert np.array_equal(e[1], d[1]), kw
        assert e[2]["fetched"] == d[2]["fetched"]


def test_crawl_with_seen_spill_matches_unspilled(small_world):
    """Tiny spill threshold forces every shard through the bloom spill
    tier mid-crawl: fetch order and fetched-count stay identical (no
    false negatives => nothing is re-crawled; the metrics cardinality
    counts spilled keys)."""
    tbl, robots, seeds, _ = small_world
    a = _run_engine(tbl, robots, seeds, max_pages=120, max_depth=3,
                    round_seconds=4.0)
    b = _run_engine(tbl, robots, seeds, max_pages=120, max_depth=3,
                    round_seconds=4.0, seen_spill_threshold=10)
    assert b[0] == a[0]
    assert b[2]["fetched"] == a[2]["fetched"]
    assert b[2]["seen"] == a[2]["seen"]  # cardinality includes spilled keys


def test_hot_host_world_distributed_ranks_full_parity(ray_session, monkeypatch):
    """VERDICT r3 #7: a FULL crawl on a 1-host-dominant world (skew=3.0:
    host 0 holds ~an order of magnitude more pages than the rest) with
    FORCED distributed rank assignment — the hot-shard case where one
    frontier bucket dwarfs the others — must stay bit-for-bit with the
    oracle and with driver mode, including politeness/backoff stats."""
    from web_crawler_ray.state import distrank
    monkeypatch.setattr(distrank, "DEFAULT_CHUNK", 16)
    tbl, robots, seeds = W.world(seed=77, n_hosts=4, pages_per_host_base=180,
                                 skew=3.0)
    # host 0 must actually dominate for this to test skew
    import collections
    per_host = collections.Counter(tbl.column("host").to_pylist())
    sizes = sorted(per_host.values(), reverse=True)
    assert sizes[0] >= 5 * sizes[1]
    by_url = {r["url"]: r for r in tbl.to_pylist()}
    for kw in ({"round_seconds": 6.0, "max_pages": 100000, "max_depth": 3},
               {"round_seconds": 3.0, "max_pages": 160, "max_depth": 3,
                "order": "priority", "backoff": True}):
        o_order, o_seen, _ = oracle_crawl(by_url, robots, seeds, **kw)
        d_order, d_seen, d_stats = _run_engine(tbl, robots, seeds,
                                               frontier_mode="driver", **kw)
        e_order, e_seen, e_stats = _run_engine(
            tbl, robots, seeds, frontier_mode="dataset",
            rank_assign="distributed", **kw)
        assert e_order == o_order == d_order, kw
        assert np.array_equal(e_seen, np.array(o_seen, dtype=np.uint64))
        # politeness/backoff stats parity across modes (same grants ->
        # same request/failure counters)
        assert e_stats["politeness"] == d_stats["politeness"], kw


def test_dataset_mode_cap_crosses_buckets(ray_session):
    """Regression (round-3): fetch_rank is GLOBAL, so the max_pages cap
    must bind even in host buckets smaller than the remaining room —
    an infinite-budget round where the cap lands mid-frontier across
    many hosts exercises exactly that."""
    tbl, robots, seeds = W.world(seed=1136, n_hosts=7, pages_per_host_base=25)
    kw = dict(max_pages=33, max_depth=5, round_seconds=None,
              order="priority", keep_pages=False)
    d = crawl(tbl, robots, seeds, **kw)
    e = crawl(tbl, robots, seeds, frontier_mode="dataset", **kw)
    assert e.stats["fetched"] == d.stats["fetched"] == 33
    assert e.visited.column("url").to_pylist() == \
        d.visited.column("url").to_pylist()
    assert np.array_equal(e.seen_snapshot, d.seen_snapshot)


def test_order_key_overflow_raises_not_asserts():
    """ADVICE r3: the uint64 order-key bound checks must survive
    `python -O` — they are explicit ValueError raises, not asserts."""
    import pyarrow as pa
    from web_crawler_ray.pipelines.crawl import _encode_taken_keys
    ok = pa.table({"discovery_seq": pa.array([5], pa.int64()),
                   "priority": pa.array([2], pa.int64())})
    assert int(_encode_taken_keys(ok, encode_pri=True)[0]) == (2 << 56) | 5
    bad = pa.table({"discovery_seq": pa.array([1 << 56], pa.int64()),
                    "priority": pa.array([1], pa.int64())})
    with pytest.raises(ValueError, match="overflows"):
        _encode_taken_keys(bad, encode_pri=True)


def test_http_fetcher_against_local_server(ray_session):
    """S1 concrete: crawl(fetcher='http') GETs a real (localhost) site —
    link discovery, BFS order, politeness and dedup all behave exactly
    as with the page store; network failures become fetch_ok=False."""
    import http.server
    import threading

    PAGES = {
        "/": '<a href="/a">a</a><a href="/b">b</a>',
        "/a": '<a href="/b">b</a><a href="/c">c</a>',
        "/b": '<a href="/">home</a>',
        "/c": "plain leaf",
        "/created": '<a href="/c">c</a>created resource',  # served as 201
    }

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            body = PAGES.get(self.path)
            if body is None:
                self.send_response(404)
                self.end_headers()
                return
            data = body.encode()
            self.send_response(201 if self.path == "/created" else 200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):  # quiet
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        seed = f"http://127.0.0.1:{port}/"
        res = crawl(None, {}, [seed], max_pages=50, max_depth=3,
                    round_seconds=None, fetcher="http", fetch_concurrency=2)
        urls = res.visited.column("url").to_pylist()
        # BFS order: seed, then its links in document order, then depth-2
        assert urls == [seed, seed + "a", seed + "b", seed + "c"]
        pages = res.pages.to_pandas().set_index("url")
        assert pages.loc[seed + "c", "html"] == "plain leaf"
        assert bool(pages.loc[seed + "a", "fetch_ok"])
        # dead link -> fetch_ok False, no crash
        res2 = crawl(None, {}, [f"http://127.0.0.1:{port}/missing"],
                     max_pages=5, fetcher="http")
        p2 = res2.pages.to_pandas()
        assert len(p2) == 1 and not bool(p2["fetch_ok"][0])
        # ADVICE r3: an HTTP error response records its REAL status code
        # (HTTPError.code), distinguishable from transport failures (0)
        assert int(p2["status"][0]) == 404
        # ...and any 2xx counts as success (axios semantics): a 201 page
        # is fetch_ok and its links join the frontier
        res3 = crawl(None, {}, [f"http://127.0.0.1:{port}/created"],
                     max_pages=5, max_depth=2, fetcher="http")
        p3 = res3.pages.to_pandas().set_index("url")
        assert int(p3.loc[f"http://127.0.0.1:{port}/created", "status"]) == 201
        assert bool(p3.loc[f"http://127.0.0.1:{port}/created", "fetch_ok"])
        assert f"http://127.0.0.1:{port}/c" in p3.index  # link followed
    finally:
        srv.shutdown()
        srv.server_close()
