"""Per-round checkpoint layout + resume info (north-rule resumability)."""

import os

import pyarrow.parquet as pq

from web_crawler_ray.pipelines.crawl import crawl, resume_info
from web_crawler_ray.sources import synth_world as W


def test_checkpoint_and_resume(tmp_path):
    tbl, robots, seeds = W.world(seed=11, n_hosts=3, pages_per_host_base=12)
    ck = str(tmp_path / "ckpt")
    res = crawl(tbl, robots, seeds, max_pages=60, max_depth=2,
                round_seconds=5.0, checkpoint_dir=ck, keep_pages=False)
    rounds = sorted(d for d in os.listdir(ck) if d.startswith("round="))
    assert len(rounds) == res.stats["rounds"]
    for d in rounds:
        base = os.path.join(ck, d)
        assert os.path.exists(os.path.join(base, "_COMPLETE"))
        for f in ("frontier.parquet", "visited.parquet", "seen_delta.parquet",
                  "metrics.json"):
            assert os.path.exists(os.path.join(base, f))
        assert os.path.isdir(os.path.join(base, "pages"))
    info = resume_info(ck)
    assert info is not None
    assert info["fetched"] == res.stats["fetched"]
    # final round's seen snapshot == the run's final seen set
    import numpy as np
    assert np.array_equal(info["seen"], res.seen_snapshot)
    # per-round metrics lineage recorded
    assert res.metrics[0]["stage"] == "fetch"
    assert res.metrics[-1]["seen"] == res.stats["seen"]
    # checkpointed pages are readable and cover all fetched urls
    n_pages = sum(pq.read_table(os.path.join(ck, d, "pages")).num_rows
                  for d in rounds)
    assert n_pages == res.stats["fetched"]


def test_resume_info_empty(tmp_path):
    assert resume_info(str(tmp_path / "nope")) is None


def test_resume_equals_uninterrupted(tmp_path):
    """capped/interrupted run + resumed run ≡ one uninterrupted run:
    resumed fetch order continues exactly, final seen sets equal."""
    import numpy as np
    import pyarrow as pa

    tbl, robots, seeds = W.world(seed=21, n_hosts=4, pages_per_host_base=16)
    full = crawl(tbl, robots, seeds, max_pages=10_000, max_depth=3,
                 round_seconds=6.0, keep_pages=False)
    ck = str(tmp_path / "ck")
    part1 = crawl(tbl, robots, seeds, max_pages=10_000, max_depth=3,
                  round_seconds=6.0, checkpoint_dir=ck, keep_pages=False)
    # simulate a crash after round k: drop checkpoints beyond k
    import os, shutil
    rounds = sorted(int(d.split("=")[1]) for d in os.listdir(ck))
    k = rounds[len(rounds) // 2]
    for r in rounds:
        if r > k:
            shutil.rmtree(os.path.join(ck, f"round={r}"))
    resumed = crawl(tbl, robots, seeds, max_pages=10_000, max_depth=3,
                    round_seconds=6.0, keep_pages=False, resume_from=ck)
    # fetch order of resumed == uninterrupted rounds > k
    fv = full.visited
    tail = fv.filter(pa.compute.greater(fv.column("round"), k))
    assert resumed.visited.column("url").to_pylist() == tail.column("url").to_pylist()
    assert resumed.visited.column("round").to_pylist() == tail.column("round").to_pylist()
    # discovery_seq labels continue EXACTLY (next_seq persisted in the
    # checkpoint, ADVICE r1 — not re-inferred from max(frontier seq))
    assert resumed.visited.column("discovery_seq").to_pylist() == \
        tail.column("discovery_seq").to_pylist()
    assert np.array_equal(resumed.seen_snapshot, full.seen_snapshot)
    # stats report the CUMULATIVE fetched count (restored + new)
    assert resumed.stats["fetched"] == full.stats["fetched"]
    assert resumed.visited.num_rows == full.stats["fetched"] - full.visited.filter(
        pa.compute.less_equal(fv.column("round"), k)).num_rows


def test_cap_final_round_links_enter_seen():
    """Reference enqueues the final fetched pages' links into the seen set
    before exiting (site-crawler:163-168) — engine must match the oracle
    when the cap truncates mid-crawl."""
    import numpy as np
    from web_crawler_ray.oracle.reference_oracle import oracle_crawl
    tbl, robots, seeds = W.world(seed=23, n_hosts=3, pages_per_host_base=14)
    by_url = {r["url"]: r for r in tbl.to_pylist()}
    for cap in (3, 7, 11):
        e = crawl(tbl, robots, seeds, max_pages=cap, max_depth=3, keep_pages=False)
        o_order, o_seen, _ = oracle_crawl(by_url, robots, seeds,
                                          max_pages=cap, max_depth=3)
        assert np.array_equal(e.seen_snapshot, np.array(o_seen, dtype=np.uint64)), cap


def test_dataset_mode_checkpoint_resume(tmp_path):
    """Checkpoints written by frontier_mode='dataset' resume identically
    (cross-mode: resumed with the driver loop) to an uninterrupted run."""
    import numpy as np
    import pyarrow as pa

    tbl, robots, seeds = W.world(seed=31, n_hosts=3, pages_per_host_base=14)
    full = crawl(tbl, robots, seeds, max_pages=10_000, max_depth=3,
                 round_seconds=6.0, keep_pages=False)
    ck = str(tmp_path / "ck")
    crawl(tbl, robots, seeds, max_pages=10_000, max_depth=3,
          round_seconds=6.0, checkpoint_dir=ck, keep_pages=False,
          frontier_mode="dataset")
    import shutil
    rounds = sorted(int(d.split("=")[1]) for d in os.listdir(ck))
    k = rounds[len(rounds) // 2]
    for r in rounds:
        if r > k:
            shutil.rmtree(os.path.join(ck, f"round={r}"))
    resumed = crawl(tbl, robots, seeds, max_pages=10_000, max_depth=3,
                    round_seconds=6.0, keep_pages=False, resume_from=ck)
    fv = full.visited
    tail = fv.filter(pa.compute.greater(fv.column("round"), k))
    assert resumed.visited.column("url").to_pylist() == tail.column("url").to_pylist()
    assert resumed.visited.column("discovery_seq").to_pylist() == \
        tail.column("discovery_seq").to_pylist()
    assert np.array_equal(resumed.seen_snapshot, full.seen_snapshot)


def test_resume_into_dataset_mode(tmp_path):
    """Driver-mode checkpoints resume under frontier_mode='dataset' with
    the identical continuation (the other cross-mode direction)."""
    import numpy as np
    import pyarrow as pa

    tbl, robots, seeds = W.world(seed=37, n_hosts=3, pages_per_host_base=12)
    full = crawl(tbl, robots, seeds, max_pages=10_000, max_depth=3,
                 round_seconds=6.0, keep_pages=False)
    ck = str(tmp_path / "ck")
    crawl(tbl, robots, seeds, max_pages=10_000, max_depth=3,
          round_seconds=6.0, checkpoint_dir=ck, keep_pages=False)
    import shutil
    rounds = sorted(int(d.split("=")[1]) for d in os.listdir(ck))
    k = rounds[len(rounds) // 2]
    for r in rounds:
        if r > k:
            shutil.rmtree(os.path.join(ck, f"round={r}"))
    resumed = crawl(tbl, robots, seeds, max_pages=10_000, max_depth=3,
                    round_seconds=6.0, keep_pages=False, resume_from=ck,
                    frontier_mode="dataset")
    fv = full.visited
    tail = fv.filter(pa.compute.greater(fv.column("round"), k))
    assert resumed.visited.column("url").to_pylist() == tail.column("url").to_pylist()
    assert resumed.visited.column("discovery_seq").to_pylist() == \
        tail.column("discovery_seq").to_pylist()
    assert np.array_equal(resumed.seen_snapshot, full.seen_snapshot)


def test_visited_spill_equals_in_ram(tmp_path):
    """crawl(visited_spill_dir=...) bounds driver RAM: per-round visited
    parquet under the dir, CrawlResult.visited EMPTY, and the concatenated
    spill exactly equals the in-RAM visited table — in BOTH frontier
    modes."""
    import glob

    import pyarrow as pa

    tbl, robots, seeds = W.world(seed=13, n_hosts=4, pages_per_host_base=16)
    for mode in ("driver", "dataset"):
        ram = crawl(tbl, robots, seeds, max_pages=10_000, max_depth=3,
                    keep_pages=False, frontier_mode=mode)
        d = str(tmp_path / f"spill_{mode}")
        sp = crawl(tbl, robots, seeds, max_pages=10_000, max_depth=3,
                   keep_pages=False, frontier_mode=mode,
                   visited_spill_dir=d)
        assert sp.visited.num_rows == 0
        assert sp.visited_dir == d
        files = sorted(glob.glob(os.path.join(d, "round=*.parquet")))
        assert len(files) == sp.stats["rounds"]
        spilled = pa.concat_tables([pq.read_table(f) for f in files])
        assert spilled.num_rows == ram.visited.num_rows
        assert spilled.sort_by("discovery_seq").equals(
            ram.visited.sort_by("discovery_seq"))
        assert sp.stats["fetched"] == ram.stats["fetched"]
