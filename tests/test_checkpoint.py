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
        for f in ("frontier.parquet", "visited.parquet", "seen.parquet",
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
