"""Unit semantics for the round-4 additions — HLL distinct sketches,
CUBE, bivariate moments (corr/covar), ordered funnel, JSON field
extraction and the bloom-prefiltered hashed decontamination — covering
the edges the registry-level DuckDB gate doesn't reach (approximation
error bounds, merge associativity, fallback parsing, bloom FP tails)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from web_crawler_ray.stages.sketches import (_hash_u64, _hll_estimate,
                                             _hll_fold, hll_distinct)

SF = "/root/testdata/sf0.001"


# --- HyperLogLog -------------------------------------------------------------

def test_hll_error_bound():
    for n in (50, 1_000, 20_000, 200_000):
        vals = pa.array(np.arange(n, dtype=np.int64) * 1_000_003 + 7)
        est = _hll_estimate(_hll_fold(_hash_u64(vals)))
        assert abs(est - n) / n < 0.05, (n, est)


def test_hll_merge_is_union():
    a = pa.array(np.arange(0, 30_000, dtype=np.int64))
    b = pa.array(np.arange(15_000, 45_000, dtype=np.int64))
    ra, rb = _hll_fold(_hash_u64(a)), _hll_fold(_hash_u64(b))
    # merge = elementwise max; commutative and idempotent
    m1, m2 = np.maximum(ra, rb), np.maximum(rb, ra)
    assert np.array_equal(m1, m2)
    assert np.array_equal(np.maximum(m1, ra), m1)
    est = _hll_estimate(m1)
    assert abs(est - 45_000) / 45_000 < 0.05
    # merging a sketch of a SUBSET changes nothing
    sub = _hll_fold(_hash_u64(pa.array(np.arange(100, dtype=np.int64))))
    assert np.array_equal(np.maximum(m1, sub), m1)


def test_hll_string_keys_and_distributed():
    ds = rd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "user_id"])
    got = hll_distinct(ds, "event_type", "user_id").to_pandas()
    exact = (pd.read_parquet(f"{SF}/events.parquet",
                             columns=["event_type", "user_id"])
             .groupby("event_type")["user_id"].nunique())
    assert set(got["event_type"]) == set(exact.index)
    for _, r in got.iterrows():
        e = exact[r["event_type"]]
        assert abs(r["approx_distinct"] - e) / max(e, 1) < 0.05, (r, e)


def test_hll_md5_matches_duckdb_raw_branch():
    # High-cardinality per key so the RAW harmonic estimator (not linear
    # counting) is exercised; the md5 twin must be bit-identical to the
    # SQL unroll — exact-integer harmonic sum, identical literal chain,
    # floor(x+0.5) rounding on both sides.
    import duckdb
    from web_crawler_ray.pipelines.queries import _HLL_MD5_SQL
    from web_crawler_ray.stages.sketches import hll_distinct_md5
    rng = np.random.default_rng(17)
    n = 120_000
    key = np.array(["a", "b", "c"])[rng.integers(0, 3, n)]
    uid = rng.integers(0, 40_000, n).astype(np.int64)  # ~30k+ distinct/key
    t = pa.table({"event_type": key, "user_id": uid})
    got = (hll_distinct_md5(rd.from_arrow(t).repartition(8),
                            "event_type", "user_id")
           .to_pandas().sort_values("event_type").reset_index(drop=True))
    con = duckdb.connect()
    con.register("events", t)
    exp = con.execute(_HLL_MD5_SQL + " ORDER BY event_type").df()
    assert got["event_type"].tolist() == exp["event_type"].tolist()
    assert got["approx_distinct"].tolist() == exp["approx_distinct"].tolist()
    # and the estimate is actually accurate (raw branch, ~1.6% stderr)
    exact = pd.DataFrame({"event_type": key, "user_id": uid}) \
        .groupby("event_type")["user_id"].nunique()
    for _, r in got.iterrows():
        e = exact[r["event_type"]]
        assert abs(r["approx_distinct"] - e) / e < 0.05, (r, e)


# --- CUBE / corr -------------------------------------------------------------

def test_cube_sum_three_keys():
    # 3-key cube = 8 levels; verify against pandas on a small frame
    from web_crawler_ray.stages.aggregates import cube_sum
    rng = np.random.RandomState(5)
    df = pd.DataFrame({"a": rng.choice(list("xy"), 200),
                       "b": rng.choice(list("pq"), 200),
                       "c": rng.choice(list("mn"), 200),
                       "v": rng.randint(0, 50, 200).astype(float)})
    got = cube_sum(rd.from_pandas(df), ["a", "b", "c"], "v").to_pandas()
    # grand total level
    g = got[got["a"].isna() & got["b"].isna() & got["c"].isna()]
    assert len(g) == 1 and g["sum_v"].iloc[0] == df["v"].sum()
    assert g["n_rows"].iloc[0] == 200
    # every subset level has the right group count and total
    assert len(got) == sum(
        df.groupby(list(ks)).ngroups
        for ks in (("a",), ("b",), ("c",), ("a", "b"), ("a", "c"),
                   ("b", "c"), ("a", "b", "c"))) + 1
    ab = got[got["a"].notna() & got["b"].notna() & got["c"].isna()]
    exp = df.groupby(["a", "b"])["v"].sum()
    for _, r in ab.iterrows():
        assert r["sum_v"] == exp[(r["a"], r["b"])]


def test_group_corr_matches_numpy():
    from web_crawler_ray.stages.aggregates import group_corr
    rng = np.random.RandomState(11)
    df = pd.DataFrame({"k": rng.choice(list("abc"), 500),
                       "x": rng.randint(0, 100, 500).astype(float)})
    df["y"] = 3 * df["x"] + rng.randint(0, 40, 500)
    got = (group_corr(rd.from_pandas(df), "k", "x", "y")
           .to_pandas().set_index("k"))
    for k, g in df.groupby("k"):
        assert got.loc[k, "n_rows"] == len(g)
        assert abs(got.loc[k, "corr"] - np.corrcoef(g["x"], g["y"])[0, 1]) < 1e-6
        assert abs(got.loc[k, "covar_pop"] - np.cov(g["x"], g["y"], ddof=0)[0, 1]) < 1e-6


# --- funnel ------------------------------------------------------------------

def test_funnel_first_touch_semantics():
    from web_crawler_ray.stages.relational import funnel_counts
    rows = [
        # u1 completes the whole funnel in order
        (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
        # u2 clicks BEFORE viewing -> click doesn't count; purchase
        # after the view but with no qualifying click -> stage 3 no
        (2, 5, "click"), (2, 10, "view"), (2, 20, "purchase"),
        # u3 views only
        (3, 1, "view"),
        # u4: first-touch trap — earliest click is before the view,
        # the later click counts (it's after t_view)
        (4, 1, "view"), (4, 0, "click"), (4, 9, "click"), (4, 10, "purchase"),
        # u5 purchase only -> counts nowhere
        (5, 2, "purchase"),
        # simultaneous timestamps are NOT strictly after
        (6, 7, "view"), (6, 7, "click"),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    df["ts"] = pd.to_datetime(df["ts"], unit="s")
    got = (funnel_counts(rd.from_pandas(df), ("view", "click", "purchase"))
           .to_pandas().sort_values("stage_idx"))
    assert got["n_users"].tolist() == [5, 2, 2]  # views: u1,u2,u3,u4,u6


def test_funnel_user_split_across_blocks():
    # the user shuffle must co-locate rows that arrive in different blocks
    from web_crawler_ray.stages.relational import funnel_counts
    a = pd.DataFrame({"user_id": [9], "ts": pd.to_datetime([1], unit="s"),
                      "event_type": ["view"]})
    b = pd.DataFrame({"user_id": [9], "ts": pd.to_datetime([2], unit="s"),
                      "event_type": ["click"]})
    ds = rd.from_pandas(a).union(rd.from_pandas(b))
    got = (funnel_counts(ds, ("view", "click", "purchase"))
           .to_pandas().sort_values("stage_idx"))
    assert got["n_users"].tolist() == [1, 1, 0]


# --- JSON field extraction ---------------------------------------------------

def test_json_int_field_fallback_rows():
    from web_crawler_ray.stages.relational import json_int_field
    t = pa.table({"props": pa.array([
        '{"k": 42}',            # fast path
        '{"k": -7, "j": 1}',    # fast path, negative
        '{"j": 5}',             # absent -> null
        '{"nested": {"k": 3}}', # regex matches the nested k: documented
        '{"k": "12"}',          # quoted -> fallback parses to 12
        'not json at all',      # unparseable -> null
        None,                   # null in -> null out
    ])})
    out = json_int_field(t, "props", "k", "k")
    assert out.column("k").to_pylist() == [42, -7, None, 3, 12, None, None]


# --- bloom decontamination ---------------------------------------------------

def test_decontaminate_hashed_equals_string_form():
    from web_crawler_ray.stages.textstats import (benchmark_shingle_hashes,
                                                  benchmark_shingles,
                                                  decontaminate,
                                                  decontaminate_hashed)
    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])

    def _slice(eq):
        def f(t):
            m = t.column("doc_id").to_numpy() % 7 == 2
            return t.filter(pa.array(m if eq else ~m))
        return f

    bench = docs.map_batches(_slice(True), batch_format="pyarrow")
    rest = docs.map_batches(_slice(False), batch_format="pyarrow")
    want = sorted(decontaminate(
        rest, benchmark_shingles(bench, n=5), n=5)
        .to_pandas()["doc_id"])
    got = sorted(decontaminate_hashed(
        rest, benchmark_shingle_hashes(bench, n=5), n=5)
        .to_pandas()["doc_id"])
    assert got == want and len(got) > 0


def test_decontaminate_hashed_bloom_fp_tail():
    # tiny bloom (high FP rate) must still return the exact answer —
    # the searchsorted verify catches every false positive
    from web_crawler_ray.stages.textstats import (benchmark_shingle_hashes,
                                                  decontaminate_hashed)
    texts = [f"w{i} a b c d e f g h w{i}" for i in range(50)]
    docs = pa.table({"doc_id": pa.array(range(50), pa.int64()),
                     "text": pa.array(texts)})
    bench = pa.table({"doc_id": pa.array([99], pa.int64()),
                      "text": pa.array(["a b c d e f g h"])})
    h = benchmark_shingle_hashes(rd.from_arrow(bench), n=8)
    out = decontaminate_hashed(rd.from_arrow(docs), h, n=8,
                               bloom_bits_per_key=1)  # FP-heavy on purpose
    # every doc contains the contaminated 8-gram "a b c d e f g h"
    assert out.count() == 0
    clean = pa.table({"doc_id": pa.array([0], pa.int64()),
                      "text": pa.array(["x y z q r s t u v w"])})
    out2 = decontaminate_hashed(rd.from_arrow(clean), h, n=8,
                                bloom_bits_per_key=1)
    assert out2.to_pandas()["doc_id"].tolist() == [0]


# --- Count-Min sketch ---------------------------------------------------------

def test_cms_guarantee_and_partition_invariance(ray_session):
    import collections
    from web_crawler_ray.stages.sketches import cms_estimates
    rng = np.random.default_rng(23)
    v = rng.zipf(1.3, 40_000)
    v = v[v < 50_000].astype(np.int64)
    true = collections.Counter(v.tolist())
    t = pa.table({"v": v})
    a = cms_estimates(rd.from_arrow(t).repartition(6), "v",
                      w=512, d=4).to_pandas()
    got = dict(zip(a["v"], a["est"]))
    assert set(got) == set(true)
    n = len(v)
    eps_bound = (np.e / 512) * n  # CM guarantee at w=512
    assert all(got[k] >= c for k, c in true.items())
    # w.h.p. bound: allow a handful of cells past eN (delta = e^-d)
    viol = sum(1 for k, c in true.items() if got[k] - c > eps_bound)
    assert viol <= max(3, 0.01 * len(true))
    # merge order / partitioning invariance: register sum is exact
    b = cms_estimates(rd.from_arrow(t).repartition(2), "v",
                      w=512, d=4).to_pandas()
    assert dict(zip(b["v"], b["est"])) == got


def test_cms_exact_when_wide(ray_session):
    # few distinct keys, wide sketch: no collisions -> est == true count
    from web_crawler_ray.stages.sketches import cms_estimates
    v = np.repeat(np.arange(20, dtype=np.int64), np.arange(1, 21))
    a = cms_estimates(rd.from_arrow(pa.table({"v": v})).repartition(3),
                      "v", w=4096, d=4).to_pandas()
    got = dict(zip(a["v"], a["est"]))
    assert got == {k: k + 1 for k in range(20)}


# --- priority sampling --------------------------------------------------------

def test_priority_sample_brute_force_and_estimator(ray_session):
    from web_crawler_ray.stages.aggregates import md5_low64, \
        priority_sample
    rng = np.random.default_rng(31)
    n, k = 5_000, 150
    ids = np.arange(n, dtype=np.int64)
    w = rng.integers(1, 10_000, n).astype(np.int64)
    t = pa.table({"doc_id": ids, "n_chars": w})
    got = priority_sample(rd.from_arrow(t).repartition(7),
                          "n_chars", "doc_id", k)
    # brute force: identical priority formula, top-k, tau = (k+1)-th
    TWO53 = 9007199254740992
    m = np.array([md5_low64(str(i)) % TWO53 for i in ids], np.int64)
    pri = w.astype(np.float64) * float(TWO53) / (m + 1).astype(np.float64)
    order = np.lexsort((ids, -pri))
    keep, tau = order[:k], pri[order[k]]
    want_ids = np.sort(ids[keep])
    assert got.column("doc_id").to_pylist() == want_ids.tolist()
    wh = dict(zip(got.column("doc_id").to_pylist(),
                  got.column("w_hat").to_pylist()))
    for i in want_ids.tolist():
        assert wh[i] == max(float(w[i]), tau)
    # unbiased subset-sum estimator: within 15% at k=150
    assert abs(sum(wh.values()) / float(w.sum()) - 1.0) < 0.15
    # partitioning invariance
    got2 = priority_sample(rd.from_arrow(t).repartition(2),
                           "n_chars", "doc_id", k)
    assert got2.equals(got)


def test_priority_sample_edges(ray_session):
    from web_crawler_ray.stages.aggregates import priority_sample
    # fewer rows than k: everything kept, tau=0 -> w_hat == w
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "n_chars": pa.array([10, 0, 7], pa.int64())})
    got = priority_sample(rd.from_arrow(t), "n_chars", "doc_id", 10)
    assert got.column("doc_id").to_pylist() == [1, 2, 3]
    assert got.column("w_hat").to_pylist() == [10.0, 0.0, 7.0]
    # negative weight raises
    bad = pa.table({"doc_id": pa.array([1], pa.int64()),
                    "n_chars": pa.array([-5], pa.int64())})
    import pytest as _pt
    with _pt.raises(Exception):
        priority_sample(rd.from_arrow(bad), "n_chars", "doc_id", 1)
