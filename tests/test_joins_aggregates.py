"""Unit semantics for the temporal/range joins, order-statistic
aggregates, rolling/sliding windows and decontamination — edge cases the
registry-level DuckDB gate (test_queries_oracle) doesn't reach."""

import duckdb
import numpy as np
import pytest
import pandas as pd
import pyarrow as pa
import ray.data as rd

from web_crawler_ray.stages.aggregates import group_quantiles
from web_crawler_ray.stages.joins import (asof_join_broadcast,
                                          asof_join_keyed,
                                          interval_join_broadcast)
from web_crawler_ray.stages.textstats import (benchmark_shingles,
                                              decontaminate)
from web_crawler_ray.stages.windows import (rolling_mean_per_key,
                                            sliding_window_counts)


# --- as-of joins -------------------------------------------------------------

def test_asof_broadcast_drops_unmatched_and_picks_latest():
    left = rd.from_pandas(pd.DataFrame({
        "id": [1, 2, 3, 4],
        "t": pd.to_datetime(["2020-01-05", "2020-02-10",
                             "2019-12-31", "2020-03-01"]),
    }))
    right = pd.DataFrame({
        "eff": pd.to_datetime(["2020-01-01", "2020-02-01", "2020-03-01"]),
        "tag": ["a", "b", "c"],
    })
    out = asof_join_broadcast(left, right, "t", "eff", ["tag"]) \
        .to_pandas().sort_values("id")
    # id=3 predates every right row -> dropped (inner)
    assert list(out["id"]) == [1, 2, 4]
    assert list(out["tag"]) == ["a", "b", "c"]  # exact-match boundary for id=4


@pytest.mark.parametrize("shuffle", ["hash", "sort"])
def test_asof_keyed_matches_merge_asof_and_breaks_ties(shuffle):
    rng = np.random.default_rng(7)
    n_l, n_r = 400, 200
    left = pd.DataFrame({
        "k": rng.integers(0, 12, n_l),
        "lt": pd.to_datetime("2021-01-01")
              + pd.to_timedelta(rng.integers(0, 10_000, n_l), unit="m"),
        "lid": np.arange(n_l),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, 14, n_r),  # some keys have no left rows
        "rt": pd.to_datetime("2021-01-01")
              + pd.to_timedelta(rng.integers(0, 10_000, n_r) // 60 * 60,
                                unit="m"),  # coarse -> forced ties
        "rv": rng.integers(0, 1_000, n_r),
    })
    got = asof_join_keyed(
        rd.from_pandas(left), rd.from_pandas(right), key="k",
        left_on="lt", right_on="rt", left_cols=["lid"], right_cols=["rv"],
        shuffle=shuffle,
    ).to_pandas().sort_values("lid").reset_index(drop=True)

    # reference: per-key merge_asof with ties broken to the max rv
    r2 = (right.sort_values(["k", "rt", "rv"])
               .drop_duplicates(["k", "rt"], keep="last"))
    exp = pd.merge_asof(left.sort_values("lt"), r2.sort_values("rt"),
                        on=None, left_on="lt", right_on="rt", by="k")
    exp = exp.dropna(subset=["rv"]).sort_values("lid").reset_index(drop=True)
    assert list(got["lid"]) == list(exp["lid"])
    assert list(got["rv"]) == [int(v) for v in exp["rv"]]
    assert got["rv"].dtype == np.int64  # ints not floated by the union


def test_asof_keyed_key_missing_one_side_is_dropped():
    left = pd.DataFrame({"k": [1, 2], "lt": pd.to_datetime(
        ["2021-06-01", "2021-06-01"]), "lid": [10, 20]})
    right = pd.DataFrame({"k": [1, 3], "rt": pd.to_datetime(
        ["2021-01-01", "2021-01-01"]), "rv": [5, 6]})
    out = asof_join_keyed(rd.from_pandas(left), rd.from_pandas(right),
                          key="k", left_on="lt", right_on="rt",
                          left_cols=["lid"], right_cols=["rv"]).to_pandas()
    assert list(out["lid"]) == [10]  # k=2 no right side, k=3 no left side


# --- interval join -----------------------------------------------------------

def test_interval_join_overlapping_multimatch():
    ds = rd.from_pandas(pd.DataFrame({"id": [1, 2, 3],
                                      "v": [0.1, 0.5, 0.99]}))
    iv = pd.DataFrame({"tier": ["a", "b", "c"],
                       "lo": [0.0, 0.4, 0.6], "hi": [0.6, 0.7, 1.0]})
    out = interval_join_broadcast(ds, iv, value_col="v") \
        .to_pandas().sort_values(["id", "tier"])
    assert list(zip(out["id"], out["tier"])) == [
        (1, "a"), (2, "a"), (2, "b"), (3, "c")]


def test_interval_join_no_match_keeps_schema():
    ds = rd.from_pandas(pd.DataFrame({"id": [1], "v": [5.0]}))
    iv = pd.DataFrame({"tier": ["a"], "lo": [0.0], "hi": [1.0]})
    out = interval_join_broadcast(ds, iv, value_col="v")
    assert out.count() == 0
    # schema survives the empty result (Ray's to_pandas drops columns on
    # fully-empty datasets, so check the dataset schema itself)
    assert out.schema().names == ["id", "v", "tier"]


# --- quantiles ---------------------------------------------------------------

def test_group_quantiles_match_duckdb_disc():
    rng = np.random.default_rng(3)
    df = pd.DataFrame({"g": rng.integers(0, 6, 500),
                       "v": rng.random(500)})
    df.loc[df["g"] == 5, "v"] = 0.25  # constant group
    df = pd.concat([df, pd.DataFrame({"g": [9], "v": [0.5]})])  # 1-row group
    qs = [0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 1.0]
    names = [f"q{i}" for i in range(len(qs))]
    got = group_quantiles(rd.from_pandas(df), "g", "v", qs, names) \
        .to_pandas().sort_values("g").reset_index(drop=True)
    sel = ", ".join(f"quantile_disc(v, {q}) AS {n}"
                    for q, n in zip(qs, names))
    exp = duckdb.connect().execute(
        f"SELECT g, {sel} FROM df GROUP BY g ORDER BY g").df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


# --- rolling / sliding windows ----------------------------------------------

def test_rolling_mean_matches_pandas():
    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "user_id": rng.integers(0, 8, 300),
        "ts": pd.to_datetime("2024-01-01")
              + pd.to_timedelta(rng.integers(0, 500, 300), unit="h"),
        "event_id": np.arange(300),
        "value": rng.random(300),
    })
    got = rolling_mean_per_key(rd.from_pandas(df), preceding=3) \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    exp = df.sort_values(["user_id", "ts", "event_id"]).copy()
    exp["rolling_avg"] = (exp.groupby("user_id")["value"]
                          .transform(lambda s: s.rolling(4, min_periods=1)
                                     .mean()))
    exp = exp.sort_values("event_id").reset_index(drop=True)
    np.testing.assert_allclose(got["rolling_avg"],
                               np.round(exp["rolling_avg"], 6), atol=1e-9)


def test_sliding_counts_cover_k_windows():
    ts = pd.to_datetime(["2024-01-01 00:10:00", "2024-01-01 00:40:00"])
    ds = rd.from_pandas(pd.DataFrame({"ts": ts}))
    out = sliding_window_counts(ds, size_minutes=60, hop_minutes=30) \
        .to_pandas().sort_values("window_start").reset_index(drop=True)
    # event@00:10 -> windows 23:30(-1d), 00:00; event@00:40 -> 00:00, 00:30
    assert list(out["n_events"]) == [1, 2, 1]


# --- decontamination ---------------------------------------------------------

def test_decontaminate_drops_overlap_keeps_short_docs():
    bench = rd.from_pandas(pd.DataFrame({
        "doc_id": [100],
        "text": ["alpha beta gamma delta epsilon zeta eta theta iota"]}))
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            # shares the 8-gram "alpha ... theta"
            "xx alpha beta gamma delta epsilon zeta eta theta yy",
            "completely different words with no overlap at all here ok",
            "short doc",  # < 8 words: no shingles, must survive
        ]})
    sh = benchmark_shingles(bench, n=8)
    assert len(sh) == 2
    out = decontaminate(rd.from_pandas(docs), sh, n=8).to_pandas()
    assert sorted(out["doc_id"]) == [2, 3]


# --- approximate string join (banded Levenshtein) -----------------------------

def _lev_ref(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, len(b) + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1,
                        prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[len(b)]


def test_edit_distance_pairs_brute_force(ray_session):
    import random
    from web_crawler_ray.stages.joins import edit_distance_pairs
    random.seed(5)
    rows = []
    for i in range(240):
        base = "Supplier#%06d" % random.randint(0, 400)
        rows.append((i, base, i % 5))
    t = pa.table({"id": pa.array([r[0] for r in rows], pa.int64()),
                  "name": pa.array([r[1] for r in rows]),
                  "blk": pa.array([r[2] for r in rows], pa.int64())})
    got = edit_distance_pairs(rd.from_arrow(t).repartition(4),
                              "blk", "name", "id", max_dist=2) \
        .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    want = []
    for (i1, n1, b1) in rows:
        for (i2, n2, b2) in rows:
            if i1 < i2 and b1 == b2:
                d = _lev_ref(n1, n2)
                if d <= 2:
                    want.append((i1, i2, d))
    want.sort()
    assert list(map(tuple, got.itertuples(index=False))) == want
    assert len(want) > 50  # non-trivial fixture


def test_edit_distance_pairs_band_edges(ray_session):
    from web_crawler_ray.stages.joins import edit_distance_pairs
    t = pa.table({"id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                  "name": pa.array(["", "a", "ab", "abcd", "zzzz"]),
                  "blk": pa.array([0] * 5, pa.int64())})
    got = edit_distance_pairs(rd.from_arrow(t), "blk", "name", "id",
                              max_dist=2).to_pandas() \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)
    names = {1: "", 2: "a", 3: "ab", 4: "abcd", 5: "zzzz"}
    want = sorted((a, b, _lev_ref(names[a], names[b]))
                  for a in names for b in names
                  if a < b and _lev_ref(names[a], names[b]) <= 2)
    assert list(map(tuple, got.itertuples(index=False))) == want


def test_build_inverted_index_brute_force(ray_session):
    from web_crawler_ray.stages.aggregates import build_inverted_index
    docs = {1: "the cat sat", 2: "the dog the cat", 3: "a dog barks",
            4: "", 5: "CAT cat CaT"}
    t = pa.table({"doc_id": pa.array(list(docs), pa.int64()),
                  "text": pa.array(list(docs.values()))})
    out = build_inverted_index(rd.from_arrow(t).repartition(3)) \
        .to_pandas().sort_values("term").reset_index(drop=True)
    import re
    want = {}
    for i, txt in docs.items():
        for w in set(re.findall(r"[0-9a-z_]+", txt.lower())):
            want.setdefault(w, set()).add(i)
    assert list(out["term"]) == sorted(want)
    for _, r in out.iterrows():
        ids = sorted(want[r["term"]])
        assert r["df"] == len(ids)
        assert r["postings"] == ",".join(map(str, ids))
    # min_df prunes the hapax tail
    out2 = build_inverted_index(rd.from_arrow(t), min_df=2).to_pandas()
    assert set(out2["term"]) == {w for w, s in want.items() if len(s) >= 2}


def test_group_ols_matches_numpy_and_edges(ray_session):
    from web_crawler_ray.stages.aggregates import group_ols
    rng = np.random.default_rng(41)
    n = 4000
    k = rng.choice(["a", "b", "c"], n)
    x = rng.integers(1, 50, n).astype(np.float64)
    y = (3.5 * x + 10 + rng.normal(0, 2, n)).round(2)  # cents-exact
    t = pa.table({"k": pa.array(k), "x": pa.array(x), "y": pa.array(y)})
    out = group_ols(rd.from_arrow(t).repartition(5), "k", "x", "y",
                    x_scale=1, y_scale=100).to_pandas()
    assert list(out["k"]) == ["a", "b", "c"]
    for _, r in out.iterrows():
        m = k == r["k"]
        # numpy lstsq on the scaled ints (y in cents)
        slope, intercept = np.polyfit(x[m], np.rint(y[m] * 100), 1)
        assert abs(r["slope"] - slope) < 1e-6
        assert abs(r["intercept"] - intercept) < 1e-3
        assert abs(r["slope"] - 350.0) < 15  # 3.5 $/unit = 350 c/unit
    # partitioning invariance (exact-integer partials)
    out2 = group_ols(rd.from_arrow(t).repartition(1), "k", "x", "y",
                     x_scale=1, y_scale=100).to_pandas()
    assert out2.equals(out)
    # zero x-variance group -> null slope/intercept
    t2 = pa.table({"k": pa.array(["z"] * 4), "x": pa.array([2.0] * 4),
                   "y": pa.array([1.0, 2.0, 3.0, 4.0])})
    o2 = group_ols(rd.from_arrow(t2), "k", "x", "y").to_pandas()
    assert o2["slope"].isna().all() and o2["intercept"].isna().all()


def test_bigram_lm_brute_force(ray_session):
    import re
    from collections import Counter
    from web_crawler_ray.stages.aggregates import bigram_lm
    docs = ["the cat sat on the mat", "the cat ran", "a dog ran fast",
            "", "single"]
    t = pa.table({"text": pa.array(docs)})
    out = bigram_lm(rd.from_arrow(t).repartition(3), min_count=1) \
        .to_pandas().sort_values(["w1", "w2"]).reset_index(drop=True)
    pairs, lead = Counter(), Counter()
    for d in docs:
        ws = re.findall(r"[0-9a-z_]+", d.lower())
        pairs.update(zip(ws[:-1], ws[1:]))
        lead.update(ws[:-1])
    got = {(r.w1, r.w2): (r.n, r.p) for r in out.itertuples()}
    assert set(got) == set(pairs)
    for (a, b), c in pairs.items():
        n, p = got[(a, b)]
        assert n == c and p == c / lead[a]
    # p sums to 1 per w1 (min_count=1 keeps everything)
    sums = out.groupby("w1")["p"].sum()
    assert np.allclose(sums, 1.0)
    # min_count prunes
    out2 = bigram_lm(rd.from_arrow(t), min_count=2).to_pandas()
    assert set(zip(out2["w1"], out2["w2"])) == {("the", "cat")}


def test_grid_distance_pairs_brute_force(ray_session):
    from web_crawler_ray.stages.joins import grid_distance_pairs
    rng = np.random.default_rng(53)
    n = 400
    ids = np.arange(n, dtype=np.int64)
    la = rng.uniform(-90, 90, n)
    lo = rng.uniform(-180, 180, n)
    # plant exact-duplicate coordinates and a boundary pair
    la[10], lo[10] = la[11], lo[11]
    t = pa.table({"id": pa.array(ids), "la": pa.array(la),
                  "lo": pa.array(lo)})
    r, cref = 6.0, 0.75
    got = grid_distance_pairs(rd.from_arrow(t).repartition(4),
                              "id", "la", "lo", radius_deg=r,
                              cos_ref=cref)
    want = []
    for i in range(n):
        for j in range(i + 1, n):
            d2 = (la[i] - la[j]) ** 2 + ((lo[i] - lo[j]) * cref) ** 2
            if d2 <= r * r:
                want.append((i, j, d2))
    want.sort()
    rows = list(zip(got.column("id_a").to_pylist(),
                    got.column("id_b").to_pylist(),
                    got.column("dist2").to_pylist()))
    assert [(a, b) for a, b, _ in rows] == [(a, b) for a, b, _ in want]
    assert all(abs(x - y) < 1e-12 for (_, _, x), (_, _, y)
               in zip(rows, want))
    assert (10, 11, 0.0) in [(a, b, d) for a, b, d in rows]
    assert len(want) > 100  # non-trivial fixture
    # partitioning invariance
    got2 = grid_distance_pairs(rd.from_arrow(t).repartition(1),
                               "id", "la", "lo", radius_deg=r,
                               cos_ref=cref)
    assert got2.equals(got)


def test_welch_ttest_matches_reference(ray_session):
    import math
    from web_crawler_ray.stages.aggregates import welch_ttest
    rng = np.random.default_rng(31)
    k = rng.choice(list("abc"), 600)
    x = rng.integers(0, 50, 600).astype(np.float64)
    t = pa.table({"k": pa.array(k.tolist()), "x": x})
    out = welch_ttest(rd.from_arrow(t).repartition(5), "k", "x") \
        .to_pandas().set_index(["g1", "g2"])
    assert list(out.index) == [("a", "b"), ("a", "c"), ("b", "c")]
    for (g1, g2), row in out.iterrows():
        x1, x2 = x[k == g1], x[k == g2]
        n1, n2 = len(x1), len(x2)
        v1 = x1.var(ddof=1)
        v2 = x2.var(ddof=1)
        a, b = v1 / n1, v2 / n2
        t_ref = (x1.mean() - x2.mean()) / math.sqrt(a + b)
        dof_ref = (a + b) ** 2 / (a * a / (n1 - 1) + b * b / (n2 - 1))
        assert abs(row["t_stat"] - t_ref) < 1e-9
        assert abs(row["dof"] - dof_ref) < 1e-6
        assert row["n1"] == n1 and row["n2"] == n2
    try:
        from scipy import stats  # not guaranteed in this sandbox
    except ImportError:
        return
    for (g1, g2), row in out.iterrows():
        r = stats.ttest_ind(x[k == g1], x[k == g2], equal_var=False)
        assert abs(row["t_stat"] - r.statistic) < 1e-9


def test_welch_ttest_degenerate_groups(ray_session):
    from web_crawler_ray.stages.aggregates import welch_ttest
    # one-member group -> null t/dof; identical constants -> null
    t = pa.table({"k": pa.array(["a", "a", "b", "c", "c"]),
                  "x": pa.array([5.0, 5.0, 7.0, 5.0, 5.0])})
    out = welch_ttest(rd.from_arrow(t), "k", "x").to_pandas()
    ab = out[(out.g1 == "a") & (out.g2 == "b")].iloc[0]
    assert np.isnan(ab["t_stat"])  # n2 < 2
    ac = out[(out.g1 == "a") & (out.g2 == "c")].iloc[0]
    assert np.isnan(ac["t_stat"])  # zero pooled variance


def test_histogram_by_group_matches_numpy(ray_session):
    from web_crawler_ray.stages.aggregates import histogram_by_group
    rng = np.random.default_rng(41)
    k = rng.choice(list("xy"), 500)
    v = rng.normal(0, 1, 500)
    t = pa.table({"k": pa.array(k.tolist()), "v": v})
    out = histogram_by_group(rd.from_arrow(t).repartition(4),
                             "k", "v", bins=10).to_pandas()
    lo, hi = v.min(), v.max()
    bins = np.minimum(np.floor(((v - lo) * 10.0) / (hi - lo)),
                      9.0).astype(np.int64)
    for kk in "xy":
        for b in range(10):
            want = int(((k == kk) & (bins == b)).sum())
            row = out[(out.k == kk) & (out.bin == b)]
            got = int(row["n"].iloc[0]) if len(row) else 0
            assert got == want
    assert int(out["n"].sum()) == 500
    # constant values -> degenerate range -> empty result, not a crash
    c = pa.table({"k": pa.array(["x", "y"]), "v": pa.array([5.0, 5.0])})
    assert histogram_by_group(rd.from_arrow(c), "k", "v").num_rows == 0


def test_mode_by_group_tie_break(ray_session):
    from web_crawler_ray.stages.aggregates import mode_by_group
    t = pa.table({"k": pa.array(["g1"] * 4 + ["g2"] * 3),
                  "v": pa.array(["b", "a", "a", "b",  # tie 2-2 -> 'a'
                                 "z", "z", "y"])})
    out = mode_by_group(rd.from_arrow(t).repartition(3), "k", "v")
    assert out.column("k").to_pylist() == ["g1", "g2"]
    assert out.column("mode_val").to_pylist() == ["a", "z"]
    assert out.column("n").to_pylist() == [2, 2]


def test_weighted_median_matches_brute(ray_session):
    from web_crawler_ray.stages.aggregates import weighted_median_by_group
    rng = np.random.default_rng(43)
    k = rng.choice(list("pq"), 300)
    v = rng.integers(0, 40, 300).astype(np.float64)
    w = rng.integers(1, 6, 300).astype(np.int64)
    t = pa.table({"k": pa.array(k.tolist()), "v": v,
                  "w": pa.array(w)})
    out = weighted_median_by_group(
        rd.from_arrow(t).repartition(4), "k", "v",
        lambda tb: tb.column("w").to_numpy(zero_copy_only=False)) \
        .to_pandas().set_index("k")["wmedian"]
    for kk in "pq":
        vv, ww = v[k == kk], w[k == kk]
        o = np.argsort(vv, kind="mergesort")
        vv, ww = vv[o], ww[o]
        cw = np.cumsum(ww)
        want = vv[np.searchsorted(2 * cw, cw[-1], side="left")]
        assert out[kk] == want
    # all-equal-weight degenerates to the lower median
    e = pa.table({"k": pa.array(["x"] * 4),
                  "v": pa.array([1.0, 2.0, 3.0, 4.0]),
                  "w": pa.array([1, 1, 1, 1], pa.int64())})
    out2 = weighted_median_by_group(
        rd.from_arrow(e), "k", "v",
        lambda tb: tb.column("w").to_numpy(zero_copy_only=False))
    assert out2.column("wmedian").to_pylist() == [2.0]


def test_impute_median_by_group(ray_session):
    from web_crawler_ray.stages.aggregates import impute_median_by_group
    t = pa.table({"id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                  "k": pa.array(["a", "a", "a", "a", "b"]),
                  "v": pa.array([1.0, None, 3.0, 10.0, None],
                                pa.float64())})
    out = impute_median_by_group(rd.from_arrow(t).repartition(2),
                                 "k", "v", "id") \
        .to_pandas().sort_values("id").reset_index(drop=True)
    # group a non-null = [1, 3, 10]; quantile_disc(0.5) -> 3
    assert list(out["v_filled"][:4]) == [1.0, 3.0, 3.0, 10.0]
    # all-null group stays NaN (nothing to learn from)
    assert np.isnan(out["v_filled"].iloc[4])


def test_spearman_by_group_matches_scipy_or_brute(ray_session):
    from web_crawler_ray.stages.aggregates import spearman_by_group
    rng = np.random.default_rng(47)
    k = rng.choice(list("uv"), 400)
    x = rng.integers(0, 20, 400).astype(np.float64)  # heavy ties
    y = (x * 3 + rng.integers(0, 30, 400)).astype(np.float64)
    t = pa.table({"k": pa.array(k.tolist()), "x": x, "y": y})
    out = spearman_by_group(rd.from_arrow(t).repartition(4),
                            "k", "x", "y", x_scale=1, y_scale=1) \
        .to_pandas().set_index("k")["rho"]

    def brute(xx, yy):
        def avg_ranks(v):
            sv = np.sort(v)
            return (np.searchsorted(sv, v, "left")
                    + np.searchsorted(sv, v, "right") + 1) / 2.0
        rx, ry = avg_ranks(xx), avg_ranks(yy)
        rx -= rx.mean()
        ry -= ry.mean()
        return (rx * ry).sum() / np.sqrt((rx * rx).sum()
                                         * (ry * ry).sum())

    for kk in "uv":
        assert abs(out[kk] - brute(x[k == kk], y[k == kk])) < 1e-12
    try:
        from scipy import stats
    except ImportError:
        return
    for kk in "uv":
        r = stats.spearmanr(x[k == kk], y[k == kk]).statistic
        assert abs(out[kk] - r) < 1e-12


def test_spearman_zero_variance_null(ray_session):
    from web_crawler_ray.stages.aggregates import spearman_by_group
    t = pa.table({"k": pa.array(["a"] * 3),
                  "x": pa.array([5.0, 5.0, 5.0]),
                  "y": pa.array([1.0, 2.0, 3.0])})
    out = spearman_by_group(rd.from_arrow(t), "k", "x", "y",
                            x_scale=1, y_scale=1)
    assert out.column("rho").to_pylist() == [None]


def test_gini_by_group_known_values(ray_session):
    from web_crawler_ray.stages.aggregates import gini_by_group
    # perfectly equal -> 0; one-owner-takes-all of 4 -> (n-1)/n = .75
    t = pa.table({"k": pa.array(["eq"] * 4 + ["uneq"] * 4),
                  "v": pa.array([5.0, 5.0, 5.0, 5.0,
                                 0.0, 0.0, 0.0, 8.0])})
    out = gini_by_group(rd.from_arrow(t).repartition(3), "k", "v",
                        scale=1).to_pandas().set_index("k")["gini"]
    assert out["eq"] == 0.0
    assert out["uneq"] == 0.75
    # all-zero group -> null
    z = pa.table({"k": pa.array(["z", "z"]),
                  "v": pa.array([0.0, 0.0])})
    oz = gini_by_group(rd.from_arrow(z), "k", "v", scale=1)
    assert oz.column("gini").to_pylist() == [None]


def test_hhi_by_group_known_values(ray_session):
    from web_crawler_ray.stages.aggregates import hhi_by_group
    # monopoly -> 1.0; two equal members -> 0.5
    t = pa.table({"g": pa.array(["mono"] * 3 + ["duo"] * 4),
                  "m": pa.array([1, 1, 1, 7, 7, 8, 8], pa.int64())})
    out = hhi_by_group(rd.from_arrow(t).repartition(2), "g", "m") \
        .to_pandas().set_index("g")["hhi"]
    assert out["mono"] == 1.0
    assert out["duo"] == 0.5


def test_ks_two_sample_matches_scipy_or_brute(ray_session):
    from web_crawler_ray.stages.aggregates import ks_two_sample
    rng = np.random.default_rng(53)
    va = rng.normal(0, 1, 300)
    vb = rng.normal(0.4, 1.2, 200)
    t = pa.table({"k": pa.array(["a"] * 300 + ["b"] * 200),
                  "v": np.concatenate([va, vb])})
    out = ks_two_sample(rd.from_arrow(t).repartition(4),
                        "k", "v", "a", "b")
    got = out.column("ks")[0].as_py()
    # brute ECDF max over union
    u = np.unique(np.concatenate([va, vb]))
    i = np.searchsorted(np.sort(va), u, side="right")
    j = np.searchsorted(np.sort(vb), u, side="right")
    want = np.abs(i * 200 - j * 300).max() / (300 * 200)
    assert got == want
    try:
        from scipy import stats
    except ImportError:
        return
    assert abs(got - stats.ks_2samp(va, vb).statistic) < 1e-12


def test_ks_identical_samples_zero(ray_session):
    from web_crawler_ray.stages.aggregates import ks_two_sample
    v = np.array([1.0, 2.0, 3.0])
    t = pa.table({"k": pa.array(["a"] * 3 + ["b"] * 3),
                  "v": np.concatenate([v, v])})
    out = ks_two_sample(rd.from_arrow(t), "k", "v", "a", "b")
    assert out.column("ks").to_pylist() == [0.0]
    assert out.column("d_num").to_pylist() == [0]


def test_chi2_contingency_matches_scipy_or_brute(ray_session):
    from web_crawler_ray.stages.aggregates import chi2_contingency
    rng = np.random.default_rng(59)
    r = rng.choice(list("abc"), 600)
    c = rng.choice(["0", "1"], 600)
    t = pa.table({"r": pa.array(r.tolist()), "c": pa.array(c.tolist())})
    out = chi2_contingency(rd.from_arrow(t).repartition(4), "r", "c")
    got = out.column("chi2")[0].as_py()
    assert out.column("dof").to_pylist() == [2]
    # brute
    import itertools
    n = len(r)
    chi = 0.0
    for rr, cc in sorted(itertools.product("abc", "01")):
        o = int(((r == rr) & (c == cc)).sum())
        e = float(int((r == rr).sum()) * int((c == cc).sum())) / float(n)
        d = float(o) - e
        chi = chi + d * d / e
    assert got == chi
    try:
        from scipy import stats
    except ImportError:
        return
    import pandas as pd
    tab = pd.crosstab(pd.Series(r), pd.Series(c))
    ref = stats.chi2_contingency(tab.to_numpy(), correction=False)
    assert abs(got - ref.statistic) < 1e-9


def test_inversions_matches_brute():
    from web_crawler_ray.stages.aggregates import _inversions
    rng = np.random.default_rng(61)
    for n in (0, 1, 2, 7, 100, 257):
        a = rng.integers(0, 20, n).astype(np.int64)
        want = sum(int(a[i] > a[j])
                   for i in range(n) for j in range(i + 1, n))
        assert _inversions(a) == want


def test_kendall_by_group_matches_scipy_or_brute(ray_session):
    from web_crawler_ray.stages.aggregates import kendall_by_group
    rng = np.random.default_rng(67)
    k = rng.choice(list("mn"), 300)
    x = rng.integers(0, 12, 300).astype(np.float64)   # heavy ties
    y = (x * 2 + rng.integers(0, 15, 300)).astype(np.float64)
    t = pa.table({"k": pa.array(k.tolist()), "x": x, "y": y})
    out = kendall_by_group(rd.from_arrow(t).repartition(4),
                           "k", "x", "y", x_scale=1, y_scale=1) \
        .to_pandas().set_index("k")["tau_b"]

    def brute(xx, yy):
        n = len(xx)
        c = d = tx = ty = 0
        for i in range(n):
            for j in range(i + 1, n):
                if xx[i] == xx[j]:
                    tx += 1
                if yy[i] == yy[j]:
                    ty += 1
                if (xx[i] - xx[j]) * (yy[i] - yy[j]) > 0:
                    c += 1
                elif (xx[i] - xx[j]) * (yy[i] - yy[j]) < 0:
                    d += 1
        n0 = n * (n - 1) // 2
        return (c - d) / (np.sqrt(n0 - tx) * np.sqrt(n0 - ty))
    for kk in "mn":
        assert abs(out[kk] - brute(x[k == kk], y[k == kk])) < 1e-12
    try:
        from scipy import stats
    except ImportError:
        return
    for kk in "mn":
        r = stats.kendalltau(x[k == kk], y[k == kk]).statistic
        assert abs(out[kk] - r) < 1e-12


def test_kendall_constant_side_null(ray_session):
    from web_crawler_ray.stages.aggregates import kendall_by_group
    t = pa.table({"k": pa.array(["a"] * 3),
                  "x": pa.array([7.0, 7.0, 7.0]),
                  "y": pa.array([1.0, 2.0, 3.0])})
    out = kendall_by_group(rd.from_arrow(t), "k", "x", "y",
                           x_scale=1, y_scale=1)
    assert out.column("tau_b").to_pylist() == [None]


def test_auc_two_sample_matches_scipy_and_brute(ray_session):
    from web_crawler_ray.stages.aggregates import auc_two_sample
    rng = np.random.default_rng(71)
    g = rng.choice(["a", "b", "zz"], 400)
    v = rng.integers(0, 25, 400).astype(np.float64)   # heavy ties
    t = pa.table({"g": pa.array(g.tolist()), "v": v})
    out = auc_two_sample(rd.from_arrow(t).repartition(5),
                         "g", "v", "a", "b").to_pandas().iloc[0]
    va, vb = v[g == "a"], v[g == "b"]
    u2 = sum(2 * int(x > y) + int(x == y) for x in va for y in vb)
    assert int(out["u2"]) == u2
    assert int(out["n_a"]) == len(va) and int(out["n_b"]) == len(vb)
    assert out["auc"] == u2 / (2 * len(va) * len(vb))
    try:
        from scipy import stats
    except ImportError:
        return
    u = stats.mannwhitneyu(va, vb, alternative="two-sided").statistic
    assert abs(out["auc"] - u / (len(va) * len(vb))) < 1e-12


def test_auc_two_sample_empty_group(ray_session):
    from web_crawler_ray.stages.aggregates import auc_two_sample
    t = pa.table({"g": pa.array(["a", "a"]), "v": [1.0, 2.0]})
    out = auc_two_sample(rd.from_arrow(t), "g", "v", "a", "b")
    assert out.num_rows == 0
    assert out.column_names == ["n_a", "n_b", "u2", "auc"]


def test_time_weighted_avg_matches_brute(ray_session):
    from web_crawler_ray.stages.windows import time_weighted_avg
    rng = np.random.default_rng(73)
    n = 500
    u = rng.integers(0, 9, n)
    ts = np.datetime64("2024-01-01", "us") + \
        rng.integers(0, 10**9, n).astype("timedelta64[us]")
    v = np.round(rng.uniform(0, 100, n), 2)
    t = pa.table({"user_id": u.astype(np.int64), "ts": ts,
                  "event_id": np.arange(n, dtype=np.int64),
                  "value": v})
    out = time_weighted_avg(rd.from_arrow(t).repartition(6)) \
        .to_pandas().set_index("user_id")
    df = pd.DataFrame({"u": u, "ts": ts.astype(np.int64),
                       "eid": np.arange(n), "v": v}) \
        .sort_values(["u", "ts", "eid"])
    for uu in np.unique(u):
        d = df[df["u"] == uu]
        dt = np.diff(d["ts"].to_numpy())
        cents = np.rint(d["v"].to_numpy()[:-1] * 100).astype(np.int64)
        num, den = int((cents * dt).sum()), int(dt.sum())
        assert int(out.loc[uu, "dur_us"]) == den
        assert out.loc[uu, "twap"] == float(num) / float(den * 100)


def test_time_weighted_avg_single_event_users(ray_session):
    from web_crawler_ray.stages.windows import time_weighted_avg
    ts = np.array(["2024-01-01T00:00:00", "2024-01-01T01:00:00",
                   "2024-01-02T00:00:00"], dtype="datetime64[us]")
    t = pa.table({"user_id": pa.array([1, 2, 2], pa.int64()),
                  "ts": ts, "event_id": pa.array([1, 2, 3], pa.int64()),
                  "value": [5.0, 2.0, 9.0]})
    out = time_weighted_avg(rd.from_arrow(t)).to_pandas()
    assert out["user_id"].tolist() == [2]   # single-event user emits nothing
    assert out["dur_us"].tolist() == [23 * 3600 * 10**6]
    assert out["twap"].tolist() == [2.0]    # value holds until next event


def test_target_encode_matches_brute(ray_session):
    from web_crawler_ray.stages.aggregates import target_encode
    rng = np.random.default_rng(79)
    pk = np.arange(40, dtype=np.int64)
    cat = rng.choice(["x", "y", "z"], 40)
    dim = pa.table({"pk": pk, "cat": pa.array(cat.tolist())})
    fk = rng.integers(0, 40, 600).astype(np.int64)
    y = rng.integers(1, 50, 600).astype(np.float64)
    fact = pa.table({"fk": fk, "y": y})
    out = target_encode(rd.from_arrow(fact).repartition(7),
                        rd.from_arrow(dim), "fk", "pk", "cat", "y",
                        m=10).to_pandas().set_index("cat")
    yc = cat[fk]
    big_t, big_n = int(y.sum()), len(y)
    for c in "xyz":
        s, n = int(y[yc == c].sum()), int((yc == c).sum())
        assert int(out.loc[c, "n"]) == n
        assert int(out.loc[c, "sum_y"]) == s
        assert out.loc[c, "enc"] == float(s * big_n + 10 * big_t) \
            / float(big_n * (n + 10))


def test_target_encode_unmatched_fk_dropped(ray_session):
    from web_crawler_ray.stages.aggregates import target_encode
    dim = pa.table({"pk": pa.array([1, 2], pa.int64()),
                    "cat": pa.array(["x", "y"])})
    fact = pa.table({"fk": pa.array([1, 1, 99], pa.int64()),
                     "y": [2.0, 3.0, 100.0]})
    out = target_encode(rd.from_arrow(fact), rd.from_arrow(dim),
                        "fk", "pk", "cat", "y", m=1) \
        .to_pandas().set_index("cat")
    assert int(out.loc["x", "n"]) == 2 and int(out.loc["x", "sum_y"]) == 5
    assert int(out.loc["y", "n"]) == 0   # category kept with zero rows


def test_ewma_per_user_matches_brute_and_pandas(ray_session):
    from web_crawler_ray.stages.windows import ewma_per_user
    rng = np.random.default_rng(97)
    n = 400
    u = rng.integers(0, 7, n).astype(np.int64)
    ts = np.datetime64("2024-03-01", "us") + \
        rng.integers(0, 10**8, n).astype("timedelta64[us]")
    v = np.round(rng.uniform(0, 50, n), 2)
    t = pa.table({"user_id": u, "ts": ts,
                  "event_id": np.arange(n, dtype=np.int64), "value": v})
    out = ewma_per_user(rd.from_arrow(t).repartition(6), alpha=0.125) \
        .to_pandas().set_index("event_id")["ewma"]
    df = pd.DataFrame({"u": u, "ts": ts, "eid": np.arange(n), "v": v}) \
        .sort_values(["u", "ts", "eid"])
    for uu in np.unique(u):
        d = df[df["u"] == uu]
        s = None
        for eid, x in zip(d["eid"], d["v"]):
            s = x if s is None else 0.125 * x + 0.875 * s
            assert out[eid] == s       # bit-exact vs the brute recurrence
        # pandas ewm(adjust=False) is the same recurrence, close to ulp
        ref = d["v"].ewm(alpha=0.125, adjust=False).mean().to_numpy()
        got = out[d["eid"].to_numpy()].to_numpy()
        assert np.allclose(got, ref, rtol=1e-12)


def test_group_percentile_cont_matches_numpy(ray_session):
    from web_crawler_ray.stages.aggregates import group_percentile_cont
    rng = np.random.default_rng(101)
    k = rng.choice(["a", "b", "c"], 500)
    v = np.round(rng.uniform(0, 100, 500), 2)
    t = pa.table({"k": pa.array(k.tolist()), "v": v})
    out = group_percentile_cont(rd.from_arrow(t).repartition(4),
                                "k", "v", qs=[0.25, 0.5, 0.75]) \
        .to_pandas().set_index("k")
    for kk in "abc":
        vals = v[k == kk]
        for q, nm in ((0.25, "p25"), (0.5, "p50"), (0.75, "p75")):
            assert abs(out.loc[kk, nm]
                       - np.percentile(vals, q * 100,
                                       method="linear")) < 1e-9


def test_group_percentile_cont_single_value(ray_session):
    from web_crawler_ray.stages.aggregates import group_percentile_cont
    t = pa.table({"k": pa.array(["a"]), "v": [42.0]})
    out = group_percentile_cont(rd.from_arrow(t), "k", "v",
                                qs=[0.25, 0.5, 0.75]).to_pandas()
    assert out.iloc[0][["p25", "p50", "p75"]].tolist() == [42.0] * 3


def test_resample_linear_matches_brute(ray_session):
    from web_crawler_ray.stages.windows import resample_linear
    US_H = 3_600_000_000
    rng = np.random.default_rng(113)
    n = 300
    u = rng.integers(0, 6, n).astype(np.int64)
    ts_i = np.datetime64("2024-02-01", "us").astype(np.int64) \
        + rng.integers(0, 3 * 24 * US_H, n)
    v = np.round(rng.uniform(0, 100, n), 2)
    t = pa.table({"user_id": u,
                  "ts": ts_i.astype("datetime64[us]"),
                  "event_id": np.arange(n, dtype=np.int64),
                  "value": v})
    out = resample_linear(rd.from_arrow(t).repartition(5)).to_pandas()
    got = {(a, b): c for a, b, c in
           zip(out["user_id"], out["hour_us"], out["v"])}
    want = {}
    for uu in np.unique(u):
        sel = u == uu
        tt, vv = ts_i[sel], v[sel]
        o = np.argsort(tt, kind="stable")
        tt, vv = tt[o], vv[o]
        h0 = -(-tt[0] // US_H) * US_H
        h1 = (tt[-1] // US_H) * US_H
        for h in range(h0, h1 + US_H, US_H):
            il = np.searchsorted(tt, h, side="right") - 1
            ir = np.searchsorted(tt, h, side="left")
            if tt[il] == tt[ir]:
                want[(uu, h)] = vv[il]
            else:
                frac = float(h - tt[il]) / float(tt[ir] - tt[il])
                want[(uu, h)] = vv[il] + (vv[ir] - vv[il]) * frac
    assert got == want


def test_resample_linear_exact_hour_event_is_copied(ray_session):
    from web_crawler_ray.stages.windows import resample_linear
    US_H = 3_600_000_000
    base = np.datetime64("2024-02-01T00:00:00", "us")
    ts = np.array([base, base + np.timedelta64(US_H, "us"),
                   base + np.timedelta64(2 * US_H, "us")])
    t = pa.table({"user_id": pa.array([1, 1, 1], pa.int64()),
                  "ts": ts, "event_id": pa.array([1, 2, 3], pa.int64()),
                  "value": [1.0, 7.77, 3.0]})
    out = resample_linear(rd.from_arrow(t)).to_pandas()
    assert out["v"].tolist() == [1.0, 7.77, 3.0]


def test_rolling_median_matches_pandas_and_brute(ray_session):
    from web_crawler_ray.stages.windows import rolling_median_per_key
    rng = np.random.default_rng(127)
    n = 400
    u = rng.integers(0, 5, n).astype(np.int64)
    ts = np.datetime64("2024-01-01", "us") + \
        rng.integers(0, 10**9, n).astype("timedelta64[us]")
    v = np.round(rng.uniform(0, 10, n), 2)
    t = pa.table({"user_id": u, "ts": ts,
                  "event_id": np.arange(n, dtype=np.int64),
                  "value": v})
    out = rolling_median_per_key(rd.from_arrow(t).repartition(4),
                                 window=7) \
        .to_pandas().set_index("order_id")["med"]
    df = pd.DataFrame({"u": u, "ts": ts, "eid": np.arange(n),
                       "v": v}).sort_values(["u", "ts", "eid"])
    for uu in np.unique(u):
        d = df[df["u"] == uu]
        vals = d["v"].to_numpy()
        for i, eid in enumerate(d["eid"]):
            win = np.sort(vals[max(0, i - 6):i + 1])
            nn = len(win)
            assert out[eid] == win[-(-nn // 2) - 1]   # quantile_disc
        # pandas median agrees on FULL (odd-size) windows
        pm = d["v"].rolling(7).median().to_numpy()
        ours = out[d["eid"].to_numpy()].to_numpy()
        full = ~np.isnan(pm)
        assert np.array_equal(ours[full], pm[full])


def test_corr_matrix_matches_numpy(ray_session):
    from web_crawler_ray.stages.aggregates import corr_matrix
    rng = np.random.default_rng(131)
    a = rng.integers(0, 50, 500).astype(np.float64)
    b = np.round(rng.uniform(0, 0.1, 500), 2)
    c = (a * 2 + rng.integers(0, 10, 500)).astype(np.float64)
    t = pa.table({"x": a, "y": b, "z": c})
    out = corr_matrix(rd.from_arrow(t).repartition(4),
                      ["x", "y", "z"], [1, 100, 1]).to_pandas()
    ref = np.corrcoef(np.stack([a, np.rint(b * 100), c]))
    want = {("x", "y"): ref[0, 1], ("x", "z"): ref[0, 2],
            ("y", "z"): ref[1, 2]}
    got = {(r.col_a, r.col_b): r.r for r in out.itertuples()}
    assert set(got) == set(want)
    for kk in want:
        assert abs(got[kk] - want[kk]) < 1e-12


def test_corr_matrix_constant_column_null(ray_session):
    from web_crawler_ray.stages.aggregates import corr_matrix
    t = pa.table({"x": [1.0, 2.0, 3.0], "y": [5.0, 5.0, 5.0]})
    out = corr_matrix(rd.from_arrow(t), ["x", "y"], [1, 1])
    assert out.column("r").to_pylist() == [None]


def test_rfm_scores_matches_duckdb_ntile(ray_session):
    from web_crawler_ray.stages.aggregates import rfm_scores
    rng = np.random.default_rng(137)
    n = 300
    u = rng.integers(0, 23, n).astype(np.int64)   # 23 users, k=5 uneven
    ts = np.datetime64("2024-01-01", "us") + \
        rng.integers(0, 10**9, n).astype("timedelta64[us]")
    v = np.round(rng.uniform(0, 30, n), 2)
    t = pa.table({"user_id": u, "ts": ts, "value": v})
    out = rfm_scores(rd.from_arrow(t).repartition(5)).to_pandas()
    con = duckdb.connect()
    con.register("events", t.to_pandas())
    ref = con.sql(
        "WITH s AS (SELECT user_id, max(ts) AS mt, count(*)::BIGINT "
        "AS f, sum(CAST(round(value*100) AS BIGINT))::BIGINT AS m "
        "FROM events GROUP BY user_id), g AS (SELECT max(mt) AS gm "
        "FROM s), r AS (SELECT user_id, (epoch_us(gm) - "
        "epoch_us(mt))::BIGINT AS recency_us, f AS frequency, m AS "
        "monetary_cents FROM s, g) SELECT user_id, recency_us, "
        "frequency, monetary_cents, ntile(5) OVER (ORDER BY "
        "recency_us, user_id)::BIGINT AS r_score, ntile(5) OVER "
        "(ORDER BY frequency DESC, user_id)::BIGINT AS f_score, "
        "ntile(5) OVER (ORDER BY monetary_cents DESC, user_id)"
        "::BIGINT AS m_score FROM r ORDER BY user_id").df()
    pd.testing.assert_frame_equal(out, ref)


def test_user_paths_matches_brute(ray_session):
    from web_crawler_ray.stages.windows import user_paths
    rng = np.random.default_rng(139)
    n = 250
    u = rng.integers(0, 40, n).astype(np.int64)
    ts = np.datetime64("2024-01-01", "us") + \
        rng.integers(0, 10**7, n).astype("timedelta64[us]")
    s = rng.choice(["a", "b", "c"], n)
    t = pa.table({"user_id": u, "ts": ts,
                  "event_id": np.arange(n, dtype=np.int64),
                  "event_type": pa.array(s.tolist())})
    out = user_paths(rd.from_arrow(t).repartition(5), k=3).to_pandas()
    df = pd.DataFrame({"u": u, "ts": ts, "eid": np.arange(n),
                       "s": s}).sort_values(["u", "ts", "eid"])
    import collections
    c = collections.Counter(
        ">".join(d["s"].head(3)) for _, d in df.groupby("u"))
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    assert list(zip(out["path"], out["n"])) == want


def test_audience_overlap_matches_brute(ray_session):
    from web_crawler_ray.stages.relational import cooccurrence_pairs_str
    rng = np.random.default_rng(149)
    u = rng.integers(0, 30, 300).astype(np.int64)
    ty = rng.choice(["x", "y", "z", "w"], 300)
    t = pa.table({"user_id": u, "event_type": pa.array(ty.tolist())})
    out = cooccurrence_pairs_str(rd.from_arrow(t).repartition(4),
                                 "user_id", "event_type",
                                 min_support=1).to_pandas()
    import collections
    sets = collections.defaultdict(set)
    for uu, tt in zip(u, ty):
        sets[uu].add(tt)
    c = collections.Counter()
    for items in sets.values():
        ss = sorted(items)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                c[(ss[i], ss[j])] += 1
    got = {(a, b): s for a, b, s in
           zip(out["item_a"], out["item_b"], out["support"])}
    assert got == dict(c)


def test_hourly_profile_matches_brute(ray_session):
    from web_crawler_ray.stages.aggregates import hourly_profile
    rng = np.random.default_rng(151)
    n = 400
    k = rng.choice(["a", "b"], n)
    ts = np.datetime64("2024-01-01", "us") + \
        rng.integers(0, 3 * 86400 * 10**6, n).astype("timedelta64[us]")
    v = np.round(rng.uniform(0, 9, n), 2)
    t = pa.table({"event_type": pa.array(k.tolist()), "ts": ts,
                  "value": v})
    out = hourly_profile(rd.from_arrow(t).repartition(5)).to_pandas()
    hrs = (ts.astype(np.int64) // 3_600_000_000) % 24
    cents = np.rint(v * 100).astype(np.int64)
    for row in out.itertuples():
        sel = (k == row.event_type) & (hrs == row.hour)
        assert row.n == int(sel.sum())
        assert row.sum_cents == int(cents[sel].sum())
        assert row.avg_v == float(row.sum_cents) / float(row.n * 100)


def test_daily_pct_change_first_day_zero(ray_session):
    from web_crawler_ray.stages.aggregates import daily_pct_change
    base = np.datetime64("2024-01-01T05:00:00", "us")
    ts = np.array([base, base + np.timedelta64(86400 * 10**6, "us"),
                   base + np.timedelta64(2 * 86400 * 10**6, "us")])
    t = pa.table({"event_type": pa.array(["a"] * 3), "ts": ts,
                  "value": [1.0, 3.0, 1.5]})
    out = daily_pct_change(rd.from_arrow(t)).to_pandas()
    assert out["pct"].tolist() == [0.0, 2.0, -0.5]
    assert out["sum_cents"].tolist() == [100, 300, 150]


def test_autocorr_lag1_matches_numpy(ray_session):
    from web_crawler_ray.stages.windows import autocorr_lag1
    rng = np.random.default_rng(167)
    n = 500
    u = rng.integers(0, 6, n).astype(np.int64)
    ts = np.datetime64("2024-01-01", "us") + \
        rng.integers(0, 10**9, n).astype("timedelta64[us]")
    v = np.round(rng.uniform(0, 40, n), 2)
    t = pa.table({"user_id": u, "ts": ts,
                  "event_id": np.arange(n, dtype=np.int64),
                  "value": v})
    out = autocorr_lag1(rd.from_arrow(t).repartition(5)) \
        .to_pandas().set_index("user_id")
    df = pd.DataFrame({"u": u, "ts": ts, "eid": np.arange(n),
                       "v": v}).sort_values(["u", "ts", "eid"])
    for uu in np.unique(u):
        c = np.rint(df[df["u"] == uu]["v"].to_numpy() * 100)
        x, y = c[:-1], c[1:]
        if len(x) < 2 or x.std() == 0 or y.std() == 0:
            assert uu not in out.index
            continue
        ref = np.corrcoef(x, y)[0, 1]
        assert int(out.loc[uu, "n_pairs"]) == len(x)
        assert abs(out.loc[uu, "r1"] - ref) < 1e-12
