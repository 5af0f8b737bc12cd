"""Unit semantics for the relational operators (semi/anti join, explode,
pivot, running windows) — edge cases the registry-level DuckDB gate
(test_queries_oracle) doesn't reach: null keys, empty lists, broadcast
vs shuffled plan equality, string keys on the shuffled path."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from web_crawler_ray.stages.relational import (anti_join_broadcast,
                                               cumsum_per_key,
                                               distinct_keys,
                                               explode_list,
                                               ntile_per_group,
                                               pivot_sum,
                                               semi_join_broadcast,
                                               semi_join_shuffled,
                                               split_explode)


def _left():
    return rd.from_pandas(pd.DataFrame({
        "k": pd.array([1, 2, 3, 4, None, 2], dtype="Int64"),
        "v": ["a", "b", "c", "d", "e", "f"],
    }))


def _right():
    return rd.from_pandas(pd.DataFrame({
        "rk": pd.array([2, 4, 4, None, 9], dtype="Int64"),
    }))


# --- semi / anti join --------------------------------------------------------

def test_semi_join_broadcast_null_and_dup_semantics():
    out = semi_join_broadcast(_left(), _right(), "k", "rk") \
        .to_pandas().sort_values("v")
    # EXISTS: k in {2,4}; the null left key never matches; left dups kept
    assert list(out["v"]) == ["b", "d", "f"]


def test_anti_join_broadcast_keeps_null_left_key():
    out = anti_join_broadcast(_left(), _right(), "k", "rk") \
        .to_pandas().sort_values("v")
    # NOT EXISTS: null left key is kept (no right row can equal it)
    assert list(out["v"]) == ["a", "c", "e"]


@pytest.mark.parametrize("anti", [False, True])
def test_shuffled_plan_equals_broadcast_plan(anti):
    rng = np.random.default_rng(11)
    left = pd.DataFrame({"k": rng.integers(0, 300, 2_000),
                         "x": rng.integers(0, 10, 2_000)})
    right = pd.DataFrame({"k": rng.integers(0, 400, 500)})
    b = semi_join_broadcast(rd.from_pandas(left), rd.from_pandas(right),
                            "k", anti=anti).to_pandas()
    s = semi_join_shuffled(rd.from_pandas(left), rd.from_pandas(right),
                           "k", anti=anti, num_partitions=16).to_pandas()
    key = ["k", "x"]
    pd.testing.assert_frame_equal(
        b.sort_values(key).reset_index(drop=True)[key],
        s.sort_values(key).reset_index(drop=True)[key].astype(b.dtypes.to_dict()))


def test_shuffled_semi_join_string_keys():
    left = pd.DataFrame({"k": ["a", "b", "c", "a"], "x": [1, 2, 3, 4]})
    right = pd.DataFrame({"k": ["a", "z"]})
    out = semi_join_shuffled(rd.from_pandas(left), rd.from_pandas(right),
                             "k", num_partitions=4).to_pandas()
    assert sorted(out["x"]) == [1, 4]


def test_distinct_keys_is_global_distinct():
    ds = rd.from_pandas(pd.DataFrame({"s": ["x", "y", "x", "z", "y"]}))
    assert sorted(distinct_keys(ds, "s")) == ["x", "y", "z"]


# --- explode -----------------------------------------------------------------

def test_explode_list_drops_empty_and_null_repeats_keep_cols():
    t = pa.table({
        "id": [1, 2, 3, 4],
        "xs": pa.array([[10, 11], [], None, [12]],
                       type=pa.list_(pa.int64())),
    })
    out = explode_list(rd.from_arrow(t), "xs", out_col="x",
                       keep_cols=("id",)).to_pandas().sort_values("x")
    assert list(out["id"]) == [1, 1, 4]
    assert list(out["x"]) == [10, 11, 12]


def test_split_explode_words():
    ds = rd.from_items([{"s": "red green"}, {"s": "blue"}])
    out = split_explode(ds, "s", " ", out_col="w").to_pandas()
    assert sorted(out["w"]) == ["blue", "green", "red"]


# --- pivot -------------------------------------------------------------------

def test_pivot_sum_matches_conditional_aggregation():
    df = pd.DataFrame({
        "g": ["a", "a", "b", "b", "b"],
        "p": ["x", "y", "x", "x", "z"],
        "v": [1.0, 2.0, 3.0, 4.0, 5.0],
    })
    out = pivot_sum(rd.from_pandas(df), "g", "p", "v",
                    pivot_values=["x", "y", "z"], prefix="s_") \
        .to_pandas().sort_values("g").reset_index(drop=True)
    assert list(out.columns) == ["g", "s_x", "s_y", "s_z"]
    assert out.loc[0].tolist() == ["a", 1.0, 2.0, 0.0]
    assert out.loc[1].tolist() == ["b", 7.0, 0.0, 5.0]


def test_pivot_sum_discovers_values_distributed():
    df = pd.DataFrame({"g": [1, 1, 2], "p": ["m", "n", "m"],
                       "v": [1.0, 1.0, 1.0]})
    out = pivot_sum(rd.from_pandas(df), "g", "p", "v").to_pandas()
    assert sorted(out.columns) == ["g", "m", "n"]


# --- running windows ---------------------------------------------------------

def test_cumsum_per_key_matches_pandas_window():
    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "u": rng.integers(0, 20, 500),
        "ts": pd.to_datetime("2022-01-01")
              + pd.to_timedelta(rng.integers(0, 1_000, 500), unit="s"),
        "i": np.arange(500),
        "v": rng.random(500),
    })
    got = cumsum_per_key(rd.from_pandas(df), "u", "ts", "i", "v") \
        .to_pandas().sort_values("i").reset_index(drop=True)
    exp = df.sort_values(["u", "ts", "i"]).copy()
    exp["cum"] = exp.groupby("u")["v"].cumsum().round(6)
    exp = exp.sort_values("i").reset_index(drop=True)
    assert np.allclose(got["cum_value"], exp["cum"], rtol=0, atol=0)


def test_ntile_fill_rule():
    # 7 rows, 3 buckets -> sizes 3,2,2 (SQL-standard NTILE fill)
    df = pd.DataFrame({"g": ["a"] * 7, "o": range(7), "id": range(7)})
    out = ntile_per_group(rd.from_pandas(df), "g", ["o"], 3, id_col="id") \
        .to_pandas().sort_values("id")
    assert list(out["tile"]) == [1, 1, 1, 2, 2, 3, 3]


def test_ntile_fewer_rows_than_buckets():
    df = pd.DataFrame({"g": ["a", "a"], "o": [1, 0], "id": [10, 11]})
    out = ntile_per_group(rd.from_pandas(df), "g", ["o"], 5, id_col="id") \
        .to_pandas().sort_values("tile")
    # order by o: id=11 first -> tile 1, id=10 -> tile 2
    assert list(out["id"]) == [11, 10]
    assert list(out["tile"]) == [1, 2]


# --- set ops / lag diff / rollup / argmax / moments / string_agg -------------

def test_distinct_set_op_null_semantics():
    from web_crawler_ray.stages.relational import distinct_set_op
    left = rd.from_pandas(pd.DataFrame(
        {"k": pd.array([1, 1, 2, 3, None], dtype="Int64")}))
    right_no_null = rd.from_pandas(pd.DataFrame(
        {"k": pd.array([2, 9], dtype="Int64")}))
    right_null = rd.from_pandas(pd.DataFrame(
        {"k": pd.array([2, None], dtype="Int64")}))
    # EXCEPT: distinct output; NULL survives iff right has no NULL
    ex = distinct_set_op(left, right_no_null, "k", op="except").to_pandas()
    assert sorted(ex["k"], key=lambda x: (pd.isna(x), x)) == [1, 3] \
        or {v for v in ex["k"] if pd.notna(v)} == {1, 3} and ex["k"].isna().sum() == 1
    ex2 = distinct_set_op(left, right_null, "k", op="except").to_pandas()
    assert {int(v) for v in ex2["k"] if pd.notna(v)} == {1, 3}
    assert ex2["k"].isna().sum() == 0
    # INTERSECT: NULL survives iff right HAS a NULL
    it = distinct_set_op(left, right_null, "k", op="intersect").to_pandas()
    assert {int(v) for v in it["k"] if pd.notna(v)} == {2}
    assert it["k"].isna().sum() == 1


def test_lag_diff_first_row_is_zero_and_order():
    from web_crawler_ray.stages.relational import lag_diff_per_key
    df = pd.DataFrame({
        "u": [1, 1, 1, 2],
        "ts": pd.to_datetime(["2022-01-01 00:00:02", "2022-01-01 00:00:01",
                              "2022-01-01 00:00:01", "2022-01-01 00:00:00"]),
        "i": [0, 1, 2, 3],
        "v": [5.0, 1.0, 3.0, 7.0],
    })
    out = lag_diff_per_key(rd.from_pandas(df), "u", "ts", "i", "v") \
        .to_pandas().sort_values("i")
    # user 1 order by (ts, i): i=1 (first -> 0.0), i=2 (3-1), i=0 (5-3)
    assert dict(zip(out["i"], out["delta"])) == \
        {1: 0.0, 2: 2.0, 0: 2.0, 3: 0.0}


def test_rollup_levels_and_nulls():
    from web_crawler_ray.stages.aggregates import rollup_sum
    df = pd.DataFrame({"a": ["x", "x", "y"], "b": ["p", "q", "p"],
                       "v": [1.0, 2.0, 4.0]})
    out = rollup_sum(rd.from_pandas(df), ["a", "b"], "v",
                     sum_name="s", count_name="n").to_pandas()
    # 3 fine + 2 level-1 + 1 grand = 6 rows
    assert len(out) == 6
    grand = out[out["a"].isna()]
    assert len(grand) == 1 and grand["s"].iloc[0] == 7.0 \
        and grand["n"].iloc[0] == 3
    lvl1 = out[out["a"].notna() & out["b"].isna()].set_index("a")
    assert lvl1.loc["x", "s"] == 3.0 and lvl1.loc["y", "s"] == 4.0
    assert lvl1.loc["x", "n"] == 2


def test_group_argmax_tiebreak_min_id():
    from web_crawler_ray.stages.aggregates import group_argmax
    df = pd.DataFrame({"g": ["a", "a", "a", "b"],
                       "id": [3, 1, 2, 9],
                       "v": [5.0, 5.0, 4.0, 1.0]})
    out = group_argmax(rd.from_pandas(df), "g", "v", "id") \
        .to_pandas().set_index("g")
    assert out.loc["a", "id"] == 1 and out.loc["a", "v"] == 5.0
    assert out.loc["b", "id"] == 9


def test_group_moments_matches_pandas():
    from web_crawler_ray.stages.aggregates import group_moments
    rng = np.random.default_rng(5)
    df = pd.DataFrame({"g": rng.integers(0, 4, 300),
                       "v": rng.integers(1, 51, 300).astype(float)})
    out = group_moments(rd.from_pandas(df), "g", "v") \
        .to_pandas().set_index("g").sort_index()
    exp = df.groupby("g")["v"].agg(["count", "mean", "var", "std"])
    assert list(out["n_rows"]) == list(exp["count"])
    assert np.allclose(out["avg_v"], exp["mean"].round(6), atol=1e-9)
    assert np.allclose(out["var_v"], exp["var"].round(6), atol=1e-9)
    assert np.allclose(out["std_v"], exp["std"].round(6), atol=1e-9)


def test_string_agg_sorted_and_null_skip():
    from web_crawler_ray.stages.aggregates import string_agg_per_group
    df = pd.DataFrame({"g": ["r", "r", "r", "s"],
                       "x": ["b", None, "a", "z"]})
    out = string_agg_per_group(rd.from_pandas(df), "g", "x",
                               out_col="agg").to_pandas().set_index("g")
    assert out.loc["r", "agg"] == "a,b"
    assert out.loc["s", "agg"] == "z"


# --- data-validation profile + SCD-1 upsert -----------------------------------

def test_profile_columns_nulls_and_extremes(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from web_crawler_ray.stages.relational import profile_columns
    t = pa.table({
        "a": pa.array([1, None, 3, None, -7], pa.int64()),
        "b": pa.array([0.5, 2.5, None, -1.5, 0.0], pa.float64())})
    out = profile_columns(rd.from_arrow(t).repartition(3), ["a", "b"])
    rows = {r["column"]: r for r in out.to_pylist()}
    assert rows["a"] == {"column": "a", "n_rows": 5, "n_nulls": 2,
                         "min_v": -7.0, "max_v": 3.0}
    assert rows["b"] == {"column": "b", "n_rows": 5, "n_nulls": 1,
                         "min_v": -1.5, "max_v": 2.5}
    # all-null column -> null min/max
    t2 = pa.table({"c": pa.array([None, None], pa.float64())})
    o2 = profile_columns(rd.from_arrow(t2), ["c"]).to_pylist()[0]
    assert o2["n_nulls"] == 2 and o2["min_v"] is None


def test_merge_upsert_semantics(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from web_crawler_ray.stages.relational import merge_upsert
    base = pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()),
                     "v": pa.array([10.0, 20.0, 30.0, 40.0])})
    upd = pa.table({"k": pa.array([2, 5], pa.int64()),
                    "v": pa.array([99.0, 55.0])})
    out = merge_upsert(rd.from_arrow(base).repartition(2),
                       rd.from_arrow(upd), "k") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    assert list(out["k"]) == [1, 2, 3, 4, 5]
    assert list(out["v"]) == [10.0, 99.0, 30.0, 40.0, 55.0]


def _brute_skyline(x, y):
    keep = []
    for i in range(len(x)):
        dom = any((x[j] <= x[i] and y[j] <= y[i]
                   and (x[j] < x[i] or y[j] < y[i]))
                  for j in range(len(x)))
        keep.append(not dom)
    return np.array(keep, bool)


def test_skyline_mask_matches_brute_force():
    from web_crawler_ray.stages.relational import _skyline_2d
    rng = np.random.default_rng(7)
    for n in (0, 1, 2, 50, 300):
        x = rng.integers(0, 12, n).astype(np.float64)
        y = rng.integers(0, 12, n).astype(np.float64)
        got = _skyline_2d(x, y)
        assert (got == _brute_skyline(x, y)).all()


def test_skyline_duplicates_all_survive():
    from web_crawler_ray.stages.relational import _skyline_2d
    # two exact-duplicate optimal points: neither dominates the other
    x = np.array([1.0, 1.0, 2.0, 1.0])
    y = np.array([1.0, 1.0, 0.5, 3.0])
    assert list(_skyline_2d(x, y)) == [True, True, True, False]


def test_skyline_2d_distributed_equals_global(ray_session):
    from web_crawler_ray.stages.relational import _skyline_2d, skyline_2d
    rng = np.random.default_rng(11)
    x = rng.integers(0, 40, 500).astype(np.float64)
    y = rng.integers(0, 40, 500).astype(np.float64)
    t = pa.table({"id": pa.array(np.arange(500)), "x": x, "y": y})
    want = sorted(np.arange(500)[_skyline_2d(x, y)].tolist())
    for parts in (1, 3, 16):
        out = skyline_2d(rd.from_arrow(t).repartition(parts), "x", "y")
        assert sorted(out.column("id").to_pylist()) == want


def test_table_checksum_order_free_and_sensitive(ray_session):
    from web_crawler_ray.stages.relational import table_checksum
    t = pa.table({"id": pa.array([1, 2, 3, 4], pa.int64()),
                  "s": pa.array(["a", "b", "c", "d"])})
    c1 = table_checksum(rd.from_arrow(t), ["id", "s"])
    assert c1.column("n_rows").to_pylist() == [4]
    # partitioning / row order never changes the checksum
    perm = t.take(pa.array([3, 1, 0, 2]))
    c2 = table_checksum(rd.from_arrow(perm).repartition(3),
                        ["id", "s"])
    assert c2.column("checksum").to_pylist() \
        == c1.column("checksum").to_pylist()
    # a single changed cell changes it
    t3 = pa.table({"id": pa.array([1, 2, 3, 4], pa.int64()),
                   "s": pa.array(["a", "b", "c", "e"])})
    c3 = table_checksum(rd.from_arrow(t3), ["id", "s"])
    assert c3.column("checksum").to_pylist() \
        != c1.column("checksum").to_pylist()
    # and the value is within 63 bits (SQL BIGINT-safe)
    assert 0 <= c1.column("checksum")[0].as_py() < 2 ** 63


def test_unpivot_shape_and_values(ray_session):
    from web_crawler_ray.stages.relational import unpivot
    t = pa.table({"id": pa.array([1, 2], pa.int64()),
                  "a": pa.array([1.5, 2.5]),
                  "b": pa.array([10, 20], pa.int64())})
    out = unpivot(rd.from_arrow(t).repartition(2), ["id"], ["a", "b"]) \
        .to_pandas().sort_values(["id", "measure"]) \
        .reset_index(drop=True)
    assert len(out) == 4
    assert list(out["measure"]) == ["a", "b", "a", "b"]
    assert list(out["val"]) == [1.5, 10.0, 2.5, 20.0]


def test_cooccurrence_pairs_matches_brute(ray_session):
    from web_crawler_ray.stages.relational import cooccurrence_pairs
    rng = np.random.default_rng(103)
    g = rng.integers(0, 50, 400).astype(np.int64)
    i = rng.integers(0, 20, 400).astype(np.int64)
    t = pa.table({"g": g, "i": i})
    out = cooccurrence_pairs(rd.from_arrow(t).repartition(6),
                             "g", "i", min_support=2).to_pandas()
    got = {(a, b): s for a, b, s in
           zip(out["item_a"], out["item_b"], out["support"])}
    import collections
    baskets = collections.defaultdict(set)
    for gg, ii in zip(g, i):
        baskets[gg].add(ii)
    want = collections.Counter()
    for items in baskets.values():
        s = sorted(items)
        for x in range(len(s)):
            for y in range(x + 1, len(s)):
                want[(s[x], s[y])] += 1
    want = {k: v for k, v in want.items() if v >= 2}
    assert got == want


def test_cooccurrence_pairs_dedups_within_group(ray_session):
    from web_crawler_ray.stages.relational import cooccurrence_pairs
    # item 3 appears twice in group 1: the pair (3,5) counts ONCE
    t = pa.table({"g": pa.array([1, 1, 1, 2, 2], pa.int64()),
                  "i": pa.array([3, 3, 5, 3, 5], pa.int64())})
    out = cooccurrence_pairs(rd.from_arrow(t), "g", "i",
                             min_support=2).to_pandas()
    assert out.values.tolist() == [[3, 5, 2]]


def test_incremental_group_stats_merge_equals_batch(ray_session):
    from web_crawler_ray.stages.aggregates import (
        group_stats_state, incremental_group_stats, merge_group_stats)
    rng = np.random.default_rng(107)
    k1 = rng.choice(["a", "b", "c"], 300)
    v1 = np.round(rng.uniform(-10, 90, 300), 2)
    k2 = rng.choice(["b", "c", "d"], 200)   # overlapping + new keys
    v2 = np.round(rng.uniform(-50, 10, 200), 2)
    a = pa.table({"k": pa.array(k1.tolist()), "v": v1})
    b = pa.table({"k": pa.array(k2.tolist()), "v": v2})
    inc = incremental_group_stats(
        rd.from_arrow(a).repartition(4), rd.from_arrow(b).repartition(3),
        "k", "v").to_pandas().set_index("key")
    full = pa.table({"k": pa.array(k1.tolist() + k2.tolist()),
                     "v": np.concatenate([v1, v2])})
    batch = group_stats_state(rd.from_arrow(full), "k", "v") \
        .to_pandas().set_index("key")
    pd.testing.assert_frame_equal(inc.sort_index(), batch.sort_index())
    # merge is commutative
    sa = group_stats_state(rd.from_arrow(a), "k", "v")
    sb = group_stats_state(rd.from_arrow(b), "k", "v")
    ab = merge_group_stats(sa, sb).to_pandas()
    ba = merge_group_stats(sb, sa).to_pandas()
    pd.testing.assert_frame_equal(ab, ba)


def test_regex_extract_no_match_and_named_groups(ray_session):
    from web_crawler_ray.stages.textstats import regex_extract
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["big spark table x", "no hit", ""])})
    out = regex_extract(rd.from_arrow(t), r"(s[a-z]+) ([a-z]+)",
                        ["w1", "w2"]).to_pandas()
    assert out["w1"].tolist() == ["spark", "", ""]
    assert out["w2"].tolist() == ["table", "", ""]


def test_dbscan_geo_semantics(ray_session):
    from web_crawler_ray.stages.clustering import dbscan_geo
    # blob of 5 (member 2 stretched to la=1.8, still core), a border
    # point at la=3.6 reaching ONLY member 2, noise far away, and a
    # far pair (mutually near but non-core)
    la = [0.0, 0.1, 1.8, 0.0, 0.1,   3.6,   50.0,   -60.0, -60.1]
    lo = [0.0, 0.1, 0.0, 0.2, 0.2,   0.0,   50.0,    10.0,  10.1]
    ids = list(range(9))
    t = pa.table({"id": pa.array(ids, pa.int64()),
                  "la": pa.array(la), "lo": pa.array(lo)})
    out = dbscan_geo(rd.from_arrow(t).repartition(3), eps_deg=2.0,
                     min_pts=4).to_pandas().set_index("id")
    # blob 0-4 core, labeled by min id 0
    assert out.loc[0:4, "is_core"].tolist() == [1] * 5
    assert out.loc[0:4, "label"].tolist() == [0] * 5
    # 5 is within eps of blob members but itself non-core -> border
    assert out.loc[5, "is_core"] == 0 and out.loc[5, "label"] == 0
    # 6 isolated noise; 7/8 a non-core pair -> noise
    assert out.loc[6, "label"] == -1
    assert out.loc[7, "label"] == -1 and out.loc[8, "label"] == -1


def test_dbscan_geo_matches_brute(ray_session):
    from web_crawler_ray.stages.clustering import dbscan_geo
    rng = np.random.default_rng(109)
    n = 120
    la = rng.uniform(-20, 20, n)
    lo = rng.uniform(-20, 20, n)
    ids = np.arange(n, dtype=np.int64)
    t = pa.table({"id": ids, "la": la, "lo": lo})
    eps, mp = 3.0, 4
    out = dbscan_geo(rd.from_arrow(t).repartition(4), eps_deg=eps,
                     min_pts=mp).to_pandas().set_index("id")
    # brute force with the same deterministic min-label contract
    d2 = (la[:, None] - la) ** 2 + ((lo[:, None] - lo) * 0.75) ** 2
    adj = (d2 <= eps * eps) & ~np.eye(n, dtype=bool)
    core = adj.sum(1) + 1 >= mp
    # components over core-core adjacency
    lbl = np.full(n, -1, np.int64)
    for s in np.flatnonzero(core):
        if lbl[s] != -1:
            continue
        comp, stack = [], [s]
        seen = {s}
        while stack:
            x = stack.pop()
            comp.append(x)
            for y in np.flatnonzero(adj[x] & core):
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        for x in comp:
            lbl[x] = min(comp)
    for b in np.flatnonzero(~core):
        nb = np.flatnonzero(adj[b] & core)
        if len(nb):
            lbl[b] = lbl[nb].min()
    assert out["label"].to_numpy().tolist() == lbl.tolist()
    assert out["is_core"].to_numpy().astype(bool).tolist() == \
        core.tolist()


def test_snapshot_diff_semantics(ray_session):
    from web_crawler_ray.stages.relational import snapshot_diff
    a = pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()),
                  "v": [1.0, 2.0, 3.0, 4.0]})
    b = pa.table({"k": pa.array([2, 3, 4, 5], pa.int64()),
                  "v": [2.0, 3.5, 4.0, 5.0]})
    out = snapshot_diff(rd.from_arrow(a).repartition(2),
                        rd.from_arrow(b).repartition(3), "k", "v") \
        .to_pandas().sort_values("key").reset_index(drop=True)
    assert list(zip(out["key"], out["status"],
                    out["val_a"], out["val_b"])) == [
        (1, "removed", 100, -1),
        (3, "changed", 300, 350),
        (5, "added", -1, 500)]


def test_snapshot_diff_identical_is_empty(ray_session):
    from web_crawler_ray.stages.relational import snapshot_diff
    a = pa.table({"k": pa.array([1, 2], pa.int64()), "v": [1.0, 2.0]})
    out = snapshot_diff(rd.from_arrow(a), rd.from_arrow(a), "k", "v")
    n = sum(len(pa.table(bb))
            for bb in out.iter_batches(batch_format="pyarrow"))
    assert n == 0
