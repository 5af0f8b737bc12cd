"""Text-analysis + similarity-search stages (training-data ops)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from web_crawler_ray.stages import similarity as S
from web_crawler_ray.stages import textstats as T


def test_token_counts():
    assert T.token_count("a b  c") == 3
    assert T.token_count("") == 0
    assert T.token_count("   ") == 0
    assert T.token_count(" one ") == 1
    assert T.bpe_ish_token_count("hello, world 42") == 5  # hello , world 4 2


def test_text_stats_batch():
    t = pa.table({"text": ["Hello, World!", ""]})
    out = T.text_stats_batch(t)
    assert out.column("n_tokens").to_pylist() == [2, 0]
    assert out.column("n_punct").to_pylist() == [2, 0]
    assert out.column("punct_ratio").to_pylist()[0] == 2 / 13


def test_lang_id():
    lid = T.LangIdStage()
    assert lid.guess("the cat and the dog are in the house") == "en"
    assert lid.guess("der hund und die katze sind nicht im haus") == "de"
    assert lid.guess("le chat est dans la maison pour le moment") == "fr"
    assert lid.guess("el perro y el gato en la casa") == "es"
    assert lid.guess("zzz qqq") == "unknown"
    assert lid.guess("") == "unknown"


def test_quality_score_bands():
    good = ("This is a reasonably long paragraph of normal English text that "
            "should score well on all of the quality heuristics used here.")
    assert T.doc_quality_score(good) == 1.0
    assert T.doc_quality_score("") == 0.0
    assert T.doc_quality_score("!!! ??? ***") < 0.5


def test_fingerprint_deterministic():
    t = pa.table({"text": ["the quick brown fox jumps over the lazy dog again",
                           "the quick brown fox jumps over the lazy dog again",
                           "something else entirely different here now ok yes"]})
    out = T.fingerprint_batch(t).column("fingerprint").to_pylist()
    assert out[0] == out[1] != out[2]


def _embedding_ds(n=60, d=8, seed=3):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, d))
    # plant near-dups: vec 1 ~ vec 0, vec 11 ~ vec 10
    m[1] = m[0] + rng.standard_normal(d) * 0.01
    m[11] = m[10] * 1.5
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": [r.astype(np.float32).tolist() for r in m]})
    return rd.from_pandas(df), m


def test_brute_force_topk(ray_session):
    ds, m = _embedding_ds()
    q = {0: m[0], 10: m[10]}
    out = S.brute_force_topk(ds, q, k=3)
    assert len(out) == 6
    g0 = out[out["query_id"] == 0]
    assert list(g0["vec_id"])[:2] == [0, 1]      # self then planted near-dup
    assert g0.iloc[0]["score"] == 1.0
    g10 = out[out["query_id"] == 10]
    assert list(g10["vec_id"])[:2] == [10, 11]   # scaled copy: cosine 1.0


def test_lsh_recall_vs_brute_force(ray_session):
    ds, m = _embedding_ds(n=120)
    q = {0: m[0], 10: m[10], 20: m[20]}
    exact = S.brute_force_topk(ds, q, k=5)
    approx = S.lsh_bucket_topk(ds, q, k=5, n_bits=6)
    hits = 0
    for qid in q:
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        hits += len(e & a) / len(e)
    assert hits / len(q) >= 0.5  # recall floor at 6 bits + 1-bit probes


def test_near_dup_pairs(ray_session):
    ds, m = _embedding_ds()
    pairs = S.near_dup_pairs(ds, threshold=0.98)
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (0, 1) in got and (10, 11) in got


def test_multimodal_plumbing(ray_session):
    from web_crawler_ray.stages import multimodal as M
    refs = [f"m://h/{i}" for i in range(20)]
    tbl = M.synth_media_table(refs)
    ds = rd.from_arrow(tbl)
    feats = ds.map_batches(M.MediaFeatureStage, batch_format="pyarrow",
                           batch_size=8, concurrency=1).to_pandas()
    assert len(feats) == 20
    assert all(len(f) == M.MediaFeatureStage.FEATURE_DIM for f in feats["features"])
    assert "payload" not in feats.columns  # heavy bytes dropped after decode
    frames = ds.map_batches(M.FrameSampleStage(fps=2.0), batch_format="pyarrow").to_pandas()
    vids = tbl.filter(pa.compute.equal(tbl.column("media_type"), "video"))
    assert (len(frames) > 0) == (vids.num_rows > 0)
    resized = ds.map_batches(M.ImageResizeStage(max_side=128),
                             batch_format="pyarrow").to_pandas()
    assert (resized["out_width"] <= 128).all()
    import pytest
    with pytest.raises(NotImplementedError):
        M.MediaFeatureStage(decoder="pil")


import pytest


@pytest.fixture(scope="module")
def ray_session():
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    yield


def test_training_pipeline_curate(ray_session):
    from web_crawler_ray.pipelines.training_data import curate
    base = ("this is a normal english document with the usual words and it "
            "should be long enough to pass the quality filter of the pipeline ")
    near = base.replace("normal", "typical")
    rows = [
        {"doc_id": 1, "text": base * 2},
        {"doc_id": 2, "text": base * 2},              # exact dup of 1
        {"doc_id": 3, "text": (near * 2)},            # near dup of 1
        {"doc_id": 4, "text": "der hund und die katze sind nicht im haus " * 6},  # not en
        {"doc_id": 5, "text": "!!! ??? *** !!!"},     # low quality
        {"doc_id": 6, "text": "a completely different english story about the "
                              "river and the mountain that should survive easily " * 2},
    ]
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = curate(ds, jaccard_tau=0.75)
    df = out["dataset"].to_pandas()
    kept = set(df["doc_id"])
    assert 1 in kept            # representative of the dup cluster
    assert 2 not in kept        # exact dup removed
    assert 3 not in kept and 3 in out["dropped_near_dups"]
    assert 4 not in kept        # language filter
    assert 5 not in kept        # quality filter
    assert 6 in kept
    assert "n_tokens" in df.columns


def test_ivf_recall_vs_brute_force(ray_session):
    ds, m = _embedding_ds(n=200, d=16, seed=11)
    q = {0: m[0], 50: m[50], 120: m[120]}
    exact = S.brute_force_topk(ds, q, k=5)
    approx = S.ivf_topk(ds, q, k=5, n_lists=8, n_probe=3)
    hits = 0
    for qid in q:
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        hits += len(e & a) / len(e)
    assert hits / len(q) >= 0.6
    # self-hit must always be found (its own list is the nearest centroid)
    for qid in q:
        assert qid in set(approx[approx["query_id"] == qid]["vec_id"])


def test_near_dup_lsh_equals_exact_on_planted_dups(ray_session):
    """The LSH scale path finds the same pairs as the exact distributed
    all-pairs at a real near-dup threshold (planted dups; banded-LSH
    recall ~1 at tau>=0.9), and scores agree bit-for-bit (both are
    float64 cosine rounded to 6)."""
    rng = np.random.default_rng(3)
    n, d = 150, 24
    m = rng.standard_normal((n, d))
    for i in range(0, 30, 3):           # plant 10 near-dup pairs
        m[i + 1] = m[i] + 0.02 * rng.standard_normal(d)
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": [r.astype(np.float32).tolist() for r in m]})
    ds = rd.from_pandas(df)
    exact = S.near_dup_pairs(ds, threshold=0.95, method="exact")
    lsh = S.near_dup_pairs(ds, threshold=0.95, method="lsh")
    assert len(exact) >= 10
    e = {(r.id_a, r.id_b): r.score for r in exact.itertuples()}
    l = {(r.id_a, r.id_b): r.score for r in lsh.itertuples()}
    assert set(l) <= set(e)                      # precision exact
    assert len(set(l) & set(e)) / len(e) >= 0.9  # recall floor
    for k in l:
        assert l[k] == e[k]
    # auto routing: high tau -> lsh (same result as the explicit call)
    auto = S.near_dup_pairs(ds, threshold=0.95)
    assert auto.equals(lsh)


def test_near_dup_pairs_empty_and_autosized(ray_session):
    empty = rd.from_pandas(pd.DataFrame({"vec_id": pd.Series([], dtype=np.int64),
                                         "embedding": pd.Series([], dtype=object)}))
    for method in ("lsh", "exact"):
        out = S.near_dup_pairs(empty, threshold=0.95, method=method)
        assert len(out) == 0 and list(out.columns) == ["id_a", "id_b", "score"]


def test_md5_word_hash_matches_duckdb_md5_number_lower():
    """The md5 hash variants are oracle-exact ONLY because the engine's
    word hash equals DuckDB's md5_number_lower: low 8 md5 digest bytes,
    little-endian. Pin that correspondence."""
    import duckdb
    from web_crawler_ray.stages.dedup import _word_hash64
    words = ["abc", "", "office", "straße", "42", "o'brien", "x" * 100]
    con = duckdb.connect()
    for w in words:
        got = _word_hash64(w, "md5")
        exp = con.execute("SELECT md5_number_lower(?)", [w]).fetchone()[0]
        assert got == exp, w


def test_fingerprint_md5_window_semantics():
    """min over 8-word windows; <8 words -> single window; empty -> 0."""
    import pyarrow as pa
    from web_crawler_ray.stages.dedup import _word_hash64
    from web_crawler_ray.stages.textstats import fingerprint_md5_batch, _WORD_RE
    texts = ["", "one two three", "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"]
    out = fingerprint_md5_batch(pa.table({"text": texts}))
    fps = out.column("fingerprint").to_pylist()
    assert fps[0] == 0
    assert fps[1] == _word_hash64("one\x01two\x01three", "md5")
    ws = _WORD_RE.findall(texts[2])
    expect = min(_word_hash64("\x01".join(ws[i:i + 8]), "md5")
                 for i in range(3))
    assert fps[2] == expect


def test_media_features_task_and_actor_forms_equal(ray_session):
    """q_media_features' default stateless-task form (per-worker decoder
    singleton) must emit exactly what the actor-pool form emits."""
    from web_crawler_ray.pipelines.queries import q_media_features
    sf = "/root/testdata/sf0.001"
    a = q_media_features(sf).to_pandas() \
        .sort_values("media_ref").reset_index(drop=True)
    b = q_media_features(sf, actor_pool=True).to_pandas() \
        .sort_values("media_ref").reset_index(drop=True)
    assert len(a) > 0
    assert a.equals(b)
