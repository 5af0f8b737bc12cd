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


def test_curation_filter_batch_equals_composed_filters():
    """The fused lang+quality filter (VERDICT r3 #4) must keep exactly
    the rows the composed LangIdStage.guess == 'en' AND
    doc_quality_score >= 0.5 filters keep — targeted edge cases plus a
    seeded word-soup fuzz."""
    lid = T.LangIdStage()
    base_en = ("this is a normal english document with the usual words and "
               "it should be long enough to pass the quality filter ")
    texts = [
        "", "   ", "!!! ??? ***",
        "der hund und die katze sind nicht im haus " * 4,
        "le chat est dans la maison et il est content " * 4,
        base_en * 2, base_en,
        "a b c d e f g h i j",                       # short tokens
        "supercalifragilisticexpialidocious " * 30,  # long mean token len
        base_en + "!!!!" * 200,                      # punct-heavy
        "the " * 300,                                # stopword-saturated
    ]
    rng = np.random.default_rng(5)
    vocab = ["the", "and", "data", "of", "pipeline", "der", "und", "le",
             "la", "x1", "!!", "verylongwordindeed", "a"]
    for _ in range(40):
        k = int(rng.integers(0, 60))
        texts.append(" ".join(rng.choice(vocab, size=k).tolist()))
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    expect = [i for i, x in enumerate(texts)
              if lid.guess(x) == "en" and T.doc_quality_score(x) >= 0.5]
    got = T.curation_filter_batch(t)
    assert got.column("doc_id").to_pylist() == expect
    assert len(expect) >= 1  # the filter keeps something in this set


def test_plan_lsh_bands_recall_and_feasibility():
    """VERDICT r3 #1: every plan the auto-sizer returns must reach
    per-pair recall >= RECALL_TARGET within the band cap AND keep the
    expected bucket under the truncation cap; when no n_bits satisfies
    both, the planner must return None (never a silently degraded plan)
    — checked against a brute-force feasibility sweep up to 10^9 rows."""
    for tau in (0.8, 0.85, 0.9, 0.95, 0.99):
        p = S._p_bit(tau)
        for n in (100, 10_000, 1_000_000, 10**8, 10**9):
            plan = S.plan_lsh_bands(n, tau)
            feasible_bits = [
                b for b in range(1, 25)
                if (1 - (1 - p ** b) ** S.MAX_BANDS) >= S.RECALL_TARGET
                and n / (1 << b) <= S.BUCKET_CAP]
            if plan is None:
                assert not feasible_bits, (tau, n)
                continue
            bits, bands = plan
            recall = 1 - (1 - p ** bits) ** bands
            assert recall >= S.RECALL_TARGET - 1e-12, (tau, n, plan)
            assert 1 <= bands <= S.MAX_BANDS
            assert n / (1 << bits) <= S.BUCKET_CAP
    # the round-3 defect case: tau=0.8 at 10^6 rows must NOT ship a
    # degraded-recall plan — it is bucket-infeasible, so route-to-exact
    assert S.plan_lsh_bands(1_000_000, 0.8) is None
    # tau=0.8 at 50k rows: corpus-sized bits (12) exceed the recall
    # ceiling; the planner SHRINKS bits instead of under-banding
    bits, bands = S.plan_lsh_bands(50_000, 0.8)
    assert bits <= 9 and bands <= S.MAX_BANDS


def test_near_dup_lsh_infeasible_routes_to_exact(ray_session, monkeypatch):
    """When no feasible (n_bits, n_bands) exists, method='lsh' with
    auto-sizing must fall back to the exact distributed path (identical
    output), not ship degraded recall."""
    rng = np.random.default_rng(7)
    n, d = 90, 24
    m = rng.standard_normal((n, d))
    for i in range(0, 18, 3):
        m[i + 1] = m[i] + 0.02 * rng.standard_normal(d)
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": [r.astype(np.float32).tolist() for r in m]})
    ds = rd.from_pandas(df)
    exact = S.near_dup_pairs(ds, threshold=0.95, method="exact")
    assert len(exact) >= 6
    monkeypatch.setattr(S, "BUCKET_CAP", 0)  # force: every plan infeasible
    routed = S.near_dup_pairs(ds, threshold=0.95, method="lsh")
    assert routed.equals(exact)


def test_q_near_dup_lsh_planted_recall_is_total(ray_session):
    """The graded near_dup_lsh corpus: the LSH path must find EXACTLY
    the pairs the exact path finds (recall 1.0 at the fixed seeds —
    this is what makes the DuckDB cosine-join oracle hash-exact)."""
    from web_crawler_ray.pipelines import queries as Q
    tbl = Q._planted_embeddings(0.001)
    ds = rd.from_arrow(tbl)
    exact = S.near_dup_pairs(ds, threshold=Q.PLANTED_TAU, method="exact")
    lsh = S.near_dup_pairs(ds, threshold=Q.PLANTED_TAU, method="lsh")
    assert len(exact) >= tbl.num_rows // 12  # planted pairs are there
    assert lsh.equals(exact)


def test_simhash_md5_ascii_tokenization_matches_duckdb():
    """ADVICE r3: the md5 simhash variants tokenize with the ASCII word
    class so they agree with DuckDB RE2's \\w on NON-ascii input too;
    the default blake2b variant keeps Python's Unicode \\w."""
    import duckdb
    from web_crawler_ray.stages.dedup import (
        _WORD_RE, _WORD_RE_ASCII, simhash64)
    from web_crawler_ray.pipelines.queries import _SIMHASH_MD5_SQL
    text = "Die Straße zum Café: 42 Gebäude"
    # tokenizations genuinely differ on this input
    assert _WORD_RE.findall(text.lower()) != _WORD_RE_ASCII.findall(text.lower())
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT 1 AS doc_id, ? AS text",
                [text])
    exp = con.execute(_SIMHASH_MD5_SQL).fetchone()[1]
    assert simhash64(text, hash_fn="md5") == exp
    # blake2b variant unchanged: still Unicode words
    assert simhash64(text, hash_fn="blake2b") != 0


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


# --- SemDeDup ---------------------------------------------------------------

def test_semantic_dedup_planted(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from web_crawler_ray.stages.similarity import semantic_dedup

    rng = np.random.default_rng(3)
    base = rng.normal(size=(10, 16))
    rows, labels = [], []
    # 10 anchors; ids 0-9. Near-dups of anchor i at id 10+i (cos ~0.999).
    for i in range(10):
        rows.append(base[i])
        labels.append(i % 2)
    for i in range(10):
        rows.append(base[i] + rng.normal(scale=1e-3, size=16))
        labels.append(i % 2)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(20), pa.int64()),
        "lbl": pa.array(labels, pa.int32()),
        "embedding": pa.array([r.tolist() for r in rows],
                              pa.list_(pa.float32()))}))
    kept = semantic_dedup(ds.repartition(4), tau=0.95, cluster_col="lbl") \
        .to_pandas()
    # every near-dup (id >= 10) is dominated by its anchor (id < 10)
    assert sorted(kept.vec_id) == list(range(10))

    # kmeans route: same corpus, clusters fit on the data; anchors are
    # far apart (random normals), dups land in the anchor's cluster
    kept2 = semantic_dedup(ds.repartition(4), tau=0.95, k=4, iters=4) \
        .to_pandas()
    # each dup is ~identical to its anchor, so it lands in the anchor's
    # cluster and is dominated there regardless of the k-means split
    assert sorted(kept2.vec_id) == list(range(10))
    # determinism: rerun is identical
    kept3 = semantic_dedup(ds.repartition(4), tau=0.95, k=4, iters=4) \
        .to_pandas()
    assert sorted(kept2.vec_id) == sorted(kept3.vec_id)


# --- reciprocal-rank fusion ---------------------------------------------------

def test_rrf_fuse_hand_computed(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from web_crawler_ray.stages.similarity import rrf_fuse
    # system A ranks: 3, 1, 2 ; system B ranks: 2, 3 (doc 1 absent)
    a = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "s": pa.array([0.5, 0.2, 0.9])})
    b = pa.table({"doc_id": pa.array([2, 3], pa.int64()),
                  "s": pa.array([1.0, 0.1])})
    out = rrf_fuse([(rd.from_arrow(a), "s"), (rd.from_arrow(b), "s")],
                   k0=60, r=100, topk=3)
    got = dict(zip(out.column("doc_id").to_pylist(),
                   out.column("rrf").to_pylist()))
    want = {3: 1 / 61 + 1 / 62, 1: 1 / 62, 2: 1 / 63 + 1 / 61}
    assert got == want
    # order: rrf desc, id asc
    assert out.column("doc_id").to_pylist() == [3, 2, 1]


def test_rrf_fuse_r_cutoff_ties_and_table_input(ray_session):
    import pyarrow as pa
    from web_crawler_ray.stages.similarity import rrf_fuse
    # 5 docs all tied on score: ranks are id order; r=3 cuts 4 and 5
    t = pa.table({"doc_id": pa.array([5, 4, 3, 2, 1], pa.int64()),
                  "s": pa.array([1.0] * 5)})
    out = rrf_fuse([(t, "s")], r=3, topk=10)
    assert out.column("doc_id").to_pylist() == [1, 2, 3]
    assert out.column("rrf").to_pylist() == [1 / 61, 1 / 62, 1 / 63]


def test_quantize_embeddings_roundtrip_and_edges(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from web_crawler_ray.stages.similarity import quantize_embeddings
    rng = np.random.default_rng(47)
    vecs = rng.normal(0, 1, (30, 8)).astype(np.float32)
    vecs[7] = 0.0  # all-zero vector
    t = pa.table({"vec_id": pa.array(np.arange(30, dtype=np.int64)),
                  "embedding": pa.array([list(map(float, v))
                                         for v in vecs],
                                        pa.list_(pa.float32()))})
    out = quantize_embeddings(rd.from_arrow(t).repartition(3)) \
        .to_pandas().sort_values(["vec_id", "dim_idx"])
    q = out["q"].to_numpy().reshape(30, 8)
    ma = out["maxabs"].to_numpy().reshape(30, 8)[:, 0]
    assert np.abs(q).max() <= 127
    assert (q[7] == 0).all() and ma[7] == 0.0
    # dequantization error bound: |x - q*maxabs/127| <= maxabs/254
    deq = q * ma[:, None] / 127.0
    err = np.abs(deq - vecs.astype(np.float64))
    keep = np.arange(30) != 7
    assert (err[keep] <= ma[keep, None] / 254.0 + 1e-12).all()
    # the max-magnitude element quantizes to exactly +-127
    amax = np.abs(vecs[keep]).argmax(axis=1)
    rowmax = q[keep][np.arange(29), amax]
    assert (np.abs(rowmax) == 127).all()


def test_l2_normalize_unit_norm_and_zero_guard(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from web_crawler_ray.stages.similarity import l2_normalize
    vecs = [[3.0, 4.0], [0.0, 0.0], [1.0, 1.0]]
    t = pa.table({"vec_id": pa.array([1, 2, 3], pa.int64()),
                  "embedding": pa.array(vecs,
                                        pa.list_(pa.float32()))})
    out = l2_normalize(rd.from_arrow(t)).to_pandas() \
        .sort_values(["vec_id", "dim_idx"]).reset_index(drop=True)
    assert list(out["nval"][:2]) == [0.6, 0.8]
    assert list(out["nval"][2:4]) == [0.0, 0.0]  # zero vector
    v3 = out["nval"][4:6].to_numpy()
    assert abs((v3 * v3).sum() - 1.0) < 1e-12
    # batching invariance: 1 block vs 3 blocks, identical doubles
    out3 = l2_normalize(rd.from_arrow(t).repartition(3)).to_pandas() \
        .sort_values(["vec_id", "dim_idx"]).reset_index(drop=True)
    assert (out["nval"].to_numpy() == out3["nval"].to_numpy()).all()


def test_knn_label_accuracy_planted_blobs(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from web_crawler_ray.stages.similarity import knn_label_accuracy
    rng = np.random.default_rng(157)
    # two well-separated blobs: kNN must classify perfectly
    c0 = np.array([10.0, 0.0, 0.0, 0.0])
    c1 = np.array([0.0, 10.0, 0.0, 0.0])
    vecs, labels = [], []
    for i in range(40):
        c = c0 if i % 2 == 0 else c1
        vecs.append(c + rng.normal(0, 0.3, 4))
        labels.append(i % 2)
    t = pa.table({"vec_id": pa.array(range(40), pa.int64()),
                  "embedding": pa.array([list(map(float, v))
                                         for v in vecs],
                                        pa.list_(pa.float32())),
                  "label": pa.array(labels, pa.int64())})
    queries = {i: (np.asarray(vecs[i], np.float64), labels[i])
               for i in range(8)}
    out = knn_label_accuracy(rd.from_arrow(t).repartition(4),
                             queries, k=5)
    assert out.column("correct").to_pylist() == [1] * 8
    assert out.column("pred_label").to_pylist() == \
        out.column("true_label").to_pylist()


def test_knn_label_accuracy_vote_tiebreak(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from web_crawler_ray.stages.similarity import knn_label_accuracy
    # query at origin direction; 4 equidistant neighbors, labels 2/2:
    # the 2-2 vote tie must break to the SMALLEST label
    base = np.array([1.0, 0.0])
    vecs = [base, base, base, base, base]
    labels = [7, 7, 3, 3, 9]
    t = pa.table({"vec_id": pa.array(range(5), pa.int64()),
                  "embedding": pa.array([list(map(float, v))
                                         for v in vecs],
                                        pa.list_(pa.float32())),
                  "label": pa.array(labels, pa.int64())})
    queries = {0: (base.astype(np.float64), 7)}
    out = knn_label_accuracy(rd.from_arrow(t), queries, k=4)
    # neighbors of 0 (self excluded) = ids 1..4, labels 7,3,3,9:
    # votes {7:1, 3:2, 9:1} -> pred 3
    assert out.column("pred_label").to_pylist() == [3]
    assert out.column("correct").to_pylist() == [0]
