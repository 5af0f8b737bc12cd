"""Unit semantics for the curation operators added in round 4 — PII
redaction, repetition stats, vocabulary top-k, frequency capping and
k-means — edge cases the registry-level DuckDB gate doesn't reach."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from web_crawler_ray.stages.aggregates import cap_per_group, vocab_topk
from web_crawler_ray.stages.clustering import kmeans_assign, kmeans_fit
from web_crawler_ray.stages.textstats import (pii_redact_batch,
                                              repetition_stats_batch)


# --- PII redaction -----------------------------------------------------------

def test_pii_redact_kernel():
    t = pa.table({"text": pa.array([
        "mail a@b.co and c.d+x@e-f.org now",   # two emails
        "call 555-1234 or 555-9999",           # two phones
        "no pii here",                          # none
        "x 555-12345 y",                        # 5 digits -> \b fails, no match? RE2 \b: '555-1234' then '5' -> boundary check
        None,
    ])})
    out = pii_redact_batch(t)
    n = out.column("n_pii").to_pylist()
    red = out.column("text_redacted").to_pylist()
    assert n[0] == 2 and red[0] == "mail <EMAIL> and <EMAIL> now"
    assert n[1] == 2 and red[1] == "call <PHONE> or <PHONE>"
    assert n[2] == 0 and red[2] == "no pii here"
    assert red[4] is None and n[4] is None  # nulls propagate, not crash


def test_pii_redact_word_boundary():
    # 555-12345: the trailing digit breaks the \b boundary -> NOT redacted
    t = pa.table({"text": pa.array(["a 555-12345 b", "a 555-1234 b"])})
    out = pii_redact_batch(t)
    assert out.column("n_pii").to_pylist() == [0, 1]


# --- repetition stats --------------------------------------------------------

def test_repetition_stats_edges():
    t = pa.table({"text": pa.array(["a a a a", "a b c d", "", None, "!!!"])})
    out = repetition_stats_batch(t)
    assert out.column("n_words").to_pylist() == [4, 4, 0, 0, 0]
    assert out.column("n_distinct").to_pylist() == [1, 4, 0, 0, 0]
    r = out.column("rep_ratio").to_pylist()
    assert r[0] == 0.75 and r[1] == 0.0 and r[2] == 0.0


# --- vocabulary top-k --------------------------------------------------------

def test_vocab_topk_counts_and_tiebreak(ray_session):
    docs = rd.from_pandas(pd.DataFrame({"text": [
        "b b b a a c", "a c b", "zz zz zz zz",
    ]})).repartition(3)  # force multi-batch partials to exercise the merge
    out = vocab_topk(docs, k=3).to_pandas()
    # counts: a=3 b=4 c=2 zz=4 -> top3 by (n desc, word asc): b(4), zz(4), a(3)
    assert list(out["word"]) == ["b", "zz", "a"]
    assert list(out["n"]) == [4, 4, 3]


# --- frequency capping -------------------------------------------------------

def test_cap_per_group_semantics(ray_session):
    df = pd.DataFrame({"k": ["x"] * 5 + ["y"] * 2,
                       "id": [5, 3, 1, 4, 2, 10, 11]})
    out = cap_per_group(rd.from_pandas(df).repartition(4), "k", "id", k=3) \
        .to_pandas().sort_values(["k", "id"]).reset_index(drop=True)
    # x: 3 smallest ids; y: fewer rows than k -> all kept
    assert list(out["id"]) == [1, 2, 3, 10, 11]
    # matches the SQL row_number() contract
    exp = (df.sort_values(["k", "id"]).groupby("k").head(3)
             .sort_values(["k", "id"]).reset_index(drop=True))
    assert out.equals(exp[["k", "id"]].reset_index(drop=True))


# --- weighted mixture sampling ------------------------------------------------

def test_weighted_sample_rates_and_determinism(ray_session):
    from web_crawler_ray.stages.aggregates import md5_low64, weighted_sample
    n = 2000
    df = pd.DataFrame({"id": np.arange(n),
                       "src": np.where(np.arange(n) % 2 == 0, "a", "b")})
    ds = rd.from_pandas(df).repartition(4)
    out = weighted_sample(ds, {"a": 100, "b": 0}, "src", "id").to_pandas()
    assert set(out["src"]) == {"a"} and len(out) == n // 2  # 100% vs 0%
    half = weighted_sample(ds, {"a": 50, "b": 50}, "src", "id").to_pandas()
    # membership is a pure function of the id -> exact expected set
    exp = {i for i in range(n) if md5_low64(str(i)) % 100 < 50}
    assert set(half["id"]) == exp
    # missing key defaults to dropped
    none = weighted_sample(ds, {"a": 80}, "src", "id").to_pandas()
    assert set(none["src"]) <= {"a"}


# --- k-means -----------------------------------------------------------------

def test_kmeans_recovers_planted_blobs(ray_session):
    rng = np.random.default_rng(11)
    k, per, dim = 3, 60, 8
    centers = np.array([[6.0] * dim, [-6.0] * dim,
                        [6.0] * (dim // 2) + [-6.0] * (dim // 2)])
    X = np.concatenate([centers[i] + rng.normal(0, 0.5, (per, dim))
                        for i in range(k)])
    labels = np.repeat(np.arange(k), per)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(k * per, dtype=np.int64)),
        "embedding": pa.array([list(map(float, r)) for r in X],
                              pa.list_(pa.float64())),
    })).repartition(4)
    cent = kmeans_fit(ds, k=k, iters=6)
    asg = kmeans_assign(ds, cent).to_pandas().sort_values("vec_id")
    # purity: every planted blob maps to ONE kmeans cluster
    df = pd.DataFrame({"lab": labels, "cl": asg["cluster"].to_numpy()})
    purity = df.groupby("lab")["cl"].agg(lambda s: s.value_counts().iloc[0]).sum()
    assert purity / len(df) >= 0.99
    # determinism: a second fit reproduces the centroids bit-for-bit
    cent2 = kmeans_fit(ds, k=k, iters=6)
    assert np.array_equal(cent, cent2)


def test_kmeans_empty_cluster_keeps_centroid(ray_session):
    # 2 points, k=2, but both nearest to one init -> the empty cluster
    # must keep its previous centroid (no NaN, no reseed)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array([0, 1], pa.int64()),
        "embedding": pa.array([[0.0, 0.0], [0.1, 0.0]], pa.list_(pa.float64())),
    }))
    cent = kmeans_fit(ds, k=2, iters=3)
    assert not np.isnan(cent).any()


# --- group centroids ---------------------------------------------------------

def test_group_centroids_matches_numpy():
    from web_crawler_ray.stages.aggregates import group_centroids
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 8)).astype(np.float32)
    labels = (np.arange(40) % 3).astype(np.int32)
    ds = rd.from_arrow(pa.table({
        "label": pa.array(labels, pa.int32()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32()))}))
    got = group_centroids(ds.repartition(5), key="label",
                          vec_col="embedding").to_pandas()
    got = got.sort_values(["label", "dim"]).reset_index(drop=True)
    for lbl in (0, 1, 2):
        want = np.round(vecs[labels == lbl].astype(np.float64).mean(axis=0), 6)
        have = got[got.label == lbl].sort_values("dim").centroid.to_numpy()
        assert np.allclose(have, want, atol=1e-6), lbl
    # dtype of the key column survives the partial-sum round-trip
    assert got.label.dtype == np.int32


# --- tf-idf ------------------------------------------------------------------

def test_tfidf_topk_tiny_corpus():
    from web_crawler_ray.stages.aggregates import tfidf_topk
    docs = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                     "text": pa.array(["apple apple banana",
                                       "banana cherry",
                                       ""])})
    out = tfidf_topk(rd.from_arrow(docs), k=2).to_pandas()
    # 'apple' df=1 tf=2 -> 2*ln(3); 'banana' df=2 -> ln(1.5); cherry df=1
    d1 = out[out.doc_id == 1].sort_values("score", ascending=False)
    assert list(d1.word) == ["apple", "banana"]
    assert abs(d1.score.iloc[0] - round(2 * np.log(3.0), 6)) < 1e-9
    d2 = out[out.doc_id == 2].sort_values("score", ascending=False)
    assert list(d2.word) == ["cherry", "banana"]
    assert (out.doc_id != 3).all()  # empty doc emits no rows


# --- duplicated n-grams ------------------------------------------------------

def test_duplicated_ngram_stats_planted():
    from web_crawler_ray.stages.textstats import duplicated_ngram_stats
    shared = "alpha beta gamma delta epsilon"          # one shared 5-gram
    docs = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                     "text": pa.array([
                         f"{shared} zeta",             # 2 positions, 1 dup
                         f"intro {shared}",            # 2 positions, 1 dup
                         "totally unrelated words here now",  # 1 pos, 0 dup
                         "tiny doc",                   # < 5 words -> 0 grams
                     ])})
    out = duplicated_ngram_stats(rd.from_arrow(docs).repartition(3), n=5) \
        .to_pandas().set_index("doc_id").sort_index()
    assert out.loc[1].n_grams == 2 and out.loc[1].n_dup == 1
    assert out.loc[2].n_grams == 2 and out.loc[2].n_dup == 1
    assert out.loc[1].dup_frac == 0.5
    assert out.loc[3].n_grams == 1 and out.loc[3].n_dup == 0
    assert out.loc[4].n_grams == 0 and out.loc[4].dup_frac == 0.0


def test_remove_dup_ngrams_planted():
    from web_crawler_ray.stages.textstats import remove_dup_ngrams
    shared = "alpha beta gamma delta epsilon"          # one shared 5-gram
    docs = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                     "text": pa.array([
                         f"{shared} zeta",             # dup covers words 0-4
                         f"intro {shared}",            # dup covers words 1-5
                         "totally unrelated words here now",
                         "tiny doc",                   # < 5 words, untouched
                     ])})
    out = remove_dup_ngrams(rd.from_arrow(docs).repartition(3), n=5) \
        .to_pandas().set_index("doc_id").sort_index()
    assert out.loc[1].clean_text == "zeta" and out.loc[1].n_removed == 5
    assert out.loc[2].clean_text == "intro" and out.loc[2].n_removed == 5
    assert out.loc[1].n_words == 6 and out.loc[2].n_words == 6
    # unique doc and short doc pass through whole (lowercased/re-joined)
    assert out.loc[3].clean_text == "totally unrelated words here now"
    assert out.loc[3].n_removed == 0
    assert out.loc[4].clean_text == "tiny doc" and out.loc[4].n_removed == 0


def test_remove_dup_ngrams_overlap_and_in_doc_repeat():
    from web_crawler_ray.stages.textstats import remove_dup_ngrams
    # doc 1: the shared 5-gram occurs at two OVERLAPPING positions via a
    # 6-word palindrome-ish run; coverage must union, not double-count
    docs = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                     "text": pa.array([
                         "a b c d e a b c d e tail",  # shared gram twice
                         "head a b c d e",
                         # in-doc-only repetition: appears twice here but in
                         # no other doc -> NOT corpus-duplicated, kept whole
                         "x y z w v x y z w v",
                     ])})
    out = remove_dup_ngrams(rd.from_arrow(docs).repartition(2), n=5) \
        .to_pandas().set_index("doc_id").sort_index()
    # 'a b c d e' is in docs 1 and 2 -> all its word positions cut
    assert out.loc[1].clean_text == "tail" and out.loc[1].n_removed == 10
    assert out.loc[2].clean_text == "head" and out.loc[2].n_removed == 5
    assert out.loc[3].clean_text == "x y z w v x y z w v"
    assert out.loc[3].n_removed == 0


def test_dedup_segments_keep_first():
    from web_crawler_ray.stages.textstats import dedup_segments
    seg = "a b c"                      # one full segment at w=3
    docs = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                     "text": pa.array([
                         f"{seg} x y z",       # segs: 'a b c', 'x y z'
                         f"{seg} q",           # segs: 'a b c', 'q' (partial)
                         "q r",                # one partial seg 'q r'
                         "",                   # zero segs
                     ])})
    out = dedup_segments(rd.from_arrow(docs).repartition(3), w=3) \
        .to_pandas().set_index("doc_id").sort_index()
    # doc 1 owns the first occurrence of 'a b c' -> kept whole
    assert out.loc[1].clean_text == "a b c x y z"
    assert out.loc[1].n_segs == 2 and out.loc[1].n_removed == 0
    # doc 2's copy is cut; its partial tail 'q' survives (distinct from
    # doc 3's 'q r' -- different segment strings)
    assert out.loc[2].clean_text == "q"
    assert out.loc[2].n_segs == 2 and out.loc[2].n_removed == 1
    assert out.loc[3].clean_text == "q r" and out.loc[3].n_removed == 0
    assert out.loc[4].clean_text == "" and out.loc[4].n_segs == 0


def test_dedup_segments_in_doc_repeat_and_order():
    from web_crawler_ray.stages.textstats import dedup_segments
    # in-doc repeat: the SECOND copy inside the same doc is also a later
    # occurrence (seg 1 > seg 0) and must be cut; keep-first is global
    docs = pa.table({"doc_id": pa.array([7, 9], pa.int64()),
                     "text": pa.array([
                         "m n o m n o tail words here",  # 'm n o' twice + partial
                         "m n o other stuff",
                     ])})
    out = dedup_segments(rd.from_arrow(docs).repartition(2), w=3) \
        .to_pandas().set_index("doc_id").sort_index()
    assert out.loc[7].clean_text == "m n o tail words here"
    assert out.loc[7].n_segs == 3 and out.loc[7].n_removed == 1
    assert out.loc[9].clean_text == "other stuff"
    assert out.loc[9].n_removed == 1


def test_pmi_pairs_hand_computed():
    import math
    from web_crawler_ray.stages.aggregates import pmi_pairs
    # 2 docs, window=1 (adjacent ordered bigrams), min_count=2:
    # tokens: doc1 = [a b a b], doc2 = [a b c]  -> N = 7
    # pair events (x,y): (a,b)x3, (b,a)x1, (b,c)x1 -> T = 5
    # only (a,b) survives min_count=2; c_a=3, c_b=3
    docs = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                     "text": pa.array(["a b a b", "a b c"])})
    out = pmi_pairs(rd.from_arrow(docs).repartition(2),
                    window=1, min_count=2).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.x, r.y, r.n) == ("a", "b", 3)
    want = round(math.log((3 / 5) * (7 * 7) / (3 * 3)), 6)
    assert abs(r.pmi - want) < 1e-12


def test_pmi_pairs_window_reaches_past_neighbors():
    from web_crawler_ray.stages.aggregates import pmi_pairs
    # 'a ? b' pairs only exist at distance 2 -> window=1 finds nothing,
    # window=2 counts them
    docs = pa.table({"doc_id": pa.array([1], pa.int64()),
                     "text": pa.array(["a x b a y b a z b"])})
    w1 = pmi_pairs(rd.from_arrow(docs), window=1, min_count=3).to_pandas()
    # every adjacent bigram occurs once -> nothing survives min_count=3
    assert w1.empty
    w2 = pmi_pairs(rd.from_arrow(docs), window=2, min_count=3).to_pandas()
    ab = w2[(w2.x == "a") & (w2.y == "b")]
    assert len(ab) == 1 and ab.iloc[0].n == 3


def test_dsir_logweights_ranks_target_like_docs():
    from web_crawler_ray.stages.textstats import dsir_logweights
    # target distribution is all-'code'; doc 1 is target-like, doc 2 isn't
    raw = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                    "text": pa.array(["code code code code",
                                      "llama llama llama llama"])})
    tgt = pa.table({"text": pa.array(["code code code", "code code"])})
    out = dsir_logweights(rd.from_arrow(raw).repartition(2),
                          rd.from_arrow(tgt)).to_pandas() \
        .set_index("doc_id").sort_index()
    assert out.loc[1].logw > 0 > out.loc[2].logw
    assert out.loc[1].n_feats == 7  # 4 unigrams + 3 bigrams


def test_dsir_logweights_partitioning_invariant():
    # regression: the driver count merge must np.add.at — iter_batches
    # coalesces partial tables, so bucket ids repeat within one batch and
    # a buffered fancy-index += silently drops duplicates
    from web_crawler_ray.stages.textstats import dsir_logweights
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, 30)) for _ in range(60)]
    raw = pa.table({"doc_id": pa.array(range(60), pa.int64()),
                    "text": pa.array(texts)})
    tgt = pa.table({"text": pa.array(texts[:20])})
    a = dsir_logweights(rd.from_arrow(raw).repartition(1),
                        rd.from_arrow(tgt).repartition(1)).to_pandas() \
        .set_index("doc_id").sort_index()
    b = dsir_logweights(rd.from_arrow(raw).repartition(16),
                        rd.from_arrow(tgt).repartition(13)).to_pandas() \
        .set_index("doc_id").sort_index()
    assert (a.logw == b.logw).all() and (a.n_feats == b.n_feats).all()


def test_winnow_fingerprints_matches_naive():
    from web_crawler_ray.stages.aggregates import md5_low64
    from web_crawler_ray.stages.textstats import winnow_fingerprints
    rng = np.random.default_rng(3)
    texts = ["".join(rng.choice(list("abcd "), 40)) for _ in range(10)]
    texts += ["abc", ""]  # shorter than k -> no rows
    k, w = 5, 3
    docs = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts)})
    out = winnow_fingerprints(rd.from_arrow(docs).repartition(3),
                              k=k, w=w).to_pandas()
    # naive reference: enumerate every window, take rightmost min
    want = set()
    for did, s in enumerate(texts):
        s = s.lower()
        h = [md5_low64(s[i:i + k]) for i in range(len(s) - k + 1)]
        if not h:
            continue
        width = min(w, len(h))
        for st in range(len(h) - width + 1):
            win = h[st:st + width]
            m = min(win)
            p = st + max(i for i, v in enumerate(win) if v == m)
            want.add((did, p, h[p]))
    got = set(zip(out.doc_id, out.pos, out.fp))
    assert got == want and not (out.doc_id >= 10).any()


def test_winnow_shared_substring_guarantee():
    from web_crawler_ray.stages.textstats import winnow_fingerprints
    # winnowing guarantee: a shared substring of length >= k + w - 1
    # (here 8 + 4 - 1 = 11) produces at least one shared fingerprint
    shared = "the same eleven-plus character run appears here"
    docs = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                     "text": pa.array([f"prefix junk {shared}",
                                       f"{shared} totally other tail"])})
    out = winnow_fingerprints(rd.from_arrow(docs), k=8, w=4).to_pandas()
    f1 = set(out[out.doc_id == 1].fp)
    f2 = set(out[out.doc_id == 2].fp)
    assert f1 & f2


# --- text normalization ------------------------------------------------------

def test_normalize_text_batch():
    from web_crawler_ray.stages.textstats import normalize_text_batch
    t = pa.table({"text": pa.array(
        ["  Hello\t\tWORLD \n", "a  b\r\nc", "", None])})
    out = normalize_text_batch(t).column("text_norm").to_pylist()
    assert out == ["hello world", "a b c", "", None]


# --- fixed-size uniform / stratified sampling ---------------------------------

def test_sample_uniform_k_matches_bruteforce(ray_session):
    from web_crawler_ray.stages.aggregates import md5_low64, sample_uniform_k
    n = 500
    df = pd.DataFrame({"id": np.arange(n), "v": np.arange(n) * 2})
    out = sample_uniform_k(rd.from_pandas(df).repartition(7), "id", k=40) \
        .to_pandas().sort_values("id").reset_index(drop=True)
    # brute force: 40 smallest md5 hashes
    h = np.array([md5_low64(str(i)) for i in df["id"]], dtype=np.uint64)
    exp = df.iloc[np.argsort(h, kind="stable")[:40]] \
        .sort_values("id").reset_index(drop=True)
    assert out.equals(exp)
    # re-sharding draws the identical sample
    out2 = sample_uniform_k(rd.from_pandas(df).repartition(2), "id", k=40) \
        .to_pandas().sort_values("id").reset_index(drop=True)
    assert out2.equals(out)


def test_sample_uniform_k_small_input(ray_session):
    from web_crawler_ray.stages.aggregates import sample_uniform_k
    df = pd.DataFrame({"id": [1, 2, 3]})
    out = sample_uniform_k(rd.from_pandas(df).repartition(2), "id", k=10) \
        .to_pandas()
    assert sorted(out["id"]) == [1, 2, 3]  # k > n keeps everything


def test_stratified_sample_k_per_group(ray_session):
    from web_crawler_ray.stages.aggregates import (md5_low64,
                                                   stratified_sample_k)
    n = 600
    df = pd.DataFrame({"id": np.arange(n),
                       "g": np.where(np.arange(n) % 3 == 0, "a",
                                     np.where(np.arange(n) % 3 == 1, "b",
                                              "c"))})
    out = stratified_sample_k(rd.from_pandas(df).repartition(5),
                              "g", "id", k=25) \
        .to_pandas().sort_values(["g", "id"]).reset_index(drop=True)
    # brute force per group
    df2 = df.copy()
    df2["h"] = [md5_low64(str(i)) for i in df2["id"]]
    exp = (df2.sort_values(["g", "h", "id"]).groupby("g").head(25)
              .sort_values(["g", "id"]).reset_index(drop=True))[["id", "g"]]
    assert out[["id", "g"]].equals(exp)
    assert (out.groupby("g").size() == 25).all()
    # partitioning-independence
    out2 = stratified_sample_k(rd.from_pandas(df).repartition(1),
                               "g", "id", k=25) \
        .to_pandas().sort_values(["g", "id"]).reset_index(drop=True)
    assert out2[["id", "g"]].equals(exp)


# --- BM25 ----------------------------------------------------------------------

def test_bm25_matches_bruteforce(ray_session):
    import math
    from collections import Counter

    from web_crawler_ray.stages.aggregates import bm25_score
    from web_crawler_ray.stages.textstats import _SHINGLE_WORD_RE

    docs = ["the hash join is a hash hash thing",
            "filter pushdown beats a late filter",
            "nothing relevant here at all",
            "",
            "join join join join join",
            "hash filter join"]
    df_in = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    q = ["hash", "join", "filter"]
    out = bm25_score(rd.from_pandas(df_in).repartition(3), q) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)

    # brute force
    toks = [_SHINGLE_WORD_RE.findall(t.lower()) for t in docs]
    n = len(docs)
    avgdl = sum(len(ts) for ts in toks) / n
    df_t = {w: sum(1 for ts in toks if w in ts) for w in q}
    idf = {w: math.log((n - d + 0.5) / (d + 0.5) + 1.0)
           for w, d in df_t.items()}
    k1, b = 1.2, 0.75
    exp = []
    for ts in toks:
        c = Counter(w for w in ts if w in idf)
        norm = k1 * (1.0 - b + b * len(ts) / avgdl) if ts else 0.0
        exp.append(round(sum(idf[w] * (c[w] * (k1 + 1.0)) / (c[w] + norm)
                             for w in sorted(c)), 6))
    assert list(out["bm25"]) == exp
    # no-match and empty docs score exactly 0
    assert out.loc[2, "bm25"] == 0.0 and out.loc[3, "bm25"] == 0.0
    # tf saturation: 5x join scores higher than 1x but far below 5x
    one_join = idf["join"] * (k1 + 1.0) / \
        (1.0 + k1 * (1.0 - b + b * 3 / avgdl))
    assert out.loc[4, "bm25"] > one_join
    assert out.loc[4, "bm25"] < 5 * one_join


def test_bm25_partitioning_independent(ray_session):
    from web_crawler_ray.stages.aggregates import bm25_score
    docs = [f"word{i % 7} hash join extra text {i}" for i in range(120)]
    df_in = pd.DataFrame({"doc_id": range(120), "text": docs})
    a = bm25_score(rd.from_pandas(df_in).repartition(8), ["hash", "join"]) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    c = bm25_score(rd.from_pandas(df_in).repartition(1), ["hash", "join"]) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(c)


# --- per-group quantile gating ---------------------------------------------

def test_filter_by_group_quantile(ray_session):
    from web_crawler_ray.stages.aggregates import filter_by_group_quantile
    import math
    rng = np.random.default_rng(7)
    df = pd.DataFrame({"id": np.arange(300),
                       "g": rng.choice(["a", "b", "c"], 300),
                       "v": rng.integers(0, 1000, 300)})
    out = filter_by_group_quantile(
        rd.from_pandas(df).repartition(5), "g", "v", 0.25) \
        .to_pandas().sort_values("id").reset_index(drop=True)

    # brute force with quantile_disc semantics: sorted[ceil(q*n)-1]
    def qdisc(vals, q):
        s = np.sort(vals)
        return s[min(max(math.ceil(q * len(s)) - 1, 0), len(s) - 1)]

    thr = {g: qdisc(sub["v"].to_numpy(), 0.25)
           for g, sub in df.groupby("g")}
    exp = df[df.apply(lambda r: r["v"] >= thr[r["g"]], axis=1)] \
        .sort_values("id").reset_index(drop=True)
    assert out.equals(exp)
    # keep="lt" is the exact complement
    lo = filter_by_group_quantile(
        rd.from_pandas(df).repartition(5), "g", "v", 0.25, keep="lt") \
        .to_pandas()
    assert len(lo) + len(out) == len(df)
    assert set(lo["id"]).isdisjoint(set(out["id"]))


def test_winsorize_by_group(ray_session):
    from web_crawler_ray.stages.aggregates import winsorize_by_group
    import math
    rng = np.random.default_rng(11)
    df = pd.DataFrame({"id": np.arange(400),
                       "g": rng.choice(["a", "b"], 400),
                       "v": rng.normal(0, 10, 400)})
    out = winsorize_by_group(
        rd.from_pandas(df).repartition(5), "g", "v", "id", 0.05, 0.95) \
        .to_pandas().sort_values("id").reset_index(drop=True)

    def qdisc(vals, q):
        s = np.sort(vals)
        return s[min(max(math.ceil(q * len(s)) - 1, 0), len(s) - 1)]

    for g, sub in df.groupby("g"):
        lo, hi = qdisc(sub["v"].to_numpy(), 0.05), qdisc(sub["v"].to_numpy(), 0.95)
        got = out[out["g"] == g].set_index("id")["v_clip"]
        exp = sub.set_index("id")["v"].clip(lo, hi)
        assert np.array_equal(got.sort_index().to_numpy(),
                              exp.sort_index().to_numpy())
    # clipped values are actual group values at the edges; interior
    # rows pass through bit-identical
    assert len(out) == len(df)


def test_mad_outliers_bruteforce(ray_session):
    from web_crawler_ray.stages.aggregates import mad_outliers
    import math
    rng = np.random.default_rng(3)
    v = rng.normal(0, 1, 300)
    v[:6] += 40.0  # planted outliers
    df = pd.DataFrame({"id": np.arange(300),
                       "g": ["a"] * 150 + ["b"] * 150, "v": v})
    out = mad_outliers(rd.from_pandas(df).repartition(4),
                       "g", "v", "id", k=3.0).to_pandas()

    def qdisc(vals, q):
        s = np.sort(vals)
        return s[min(max(math.ceil(q * len(s)) - 1, 0), len(s) - 1)]

    exp_ids = []
    for g, sub in df.groupby("g"):
        med = qdisc(sub["v"].to_numpy(), 0.5)
        ad = np.abs(sub["v"].to_numpy() - med)
        mad = qdisc(ad, 0.5)
        exp_ids.extend(sub["id"].to_numpy()[ad > 3.0 * mad].tolist())
    assert sorted(out["id"].tolist()) == sorted(exp_ids)
    assert set(np.arange(6)).issubset(set(out["id"]))  # planted found


def test_percent_rank_ties_and_singleton(ray_session):
    from web_crawler_ray.stages.windows import percent_rank_per_group
    df = pd.DataFrame({"id": [1, 2, 3, 4, 5, 6],
                       "g": ["a", "a", "a", "a", "a", "b"],
                       "v": [10.0, 20.0, 20.0, 30.0, 40.0, 7.0]})
    out = percent_rank_per_group(rd.from_pandas(df), "g", "v", "id") \
        .to_pandas().set_index("id")["pr"]
    # ranks (min): 10->1, 20->2, 20->2, 30->4, 40->5; n-1 = 4
    assert out[1] == 0.0 and out[2] == 0.25 and out[3] == 0.25
    assert out[4] == 0.75 and out[5] == 1.0
    assert out[6] == 0.0  # singleton group -> 0.0 (DuckDB convention)
