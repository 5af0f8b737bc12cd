"""BPE vocabulary induction (stages/aggregates.bpe_vocab) — pins the
semantics the SQL oracle relies on: greedy left-to-right non-overlapping
merge application (the 'aaa'/'ababa' overlap shapes), Sennrich-style
pair counting weighted by word frequency, the (count desc, left asc,
right asc) tie-break, invariance under re-sharding, and the
early-break when the vocabulary fully merges."""

from collections import Counter

import pyarrow as pa
import ray.data as rd

from web_crawler_ray.stages.aggregates import bpe_vocab


def _ref_bpe(word_counts: dict, n_merges: int):
    """Pure-Python reference: Sennrich et al. 2016 greedy BPE over a
    word-frequency table, left-to-right non-overlapping apply."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    steps = []
    for step in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (l, r), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        steps.append((step, l, r, l + r, cnt))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return steps


def _run(texts, n_merges, blocks=3):
    ds = rd.from_items([{"text": t} for t in texts],
                       override_num_blocks=blocks)
    t = bpe_vocab(ds, n_merges=n_merges)
    return list(zip(t.column("step").to_pylist(),
                    t.column("left_sym").to_pylist(),
                    t.column("right_sym").to_pylist(),
                    t.column("merged").to_pylist(),
                    t.column("pair_count").to_pylist()))


def test_overlap_aaa():
    # 'aaaa' has three (a,a) positions but greedy non-overlapping apply
    # yields [aa, aa]; 'aaa' yields [aa, a]. Pair counts BEFORE the
    # merge count every adjacency (3 in 'aaaa', 2 in 'aaa').
    got = _run(["aaaa aaa"], 2)
    ref = _ref_bpe({"aaaa": 1, "aaa": 1}, 2)
    assert got == ref
    # step 1 merges (a,a) with count 5; step 2 sees [aa,aa] + [aa,a]:
    # pairs (aa,aa)=1, (aa,a)=1 -> tie broken by right asc: (aa,a)
    assert got[0][:3] == (1, "a", "a") and got[0][4] == 5
    assert got[1][1:4] == ("aa", "a", "aaa")


def test_overlap_ababa():
    # '|a||b||a||b||a|' -> replace '|a||b|' twice (non-overlapping,
    # left-to-right) -> [ab, ab, a], NOT [ab, a, ba, ...].
    got = _run(["ababa"], 2)
    ref = _ref_bpe({"ababa": 1}, 2)
    assert got == ref
    assert got[0][1:4] == ("a", "b", "ab") and got[0][4] == 2
    # after merge: [ab, ab, a] -> pairs (ab,ab)=1, (ab,a)=1
    assert got[1][3] in ("abab", "aba")
    assert got[1] == ref[1]


def test_matches_reference_on_mixed_corpus():
    texts = ["the cat sat on the mat", "the cat ate the rat",
             "low lower lowest", "newer newest new",
             "banana bandana band", "it's the cat's mat"]
    wc: Counter = Counter()
    import re
    for t in texts:
        wc.update(re.findall(r"[a-z0-9']+", t.lower()))
    assert _run(texts, 12) == _ref_bpe(dict(wc), 12)


def test_reshard_invariance():
    texts = ["pack my box with five dozen liquor jugs"] * 7 + \
            ["sphinx of black quartz judge my vow"] * 3
    a = _run(texts, 8, blocks=1)
    b = _run(texts, 8, blocks=5)
    assert a == b and len(a) == 8


def test_early_break_when_fully_merged():
    # single 2-char word: one merge exhausts all pairs
    got = _run(["ab ab ab"], 10)
    assert got == [(1, "a", "b", "ab", 3)]


def test_bpe_encode_hand_traced(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from web_crawler_ray.stages.aggregates import bpe_encode
    # vocab: aa x3, ab x1, b x1 -> merge 1 = (a,a); after it
    # 'aa' -> 1 symbol, 'ab' -> 2, 'b' -> 1
    docs = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                     "text": pa.array(["aa aa ab", "aa b", ""])})
    out = bpe_encode(rd.from_arrow(docs).repartition(2), n_merges=1) \
        .to_pandas().set_index("doc_id").sort_index()
    assert (out.loc[1].n_words, out.loc[1].n_tokens) == (3, 4)
    assert (out.loc[2].n_words, out.loc[2].n_tokens) == (2, 2)
    assert (out.loc[3].n_words, out.loc[3].n_tokens) == (0, 0)


def test_bpe_encode_more_merges_never_increase_tokens(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from web_crawler_ray.stages.aggregates import bpe_encode
    docs = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                     "text": pa.array(["the cat sat on the mat",
                                       "the cat ate the rat",
                                       "low lower lowest",
                                       "banana bandana band"])})
    t2 = bpe_encode(rd.from_arrow(docs), n_merges=2).to_pandas() \
        .set_index("doc_id").sort_index()
    t8 = bpe_encode(rd.from_arrow(docs), n_merges=8).to_pandas() \
        .set_index("doc_id").sort_index()
    assert (t8.n_tokens <= t2.n_tokens).all()
    assert (t8.n_words == t2.n_words).all()
