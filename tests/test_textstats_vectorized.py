"""Round-5 vectorized text kernels (_ascii_profile): pins hash-identity
of the numpy fast path against the original scalar kernels for
quality_batch / LangIdStage / curation_filter_batch / text_stats_batch,
including the scalar fallback on non-ASCII docs, the Python-\\s ASCII
whitespace class (incl. \\x1c-\\x1f), packed-stopword membership for
words longer than 8 bytes, and the tenths/10.0 == round(float-sum, 2)
score mapping for all 16 increment combos."""

import itertools

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from web_crawler_ray.stages.textstats import (
    _BPE_ISH,
    _PUNCT_RE,
    _WORD_RE,
    _WS_SPLIT,
    EN_STOP,
    LangIdStage,
    _ascii_profile,
    curation_filter_batch,
    doc_quality_score,
    quality_batch,
    text_stats_batch,
)

EDGE_TEXTS = [
    None, "", " ", "\t\n\v\f\r", "\x1c\x1d\x1e\x1f",  # Python-\s edge bytes
    "the cat sat on the mat and it was good for all of us at the inn",
    "der die das und ist nicht mit ein eine zu den von",
    "le la les et est un une des du de que pour dans",
    "el la los las y es un una de que en por con para",
    "für das ist nicht gut",            # non-ASCII word in a de sentence
    "naïve café résumé",                # non-ASCII chars -> fallback path
    "it's the cat's mat, isn't it?",    # apostrophes inside words
    "!!!???...,,,;;;:::",               # all punctuation
    "UPPER lower MiXeD 123 456",
    "a" * 9 + " " + "b" * 200,          # words longer than the 8-byte pack
    "supercalifragilistic the and of to a in is it that",
    "x",  # single char
    "word\x00word",                     # NUL: non-space non-word symbol
    "tab\tsep\nlines\rhere",
    "50 chars or so to cross the length band " + "z" * 20,
    "the " * 5000,                      # long doc, many stopwords
]


def _batch(texts):
    return pa.table({"text": pa.array(texts, pa.string()),
                     "i": pa.array(range(len(texts)), pa.int64())})


def _scalar_stats(t):
    t = t or ""
    toks = _WS_SPLIT.split(t.strip()) if t.strip() else []
    words = _WORD_RE.findall(t.lower())
    return (len(t), len(_PUNCT_RE.findall(t)),
            sum(1 for c in t if c.isupper()), len(toks),
            len(_BPE_ISH.findall(t)),
            sum(1 for w in words if w in EN_STOP))


def test_text_stats_batch_matches_scalar():
    out = text_stats_batch(_batch(EDGE_TEXTS))
    for i, t in enumerate(EDGE_TEXTS):
        n, p, u, tok, bpe, stop = _scalar_stats(t)
        assert out.column("n_tokens")[i].as_py() == tok, (i, t)
        assert out.column("n_punct")[i].as_py() == p, (i, t)
        assert out.column("n_bpe_tokens")[i].as_py() == bpe, (i, t)
        assert out.column("n_stopwords")[i].as_py() == stop, (i, t)
        exp_pr = (p / max(n, 1)) if n > 0 else 0.0
        assert out.column("punct_ratio")[i].as_py() == exp_pr
        exp_ur = (u / max(n, 1)) if n > 0 else 0.0
        assert out.column("upper_ratio")[i].as_py() == exp_ur


def test_quality_batch_matches_scalar():
    out = quality_batch(_batch(EDGE_TEXTS))
    got = out.column("doc_quality").to_pylist()
    exp = [doc_quality_score(t) for t in EDGE_TEXTS]
    assert got == exp


def test_langid_matches_scalar():
    stage = LangIdStage()
    out = stage(_batch(EDGE_TEXTS))
    got = out.column("lang_guess").to_pylist()
    exp = [stage.guess(t) for t in EDGE_TEXTS]
    assert got == exp


def test_curation_filter_matches_composition():
    stage = LangIdStage()
    out = curation_filter_batch(_batch(EDGE_TEXTS), min_quality=0.5)
    kept = set(out.column("i").to_pylist())
    exp = {i for i, t in enumerate(EDGE_TEXTS)
           if stage.guess(t) == "en" and doc_quality_score(t) >= 0.5}
    assert kept == exp


def test_score_mapping_bit_exact():
    # tenths/10.0 must equal round(sum of 0.3/0.3/0.2/0.2 floats, 2)
    for combo in itertools.product([0, 1], repeat=4):
        s = 0.0
        for f, inc in zip(combo, (0.3, 0.3, 0.2, 0.2)):
            if f:
                s += inc
        tenths = 3 * combo[0] + 3 * combo[1] + 2 * combo[2] + 2 * combo[3]
        assert round(s, 2) == tenths / 10.0


@settings(max_examples=200, deadline=None)
@given(st.lists(st.one_of(
    st.none(),
    st.text(alphabet=st.characters(min_codepoint=0, max_codepoint=127),
            max_size=120),
    st.text(max_size=60)), min_size=1, max_size=20))
def test_property_parity(texts):
    b = _batch(texts)
    stage = LangIdStage()
    assert (quality_batch(b).column("doc_quality").to_pylist()
            == [doc_quality_score(t) for t in texts])
    assert (stage(b).column("lang_guess").to_pylist()
            == [stage.guess(t) for t in texts])
    for i, t in enumerate(texts):
        n, p, u, tok, bpe, stop = _scalar_stats(t)
        out = text_stats_batch(b)
        assert out.column("n_tokens")[i].as_py() == tok
        assert out.column("n_punct")[i].as_py() == p
        assert out.column("n_bpe_tokens")[i].as_py() == bpe
        assert out.column("n_stopwords")[i].as_py() == stop


def test_profile_ascii_flag():
    prof = _ascii_profile(["plain ascii", "naïve", None, ""])
    assert prof["ascii_ok"].tolist() == [True, False, True, True]
    assert prof["n_chars"].tolist()[0] == len("plain ascii")
    assert int(np.sum(prof["stops"])) >= 0
