"""F13: page classifier (page-classifier.service.js:15-151, tables verbatim).

Stateless ``map_batches`` stage producing page_type / page_confidence /
page_priority / strategy columns.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ..functions.domlite import parse

URL_PATTERNS = (
    (re.compile(r"/(locations?|offices?|branches?|stores?|centers?)[/?]", re.I), "locations", 0.95),
    (re.compile(r"/contact[-_]?us?[/?]", re.I), "contact", 0.90),
    (re.compile(r"/find[-_]?us[/?]", re.I), "locations", 0.85),
    (re.compile(r"/where[-_]?(we[-_]?are|to[-_]?find)[/?]", re.I), "locations", 0.85),
    (re.compile(r"/global[-_]?(offices?|footprint|presence|locations?)[/?]", re.I), "locations", 0.90),
    (re.compile(r"/worldwide[/?]", re.I), "locations", 0.85),
    (re.compile(r"/reach[-_]?us[/?]", re.I), "contact", 0.80),
    (re.compile(r"/about[-_]?(us|company)?[/?]", re.I), "about", 0.75),
    (re.compile(r"/company[/?]", re.I), "company", 0.75),
    (re.compile(r"/careers?/country[/?]", re.I), "locations", 0.70),
    (re.compile(r"/investors?[/?]", re.I), "investor", 0.60),
    (re.compile(r"/(map|store[-_]?locator)[/?]", re.I), "locations", 0.95),
)

CONTENT_KEYWORDS = {
    "locations": ["office", "location", "branch", "center", "store", "find us",
                  "where we are", "global footprint", "worldwide", "our presence"],
    "contact": ["contact us", "get in touch", "reach us", "contact information"],
    "about": ["about us", "who we are", "our company", "company profile"],
    "company": ["company", "organization", "enterprise"],
}

PRIORITIES = {"locations": 1, "contact": 1, "about": 2, "company": 2,
              "investor": 3, "general": 4}


def classify_by_url(url: str) -> tuple[str | None, float]:
    low = url.lower()
    for rx, typ, conf in URL_PATTERNS:
        if rx.search(low):
            return typ, conf
    return None, 0.0


def classify_by_content(html: str) -> tuple[str | None, float]:
    doc = parse(html)
    headings = " ".join(h.text().strip().lower()
                        for h in doc.by_tag("h1", "h2", "h3"))
    best, best_conf = None, 0.0
    for typ, words in CONTENT_KEYWORDS.items():
        n = sum(1 for w in words if w in headings)
        if n > 0:
            conf = min(0.60 + n * 0.10, 0.85)
            if conf > best_conf:
                best, best_conf = typ, conf
    return best, best_conf


def classify_page(url: str, html: str) -> dict:
    """page-classifier.service.js:15-31 — URL signal wins on type; confidence
    is the max of both signals."""
    ut, uc = classify_by_url(url)
    ct, cc = classify_by_content(html)
    typ = ut or ct or "general"
    return {"page_type": typ, "page_confidence": max(uc, cc),
            "page_priority": PRIORITIES.get(typ, 4)}


def extraction_strategy(page_type: str, confidence: float) -> str:
    """page-classifier:126-151 — which extractor families to run."""
    priority = PRIORITIES.get(page_type, 4)
    if priority == 1 and confidence >= 0.85:
        return "aggressive"   # json-ld, dom-blocks, heuristics, maps, xhr
    if priority <= 2 and confidence >= 0.70:
        return "medium"       # json-ld, dom-blocks, heuristics, maps
    return "conservative"     # json-ld, dom-blocks


def classify_batch(batch: pa.Table) -> pa.Table:
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    types, confs, prios, strats = [], [], [], []
    for u, h in zip(urls, htmls):
        c = classify_page(u, h or "")
        types.append(c["page_type"])
        confs.append(c["page_confidence"])
        prios.append(c["page_priority"])
        strats.append(extraction_strategy(c["page_type"], c["page_confidence"]))
    out = batch
    out = out.append_column("page_type", pa.array(types, pa.string()))
    out = out.append_column("page_confidence", pa.array(confs, pa.float32()))
    out = out.append_column("page_priority", pa.array(prios, pa.int8()))
    out = out.append_column("strategy", pa.array(strats, pa.string()))
    return out


def decision_tree_score(ds, tree, feature_fn, out_col: str = "score"):
    """Broadcast-model inference: score every row with a small
    decision tree — the model-scoring stage shape (quality
    classifiers, fastText-style filters) reduced to its exact
    skeleton: ``tree`` is a nested dict {feat, thr, lo, hi} with leaf
    dicts {leaf}; features are EXACT integers from ``feature_fn``
    (batch -> dict of int64 arrays), splits are integer compares
    (feature < thr), so the scored output is bit-exact against a
    nested-CASE SQL twin. The tree rides the task closure (one
    broadcast); scoring is a vectorized mask cascade per batch, NO
    shuffle."""
    import pyarrow as pa

    def kern(t: pa.Table) -> pa.Table:
        feats = feature_fn(t)
        n = t.num_rows
        out = np.zeros(n, np.int64)

        def walk(node, mask):
            if "leaf" in node:
                out[mask] = node["leaf"]
                return
            f = feats[node["feat"]]
            lo = mask & (f < node["thr"])
            walk(node["lo"], lo)
            walk(node["hi"], mask & ~lo)

        walk(tree, np.ones(n, bool))
        return t.append_column(out_col, pa.array(out))

    return ds.map_batches(kern, batch_format="pyarrow")
