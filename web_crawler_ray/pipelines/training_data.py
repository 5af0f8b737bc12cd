"""Composed training-data curation pipeline over a documents table.

The 100 TB shape: every stage is a streaming ``map_batches`` except the
two keyed shuffles (exact-dedup groupby on the uniform text hash;
MinHash band groupby), in this order so the cheapest filters run first
and each shuffle sees the smallest possible input:

    read (column-pruned)
      -> language filter        (map_batches, actor pool: stopword sets)
      -> quality filter         (map_batches, vectorized heuristics)
      -> exact dedup            (hash groupby — uniform key, no skew)
      -> near-dup removal       (MinHash/LSH candidates + Jaccard verify;
                                 keep min doc_id per verified cluster)
      -> token accounting       (map_batches)
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..stages import dedup as D
from ..stages import textstats as T


def curate(ds: rd.Dataset, min_quality: float = 0.5, lang: str = "en",
           jaccard_tau: float = 0.8) -> dict:
    """Returns dict(dataset=curated Dataset, dropped_near_dups=set).

    The near-dup phase needs the candidate-pair set globally (a barrier
    by nature); everything else streams.
    """
    lid = T.LangIdStage()

    def lang_filter(t: pa.Table) -> pa.Table:
        mask = [lid.guess(x) == lang for x in t.column("text").to_pylist()]
        return t.filter(pa.array(mask))

    def quality_filter(t: pa.Table) -> pa.Table:
        mask = [T.doc_quality_score(x) >= min_quality
                for x in t.column("text").to_pylist()]
        return t.filter(pa.array(mask))

    filtered = (ds.map_batches(lang_filter, batch_format="pyarrow")
                  .map_batches(quality_filter, batch_format="pyarrow"))
    exact = D.exact_dedup(filtered, id_col="doc_id", text_col="text")

    # near-dup: LSH candidates over the exact-deduped survivors,
    # Jaccard-verified, keep the min doc_id per connected component
    pairs = D.minhash_candidate_pairs(exact, id_col="doc_id",
                                      text_col="text").to_pandas()
    texts_df = exact.select_columns(["doc_id", "text"]).to_pandas()
    texts = dict(zip(texts_df["doc_id"], texts_df["text"]))
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    dropped: set[int] = set()
    for r in pairs.itertuples():
        a, b = int(r.id_a), int(r.id_b)
        if a in texts and b in texts and \
                D.jaccard(texts[a], texts[b]) >= jaccard_tau:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    for i in texts:
        if find(i) != i:
            dropped.add(i)

    keep = frozenset(texts) - frozenset(dropped)

    def drop_near(t: pa.Table) -> pa.Table:
        mask = [int(i) in keep for i in t.column("doc_id").to_pylist()]
        return t.filter(pa.array(mask))

    curated = exact.map_batches(drop_near, batch_format="pyarrow")
    curated = curated.map_batches(lambda t: T.text_stats_batch(t),
                                  batch_format="pyarrow")
    return {"dataset": curated, "dropped_near_dups": dropped}
