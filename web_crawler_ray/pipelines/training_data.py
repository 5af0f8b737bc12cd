"""Composed training-data curation pipeline over a documents table.

The 100 TB shape: every stage is a streaming ``map_batches`` except the
two keyed shuffles (exact-dedup groupby on the uniform text hash;
MinHash band groupby), in this order so the cheapest filters run first
and each shuffle sees the smallest possible input:

    read (column-pruned)
      -> lang + quality filter  (ONE fused map_batches stage — the two
                                 heuristics share each doc's tokenization;
                                 stopword sets are ~17-word frozensets,
                                 far below actor-pool-worthy state)
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

    Driver memory is O(candidate pairs) only: the exact-deduped corpus
    stays in the object store (materialized once, reused for candidate
    generation, distributed Jaccard verification, and the final
    anti-join); union-find runs on the (tiny) verified-pair set.
    """
    # fused lang+quality filter: one tokenization pass per doc instead of
    # two per-stage to_pylist round-trips (semantics == the composed
    # LangIdStage.guess + doc_quality_score filters, pinned in tests)
    filtered = ds.map_batches(
        lambda t: T.curation_filter_batch(t, lang=lang,
                                          min_quality=min_quality),
        batch_format="pyarrow")
    # pinned once in the object store: consumed by 3 downstream passes
    exact = D.exact_dedup(filtered, id_col="doc_id", text_col="text").materialize()

    # near-dup: LSH candidates over the exact-deduped survivors, Jaccard
    # verified INSIDE map_batches/map_groups (stages/dedup.py
    # verify_jaccard_pairs); only (id_a, id_b, jaccard) rows reach the
    # driver. Keep the min doc_id per verified connected component.
    pairs = D.minhash_candidate_pairs_df(exact, id_col="doc_id",
                                         text_col="text")
    verified = D.verify_jaccard_pairs(exact, pairs)
    dropped = D.union_find_drop_set(verified[verified["jaccard"] >= jaccard_tau])

    curated = D.drop_ids(exact, dropped, id_col="doc_id")
    curated = curated.map_batches(lambda t: T.text_stats_batch(t),
                                  batch_format="pyarrow")
    return {"dataset": curated, "dropped_near_dups": dropped}
