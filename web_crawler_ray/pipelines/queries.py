"""Query layer for the driver harness: one entry per implemented operator
family (SURVEY §2.6-§2.8 + training-data ops), each with a DuckDB oracle
where SQL-expressible.

Determinism rules for oracle parity (driver hashes values after sorting
columns by name):
- every aggregate/computed column is explicitly named identically in
  the Ray code and the SQL;
- float sums are only taken over integral-valued doubles (exact in
  IEEE); ratios are single divisions of integers (bit-identical);
- cosine scores are computed in float64 on both sides and rounded to 4
  decimals; top-k results carry deterministic tie-breaks (score desc,
  id asc).

Relational wrappers map to the reference UI's client-side query ops
(CustomDataGrid.jsx filter/sort/paginate/distinct) and the backend
aggregations (SURVEY §2.7).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from ..stages import dedup as D
from ..stages import similarity as S
from ..stages import textstats as T


def _rp(sf_dir: str, name: str, **kw) -> rd.Dataset:
    from ..sources.storage import read_parquet_clean
    return read_parquet_clean(f"{sf_dir}/{name}.parquet", **kw)


# ---------------------------------------------------------------------------
# Relational ops (P1/O1-O4/A1/A3/A6/A7 analogs on the driver tables)
# ---------------------------------------------------------------------------

def q_filter_events(sf_dir: str):
    """P1-style row filter, vectorized in map_batches (column-pruned read)."""
    ds = _rp(sf_dir, "events", columns=["event_id", "event_type", "value"])
    return ds.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("value"), 0.7)),
        batch_format="pyarrow")


def q_groupby_count_lang(sf_dir: str):
    """A3 extraction-stats analog: count per group."""
    ds = _rp(sf_dir, "documents", columns=["lang"])
    return ds.groupby("lang").aggregate(Count(alias_name="n_docs"))


def q_distinct_sources(sf_dir: str):
    """A7 distinct values (UI filter dropdowns)."""
    ds = _rp(sf_dir, "documents", columns=["source"])
    return ds.groupby("source").aggregate(Count(alias_name="n")).drop_columns(["n"])


def q_topk_orders(sf_dir: str):
    """O2 top-k: sort desc + limit with deterministic tie-break."""
    ds = _rp(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)


def q_sort_paginate_events(sf_dir: str):
    """O3/O4 sort + offset/limit pagination (split_at_indices on the sorted set)."""
    ds = _rp(sf_dir, "events", columns=["event_id", "ts"])
    ds = ds.sort(["ts", "event_id"])
    _, rest = ds.split_at_indices([100])
    return rest.limit(50)


def q_lineitem_summary(sf_dir: str):
    """A1/A6-style grouped summary (TPC-H Q1 shape). sum_qty is exact
    (integral doubles); price extrema avoid float-sum order sensitivity.
    Map-side partial aggregation (grouped_agg_combine): the Ray merge
    shuffle sees O(blocks × groups) rows, never the table."""
    from ..stages.aggregates import grouped_agg_combine
    ds = _rp(sf_dir, "lineitem",
             columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"])
    return grouped_agg_combine(
        ds, ["l_returnflag", "l_linestatus"],
        [("l_quantity", "sum", "sum_qty"),
         (None, "count", "n_rows"),
         ("l_extendedprice", "max", "max_price"),
         ("l_extendedprice", "min", "min_price")],
        driver_merge=True)  # 6 groups: partial stream is O(blocks × 6)


def q_join_orders_customers(sf_dir: str):
    """Broadcast hash join (small side via ray.put) + grouped count —
    the documented no-shuffle join pattern for dimension tables."""
    cust = _rp(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).to_pandas()
    lookup_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))

    def tag(batch: pa.Table) -> pa.Table:
        lk = ray.get(lookup_ref)
        segs = [lk.get(k, "") for k in batch.column("o_custkey").to_pylist()]
        return batch.append_column("c_mktsegment", pa.array(segs, pa.string()))

    ds = _rp(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    return (ds.map_batches(tag, batch_format="pyarrow")
              .groupby("c_mktsegment").aggregate(Count(alias_name="n_orders")))


def q_hash_join_orders_nation(sf_dir: str):
    """Distributed hash join (Dataset.join) orders⋈customer, grouped by
    nation key — the both-sides-large path."""
    orders = _rp(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    cust = _rp(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    j = orders.join(cust, join_type="inner", num_partitions=8,
                    on=("o_custkey",), right_on=("c_custkey",))
    return j.groupby("c_nationkey").aggregate(Count(alias_name="n_orders"))


def q_doc_length_buckets(sf_dir: str):
    """A1 quality-bucket analog over documents.n_chars."""
    ds = _rp(sf_dir, "documents", columns=["n_chars"])

    def bucket(t: pa.Table) -> pa.Table:
        n = t.column("n_chars").to_numpy()
        b = np.where(n < 500, "short", np.where(n < 2000, "medium", "long"))
        return pa.table({"bucket": pa.array(b.tolist(), pa.string())})

    return ds.map_batches(bucket, batch_format="pyarrow") \
             .groupby("bucket").aggregate(Count(alias_name="n"))


def q_tumbling_events(sf_dir: str):
    """Tumbling event-time window aggregate (stream-shaped op; no native
    Ray Data windows — bucket in map_batches + one groupby)."""
    from ..stages.windows import tumbling_window_agg
    ds = _rp(sf_dir, "events", columns=["event_type", "ts", "value"])
    return tumbling_window_agg(ds, key_col="event_type", unit="hour")


def q_session_counts(sf_dir: str):
    """Gap-based sessionization (30 min) per user."""
    from ..stages.windows import session_count
    ds = _rp(sf_dir, "events", columns=["user_id", "ts"])
    return session_count(ds, gap_minutes=30.0)


def q_sliding_events(sf_dir: str):
    """Sliding (hopping) event-time windows, 60 min size / 30 min hop:
    each event explodes into its k=2 windows inside map_batches, then
    ONE groupby — the shuffle-minimal batch form of a hop window."""
    from ..stages.windows import sliding_window_counts
    ds = _rp(sf_dir, "events", columns=["ts"])
    return sliding_window_counts(ds, size_minutes=60, hop_minutes=30)


def q_rolling_avg_events(sf_dir: str):
    """Per-user rolling mean over the current + 3 preceding events in
    (ts, event_id) order — the batch form of a ROWS-window aggregate
    (one groupby(user) shuffle, cumsum kernel per group)."""
    from ..stages.windows import rolling_mean_per_key
    ds = _rp(sf_dir, "events", columns=["user_id", "ts", "event_id", "value"])
    return rolling_mean_per_key(ds, preceding=3)


def q_quantiles_by_type(sf_dir: str):
    """Exact per-group discrete quantiles (DuckDB quantile_disc
    semantics: sorted element at ceil(q*n)-1) of event value by type."""
    from ..stages.aggregates import group_quantiles
    ds = _rp(sf_dir, "events", columns=["event_type", "value"])
    return group_quantiles(ds, "event_type", "value",
                           qs=[0.25, 0.5, 0.75, 0.95],
                           names=["q25", "q50", "q75", "q95"])


# --- temporal / range joins --------------------------------------------------

_RATE_START, _RATE_END, _RATE_MONTHS = "1995-01-01", "2001-08-01", 80


def _rate_table() -> pd.DataFrame:
    """Deterministic monthly rate dimension covering the orders date
    range. rate = 1 + ((i*37) mod 50)/100 — an integer division both
    engines compute to the identical double."""
    eff = pd.date_range(_RATE_START, _RATE_END, freq="MS")
    i = np.arange(len(eff), dtype=np.int64)
    return pd.DataFrame({
        "rate_month": eff.values.astype("datetime64[us]"),
        "rate": 1.0 + ((i * 37) % 50) / 100.0,
    })


def q_asof_join_rates(sf_dir: str):
    """Broadcast as-of join: each order picks the latest monthly rate
    with rate_month <= o_orderdate (searchsorted per batch against the
    ray.put dimension; no shuffle)."""
    from ..stages.joins import asof_join_broadcast
    ds = _rp(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    out = asof_join_broadcast(ds, _rate_table(), left_on="o_orderdate",
                              right_on="rate_month",
                              right_cols=["rate_month", "rate"])
    return out.select_columns(["o_orderkey", "rate_month", "rate"])


def q_asof_join_events(sf_dir: str):
    """Keyed (distributed) as-of join: each event attaches the same
    user's latest order with o_orderdate <= ts — both sides tagged,
    unioned, co-partitioned by ONE groupby(user) shuffle, sorted-merge
    per group. Right-side date ties break to the max o_orderkey on both
    sides."""
    from ..stages.joins import asof_join_keyed
    ev = _rp(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    orders = _rp(sf_dir, "orders",
                 columns=["o_custkey", "o_orderdate", "o_orderkey",
                          "o_totalprice"])
    orders = orders.map_batches(
        lambda t: t.rename_columns(
            [("user_id" if c == "o_custkey" else c) for c in t.column_names]),
        batch_format="pyarrow")
    out = asof_join_keyed(ev, orders, key="user_id", left_on="ts",
                          right_on="o_orderdate", left_cols=["event_id"],
                          right_cols=["o_orderkey", "o_totalprice"])
    return out.map_batches(
        lambda t: t.rename_columns(
            [("ts" if c == "__on" else c) for c in t.column_names]),
        batch_format="pyarrow")


_TIERS = pd.DataFrame({"tier": ["low", "mid", "high"],
                       "lo": [0.0, 0.25, 0.55],
                       "hi": [0.35, 0.65, 1.01]})


def q_interval_join_tiers(sf_dir: str):
    """Range join against a broadcast OVERLAPPING interval table (a row
    can match several tiers) — one vectorized mask per interval per
    batch, no shuffle."""
    from ..stages.joins import interval_join_broadcast
    ds = _rp(sf_dir, "events", columns=["event_id", "value"])
    return interval_join_broadcast(ds, _TIERS, value_col="value")


# right-side predicates chosen so semi AND anti are both non-trivial at
# every sf (neither all-rows nor empty)
SEMI_PRICE = 350_000.0
ANTI_PRICE = 300_000.0


def q_semi_join_orders(sf_dir: str):
    """Semi join (WHERE EXISTS): customers with at least one order above
    SEMI_PRICE. Right side reduced to its distinct keys distributed,
    broadcast once; left streams through one is_in filter — no shuffle."""
    from ..stages.relational import semi_join_broadcast
    cust = _rp(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])
    orders = _rp(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    big = orders.map_batches(
        lambda t: t.filter(pc.greater(t.column("o_totalprice"), SEMI_PRICE)),
        batch_format="pyarrow")
    return semi_join_broadcast(cust, big, "c_custkey", "o_custkey")


def q_anti_join_customers(sf_dir: str):
    """Anti join (WHERE NOT EXISTS): customers with no order above
    ANTI_PRICE — the broadcast-key complement filter."""
    from ..stages.relational import anti_join_broadcast
    cust = _rp(sf_dir, "customer", columns=["c_custkey", "c_name"])
    orders = _rp(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    big = orders.map_batches(
        lambda t: t.filter(pc.greater(t.column("o_totalprice"), ANTI_PRICE)),
        batch_format="pyarrow")
    return anti_join_broadcast(cust, big, "c_custkey", "o_custkey")


def q_semi_join_shuffled(sf_dir: str):
    """Same rows as q_semi_join_orders via the both-sides-large plan:
    one raw-task hash exchange co-partitioning left rows with the right
    side's (combiner-reduced) keys — the 100 TB shape when the right
    key set exceeds broadcast size."""
    from ..stages.relational import semi_join_shuffled
    cust = _rp(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])
    orders = _rp(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    big = orders.map_batches(
        lambda t: t.filter(pc.greater(t.column("o_totalprice"), SEMI_PRICE)),
        batch_format="pyarrow")
    return semi_join_shuffled(cust, big, "c_custkey", "o_custkey")


def q_explode_part_words(sf_dir: str):
    """UNNEST: split part names into words (Arrow split_pattern, zero
    Python per row), explode, count per word, deterministic top-20."""
    from ..stages.relational import split_explode
    parts = _rp(sf_dir, "part", columns=["p_name"])
    words = split_explode(parts, "p_name", " ", out_col="word")
    return (words.groupby("word").aggregate(Count(alias_name="n"))
                 .sort(["n", "word"], descending=[True, False]).limit(20))


def q_pivot_lineitem(sf_dir: str):
    """Pivot / contingency: SUM(l_quantity) per l_returnflag ×
    l_linestatus as wide columns (SUM(CASE WHEN ...) twin). Pivot values
    discovered distributed; sums over integral doubles are IEEE-exact."""
    from ..stages.relational import pivot_sum
    ds = _rp(sf_dir, "lineitem",
             columns=["l_returnflag", "l_linestatus", "l_quantity"])
    return pivot_sum(ds, key="l_returnflag", pivot_col="l_linestatus",
                     value_col="l_quantity", prefix="qty_")


def q_cumsum_events(sf_dir: str):
    """Per-user running total (SUM OVER ... ROWS UNBOUNDED PRECEDING):
    one groupby(user) shuffle, numpy cumsum per group."""
    from ..stages.relational import cumsum_per_key
    ds = _rp(sf_dir, "events", columns=["user_id", "ts", "event_id", "value"])
    return cumsum_per_key(ds, key_col="user_id", ts_col="ts",
                          order_col="event_id", value_col="value")


def q_ntile_events(sf_dir: str):
    """NTILE(4) per event_type ordered by (value, event_id) — integer-
    exact order-statistic bucketing, one groupby shuffle."""
    from ..stages.relational import ntile_per_group
    ds = _rp(sf_dir, "events", columns=["event_type", "event_id", "value"])
    return ntile_per_group(ds, key_col="event_type",
                           order_cols=["value", "event_id"], n=4,
                           id_col="event_id")


def q_rollup_lineitem(sf_dir: str):
    """GROUP BY ROLLUP(returnflag, linestatus): one fine-grain shuffle,
    coarser levels cascaded from the O(groups) fine result."""
    from ..stages.aggregates import rollup_sum
    ds = _rp(sf_dir, "lineitem",
             columns=["l_returnflag", "l_linestatus", "l_quantity"])
    return rollup_sum(ds, ["l_returnflag", "l_linestatus"], "l_quantity",
                      sum_name="sum_qty", count_name="n_rows")


def q_argmax_events(sf_dir: str):
    """Per-type argmax row (row_number() = 1 twin) via the one-row-per-
    key combiner — shuffle ships at most keys-per-batch rows."""
    from ..stages.aggregates import group_argmax
    ds = _rp(sf_dir, "events", columns=["event_type", "event_id", "value"])
    return group_argmax(ds, key="event_type", value="value",
                        id_col="event_id")


def q_stats_by_flag(sf_dir: str):
    """Per-group mean/variance/stddev from exact (n, Σx, Σx²) partial
    sums — integral l_quantity keeps the sums IEEE-exact, so the
    closed-form finish matches DuckDB's Welford at 6 decimals."""
    from ..stages.aggregates import group_moments
    ds = _rp(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])
    return group_moments(ds, key="l_returnflag", value="l_quantity")


EXCEPT_PRICE = 400_000.0  # both set-op queries split orders on this


def q_except_custkeys(sf_dir: str):
    """EXCEPT set semantics: big-spender customers with no 'F'-status
    order — both sides reduced to distinct keys distributed, one
    broadcast membership filter."""
    from ..stages.relational import distinct_set_op
    orders = _rp(sf_dir, "orders",
                 columns=["o_custkey", "o_totalprice", "o_orderstatus"])
    big = orders.map_batches(
        lambda t: t.filter(pc.greater(t.column("o_totalprice"), EXCEPT_PRICE)),
        batch_format="pyarrow")
    f = orders.map_batches(
        lambda t: t.filter(pc.equal(t.column("o_orderstatus"), "F")),
        batch_format="pyarrow")
    return distinct_set_op(big, f, "o_custkey", op="except")


def q_intersect_custkeys(sf_dir: str):
    """INTERSECT twin of q_except_custkeys."""
    from ..stages.relational import distinct_set_op
    orders = _rp(sf_dir, "orders",
                 columns=["o_custkey", "o_totalprice", "o_orderstatus"])
    big = orders.map_batches(
        lambda t: t.filter(pc.greater(t.column("o_totalprice"), EXCEPT_PRICE)),
        batch_format="pyarrow")
    f = orders.map_batches(
        lambda t: t.filter(pc.equal(t.column("o_orderstatus"), "F")),
        batch_format="pyarrow")
    return distinct_set_op(big, f, "o_custkey", op="intersect")


def q_lag_diff_events(sf_dir: str):
    """Per-user first difference (LAG window) in (ts, event_id) order —
    one groupby(user) shuffle, numpy diff per group."""
    from ..stages.relational import lag_diff_per_key
    ds = _rp(sf_dir, "events", columns=["user_id", "ts", "event_id", "value"])
    return lag_diff_per_key(ds, key_col="user_id", ts_col="ts",
                            order_col="event_id", value_col="value")


def q_string_agg_nations(sf_dir: str):
    """Ordered string_agg per region (broadcast dimension join + one
    tiny groupby)."""
    from ..stages.aggregates import string_agg_per_group
    region = _rp(sf_dir, "region",
                 columns=["r_regionkey", "r_name"]).to_pandas()
    lk = ray.put(dict(zip(region["r_regionkey"], region["r_name"])))

    def tag(t: pa.Table) -> pa.Table:
        m = ray.get(lk)
        names = [m.get(k) for k in t.column("n_regionkey").to_pylist()]
        return t.append_column("r_name", pa.array(names, pa.string()))

    nation = _rp(sf_dir, "nation", columns=["n_name", "n_regionkey"])
    return string_agg_per_group(
        nation.map_batches(tag, batch_format="pyarrow"),
        key="r_name", value="n_name", sep=",", out_col="nations")


DECON_N = 8  # shingle width (words) for benchmark decontamination
_DECON_BENCH = "doc_id % 17 = 3"  # the stand-in held-out benchmark slice


def q_decontaminate(sf_dir: str):
    """Training-data decontamination: drop every non-benchmark document
    sharing ANY 8-word shingle with the benchmark slice (GPT-3 appx C
    style n-gram overlap). Benchmark shingle set built distributed and
    broadcast once; the corpus streams through one filter."""
    from ..stages.textstats import benchmark_shingles, decontaminate
    docs = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def _slice(eq: bool):
        def f(t: pa.Table) -> pa.Table:
            m = t.column("doc_id").to_numpy() % 17 == 3
            return t.filter(pa.array(m if eq else ~m))
        return f

    bench = docs.map_batches(_slice(True), batch_format="pyarrow")
    rest = docs.map_batches(_slice(False), batch_format="pyarrow")
    sh = benchmark_shingles(bench, n=DECON_N)
    return decontaminate(rest, sh, n=DECON_N).select_columns(["doc_id"])


# PII injected deterministically per doc so the scrub oracle is non-trivial
# on the synthetic corpus (which contains no natural emails/phones); the SQL
# side builds the identical string.
_PII_SUFFIX_SQL = ("' contact user' || doc_id || '@example.com tel 555-' || "
                   "(1000 + doc_id % 9000)")


def q_pii_redact(sf_dir: str):
    """PII scrub over documents: inject one deterministic email+phone per
    doc (corpus has none naturally), then redact with the vectorized
    Arrow-RE2 kernels — n_pii counts + redacted text, oracle-exact vs
    DuckDB regexp_replace (both engines run RE2)."""
    from ..stages.textstats import pii_redact_batch
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def inject(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        suffix = [f" contact user{i}@example.com tel 555-{1000 + i % 9000}"
                  for i in ids]
        txt = pc.binary_join_element_wise(
            t.column("text").cast(pa.string()), pa.array(suffix, pa.string()), "")
        return pa.table({"doc_id": t.column("doc_id"), "text": txt})

    out = ds.map_batches(inject, batch_format="pyarrow") \
            .map_batches(pii_redact_batch, batch_format="pyarrow")
    return out.select_columns(["doc_id", "n_pii", "text_redacted"])


def q_repetition_ratio(sf_dir: str):
    """Gopher-style repetition signal per doc: word totals, distincts and
    rep_ratio = 1 - distinct/total (ASCII tokenizer == DuckDB RE2)."""
    from ..stages.textstats import repetition_stats_batch
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(repetition_stats_batch, batch_format="pyarrow") \
             .select_columns(["doc_id", "n_words", "n_distinct", "rep_ratio"])


def q_vocab_topk(sf_dir: str):
    """Corpus vocabulary top-50: per-batch partial word counts (combiner)
    → one small groupby(word) sum → deterministic sort+limit."""
    from ..stages.aggregates import vocab_topk
    ds = _rp(sf_dir, "documents", columns=["text"])
    return vocab_topk(ds, k=50)


def q_source_cap(sf_dir: str):
    """Domain frequency capping: keep the 10 lowest-doc_id documents per
    source (combiner pre-prune + one groupby(source) merge)."""
    from ..stages.aggregates import cap_per_group
    ds = _rp(sf_dir, "documents", columns=["doc_id", "source"])
    return cap_per_group(ds, key="source", order_col="doc_id", k=10) \
        .select_columns(["doc_id", "source"])


def q_mixture_sample(sf_dir: str):
    """Weighted domain-mixture sampling: each source sampled at its own
    deterministic rate (5 + md5(source) % 90 percent), membership by
    md5(doc_id) — the reproducible corpus-mixing op. Rates are a
    broadcast dimension; the corpus streams through one filter."""
    from ..stages.aggregates import md5_low64, weighted_sample
    ds = _rp(sf_dir, "documents", columns=["doc_id", "source"])
    srcs = ds.unique("source")  # small dimension (driver holds #sources)
    rates = {s: 5 + md5_low64(s) % 90 for s in srcs}
    return weighted_sample(ds, rates, key_col="source", id_col="doc_id")


def q_kmeans_clusters(sf_dir: str):
    """Distributed k-means over the embeddings (broadcast centroids +
    per-batch partial sums, no shuffle) — cluster sizes as the graded
    surface (rows-only: float iteration order isn't SQL-expressible);
    planted-label purity is pinned in pytest."""
    from ..stages.clustering import kmeans_assign, kmeans_fit
    ds = _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cent = kmeans_fit(ds, k=4, iters=8)
    asg = kmeans_assign(ds, cent)
    from ray.data.aggregate import Count
    return asg.groupby("cluster").aggregate(Count(alias_name="n_points"))


SEMDEDUP_TAU = 0.9


def q_semantic_dedup(sf_dir: str):
    """SemDeDup over the planted-dup corpus (the driver embeddings have
    no pairs above any real near-dup threshold — max within-label cos
    ≈ 0.48): within each grp cluster drop any vector whose cosine to a
    lower-id vector is >= tau (one groupby(cluster) shuffle + per-group
    matmul). Planted dup cosines ≥ 0.953 and cross-anchor cosines ≈ 0,
    so τ=0.9 sits on a wide float margin. The k-means-cluster route
    (the SemDeDup paper shape) is pytest-pinned — fixed grp clusters
    keep the oracle SQL-expressible."""
    import pyarrow.parquet as pq

    from ..stages.similarity import semantic_dedup
    tbl = _planted_sem_embeddings(_sf_of(sf_dir))
    pq.write_table(tbl, _PLANTED_SEM_PATH,
                   row_group_size=max(256, tbl.num_rows // 8))
    ds = rd.read_parquet(_PLANTED_SEM_PATH)
    return semantic_dedup(ds, tau=SEMDEDUP_TAU, cluster_col="grp")


def q_group_centroids(sf_dir: str):
    """Mean embedding per label as (label, dim, centroid) rows —
    partial-sum combiner + one tiny groupby((label, dim)); no vector
    shuffle, no driver math."""
    from ..stages.aggregates import group_centroids
    ds = _rp(sf_dir, "embeddings", columns=["label", "embedding"])
    return group_centroids(ds, key="label", vec_col="embedding")


def q_tfidf_topk(sf_dir: str):
    """Top-3 TF-IDF terms per document: vocab-combiner DF pass +
    broadcast (word → df) dimension + one streaming score pass."""
    from ..stages.aggregates import tfidf_topk
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    return tfidf_topk(ds, k=3)


DUPGRAM_N = 5


def q_dup_ngram_stats(sf_dir: str):
    """Per-doc duplicated 5-gram counts/fraction (Lee et al. substring-
    dup signal): distinct-shingle combiner → one groupby(shingle) →
    broadcast duplicated set → streaming per-doc counter."""
    from ..stages.textstats import duplicated_ngram_stats
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    return duplicated_ngram_stats(ds, n=DUPGRAM_N)


def q_remove_dup_ngrams(sf_dir: str):
    """ExactSubstr-style duplicated-span removal (Lee et al.): words
    covered by a corpus-duplicated 5-gram are cut, survivors re-joined.
    Shared dup-shingle combiner + broadcast, then one streaming pass."""
    from ..stages.textstats import remove_dup_ngrams
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    return remove_dup_ngrams(ds, n=DUPGRAM_N)


WINNOW_K, WINNOW_W = 8, 4


def q_winnow_fingerprints(sf_dir: str):
    """Winnowing (MOSS) fingerprint selection: rightmost window-min of
    md5 k-gram hashes; stateless vectorized pass, no shuffle."""
    from ..stages.textstats import winnow_fingerprints
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    return winnow_fingerprints(ds, k=WINNOW_K, w=WINNOW_W)


DSIR_B = 1024


def q_dsir_logweights(sf_dir: str):
    """DSIR importance weights (Xie et al.): md5-bucketed unigram+bigram
    features, target = lang='en' slice, raw = full corpus; two bincount
    combiner passes + one broadcast log-ratio vector, zero shuffle."""
    from ..stages.textstats import dsir_logweights
    raw = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    tgt = (_rp(sf_dir, "documents", columns=["lang", "text"])
           .map_batches(lambda t: t.filter(
               pc.equal(t.column("lang"), "en")).select(["text"]),
               batch_format="pyarrow"))
    return dsir_logweights(raw, tgt, n_buckets=DSIR_B)


PMI_WINDOW, PMI_MINC = 3, 5


def q_pmi_pairs(sf_dir: str):
    """Windowed co-occurrence PMI (Church-Hanks collocations): two
    combiner count passes + one groupby((x,y)) shuffle + broadcast
    unigram dimension."""
    from ..stages.aggregates import pmi_pairs
    ds = _rp(sf_dir, "documents", columns=["text"])
    return pmi_pairs(ds, window=PMI_WINDOW, min_count=PMI_MINC)


SEGDEDUP_W = 10


def q_dedup_segments(sf_dir: str):
    """C4-style keep-first segment dedup (10-word windows): two keyed
    raw-task exchanges (winner-by-(doc_id,seg) per segment, then
    reassembly by doc) — no broadcast, no driver kept-set."""
    from ..stages.textstats import dedup_segments
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    return dedup_segments(ds, w=SEGDEDUP_W)


def q_normalize_text(sf_dir: str):
    """Pre-tokenization text normalization (lower, collapse whitespace,
    strip) — one stateless Arrow-RE2 map, zero shuffle."""
    from ..stages.textstats import normalize_text_batch
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(normalize_text_batch, batch_format="pyarrow") \
             .select_columns(["doc_id", "text_norm"])


def q_topk_per_segment(sf_dir: str):
    """Per-group top-k (F9 shape with an oracle): top 2 orders by price per
    market segment via broadcast join + groupby.map_groups."""
    cust = _rp(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).to_pandas()
    lookup_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))

    def tag(batch: pa.Table) -> pa.Table:
        lk = ray.get(lookup_ref)
        segs = [lk.get(k, "") for k in batch.column("o_custkey").to_pylist()]
        return batch.append_column("c_mktsegment", pa.array(segs, pa.string()))

    def top2(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["o_totalprice", "o_orderkey"],
                             ascending=[False, True]).head(2)

    ds = _rp(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    out = (ds.map_batches(tag, batch_format="pyarrow")
             .groupby("c_mktsegment").map_groups(top2, batch_format="pandas"))
    return out.select_columns(["c_mktsegment", "o_orderkey", "o_totalprice"])


def q_union_filters(sf_dir: str):
    """Set op (union of disjoint filters) — ds.union."""
    ds = _rp(sf_dir, "events", columns=["event_id", "value"])
    hi = ds.map_batches(lambda t: t.filter(pc.greater_equal(t.column("value"), 0.9)),
                        batch_format="pyarrow")
    lo = ds.map_batches(lambda t: t.filter(pc.less_equal(t.column("value"), 0.1)),
                        batch_format="pyarrow")
    return hi.union(lo)


def q_hash_sample(sf_dir: str):
    """Deterministic hash sampling (1-in-20 by doc_id) — the reproducible
    sampling pattern for pipeline debugging at scale."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "lang"])

    def sample(t: pa.Table) -> pa.Table:
        mask = (t.column("doc_id").to_numpy() % 20) == 0
        return t.filter(pa.array(mask))

    return ds.map_batches(sample, batch_format="pyarrow")


def q_sample_k(sf_dir: str):
    """Fixed-SIZE uniform sample: the 100 documents with the smallest
    md5(doc_id) — the distributed, resumable equivalent of reservoir
    sampling (the sample is a pure function of the ids, so re-sharded
    or resumed runs draw the identical rows; streaming reservoirs are
    order-dependent, which a resumable pipeline can't have).
    aggregates.sample_uniform_k: per-batch top-k combiner, then one
    sort+limit over <= blocks x k candidates — the corpus itself never
    shuffles."""
    from ..stages.aggregates import sample_uniform_k
    ds = _rp(sf_dir, "documents", columns=["doc_id", "source"])
    return sample_uniform_k(ds, "doc_id", k=100)


def q_quantile_filter(sf_dir: str):
    """Per-group quantile gating: keep documents at or above their own
    language's 25th-percentile length — the 'drop the bottom quartile
    per language' curation filter where a global threshold would gut
    low-resource languages (aggregates.filter_by_group_quantile:
    O(groups) threshold table broadcast once, corpus streams through
    one vectorized filter)."""
    from ..stages.aggregates import filter_by_group_quantile
    ds = _rp(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    return filter_by_group_quantile(ds, "lang", "n_chars", 0.25)


def q_bm25(sf_dir: str):
    """BM25 relevance of every document against the query
    {filter, hash, join} (k1=1.2, b=0.75, Lucene/ATIRE idf) — the
    lexical-retrieval scorer next to the ANN ops
    (aggregates.bm25_score: one |query|-row combiner pass for df/avgdl,
    stats broadcast once, corpus streams through a stateless scorer)."""
    from ..stages.aggregates import bm25_score
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    return bm25_score(ds, ["filter", "hash", "join"])


def q_stratified_sample(sf_dir: str):
    """Per-stratum fixed-size sample: 40 uniformly-drawn documents per
    language (row_number() OVER (PARTITION BY lang ORDER BY
    md5(doc_id)) <= 40) — the corpus-balancing primitive when every
    language must contribute equally regardless of its share
    (aggregates.stratified_sample_k: cap_per_group's combiner on the
    hash order; a hot stratum's excess rows die in the batch that read
    them)."""
    from ..stages.aggregates import stratified_sample_k
    ds = _rp(sf_dir, "documents", columns=["doc_id", "lang"])
    return stratified_sample_k(ds, "lang", "doc_id", k=40)


# ---------------------------------------------------------------------------
# Training-data ops over documents / embeddings
# ---------------------------------------------------------------------------

def q_dedup_exact(sf_dir: str):
    """Exact text dedup: keep min doc_id per identical text."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    out = D.exact_dedup(ds, id_col="doc_id", text_col="text")
    return out.select_columns(["doc_id"])


def q_token_counts(sf_dir: str):
    """Whitespace token counting (SQL-reproducible)."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        toks = [T.token_count(x) for x in t.column("text").to_pylist()]
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_tokens": pa.array(toks, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow")


def q_text_stats(sf_dir: str):
    """Char/punct counts + punct_ratio (single int/int division)."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        n_chars = np.array([len(x or "") for x in texts], np.int64)
        n_punct = np.array([len(T._PUNCT_RE.findall(x or "")) for x in texts], np.int64)
        ratio = np.where(n_chars > 0, n_punct / np.maximum(n_chars, 1), 0.0)
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_chars": pa.array(n_chars),
                         "n_punct": pa.array(n_punct),
                         "punct_ratio": pa.array(ratio, pa.float64())})

    return ds.map_batches(f, batch_format="pyarrow")


N_ANN_QUERIES = 4
ANN_K = 5


def _query_vectors(sf_dir: str) -> dict[int, np.ndarray]:
    """The N_ANN_QUERIES lowest-vec_id vectors, via a pushed-down row
    filter — only the matching row group(s) are decoded, never the whole
    table (VERDICT r3 #2: no whole-table driver materialization in the
    harness). vec_ids are dense from 0 in the driver tables; the widening
    loop below keeps this correct even for sparse/offset id spaces."""
    import pyarrow.parquet as pq
    path = f"{sf_dir}/embeddings.parquet"
    bound = N_ANN_QUERIES
    while True:
        t = pq.read_table(path, columns=["vec_id", "embedding"],
                          filters=[("vec_id", "<", bound)])
        if t.num_rows >= N_ANN_QUERIES:
            break
        total = pq.ParquetFile(path).metadata.num_rows
        if t.num_rows >= total:
            break
        bound *= 16
    df = t.to_pandas().sort_values("vec_id").head(N_ANN_QUERIES)
    return {int(r.vec_id): np.asarray(list(r.embedding), np.float64)
            for r in df.itertuples()}


def q_ann_topk(sf_dir: str):
    """Brute-force cosine top-k (query matrix broadcast, per-batch matmul).
    Compared on (query_id, vec_id) membership; scores float64-rounded."""
    ds = _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = S.brute_force_topk(ds, _query_vectors(sf_dir), ANN_K)
    return out[["query_id", "vec_id"]].reset_index(drop=True)


NEAR_DUP_TAU = 0.35  # driver embeddings are random (max pair cosine ≈0.48 at
# sf0.001); τ sits in the tail so the checked result is non-trivial. Real
# corpora use τ≈0.9 (see stages/similarity.py near_dup_pairs default).


def q_near_dup_embeddings(sf_dir: str):
    """Embedding-cosine near-duplicate pairs at τ=NEAR_DUP_TAU."""
    ds = _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    df = S.near_dup_pairs(ds, threshold=NEAR_DUP_TAU)
    return df[["id_a", "id_b"]]


PLANTED_TAU = 0.9
# Fixed path (the oracle SQL is a static string): the query WRITES this
# parquet deterministically from sf before the driver runs the oracle,
# so both sides read byte-identical float64 vectors.
_PLANTED_PATH = "/tmp/graft_planted_embeddings_v1.parquet"


def _planted_embeddings(sf: float) -> pa.Table:
    """Deterministic embeddings corpus WITH planted near-duplicates — the
    driver's random embeddings have no pairs at real near-dup thresholds,
    so the LSH path (the 100 TB shape) was only pytest-covered until this
    table (VERDICT r3 #3). Base vectors are unit gaussians (dim 64:
    accidental pairs at cos≥0.9 are impossible at these corpus sizes,
    and the moderate-cosine tail that drives random LSH band collisions
    is ~3x smaller than at dim 32); every 10th base gets a perturbed
    copy at cosine
    1/sqrt(1+eps²) ∈ [0.953, 0.993] (eps ∈ [0.12, 0.22] orthogonal
    noise), and every 4th of those gets a SECOND copy so some clusters
    have 3 members (dup-dup cosine ≥ 1/(1+0.22²) = 0.954 — safely above
    τ=0.9 and high enough that the planner's ≥0.999 per-pair recall
    makes a full-corpus miss deterministic-zero at the gate seeds)."""
    rng = np.random.default_rng(101)
    n_base = max(256, int(60_000 * sf))
    dim = 64
    base = rng.standard_normal((n_base, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    ids = list(range(n_base))
    vecs = [base[i] for i in range(n_base)]
    next_id = n_base
    for i in range(0, n_base, 10):
        copies = 2 if (i // 10) % 4 == 0 else 1
        for _ in range(copies):
            g = rng.standard_normal(dim)
            g -= (g @ base[i]) * base[i]
            g /= np.linalg.norm(g)
            eps = rng.uniform(0.12, 0.22)
            v = base[i] + eps * g
            v /= np.linalg.norm(v)
            ids.append(next_id)
            vecs.append(v)
            next_id += 1
    return pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float64())),
    })


_PLANTED_SEM_PATH = "/tmp/graft_planted_sem_embeddings_v1.parquet"


def _planted_sem_embeddings(sf: float) -> pa.Table:
    """The planted-dup corpus with a ``grp`` CLUSTER column for the
    SemDeDup gate: anchors fall in blocks of 40 (grp = anchor_id // 40),
    every copy joins its anchor's grp — so clusters are ~44-52 rows with
    real near-dups inside (cos ≥ 0.953) and unrelated anchors at cos ≈ 0,
    a wide float margin on both sides of τ."""
    base = _planted_embeddings(sf)
    n = base.num_rows
    # replicate the builder's copy loop to map each copy to its anchor:
    # copies are appended in order for i in range(0, n_base, 10), with a
    # 2nd copy every 4th anchor; n_base is the builder's own formula
    n_base = max(256, int(60_000 * sf))
    grp = list((np.arange(n_base) // 40).astype(np.int64))
    for i in range(0, n_base, 10):
        copies = 2 if (i // 10) % 4 == 0 else 1
        grp.extend([i // 40] * copies)
    assert len(grp) == n
    return base.append_column("grp", pa.array(grp, pa.int64()))


def q_near_dup_lsh(sf_dir: str):
    """Embedding near-dup at τ=0.9 FORCED through the banded-LSH path
    over the planted-duplicate corpus — grades the scale shape
    (signature explode → band-bucket groupby → distributed exact-cosine
    verify) against an exact cosine-join oracle. Precision is exact by
    construction (every candidate is verified); recall is what the gate
    checks, so a planner regression (similarity.plan_lsh_bands) shows up
    as a row-count mismatch here."""
    import pyarrow.parquet as pq
    tbl = _planted_embeddings(_sf_of(sf_dir))
    pq.write_table(tbl, _PLANTED_PATH,
                   row_group_size=max(256, tbl.num_rows // 8))
    ds = rd.read_parquet(_PLANTED_PATH)
    df = S.near_dup_pairs(ds, threshold=PLANTED_TAU, method="lsh")
    return df[["id_a", "id_b"]]


def q_minhash_dedup(sf_dir: str):
    """MinHash+LSH near-dup: candidate pairs verified DISTRIBUTIVELY at
    Jaccard ≥ 0.8 (pair list broadcast, shingle sets joined by a
    groupby(pair_id) shuffle — the corpus never reaches the driver),
    then keep the min doc_id per connected component
    (dedup.drop_duplicates_by_pairs: driver union-find + broadcast
    anti-join at this pair count; the distributed min-label-propagation
    + shuffled-anti-join form above DRIVER_CC_MAX is pinned output-equal
    in tests). Non-SQL; rows-only driver check + pytest assertions vs
    brute-force Jaccard."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = D.minhash_candidate_pairs_df(ds)  # O(pairs) — tiny
    verified = D.verify_jaccard_pairs(ds, pairs)
    return D.drop_duplicates_by_pairs(
        ds, verified[verified["jaccard"] >= 0.8]) \
        .select_columns(["doc_id"])


def q_jaccard_pairs(sf_dir: str):
    """n-gram Jaccard near-dup pairs: LSH candidate generation + exact
    3-word-shingle Jaccard verification at τ=0.8, computed inside
    map_batches/map_groups (only the O(pairs) result reaches the driver;
    the kernel is pytest-verified against hand-built near-dups)."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = D.minhash_candidate_pairs_df(ds)
    df = D.verify_jaccard_pairs(ds, pairs)
    df["jaccard"] = df["jaccard"].round(6)
    df = df[df["jaccard"] >= 0.8]
    return df.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def q_training_pipeline(sf_dir: str):
    """Composed curation pipeline: lang filter -> quality filter -> exact
    dedup -> MinHash near-dup removal -> token stats (rows-only check;
    stage semantics individually oracle-/pytest-checked)."""
    from .training_data import curate
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    out = curate(ds)["dataset"]
    return out.select_columns(["doc_id", "n_tokens", "n_punct"])


def q_simhash(sf_dir: str):
    """SimHash fingerprints (rows-only check; Hamming properties in pytest)."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(D.SimHashStage(), batch_format="pyarrow") \
             .select_columns(["doc_id", "simhash"])


_LANG_STAGE: list = []  # per-worker LangIdStage singleton (stateless-task form:
# avoids pinning upstream stages into a small actor pool; sets compiled once)


def _lang_id_batch(t: pa.Table) -> pa.Table:
    if not _LANG_STAGE:
        _LANG_STAGE.append(T.LangIdStage())
    return _LANG_STAGE[0](t)


def q_simhash_pairs(sf_dir: str):
    """SimHash near-dup pairs at Hamming <= 3: 16-bit band buckets give
    exact (pigeonhole) candidate recall; in-bucket Hamming verify; only
    qualifying pairs reach the driver (rows-only; brute-force equality
    pinned in pytest)."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    return D.simhash_near_dup_pairs(ds, max_hamming=3)


def q_lang_id(sf_dir: str):
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(_lang_id_batch, batch_format="pyarrow") \
             .select_columns(["doc_id", "lang_guess"])


def q_fingerprints(sf_dir: str):
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(T.fingerprint_batch, batch_format="pyarrow") \
             .select_columns(["doc_id", "fingerprint"])


# --- DuckDB-reproducible hash variants (oracle-exact tail closers) ----------
# Same pipelines as simhash / simhash_pairs / fingerprints but with the
# word hash swapped to md5-low-64 (== DuckDB md5_number_lower), which SQL
# CAN express — so these three run under the full rows+schema+hash gate
# while the blake2b originals stay rows-only.

def q_simhash_md5(sf_dir: str):
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(D.SimHashStage(hash_fn="md5"),
                          batch_format="pyarrow") \
             .select_columns(["doc_id", "simhash"])


def q_simhash_pairs_md5(sf_dir: str):
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    return D.simhash_near_dup_pairs(ds, max_hamming=3, hash_fn="md5")


def q_fingerprints_md5(sf_dir: str):
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(T.fingerprint_md5_batch, batch_format="pyarrow") \
             .select_columns(["doc_id", "fingerprint"])


def q_doc_quality(sf_dir: str):
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(T.quality_batch, batch_format="pyarrow") \
             .select_columns(["doc_id", "doc_quality"])


# ---------------------------------------------------------------------------
# Crawl-engine queries (synthetic world derived from sf; rows-only checks —
# bit-for-bit parity is enforced by tests/test_crawl_parity.py)
# ---------------------------------------------------------------------------

_MEDIA_REFS_MEMO: dict[str, pa.Table] = {}


def _media_refs(sf_dir: str) -> pa.Table:
    """Distinct media refs of the v2 world at this sf — the query's INPUT.
    World generation stands in for the live web, so it is memoized and
    benchable untimed (mirrors the headline's untimed world build).
    Distinct-ing happens driver-side with pyarrow kernels because the
    span table is already driver-resident metadata (list_flatten +
    struct_field + unique — no Ray shuffle for a dimension-table-sized
    set)."""
    cached = _MEDIA_REFS_MEMO.get(sf_dir)
    if cached is not None:
        return cached
    import pyarrow.compute as pc
    from ..sources import synth_world as W
    sf = _sf_of(sf_dir)
    n_hosts = max(3, min(24, int(240 * sf)))
    base = max(12, int(1600 * sf))
    tbl, _, _ = W.world(seed=77, n_hosts=n_hosts, pages_per_host_base=base,
                        profile="v2")
    flat = pc.list_flatten(tbl.column("expected_spans").combine_chunks())
    refs = flat.field("media_ref")
    refs = refs.filter(pc.and_kleene(pc.is_valid(refs),
                                     pc.not_equal(refs, "")))
    out = pa.table({"media_ref": pc.unique(refs)})
    _MEDIA_REFS_MEMO[sf_dir] = out
    return out


_MEDIA_STAGE: list = []  # per-worker MediaFeatureStage singleton (see below)


def _media_feature_batch(t: pa.Table) -> pa.Table:
    if not _MEDIA_STAGE:
        from ..stages.multimodal import MediaFeatureStage
        _MEDIA_STAGE.append(MediaFeatureStage())
    return _MEDIA_STAGE[0](t)


def q_media_features(sf_dir: str, actor_pool: bool = False):
    """Multimodal pipeline over the v2 world's media spans (SURVEY add-on):
    distinct media refs -> synthetic blob store (opaque binary payloads +
    typed metadata) -> MediaFeatureStage (decoder state set up once per
    worker, small batches because payload bytes dominate block size) ->
    fixed-width feature rows. Rows-only driver check; feature determinism
    and decode stubs are pinned in pytest.

    Stage form: stateless tasks with a per-worker-process singleton by
    default (decoder built once per worker — same amortization as an
    actor pool, without the ~1 s pool spin-up that dominates at bench
    scale; measured 0.09 s vs 1.0-1.5 s for the pool on 960 refs).
    ``actor_pool=True`` switches to the explicit actor-pool form — the
    right choice when the decoder state is heavy (real model weights) or
    the job is long enough to amortize pool startup (the 100 TB path)."""
    from ..stages import multimodal as M
    refs = _media_refs(sf_dir)
    # enough blocks that the stage is never input-starved; driver-side
    # slices (one block each) instead of a repartition job
    n = refs.num_rows
    k = max(2, min(16, n // 32 + 1))
    slices = [refs.slice(i * n // k, (i + 1) * n // k - i * n // k)
              for i in range(k)]
    uniq = rd.from_arrow([s for s in slices if s.num_rows])
    blob = uniq.map_batches(
        lambda t: M.synth_media_table(t.column("media_ref").to_pylist()),
        batch_format="pyarrow")
    if actor_pool:
        feats = blob.map_batches(M.MediaFeatureStage, batch_format="pyarrow",
                                 batch_size=32, concurrency=(1, 4),
                                 max_restarts=0)
    else:
        feats = blob.map_batches(_media_feature_batch, batch_format="pyarrow",
                                 batch_size=32)

    def fin(t: pa.Table) -> pa.Table:
        means = [round(float(np.mean(x)), 6)
                 for x in t.column("features").to_pylist()]
        return pa.table({
            "media_ref": t.column("media_ref"),
            "media_type": t.column("media_type"),
            "width": t.column("width"),
            "height": t.column("height"),
            "duration_ms": t.column("duration_ms"),
            "feat_mean": pa.array(means, pa.float64()),
        })

    return feats.map_batches(fin, batch_format="pyarrow")


def q_pdf_locations(sf_dir: str):
    """S7/E11 binary path: deterministic fixture PDFs (generated under
    /tmp once per sf) -> read_binary_files -> stdlib text extraction ->
    PDF location strategies (rows-only; bytes->text round-trip and
    address fidelity pinned in pytest)."""
    import os
    from ..sources.pdf_bytes import make_simple_pdf, pdf_locations
    from ..sources.synth_world import CITIES, STREETS
    sf = _sf_of(sf_dir)
    n = max(4, int(400 * sf))
    d = f"/tmp/graft_pdfs_sf{sf}"
    if not os.path.isdir(d) or len(os.listdir(d)) != n:
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            city, state, zip5 = CITIES[i % len(CITIES)]
            lines = [f"Company {i} Annual Report", "Our Offices",
                     f"Branch {i}",
                     f"{100 + i} {STREETS[i % len(STREETS)]} Street",
                     f"{city}, {state} {zip5}",
                     f"Tel: +1 555 {i:04d}"]
            with open(os.path.join(d, f"doc{i:04d}.pdf"), "wb") as f:
                f.write(make_simple_pdf(lines))
    ds = rd.read_binary_files(d, include_paths=True)
    out = pdf_locations(ds)
    return out.select_columns(["name", "address", "city", "state",
                               "postal_code", "country", "source_url"])


def _sf_of(sf_dir: str) -> float:
    import re
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.001


_CRAWL_CACHE: dict[float, dict] = {}


def _crawl_for(sf_dir: str) -> dict:
    from .flagship import run_flagship
    sf = _sf_of(sf_dir)
    if sf not in _CRAWL_CACHE:
        n_hosts = max(4, min(48, int(400 * sf)))
        base = max(16, int(2400 * sf))
        _CRAWL_CACHE.clear()
        _CRAWL_CACHE[sf] = run_flagship(n_hosts=n_hosts, pages_per_host_base=base,
                                        max_pages=100_000, round_seconds=60.0)
    return _CRAWL_CACHE[sf]


def q_crawl_visited(sf_dir: str):
    return _crawl_for(sf_dir)["crawl"].visited


def q_crawl_locations(sf_dir: str):
    return _crawl_for(sf_dir)["locations"]


def q_crawl_spans(sf_dir: str):
    docs = _crawl_for(sf_dir)["documents"]

    def flat(t: pa.Table) -> pa.Table:
        ids, kinds, texts, refs, offs = [], [], [], [], []
        for did, spans in zip(t.column("doc_id").to_pylist(),
                              t.column("spans").to_pylist()):
            for s in spans:
                ids.append(did)
                kinds.append(s["kind"])
                texts.append(s["text"])
                refs.append(s["media_ref"])
                offs.append(s["offset"])
        return pa.table({"doc_id": pa.array(ids, pa.string()),
                         "kind": pa.array(kinds, pa.string()),
                         "text": pa.array(texts, pa.string()),
                         "media_ref": pa.array(refs, pa.string()),
                         "offset": pa.array(offs, pa.int32())})

    return docs.map_batches(flat, batch_format="pyarrow")


# The crawl itself is not SQL-expressible (bit-for-bit parity lives in
# pytest), but these AGGREGATES over its output are: the query writes the
# two needed columns of the final locations to a fixed parquet path, and
# the oracle reads the same file (VERDICT r3 item #3 — same contract as
# the planted-embeddings table above).
_CRAWL_LOCS_DIR = "/tmp/graft_crawl_locations_v1"


def _crawl_locations_parquet(sf_dir: str):
    """Write (extraction_method, quality_score) of the crawl's locations
    to the oracle's fixed path; returns the locations Dataset."""
    import shutil
    locs = _crawl_for(sf_dir)["locations"]
    shutil.rmtree(_CRAWL_LOCS_DIR, ignore_errors=True)
    locs.select_columns(["extraction_method", "quality_score"]) \
        .write_parquet(_CRAWL_LOCS_DIR)
    return locs


def q_crawl_extraction_stats(sf_dir: str):
    """A3 (ExtractionStats.jsx:10-47): count per extraction_method over
    the crawl's locations — oracle-exact vs DuckDB on the written
    parquet."""
    from ray.data.aggregate import Count
    locs = _crawl_locations_parquet(sf_dir)
    return locs.groupby("extraction_method").aggregate(Count(alias_name="n"))


def q_crawl_quality_report(sf_dir: str):
    """A1 (data-quality.service.js:114-136): quality-bucket counts +
    average score. averageScore is ONE int/int float64 division
    (sum(quality_score)/count) so the DuckDB oracle reproduces it
    bit-for-bit."""
    from ray.data.aggregate import Count, Sum
    locs = _crawl_locations_parquet(sf_dir)
    tot = locs.aggregate(Sum("quality_score", alias_name="s"),
                         Count(alias_name="n"))
    s, n = int(tot["s"]), int(tot["n"])

    def bucket(t: pa.Table) -> pa.Table:
        from ..stages.enrich import quality_level
        lv = [quality_level(int(x))
              for x in t.column("quality_score").to_pylist()]
        return pa.table({"bucket": pa.array(lv, pa.string())})

    agg = (locs.map_batches(bucket, batch_format="pyarrow")
               .groupby("bucket").aggregate(Count(alias_name="c")).to_pandas())
    counts = dict(zip(agg["bucket"], agg["c"]))
    return pd.DataFrame([{
        "totalLocations": n,
        "excellent": int(counts.get("Excellent", 0)),
        "good": int(counts.get("Good", 0)),
        "fair": int(counts.get("Fair", 0)),
        "poor": int(counts.get("Poor", 0)),
        "averageScore": (s / n) if n else 0.0,
    }])


def q_crawl_seen(sf_dir: str):
    snap = _crawl_for(sf_dir)["crawl"].seen_snapshot
    return pa.table({"url_hash": pa.array(snap, pa.uint64())})


# ---------------------------------------------------------------------------
# Round-4 additions: cube, bivariate moments, funnel, JSON, sketches,
# bloom decontamination
# ---------------------------------------------------------------------------

def q_cube_lineitem(sf_dir: str):
    """GROUP BY CUBE(returnflag, linestatus): one fine-grain shuffle,
    every key-subset level cascaded from the O(groups) fine result."""
    from ..stages.aggregates import cube_sum
    ds = _rp(sf_dir, "lineitem",
             columns=["l_returnflag", "l_linestatus", "l_quantity"])
    return cube_sum(ds, ["l_returnflag", "l_linestatus"], "l_quantity",
                    sum_name="sum_qty", count_name="n_rows")


def q_corr_lineitem(sf_dir: str):
    """Per-flag Pearson corr + population covariance of quantity vs
    extendedprice via the bivariate-moments combiner (six partial sums
    per key per batch, one O(groups) shuffle); the oracle computes the
    SAME closed form from SUM() columns so the match is exact."""
    from ..stages.aggregates import group_corr
    ds = _rp(sf_dir, "lineitem",
             columns=["l_returnflag", "l_quantity", "l_extendedprice"])
    return group_corr(ds, "l_returnflag", "l_quantity", "l_extendedprice")


FUNNEL_STAGES = ("view", "click", "purchase")


def q_funnel_events(sf_dir: str):
    """Ordered funnel view -> click -> purchase with first-touch
    semantics: one int-keyed user shuffle, per-partition vectorized
    stage walk, O(partitions x stages) merge."""
    from ..stages.relational import funnel_counts
    ds = _rp(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    return funnel_counts(ds, FUNNEL_STAGES)


def q_json_field_agg(sf_dir: str):
    """Per-type count + sum of the integer JSON field props.k —
    vectorized RE2 fast path with a per-row json.loads fallback for
    rows the regex misses, then the map-side partial aggregation."""
    from ..stages.aggregates import grouped_agg_combine
    from ..stages.relational import json_int_field
    ds = _rp(sf_dir, "events", columns=["event_type", "props"])
    ds = ds.map_batches(lambda t: json_int_field(t, "props", "k", "k"),
                        batch_format="pyarrow")
    return grouped_agg_combine(ds, ["event_type"],
                               [("k", "count", "n_events"),
                                ("k", "sum", "sum_k")])


def q_hll_distinct(sf_dir: str):
    """Approximate distinct users per event type via mergeable
    HyperLogLog sketches (no oracle — approximate by design; accuracy
    pinned in tests at <=5% relative error vs the exact count)."""
    from ..stages.sketches import hll_distinct
    ds = _rp(sf_dir, "events", columns=["event_type", "user_id"])
    return hll_distinct(ds, "event_type", "user_id")


def q_hll_distinct_md5(sf_dir: str):
    """SQL-oracle twin of q_hll_distinct (round-4 verdict item 3, the
    simhash_md5 precedent): value hash = DuckDB md5_number_lower, the
    register fold is deterministic given the hash, and the estimator is
    exact-integer arithmetic — so the SAME registers and the SAME
    rounded estimate are computable in pure SQL (_HLL_MD5_SQL unrolls
    fold + estimate). blake2b hll_distinct stays the fast path."""
    from ..stages.sketches import hll_distinct_md5
    ds = _rp(sf_dir, "events", columns=["event_type", "user_id"])
    return hll_distinct_md5(ds, "event_type", "user_id")


def q_cms_freq(sf_dir: str):
    """Count-Min point-frequency estimates for every distinct
    l_partkey — the frequency member of the sketch family (HLL =
    cardinality, Misra-Gries = top-k, mergeable summaries = order
    statistics; stages/sketches.py cms_estimates: per-batch (d x w)
    register-blob combiner + broadcast-register estimate pass). Bucket
    hash is md5_number_lower, so the oracle recomputes the IDENTICAL
    registers and min-estimates in pure SQL; the one-sided guarantee
    (est >= true, est <= true + eN w.h.p.) is pinned in pytest."""
    from ..stages.sketches import cms_estimates
    ds = _rp(sf_dir, "lineitem", columns=["l_partkey"])
    return cms_estimates(ds, "l_partkey", w=1024, d=4)


_CMS_SQL = (
    "WITH keys AS (SELECT l_partkey, count(*)::BIGINT AS c "
    "FROM lineitem GROUP BY l_partkey), "
    "rows_ AS (SELECT unnest(generate_series(0, 3)) AS r), "
    "kb AS (SELECT l_partkey, c, r, "
    "md5_number_lower(r::VARCHAR || ':' || l_partkey::VARCHAR) % 1024 "
    "AS b FROM keys CROSS JOIN rows_), "
    "reg AS (SELECT r, b, SUM(c)::BIGINT AS cnt FROM kb GROUP BY r, b) "
    "SELECT kb.l_partkey, MIN(reg.cnt)::BIGINT AS est FROM kb "
    "JOIN reg USING (r, b) GROUP BY kb.l_partkey ORDER BY l_partkey")


def q_priority_sample(sf_dir: str):
    """Priority sampling (Duffield-Lund-Thorup): k=200 length-weighted
    documents without replacement + the unbiased subset-sum estimator
    w_hat = max(w, tau) — the weight-sensitive member of the sampling
    family (uniform-k / stratified-k / rate-mixture are the others;
    stages/aggregates.py priority_sample). Priorities are w * 2^53 /
    (md5 % 2^53 + 1): single IEEE multiply+divide on exact integers,
    libm-free, so the oracle's DOUBLE arithmetic is BIT-IDENTICAL;
    unbiasedness (sum w_hat ~ corpus total) is pinned in pytest."""
    from ..stages.aggregates import priority_sample
    ds = _rp(sf_dir, "documents", columns=["doc_id", "n_chars"])
    return priority_sample(ds, "n_chars", "doc_id", 200)


_PRIORITY_SAMPLE_SQL = (
    "WITH p AS (SELECT doc_id, n_chars, n_chars::DOUBLE * "
    "9007199254740992 / ((md5_number_lower(doc_id::VARCHAR) % "
    "9007199254740992) + 1) AS pri FROM documents), "
    "r AS (SELECT *, row_number() OVER (ORDER BY pri DESC, doc_id) "
    "AS rn FROM p), "
    "tau AS (SELECT COALESCE(MAX(CASE WHEN rn = 201 THEN pri END), "
    "0.0) AS t FROM r) "
    "SELECT doc_id, n_chars, CASE WHEN n_chars::DOUBLE >= tau.t "
    "THEN n_chars::DOUBLE ELSE tau.t END AS w_hat "
    "FROM r, tau WHERE rn <= 200 ORDER BY doc_id")


def q_rrf_fusion(sf_dir: str):
    """Hybrid retrieval: reciprocal-rank fusion (Cormack et al. 2009,
    k0=60) of the BM25 lexical ranking ({filter, hash, join}) and the
    cosine semantic ranking against the lowest-vec_id query vector,
    top-100 lists fused to a top-50 (stages/similarity.py rrf_fuse:
    per-system distributed sort+limit, O(systems x 100) driver fuse).
    Ranks come from the two exact graded scorers (bm25 round-6,
    cosine round-4 half-away, id tie-breaks), and each RRF term is one
    IEEE integer division — so the SQL twin is bit-identical."""
    from ..stages.aggregates import bm25_score
    from ..stages.similarity import _as_matrix, rrf_fuse
    docs = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    bm = bm25_score(docs, ["filter", "hash", "join"])
    qv = _query_vectors(sf_dir)
    q0 = qv[min(qv)]

    def cos_stage(t: pa.Table) -> pa.Table:
        m = _as_matrix(t.column("embedding"))
        c = (m @ q0) / (np.linalg.norm(m, axis=1) * np.linalg.norm(q0))
        cr = np.sign(c) * np.floor(np.abs(c) * 1e4 + 0.5) / 1e4
        return pa.table({"doc_id": t.column("vec_id"),
                         "cs": pa.array(cr)})

    cos = _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"]) \
        .map_batches(cos_stage, batch_format="pyarrow")
    return rrf_fuse([(bm, "bm25"), (cos, "cs")], id_col="doc_id",
                    r=100, k0=60, topk=50)


def _rrf_oracle_sql() -> str:
    bm = ORACLES["bm25"]
    return (
        f"WITH bmr AS (SELECT doc_id, row_number() OVER "
        f"(ORDER BY bm25 DESC, doc_id) AS rn FROM ({bm})), "
        "q AS (SELECT embedding AS qv FROM embeddings "
        "ORDER BY vec_id LIMIT 1), "
        "cr0 AS (SELECT vec_id AS doc_id, "
        "round(list_cosine_similarity(qv::DOUBLE[], "
        "embedding::DOUBLE[]), 4) AS cs FROM embeddings, q), "
        "cr AS (SELECT doc_id, row_number() OVER "
        "(ORDER BY cs DESC, doc_id) AS rn FROM cr0), "
        "fused AS (SELECT doc_id, "
        "coalesce(1.0 / (60 + b.rn), 0.0) + "
        "coalesce(1.0 / (60 + c.rn), 0.0) AS rrf "
        "FROM (SELECT * FROM bmr WHERE rn <= 100) b "
        "FULL JOIN (SELECT * FROM cr WHERE rn <= 100) c "
        "USING (doc_id)) "
        "SELECT doc_id, rrf FROM fused ORDER BY rrf DESC, doc_id "
        "LIMIT 50")


def q_fuzzy_name_pairs(sf_dir: str):
    """Approximate-string join: supplier-name pairs within the same
    nation at Levenshtein distance <= 2 — the record-linkage /
    entity-resolution primitive (the reference fuzzy-matches location
    names with substring heuristics, enhanced-deduplication.service.js;
    stages/joins.py edit_distance_pairs runs ONE blocking-key hash
    exchange + a banded Ukkonen DP vectorized across the pair axis —
    loops over string positions x band width, never over pairs; the
    length-difference prefilter kills most candidates before the DP).
    Oracle: the blocked self-join with DuckDB's levenshtein() —
    integer-exact, fuzzed against a reference DP in pytest."""
    from ..stages.joins import edit_distance_pairs
    ds = _rp(sf_dir, "supplier",
             columns=["s_suppkey", "s_name", "s_nationkey"])
    out = edit_distance_pairs(ds, "s_nationkey", "s_name", "s_suppkey",
                              max_dist=2)
    # O(pairs) result; concat to a schema-carrying Table (Ray iteration
    # skips empty blocks, so an all-empty Dataset loses its columns)
    tabs = [pa.table(b) for b in out.iter_batches(batch_format="pyarrow")]
    if not tabs:
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64()),
                         "dist": pa.array([], pa.int64())})
    return pa.concat_tables(tabs).select(["id_a", "id_b", "dist"])


_FUZZY_PAIRS_SQL = (
    "SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b, "
    "levenshtein(a.s_name, b.s_name)::BIGINT AS dist "
    "FROM supplier a JOIN supplier b "
    "ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey "
    "WHERE levenshtein(a.s_name, b.s_name) <= 2 "
    "ORDER BY id_a, id_b")


def q_inverted_index(sf_dir: str):
    """Bulk inverted-index build over documents (min_df=2): (term, df,
    postings) with postings the comma-joined ascending doc_id list —
    the retrieval-infrastructure job behind bm25/tfidf (those
    broadcast the small (word, df) dimension; this materializes the
    full posting lists; stages/aggregates.py build_inverted_index:
    per-batch distinct (term, id) emit + ONE groupby(term) — the
    honest O(term-doc pairs) indexing shuffle)."""
    from ..stages.aggregates import build_inverted_index
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    return build_inverted_index(ds, min_df=2)


_INV_INDEX_SQL = (
    "WITH toks AS (SELECT DISTINCT doc_id, "
    "unnest(regexp_extract_all(lower(text), '[0-9a-z_]+')) AS term "
    "FROM documents) "
    "SELECT term, count(*)::BIGINT AS df, "
    "string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS postings "
    "FROM toks GROUP BY term HAVING count(*) >= 2 ORDER BY term")


def q_cohort_retention(sf_dir: str):
    """Cohort retention matrix over events: distinct users active in
    week cohort+offset grouped by first-seen week (Monday-floored,
    == date_trunc('week')) — the product-analytics classic next to
    funnel/session (stages/windows.py cohort_retention: per-batch
    (user, week) distinct combiner + ONE user-keyed exchange computing
    cohort AND activity partials together — no join; driver merges
    O(partitions x weeks^2) partials)."""
    from ..stages.windows import cohort_retention
    ds = _rp(sf_dir, "events", columns=["user_id", "ts"])
    return cohort_retention(ds)


_COHORT_SQL = (
    "WITH uw AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS aw "
    "FROM events), "
    "fs AS (SELECT user_id, MIN(aw) AS cw FROM uw GROUP BY user_id) "
    "SELECT cw AS cohort_week, "
    "(date_diff('day', cw, aw) // 7)::BIGINT AS week_offset, "
    "count(*)::BIGINT AS n_users "
    "FROM uw JOIN fs USING (user_id) GROUP BY cw, aw "
    "ORDER BY cohort_week, week_offset")


def q_ols_by_flag(sf_dir: str):
    """Per-returnflag OLS fit extendedprice_cents = slope*quantity +
    intercept — grouped linear regression next to corr_lineitem
    (stages/aggregates.py group_ols: per-batch exact-integer
    sufficient-statistic combiner, driver merges O(batches x keys)
    rows with Python bigints; floats appear only in two correctly-
    rounded int->double conversions and one division, mirrored
    HUGEINT-for-HUGEINT by the oracle — bit-exact, no float-sum
    order anywhere)."""
    from ..stages.aggregates import group_ols
    ds = _rp(sf_dir, "lineitem",
             columns=["l_returnflag", "l_quantity", "l_extendedprice"])
    return group_ols(ds, "l_returnflag", "l_quantity",
                     "l_extendedprice", x_scale=1, y_scale=100)


_OLS_SQL = (
    "WITH b AS (SELECT l_returnflag, CAST(l_quantity AS HUGEINT) AS x, "
    "CAST(round(l_extendedprice*100) AS HUGEINT) AS y FROM lineitem), "
    "s AS (SELECT l_returnflag, count(*)::HUGEINT AS n, sum(x) AS sx, "
    "sum(y) AS sy, sum(x*x) AS sxx, sum(x*y) AS sxy FROM b "
    "GROUP BY l_returnflag) "
    "SELECT l_returnflag, "
    "(n*sxy - sx*sy)::DOUBLE / (n*sxx - sx*sx)::DOUBLE AS slope, "
    "(sy::DOUBLE - ((n*sxy - sx*sy)::DOUBLE / (n*sxx - sx*sx)::DOUBLE) "
    "* sx::DOUBLE) / n::DOUBLE AS intercept "
    "FROM s ORDER BY l_returnflag")


def q_quantize_embeddings(sf_dir: str):
    """Symmetric int8 quantization of the embeddings table (the
    vector-store compression layout, 4x vs float32; stages/
    similarity.py quantize_embeddings — stateless flattened map, no
    shuffle): q = round_half_away(x*127/max|x|) per vector. Exact:
    float32->double widening, one multiply + one divide, half-away
    rounding == DuckDB round()."""
    from ..stages.similarity import quantize_embeddings
    ds = _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return quantize_embeddings(ds)


_QUANT_SQL = (
    "WITH m AS (SELECT vec_id, embedding, "
    "list_max(list_transform(embedding, x -> abs(x)))::DOUBLE "
    "AS maxabs FROM embeddings) "
    "SELECT vec_id, i - 1 AS dim_idx, "
    "CASE WHEN maxabs = 0 THEN 0 ELSE "
    "CAST(round((embedding[i]::DOUBLE * 127.0) / maxabs) AS BIGINT) "
    "END AS q, maxabs "
    "FROM m, UNNEST(generate_series(1, len(embedding))) AS t(i) "
    "ORDER BY vec_id, dim_idx")


def q_l2_normalize(sf_dir: str):
    """Unit-L2 normalization of the embeddings table (the cosine-prep
    ingest step; stages/similarity.py l2_normalize — stateless
    flattened map, no shuffle). Bit-exact: the squared-norm
    accumulates SEQUENTIALLY across dimensions, which is exactly
    DuckDB's left-to-right list_sum fold (numpy's pairwise .sum
    differs in the last ulp and would fail the gate); sqrt + divide
    are correctly-rounded IEEE."""
    from ..stages.similarity import l2_normalize
    ds = _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return l2_normalize(ds)


_L2NORM_SQL = (
    "WITH m AS (SELECT vec_id, embedding, "
    "list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)) "
    "AS n2 FROM embeddings) "
    "SELECT vec_id, i - 1 AS dim_idx, "
    "CASE WHEN n2 = 0 THEN 0.0 ELSE "
    "embedding[i]::DOUBLE / sqrt(n2) END AS nval "
    "FROM m, UNNEST(generate_series(1, len(embedding))) AS t(i) "
    "ORDER BY vec_id, dim_idx")


def q_checksum_events(sf_dir: str):
    """Order-independent 63-bit content checksum of
    (event_id, event_type) — the replication/migration integrity
    primitive next to profile_events (stages/relational.py
    table_checksum: XOR of masked md5_low64 row hashes — commutative,
    so a pure per-batch combiner, driver XORs O(batches) partials;
    no shuffle). One row (checksum, n_rows); the md5 convention is
    the fingerprint/simhash twin's."""
    from ..stages.relational import table_checksum
    ds = _rp(sf_dir, "events", columns=["event_id", "event_type"])
    return table_checksum(ds, ["event_id", "event_type"])


_CHECKSUM_SQL = (
    "SELECT bit_xor((md5_number_lower(event_id::VARCHAR || ':' || "
    "event_type) & 9223372036854775807::UBIGINT)::BIGINT) "
    "AS checksum, count(*)::BIGINT AS n_rows FROM events")


def q_session_stats(sf_dir: str):
    """Per-SESSION statistics under 30-min gap sessionization —
    the detail view session_counts collapses (stages/windows.py
    session_stats: ONE user-keyed exchange, segmented-cumsum session
    ids, O(sessions) rows from the partitions). duration_us is the
    exact integer microsecond span — no floats anywhere."""
    from ..stages.windows import session_stats
    ds = _rp(sf_dir, "events",
             columns=["user_id", "ts", "event_id"])
    return session_stats(ds)


_SESSION_STATS_SQL = (
    "WITH o AS (SELECT user_id, ts, event_id, "
    "CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) <= 1800000000 "
    "THEN 0 ELSE 1 END AS brk FROM events "
    "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
    "s AS (SELECT user_id, ts, "
    "sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id "
    "ROWS UNBOUNDED PRECEDING) AS sid FROM o) "
    "SELECT user_id, sid::BIGINT AS session_id, "
    "count(*)::BIGINT AS n_events, "
    "(epoch_us(max(ts)) - epoch_us(min(ts)))::BIGINT AS duration_us "
    "FROM s GROUP BY user_id, sid ORDER BY user_id, sid")


def q_kendall_events(sf_dir: str):
    """Kendall's tau-b of (user_id, value) per event type — the
    rank-correlation sibling of spearman_by_flag (stages/
    aggregates.py kendall_by_group: every sufficient statistic an
    exact integer, discordant pairs via an O(n log^2 n) VECTORIZED
    merge inversion count, two sqrts + one division — bit-exact;
    y unscaled: tau depends only on order/ties, which raw doubles
    carry exactly). Oracle: the canonical O(n^2) pair join
    (gate-scale groups only)."""
    from ..stages.aggregates import kendall_by_group
    ds = _rp(sf_dir, "events",
             columns=["event_type", "user_id", "value"])
    return kendall_by_group(ds, "event_type", "user_id", "value",
                            x_scale=1, y_scale=None)


_KENDALL_SQL = (
    "WITH b AS (SELECT event_type AS k, event_id, "
    "CAST(user_id AS HUGEINT) AS x, value AS y FROM events), "
    "p AS (SELECT b1.k, "
    "CASE WHEN (b1.x < b2.x AND b1.y < b2.y) "
    "OR (b1.x > b2.x AND b1.y > b2.y) THEN 1 ELSE 0 END AS con, "
    "CASE WHEN (b1.x < b2.x AND b1.y > b2.y) "
    "OR (b1.x > b2.x AND b1.y < b2.y) THEN 1 ELSE 0 END AS dis, "
    "CASE WHEN b1.x = b2.x THEN 1 ELSE 0 END AS tx, "
    "CASE WHEN b1.y = b2.y THEN 1 ELSE 0 END AS ty "
    "FROM b b1 JOIN b b2 ON b1.k = b2.k "
    "AND b1.event_id < b2.event_id), "
    "s AS (SELECT k, count(*)::HUGEINT AS n0, "
    "sum(con)::HUGEINT AS c, sum(dis)::HUGEINT AS d, "
    "sum(tx)::HUGEINT AS n1, sum(ty)::HUGEINT AS n2 "
    "FROM p GROUP BY k) "
    "SELECT k AS event_type, (c - d)::DOUBLE "
    "/ (sqrt((n0 - n1)::DOUBLE) * sqrt((n0 - n2)::DOUBLE)) AS tau_b "
    "FROM s ORDER BY k")


def q_ks_click_view(sf_dir: str):
    """Two-sample Kolmogorov-Smirnov distance between click and view
    event values — the distribution-drift detector
    (stages/aggregates.py ks_two_sample: D's numerator is the max of
    EXACT cross-multiplied integers |i*m - j*n|, so no float ECDF
    arithmetic anywhere; distinct-value combiner + one single-key
    exchange; one final division — bit-exact)."""
    from ..stages.aggregates import ks_two_sample
    ds = _rp(sf_dir, "events", columns=["event_type", "value"])
    return ks_two_sample(ds, "event_type", "value", "click", "view")


_KS_SQL = (
    "WITH a AS (SELECT value AS v FROM events "
    "WHERE event_type = 'click'), "
    "b AS (SELECT value AS v FROM events WHERE event_type = 'view'), "
    "u AS (SELECT DISTINCT v FROM "
    "(SELECT v FROM a UNION SELECT v FROM b)), "
    "s AS (SELECT u.v, "
    "(SELECT count(*) FROM a WHERE a.v <= u.v)::HUGEINT AS i, "
    "(SELECT count(*) FROM b WHERE b.v <= u.v)::HUGEINT AS j FROM u), "
    "c AS (SELECT (SELECT count(*) FROM a)::HUGEINT AS n, "
    "(SELECT count(*) FROM b)::HUGEINT AS m) "
    "SELECT n::BIGINT AS n_a, m::BIGINT AS n_b, "
    "max(abs(i*m - j*n))::BIGINT AS d_num, "
    "max(abs(i*m - j*n))::DOUBLE / (n*m)::DOUBLE AS ks "
    "FROM s, c GROUP BY n, m")


def q_chi2_events(sf_dir: str):
    """Chi-square independence statistic of event_type x user-parity
    — the corpus-audit independence test (stages/aggregates.py
    chi2_contingency: integer count/marginal combiner; each cell's
    term is the same fixed float steps both sides, and the cross-cell
    sum folds in SORTED cell order — DuckDB list(term ORDER BY) ->
    list_sum, the sequential fold l2_normalize pinned — bit-exact)."""
    from ..stages.aggregates import chi2_contingency
    ds = _rp(sf_dir, "events", columns=["event_type", "user_id"])

    def par(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"event_type": t.column("event_type"),
                         "par": pa.array([str(x) for x in u % 2])})

    return chi2_contingency(ds.map_batches(par, batch_format="pyarrow"),
                            "event_type", "par")


_CHI2_SQL = (
    "WITH cells AS (SELECT event_type AS r, "
    "(user_id % 2)::VARCHAR AS c, count(*)::BIGINT AS o "
    "FROM events GROUP BY r, c), "
    "m AS (SELECT r, c, o, sum(o) OVER (PARTITION BY r) AS rt, "
    "sum(o) OVER (PARTITION BY c) AS ct, sum(o) OVER () AS n "
    "FROM cells), "
    "t AS (SELECT r, c, "
    "((o::DOUBLE - (rt*ct)::DOUBLE / n::DOUBLE) "
    "* (o::DOUBLE - (rt*ct)::DOUBLE / n::DOUBLE)) "
    "/ ((rt*ct)::DOUBLE / n::DOUBLE) AS term FROM m) "
    "SELECT (SELECT count(DISTINCT r) FROM cells)::BIGINT "
    "AS n_rows_cat, "
    "(SELECT count(DISTINCT c) FROM cells)::BIGINT AS n_cols_cat, "
    "(((SELECT count(DISTINCT r) FROM cells) - 1) "
    "* ((SELECT count(DISTINCT c) FROM cells) - 1))::BIGINT AS dof, "
    "list_sum(list(term ORDER BY r, c)) AS chi2 FROM t")


def q_gini_by_flag(sf_dir: str):
    """Gini inequality of extendedprice per returnflag — the corpus-
    concentration read (stages/aggregates.py gini_by_group: ONE
    groupby shuffle, per-group sort + exact python-int rank dot, one
    float division — bit-exact; tie blocks factor out of the rank
    sum, so row_number tie order is immaterial)."""
    from ..stages.aggregates import gini_by_group
    ds = _rp(sf_dir, "lineitem",
             columns=["l_returnflag", "l_extendedprice"])
    return gini_by_group(ds, "l_returnflag", "l_extendedprice",
                         scale=100)


_GINI_SQL = (
    "WITH b AS (SELECT l_returnflag AS k, "
    "CAST(round(l_extendedprice*100) AS HUGEINT) AS x FROM lineitem), "
    "r AS (SELECT k, x, row_number() OVER ("
    "PARTITION BY k ORDER BY x)::HUGEINT AS i FROM b), "
    "s AS (SELECT k, count(*)::HUGEINT AS n, sum(x) AS sx, "
    "sum(i*x) AS six FROM r GROUP BY k) "
    "SELECT k AS l_returnflag, "
    "(2*six - (n+1)*sx)::DOUBLE / (n*sx)::DOUBLE AS gini "
    "FROM s ORDER BY k")


def q_hhi_events(sf_dir: str):
    """Herfindahl concentration of user activity per event type —
    how dominated each stream is by its heaviest users
    (stages/aggregates.py hhi_by_group: per-batch (group, member)
    count combiner, exact integer sums, one float division —
    bit-exact; no shuffle)."""
    from ..stages.aggregates import hhi_by_group
    ds = _rp(sf_dir, "events", columns=["event_type", "user_id"])
    return hhi_by_group(ds, "event_type", "user_id")


_HHI_SQL = (
    "WITH c AS (SELECT event_type, user_id, count(*)::HUGEINT AS n "
    "FROM events GROUP BY event_type, user_id), "
    "s AS (SELECT event_type, sum(n) AS t, sum(n*n) AS ssq "
    "FROM c GROUP BY event_type) "
    "SELECT event_type, ssq::DOUBLE / (t*t)::DOUBLE AS hhi "
    "FROM s ORDER BY event_type")


def q_spearman_by_flag(sf_dir: str):
    """Spearman rank correlation of (quantity, extendedprice) per
    returnflag — the order-statistics sibling of corr_lineitem
    (stages/aggregates.py spearman_by_group: doubled average ranks
    are INTEGERS even under ties (2r = 2*rank_min + ties - 1), so the
    sufficient statistics are exact int sums and the closed form is
    two sqrts + one division mirrored HUGEINT-for-HUGEINT —
    bit-exact)."""
    from ..stages.aggregates import spearman_by_group
    ds = _rp(sf_dir, "lineitem",
             columns=["l_returnflag", "l_quantity", "l_extendedprice"])
    return spearman_by_group(ds, "l_returnflag", "l_quantity",
                             "l_extendedprice", x_scale=1, y_scale=100)


_SPEARMAN_SQL = (
    "WITH b AS (SELECT l_returnflag AS k, "
    "CAST(l_quantity AS BIGINT) AS x, "
    "CAST(round(l_extendedprice*100) AS BIGINT) AS y FROM lineitem), "
    "r AS (SELECT k, "
    "(2*rank() OVER (PARTITION BY k ORDER BY x) "
    "+ count(*) OVER (PARTITION BY k, x) - 1)::HUGEINT AS rx, "
    "(2*rank() OVER (PARTITION BY k ORDER BY y) "
    "+ count(*) OVER (PARTITION BY k, y) - 1)::HUGEINT AS ry "
    "FROM b), "
    "s AS (SELECT k, count(*)::HUGEINT AS n, sum(rx) AS sx, "
    "sum(ry) AS sy, sum(rx*rx) AS sxx, sum(ry*ry) AS syy, "
    "sum(rx*ry) AS sxy FROM r GROUP BY k) "
    "SELECT k AS l_returnflag, "
    "(n*sxy - sx*sy)::DOUBLE / (sqrt((n*sxx - sx*sx)::DOUBLE) "
    "* sqrt((n*syy - sy*sy)::DOUBLE)) AS rho "
    "FROM s ORDER BY l_returnflag")


def q_sliding_distinct_users(sf_dir: str):
    """Distinct users per 60-min/30-min-hop sliding window — the
    cardinality sibling of sliding_events (stages/windows.py
    sliding_distinct_users: in-batch window explode + per-batch
    distinct (window, user) combiner, ONE grouped count — shuffle
    ships window-user pairs, never events; exact, HLL is the
    documented approximate path at larger window-user volumes)."""
    from ..stages.windows import sliding_distinct_users
    ds = _rp(sf_dir, "events", columns=["ts", "user_id"])
    return sliding_distinct_users(ds)


_SLIDING_DISTINCT_SQL = (
    "WITH h AS (SELECT user_id, "
    "epoch_us(ts) // 1800000000 AS hop FROM events), "
    "w AS (SELECT user_id, "
    "make_timestamp((hop - j) * 1800000000) AS window_start "
    "FROM h, UNNEST([0, 1]) AS t(j)) "
    "SELECT window_start, count(DISTINCT user_id)::BIGINT AS n_users "
    "FROM w GROUP BY window_start ORDER BY window_start")


def q_login_streaks(sf_dir: str):
    """Longest run of consecutive active days per user — the
    engagement-streak classic (stages/windows.py login_streaks: ONE
    user-keyed exchange over per-batch-distinct (user, day) pairs,
    run-break + two reduceat folds, no per-user loop; exact integer
    epoch-day arithmetic). Oracle: the day-minus-row_number
    gaps-and-islands trick."""
    from ..stages.windows import login_streaks
    ds = _rp(sf_dir, "events", columns=["user_id", "ts"])
    return login_streaks(ds)


_STREAKS_SQL = (
    "WITH d AS (SELECT DISTINCT user_id, "
    "date_diff('day', TIMESTAMP '1970-01-01', "
    "date_trunc('day', ts))::BIGINT AS day FROM events), "
    "r AS (SELECT user_id, day, day - row_number() OVER ("
    "PARTITION BY user_id ORDER BY day) AS grp FROM d) "
    "SELECT user_id, max(cnt)::BIGINT AS longest_streak FROM ("
    "SELECT user_id, grp, count(*) AS cnt FROM r "
    "GROUP BY user_id, grp) GROUP BY user_id ORDER BY user_id")


def q_impute_median(sf_dir: str):
    """Median imputation of a synthetically-nulled value column
    (every 7th event_id nulled identically on both sides): NULLs
    fill with their event_type's quantile_disc(0.5) of the non-null
    values (stages/aggregates.py impute_median_by_group: ONE groupby
    shuffle, order-statistic fill — bit-exact where a mean fill
    would ride on float-sum order). The data-cleaning member of the
    curation family."""
    from ..stages.aggregates import impute_median_by_group
    ds = _rp(sf_dir, "events",
             columns=["event_id", "event_type", "value"])

    def nullify(t: pa.Table) -> pa.Table:
        e = t.column("event_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        v = t.column("value").to_numpy(zero_copy_only=False) \
            .astype(np.float64).copy()
        v[e % 7 == 0] = np.nan
        return pa.table({"event_id": pa.array(e),
                         "event_type": t.column("event_type"),
                         "value": pa.array(v)})

    return impute_median_by_group(
        ds.map_batches(nullify, batch_format="pyarrow"),
        "event_type", "value", "event_id")


_IMPUTE_SQL = (
    "WITH b AS (SELECT event_id, event_type, "
    "CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v "
    "FROM events), "
    "m AS (SELECT event_type, quantile_disc(v, 0.5) AS med "
    "FROM b WHERE v IS NOT NULL GROUP BY event_type) "
    "SELECT b.event_id, b.event_type, "
    "COALESCE(b.v, m.med) AS v_filled "
    "FROM b JOIN m USING (event_type) ORDER BY event_id")


def q_conversion_within(sf_dir: str):
    """Time-bounded conversion: per user, purchases preceded by a
    click of the same user within 1 hour (window (t-1h, t]) — the
    funnel family's time-constrained member (stages/windows.py
    conversion_within: ONE user-keyed exchange, two global
    searchsorted probes on a dense-coded (user, ts-rank) key — no
    per-user loop). Oracle: the correlated EXISTS form."""
    from ..stages.windows import conversion_within
    ds = _rp(sf_dir, "events",
             columns=["user_id", "ts", "event_type", "event_id"])
    return conversion_within(ds)


_CONVERSION_SQL = (
    "SELECT p.user_id, count(*)::BIGINT AS n_targets, "
    "sum(CASE WHEN EXISTS (SELECT 1 FROM events c "
    "WHERE c.user_id = p.user_id AND c.event_type = 'click' "
    "AND c.ts <= p.ts "
    "AND c.ts > p.ts - INTERVAL 1 HOUR) THEN 1 ELSE 0 END)::BIGINT "
    "AS n_converted "
    "FROM events p WHERE p.event_type = 'purchase' "
    "GROUP BY p.user_id ORDER BY p.user_id")


def q_mode_users(sf_dir: str):
    """Modal event_type per user with a DETERMINISTIC tie-break
    (highest count, then smallest value) — SQL's mode() leaves ties
    unspecified, so the oracle is the explicit row_number form
    (stages/aggregates.py mode_by_group: per-batch (key,val)-count
    combiner, driver merges O(batches x pairs), no shuffle)."""
    from ..stages.aggregates import mode_by_group
    ds = _rp(sf_dir, "events", columns=["user_id", "event_type"])
    return mode_by_group(ds, "user_id", "event_type")


_MODE_SQL = (
    "SELECT user_id, event_type AS mode_val, n FROM ("
    "SELECT user_id, event_type, count(*)::BIGINT AS n, "
    "row_number() OVER (PARTITION BY user_id "
    "ORDER BY count(*) DESC, event_type ASC) AS rn "
    "FROM events GROUP BY user_id, event_type) "
    "WHERE rn = 1 ORDER BY user_id")


def q_weighted_median(sf_dir: str):
    """Lower weighted median of event value per type, weight
    1 + event_id % 5 — the robust center for reweighted corpora
    (stages/aggregates.py weighted_median_by_group: ONE groupby
    shuffle, per-group sort + reduceat + one searchsorted; integer
    cumulative-weight comparison, value copied — exact)."""
    from ..stages.aggregates import weighted_median_by_group
    ds = _rp(sf_dir, "events",
             columns=["event_type", "value", "event_id"])

    def wfn(t: pa.Table) -> np.ndarray:
        e = t.column("event_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return 1 + e % 5

    return weighted_median_by_group(ds, "event_type", "value", wfn)


_WMEDIAN_SQL = (
    "WITH w AS (SELECT event_type, value, "
    "sum(1 + event_id % 5)::BIGINT AS wt FROM events "
    "GROUP BY event_type, value), "
    "c AS (SELECT event_type, value, "
    "sum(wt) OVER (PARTITION BY event_type ORDER BY value "
    "ROWS UNBOUNDED PRECEDING) AS cw, "
    "sum(wt) OVER (PARTITION BY event_type) AS tot FROM w) "
    "SELECT event_type, min(value) AS wmedian FROM c "
    "WHERE 2 * cw >= tot GROUP BY event_type ORDER BY event_type")


def q_scd2_history(sf_dir: str):
    """SCD type-2 history: every event becomes a validity interval
    closed by the same user's next event in (ts, event_id) order,
    final row open (NULL) — the snapshot-history companion to
    merge_upsert's SCD-1 (stages/windows.py scd2_history: ONE
    user-keyed exchange, lexsort + shift, no per-user loop). Epochs
    are exact integer microseconds; value copied, never combined.
    The stage emits NULL valid_to (the honest SCD-2 open-interval
    contract); the GRADED projection coalesces it to -1 so the
    value-hash compare never rides on NaN semantics."""
    from ..stages.windows import scd2_history
    ds = _rp(sf_dir, "events",
             columns=["user_id", "ts", "event_id", "value"])

    def close_open(t: pa.Table) -> pa.Table:
        vt = pc.fill_null(t.column("valid_to").cast(pa.int64()), -1)
        return t.set_column(t.schema.get_field_index("valid_to"),
                            "valid_to", vt)

    return scd2_history(ds).map_batches(close_open,
                                        batch_format="pyarrow")


_SCD2_SQL = (
    "SELECT user_id, event_id, value, "
    "epoch_us(ts)::BIGINT AS valid_from, "
    "COALESCE(epoch_us(lead(ts) OVER (PARTITION BY user_id "
    "ORDER BY ts, event_id)), -1)::BIGINT AS valid_to "
    "FROM events ORDER BY event_id")


def q_histogram_events(sf_dir: str):
    """Per-event-type 10-bin equi-width histogram over the global
    value range (stages/aggregates.py histogram_by_group: two
    combiner passes — O(batches) (min,max) fold, then broadcast
    (lo,hi) + per-batch (key,bin) counts, no shuffle). Bin
    assignment is bit-exact: selections + the same correctly-rounded
    float steps in the same order as the twin."""
    from ..stages.aggregates import histogram_by_group
    ds = _rp(sf_dir, "events", columns=["event_type", "value"])
    return histogram_by_group(ds, "event_type", "value", bins=10)


_HISTOGRAM_SQL = (
    "WITH b AS (SELECT min(value) AS lo, max(value) AS hi "
    "FROM events) "
    "SELECT event_type, "
    "least(floor(((value - lo) * 10.0) / (hi - lo)), 9.0)::BIGINT "
    "AS bin, count(*)::BIGINT AS n "
    "FROM events, b GROUP BY event_type, bin "
    "ORDER BY event_type, bin")


def q_partitioned_sink(sf_dir: str):
    """Resumable hive-partitioned sink round-trip: documents written
    under lang=<v>/ partitions with per-partition _COMPLETE markers
    (sources/storage.py write_partitioned_resumable — a re-run skips
    marked partitions and deletes crashed partials, so the sink is
    exactly-once per partition; the gate's own second run at the same
    sf exercises the skip path), then read back through the hive
    scan. Oracle: the identity projection — the round-trip must lose
    and invent nothing."""
    import hashlib
    import os

    from ..sources.storage import write_partitioned_resumable
    out = os.path.join(
        "/tmp", "wcr_sink_"
        + hashlib.md5(sf_dir.encode()).hexdigest()[:10])
    ds = _rp(sf_dir, "documents", columns=["doc_id", "lang"])
    write_partitioned_resumable(ds, out, "lang")
    back = rd.read_parquet(out)

    def proj(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("doc_id").cast(pa.int64()),
                         "lang": t.column("lang").cast(pa.string())})

    return back.map_batches(proj, batch_format="pyarrow")


_PARTITIONED_SINK_SQL = (
    "SELECT doc_id, lang FROM documents ORDER BY doc_id")


def q_interval_union(sf_dir: str):
    """Per-user union length of overlapping intervals (each event
    opens [ts, ts + (1 + event_id % 20) min)) — the time-on-site /
    coverage sweep where overlaps must not double count
    (stages/windows.py interval_union: ONE user-keyed exchange,
    vectorized sweep via pandas' C-level grouped cummax; all integer
    microseconds). Oracle: the same sweep as windowed SQL — running
    MAX(e) OVER 1-PRECEDING breaks islands, running SUM numbers
    them, two GROUP BYs finish."""
    from ..stages.windows import interval_union
    ds = _rp(sf_dir, "events",
             columns=["user_id", "ts", "event_id"])
    return interval_union(ds)


_INTERVAL_UNION_SQL = (
    "WITH iv AS (SELECT user_id, event_id, epoch_us(ts) AS s, "
    "epoch_us(ts) + (1 + event_id % 20) * 60000000 AS e FROM events), "
    "o AS (SELECT user_id, s, e, CASE WHEN s > max(e) OVER ("
    "PARTITION BY user_id ORDER BY s, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) "
    "THEN 1 ELSE 0 END AS brk, event_id FROM iv), "
    "s2 AS (SELECT user_id, s, e, sum(brk) OVER ("
    "PARTITION BY user_id ORDER BY s, event_id "
    "ROWS UNBOUNDED PRECEDING) AS iid FROM o), "
    "g AS (SELECT user_id, iid, max(e) - min(s) AS len FROM s2 "
    "GROUP BY user_id, iid) "
    "SELECT user_id, count(*)::BIGINT AS n_islands, "
    "sum(len)::BIGINT AS covered_us FROM g "
    "GROUP BY user_id ORDER BY user_id")


def q_unpivot_lineitem(sf_dir: str):
    """Wide-to-long UNPIVOT of four lineitem measures — the
    feature-table reshape inverse to pivot_lineitem
    (stages/relational.py unpivot: stateless vectorized repeat/tile
    map, no shuffle; values copied, never combined — doubles exact).
    Oracle: stacked UNION ALL (the portable UNPIVOT form)."""
    from ..stages.relational import unpivot
    ds = _rp(sf_dir, "lineitem",
             columns=["l_orderkey", "l_linenumber", "l_quantity",
                      "l_extendedprice", "l_discount", "l_tax"])
    return unpivot(ds, ["l_orderkey", "l_linenumber"],
                   ["l_quantity", "l_extendedprice", "l_discount",
                    "l_tax"])


_UNPIVOT_SQL = (
    "SELECT l_orderkey, l_linenumber, measure, val FROM ("
    "SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, "
    "l_quantity::DOUBLE AS val FROM lineitem "
    "UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice', "
    "l_extendedprice::DOUBLE FROM lineitem "
    "UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount', "
    "l_discount::DOUBLE FROM lineitem "
    "UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax', "
    "l_tax::DOUBLE FROM lineitem) "
    "ORDER BY l_orderkey, l_linenumber, measure")


def q_transition_counts(sf_dir: str):
    """First-order Markov transition counts over per-user event
    sequences — the behavior-flow primitive next to funnel/session
    (stages/windows.py transition_counts: ONE user-keyed exchange,
    partition kernel lexsorts each user's history once and reduces to
    O(states^2) local counts; sequence total-ordered by (ts, event_id)
    so the oracle's lead() window is deterministic)."""
    from ..stages.windows import transition_counts
    ds = _rp(sf_dir, "events",
             columns=["user_id", "ts", "event_type", "event_id"])
    return transition_counts(ds)


_TRANSITION_SQL = (
    "WITH s AS (SELECT user_id, event_type, lead(event_type) OVER "
    "(PARTITION BY user_id ORDER BY ts, event_id) AS nxt FROM events) "
    "SELECT event_type AS src, nxt AS dst, count(*)::BIGINT AS n "
    "FROM s WHERE nxt IS NOT NULL GROUP BY src, dst ORDER BY src, dst")


def q_bigram_lm(sf_dir: str):
    """Bigram conditional-probability table (n >= 2): p(w2 | w1) =
    pair count / leading count — the count-based n-gram LM companion
    to pmi_pairs and lm_score (stages/aggregates.py bigram_lm:
    per-batch pair + leading-total Counter combiners folded into ONE
    groupby(w1) shuffle via sentinel rows; p is one integer division,
    bit-exact vs SQL)."""
    from ..stages.aggregates import bigram_lm
    ds = _rp(sf_dir, "documents", columns=["text"])
    return bigram_lm(ds, min_count=2)


_BIGRAM_SQL = (
    "WITH toks AS (SELECT doc_id, "
    "regexp_extract_all(lower(text), '[0-9a-z_]+') AS ws "
    "FROM documents), "
    "bg AS (SELECT ws[i] AS w1, ws[i+1] AS w2 FROM toks, "
    "UNNEST(generate_series(1, len(ws)-1)) AS t(i)), "
    "pc AS (SELECT w1, w2, count(*)::BIGINT AS n FROM bg "
    "GROUP BY w1, w2), "
    "lt AS (SELECT w1, count(*)::BIGINT AS total FROM bg GROUP BY w1) "
    "SELECT pc.w1, pc.w2, pc.n, pc.n::DOUBLE / lt.total::DOUBLE AS p "
    "FROM pc JOIN lt USING (w1) WHERE pc.n >= 2 ORDER BY w1, w2")


def q_geo_near_pairs(sf_dir: str):
    """Spatial near-pair self-join over md5-derived customer
    coordinates, radius 2 deg under the equirectangular metric
    (cos_ref=0.75 literal) — the location-radius primitive the
    reference's geo data calls for (it dedups locations by exact
    coordinate match only; stages/joins.py grid_distance_pairs: 3x3
    grid-cell replication + ONE keyed exchange, each pair scored once
    in its lexicographically-smaller home cell). The metric is pure
    subtract/multiply/add, no trig or sqrt — bit-identical to the
    oracle's quadratic self-join."""
    from ..stages.joins import grid_distance_pairs
    from ..stages.aggregates import md5_low64

    def coords(t: pa.Table) -> pa.Table:
        ids = t.column("c_custkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        la = np.array([md5_low64(str(i)) % 1800 for i in ids.tolist()],
                      np.float64) / 10.0 - 90.0
        lo = np.array([md5_low64("x" + str(i)) % 3600
                       for i in ids.tolist()],
                      np.float64) / 10.0 - 180.0
        return pa.table({"id": pa.array(ids), "la": pa.array(la),
                         "lo": pa.array(lo)})

    pts = _rp(sf_dir, "customer", columns=["c_custkey"]) \
        .map_batches(coords, batch_format="pyarrow")
    return grid_distance_pairs(pts, "id", "la", "lo",
                               radius_deg=2.0, cos_ref=0.75)


_GEO_SQL = (
    "WITH pts AS (SELECT c_custkey AS id, "
    "(md5_number_lower(c_custkey::VARCHAR) % 1800) / 10.0 - 90.0 "
    "AS la, "
    "(md5_number_lower('x' || c_custkey::VARCHAR) % 3600) / 10.0 "
    "- 180.0 AS lo FROM customer) "
    "SELECT a.id AS id_a, b.id AS id_b, "
    "(a.la-b.la)*(a.la-b.la) + ((a.lo-b.lo)*0.75)*((a.lo-b.lo)*0.75) "
    "AS dist2 FROM pts a JOIN pts b ON a.id < b.id "
    "WHERE (a.la-b.la)*(a.la-b.la) + "
    "((a.lo-b.lo)*0.75)*((a.lo-b.lo)*0.75) <= 4.0 "
    "ORDER BY id_a, id_b")


def q_winsorize_events(sf_dir: str):
    """Per-group winsorization: clip each event's value into its own
    event_type's [p5, p95] quantile_disc range — the robust
    outlier-taming normalizer next to zscore_events
    (stages/aggregates.py winsorize_by_group: ONE column-pruned
    groupby shuffle for the O(groups) threshold table, broadcast once,
    corpus streams through a vectorized clip). Values are copied via
    min/max, never combined — float-exact vs least/greatest over
    quantile_disc windows."""
    from ..stages.aggregates import winsorize_by_group
    ds = _rp(sf_dir, "events",
             columns=["event_id", "event_type", "value"])
    return winsorize_by_group(ds, "event_type", "value", "event_id",
                              0.05, 0.95)


_WINSORIZE_SQL = (
    "SELECT event_id, event_type, "
    "least(greatest(value, lo), hi) AS v_clip FROM ("
    "SELECT event_id, event_type, value, "
    "quantile_disc(value, 0.05) OVER (PARTITION BY event_type) AS lo, "
    "quantile_disc(value, 0.95) OVER (PARTITION BY event_type) AS hi "
    "FROM events) ORDER BY event_id")


def q_mad_outliers(sf_dir: str):
    """Per-group MAD outlier detection: events whose |value - median|
    exceeds 3x their event_type's median absolute deviation — the
    heavy-tail-robust gate where a stddev threshold would be inflated
    by the very outliers it hunts (stages/aggregates.py mad_outliers:
    ONE groupby shuffle, both order statistics and the flags computed
    group-locally, output is the outlier rows only). Bit-exact: two
    quantile_disc order statistics, one subtract+abs, one
    multiply+compare."""
    from ..stages.aggregates import mad_outliers
    ds = _rp(sf_dir, "events",
             columns=["event_id", "event_type", "value"])
    return mad_outliers(ds, "event_type", "value", "event_id", k=3.0)


_MAD_SQL = (
    "WITH med AS (SELECT event_type, quantile_disc(value, 0.5) AS med "
    "FROM events GROUP BY event_type), "
    "dev AS (SELECT e.event_id, e.event_type, e.value, "
    "abs(e.value - m.med) AS ad, m.med FROM events e "
    "JOIN med m USING (event_type)), "
    "mad AS (SELECT event_type, quantile_disc(ad, 0.5) AS mad "
    "FROM dev GROUP BY event_type) "
    "SELECT d.event_id, d.event_type, d.value, d.med, m.mad "
    "FROM dev d JOIN mad m USING (event_type) "
    "WHERE d.ad > 3.0 * m.mad ORDER BY d.event_id")


def q_percent_rank_events(sf_dir: str):
    """Per-group percent_rank of event value (rank-min ties,
    (rank-1)/(n-1)) — the distribution-free [0,1] score normalizer
    (stages/windows.py percent_rank_per_group: ONE groupby shuffle,
    per-group numpy sort + searchsorted). pr is the single double
    division DuckDB's percent_rank performs — bit-exact."""
    from ..stages.windows import percent_rank_per_group
    ds = _rp(sf_dir, "events",
             columns=["event_id", "event_type", "value"])
    return percent_rank_per_group(ds, "event_type", "value", "event_id")


_PRANK_SQL = (
    "SELECT event_id, event_type, percent_rank() OVER ("
    "PARTITION BY event_type ORDER BY value) AS pr "
    "FROM events ORDER BY event_id")


def q_skyline_parts(sf_dir: str):
    """Pareto-optimal skyline of the part table: parts no other part
    beats on BOTH retail price and size (minimizing) — the
    multi-criteria shortlist operator (stages/relational.py
    skyline_2d: the skyline is an algebraic combiner, so one
    map_batches local-skyline pass + one final pass over the tiny
    survivor union; no shuffle, comparisons only — doubles exact).
    Oracle: the canonical NOT EXISTS dominance query."""
    from ..stages.relational import skyline_2d
    ds = _rp(sf_dir, "part",
             columns=["p_partkey", "p_retailprice", "p_size"])
    return skyline_2d(ds, "p_retailprice", "p_size")


_SKYLINE_SQL = (
    "SELECT p_partkey, p_retailprice, p_size FROM part p "
    "WHERE NOT EXISTS (SELECT 1 FROM part q "
    "WHERE q.p_retailprice <= p.p_retailprice "
    "AND q.p_size <= p.p_size "
    "AND (q.p_retailprice < p.p_retailprice "
    "OR q.p_size < p.p_size)) "
    "ORDER BY p_partkey")


def q_revenue_by_nation(sf_dir: str):
    """TPC-H Q5-shaped star join: two-year revenue by EUROPE nation
    where the supplier and the ordering customer share the nation —
    the composed multi-table plan (6 tables) demonstrating join
    PLANNING rather than a single join op: region⋈nation and supplier
    collapse to broadcast lookups applied inside the lineitem scan
    (dimension tables — never shuffled), customer is broadcast into
    the orders scan (a dimension at gate scale; at 100 TB this leg
    becomes one more custkey-keyed exchange, same kernel shape), and
    the single all-to-all is ONE orderkey-keyed raw-task exchange
    whose lineitem side was pre-aggregated per (orderkey, s_nation)
    in-batch — shuffle volume is O(distinct orderkeys), never line
    items. Revenue is summed in integer fixed-point
    (price-cents x (100 - discount-pct)) — no float-sum ordering;
    the driver folds O(partitions x nations) partials."""
    from ..stages.shuffles import int_part_map

    nat = _rp(sf_dir, "nation",
              columns=["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _rp(sf_dir, "region",
              columns=["r_regionkey", "r_name"]).to_pandas()
    euro = set(reg.loc[reg["r_name"] == "EUROPE", "r_regionkey"])
    nat = nat[nat["n_regionkey"].isin(euro)]
    names = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))

    sup = _rp(sf_dir, "supplier",
              columns=["s_suppkey", "s_nationkey"]).to_pandas()
    sk = np.sort(sup["s_suppkey"].to_numpy(np.int64))
    so = np.argsort(sup["s_suppkey"].to_numpy(np.int64), kind="stable")
    sn = sup["s_nationkey"].to_numpy(np.int64)[so]
    sup_ref = ray.put((sk, sn, np.array(sorted(names), np.int64)))

    cus = _rp(sf_dir, "customer",
              columns=["c_custkey", "c_nationkey"]).to_pandas()
    ck = np.sort(cus["c_custkey"].to_numpy(np.int64))
    co = np.argsort(cus["c_custkey"].to_numpy(np.int64), kind="stable")
    cn = cus["c_nationkey"].to_numpy(np.int64)[co]
    cus_ref = ray.put((ck, cn))

    import datetime as _dt
    lo = _dt.datetime(1996, 1, 1)
    hi = _dt.datetime(1998, 1, 1)

    def line_partials(t: pa.Table) -> pa.Table:
        skv, snv, eu = ray.get(sup_ref)
        okey = t.column("l_orderkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        supk = t.column("l_suppkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)
        s_nat = snv[np.searchsorted(skv, supk)]
        keep = np.isin(s_nat, eu)
        okey, s_nat = okey[keep], s_nat[keep]
        rev = (np.round(price[keep] * 100).astype(np.int64)
               * (100 - np.round(disc[keep] * 100).astype(np.int64)))
        # in-batch partial: one row per (orderkey, s_nation)
        o = np.lexsort((s_nat, okey))
        okey, s_nat, rev = okey[o], s_nat[o], rev[o]
        new = np.ones(len(okey), bool)
        new[1:] = (okey[1:] != okey[:-1]) | (s_nat[1:] != s_nat[:-1])
        st = np.nonzero(new)[0]
        revp = np.add.reduceat(rev, st) if len(st) else rev
        return pa.table({"gkey": pa.array(okey[st]),
                         "nat": pa.array(s_nat[st]),
                         "rev": pa.array(revp),
                         "tag": pa.array(np.zeros(len(st), np.int8))})

    def order_nat(t: pa.Table) -> pa.Table:
        ckv, cnv = ray.get(cus_ref)
        od = t.column("o_orderdate").to_numpy(zero_copy_only=False)
        keep = (od >= np.datetime64(lo)) & (od < np.datetime64(hi))
        okey = t.column("o_orderkey").to_numpy(
            zero_copy_only=False).astype(np.int64)[keep]
        cust = t.column("o_custkey").to_numpy(
            zero_copy_only=False).astype(np.int64)[keep]
        c_nat = cnv[np.searchsorted(ckv, cust)]
        return pa.table({"gkey": pa.array(okey),
                         "nat": pa.array(c_nat),
                         "rev": pa.array(np.zeros(len(okey), np.int64)),
                         "tag": pa.array(np.ones(len(okey), np.int8))})

    li = _rp(sf_dir, "lineitem",
             columns=["l_orderkey", "l_suppkey",
                      "l_extendedprice", "l_discount"]) \
        .map_batches(line_partials, batch_format="pyarrow")
    od = _rp(sf_dir, "orders",
             columns=["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(order_nat, batch_format="pyarrow")

    def match_sum(df: pd.DataFrame) -> pd.DataFrame:
        tag = df["tag"].to_numpy()
        own, fol = df[tag == 1], df[tag == 0]
        z = np.array([], np.int64)
        if not len(fol) or not len(own):
            return pd.DataFrame({"nat": z, "rev": z})
        ok = own["gkey"].to_numpy(np.int64)
        onat = own["nat"].to_numpy(np.int64)
        o = np.argsort(ok, kind="stable")
        ok, onat = ok[o], onat[o]
        g = fol["gkey"].to_numpy(np.int64)
        idx = np.searchsorted(ok, g)
        fnd = np.zeros(len(g), bool)
        inb = idx < len(ok)
        fnd[inb] = ok[idx[inb]] == g[inb]
        # join condition: the supplier nation == the customer nation
        fnd[fnd] &= (fol["nat"].to_numpy(np.int64)[fnd]
                     == onat[idx[fnd]])
        nat = fol["nat"].to_numpy(np.int64)[fnd]
        rev = fol["rev"].to_numpy(np.int64)[fnd]
        o2 = np.argsort(nat, kind="stable")
        nat, rev = nat[o2], rev[o2]
        new = np.ones(len(nat), bool)
        new[1:] = nat[1:] != nat[:-1]
        st = np.nonzero(new)[0]
        return pd.DataFrame({"nat": nat[st],
                             "rev": np.add.reduceat(rev, st)
                             if len(st) else rev})

    acc: dict[int, int] = {}
    out = int_part_map(li.union(od), "gkey", match_sum,
                       num_partitions=32)
    for b in out.iter_batches(batch_format="pyarrow"):
        tb = pa.table(b)
        for n, r in zip(tb.column("nat").to_pylist(),
                        tb.column("rev").to_pylist()):
            acc[n] = acc.get(n, 0) + r
    ks = sorted(acc, key=lambda n: (-acc[n], names[n]))
    return pa.table({"n_name": pa.array([names[k] for k in ks]),
                     "revenue_fp": pa.array([acc[k] for k in ks],
                                            pa.int64())})


def q_welch_ttest(sf_dir: str):
    """Welch's unequal-variance t-test of l_quantity between every
    pair of returnflag groups — the A/B experiment readout next to
    ols_by_flag (stages/aggregates.py welch_ttest: exact integer
    (n, Sx, Sxx) sufficient-statistic combiner, driver merges
    O(batches x keys) rows with Python bigints; floats appear only in
    correctly-rounded int->double conversions, divisions, one sqrt
    and fixed-order add/multiply chains mirrored HUGEINT-for-HUGEINT
    by the oracle — bit-exact, no float-sum order anywhere)."""
    from ..stages.aggregates import welch_ttest
    ds = _rp(sf_dir, "lineitem",
             columns=["l_returnflag", "l_quantity"])
    return welch_ttest(ds, "l_returnflag", "l_quantity", x_scale=1)


_WELCH_SQL = (
    "WITH b AS (SELECT l_returnflag AS g, "
    "CAST(l_quantity AS HUGEINT) AS x FROM lineitem), "
    "s AS (SELECT g, count(*)::HUGEINT AS n, sum(x) AS sx, "
    "sum(x*x) AS sxx FROM b GROUP BY g), "
    "p AS (SELECT s1.g AS g1, s2.g AS g2, "
    "s1.n::BIGINT AS n1, s2.n::BIGINT AS n2, "
    "s1.sx::DOUBLE / s1.n::DOUBLE AS m1, "
    "s2.sx::DOUBLE / s2.n::DOUBLE AS m2, "
    "((s1.n*s1.sxx - s1.sx*s1.sx)::DOUBLE "
    "/ (s1.n*(s1.n-1))::DOUBLE) / s1.n::DOUBLE AS a, "
    "((s2.n*s2.sxx - s2.sx*s2.sx)::DOUBLE "
    "/ (s2.n*(s2.n-1))::DOUBLE) / s2.n::DOUBLE AS b "
    "FROM s s1 JOIN s s2 ON s1.g < s2.g) "
    "SELECT g1, g2, n1, n2, "
    "(m1 - m2) / sqrt(a + b) AS t_stat, "
    "((a + b) * (a + b)) / (a*a/(n1-1)::DOUBLE "
    "+ b*b/(n2-1)::DOUBLE) AS dof "
    "FROM p ORDER BY g1, g2")


def q_attr_last_touch(sf_dir: str):
    """Last-touch attribution: each purchase event attributed to the
    same user's most recent prior non-purchase event in the (ts,
    event_id) total order — the marketing-attribution primitive next
    to funnel_events/transition_counts (stages/windows.py
    attr_last_touch: ONE user-keyed raw-task exchange, per-partition
    lexsort + segmented max-prefix scan, O(purchases) rows emitted
    from the partitions). Targets with no prior touch drop, matching
    the oracle's NOT NULL filter; ids/types are copied, never
    combined — exact."""
    from ..stages.windows import attr_last_touch
    ds = _rp(sf_dir, "events",
             columns=["event_id", "ts", "user_id", "event_type"])
    return attr_last_touch(ds)


_ATTR_SQL = (
    "SELECT event_id, touch_id, touch_type FROM ("
    "SELECT event_id, event_type, "
    "last_value(CASE WHEN event_type <> 'purchase' THEN event_id END "
    "IGNORE NULLS) OVER w AS touch_id, "
    "last_value(CASE WHEN event_type <> 'purchase' THEN event_type END "
    "IGNORE NULLS) OVER w AS touch_type "
    "FROM events WINDOW w AS (PARTITION BY user_id "
    "ORDER BY ts, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)) "
    "WHERE event_type = 'purchase' AND touch_id IS NOT NULL "
    "ORDER BY event_id")


_REVENUE_SQL = (
    "SELECT n_name, "
    "SUM(CAST(round(l_extendedprice*100) AS BIGINT) "
    "* (100 - CAST(round(l_discount*100) AS BIGINT)))::BIGINT "
    "AS revenue_fp "
    "FROM customer, orders, lineitem, supplier, nation, region "
    "WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey "
    "AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey "
    "AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey "
    "AND r_name = 'EUROPE' "
    "AND o_orderdate >= DATE '1996-01-01' "
    "AND o_orderdate < DATE '1998-01-01' "
    "GROUP BY n_name ORDER BY revenue_fp DESC, n_name")


def q_resample_ffill(sf_dir: str):
    """Per-user hourly forward-fill resampling of the event stream
    (irregular events -> regular grid, values carried from the
    latest event before each hour boundary; ties by event_id) — the
    time-series gap-fill primitive next to the window family
    (stages/windows.py resample_ffill: ONE user-keyed exchange,
    per-user sort + vectorized searchsorted fill, O(user-hours)
    output emitted from the partitions). Values are copied, never
    combined — float-exact vs the ASOF JOIN oracle."""
    from ..stages.windows import resample_ffill
    ds = _rp(sf_dir, "events",
             columns=["user_id", "ts", "value", "event_id"])
    return resample_ffill(ds)


_RESAMPLE_SQL = (
    "WITH ev AS (SELECT user_id, ts, value FROM "
    "(SELECT user_id, ts, value, row_number() OVER "
    "(PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn "
    "FROM events) WHERE rn = 1), "
    "span AS (SELECT user_id, date_trunc('hour', min(ts)) AS h0, "
    "date_trunc('hour', max(ts)) AS h1 FROM events GROUP BY user_id), "
    "hours AS (SELECT user_id, unnest(generate_series(h0, h1, "
    "INTERVAL 1 HOUR)) AS hour FROM span) "
    "SELECT h.user_id, h.hour, e.value FROM hours h "
    "ASOF JOIN ev e ON h.user_id = e.user_id AND "
    "e.ts <= h.hour + INTERVAL 1 HOUR - INTERVAL 1 MICROSECOND "
    "ORDER BY h.user_id, h.hour")


def q_profile_events(sf_dir: str):
    """Expectations-style data-validation profile of the events
    table's numeric columns: (n_rows, n_nulls, min, max) per column —
    the pre-ingestion audit (stages/relational.py profile_columns:
    pure combiner, one partial row per column per batch, no shuffle;
    min/max are selections so floats compare exact)."""
    from ..stages.relational import profile_columns
    ds = _rp(sf_dir, "events", columns=["event_id", "user_id", "value"])
    return profile_columns(ds, ["event_id", "user_id", "value"])


_PROFILE_SQL = (
    "SELECT * FROM ("
    + " UNION ALL ".join(
        f"SELECT '{c}' AS \"column\", count(*)::BIGINT AS n_rows, "
        f"(count(*) - count({c}))::BIGINT AS n_nulls, "
        f"min({c})::DOUBLE AS min_v, max({c})::DOUBLE AS max_v "
        f"FROM events"
        for c in ("event_id", "user_id", "value"))
    + ") ORDER BY \"column\"")


def q_merge_upsert(sf_dir: str):
    """SCD-1 snapshot merge: a 10%-of-keys update slice (acctbal
    bumped by 1000) replaces its base customer rows, the rest pass
    through — the incremental re-crawl page-store maintenance
    primitive (stages/relational.py merge_upsert: tagged union + ONE
    keyed exchange, vectorized membership mask, no joins)."""
    from ..stages.relational import merge_upsert
    base = _rp(sf_dir, "customer",
               columns=["c_custkey", "c_acctbal", "c_nationkey"])

    def mk_updates(t: pa.Table) -> pa.Table:
        k = t.column("c_custkey").to_numpy(zero_copy_only=False)
        keep = (k % 10) == 3
        bal = t.column("c_acctbal").to_numpy(
            zero_copy_only=False).astype(np.float64)[keep] + 1000.0
        return pa.table({
            "c_custkey": pa.array(k[keep]),
            "c_acctbal": pa.array(bal),
            "c_nationkey": t.filter(pa.array(keep))
                            .column("c_nationkey")})

    upd = _rp(sf_dir, "customer",
              columns=["c_custkey", "c_acctbal", "c_nationkey"]) \
        .map_batches(mk_updates, batch_format="pyarrow")
    out = merge_upsert(base, upd, "c_custkey")

    def fix_types(t: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": t.column("c_custkey").cast(pa.int64()),
            "c_acctbal": t.column("c_acctbal").cast(pa.float64()),
            "c_nationkey": t.column("c_nationkey").cast(pa.int64())})

    return out.map_batches(fix_types, batch_format="pyarrow")


_UPSERT_SQL = (
    "SELECT c_custkey, CASE WHEN c_custkey % 10 = 3 "
    "THEN c_acctbal + 1000.0 ELSE c_acctbal END AS c_acctbal, "
    "c_nationkey::BIGINT AS c_nationkey "
    "FROM customer ORDER BY c_custkey")


def q_image_stats(sf_dir: str):
    """REAL image decode pipeline (no external libs): the v2 world's
    media refs -> deterministic P6 PPM blob store -> ImageStatsStage
    (pure-numpy netpbm decoder; per-image width/height, exact
    per-channel means, all-integer 8-bin luma histogram). Upgrades
    the multimodal family from stubbed decode to a working one;
    rows-only at the gate (binary decode is not SQL-expressible) with
    the decoder pinned against an independent reference in pytest."""
    from ..stages import multimodal as M
    refs = _media_refs(sf_dir)
    n = refs.num_rows
    k = max(2, min(16, n // 32 + 1))
    slices = [refs.slice(i * n // k, (i + 1) * n // k - i * n // k)
              for i in range(k)]
    uniq = rd.from_arrow([s for s in slices if s.num_rows])
    blob = uniq.map_batches(
        lambda t: M.synth_ppm_table(t.column("media_ref").to_pylist()),
        batch_format="pyarrow", batch_size=32)
    return blob.map_batches(M.ImageStatsStage(), batch_format="pyarrow",
                            batch_size=32)


def q_audio_stats(sf_dir: str):
    """REAL audio decode pipeline (no external libs): media refs ->
    deterministic PCM16 WAV blob store -> AudioStatsStage (RIFF
    chunk-walking decoder; duration/peak/zero-crossings integer-exact,
    RMS = one division + one sqrt). The audio sibling of
    q:image_stats; rows-only at the gate, decoder pinned against
    struct-level reference parsing in pytest."""
    from ..stages import multimodal as M
    refs = _media_refs(sf_dir)
    n = refs.num_rows
    k = max(2, min(16, n // 32 + 1))
    slices = [refs.slice(i * n // k, (i + 1) * n // k - i * n // k)
              for i in range(k)]
    uniq = rd.from_arrow([s for s in slices if s.num_rows])
    blob = uniq.map_batches(
        lambda t: M.synth_wav_table(t.column("media_ref").to_pylist()),
        batch_format="pyarrow", batch_size=32)
    return blob.map_batches(M.AudioStatsStage(), batch_format="pyarrow",
                            batch_size=32)


def q_video_frames(sf_dir: str):
    """REAL video decode + frame sampling (no external libs): media
    refs -> deterministic YUV4MPEG2 blob store -> VideoFrameSample
    Stage (C444 y4m parser; every-5th-frame sample, exact per-frame
    mean luma). Completes the real-decode multimodal trio (image/
    audio/video); rows-only at the gate, decoder pinned in pytest."""
    from ..stages import multimodal as M
    refs = _media_refs(sf_dir)
    n = refs.num_rows
    k = max(2, min(16, n // 32 + 1))
    slices = [refs.slice(i * n // k, (i + 1) * n // k - i * n // k)
              for i in range(k)]
    uniq = rd.from_arrow([s for s in slices if s.num_rows])
    blob = uniq.map_batches(
        lambda t: M.synth_y4m_table(t.column("media_ref").to_pylist()),
        batch_format="pyarrow", batch_size=32)
    return blob.map_batches(M.VideoFrameSampleStage(every_k=5),
                            batch_format="pyarrow", batch_size=32)


_DECON_BLOOM_BENCH = "doc_id % 13 = 5"  # distinct slice from q_decontaminate


def q_decontaminate_bloom(sf_dir: str):
    """Decontamination via the scale path: benchmark shingles broadcast
    as 8-byte hashes behind a Bloom prefilter, exact searchsorted
    verify on Bloom-positives only. Same SQL oracle as the string
    form — the Bloom stage is output-invisible."""
    from ..stages.textstats import (benchmark_shingle_hashes,
                                    decontaminate_hashed)
    docs = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def _slice(eq: bool):
        def f(t: pa.Table) -> pa.Table:
            m = t.column("doc_id").to_numpy() % 13 == 5
            return t.filter(pa.array(m if eq else ~m))
        return f

    bench = docs.map_batches(_slice(True), batch_format="pyarrow")
    rest = docs.map_batches(_slice(False), batch_format="pyarrow")
    h = benchmark_shingle_hashes(bench, n=DECON_N)
    return (decontaminate_hashed(rest, h, n=DECON_N)
            .select_columns(["doc_id"]))


def q_zscore_events(sf_dir: str):
    """Per-group feature scaling (z-score of value within event_type)
    via two streaming passes — grouped moments broadcast, rows never
    shuffled (aggregates.zscore_per_group). Oracle computes the same
    closed form from grouped SUMs (corr_lineitem convention)."""
    from ..stages.aggregates import zscore_per_group
    ds = _rp(sf_dir, "events", columns=["event_id", "event_type", "value"])
    return zscore_per_group(ds, "event_type", "value", "event_id")


def q_train_split(sf_dir: str):
    """Deterministic train/val/test assignment by md5(id) bucket —
    membership depends only on the row id, so re-sharded or resumed
    runs keep every row in the same split (aggregates.split_assign)."""
    from ..stages.aggregates import split_assign
    ds = _rp(sf_dir, "documents", columns=["doc_id"])
    return split_assign(ds, "doc_id")


def q_lm_score(sf_dir: str):
    """CCNet/Gopher-class statistical quality signal: per-document mean
    char-trigram log-probability under an add-one-smoothed LM fit on
    the doc_id%13==1 reference slice (textstats.lm_score — bounded
    model state, broadcast once; fully vectorized scoring). ASCII
    corpus assumption shared with the simhash_md5 oracle twins."""
    from ..stages.textstats import lm_score
    docs = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def ref_slice(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(t.column("doc_id").to_numpy() % 13 == 1))

    ref = _rp(sf_dir, "documents", columns=["doc_id", "text"]) \
        .map_batches(ref_slice, batch_format="pyarrow")
    return lm_score(docs, ref)


def q_chunk_documents(sf_dir: str):
    """Fixed-window chunking with overlap (200/50 chars — sized so the
    gate corpus, 48-553 chars/doc, actually multi-chunks) — the
    pre-tokenization layout step for training corpora
    (textstats.chunk_documents: streaming flat-map, Arrow slice kernel
    per chunk position, no Python row loop)."""
    from ..stages.textstats import chunk_documents
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    return chunk_documents(ds, window=200, overlap=50)


def q_pack_docs(sf_dir: str):
    """Greedy sequence packing of documents into <=8000-char bins
    (textstats.pack_greedy: id-ordered greedy within hash partitions —
    deterministic under re-sharding; rows-only check, invariants
    pinned in pytest)."""
    from ..stages.textstats import pack_greedy
    ds = _rp(sf_dir, "documents", columns=["doc_id", "n_chars"])
    return pack_greedy(ds, cap=8000)


def q_bpe_vocab(sf_dir: str):
    """BPE tokenizer-vocabulary induction: 10 greedy merges over the
    documents corpus (aggregates.bpe_vocab — word-frequency reduction
    once, then every iteration runs on the distinct-word table with a
    combiner pair count and one vectorized replace). Oracle: the same
    10 iterations unrolled as MATERIALIZED DuckDB CTEs (the pagerank
    precedent) — SQL replace's left-to-right non-overlapping scan over
    boundary-delimited symbol strings is exactly the greedy BPE apply."""
    from ..stages.aggregates import bpe_vocab
    ds = _rp(sf_dir, "documents", columns=["text"])
    return bpe_vocab(ds, n_merges=10)


def q_pack_docs_global(sf_dir: str):
    """SQL-oracle twin of q_pack_docs (round-4 verdict item 4): with
    num_partitions=1 the greedy fill is GLOBAL over id-ordered docs, so
    bins depend only on the input set and DuckDB can replay the walk as
    a recursive CTE (one row per step — the greedy state (bin, acc) is
    inherently sequential; this is the verification config, the
    16-partition variant stays the scale path)."""
    from ..stages.textstats import pack_greedy
    ds = _rp(sf_dir, "documents", columns=["doc_id", "n_chars"])
    return pack_greedy(ds, cap=8000, num_partitions=1)


def q_pagerank_seeded(sf_dir: str):
    """PERSONALIZED PageRank: teleport mass concentrated on the 25
    nation nodes of the same orders<->customer<->nation graph — the
    seeded-relevance ranking a crawl frontier uses around a trust set
    (stages/graph.py pagerank(seeds=...), driver/distributed parity
    bit-exact). Oracle: the same 2 iterations unrolled with a
    CASE-gated teleport term."""
    from ..stages.graph import pagerank
    cust = _rp(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    nk = sorted({int(x) * 4 + 2 for b in
                 cust.iter_batches(batch_format="pyarrow")
                 for x in pa.table(b).column("c_nationkey").to_pylist()})
    t = pagerank(_pr_edges(sf_dir), n_iters=2, damping=0.85, seeds=nk)
    return pa.table({"node": t.column("node"),
                     "pr": pa.array(_round_away9(
                         t.column("rank").to_numpy()))})


def _pagerank_seeded_oracle_sql() -> str:
    e = ("SELECT DISTINCT o_orderkey*4 AS u, o_custkey*4+1 AS v "
         "FROM orders UNION "
         "SELECT DISTINCT o_custkey*4+1 AS u, o_orderkey*4 AS v "
         "FROM orders UNION "
         "SELECT DISTINCT c_custkey*4+1 AS u, c_nationkey*4+2 AS v "
         "FROM customer UNION "
         "SELECT DISTINCT c_nationkey*4+2 AS u, c_custkey*4+1 AS v "
         "FROM customer")
    sql = (f"WITH e AS ({e}), "
           "nodes AS (SELECT u AS n FROM e UNION SELECT v AS n FROM e), "
           "seeds AS (SELECT DISTINCT c_nationkey*4+2 AS n "
           "FROM customer), "
           "ns AS (SELECT COUNT(*)::DOUBLE AS c FROM seeds "
           "JOIN nodes USING (n)), "
           "deg AS (SELECT u, COUNT(*)::DOUBLE AS d FROM e GROUP BY u), "
           "pr0 AS (SELECT nodes.n, CASE WHEN seeds.n IS NOT NULL "
           "THEN 1.0/(SELECT c FROM ns) ELSE 0.0 END AS r "
           "FROM nodes LEFT JOIN seeds ON seeds.n = nodes.n)")
    prev = "pr0"
    for i in (1, 2):
        sql += (f", s{i} AS (SELECT e.v AS n, SUM({prev}.r/deg.d) AS c "
                f"FROM e JOIN {prev} ON {prev}.n = e.u "
                f"JOIN deg ON deg.u = e.u GROUP BY e.v), "
                f"pr{i} AS (SELECT nodes.n, "
                f"(CASE WHEN seeds.n IS NOT NULL THEN "
                f"(1.0-0.85)/(SELECT c FROM ns) ELSE 0.0 END) "
                f"+ 0.85*COALESCE(s{i}.c, 0) AS r FROM nodes "
                f"LEFT JOIN seeds ON seeds.n = nodes.n "
                f"LEFT JOIN s{i} ON s{i}.n = nodes.n)")
        prev = f"pr{i}"
    return sql + (" SELECT n AS node, round(r, 9) AS pr FROM pr2 "
                  "ORDER BY node")


def q_hits(sf_dir: str):
    """HITS hubs/authorities (2 iterations, L1 normalization) over the
    orders<->customer<->nation link graph (stages/graph.py hits —
    same two-path raw-shuffle shape as pagerank; driver/distributed
    parity pinned). Oracle: the same half-steps unrolled as SQL CTEs,
    half-away round 9."""
    from ..stages.graph import hits
    t = hits(_pr_edges(sf_dir), n_iters=2)
    return pa.table({"node": t.column("node"),
                     "hub": pa.array(_round_away9(
                         t.column("hub").to_numpy())),
                     "authority": pa.array(_round_away9(
                         t.column("authority").to_numpy()))})


def _hits_oracle_sql() -> str:
    e = ("SELECT DISTINCT o_orderkey*4 AS u, o_custkey*4+1 AS v "
         "FROM orders UNION "
         "SELECT DISTINCT o_custkey*4+1 AS u, o_orderkey*4 AS v "
         "FROM orders UNION "
         "SELECT DISTINCT c_custkey*4+1 AS u, c_nationkey*4+2 AS v "
         "FROM customer UNION "
         "SELECT DISTINCT c_nationkey*4+2 AS u, c_custkey*4+1 AS v "
         "FROM customer")
    sql = (f"WITH e AS ({e}), "
           "nodes AS (SELECT u AS n FROM e UNION SELECT v AS n FROM e), "
           "nn AS (SELECT COUNT(*)::DOUBLE AS cnt FROM nodes), "
           "h0 AS (SELECT nodes.n, 1.0/(SELECT cnt FROM nn) AS v "
           "FROM nodes)")
    prev_h = "h0"
    for i in (1, 2):
        sql += (f", a{i}r AS (SELECT e.v AS n, SUM({prev_h}.v) AS s "
                f"FROM e JOIN {prev_h} ON {prev_h}.n = e.u "
                f"GROUP BY e.v), "
                f"a{i}z AS (SELECT nodes.n, COALESCE(a{i}r.s, 0) AS s "
                f"FROM nodes LEFT JOIN a{i}r ON a{i}r.n = nodes.n), "
                f"a{i}t AS (SELECT SUM(s) AS t FROM a{i}z), "
                f"a{i} AS (SELECT n, s/(SELECT t FROM a{i}t) AS v "
                f"FROM a{i}z), "
                f"h{i}r AS (SELECT e.u AS n, SUM(a{i}.v) AS s "
                f"FROM e JOIN a{i} ON a{i}.n = e.v GROUP BY e.u), "
                f"h{i}z AS (SELECT nodes.n, COALESCE(h{i}r.s, 0) AS s "
                f"FROM nodes LEFT JOIN h{i}r ON h{i}r.n = nodes.n), "
                f"h{i}t AS (SELECT SUM(s) AS t FROM h{i}z), "
                f"h{i} AS (SELECT n, s/(SELECT t FROM h{i}t) AS v "
                f"FROM h{i}z)")
        prev_h = f"h{i}"
    return sql + (" SELECT h2.n AS node, round(h2.v, 9) AS hub, "
                  "round(a2.v, 9) AS authority FROM h2 "
                  "JOIN a2 ON a2.n = h2.n ORDER BY node")


def q_crawl_host_rank(sf_dir: str):
    """Host-level PageRank over the crawl's REAL parent->child fetch
    lineage (stages/graph.py host_pagerank: hash->host owner-lookup
    exchange + the pagerank op). Crawl-derived, so rows-only at the
    gate; the construction is pinned against a manual driver build in
    pytest."""
    from ..stages.graph import host_pagerank
    v = _crawl_for(sf_dir)["crawl"].visited
    t = host_pagerank(v, n_iters=3)
    return pa.table({"host": t.column("host"),
                     "pr": pa.array(np.round(t.column("pr").to_numpy(),
                                             9))})


def q_heavy_hitters(sf_dir: str):
    """EXACT top-25 customers by order count via the two-pass
    Misra-Gries screen + broadcast exact verify (stages/sketches.py
    heavy_hitters). At this sf the per-batch distinct count fits the
    summary (theta=0, D=0) so the certificate holds trivially; the
    certificate/fallback machinery is pinned separately in pytest on
    zipf data with a forced-small summary."""
    from ..stages.sketches import heavy_hitters
    ds = _rp(sf_dir, "orders", columns=["o_custkey"])
    # m sized to the column's distinct count (no heavy tail exists in
    # o_custkey, so an honest smaller summary cannot certify and would
    # route every run through the full-groupby fallback — correct but
    # two extra Ray jobs; with theta=0 the screen is lossless and the
    # certificate holds at every sf)
    return heavy_hitters(ds, "o_custkey", k=25, m=16384,
                         count_name="n_orders")


def q_connected_components(sf_dir: str):
    """Connected components of the orders—customer—nation graph
    (node encoding: order=4k, customer=4k+1, nation=4k+2), reported as
    O(components) sizes. The same operator resolves near-dup pair sets
    into duplicate clusters at 100 TB (stages/graph.py); here it is
    graded against a DuckDB recursive-CTE transitive-closure oracle.
    The edge count is far under DRIVER_CC_MAX so the union-find fast
    path runs; driver==distributed parity is pinned in pytest."""
    from ..stages.graph import component_sizes, connected_components

    def ord_edges(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": pc.multiply(t.column("o_orderkey"), pa.scalar(4)),
            "dst": pc.add(pc.multiply(t.column("o_custkey"),
                                      pa.scalar(4)), pa.scalar(1))})

    def cust_edges(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": pc.add(pc.multiply(t.column("c_custkey"),
                                      pa.scalar(4)), pa.scalar(1)),
            "dst": pc.add(pc.multiply(pc.cast(t.column("c_nationkey"),
                                              pa.int64()),
                                      pa.scalar(4)), pa.scalar(2))})

    orders = _rp(sf_dir, "orders", columns=["o_orderkey", "o_custkey"]) \
        .map_batches(ord_edges, batch_format="pyarrow")
    cust = _rp(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]) \
        .map_batches(cust_edges, batch_format="pyarrow")
    return component_sizes(connected_components(orders.union(cust)))


def _round_away9(x: np.ndarray) -> np.ndarray:
    """round(x, 9) with DuckDB's half-AWAY-from-zero tie rule —
    np.round is half-even, and PageRank over power-of-two degrees
    produces exact decimal midpoints (e.g. 2.65625e-05) where the two
    rules differ by one ulp. Non-negative inputs only."""
    return np.floor(x * 1e9 + 0.5) / 1e9


def _pr_edges(sf_dir: str):
    """Directed both-ways orders<->customer<->nation link graph shared
    by the pagerank / pagerank_seeded queries."""

    def ord_edges(t: pa.Table) -> pa.Table:
        o = pc.multiply(t.column("o_orderkey"), pa.scalar(4))
        c = pc.add(pc.multiply(t.column("o_custkey"), pa.scalar(4)),
                   pa.scalar(1))
        return pa.table({"src": pa.concat_arrays(
                             [o.combine_chunks(), c.combine_chunks()]),
                         "dst": pa.concat_arrays(
                             [c.combine_chunks(), o.combine_chunks()])})

    def cust_edges(t: pa.Table) -> pa.Table:
        c = pc.add(pc.multiply(t.column("c_custkey"), pa.scalar(4)),
                   pa.scalar(1))
        n = pc.add(pc.multiply(pc.cast(t.column("c_nationkey"),
                                       pa.int64()), pa.scalar(4)),
                   pa.scalar(2))
        return pa.table({"src": pa.concat_arrays(
                             [c.combine_chunks(), n.combine_chunks()]),
                         "dst": pa.concat_arrays(
                             [n.combine_chunks(), c.combine_chunks()])})

    orders = _rp(sf_dir, "orders", columns=["o_orderkey", "o_custkey"]) \
        .map_batches(ord_edges, batch_format="pyarrow")
    cust = _rp(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]) \
        .map_batches(cust_edges, batch_format="pyarrow")
    return orders.union(cust)


def q_pagerank(sf_dir: str):
    """Fixed-iteration PageRank (3 iters, d=0.85) over the directed
    both-ways orders<->customer<->nation link graph — the crawl-scale
    ranking signal (stages/graph.py pagerank: raw-shuffle keyed
    exchanges above the driver limit; numpy scatter below,
    parity-pinned). Oracle: the SAME three iterations unrolled as
    plain SQL CTEs; both sides round to 9 decimals."""
    from ..stages.graph import pagerank
    t = pagerank(_pr_edges(sf_dir), n_iters=3, damping=0.85)
    return pa.table({"node": t.column("node"),
                     "pr": pa.array(_round_away9(
                         t.column("rank").to_numpy()))})


def _pagerank_oracle_sql() -> str:
    e = ("SELECT DISTINCT o_orderkey*4 AS u, o_custkey*4+1 AS v "
         "FROM orders UNION "
         "SELECT DISTINCT o_custkey*4+1 AS u, o_orderkey*4 AS v "
         "FROM orders UNION "
         "SELECT DISTINCT c_custkey*4+1 AS u, c_nationkey*4+2 AS v "
         "FROM customer UNION "
         "SELECT DISTINCT c_nationkey*4+2 AS u, c_custkey*4+1 AS v "
         "FROM customer")
    sql = (f"WITH e AS ({e}), "
           "nodes AS (SELECT u AS n FROM e UNION SELECT v AS n FROM e), "
           "nn AS (SELECT COUNT(*)::DOUBLE AS cnt FROM nodes), "
           "deg AS (SELECT u, COUNT(*)::DOUBLE AS d FROM e GROUP BY u), "
           "pr0 AS (SELECT nodes.n, 1.0/(SELECT cnt FROM nn) AS r "
           "FROM nodes)")
    prev = "pr0"
    for i in (1, 2, 3):
        sql += (f", s{i} AS (SELECT e.v AS n, SUM({prev}.r/deg.d) AS c "
                f"FROM e JOIN {prev} ON {prev}.n = e.u "
                f"JOIN deg ON deg.u = e.u GROUP BY e.v), "
                f"pr{i} AS (SELECT nodes.n, "
                f"(1.0-0.85)/(SELECT cnt FROM nn) + 0.85*COALESCE(s{i}.c, 0) "
                f"AS r FROM nodes LEFT JOIN s{i} ON s{i}.n = nodes.n)")
        prev = f"pr{i}"
    return sql + (" SELECT n AS node, round(r, 9) AS pr FROM pr3 "
                  "ORDER BY node")


def _tri_edges(sf_dir: str):
    """Sparse mixed-key lineitem graph (both tuple key spaces folded
    into one mod-8000 node domain, so odd cycles/triangles exist):
    src = l_orderkey % 8000, dst = (l_partkey*7 + l_suppkey) % 8000,
    over l_linenumber <= 3 — the line cap keeps density sub-quadratic
    as lineitem grows (mod folding otherwise saturates the 8000-node
    domain: the unfiltered sf0.1 graph hits ~600k edges / avg degree
    150 and the wedge volume, the E^1.5 term every triangle algorithm
    pays, costs ~30 s; filtered: 256k edges, 44k triangles).
    10 / 63 / 44k triangles at sf0.001/0.01/0.1."""

    def mk(t: pa.Table) -> pa.Table:
        keep = t.column("l_linenumber").to_numpy(
            zero_copy_only=False).astype(np.int64) <= 3
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)[keep]
        pk = t.column("l_partkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)[keep]
        sk = t.column("l_suppkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)[keep]
        return pa.table({"src": pa.array(ok % 8000),
                         "dst": pa.array((pk * 7 + sk) % 8000)})

    return _rp(sf_dir, "lineitem",
               columns=["l_orderkey", "l_partkey", "l_suppkey",
                        "l_linenumber"]) \
        .map_batches(mk, batch_format="pyarrow")


_TRI_E0 = ("SELECT l_orderkey % 8000 AS src, "
           "(l_partkey*7 + l_suppkey) % 8000 AS dst FROM lineitem "
           "WHERE l_linenumber <= 3")


def q_triangle_counts(sf_dir: str):
    """Per-node triangle counts over the mixed-key lineitem graph —
    the community/spam-detection signal next to pagerank (the
    reference has no graph ops; stages/graph.py triangle_counts runs
    Cohen's degree-oriented wedge-close, driver numpy below 500k edges
    / five keyed exchanges above, parity pinned in pytest). Oracle:
    the canonical three-way self-join, each triangle counted once at
    its id-ordered corner."""
    from ..stages.graph import triangle_counts
    return triangle_counts(_tri_edges(sf_dir))


def _triangle_counts_oracle_sql() -> str:
    return (
        f"WITH e0 AS ({_TRI_E0}), "
        "canon AS (SELECT DISTINCT least(src,dst) AS u, "
        "greatest(src,dst) AS v FROM e0 WHERE src <> dst), "
        "tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c FROM canon e1 "
        "JOIN canon e2 ON e2.u = e1.u AND e2.v > e1.v "
        "JOIN canon e3 ON e3.u = e1.v AND e3.v = e2.v), "
        "nodes AS (SELECT u AS node FROM canon "
        "UNION SELECT v FROM canon), "
        "tn AS (SELECT node, count(*) AS c FROM "
        "(SELECT a AS node FROM tri UNION ALL SELECT b FROM tri "
        "UNION ALL SELECT c FROM tri) GROUP BY node) "
        "SELECT nodes.node, COALESCE(tn.c, 0)::BIGINT AS n_triangles "
        "FROM nodes LEFT JOIN tn USING(node) ORDER BY node")


def q_bfs_hops(sf_dir: str):
    """Single-source BFS hop distances from the minimum node over the
    undirected mixed-key lineitem graph — the seed-distance tiering a
    crawl frontier runs (the reference's per-page depth field,
    site-crawler.service.js; stages/graph.py bfs_hops: driver CSR BFS
    below 500k edges, min-plus label relaxation exchanges above,
    parity pinned in pytest). Oracle: bounded recursive CTE + MIN
    per node (bound 24 >> graph eccentricity, so exact)."""
    from ..stages.graph import bfs_hops

    def both(t: pa.Table) -> pa.Table:
        a = t.column("src").combine_chunks()
        b = t.column("dst").combine_chunks()
        return pa.table({"src": pa.concat_arrays([a, b]),
                         "dst": pa.concat_arrays([b, a])})

    return bfs_hops(_tri_edges(sf_dir).map_batches(
        both, batch_format="pyarrow"))


def _bfs_hops_oracle_sql() -> str:
    return (
        f"WITH RECURSIVE e0 AS ({_TRI_E0}), "
        "e AS (SELECT DISTINCT src, dst FROM "
        "(SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)), "
        "r AS (SELECT (SELECT MIN(least(src, dst)) FROM e) AS node, "
        "0 AS hops "
        "UNION SELECT e.dst, r.hops + 1 FROM r "
        "JOIN e ON e.src = r.node WHERE r.hops < 24) "
        "SELECT node, MIN(hops)::BIGINT AS hops FROM r "
        "GROUP BY node ORDER BY node")


def q_sssp_weighted(sf_dir: str):
    """Weighted single-source shortest paths from the minimum node over
    the undirected mixed-key lineitem graph, edge cost
    (src + dst) % 7 + 1 (symmetric, derived from the endpoints so both
    engines compute identical weights) — the link-cost generalization
    of bfs_hops (the reference's 3-tier URL prioritizer,
    utils/validator.js, is this with uniform costs; stages/graph.py
    sssp_weighted: driver CSR Bellman-Ford frontier below 500k edges,
    min-plus weighted label relaxation exchanges above, parity pinned
    in pytest). Oracle: bounded recursive CTE + MIN per node (bound
    96 >> max shortest distance — max observed is ~40 = ecc x max
    weight; all-integer, exact)."""
    from ..stages.graph import sssp_weighted

    def both_w(t: pa.Table) -> pa.Table:
        a = t.column("src").combine_chunks()
        b = t.column("dst").combine_chunks()
        s = pa.concat_arrays([a, b])
        d = pa.concat_arrays([b, a])
        sv = s.to_numpy(zero_copy_only=False).astype(np.int64)
        dv = d.to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"src": s, "dst": d,
                         "w": pa.array((sv + dv) % 7 + 1)})

    return sssp_weighted(_tri_edges(sf_dir).map_batches(
        both_w, batch_format="pyarrow"))


def _sssp_oracle_sql() -> str:
    return (
        f"WITH RECURSIVE e0 AS ({_TRI_E0}), "
        "e AS (SELECT DISTINCT src, dst, (src + dst) % 7 + 1 AS w FROM "
        "(SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)), "
        "r AS (SELECT (SELECT MIN(least(src, dst)) FROM e) AS node, "
        "0 AS d "
        "UNION SELECT e.dst, r.d + e.w FROM r "
        "JOIN e ON e.src = r.node WHERE r.d + e.w < 96) "
        "SELECT node, MIN(d)::BIGINT AS dist FROM r "
        "GROUP BY node ORDER BY node")


def q_kcore_nodes(sf_dir: str):
    """3-core of the undirected mixed-key lineitem graph — the
    degeneracy-based density gate stripping tendrils before community
    analysis (stages/graph.py k_core: parallel peeling, numpy bincount
    peel on the driver below 500k edges, three keyed exchanges per
    round above — the peel fixpoint is order-independent so both paths
    agree exactly; parity pinned in pytest). Oracle: the peel unrolled
    as a recursive CTE carrying the alive set per iteration (bound 32
    >> max observed 11 peel rounds; the set re-derives itself
    verbatim after the fixpoint, so iteration 32 IS the k-core)."""
    from ..stages.graph import k_core
    return k_core(_tri_edges(sf_dir), k=3)


def _kcore_oracle_sql() -> str:
    return (
        f"WITH RECURSIVE e0 AS ({_TRI_E0}), "
        "e AS (SELECT DISTINCT src, dst FROM "
        "(SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0) "
        "WHERE src <> dst), "
        "r AS (SELECT 0 AS it, node FROM "
        "(SELECT src AS node FROM e UNION SELECT dst FROM e) "
        "UNION "
        "SELECT a1.it + 1, g.src AS node "
        "FROM e g JOIN r a1 ON a1.node = g.src "
        "JOIN r a2 ON a2.node = g.dst "
        "WHERE a1.it < 32 "
        "GROUP BY a1.it, g.src HAVING count(*) >= 3) "
        "SELECT node FROM r WHERE it = 32 ORDER BY node")


def q_hash_walks(sf_dir: str):
    """Deterministic hash-seeded walks (4 steps from every source
    node) over the DIRECTED mixed-key lineitem graph — the
    DeepWalk/node2vec corpus generator with randomness replaced by
    md5 so the SQL twin derives identical walks (stages/graph.py
    hash_walks: driver CSR below 500k edges, one owner-lookup
    exchange per step above, one md5 per DISTINCT frontier node per
    step; parity pinned in pytest). Oracle: the steps unrolled as
    CTEs over a row_number'd adjacency, hop index =
    md5_number_lower(cur || ':' || step) % outdeg."""
    from ..stages.graph import hash_walks
    return hash_walks(_tri_edges(sf_dir), length=4)


def _hash_walks_oracle_sql(length: int = 4) -> str:
    parts = [
        f"WITH e0 AS ({_TRI_E0}), "
        "e AS (SELECT DISTINCT src, dst FROM e0), "
        "adj AS (SELECT src, dst, "
        "row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS r, "
        "count(*) OVER (PARTITION BY src) AS c FROM e), "
        "w0 AS (SELECT DISTINCT src AS start, src AS cur FROM e)"]
    for t in range(length):
        parts.append(
            f", w{t + 1} AS (SELECT w.start, a.dst AS cur "
            f"FROM w{t} w JOIN adj a ON a.src = w.cur AND a.r = "
            f"(md5_number_lower(w.cur::VARCHAR || ':{t}') "
            f"% a.c::UBIGINT)::BIGINT)")
    sel = " UNION ALL ".join(
        f"SELECT start, {t}::BIGINT AS step, cur AS node FROM w{t}"
        for t in range(length + 1))
    parts.append(f" {sel} ORDER BY start, step")
    return "".join(parts)


def q_approx_quantiles(sf_dir: str):
    """Per-group quantiles via the MERGEABLE uniform summary
    (stages/sketches.py approx_quantiles — the order-statistics member
    of the sketch family). At gate scale every batch-group fits the
    k=4096 summary, so the sketch is lossless and the result equals
    DuckDB quantile_disc exactly; the lossy-regime rank-error bound
    (~2N/(k-1)) is pinned separately in pytest at forced-small k."""
    from ..stages.sketches import approx_quantiles
    ds = _rp(sf_dir, "events", columns=["event_type", "value"])
    return approx_quantiles(ds, "event_type", "value",
                            qs=[0.25, 0.5, 0.9], k=4096,
                            names=["q25", "q50", "q90"])


def q_auc_click_view(sf_dir: str):
    """Mann–Whitney AUC of click vs view event values — the ROC-area /
    rank-sum drift test next to ks_click_view (stages/aggregates.py
    auc_two_sample: the doubled pair score u2 = Σ 2·[a>b] + [a=b] is
    an exact integer from two searchsorted sweeps over distinct-value
    grids, AUC = u2/(2nm) is ONE division — bit-exact). Oracle: the
    canonical O(n·m) pair join (gate scale only)."""
    from ..stages.aggregates import auc_two_sample
    ds = _rp(sf_dir, "events", columns=["event_type", "value"])
    return auc_two_sample(ds, "event_type", "value", "click", "view")


_AUC_SQL = (
    "WITH s AS (SELECT event_type AS g, value AS v FROM events "
    "WHERE event_type IN ('click', 'view')), "
    "p AS (SELECT CASE WHEN x.v > y.v THEN 2 "
    "WHEN x.v = y.v THEN 1 ELSE 0 END AS w "
    "FROM s x JOIN s y ON x.g = 'click' AND y.g = 'view'), "
    "c AS (SELECT (SELECT count(*) FROM s WHERE g = 'click')::BIGINT "
    "AS n_a, (SELECT count(*) FROM s WHERE g = 'view')::BIGINT AS n_b, "
    "sum(w)::BIGINT AS u2 FROM p) "
    "SELECT n_a, n_b, u2, "
    "u2::DOUBLE / (2 * n_a * n_b)::DOUBLE AS auc FROM c")


def q_twap_users(sf_dir: str):
    """Per-user TIME-weighted average event value (each value holds
    until the user's next event) — the TWAP/telemetry-gauge aggregate
    (stages/windows.py time_weighted_avg: cent-quantized values make
    numerator and denominator exact integers in any fold order; one
    final division — bit-exact; ONE user-keyed exchange, reduceat
    kernel). Oracle: a lead() window + integer sums."""
    from ..stages.windows import time_weighted_avg
    ds = _rp(sf_dir, "events",
             columns=["user_id", "ts", "event_id", "value"])
    return time_weighted_avg(ds)


_TWAP_SQL = (
    "WITH o AS (SELECT user_id, "
    "CAST(round(value * 100) AS BIGINT) AS c, epoch_us(ts) AS t, "
    "lead(epoch_us(ts)) OVER (PARTITION BY user_id "
    "ORDER BY ts, event_id) AS nt FROM events) "
    "SELECT user_id, sum(nt - t)::BIGINT AS dur_us, "
    "sum(c * (nt - t))::BIGINT::DOUBLE "
    "/ (sum(nt - t)::BIGINT * 100)::DOUBLE AS twap "
    "FROM o WHERE nt IS NOT NULL GROUP BY user_id ORDER BY user_id")


def q_target_encode_brand(sf_dir: str):
    """Smoothed target encoding of part brand against lineitem
    quantity — the leakage-controlled categorical encoder for tabular
    ML features (stages/aggregates.py target_encode: the dimension's
    pk→brand map is BROADCAST once via ray.put, each batch emits an
    O(brands) partial, the driver merges O(batches×brands); the
    composed smoothing (s·N + m·T)/(N·(n + m)) is exact integers up
    to ONE division — bit-exact vs a HUGEINT oracle)."""
    from ..stages.aggregates import target_encode
    fact = _rp(sf_dir, "lineitem", columns=["l_partkey", "l_quantity"])
    dim = _rp(sf_dir, "part", columns=["p_partkey", "p_brand"])
    return target_encode(fact, dim, "l_partkey", "p_partkey",
                         "p_brand", "l_quantity", m=20)


_TARGET_ENC_SQL = (
    "WITH j AS (SELECT p_brand, CAST(l_quantity AS HUGEINT) AS q "
    "FROM lineitem JOIN part ON l_partkey = p_partkey), "
    "tot AS (SELECT sum(q) AS t, count(*)::HUGEINT AS nn FROM j), "
    "g AS (SELECT p_brand, sum(q) AS s, count(*)::HUGEINT AS n "
    "FROM j GROUP BY p_brand) "
    "SELECT p_brand, n::BIGINT AS n, s::BIGINT AS sum_y, "
    "(s * nn + 20 * t)::DOUBLE / (nn * (n + 20))::DOUBLE AS enc "
    "FROM g, tot ORDER BY p_brand")


def q_clustering_coeff(sf_dir: str):
    """Per-node local clustering coefficient over the mixed-key
    lineitem graph — the community-density feature on top of
    q:triangle_counts (stages/graph.py clustering_coefficients:
    triangle pass + degree pass over one materialized edge input,
    2·tri/(deg·(deg−1)) is integers up to ONE division — bit-exact;
    deg<2 nodes emit 0.0, mirrored by the oracle CASE)."""
    from ..stages.graph import clustering_coefficients
    return clustering_coefficients(_tri_edges(sf_dir))


def _clustering_oracle_sql() -> str:
    return (
        f"WITH e0 AS ({_TRI_E0}), "
        "canon AS (SELECT DISTINCT least(src,dst) AS u, "
        "greatest(src,dst) AS v FROM e0 WHERE src <> dst), "
        "tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c FROM canon e1 "
        "JOIN canon e2 ON e2.u = e1.u AND e2.v > e1.v "
        "JOIN canon e3 ON e3.u = e1.v AND e3.v = e2.v), "
        "tn AS (SELECT node, count(*) AS c FROM "
        "(SELECT a AS node FROM tri UNION ALL SELECT b FROM tri "
        "UNION ALL SELECT c FROM tri) GROUP BY node), "
        "dg AS (SELECT node, count(*) AS d FROM "
        "(SELECT u AS node FROM canon UNION ALL SELECT v FROM canon) "
        "GROUP BY node) "
        "SELECT dg.node, COALESCE(tn.c, 0)::BIGINT AS n_triangles, "
        "dg.d::BIGINT AS deg, "
        "CASE WHEN dg.d >= 2 THEN (2 * COALESCE(tn.c, 0))::DOUBLE "
        "/ (dg.d * (dg.d - 1))::DOUBLE ELSE 0.0 END AS coeff "
        "FROM dg LEFT JOIN tn USING(node) ORDER BY dg.node")


_LP_E0 = ("SELECT l_orderkey % 8000 AS src, "
          "(l_partkey*7 + l_suppkey) % 8000 AS dst FROM lineitem "
          "WHERE l_linenumber = 1")


def _lp_edges(sf_dir: str):
    """Sparser one-line-per-order variant of the mixed-key lineitem
    graph for the link-prediction query: wedge volume is Σ deg², so
    the candidate generator gets the l_linenumber = 1 slice (the same
    sparsity-cap precedent as _tri_edges)."""

    def mk(t: pa.Table) -> pa.Table:
        keep = t.column("l_linenumber").to_numpy(
            zero_copy_only=False).astype(np.int64) == 1
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)[keep]
        pk = t.column("l_partkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)[keep]
        sk = t.column("l_suppkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)[keep]
        return pa.table({"src": pa.array(ok % 8000),
                         "dst": pa.array((pk * 7 + sk) % 8000)})

    return _rp(sf_dir, "lineitem",
               columns=["l_orderkey", "l_partkey", "l_suppkey",
                        "l_linenumber"]) \
        .map_batches(mk, batch_format="pyarrow")


def q_link_prediction(sf_dir: str):
    """Common-neighbors link prediction with Jaccard scores — every
    NON-adjacent pair sharing ≥2 neighbors in the sparse lineitem
    graph (stages/graph.py link_prediction_cn: full-adjacency wedge
    emit + ONE tagged-union pair-count/anti-mark exchange; counts and
    degrees are integers, the score is ONE division — bit-exact).
    Oracle: the canonical adjacency self-join + NOT EXISTS."""
    from ..stages.graph import link_prediction_cn
    return link_prediction_cn(_lp_edges(sf_dir), min_common=2)


def _link_prediction_oracle_sql() -> str:
    return (
        f"WITH e0 AS ({_LP_E0}), "
        "canon AS (SELECT DISTINCT least(src,dst) AS u, "
        "greatest(src,dst) AS v FROM e0 WHERE src <> dst), "
        "adj AS (SELECT u AS a, v AS b FROM canon "
        "UNION ALL SELECT v, u FROM canon), "
        "w AS (SELECT x.b AS u, y.b AS v, count(*) AS cn FROM adj x "
        "JOIN adj y ON x.a = y.a AND x.b < y.b GROUP BY x.b, y.b), "
        "dg AS (SELECT a AS node, count(*) AS d FROM adj GROUP BY a), "
        "cand AS (SELECT u, v, cn FROM w WHERE cn >= 2 AND NOT EXISTS "
        "(SELECT 1 FROM canon WHERE canon.u = w.u AND canon.v = w.v)) "
        "SELECT c.u, c.v, c.cn::BIGINT AS n_common, "
        "du.d::BIGINT AS deg_u, dv.d::BIGINT AS deg_v, "
        "c.cn::DOUBLE / (du.d + dv.d - c.cn)::DOUBLE AS jaccard "
        "FROM cand c JOIN dg du ON du.node = c.u "
        "JOIN dg dv ON dv.node = c.v ORDER BY c.u, c.v")


def q_ewma_users(sf_dir: str):
    """Per-row EWMA of each user's value stream (α = 1/8) — the
    smoothing/anomaly-baseline op (stages/windows.py ewma_per_user:
    ONE user-keyed exchange; the kernel vectorizes ACROSS users per
    step so the sequential recurrence never becomes a per-row Python
    loop; three IEEE ops per step in recurrence order — bit-exact).
    Oracle: a recursive CTE stepping the same recurrence."""
    from ..stages.windows import ewma_per_user
    ds = _rp(sf_dir, "events",
             columns=["user_id", "ts", "event_id", "value"])
    return ewma_per_user(ds, alpha=0.125)


_EWMA_SQL = (
    "WITH RECURSIVE o AS (SELECT user_id, event_id, value, "
    "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) "
    "AS rn FROM events), "
    "r AS (SELECT user_id, event_id, rn, value AS s FROM o "
    "WHERE rn = 1 UNION ALL "
    "SELECT o.user_id, o.event_id, o.rn, "
    "0.125::DOUBLE * o.value + 0.875::DOUBLE * r.s FROM r "
    "JOIN o ON o.user_id = r.user_id AND o.rn = r.rn + 1) "
    "SELECT user_id, event_id, s AS ewma FROM r")


def q_percentile_cont_events(sf_dir: str):
    """Interpolated p25/p50/p75 of event value per type — SQL
    percentile_cont semantics next to the discrete quantiles_by_type
    (stages/aggregates.py group_percentile_cont: (n−1)·q is exact for
    dyadic q, interpolation is the same three IEEE ops both sides —
    bit-exact; the oracle spells the formula out with row_number
    joins instead of trusting quantile_cont's internals)."""
    from ..stages.aggregates import group_percentile_cont
    ds = _rp(sf_dir, "events", columns=["event_type", "value"])
    return group_percentile_cont(ds, "event_type", "value",
                                 qs=[0.25, 0.5, 0.75],
                                 names=["p25", "p50", "p75"])


def _percentile_cont_oracle_sql() -> str:
    picks = []
    for q, nm in ((0.25, "p25"), (0.5, "p50"), (0.75, "p75")):
        picks.append(
            f"(SELECT lo.v + ((g.n - 1) * {q} - "
            f"floor((g.n - 1) * {q})) * (hi.v - lo.v) FROM s lo, s hi "
            f"WHERE lo.event_type = g.event_type "
            f"AND hi.event_type = g.event_type "
            f"AND lo.r = CAST(floor((g.n - 1) * {q}) AS BIGINT) "
            f"AND hi.r = least(CAST(floor((g.n - 1) * {q}) AS BIGINT) "
            f"+ 1, g.n - 1)) AS {nm}")
    return (
        "WITH s AS (SELECT event_type, value AS v, "
        "row_number() OVER (PARTITION BY event_type ORDER BY value) "
        "- 1 AS r, count(*) OVER (PARTITION BY event_type) AS n "
        "FROM events WHERE value IS NOT NULL), "
        "g AS (SELECT DISTINCT event_type, n FROM s) "
        "SELECT g.event_type, " + ", ".join(picks)
        + " FROM g ORDER BY g.event_type")


def q_regex_extract_docs(sf_dir: str):
    """First-match regex field extraction over documents.text —
    leftmost '(s-word, next-word)' capture pair per doc
    (stages/textstats.py regex_extract: the C++ pc.extract_regex RE2
    kernel, nulls coalesced to '' per DuckDB regexp_extract's
    no-match contract; byte-identical strings, hash-exact)."""
    from ..stages.textstats import regex_extract
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    return regex_extract(ds, r"(s[a-z]+) ([a-z]+)", ["w1", "w2"])


_REGEX_EXTRACT_SQL = (
    "SELECT doc_id, "
    "regexp_extract(text, '(s[a-z]+) ([a-z]+)', 1) AS w1, "
    "regexp_extract(text, '(s[a-z]+) ([a-z]+)', 2) AS w2 "
    "FROM documents ORDER BY doc_id")


def q_basket_pairs(sf_dir: str):
    """Pairwise frequent itemsets: part pairs co-ordered in ≥2 orders
    — the market-basket primitive (stages/relational.py
    cooccurrence_pairs: basket exchange → id-ordered pair emit →
    pair-keyed support count; all integers, hash-exact)."""
    from ..stages.relational import cooccurrence_pairs
    ds = _rp(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    return cooccurrence_pairs(ds, "l_orderkey", "l_partkey",
                              min_support=2)


_BASKET_SQL = (
    "WITH d AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk "
    "FROM lineitem), "
    "p AS (SELECT a.pk AS item_a, b.pk AS item_b FROM d a "
    "JOIN d b ON a.ok = b.ok AND a.pk < b.pk) "
    "SELECT item_a, item_b, count(*)::BIGINT AS support FROM p "
    "GROUP BY item_a, item_b HAVING count(*) >= 2 "
    "ORDER BY item_a, item_b")


def q_incremental_stats(sf_dir: str):
    """Incremental-view maintenance: per-type (n, cent-sum, min, max)
    summarized over the first half-month of events, then the second
    half folded in by STATE MERGE ONLY (stages/aggregates.py
    incremental_group_stats — every field a commutative monoid, so
    merge(state(A), state(B)) == state(A ∪ B)). The oracle is the
    full recompute over ALL events: the gate literally checks the
    incremental path against the batch path."""
    from ..stages.aggregates import incremental_group_stats
    cut = pa.scalar(np.datetime64("2024-01-16", "us"))
    ds = _rp(sf_dir, "events", columns=["event_type", "value", "ts"])
    base = ds.map_batches(
        lambda t: t.filter(pc.less(t.column("ts"), cut)),
        batch_format="pyarrow")
    delta = ds.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("ts"), cut)),
        batch_format="pyarrow")
    return incremental_group_stats(base, delta, "event_type", "value")


_INCR_STATS_SQL = (
    "SELECT event_type AS key, count(*)::BIGINT AS n, "
    "sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS sum_cents, "
    "min(value) AS min_v, max(value) AS max_v "
    "FROM events GROUP BY event_type ORDER BY key")


def q_dbscan_customers(sf_dir: str):
    """Deterministic DBSCAN (eps = 2°, min_pts = 4) over the md5
    customer coordinates — density clustering with noise on top of
    the geo_near_pairs grid exchange (stages/clustering.py
    dbscan_geo: min-label border/cluster assignment makes the
    textbook algorithm order-free; core-core connectivity routes
    through connected_components; compare-only decisions over exact
    squared-degree distances — hash-exact)."""
    from ..stages.aggregates import md5_low64
    from ..stages.clustering import dbscan_geo

    def coords(t: pa.Table) -> pa.Table:
        ids = t.column("c_custkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        la = np.array([md5_low64(str(i)) % 1800 for i in ids.tolist()],
                      np.float64) / 10.0 - 90.0
        lo = np.array([md5_low64("x" + str(i)) % 3600
                       for i in ids.tolist()],
                      np.float64) / 10.0 - 180.0
        return pa.table({"id": pa.array(ids), "la": pa.array(la),
                         "lo": pa.array(lo)})

    pts = _rp(sf_dir, "customer", columns=["c_custkey"]) \
        .map_batches(coords, batch_format="pyarrow")
    return dbscan_geo(pts, eps_deg=2.0, min_pts=4)


_DBSCAN_SQL = (
    "WITH RECURSIVE pts AS (SELECT c_custkey AS id, "
    "(md5_number_lower(c_custkey::VARCHAR) % 1800) / 10.0 - 90.0 "
    "AS la, "
    "(md5_number_lower('x' || c_custkey::VARCHAR) % 3600) / 10.0 "
    "- 180.0 AS lo FROM customer), "
    "p AS (SELECT a.id AS ia, b.id AS ib FROM pts a JOIN pts b "
    "ON a.id < b.id WHERE (a.la-b.la)*(a.la-b.la) + "
    "((a.lo-b.lo)*0.75)*((a.lo-b.lo)*0.75) <= 4.0), "
    "sym AS (SELECT ia AS u, ib AS v FROM p "
    "UNION ALL SELECT ib, ia FROM p), "
    "nb AS (SELECT u AS id, count(*) AS nn FROM sym GROUP BY u), "
    "core AS (SELECT id FROM nb WHERE nn + 1 >= 4), "
    "ce AS (SELECT u, v FROM sym WHERE u IN (SELECT id FROM core) "
    "AND v IN (SELECT id FROM core)), "
    "reach AS (SELECT id AS node, id AS r FROM core "
    "UNION SELECT reach.node, ce.v FROM reach "
    "JOIN ce ON ce.u = reach.r), "
    "comp AS (SELECT node, min(r) AS lbl FROM reach GROUP BY node), "
    "border AS (SELECT s.u AS id, min(c.lbl) AS lbl FROM sym s "
    "JOIN comp c ON c.node = s.v "
    "WHERE s.u NOT IN (SELECT id FROM core) GROUP BY s.u) "
    "SELECT pts.id, "
    "COALESCE(comp.lbl, border.lbl, -1)::BIGINT AS label, "
    "CASE WHEN comp.node IS NOT NULL THEN 1 ELSE 0 END::BIGINT "
    "AS is_core FROM pts LEFT JOIN comp ON comp.node = pts.id "
    "LEFT JOIN border ON border.id = pts.id ORDER BY pts.id")


def q_resample_linear(sf_dir: str):
    """Per-user hourly LINEAR-interpolation resample of event values
    — the gap-fill sibling of resample_ffill for continuous gauges
    (stages/windows.py resample_linear: one keyed exchange, grid fill
    via two searchsorteds; the fraction is ONE integer-µs division and
    the interpolation the same three IEEE ops as the oracle's two
    ASOF joins — bit-exact)."""
    from ..stages.windows import resample_linear
    ds = _rp(sf_dir, "events",
             columns=["user_id", "ts", "event_id", "value"])
    return resample_linear(ds)


_RESAMPLE_LINEAR_SQL = (
    "WITH ded AS (SELECT user_id AS u, epoch_us(ts) AS t, value AS v "
    "FROM events QUALIFY row_number() OVER (PARTITION BY user_id, ts "
    "ORDER BY event_id DESC) = 1), "
    "b AS (SELECT u, ((min(t) + 3599999999) // 3600000000) "
    "* 3600000000 AS h0, (max(t) // 3600000000) * 3600000000 AS h1 "
    "FROM ded GROUP BY u), "
    "grid AS (SELECT u, unnest(generate_series(h0, h1, 3600000000)) "
    "AS h FROM b WHERE h0 <= h1), "
    "g2 AS (SELECT u, h, -h AS hn FROM grid), "
    "l AS (SELECT g.u, g.h, d.t AS tl, d.v AS vl FROM g2 g "
    "ASOF JOIN ded d ON g.u = d.u AND g.h >= d.t), "
    "ded2 AS (SELECT u, -t AS tn, t, v FROM ded), "
    "rr AS (SELECT g.u, g.h, d.t AS tr, d.v AS vr FROM g2 g "
    "ASOF JOIN ded2 d ON g.u = d.u AND g.hn >= d.tn) "
    "SELECT l.u AS user_id, l.h AS hour_us, "
    "CASE WHEN l.tl = rr.tr THEN l.vl "
    "ELSE l.vl + (rr.vr - l.vl) * ((l.h - l.tl)::DOUBLE "
    "/ (rr.tr - l.tl)::DOUBLE) END AS v "
    "FROM l JOIN rr ON rr.u = l.u AND rr.h = l.h "
    "ORDER BY user_id, hour_us")


def q_rolling_median_events(sf_dir: str):
    """Per-user rolling 7-row discrete median of event values —
    the robust running baseline next to rolling_avg_events
    (stages/windows.py rolling_median_per_key: full windows are one
    numpy sort over a strided sliding-window view; medians are COPIED
    values, quantile_disc semantics — float-exact, zero arithmetic)."""
    from ..stages.windows import rolling_median_per_key
    ds = _rp(sf_dir, "events",
             columns=["user_id", "ts", "event_id", "value"])
    return rolling_median_per_key(ds, window=7)


_ROLLING_MEDIAN_SQL = (
    "SELECT user_id AS key, event_id AS order_id, "
    "quantile_disc(value, 0.5) OVER (PARTITION BY user_id "
    "ORDER BY ts, event_id ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) "
    "AS med FROM events")


_CORR_COLS = ["l_discount", "l_linenumber", "l_quantity", "l_tax"]
_CORR_SCALES = [100, 1, 1, 100]


def q_corr_matrix_lineitem(sf_dir: str):
    """Pearson correlation matrix over four integral-after-scaling
    lineitem measures — the feature-redundancy audit generalizing
    corr_lineitem's single pair (stages/aggregates.py corr_matrix:
    per-batch integer-sum combiner row, driver folds bigints, two
    sqrts + one division per pair — bit-exact vs HUGEINT oracle)."""
    from ..stages.aggregates import corr_matrix
    ds = _rp(sf_dir, "lineitem", columns=list(_CORR_COLS))
    return corr_matrix(ds, _CORR_COLS, _CORR_SCALES)


def _corr_matrix_oracle_sql() -> str:
    k = len(_CORR_COLS)
    sel = [f"CAST(round({c} * {s}) AS HUGEINT) AS c{i}"
           for i, (c, s) in enumerate(zip(_CORR_COLS, _CORR_SCALES))]
    sums = ["count(*)::HUGEINT AS n"]
    sums += [f"sum(c{i}) AS s{i}" for i in range(k)]
    sums += [f"sum(c{i} * c{j}) AS s{i}_{j}"
             for i in range(k) for j in range(i, k)]
    rows = []
    for i in range(k):
        for j in range(i + 1, k):
            rows.append(
                f"SELECT '{_CORR_COLS[i]}' AS col_a, "
                f"'{_CORR_COLS[j]}' AS col_b, "
                f"(n * s{i}_{j} - s{i} * s{j})::DOUBLE / "
                f"(sqrt((n * s{i}_{i} - s{i} * s{i})::DOUBLE) * "
                f"sqrt((n * s{j}_{j} - s{j} * s{j})::DOUBLE)) AS r "
                "FROM s")
    return ("WITH t AS (SELECT " + ", ".join(sel) + " FROM lineitem), "
            "s AS (SELECT " + ", ".join(sums) + " FROM t) "
            + " UNION ALL ".join(rows) + " ORDER BY col_a, col_b")


def q_rfm_scores(sf_dir: str):
    """RFM customer scoring — recency/frequency/monetary per user,
    each NTILE(5)-bucketed with user-id tie-breaks
    (stages/aggregates.py rfm_scores: partial combiner + ONE
    user-keyed exchange; integers and bucketing only, no floats —
    hash-exact)."""
    from ..stages.aggregates import rfm_scores
    ds = _rp(sf_dir, "events", columns=["user_id", "ts", "value"])
    return rfm_scores(ds)


_RFM_SQL = (
    "WITH s AS (SELECT user_id, max(ts) AS mt, "
    "count(*)::BIGINT AS f, "
    "sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS m "
    "FROM events GROUP BY user_id), "
    "g AS (SELECT max(mt) AS gm FROM s), "
    "r AS (SELECT user_id, "
    "(epoch_us(gm) - epoch_us(mt))::BIGINT AS recency_us, "
    "f AS frequency, m AS monetary_cents FROM s, g) "
    "SELECT user_id, recency_us, frequency, monetary_cents, "
    "ntile(5) OVER (ORDER BY recency_us, user_id)::BIGINT AS r_score, "
    "ntile(5) OVER (ORDER BY frequency DESC, user_id)::BIGINT "
    "AS f_score, "
    "ntile(5) OVER (ORDER BY monetary_cents DESC, user_id)::BIGINT "
    "AS m_score FROM r ORDER BY user_id")


def q_user_paths(sf_dir: str):
    """Top-of-journey path analysis: each user's first three event
    types joined with '>', counted across users — the Sankey/flow
    primitive (stages/windows.py user_paths: ONE user-keyed exchange,
    per-partition path pre-counts, driver merges O(alphabet³)
    partials; strings + integer counts — hash-exact)."""
    from ..stages.windows import user_paths
    ds = _rp(sf_dir, "events",
             columns=["user_id", "ts", "event_id", "event_type"])
    return user_paths(ds, k=3)


_USER_PATHS_SQL = (
    "WITH o AS (SELECT user_id, event_type, "
    "row_number() OVER (PARTITION BY user_id "
    "ORDER BY ts, event_id) AS rn FROM events), "
    "p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn) "
    "AS path FROM o WHERE rn <= 3 GROUP BY user_id) "
    "SELECT path, count(*)::BIGINT AS n FROM p GROUP BY path "
    "ORDER BY n DESC, path")


def q_audience_overlap(sf_dir: str):
    """Audience overlap matrix: for every event-type pair, how many
    users performed BOTH — the segment-intersection primitive
    (stages/relational.py cooccurrence_pairs_str: tiny alphabet
    combiner + the basket_pairs integer kernel keyed by user;
    integer supports — hash-exact)."""
    from ..stages.relational import cooccurrence_pairs_str
    ds = _rp(sf_dir, "events", columns=["user_id", "event_type"])
    return cooccurrence_pairs_str(ds, "user_id", "event_type",
                                  min_support=1)


_AUDIENCE_SQL = (
    "WITH d AS (SELECT DISTINCT user_id AS u, event_type AS ty "
    "FROM events) "
    "SELECT a.ty AS item_a, b.ty AS item_b, "
    "count(*)::BIGINT AS support FROM d a "
    "JOIN d b ON a.u = b.u AND a.ty < b.ty "
    "GROUP BY a.ty, b.ty ORDER BY item_a, item_b")


def q_hourly_profile(sf_dir: str):
    """Hour-of-day activity profile per event type — the seasonality
    heat-map (stages/aggregates.py hourly_profile: per-batch (key,
    hour) combiner, driver merges O(keys×24); integers + ONE division
    — bit-exact)."""
    from ..stages.aggregates import hourly_profile
    ds = _rp(sf_dir, "events", columns=["event_type", "ts", "value"])
    return hourly_profile(ds)


_HOURLY_SQL = (
    "SELECT event_type, hour(ts)::BIGINT AS hour, "
    "count(*)::BIGINT AS n, "
    "sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS sum_cents, "
    "sum(CAST(round(value * 100) AS BIGINT))::BIGINT::DOUBLE "
    "/ (count(*) * 100)::BIGINT::DOUBLE AS avg_v "
    "FROM events GROUP BY event_type, hour(ts) "
    "ORDER BY event_type, hour")


def q_daily_pct_change(sf_dir: str):
    """Day-over-day percent change of each type's daily cent volume —
    the period-over-period trend op (stages/aggregates.py
    daily_pct_change: per-batch (key, day) combiner + an O(keys×days)
    driver lag; first day per type COALESCEs to 0.0 so the hash never
    rides on NULL; ONE division per row — bit-exact)."""
    from ..stages.aggregates import daily_pct_change
    ds = _rp(sf_dir, "events", columns=["event_type", "ts", "value"])
    return daily_pct_change(ds)


_DAILY_PCT_SQL = (
    "WITH d AS (SELECT event_type, "
    "epoch_us(ts) // 86400000000 AS day_idx, "
    "count(*)::BIGINT AS n, "
    "sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS sum_cents "
    "FROM events GROUP BY event_type, day_idx) "
    "SELECT event_type, day_idx::BIGINT AS day_idx, n, sum_cents, "
    "COALESCE((sum_cents - lag(sum_cents) OVER w)::DOUBLE "
    "/ (lag(sum_cents) OVER w)::DOUBLE, 0.0) AS pct FROM d "
    "WINDOW w AS (PARTITION BY event_type ORDER BY day_idx) "
    "ORDER BY event_type, day_idx")


N_KNN_QUERIES = 32
KNN_K = 5


def _knn_query_vectors(sf_dir: str) -> dict:
    """First N_KNN_QUERIES (vec, label) pairs by vec_id, via the same
    pushed-down row filter as _query_vectors."""
    import pyarrow.parquet as pq
    path = f"{sf_dir}/embeddings.parquet"
    bound = N_KNN_QUERIES
    while True:
        t = pq.read_table(path,
                          columns=["vec_id", "embedding", "label"],
                          filters=[("vec_id", "<", bound)])
        if t.num_rows >= N_KNN_QUERIES:
            break
        total = pq.ParquetFile(path).metadata.num_rows
        if t.num_rows >= total:
            break
        bound *= 16
    df = t.to_pandas().sort_values("vec_id").head(N_KNN_QUERIES)
    return {int(r.vec_id): (np.asarray(list(r.embedding), np.float64),
                            int(r.label))
            for r in df.itertuples()}


def q_knn_accuracy(sf_dir: str):
    """k-NN classifier evaluation: each of the first 32 vectors is
    classified by majority label of its 5 nearest cosine neighbors
    (self excluded; deterministic tie-breaks) — the embedding-quality
    eval primitive (stages/similarity.py knn_label_accuracy: broadcast
    query matrix + per-batch matmul top-k, O(nq·k) driver rows,
    labels via broadcast-mask filter)."""
    from ..stages.similarity import knn_label_accuracy
    ds = _rp(sf_dir, "embeddings",
             columns=["vec_id", "embedding", "label"])
    return knn_label_accuracy(ds, _knn_query_vectors(sf_dir), k=KNN_K)


_KNN_SQL = (
    f"WITH q AS (SELECT vec_id AS qid, embedding AS qv, label AS tl "
    f"FROM embeddings ORDER BY vec_id LIMIT {N_KNN_QUERIES}), "
    f"nn AS (SELECT qid, tl, e.label AS nl FROM q CROSS JOIN "
    f"embeddings e WHERE e.vec_id <> qid QUALIFY row_number() OVER "
    f"(PARTITION BY qid ORDER BY list_cosine_similarity("
    f"qv::DOUBLE[], e.embedding::DOUBLE[]) DESC, e.vec_id) "
    f"<= {KNN_K}), "
    "v AS (SELECT qid, tl, nl, count(*) AS c FROM nn "
    "GROUP BY qid, tl, nl), "
    "p AS (SELECT qid, tl, nl AS pred FROM v QUALIFY row_number() "
    "OVER (PARTITION BY qid ORDER BY c DESC, nl) = 1) "
    "SELECT qid AS vec_id, tl::BIGINT AS true_label, "
    "pred::BIGINT AS pred_label, "
    "CASE WHEN tl = pred THEN 1 ELSE 0 END::BIGINT AS correct "
    "FROM p ORDER BY vec_id")


def q_label_propagation(sf_dir: str):
    """Semi-supervised label propagation over the mixed-key lineitem
    graph — seeds (node % 97 == 0) pinned to node % 5, three
    synchronous majority rounds with deterministic (count desc, label
    asc) tie-breaks (stages/graph.py label_propagation: dense bincount
    rounds on the driver below 1M edges, owner-lookup + tagged-union
    majority exchanges above; integer counts only — hash-exact).
    Oracle: the rounds unrolled as CTEs (pagerank precedent)."""
    from ..stages.graph import label_propagation
    return label_propagation(_tri_edges(sf_dir), seed_mod=97,
                             n_labels=5, n_rounds=3)


def _label_prop_oracle_sql() -> str:
    parts = [
        f"WITH e0 AS ({_TRI_E0}), "
        "canon AS (SELECT DISTINCT least(src,dst) AS u, "
        "greatest(src,dst) AS v FROM e0 WHERE src <> dst), "
        "sym AS (SELECT u, v FROM canon "
        "UNION ALL SELECT v AS u, u AS v FROM canon), "
        "nodes AS (SELECT DISTINCT u AS node FROM sym), "
        "l0 AS (SELECT node, CASE WHEN node % 97 = 0 "
        "THEN node % 5 ELSE -1 END AS lbl FROM nodes)"]
    for r in range(1, 4):
        p = r - 1
        parts.append(
            f", c{r} AS (SELECT s.v AS node, l.lbl, count(*) AS c "
            f"FROM sym s JOIN l{p} l ON l.node = s.u "
            f"WHERE l.lbl >= 0 GROUP BY s.v, l.lbl), "
            f"w{r} AS (SELECT node, lbl FROM c{r} QUALIFY "
            f"row_number() OVER (PARTITION BY node "
            f"ORDER BY c DESC, lbl) = 1), "
            f"l{r} AS (SELECT p.node, CASE WHEN p.node % 97 = 0 "
            f"THEN p.lbl WHEN w.lbl IS NOT NULL THEN w.lbl "
            f"ELSE p.lbl END AS lbl FROM l{p} p "
            f"LEFT JOIN w{r} w ON w.node = p.node)")
    parts.append(" SELECT node, lbl::BIGINT AS label FROM l3 "
                 "ORDER BY node")
    return "".join(parts)


def q_autocorr_users(sf_dir: str):
    """Per-user lag-1 autocorrelation of event values — the
    stickiness statistic (stages/windows.py autocorr_lag1: integer
    sufficient statistics over consecutive cent pairs, two sqrts +
    ONE division — bit-exact, the welch_ttest precedent; degenerate
    users filtered on both sides)."""
    from ..stages.windows import autocorr_lag1
    ds = _rp(sf_dir, "events",
             columns=["user_id", "ts", "event_id", "value"])
    return autocorr_lag1(ds)


_AUTOCORR_SQL = (
    "WITH o AS (SELECT user_id, "
    "CAST(round(value * 100) AS HUGEINT) AS x, "
    "lead(CAST(round(value * 100) AS HUGEINT)) OVER "
    "(PARTITION BY user_id ORDER BY ts, event_id) AS y FROM events), "
    "s AS (SELECT user_id, count(*)::HUGEINT AS n, sum(x) AS sx, "
    "sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx, "
    "sum(y * y) AS syy FROM o WHERE y IS NOT NULL GROUP BY user_id) "
    "SELECT user_id, n::BIGINT AS n_pairs, "
    "(n * sxy - sx * sy)::DOUBLE / (sqrt((n * sxx - sx * sx)::DOUBLE) "
    "* sqrt((n * syy - sy * sy)::DOUBLE)) AS r1 FROM s "
    "WHERE (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0 "
    "ORDER BY user_id")


def q_snapshot_diff(sf_dir: str):
    """Snapshot/table diff — the lakehouse change-detection primitive
    over two derived versions of events (A drops event_id%5==0, B
    drops %7==0 and doubles value on %3==0), emitting added/removed/
    changed rows with −1 sentinels (stages/relational.py
    snapshot_diff: ONE tagged-union keyed exchange, searchsorted
    set-merge, O(diff) rows out; integer compares — hash-exact)."""
    from ..stages.relational import snapshot_diff
    ds = _rp(sf_dir, "events", columns=["event_id", "value"])

    def mk_a(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(eid % 5 != 0))

    def mk_b(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(eid % 7 != 0))
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        v = t.column("value").to_numpy(zero_copy_only=False)
        v = np.where(eid % 3 == 0, v * 2.0, v)
        return pa.table({"event_id": t.column("event_id"),
                         "value": pa.array(v)})

    a = ds.map_batches(mk_a, batch_format="pyarrow")
    b = ds.map_batches(mk_b, batch_format="pyarrow")
    return snapshot_diff(a, b, "event_id", "value")


_SNAPSHOT_DIFF_SQL = (
    "WITH a AS (SELECT event_id AS k, "
    "CAST(round(value * 100) AS BIGINT) AS v FROM events "
    "WHERE event_id % 5 <> 0), "
    "b AS (SELECT event_id AS k, CAST(round((CASE WHEN "
    "event_id % 3 = 0 THEN value * 2 ELSE value END) * 100) "
    "AS BIGINT) AS v FROM events WHERE event_id % 7 <> 0) "
    "SELECT COALESCE(a.k, b.k) AS key, "
    "CASE WHEN a.k IS NULL THEN 'added' "
    "WHEN b.k IS NULL THEN 'removed' ELSE 'changed' END AS status, "
    "COALESCE(a.v, -1) AS val_a, COALESCE(b.v, -1) AS val_b "
    "FROM a FULL OUTER JOIN b ON a.k = b.k "
    "WHERE a.k IS NULL OR b.k IS NULL OR a.v <> b.v ORDER BY key")


def q_degree_assortativity(sf_dir: str):
    """Degree assortativity of the mixed-key lineitem graph — do hubs
    link to hubs? (stages/graph.py degree_assortativity: Pearson r of
    (deg u, deg v) over the symmetric edge list from exact integer
    sufficient statistics; driver numpy below 1M edges, two
    payload-attach exchanges + a pure sum combiner above; two sqrts +
    ONE division — bit-exact)."""
    from ..stages.graph import degree_assortativity
    return degree_assortativity(_tri_edges(sf_dir))


_ASSORT_SQL = (
    f"WITH e0 AS ({_TRI_E0}), "
    "canon AS (SELECT DISTINCT least(src,dst) AS u, "
    "greatest(src,dst) AS v FROM e0 WHERE src <> dst), "
    "dg AS (SELECT node, count(*) AS d FROM "
    "(SELECT u AS node FROM canon UNION ALL SELECT v FROM canon) "
    "GROUP BY node), "
    "sym AS (SELECT u, v FROM canon "
    "UNION ALL SELECT v AS u, u AS v FROM canon), "
    "j AS (SELECT du.d::HUGEINT AS x, dv.d::HUGEINT AS y FROM sym "
    "JOIN dg du ON du.node = sym.u JOIN dg dv ON dv.node = sym.v), "
    "s AS (SELECT count(*)::HUGEINT AS n, sum(x) AS sx, "
    "sum(x * y) AS sxy, sum(x * x) AS sxx FROM j) "
    "SELECT n::BIGINT AS n_edges_dir, "
    "(n * sxy - sx * sx)::DOUBLE / (sqrt((n * sxx - sx * sx)::DOUBLE) "
    "* sqrt((n * sxx - sx * sx)::DOUBLE)) AS r FROM s "
    "WHERE (n * sxx - sx * sx) > 0")


def q_window_funnel(sf_dir: str):
    """Time-bounded ordered funnel level per user (windowFunnel):
    deepest view→click→purchase prefix with strictly increasing
    timestamps all within 2 h of the chain's first event
    (stages/windows.py window_funnel: greedy earliest-next-step ==
    EXISTS-any-chain, proved in the docstring; integer-µs compares —
    hash-exact)."""
    from ..stages.windows import window_funnel
    ds = _rp(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    return window_funnel(ds, stages=("view", "click", "purchase"),
                         window_minutes=120.0)


_WINDOW_FUNNEL_SQL = (
    "WITH v AS (SELECT user_id AS u, epoch_us(ts) AS t FROM events "
    "WHERE event_type = 'view'), "
    "c AS (SELECT user_id AS u, epoch_us(ts) AS t FROM events "
    "WHERE event_type = 'click'), "
    "p AS (SELECT user_id AS u, epoch_us(ts) AS t FROM events "
    "WHERE event_type = 'purchase'), "
    "users AS (SELECT DISTINCT user_id AS u FROM events "
    "WHERE event_type IN ('view', 'click', 'purchase')), "
    "l3 AS (SELECT DISTINCT v.u FROM v JOIN c ON c.u = v.u "
    "AND c.t > v.t AND c.t <= v.t + 7200000000 "
    "JOIN p ON p.u = v.u AND p.t > c.t "
    "AND p.t <= v.t + 7200000000), "
    "l2 AS (SELECT DISTINCT v.u FROM v JOIN c ON c.u = v.u "
    "AND c.t > v.t AND c.t <= v.t + 7200000000), "
    "l1 AS (SELECT DISTINCT u FROM v) "
    "SELECT u AS user_id, CASE "
    "WHEN u IN (SELECT u FROM l3) THEN 3 "
    "WHEN u IN (SELECT u FROM l2) THEN 2 "
    "WHEN u IN (SELECT u FROM l1) THEN 1 ELSE 0 END::BIGINT AS level "
    "FROM users ORDER BY user_id")


def q_max_concurrency(sf_dir: str):
    """Peak concurrent open intervals per user — the load-peak sweep
    over interval_union's variable-length intervals
    (stages/windows.py max_concurrency: ±1 boundary events, closes
    before opens at equal instants (half-open), segmented running-sum
    max; pure integers — hash-exact)."""
    from ..stages.windows import max_concurrency
    ds = _rp(sf_dir, "events", columns=["user_id", "ts", "event_id"])
    return max_concurrency(ds)


_MAX_CONC_SQL = (
    "WITH b AS (SELECT user_id AS u, epoch_us(ts) AS t, 1 AS d "
    "FROM events UNION ALL SELECT user_id, "
    "epoch_us(ts) + (1 + event_id % 20) * 60000000, -1 FROM events), "
    "r AS (SELECT u, sum(d) OVER (PARTITION BY u ORDER BY t, d "
    "ROWS UNBOUNDED PRECEDING) AS rsum FROM b) "
    "SELECT u AS user_id, max(rsum)::BIGINT AS max_open FROM r "
    "GROUP BY u ORDER BY user_id")


def q_ohlc_bars(sf_dir: str):
    """Hourly OHLC candle + volume per event type — the market-data /
    telemetry downsampling bar (stages/windows.py ohlc_bars: map-side
    reduceat combiner, ONE groupby merge over O(blocks × bars) partial
    rows; open/close are value COPIES at the min/max (ts, event_id)
    row so no float is ever combined, volume folds as exact integer
    cents finished by one division — bit-exact)."""
    from ..stages.windows import ohlc_bars
    ds = _rp(sf_dir, "events",
             columns=["event_type", "ts", "event_id", "value"])
    return ohlc_bars(ds)


_OHLC_SQL = (
    "WITH b AS (SELECT event_type, "
    "(epoch_us(ts) // 3600000000) * 3600000000 AS bar_ts, "
    "epoch_us(ts) AS t, event_id, value, "
    "CAST(round(value * 100) AS BIGINT) AS cents FROM events), "
    "o AS (SELECT *, row_number() OVER (PARTITION BY event_type, "
    "bar_ts ORDER BY t, event_id) AS ra, row_number() OVER "
    "(PARTITION BY event_type, bar_ts ORDER BY t DESC, event_id DESC) "
    "AS rd FROM b) "
    "SELECT event_type, bar_ts, "
    "max(CASE WHEN ra = 1 THEN value END) AS px_open, "
    "max(value) AS px_high, min(value) AS px_low, "
    "max(CASE WHEN rd = 1 THEN value END) AS px_close, "
    "count(*)::BIGINT AS n_events, "
    "sum(cents)::BIGINT::DOUBLE / 100.0 AS volume "
    "FROM o GROUP BY event_type, bar_ts ORDER BY event_type, bar_ts")


def q_cusum_users(sf_dir: str):
    """Per-row one-sided CUSUM drift statistic + alarm flag per user
    (Page 1954), target 55 / threshold 250 — the sequential
    changepoint detector next to ewma_users (stages/windows.py
    cusum_per_user: ONE user-keyed exchange, the step loop vectorizes
    ACROSS users; sub-add-max per step is the identical IEEE sequence
    the recursive-CTE oracle executes — bit-exact)."""
    from ..stages.windows import cusum_per_user
    ds = _rp(sf_dir, "events",
             columns=["user_id", "ts", "event_id", "value"])
    return cusum_per_user(ds, target=55.0, threshold=250.0)


_CUSUM_SQL = (
    "WITH RECURSIVE o AS (SELECT user_id, event_id, value, "
    "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) "
    "AS rn FROM events), "
    "r AS (SELECT user_id, event_id, rn, "
    "greatest(0.0, value - 55.0) AS s FROM o WHERE rn = 1 "
    "UNION ALL SELECT o.user_id, o.event_id, o.rn, "
    "greatest(0.0, r.s + (o.value - 55.0)) FROM r "
    "JOIN o ON o.user_id = r.user_id AND o.rn = r.rn + 1) "
    "SELECT user_id, event_id, s AS cusum, "
    "(s > 250.0)::BIGINT AS alarm FROM r")


def q_kmv_distinct(sf_dir: str):
    """K-Minimum-Values distinct-user sketch (k=64) — the third
    cardinality sketch, picked because its registers are EXACTLY
    SQL-computable: state = the k smallest distinct 63-bit md5 hashes
    (stages/sketches.py kmv_distinct: pure combiner, merge = k
    smallest of the union, driver folds O(batches×k) ints). The
    estimate is one exact-constant multiply + ONE division both sides;
    under k distinct values the sketch IS the exact count — at
    sf0.001 the exact branch grades, at sf0.01 the estimator branch."""
    from ..stages.sketches import kmv_distinct
    ds = _rp(sf_dir, "events", columns=["user_id"])
    return kmv_distinct(ds, "user_id", k=64)


_KMV_SQL = (
    "WITH h AS (SELECT DISTINCT (md5_number_lower(user_id::VARCHAR) "
    "& 9223372036854775807::UBIGINT)::BIGINT AS hv FROM events), "
    "s AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rn, "
    "count(*) OVER () AS nd FROM h), "
    "agg AS (SELECT max(nd) AS nd, max(CASE WHEN rn = least(nd, 64) "
    "THEN hv END) AS kth FROM s) "
    "SELECT least(nd, 64)::BIGINT AS k_used, kth::BIGINT AS kth_hash, "
    "CASE WHEN nd < 64 THEN nd::DOUBLE ELSE "
    "(63::DOUBLE * 9223372036854775808.0) / kth::DOUBLE END AS est "
    "FROM agg")


def q_late_data_stats(sf_dir: str):
    """Watermark late-data audit: events arrive in event_id order, the
    watermark trails the running max event-time by 600 s, late =
    event-time older than the watermark at arrival; per-type counts
    (stages/windows.py late_data_stats: two-pass segmented prefix
    scan — per-bucket max combiner + driver O(buckets) exclusive
    prefix, then ONE bucket-keyed exchange with broadcast carry-ins;
    all-integer µs, exact)."""
    from ..stages.windows import late_data_stats
    ds = _rp(sf_dir, "events",
             columns=["event_id", "ts", "event_type"])
    return late_data_stats(ds, delay_us=600_000_000)


_LATE_SQL = (
    "WITH o AS (SELECT event_type, epoch_us(ts) AS t, "
    "max(epoch_us(ts)) OVER (ORDER BY event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm "
    "FROM events) "
    "SELECT event_type, count(*)::BIGINT AS n_events, "
    "sum(CASE WHEN wm IS NOT NULL AND t + 600000000 < wm "
    "THEN 1 ELSE 0 END)::BIGINT AS n_late "
    "FROM o GROUP BY event_type ORDER BY event_type")


def q_sequence_match(sf_dir: str):
    """Per-user event-SEQUENCE regex match: view, later click, later
    purchase with arbitrary gaps ('v.*c.*p') — the MATCH_RECOGNIZE /
    sequenceMatch generalization of window_funnel (stages/windows.py
    sequence_match: ONE user-keyed exchange, one compiled regex per
    user over its (ts, event_id)-ordered code string; oracle =
    string_agg ORDER BY + regexp)."""
    from ..stages.windows import sequence_match
    ds = _rp(sf_dir, "events",
             columns=["user_id", "ts", "event_id", "event_type"])
    return sequence_match(
        ds, pattern="v.*c.*p",
        code_map={"signup": "s", "click": "c", "error": "e",
                  "view": "v", "purchase": "p"})


_SEQ_MATCH_SQL = (
    "WITH o AS (SELECT user_id, ts, event_id, "
    "CASE event_type WHEN 'signup' THEN 's' WHEN 'click' THEN 'c' "
    "WHEN 'error' THEN 'e' WHEN 'view' THEN 'v' "
    "WHEN 'purchase' THEN 'p' ELSE '?' END AS code FROM events) "
    "SELECT user_id, count(*)::BIGINT AS n_events, "
    "CASE WHEN regexp_matches(string_agg(code, '' "
    "ORDER BY ts, event_id), 'v.*c.*p') THEN 1 ELSE 0 END::BIGINT "
    "AS matched FROM o GROUP BY user_id ORDER BY user_id")


def q_zorder_orders(sf_dir: str):
    """Z-order (Morton) layout key over orders, x = custkey low 16
    bits, y = order-date day number low 16 bits; first 500 rows of the
    z-ordered layout — the lakehouse OPTIMIZE ZORDER clustering
    primitive (stages/relational.py zorder_layout: vectorized bit
    interleave in map_batches, per-batch top-k prune + one
    single-partition merge, no global sort shuffle; all-integer, the
    oracle recomputes the interleave with a generate_series fold)."""
    from ..stages.relational import zorder_layout
    ds = _rp(sf_dir, "orders",
             columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def x_of(t):
        return t.column("o_custkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)

    def y_of(t):
        return (t.column("o_orderdate").to_numpy(zero_copy_only=False)
                .astype("datetime64[us]").astype(np.int64)
                // 86_400_000_000)

    return zorder_layout(ds, "o_custkey", "o_orderdate", x_of, y_of,
                         id_cols=["o_orderkey", "o_custkey"], k=500)


_ZORDER_SQL = (
    "WITH b AS (SELECT o_orderkey, o_custkey, "
    "o_custkey % 65536 AS x, "
    "((epoch_us(o_orderdate) // 86400000000) % 65536) AS y "
    "FROM orders), "
    "z AS (SELECT o_orderkey, o_custkey, "
    "list_sum(list_transform(generate_series(0, 15), i -> "
    "(((x >> i) & 1) << (2 * i)) + (((y >> i) & 1) << (2 * i + 1))))"
    "::BIGINT AS zcode FROM b) "
    "SELECT o_orderkey, o_custkey, zcode FROM z "
    "ORDER BY zcode, o_orderkey, o_custkey LIMIT 500")


def q_mis_nodes(sf_dir: str):
    """Maximal independent set of the undirected mixed-key lineitem
    graph — static-md5-priority parallel greedy (Luby with the coin
    replaced by a fixed hash, so the result is the deterministic
    priority-order-first MIS and the oracle can REPLAY the rounds as
    unrolled CTEs; converges in 3/5 rounds at sf0.001/0.01, the SQL
    unrolls 8 — extra rounds are no-ops once nothing is live).
    stages/graph.py maximal_independent_set: numpy driver loop below
    1M edges, four keyed exchanges per round above; both paths
    parity-pinned in pytest."""
    from ..stages.graph import maximal_independent_set
    return maximal_independent_set(_tri_edges(sf_dir))


def _mis_oracle_sql(rounds: int = 8) -> str:
    # every CTE is MATERIALIZED: each round references the previous
    # state 4x, so default inlining would expand the parquet scan
    # 3^rounds times (observed: "Too many open files")
    parts = [
        f"WITH e0 AS MATERIALIZED ({_TRI_E0}), ",
        "e AS MATERIALIZED (SELECT DISTINCT src, dst FROM "
        "(SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0) "
        "WHERE src <> dst), ",
        "n0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM e), ",
        "p AS MATERIALIZED (SELECT node, "
        "(md5_number_lower(node::VARCHAR) & "
        "9223372036854775807::UBIGINT)::BIGINT AS prio FROM n0), ",
        "s0 AS MATERIALIZED (SELECT node, 0 AS st FROM n0), ",
    ]
    for i in range(rounds):
        a, b, c = f"s{i}", f"s{i + 1}", f"c{i + 1}"
        parts.append(
            f"{c} AS MATERIALIZED (SELECT s.node FROM {a} s "
            "JOIN p ps ON ps.node = s.node WHERE s.st = 0 AND "
            f"NOT EXISTS (SELECT 1 FROM e JOIN {a} t ON t.node = e.src "
            "JOIN p q ON q.node = e.src WHERE e.dst = s.node "
            "AND t.st = 0 AND q.prio <= ps.prio)), ")
        parts.append(
            f"{b} AS MATERIALIZED (SELECT s.node, CASE WHEN s.node IN "
            f"(SELECT node FROM {c}) THEN 1 WHEN s.st = 0 AND EXISTS "
            f"(SELECT 1 FROM e JOIN {c} cc ON cc.node = e.src "
            "WHERE e.dst = s.node) THEN 2 ELSE s.st END AS st "
            f"FROM {a} s), ")
    body = "".join(parts)
    return (body.rstrip(", ")
            + f" SELECT node FROM s{rounds} WHERE st = 1 ORDER BY node")


def q_closeness_sampled(sf_dir: str):
    """Landmark (sampled) closeness-centrality statistics from the 4
    smallest node ids of the undirected mixed-key lineitem graph —
    per node the count of landmarks reaching it and the exact integer
    sum of hop distances (stages/graph.py closeness_sampled: 4
    sequential bfs_hops runs over ONE materialized edge Dataset,
    O(S·V) result-sized fold; bfs paths parity-pinned). Oracle: one
    multi-seed bounded recursive CTE carrying the seed id."""
    from ..stages.graph import closeness_sampled

    def both(t: pa.Table) -> pa.Table:
        a = t.column("src").combine_chunks()
        b = t.column("dst").combine_chunks()
        return pa.table({"src": pa.concat_arrays([a, b]),
                         "dst": pa.concat_arrays([b, a])})

    return closeness_sampled(_tri_edges(sf_dir).map_batches(
        both, batch_format="pyarrow"), n_sources=4)


_CLOSENESS_SQL = (
    f"WITH RECURSIVE e0 AS ({_TRI_E0}), "
    "e AS (SELECT DISTINCT src, dst FROM "
    "(SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)), "
    "seeds AS (SELECT DISTINCT src AS node FROM e "
    "ORDER BY node LIMIT 4), "
    "r AS (SELECT node AS sid, node, 0 AS hops FROM seeds "
    "UNION SELECT r.sid, e.dst, r.hops + 1 FROM r "
    "JOIN e ON e.src = r.node WHERE r.hops < 24), "
    "m AS (SELECT sid, node, min(hops) AS h FROM r "
    "GROUP BY sid, node) "
    "SELECT node, count(*)::BIGINT AS n_src, "
    "sum(h)::BIGINT AS sum_hops FROM m GROUP BY node ORDER BY node")


def q_rake_keywords(sf_dir: str):
    """Top-40 RAKE keywords over documents — the classic unsupervised
    keyword extractor reduced to its exact-integer core: phrases break
    at stopwords, each non-stop word scores (freq, deg = Σ phrase
    length over its occurrences) (stages/textstats.py rake_keywords:
    per-batch partial dicts, ONE groupby(word) sum, per-batch top-k
    prune — no global sort). The oracle rebuilds phrases in SQL with a
    running stopword-count window over the unnested token list."""
    from ..stages.textstats import rake_keywords
    ds = _rp(sf_dir, "documents", columns=["text"])
    return rake_keywords(ds, k=40)


_RAKE_SQL = (
    "WITH w0 AS (SELECT doc_id, "
    "string_split_regex(lower(text), '[^a-z]+') AS lst "
    "FROM documents), "
    "w AS (SELECT doc_id, lst[i] AS w, i FROM w0, "
    "UNNEST(generate_series(1, len(lst))) AS t(i) "
    "WHERE lst[i] <> ''), "
    "m AS (SELECT doc_id, w, i, CASE WHEN w IN ('the', 'a', 'and', "
    "'of', 'to', 'in', 'is', 'for', 'on', 'with') THEN 1 ELSE 0 END "
    "AS stop FROM w), "
    "p AS (SELECT doc_id, w, stop, sum(stop) OVER "
    "(PARTITION BY doc_id ORDER BY i ROWS UNBOUNDED PRECEDING) "
    "AS pid FROM m), "
    "ph AS (SELECT doc_id, pid, count(*) AS plen FROM p "
    "WHERE stop = 0 GROUP BY doc_id, pid), "
    "wd AS (SELECT p.w, count(*) AS freq, sum(ph.plen) AS deg "
    "FROM p JOIN ph ON ph.doc_id = p.doc_id AND ph.pid = p.pid "
    "WHERE p.stop = 0 GROUP BY p.w) "
    "SELECT w AS word, freq::BIGINT AS freq, deg::BIGINT AS deg "
    "FROM wd ORDER BY deg DESC, freq DESC, word LIMIT 40")


def q_apriori_triples(sf_dir: str):
    """Level-3 frequent itemsets: part triples co-ordered in ≥2 orders
    (stages/relational.py apriori_triples: pairwise level reused from
    cooccurrence_pairs, frequent-pair set broadcast once, one
    basket-keyed pruned-triple emit + one support-count exchange; the
    Apriori pruning changes work, never results — support monotonicity
    — so the oracle is the plain triple self-join with HAVING)."""
    from ..stages.relational import apriori_triples
    ds = _rp(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    return apriori_triples(ds, "l_orderkey", "l_partkey",
                           min_support=2)


_APRIORI_SQL = (
    "WITH d AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk "
    "FROM lineitem) "
    "SELECT a.pk AS item_a, b.pk AS item_b, c.pk AS item_c, "
    "count(*)::BIGINT AS support "
    "FROM d a JOIN d b ON a.ok = b.ok AND a.pk < b.pk "
    "JOIN d c ON a.ok = c.ok AND b.pk < c.pk "
    "GROUP BY item_a, item_b, item_c HAVING count(*) >= 2 "
    "ORDER BY item_a, item_b, item_c")


def q_kmv_set_ops(sf_dir: str):
    """Theta-sketch set operations over the click-user and view-user
    KMV sketches (k=64): union and intersection cardinality estimates
    from exactly-SQL-computable registers (stages/sketches.py
    kmv_set_ops: one tagged combiner pass, driver folds O(batches×k)
    ints; ≤2 IEEE ops per estimate — bit-exact twin; at sf0.001 both
    sketches are unsaturated so the same query grades the exact
    degenerate branch, at sf0.01 the estimator branch)."""
    from ..stages.sketches import kmv_set_ops
    ds = _rp(sf_dir, "events", columns=["user_id", "event_type"])
    return kmv_set_ops(ds, "user_id", "event_type",
                       "click", "view", k=64)


_KMV_SET_SQL = (
    "WITH ca AS (SELECT DISTINCT (md5_number_lower(user_id::VARCHAR) "
    "& 9223372036854775807::UBIGINT)::BIGINT AS hv FROM events "
    "WHERE event_type = 'click'), "
    "cb AS (SELECT DISTINCT (md5_number_lower(user_id::VARCHAR) "
    "& 9223372036854775807::UBIGINT)::BIGINT AS hv FROM events "
    "WHERE event_type = 'view'), "
    "ra AS (SELECT hv FROM (SELECT hv, row_number() OVER "
    "(ORDER BY hv) AS rn FROM ca) WHERE rn <= 64), "
    "rb AS (SELECT hv FROM (SELECT hv, row_number() OVER "
    "(ORDER BY hv) AS rn FROM cb) WHERE rn <= 64), "
    "ka AS (SELECT count(*) AS n, max(hv) AS mx FROM ra), "
    "kb AS (SELECT count(*) AS n, max(hv) AS mx FROM rb), "
    "th AS (SELECT least("
    "CASE WHEN ka.n = 64 THEN ka.mx::DOUBLE "
    "ELSE 9223372036854775808.0 END, "
    "CASE WHEN kb.n = 64 THEN kb.mx::DOUBLE "
    "ELSE 9223372036854775808.0 END) AS theta FROM ka, kb), "
    "cm AS (SELECT count(*) AS n_match FROM ra JOIN rb USING (hv) "
    "CROSS JOIN th WHERE ra.hv::DOUBLE < th.theta), "
    "ru AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rn, "
    "count(*) OVER () AS nd FROM "
    "(SELECT hv FROM ra UNION SELECT hv FROM rb)), "
    "uu AS (SELECT max(nd) AS nd, max(CASE WHEN rn = least(nd, 64) "
    "THEN hv END) AS kth FROM ru) "
    "SELECT ka.n::BIGINT AS k_a, kb.n::BIGINT AS k_b, "
    "CASE WHEN uu.nd < 64 THEN uu.nd::DOUBLE ELSE "
    "(63::DOUBLE * 9223372036854775808.0) / uu.kth::DOUBLE END "
    "AS est_union, cm.n_match::BIGINT AS n_match, "
    "(cm.n_match::DOUBLE * 9223372036854775808.0) / th.theta "
    "AS est_intersection FROM ka, kb, th, cm, uu")


def q_dag_layers(sf_dir: str):
    """Topological layers of the degree-oriented acyclification of the
    mixed-key lineitem graph — longest in-path length per node, the
    parallel-scheduling depth of a dependency DAG (stages/graph.py
    dag_layers: numpy Kahn peel on the driver below 1M edges; above,
    degree-attach + orient exchanges once, then two keyed exchanges
    per peel round; both paths parity-pinned). Oracle: the alive-set
    recurrence as a bounded recursive CTE — a node's max surviving
    iteration IS its longest in-path (bound 48 >> depth 20 at
    sf0.01)."""
    from ..stages.graph import dag_layers
    return dag_layers(_tri_edges(sf_dir))


_DAG_LAYERS_SQL = (
    f"WITH RECURSIVE e0 AS ({_TRI_E0}), "
    "canon AS (SELECT DISTINCT least(src, dst) AS u, "
    "greatest(src, dst) AS v FROM e0 WHERE src <> dst), "
    "adj AS (SELECT u AS a, v AS b FROM canon "
    "UNION ALL SELECT v, u FROM canon), "
    "dg AS (SELECT a AS node, count(*) AS d FROM adj GROUP BY a), "
    "ed AS (SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND "
    "c.u < c.v) THEN c.u ELSE c.v END AS src, "
    "CASE WHEN du.d < dv.d OR (du.d = dv.d AND c.u < c.v) "
    "THEN c.v ELSE c.u END AS dst FROM canon c "
    "JOIN dg du ON du.node = c.u JOIN dg dv ON dv.node = c.v), "
    "r AS (SELECT 0 AS it, node FROM dg "
    "UNION SELECT a.it + 1, e.dst FROM ed e "
    "JOIN r a ON a.node = e.src WHERE a.it < 48) "
    "SELECT node, max(it)::BIGINT AS layer FROM r "
    "GROUP BY node ORDER BY node")


def q_stream_window_join(sf_dir: str):
    """Stream-stream interval join: every (click, view) pair of the
    same user within ±1 day — the Flink/Beam dual-buffer windowed
    join (stages/joins.py stream_window_join: ONE user-keyed
    exchange, per-key vectorized window bisection, output = true pair
    count; exact integer µs deltas)."""
    from ..stages.joins import stream_window_join
    ds = _rp(sf_dir, "events",
             columns=["user_id", "ts", "event_id", "event_type"])
    out = stream_window_join(ds, "user_id", "ts", "event_id",
                             "event_type", "click", "view",
                             window_us=86_400_000_000)

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            ["user_id", "left_id", "right_id", "dt_us"])

    return out.map_batches(rename, batch_format="pyarrow")


_STREAM_JOIN_SQL = (
    "SELECT c.user_id, c.event_id AS left_id, "
    "v.event_id AS right_id, "
    "(epoch_us(v.ts) - epoch_us(c.ts))::BIGINT AS dt_us "
    "FROM events c JOIN events v ON c.user_id = v.user_id "
    "AND c.event_type = 'click' AND v.event_type = 'view' "
    "AND abs(epoch_us(v.ts) - epoch_us(c.ts)) <= 86400000000 "
    "ORDER BY c.user_id, left_id, right_id")


def q_window_dedup(sf_dir: str):
    """Keep-first-in-window throttle per (user, type), 1-day gap —
    the CDC-ingest / notification dedup whose state tracks the last
    KEPT event, not the previous row (stages/windows.py window_dedup:
    one user-keyed exchange, the step loop advances every group's
    last-kept timestamp at once; all-integer µs). Oracle: the kept
    chain stepped in a recursive CTE."""
    from ..stages.windows import window_dedup
    ds = _rp(sf_dir, "events",
             columns=["user_id", "ts", "event_id", "event_type"])
    return window_dedup(ds, gap_us=86_400_000_000)


_WINDOW_DEDUP_SQL = (
    "WITH RECURSIVE o AS (SELECT user_id, event_type, event_id, "
    "epoch_us(ts) AS t, row_number() OVER (PARTITION BY user_id, "
    "event_type ORDER BY ts, event_id) AS rn FROM events), "
    "r AS (SELECT user_id, event_type, event_id, rn, t, 1 AS kept, "
    "t AS last_t FROM o WHERE rn = 1 "
    "UNION ALL SELECT o.user_id, o.event_type, o.event_id, o.rn, "
    "o.t, CASE WHEN o.t - r.last_t >= 86400000000 THEN 1 ELSE 0 END, "
    "CASE WHEN o.t - r.last_t >= 86400000000 THEN o.t ELSE r.last_t "
    "END FROM r JOIN o ON o.user_id = r.user_id "
    "AND o.event_type = r.event_type AND o.rn = r.rn + 1) "
    "SELECT event_id, kept::BIGINT AS kept FROM r")


def q_holt_users(sf_dir: str):
    """Per-row Holt double exponential smoothing (level + trend,
    α = 1/4, β = 1/8) of each user's value stream — the trend-aware
    forecasting baseline one notch past ewma_users (stages/windows.py
    holt_linear: one user-keyed exchange, the step loop advances every
    user's (level, trend) pair at once; identical fixed-operand IEEE
    op tree as the recursive-CTE oracle — bit-exact)."""
    from ..stages.windows import holt_linear
    ds = _rp(sf_dir, "events",
             columns=["user_id", "ts", "event_id", "value"])
    return holt_linear(ds, alpha=0.25, beta=0.125)


_HOLT_SQL = (
    "WITH RECURSIVE o AS (SELECT user_id, event_id, value, "
    "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) "
    "AS rn FROM events), "
    "r AS (SELECT user_id, event_id, rn, value AS l, 0.0::DOUBLE AS b "
    "FROM o WHERE rn = 1 "
    "UNION ALL SELECT o.user_id, o.event_id, o.rn, "
    "0.25::DOUBLE * o.value + 0.75::DOUBLE * (r.l + r.b), "
    "0.125::DOUBLE * ((0.25::DOUBLE * o.value "
    "+ 0.75::DOUBLE * (r.l + r.b)) - r.l) + 0.875::DOUBLE * r.b "
    "FROM r JOIN o ON o.user_id = r.user_id AND o.rn = r.rn + 1) "
    "SELECT user_id, event_id, l AS level, b AS trend FROM r")


def q_abtest_lift(sf_dir: str):
    """Two-proportion A/B read-out: users split by id parity, converts
    = ≥15 purchase events (any-purchase is p=1-degenerate on this
    population and would NaN the pooled z); counts + lift + pooled
    z-statistic (stages/aggregates.py abtest_lift: per-batch partial
    user-max rows, one groupby(user) fold, 4-int driver combiner; the
    float finish is a fixed op tree with one correctly-rounded sqrt —
    the welch_ttest bit-exact convention)."""
    from ..stages.aggregates import abtest_lift
    ds = _rp(sf_dir, "events", columns=["user_id", "event_type"])
    return abtest_lift(ds, convert_type="purchase")


_ABTEST_SQL = (
    "WITH u AS (SELECT user_id, CASE WHEN sum(CASE WHEN "
    "event_type = 'purchase' THEN 1 ELSE 0 END) >= 15 THEN 1 "
    "ELSE 0 END AS cv FROM events GROUP BY user_id), "
    "ag AS (SELECT "
    "sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS n_a, "
    "sum(CASE WHEN user_id % 2 = 0 THEN cv ELSE 0 END) AS c_a, "
    "sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS n_b, "
    "sum(CASE WHEN user_id % 2 = 1 THEN cv ELSE 0 END) AS c_b "
    "FROM u) "
    "SELECT n_a::BIGINT AS n_a, c_a::BIGINT AS c_a, "
    "n_b::BIGINT AS n_b, c_b::BIGINT AS c_b, "
    "(c_a::DOUBLE / n_a::DOUBLE - c_b::DOUBLE / n_b::DOUBLE) "
    "AS lift, "
    "(c_a::DOUBLE / n_a::DOUBLE - c_b::DOUBLE / n_b::DOUBLE) / "
    "sqrt(((c_a + c_b)::DOUBLE / (n_a + n_b)::DOUBLE) * "
    "(1.0 - (c_a + c_b)::DOUBLE / (n_a + n_b)::DOUBLE) * "
    "((n_a + n_b)::DOUBLE / (n_a * n_b)::DOUBLE)) AS z_stat "
    "FROM ag")


def q_share_of_total(sf_dir: str):
    """Per-event share of its type's total value — the
    percent-of-total window behind mix/composition reports
    (stages/aggregates.py share_of_total: cents-sum combiner folded
    to O(groups) totals on the driver, broadcast back, ONE division
    per row — no row shuffle; bit-exact)."""
    from ..stages.aggregates import share_of_total
    ds = _rp(sf_dir, "events",
             columns=["event_id", "event_type", "value"])
    return share_of_total(ds)


_SHARE_SQL = (
    "WITH b AS (SELECT event_id, event_type, "
    "CAST(round(value * 100) AS BIGINT) AS cents FROM events) "
    "SELECT event_id, event_type, cents::DOUBLE / "
    "(sum(cents) OVER (PARTITION BY event_type))::DOUBLE AS share "
    "FROM b")


def q_isotonic_hourly(sf_dir: str):
    """Isotonic (monotone) regression of mean value over hour-of-day
    per event type — the shape-constrained calibration fit, PAVA via
    the minimax identity ŷᵢ = max_{j≤i} min_{k≥i} mean(j..k)
    (stages/aggregates.py isotonic_hourly: (key, hour) cents
    combiner, O(keys·24²) driver minimax; every range mean is ONE
    division of exact integer sums and max/min are selections, so
    the SQL twin computing the SAME divisions is bit-exact —
    incremental PAVA pooling would NOT be)."""
    from ..stages.aggregates import isotonic_hourly
    ds = _rp(sf_dir, "events",
             columns=["event_type", "ts", "value"])
    return isotonic_hourly(ds)


_ISOTONIC_SQL = (
    "WITH b AS (SELECT event_type, "
    "((epoch_us(ts) // 3600000000) % 24) AS hour, "
    "CAST(round(value * 100) AS BIGINT) AS cents FROM events), "
    "g AS (SELECT event_type, hour, count(*) AS n, sum(cents) AS s "
    "FROM b GROUP BY event_type, hour), "
    "o AS (SELECT *, row_number() OVER (PARTITION BY event_type "
    "ORDER BY hour) AS rn FROM g), "
    "p AS (SELECT event_type, rn, hour, n, s, sum(n) OVER w AS cn, "
    "sum(s) OVER w AS cs FROM o WINDOW w AS (PARTITION BY event_type "
    "ORDER BY rn ROWS UNBOUNDED PRECEDING)), "
    "r AS (SELECT a.event_type, a.rn AS j, b2.rn AS k, "
    "(b2.cs - a.cs + a.s)::DOUBLE / (b2.cn - a.cn + a.n)::DOUBLE "
    "AS m FROM p a JOIN p b2 ON a.event_type = b2.event_type "
    "AND a.rn <= b2.rn), "
    "mn AS (SELECT i.event_type, i.rn AS pos, r.j, min(r.m) AS mi "
    "FROM p i JOIN r ON r.event_type = i.event_type "
    "AND r.j <= i.rn AND r.k >= i.rn GROUP BY i.event_type, i.rn, "
    "r.j), "
    "ft AS (SELECT event_type, pos, max(mi) AS f FROM mn "
    "GROUP BY event_type, pos) "
    "SELECT p.event_type, p.hour, p.n::BIGINT AS n_events, "
    "p.s::DOUBLE / (p.n * 100)::DOUBLE AS mean_v, "
    "ft.f / 100.0 AS fitted FROM p "
    "JOIN ft ON ft.event_type = p.event_type AND ft.pos = p.rn "
    "ORDER BY p.event_type, p.hour")


def q_freq_cap(sf_dir: str):
    """Frequency-capping audit: rank events within (user, type, day)
    by (ts, id), flag past the 3rd — the ad-serving budget primitive
    (stages/windows.py freq_cap: one user-keyed exchange, one lexsort
    ranks every cell via segmented sequence indices; pure integer)."""
    from ..stages.windows import freq_cap
    ds = _rp(sf_dir, "events",
             columns=["user_id", "ts", "event_id", "event_type"])
    return freq_cap(ds, cap=3)


_FREQ_CAP_SQL = (
    "WITH o AS (SELECT event_id, row_number() OVER (PARTITION BY "
    "user_id, event_type, epoch_us(ts) // 86400000000 "
    "ORDER BY ts, event_id) AS rk FROM events) "
    "SELECT event_id, rk::BIGINT AS rank, "
    "CASE WHEN rk > 3 THEN 1 ELSE 0 END::BIGINT AS capped FROM o")


def q_ktruss_edges(sf_dir: str):
    """3-truss of the undirected mixed-key lineitem graph — the edge
    set where every edge closes ≥1 triangle within the surviving
    subgraph, peeled to fixpoint (stages/graph.py k_truss: per-round
    wedge-close with per-EDGE credit; numpy driver loop below 1M
    edges, six keyed exchanges per round above; both paths
    parity-pinned; converges in 2 rounds here, oracle unrolls 4 as
    MATERIALIZED CTEs — the mis_nodes inlining landmine)."""
    from ..stages.graph import k_truss
    return k_truss(_tri_edges(sf_dir), k=3)


def _ktruss_oracle_sql(k: int = 3, rounds: int = 4) -> str:
    thr = k - 2
    parts = [
        f"WITH e0 AS MATERIALIZED ({_TRI_E0}), ",
        "a0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS u, "
        "greatest(src, dst) AS v FROM e0 WHERE src <> dst), ",
    ]
    for i in range(rounds):
        a, b = f"a{i}", f"a{i + 1}"
        parts.append(
            f"adj{i} AS MATERIALIZED (SELECT u AS a, v AS b FROM {a} "
            f"UNION ALL SELECT v, u FROM {a}), ")
        parts.append(
            f"{b} AS MATERIALIZED (SELECT e.u, e.v FROM {a} e "
            f"JOIN adj{i} x ON x.a = e.u "
            f"JOIN adj{i} y ON y.a = e.v AND y.b = x.b "
            f"GROUP BY e.u, e.v HAVING count(*) >= {thr}), ")
    body = "".join(parts)
    return (body.rstrip(", ")
            + f" SELECT u AS src, v AS dst FROM a{rounds} "
            "ORDER BY src, dst")


def q_next_event_accuracy(sf_dir: str):
    """In-sample next-event prediction accuracy of the first-order
    Markov model per current state (stages/windows.py
    next_event_accuracy: reuses the transition_counts exchange, fits
    the majority successor and scores on the O(states²) count table —
    the alphabet, not the data; integer counts + ONE division)."""
    from ..stages.windows import next_event_accuracy
    ds = _rp(sf_dir, "events",
             columns=["user_id", "ts", "event_type", "event_id"])
    return next_event_accuracy(ds)


_NEXT_ACC_SQL = (
    "WITH o AS (SELECT user_id, event_type, lead(event_type) OVER "
    "(PARTITION BY user_id ORDER BY ts, event_id) AS nxt "
    "FROM events), "
    "t AS (SELECT event_type AS cur, nxt, count(*) AS n FROM o "
    "WHERE nxt IS NOT NULL GROUP BY cur, nxt), "
    "p AS (SELECT cur, nxt AS pred FROM (SELECT cur, nxt, "
    "row_number() OVER (PARTITION BY cur ORDER BY n DESC, nxt) "
    "AS rn FROM t) WHERE rn = 1) "
    "SELECT t.cur AS event_type, sum(t.n)::BIGINT AS n_trans, "
    "sum(CASE WHEN t.nxt = p.pred THEN t.n ELSE 0 END)::BIGINT "
    "AS n_correct, "
    "sum(CASE WHEN t.nxt = p.pred THEN t.n ELSE 0 END)::DOUBLE "
    "/ sum(t.n)::DOUBLE AS accuracy "
    "FROM t JOIN p ON p.cur = t.cur GROUP BY t.cur "
    "ORDER BY event_type")


def q_item_item_cosine(sf_dir: str):
    """Item-item cosine similarity over part co-occurrence in orders
    — item-based collaborative filtering, binarized (stages/
    relational.py item_item_cosine: pair supports from
    cooccurrence_pairs, per-item basket counts in ONE item-keyed
    exchange, O(items) count map broadcast once; one sqrt + one
    division — bit-exact)."""
    from ..stages.relational import item_item_cosine
    ds = _rp(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    return item_item_cosine(ds, "l_orderkey", "l_partkey",
                            min_support=2)


_ITEM_COS_SQL = (
    "WITH d AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk "
    "FROM lineitem), "
    "n AS (SELECT pk, count(*) AS c FROM d GROUP BY pk), "
    "p AS (SELECT a.pk AS ia, b.pk AS ib, count(*) AS sup "
    "FROM d a JOIN d b ON a.ok = b.ok AND a.pk < b.pk "
    "GROUP BY ia, ib HAVING count(*) >= 2) "
    "SELECT ia AS item_a, ib AS item_b, sup::BIGINT AS support, "
    "sup::DOUBLE / sqrt((na.c * nb.c)::DOUBLE) AS cosine "
    "FROM p JOIN n na ON na.pk = ia JOIN n nb ON nb.pk = ib "
    "ORDER BY item_a, item_b")


def q_snm_pairs(sf_dir: str):
    """Sorted-Neighborhood record linkage over customer names: sort
    by name, 5-rank window, Levenshtein ≤ 2 — the classic ER blocking
    alternative to the hash-blocked fuzzy_name_pairs (stages/joins.py
    sorted_neighborhood_pairs: one distributed sort, one raw task per
    sorted block, block boundaries chained via O(blocks×window) tail
    rows; banded DP across the candidate axis). Oracle: row_number
    window self-join + levenshtein()."""
    from ..stages.joins import sorted_neighborhood_pairs
    ds = _rp(sf_dir, "customer", columns=["c_custkey", "c_name"])
    return sorted_neighborhood_pairs(ds, "c_name", "c_custkey",
                                     window=5, max_dist=2)


_SNM_SQL = (
    "WITH r AS (SELECT c_custkey AS id, c_name AS nm, "
    "row_number() OVER (ORDER BY c_name, c_custkey) AS rk "
    "FROM customer), "
    "p AS (SELECT least(a.id, b.id) AS id_a, "
    "greatest(a.id, b.id) AS id_b, "
    "levenshtein(a.nm, b.nm) AS dist FROM r a "
    "JOIN r b ON b.rk > a.rk AND b.rk <= a.rk + 5) "
    "SELECT id_a, id_b, dist::BIGINT AS dist FROM p "
    "WHERE dist <= 2 ORDER BY id_a, id_b, dist")


def q_image_dedup(sf_dir: str):
    """EXACT perceptual image dedup over a planted-duplicate blob
    store: media refs map onto 64 canonical P6 images (md5 planting),
    every payload is REALLY decoded and aHash-fingerprinted
    (all-integer 64-bit average hash), and ONE hash-keyed exchange
    groups duplicates (stages/multimodal.py image_dedup_groups).
    Rows-only at the gate like its media siblings (binary decode is
    not SQL-expressible); the planting, hash injectivity on the
    corpus, and partition invariance are pinned in pytest."""
    from ..stages import multimodal as M
    refs = _media_refs(sf_dir)
    n = refs.num_rows
    k = max(2, min(16, n // 32 + 1))
    slices = [refs.slice(i * n // k, (i + 1) * n // k - i * n // k)
              for i in range(k)]
    uniq = rd.from_arrow([s for s in slices if s.num_rows])
    blob = uniq.map_batches(
        lambda t: M.synth_ppm_table_planted(
            t.column("media_ref").to_pylist()),
        batch_format="pyarrow", batch_size=32)
    out = M.image_dedup_groups(blob)

    def proj(t: pa.Table) -> pa.Table:
        return t.select(["rep_ref", "n_refs"])

    return out.map_batches(proj, batch_format="pyarrow")


def q_anova_events(sf_dir: str):
    """One-way ANOVA of event value (cents) across event types — the
    k-group A/B readout generalizing welch_ttest (stages/aggregates.py
    anova_oneway: exact integer (n, Sx, Sxx) combiner, sorted-key
    sequential float fold == DuckDB list(ORDER BY)->list_sum, fixed
    op-tree F — bit-exact)."""
    from ..stages.aggregates import anova_oneway
    ds = _rp(sf_dir, "events", columns=["event_type", "value"])
    return anova_oneway(ds, "event_type", "value", x_scale=100)


_ANOVA_SQL = (
    "WITH b AS (SELECT event_type AS g, "
    "CAST(round(value * 100) AS HUGEINT) AS x FROM events), "
    "s AS (SELECT g, count(*)::HUGEINT AS n, sum(x) AS sx, "
    "sum(x*x) AS sxx FROM b GROUP BY g), "
    "t AS (SELECT count(*)::BIGINT AS k, sum(n) AS nn, sum(sx) AS tsx, "
    "sum(sxx) AS tsxx, "
    "list_sum(list((sx*sx)::DOUBLE / n::DOUBLE ORDER BY g)) AS fold "
    "FROM s) "
    "SELECT k, nn::BIGINT AS n, "
    "fold - (tsx*tsx)::DOUBLE / nn::DOUBLE AS ss_between, "
    "(tsxx::DOUBLE - (tsx*tsx)::DOUBLE / nn::DOUBLE) "
    "- (fold - (tsx*tsx)::DOUBLE / nn::DOUBLE) AS ss_within, "
    "((fold - (tsx*tsx)::DOUBLE / nn::DOUBLE) / (k-1)::DOUBLE) "
    "/ (((tsxx::DOUBLE - (tsx*tsx)::DOUBLE / nn::DOUBLE) "
    "- (fold - (tsx*tsx)::DOUBLE / nn::DOUBLE)) "
    "/ (nn::BIGINT - k)::DOUBLE) AS f_stat FROM t")


def q_cramers_v_events(sf_dir: str):
    """Cramér's V association between event type and hour-of-day —
    chi2's normalized companion over the seasonality contingency
    (stages/aggregates.py cramers_v: shared cell-count combiner,
    sorted-cell chi2 fold + two divisions + one sqrt — bit-exact)."""
    from ..stages.aggregates import cramers_v
    ds = _rp(sf_dir, "events", columns=["event_type", "ts"])

    def hr(t: pa.Table) -> pa.Table:
        h = (t.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False) // 3_600_000_000) % 24
        return pa.table({"event_type": t.column("event_type"),
                         "hour": pa.array(
                             np.char.zfill(h.astype("U2"), 2))})

    return cramers_v(ds.map_batches(hr, batch_format="pyarrow"),
                     "event_type", "hour")


_CRAMERS_SQL = (
    "WITH b AS (SELECT event_type AS r, "
    "lpad(((epoch_us(ts) // 3600000000) % 24)::VARCHAR, 2, '0') AS c "
    "FROM events), "
    "cells AS (SELECT r, c, count(*)::HUGEINT AS o FROM b "
    "GROUP BY r, c), "
    "marg AS (SELECT count(DISTINCT r)::BIGINT AS nr, "
    "count(DISTINCT c)::BIGINT AS nc, sum(o)::HUGEINT AS n FROM cells), "
    "rt AS (SELECT r, sum(o)::HUGEINT AS m FROM cells GROUP BY r), "
    "ct AS (SELECT c, sum(o)::HUGEINT AS m FROM cells GROUP BY c), "
    "terms AS (SELECT cells.r, cells.c, "
    "(cells.o::DOUBLE - (rt.m * ct.m)::DOUBLE / marg.n::DOUBLE) "
    "* (cells.o::DOUBLE - (rt.m * ct.m)::DOUBLE / marg.n::DOUBLE) "
    "/ ((rt.m * ct.m)::DOUBLE / marg.n::DOUBLE) AS term "
    "FROM cells, marg JOIN rt ON rt.r = cells.r "
    "JOIN ct ON ct.c = cells.c), "
    "x AS (SELECT list_sum(list(term ORDER BY r, c)) AS chi2 "
    "FROM terms) "
    "SELECT marg.n::BIGINT AS n, (nr-1)*(nc-1) AS dof, chi2, "
    "sqrt((chi2 / marg.n::DOUBLE) "
    "/ least(nr-1, nc-1)::DOUBLE) AS v FROM x, marg")


def q_reciprocity_edges(sf_dir: str):
    """Directed-edge reciprocity of the mod-1500 lineitem graph — the
    link-symmetry audit for crawl link graphs (stages/graph.py
    reciprocity: ONE unordered-pair-keyed raw-task exchange, local
    dedupe + both-direction count per partition, O(partitions) exact
    ints to the driver, one division — bit-exact). The denser 1500-node
    modulus guarantees mutual pairs exist even at sf0.001."""
    from ..stages.graph import reciprocity
    ds = _rp(sf_dir, "lineitem",
             columns=["l_orderkey", "l_partkey", "l_suppkey"])

    def to_e(t: pa.Table) -> pa.Table:
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        pk = t.column("l_partkey").to_numpy(zero_copy_only=False)
        sk = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        return pa.table({"src": pa.array((ok % 1500).astype(np.int64)),
                         "dst": pa.array(((pk * 7 + sk) % 1500)
                                         .astype(np.int64))})

    return reciprocity(ds.map_batches(to_e, batch_format="pyarrow"))


_RECIP_SQL = (
    "WITH e0 AS (SELECT l_orderkey % 1500 AS src, "
    "(l_partkey * 7 + l_suppkey) % 1500 AS dst FROM lineitem), "
    "d AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst), "
    "m AS (SELECT count(*)::BIGINT AS nm FROM d a "
    "JOIN d b ON a.src = b.dst AND a.dst = b.src), "
    "t AS (SELECT count(*)::BIGINT AS ne FROM d) "
    "SELECT ne AS n_edges, nm AS n_mutual, "
    "nm::DOUBLE / ne::DOUBLE AS reciprocity FROM t, m")


_DICT_TERMS = ("batch", "customer", "filter", "join", "merge", "sort",
               "spark", "stream", "table", "vector", "window", "query")


def q_dict_match_docs(sf_dir: str):
    """Dictionary keyword audit over documents: per-term corpus
    occurrences + document frequency for a broadcast 12-term list —
    the blocklist/brand-safety scan (stages/textstats.py dict_match:
    |terms| vectorized count_substring kernels per batch, combiner
    rows only, NO shuffle; exact integers)."""
    from ..stages.textstats import dict_match
    ds = _rp(sf_dir, "documents", columns=["text"])
    return dict_match(ds, _DICT_TERMS)


_DICT_SQL = (
    "WITH terms(term) AS (VALUES "
    + ", ".join(f"('{t}')" for t in _DICT_TERMS) + "), "
    "c AS (SELECT term, (length(text) - "
    "length(replace(text, term, ''))) // length(term) AS cnt "
    "FROM documents CROSS JOIN terms) "
    "SELECT term, sum(cnt)::BIGINT AS n_occ, "
    "(count(*) FILTER (WHERE cnt > 0))::BIGINT AS n_docs "
    "FROM c GROUP BY term ORDER BY term")


def q_hierarchy_rollup(sf_dir: str):
    """Account-hierarchy rollup: customers form a random recursive
    forest (parent(k) = 1 + md5_low64(str(k)) % (k-1), root 1 — the
    data-driven tree forces REAL pointer lookups) and every node
    reports its subtree's exact cent sum + descendant count
    (stages/graph.py tree_rollup: driver numpy chase below 1M rows,
    pointer-DOUBLING path-aggregation exchanges above — ceil(log2
    depth)+1 rounds, O(n·depth) total pair traffic == the recursive
    CTE's own closure). subtree_bal = cents / 100.0 (one division —
    bit-exact)."""
    import hashlib

    from ..stages.graph import tree_rollup
    ds = _rp(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])

    def prep(t: pa.Table) -> pa.Table:
        k = t.column("c_custkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        # NB: int(kk) — the md5 int exceeds 2^63, and numpy resolves
        # big-int % np.int64 through float64 (silent precision loss)
        par = np.array(
            [int(kk) if kk <= 1 else 1 + int.from_bytes(
                hashlib.md5(str(int(kk)).encode()).digest()[8:],
                "little") % (int(kk) - 1) for kk in k], np.int64)
        cents = np.rint(t.column("c_acctbal").to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"node": pa.array(k), "parent": pa.array(par),
                         "cents": pa.array(cents)})

    out = tree_rollup(ds.map_batches(prep, batch_format="pyarrow"),
                      value_col="cents")

    def proj(t: pa.Table) -> pa.Table:
        bal = t.column("subtree_sum").to_numpy(
            zero_copy_only=False).astype(np.float64) / 100.0
        return pa.table({"node": t.column("node"),
                         "n_desc": t.column("n_desc"),
                         "subtree_bal": pa.array(bal)})

    return out.map_batches(proj, batch_format="pyarrow")


_HIER_SQL = (
    "WITH RECURSIVE par AS (SELECT c_custkey AS k, "
    "CASE WHEN c_custkey <= 1 THEN c_custkey ELSE "
    "1 + (md5_number_lower(c_custkey::VARCHAR) "
    "% (c_custkey - 1)::UBIGINT)::BIGINT END AS p, "
    "CAST(round(c_acctbal * 100) AS BIGINT) AS cents FROM customer), "
    "anc AS (SELECT k, k AS a, cents FROM par "
    "UNION ALL SELECT anc.k, par.p, anc.cents FROM anc "
    "JOIN par ON par.k = anc.a WHERE par.p <> anc.a) "
    "SELECT a AS node, count(*)::BIGINT AS n_desc, "
    "sum(cents)::DOUBLE / 100.0 AS subtree_bal "
    "FROM anc GROUP BY a ORDER BY node")


def q_feature_hash_docs(sf_dir: str):
    """Hashing-trick document vectors over the corpus: signed token
    counts in 64 md5 buckets, sparse cells only (stages/textstats.py
    feature_hash: flatten via Arrow split offsets, one md5 per
    DISTINCT token per batch, one bincount — NO shuffle; exact
    integers)."""
    from ..stages.textstats import feature_hash
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    return feature_hash(ds, n_buckets=64)


_FEATHASH_SQL = (
    "WITH tok AS (SELECT doc_id, t.tok FROM documents, "
    "UNNEST(string_split(text, ' ')) AS t(tok) WHERE t.tok <> ''), "
    "h AS (SELECT doc_id, "
    "(md5_number_lower(tok) % 64)::BIGINT AS bucket, "
    "CASE WHEN ((md5_number_lower(tok) >> 6) & 1) = 1 "
    "THEN 1 ELSE -1 END AS s FROM tok) "
    "SELECT doc_id, bucket, sum(s)::BIGINT AS w, "
    "count(*)::BIGINT AS n_tok FROM h GROUP BY doc_id, bucket "
    "ORDER BY doc_id, bucket")


def q_random_projection(sf_dir: str):
    """±1 Johnson–Lindenstrauss projection of the embeddings onto 8
    signed dimensions — exact int64 outputs by composing the int8
    quantization with a FIXED md5-derived sign matrix (stages/
    similarity.py random_projection: one int matmul per batch, sign
    matrix built once per process, NO shuffle)."""
    from ..stages.similarity import random_projection
    ds = _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return random_projection(ds, k=8)


_RANDPROJ_SQL = (
    "WITH m AS (SELECT vec_id, embedding, "
    "list_max(list_transform(embedding, x -> abs(x)))::DOUBLE "
    "AS maxabs FROM embeddings), "
    "q AS (SELECT vec_id, i - 1 AS dim_idx, "
    "CASE WHEN maxabs = 0 THEN 0 ELSE "
    "CAST(round((embedding[i]::DOUBLE * 127.0) / maxabs) AS BIGINT) "
    "END AS q FROM m, "
    "UNNEST(generate_series(1, len(embedding))) AS t(i)) "
    "SELECT vec_id, j AS proj_idx, "
    "sum(CASE WHEN (md5_number_lower(dim_idx::VARCHAR || ':' "
    "|| j::VARCHAR) & 1) = 1 THEN q ELSE -q END)::BIGINT AS y "
    "FROM q, UNNEST(generate_series(0, 7)) AS g(j) "
    "GROUP BY vec_id, j ORDER BY vec_id, proj_idx")


def q_bollinger_users(sf_dir: str):
    """Per-user Bollinger bands over event values — rolling mean ±2
    population std on the last 8 rows (stages/windows.py
    bollinger_bands: ONE keyed exchange, integer rolling moments via
    per-segment prefix sums, sqrt-of-integer-numerator-then-divide
    fixed tree — bit-exact)."""
    from ..stages.windows import bollinger_bands
    ds = _rp(sf_dir, "events",
             columns=["user_id", "ts", "event_id", "value"])
    out = bollinger_bands(ds, window=8, n_sigma=2.0)
    return out.map_batches(
        lambda t: t.rename_columns(
            ["user_id", "event_id", "n_w", "ma", "band_up", "band_dn"]),
        batch_format="pyarrow")


_BOLL_SQL = (
    "WITH b AS (SELECT user_id AS k, epoch_us(ts) AS t, "
    "event_id AS oc, CAST(round(value * 100) AS BIGINT) AS c "
    "FROM events), "
    "w AS (SELECT k, oc, count(*) OVER win AS n, "
    "sum(c) OVER win AS sx, sum(c*c) OVER win AS sxx FROM b "
    "WINDOW win AS (PARTITION BY k ORDER BY t, oc "
    "ROWS 7 PRECEDING)) "
    "SELECT k AS user_id, oc AS event_id, n::BIGINT AS n_w, "
    "sx::DOUBLE / n::DOUBLE AS ma, "
    "sx::DOUBLE / n::DOUBLE + 2.0 * (sqrt((n*sxx - sx*sx)::DOUBLE) "
    "/ n::DOUBLE) AS band_up, "
    "sx::DOUBLE / n::DOUBLE - 2.0 * (sqrt((n*sxx - sx*sx)::DOUBLE) "
    "/ n::DOUBLE) AS band_dn "
    "FROM w ORDER BY user_id, event_id")


def q_cdc_snapshot(sf_dir: str):
    """CDC snapshot from an op log derived from events ('error' rows
    are delete tombstones, everything else upserts; key spreads each
    user over 8 sub-streams) — the tombstone-aware sibling of
    merge_upsert (stages/relational.py cdc_apply: ONE keyed exchange,
    segmented last-row pick, values copied — exact)."""
    from ..stages.relational import cdc_apply
    ds = _rp(sf_dir, "events",
             columns=["user_id", "event_id", "ts", "event_type",
                      "value"])

    def prep(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        et = t.column("event_type").to_pylist()
        cents = np.rint(t.column("value").to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        ts = t.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        return pa.table({
            "key": pa.array((uid * 8 + eid % 8).astype(np.int64)),
            "ts_us": pa.array(ts),
            "seq": pa.array(eid.astype(np.int64)),
            "op": pa.array(["D" if x == "error" else "U" for x in et]),
            "cents": pa.array(cents)})

    return cdc_apply(ds.map_batches(prep, batch_format="pyarrow"))


_CDC_SQL = (
    "WITH b AS (SELECT user_id * 8 + event_id % 8 AS key, "
    "epoch_us(ts) AS t, event_id AS seq, "
    "CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op, "
    "CAST(round(value * 100) AS BIGINT) AS c FROM events), "
    "r AS (SELECT *, row_number() OVER (PARTITION BY key "
    "ORDER BY t DESC, seq DESC) AS rn FROM b) "
    "SELECT key, c AS cents, t AS ts_us FROM r "
    "WHERE rn = 1 AND op <> 'D' ORDER BY key")


def q_scc_components(sf_dir: str):
    """Strongly connected components of the directed mod-2000
    lineitem graph — the bow-tie web-graph primitive next to
    connected_components (stages/graph.py scc_components: iterative
    Kosaraju on the driver below 1M edges; FORWARD-BACKWARD coloring
    with receiver-side color checks on keyed raw-task exchanges
    above, both parity-pinned in pytest). component = MIN member id,
    exact."""
    from ..stages.graph import scc_components
    ds = _rp(sf_dir, "lineitem",
             columns=["l_orderkey", "l_partkey", "l_suppkey"])

    def to_e(t: pa.Table) -> pa.Table:
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        pk = t.column("l_partkey").to_numpy(zero_copy_only=False)
        sk = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        return pa.table({"src": pa.array((ok % 2000).astype(np.int64)),
                         "dst": pa.array(((pk * 13 + sk) % 2000)
                                         .astype(np.int64))})

    return scc_components(ds.map_batches(to_e, batch_format="pyarrow"))


_SCC_SQL = (
    "WITH RECURSIVE e AS (SELECT DISTINCT src, dst FROM "
    "(SELECT l_orderkey % 2000 AS src, "
    "(l_partkey * 13 + l_suppkey) % 2000 AS dst FROM lineitem)), "
    "r AS (SELECT src AS u, dst AS v FROM e "
    "UNION SELECT r.u, e.dst FROM r JOIN e ON e.src = r.v), "
    "nodes AS (SELECT src AS node FROM e "
    "UNION SELECT dst FROM e), "
    "m AS (SELECT r1.u, r1.v FROM r r1 "
    "JOIN r r2 ON r2.u = r1.v AND r2.v = r1.u) "
    "SELECT n.node, least(n.node, coalesce(min(m.v), n.node)) "
    "AS component FROM nodes n LEFT JOIN m ON m.u = n.node "
    "GROUP BY n.node ORDER BY n.node")


def q_sax_users(sf_dir: str):
    """SAX symbolic series per user: 8-row PAA segments quantized
    into 5 letters against fixed cent breakpoints (stages/windows.py
    sax_paa: ONE keyed exchange, rank-derived segments, one reduceat;
    exact division + exact-integer compares — bit-exact)."""
    from ..stages.windows import sax_paa
    ds = _rp(sf_dir, "events",
             columns=["user_id", "ts", "event_id", "value"])
    return sax_paa(ds, seg_len=8,
                   breakpoints=(2000, 4000, 6000, 8000))


_SAX_SQL = (
    "WITH b AS (SELECT user_id AS k, epoch_us(ts) AS t, "
    "event_id AS oc, CAST(round(value * 100) AS BIGINT) AS c "
    "FROM events), "
    "r AS (SELECT k, c, (row_number() OVER "
    "(PARTITION BY k ORDER BY t, oc) - 1) // 8 AS seg FROM b), "
    "s AS (SELECT k, seg, count(*)::BIGINT AS n, "
    "sum(c)::DOUBLE / count(*)::DOUBLE AS paa FROM r "
    "GROUP BY k, seg) "
    "SELECT k AS key, seg AS seg_idx, n, paa, "
    "CASE WHEN paa < 2000 THEN 'a' WHEN paa < 4000 THEN 'b' "
    "WHEN paa < 6000 THEN 'c' WHEN paa < 8000 THEN 'd' "
    "ELSE 'e' END AS sym FROM s ORDER BY key, seg_idx")


def q_kcenter_coreset(sf_dir: str):
    """Greedy k-center (Gonzalez farthest-point) coreset of the
    embeddings — diversity sampling for active learning, EXACT on the
    int8-quantized codes: every distance an integer squared
    euclidean, argmax ties broken on min id (stages/clustering.py
    kcenter_coreset: k rounds of broadcast-center distance update +
    per-batch (max, min-id) combiner, no shuffle)."""
    from ..stages.clustering import kcenter_coreset
    ds = _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return kcenter_coreset(ds, k=8)


def _kcenter_oracle_sql(k: int = 8) -> str:
    dist = ("list_sum(list_transform(generate_series(1, "
            "len({a}.qv)), i -> ({a}.qv[i] - {c}.qv[i]) "
            "* ({a}.qv[i] - {c}.qv[i])))")
    parts = [
        "WITH q AS MATERIALIZED (SELECT vec_id, "
        "list_transform(generate_series(1, len(embedding)), i -> "
        "CASE WHEN maxabs = 0 THEN 0 ELSE "
        "CAST(round((embedding[i]::DOUBLE * 127.0) / maxabs) "
        "AS BIGINT) END) AS qv FROM (SELECT vec_id, embedding, "
        "list_max(list_transform(embedding, x -> abs(x)))::DOUBLE "
        "AS maxabs FROM embeddings)), "
        "c0 AS MATERIALIZED (SELECT vec_id, qv FROM q "
        "ORDER BY vec_id LIMIT 1), "
        "d1 AS MATERIALIZED (SELECT q.vec_id, q.qv, "
        + dist.format(a="q", c="c0")
        + " AS d FROM q, c0)"]
    for t in range(1, k):
        parts.append(
            f", c{t} AS MATERIALIZED (SELECT vec_id, qv, d FROM d{t} "
            f"ORDER BY d DESC, vec_id LIMIT 1)")
        if t < k - 1:
            parts.append(
                f", d{t + 1} AS MATERIALIZED (SELECT d{t}.vec_id, "
                f"d{t}.qv, least(d{t}.d, "
                + dist.format(a=f"d{t}", c=f"c{t}")
                + f") AS d FROM d{t}, c{t})")
    sel = ["SELECT 0 AS order_idx, vec_id, 0 AS radius FROM c0"]
    for t in range(1, k):
        sel.append(f"SELECT {t}, vec_id, d FROM c{t}")
    return ("".join(parts) + " " + " UNION ALL ".join(sel)
            + " ORDER BY order_idx")


def q_seasonal_events(sf_dir: str):
    """Classical additive decomposition of per-type hourly event
    value: y = trend + seasonal(hour-of-day) + resid (stages/
    windows.py seasonal_decompose: integer (n, sx) hour combiner, NO
    shuffle; pooled ±2-row centered MA, ordered seasonal fold —
    bit-exact)."""
    from ..stages.windows import seasonal_decompose
    ds = _rp(sf_dir, "events",
             columns=["event_type", "ts", "value"])
    return seasonal_decompose(ds, half_window=2)


_SEASONAL_SQL = (
    "WITH b AS (SELECT event_type AS k, "
    "(epoch_us(ts) // 3600000000) * 3600000000 AS hour_ts, "
    "CAST(round(value * 100) AS BIGINT) AS c FROM events), "
    "g AS (SELECT k, hour_ts, count(*)::BIGINT AS n, "
    "sum(c)::BIGINT AS sx FROM b GROUP BY k, hour_ts), "
    "wi AS (SELECT k, hour_ts, n, sx, sum(n) OVER win AS wn, "
    "sum(sx) OVER win AS wsx FROM g WINDOW win AS "
    "(PARTITION BY k ORDER BY hour_ts "
    "ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)), "
    "d AS (SELECT k, hour_ts, sx::DOUBLE / n::DOUBLE AS y, "
    "wsx::DOUBLE / wn::DOUBLE AS trend, "
    "sx::DOUBLE / n::DOUBLE - wsx::DOUBLE / wn::DOUBLE AS detr, "
    "(hour_ts // 3600000000) % 24 AS hod FROM wi), "
    "s AS (SELECT k, hod, list_sum(list(detr ORDER BY hour_ts)) "
    "/ count(*)::DOUBLE AS seasonal FROM d GROUP BY k, hod) "
    "SELECT d.k AS key, d.hour_ts, d.y, d.trend, s.seasonal, "
    "d.detr - s.seasonal AS resid FROM d "
    "JOIN s ON s.k = d.k AND s.hod = d.hod "
    "ORDER BY key, hour_ts")


def q_square_counts(sf_dir: str):
    """Global 4-cycle count of the sparse mixed-key lineitem graph —
    the motif signal past triangles (stages/graph.py square_counts:
    wedge emit keyed by center + pair-keyed codeg fold, squares =
    Σ C(codeg, 2) / 2 — exact integers, two exchanges)."""
    from ..stages.graph import square_counts
    return square_counts(_tri_edges(sf_dir))


_SQUARES_SQL = (
    f"WITH e0 AS ({_TRI_E0}), "
    "canon AS (SELECT DISTINCT least(src, dst) AS u, "
    "greatest(src, dst) AS v FROM e0 WHERE src <> dst), "
    "sym AS (SELECT u, v FROM canon "
    "UNION ALL SELECT v AS u, u AS v FROM canon), "
    "cod AS (SELECT s1.u AS a, s2.u AS c, count(*)::BIGINT AS w "
    "FROM sym s1 JOIN sym s2 ON s1.v = s2.v AND s1.u < s2.u "
    "GROUP BY a, c) "
    "SELECT (count(*) FILTER (WHERE w >= 2))::BIGINT "
    "AS n_diag_pairs, "
    "(sum((w * (w - 1)) // 2) // 2)::BIGINT AS squares FROM cod")


def q_bipartite_orders(sf_dir: str):
    """Per-component 2-colorability of a 200-cycle forest derived
    from orders (cycle lengths 3..7, so odd and even components
    coexist) — bipartiteness via the BIPARTITE DOUBLE COVER reduction
    to two connected_components runs (stages/graph.py
    bipartite_check: a component is bipartite iff (v,0)/(v,1) split;
    one rendezvous + one count fold; exact)."""
    from ..stages.graph import bipartite_check
    ds = _rp(sf_dir, "orders", columns=["o_orderkey"])

    def to_e(t: pa.Table) -> pa.Table:
        o = t.column("o_orderkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        g = o % 200
        L = 3 + g % 5
        i = (o // 200) % L
        return pa.table({"src": pa.array(g * 8 + i),
                         "dst": pa.array(g * 8 + (i + 1) % L)})

    return bipartite_check(ds.map_batches(to_e,
                                          batch_format="pyarrow"))


_BIP_E0 = ("SELECT (o_orderkey % 200) * 8 + ((o_orderkey // 200) "
           "% (3 + (o_orderkey % 200) % 5)) AS u, "
           "(o_orderkey % 200) * 8 + (((o_orderkey // 200) "
           "% (3 + (o_orderkey % 200) % 5)) + 1) "
           "% (3 + (o_orderkey % 200) % 5) AS v FROM orders")


_BIPARTITE_SQL = (
    f"WITH RECURSIVE e0 AS ({_BIP_E0}), "
    "und AS (SELECT u, v FROM e0 UNION SELECT v AS u, u AS v "
    "FROM e0), "
    "allv AS (SELECT u AS node FROM und UNION SELECT v FROM und), "
    "reach AS (SELECT node, node AS r FROM allv "
    "UNION SELECT reach.node, und.v AS r FROM reach "
    "JOIN und ON und.u = reach.r), "
    "comp AS (SELECT node, MIN(r) AS component FROM reach "
    "GROUP BY node), "
    "pr AS (SELECT node, node AS r, 0 AS p FROM allv "
    "UNION SELECT pr.node, und.v AS r, 1 - pr.p FROM pr "
    "JOIN und ON und.u = pr.r), "
    "odd AS (SELECT DISTINCT node FROM pr "
    "WHERE r = node AND p = 1), "
    "j AS (SELECT comp.component, comp.node, "
    "CASE WHEN o.node IS NULL THEN 0 ELSE 1 END AS od "
    "FROM comp LEFT JOIN odd o ON o.node = comp.node) "
    "SELECT component, count(*)::BIGINT AS n_nodes, "
    "(1 - max(od))::BIGINT AS is_bipartite FROM j "
    "GROUP BY component ORDER BY component")


def q_gram_matrix(sf_dir: str):
    """Exact Gram matrix of the int8-quantized embeddings — the
    covariance/kernel primitive (stages/similarity.py gram_matrix:
    one int64 matmul partial per batch, driver sums O(batches)
    dim×dim partials, NO shuffle, no floats)."""
    from ..stages.similarity import gram_matrix
    ds = _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return gram_matrix(ds)


_GRAM_SQL = (
    "WITH m AS (SELECT vec_id, embedding, "
    "list_max(list_transform(embedding, x -> abs(x)))::DOUBLE "
    "AS maxabs FROM embeddings), "
    "q AS (SELECT vec_id, i - 1 AS d, "
    "CASE WHEN maxabs = 0 THEN 0 ELSE "
    "CAST(round((embedding[i]::DOUBLE * 127.0) / maxabs) AS BIGINT) "
    "END AS q FROM m, "
    "UNNEST(generate_series(1, len(embedding))) AS t(i)) "
    "SELECT a.d AS dim_i, b.d AS dim_j, "
    "sum(a.q * b.q)::BIGINT AS g FROM q a "
    "JOIN q b ON a.vec_id = b.vec_id AND a.d <= b.d "
    "GROUP BY dim_i, dim_j ORDER BY dim_i, dim_j")


_TREE = {"feat": "cents", "thr": 3000,
         "lo": {"feat": "hour", "thr": 12,
                "lo": {"leaf": 10}, "hi": {"leaf": 20}},
         "hi": {"feat": "is_purchase", "thr": 1,
                "lo": {"feat": "cents", "thr": 8000,
                       "lo": {"leaf": 30}, "hi": {"leaf": 40}},
                "hi": {"leaf": 50}}}


def q_tree_score_events(sf_dir: str):
    """Broadcast decision-tree inference over events: a fixed
    depth-3 tree on (cents, hour-of-day, is_purchase) scores every
    row — the model-scoring stage shape with exact integer features
    and splits (stages/classify.py decision_tree_score: vectorized
    mask cascade, tree in the task closure, NO shuffle)."""
    from ..stages.classify import decision_tree_score
    ds = _rp(sf_dir, "events",
             columns=["event_id", "ts", "event_type", "value"])

    def feats(t: pa.Table) -> dict:
        cents = np.rint(t.column("value").to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        hour = (t.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False) // 3_600_000_000) % 24
        isp = np.array([1 if x == "purchase" else 0
                        for x in t.column("event_type").to_pylist()],
                       np.int64)
        return {"cents": cents, "hour": hour, "is_purchase": isp}

    out = decision_tree_score(ds, _TREE, feats)
    return out.map_batches(
        lambda t: t.select(["event_id", "score"]),
        batch_format="pyarrow")


_TREESCORE_SQL = (
    "WITH f AS (SELECT event_id, "
    "CAST(round(value * 100) AS BIGINT) AS cents, "
    "(epoch_us(ts) // 3600000000) % 24 AS hour, "
    "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS isp "
    "FROM events) "
    "SELECT event_id, CASE WHEN cents < 3000 THEN "
    "(CASE WHEN hour < 12 THEN 10 ELSE 20 END) "
    "ELSE (CASE WHEN isp < 1 THEN "
    "(CASE WHEN cents < 8000 THEN 30 ELSE 40 END) "
    "ELSE 50 END) END::BIGINT AS score "
    "FROM f ORDER BY event_id")


def q_betweenness_landmarks(sf_dir: str):
    """Radius-4 Brandes betweenness from the 2 smallest landmarks
    over the sparse lineitem graph — the bounded-distance betweenness
    estimator (stages/graph.py betweenness_landmarks: exact integer
    sigma sums; every float fold ordered — successors ascending, then
    landmarks ascending — so driver, distributed and oracle agree
    bit-for-bit)."""
    from ..stages.graph import betweenness_landmarks
    return betweenness_landmarks(_tri_edges(sf_dir), n_sources=2,
                                 radius=4)


def _betweenness_oracle_sql(radius: int = 4) -> str:
    p = [
        f"WITH e0 AS ({_TRI_E0}), "
        "canon AS (SELECT DISTINCT least(src, dst) AS u, "
        "greatest(src, dst) AS v FROM e0 WHERE src <> dst), "
        "sym AS MATERIALIZED (SELECT u, v FROM canon "
        "UNION ALL SELECT v AS u, u AS v FROM canon), "
        "smin AS (SELECT DISTINCT u FROM sym ORDER BY u LIMIT 2)"]
    for si in range(2):
        s = (f"(SELECT {'min' if si == 0 else 'max'}(u) FROM smin)")
        p.append(
            f", lev0_{si} AS MATERIALIZED (SELECT {s} AS node, "
            f"1::HUGEINT AS sig)")
        p.append(f", seen0_{si} AS MATERIALIZED "
                 f"(SELECT node FROM lev0_{si})")
        for r in range(1, radius + 1):
            p.append(
                f", lev{r}_{si} AS MATERIALIZED (SELECT e.v AS node, "
                f"sum(l.sig) AS sig FROM lev{r - 1}_{si} l "
                f"JOIN sym e ON e.u = l.node WHERE e.v NOT IN "
                f"(SELECT node FROM seen{r - 1}_{si}) GROUP BY e.v)")
            p.append(
                f", seen{r}_{si} AS MATERIALIZED (SELECT node FROM "
                f"seen{r - 1}_{si} UNION ALL SELECT node "
                f"FROM lev{r}_{si})")
        p.append(
            f", del{radius}_{si} AS MATERIALIZED (SELECT node, sig, "
            f"0.0::DOUBLE AS delta FROM lev{radius}_{si})")
        for r in range(radius - 1, -1, -1):
            p.append(
                f", del{r}_{si} AS MATERIALIZED (SELECT l.node, "
                f"l.sig, COALESCE(f.d, 0.0) AS delta FROM "
                f"lev{r}_{si} l LEFT JOIN (SELECT e.u AS node, "
                f"list_sum(list((lc.sig::DOUBLE / d.sig::DOUBLE) "
                f"* (1.0 + d.delta) ORDER BY d.node)) AS d "
                f"FROM sym e JOIN del{r + 1}_{si} d ON d.node = e.v "
                f"JOIN lev{r}_{si} lc ON lc.node = e.u "
                f"GROUP BY e.u) f ON f.node = l.node)")
        dels = " UNION ALL ".join(
            f"SELECT node, delta FROM del{r}_{si}"
            for r in range(radius + 1))
        p.append(f", cb_{si} AS MATERIALIZED (SELECT node, delta "
                 f"FROM ({dels}) WHERE node <> {s})")
    p.append(
        " SELECT COALESCE(a.node, b.node) AS node, "
        "COALESCE(a.delta, 0.0) + COALESCE(b.delta, 0.0) AS cb "
        "FROM cb_0 a FULL OUTER JOIN cb_1 b ON b.node = a.node "
        "ORDER BY node")
    return "".join(p)


def q_temporal_reach(sf_dir: str):
    """Earliest-arrival temporal reachability over the order graph
    (edge (custkey%500 → orderkey%500) live at its order date): a
    journey may only continue on edges no earlier than its arrival —
    the time-respecting-path primitive (stages/graph.py
    temporal_reach: all-integer min relaxation; driver grouped-min
    Bellman below 1M edges, tagged sssp-shape exchanges above)."""
    from ..stages.graph import temporal_reach
    ds = _rp(sf_dir, "orders",
             columns=["o_custkey", "o_orderkey", "o_orderdate"])

    def to_e(t: pa.Table) -> pa.Table:
        ck = t.column("o_custkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ok = t.column("o_orderkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ts = t.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        return pa.table({"src": pa.array(ck % 500),
                         "dst": pa.array(ok % 500),
                         "t": pa.array(ts)})

    return temporal_reach(ds.map_batches(to_e,
                                         batch_format="pyarrow"))


_TEMPORAL_SQL = (
    "WITH RECURSIVE e AS (SELECT o_custkey % 500 AS u, "
    "o_orderkey % 500 AS v, epoch_us(o_orderdate) AS t "
    "FROM orders), "
    "s AS (SELECT least(min(u), min(v)) AS s FROM e), "
    "reach AS (SELECT s.s AS node, 0::BIGINT AS arr FROM s "
    "UNION SELECT e.v, e.t FROM reach r "
    "JOIN e ON e.u = r.node AND e.t >= r.arr) "
    "SELECT node, min(arr)::BIGINT AS arrival_us FROM reach "
    "GROUP BY node ORDER BY node")


def q_knn_dist_outliers(sf_dir: str):
    """Distance-based outlier scores: each embedding's EXACT integer
    squared distance to its 5th nearest neighbor on the int8 codes
    (stages/similarity.py knn_dist_outliers: broadcast code matrix +
    one int64 distance block per batch — the brute ANN shape with a
    documented bucketed scale path)."""
    from ..stages.similarity import knn_dist_outliers
    ds = _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return knn_dist_outliers(ds, k=5)


_KNN_DIST_SQL = (
    "WITH m AS (SELECT vec_id, embedding, "
    "list_max(list_transform(embedding, x -> abs(x)))::DOUBLE "
    "AS maxabs FROM embeddings), "
    "q AS (SELECT vec_id, "
    "list_transform(generate_series(1, len(embedding)), i -> "
    "CASE WHEN maxabs = 0 THEN 0 ELSE "
    "CAST(round((embedding[i]::DOUBLE * 127.0) / maxabs) AS BIGINT) "
    "END) AS qv FROM m), "
    "d AS (SELECT a.vec_id AS i, b.vec_id AS j, "
    "list_sum(list_transform(generate_series(1, len(a.qv)), x -> "
    "(a.qv[x] - b.qv[x]) * (a.qv[x] - b.qv[x]))) AS d2 "
    "FROM q a JOIN q b ON a.vec_id <> b.vec_id), "
    "r AS (SELECT i, d2, row_number() OVER (PARTITION BY i "
    "ORDER BY d2, j) AS rn FROM d) "
    "SELECT i AS vec_id, d2::BIGINT AS d_k FROM r WHERE rn = 5 "
    "ORDER BY vec_id")


def q_consistent_hash(sf_dir: str):
    """Consistent-hashing ring placement of customer keys over 8
    servers × 16 vnodes — the shard-placement audit (stages/
    relational.py consistent_hash_assign: 128-entry ring built once
    per process, ONE searchsorted per batch, NO shuffle; 63-bit md5
    positions — exact)."""
    from ..stages.relational import consistent_hash_assign
    ds = _rp(sf_dir, "customer", columns=["c_custkey"])
    return consistent_hash_assign(ds, "c_custkey")


_CONSHASH_SQL = (
    "WITH ring AS (SELECT 's' || i::VARCHAR AS server, "
    "(md5_number_lower('s' || i::VARCHAR || ':' || r::VARCHAR) "
    "& 9223372036854775807)::BIGINT AS pos "
    "FROM generate_series(0, 7) g(i), "
    "generate_series(0, 15) h(r)), "
    "k AS (SELECT c_custkey AS key, "
    "(md5_number_lower(c_custkey::VARCHAR) "
    "& 9223372036854775807)::BIGINT AS h FROM customer), "
    "a AS (SELECT key, h, "
    "(SELECT min(pos) FROM ring WHERE pos >= k.h) AS p1, "
    "(SELECT min(pos) FROM ring) AS p0 FROM k) "
    "SELECT a.key AS c_custkey, r.server, r.pos AS ring_pos "
    "FROM a JOIN ring r ON r.pos = COALESCE(a.p1, a.p0) "
    "ORDER BY c_custkey")


def q_lof_outliers(sf_dir: str):
    """Local Outlier Factor over the embeddings on squared int8
    distances — the density-ratio outlier detector past plain k-NN
    distance (stages/similarity.py lof_outliers: three broadcast
    passes, exact integer reach sums, ordered lrd folds — bit-exact
    incl. the k-distance tie semantics)."""
    from ..stages.similarity import lof_outliers
    ds = _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return lof_outliers(ds, k=5)


_LOF_SQL = (
    "WITH m AS (SELECT vec_id, embedding, "
    "list_max(list_transform(embedding, x -> abs(x)))::DOUBLE "
    "AS maxabs FROM embeddings), "
    "q AS MATERIALIZED (SELECT vec_id, "
    "list_transform(generate_series(1, len(embedding)), i -> "
    "CASE WHEN maxabs = 0 THEN 0 ELSE "
    "CAST(round((embedding[i]::DOUBLE * 127.0) / maxabs) AS BIGINT) "
    "END) AS qv FROM m), "
    "d AS MATERIALIZED (SELECT a.vec_id AS i, b.vec_id AS j, "
    "list_sum(list_transform(generate_series(1, len(a.qv)), x -> "
    "(a.qv[x] - b.qv[x]) * (a.qv[x] - b.qv[x]))) AS d2 "
    "FROM q a JOIN q b ON a.vec_id <> b.vec_id), "
    "kd AS MATERIALIZED (SELECT i, d2 AS dk FROM "
    "(SELECT i, d2, row_number() OVER (PARTITION BY i "
    "ORDER BY d2, j) AS rn FROM d) WHERE rn = 5), "
    "nb AS MATERIALIZED (SELECT d.i, d.j, d.d2 FROM d "
    "JOIN kd ON kd.i = d.i AND d.d2 <= kd.dk), "
    "reach AS (SELECT nb.i, nb.j, "
    "greatest(kdo.dk, nb.d2) AS r FROM nb "
    "JOIN kd kdo ON kdo.i = nb.j), "
    "lrd AS MATERIALIZED (SELECT i, count(*)::BIGINT AS nn, "
    "count(*)::DOUBLE / sum(r)::DOUBLE AS lrd FROM reach "
    "GROUP BY i) "
    "SELECT nb.i AS vec_id, l.nn AS n_neighbors, "
    "(list_sum(list(lo.lrd ORDER BY nb.j)) / l.nn::DOUBLE) "
    "/ l.lrd AS lof "
    "FROM nb JOIN lrd lo ON lo.i = nb.j "
    "JOIN lrd l ON l.i = nb.i "
    "GROUP BY nb.i, l.nn, l.lrd ORDER BY vec_id")


def q_cuped_users(sf_dir: str):
    """CUPED-adjusted per-user spend: pre-period (before Jan 16)
    covariate removes explainable variance from the post-period
    metric — the experimentation-platform readout next to
    abtest_lift (stages/aggregates.py cuped_adjust: one keyed
    exchange + integer moment combiner + broadcast theta —
    bit-exact)."""
    from ..stages.aggregates import cuped_adjust
    ds = _rp(sf_dir, "events",
             columns=["user_id", "ts", "value"])
    cutoff = 1_705_363_200_000_000  # 2024-01-16 00:00:00 UTC in us
    return cuped_adjust(ds, cutoff_us=cutoff)


_CUPED_SQL = (
    "WITH b AS (SELECT user_id, epoch_us(ts) AS t, "
    "CAST(round(value * 100) AS BIGINT) AS c FROM events), "
    "u AS (SELECT user_id, "
    "sum(CASE WHEN t < 1705363200000000 THEN c ELSE 0 END)::BIGINT "
    "AS x, "
    "sum(CASE WHEN t >= 1705363200000000 THEN c ELSE 0 END)::BIGINT "
    "AS y FROM b GROUP BY user_id), "
    "s AS (SELECT count(*)::HUGEINT AS n, sum(x::HUGEINT) AS sx, "
    "sum(y::HUGEINT) AS sy, sum(x::HUGEINT * x::HUGEINT) AS sxx, "
    "sum(x::HUGEINT * y::HUGEINT) AS sxy FROM u) "
    "SELECT u.user_id, u.x AS x_cents, u.y AS y_cents, "
    "u.y::DOUBLE - ((s.n * s.sxy - s.sx * s.sy)::DOUBLE "
    "/ (s.n * s.sxx - s.sx * s.sx)::DOUBLE) "
    "* (u.x::DOUBLE - s.sx::DOUBLE / s.n::DOUBLE) AS y_adj "
    "FROM u, s ORDER BY user_id")


def q_kaplan_meier(sf_dir: str):
    """Kaplan–Meier survival curves per user-parity cohort: duration
    = first event → first 'error' strictly after it (censored at the
    last event otherwise); product-limit steps at failure times
    (stages/windows.py kaplan_meier: one keyed exchange for
    durations, exact integer risk/failure counts, SEQUENTIAL
    survival product == the oracle's recursive-CTE recurrence —
    bit-exact)."""
    from ..stages.windows import kaplan_meier
    ds = _rp(sf_dir, "events",
             columns=["user_id", "ts", "event_type"])
    return kaplan_meier(ds)


_KM_SQL = (
    "WITH RECURSIVE b AS (SELECT user_id AS k, epoch_us(ts) AS t, "
    "CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS f "
    "FROM events), "
    "u0 AS (SELECT k, min(t) AS t0, max(t) AS tmax FROM b "
    "GROUP BY k), "
    "uf AS (SELECT b.k, min(b.t) AS terr FROM b "
    "JOIN u0 ON u0.k = b.k WHERE b.f = 1 AND b.t > u0.t0 "
    "GROUP BY b.k), "
    "d AS (SELECT u0.k, u0.k % 2 AS grp, "
    "CASE WHEN uf.terr IS NOT NULL THEN uf.terr - u0.t0 "
    "ELSE u0.tmax - u0.t0 END AS dur, "
    "CASE WHEN uf.terr IS NOT NULL THEN 1 ELSE 0 END AS ev "
    "FROM u0 LEFT JOIN uf ON uf.k = u0.k), "
    "ft AS (SELECT grp, dur, count(*)::BIGINT AS d_i, "
    "row_number() OVER (PARTITION BY grp ORDER BY dur) AS idx "
    "FROM d WHERE ev = 1 GROUP BY grp, dur), "
    "nr AS (SELECT ft.grp, ft.dur, ft.d_i, ft.idx, "
    "(SELECT count(*) FROM d WHERE d.grp = ft.grp "
    "AND d.dur >= ft.dur)::BIGINT AS n_risk FROM ft), "
    "km AS (SELECT grp, idx, dur, n_risk, d_i, "
    "(n_risk - d_i)::DOUBLE / n_risk::DOUBLE AS s FROM nr "
    "WHERE idx = 1 "
    "UNION ALL SELECT nr.grp, nr.idx, nr.dur, nr.n_risk, nr.d_i, "
    "km.s * ((nr.n_risk - nr.d_i)::DOUBLE / nr.n_risk::DOUBLE) "
    "FROM km JOIN nr ON nr.grp = km.grp AND nr.idx = km.idx + 1) "
    "SELECT grp, dur AS duration_us, n_risk, d_i AS n_events, "
    "s AS survival FROM km ORDER BY grp, duration_us")


def q_did_events(sf_dir: str):
    """Difference-in-differences of event spend: treatment = odd
    user, period split at Jan 16 (stages/aggregates.py did_estimate:
    four exact integer cells in a pure combiner, fixed float tree —
    bit-exact)."""
    from ..stages.aggregates import did_estimate
    ds = _rp(sf_dir, "events",
             columns=["user_id", "ts", "value"])
    return did_estimate(ds, cutoff_us=1_705_363_200_000_000)


_DID_SQL = (
    "WITH b AS (SELECT (user_id % 2) AS trt, "
    "CASE WHEN epoch_us(ts) >= 1705363200000000 THEN 1 ELSE 0 END "
    "AS post, CAST(round(value * 100) AS BIGINT) AS c FROM events), "
    "cell AS (SELECT trt, post, count(*)::HUGEINT AS n, "
    "sum(c)::HUGEINT AS s FROM b GROUP BY trt, post), "
    "m AS (SELECT "
    "max(CASE WHEN trt = 0 AND post = 0 THEN s::DOUBLE / n::DOUBLE "
    "END) AS m00, "
    "max(CASE WHEN trt = 0 AND post = 1 THEN s::DOUBLE / n::DOUBLE "
    "END) AS m01, "
    "max(CASE WHEN trt = 1 AND post = 0 THEN s::DOUBLE / n::DOUBLE "
    "END) AS m10, "
    "max(CASE WHEN trt = 1 AND post = 1 THEN s::DOUBLE / n::DOUBLE "
    "END) AS m11 FROM cell) "
    "SELECT m00 AS m_c_pre, m01 AS m_c_post, m10 AS m_t_pre, "
    "m11 AS m_t_post, (m11 - m10) - (m01 - m00) AS did FROM m")


def q_partition_skew(sf_dir: str):
    """Partition-skew audit of l_orderkey over 64 md5 hash buckets —
    the load-balance check behind every keyed exchange (stages/
    relational.py partition_skew: per-batch bincount combiner over
    md5 partition ids, NO shuffle; exact counts)."""
    from ..stages.relational import partition_skew
    ds = _rp(sf_dir, "lineitem", columns=["l_orderkey"])
    return partition_skew(ds, "l_orderkey", n_partitions=64)


_PSKEW_SQL = (
    "SELECT ((md5_number_lower(l_orderkey::VARCHAR) "
    "& 9223372036854775807) % 64)::BIGINT AS partition_id, "
    "count(*)::BIGINT AS n_rows FROM lineitem "
    "GROUP BY partition_id ORDER BY partition_id")


def q_diameter_sweep(sf_dir: str):
    """Double-sweep diameter lower bound of the sparse lineitem
    graph: BFS from the min node, re-BFS from the farthest node found
    (stages/graph.py diameter_sweep — pure composition of two
    bfs_hops runs, exact ints)."""
    from ..stages.graph import diameter_sweep

    def sym(t: pa.Table) -> pa.Table:
        a = t.column("src").combine_chunks()
        b = t.column("dst").combine_chunks()
        return pa.table({"src": pa.concat_arrays([a, b]),
                         "dst": pa.concat_arrays([b, a])})

    return diameter_sweep(
        _tri_edges(sf_dir).map_batches(sym, batch_format="pyarrow"))


_DIAM_SQL = (
    f"WITH RECURSIVE e0 AS ({_TRI_E0}), "
    "e AS (SELECT DISTINCT src, dst FROM "
    "(SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)), "
    "r1 AS (SELECT (SELECT MIN(least(src, dst)) FROM e) AS node, "
    "0 AS hops UNION SELECT e.dst, r1.hops + 1 FROM r1 "
    "JOIN e ON e.src = r1.node WHERE r1.hops < 24), "
    "h1 AS (SELECT node, MIN(hops) AS hops FROM r1 GROUP BY node), "
    "f AS (SELECT node, hops FROM h1 "
    "ORDER BY hops DESC, node LIMIT 1), "
    "r2 AS (SELECT (SELECT node FROM f) AS node, 0 AS hops "
    "UNION SELECT e.dst, r2.hops + 1 FROM r2 "
    "JOIN e ON e.src = r2.node WHERE r2.hops < 24), "
    "h2 AS (SELECT node, MIN(hops) AS hops FROM r2 GROUP BY node), "
    "g AS (SELECT node, hops FROM h2 "
    "ORDER BY hops DESC, node LIMIT 1) "
    "SELECT (SELECT MIN(least(src, dst)) FROM e)::BIGINT "
    "AS start_node, f.hops::BIGINT AS ecc_start, "
    "f.node::BIGINT AS far_node, g.hops::BIGINT AS diameter_lb, "
    "g.node::BIGINT AS end_node FROM f, g")


def q_video_scenes(sf_dir: str):
    """REAL video scene-cut detection: planted-scene y4m streams →
    exact integer Y-plane SAD between consecutive frames, cut where
    SAD exceeds 30/px (stages/multimodal.py VideoSceneStage +
    synth_y4m_table_scenes). Rows-only at the gate like the other
    binary-decode rows; the planting and SAD math are pinned in
    pytest."""
    from ..stages import multimodal as M
    refs = _media_refs(sf_dir)
    n = refs.num_rows
    k = max(2, min(16, n // 32 + 1))
    slices = [refs.slice(i * n // k, (i + 1) * n // k - i * n // k)
              for i in range(k)]
    uniq = rd.from_arrow([s for s in slices if s.num_rows])
    blob = uniq.map_batches(
        lambda t: M.synth_y4m_table_scenes(
            t.column("media_ref").to_pylist()),
        batch_format="pyarrow", batch_size=32)
    return blob.map_batches(M.VideoSceneStage(thresh_per_px=30),
                            batch_format="pyarrow", batch_size=32)


def q_audio_fingerprint(sf_dir: str):
    """REAL audio landmark fingerprints: RIFF/WAV decode → 256-sample
    rfft frames → per-frame peak bin → consecutive-peak landmark
    hashes (stages/multimodal.py AudioFingerprintStage). Rows-only at
    the gate (FFT is not SQL); peak determinism and planted-sinusoid
    recovery pinned in pytest."""
    from ..stages import multimodal as M
    refs = _media_refs(sf_dir)
    n = refs.num_rows
    k = max(2, min(16, n // 32 + 1))
    slices = [refs.slice(i * n // k, (i + 1) * n // k - i * n // k)
              for i in range(k)]
    uniq = rd.from_arrow([s for s in slices if s.num_rows])
    blob = uniq.map_batches(
        lambda t: M.synth_wav_table(t.column("media_ref").to_pylist()),
        batch_format="pyarrow", batch_size=32)
    return blob.map_batches(M.AudioFingerprintStage(),
                            batch_format="pyarrow", batch_size=32)


def q_bitmap_index(sf_dir: str):
    """Bitmap-index build over order status: per (status, 63-key
    chunk) packed bit words + popcounts (stages/relational.py
    bitmap_index: per-batch OR combiner, driver ORs O(values×chunks)
    words, NO shuffle — exact; Σ n_set per value == exact distinct
    keys)."""
    from ..stages.relational import bitmap_index
    ds = _rp(sf_dir, "orders",
             columns=["o_orderstatus", "o_orderkey"])
    return bitmap_index(ds, "o_orderstatus", "o_orderkey")


_BITMAP_SQL = (
    "SELECT o_orderstatus AS value, "
    "(o_orderkey // 63)::BIGINT AS chunk, "
    "bit_or(1::BIGINT << (o_orderkey % 63)::INT)::BIGINT AS bits, "
    "bit_count(bit_or(1::BIGINT << (o_orderkey % 63)::INT))::BIGINT "
    "AS n_set FROM orders GROUP BY 1, 2 ORDER BY 1, 2")


def q_benford_orders(sf_dir: str):
    """Benford's-law first-digit audit of order totals (cents) —
    the fraud/synthetic-data smell test (stages/aggregates.py
    benford_audit: integer digit combiner, shared double LITERAL
    constants, digit-ordered chi2 fold — bit-exact)."""
    from ..stages.aggregates import benford_audit
    ds = _rp(sf_dir, "orders", columns=["o_totalprice"])
    return benford_audit(ds, "o_totalprice")


_BENFORD_SQL = (
    "WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) "
    "AS v FROM orders WHERE round(o_totalprice * 100) > 0), "
    "d AS (SELECT CAST(left(v::VARCHAR, 1) AS BIGINT) AS digit "
    "FROM c), "
    "n AS (SELECT digit, count(*)::BIGINT AS n_obs FROM d "
    "GROUP BY digit), "
    "digs AS (SELECT * FROM (VALUES "
    "(1, '0.3010299956639812'::DOUBLE), "
    "(2, '0.17609125905568124'::DOUBLE), "
    "(3, '0.12493873660829993'::DOUBLE), "
    "(4, '0.09691001300805642'::DOUBLE), "
    "(5, '0.07918124604762482'::DOUBLE), "
    "(6, '0.06694678963061322'::DOUBLE), "
    "(7, '0.05799194697768673'::DOUBLE), "
    "(8, '0.05115252244738129'::DOUBLE), "
    "(9, '0.04575749056067514'::DOUBLE)) AS t(digit, p)), "
    "j AS (SELECT digs.digit::BIGINT AS digit, "
    "COALESCE(n.n_obs, 0)::BIGINT AS n_obs, digs.p FROM digs "
    "LEFT JOIN n ON n.digit = digs.digit), "
    "t AS (SELECT sum(n_obs)::BIGINT AS total FROM j), "
    "x AS (SELECT list_sum(list("
    "(n_obs::DOUBLE - total::DOUBLE * p) "
    "* (n_obs::DOUBLE - total::DOUBLE * p) "
    "/ (total::DOUBLE * p) ORDER BY digit)) AS chi2 FROM j, t) "
    "SELECT j.digit, j.n_obs, t.total::DOUBLE * j.p AS expected, "
    "x.chi2 FROM j, t, x ORDER BY digit")


def q_katz_centrality(sf_dir: str):
    """Truncated Katz centrality (beta = 1/2, 4 steps) over the
    directed lineitem multigraph — exact integer walk counts + dyadic
    attenuation (stages/graph.py katz_centrality: pagerank-shaped
    integer message sums, driver CSR below 1M edges; ascending-k
    dyadic fold — bit-exact)."""
    from ..stages.graph import katz_centrality
    return katz_centrality(_tri_edges(sf_dir), n_steps=4)


_KATZ_SQL = (
    f"WITH e0 AS ({_TRI_E0}), "
    "nodes AS (SELECT src AS node FROM e0 "
    "UNION SELECT dst FROM e0), "
    "w1 AS MATERIALIZED (SELECT n.node, "
    "COALESCE(c.c, 0)::HUGEINT AS w FROM nodes n LEFT JOIN "
    "(SELECT dst, count(*)::HUGEINT AS c FROM e0 GROUP BY dst) c "
    "ON c.dst = n.node), "
    "w2 AS MATERIALIZED (SELECT n.node, "
    "COALESCE(s.c, 0)::HUGEINT AS w FROM nodes n LEFT JOIN "
    "(SELECT e0.dst, sum(w1.w) AS c FROM e0 "
    "JOIN w1 ON w1.node = e0.src GROUP BY e0.dst) s "
    "ON s.dst = n.node), "
    "w3 AS MATERIALIZED (SELECT n.node, "
    "COALESCE(s.c, 0)::HUGEINT AS w FROM nodes n LEFT JOIN "
    "(SELECT e0.dst, sum(w2.w) AS c FROM e0 "
    "JOIN w2 ON w2.node = e0.src GROUP BY e0.dst) s "
    "ON s.dst = n.node), "
    "w4 AS MATERIALIZED (SELECT n.node, "
    "COALESCE(s.c, 0)::HUGEINT AS w FROM nodes n LEFT JOIN "
    "(SELECT e0.dst, sum(w3.w) AS c FROM e0 "
    "JOIN w3 ON w3.node = e0.src GROUP BY e0.dst) s "
    "ON s.dst = n.node) "
    "SELECT w1.node, w1.w::BIGINT AS w1, w2.w::BIGINT AS w2, "
    "w3.w::BIGINT AS w3, w4.w::BIGINT AS w4, "
    "w1.w::DOUBLE / 2 + w2.w::DOUBLE / 4 + w3.w::DOUBLE / 8 "
    "+ w4.w::DOUBLE / 16 AS katz "
    "FROM w1 JOIN w2 ON w2.node = w1.node "
    "JOIN w3 ON w3.node = w1.node JOIN w4 ON w4.node = w1.node "
    "ORDER BY w1.node")


def q_golden_record(sf_dir: str):
    """MDM survivorship over a multi-source feed derived from events
    (source priority purchase > signup > click > view > error;
    recency then id break ties; the note field is NULL for view/error
    rows so non-null survivorship actually exercises) — stages/
    relational.py golden_record: one keyed exchange + per-field
    first-valid pick; values copied — exact."""
    from ..stages.relational import golden_record
    ds = _rp(sf_dir, "events",
             columns=["user_id", "event_id", "ts", "event_type",
                      "value"])
    PRIO = {"purchase": 1, "signup": 2, "click": 3, "view": 4,
            "error": 5}

    def prep(t: pa.Table) -> pa.Table:
        et = t.column("event_type").to_pylist()
        eid = t.column("event_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cents = np.rint(t.column("value").to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        note = [None if x in ("error", "view") else f"note-{i}"
                for x, i in zip(et, eid)]
        return pa.table({
            "user_id": t.column("user_id").cast(pa.int64()),
            "prio": pa.array([PRIO[x] for x in et], pa.int64()),
            "ts_us": pa.array(t.column("ts")
                              .to_numpy(zero_copy_only=False)
                              .astype("datetime64[us]")
                              .astype(np.int64)),
            "seq": pa.array(eid),
            "f_cents": pa.array(cents),
            "f_note": pa.array(note, pa.string())})

    return golden_record(
        ds.map_batches(prep, batch_format="pyarrow"),
        "user_id", "prio", "ts_us", "seq", ["f_cents", "f_note"])


_GOLDEN_SQL = (
    "WITH b AS (SELECT user_id AS k, CASE event_type "
    "WHEN 'purchase' THEN 1 WHEN 'signup' THEN 2 "
    "WHEN 'click' THEN 3 WHEN 'view' THEN 4 ELSE 5 END AS prio, "
    "epoch_us(ts) AS t, event_id AS seq, "
    "CAST(round(value * 100) AS BIGINT) AS f_cents, "
    "CASE WHEN event_type IN ('error', 'view') THEN NULL "
    "ELSE 'note-' || event_id::VARCHAR END AS f_note FROM events), "
    "g AS (SELECT k, first_value(f_cents IGNORE NULLS) OVER w "
    "AS f_cents, first_value(f_note IGNORE NULLS) OVER w AS f_note, "
    "count(*) OVER (PARTITION BY k) AS n_rows, "
    "row_number() OVER w AS rn FROM b WINDOW w AS "
    "(PARTITION BY k ORDER BY prio, t DESC, seq DESC "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)) "
    "SELECT k AS user_id, n_rows::BIGINT AS n_rows, f_cents, f_note "
    "FROM g WHERE rn = 1 ORDER BY user_id")


def q_shapley_channels(sf_dir: str):
    """Exact Shapley channel attribution over user event-type
    coalitions (converted = any purchase; v(S) = converted users
    whose touched set ⊆ S) — game-theoretic credit next to
    attr_last_touch (stages/aggregates.py shapley_channels: one keyed
    exchange to (mask, converted), 16-cell integer combiner, driver
    zeta transform + integer Shapley numerators over the literal
    4! — bit-exact)."""
    from ..stages.aggregates import shapley_channels
    ds = _rp(sf_dir, "events", columns=["user_id", "event_type"])
    return shapley_channels(ds)


_SHAPLEY_SQL = (
    "WITH u AS (SELECT user_id, bit_or(CASE event_type "
    "WHEN 'click' THEN 1 WHEN 'error' THEN 2 WHEN 'signup' THEN 4 "
    "WHEN 'view' THEN 8 ELSE 0 END)::BIGINT AS mask, "
    "max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) "
    "AS conv FROM events GROUP BY user_id), "
    "cu AS (SELECT mask FROM u WHERE conv = 1), "
    "ss AS (SELECT s FROM generate_series(0, 15) g(s)), "
    "v AS (SELECT s, (SELECT count(*) FROM cu "
    "WHERE (cu.mask & s) = cu.mask)::BIGINT AS v FROM ss), "
    "ch AS (SELECT * FROM (VALUES ('click', 0), ('error', 1), "
    "('signup', 2), ('view', 3)) AS t(channel, ci)), "
    "terms AS (SELECT ch.channel, sum((CASE bit_count(ss.s) "
    "WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2 ELSE 6 END) "
    "* (vb.v - va.v))::BIGINT AS numer FROM ch, ss "
    "JOIN v va ON va.s = ss.s "
    "JOIN v vb ON vb.s = (ss.s | (1 << ch.ci)) "
    "WHERE (ss.s & (1 << ch.ci)) = 0 GROUP BY ch.channel) "
    "SELECT channel, numer, numer::DOUBLE / 24::DOUBLE AS phi "
    "FROM terms ORDER BY channel")


def q_ransac_orders(sf_dir: str):
    """Deterministic RANSAC trend fit of (order day, total cents):
    candidate lines through the 8 smallest order keys, inliers via
    the integer cross-multiplied vertical-distance test (stages/
    aggregates.py ransac_line: min-k sample combiner + broadcast
    candidates + inlier-count combiner — no division, exact
    argmax)."""
    from ..stages.aggregates import ransac_line
    ds = _rp(sf_dir, "orders",
             columns=["o_orderkey", "o_orderdate", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        x = t.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64) \
            // 86_400_000_000
        y = np.rint(t.column("o_totalprice").to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"id": t.column("o_orderkey").cast(pa.int64()),
                         "x": pa.array(x), "y": pa.array(y)})

    return ransac_line(ds.map_batches(prep, batch_format="pyarrow"),
                       "id", "x", "y")


_RANSAC_SQL = (
    "WITH p AS (SELECT o_orderkey AS id, "
    "(epoch_us(o_orderdate) // 86400000000)::BIGINT AS x, "
    "CAST(round(o_totalprice * 100) AS BIGINT) AS y FROM orders), "
    "s AS (SELECT id, x, y, row_number() OVER (ORDER BY id) AS rn "
    "FROM p ORDER BY id LIMIT 8), "
    "c AS (SELECT a.id AS ia, b.id AS ib, a.x AS x1, a.y AS y1, "
    "b.x AS x2, b.y AS y2 FROM s a JOIN s b ON a.rn < b.rn "
    "WHERE a.x <> b.x), "
    "cnt AS (SELECT c.ia, c.ib, c.x1, c.y1, c.x2, c.y2, "
    "count(*)::BIGINT AS n_in FROM c JOIN p ON "
    "abs((p.y - c.y1) * (c.x2 - c.x1) "
    "- (c.y2 - c.y1) * (p.x - c.x1)) <= 200000 * abs(c.x2 - c.x1) "
    "GROUP BY ALL) "
    "SELECT ia AS i_key, ib AS j_key, n_in AS n_inliers, "
    "(y2 - y1)::BIGINT AS dy, (x2 - x1)::BIGINT AS dx, "
    "(y2 - y1)::DOUBLE / (x2 - x1)::DOUBLE AS slope FROM cnt "
    "ORDER BY n_in DESC, i_key, j_key LIMIT 1")


def q_viterbi_users(sf_dir: str):
    """Per-user 2-state Viterbi decode of the event-type sequence
    under fixed integer HMM costs — the sequence-labeling DP next to
    sequence_match (stages/windows.py viterbi_sessions: keyed
    exchange, DP vectorized across keys per step, exact integers)."""
    from ..stages.windows import viterbi_sessions
    ds = _rp(sf_dir, "events",
             columns=["user_id", "ts", "event_id", "event_type"])
    return viterbi_sessions(ds)


_VITERBI_SQL = (
    "WITH RECURSIVE b AS (SELECT user_id AS k, epoch_us(ts) AS t, "
    "event_id AS oc, "
    "CASE event_type WHEN 'view' THEN 0 WHEN 'click' THEN 1 "
    "WHEN 'signup' THEN 2 WHEN 'purchase' THEN 4 ELSE 2 END AS e0, "
    "CASE event_type WHEN 'view' THEN 3 WHEN 'click' THEN 2 "
    "WHEN 'signup' THEN 1 WHEN 'purchase' THEN 0 ELSE 2 END AS e1, "
    "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) "
    "AS rn, count(*) OVER (PARTITION BY user_id) AS n FROM events), "
    "st AS (SELECT k, rn, n, e0 AS c0, e1 AS c1 FROM b WHERE rn = 1 "
    "UNION ALL SELECT b.k, b.rn, b.n, "
    "b.e0 + least(st.c0 + 0, st.c1 + 2), "
    "b.e1 + least(st.c0 + 2, st.c1 + 0) FROM st "
    "JOIN b ON b.k = st.k AND b.rn = st.rn + 1) "
    "SELECT k AS key, n::BIGINT AS n_events, c0::BIGINT AS cost_0, "
    "c1::BIGINT AS cost_1, "
    "(CASE WHEN c1 < c0 THEN 1 ELSE 0 END)::BIGINT AS best_state, "
    "least(c0, c1)::BIGINT AS best_cost FROM st WHERE rn = n "
    "ORDER BY key")


_MST_CHORD = (
    "SELECT (o_orderkey % 200) * 8 + ((o_orderkey // 200) "
    "% (3 + (o_orderkey % 200) % 5)) AS u, "
    "(o_orderkey % 200) * 8 + (((o_orderkey // 200) "
    "% (3 + (o_orderkey % 200) % 5)) + 2) "
    "% (3 + (o_orderkey % 200) % 5) AS v FROM orders "
    "WHERE o_orderkey % 3 = 0")


def q_mst_forest(sf_dir: str):
    """Minimum spanning forest of the 200-cycle + chords order graph
    under distinct md5 edge weights — Kruskal on the driver, Borůvka
    exchanges above driver_limit, both under the same (w, lo, hi)
    total order (stages/graph.py mst_forest; driver ≡ distributed
    parity pinned in pytest). Oracle: the CYCLE PROPERTY — an edge is
    in the forest iff its endpoints are NOT connected by strictly
    lighter edges."""
    import hashlib

    from ..stages.graph import mst_forest
    ds = _rp(sf_dir, "orders", columns=["o_orderkey"])

    def to_e(t: pa.Table) -> pa.Table:
        o = t.column("o_orderkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        g = o % 200
        L = 3 + g % 5
        i = (o // 200) % L
        u1, v1 = g * 8 + i, g * 8 + (i + 1) % L
        ch = o % 3 == 0
        u2, v2 = (g * 8 + i)[ch], (g * 8 + (i + 2) % L)[ch]
        u = np.concatenate((u1, u2))
        v = np.concatenate((v1, v2))
        keep = u != v
        u, v = u[keep], v[keep]
        lo, hi = np.minimum(u, v), np.maximum(u, v)
        w = np.array([int.from_bytes(hashlib.md5(
            f"{a}:{b}".encode()).digest()[8:], "little")
            & ((1 << 63) - 1) for a, b in zip(lo, hi)], np.int64)
        return pa.table({"src": pa.array(lo), "dst": pa.array(hi),
                         "w": pa.array(w)})

    return mst_forest(ds.map_batches(to_e, batch_format="pyarrow"))


_MST_SQL = (
    f"WITH RECURSIVE e0 AS (SELECT least(u, v) AS lo, "
    f"greatest(u, v) AS hi FROM ({_BIP_E0} UNION ALL {_MST_CHORD}) "
    "WHERE u <> v), "
    "ed AS (SELECT DISTINCT lo, hi FROM e0), "
    "ew AS MATERIALIZED (SELECT row_number() OVER "
    "(ORDER BY lo, hi) AS eid, lo, hi, "
    "(md5_number_lower(lo::VARCHAR || ':' || hi::VARCHAR) "
    "& 9223372036854775807)::BIGINT AS w FROM ed), "
    "symw AS (SELECT lo AS a, hi AS b, w FROM ew "
    "UNION ALL SELECT hi AS a, lo AS b, w FROM ew), "
    "r AS (SELECT ew.eid, ew.lo AS node, ew.w AS lim FROM ew "
    "UNION SELECT r.eid, s.b, r.lim FROM r "
    "JOIN symw s ON s.a = r.node AND s.w < r.lim) "
    "SELECT lo, hi, w FROM ew WHERE NOT EXISTS "
    "(SELECT 1 FROM r WHERE r.eid = ew.eid AND r.node = ew.hi) "
    "ORDER BY lo, hi")


def q_wkt_polygon_area(sf_dir: str):
    """WKT footprint parsing + EXACT shoelace area: 500 synthetic
    integer-vertex POLYGON strings (md5-derived vertices — the
    reference stores building footprints as WKT MULTIPOLYGON text,
    crawler.service.js:508) parsed and measured by
    stages/extract.py wkt_polygon_area_batch (doubled signed area,
    all integers). The oracle never sees the string — it regenerates
    the vertices relationally and folds the same shoelace, so the
    parse itself is what's graded."""
    import hashlib

    from ..stages.extract import wkt_polygon_area_batch
    ds = _rp(sf_dir, "orders", columns=["o_orderkey"])

    def mk(t: pa.Table) -> pa.Table:
        o = t.column("o_orderkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        gs = np.unique(o % 500)
        ids, wkts = [], []
        for g in gs.tolist():
            k = 3 + g % 5
            pts = []
            for j in range(k):
                hx = int.from_bytes(hashlib.md5(
                    f"{g}:{j}:x".encode()).digest()[8:], "little")
                hy = int.from_bytes(hashlib.md5(
                    f"{g}:{j}:y".encode()).digest()[8:], "little")
                pts.append((hx % 101 - 50, hy % 101 - 50))
            ring = ", ".join(f"{x} {y}" for x, y in pts)
            x0, y0 = pts[0]
            ids.append(g)
            wkts.append(f"POLYGON(({ring}, {x0} {y0}))")
        return pa.table({"poly_id": pa.array(ids, pa.int64()),
                         "wkt": pa.array(wkts, pa.string())})

    polys = ds.map_batches(mk, batch_format="pyarrow")

    def dedupe(t: pa.Table) -> pa.Table:
        import pandas as pd
        df = t.to_pandas().drop_duplicates(subset=["poly_id"])
        return pa.Table.from_pandas(df, preserve_index=False)

    # distinct across batches: tiny table, one-partition reduce
    polys = polys.repartition(1).map_batches(dedupe,
                                             batch_format="pyarrow")
    return polys.map_batches(wkt_polygon_area_batch,
                             batch_format="pyarrow")


_WKT_SQL = (
    "WITH g AS (SELECT DISTINCT (o_orderkey % 500)::BIGINT AS pid "
    "FROM orders), "
    "v AS (SELECT g.pid, j, "
    "((md5_number_lower(g.pid::VARCHAR || ':' || j::VARCHAR "
    "|| ':x') % 101)::BIGINT - 50) AS x, "
    "((md5_number_lower(g.pid::VARCHAR || ':' || j::VARCHAR "
    "|| ':y') % 101)::BIGINT - 50) AS y "
    "FROM g, UNNEST(generate_series(0, 2 + (g.pid % 5))) AS t(j)), "
    "w AS (SELECT a.pid, a.j, a.x, a.y, b.x AS xn, b.y AS yn "
    "FROM v a JOIN v b ON b.pid = a.pid "
    "AND b.j = (a.j + 1) % (3 + (a.pid % 5))) "
    "SELECT pid AS poly_id, count(*)::BIGINT AS n_vertices, "
    "sum(x * yn - xn * y)::BIGINT AS area2 FROM w GROUP BY pid "
    "ORDER BY poly_id")


def q_point_in_polygon(sf_dir: str):
    """Point-in-polygon containment join: 100 md5-derived integer
    footprint rings × customer points, EXACT integer ray casting
    (stages/extract.py point_in_polygons_batch — cross-multiplied
    crossing test, no division; polygons broadcast, one vectorized
    pass per batch)."""
    import hashlib

    from ..stages.extract import point_in_polygons_batch

    def h(s: str) -> int:
        return int.from_bytes(hashlib.md5(s.encode()).digest()[8:],
                              "little")

    # polygon set: every 5th of the 500 wkt rings (driver-built —
    # O(polys) work, broadcast into the batch closure)
    polys = []
    for g in range(0, 500, 5):
        k = 3 + g % 5
        ring = [(h(f"{g}:{j}:x") % 101 - 50,
                 h(f"{g}:{j}:y") % 101 - 50) for j in range(k)]
        polys.append((g, ring))

    ds = _rp(sf_dir, "customer", columns=["c_custkey"])

    def prep(t: pa.Table) -> pa.Table:
        kk = t.column("c_custkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        x = np.array([h(f"{int(v)}:px") % 101 - 50 for v in kk],
                     np.int64)
        y = np.array([h(f"{int(v)}:py") % 101 - 50 for v in kk],
                     np.int64)
        return pa.table({"pt_id": pa.array(kk), "x": pa.array(x),
                         "y": pa.array(y)})

    pts = ds.map_batches(prep, batch_format="pyarrow")
    return pts.map_batches(
        lambda t: point_in_polygons_batch(t, polys),
        batch_format="pyarrow")


_PIP_SQL = (
    "WITH g AS (SELECT DISTINCT (o_orderkey % 500)::BIGINT AS pid "
    "FROM orders WHERE (o_orderkey % 500) % 5 = 0), "
    "v AS (SELECT g.pid, j, "
    "((md5_number_lower(g.pid::VARCHAR || ':' || j::VARCHAR "
    "|| ':x') % 101)::BIGINT - 50) AS x, "
    "((md5_number_lower(g.pid::VARCHAR || ':' || j::VARCHAR "
    "|| ':y') % 101)::BIGINT - 50) AS y "
    "FROM g, UNNEST(generate_series(0, 2 + (g.pid % 5))) AS t(j)), "
    "e AS (SELECT a.pid, a.x AS x1, a.y AS y1, b.x AS x2, "
    "b.y AS y2 FROM v a JOIN v b ON b.pid = a.pid "
    "AND b.j = (a.j + 1) % (3 + (a.pid % 5))), "
    "p AS (SELECT c_custkey AS pt_id, "
    "((md5_number_lower(c_custkey::VARCHAR || ':px') "
    "% 101)::BIGINT - 50) AS x, "
    "((md5_number_lower(c_custkey::VARCHAR || ':py') "
    "% 101)::BIGINT - 50) AS y FROM customer), "
    "cr AS (SELECT p.pt_id, e.pid, count(*) AS c FROM p JOIN e ON "
    "((e.y1 > p.y) <> (e.y2 > p.y)) AND "
    "(CASE WHEN e.y2 - e.y1 > 0 THEN "
    "p.x * (e.y2 - e.y1) < e.x1 * (e.y2 - e.y1) "
    "+ (e.x2 - e.x1) * (p.y - e.y1) "
    "ELSE p.x * (e.y2 - e.y1) > e.x1 * (e.y2 - e.y1) "
    "+ (e.x2 - e.x1) * (p.y - e.y1) END) "
    "GROUP BY p.pt_id, e.pid) "
    "SELECT pt_id, pid AS poly_id FROM cr WHERE c % 2 = 1 "
    "ORDER BY pt_id, poly_id")


def q_bandit_replay(sf_dir: str):
    """Off-policy greedy-bandit evaluation by rejection-sampling
    replay over the logged arm stream (arms click/view/signup,
    reward = next event is a purchase) — the counterfactual policy
    readout next to attr/shapley (stages/windows.py bandit_replay:
    one keyed exchange, replay vectorized across keys, all-integer
    state with cross-multiplied mean compares — bit-exact)."""
    from ..stages.windows import bandit_replay
    ds = _rp(sf_dir, "events",
             columns=["user_id", "ts", "event_id", "event_type"])
    return bandit_replay(ds)


def _bandit_oracle_sql() -> str:
    pick = ("CASE WHEN st.n1 = 0 THEN 1 WHEN st.n2 = 0 THEN 2 "
            "WHEN st.n3 = 0 THEN 3 "
            "WHEN st.s1 * st.n2 >= st.s2 * st.n1 "
            "AND st.s1 * st.n3 >= st.s3 * st.n1 THEN 1 "
            "WHEN st.s2 * st.n3 >= st.s3 * st.n2 THEN 2 "
            "ELSE 3 END")
    hit = f"(CASE WHEN ({pick}) = b.arm THEN 1 ELSE 0 END)"
    return (
        "WITH RECURSIVE b0 AS (SELECT user_id AS k, epoch_us(ts) "
        "AS t, event_id AS oc, CASE event_type WHEN 'click' THEN 1 "
        "WHEN 'view' THEN 2 WHEN 'signup' THEN 3 ELSE 0 END AS arm, "
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS isr "
        "FROM events), "
        "b1 AS (SELECT k, t, oc, arm, COALESCE(lead(isr) OVER "
        "(PARTITION BY k ORDER BY t, oc), 0) AS r FROM b0), "
        "b AS (SELECT k, arm, r, row_number() OVER (PARTITION BY k "
        "ORDER BY t, oc) AS rn, count(*) OVER (PARTITION BY k) "
        "AS nl FROM b1 WHERE arm > 0), "
        "st AS (SELECT k, rn, nl, "
        "(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS n1, "
        "(CASE WHEN arm = 1 THEN r ELSE 0 END)::BIGINT AS s1, "
        "0::BIGINT AS n2, 0::BIGINT AS s2, "
        "0::BIGINT AS n3, 0::BIGINT AS s3, "
        "(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS matched, "
        "(CASE WHEN arm = 1 THEN r ELSE 0 END)::BIGINT "
        "AS reward_sum FROM b WHERE rn = 1 "
        "UNION ALL SELECT b.k, b.rn, b.nl, "
        f"st.n1 + (CASE WHEN {hit} = 1 AND b.arm = 1 THEN 1 "
        "ELSE 0 END), "
        f"st.s1 + (CASE WHEN {hit} = 1 AND b.arm = 1 THEN b.r "
        "ELSE 0 END), "
        f"st.n2 + (CASE WHEN {hit} = 1 AND b.arm = 2 THEN 1 "
        "ELSE 0 END), "
        f"st.s2 + (CASE WHEN {hit} = 1 AND b.arm = 2 THEN b.r "
        "ELSE 0 END), "
        f"st.n3 + (CASE WHEN {hit} = 1 AND b.arm = 3 THEN 1 "
        "ELSE 0 END), "
        f"st.s3 + (CASE WHEN {hit} = 1 AND b.arm = 3 THEN b.r "
        "ELSE 0 END), "
        f"st.matched + {hit}, "
        f"st.reward_sum + {hit} * b.r "
        "FROM st JOIN b ON b.k = st.k AND b.rn = st.rn + 1) "
        "SELECT k AS key, nl::BIGINT AS n_logged, "
        "matched::BIGINT AS matched, "
        "reward_sum::BIGINT AS reward_sum FROM st WHERE rn = nl "
        "ORDER BY key")


def q_runs_test_users(sf_dir: str):
    """Wald–Wolfowitz runs test per user: sign runs of event values
    around the user's discrete median, median-equal rows excluded
    (stages/windows.py runs_test: one keyed exchange, exact integers
    only in the graded row)."""
    from ..stages.windows import runs_test
    ds = _rp(sf_dir, "events",
             columns=["user_id", "ts", "event_id", "value"])
    return runs_test(ds)


_RUNS_SQL = (
    "WITH b AS (SELECT user_id AS k, epoch_us(ts) AS t, "
    "event_id AS oc, CAST(round(value * 100) AS BIGINT) AS c "
    "FROM events), "
    "m AS (SELECT k, quantile_disc(c, 0.5) AS med FROM b "
    "GROUP BY k), "
    "s AS (SELECT b.k, b.t, b.oc, "
    "CASE WHEN b.c > m.med THEN 1 ELSE 0 END AS sgn FROM b "
    "JOIN m ON m.k = b.k WHERE b.c <> m.med), "
    "r AS (SELECT k, sgn, lag(sgn) OVER (PARTITION BY k "
    "ORDER BY t, oc) AS prev FROM s), "
    "agg AS (SELECT k, sum(sgn)::BIGINT AS n_above, "
    "(count(*) - sum(sgn))::BIGINT AS n_below, "
    "(1 + sum(CASE WHEN prev IS NOT NULL AND sgn <> prev "
    "THEN 1 ELSE 0 END))::BIGINT AS n_runs FROM r GROUP BY k), "
    "allk AS (SELECT DISTINCT k FROM b) "
    "SELECT f.k AS key, COALESCE(a.n_above, 0)::BIGINT AS n_above, "
    "COALESCE(a.n_below, 0)::BIGINT AS n_below, "
    "COALESCE(a.n_runs, 0)::BIGINT AS n_runs FROM allk f "
    "LEFT JOIN agg a ON a.k = f.k ORDER BY key")


def q_tukey_lineitem(sf_dir: str):
    """Tukey-fence outlier audit of extended price per return flag:
    discrete quartiles (exact value copies), dyadic 1.5·IQR fences,
    exact outlier counts (stages/aggregates.py tukey_outliers —
    one keyed exchange with a consistent string-hash partition
    key)."""
    from ..stages.aggregates import tukey_outliers
    ds = _rp(sf_dir, "lineitem",
             columns=["l_returnflag", "l_extendedprice"])
    return tukey_outliers(ds, "l_returnflag", "l_extendedprice")


_TUKEY_SQL = (
    "WITH b AS (SELECT l_returnflag AS k, "
    "CAST(round(l_extendedprice * 100) AS BIGINT) AS c "
    "FROM lineitem), "
    "q AS (SELECT k, count(*)::BIGINT AS n, "
    "quantile_disc(c, 0.25)::BIGINT AS q1, "
    "quantile_disc(c, 0.75)::BIGINT AS q3 FROM b GROUP BY k) "
    "SELECT q.k AS key, q.n, q.q1, q.q3, "
    "(SELECT count(*) FROM b WHERE b.k = q.k AND b.c::DOUBLE < "
    "q.q1::DOUBLE - 1.5 * (q.q3 - q.q1)::DOUBLE)::BIGINT AS n_low, "
    "(SELECT count(*) FROM b WHERE b.k = q.k AND b.c::DOUBLE > "
    "q.q3::DOUBLE + 1.5 * (q.q3 - q.q1)::DOUBLE)::BIGINT AS n_high "
    "FROM q ORDER BY key")


def q_mcnemar_events(sf_dir: str):
    """McNemar's paired test of purchase behaviour before vs after
    Jan 16 per user (behaviour = >= 7 purchases in the half; the
    any-occurrence version is degenerate and NaNs chi2) —
    discordant-cell chi2, one division (stages/
    aggregates.py mcnemar_test: keyed exchange to two bits, 4-cell
    integer combiner — bit-exact)."""
    from ..stages.aggregates import mcnemar_test
    ds = _rp(sf_dir, "events",
             columns=["user_id", "ts", "event_type"])
    return mcnemar_test(ds, cutoff_us=1_705_363_200_000_000)


_MCNEMAR_SQL = (
    "WITH b AS (SELECT user_id AS k, "
    "CASE WHEN sum(CASE WHEN event_type = 'purchase' AND "
    "epoch_us(ts) < 1705363200000000 THEN 1 ELSE 0 END) >= 7 "
    "THEN 1 ELSE 0 END AS pre, "
    "CASE WHEN sum(CASE WHEN event_type = 'purchase' AND "
    "epoch_us(ts) >= 1705363200000000 THEN 1 ELSE 0 END) >= 7 "
    "THEN 1 ELSE 0 END AS post FROM events "
    "GROUP BY user_id), "
    "c AS (SELECT count(*)::BIGINT AS n_keys, "
    "sum(pre * post)::BIGINT AS n_both, "
    "sum(pre * (1 - post))::BIGINT AS n_pre_only, "
    "sum((1 - pre) * post)::BIGINT AS n_post_only, "
    "sum((1 - pre) * (1 - post))::BIGINT AS n_neither FROM b) "
    "SELECT n_keys, n_both, n_pre_only, n_post_only, n_neither, "
    "((n_pre_only - n_post_only) * (n_pre_only - n_post_only))"
    "::DOUBLE / (n_pre_only + n_post_only)::DOUBLE AS chi2 FROM c")


def q_sign_test_users(sf_dir: str):
    """Paired sign test per user over consecutive event-value pairs
    (stages/windows.py sign_test: one keyed exchange, stride-2
    compares — exact integers)."""
    from ..stages.windows import sign_test
    ds = _rp(sf_dir, "events",
             columns=["user_id", "ts", "event_id", "value"])
    return sign_test(ds)


_SIGNTEST_SQL = (
    "WITH b AS (SELECT user_id AS k, "
    "CAST(round(value * 100) AS BIGINT) AS c, "
    "row_number() OVER (PARTITION BY user_id "
    "ORDER BY ts, event_id) AS rn FROM events), "
    "p AS (SELECT a.k, a.c AS ca, b2.c AS cb FROM b a "
    "JOIN b b2 ON b2.k = a.k AND b2.rn = a.rn + 1 "
    "WHERE a.rn % 2 = 1), "
    "agg AS (SELECT k, count(*)::BIGINT AS n_pairs, "
    "sum(CASE WHEN cb > ca THEN 1 ELSE 0 END)::BIGINT AS n_plus, "
    "sum(CASE WHEN cb < ca THEN 1 ELSE 0 END)::BIGINT AS n_minus, "
    "sum(CASE WHEN cb = ca THEN 1 ELSE 0 END)::BIGINT AS n_tie "
    "FROM p GROUP BY k), "
    "allk AS (SELECT DISTINCT k FROM b) "
    "SELECT f.k AS key, COALESCE(a.n_pairs, 0)::BIGINT AS n_pairs, "
    "COALESCE(a.n_plus, 0)::BIGINT AS n_plus, "
    "COALESCE(a.n_minus, 0)::BIGINT AS n_minus, "
    "COALESCE(a.n_tie, 0)::BIGINT AS n_tie FROM allk f "
    "LEFT JOIN agg a ON a.k = f.k ORDER BY key")


# ---------------------------------------------------------------------------
# Registry + oracles
# ---------------------------------------------------------------------------

def registry() -> dict:
    return {
        "filter_events": q_filter_events,
        "groupby_count_lang": q_groupby_count_lang,
        "distinct_sources": q_distinct_sources,
        "topk_orders": q_topk_orders,
        "sort_paginate_events": q_sort_paginate_events,
        "lineitem_summary": q_lineitem_summary,
        "join_orders_customers": q_join_orders_customers,
        "hash_join_orders_nation": q_hash_join_orders_nation,
        "doc_length_buckets": q_doc_length_buckets,
        "tumbling_events": q_tumbling_events,
        "session_counts": q_session_counts,
        "sliding_events": q_sliding_events,
        "rolling_avg_events": q_rolling_avg_events,
        "quantiles_by_type": q_quantiles_by_type,
        "asof_join_rates": q_asof_join_rates,
        "asof_join_events": q_asof_join_events,
        "interval_join_tiers": q_interval_join_tiers,
        "semi_join_orders": q_semi_join_orders,
        "anti_join_customers": q_anti_join_customers,
        "semi_join_shuffled": q_semi_join_shuffled,
        "explode_part_words": q_explode_part_words,
        "pivot_lineitem": q_pivot_lineitem,
        "cumsum_events": q_cumsum_events,
        "ntile_events": q_ntile_events,
        "rollup_lineitem": q_rollup_lineitem,
        "cube_lineitem": q_cube_lineitem,
        "corr_lineitem": q_corr_lineitem,
        "funnel_events": q_funnel_events,
        "json_field_agg": q_json_field_agg,
        "hll_distinct": q_hll_distinct,
        "hll_distinct_md5": q_hll_distinct_md5,
        "cms_freq": q_cms_freq,
        "priority_sample": q_priority_sample,
        "rrf_fusion": q_rrf_fusion,
        "fuzzy_name_pairs": q_fuzzy_name_pairs,
        "inverted_index": q_inverted_index,
        "cohort_retention": q_cohort_retention,
        "ols_by_flag": q_ols_by_flag,
        "quantize_embeddings": q_quantize_embeddings,
        "transition_counts": q_transition_counts,
        "bigram_lm": q_bigram_lm,
        "geo_near_pairs": q_geo_near_pairs,
        "winsorize_events": q_winsorize_events,
        "mad_outliers": q_mad_outliers,
        "percent_rank_events": q_percent_rank_events,
        "sssp_weighted": q_sssp_weighted,
        "skyline_parts": q_skyline_parts,
        "revenue_by_nation": q_revenue_by_nation,
        "kcore_nodes": q_kcore_nodes,
        "welch_ttest": q_welch_ttest,
        "attr_last_touch": q_attr_last_touch,
        "hash_walks": q_hash_walks,
        "l2_normalize": q_l2_normalize,
        "checksum_events": q_checksum_events,
        "session_stats": q_session_stats,
        "unpivot_lineitem": q_unpivot_lineitem,
        "interval_union": q_interval_union,
        "partitioned_sink": q_partitioned_sink,
        "scd2_history": q_scd2_history,
        "histogram_events": q_histogram_events,
        "mode_users": q_mode_users,
        "weighted_median": q_weighted_median,
        "conversion_within": q_conversion_within,
        "login_streaks": q_login_streaks,
        "impute_median": q_impute_median,
        "spearman_by_flag": q_spearman_by_flag,
        "sliding_distinct_users": q_sliding_distinct_users,
        "gini_by_flag": q_gini_by_flag,
        "hhi_events": q_hhi_events,
        "ks_click_view": q_ks_click_view,
        "chi2_events": q_chi2_events,
        "kendall_events": q_kendall_events,
        "auc_click_view": q_auc_click_view,
        "twap_users": q_twap_users,
        "target_encode_brand": q_target_encode_brand,
        "clustering_coeff": q_clustering_coeff,
        "link_prediction": q_link_prediction,
        "ewma_users": q_ewma_users,
        "percentile_cont_events": q_percentile_cont_events,
        "regex_extract_docs": q_regex_extract_docs,
        "basket_pairs": q_basket_pairs,
        "incremental_stats": q_incremental_stats,
        "dbscan_customers": q_dbscan_customers,
        "resample_linear": q_resample_linear,
        "rolling_median_events": q_rolling_median_events,
        "corr_matrix_lineitem": q_corr_matrix_lineitem,
        "rfm_scores": q_rfm_scores,
        "user_paths": q_user_paths,
        "audience_overlap": q_audience_overlap,
        "hourly_profile": q_hourly_profile,
        "daily_pct_change": q_daily_pct_change,
        "knn_accuracy": q_knn_accuracy,
        "label_propagation": q_label_propagation,
        "autocorr_users": q_autocorr_users,
        "snapshot_diff": q_snapshot_diff,
        "degree_assortativity": q_degree_assortativity,
        "window_funnel": q_window_funnel,
        "max_concurrency": q_max_concurrency,
        "ohlc_bars": q_ohlc_bars,
        "cusum_users": q_cusum_users,
        "kmv_distinct": q_kmv_distinct,
        "late_data_stats": q_late_data_stats,
        "sequence_match": q_sequence_match,
        "zorder_orders": q_zorder_orders,
        "mis_nodes": q_mis_nodes,
        "closeness_sampled": q_closeness_sampled,
        "rake_keywords": q_rake_keywords,
        "apriori_triples": q_apriori_triples,
        "kmv_set_ops": q_kmv_set_ops,
        "dag_layers": q_dag_layers,
        "stream_window_join": q_stream_window_join,
        "window_dedup": q_window_dedup,
        "holt_users": q_holt_users,
        "abtest_lift": q_abtest_lift,
        "share_of_total": q_share_of_total,
        "isotonic_hourly": q_isotonic_hourly,
        "freq_cap": q_freq_cap,
        "ktruss_edges": q_ktruss_edges,
        "next_event_accuracy": q_next_event_accuracy,
        "item_item_cosine": q_item_item_cosine,
        "snm_pairs": q_snm_pairs,
        "image_dedup": q_image_dedup,
        "anova_events": q_anova_events,
        "cramers_v_events": q_cramers_v_events,
        "reciprocity_edges": q_reciprocity_edges,
        "dict_match_docs": q_dict_match_docs,
        "hierarchy_rollup": q_hierarchy_rollup,
        "feature_hash_docs": q_feature_hash_docs,
        "random_projection": q_random_projection,
        "bollinger_users": q_bollinger_users,
        "cdc_snapshot": q_cdc_snapshot,
        "scc_components": q_scc_components,
        "sax_users": q_sax_users,
        "kcenter_coreset": q_kcenter_coreset,
        "seasonal_events": q_seasonal_events,
        "square_counts": q_square_counts,
        "bipartite_orders": q_bipartite_orders,
        "gram_matrix": q_gram_matrix,
        "tree_score_events": q_tree_score_events,
        "betweenness_landmarks": q_betweenness_landmarks,
        "temporal_reach": q_temporal_reach,
        "knn_dist_outliers": q_knn_dist_outliers,
        "consistent_hash": q_consistent_hash,
        "lof_outliers": q_lof_outliers,
        "cuped_users": q_cuped_users,
        "kaplan_meier": q_kaplan_meier,
        "did_events": q_did_events,
        "partition_skew": q_partition_skew,
        "diameter_sweep": q_diameter_sweep,
        "video_scenes": q_video_scenes,
        "audio_fingerprint": q_audio_fingerprint,
        "bitmap_index": q_bitmap_index,
        "benford_orders": q_benford_orders,
        "katz_centrality": q_katz_centrality,
        "golden_record": q_golden_record,
        "shapley_channels": q_shapley_channels,
        "ransac_orders": q_ransac_orders,
        "viterbi_users": q_viterbi_users,
        "mst_forest": q_mst_forest,
        "wkt_polygon_area": q_wkt_polygon_area,
        "point_in_polygon": q_point_in_polygon,
        "bandit_replay": q_bandit_replay,
        "runs_test_users": q_runs_test_users,
        "tukey_lineitem": q_tukey_lineitem,
        "mcnemar_events": q_mcnemar_events,
        "sign_test_users": q_sign_test_users,
        "resample_ffill": q_resample_ffill,
        "profile_events": q_profile_events,
        "merge_upsert": q_merge_upsert,
        "image_stats": q_image_stats,
        "audio_stats": q_audio_stats,
        "video_frames": q_video_frames,
        "decontaminate_bloom": q_decontaminate_bloom,
        "heavy_hitters": q_heavy_hitters,
        "connected_components": q_connected_components,
        "pagerank": q_pagerank,
        "crawl_host_rank": q_crawl_host_rank,
        "zscore_events": q_zscore_events,
        "train_split": q_train_split,
        "lm_score": q_lm_score,
        "chunk_documents": q_chunk_documents,
        "pack_docs": q_pack_docs,
        "pack_docs_global": q_pack_docs_global,
        "bpe_vocab": q_bpe_vocab,
        "bpe_encode": q_bpe_encode,
        "pagerank_seeded": q_pagerank_seeded,
        "hits": q_hits,
        "triangle_counts": q_triangle_counts,
        "bfs_hops": q_bfs_hops,
        "approx_quantiles": q_approx_quantiles,
        "argmax_events": q_argmax_events,
        "stats_by_flag": q_stats_by_flag,
        "except_custkeys": q_except_custkeys,
        "intersect_custkeys": q_intersect_custkeys,
        "lag_diff_events": q_lag_diff_events,
        "string_agg_nations": q_string_agg_nations,
        "decontaminate": q_decontaminate,
        "pii_redact": q_pii_redact,
        "repetition_ratio": q_repetition_ratio,
        "vocab_topk": q_vocab_topk,
        "source_cap": q_source_cap,
        "mixture_sample": q_mixture_sample,
        "kmeans_clusters": q_kmeans_clusters,
        "semantic_dedup": q_semantic_dedup,
        "group_centroids": q_group_centroids,
        "tfidf_topk": q_tfidf_topk,
        "dup_ngram_stats": q_dup_ngram_stats,
        "remove_dup_ngrams": q_remove_dup_ngrams,
        "dedup_segments": q_dedup_segments,
        "pmi_pairs": q_pmi_pairs,
        "dsir_logweights": q_dsir_logweights,
        "winnow_fingerprints": q_winnow_fingerprints,
        "normalize_text": q_normalize_text,
        "topk_per_segment": q_topk_per_segment,
        "union_filters": q_union_filters,
        "hash_sample": q_hash_sample,
        "sample_k": q_sample_k,
        "stratified_sample": q_stratified_sample,
        "bm25": q_bm25,
        "quantile_filter": q_quantile_filter,
        "dedup_exact": q_dedup_exact,
        "token_counts": q_token_counts,
        "text_stats": q_text_stats,
        "ann_topk": q_ann_topk,
        "near_dup_embeddings": q_near_dup_embeddings,
        "near_dup_lsh": q_near_dup_lsh,
        "minhash_dedup": q_minhash_dedup,
        "training_pipeline": q_training_pipeline,
        "jaccard_pairs": q_jaccard_pairs,
        "simhash": q_simhash,
        "simhash_pairs": q_simhash_pairs,
        "simhash_md5": q_simhash_md5,
        "simhash_pairs_md5": q_simhash_pairs_md5,
        "lang_id": q_lang_id,
        "fingerprints": q_fingerprints,
        "fingerprints_md5": q_fingerprints_md5,
        "doc_quality": q_doc_quality,
        "media_features": q_media_features,
        "pdf_locations": q_pdf_locations,
        "crawl_visited": q_crawl_visited,
        "crawl_locations": q_crawl_locations,
        "crawl_spans": q_crawl_spans,
        "crawl_seen": q_crawl_seen,
        "crawl_extraction_stats": q_crawl_extraction_stats,
        "crawl_quality_report": q_crawl_quality_report,
    }


# --- SQL fragments shared by the text-analysis oracles -----------------------
# Word model: the engine's regexes transcribed to RE2 — words for lang/stop
# stats are [a-z0-9']+ over lower(text); shingle words are \w+; tokens are
# \s+ splits of trim(text); punctuation is the ASCII [!-~] blocks minus
# alnum. Stopword sets literal-inlined from stages/textstats.py STOPWORDS.

_SW = {
    "en": "'the','and','of','to','a','in','is','it','that','for','was','on',"
          "'are','with','as','this','be','at','by'",
    "de": "'der','die','das','und','ist','nicht','mit','ein','eine','zu',"
          "'den','von','für','auf','im','dem','des'",
    "fr": "'le','la','les','et','est','un','une','des','du','de','que',"
          "'pour','dans','qui','au','pas','sur'",
    "es": "'el','la','los','las','y','es','un','una','de','que','en','por',"
          "'con','para','no','se','del'",
}

_LANG_COUNTS = (
    "len(list_filter(words, x -> x IN ({en}))) AS n_en, "
    "len(list_filter(words, x -> x IN ({de}))) AS n_de, "
    "len(list_filter(words, x -> x IN ({fr}))) AS n_fr, "
    "len(list_filter(words, x -> x IN ({es}))) AS n_es"
).format(**_SW)

# first-strictly-greater-in-order (en,de,fr,es) == the engine's guess loop
_LANG_CASE = (
    "CASE WHEN n_en=0 AND n_de=0 AND n_fr=0 AND n_es=0 THEN 'unknown' "
    "WHEN n_en>=n_de AND n_en>=n_fr AND n_en>=n_es THEN 'en' "
    "WHEN n_de>=n_fr AND n_de>=n_es THEN 'de' "
    "WHEN n_fr>=n_es THEN 'fr' ELSE 'es' END"
)

_LANG_ID_SQL = (
    "WITH w AS (SELECT doc_id, "
    "regexp_extract_all(lower(text), '[a-z0-9'']+') AS words FROM documents), "
    f"c AS (SELECT doc_id, {_LANG_COUNTS} FROM w) "
    f"SELECT doc_id, {_LANG_CASE} AS lang_guess FROM c"
)

_QUALITY_FEAT = (
    "SELECT doc_id, text, length(text) AS n_chars, "
    "CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)) = '' THEN [] "
    "ELSE regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+') END AS toks, "
    "regexp_extract_all(lower(text), '[a-z0-9'']+') AS words, "
    "length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g')) "
    "AS n_punct FROM documents"
)

_QUALITY_RATIOS = (
    "CASE WHEN len(words) > 0 THEN "
    "len(list_filter(words, x -> x IN ({en})))::DOUBLE / len(words) "
    "ELSE 0.0 END AS stop_r, "
    "CASE WHEN len(toks) > 0 THEN "
    "list_aggregate(list_transform(toks, t -> length(t)), 'sum')::DOUBLE "
    "/ len(toks) ELSE 0.0 END AS mean_len"
).format(en=_SW["en"])

# additive score in the engine's accumulation order (length, stop, punct,
# mean token length), rounded to 2 — IEEE-identical to doc_quality_score
_QUALITY_CASE = (
    "CASE WHEN n_chars = 0 OR n_tokens = 0 THEN 0.0 ELSE "
    "round((CASE WHEN n_chars BETWEEN 50 AND 100000 THEN 0.3 ELSE 0.0 END "
    "+ CASE WHEN stop_r >= 0.01 AND stop_r <= 0.6 THEN 0.3 ELSE 0.0 END) "
    "+ CASE WHEN n_punct::DOUBLE / n_chars <= 0.2 THEN 0.2 ELSE 0.0 END "
    "+ CASE WHEN mean_len >= 2.0 AND mean_len <= 12.0 THEN 0.2 ELSE 0.0 END, "
    "2) END"
)

_DOC_QUALITY_SQL = (
    f"WITH b AS ({_QUALITY_FEAT}), "
    f"m AS (SELECT doc_id, n_chars, n_punct, len(toks) AS n_tokens, "
    f"{_QUALITY_RATIOS} FROM b) "
    f"SELECT doc_id, ({_QUALITY_CASE})::DOUBLE AS doc_quality FROM m"
)

# 3-word shingle sets (engine: \w+ words, pad to k with '', k-grams,
# set semantics) — chr(1) joins keep shingle identity unambiguous.
# CAVEAT (by design): the pair/component oracles below compute exact
# ALL-PAIRS Jaccard, while the engine verifies MinHash-LSH candidates
# (banded, hot-bucket-capped). Equality holds at the driver's gate
# scales (validated hash-exact at sf0.001/0.01 — deterministic, not
# flaky); at much larger corpora a true pair can miss every band
# (~2e-4 at J=0.8 with 16 bands × 4 rows), where the all-pairs SQL is
# the STRICTER check and a mismatch means LSH recall, not wrong math.
_SHINGLES = (
    "{w0} AS (SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS w0 "
    "FROM {src}), "
    "{wp} AS (SELECT doc_id, CASE WHEN len(w0) >= 3 THEN w0 "
    "ELSE list_concat(w0, list_transform(generate_series(1, 3 - len(w0)), "
    "x -> '')) END AS w1 FROM {w0}), "
    "{sh} AS (SELECT doc_id, list_distinct(list_transform("
    "generate_series(1, greatest(1, len(w1) - 2)), "
    "i -> w1[i] || chr(1) || w1[i+1] || chr(1) || w1[i+2])) AS s FROM {wp})"
)

_JACCARD_EXPR = (
    "len(list_intersect(a.s, b.s))::DOUBLE / "
    "greatest(1, len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))"
)

_JACCARD_PAIRS_SQL = (
    "WITH " + _SHINGLES.format(w0="w0", wp="wp", sh="sh", src="documents") +
    f", j AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, {_JACCARD_EXPR} "
    "AS jac FROM sh a JOIN sh b ON a.doc_id < b.doc_id) "
    "SELECT id_a, id_b, round(jac, 6)::DOUBLE AS jaccard FROM j "
    "WHERE round(jac, 6) >= 0.8"
)

# connected components (min-label propagation) over the J>=0.8 pair graph;
# keep the min doc_id per component
_COMPONENTS = (
    "pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b "
    "FROM sh a JOIN sh b ON a.doc_id < b.doc_id "
    f"WHERE {_JACCARD_EXPR} >= 0.8), "
    "e AS (SELECT id_a AS a, id_b AS b FROM pr "
    "UNION ALL SELECT id_b, id_a FROM pr), "
    "r AS (SELECT doc_id AS id, doc_id AS root FROM {src} "
    "UNION "
    "SELECT e.b AS id, r.root FROM r JOIN e ON e.a = r.id "
    "WHERE r.root < e.b), "
    "keep AS (SELECT id FROM r GROUP BY id HAVING min(root) = id)"
)

_MINHASH_DEDUP_SQL = (
    "WITH RECURSIVE " +
    _SHINGLES.format(w0="w0", wp="wp", sh="sh", src="documents") + ", " +
    _COMPONENTS.format(src="documents") +
    " SELECT id AS doc_id FROM keep"
)

_TRAINING_PIPELINE_SQL = (
    f"WITH RECURSIVE feat AS ({_QUALITY_FEAT}), "
    f"scored AS (SELECT doc_id, text, n_chars, n_punct, len(toks) AS n_tokens, "
    f"{_LANG_COUNTS}, "
    f"{_QUALITY_RATIOS} FROM feat), "
    f"filt AS (SELECT doc_id, text, n_tokens, n_punct FROM scored "
    f"WHERE ({_LANG_CASE}) = 'en' AND ({_QUALITY_CASE}) >= 0.5), "
    "ex AS (SELECT doc_id, text, n_tokens, n_punct FROM filt "
    "QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1), " +
    _SHINGLES.format(w0="w0", wp="wp", sh="sh", src="ex") + ", " +
    _COMPONENTS.format(src="ex") +
    " SELECT ex.doc_id, ex.n_tokens::BIGINT AS n_tokens, "
    "ex.n_punct::BIGINT AS n_punct FROM ex JOIN keep ON ex.doc_id = keep.id"
)


# md5-variant hash oracles: word hash == DuckDB md5_number_lower (low 8
# md5 digest bytes, little-endian — correspondence pinned in pytest).
# Simhash per doc: unnest words x 64 bit lanes, majority vote per lane.
_SIMHASH_MD5_SIG = (
    "w AS (SELECT doc_id, "
    "regexp_extract_all(lower(coalesce(text,'')), '\\w+') AS words "
    "FROM documents), "
    "u AS (SELECT doc_id, len(words) AS n, unnest(words) AS wd FROM w), "
    "h AS (SELECT doc_id, n, md5_number_lower(wd) AS hv FROM u), "
    "b AS (SELECT doc_id, g.i, any_value(n) AS n, "
    "sum(CASE WHEN (hv >> g.i) & 1::UBIGINT = 1::UBIGINT THEN 1 ELSE 0 END) "
    "AS ones FROM h CROSS JOIN "
    "(SELECT unnest(generate_series(0,63)) AS i) g GROUP BY doc_id, g.i), "
    "sg AS (SELECT doc_id, sum(CASE WHEN 2*ones > n THEN (1::UBIGINT << i) "
    "ELSE 0::UBIGINT END)::UBIGINT AS simhash FROM b GROUP BY doc_id), "
    "s AS (SELECT d.doc_id, coalesce(sg.simhash, 0)::UBIGINT AS simhash "
    "FROM documents d LEFT JOIN sg USING (doc_id))"
)

_SIMHASH_MD5_SQL = f"WITH {_SIMHASH_MD5_SIG} SELECT doc_id, simhash FROM s"

# Brute-force Hamming<=3 pairs over the md5 simhash — STRICTER than the
# engine's banded path (which has exact pigeonhole recall at <=3, so they
# agree except under the documented 64-id hot-bucket cap, which does not
# bind at gate scales).
_SIMHASH_PAIRS_MD5_SQL = (
    f"WITH {_SIMHASH_MD5_SIG} "
    "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
    "bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming "
    "FROM s a JOIN s b ON a.doc_id < b.doc_id "
    "WHERE bit_count(xor(a.simhash, b.simhash)) <= 3"
)

_FINGERPRINTS_MD5_SQL = (
    "WITH w AS (SELECT doc_id, "
    "regexp_extract_all(lower(coalesce(text,'')), '[a-z0-9'']+') AS ws "
    "FROM documents) "
    "SELECT doc_id, (CASE WHEN len(ws) = 0 THEN 0::UBIGINT ELSE "
    "list_min(list_transform(generate_series(1, greatest(1, len(ws)-7)), "
    "i -> md5_number_lower(array_to_string(ws[i:i+7], chr(1))))) END"
    ")::UBIGINT AS fingerprint FROM w"
)

# HyperLogLog register fold + estimate, fully unrolled in SQL: hash =
# md5_number_lower (== sketches.hll_distinct_md5's per-value hash), idx =
# top 12 bits, rank = 53 - bit_length(low 52 bits) (bin() gives the minimal
# binary string), estimate via the EXACT-integer harmonic sum scaled by
# 2^53 (HUGEINT — every 2^-rank term is integral) so the only float ops
# are one division, the alpha*m^2 literal chain and one ln(), written with
# identical literals/associativity as _hll_estimate_md5. 4503599627370496
# = 2^52; 9007199254740992.0 = 2^53; 10240.0 = 2.5*m.
_HLL_MD5_SQL = (
    "WITH hx AS (SELECT event_type AS k, "
    "md5_number_lower(CAST(user_id AS VARCHAR)) AS h FROM events "
    "WHERE event_type IS NOT NULL AND user_id IS NOT NULL), "
    "reg AS (SELECT k, h >> 52 AS idx, "
    "MAX(CASE WHEN h % 4503599627370496 = 0 THEN 53 "
    "ELSE 53 - length(bin((h % 4503599627370496)::UBIGINT)) END) AS rnk "
    "FROM hx GROUP BY k, idx), "
    "s AS (SELECT k, 4096 - COUNT(*) AS zeros, "
    "(4096 - COUNT(*))::HUGEINT * (1::HUGEINT << 53) "
    "+ SUM(1::HUGEINT << (53 - rnk)) AS s_scaled FROM reg GROUP BY k), "
    "e AS (SELECT k, zeros, "
    "(0.7213::DOUBLE / (1::DOUBLE + 1.079::DOUBLE / 4096.0::DOUBLE)) "
    "* 4096.0::DOUBLE * 4096.0::DOUBLE * 9007199254740992.0::DOUBLE "
    "/ CAST(s_scaled AS DOUBLE) AS raw FROM s) "
    "SELECT k AS event_type, "
    "CAST(FLOOR(CASE WHEN raw <= 10240.0::DOUBLE AND zeros > 0 "
    "THEN 4096.0::DOUBLE * ln(4096.0::DOUBLE / zeros) "
    "ELSE raw END + 0.5::DOUBLE) AS BIGINT) AS approx_distinct FROM e"
)


def _build_bpe_sql(n_merges: int) -> str:
    """Unroll bpe_vocab's merge loop as MATERIALIZED DuckDB CTEs (plain
    CTEs inline exponentially here — words{k} chains back to documents
    and best{k} is referenced four times per apply). Symbol strings are
    boundary-delimited ('|a||b||c|'); SQL replace's left-to-right
    non-overlapping scan == Arrow replace_substring == greedy BPE apply
    (parity pinned in pytest on the 'aaa'/'ababa' overlap shapes)."""
    parts = [
        "words0 AS MATERIALIZED (SELECT '|' || "
        "array_to_string(string_split(word, ''), '||') || '|' AS w, cnt "
        "FROM (SELECT word, COUNT(*)::BIGINT AS cnt FROM (SELECT "
        "UNNEST(regexp_extract_all(lower(coalesce(text,'')), "
        "'[a-z0-9'']+')) AS word FROM documents) GROUP BY word))"]
    for k in range(n_merges):
        parts.append(
            f"pairs{k} AS MATERIALIZED (SELECT l, r, SUM(cnt)::BIGINT "
            f"AS cnt FROM (SELECT ss[i] AS l, ss[i+1] AS r, cnt FROM "
            f"(SELECT string_split(trim(w, '|'), '||') AS ss, cnt "
            f"FROM words{k}) t, "
            f"UNNEST(generate_series(1, len(ss)-1)) AS u(i)) GROUP BY l, r)")
        parts.append(
            f"best{k} AS MATERIALIZED (SELECT l, r, cnt FROM pairs{k} "
            f"ORDER BY cnt DESC, l ASC, r ASC LIMIT 1)")
        parts.append(
            f"words{k + 1} AS MATERIALIZED (SELECT replace(w, "
            f"'|' || (SELECT l FROM best{k}) || '||' || "
            f"(SELECT r FROM best{k}) || '|', "
            f"'|' || (SELECT l FROM best{k}) || "
            f"(SELECT r FROM best{k}) || '|') AS w, cnt FROM words{k})")
    union = " UNION ALL ".join(
        f"SELECT {k + 1}::BIGINT AS step, l AS left_sym, r AS right_sym, "
        f"l || r AS merged, cnt AS pair_count FROM best{k}"
        for k in range(n_merges))
    return "WITH " + ", ".join(parts) + " " + union


_BPE_SQL = _build_bpe_sql(10)


def _build_bpe_encode_sql(n_merges: int) -> str:
    """_build_bpe_sql's CTE chain with the original ``word`` carried
    through every merge, finished by a per-document token-count join:
    n_tokens(word) = symbols in its final boundary-delimited string,
    n_tokens(doc) = sum over the doc's word stream."""
    parts = [
        "words0 AS MATERIALIZED (SELECT word, '|' || "
        "array_to_string(string_split(word, ''), '||') || '|' AS w, cnt "
        "FROM (SELECT word, COUNT(*)::BIGINT AS cnt FROM (SELECT "
        "UNNEST(regexp_extract_all(lower(coalesce(text,'')), "
        "'[a-z0-9'']+')) AS word FROM documents) GROUP BY word))"]
    for k in range(n_merges):
        parts.append(
            f"pairs{k} AS MATERIALIZED (SELECT l, r, SUM(cnt)::BIGINT "
            f"AS cnt FROM (SELECT ss[i] AS l, ss[i+1] AS r, cnt FROM "
            f"(SELECT string_split(trim(w, '|'), '||') AS ss, cnt "
            f"FROM words{k}) t, "
            f"UNNEST(generate_series(1, len(ss)-1)) AS u(i)) GROUP BY l, r)")
        parts.append(
            f"best{k} AS MATERIALIZED (SELECT l, r, cnt FROM pairs{k} "
            f"ORDER BY cnt DESC, l ASC, r ASC LIMIT 1)")
        parts.append(
            f"words{k + 1} AS MATERIALIZED (SELECT word, replace(w, "
            f"'|' || (SELECT l FROM best{k}) || '||' || "
            f"(SELECT r FROM best{k}) || '|', "
            f"'|' || (SELECT l FROM best{k}) || "
            f"(SELECT r FROM best{k}) || '|') AS w, cnt FROM words{k})")
    parts.append(
        f"enc AS (SELECT word, len(string_split(trim(w, '|'), "
        f"'||'))::BIGINT AS n_sym FROM words{n_merges})")
    parts.append(
        "dt AS (SELECT doc_id, UNNEST(regexp_extract_all("
        "lower(coalesce(text,'')), '[a-z0-9'']+')) AS word "
        "FROM documents)")
    tail = (
        "SELECT d.doc_id, coalesce(s.n_words, 0)::BIGINT AS n_words, "
        "coalesce(s.n_tokens, 0)::BIGINT AS n_tokens FROM documents d "
        "LEFT JOIN (SELECT dt.doc_id, count(*)::BIGINT AS n_words, "
        "sum(enc.n_sym)::BIGINT AS n_tokens FROM dt "
        "JOIN enc USING (word) GROUP BY dt.doc_id) s USING (doc_id)")
    return "WITH " + ", ".join(parts) + " " + tail


_BPE_ENCODE_SQL = _build_bpe_encode_sql(10)


def q_bpe_encode(sf_dir: str):
    """Apply the learned 10-merge BPE vocabulary back to the corpus:
    per-doc word and post-merge token counts via a broadcast
    word->n_sym dimension."""
    from ..stages.aggregates import bpe_encode
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    return bpe_encode(ds, n_merges=10)


# Global greedy packing replayed as a recursive CTE: the walk's state
# (current bin, accumulated size) is inherently sequential, so the
# recursion advances exactly one id-ordered row per step — the same
# (acc and acc+sz > cap) reset rule as textstats.pack_greedy's kernel.
_PACK_GLOBAL_SQL = (
    "WITH RECURSIVE d AS (SELECT doc_id, n_chars, "
    "ROW_NUMBER() OVER (ORDER BY doc_id) AS rn FROM documents), "
    "walk AS ("
    "SELECT rn, doc_id, n_chars, 0::BIGINT AS bin_id, n_chars AS acc "
    "FROM d WHERE rn = 1 "
    "UNION ALL "
    "SELECT d.rn, d.doc_id, d.n_chars, "
    "CASE WHEN w.acc > 0 AND w.acc + d.n_chars > 8000 "
    "THEN w.bin_id + 1 ELSE w.bin_id END, "
    "CASE WHEN w.acc > 0 AND w.acc + d.n_chars > 8000 "
    "THEN d.n_chars ELSE w.acc + d.n_chars END "
    "FROM walk w JOIN d ON d.rn = w.rn + 1) "
    "SELECT doc_id, bin_id, n_chars::BIGINT AS n_chars FROM walk"
)


ORACLES: dict[str, str] = {
    "filter_events":
        "SELECT event_id, event_type, value FROM events WHERE value >= 0.7",
    "groupby_count_lang":
        "SELECT lang, count(*)::BIGINT AS n_docs FROM documents GROUP BY lang",
    "distinct_sources":
        "SELECT DISTINCT source FROM documents",
    "topk_orders":
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    "sort_paginate_events":
        "SELECT event_id, ts FROM events ORDER BY ts, event_id LIMIT 50 OFFSET 100",
    "lineitem_summary":
        "SELECT l_returnflag, l_linestatus, sum(l_quantity)::DOUBLE AS sum_qty, "
        "count(*)::BIGINT AS n_rows, max(l_extendedprice) AS max_price, "
        "min(l_extendedprice) AS min_price "
        "FROM lineitem GROUP BY l_returnflag, l_linestatus",
    "join_orders_customers":
        "SELECT c_mktsegment, count(*)::BIGINT AS n_orders FROM orders "
        "JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment",
    "hash_join_orders_nation":
        "SELECT c_nationkey, count(*)::BIGINT AS n_orders FROM orders "
        "JOIN customer ON o_custkey = c_custkey GROUP BY c_nationkey",
    "doc_length_buckets":
        "SELECT CASE WHEN n_chars < 500 THEN 'short' "
        "WHEN n_chars < 2000 THEN 'medium' ELSE 'long' END AS bucket, "
        "count(*)::BIGINT AS n FROM documents GROUP BY 1",
    "tumbling_events":
        "SELECT event_type, date_trunc('hour', ts) AS window_start, "
        "count(*)::BIGINT AS n_events, min(value) AS min_value, "
        "max(value) AS max_value FROM events GROUP BY 1, 2",
    "session_counts":
        "SELECT user_id, count(*)::BIGINT AS n_sessions FROM ("
        "  SELECT user_id, CASE WHEN lag(ts) OVER w IS NULL "
        "    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS s "
        "  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"
        ") WHERE s = 1 GROUP BY user_id",
    "sliding_events":
        "SELECT make_timestamp(ws) AS window_start, count(*)::BIGINT AS n_events "
        "FROM (SELECT unnest(generate_series("
        "(epoch_us(ts) // 1800000000 - 1) * 1800000000, "
        "(epoch_us(ts) // 1800000000) * 1800000000, 1800000000)) AS ws "
        "FROM events) GROUP BY 1",
    "rolling_avg_events":
        "SELECT user_id, event_id, round(avg(value) OVER ("
        "PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS rolling_avg "
        "FROM events",
    "approx_quantiles":
        "SELECT event_type, quantile_disc(value, 0.25) AS q25, "
        "quantile_disc(value, 0.5) AS q50, "
        "quantile_disc(value, 0.9) AS q90 FROM events "
        "GROUP BY event_type",
    "quantiles_by_type":
        "SELECT event_type, quantile_disc(value, 0.25) AS q25, "
        "quantile_disc(value, 0.5) AS q50, quantile_disc(value, 0.75) AS q75, "
        "quantile_disc(value, 0.95) AS q95 FROM events GROUP BY event_type",
    "asof_join_rates":
        f"WITH rates AS (SELECT eff, "
        f"1.0 + (((row_number() OVER (ORDER BY eff) - 1) * 37) % 50) / 100.0 "
        f"AS rate FROM (SELECT unnest(generate_series("
        f"TIMESTAMP '{_RATE_START}', TIMESTAMP '{_RATE_END}', "
        f"INTERVAL 1 MONTH)) AS eff)) "
        f"SELECT o_orderkey, eff AS rate_month, rate "
        f"FROM orders ASOF JOIN rates ON o_orderdate >= eff",
    "asof_join_events":
        "WITH r AS (SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice "
        "FROM orders QUALIFY row_number() OVER (PARTITION BY o_custkey, "
        "o_orderdate ORDER BY o_orderkey DESC) = 1) "
        "SELECT e.user_id, e.ts, e.event_id, r.o_orderkey, r.o_totalprice "
        "FROM events e ASOF JOIN r "
        "ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate",
    "interval_join_tiers":
        "SELECT event_id, value, tier FROM events JOIN (VALUES "
        "('low', 0.0, 0.35), ('mid', 0.25, 0.65), ('high', 0.55, 1.01)"
        ") t(tier, lo, hi) ON value >= lo AND value < hi",
    "semi_join_orders":
        "SELECT c_custkey, c_acctbal FROM customer WHERE EXISTS ("
        f"SELECT 1 FROM orders WHERE o_custkey = c_custkey "
        f"AND o_totalprice > {SEMI_PRICE})",
    "anti_join_customers":
        "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS ("
        f"SELECT 1 FROM orders WHERE o_custkey = c_custkey "
        f"AND o_totalprice > {ANTI_PRICE})",
    "semi_join_shuffled":
        "SELECT c_custkey, c_acctbal FROM customer WHERE EXISTS ("
        f"SELECT 1 FROM orders WHERE o_custkey = c_custkey "
        f"AND o_totalprice > {SEMI_PRICE})",
    "explode_part_words":
        "SELECT word, count(*)::BIGINT AS n FROM ("
        "SELECT unnest(string_split(p_name, ' ')) AS word FROM part) "
        "GROUP BY word ORDER BY n DESC, word LIMIT 20",
    "pivot_lineitem":
        "SELECT l_returnflag, "
        "sum(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END)::DOUBLE "
        "AS qty_F, "
        "sum(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END)::DOUBLE "
        "AS qty_O FROM lineitem GROUP BY l_returnflag",
    "cumsum_events":
        "SELECT user_id, event_id, round(sum(value) OVER ("
        "PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS UNBOUNDED PRECEDING), 6) AS cum_value FROM events",
    "ntile_events":
        "SELECT event_type, event_id, ntile(4) OVER ("
        "PARTITION BY event_type ORDER BY value, event_id)::BIGINT AS tile "
        "FROM events",
    "rollup_lineitem":
        "SELECT l_returnflag, l_linestatus, sum(l_quantity)::DOUBLE "
        "AS sum_qty, count(*)::BIGINT AS n_rows FROM lineitem "
        "GROUP BY ROLLUP(l_returnflag, l_linestatus)",
    "cube_lineitem":
        "SELECT l_returnflag, l_linestatus, sum(l_quantity)::DOUBLE "
        "AS sum_qty, count(*)::BIGINT AS n_rows FROM lineitem "
        "GROUP BY CUBE(l_returnflag, l_linestatus)",
    "corr_lineitem":
        # closed form from SUM() columns — the engine computes the SAME
        # expressions from its merged partial sums, so no dependence on
        # either side's streaming corr/covar kernel
        "WITH s AS (SELECT l_returnflag, count(*)::BIGINT AS n_rows, "
        "sum(l_quantity) AS sx, sum(l_extendedprice) AS sy, "
        "sum(l_quantity*l_quantity) AS sxx, "
        "sum(l_extendedprice*l_extendedprice) AS syy, "
        "sum(l_quantity*l_extendedprice) AS sxy "
        "FROM lineitem GROUP BY l_returnflag) "
        "SELECT l_returnflag, n_rows, "
        "round((sxy - sx*sy/n_rows)/n_rows, 6) AS covar_pop, "
        "round((n_rows*sxy - sx*sy)/(sqrt(n_rows*sxx - sx*sx)"
        "*sqrt(n_rows*syy - sy*sy)), 6) AS corr FROM s",
    "funnel_events":
        "WITH v AS (SELECT user_id, min(ts) AS t1 FROM events "
        "WHERE event_type = 'view' GROUP BY user_id), "
        "c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e "
        "JOIN v ON e.user_id = v.user_id AND e.ts > v.t1 "
        "WHERE e.event_type = 'click' GROUP BY e.user_id), "
        "p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e "
        "JOIN c ON e.user_id = c.user_id AND e.ts > c.t2 "
        "WHERE e.event_type = 'purchase' GROUP BY e.user_id) "
        "SELECT * FROM (VALUES "
        "(0::BIGINT, 'view', (SELECT count(*) FROM v)), "
        "(1::BIGINT, 'click', (SELECT count(*) FROM c)), "
        "(2::BIGINT, 'purchase', (SELECT count(*) FROM p))) "
        "AS t(stage_idx, stage, n_users)",
    "json_field_agg":
        "SELECT event_type, count(*)::BIGINT AS n_events, "
        "sum(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT "
        "AS sum_k FROM events GROUP BY event_type",
    "decontaminate_bloom":
        f"WITH toks AS (SELECT doc_id, "
        f"regexp_extract_all(lower(text), '[0-9a-z_]+') AS ws FROM documents), "
        f"sh AS (SELECT doc_id, array_to_string(ws[i:i+{DECON_N - 1}], ' ') AS s "
        f"FROM toks, UNNEST(generate_series(1, greatest(len(ws)-{DECON_N - 1}, 0))) "
        f"AS t(i)), "
        f"bench AS (SELECT DISTINCT s FROM sh WHERE {_DECON_BLOOM_BENCH}), "
        f"bad AS (SELECT DISTINCT doc_id FROM sh WHERE s IN (SELECT s FROM bench)) "
        f"SELECT doc_id FROM documents WHERE NOT ({_DECON_BLOOM_BENCH}) "
        f"AND doc_id NOT IN (SELECT doc_id FROM bad)",
    "chunk_documents":
        "SELECT d.doc_id, i AS chunk_idx, "
        "substr(d.text, i*150 + 1, 200) AS chunk_text "
        "FROM documents d, UNNEST(generate_series(0, "
        "(length(d.text)-1)//150)) AS g(i) WHERE length(d.text) > 0",
    "lm_score":
        "WITH ref AS (SELECT text FROM documents WHERE doc_id % 13 = 1), "
        "tri_r AS (SELECT substr(t.text, i, 3) AS tri FROM ref t, "
        "UNNEST(generate_series(1, greatest(length(t.text)-2, 0))) AS g(i)), "
        "tc AS (SELECT tri, count(*)::DOUBLE AS c FROM tri_r GROUP BY tri), "
        "bc AS (SELECT substr(tri,1,2) AS bi, sum(c) AS cb FROM tc "
        "GROUP BY substr(tri,1,2)), "
        "vv AS (SELECT count(DISTINCT substr(t.text, i, 1))::DOUBLE AS v "
        "FROM ref t, UNNEST(generate_series(1, length(t.text))) AS g(i)), "
        "dt AS (SELECT d.doc_id, substr(d.text, i, 3) AS tri "
        "FROM documents d, "
        "UNNEST(generate_series(1, greatest(length(d.text)-2, 0))) AS g(i) "
        "WHERE length(d.text) >= 3) "
        "SELECT dt.doc_id, round(avg(ln((COALESCE(tc.c, 0)+1) / "
        "(COALESCE(bc.cb, 0) + (SELECT v FROM vv)))), 6) AS lm_logprob "
        "FROM dt LEFT JOIN tc USING (tri) "
        "LEFT JOIN bc ON bc.bi = substr(dt.tri, 1, 2) GROUP BY dt.doc_id",
    "zscore_events":
        "WITH s AS (SELECT event_type, count(*)::DOUBLE AS n, "
        "sum(value) AS sx, sum(value*value) AS sxx FROM events "
        "GROUP BY event_type), "
        "j AS (SELECT e.event_id, e.value, s.sx/s.n AS m, "
        "s.sxx/s.n - (s.sx/s.n)*(s.sx/s.n) AS var FROM events e "
        "JOIN s ON e.event_type = s.event_type) "
        "SELECT event_id, CASE WHEN var > 0 THEN "
        "round((value - m)/sqrt(var), 6) ELSE NULL END AS z FROM j",
    "train_split":
        "SELECT doc_id, CASE "
        "WHEN md5_number_lower(doc_id::VARCHAR) % 1000 < 900 "
        "THEN 'train' "
        "WHEN md5_number_lower(doc_id::VARCHAR) % 1000 < 950 "
        "THEN 'val' ELSE 'test' END AS split FROM documents",
    "heavy_hitters":
        "SELECT o_custkey, COUNT(*)::BIGINT AS n_orders FROM orders "
        "GROUP BY o_custkey ORDER BY n_orders DESC, o_custkey LIMIT 25",
    "connected_components":
        "WITH RECURSIVE e AS ("
        "SELECT o_orderkey*4 AS u, o_custkey*4+1 AS v FROM orders "
        "UNION SELECT c_custkey*4+1 AS u, c_nationkey*4+2 AS v "
        "FROM customer), "
        "und AS (SELECT u, v FROM e UNION SELECT v AS u, u AS v FROM e "
        "UNION SELECT u, u FROM e UNION SELECT v AS u, v AS v FROM e), "
        "reach AS (SELECT u AS node, u AS r FROM und "
        "UNION SELECT reach.node, und.v AS r FROM reach "
        "JOIN und ON und.u = reach.r), "
        "comp AS (SELECT node, MIN(r) AS component FROM reach "
        "GROUP BY node) "
        "SELECT component, COUNT(*)::BIGINT AS n_nodes FROM comp "
        "GROUP BY component ORDER BY component",
    "pagerank": _pagerank_oracle_sql(),
    "pagerank_seeded": _pagerank_seeded_oracle_sql(),
    "hits": _hits_oracle_sql(),
    "triangle_counts": _triangle_counts_oracle_sql(),
    "bfs_hops": _bfs_hops_oracle_sql(),
    "argmax_events":
        "SELECT event_type, event_id, value FROM events QUALIFY "
        "row_number() OVER (PARTITION BY event_type "
        "ORDER BY value DESC, event_id) = 1",
    "stats_by_flag":
        "SELECT l_returnflag, count(*)::BIGINT AS n_rows, "
        "round(avg(l_quantity), 6) AS avg_v, "
        "round(var_samp(l_quantity), 6) AS var_v, "
        "round(stddev_samp(l_quantity), 6) AS std_v "
        "FROM lineitem GROUP BY l_returnflag",
    "except_custkeys":
        f"SELECT o_custkey FROM orders WHERE o_totalprice > {EXCEPT_PRICE} "
        f"EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'",
    "intersect_custkeys":
        f"SELECT o_custkey FROM orders WHERE o_totalprice > {EXCEPT_PRICE} "
        f"INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'",
    "lag_diff_events":
        "SELECT user_id, event_id, round(value - lag(value, 1, value) "
        "OVER (PARTITION BY user_id ORDER BY ts, event_id), 6) AS delta "
        "FROM events",
    "string_agg_nations":
        "SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations "
        "FROM nation JOIN region ON n_regionkey = r_regionkey "
        "GROUP BY r_name",
    "decontaminate":
        f"WITH toks AS (SELECT doc_id, "
        f"regexp_extract_all(lower(text), '[0-9a-z_]+') AS ws FROM documents), "
        f"sh AS (SELECT doc_id, array_to_string(ws[i:i+{DECON_N - 1}], ' ') AS s "
        f"FROM toks, UNNEST(generate_series(1, greatest(len(ws)-{DECON_N - 1}, 0))) "
        f"AS t(i)), "
        f"bench AS (SELECT DISTINCT s FROM sh WHERE {_DECON_BENCH}), "
        f"bad AS (SELECT DISTINCT doc_id FROM sh WHERE s IN (SELECT s FROM bench)) "
        f"SELECT doc_id FROM documents WHERE NOT ({_DECON_BENCH}) "
        f"AND doc_id NOT IN (SELECT doc_id FROM bad)",
    "pii_redact":
        f"WITH t2 AS (SELECT doc_id, text || {_PII_SUFFIX_SQL} AS tx "
        f"FROM documents) SELECT doc_id, "
        f"(len(regexp_extract_all(tx, '{T.PII_EMAIL_RE}')) + "
        f"len(regexp_extract_all(tx, '{T.PII_PHONE_RE}')))::BIGINT AS n_pii, "
        f"regexp_replace(regexp_replace(tx, '{T.PII_EMAIL_RE}', '<EMAIL>', 'g'), "
        f"'{T.PII_PHONE_RE}', '<PHONE>', 'g') AS text_redacted FROM t2",
    "repetition_ratio":
        "WITH toks AS (SELECT doc_id, "
        "regexp_extract_all(lower(text), '[0-9a-z_]+') AS ws FROM documents) "
        "SELECT doc_id, len(ws)::BIGINT AS n_words, "
        "len(list_distinct(ws))::BIGINT AS n_distinct, "
        "CASE WHEN len(ws) = 0 THEN 0.0 ELSE "
        "round(1.0 - len(list_distinct(ws))::DOUBLE / len(ws), 6) END "
        "AS rep_ratio FROM toks",
    "vocab_topk":
        "SELECT w AS word, count(*)::BIGINT AS n FROM "
        "(SELECT unnest(regexp_extract_all(lower(text), '[0-9a-z_]+')) AS w "
        "FROM documents) GROUP BY w ORDER BY n DESC, word LIMIT 50",
    "source_cap":
        "SELECT doc_id, source FROM documents QUALIFY "
        "row_number() OVER (PARTITION BY source ORDER BY doc_id) <= 10",
    "mixture_sample":
        "SELECT doc_id, source FROM documents WHERE "
        "md5_number_lower(doc_id::VARCHAR) % 100 < "
        "(5 + md5_number_lower(source) % 90)",
    "semantic_dedup":
        f"SELECT a.vec_id, a.grp FROM read_parquet('{_PLANTED_SEM_PATH}') a "
        f"WHERE NOT EXISTS ("
        f"SELECT 1 FROM read_parquet('{_PLANTED_SEM_PATH}') b "
        f"WHERE b.grp = a.grp AND b.vec_id < a.vec_id AND "
        f"list_cosine_similarity(b.embedding, a.embedding) "
        f">= {SEMDEDUP_TAU})",
    "group_centroids":
        "SELECT label, i - 1 AS dim, "
        "round(sum(embedding[i]::DOUBLE) / count(*), 6) AS centroid "
        "FROM embeddings, "
        "UNNEST(generate_series(1, len(embedding))) AS t(i) "
        "GROUP BY label, i",
    "tfidf_topk":
        "WITH toks AS (SELECT doc_id, "
        "unnest(regexp_extract_all(lower(text), '[0-9a-z_]+')) AS w "
        "FROM documents), "
        "tf AS (SELECT doc_id, w, count(*) AS tf FROM toks GROUP BY doc_id, w), "
        "df AS (SELECT w, count(DISTINCT doc_id) AS df FROM toks GROUP BY w), "
        "n AS (SELECT count(*)::DOUBLE AS n FROM documents) "
        "SELECT doc_id, w AS word, round(tf * ln(n / df), 6) AS score "
        "FROM tf JOIN df USING (w), n "
        "QUALIFY row_number() OVER (PARTITION BY doc_id "
        "ORDER BY tf * ln(n / df) DESC, w) <= 3",
    "dup_ngram_stats":
        f"WITH toks AS (SELECT doc_id, "
        f"regexp_extract_all(lower(text), '[0-9a-z_]+') AS ws FROM documents), "
        f"sh AS (SELECT doc_id, array_to_string(ws[i:i+{DUPGRAM_N - 1}], ' ') AS s "
        f"FROM toks, UNNEST(generate_series(1, greatest(len(ws)-{DUPGRAM_N - 1}, 0))) "
        f"AS t(i)), "
        f"dup AS (SELECT s FROM (SELECT s, count(DISTINCT doc_id) AS c "
        f"FROM sh GROUP BY s) WHERE c >= 2) "
        f"SELECT d.doc_id, count(sh.s)::BIGINT AS n_grams, "
        f"count(dup.s)::BIGINT AS n_dup, "
        f"CASE WHEN count(sh.s) = 0 THEN 0.0 "
        f"ELSE round(count(dup.s)::DOUBLE / count(sh.s), 6) END AS dup_frac "
        f"FROM documents d LEFT JOIN sh ON sh.doc_id = d.doc_id "
        f"LEFT JOIN dup ON dup.s = sh.s GROUP BY d.doc_id",
    "remove_dup_ngrams":
        f"WITH toks AS (SELECT doc_id, "
        f"regexp_extract_all(lower(text), '[0-9a-z_]+') AS ws FROM documents), "
        f"sh AS (SELECT doc_id, i - 1 AS s0, "
        f"array_to_string(ws[i:i+{DUPGRAM_N - 1}], ' ') AS s "
        f"FROM toks, UNNEST(generate_series(1, greatest(len(ws)-{DUPGRAM_N - 1}, 0))) "
        f"AS t(i)), "
        f"dup AS (SELECT s FROM (SELECT s, count(DISTINCT doc_id) AS c "
        f"FROM sh GROUP BY s) WHERE c >= 2), "
        f"dsh AS (SELECT DISTINCT doc_id, s0 FROM sh "
        f"WHERE s IN (SELECT s FROM dup)), "
        f"words AS (SELECT doc_id, i - 1 AS pos, ws[i] AS w "
        f"FROM toks, UNNEST(generate_series(1, len(ws))) AS t(i)), "
        f"cov AS (SELECT DISTINCT w.doc_id, w.pos FROM words w "
        f"JOIN dsh ON dsh.doc_id = w.doc_id "
        f"AND w.pos BETWEEN dsh.s0 AND dsh.s0 + {DUPGRAM_N - 1}), "
        f"kept AS (SELECT w.doc_id, "
        f"string_agg(w.w, ' ' ORDER BY w.pos) AS ct FROM words w "
        f"LEFT JOIN cov ON cov.doc_id = w.doc_id AND cov.pos = w.pos "
        f"WHERE cov.pos IS NULL GROUP BY w.doc_id), "
        f"nrem AS (SELECT doc_id, count(*)::BIGINT AS nr FROM cov "
        f"GROUP BY doc_id) "
        f"SELECT t.doc_id, coalesce(k.ct, '') AS clean_text, "
        f"len(t.ws)::BIGINT AS n_words, "
        f"coalesce(nrem.nr, 0)::BIGINT AS n_removed "
        f"FROM toks t LEFT JOIN kept k USING (doc_id) "
        f"LEFT JOIN nrem USING (doc_id)",
    "dedup_segments":
        f"WITH toks AS (SELECT doc_id, "
        f"regexp_extract_all(lower(text), '[0-9a-z_]+') AS ws FROM documents), "
        f"segs AS (SELECT doc_id, i AS seg, "
        f"array_to_string(ws[i*{SEGDEDUP_W}+1 : i*{SEGDEDUP_W}+{SEGDEDUP_W}], ' ') AS s "
        f"FROM toks, UNNEST(generate_series(0, "
        f"CAST(ceil(len(ws)/{SEGDEDUP_W}.0) AS BIGINT) - 1)) AS t(i)), "
        f"keep AS (SELECT doc_id, seg, s FROM segs "
        f"QUALIFY row_number() OVER (PARTITION BY s "
        f"ORDER BY doc_id, seg) = 1), "
        f"agg AS (SELECT doc_id, string_agg(s, ' ' ORDER BY seg) AS ct, "
        f"count(*)::BIGINT AS nk FROM keep GROUP BY doc_id), "
        f"cnt AS (SELECT doc_id, count(*)::BIGINT AS ns FROM segs "
        f"GROUP BY doc_id) "
        f"SELECT t.doc_id, coalesce(a.ct, '') AS clean_text, "
        f"coalesce(c.ns, 0)::BIGINT AS n_segs, "
        f"(coalesce(c.ns, 0) - coalesce(a.nk, 0))::BIGINT AS n_removed "
        f"FROM toks t LEFT JOIN agg a USING (doc_id) "
        f"LEFT JOIN cnt c USING (doc_id)",
    "pmi_pairs":
        f"WITH toks AS (SELECT doc_id, i - 1 AS pos, ws[i] AS w FROM "
        f"(SELECT doc_id, regexp_extract_all(lower(text), '[0-9a-z_]+') AS ws "
        f"FROM documents), UNNEST(generate_series(1, len(ws))) AS t(i)), "
        f"pairs AS (SELECT a.w AS x, b.w AS y, count(*)::BIGINT AS n "
        f"FROM toks a JOIN toks b ON a.doc_id = b.doc_id "
        f"AND b.pos - a.pos BETWEEN 1 AND {PMI_WINDOW} GROUP BY a.w, b.w), "
        f"uni AS (SELECT w, count(*)::DOUBLE AS c FROM toks GROUP BY w), "
        f"nt AS (SELECT count(*)::DOUBLE AS nn FROM toks), "
        f"tt AS (SELECT sum(n)::DOUBLE AS t FROM pairs) "
        f"SELECT x, y, n, "
        f"round(ln((n / tt.t) * (nt.nn * nt.nn) / (cx.c * cy.c)), 6) AS pmi "
        f"FROM pairs CROSS JOIN nt CROSS JOIN tt "
        f"JOIN uni cx ON cx.w = pairs.x JOIN uni cy ON cy.w = pairs.y "
        f"WHERE n >= {PMI_MINC}",
    "dsir_logweights":
        f"WITH toksl AS (SELECT doc_id, lang, "
        f"regexp_extract_all(lower(text), '[0-9a-z_]+') AS ws FROM documents), "
        f"feats AS (SELECT doc_id, lang, "
        f"md5_number_lower(ws[i]) % {DSIR_B} AS b "
        f"FROM toksl, UNNEST(generate_series(1, len(ws))) AS t(i) "
        f"UNION ALL SELECT doc_id, lang, "
        f"md5_number_lower(ws[i] || ' ' || ws[i+1]) % {DSIR_B} AS b "
        f"FROM toksl, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)), "
        f"tgt AS (SELECT b, count(*)::DOUBLE AS c FROM feats "
        f"WHERE lang = 'en' GROUP BY b), "
        f"rawc AS (SELECT b, count(*)::DOUBLE AS c FROM feats GROUP BY b), "
        f"tot AS (SELECT "
        f"(SELECT count(*) FROM feats WHERE lang = 'en')::DOUBLE AS tt, "
        f"(SELECT count(*) FROM feats)::DOUBLE AS tr) "
        f"SELECT f.doc_id, count(*)::BIGINT AS n_feats, "
        f"round(avg(ln(((coalesce(tg.c, 0) + 1) * (tot.tr + {DSIR_B})) / "
        f"((coalesce(rw.c, 0) + 1) * (tot.tt + {DSIR_B})))), 6) AS logw "
        f"FROM feats f LEFT JOIN tgt tg USING (b) "
        f"LEFT JOIN rawc rw USING (b) CROSS JOIN tot "
        f"GROUP BY f.doc_id",
    "winnow_fingerprints":
        f"WITH hs AS (SELECT doc_id, i - 1 AS pos, "
        f"md5_number_lower(substr(lower(coalesce(text, '')), i, {WINNOW_K})) "
        f"AS h FROM documents, UNNEST(generate_series(1, "
        f"greatest(length(coalesce(text, '')) - {WINNOW_K - 1}, 0))) "
        f"AS t(i)), "
        f"ng AS (SELECT doc_id, count(*) AS n FROM hs GROUP BY doc_id), "
        f"wins AS (SELECT doc_id, g.s - 1 AS s, least({WINNOW_W}, n) AS "
        f"width FROM ng, UNNEST(generate_series(1, "
        f"n - least({WINNOW_W}, n) + 1)) AS g(s)), "
        f"memb AS (SELECT w.doc_id, w.s, h.pos, h.h FROM wins w "
        f"JOIN hs h ON h.doc_id = w.doc_id "
        f"AND h.pos BETWEEN w.s AND w.s + w.width - 1), "
        f"sel AS (SELECT doc_id, s, pos, h FROM memb "
        f"QUALIFY row_number() OVER (PARTITION BY doc_id, s "
        f"ORDER BY h ASC, pos DESC) = 1) "
        f"SELECT DISTINCT doc_id, pos::BIGINT AS pos, h::UBIGINT AS fp "
        f"FROM sel",
    "normalize_text":
        "SELECT doc_id, regexp_replace(trim(lower(text), "
        "' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), "
        "'\\s+', ' ', 'g') AS text_norm FROM documents",
    "topk_per_segment":
        "SELECT c_mktsegment, o_orderkey, o_totalprice FROM orders "
        "JOIN customer ON o_custkey = c_custkey "
        "QUALIFY row_number() OVER (PARTITION BY c_mktsegment "
        "ORDER BY o_totalprice DESC, o_orderkey) <= 2",
    "union_filters":
        "SELECT event_id, value FROM events WHERE value >= 0.9 "
        "UNION ALL SELECT event_id, value FROM events WHERE value <= 0.1",
    "hash_sample":
        "SELECT doc_id, lang FROM documents WHERE doc_id % 20 = 0",
    "sample_k":
        "SELECT doc_id, source FROM documents "
        "ORDER BY md5_number_lower(doc_id::VARCHAR), doc_id LIMIT 100",
    "stratified_sample":
        "SELECT doc_id, lang FROM documents QUALIFY row_number() OVER ("
        "PARTITION BY lang "
        "ORDER BY md5_number_lower(doc_id::VARCHAR), doc_id) <= 40",
    "quantile_filter":
        "SELECT doc_id, lang, n_chars FROM ("
        "SELECT doc_id, lang, n_chars, "
        "quantile_disc(n_chars, 0.25) OVER (PARTITION BY lang) AS qq "
        "FROM documents) WHERE n_chars >= qq",
    "bm25":
        "WITH toks AS (SELECT doc_id, "
        "unnest(regexp_extract_all(lower(text), '[0-9a-z_]+')) AS w "
        "FROM documents), "
        "dl AS (SELECT doc_id, count(*) AS len FROM toks GROUP BY doc_id), "
        "dl2 AS (SELECT d.doc_id, coalesce(dl.len, 0)::DOUBLE AS len "
        "FROM documents d LEFT JOIN dl USING (doc_id)), "
        "st AS (SELECT avg(len) AS avgdl, count(*)::DOUBLE AS n FROM dl2), "
        "df AS (SELECT w, count(DISTINCT doc_id)::DOUBLE AS df FROM toks "
        "WHERE w IN ('filter', 'hash', 'join') GROUP BY w), "
        "tf AS (SELECT doc_id, w, count(*)::DOUBLE AS tf FROM toks "
        "WHERE w IN ('filter', 'hash', 'join') GROUP BY doc_id, w), "
        "sc AS (SELECT tf.doc_id, sum("
        "ln((st.n - df.df + 0.5) / (df.df + 0.5) + 1.0) * "
        "(tf.tf * (1.2 + 1.0)) / "
        "(tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl2.len / st.avgdl))) AS s "
        "FROM tf JOIN df USING (w) JOIN dl2 USING (doc_id), st "
        "GROUP BY tf.doc_id) "
        "SELECT d.doc_id, round(coalesce(sc.s, 0.0), 6) AS bm25 "
        "FROM documents d LEFT JOIN sc USING (doc_id)",
    "dedup_exact":
        "SELECT doc_id FROM documents "
        "QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1",
    "token_counts":
        "SELECT doc_id, (CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)) = '' THEN 0 ELSE "
        "len(regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '\\s+')) END)::BIGINT AS n_tokens "
        "FROM documents",
    "text_stats":
        "SELECT doc_id, length(text)::BIGINT AS n_chars, "
        "(length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g')))::BIGINT AS n_punct, "
        "CASE WHEN length(text) > 0 THEN "
        "(length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g')))::DOUBLE "
        "/ length(text) ELSE 0.0 END AS punct_ratio "
        "FROM documents",
    "ann_topk":
        f"WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings "
        f"ORDER BY vec_id LIMIT {N_ANN_QUERIES}) "
        f"SELECT query_id, vec_id FROM q CROSS JOIN embeddings "
        f"QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY "
        f"list_cosine_similarity(qv::DOUBLE[], embedding::DOUBLE[]) DESC, vec_id) "
        f"<= {ANN_K}",
    "near_dup_embeddings":
        f"SELECT a.vec_id AS id_a, b.vec_id AS id_b "
        f"FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
        f"WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) "
        f">= {NEAR_DUP_TAU}",
    "near_dup_lsh":
        f"SELECT a.vec_id AS id_a, b.vec_id AS id_b "
        f"FROM read_parquet('{_PLANTED_PATH}') a "
        f"JOIN read_parquet('{_PLANTED_PATH}') b ON a.vec_id < b.vec_id "
        f"WHERE list_cosine_similarity(a.embedding, b.embedding) "
        f">= {PLANTED_TAU}",
    "lang_id": _LANG_ID_SQL,
    "hll_distinct_md5": _HLL_MD5_SQL,
    "cms_freq": _CMS_SQL,
    "priority_sample": _PRIORITY_SAMPLE_SQL,
    "fuzzy_name_pairs": _FUZZY_PAIRS_SQL,
    "inverted_index": _INV_INDEX_SQL,
    "cohort_retention": _COHORT_SQL,
    "ols_by_flag": _OLS_SQL,
    "quantize_embeddings": _QUANT_SQL,
    "transition_counts": _TRANSITION_SQL,
    "bigram_lm": _BIGRAM_SQL,
    "geo_near_pairs": _GEO_SQL,
    "winsorize_events": _WINSORIZE_SQL,
    "mad_outliers": _MAD_SQL,
    "percent_rank_events": _PRANK_SQL,
    "sssp_weighted": _sssp_oracle_sql(),
    "skyline_parts": _SKYLINE_SQL,
    "revenue_by_nation": _REVENUE_SQL,
    "kcore_nodes": _kcore_oracle_sql(),
    "welch_ttest": _WELCH_SQL,
    "attr_last_touch": _ATTR_SQL,
    "hash_walks": _hash_walks_oracle_sql(),
    "l2_normalize": _L2NORM_SQL,
    "checksum_events": _CHECKSUM_SQL,
    "session_stats": _SESSION_STATS_SQL,
    "unpivot_lineitem": _UNPIVOT_SQL,
    "interval_union": _INTERVAL_UNION_SQL,
    "partitioned_sink": _PARTITIONED_SINK_SQL,
    "scd2_history": _SCD2_SQL,
    "histogram_events": _HISTOGRAM_SQL,
    "mode_users": _MODE_SQL,
    "weighted_median": _WMEDIAN_SQL,
    "conversion_within": _CONVERSION_SQL,
    "login_streaks": _STREAKS_SQL,
    "impute_median": _IMPUTE_SQL,
    "spearman_by_flag": _SPEARMAN_SQL,
    "sliding_distinct_users": _SLIDING_DISTINCT_SQL,
    "gini_by_flag": _GINI_SQL,
    "hhi_events": _HHI_SQL,
    "ks_click_view": _KS_SQL,
    "chi2_events": _CHI2_SQL,
    "kendall_events": _KENDALL_SQL,
    "auc_click_view": _AUC_SQL,
    "twap_users": _TWAP_SQL,
    "target_encode_brand": _TARGET_ENC_SQL,
    "clustering_coeff": _clustering_oracle_sql(),
    "link_prediction": _link_prediction_oracle_sql(),
    "ewma_users": _EWMA_SQL,
    "percentile_cont_events": _percentile_cont_oracle_sql(),
    "regex_extract_docs": _REGEX_EXTRACT_SQL,
    "basket_pairs": _BASKET_SQL,
    "incremental_stats": _INCR_STATS_SQL,
    "dbscan_customers": _DBSCAN_SQL,
    "resample_linear": _RESAMPLE_LINEAR_SQL,
    "rolling_median_events": _ROLLING_MEDIAN_SQL,
    "corr_matrix_lineitem": _corr_matrix_oracle_sql(),
    "rfm_scores": _RFM_SQL,
    "user_paths": _USER_PATHS_SQL,
    "audience_overlap": _AUDIENCE_SQL,
    "hourly_profile": _HOURLY_SQL,
    "daily_pct_change": _DAILY_PCT_SQL,
    "knn_accuracy": _KNN_SQL,
    "label_propagation": _label_prop_oracle_sql(),
    "autocorr_users": _AUTOCORR_SQL,
    "snapshot_diff": _SNAPSHOT_DIFF_SQL,
    "degree_assortativity": _ASSORT_SQL,
    "window_funnel": _WINDOW_FUNNEL_SQL,
    "max_concurrency": _MAX_CONC_SQL,
    "resample_ffill": _RESAMPLE_SQL,
    "profile_events": _PROFILE_SQL,
    "merge_upsert": _UPSERT_SQL,
    "pack_docs_global": _PACK_GLOBAL_SQL,
    "bpe_vocab": _BPE_SQL,
    "bpe_encode": _BPE_ENCODE_SQL,
    "doc_quality": _DOC_QUALITY_SQL,
    "simhash_md5": _SIMHASH_MD5_SQL,
    "simhash_pairs_md5": _SIMHASH_PAIRS_MD5_SQL,
    "fingerprints_md5": _FINGERPRINTS_MD5_SQL,
    "crawl_extraction_stats":
        "SELECT extraction_method, count(*)::BIGINT AS n "
        f"FROM read_parquet('{_CRAWL_LOCS_DIR}/*.parquet') "
        "GROUP BY extraction_method",
    "crawl_quality_report":
        'SELECT count(*)::BIGINT AS "totalLocations", '
        'sum(CASE WHEN quality_score >= 90 THEN 1 ELSE 0 END)::BIGINT '
        'AS excellent, '
        'sum(CASE WHEN quality_score >= 70 AND quality_score < 90 '
        'THEN 1 ELSE 0 END)::BIGINT AS good, '
        'sum(CASE WHEN quality_score >= 50 AND quality_score < 70 '
        'THEN 1 ELSE 0 END)::BIGINT AS fair, '
        'sum(CASE WHEN quality_score < 50 THEN 1 ELSE 0 END)::BIGINT '
        'AS poor, '
        'CASE WHEN count(*) = 0 THEN 0.0 ELSE '
        'sum(quality_score)::DOUBLE / count(*) END AS "averageScore" '
        f"FROM read_parquet('{_CRAWL_LOCS_DIR}/*.parquet')",
    "jaccard_pairs": _JACCARD_PAIRS_SQL,
    "minhash_dedup": _MINHASH_DEDUP_SQL,
    "training_pipeline": _TRAINING_PIPELINE_SQL,
    "ohlc_bars": _OHLC_SQL,
    "cusum_users": _CUSUM_SQL,
    "kmv_distinct": _KMV_SQL,
    "late_data_stats": _LATE_SQL,
    "sequence_match": _SEQ_MATCH_SQL,
    "zorder_orders": _ZORDER_SQL,
    "mis_nodes": _mis_oracle_sql(),
    "closeness_sampled": _CLOSENESS_SQL,
    "rake_keywords": _RAKE_SQL,
    "apriori_triples": _APRIORI_SQL,
    "kmv_set_ops": _KMV_SET_SQL,
    "dag_layers": _DAG_LAYERS_SQL,
    "stream_window_join": _STREAM_JOIN_SQL,
    "window_dedup": _WINDOW_DEDUP_SQL,
    "holt_users": _HOLT_SQL,
    "abtest_lift": _ABTEST_SQL,
    "share_of_total": _SHARE_SQL,
    "isotonic_hourly": _ISOTONIC_SQL,
    "freq_cap": _FREQ_CAP_SQL,
    "ktruss_edges": _ktruss_oracle_sql(),
    "next_event_accuracy": _NEXT_ACC_SQL,
    "item_item_cosine": _ITEM_COS_SQL,
    "snm_pairs": _SNM_SQL,
    "anova_events": _ANOVA_SQL,
    "cramers_v_events": _CRAMERS_SQL,
    "reciprocity_edges": _RECIP_SQL,
    "dict_match_docs": _DICT_SQL,
    "hierarchy_rollup": _HIER_SQL,
    "feature_hash_docs": _FEATHASH_SQL,
    "random_projection": _RANDPROJ_SQL,
    "bollinger_users": _BOLL_SQL,
    "cdc_snapshot": _CDC_SQL,
    "scc_components": _SCC_SQL,
    "sax_users": _SAX_SQL,
    "kcenter_coreset": _kcenter_oracle_sql(8),
    "seasonal_events": _SEASONAL_SQL,
    "square_counts": _SQUARES_SQL,
    "bipartite_orders": _BIPARTITE_SQL,
    "gram_matrix": _GRAM_SQL,
    "tree_score_events": _TREESCORE_SQL,
    "betweenness_landmarks": _betweenness_oracle_sql(4),
    "temporal_reach": _TEMPORAL_SQL,
    "knn_dist_outliers": _KNN_DIST_SQL,
    "consistent_hash": _CONSHASH_SQL,
    "lof_outliers": _LOF_SQL,
    "cuped_users": _CUPED_SQL,
    "kaplan_meier": _KM_SQL,
    "did_events": _DID_SQL,
    "partition_skew": _PSKEW_SQL,
    "diameter_sweep": _DIAM_SQL,
    "bitmap_index": _BITMAP_SQL,
    "benford_orders": _BENFORD_SQL,
    "katz_centrality": _KATZ_SQL,
    "golden_record": _GOLDEN_SQL,
    "shapley_channels": _SHAPLEY_SQL,
    "ransac_orders": _RANSAC_SQL,
    "viterbi_users": _VITERBI_SQL,
    "mst_forest": _MST_SQL,
    "wkt_polygon_area": _WKT_SQL,
    "point_in_polygon": _PIP_SQL,
    "bandit_replay": _bandit_oracle_sql(),
    "runs_test_users": _RUNS_SQL,
    "tukey_lineitem": _TUKEY_SQL,
    "mcnemar_events": _MCNEMAR_SQL,
    "sign_test_users": _SIGNTEST_SQL,
}

# composed after the literal: the RRF oracle embeds ORACLES["bm25"]
ORACLES["rrf_fusion"] = _rrf_oracle_sql()
