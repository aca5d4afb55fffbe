"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship query smoke check on sf0.001.
`queries()` — name → (spark, sf_dir) → DataFrame, one per implemented
operator from SURVEY.md §2 (registry: parkour_spark/queries.py).
`oracle_sql()` — matching DuckDB SQL for the correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from parkour_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H-Q1-style pricing summary on sf0.001."""
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


# The driver's correctness gate checks the first 50 registry entries;
# the registry holds more. The window ROTATES each round (r2 verdict
# #1) so every query gets a driver row at most one round old:
#   r3 window = the 32 entries with no r02 driver row + changed/new;
#   r4 window (below) = ALL 36 entries without an r03 driver row, plus
#     the flagships, plus every query whose code or oracle changed this
#     round (auto-banded embedding LSH, hash-sampled k-means init and
#     its unrolled-CTE oracle, tight-watermark stream-stream join,
#     exact-fixpoint CC), plus the r3-changed family to keep it fresh —
#     the demoted remainder is exactly the r3-driver-green untouched
#     set.
# Out-of-window entries are still verified every round by the local
# gate replica (scripts/check_oracle.py, run over ALL entries).
# Entries ADDED AFTER this window was pinned (the late-r4 families in
# NOTES_r4.md §9-17: repetition/PII/line-dedup/semantic-dedup, delta
# ingest, LM scoring, pagerank, TPC-H shapes (both batches), sketches
# incl. HLL, z-order, BPE, validation, triangles, intervals/k-core,
# behavioral analytics, PQ, incremental rollups, mixture resampling,
# semantic decontamination, model scoring, format roundtrip) are NOT
# in this window: every slot is pinned (36 entries whose newest driver
# row is r02 — demoting any would break the ≤1-round-old rotation
# invariant — plus entries whose code changed in r4). All are
# local-gate-verified (targeted check_oracle.py runs green) and take
# window slots in r5.
_R4_WINDOW = [
    # flagships
    "q1_pricing_summary", "word_count",
    # no r03 driver row (rotated back in; verified r02 + local gate)
    "orders_per_priority_pivot", "range_mod_agg", "customer_order_stats",
    "cogroup_order_stats", "top3_orders_per_customer", "shape_keyvals",
    "secondary_sort_orders", "matrixify", "union_tagged_names",
    "user_sessions", "range_join_quantity_bands", "json_props_sum",
    "order_gaps", "salted_join_agg", "multimodal_fingerprint",
    "token_stats", "lang_id", "quality_scores", "doc_fingerprints",
    "subword_token_count", "lang_id_ngram", "winnow_fingerprints",
    "dedup_exact", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_capped", "dedup_simhash", "embedding_neardup",
    "embedding_neardup_blocked", "knn_cosine", "corpus_prep",
    "rolling_30d_spend", "merge_upsert_orders", "scd2_customer_orders",
    "unpivot_lineitem_measures", "dataset_split_counts",
    # code or oracle changed this round (r4)
    "kmeans_centroids", "ivf_kmeans_topk", "streaming_stream_join",
    "dedup_groups", "dedup_groups_bigstar",
    # NEW this round (operators/corpus.py) — first driver rows
    "decontaminate_ngram_overlap", "unigram_lm_scores", "bm25_search",
    "doc_chunks", "pack_sequences", "stratified_sample_lang",
    # r3-changed, kept fresh (the rest of that family carries r03 rows
    # — exactly 1 round old at the r4 gate — and rotates back in r5)
    "ivf_topk_cosine",
]


def _ordered(d: dict) -> dict:
    # loud drift check (r3 advice): a rename/typo must fail here, not
    # silently slide an unverified entry into the 50-entry gate window
    missing = set(_R4_WINDOW) - set(d)
    assert not missing, f"window entries not in registry: {sorted(missing)}"
    assert len(_R4_WINDOW) == 50, len(_R4_WINDOW)
    assert len(set(_R4_WINDOW)) == 50, "duplicate window entries"
    front = [n for n in _R4_WINDOW if n in d]
    return {n: d[n] for n in front} | {n: d[n] for n in d if n not in front}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(ORACLES))
