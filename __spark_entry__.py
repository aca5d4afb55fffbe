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
#   r2 window = operator-family flagships + the LLM-pipeline family;
#   r3 window (below) = the 32 entries that had no r02 driver row,
#     plus every query whose code changed or gained an oracle this
#     round, plus the round's new operators — the r2-verified,
#     untouched remainder registers after the window.
# Out-of-window entries are still verified every round by the local
# gate replica (scripts/check_oracle.py, run over ALL entries).
_R3_WINDOW = [
    # flagships
    "q1_pricing_summary", "word_count",
    # no r02 driver row (rotated back in)
    "distinct_tokens",
    "shape_keys", "shape_vals", "shape_keygroups", "shape_valgroups",
    "shape_keykeyvalgroups", "shape_keykeygroups", "shape_keysgroups",
    "shape_keyvalgroups",
    "ordered_positive_custkeys", "parts_never_bulk_ordered",
    "events_hourly", "rollup_returnflag_status", "top_customers",
    "customers_without_urgent_orders", "active_automobile_customers",
    "q5_local_supplier_revenue", "region_customer_counts",
    "price_quantiles_by_segment", "q3_shipping_priority",
    "cube_priority_status", "grouping_sets_priority_status",
    "events_user_counts", "orders_per_quarter", "time_bucket_rollup",
    "sql_correlated_subquery", "orders_above_customer_avg",
    "approx_user_counts", "order_price_ranks", "running_user_total",
    "streaming_sliding_30m", "streaming_enriched_counts",
    # code changed this round (NTZ epoch/watermark path, single-pass
    # tfidf/pmi, arrow-default IVF, native-type CC)
    "asof_purchase_view", "tfidf_top_terms", "pmi_collocations",
    "ivf_topk_cosine", "ivf_topk_cosine_column", "dedup_groups",
    "streaming_events_hourly", "streaming_session_30m", "streaming_dedup",
    # gained an oracle this round
    "approx_price_quantiles", "streaming_stateful_user_counts",
    "multimodal_features", "kmeans_centroids",
    # new this round
    "dedup_groups_bigstar", "ivf_kmeans_topk", "streaming_stream_join",
]


def _ordered(d: dict) -> dict:
    front = [n for n in _R3_WINDOW if n in d]
    return {n: d[n] for n in front} | {n: d[n] for n in d if n not in front}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(ORACLES))
