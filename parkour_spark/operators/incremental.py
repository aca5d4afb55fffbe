"""Incremental aggregate maintenance: keep a grouped rollup current by
merging PARTIAL STATES from new data instead of rescanning history.

The 100 TB pattern this serves: a petabyte event corpus with a daily
(or hourly) rollup consumer. Recomputing `groupBy(hour).agg(...)` over
all history per batch is O(corpus); maintaining a state table of
algebraic aggregates — (count, sum, min, max) per group — makes each
refresh O(batch): sketch the batch, union with the state table, and
re-reduce. Finalization (avg = sum/count, etc.) is a pure projection
over the state, done at read time.

This is exactly Spark's own partial-aggregation contract (map-side
combine → final merge) lifted to STORAGE: the state table IS a
persisted partial aggregate, and `merge_states` is the final-merge
step, so any aggregate that rides a combiner (algebraic aggregates in
the Gray et al. cube taxonomy) can be maintained this way. Holistic
aggregates (exact median, distinct) need sketches instead — see
operators/sketch.py (HLL registers merge by max and slot into the same
state-table shape).

The state columns use integer micro-units for double measures (per-row
round BEFORE the sum) so merged states are bit-identical regardless of
merge order or batch boundaries — the property the correctness query
pins: state(history) ⊕ state(batch) ≡ state(full recompute).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def agg_state(
    df: DataFrame,
    keys: list[str | Column],
    value_col: str,
    micro: int = 1_000_000,
) -> DataFrame:
    """Partial-aggregate state of `value_col` per group: (keys..., cnt,
    sum_micro, min_micro, max_micro). Doubles enter as integer
    micro-units so every later merge is exact integer arithmetic."""
    v = F.round(F.col(value_col) * micro).cast("long")
    return df.groupBy(*keys).agg(
        F.count("*").alias("cnt"),
        F.sum(v).alias("sum_micro"),
        F.min(v).alias("min_micro"),
        F.max(v).alias("max_micro"),
    )


def merge_states(a: DataFrame, b: DataFrame, keys: list[str]) -> DataFrame:
    """Combine two state tables (the final-merge step): groups present
    in either side survive; shared groups re-reduce associatively.
    Cost is O(|a| + |b|) state rows — never the underlying data."""
    return (
        a.unionByName(b)
        .groupBy(*keys)
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("sum_micro").alias("sum_micro"),
            F.min("min_micro").alias("min_micro"),
            F.max("max_micro").alias("max_micro"),
        )
    )


def finalize(state: DataFrame, micro: int = 1_000_000) -> DataFrame:
    """Reader-facing projection over the state: exact count, sum and
    min/max back in units, avg derived from the exact integers (one
    double division — identical in any engine)."""
    return state.select(
        *[c for c in state.columns
          if c not in ("cnt", "sum_micro", "min_micro", "max_micro")],
        F.col("cnt").alias("n"),
        F.round(F.col("sum_micro") / micro, 4).alias("total"),
        F.round(F.col("sum_micro") / F.col("cnt") / micro, 6).alias("avg"),
        F.round(F.col("min_micro") / micro, 4).alias("vmin"),
        F.round(F.col("max_micro") / micro, 4).alias("vmax"),
    )
