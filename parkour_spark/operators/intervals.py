"""Interval algebra: merge overlapping per-key intervals (coverage
flattening).

The standard shape for span data — audio/video clip extents, session
spans, availability windows, document time ranges: given per-key
intervals, coalesce every overlapping/adjacent run into one covering
interval. The classic sweep is sequential; the distributed form is two
window passes over (key ORDER BY start):

  new_run = start > running_max(end) over preceding rows
  run_id  = running sum of new_run flags
  output  = per (key, run_id): min(start), max(end)

Both windows partition by key — every key's sweep is independent, so
the operator parallelizes across keys with ONE shuffle (the window
partitioning), and a skewed key degrades to a single-task sweep only
for that key (the same bound as any per-key sequential semantics).
Integer second endpoints keep the arithmetic engine-exact.

Reference parity: beyond-reference (no interval ops in the reference;
time handling there stops at record timestamps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def merge_intervals(
    df: DataFrame,
    key: str = "user_id",
    start: str = "start_s",
    end: str = "end_s",
) -> DataFrame:
    """Coalesce overlapping/touching [start, end] intervals per key.
    Returns (key, start_s, end_s, n_merged) — one row per maximal run.
    Endpoints are treated inclusive: [1,5] and [5,9] merge."""
    w_sweep = (
        Window.partitionBy(key)
        .orderBy(F.col(start), F.col(end))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(key)
        .orderBy(F.col(start), F.col(end))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = df.withColumn(
        "__new_run",
        F.when(
            F.col(start) > F.coalesce(F.max(end).over(w_sweep), F.lit(None)),
            1,
        ).otherwise(0),
    ).withColumn("__run", F.sum("__new_run").over(w_run))
    return (
        flagged.groupBy(key, "__run")
        .agg(
            F.min(start).alias(start),
            F.max(end).alias(end),
            F.count("*").alias("n_merged"),
        )
        .drop("__run")
    )


def coverage_stats(merged: DataFrame, key: str = "user_id",
                   start: str = "start_s", end: str = "end_s") -> DataFrame:
    """Per-key coverage summary over merged intervals: disjoint-run
    count and total covered seconds (exact, integer)."""
    return merged.groupBy(key).agg(
        F.count("*").alias("n_runs"),
        F.sum(F.col(end) - F.col(start)).alias("covered_s"),
        F.max(F.col(end) - F.col(start)).alias("longest_s"),
    )


def fill_time_gaps(
    df: DataFrame,
    bucket_col: str,
    keys: list[str],
    agg_cols: dict[str, str],
    step_seconds: int,
) -> DataFrame:
    """Gap-filling over integer-second time buckets (the hypertable
    staple: a rollup with silent hours is a lying chart, and downstream
    window math — moving averages, deltas — needs a dense spine): for
    every key, generate the full bucket spine from the GLOBAL min to
    max bucket and left-join the data onto it; missing buckets fill
    with zero (counts/sums — the correct identity for additive
    aggregates; carry-forward is a one-window variant).

    Scale shape: the spine is keys × buckets rows, generated from a
    broadcast 1-row (min, max) aggregate via sequence/explode — never a
    driver loop — and the join key is (key, bucket), the same key the
    rollup is already partitioned by."""
    bounds = df.agg(
        F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi")
    )
    key_df = df.select(*keys).distinct()
    spine = (
        key_df.crossJoin(F.broadcast(bounds))
        .select(
            *keys,
            F.explode(
                F.sequence(F.col("__lo"), F.col("__hi"), F.lit(step_seconds))
            ).alias(bucket_col),
        )
    )
    out = spine.join(df, [*keys, bucket_col], "left")
    return out.select(
        *keys,
        bucket_col,
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in agg_cols],
    )
