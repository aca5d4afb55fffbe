"""Bucketed tables: shuffle-free co-located joins and aggregations.

The 100 TB join strategy the brief calls out ("co-locate joins via
bucketing"): write both fact tables bucketed by the join key once, and
every subsequent join/groupBy on that key runs with ZERO Exchange — the
scan partitioning already satisfies the required distribution. This is
the Spark analog of the reference pre-partitioning datasets with a
shared partitioner so a downstream job can consume co-partitioned
inputs.

Bucketed writes go through the session catalog (`saveAsTable`) because
bucket metadata lives in the table catalog, not in the files; reads are
plain `spark.table`. Verified by tests/test_plans.py-style assertions in
tests/test_bucketed.py: the bucketed-join plan contains no
hash-partitioning Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    num_buckets: int = 32,
    sort_cols: list[str] | str | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write `df` as a bucketed (and optionally sorted) catalog table.

    `sort_cols` additionally sorts within each bucket file — a
    bucketed+sorted table gives shuffle-free AND sort-free sort-merge
    joins (the full secondary-sort shuffle shape, paid once at write
    time, amortized over every downstream join)."""
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = df.write.format(fmt).mode(mode).bucketBy(num_buckets, *cols)
    if sort_cols:
        s = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        writer = writer.sortBy(*s)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table with its bucket spec intact (a path-based
    `spark.read.parquet` would discard it)."""
    return spark.table(table)


def cobucket_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed on the join key: no Exchange on either
    side (asserted in tests). Both tables must share bucket count and
    bucket columns = join columns."""
    keys = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), keys, how)
