"""Time-series functions: arbitrary-width time bucketing (hypertable-
style rollups) over timestamp columns.

Beyond-reference surface — the reference is batch MapReduce with no time
semantics; these are the batch analogs of the streaming windows in
`parkour_spark.streaming` and compose with plain groupBy: a hypertable
rollup is `df.groupBy(time_bucket(...), dims...).agg(...)` — one shuffle,
partial aggregation map-side, prunable when the table is written
partitioned by a coarser bucket of the same epoch arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_US = 1_000_000


def epoch_micros(ts: Column | str) -> Column:
    """Microseconds since the epoch for EITHER timestamp type.

    `unix_micros` only accepts TIMESTAMP (LTZ), but parquet written
    without timezone metadata (e.g. the driver-generated testdata) reads
    as TIMESTAMP_NTZ under Spark 4's default
    `spark.sql.parquet.inferTimestampNTZ.enabled`. `timestamp_diff`
    from an NTZ epoch coerces both types and, with the session timezone
    pinned to UTC (session.py), is value-identical to `unix_micros` on
    LTZ and to DuckDB's `epoch_us` on naive parquet data."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.timestamp_diff(
        "MICROSECOND", F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"), c
    )


def time_bucket(ts: Column | str, width_seconds: int) -> Column:
    """Floor a timestamp to an arbitrary-width bucket (microsecond
    arithmetic — exact for any integer width, unlike date_trunc's fixed
    grains). JVM integer math, codegen'd, usable as a grouping or
    partitioning expression."""
    c = F.col(ts) if isinstance(ts, str) else ts
    w_us = int(width_seconds) * _US
    return F.timestamp_micros(
        (F.floor(epoch_micros(c) / w_us) * w_us).cast("long")
    )


def time_bucket_start_end(ts: Column | str, width_seconds: int) -> tuple[Column, Column]:
    """(bucket_start, bucket_end) pair for explicit window bounds."""
    c = F.col(ts) if isinstance(ts, str) else ts
    w_us = int(width_seconds) * _US
    start_us = (F.floor(epoch_micros(c) / w_us) * w_us).cast("long")
    return F.timestamp_micros(start_us), F.timestamp_micros(start_us + F.lit(w_us))
