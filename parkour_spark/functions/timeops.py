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


def time_bucket(ts: Column | str, width_seconds: int) -> Column:
    """Floor a timestamp to an arbitrary-width bucket (microsecond
    arithmetic — exact for any integer width, unlike date_trunc's fixed
    grains). JVM integer math, codegen'd, usable as a grouping or
    partitioning expression."""
    c = F.col(ts) if isinstance(ts, str) else ts
    w_us = int(width_seconds) * _US
    return F.timestamp_micros(
        (F.floor(F.unix_micros(c) / w_us) * w_us).cast("long")
    )


def time_bucket_start_end(ts: Column | str, width_seconds: int) -> tuple[Column, Column]:
    """(bucket_start, bucket_end) pair for explicit window bounds."""
    c = F.col(ts) if isinstance(ts, str) else ts
    w_us = int(width_seconds) * _US
    start_us = (F.floor(F.unix_micros(c) / w_us) * w_us).cast("long")
    return F.timestamp_micros(start_us), F.timestamp_micros(start_us + F.lit(w_us))
