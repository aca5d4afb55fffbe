"""Demultiplexed (multi-)outputs — the dsink/dux family (SURVEY §2.4).

| reference | here |
|---|---|
| `dux/dsink` named outputs (io/dux.clj:54-62) | `write_named` — N writes off one cached intermediate |
| `dux/prefix-*` data-derived routing (io/dux.clj:180-228) | `write_partitioned` — `partitionBy(route_col)`: directory-per-value routing (SURVEY §4.3 recommends accepting partitionBy semantics over exact file prefixes) |
| `dsink` read-back (io/dsink.clj:14-44) | every writer returns the re-reading Dataset |
| `transient-path` (io/transient.clj:22-37) | `transient_sink` — temp dir, caller-scoped |

SCALE: `write_partitioned` is one pass (each task writes its partition
values' files); `write_named` caches the routed intermediate once and
runs N column-pruned writes — prefer `write_partitioned` when outputs
share a schema, `write_named` when per-output schemas/formats differ
(the reference's sub-configuration case).
"""

from __future__ import annotations

import tempfile
from typing import Callable

from pyspark.sql import DataFrame

from parkour_spark.dataset import Dataset


def write_named(
    df: DataFrame,
    outputs: dict[str, tuple[Callable[[DataFrame], DataFrame], Dataset]],
    cache: bool = True,
) -> dict[str, Dataset]:
    """Named demultiplex: route one dataset to several sinks, each with
    its own projection/filter and sink config (dux named outputs,
    io/dux.clj:54-62; graph_test.clj:170-183 even/odd routing).

    `outputs`: name → (route_fn, sink). The source is cached so the N
    writes scan it once."""
    src = df.persist() if cache else df
    results = {}
    for name, (route_fn, sink) in outputs.items():
        results[name] = sink.write(route_fn(src))
    if cache:
        src.unpersist()
    return results


def write_partitioned(df: DataFrame, sink: Dataset, route_cols: list[str]) -> Dataset:
    """Single-pass data-derived routing (dux/prefix-* analog): output
    files land under one directory per route-column value."""
    return sink.write(df, partition_by=route_cols)


def transient_sink(spark, fmt: str = "parquet") -> Dataset:
    """Auto-cleaned temp output location (transient-path,
    io/transient.clj:22-37). Spark lineage makes most intermediates
    unnecessary; this exists for explicit materialization barriers."""
    return Dataset(spark, path=tempfile.mkdtemp(prefix="parkour_spark_"), fmt=fmt)
