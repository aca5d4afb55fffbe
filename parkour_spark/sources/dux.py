"""Demultiplexed (multi-)outputs — the dsink/dux family (SURVEY §2.4).

| reference | here |
|---|---|
| `dux/dsink` named outputs (io/dux.clj:54-62) | `write_named` — N writes off one cached intermediate |
| `dux/prefix-*` data-derived routing (io/dux.clj:180-228) | `write_prefixed` — EXACT `{prefix}-m-NNNNN` file naming (partitionBy pass + driver-side FS rename); `write_partitioned` keeps directory-per-value semantics for object stores |
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
from urllib.parse import unquote

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


def write_prefixed(
    df: DataFrame,
    sink: Dataset,
    prefix_col: str,
    marker: str = "m",
) -> Dataset:
    """EXACT dux/prefix-* file naming (io/dux.clj:180-228, test
    dux_test.clj:39-45): every output file is named
    `{prefix}-{marker}-{NNNNN}` directly under the sink path, where the
    prefix is DATA-DERIVED per record — the reference's first-letter
    test expects exactly {a,b,c}-m-00000.

    Plan: one `partitionBy(prefix_col)` pass routes rows (each task
    writes its prefixes' files — the same single-pass shape the
    reference gets from per-sink record writers), then a DRIVER-SIDE
    Hadoop FS rename flattens `prefix=<v>/part-*` into
    `<v>-{marker}-<seq>`. Renames are metadata ops: O(#files), zero
    data movement on HDFS/local (object stores pay a copy — keep
    partitionBy directories there, SURVEY §4.3's recommendation, via
    write_partitioned).

    partitionBy drops the prefix column from file CONTENTS — matching
    the reference, where the prefix exists only in the file name.
    Returns the re-reading Dataset over the flattened files."""
    import re

    from parkour_spark import fs as pfs

    if sink.path is None:
        raise ValueError("write_prefixed requires a path-backed Dataset")
    spark = df.sparkSession
    sink.write(df, partition_by=[prefix_col])
    root = sink.path.rstrip("/")
    for d in sorted(pfs.glob_paths(spark, f"{root}/{prefix_col}=*")):
        raw = re.search(r"=([^/]*)$", d).group(1)
        # Hive escapes partition-dir values (space, '/', '=', ... -> %XX)
        # and writes NULL prefixes as a sentinel; file names must carry
        # the DATA value. NULL prefixes are rejected loudly rather than
        # silently producing a sentinel-named file.
        if raw == "__HIVE_DEFAULT_PARTITION__":
            raise ValueError(
                f"write_prefixed: NULL value in prefix column "
                f"'{prefix_col}' — prefixes must be non-null "
                f"(filter or fillna before writing)"
            )
        val = unquote(raw)
        if "/" in val:
            raise ValueError(
                f"write_prefixed: prefix value {val!r} contains '/' — "
                f"cannot be used in a flat file name"
            )
        parts = sorted(
            p
            for p in pfs.glob_paths(spark, f"{d}/*")
            if not p.rsplit("/", 1)[-1].startswith(("_", "."))
        )
        for i, p in enumerate(parts):
            pfs.rename(spark, p, f"{root}/{val}-{marker}-{i:05d}")
        pfs.delete(spark, d)
    return Dataset(
        spark,
        path=f"{root}/*-{marker}-*",
        fmt=sink.fmt,
        options=dict(sink.options),
    )


def transient_sink(spark, fmt: str = "parquet") -> Dataset:
    """Auto-cleaned temp output location (transient-path,
    io/transient.clj:22-37). Spark lineage makes most intermediates
    unnecessary; this exists for explicit materialization barriers."""
    return Dataset(spark, path=tempfile.mkdtemp(prefix="parkour_spark_"), fmt=fmt)
