"""Sources — the dseq family (SURVEY §2.4) re-expressed as Spark readers.

| reference | here |
|---|---|
| `text/dseq` (io/text.clj:11-20)   | `text_dseq` — (offset, line) tuples |
| `nline/dseq` (io/nline.clj:8-19)  | `text_dseq(..., min_partitions=)` |
| `mem/dseq` (io/mem.clj:39-53)     | `mem_dseq` |
| `range/dseq` (io/range.clj:28-42) | `range_dseq` (nper → numPartitions) |
| `sample/dseq` (io/sample.clj:14-32) | `sample_dseq` (seeded) |
| `dval/dseq` (io/dval.clj:198-210) | `mem_dseq(value, nper=)` |
| `seqf`/`avro` dseqs               | `read_any` — format-parametric reader; parquet is the native interchange |
| `mux/dseq` (io/mux.clj:54-61)     | `mux_dseq` — heterogeneous multi-format union |

All return DataFrames so downstream stays in Catalyst.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from parkour_spark.operators.setops import union_all, union_tagged


def text_dseq(spark: SparkSession, path: str, min_partitions: int | None = None) -> DataFrame:
    """Line-oriented text as (offset, line) — the reference's text/dseq
    yields (byte-offset, line); we expose a per-file line index via a
    zipped RDD only when offsets are requested; default is the cheap
    `value`-only DataFrame (reference default shape is `:vals`,
    io/text.clj:11-20)."""
    df = spark.read.text(path)
    if min_partitions and df.rdd.getNumPartitions() < min_partitions:
        # nline/dseq analog: control task granularity (io/nline.clj:8-19)
        df = df.repartition(min_partitions)
    return df


def text_dseq_with_offsets(spark: SparkSession, path: str) -> DataFrame:
    """(offset, line) tuples like TextInputFormat, with TRUE byte
    offsets via the parkour_text Python DataSource (sources/textfmt.py
    — full TextInputFormat split-ownership semantics). Falls back to a
    line-index stand-in only where the DataSource API is unavailable."""
    from parkour_spark.sources import textfmt

    if textfmt.register_text_source(spark):
        return textfmt.text_offsets_dseq(spark, path)
    rdd = spark.sparkContext.textFile(path).zipWithIndex().map(lambda t: (t[1], t[0]))
    return spark.createDataFrame(rdd, "offset long, value string")


def mem_dseq(spark: SparkSession, rows: Sequence[Any], schema=None, nper: int | None = None) -> DataFrame:
    """In-memory collection as input (mem/dseq; also dval/dseq's
    'broadcastable value as job input' with nper rows per task)."""
    n_parts = max(1, math.ceil(len(rows) / nper)) if nper else None
    if n_parts:
        rdd = spark.sparkContext.parallelize(rows, n_parts)
        return spark.createDataFrame(rdd, schema)
    return spark.createDataFrame(rows, schema)


def range_dseq(
    spark: SparkSession, start: int, end: int | None = None, step: int = 1, nper: int | None = None
) -> DataFrame:
    """Synthetic numeric range (io/range.clj:28-42). `nper` = values per
    task (reference semantics) → numPartitions."""
    if end is None:
        start, end = 0, start
    total = max(0, math.ceil((end - start) / step))
    num_partitions = max(1, math.ceil(total / nper)) if nper else None
    return spark.range(start, end, step, numPartitions=num_partitions).select(
        F.col("id").alias("value")
    )


def sample_dseq(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """Seeded sampling of any dataset (sample/dseq wraps any dseq;
    io/sample.clj:14-32). Split-level sampling becomes row-level
    Bernoulli sampling — pushed into the scan by Catalyst."""
    return df.sample(fraction=fraction, seed=seed)


def read_any(spark: SparkSession, path: str, fmt: str = "parquet",
             schema=None, **options) -> DataFrame:
    """Format-parametric reader (seqf/avro/cascading dseqs collapse to
    this; Avro needs the spark-avro jar — import-gated at call time).
    `schema` (StructType or DDL string) pins the read schema for
    formats that would otherwise infer (csv/json)."""
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def mux_dseq(*dfs: DataFrame, tags: Sequence[str] | None = None) -> DataFrame:
    """Multiplex union of heterogeneous sources (mux/dseq,
    io/mux.clj:54-61): each input keeps its independent read
    configuration (it's already a DataFrame); schemas align by name with
    nulls for missing columns. With `tags`, adds a `source` column
    (multiplex_test.clj:12-33)."""
    if tags is not None:
        return union_tagged(dict(zip(tags, dfs)))
    return union_all(*dfs)
