"""User-defined input sources — the `input-format!` analog.

The reference lets users define an InputFormat from two plain
functions: a split function (conf → splits) and a record-seq function
(split → records) (/root/reference/src/clojure/parkour/mapreduce.clj:
194-223, example io/range.clj:8-26).

Spark-first translation: `fn_source` parallelizes the split descriptors
and flatMaps the reader over them — each split is read inside a task,
exactly the reference's execution shape. For production-grade sources
(schema pushdown, streaming) PySpark 4's Python DataSource API is the
richer path; `register_python_datasource` gates on its availability.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession


def fn_source(
    spark: SparkSession,
    splits: Sequence[Any],
    read_split: Callable[[Any], Iterable[Any]],
    schema,
) -> DataFrame:
    """Build a DataFrame from (splits, reader-fn):

    - `splits`: driver-side list of split descriptors (paths, ranges,
      shard ids, …) — one task per split.
    - `read_split(split)` → iterable of rows, executed task-side.

    SCALE: splits ship as task metadata (small); records never touch the
    driver. The reader runs once per split, so per-split setup (open
    connection, seek) amortizes like a RecordReader."""
    rdd = spark.sparkContext.parallelize(list(splits), len(splits)).flatMap(read_split)
    return spark.createDataFrame(rdd, schema)


def register_python_datasource(spark: SparkSession, datasource_cls) -> bool:
    """Register a PySpark 4 Python DataSource (spark.dataSource.register)
    if this runtime supports it. Returns False (no-op) otherwise, letting
    callers fall back to `fn_source`."""
    try:
        spark.dataSource.register(datasource_cls)
        return True
    except Exception:
        return False
