"""Sorts, limits, sampling, partitioning control, global indexing.

Reference coverage (SURVEY §2.8 + matrixify):
- shuffle sort / total order (doc/serialization.md:49-53) → orderBy
  (range-partitioned sort) / sortWithinPartitions.
- custom partitioners (toolbox.clj:17-30) → repartition(n, expr); the
  exact fn-of-key form via RDD partitionBy in `partition_by_fn`.
- reservoir sampling (reducers.clj:161-174, io/sample.clj:14-32) →
  seeded df.sample.
- matrixify global dense indexing (examples/parkour/example/
  matrixify.clj:25-46): two-phase per-partition count + prefix-sum →
  `zip_with_index` (distributed, no single-partition window).
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame, functions as F, types as T


def widen_scan(df: DataFrame, widen: bool = True) -> DataFrame:
    """Spread compute-heavy per-row work across all cores.

    Small inputs (one parquet file / one row group) arrive as a single
    partition; expensive scan-side expressions (md5 signatures, k-gram
    hashing, per-centroid cosines) would then run on one core. At 100 TB
    inputs arrive pre-split, so this is a no-op (only repartitions when
    below the session's default parallelism).

    Pass widen=False when `df` is already downstream of a shuffle: its
    partitioning is fine, and under AQE `df.rdd.getNumPartitions()` on a
    non-scan plan EXECUTES the upstream stages just to finalize the
    partition count — a silent extra pass over the data. On a plain
    scan(+filter/project) plan the partition count comes from file
    splits, computed driver-side without running a job."""
    if not widen:
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def explode_fast(
    df: DataFrame,
    array: Column | str,
    alias: str,
    keep: Sequence[Column | str] = (),
    pos_alias: str | None = None,
) -> DataFrame:
    """Explode an expensive-to-compute array without the
    InferFiltersFromGenerate re-evaluation trap.

    Plain `explode(arr)` makes the optimizer infer `size(arr) > 0 AND
    isnotnull(arr)`, and predicate pushdown substitutes the FULL array
    expression below every upstream projection. Subexpression
    elimination cannot reach inside lambda functions, so any non-staged
    subexpression referenced by a `transform`/`filter` lambda (e.g. the
    regex tokenize feeding a shingle builder) is re-evaluated ONCE PER
    ARRAY ELEMENT inside that filter. Measured on the sf1 shingle
    corpus (50k docs, 2.65M shingles): 29.6s -> 1.4s, a ~20x cliff that
    grows with average array length.

    `explode_outer` infers no such filter; the null-guard on the
    generated OUTPUT attribute (never pushable below the Generate)
    restores plain-explode semantics for null/empty arrays — parity is
    asserted in tests/test_r4_explode.py.

    Contract: array ELEMENTS must be non-null (true for every feature
    family here — split/concat_ws/md5/struct-literal arrays never
    produce null elements). Null elements would be dropped where plain
    explode emits them as null rows.
    """
    keep_cols = [F.col(c) if isinstance(c, str) else c for c in keep]
    arr = F.col(array) if isinstance(array, str) else array
    if pos_alias is not None:
        gen = F.posexplode_outer(arr).alias(pos_alias, alias)
    else:
        gen = F.explode_outer(arr).alias(alias)
    return df.select(*keep_cols, gen).where(F.col(alias).isNotNull())


def total_sort(df: DataFrame, *order: Column) -> DataFrame:
    """Global total order via range partitioning — the Hadoop total-order
    partitioner analog. SCALE: range boundaries come from a sampled pass;
    output stays partitioned (no single-node sort)."""
    return df.orderBy(*order)


def sort_within_partitions(df: DataFrame, *order) -> DataFrame:
    return df.sortWithinPartitions(*order)


def repartition_by(df: DataFrame, num: int | None, *exprs) -> DataFrame:
    """Custom partitioning by expression (reference `by-p`/`nth0-p`,
    toolbox.clj:17-30): hash-partition on arbitrary expressions."""
    return df.repartition(num, *exprs) if num else df.repartition(*exprs)


def partition_by_fn(df: DataFrame, num_partitions: int, key_fn: Callable) -> DataFrame:
    """Exact fn-of-key partitioning (mapreduce.clj:277-296) — the RDD
    escape hatch for partitioner semantics DataFrames can't express.
    Rows land in partition `key_fn(row) % num_partitions`. Kept for
    parity; prefer `repartition_by` so Catalyst stays in control."""
    schema = df.schema
    rdd = (
        df.rdd.map(lambda row: (key_fn(row), row))
        .partitionBy(num_partitions, lambda k: k)
        .map(lambda kv: kv[1])
    )
    return df.sparkSession.createDataFrame(rdd, schema)


def sample_seeded(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """Seeded sampling for cheap dev iteration (io/sample.clj:14-32)."""
    return df.sample(fraction=fraction, seed=seed)


def limit(df: DataFrame, n: int) -> DataFrame:
    return df.limit(n)


def zip_with_index(
    df: DataFrame, index_col: str = "index", order: Sequence[Column] | None = None,
    persist: bool = True,
) -> DataFrame:
    """Global dense 0-based index, distributed and JVM-only.

    The matrixify pattern (matrixify.clj:25-46): the reference runs a
    first job counting rows per reducer, prefix-sums the counts on the
    driver, then a second job assigns offset + local index. Same two
    phases here, but with zero Python in the data path (rdd.zipWithIndex
    would pickle every row through the Python worker twice):
    `monotonically_increasing_id` already encodes (partition id << 33) +
    consecutive local index; phase 1 aggregates per-partition counts
    (tiny: one row per partition), the driver prefix-sums them, and
    phase 2 adds the offset via an inlined literal map. With `order`
    given, rows are range-partition sorted first so the index is the
    rank in that order — never a single-partition row_number window.

    `persist` keeps the two phases consistent and pays the sort once;
    disable it for huge inputs whose lineage is cheap to recompute.
    Assumes < 2^33 rows per partition (the mid encoding's limit).
    """
    if order is not None:
        df = df.orderBy(*order)
    base = df.withColumn("__mid", F.monotonically_increasing_id())
    if persist:
        base = base.persist()
    pid = F.shiftright("__mid", 33)
    counts = base.select(pid.alias("__pid")).groupBy("__pid").count().collect()
    offsets: dict[int, int] = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["__pid"]):
        offsets[row["__pid"]] = acc
        acc += row["count"]
    # one entry per non-empty partition; for deployments with 100k+
    # partitions swap the literal map for a broadcast join on __pid
    mapping = F.create_map(
        *[F.lit(v) for p, off in offsets.items() for v in (p, off)]
    )
    local = F.col("__mid").bitwiseAND(F.lit((1 << 33) - 1))
    return base.select(
        *df.columns, (mapping[pid] + local).alias(index_col)
    )


def spark_partition_id(df: DataFrame, col_name: str = "partition_id") -> DataFrame:
    """Expose the physical partition id (reference `mapred.task.partition`
    dependency in matrixify; PySpark analog F.spark_partition_id)."""
    return df.withColumn(col_name, F.spark_partition_id())
