"""Deterministic content-addressed sampling and dataset splitting.

Training-data pipelines need REPRODUCIBLE samples and holdout splits —
the same document must land in the same split on every run, every
engine, every partitioning. Spark's `sample`/`sampleBy` are seeded but
partition-layout-dependent, so they can't be cross-engine-verified and
silently reshuffle membership when file splits change. Content-hash
bucketing fixes both: bucket = md5(key) mod N is a pure function of the
ROW, bit-identical in Spark and ANSI SQL, stable under any
repartitioning, and exactly what you want for train/val/test splits
that must never leak across runs.

All Column expressions — JVM-side, codegen'd, scan-side (the split
assignment rides the first projection; no shuffle, no RNG state).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def hash_bucket(key: Column | str, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets): first 8 md5 hex chars of
    the key, mod buckets. Cross-engine: DuckDB computes the identical
    value as ('0x' || substr(md5(key), 1, 8))::BIGINT % buckets.

    CONTRACT: `operators.textindex._py_bucket` is a driver-side Python
    replica of this exact formula (md5 hex [:8] as int, mod buckets) —
    persisted text-index probes hash their query terms with it to pick
    partition buckets WITHOUT a Spark job. Any change here must change
    _py_bucket identically (tests/test_textindex.py pins term-by-term
    agreement), or probes would silently read the wrong buckets."""
    c = F.col(key) if isinstance(key, str) else key
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long")
        % buckets
    )


def hash_sample(df: DataFrame, key: str, fraction: float, buckets: int = 10000) -> DataFrame:
    """Keep ~fraction of rows, membership decided per row by content
    hash — reproducible across runs/engines/partitionings."""
    return df.where(hash_bucket(F.col(key), buckets) < int(fraction * buckets))


def split_assign(
    key: Column | str,
    splits: dict[str, float],
    buckets: int = 100,
    out_names: list[str] | None = None,
) -> Column:
    """Assign each row to a named split by hash-bucket range, e.g.
    {'train': 0.8, 'val': 0.1, 'test': 0.1}. Ranges are cumulative in
    the dict's order; fractions must sum to ≤ 1 (remainder → last
    split)."""
    b = hash_bucket(key, buckets)
    expr = None
    acc = 0.0
    names = list(splits)
    for name in names[:-1]:
        acc += splits[name]
        cond = b < int(acc * buckets)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)
