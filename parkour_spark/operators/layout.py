"""Multi-dimensional data layout: z-order (Morton) clustering for
file-level data skipping.

At 100 TB the fastest scan is the one that never opens the file.
Parquet readers skip whole files/row-groups from footer min/max stats,
but stats are only selective if the WRITE clustered the data: sorting
by one column makes every other column's per-file range span the whole
domain. Z-ordering interleaves the bits of two (or more) dimensions so
each output file covers a compact hyper-rectangle — per-file min/max
stay tight in EVERY interleaved dimension, and a box predicate on any
of them prunes most files before a byte is read.

Spark-first shape: the z-key is a pure integer Column expression
(codegen'd, scan-side), the clustering is one `repartitionByRange` on
that key (a single range shuffle — the same cost as any global sort)
followed by a plain parquet write. Reading back needs NOTHING special:
any engine (Spark, DuckDB, Trino, ...) gets the skipping for free from
standard parquet stats, which is the point of fixing layout at write
time rather than engine logic at read time.

Reference parity: the reference's sinks write partition files in task
order (parkour dseq/dsink, mapred OutputFormat) with no clustering
control; layout-for-skipping is a beyond-reference addition for the
100 TB tier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def zorder_key(c1: Column | str, c2: Column | str, bits: int = 8) -> Column:
    """Morton-interleave the low `bits` bits of two non-negative integer
    columns into a single long. Callers MUST quantize both domains into
    the same [0, 2**bits) range first (see `quantize`): interleaving
    unbalanced bit widths degenerates to a plain sort on the wider
    column — its high bits dominate the key and the narrow dimension
    gets no clustering (measured: 0 of 16 files pruned on the narrow
    dim with raw 8-bit × 4-bit inputs vs 10+ with balanced 4×4).
    Static bit-ops only — the expression stays inside whole-stage
    codegen."""
    a = (F.col(c1) if isinstance(c1, str) else c1).cast("long")
    b = (F.col(c2) if isinstance(c2, str) else c2).cast("long")
    one = F.lit(1).cast("long")
    out = F.lit(0).cast("long")
    for i in range(bits):
        a_bit = F.shiftleft(F.shiftright(a, i).bitwiseAND(one), 2 * i + 1)
        b_bit = F.shiftleft(F.shiftright(b, i).bitwiseAND(one), 2 * i)
        out = out.bitwiseOR(a_bit).bitwiseOR(b_bit)
    return out


def quantize(c: Column | str, lo: float, hi: float, bits: int = 8) -> Column:
    """Map [lo, hi] linearly onto integer cells [0, 2**bits)."""
    col = (F.col(c) if isinstance(c, str) else c).cast("double")
    n = (1 << bits) - 1
    cell = F.floor((col - F.lit(lo)) / (F.lit(hi) - F.lit(lo)) * (n + 1))
    return F.greatest(F.lit(0), F.least(F.lit(n), cell)).cast("long")


def write_zordered(
    df: DataFrame,
    path: str,
    c1: str,
    c2: str,
    bits: int = 8,
    n_files: int = 16,
) -> None:
    """Cluster df by the z-key of (c1, c2) into n_files parquet files:
    one range shuffle on the z-key, then a per-partition local sort so
    row groups inside each file are tight too. The helper key never
    reaches the files.

    Range boundaries come from sampling; the default 100 rows/partition
    is tuned for recurring shuffles, but a layout write is a one-off
    batch job whose whole value is boundary quality — noisy boundaries
    leak a dimension's range across files and cost every future scan.
    So the write temporarily raises the range-exchange sample size
    (driver-side reservoir merge of ~2000 keys/partition — KBs), which
    also pins the boundaries at test scale where the sample then covers
    the data exactly."""
    spark = df.sparkSession
    key = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "2000")
    try:
        z = zorder_key(c1, c2, bits).alias("__z")
        (
            df.withColumn("__z", z)
            .repartitionByRange(n_files, "__z")
            .sortWithinPartitions("__z")
            .drop("__z")
            .write.mode("overwrite")
            .parquet(path)
        )
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def compact_small_files(
    spark,
    src: str,
    dst: str,
    target_bytes: int = 128 << 20,
    preserve_order_col: str | None = None,
) -> dict:
    """Small-file compaction: rewrite a fragmented parquet directory
    into ceil(total_bytes / target_bytes) right-sized files. The
    classic maintenance op for streaming/micro-batch sinks — a table
    that accumulated 100k 1 MB files costs every future scan 100k
    footer reads, driver-side split planning over 100k entries, and
    degenerate row groups; one compaction pass fixes all three.

    Sizing is measured, not guessed: file bytes come from the
    FileSystem listing (driver-side metadata only), so the output count
    tracks actual on-disk compressed size rather than row counts.
    `coalesce` (not repartition) merges inputs without a shuffle —
    each output task reads several input files and streams them out;
    with `preserve_order_col` set, a repartitionByRange on that column
    re-establishes clustering instead (one range shuffle — use when the
    source was z-ordered/sorted and the layout is worth preserving).

    Returns {files_before, files_after, bytes, rows} so callers (and
    tests) can assert the compaction actually happened."""
    import math

    from parkour_spark.fs import list_status

    entries = [
        e for e in list_status(spark, src) if e["path"].endswith(".parquet")
    ]
    total = sum(e["len"] for e in entries)
    n_out = max(1, math.ceil(total / target_bytes))
    df = spark.read.parquet(src)
    if preserve_order_col is not None:
        out = df.repartitionByRange(n_out, preserve_order_col)
    else:
        out = df.coalesce(n_out)
    out.write.mode("overwrite").parquet(dst)
    after = [
        e for e in list_status(spark, dst) if e["path"].endswith(".parquet")
    ]
    return {
        "files_before": len(entries),
        "files_after": len(after),
        "bytes": total,
        "rows": spark.read.parquet(dst).count(),
    }


def files_hit_by_box(
    path: str, c1: str, lo1, hi1, c2: str, lo2, hi2
) -> tuple[int, int]:
    """(files whose footer min/max box intersects the predicate box,
    total files) — measured from parquet footers alone, i.e. exactly
    the information any stats-based reader uses to skip. Driver-side by
    design: it reads FOOTERS (KBs), never data pages."""
    import glob
    import os

    import pyarrow.parquet as pq

    paths = sorted(glob.glob(os.path.join(path, "*.parquet")))
    hit = 0
    for p in paths:
        md = pq.ParquetFile(p).metadata
        mins: dict[str, object] = {}
        maxs: dict[str, object] = {}
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                name = col.path_in_schema
                st = col.statistics
                if st is None or not st.has_min_max:
                    continue
                mins[name] = st.min if name not in mins else min(mins[name], st.min)
                maxs[name] = st.max if name not in maxs else max(maxs[name], st.max)
        ok1 = c1 in mins and not (maxs[c1] < lo1 or mins[c1] > hi1)
        ok2 = c2 in mins and not (maxs[c2] < lo2 or mins[c2] > hi2)
        if (c1 not in mins or ok1) and (c2 not in mins or ok2):
            hit += 1
    return hit, len(paths)
