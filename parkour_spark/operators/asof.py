"""As-of join and range join — operators Spark lacks natively, composed
from built-in DataFrame ops (preference order (a) of the build brief:
composition before Pandas UDFs before mapPartitions).

Neither exists in the reference (SURVEY §2.7 notes theta/range/as-of
joins are absent as named strategies); both are table stakes for a
time-series/feature-pipeline engine.

SCALE:
- `asof_join` is the union-sort trick: tag both sides, one shuffle on
  the key, one within-partition sort by (key, time, side) and a
  last-non-null window — O(n log n) per key partition, no pandas, no
  per-key materialization, skew handled by AQE. This beats
  `merge_asof`-per-group (`applyInPandas`) by keeping everything in
  Tungsten and never loading a whole key group in memory.
- `range_join` buckets the range dimension: the right side explodes to
  one row per covered bucket, the join becomes an equi-join on
  (keys…, bucket) + residual filter — shuffle fan-out is
  |right| × avg_buckets_per_interval instead of |left| × |right|.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    right_vals: Sequence[str],
    direction: str = "backward",
    strict: bool = False,
    tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach the right row's values as of its time:
    the latest right row with r.time <= l.time (`backward`, default) or
    the earliest with r.time >= l.time (`forward`). `strict` excludes
    equal timestamps.

    Implementation: union both sides with a side tag, then per key a
    single time-ordered window carries the last (or next) seen right
    value onto left rows. One shuffle, one sort — the physical shape of
    a sort-merge join.

    Ties: when several right rows share (key, time), `tiebreak` (a
    right-side column, e.g. its id) makes the carried row deterministic
    — backward carries the max-tiebreak row, forward the min. Without
    it the right_vals columns themselves break the tie, so the result
    is stable across runs either way (never partition-order dependent)."""
    lt = F.col(left_time)
    keys = list(on)
    # Right-rows-only tie order at equal (__t, __side); left rows hold
    # NULLs here but __side already separates the sides at equal time.
    tie_cols = [F.col("__tie")] if tiebreak else [F.col(v) for v in right_vals]
    l_tagged = left.withColumn("__t", lt.cast("double")).withColumn("__side", F.lit(1))
    for v in right_vals:
        l_tagged = l_tagged.withColumn(v, F.lit(None).cast(dict(right.dtypes)[v]))
    r_extra = [F.col(tiebreak).alias("__tie")] if tiebreak else []
    if tiebreak:
        l_tagged = l_tagged.withColumn("__tie", F.lit(None).cast(dict(right.dtypes)[tiebreak]))
    r_tagged = right.select(
        *keys,
        F.col(right_time).cast("double").alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(v) for v in right_vals],
        *r_extra,
    )
    for c in left.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = l_tagged.unionByName(r_tagged.select(l_tagged.columns))

    if direction == "backward":
        # right rows sort before left at equal time unless strict
        side_order = F.col("__side").asc() if not strict else F.col("__side").desc()
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__t").asc(), side_order, *tie_cols)
            .rowsBetween(Window.unboundedPreceding, -1 if strict else 0)
        )
        carried = [
            F.last(F.when(F.col("__side") == 0, F.col(v)), ignorenulls=True)
            .over(w)
            .alias(f"__asof_{v}")
            for v in right_vals
        ]
    elif direction == "forward":
        side_order = F.col("__side").desc() if not strict else F.col("__side").asc()
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__t").asc(), side_order, *tie_cols)
            .rowsBetween(1 if strict else 0, Window.unboundedFollowing)
        )
        carried = [
            F.first(F.when(F.col("__side") == 0, F.col(v)), ignorenulls=True)
            .over(w)
            .alias(f"__asof_{v}")
            for v in right_vals
        ]
    else:
        raise ValueError(f"direction must be backward/forward, got {direction}")

    out = unioned.select(*unioned.columns, *carried).where(F.col("__side") == 1)
    proj = [F.col(c) for c in left.columns] + [
        F.col(f"__asof_{v}").alias(v) for v in right_vals
    ]
    return out.select(*proj)


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_val: Column | str,
    right_lo: str,
    right_hi: str,
    on: Sequence[str] = (),
    bucket_width: float | None = None,
) -> DataFrame:
    """Join left rows to right intervals containing them:
    right.lo <= left.val < right.hi (+ optional equi keys).

    The right side explodes to one row per bucket its interval covers;
    the join is then equi on (keys…, bucket) with the interval condition
    as a residual filter — never a broadcast nested loop over the big
    side. `bucket_width` defaults to the average interval width
    (computed in one tiny driver action)."""
    lval = F.col(left_val) if isinstance(left_val, str) else left_val
    if bucket_width is None:
        row = right.select(F.avg(F.col(right_hi) - F.col(right_lo)).alias("w")).first()
        bucket_width = float(row["w"]) or 1.0
    w = float(bucket_width)

    lb = left.withColumn("__bucket", F.floor(lval / w).cast("long"))
    buckets = F.sequence(
        F.floor(F.col(right_lo) / w).cast("long"),
        F.floor((F.col(right_hi) - F.lit(1e-12)) / w).cast("long"),
    )
    rb = right.withColumn("__bucket", F.explode(buckets))
    joined = lb.join(rb, [*on, "__bucket"])
    return joined.where(
        (lval >= F.col(right_lo)) & (lval < F.col(right_hi))
    ).drop("__bucket")
