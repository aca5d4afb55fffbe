"""Behavioral event analytics: funnels, retention cohorts, transition
matrices.

The standard product-analytics trio, shaped for event tables far larger
than the user dimension:

- Every operator reduces events to per-user facts FIRST (conditional
  min/max aggregates or a lag window keyed by user), so the wide event
  scan collapses to user-sized intermediates before anything joins or
  re-shuffles — the 100 TB event table is touched exactly once.
- Time math is integer (epoch days / week indexes from integer
  division), never calendar-function-dependent, so results are
  engine-exact and timezone-proof.
- Sequence order is made deterministic by (ts, event_id) — event
  streams carry same-timestamp rows, and an analytics answer that
  depends on partition order is not an answer.

Reference parity: beyond-reference (the reference has no event
analytics; SURVEY §2 aggregation-family extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from parkour_spark.functions.timeops import epoch_micros


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """EXACT sequential funnel: a user completes step k at the earliest
    step-k event at-or-after their step-(k-1) completion time. This is
    deliberately NOT the min-per-type shortcut (comparing each type's
    global minimum), which miscounts users who did step k both before
    and after step k-1 — the sequential definition needs the earliest
    qualifying event, not the earliest event.

    Shape: one pass per step — a type-filtered scan (predicate pushes
    to the source) user-joined to the previous reach table, then a
    per-user min. k steps = k user-keyed shuffles of step-filtered
    data, never a replay of the whole event table per user. Returns
    (step, step_name, n_users), non-increasing."""
    reach: DataFrame | None = None
    step_counts = []
    for i, s in enumerate(steps):
        ev_s = events.where(F.col(type_col) == s).select(
            F.col(user_col).alias("__u"), F.col(ts_col).alias("__ts")
        )
        if reach is None:
            reach = ev_s.groupBy("__u").agg(F.min("__ts").alias("__t"))
        else:
            reach = (
                ev_s.join(reach, "__u")
                .where(F.col("__ts") >= F.col("__t"))
                .groupBy("__u")
                .agg(F.min("__ts").alias("__t"))
            )
        step_counts.append(
            reach.agg(F.count("*").cast("long").alias("n_users")).select(
                F.lit(i + 1).alias("step"),
                F.lit(s).alias("step_name"),
                "n_users",
            )
        )
    out = step_counts[0]
    for df in step_counts[1:]:
        out = out.unionByName(df)
    return out


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly retention matrix: cohort_week = the user's first active
    week (integer epoch-week), and for every (cohort_week, offset)
    the count of cohort users active `offset` weeks later. Two
    user-keyed aggregates; weeks are floor(epoch/86400/7) — integer,
    calendar- and timezone-independent."""
    week = (F.unix_timestamp(F.col(ts_col)) / F.lit(86400 * 7)).cast("long")
    active = events.select(
        F.col(user_col).alias("u"), week.alias("w")
    ).distinct()
    first = active.groupBy("u").agg(F.min("w").alias("w0"))
    return (
        active.join(first, "u")
        .groupBy(
            F.col("w0").alias("cohort_week"),
            (F.col("w") - F.col("w0")).alias("week_offset"),
        )
        .agg(F.count_distinct("u").alias("n_users"))
    )


def transition_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user event-type transition counts: lag over the
    deterministic (ts, id) order within each user, then one pair
    aggregate. Returns (prev_type, next_type, n) — the empirical
    Markov transition table."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    return (
        events.withColumn("__prev", F.lag(type_col).over(w))
        .where(F.col("__prev").isNotNull())
        .groupBy(
            F.col("__prev").alias("prev_type"),
            F.col(type_col).alias("next_type"),
        )
        .agg(F.count("*").alias("n"))
    )


def last_touch_attribution(
    events: DataFrame,
    convert_type: str = "purchase",
    touch_types: tuple[str, ...] = ("click", "view"),
    attribution_window: str | None = None,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Last-touch attribution: for every conversion event, the most
    recent preceding touch event of the same user (optionally within
    `attribution_window`, an SQL interval string like '7 days').
    Returns one row per conversion: (user, event id, conversion ts,
    touch_type, touch_ts) — touch columns NULL when unattributed.

    SCALE: the event table is filtered scan-side to the touch +
    conversion types, then ONE hash-partitioned window per user carries
    the last touch forward (running last_value IGNORE NULLS over the
    deterministic (ts, id) order) — no self-join, no per-conversion
    probe; the single shuffle is the user-keyed window sort. The same
    shape extends to first-touch (first over the unbounded-following
    frame) and multi-touch (collect over the frame)."""
    sub = events.where(F.col(type_col).isin(*touch_types, convert_type))
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col(type_col).isin(*touch_types)
    lt = F.last(
        F.when(
            is_touch,
            F.struct(F.col(ts_col).alias("t"), F.col(type_col).alias("ty")),
        ),
        ignorenulls=True,
    ).over(w)
    conv = sub.withColumn("__lt", lt).where(F.col(type_col) == convert_type)
    touch_t, touch_ty = F.col("__lt.t"), F.col("__lt.ty")
    if attribution_window is not None:
        in_win = touch_t >= F.col(ts_col) - F.expr(
            f"INTERVAL {attribution_window}"
        )
        touch_t = F.when(in_win, touch_t)
        touch_ty = F.when(in_win, F.col("__lt.ty"))
    return conv.select(
        F.col(user_col),
        F.col(id_col),
        F.col(ts_col),
        touch_ty.alias("touch_type"),
        touch_t.alias("touch_ts"),
    )


def time_weighted_value(
    events: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user time-weighted average of a last-observation-held value
    (TWAP / metering semantics): each event's value is held until the
    user's next event; the final event holds nothing (no closing
    interval exists in the data, so inventing one would be a lie).

    Returns (user_col, n_events, held_us, vsum_centi_us, twa_centi):
    held_us = Σ holding-interval micros, vsum_centi_us = Σ round(100·v)
    · interval_us, twa_centi = vsum/held as a double (NULL for
    single-event users — nothing was ever held).

    Engine-exactness: timestamps enter as EXACT integer epoch micros
    (no epoch()-double round-trip, whose fractional-second rounding is
    engine-dependent); values are integer centi-units rounded per row
    BEFORE the multiply, so both aggregates are order-independent
    integer sums and the single trailing division is IEEE-exact on both
    engines. Interval order is the total order (ts, id) — equal
    timestamps cannot flip results. Magnitudes: |100·v| ≤ ~5e4 here and
    a holding interval is ≤ the table's time span (~months = ~1e13 us),
    so each product and per-user sum sits ≤ ~1e18 < int64 max; callers
    with wider value ranges scale the unit down.

    SCALE: ONE user-keyed window (lead) feeding a partial aggregate —
    the event table shuffles exactly once, on user_col, and nothing
    downstream is bigger than the user dimension."""
    w = Window.partitionBy(user_col).orderBy(
        F.col("__us").asc(), F.col(id_col).asc()
    )
    staged = events.select(
        F.col(user_col),
        F.col(id_col),
        epoch_micros(F.col(ts_col)).alias("__us"),
        F.round(F.col(value_col) * 100).cast("long").alias("__vc"),
    )
    spans = staged.withColumn(
        "__dur", F.lead("__us").over(w) - F.col("__us")
    )
    out = spans.groupBy(user_col).agg(
        F.count("*").cast("long").alias("n_events"),
        F.coalesce(F.sum("__dur"), F.lit(0)).cast("long").alias("held_us"),
        F.coalesce(F.sum(F.col("__vc") * F.col("__dur")), F.lit(0))
        .cast("long")
        .alias("vsum_centi_us"),
    )
    return out.withColumn(
        "twa_centi",
        F.when(
            F.col("held_us") > 0,
            F.col("vsum_centi_us").cast("double") / F.col("held_us"),
        ),
    )


def linear_attribution(
    events: DataFrame,
    conversion_type: str,
    touch_types: list[str],
    lookback_s: int,
    user_col: str = "user_id",
    id_col: str = "event_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Equal-credit (linear) multi-touch attribution — the companion to
    last_touch_attribution: every touch inside a conversion's lookback
    window shares that conversion's credit equally. Returns one row per
    touch type: (type_col, n_touchpoints, credit_micro) with
    credit_micro = Σ round(1e6 / n_touches(conversion)) — per-pair
    integer rounding BEFORE the sum, so totals are order-independent
    and engine-exact (a conversion's credit may differ from exactly 1e6
    by sub-micro rounding; that is the documented trade for exactness).

    SCALE: touches and conversions are type-filtered SCAN-SIDE, so the
    user-keyed equi-join moves only the attribution-relevant slice; the
    per-conversion touch count is one window over the PAIR table
    (bounded by per-user activity within the lookback, the same fanout
    class as the funnel operators); the final aggregate is
    touch-type-sized. The credit window partitions by (user_col,
    __conv) — NOT by the conversion id alone — so conversion ids only
    need to be unique per user; two users reusing an event id can
    never merge windows and mis-split credit (r6 ADVICE)."""
    cus = epoch_micros(F.col(ts_col))
    convs = events.where(F.col(type_col) == conversion_type).select(
        F.col(user_col), F.col(id_col).alias("__conv"), cus.alias("__cus")
    )
    touches = events.where(F.col(type_col).isin(list(touch_types))).select(
        F.col(user_col), F.col(type_col), cus.alias("__tus")
    )
    lb = int(lookback_s) * 1_000_000
    pairs = touches.join(convs, user_col).where(
        (F.col("__tus") > F.col("__cus") - lb)
        & (F.col("__tus") <= F.col("__cus"))
    )
    w = Window.partitionBy(user_col, "__conv")
    credited = pairs.withColumn("__n", F.count("*").over(w)).select(
        type_col,
        F.round(F.lit(1e6) / F.col("__n")).cast("long").alias("__credit"),
    )
    return credited.groupBy(type_col).agg(
        F.count("*").cast("long").alias("n_touchpoints"),
        F.sum("__credit").cast("long").alias("credit_micro"),
    )
