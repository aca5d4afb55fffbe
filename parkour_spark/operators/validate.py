"""Data-quality validation and column profiling (Deequ-style).

A 100 TB ingest without constraint checks ships silent corruption into
training runs; a naive check suite that scans the table once PER
constraint turns quality into the most expensive stage. The shape here:

- All row-level constraints over one table compile into a SINGLE
  aggregate pass — each check is a conditional-sum Column, so N checks
  cost one scan + one 1-row partial-agg merge, never N scans.
- Uniqueness rides the same pass as `count(*) - count(DISTINCT col)`
  (Catalyst plans the mixed agg with an Expand — one extra shuffle of
  key-sized data, still one scan).
- Referential integrity is its own shape by necessity (an anti-join);
  the parent side is keys-only and broadcasts when small.
- Output is a tall (constraint, violations, n_rows, status) table —
  machine-checkable, so a pipeline gates a write on
  `violations == 0` without parsing logs.

`profile_columns` is the discovery-side twin: per-column null counts,
distincts, min/max in one aggregate pass, emitted tall. Values are
formatted to strings deterministically (doubles rounded, timestamps
date-formatted) so profiles are comparable across engines and runs.

Reference parity: beyond-reference (the reference has no quality
layer; SURVEY §2 pipeline-infrastructure family).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True)
class Check:
    """A named constraint whose `violated` Column is true on bad rows."""

    name: str
    violated: Column


def not_null(col: str) -> Check:
    return Check(f"not_null({col})", F.col(col).isNull())


def in_range(col: str, lo, hi) -> Check:
    c = F.col(col)
    return Check(f"in_range({col},{lo},{hi})", c.isNull() | (c < lo) | (c > hi))


def in_set(col: str, values: list) -> Check:
    c = F.col(col)
    return Check(f"in_set({col})", c.isNull() | ~c.isin(values))


def matches(col: str, pattern: str) -> Check:
    c = F.col(col)
    return Check(f"matches({col})", c.isNull() | ~c.rlike(pattern))


def expression(name: str, violated: Column) -> Check:
    return Check(name, violated)


def validate(df: DataFrame, checks: list[Check],
             unique_cols: list[str] | None = None) -> DataFrame:
    """Run every check in ONE aggregate pass over df. Returns the tall
    (constraint, violations, n_rows, status) table; `unique_cols` adds
    count-distinct uniqueness constraints to the same pass."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    names = []
    for ch in checks:
        names.append(ch.name)
        aggs.append(
            F.sum(F.when(ch.violated, F.lit(1)).otherwise(F.lit(0)))
            .cast("long")
            .alias(f"__v{len(names) - 1}")
        )
    for uc in unique_cols or []:
        names.append(f"unique({uc})")
        aggs.append(
            (F.count(uc) - F.count_distinct(F.col(uc)))
            .cast("long")
            .alias(f"__v{len(names) - 1}")
        )
    wide = df.agg(*aggs)
    tall = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(n).alias("constraint"),
                    F.col(f"__v{i}").alias("violations"),
                )
                for i, n in enumerate(names)
            ]
        )
    ).alias("c")
    return wide.select(tall, F.col("__n").alias("n_rows")).select(
        F.col("c.constraint").alias("constraint"),
        F.col("c.violations").alias("violations"),
        "n_rows",
        F.when(F.col("c.violations") == 0, F.lit("pass"))
        .otherwise(F.lit("fail"))
        .alias("status"),
    )


def ref_integrity(child: DataFrame, fk: str, parent: DataFrame,
                  pk: str) -> DataFrame:
    """Orphaned-foreign-key count as the same tall shape: anti-join
    against the keys-only parent side (broadcast when small)."""
    orphans = child.join(
        F.broadcast(parent.select(F.col(pk).alias("__pk")).distinct()),
        F.col(fk) == F.col("__pk"),
        "left_anti",
    )
    return (
        child.agg(F.count(F.lit(1)).alias("n_rows"))
        .crossJoin(F.broadcast(orphans.agg(F.count(F.lit(1)).alias("violations"))))
        .select(
            F.lit(f"ref_integrity({fk}->{pk})").alias("constraint"),
            F.col("violations").cast("long").alias("violations"),
            "n_rows",
            F.when(F.col("violations") == 0, F.lit("pass"))
            .otherwise(F.lit("fail"))
            .alias("status"),
        )
    )


def profile_columns(df: DataFrame, numeric_cols: list[str],
                    string_cols: list[str] | None = None) -> DataFrame:
    """Per-column profile in one aggregate pass: rows, nulls, distincts,
    min/max — emitted tall, values formatted deterministically (doubles
    rounded to 4 places) for cross-run/cross-engine comparability."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    specs = []
    for c in numeric_cols:
        i = len(specs)
        specs.append(c)
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(f"__null{i}"),
            F.count_distinct(F.col(c)).alias(f"__dv{i}"),
            F.round(F.min(F.col(c)).cast("double"), 4).cast("string").alias(f"__min{i}"),
            F.round(F.max(F.col(c)).cast("double"), 4).cast("string").alias(f"__max{i}"),
        ]
    for c in string_cols or []:
        i = len(specs)
        specs.append(c)
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(f"__null{i}"),
            F.count_distinct(F.col(c)).alias(f"__dv{i}"),
            F.min(F.col(c)).alias(f"__min{i}"),
            F.max(F.col(c)).alias(f"__max{i}"),
        ]
    wide = df.agg(*aggs)
    tall = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("column"),
                    F.col(f"__null{i}").alias("n_null"),
                    F.col(f"__dv{i}").alias("n_distinct"),
                    F.col(f"__min{i}").alias("min_val"),
                    F.col(f"__max{i}").alias("max_val"),
                )
                for i, c in enumerate(specs)
            ]
        )
    ).alias("p")
    return wide.select(tall, F.col("__n").alias("n_rows")).select(
        F.col("p.column").alias("column"),
        "n_rows",
        F.col("p.n_null").alias("n_null"),
        F.col("p.n_distinct").alias("n_distinct"),
        F.col("p.min_val").alias("min_val"),
        F.col("p.max_val").alias("max_val"),
    )


def histogram(df: DataFrame, col: str, lo: float, hi: float,
              n_buckets: int = 20) -> DataFrame:
    """Equi-width histogram in one partial-agg'd scan: bucket =
    clamp(floor((x - lo) * n / (hi - lo))), counts per bucket with
    explicit integer bucket bounds — at most n_buckets rows shuffle.
    Out-of-range values clamp into the edge buckets (they are still
    counted; a profile that silently drops outliers lies)."""
    c = F.col(col).cast("double")
    raw = F.floor((c - F.lit(lo)) * n_buckets / (F.lit(hi) - F.lit(lo)))
    b = F.greatest(F.lit(0), F.least(F.lit(n_buckets - 1), raw)).cast("int")
    return (
        df.where(c.isNotNull())
        .groupBy(b.alias("bucket"))
        .agg(F.count("*").alias("n"))
        .withColumn(
            "lo", F.round(F.lit(lo) + F.col("bucket") * (F.lit(hi) - F.lit(lo)) / n_buckets, 4)
        )
        .withColumn(
            "hi", F.round(F.lit(lo) + (F.col("bucket") + 1) * (F.lit(hi) - F.lit(lo)) / n_buckets, 4)
        )
    )


def skew_profile(df: DataFrame, key: str, top_n: int = 5) -> DataFrame:
    """Key-distribution diagnostics for shuffle planning: the top-n
    heaviest keys with exact counts and basis-point shares, plus
    corpus-level totals and the max/mean skew ratio. This is the
    pre-flight a 100 TB job runs BEFORE choosing a join strategy — a
    skew_ratio_bp in the tens of thousands is the signal to salt
    (operators.joins.salted_join) or isolate the hot keys.

    One shuffle (the per-key count, partial-agg'd); the totals are a
    1-row broadcast over the key-sized count table; all ratios are
    exact integer division (div / //), never float."""
    counts = df.groupBy(key).agg(F.count("*").alias("cnt"))
    tot = counts.agg(
        F.sum("cnt").alias("total_rows"),
        F.count("*").alias("n_keys"),
        F.max("cnt").alias("max_cnt"),
    )
    top = counts.orderBy(F.col("cnt").desc(), F.col(key)).limit(top_n)
    return top.crossJoin(F.broadcast(tot)).select(
        F.col(key).alias("key"),
        "cnt",
        F.expr("div(cnt * 10000, total_rows)").alias("share_bp"),
        "n_keys",
        "total_rows",
        F.expr("div(max_cnt * n_keys * 10000, total_rows)").alias("skew_ratio_bp"),
    )


def winsorize_bounds(
    df: DataFrame, col: str, tie_col: str, lo_q: float = 0.05, hi_q: float = 0.95
) -> DataFrame:
    """1-row (lo, hi) bounds at exact rank-based quantiles: the value
    at rank ⌈q·n⌉ in (col, tie_col) order. The value at rank k is
    independent of the tie order (ties share a value by definition),
    so the computation never ranks rows: one shuffle reduces the
    corpus to per-DISTINCT-VALUE (value, cnt) cells, and the only
    ordered pass is a cumulative-count window over that cell table —
    `auc_rank_sum`'s discipline. The cell table is bounded by the
    value domain (prices, quantized scores), not the row count, so
    the plan survives a 100× scale-up where the old full-table
    row_number window would single-partition the corpus. NULL values
    are excluded from the rank domain (pass a pre-filtered df if a
    different NULL policy is needed). `tie_col` is kept for signature
    compatibility; it cannot affect the picked values. The 1-row
    result broadcasts."""
    from pyspark.sql import Window

    cells = (
        df.where(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("__v"))
        .agg(F.count("*").alias("__c"))
    )
    w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
    cum = cells.withColumn("__cum", F.sum("__c").over(w))
    tot = cells.agg(F.sum("__c").alias("__n"))
    picked = cum.crossJoin(F.broadcast(tot))
    pick = lambda q: F.min(  # noqa: E731
        F.when(
            F.col("__cum") >= F.ceil(F.lit(q) * F.col("__n")).cast("long"),
            F.col("__v"),
        )
    )
    return picked.agg(pick(lo_q).alias("lo"), pick(hi_q).alias("hi"))


def winsorize(
    df: DataFrame, col: str, bounds: DataFrame, out_col: str | None = None
) -> DataFrame:
    """Clamp `col` into [lo, hi] (broadcast 1-row bounds) — the
    outlier-robust normalization step before scaling/featurizing; adds
    flags so the clamp rate is observable. Scan-side only."""
    out = out_col or col
    b = F.broadcast(bounds)
    return (
        df.crossJoin(b)
        .withColumn("__lo_clamped", F.col(col) < F.col("lo"))
        .withColumn("__hi_clamped", F.col(col) > F.col("hi"))
        .withColumn(
            out, F.least(F.greatest(F.col(col), F.col("lo")), F.col("hi"))
        )
        .drop("lo", "hi")
    )


def auc_rank_sum(
    df: DataFrame, score_col: str, label_col: str
) -> DataFrame:
    """Exact ROC AUC at corpus scale via the Mann–Whitney U rank-sum
    identity — the "did my quality filter actually separate the
    classes" evaluation primitive:

        AUC = [ Σ_s npos(s)·cumneg(<s) + ½·npos(s)·nneg(s) ] / (npos·nneg)

    summed over DISTINCT score values s (ties get the ½ midrank credit
    exactly). No global row sort: one shuffle reduces the corpus to
    per-distinct-score (npos, nneg) cells, and the only ordered pass is
    a window over that DISTINCT-SCORE table — bounded for quantized
    scores (quality basis points: ≤10⁴ rows regardless of corpus size),
    which is why the caller should pass an integer/quantized score for
    unbounded-cardinality inputs. All rank arithmetic is integer (u2 =
    2·U stays exact); the single division happens once at the end.

    Returns one row: n_pos, n_neg, u2 (exact 2·U), auc (round 6).
    label_col must be boolean/0-1."""
    from pyspark.sql import Window

    lbl = F.col(label_col).cast("int")
    cells = df.groupBy(F.col(score_col).alias("__s")).agg(
        F.sum(lbl).alias("__np"), F.sum(1 - lbl).alias("__nn")
    )
    w = Window.orderBy("__s").rowsBetween(Window.unboundedPreceding, -1)
    return (
        cells.withColumn("__cnb", F.coalesce(F.sum("__nn").over(w), F.lit(0)))
        .select(
            F.sum("__np").cast("long").alias("n_pos"),
            F.sum("__nn").cast("long").alias("n_neg"),
            F.sum(F.col("__np") * (2 * F.col("__cnb") + F.col("__nn")))
            .cast("long")
            .alias("u2"),
        )
        .select(
            "n_pos",
            "n_neg",
            "u2",
            F.round(
                F.col("u2") / (2.0 * F.col("n_pos") * F.col("n_neg")), 6
            ).alias("auc"),
        )
    )


def calibration_bins(
    df: DataFrame, score_col: str, label_col: str, bins: int = 10,
    lo: float = 0.0, hi: float = 1.0,
) -> DataFrame:
    """Reliability-diagram data for a [lo, hi) score against a 0/1
    label: equal-width bins with n, n_pos, and the mean score/positive
    rate per bin — the calibration complement to `auc_rank_sum` (AUC
    measures ranking, this measures probability faithfulness). One
    scan, one `bins`-row shuffle; means are emitted from exact integer
    sums (score summed in micro-units per row BEFORE the aggregate) so
    results are order-independent and engine-exact. Scores at hi land
    in the last bin (closed top edge, half-open interior)."""
    s = F.col(score_col).cast("double")
    width = (hi - lo) / bins
    b = F.least(
        F.greatest(F.floor((s - lo) / width).cast("long"), F.lit(0)),
        F.lit(bins - 1),
    )
    lbl = F.col(label_col).cast("int")
    return (
        df.select(
            b.alias("bin"),
            lbl.alias("__y"),
            F.round(s * 1e6).cast("long").alias("__s_micro"),
        )
        .groupBy("bin")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("__y").cast("long").alias("n_pos"),
            F.sum("__s_micro").cast("long").alias("sum_score_micro"),
        )
        .select(
            "bin",
            "n",
            "n_pos",
            "sum_score_micro",
            F.round(F.col("n_pos") / F.col("n"), 6).alias("pos_rate"),
            F.round(F.col("sum_score_micro") / (F.col("n") * 1e6), 6).alias(
                "mean_score"
            ),
        )
    )


def kappa_agreement(
    df: DataFrame, pred_col: str, truth_col: str
) -> DataFrame:
    """Cohen's kappa between two binary (0/1 castable) columns — the
    label-QA primitive for "does my heuristic agree with ground truth
    beyond chance" (annotator-vs-annotator, classifier-vs-gold, ...).
    Returns ONE row: the exact integer confusion cells (tp, fp, fn, tn),
    observed agreement po, chance agreement pe, kappa (round 6). A
    single partial-agg scan — four conditional counts — then driver-free
    scalar arithmetic; nothing shuffles but one row."""
    p = F.col(pred_col).cast("int")
    t = F.col(truth_col).cast("int")
    cells = df.agg(
        F.sum(p * t).cast("long").alias("tp"),
        F.sum(p * (1 - t)).cast("long").alias("fp"),
        F.sum((1 - p) * t).cast("long").alias("fn"),
        F.sum((1 - p) * (1 - t)).cast("long").alias("tn"),
    )
    n = (F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn")).cast("double")
    po = (F.col("tp") + F.col("tn")) / n
    # marginal products in DOUBLE: long×long overflows past ~3e9 rows
    # per cell pair (n² at corpus scale), and kappa is a float metric
    # anyway — same expression order both engines keeps it bit-stable
    pe = (
        (F.col("tp") + F.col("fp")).cast("double")
        * (F.col("tp") + F.col("fn")).cast("double")
        + (F.col("fn") + F.col("tn")).cast("double")
        * (F.col("fp") + F.col("tn")).cast("double")
    ) / (n * n)
    return cells.select(
        "tp", "fp", "fn", "tn",
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round((po - pe) / (1 - pe), 6).alias("kappa"),
    )


def ks_statistic(
    df_a: DataFrame, df_b: DataFrame, col: str
) -> DataFrame:
    """EXACT two-sample Kolmogorov–Smirnov statistic — numeric-column
    drift between two slices/snapshots (the continuous-column
    complement to corpus.token_drift's token distributions):

        D = max over observed x of |F_a(x) − F_b(x)|

    computed with INTEGER arithmetic: per-distinct-value counts from
    each side outer-merge, cumulative sums give n_b·cumA and n_a·cumB
    (both exact longs), and D's numerator max|n_b·cumA − n_a·cumB| is
    exact — the single division by n_a·n_b happens once at the end, so
    two engines cannot disagree on WHERE the supremum lands. One
    shuffle per side to distinct-value cells; the ordered pass windows
    over the merged DISTINCT-VALUE table — bounded for discrete/
    quantized columns (prices in cents, integer scores); quantize
    continuous doubles first, as with auc_rank_sum.

    Returns one row: n_a, n_b, ks_num (the exact integer numerator),
    ks (round 6)."""
    from pyspark.sql import Window

    ca = (
        df_a.groupBy(F.col(col).alias("__x"))
        .agg(F.count("*").alias("__ca"))
    )
    cb = (
        df_b.groupBy(F.col(col).alias("__x"))
        .agg(F.count("*").alias("__cb"))
    )
    merged = ca.join(cb, "__x", "full_outer").select(
        "__x",
        F.coalesce("__ca", F.lit(0)).alias("__ca"),
        F.coalesce("__cb", F.lit(0)).alias("__cb"),
    )
    w = Window.orderBy("__x").rowsBetween(Window.unboundedPreceding, 0)
    wg = Window.partitionBy()
    cums = merged.select(
        F.sum("__ca").over(w).alias("__cumA"),
        F.sum("__cb").over(w).alias("__cumB"),
    ).select(
        "__cumA",
        "__cumB",
        F.max("__cumA").over(wg).alias("__na"),
        F.max("__cumB").over(wg).alias("__nb"),
    )
    return (
        cums.agg(
            F.max("__na").cast("long").alias("n_a"),
            F.max("__nb").cast("long").alias("n_b"),
            F.max(
                F.abs(F.col("__cumA") * F.col("__nb") - F.col("__cumB") * F.col("__na"))
            )
            .cast("long")
            .alias("ks_num"),
        )
        .select(
            "n_a",
            "n_b",
            "ks_num",
            F.round(F.col("ks_num") / (F.col("n_a") * F.col("n_b")).cast("double"), 6)
            .alias("ks"),
        )
    )


def bootstrap_ci(
    df: DataFrame,
    col: str,
    id_col: str,
    b: int = 50,
    lo_q: float = 0.025,
    hi_q: float = 0.975,
) -> DataFrame:
    """Error bars on a corpus mean in ONE scan — the deterministic
    Poisson bootstrap (Chamandy et al. 2012, "Estimating Uncertainty
    for Massive Data Streams"): classic bootstrap resampling is
    impossible distributed (a resample of n rows needs global
    coordination), but Poisson(1) per-row replicate weights are iid
    BY ROW, so each row independently computes its weight in every one
    of `b` replicates scan-side and only b partial-agg cells shuffle.
    The weight is DERIVED, not drawn: u = md5(id:replicate)/2³² through
    the Poisson(1) inverse CDF (a fixed threshold ladder) — replayable
    on any engine and any partition layout, no RNG state.

    Replicate means use exact integer micro-unit sums; the CI is
    rank-based over the b replicate estimates (no interpolation), so
    the whole artifact is engine-exact. Cost: b× scan-side weight
    evaluations (one md5 each), zero extra corpus shuffles.

    Returns one row: n, point_mean, ci_lo, ci_hi, b."""
    import math

    from pyspark.sql import Window

    # Poisson(1) CDF thresholds, embedded as identical literals on both
    # engines; k capped at 6 (P(X>6) < 1e-4 — bias far below CI width)
    cdf = [math.exp(-1) * sum(1 / math.factorial(i) for i in range(k + 1))
           for k in range(6)]
    x_micro = F.round(F.col(col).cast("double") * 1e6).cast("long")
    rows = df.select(F.col(id_col).alias("__id"), x_micro.alias("__xm"))
    reps = rows.select(
        "__id", "__xm", F.explode(F.sequence(F.lit(0), F.lit(b - 1))).alias("__r")
    ).select(
        "__r",
        "__xm",
        # weight hash keys on the ROW ID, never the value: equal values
        # hashed alike would move together across replicates and
        # correlate the resamples
        (
            F.conv(
                F.substring(F.md5(F.concat_ws(":", "__id", "__r")), 1, 8), 16, 10
            ).cast("double")
            / F.lit(float(1 << 32))
        ).alias("__u"),
    )
    k = F.lit(6)
    for i in range(5, -1, -1):
        k = F.when(F.col("__u") < cdf[i], F.lit(i)).otherwise(k)
    ests = (
        reps.select("__r", "__xm", k.alias("__k"))
        .groupBy("__r")
        .agg(
            F.sum(F.col("__k") * F.col("__xm")).alias("__s"),
            F.sum("__k").alias("__n"),
        )
        .select(
            F.col("__r"),
            (F.col("__s") / (F.col("__n") * 1e6)).alias("__est"),
        )
    )
    lo_rank = max(1, math.ceil(lo_q * b))
    hi_rank = min(b, math.ceil(hi_q * b))
    w = Window.orderBy("__est", "__r")
    ranked = ests.select(
        "__est", F.row_number().over(w).alias("__rk")
    )
    ci = ranked.agg(
        F.max(F.when(F.col("__rk") == lo_rank, F.col("__est"))).alias("__lo"),
        F.max(F.when(F.col("__rk") == hi_rank, F.col("__est"))).alias("__hi"),
    )
    point = rows.agg(
        F.count("*").cast("long").alias("n"),
        (F.sum("__xm") / (F.count("*") * 1e6)).alias("__pm"),
    )
    return point.crossJoin(F.broadcast(ci)).select(
        "n",
        F.round("__pm", 6).alias("point_mean"),
        F.round("__lo", 6).alias("ci_lo"),
        F.round("__hi", 6).alias("ci_hi"),
        F.lit(b).cast("long").alias("b"),
    )


def mad_profile(
    df: DataFrame, col: str, group_col: str, k: int = 3
) -> DataFrame:
    """Per-group ROBUST outlier profile via the median absolute
    deviation: lower median m, MAD = lower-median of |x − m|, and the
    count of rows with |x − m| > k·MAD — the outlier detector that a
    single corrupt ingest batch cannot drag (unlike mean/stddev
    z-scores, which the outliers themselves inflate; winsorize_bounds
    trims by rank, this SCORES by deviation).

    All-integer when `col` is integer (pass prices as cents): medians
    are the value at rank ⌈(n+1)/2⌉ under the per-group value order
    (lower median — a DEFINED, interpolation-free statistic both
    engines agree on), and the outlier test k·MAD is an integer
    comparison. No float exists anywhere.

    SCALE: rows reduce to per-group DISTINCT-VALUE cells in one
    partial-agg shuffle (bounded by the value domain — cents, scores —
    not row count, same guidance as ks_statistic); both median passes
    window over cells only, and every join is group-keyed."""
    from pyspark.sql import Window

    cells = df.groupBy(
        F.col(group_col).alias("__g"), F.col(col).alias("__x")
    ).agg(F.count("*").alias("__c"))

    def _median(cs: DataFrame) -> DataFrame:
        wo = (
            Window.partitionBy("__g")
            .orderBy("__x")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        wg = Window.partitionBy("__g")
        z = cs.select(
            "__g",
            "__x",
            F.sum("__c").over(wo).alias("__cum"),
            F.sum("__c").over(wg).alias("__n"),
        )
        return z.groupBy("__g").agg(
            F.max("__n").cast("long").alias("__n"),
            F.min(
                F.when(F.col("__cum") >= F.expr("(__n + 1) div 2"), F.col("__x"))
            ).alias("__med"),
        )

    med = _median(cells)
    dev = (
        cells.join(med, "__g")
        .groupBy("__g", F.abs(F.col("__x") - F.col("__med")).alias("__x"))
        .agg(F.sum("__c").alias("__c"))
    )
    mad = _median(dev).select("__g", F.col("__med").alias("__mad"))
    out = (
        cells.join(med, "__g")
        .join(mad, "__g")
        .groupBy("__g")
        .agg(
            F.sum(
                F.when(
                    F.abs(F.col("__x") - F.col("__med")) > k * F.col("__mad"),
                    F.col("__c"),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("__n_out")
        )
    )
    return (
        med.join(mad, "__g")
        .join(out, "__g")
        .select(
            F.col("__g").alias(group_col),
            F.col("__n").alias("n"),
            F.col("__med").alias("median"),
            F.col("__mad").alias("mad"),
            F.col("__n_out").alias("n_outliers"),
        )
    )


def average_precision(
    df: DataFrame, score_col: str, label_col: str, tie_col: str
) -> DataFrame:
    """Exact average precision (the PR-curve summary — the ranking
    metric that, unlike ROC AUC, does not reward a filter for its
    behavior on the easy majority class):

        AP = (1/P) Σ_{k : rel(k)} precision@k

    under the DEFINED total order (score desc, tie_col asc) — ties are
    resolved deterministically, not averaged, so the statistic is
    replayable on any engine. Every per-position term is the INTEGER
    (10⁶ · cum_pos) div rank (exact integer division, no float round
    anywhere), so the additive aggregate is order-independent; the one
    float division happens at the end.

    SCALE: this ranks the WHOLE input (one global sort window) — run it
    on evaluation slices, which are small by construction; corpus-scale
    ranking quality is auc_rank_sum's job (distinct-score cells, no
    global sort)."""
    from pyspark.sql import Window

    w = Window.orderBy(F.col(score_col).desc(), F.col(tie_col))
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    ranked = df.select(
        F.col(label_col).cast("long").alias("__y"),
        F.row_number().over(w).alias("__rk"),
        F.sum(F.col(label_col).cast("long")).over(wc).alias("__cum"),
    )
    terms = ranked.where(F.col("__y") == 1).select(
        F.expr("(1000000 * __cum) div __rk").alias("__term")
    )
    agg = ranked.agg(
        F.sum("__y").cast("long").alias("n_pos"),
        F.count("*").cast("long").alias("n"),
    )
    tsum = terms.agg(F.sum("__term").cast("long").alias("ap_micro_sum"))
    return agg.crossJoin(F.broadcast(tsum)).select(
        "n_pos",
        "n",
        "ap_micro_sum",
        F.round(
            F.col("ap_micro_sum")
            / (F.col("n_pos") * F.lit(1_000_000)).cast("double"),
            6,
        ).alias("ap"),
    )


def fd_violations(
    df: DataFrame, lhs: str, rhs: str
) -> DataFrame:
    """Approximate-functional-dependency violation report: for each lhs
    value, the majority rhs (ties broken by rhs asc — a total order),
    its support, and how many rows deviate — "does X (almost) determine
    Y, and where does it break" (schema-drift / entity-resolution /
    ingest-corruption triage; an exact FD shows n_violations = 0).

    Returns (lhs, n, majority_rhs, n_majority, n_violations).

    SCALE: rows partial-agg to DISTINCT (lhs, rhs) cells in one
    shuffle — bounded by the pair domain, not row count; the majority
    pick and the per-lhs total are one window over cells sharing a
    single lhs-keyed Exchange."""
    from pyspark.sql import Window

    cells = df.groupBy(F.col(lhs), F.col(rhs)).agg(F.count("*").alias("__c"))
    w = Window.partitionBy(lhs).orderBy(F.col("__c").desc(), F.col(rhs).asc())
    wn = Window.partitionBy(lhs)
    return (
        cells.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.sum("__c").over(wn))
        .where(F.col("__rn") == 1)
        .select(
            F.col(lhs),
            F.col("__n").cast("long").alias("n"),
            F.col(rhs).alias("majority_rhs"),
            F.col("__c").cast("long").alias("n_majority"),
            (F.col("__n") - F.col("__c")).cast("long").alias("n_violations"),
        )
    )


def benford_profile(
    df: DataFrame, col: str, unit: int = 100
) -> DataFrame:
    """First-significant-digit profile against Benford's law — the
    classic fabricated-data / unit-corruption screen for naturally
    spanning positive amounts. Returns one row per digit 1..9:
    observed count and round(1e6 · n_total · log10(1 + 1/d)) — the
    expected Benford count in integer micro-rows, so the comparison
    ships engine-exact and the caller picks its own distance.

    Exactness: the value is scaled to integer units (round(x · unit))
    and the leading digit is the first character of the INTEGER's
    decimal rendering — integer-to-string is exact in every engine,
    where a float log10 at exact powers of ten is not. Rows with
    non-positive scaled value are excluded (no leading digit exists).

    SCALE: one scan projecting the digit + one 9-cell partial
    aggregate; the expected side is arithmetic on the 9-row result."""
    scaled = df.select(
        F.round(F.col(col) * unit).cast("long").alias("__v")
    ).where(F.col("__v") > 0)
    obs = (
        scaled.select(
            F.substring(F.col("__v").cast("string"), 1, 1)
            .cast("long")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count("*").cast("long").alias("n_obs"))
    )
    tot = obs.agg(F.sum("n_obs").alias("__t"))
    return (
        obs.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n_obs",
            F.round(
                F.col("__t")
                * F.log10(1.0 + 1.0 / F.col("digit"))
                * 1e6
            )
            .cast("long")
            .alias("expected_micro"),
        )
    )


def cusum_profile(
    df: DataFrame,
    value_col: str,
    order_col: str,
    group_col: str,
    ref: DataFrame,
) -> DataFrame:
    """Per-group one-sided CUSUM drift detection over an ordered
    integer series — the SUSTAINED-shift monitor complementing
    mad_profile's point-spike detector (a 20% rate creep never crosses
    a 3·MAD point threshold but accumulates linearly in the CUSUM).

    `ref` carries one row per group: (group_col, k, h) — the reference
    level subtracted each step and the alarm threshold, both integers
    in the value's own unit (derive them robustly, e.g. k = the MAD
    median, h = a MAD multiple).

    Exactness: the recurrence S_i = max(0, S_{i−1} + x_i − k) has the
    closed form S_i = P_i − min(0, min_{j≤i} P_j) with P the prefix sum
    of (x − k) under the (order_col) total order — two windows over the
    same per-group ordering, ALL integer, no sequential state. Returns
    (group_col, n_points, max_cusum, n_alarm_points) where alarm is
    S_i > h.

    SCALE: intended for SERIES tables (hourly/daily cells per group —
    already aggregated), so the ordered windows run over cells, never
    raw rows; one group-keyed Exchange shared by both windows and the
    final aggregate."""
    from pyspark.sql import Window

    wo = Window.partitionBy(group_col).orderBy(order_col)
    wp = wo.rowsBetween(Window.unboundedPreceding, 0)
    staged = df.join(F.broadcast(ref), group_col).select(
        F.col(group_col),
        F.col(order_col),
        (F.col(value_col) - F.col("k")).cast("long").alias("__d"),
        F.col("h").cast("long").alias("__h"),
    )
    p = staged.withColumn("__p", F.sum("__d").over(wp))
    s = p.withColumn(
        "__s",
        F.col("__p") - F.least(F.lit(0), F.min("__p").over(wp)),
    )
    return s.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n_points"),
        F.max("__s").cast("long").alias("max_cusum"),
        F.sum(F.when(F.col("__s") > F.col("__h"), 1).otherwise(0))
        .cast("long")
        .alias("n_alarm_points"),
    )


def psi_stat(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_buckets: int = 20,
) -> DataFrame:
    """Population Stability Index between two slices of the same
    numeric column — the standard "did this feature's distribution
    drift" gate between a reference corpus and an incoming batch
    (rule of thumb: PSI < 0.1 stable, > 0.25 action):

        PSI = Σ_b (p_b − q_b) · ln(p_b / q_b)

    over the shared equi-width buckets of `histogram` (out-of-range
    values clamp into the edge buckets; a drift check that silently
    drops outliers lies). Zero-count buckets get add-1 smoothing on
    BOTH sides (p_b = (c_b + 1)/(n + n_buckets)), the standard fix
    that also keeps ln finite.

    Returns ONE row: (n_a, n_b, psi_micro, psi) — each bucket's term
    is rounded to integer micro-units BEFORE the sum (order-
    independent, engine-exact; ln is IEEE-identical across engines —
    the tfidf precedent). The sum runs over the FULL bucket spine:
    with smoothing, a bucket empty on both sides still contributes
    (1/(n_a+B) − 1/(n_b+B))·ln(·) ≠ 0 whenever the sample sizes
    differ — dropping unobserved buckets would bias the statistic.

    SCALE: two `histogram`-shaped partial-agg scans reduce each side
    to ≤ n_buckets cells; everything after runs on the n_buckets-row
    spine. No row ever moves for the comparison."""
    ha = histogram(df_a, col, lo, hi, n_buckets).select(
        "bucket", F.col("n").alias("__ca")
    )
    hb = histogram(df_b, col, lo, hi, n_buckets).select(
        "bucket", F.col("n").alias("__cb")
    )
    spine = df_a.sparkSession.range(n_buckets).select(
        F.col("id").cast("int").alias("bucket")
    )
    cells = (
        spine.join(ha, "bucket", "left")
        .join(hb, "bucket", "left")
        .select(
            F.coalesce("__ca", F.lit(0)).alias("__ca"),
            F.coalesce("__cb", F.lit(0)).alias("__cb"),
        )
    )
    tot = cells.agg(
        F.sum("__ca").cast("long").alias("__na"),
        F.sum("__cb").cast("long").alias("__nb"),
    )
    pa = (F.col("__ca") + 1) / (F.col("__na") + n_buckets)
    pb = (F.col("__cb") + 1) / (F.col("__nb") + n_buckets)
    term = F.round((pa - pb) * F.log(pa / pb) * 1e6).cast("long")
    return (
        cells.crossJoin(F.broadcast(tot))
        .agg(
            F.max("__na").alias("n_a"),
            F.max("__nb").alias("n_b"),
            F.sum(term).cast("long").alias("psi_micro"),
        )
        .select(
            "n_a",
            "n_b",
            "psi_micro",
            F.round(F.col("psi_micro") / 1e6, 6).alias("psi"),
        )
    )


def ndcg_at_k(
    df: DataFrame, score_col: str, label_col: str, tie_col: str, k: int = 100
) -> DataFrame:
    """Exact binary nDCG@k under the DEFINED total order (score desc,
    tie_col asc) — the graded companion to `average_precision` (AP
    integrates precision; nDCG discounts by position, the retrieval
    -leaderboard standard):

        DCG@k  = Σ_{r ≤ k, rel(r)} 1/log2(r+1)
        IDCG@k = Σ_{r ≤ min(k, n_pos)} 1/log2(r+1)

    Each position's gain is round(10⁶ / log2(r+1)) — integer BEFORE
    the sums, so both totals are order-independent and engine-exact.
    Returns one row: (k, n, n_pos, dcg_micro, idcg_micro, ndcg).

    SCALE: ranks the WHOLE input (one global sort window) — the
    `average_precision` contract: run it on evaluation slices, small
    by construction; corpus-scale ranking quality is auc_rank_sum's
    job. The IDCG arm is a sequence explode over min(k, n_pos) rows."""
    from pyspark.sql import Window

    w = Window.orderBy(F.col(score_col).desc(), F.col(tie_col))
    gain = lambda r: F.round(F.lit(1e6) / F.log2(r + 1)).cast("long")  # noqa: E731
    ranked = df.select(
        F.col(label_col).cast("int").alias("__y"),
        F.row_number().over(w).alias("__r"),
    )
    agg = ranked.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("__y").cast("long").alias("n_pos"),
        F.sum(
            F.when((F.col("__y") == 1) & (F.col("__r") <= k), gain(F.col("__r")))
        )
        .cast("long")
        .alias("dcg_micro"),
    )
    # n_pos = 0 guard: Spark's sequence(1, 0) generates the DESCENDING
    # [1, 0], whose r = 0 term divides by log2(1) = 0 — so the
    # zero-positive case must short-circuit to NULL (nDCG is undefined
    # with no relevant items; the SQL oracle's empty range() sums to
    # NULL the same way)
    ideal = agg.select(
        "n",
        "n_pos",
        "dcg_micro",
        F.when(
            F.col("n_pos") > 0,
            F.aggregate(
                F.sequence(
                    F.lit(1), F.least(F.lit(k), F.col("n_pos")).cast("int")
                ),
                F.lit(0).cast("long"),
                lambda acc, r: acc + gain(r),
            ),
        ).alias("idcg_micro"),
    )
    return ideal.select(
        F.lit(k).cast("long").alias("k"),
        "n",
        "n_pos",
        F.coalesce("dcg_micro", F.lit(0)).alias("dcg_micro"),
        "idcg_micro",
        F.round(F.coalesce("dcg_micro", F.lit(0)) / F.col("idcg_micro"), 6).alias(
            "ndcg"
        ),
    )


def mutual_information(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Exact mutual information between two categorical columns from
    the contingency table — the slice-diagnostics primitive ("how much
    does source predict language / quality flag / label?" — 0 nats =
    independent; high MI on a split column = leakage smell):

        MI = Σ_{x,y} p(x,y) · ln( p(x,y) / (p(x)·p(y)) )

    computed as Σ round(10⁶ · (c/n) · ln(c·n / (cx·cy))) over the
    OBSERVED cells (absent cells contribute 0 exactly), integer
    micro-nats per cell before the sum — order-independent,
    engine-exact. Returns one row: (n, n_cells, mi_micro, mi).

    SCALE: one partial-agg shuffle to the (x, y) contingency cells;
    the margins are two aggregates OVER THE CELL TABLE (broadcast
    back); nothing after the first groupBy touches a raw row. NULL
    categories count as regular values: groupBy keeps a NULL cell,
    and the margin joins are NULL-SAFE equality (a plain equi-join
    would silently drop NULL-keyed cells while n still counted their
    rows — r7 ADVICE)."""
    cells = df.groupBy(
        F.col(x_col).alias("__x"), F.col(y_col).alias("__y")
    ).agg(F.count("*").alias("__c"))
    mx = cells.groupBy(F.col("__x").alias("__mxk")).agg(
        F.sum("__c").alias("__cx")
    )
    my = cells.groupBy(F.col("__y").alias("__myk")).agg(
        F.sum("__c").alias("__cy")
    )
    tot = cells.agg(F.sum("__c").cast("long").alias("__n"))
    term = F.round(
        (F.col("__c") / F.col("__n"))
        * F.log(
            (F.col("__c").cast("double") * F.col("__n"))
            / (F.col("__cx").cast("double") * F.col("__cy"))
        )
        * 1e6
    ).cast("long")
    return (
        cells.join(
            F.broadcast(mx), F.col("__x").eqNullSafe(F.col("__mxk"))
        )
        .join(F.broadcast(my), F.col("__y").eqNullSafe(F.col("__myk")))
        .crossJoin(F.broadcast(tot))
        .agg(
            F.max("__n").alias("n"),
            F.count("*").cast("long").alias("n_cells"),
            F.sum(term).cast("long").alias("mi_micro"),
        )
        .select(
            "n",
            "n_cells",
            "mi_micro",
            F.round(F.col("mi_micro") / 1e6, 6).alias("mi"),
        )
    )


def percentile_rank_bp(
    df: DataFrame, col: str, out_col: str = "percentile_bp"
) -> DataFrame:
    """Annotate every row with the percentile rank of its `col` value
    in basis points: floor(10⁴ · |rows ≤ value| / n) — the
    corpus-relative normalization that turns a raw quality score into
    a mixture-invariant filter knob ("keep the top 20%" stays the top
    20% as the corpus grows; a fixed threshold does not).

    NO global row sort: one partial-agg shuffle reduces the corpus to
    per-DISTINCT-VALUE (value, cnt) cells; the cumulative count is a
    window over that cell table (the winsorize_bounds/auc_rank_sum
    discipline — pass a quantized/integer score so the cell table is
    domain-bounded), and the annotated result is a BROADCAST join of
    the cell table back onto the scan. Rows with NULL `col` get NULL
    percentile."""
    from pyspark.sql import Window

    if out_col in df.columns:
        raise ValueError(
            f"percentile_rank_bp: output column {out_col!r} already "
            "exists on the input"
        )
    cells = (
        df.where(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("__v"))
        .agg(F.count("*").alias("__c"))
    )
    w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
    cum = cells.withColumn("__cum", F.sum("__c").over(w))
    tot = cells.agg(F.sum("__c").alias("__n"))
    ranked = cum.crossJoin(F.broadcast(tot)).select(
        "__v",
        F.expr("div(10000 * __cum, __n)").cast("long").alias(out_col),
    )
    return df.join(
        F.broadcast(ranked), df[col] == ranked["__v"], "left"
    ).drop("__v")


def join_size_preflight(
    df_a: DataFrame, key_a: str, df_b: DataFrame, key_b: str, top_n: int = 5
) -> DataFrame:
    """EXACT inner-equi-join output size WITHOUT running the join —
    the pre-flight a 100 TB pipeline runs before committing shuffle
    budget: |A ⋈ B| = Σ_k cnt_A(k)·cnt_B(k), computed by joining the
    two KEY-COUNT tables (key-sized, not row-sized). Returns one row:

      (n_a, n_b, matched_keys, join_rows, max_key_rows, top_keys)

    join_rows is the exact output cardinality; max_key_rows is the
    largest single key's contribution (the straggler bound — if one
    key carries most of join_rows, use joins.salted_join);
    top_keys is the top-`top_n` contributors as 'key:rows' strings.

    SCALE: one partial-agg shuffle per side down to distinct keys, a
    key-keyed join of the two count tables, and a 1-row aggregate.
    skew_profile answers "is ONE side skewed"; this answers "what does
    the JOIN multiply that skew into" — products, not counts, decide
    the shuffle bill."""
    ca = df_a.groupBy(F.col(key_a).alias("__k")).agg(
        F.count("*").alias("__ca")
    )
    cb = df_b.groupBy(F.col(key_b).alias("__k")).agg(
        F.count("*").alias("__cb")
    )
    prod = ca.join(cb, "__k").select(
        "__k", (F.col("__ca") * F.col("__cb")).cast("long").alias("__rows")
    )
    tot_a = df_a.agg(F.count("*").cast("long").alias("n_a"))
    tot_b = df_b.agg(F.count("*").cast("long").alias("n_b"))
    top = prod.orderBy(F.col("__rows").desc(), F.col("__k")).limit(top_n)
    # deterministic ordering INSIDE the aggregate: collect_list order
    # after a shuffle is not contractual, so sort the collected structs
    # by (rows desc, key) rather than trusting arrival order
    top_str = top.agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            (-F.col("__rows")).alias("nr"),
                            F.col("__k").cast("string").alias("k"),
                            F.col("__rows").alias("r"),
                        )
                    )
                ),
                lambda s: F.concat_ws(
                    ":", s["k"], s["r"].cast("string")
                ),
            ),
            ",",
        ).alias("top_keys")
    )
    return (
        prod.agg(
            F.count("*").cast("long").alias("matched_keys"),
            F.coalesce(F.sum("__rows"), F.lit(0)).cast("long").alias("join_rows"),
            F.coalesce(F.max("__rows"), F.lit(0)).cast("long").alias("max_key_rows"),
        )
        .crossJoin(F.broadcast(tot_a))
        .crossJoin(F.broadcast(tot_b))
        .crossJoin(F.broadcast(top_str))
        .select(
            "n_a", "n_b", "matched_keys", "join_rows", "max_key_rows", "top_keys"
        )
    )


def quantile_bounds(
    df: DataFrame, col: str, qs: list[float]
) -> DataFrame:
    """1-row exact rank-based quantile values (value at rank ⌈q·n⌉)
    for a LIST of quantiles — `winsorize_bounds` generalized: same
    distinct-value-cell reduction, same single cumulative window over
    the domain-bounded cell table, k picks in one aggregate. Columns
    are q_<q·100 with dots stripped> (q_25, q_50, q_975). The 1-row
    result broadcasts — it is the edge artifact equal-frequency
    binning and robust scaling consume."""
    from pyspark.sql import Window

    if not qs:
        raise ValueError("quantile_bounds: qs must be non-empty")
    if len(set(qs)) != len(qs) or any(not (0 < q <= 1) for q in qs):
        raise ValueError(
            f"quantile_bounds: qs must be distinct values in (0, 1]: {qs}"
        )
    cells = (
        df.where(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("__v"))
        .agg(F.count("*").alias("__c"))
    )
    w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
    cum = cells.withColumn("__cum", F.sum("__c").over(w))
    tot = cells.agg(F.sum("__c").alias("__n"))
    picked = cum.crossJoin(F.broadcast(tot))

    def pick(q: float):
        name = f"q_{str(q * 100).rstrip('0').rstrip('.').replace('.', '_')}"
        return F.min(
            F.when(
                F.col("__cum") >= F.ceil(F.lit(q) * F.col("__n")).cast("long"),
                F.col("__v"),
            )
        ).alias(name)

    return picked.agg(*[pick(q) for q in qs])


def equifreq_bins(
    df: DataFrame, col: str, n_bins: int = 10, out_col: str = "bin"
) -> DataFrame:
    """Equal-frequency (quantile) binning: rows annotated with the
    0-based bin whose exact rank-quantile edges come from
    `quantile_bounds` — the feature-engineering discretization that
    stays balanced under any skew (equi-WIDTH histograms collapse on
    heavy-tailed prices; equi-frequency bins hold ~n/k rows each by
    construction, up to ties). bin = #edges strictly below the value
    (edges at q = i/k for i in 1..k−1), so ties share a bin
    deterministically. One cell-table pass for the edges (broadcast
    1-row) + a scan-side comparison fold; NULL values get NULL bins."""
    if n_bins < 2:
        raise ValueError("equifreq_bins: n_bins must be >= 2")
    edges = quantile_bounds(df, col, [i / n_bins for i in range(1, n_bins)])
    names = edges.columns
    b = F.lit(0)
    for name in names:
        b = b + F.when(F.col(col) > F.col(name), 1).otherwise(0)
    return (
        df.crossJoin(F.broadcast(edges))
        .withColumn(
            out_col,
            F.when(F.col(col).isNotNull(), b.cast("int")),
        )
        .drop(*names)
    )


def target_encoding(
    df: DataFrame,
    key_col: str,
    target_col: str,
    m: int = 20,
) -> DataFrame:
    """Smoothed target encoding table — the categorical-feature
    workhorse: enc(k) = (Σ_k target + m·prior) / (cnt_k + m), the
    Bayesian-average shrinkage that keeps rare categories from
    memorizing their few labels (m = the pseudo-count weight of the
    global prior). Returns one row per category: (key, n, sum_micro,
    enc_micro) with the target accumulated in integer micro-units
    BEFORE any division (order-independent, engine-exact) and enc in
    micro-units rounded once at the end.

    SCALE: one partial-agg shuffle to the category table; the global
    prior is a broadcast 1-row aggregate over it. The result is
    category-sized — the broadcast artifact a training pipeline joins
    back onto the scan (leave-one-out per-row variants derive from
    the same sums: (sum − y_i)/(n − 1 + m) scan-side)."""
    vm = F.round(F.col(target_col) * 1e6).cast("long")
    cat = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(vm).cast("long").alias("sum_micro"),
    )
    tot = cat.agg(
        F.sum("n").alias("__tn"), F.sum("sum_micro").alias("__ts")
    )
    enc = F.round(
        (F.col("sum_micro") + F.lit(m) * (F.col("__ts") / F.col("__tn")))
        / (F.col("n") + F.lit(m))
    ).cast("long")
    return (
        cat.crossJoin(F.broadcast(tot))
        .select("key", "n", "sum_micro", enc.alias("enc_micro"))
    )


def cohens_kappa(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Cohen's kappa between two MULTI-CLASS categorical columns — the
    k-category generalization of the binary `kappa_agreement` above
    (that one is a single 4-cell conditional-count pass; this one
    needs the full contingency table because the chance term sums over
    every category's margin product): chance-corrected agreement

        κ = (p_o − p_e) / (1 − p_e)
          = (agree·n − S) / (n² − S),   S = Σ_k row_k · col_k

    computed from three EXACT int64 aggregates (n, agree, S) — the one
    division happens once at the end, so the statistic is
    engine-deterministic. NULL labels count as a regular category
    (groupBy semantics + NULL-SAFE margin joins — the
    `mutual_information` r7-ADVICE discipline). Returns one row:
    (n, agree, s_chance, kappa_micro, kappa); kappa is NULL when the
    table is a single category on both sides (n² = S — chance
    agreement is total, κ undefined).

    Exactness bound: agree·n and n² must fit int64 — exact for
    n ≤ ~3·10⁹ rows; beyond that run per-slice (the statistic is for
    evaluation slices, not raw-corpus scans).

    SCALE: one partial-agg shuffle to the (a, b) contingency cells;
    margins and the product sum are aggregates over the CELL table."""
    cells = df.groupBy(
        F.col(a_col).alias("__a"), F.col(b_col).alias("__b")
    ).agg(F.count("*").alias("__c"))
    ra = cells.groupBy(F.col("__a").alias("__ka")).agg(
        F.sum("__c").cast("long").alias("__ra")
    )
    rb = cells.groupBy(F.col("__b").alias("__kb")).agg(
        F.sum("__c").cast("long").alias("__rb")
    )
    s = (
        ra.join(rb, F.col("__ka").eqNullSafe(F.col("__kb")))
        .agg(
            F.coalesce(F.sum(F.col("__ra") * F.col("__rb")), F.lit(0))
            .cast("long")
            .alias("__s")
        )
    )
    base = cells.agg(
        F.sum("__c").cast("long").alias("n"),
        F.coalesce(
            F.sum(
                F.when(F.col("__a").eqNullSafe(F.col("__b")), F.col("__c"))
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("agree"),
    )
    kappa_micro = F.round(
        (F.col("agree").cast("double") * F.col("n") - F.col("__s"))
        / F.nullif(
            F.col("n").cast("double") * F.col("n") - F.col("__s"), F.lit(0.0)
        )
        * 1e6
    ).cast("long")
    return base.crossJoin(F.broadcast(s)).select(
        "n",
        "agree",
        F.col("__s").alias("s_chance"),
        kappa_micro.alias("kappa_micro"),
        F.round(kappa_micro / 1e6, 6).alias("kappa"),
    )


def expected_calibration_error(
    df: DataFrame,
    score_col: str,
    label_col: str,
    bins: int = 10,
    lo: float = 0.0,
    hi: float = 1.0,
) -> DataFrame:
    """One-row ECE over the `calibration_bins` cells (rides the
    existing operator — same bin arithmetic, same micro-unit sums):

        ECE = (1/n) · Σ_bins |n_pos_b − sum_score_b/10⁶|
            (= Σ (n_b/n) · |accuracy_b − confidence_b|)

    computed as round(Σ_b |10⁶·n_pos_b − sum_score_micro_b| / n) in
    micro-units — every term is an exact int64; the single division
    happens once. Returns (n, n_bins_used, ece_micro, ece). Rows with
    NULL score are excluded (they have no bin).

    SCALE: one partial-agg shuffle to ≤ bins cells, then a 1-row
    aggregate over the cells."""
    cells = calibration_bins(
        df.where(F.col(score_col).isNotNull()),
        score_col,
        label_col,
        bins,
        lo,
        hi,
    )
    term = F.abs(
        F.lit(1000000) * F.col("n_pos") - F.col("sum_score_micro")
    )
    ece_micro = F.round(
        F.sum(term) / F.nullif(F.sum("n").cast("double"), F.lit(0.0))
    ).cast("long")
    return cells.agg(
        # empty cell table (every score NULL / empty input) → n = 0
        # with NULL ece, not a NULL-n row
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n"),
        F.count("*").cast("long").alias("n_bins_used"),
        ece_micro.alias("ece_micro"),
    ).select(
        "n",
        "n_bins_used",
        "ece_micro",
        F.round(F.col("ece_micro") / 1e6, 6).alias("ece"),
    )


def importance_ess(
    df: DataFrame, weight_col: str, group_col: str
) -> DataFrame:
    """Effective sample size of an importance-weighted mixture, per
    group — the diagnostic that tells a data-mixture reweighting
    whether a slice's weights have collapsed onto a few rows
    (ESS ≪ n ⇒ the reweighted slice behaves like a tiny sample and
    its gradient/statistics are high-variance):

        ESS = (Σw)² / Σw²      (Kish effective sample size)

    Weights are quantized to MILLI-units (floor — identical on every
    engine) so both sums are exact int64; the final ratio is one
    double division. Returns (group, n, s1_milli, s2_milli2,
    ess_milli, ess_ratio_micro) where ess_ratio_micro =
    round(10⁶·ESS/n) (1e6 = unweighted). NULL weights are excluded.
    Weights are assumed ≥ 0 (importance weights by definition);
    negative weights are not rejected — the formula still evaluates —
    but the ESS interpretation does not apply to them. Exactness
    bound: n·(1000·w_max)² < 2⁶³, i.e. milli-exactness to ~10⁹ rows
    of weights ≤ 2000; shard larger slices or rescale first.

    SCALE: ONE partial-agg shuffle to per-group sums; nothing after
    the groupBy touches a raw row."""
    wm = F.floor(F.col(weight_col) * 1000).cast("long")
    g = (
        df.where(F.col(weight_col).isNotNull())
        .groupBy(F.col(group_col).alias("group"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(wm).cast("long").alias("s1_milli"),
            F.sum(wm * wm).cast("long").alias("s2_milli2"),
        )
    )
    ess_milli = F.round(
        F.lit(1000.0)
        * F.col("s1_milli")
        * F.col("s1_milli")
        / F.nullif(F.col("s2_milli2").cast("double"), F.lit(0.0))
    ).cast("long")
    return g.select(
        "group",
        "n",
        "s1_milli",
        "s2_milli2",
        ess_milli.alias("ess_milli"),
        F.round(
            F.lit(1000000.0)
            * F.col("s1_milli")
            * F.col("s1_milli")
            / F.nullif(F.col("s2_milli2").cast("double"), F.lit(0.0))
            / F.col("n")
        )
        .cast("long")
        .alias("ess_ratio_micro"),
    )


def filter_attrition(
    df: DataFrame, stages: list[tuple[str, Column]]
) -> DataFrame:
    """Pipeline attrition report for an ORDERED filter chain — the
    per-stage survival table every corpus-prep run publishes ("raw →
    length gate → lang gate → quality gate" with counts), computed in
    ONE aggregate pass (the `validate` discipline: each stage is two
    conditional sums, so N stages cost one scan + one 1-row merge,
    never N scans).

    `stages` is [(name, keep_predicate_Column)] in pipeline order.
    Output is tall, one row per stage plus a stage-0 'input' row:

      (stage_idx, stage, n_pass, n_surviving, retained_bp)

    where n_pass counts rows passing THIS predicate alone (the
    stage's standalone selectivity — reorder diagnostics), n_surviving
    counts rows passing ALL stages up to and including this one (the
    actual pipeline attrition; predicates short-circuit in order), and
    retained_bp = floor(10⁴ · n_surviving / n_rows). NULL predicate
    values count as False (a filter that cannot decide drops the
    row — the conservative corpus-prep reading)."""
    if not stages:
        raise ValueError("filter_attrition: need at least one stage")
    aggs = [F.count(F.lit(1)).alias("__n")]
    cum = None
    for i, (_, pred) in enumerate(stages):
        p = F.coalesce(pred, F.lit(False))
        cum = p if cum is None else (cum & p)
        aggs.append(
            F.sum(F.when(p, 1).otherwise(0)).cast("long").alias(f"__p{i}")
        )
        aggs.append(
            F.sum(F.when(cum, 1).otherwise(0)).cast("long").alias(f"__s{i}")
        )
    wide = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(0).alias("stage_idx"),
            F.lit("input").alias("stage"),
            F.col("__n").cast("long").alias("n_pass"),
            F.col("__n").cast("long").alias("n_surviving"),
        )
    ] + [
        F.struct(
            F.lit(i + 1).alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.col(f"__p{i}").alias("n_pass"),
            F.col(f"__s{i}").alias("n_surviving"),
        )
        for i, (name, _) in enumerate(stages)
    ]
    tall = F.explode(F.array(*rows)).alias("r")
    return wide.select(tall, F.col("__n").alias("__nr")).select(
        F.col("r.stage_idx").alias("stage_idx"),
        F.col("r.stage").alias("stage"),
        F.col("r.n_pass").alias("n_pass"),
        F.col("r.n_surviving").alias("n_surviving"),
        F.floor(
            F.lit(10000) * F.col("r.n_surviving")
            / F.nullif(F.col("__nr").cast("double"), F.lit(0.0))
        )
        .cast("long")
        .alias("retained_bp"),
    )


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
    sensitive_col: str | None = None,
    l_threshold: int | None = None,
) -> DataFrame:
    """Privacy audit before a corpus/table leaves the pipeline
    (Sweeney 2002 k-anonymity; Machanavajjhala et al. 2007
    l-diversity): every row's quasi-identifier combination
    (`quasi_cols`) defines an equivalence class; a class smaller than
    `k` re-identifies its members by linkage, and — when
    `sensitive_col` is given — a class with fewer than `l_threshold`
    distinct sensitive values leaks the sensitive attribute even at
    size ≥ k (the homogeneity attack k-anonymity alone misses;
    l_threshold defaults to k).

    One-row exact report:
      (n_rows, n_classes, min_class_size, n_violating_classes,
       rows_at_risk[, min_l_diversity, n_low_diversity_classes,
       rows_low_diversity])

    NULL quasi-identifier values group together (NULL zip is itself a
    linkable value — the conservative reading, matching groupBy
    semantics on both engines).

    SCALE: one partial-agg shuffle to the CLASS table (distinct
    quasi-combinations — bounded by the identifier domain, not row
    count), then a 1-row aggregate over it; the l-diversity variant
    groups by (class, sensitive) first, still class-domain-sized.
    Emitting the aggregate report instead of the violating-class list
    keeps the output driver-safe at any scale; joining the class table
    back to rows for suppression is one broadcast join away."""
    if not quasi_cols:
        raise ValueError("k_anonymity_report: need at least one quasi col")
    if sensitive_col is None:
        classes = df.groupBy(*quasi_cols).agg(
            F.count(F.lit(1)).alias("__n")
        )
        return classes.agg(
            F.sum("__n").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.min("__n").cast("long").alias("min_class_size"),
            F.sum(F.when(F.col("__n") < k, 1).otherwise(0))
            .cast("long")
            .alias("n_violating_classes"),
            F.sum(F.when(F.col("__n") < k, F.col("__n")).otherwise(0))
            .cast("long")
            .alias("rows_at_risk"),
        )
    l_min = k if l_threshold is None else l_threshold
    cells = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count(F.lit(1)).alias("__c")
    )
    classes = cells.groupBy(*quasi_cols).agg(
        F.sum("__c").alias("__n"), F.count(F.lit(1)).alias("__l")
    )
    return classes.agg(
        F.sum("__n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("__n").cast("long").alias("min_class_size"),
        F.sum(F.when(F.col("__n") < k, 1).otherwise(0))
        .cast("long")
        .alias("n_violating_classes"),
        F.sum(F.when(F.col("__n") < k, F.col("__n")).otherwise(0))
        .cast("long")
        .alias("rows_at_risk"),
        F.min("__l").cast("long").alias("min_l_diversity"),
        F.sum(F.when(F.col("__l") < l_min, 1).otherwise(0))
        .cast("long")
        .alias("n_low_diversity_classes"),
        F.sum(F.when(F.col("__l") < l_min, F.col("__n")).otherwise(0))
        .cast("long")
        .alias("rows_low_diversity"),
    )
