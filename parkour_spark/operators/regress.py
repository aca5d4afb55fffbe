"""Distributed least-squares over corpus features: exact integer moment
matrices + a k×k driver-side solve.

Beyond-reference surface (the reference — damballa/parkour — stops at
grouped reduces; the closest analog is a hand-written combine/reduce
pair over src/clojure/parkour/graph.clj:116-149). This is the standard
"train a linear quality regressor / calibration model on per-document
features" step of a training-data pipeline, expressed the only way that
is exact AND single-pass at 100 TB:

    X'X and X'y are SUMS of per-row outer products, so they ride
    Spark's partial aggregation: each task folds its partition into
    d(d+1)/2 + d scalars, the shuffle moves only those cells (one row
    TOTAL after the final merge), and the d×d solve happens on the
    driver with numpy — d is feature count (tens), never data size.

Determinism: features and target are INTEGER columns (counts, lengths,
basis points — the engine's standard integer-unit discipline), so every
moment is an exact int64 sum — associative, partition-order-independent,
bit-identical in any engine. No float enters until the driver-side
solve. int64 bounds: a moment overflows at Σ x_i·x_j > 2^63; with
typical count features (≤ 1e6 per row-product) that allows ~9e12 rows —
beyond that, pre-scale features or switch the internal sum to
DECIMAL(38,0) and cast the (still exact) result back.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _as_cols(feature_cols: list[str | Column]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in feature_cols]


def moment_matrix(
    df: DataFrame,
    feature_cols: list[str | Column],
    target_col: str | Column,
    intercept: bool = True,
) -> DataFrame:
    """Exact normal-equation moments in long form: one row per (i, j)
    with j ∈ [0, d) for the upper triangle of X'X (i ≤ j) and j = -1
    for X'y; feature 0 is the intercept column of ones when
    `intercept`. Output: (i, j, s) — all BIGINT, exact.

    ONE scan, ONE 1-row shuffle (partial agg folds each partition to
    the same d(d+1)/2 + d cells first)."""
    feats = [c.cast("long") for c in _as_cols(feature_cols)]
    if intercept:
        feats = [F.lit(1).cast("long")] + feats
    y = (F.col(target_col) if isinstance(target_col, str) else target_col).cast(
        "long"
    )
    aggs = []
    names = []
    for i, fi in enumerate(feats):
        for j, fj in enumerate(feats):
            if i <= j:
                aggs.append(
                    F.sum((fi * fj).cast("long")).alias(f"xx_{i}_{j}")
                )
                names.append((i, j))
        aggs.append(F.sum((fi * y).cast("long")).alias(f"xy_{i}"))
        names.append((i, -1))
    wide = df.agg(*aggs)
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                F.lit(j).alias("j"),
                F.col(f"xx_{i}_{j}" if j >= 0 else f"xy_{i}").alias("s"),
            )
            for i, j in names
        ]
    )
    return (
        wide.select(F.explode(cells).alias("c"))
        .select("c.i", "c.j", F.col("c.s").cast("long").alias("s"))
    )


def fit_linear(
    df: DataFrame,
    feature_cols: list[str | Column],
    target_col: str | Column,
    intercept: bool = True,
) -> list[float]:
    """Solve the normal equations from the exact moments: collect the
    d(d+1)/2 + d moment cells (one tiny driver action), assemble the
    symmetric X'X and X'y, and return the least-squares coefficients
    (numpy lstsq — rank-robust). Coefficient order matches
    `feature_cols`, intercept first when present."""
    import numpy as np

    rows = moment_matrix(df, feature_cols, target_col, intercept).collect()
    # F.sum over zero rows yields NULL moment cells; catching that here
    # turns an opaque numpy TypeError into a clear contract error
    # (r6 ADVICE)
    if any(r.s is None for r in rows):
        raise ValueError(
            "fit_linear: empty input (all moment sums are NULL) — "
            "a least-squares fit needs at least one row"
        )
    d = max(r.i for r in rows) + 1
    xtx = np.zeros((d, d))
    xty = np.zeros(d)
    for r in rows:
        if r.j == -1:
            xty[r.i] = r.s
        else:
            xtx[r.i][r.j] = r.s
            xtx[r.j][r.i] = r.s
    coef, *_ = np.linalg.lstsq(xtx, xty, rcond=None)
    return [float(c) for c in coef]


def predict(
    df: DataFrame,
    feature_cols: list[str | Column],
    coefs: list[float],
    intercept: bool = True,
    out_col: str = "pred",
) -> DataFrame:
    """Apply fitted coefficients as a pure scan-side Column expression
    (zero shuffle, zero Python): pred = Σ coef_k · x_k (+ coef_0)."""
    feats = _as_cols(feature_cols)
    cs = list(coefs)
    expr: Column = F.lit(cs.pop(0)) if intercept else F.lit(0.0)
    for c, fc in zip(cs, feats):
        expr = expr + F.lit(c) * fc.cast("double")
    return df.withColumn(out_col, expr)
