"""Exact second-moment statistics and PCA over embedding columns.

The dimensionality-reduction prerequisite for a 100 TB embedding
corpus: whitening, variance diagnostics, and PCA projection all start
from the d×d second-moment matrix — which is a PERFECT fit for Spark's
partial aggregation, because X'X = Σ_partitions (X_p)'(X_p). Each Arrow
batch folds to one d×d integer cell block via a NumPy matmul; only
partitions×O(d²) cells ever shuffle, never rows.

Exactness discipline (house rules): embedding components quantize to
integer milli-units with floor(x·scale) — float32→double widening is
exact, the multiply and floor are IEEE-deterministic, so Spark and the
DuckDB oracle agree on every cell bit-for-bit; all cross-row sums are
BIGINT. The eigen-decomposition (driver-side, d×d) is the only float
step, and it never participates in an oracle.

Overflow headroom: |q| ≤ scale·max|x|; a cell sum is bounded by
n·(scale·max|x|)². With unit-norm-ish embeddings (|x| ≤ 1) and the
default scale=1000, int64 holds n up to ~9·10¹² rows — beyond a 100 TB
corpus; raise the scale only for small corpora where the extra
precision matters.

Reference parity: the reference builds sparse matrices for exactly
this downstream stage (examples/parkour/example/matrixify.clj:1-80 —
two-phase index + entry emission); the Spark-first extension is
partial-agg moment cells + a driver-side d×d solve, the same split as
operators/regress.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from parkour_spark.operators.sort import widen_scan


def quantize_vec(vec_col: str | Column, scale: int = 1000) -> Column:
    """array<float> → array<long> milli-units: floor(double(x)·scale).
    floor, not round — no tie to resolve, identical on every engine."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.transform(
        c, lambda x: F.floor(x.cast("double") * F.lit(scale)).cast("long")
    )


def covariance_cells(
    df: DataFrame,
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """Exact integer second-moment cells of the quantized embedding
    matrix, long form: (i, j, s) with

      - 0 ≤ i ≤ j < d : s = Σ_rows q_i·q_j   (upper triangle of Q'Q)
      - (i, -1)       : s = Σ_rows q_i       (column sums, for centering)
      - (-1, -1)      : s = n                (row count)

    From these, mean/covariance/correlation are driver-side arithmetic:
    sample covariance cov_ij = (s_ij − s_i·s_j/n) / ((n−1)·scale²) up
    to the quantization step — see `pca_components` (which uses the
    conventional n−1 normalizer; divide by n·scale² instead for the
    population form).

    SCALE: ONE scan. Each Arrow batch collapses to d(d+1)/2 + d + 1
    cells via a NumPy int64 matmul inside `mapInPandas`; the only
    shuffle is the cell groupBy — batches×O(d²) rows, independent of
    corpus size. NULL/empty vectors are excluded (counted rows are
    exactly the rows that contributed)."""
    import numpy as np
    import pandas as pd

    q = df.where(
        F.col(vec_col).isNotNull() & (F.size(vec_col) > 0)
    ).select(quantize_vec(vec_col, scale).alias("__q"))

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.asarray(pdf["__q"].to_list(), dtype=np.int64)
            d = mat.shape[1]
            gram = mat.T @ mat  # int64, exact
            iu = np.triu_indices(d)
            yield pd.DataFrame(
                {
                    "i": np.concatenate(
                        [iu[0], np.arange(d), np.array([-1])]
                    ).astype(np.int32),
                    "j": np.concatenate(
                        [iu[1], np.full(d, -1), np.array([-1])]
                    ).astype(np.int32),
                    "s": np.concatenate(
                        [
                            gram[iu],
                            mat.sum(axis=0),
                            np.array([len(mat)]),
                        ]
                    ).astype(np.int64),
                }
            )

    cells = widen_scan(q).mapInPandas(gen, schema="i int, j int, s long")
    return cells.groupBy("i", "j").agg(F.sum("s").cast("long").alias("s"))


def pca_components(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    scale: int = 1000,
) -> tuple[list[list[float]], list[float], list[float]]:
    """Top-k principal components from the exact moment cells: collect
    the O(d²) cell table (the ONLY driver action — d×d, never rows),
    assemble the covariance of the quantized matrix, eigh, return
    (components[k][d], eigenvalues[k], mean[d]) in ORIGINAL units
    (de-scaled). Deterministic up to eigenvector sign; signs are
    canonicalized so each component's largest-|coord| entry is ≥ 0."""
    import numpy as np

    rows = covariance_cells(df, vec_col, scale).collect()
    # empty input yields an empty cell table; a bare next() would raise
    # an opaque StopIteration (the fit_linear ADVICE class)
    n = next((r.s for r in rows if r.i == -1 and r.j == -1), 0)
    if n < 2:
        raise ValueError("pca_components: need at least 2 rows")
    d = max(r.i for r in rows) + 1
    sums = np.zeros(d)
    gram = np.zeros((d, d))
    for r in rows:
        if r.i == -1:
            continue
        if r.j == -1:
            sums[r.i] = r.s
        else:
            gram[r.i][r.j] = r.s
            gram[r.j][r.i] = r.s
    cov = (gram - np.outer(sums, sums) / n) / ((n - 1) * float(scale) ** 2)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T
    flips = np.sign(comps[np.arange(len(order)), np.abs(comps).argmax(axis=1)])
    flips[flips == 0] = 1.0
    comps = comps * flips[:, None]
    mean = sums / n / float(scale)
    return (
        [[float(x) for x in c] for c in comps],
        [float(vals[o]) for o in order],
        [float(m) for m in mean],
    )


def project(
    df: DataFrame,
    components: list[list[float]],
    mean: list[float],
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Scan-side PCA projection: out[c] = Σ_d comp[c][d]·(x[d]−mean[d]).
    Components inline as array literals (k·d floats — driver constants,
    the hyperplane-LSH precedent); zero shuffle, zero Python."""
    comps = F.array(
        *[
            F.array(*[F.lit(float(x)) for x in comp])
            for comp in components
        ]
    )
    mu = F.array(*[F.lit(float(m)) for m in mean])
    centered = F.zip_with(
        F.transform(F.col(vec_col), lambda x: x.cast("double")),
        mu,
        lambda x, m: x - m,
    )
    proj = F.transform(
        comps,
        lambda comp: F.aggregate(
            F.zip_with(comp, centered, lambda c, x: c * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    return df.withColumn(out_col, proj)
