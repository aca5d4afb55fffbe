"""Round-7 operators: PCA moment cells, PSI drift, nDCG, mutual
information, pseudonymization, negative-sampling weights, clustering
coefficient."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------------
# PCA: covariance cells + components + projection
# ------------------------------------------------------------------

def _vecs():
    rng = np.random.default_rng(7)
    return rng.normal(size=(40, 5)).astype(np.float32)


def test_covariance_cells_match_numpy_exactly(spark):
    from parkour_spark.operators.pca import covariance_cells

    x = _vecs()
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>",
    )
    q = np.floor(x.astype(np.float64) * 1000).astype(np.int64)
    want = {}
    gram = q.T @ q
    d = q.shape[1]
    for i in range(d):
        for j in range(i, d):
            want[(i, j)] = int(gram[i, j])
        want[(i, -1)] = int(q[:, i].sum())
    want[(-1, -1)] = len(q)
    got = {
        (r.i, r.j): r.s for r in covariance_cells(df, "embedding").collect()
    }
    assert got == want


def test_covariance_cells_skip_null_and_empty(spark):
    from parkour_spark.operators.pca import covariance_cells

    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, None), (2, [])],
        "vec_id long, embedding array<float>",
    )
    got = {(r.i, r.j): r.s for r in covariance_cells(df, "embedding").collect()}
    assert got[(-1, -1)] == 1
    assert got[(0, 1)] == 1000 * 2000


def test_pca_components_match_numpy_eigh(spark):
    from parkour_spark.operators.pca import covariance_cells, pca_components

    x = _vecs()
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>",
    )
    comps, vals, mean = pca_components(df, "embedding", k=3)
    q = np.floor(x.astype(np.float64) * 1000) / 1000.0
    cov = np.cov(q.T, ddof=1)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:3]
    assert np.allclose(sorted(vals, reverse=True), sorted(w[order], reverse=True), atol=1e-9)
    for c, o in zip(comps, order):
        ref = v[:, o]
        # sign-canonical comparison
        assert np.allclose(np.abs(c), np.abs(ref), atol=1e-9)
    assert np.allclose(mean, q.mean(axis=0), atol=1e-12)
    # variance is captured in descending order
    assert vals == sorted(vals, reverse=True)


def test_pca_project_is_centered_dot_product(spark):
    from parkour_spark.operators.pca import project

    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0]), (1, [4.0, 5.0, 6.0])],
        "vec_id long, embedding array<float>",
    )
    comps = [[1.0, 0.0, 0.0], [0.0, 0.0, 2.0]]
    mean = [1.0, 1.0, 1.0]
    rows = {r.vec_id: r.pca for r in project(df, comps, mean).collect()}
    assert rows[0] == pytest.approx([0.0, 4.0])
    assert rows[1] == pytest.approx([3.0, 10.0])


def test_covariance_single_exchange_plan(spark):
    from parkour_spark.operators.pca import covariance_cells

    df = spark.createDataFrame(
        [(0, [1.0, 2.0])], "vec_id long, embedding array<float>"
    )
    plan = (
        covariance_cells(df, "embedding")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # cells shuffle once for the final groupBy; no join, no window
    assert plan.count("Exchange") <= 2, plan  # AQE may add a read stage
    assert "Join" not in plan, plan


# ------------------------------------------------------------------
# PSI
# ------------------------------------------------------------------

def test_psi_zero_for_identical_slices(spark):
    from parkour_spark.operators.validate import psi_stat

    df = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    row = psi_stat(df, df, "x", 0.0, 100.0, 10).collect()[0]
    assert row["psi_micro"] == 0
    assert row["n_a"] == row["n_b"] == 100


def test_psi_matches_hand_computation(spark):
    from parkour_spark.operators.validate import psi_stat

    a = spark.createDataFrame([(1.0,)] * 8 + [(6.0,)] * 2, "x double")
    b = spark.createDataFrame([(1.0,)] * 3 + [(6.0,)] * 7, "x double")
    row = psi_stat(a, b, "x", 0.0, 10.0, 2).collect()[0]
    want = 0
    for ca, cb in [(8, 3), (2, 7)]:
        pa, pb = (ca + 1) / 12, (cb + 1) / 12
        want += round((pa - pb) * math.log(pa / pb) * 1e6)
    assert row["psi_micro"] == want


def test_psi_smoothing_counts_empty_buckets(spark):
    from parkour_spark.operators.validate import psi_stat

    # all mass in bucket 0 on both sides, but n_a != n_b: the 9 empty
    # buckets each contribute (1/(n_a+10) - 1/(n_b+10))·ln(...) != 0
    a = spark.createDataFrame([(0.5,)] * 10, "x double")
    b = spark.createDataFrame([(0.5,)] * 90, "x double")
    row = psi_stat(a, b, "x", 0.0, 10.0, 10).collect()[0]
    pa, pb = 1 / 20, 1 / 100
    empty_term = round((pa - pb) * math.log(pa / pb) * 1e6)
    pa0, pb0 = 11 / 20, 91 / 100
    full_term = round((pa0 - pb0) * math.log(pa0 / pb0) * 1e6)
    assert row["psi_micro"] == full_term + 9 * empty_term


# ------------------------------------------------------------------
# nDCG
# ------------------------------------------------------------------

def test_ndcg_perfect_ranking_is_one(spark):
    from parkour_spark.operators.validate import ndcg_at_k

    rows = [(i, 100 - i, i < 5) for i in range(20)]  # top-5 scores are rel
    df = spark.createDataFrame(rows, "id long, s long, y boolean")
    r = ndcg_at_k(df, "s", "y", "id", k=10).collect()[0]
    assert r["dcg_micro"] == r["idcg_micro"]
    assert r["ndcg"] == 1.0
    assert r["n_pos"] == 5


def test_ndcg_matches_hand_computation(spark):
    from parkour_spark.operators.validate import ndcg_at_k

    # relevant docs at ranks 2 and 4 of 5; k=5, n_pos=2
    rows = [(1, 50, False), (2, 40, True), (3, 30, False), (4, 20, True), (5, 10, False)]
    df = spark.createDataFrame(rows, "id long, s long, y boolean")
    r = ndcg_at_k(df, "s", "y", "id", k=5).collect()[0]
    g = lambda rank: round(1e6 / math.log2(rank + 1))  # noqa: E731
    assert r["dcg_micro"] == g(2) + g(4)
    assert r["idcg_micro"] == g(1) + g(2)
    assert r["ndcg"] == round((g(2) + g(4)) / (g(1) + g(2)), 6)


def test_ndcg_zero_when_no_hits_in_k(spark):
    from parkour_spark.operators.validate import ndcg_at_k

    rows = [(i, 100 - i, i >= 8) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, s long, y boolean")
    r = ndcg_at_k(df, "s", "y", "id", k=3).collect()[0]
    assert r["dcg_micro"] == 0 and r["ndcg"] == 0.0


# ------------------------------------------------------------------
# Mutual information
# ------------------------------------------------------------------

def test_mi_zero_for_independent_columns(spark):
    from parkour_spark.operators.validate import mutual_information

    rows = [(x, y) for x in "ab" for y in "cd" for _ in range(10)]
    df = spark.createDataFrame(rows, "x string, y string")
    r = mutual_information(df, "x", "y").collect()[0]
    assert r["mi_micro"] == 0 and r["n"] == 40 and r["n_cells"] == 4


def test_mi_equals_entropy_for_identical_columns(spark):
    from parkour_spark.operators.validate import mutual_information

    rows = [("a", "a")] * 50 + [("b", "b")] * 50
    df = spark.createDataFrame(rows, "x string, y string")
    r = mutual_information(df, "x", "y").collect()[0]
    # MI(X, X) = H(X) = ln 2 for a fair coin; terms round per-cell
    assert r["mi_micro"] == 2 * round(0.5 * math.log(2) * 1e6)


# ------------------------------------------------------------------
# Pseudonymization
# ------------------------------------------------------------------

def test_pseudonymize_stable_salted_and_null_safe(spark):
    from parkour_spark.functions.text import pseudonymize

    df = spark.createDataFrame([(1,), (1,), (2,), (None,)], "uid long")
    out = df.select(
        pseudonymize("uid", "s1").alias("p1"),
        pseudonymize("uid", "s2").alias("p2"),
    ).collect()
    p1 = [r.p1 for r in out]
    assert p1[0] == p1[1] and p1[0] != p1[2]  # stable, injective-ish
    assert out[0].p1 != out[0].p2  # different salts unlink
    assert out[3].p1 is None  # NULL ids stay NULL
    assert len(p1[0]) == 16


# ------------------------------------------------------------------
# Negative-sampling weights
# ------------------------------------------------------------------

def test_negative_sampling_weights_formula_and_head(spark):
    from parkour_spark.operators.corpus import negative_sampling_weights

    docs = spark.createDataFrame(
        [(1, "a a a a a a a a b b b c")], "doc_id long, text string"
    )
    rows = {
        r.term: (r.cnt, r.weight_micro)
        for r in negative_sampling_weights(docs).collect()
    }
    assert rows["a"] == (8, 1_000_000)  # max term: ratio 1 -> 1e6
    assert rows["b"] == (3, math.floor(1e6 * (3 / 8) ** 0.75))
    assert rows["c"] == (1, math.floor(1e6 * (1 / 8) ** 0.75))
    top = negative_sampling_weights(docs, top_n=2).collect()
    assert {r.term for r in top} == {"a", "b"}


# ------------------------------------------------------------------
# Clustering coefficient
# ------------------------------------------------------------------

def test_clustering_coefficient_triangle_plus_pendant(spark):
    from parkour_spark.operators.graph import clustering_coefficient

    # triangle 1-2-3 plus pendant 4 hanging off 1
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (1, 4)], "id_a long, id_b long"
    )
    rows = {
        r.node: (r.degree, r.n_triangles, r.lcc_micro)
        for r in clustering_coefficient(edges).collect()
    }
    assert rows[2] == (2, 1, 1_000_000)  # both neighbors connected
    assert rows[3] == (2, 1, 1_000_000)
    assert rows[1] == (3, 1, 2_000_000 // 6)  # 1 of 3 neighbor pairs
    assert rows[4] == (1, 0, 0)  # degree-1: defined as 0
