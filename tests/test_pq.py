"""Product quantization: training determinism, compression contract,
retrieval quality vs exact brute force."""

import pytest
from pyspark.sql import functions as F

from parkour_spark.dataset import load_table
from parkour_spark.operators.pq import pq_adc_topk, pq_encode, pq_train
from parkour_spark.operators.similarity import brute_force_topk

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="module")
def codebooks(emb):
    return pq_train(emb, m=4, ksub=8, iters=2)


def test_codebook_shape(codebooks):
    assert len(codebooks) == 4
    for cb in codebooks:
        assert [c for c, _ in cb] == list(range(8))
        assert all(len(v) == 16 for _, v in cb)


def test_codes_partition_layout_independent(emb, codebooks):
    """Scan-side assignment: the codes must not depend on how the corpus
    is partitioned."""
    a = {
        r["vec_id"]: tuple(r["codes"])
        for r in pq_encode(emb, codebooks).collect()
    }
    b = {
        r["vec_id"]: tuple(r["codes"])
        for r in pq_encode(emb.repartition(7), codebooks).collect()
    }
    assert a == b
    assert len(a) == emb.count()
    assert all(len(c) == 4 and all(0 <= x < 8 for x in c) for c in a.values())


def test_train_deterministic(emb, codebooks):
    again = pq_train(emb.repartition(5), m=4, ksub=8, iters=2)
    for cb1, cb2 in zip(codebooks, again):
        for (c1, v1), (c2, v2) in zip(cb1, cb2):
            assert c1 == c2
            assert v1 == pytest.approx(v2, abs=1e-9)


def test_adc_finds_planted_neighbors(spark, emb, codebooks):
    """The quality contract that matters: a GENUINE near-duplicate
    (planted perturbed copy, cos ≈ 0.989) must surface through the
    4-byte codes. The raw synthetic corpus is near-uniform random — all
    cosines concentrate near 0, so its top-10 ranking is noise-margin
    and PQ recall there is bounded by the data, not the method (same
    adjudication as embedding_neardup_blocked's planted-pair corpus)."""
    planted = emb.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            F.zip_with(
                "embedding",
                F.concat(F.slice("embedding", 2, 63), F.slice("embedding", 1, 1)),
                lambda a, b: a + F.lit(0.15) * b,
            ),
            lambda x: x.cast("float"),
        ).alias("embedding"),
        "label",
    )
    corpus = emb.select("vec_id", "embedding", "label").unionByName(planted)
    cbs = pq_train(corpus, m=4, ksub=8, iters=2)
    queries = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.where(F.col("vec_id") < 5).collect()
    ]
    approx = pq_adc_topk(corpus, cbs, queries, k=5)
    got = {}
    for r in approx.collect():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    # self and its planted twin both in the ADC top-5 (ties with
    # code-colliding strangers can push past rank 2, not past 5)
    hits = sum(
        (q in got[q]) + (q + 100000 in got[q]) for q in got
    )
    assert hits >= 8, {q: sorted(v) for q, v in got.items()}


def test_adc_beats_noise_floor(spark, emb, codebooks):
    """On the random corpus the ADC top-10 still overlaps the exact
    top-10 far above chance (10/500 = 2%); the measured floor at this
    code size is ~20%."""
    queries = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.where(F.col("vec_id") < 5).collect()
    ]
    approx = pq_adc_topk(emb, codebooks, queries, k=10)
    qdf = spark.createDataFrame(
        [(q, v) for q, v in queries], "query_id long, query_vec array<double>"
    )
    exact = brute_force_topk(emb, qdf, k=10)
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    assert len(a & e) / len(e) >= 0.1, len(a & e) / len(e)


def test_ivfpq_finds_planted_neighbors(spark, emb):
    """IVF-PQ through 4 residual bytes must surface a planted cos≈0.989
    twin (small L2 distance after normalization differences) for most
    queries — and never return a candidate outside the probed cells."""
    from parkour_spark.operators.pq import (
        ivfpq_topk,
        kmeans_l2,
        pq_train,
        residual_df,
    )

    planted = emb.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            F.zip_with(
                "embedding",
                F.concat(F.slice("embedding", 2, 63), F.slice("embedding", 1, 1)),
                lambda a, b: a + F.lit(0.05) * b,
            ),
            lambda x: x.cast("float"),
        ).alias("embedding"),
        "label",
    )
    corpus = emb.select("vec_id", "embedding", "label").unionByName(planted)
    coarse = kmeans_l2(corpus, k=8, iters=2)
    res = residual_df(corpus, coarse).select("vec_id", F.col("res").alias("embedding"))
    cbs = pq_train(res, m=4, ksub=8, iters=2)
    queries = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.where(F.col("vec_id") < 5).collect()
    ]
    got = {}
    for r in ivfpq_topk(corpus, coarse, cbs, queries, k=5, nprobe=2).collect():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = sum((q in got.get(q, ())) + (q + 100000 in got.get(q, ())) for q, _ in queries)
    assert hits >= 6, {q: sorted(v) for q, v in got.items()}


def test_ivfpq_residuals_tighter_than_raw(spark, emb, codebooks):
    """The IVF-PQ justification: quantizing residuals gives lower
    reconstruction error than quantizing raw vectors with the same
    code budget."""
    import numpy as np

    from parkour_spark.operators.pq import (
        _np_codebooks,
        _assign_codes,
        kmeans_l2,
        pq_train,
        residual_df,
    )

    V = np.stack([np.array(r["embedding"], dtype=np.float64)
                  for r in emb.orderBy("vec_id").collect()])

    def recon_err(vectors, cbs_list):
        cbs = _np_codebooks(cbs_list)
        codes = _assign_codes(vectors, cbs)
        dsub = cbs[0].shape[1]
        err = 0.0
        for s, C in enumerate(cbs):
            diff = vectors[:, s * dsub:(s + 1) * dsub] - C[codes[:, s]]
            err += (diff ** 2).sum()
        return err

    raw_err = recon_err(V, codebooks)
    coarse = kmeans_l2(emb, k=8, iters=2)
    res_rows = residual_df(emb, coarse).orderBy("vec_id").collect()
    R = np.stack([np.array(r["res"], dtype=np.float64) for r in res_rows])
    res_cbs = pq_train(
        residual_df(emb, coarse).select("vec_id", F.col("res").alias("embedding")),
        m=4, ksub=8, iters=2,
    )
    assert recon_err(R, res_cbs) < raw_err
