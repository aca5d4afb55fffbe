"""r11 serving-path additions: the batched multi-query BM25 probe
(one pruned scan serves a query batch) and FAISS-style refine over the
persisted IVF-PQ index (exact re-rank of the ADC candidate set)."""

import numpy as np
from pyspark.sql import functions as F

from parkour_spark.operators.textindex import (
    text_index_build,
    text_index_probe_bm25,
    text_index_probe_bm25_multi,
)


def _docs(spark, ids_texts):
    return spark.createDataFrame(ids_texts, "doc_id long, text string")


def _corpus(spark, n=20):
    rows = []
    for i in range(n):
        body = f"common words shared body {i} extra filler tail {i % 4}"
        if i % 5 == 0:
            body += " rareish token"
        rows.append((i, body))
    return _docs(spark, rows)


def test_multi_probe_single_query_equals_plain_probe(spark, tmp_path):
    idx = str(tmp_path / "idx")
    text_index_build(_corpus(spark), idx, n_buckets=4)
    terms = ["shared", "rareish", "zznope"]
    multi = text_index_probe_bm25_multi(spark, idx, [(7, terms)], k=6)
    plain = text_index_probe_bm25(spark, idx, terms, k=6)
    got = sorted(
        (r.doc_id, r.n_qterms, r.score_micro) for r in multi.collect()
    )
    ref = sorted(
        (r.doc_id, r.n_qterms, r.score_micro) for r in plain.collect()
    )
    assert got == ref and len(got) > 0
    assert {r.query_id for r in multi.collect()} == {7}


def test_multi_probe_batch_matches_per_query_probes(spark, tmp_path):
    idx = str(tmp_path / "idx")
    text_index_build(_corpus(spark), idx, n_buckets=4)
    batch = [(0, ["shared", "common"]), (1, ["rareish"]), (2, ["zznope"])]
    multi = text_index_probe_bm25_multi(spark, idx, batch, k=5).collect()
    for qid, terms in batch:
        got = sorted(
            (r.doc_id, r.n_qterms, r.score_micro)
            for r in multi
            if r.query_id == qid
        )
        ref = sorted(
            (r.doc_id, r.n_qterms, r.score_micro)
            for r in text_index_probe_bm25(spark, idx, terms, k=5).collect()
        )
        assert got == ref, qid
    assert all(r.query_id != 2 for r in multi), "absent-term query is empty"


def test_ivfpq_refined_full_candidates_equals_exact_search(spark, tmp_path):
    """With kprime = |corpus| the refine stage IS exact L2 search —
    pinned against a NumPy brute-force reference."""
    from parkour_spark.operators.pq import (
        ivfpq_index_build,
        ivfpq_probe_refined,
        kmeans_l2,
        pq_train,
        residual_df,
    )

    rng = [(i, [float((i * 7 + j * 3) % 11 - 5) for j in range(8)])
           for i in range(24)]
    emb = spark.createDataFrame(rng, "vec_id long, embedding array<float>")
    coarse = kmeans_l2(emb, k=4, iters=2)
    res = residual_df(emb, coarse)
    cbs = pq_train(res, vec_col="res", m=2, ksub=4, iters=2)
    idx = str(tmp_path / "idx")
    ivfpq_index_build(emb, coarse, cbs, idx)
    queries = [(100, [0.5] * 8), (101, [float(x) for x in range(8)])]
    got = ivfpq_probe_refined(
        spark, idx, emb, queries, k=5, kprime=24, nprobe=4
    ).collect()
    V = np.array([v for _, v in rng])
    ids = np.array([i for i, _ in rng])
    for qid, qv in queries:
        q = np.array(qv)
        d2 = ((V - q) ** 2).sum(axis=1).round(4)
        order = sorted(zip(d2, ids))[:5]
        mine = sorted(
            (r.rank, r.vec_id, r.exact_d2) for r in got if r.query_id == qid
        )
        assert [(v, d) for d, v in order] == [
            (r[1], r[2]) for r in mine
        ], qid


def test_ivfpq_refined_subset_of_adc_candidates(spark, tmp_path):
    from parkour_spark.operators.pq import (
        ivfpq_index_build,
        ivfpq_probe_refined,
        ivfpq_probe_topk,
        kmeans_l2,
        pq_train,
        residual_df,
    )

    rng = [(i, [float((i * 5 + j) % 9 - 4) for j in range(8)])
           for i in range(30)]
    emb = spark.createDataFrame(rng, "vec_id long, embedding array<float>")
    coarse = kmeans_l2(emb, k=4, iters=2)
    cbs = pq_train(residual_df(emb, coarse), vec_col="res", m=2, ksub=4,
                   iters=2)
    idx = str(tmp_path / "idx")
    ivfpq_index_build(emb, coarse, cbs, idx)
    queries = [(1, [1.0] * 8)]
    cand = {
        r.vec_id
        for r in ivfpq_probe_topk(
            spark, idx, queries, k=8, nprobe=2
        ).collect()
    }
    ref = ivfpq_probe_refined(
        spark, idx, emb, queries, k=4, kprime=8, nprobe=2
    ).collect()
    assert {r.vec_id for r in ref} <= cand
    assert [r.rank for r in sorted(ref, key=lambda r: r.rank)] == [1, 2, 3, 4]
