"""Scale-shape guarantees for the dedup family: the blocked embedding
path never degenerates to a nested-loop join, degenerate LSH buckets
cannot explode one task, parameter validation, and as-of tie
determinism."""

import pytest
from pyspark.sql import functions as F

from parkour_spark.operators.asof import asof_join
from parkour_spark.operators.dedup import (
    embedding_neardup_pairs,
    lsh_bands,
    minhash_candidates,
    minhash_signature,
    overfull_lsh_buckets,
    rademacher_bands,
    simhash_pairs,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _vecs(spark, n=30, dim=8):
    import random

    rng = random.Random(7)
    rows = []
    for i in range(n):
        base = [rng.uniform(-1, 1) for _ in range(dim)]
        rows.append((i, base))
        if i % 5 == 0:  # plant a near-dup neighbor
            rows.append((1000 + i, [x + rng.uniform(-0.01, 0.01) for x in base]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_blocked_neardup_no_nested_loop_join(spark):
    """With block_planes the candidate join is equi (band buckets) — no
    BroadcastNestedLoopJoin / CartesianProduct anywhere in the plan.
    That's the whole point of the blocked path at 100 TB."""
    df = _vecs(spark)
    planes = rademacher_bands(n_bands=16, band_bits=4, dim=8)
    out = embedding_neardup_pairs(df, threshold=0.9, block_planes=planes)
    plan = _plan(out)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_blocked_neardup_matches_exact_on_planted_dups(spark):
    df = _vecs(spark)
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs(df, threshold=0.98).collect()
    }
    planes = rademacher_bands(n_bands=32, band_bits=4, dim=8)
    blocked = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs(df, threshold=0.98, block_planes=planes).collect()
    }
    assert exact, "test corpus must contain planted near-dups"
    assert blocked == exact


def test_lsh_bucket_cap_bounds_adversarial_corpus(spark):
    """All-identical corpus: every doc lands in the same band buckets.
    Uncapped that is one task holding n²/2 pairs; the cap drops the
    degenerate buckets and the job completes with zero candidates, and
    the diagnostic reports exactly what was dropped."""
    n = 200
    df = spark.createDataFrame(
        [(i, "the same exact text repeated for every document") for i in range(n)],
        "doc_id long, text string",
    )
    capped = minhash_candidates(df, max_bucket=50)
    assert capped.count() == 0
    dropped = overfull_lsh_buckets(df, max_bucket=50).collect()
    assert dropped and all(r["bucket_size"] == n for r in dropped)
    # sanity: with the cap lifted the pairs do appear
    uncapped = minhash_candidates(df.limit(20), max_bucket=None)
    assert uncapped.count() == (20 * 19) // 2


def test_lsh_bands_validates_parameters(spark):
    sig = minhash_signature(
        spark.createDataFrame([(1, "a b c")], "doc_id long, text string"), num_hashes=12
    )
    with pytest.raises(ValueError, match="divide"):
        lsh_bands(sig, num_hashes=12, bands=5)
    with pytest.raises(ValueError, match="divide"):
        lsh_bands(sig, num_hashes=12, bands=24)


def test_simhash_blocks_derive_from_max_hamming(spark):
    df = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    with pytest.raises(ValueError, match="divisible"):
        # 16 bits cannot split into max_hamming+1 = 5 blocks
        simhash_pairs(df, bits=16, max_hamming=4).collect()
    # 16 bits / (7+1) blocks = 2-bit blocks: valid, recall guarantee holds
    simhash_pairs(df, bits=16, max_hamming=7).count()


def test_asof_join_ties_deterministic(spark):
    """Two right rows at the identical (key, time): the carried value
    must be stable across runs/partitionings — backward carries the max
    tiebreak row."""
    left = spark.createDataFrame([(1, 10.0)], "k long, t double")
    right = spark.createDataFrame(
        [(1, 5.0, "first", 100), (1, 5.0, "second", 200)],
        "k long, t double, v string, rid long",
    )
    got = [
        asof_join(
            left.repartition(p), right.repartition(p), ["k"], "t", "t", ["v"], tiebreak="rid"
        ).collect()[0]["v"]
        for p in (1, 2, 4)
    ]
    assert got == ["second", "second", "second"]


def test_connected_components_chain_and_isolates(spark):
    """A 6-node chain (worst-case diameter for label propagation) plus
    isolated nodes: every chain member maps to the chain min; isolates
    map to themselves."""
    from parkour_spark.operators.graph import connected_components, dedup_survivors

    nodes = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(5)] + [(7, 8)], "id_a long, id_b long"
    )
    cc = {r["n"]: r["component"] for r in
          connected_components(nodes, chain, "doc_id").collect()}
    assert all(cc[i] == 0 for i in range(6))
    assert cc[7] == cc[8] == 7
    assert cc[6] == 6 and cc[9] == 9
    surv = {r["doc_id"]: r["is_survivor"] for r in
            dedup_survivors(nodes, chain).collect()}
    assert [d for d, s in sorted(surv.items()) if s] == [0, 6, 7, 9]
