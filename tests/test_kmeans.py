"""k-means (Lloyd's) and streaming-dedup behavior tests."""

from pyspark.sql import functions as F

from parkour_spark.operators.kmeans import kmeans_fit, kmeans_inertia
from parkour_spark.operators.similarity import ivf_topk


def _clustered_vecs(spark, per_cluster=30, dim=8):
    """Three well-separated clusters around axis-aligned anchors."""
    import random

    rng = random.Random(11)
    rows = []
    i = 0
    for c in range(3):
        anchor = [0.0] * dim
        anchor[c] = 1.0
        for _ in range(per_cluster):
            rows.append((i, [a + rng.uniform(-0.05, 0.05) for a in anchor]))
            i += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_kmeans_inertia_monotone_and_separates_clusters(spark):
    df = _clustered_vecs(spark)
    c1 = kmeans_fit(df, k=3, max_iters=1)
    c5 = kmeans_fit(df, k=3, max_iters=5)
    i1, i5 = kmeans_inertia(df, c1), kmeans_inertia(df, c5)
    assert i5 <= i1 + 1e-9  # Lloyd's never increases the objective
    # converged centroids should sit near the three anchors: each
    # centroid's dominant dimension is distinct
    dominant = sorted(max(range(len(v)), key=lambda d: v[d]) for _, v in c5)
    assert dominant == [0, 1, 2]


def test_hash_sample_init_beats_first_k_on_sorted_corpus(spark):
    """r4 (r3 verdict #3): on a corpus whose id order correlates with
    content — 8 clusters written cluster-by-cluster, the crawl/shard
    pathology — first-k-by-id seeds all come from cluster 0 and Lloyd's
    gets a lopsided quantizer at a fixed budget; the hash-sampled init
    (k smallest md5(id)) spreads seeds across 5 of 8 clusters and lands
    strictly lower inertia."""
    import random

    rng = random.Random(5)
    dim, rows, i = 16, [], 0
    for c in range(8):
        anchor = [0.0] * dim
        anchor[c] = 1.0
        for _ in range(25):
            rows.append((i, [a + rng.uniform(-0.05, 0.05) for a in anchor]))
            i += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    hash_cents = kmeans_fit(df, k=8, max_iters=2)
    first_cents = kmeans_fit(df, k=8, max_iters=2, init="first_k")
    assert kmeans_inertia(df, hash_cents) < kmeans_inertia(df, first_cents)


def test_kmeans_deterministic(spark):
    df = _clustered_vecs(spark)
    a = kmeans_fit(df, k=3, max_iters=3)
    b = kmeans_fit(df, k=3, max_iters=3)
    assert a == b


def test_kmeans_centroids_feed_ivf(spark):
    df = _clustered_vecs(spark)
    cents = kmeans_fit(df, k=3, max_iters=5)
    queries = df.limit(2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = ivf_topk(df, queries, cents, k=3, nprobe=1).collect()
    assert len(got) == 6  # 2 queries × top-3, probing 1 tight cluster each
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        assert rows[0]["vec_id"] == q  # self is its own nearest neighbor
        assert all(r["cos"] > 0.9 for r in rows)  # same-cluster hits only


def test_stream_dedup_collapses_injected_duplicates(spark, tmp_path):
    """Real duplicate deliveries: each event written twice across two
    files; the streaming dedup emits each event_id exactly once."""
    from parkour_spark.streaming.windows import read_stream, run_to_completion, stream_dedup

    df = spark.range(50).select(
        F.col("id").alias("event_id"), (F.col("id") % 5).alias("payload")
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "dup" / "a"))
    df.write.mode("append").parquet(str(tmp_path / "dup" / "a"))
    stream = read_stream(spark, str(tmp_path / "dup" / "a"), df.schema, max_files=1)
    deduped = stream_dedup(stream, ["event_id"])
    out = run_to_completion(deduped, output_mode="append")
    rows = out.collect()
    assert len(rows) == 50
    assert sorted(r["event_id"] for r in rows) == list(range(50))
