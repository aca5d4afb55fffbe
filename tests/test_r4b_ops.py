"""Semantic tests for the round-4b operator family: repetition
profiling, PII scrub, corpus line dedup, mixture weights, vocab head."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from parkour_spark.functions.text import (
    distinct_token_ratio_bp,
    max_token_run,
    pii_counts,
    redact_pii,
    tokens,
    top_bigram_share_bp,
)
from parkour_spark.operators.corpus import (
    line_dedup,
    source_mixture_weights,
    vocab_head_coverage,
)


def _profile(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    toked = df.select(tokens(F.lower(F.col("text"))).alias("t"))
    return toked.select(
        distinct_token_ratio_bp(F.col("t")).alias("d"),
        max_token_run(F.col("t")).alias("r"),
        top_bigram_share_bp(F.col("t")).alias("b"),
    ).first()


def test_repetition_profile_known_values(spark):
    # "a a a b": 2 distinct / 4 tokens = 5000bp; run of 3 a's;
    # bigrams: (a a) x2, (a b) -> top share floor(10000*2/3) = 6666
    row = _profile(spark, "a a a b")
    assert (row["d"], row["r"], row["b"]) == (5000, 3, 6666)
    # all-distinct text: 10000bp, run 1, top bigram 1/3 -> 3333
    row = _profile(spark, "w x y z")
    assert (row["d"], row["r"], row["b"]) == (10000, 1, 3333)
    # empty text: guards
    row = _profile(spark, "   ")
    assert (row["d"], row["r"], row["b"]) == (10000, 0, 0)
    # bigram key is separator-safe: "ab c" vs "a bc" stay distinct
    row = _profile(spark, "ab c a bc")
    assert row["b"] == 3333  # all 3 bigrams distinct


def test_pii_counts_and_redaction(spark):
    text = (
        "mail jane.doe+x@corp.example.org or 192.168.001.42 id 123-45-6789 "
        "not-pii: 1.2 v2.3.4 12-34-5678"
    )
    df = spark.createDataFrame([(text,)], "text string")
    row = df.select(
        pii_counts("text").alias("p"), redact_pii("text").alias("red")
    ).first()
    assert (row["p"]["n_email"], row["p"]["n_ipv4"], row["p"]["n_idnum"]) == (1, 1, 1)
    assert row["red"] == (
        "mail <EMAIL> or <IP> id <ID> not-pii: 1.2 v2.3.4 12-34-5678"
    )


def test_line_dedup_keeps_global_first(spark):
    boiler = "b0 b1 b2 b3 b4 b5 b6 b7 b8 b9"
    docs = spark.createDataFrame(
        [
            (1, boiler + " u0 u1 u2 u3 u4 u5 u6 u7 u8 u9"),
            (2, boiler + " v0 v1 v2 v3 v4 v5 v6 v7 v8 v9"),
            (3, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in line_dedup(docs, line_tokens=10).collect()}
    assert (out[1]["n_lines"], out[1]["n_kept"]) == (2, 2)  # first owner keeps all
    assert (out[2]["n_lines"], out[2]["n_kept"]) == (2, 1)  # boiler stripped
    assert (out[3]["n_lines"], out[3]["n_kept"]) == (1, 1)  # unique doc untouched
    exp2 = hashlib.md5(b"v0 v1 v2 v3 v4 v5 v6 v7 v8 v9").hexdigest()
    assert out[2]["kept_md5"] == exp2


def test_line_dedup_all_lines_removed(spark):
    docs = spark.createDataFrame(
        [(1, "x0 x1 x2 x3 x4 x5 x6 x7 x8 x9"), (2, "x0 x1 x2 x3 x4 x5 x6 x7 x8 x9")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in line_dedup(docs, line_tokens=10).collect()}
    assert out[2]["n_kept"] == 0
    assert out[2]["kept_md5"] == hashlib.md5(b"").hexdigest()


def test_source_mixture_weights_sqrt_temperature(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d", "big"), (2, "a b c d", "big"), (3, "a b", "small")],
        "doc_id long, text string, source string",
    )
    rows = {r["source"]: r for r in source_mixture_weights(docs).collect()}
    assert rows["big"]["n_tokens"] == 8 and rows["small"]["n_tokens"] == 2
    assert rows["big"]["weight_micro"] == 1_000_000
    assert rows["small"]["weight_micro"] == 500_000  # sqrt(2/8) = 0.5


def test_vocab_head_coverage_ranks_and_cum(spark):
    docs = spark.createDataFrame(
        [(1, "a a a b b c")], "doc_id long, text string"
    )
    rows = vocab_head_coverage(docs, top_n=2).collect()
    assert [(r["rank"], r["term"], r["cnt"]) for r in rows] == [(1, "a", 3), (2, "b", 2)]
    assert [r["cum_micro"] for r in rows] == [500_000, 833_333]


def test_semantic_dedup_planted_recall(spark):
    """Cluster-blocked semantic dedup must recover most planted
    near-dup pairs (the misses are cluster-boundary splits — SemDeDup's
    documented recall trade) and report only genuine >= threshold
    cosines."""
    from parkour_spark.queries import QUERIES

    df = QUERIES["semantic_dedup_kmeans"](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert rows, "no pairs found"
    # every reported pair is a planted (v, v') pair at this tiny SF and
    # scores sit at the planted cosine (~0.989)
    for r in rows:
        assert r["id_b"] == r["id_a"] + 1000000
        assert r["cos"] >= 0.9
    # recall over the planted set
    n_planted = df.sparkSession.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).count()
    assert len(rows) >= 0.8 * n_planted


def test_dedup_delta_only_cross_pairs(spark):
    """Delta dedup must report only (new, old) pairs — never new/new or
    old/old — and find a planted cross-duplicate."""
    from parkour_spark.operators.dedup import ngram_jaccard_delta

    old = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "one two three four five six"),
            (3, "red green blue cyan magenta yellow"),
            (4, "red green blue cyan magenta yellow"),  # old/old dup: ignored
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (101, "alpha beta gamma delta epsilon zeta"),  # dup of old 1
            (102, "totally fresh unseen words here now"),
            (103, "totally fresh unseen words here now"),  # new/new dup: ignored
        ],
        "doc_id long, text string",
    )
    rows = ngram_jaccard_delta(new, old, threshold=0.8, max_df=10).collect()
    assert [(r["id_new"], r["id_old"], r["jaccard"]) for r in rows] == [(101, 1, 1.0)]


def test_streaming_quality_ingest_matches_batch(spark):
    from parkour_spark.queries import QUERIES
    from parkour_spark.functions.text import quality_score, token_count
    from parkour_spark.dataset import load_table

    got = {
        r["source"]: (r["n_docs"], r["total_tokens"])
        for r in QUERIES["streaming_quality_ingest"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    exp = {
        r["source"]: (r["n_docs"], r["total_tokens"])
        for r in docs.where(quality_score("text") >= 0.5)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(token_count("text")).alias("total_tokens"),
        )
        .collect()
    }
    assert got == exp and got


def test_winnow_overlap_detects_containment(spark):
    """A doc containing a long substring of another must pair with it;
    unrelated docs must not."""
    from parkour_spark.operators.dedup import winnow_overlap_pairs

    shared = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, shared + " plus some trailing content of its own here"),
            (2, "prefix words first then " + shared),
            (3, "zebra xylophone quartz vivid jackpot murmur glyph onyx"),
        ],
        "doc_id long, text string",
    )
    rows = winnow_overlap_pairs(docs, min_shared=3, max_df=10).collect()
    assert [(r["id_a"], r["id_b"]) for r in rows] == [(1, 2)]
    assert rows[0]["n_shared"] >= 3


def test_quantize_embeddings_roundtrip_error_bounded(spark):
    from parkour_spark.operators.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(1, [0.0, 1.0, -1.0]), (2, [1.0, 0.0, 1.0]), (3, [0.5, 0.5, 0.0])],
        "vec_id long, embedding array<double>",
    )
    rows = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    assert len(rows) == 3
    # 256 levels over range <= 2.0 -> cell width <= 1/128; midpoint
    # dequantization error <= width/2 per dim -> mse < (1/256)^2 * 4
    for r in rows.values():
        assert 0 <= r["mse_micro"] <= 70
    # identical vectors would share codes; distinct ones must differ
    assert rows[1]["codes_md5"] != rows[2]["codes_md5"]


def test_bigram_lm_scores_known_corpus(spark):
    """Corpus: 'a b' x2 and 'a c'. V = 3 {a,b,c}; prefix total c(a.) = 3.
    P(b|a) = (2+1)/(3+3) = 1/2; P(c|a) = (1+1)/6 = 1/3."""
    import math

    from parkour_spark.operators.corpus import bigram_lm_scores

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c"), (4, "solo")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in bigram_lm_scores(docs).collect()}
    assert 4 not in rows  # no bigrams -> excluded
    assert rows[1]["avg_logprob_micro"] == round(math.log(0.5) * 1e6)
    assert rows[3]["avg_logprob_micro"] == round(math.log(1 / 3) * 1e6)


def test_hashed_doc_vectors_deterministic_and_tf_weighted(spark):
    from parkour_spark.operators.corpus import hashed_doc_vectors

    docs = spark.createDataFrame(
        [(1, "x y x"), (2, "x y x"), (3, "y")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: list(r["vec"]) for r in hashed_doc_vectors(docs, dims=8).collect()}
    assert rows[1] == rows[2]  # identical text -> identical vector
    assert sum(rows[1]) == 3.0 and sum(rows[3]) == 1.0  # tf mass preserved
    assert len(rows[1]) == 8


def test_pagerank_center_outranks_leaves(spark):
    """Star graph: the hub must outrank leaves; isolated nodes hold the
    base rank; total mass conservation within rounding."""
    from parkour_spark.operators.graph import pagerank

    nodes = spark.createDataFrame([(i,) for i in range(6)], "id long")
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (0, 4)], "id_a long, id_b long"
    )
    r = {row["id"]: row["rank_micro"] for row in
         pagerank(nodes, edges, node_col="id", iters=3).collect()}
    assert r[0] > r[1] == r[2] == r[3] == r[4]  # hub dominates, leaves tie
    assert r[5] == 150_000  # isolated: base rank only


def test_triangle_count_known_graphs(spark):
    from parkour_spark.operators.graph import triangle_count

    # K4 (every node in C(3,2)=3 triangles) + a 4-cycle with no
    # diagonal (0 triangles) + duplicate/reversed edges (must dedupe)
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    square = [(10, 11), (11, 12), (12, 13), (13, 10), (11, 10)]
    edges = spark.createDataFrame(k4 + square, "id_a long, id_b long")
    got = {r["node"]: r["n_triangles"] for r in triangle_count(edges).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_count_single_triangle_with_tail(spark):
    from parkour_spark.operators.graph import triangle_count

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "id_a long, id_b long"
    )
    got = {r["node"]: r["n_triangles"] for r in triangle_count(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1}
