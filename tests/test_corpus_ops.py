"""Semantic tests for operators/corpus.py (decontamination, unigram LM,
BM25, chunking, packing, stratified sampling) — properties the DuckDB
oracle can't express directly: budget invariants, containment, ranking
monotonicity, chunk coverage."""

import hashlib

import pytest
from pyspark.sql import Row, functions as F

from parkour_spark.operators import corpus as C


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        Row(doc_id=1, text="alpha beta gamma delta epsilon zeta", lang="en"),
        Row(doc_id=2, text="alpha beta gamma delta other words here", lang="en"),
        Row(doc_id=3, text="completely different content entirely unique tokens", lang="de"),
        Row(doc_id=4, text="hash join hash join hash scan table", lang="en"),
        Row(doc_id=5, text="scan scan scan", lang="fr"),
        Row(doc_id=6, text="one two", lang="en"),
    ]
    return spark.createDataFrame(rows)


def test_contamination_hits_shared_ngrams(spark, docs):
    ev = docs.where(F.col("doc_id") == 1)
    tr = docs.where(F.col("doc_id") != 1)
    hits = {r.doc_id: r.n_shared_ngrams for r in C.ngram_contamination(tr, ev, n=4).collect()}
    # doc 2 shares the 4-gram "alpha beta gamma delta" with doc 1
    assert hits == {2: 1}
    clean = C.decontaminate(tr, ev, n=4)
    assert sorted(r.doc_id for r in clean.select("doc_id").collect()) == [3, 4, 5, 6]


def test_unigram_logprob_ranks_rare_content_lower(spark, docs):
    scored = {r.doc_id: r for r in C.unigram_logprob(docs).collect()}
    assert set(scored) == {1, 2, 3, 4, 5, 6}
    # every score is a negative log-prob; docs made of repeated common
    # tokens (5: 'scan' x3, also frequent in doc 4) score higher than
    # all-unique-vocabulary docs (3)
    assert all(r.avg_logprob_micro < 0 for r in scored.values())
    assert scored[5].avg_logprob_micro > scored[3].avg_logprob_micro
    assert scored[1].n_toks == 6


def test_bm25_ranks_term_dense_doc_first(spark, docs):
    top = C.bm25_topk(docs, ["hash", "join", "scan"], k=3).collect()
    assert top[0].doc_id == 4  # contains all three query terms, densely
    assert top[0].n_qterms == 3
    assert all(top[i].score_micro >= top[i + 1].score_micro for i in range(len(top) - 1))
    # docs with no query term never appear
    assert {r.doc_id for r in top} <= {4, 5}


def test_chunks_cover_text_and_match_md5(spark, docs):
    out = C.chunk_documents(docs, size=10, stride=7).collect()
    texts = {r.doc_id: r.text for r in docs.collect()}
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, text in texts.items():
        rows = sorted(by_doc[doc_id], key=lambda r: r.chunk_idx)
        # chunk count: starts at 0,7,14,... last start < len, >= len-10
        n = max(0, -(-(len(text) - 10) // 7)) + 1
        assert len(rows) == n
        for r in rows:
            piece = text[r.chunk_idx * 7 : r.chunk_idx * 7 + 10]
            assert r.chunk_md5 == hashlib.md5(piece.encode()).hexdigest()
        # strided starts + size>=stride cover every character
        assert (n - 1) * 7 + 10 >= len(text)


def test_packing_respects_budget_and_conserves_tokens(spark, sf_dir):
    from parkour_spark.dataset import load_table
    from parkour_spark.functions.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    budget = 256
    packed = C.pack_sequences(docs, budget=budget, n_buckets=4).collect()
    # every multi-doc sequence fits the budget (only singleton sequences
    # may exceed it — oversized docs pack alone)
    for r in packed:
        if r.n_docs > 1:
            assert r.seq_tokens <= budget, r
    # token + doc conservation
    n_docs = docs.count()
    n_toks = docs.select(F.sum(token_count("text")).alias("s")).collect()[0].s
    assert sum(r.n_docs for r in packed) == n_docs
    assert sum(r.seq_tokens for r in packed) == n_toks
    # seq_ids are dense per bucket starting at 0
    by_bucket = {}
    for r in packed:
        by_bucket.setdefault(r.bucket, []).append(r.seq_id)
    for ids in by_bucket.values():
        assert sorted(ids) == list(range(len(ids)))


def test_packing_partition_layout_independent(spark, docs):
    a = C.pack_sequences(docs, budget=8, n_buckets=2).collect()
    b = C.pack_sequences(docs.repartition(5), budget=8, n_buckets=2).collect()
    key = lambda r: (r.bucket, r.seq_id)
    assert sorted(map(tuple, a), key=None) == sorted(map(tuple, b), key=None)
    assert sorted(a, key=key) == sorted(b, key=key)


def test_stratified_sample_fractions(spark, sf_dir):
    from parkour_spark.dataset import load_table

    docs = load_table(spark, sf_dir, "documents")
    kept = C.stratified_sample(docs, "lang", "doc_id", {"en": 0.5}, default=0.2)
    tot = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    got = {r.lang: r.n for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # en kept at ~50%, others at ~20% (hash buckets: loose tolerance on
    # the tiny sf0.001 fixture, but strictly fewer than total and >0)
    assert 0 < got["en"] < tot["en"]
    for lang, n in got.items():
        frac = 0.5 if lang == "en" else 0.2
        assert abs(n / tot[lang] - frac) < 0.25, (lang, n, tot[lang])
    # determinism: same membership on a different layout
    again = C.stratified_sample(
        docs.repartition(7), "lang", "doc_id", {"en": 0.5}, default=0.2
    )
    assert sorted(r.doc_id for r in again.select("doc_id").collect()) == sorted(
        r.doc_id for r in kept.select("doc_id").collect()
    )


def test_resample_temperature_properties(spark):
    """Skewed synthetic corpus: the dominant source sheds docs, the
    smallest keeps everything, and membership is layout-independent."""
    rows = []
    for i in range(400):
        rows.append(Row(doc_id=i, text="big source filler words " * 5, source="big"))
    for i in range(40):
        rows.append(Row(doc_id=1000 + i, text="medium words here", source="mid"))
    for i in range(8):
        rows.append(Row(doc_id=2000 + i, text="tiny", source="small"))
    docs = spark.createDataFrame(rows)
    kept = C.resample_by_mixture(docs)
    counts = {r["source"]: r["n"] for r in
              kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts["small"] == 8                      # min-token source keeps all
    assert counts["big"] < 400                       # dominant source downsampled
    # realized keep RATE must fall with source size (temperature flattening)
    assert counts["big"] / 400 < counts.get("mid", 0) / 40 + 0.25
    again = {r["source"]: r["n"] for r in
             C.resample_by_mixture(docs.repartition(7))
             .groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert again == counts


def test_leakage_safe_split_groups_atomic(spark, sf_dir):
    """Every source must land in exactly ONE split — the property that
    makes the split leakage-safe."""
    from parkour_spark.dataset import load_table
    from parkour_spark.functions.sampling import split_assign

    docs = load_table(spark, sf_dir, "documents")
    assigned = docs.select(
        split_assign("source", {"train": 0.8, "val": 0.1, "test": 0.1}).alias("split"),
        "source",
    )
    per_source = assigned.groupBy("source").agg(
        F.countDistinct("split").alias("n_splits")
    )
    assert per_source.where(F.col("n_splits") > 1).count() == 0
    assert assigned.count() == docs.count()


def test_semantic_decontamination_exact_recall(spark):
    """The registered construction: flagged vectors must be EXACTLY the
    sources of the planted eval copies — full recall, zero false
    positives."""
    from parkour_spark.dataset import load_table
    from parkour_spark.queries import QUERIES

    got = QUERIES["semantic_decontamination"](spark, "/root/testdata/sf0.01")
    flagged = {r["vec_id"] for r in got.collect()}
    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    expected = {
        r["vec_id"] for r in emb.where(F.col("vec_id") % 20 == 0).collect()
    }
    assert flagged == expected
    assert all(r["max_cos"] >= 0.9 for r in got.collect())


def test_linear_quality_scores_match_python_reference(spark):
    rows = [
        Row(doc_id=1, text="one two three four five unique tokens here now"),
        Row(doc_id=2, text="spam spam spam spam"),
        Row(doc_id=3, text=""),
    ]
    docs = spark.createDataFrame(rows)
    got = {r["doc_id"]: (r["z_micro"], r["passes"])
           for r in C.linear_quality_scores(docs).collect()}
    import math

    for r in rows:
        toks = [t for t in r.text.lower().strip().split() if t]
        n = len(toks)
        dbp = math.floor(10000 * len(set(toks)) / n) if n else 10000
        z = -6_000_000 + 50_000 * n + 2_000 * len(r.text) + 300 * dbp
        assert got[r.doc_id] == (z, z > 0), (r.doc_id, got[r.doc_id], z)


# ---------------------------------------------------------------------------
# shuffle_order / token_budget_sample / average_precision
# ---------------------------------------------------------------------------


def test_shuffle_order_is_permutation_and_seeded(spark):
    from parkour_spark.operators.corpus import shuffle_order

    df = spark.createDataFrame([(i,) for i in range(97)], ["doc_id"])
    out = shuffle_order(df, seed="s1").collect()
    pos = sorted(r.shuffle_pos for r in out)
    assert pos == list(range(97))  # dense 0-based permutation
    again = {r.doc_id: r.shuffle_pos for r in shuffle_order(df, seed="s1").collect()}
    first = {r.doc_id: r.shuffle_pos for r in out}
    assert again == first  # same seed, same order
    other = {r.doc_id: r.shuffle_pos for r in shuffle_order(df, seed="s2").collect()}
    assert other != first  # different seed reshuffles
    # layout-invariant
    repart = {
        r.doc_id: r.shuffle_pos
        for r in shuffle_order(df.repartition(7), seed="s1").collect()
    }
    assert repart == first


def test_token_budget_sample_prefix_semantics(spark):
    from parkour_spark.operators.corpus import token_budget_sample

    rows = [("a", i, "w " * 10) for i in range(20)] + [
        ("b", 100 + i, "x " * 3) for i in range(4)
    ]
    df = spark.createDataFrame(rows, ["source", "doc_id", "text"])
    out = token_budget_sample(df, budget_tokens=35, group_col="source")
    by_src = {}
    for r in out.collect():
        by_src.setdefault(r.source, []).append(r)
    # source a: docs are 10 tokens each → exactly 3 fit in 35
    assert len(by_src["a"]) == 3
    assert max(r.cum_tokens for r in by_src["a"]) == 30
    # source b: all 4 docs (12 tokens) fit
    assert len(by_src["b"]) == 4
    # the kept set is a PREFIX of the hash order: cum_tokens of kept
    # rows are the first k partial sums
    for rs in by_src.values():
        cums = sorted(r.cum_tokens for r in rs)
        toks = [r.n_tokens for r in sorted(rs, key=lambda r: r.cum_tokens)]
        run = 0
        for c, t in zip(cums, toks):
            run += t
            assert c == run


def test_average_precision_hand_computed(spark):
    from parkour_spark.operators.validate import average_precision

    # scores rank docs 1..5 as 50,40,30,20,10; labels 1,0,1,0,1
    # precision at positive ranks: 1/1, 2/3, 3/5 → AP = (1 + 2/3 + 3/5)/3
    df = spark.createDataFrame(
        [(1, 50, 1), (2, 40, 0), (3, 30, 1), (4, 20, 0), (5, 10, 1)],
        ["doc_id", "s", "y"],
    )
    r = average_precision(df, "s", "y", "doc_id").collect()[0]
    assert (r.n_pos, r.n) == (3, 5)
    # integer terms: 1000000, (2000000 div 3)=666666, (3000000 div 5)=600000
    assert r.ap_micro_sum == 1000000 + 666666 + 600000
    assert abs(r.ap - round((1 + 2 / 3 + 3 / 5) / 3, 6)) < 2e-6


def test_average_precision_perfect_and_worst(spark):
    from parkour_spark.operators.validate import average_precision

    perfect = spark.createDataFrame(
        [(1, 9, 1), (2, 8, 1), (3, 2, 0), (4, 1, 0)], ["id", "s", "y"]
    )
    r = average_precision(perfect, "s", "y", "id").collect()[0]
    assert r.ap == 1.0
    worst = spark.createDataFrame(
        [(1, 9, 0), (2, 8, 0), (3, 2, 1)], ["id", "s", "y"]
    )
    r = average_precision(worst, "s", "y", "id").collect()[0]
    assert abs(r.ap - round(1 / 3, 6)) < 2e-6
