"""Property-based tests for the r10 index families (hypothesis):
randomized small corpora drive the EXACT lifecycle identities the gate
pins at fixed parameters — probe ≡ inline, append ≡ build(A∪B),
delete ≡ build(A∖B) — through edge cases fixtures don't reach (empty
docs, all-duplicate tokens, absent query terms, every-doc-deleted,
single-vector corpora, unicode terms). The identities are Spark↔Spark
and exact by construction, so equality is bit-for-bit — the same
discipline that let the LZW roundtrip property find the r9 GIF
encoder's width-boundary bug."""

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)

_WORDS = ["a", "bb", "ccc", "dd", "e", "ffff", "naïve", "日本"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=0, max_size=6),
    min_size=1,
    max_size=10,
)


def _docs_df(spark, doc_words):
    return spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(doc_words)],
        "doc_id long, text string",
    )


def _bm25_rows(df):
    return sorted((r.doc_id, r.n_qterms, r.score_micro) for r in df.collect())


@given(
    doc_words=docs_strategy,
    qidx=st.sets(st.integers(min_value=0, max_value=len(_WORDS)), min_size=1,
                 max_size=4),
)
@settings(**_SETTINGS)
def test_prop_text_probe_equals_inline(spark, tmp_path_factory, doc_words, qidx):
    """probe(build(A)) ≡ bm25_topk(A) for random corpora and query
    sets (index len(_WORDS) maps to a term absent from every doc)."""
    from parkour_spark.operators.corpus import bm25_topk
    from parkour_spark.operators.textindex import (
        text_index_build,
        text_index_probe_bm25,
    )

    docs = _docs_df(spark, doc_words)
    terms = [(_WORDS + ["zzz"])[i] for i in sorted(qidx)]
    idx = str(tmp_path_factory.mktemp("tprop") / "idx")
    text_index_build(docs, idx, n_buckets=4)
    assert _bm25_rows(
        text_index_probe_bm25(spark, idx, terms, k=20)
    ) == _bm25_rows(bm25_topk(docs, terms, k=20))


@given(
    doc_words=docs_strategy,
    dead=st.sets(st.integers(min_value=0, max_value=9)),
)
@settings(**_SETTINGS)
def test_prop_text_delete_equals_survivor_build(
    spark, tmp_path_factory, doc_words, dead
):
    """delete(B) from build(A) ≡ build(A∖B) for random delete sets —
    including ids absent from the corpus and the everything-deleted
    case (probe of an empty index returns no rows, like the empty
    build)."""
    from parkour_spark.operators.textindex import (
        text_index_build,
        text_index_delete,
        text_index_probe_bm25,
    )

    docs = _docs_df(spark, doc_words)
    idx = str(tmp_path_factory.mktemp("tprop") / "idx")
    surv = str(tmp_path_factory.mktemp("tprop") / "surv")
    text_index_build(docs, idx, n_buckets=4)
    text_index_delete(
        spark,
        spark.createDataFrame([(i,) for i in sorted(dead)] or [(10**9,)],
                              "doc_id long"),
        idx,
    )
    text_index_build(docs.where(~F.col("doc_id").isin(list(dead))), surv,
                     n_buckets=4)
    terms = ["a", "bb", "naïve", "日本"]
    assert _bm25_rows(
        text_index_probe_bm25(spark, idx, terms, k=20)
    ) == _bm25_rows(text_index_probe_bm25(spark, surv, terms, k=20))


vec_strategy = st.lists(
    st.lists(st.integers(min_value=-8, max_value=8), min_size=4, max_size=4),
    min_size=2,
    max_size=12,
)


@given(vecs=vec_strategy, split=st.integers(min_value=2, max_value=5))
@settings(**_SETTINGS)
def test_prop_pq_append_equals_combined_build(
    spark, tmp_path_factory, vecs, split
):
    """PQ append(B) ≡ build(A∪B) for random integer-lattice vectors
    (exact doubles — no float generation flakiness) and random
    splits, including the empty-append side."""
    from parkour_spark.operators.pq import (
        pq_index_append,
        pq_index_build,
        pq_probe_adc,
        pq_train,
    )

    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    cbs = pq_train(emb, m=2, ksub=2, iters=1)
    a = emb.where(F.col("vec_id") % split != 0)
    b = emb.where(F.col("vec_id") % split == 0)
    if a.count() == 0:
        return  # build needs a non-empty corpus; append side may be empty
    inc = str(tmp_path_factory.mktemp("pqprop") / "inc")
    full = str(tmp_path_factory.mktemp("pqprop") / "full")
    pq_index_build(a, cbs, inc)
    pq_index_append(b, inc)
    pq_index_build(emb, cbs, full)
    queries = [(0, [float(x) for x in vecs[0]])]
    got = sorted(
        (r.query_id, r.vec_id, r.rank, r.adc_cos)
        for r in pq_probe_adc(spark, inc, queries, k=20).collect()
    )
    want = sorted(
        (r.query_id, r.vec_id, r.rank, r.adc_cos)
        for r in pq_probe_adc(spark, full, queries, k=20).collect()
    )
    assert got == want


@given(
    words=st.lists(
        st.tuples(st.sampled_from(["ab", "abc", "bc", "aab", "ba", "ca"]),
                  st.integers(min_value=1, max_value=5)),
        min_size=1,
        max_size=6,
        unique_by=lambda t: t[0],
    ),
    n=st.integers(min_value=1, max_value=4),
)
@settings(**_SETTINGS)
def test_prop_bpe_batch_one_equals_sequential(spark, words, n):
    """bpe_train_batched(batch=1) ≡ bpe_train for random vocabularies
    and merge counts — the degenerate-batch identity across tie
    patterns and early-exhaustion cases."""
    from parkour_spark.operators.bpe import bpe_train, bpe_train_batched

    wdf = spark.createDataFrame(words, "word string, wc long")
    seq = [
        (r.step, r.lhs, r.rhs, r.pair_count)
        for r in bpe_train(wdf, n_merges=n).collect()
    ]
    bat = [
        (r.step, r.lhs, r.rhs, r.pair_count)
        for r in bpe_train_batched(wdf, n_rounds=n, batch=1).collect()
    ]
    assert bat == seq
