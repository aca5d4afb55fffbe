"""Batched MaxScore (r12, r11 verdict #3): per-query early termination
composed onto the batched BM25 probe — exact identity with the plain
batched probe, per-query provable skips, lockstep θ-search, and the
batch-wide safety fallbacks."""

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from parkour_spark.operators.textindex import (
    text_index_build,
    text_index_delete,
    text_index_probe_bm25_multi,
    text_index_probe_bm25_multi_maxscore,
)

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)


def _docs(spark, ids_texts):
    return spark.createDataFrame(ids_texts, "doc_id long, text string")


def _skewed_corpus(spark, n=60):
    rows = []
    for i in range(n):
        body = f"common words everywhere filler {i} shared tokens body"
        if i % 20 == 1:
            body += " rareterm special"
        if i % 15 == 2:
            body += " scarce"
        rows.append((i, body))
    return _docs(spark, rows)


def _rows(df):
    return sorted(
        (r.query_id, r.doc_id, r.n_qterms, r.score_micro, r.rank)
        for r in df.collect()
    )


QSETS = [
    (0, ("rareterm", "common", "shared")),
    (1, ("scarce", "tokens")),
    (2, ("common", "shared")),  # uniform ubs: all essential, still exact
    (3, ("rareterm", "zz_absent", "words")),  # absent term rides along
]


def test_multi_maxscore_identity_with_per_query_skip(spark, tmp_path):
    idx = str(tmp_path / "idx")
    text_index_build(_skewed_corpus(spark), idx, n_buckets=4)
    stats = {}
    got = text_index_probe_bm25_multi_maxscore(
        spark, idx, QSETS, k=2, stats_out=stats
    )
    ref = text_index_probe_bm25_multi(spark, idx, QSETS, k=2)
    assert _rows(got) == _rows(ref)
    assert stats["fallback"] is None
    pq = stats["per_query"]
    # the skewed queries terminated early with a real per-query skip
    assert pq[0]["essential"] == ["rareterm"]
    assert pq[0]["rows_skipped_lower_bound"] > 0
    assert pq[1]["essential"] == ["scarce"]
    assert pq[1]["rows_skipped_lower_bound"] > 0
    # the uniform-ub query scored everything (exactness never depended
    # on the skip landing) — all terms essential, nothing skipped
    assert len(pq[2]["essential"]) == 2
    assert pq[2]["rows_skipped_lower_bound"] == 0
    # absent terms carry no postings and no bound — same as plain
    assert "zz_absent" not in pq[3]["essential"]


def test_multi_maxscore_falls_back_without_termstats(spark, tmp_path):
    from parkour_spark.operators.textindex import _invalidate_termstats

    idx = str(tmp_path / "idx")
    text_index_build(_skewed_corpus(spark), idx, n_buckets=4)
    _invalidate_termstats(spark, idx)
    stats = {}
    got = text_index_probe_bm25_multi_maxscore(
        spark, idx, QSETS, k=2, stats_out=stats
    )
    assert stats["fallback"] == "no_termstats"
    assert _rows(got) == _rows(
        text_index_probe_bm25_multi(spark, idx, QSETS, k=2)
    )


def test_multi_maxscore_falls_back_after_default_delete(spark, tmp_path):
    idx = str(tmp_path / "idx")
    text_index_build(_skewed_corpus(spark), idx, n_buckets=4)
    text_index_delete(
        spark, _docs(spark, [(1, "")]).select("doc_id"), idx
    )
    stats = {}
    got = text_index_probe_bm25_multi_maxscore(
        spark, idx, QSETS, k=2, stats_out=stats
    )
    # r12: the default delete invalidates termstats; a pending ledger
    # with a MAINTAINED table is served (test_r12_delete_termstats)
    assert stats["fallback"] == "no_termstats"
    assert _rows(got) == _rows(
        text_index_probe_bm25_multi(spark, idx, QSETS, k=2)
    )


def test_multi_maxscore_duplicate_query_ids_union_terms(spark, tmp_path):
    """Duplicate query ids UNION their term sets — the plain batched
    probe's (query_id, term)-pair semantics (r12 review: a dict
    comprehension kept only the LAST entry's terms, silently dropping
    the rest and breaking the identity)."""
    idx = str(tmp_path / "idx")
    text_index_build(_skewed_corpus(spark), idx, n_buckets=4)
    dup_qs = [(0, ("rareterm",)), (0, ("common", "shared"))]
    got = text_index_probe_bm25_multi_maxscore(spark, idx, dup_qs, k=3)
    ref = text_index_probe_bm25_multi(spark, idx, dup_qs, k=3)
    assert _rows(got) == _rows(ref)
    # non-vacuous: the merged query matches all three terms somewhere
    assert max(r.n_qterms for r in got.collect()) == 3


def test_multi_maxscore_k_exceeds_candidates_exact(spark, tmp_path):
    """k larger than any query's match count: θ never locks (no k-th
    row), every term goes essential, result still exact."""
    idx = str(tmp_path / "idx")
    text_index_build(_skewed_corpus(spark), idx, n_buckets=4)
    qs = [(0, ("rareterm", "scarce"))]
    stats = {}
    got = text_index_probe_bm25_multi_maxscore(
        spark, idx, qs, k=50, stats_out=stats
    )
    assert _rows(got) == _rows(
        text_index_probe_bm25_multi(spark, idx, qs, k=50)
    )
    assert stats["fallback"] is None
    assert len(stats["per_query"][0]["essential"]) == 2


_words = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "kappa", "rare1", "rare2"]
)


@given(
    docs=st.lists(
        st.lists(_words, min_size=0, max_size=8), min_size=1, max_size=12
    ),
    qsets=st.lists(
        st.lists(_words, min_size=1, max_size=4),
        min_size=1,
        max_size=3,
    ),
    k=st.integers(min_value=1, max_value=4),
)
@settings(**_SETTINGS)
def test_multi_maxscore_equals_plain_property(spark, tmp_path_factory, docs, qsets, k):
    """multi_maxscore ≡ multi_plain for random tiny corpora, query
    batches, and k — bit-exact Spark↔Spark identity (the r10 house
    property pattern for every new exact identity)."""
    idx = str(tmp_path_factory.mktemp("msprop") / "idx")
    rows = [(i, " ".join(ts)) for i, ts in enumerate(docs)]
    text_index_build(_docs(spark, rows), idx, n_buckets=4)
    q = [(qi, tuple(ts)) for qi, ts in enumerate(qsets)]
    got = text_index_probe_bm25_multi_maxscore(spark, idx, q, k=k)
    ref = text_index_probe_bm25_multi(spark, idx, q, k=k)
    assert _rows(got) == _rows(ref)
