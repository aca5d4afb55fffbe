"""MaxScore early termination for the persisted text index (r11,
r10 verdict #4): exact top-k identity with the plain probe, a PROVABLE
row-skip (non-essential postings scored only for candidates), and the
safety fallbacks (stale termstats after mutation, pending tombstones,
uniform-ub queries)."""

from pyspark.sql import functions as F

from parkour_spark.operators.textindex import (
    text_index_append,
    text_index_build,
    text_index_compact,
    text_index_delete,
    text_index_probe_bm25,
    text_index_probe_bm25_maxscore,
)


def _docs(spark, ids_texts):
    return spark.createDataFrame(ids_texts, "doc_id long, text string")


def _skewed_corpus(spark, n=60):
    """Every doc shares the stopwordish terms; only a few carry the
    rare one — the query shape MaxScore exists for."""
    rows = []
    for i in range(n):
        body = f"common words everywhere filler {i} shared tokens body"
        if i % 20 == 1:
            body += " rareterm special"
        rows.append((i, body))
    return _docs(spark, rows)


TERMS = ["rareterm", "common", "shared"]


def _rows(df):
    return sorted(
        (r.doc_id, r.n_qterms, r.score_micro) for r in df.collect()
    )


def test_maxscore_identical_topk_with_provable_skip(spark, tmp_path):
    idx = str(tmp_path / "idx")
    corpus = _skewed_corpus(spark)
    text_index_build(corpus, idx, n_buckets=4)
    stats = {}
    got = text_index_probe_bm25_maxscore(
        spark, idx, TERMS, k=2, stats_out=stats
    )
    ref = text_index_probe_bm25(spark, idx, TERMS, k=2)
    assert _rows(got) == _rows(ref)
    assert stats["fallback"] is None
    assert stats["essential"] == ["rareterm"]
    # the skip is real: 'common'/'shared' have df=60 each but are
    # scored only for the 3 rareterm candidates
    assert stats["rows_skipped_lower_bound"] >= 2 * (60 - 3)


def test_maxscore_falls_back_after_append_until_compact(spark, tmp_path):
    idx = str(tmp_path / "idx")
    text_index_build(_skewed_corpus(spark), idx, n_buckets=4)
    text_index_append(
        _docs(spark, [(1000, "rareterm common shared appended")]), idx
    )
    stats = {}
    got = text_index_probe_bm25_maxscore(
        spark, idx, TERMS, k=2, stats_out=stats
    )
    assert stats["fallback"] == "no_termstats"
    assert _rows(got) == _rows(text_index_probe_bm25(spark, idx, TERMS, k=2))
    text_index_compact(spark, idx)
    stats = {}
    got = text_index_probe_bm25_maxscore(
        spark, idx, TERMS, k=2, stats_out=stats
    )
    assert stats["fallback"] is None  # compaction restored serving state
    assert _rows(got) == _rows(text_index_probe_bm25(spark, idx, TERMS, k=2))


def test_maxscore_falls_back_on_pending_tombstones(spark, tmp_path):
    idx = str(tmp_path / "idx")
    text_index_build(_skewed_corpus(spark), idx, n_buckets=4)
    text_index_delete(spark, _docs(spark, [(1, "")]).select("doc_id"), idx)
    stats = {}
    got = text_index_probe_bm25_maxscore(
        spark, idx, TERMS, k=2, stats_out=stats
    )
    # delete invalidates termstats first, so that's the trigger seen;
    # either fallback reason is exact — the pin is identity + fallback
    assert stats["fallback"] in ("no_termstats", "pending_tombstones")
    assert _rows(got) == _rows(text_index_probe_bm25(spark, idx, TERMS, k=2))


def test_maxscore_uniform_ubs_scores_everything_exactly(spark, tmp_path):
    """All-common query: no prefix ever clears the bound — the probe
    scores everything (all_essential) and still matches exactly."""
    idx = str(tmp_path / "idx")
    text_index_build(_skewed_corpus(spark), idx, n_buckets=4)
    stats = {}
    got = text_index_probe_bm25_maxscore(
        spark, idx, ["common", "shared"], k=3, stats_out=stats
    )
    assert stats["fallback"] == "all_essential"
    assert _rows(got) == _rows(
        text_index_probe_bm25(spark, idx, ["common", "shared"], k=3)
    )


def test_maxscore_absent_terms_and_k_larger_than_matches(spark, tmp_path):
    idx = str(tmp_path / "idx")
    text_index_build(_skewed_corpus(spark, n=8), idx, n_buckets=4)
    got = text_index_probe_bm25_maxscore(
        spark, idx, ["zzznope", "rareterm"], k=50
    )
    ref = text_index_probe_bm25(spark, idx, ["zzznope", "rareterm"], k=50)
    assert _rows(got) == _rows(ref)
