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


def test_maxscore_stays_live_after_append(spark, tmp_path):
    """r12 (r11 verdict #4): the termstats table is maintained
    INCREMENTALLY through appends — NO fallback after an append, the
    merged stats are byte-identical to a fresh build of the union
    corpus, and the probe stays row-identical to full scoring. The r11
    predecessor of this test pinned the old falls-back-until-compact
    behavior."""
    idx = str(tmp_path / "idx")
    idx2 = str(tmp_path / "idx2")
    corpus = _skewed_corpus(spark)
    extra = _docs(spark, [(1000, "rareterm common shared appended")])
    text_index_build(corpus, idx, n_buckets=4)
    text_index_append(extra, idx)
    stats = {}
    got = text_index_probe_bm25_maxscore(
        spark, idx, TERMS, k=2, stats_out=stats
    )
    assert stats["fallback"] is None  # early termination survived
    assert _rows(got) == _rows(text_index_probe_bm25(spark, idx, TERMS, k=2))
    # the merged termstats ≡ a fresh union build's termstats, exactly
    text_index_build(corpus.unionByName(extra), idx2, n_buckets=4)
    merged = sorted(
        ((r.term, r.tbucket), (r.df, r.max_tf, r.min_dl))
        for r in spark.read.parquet(idx + "/termstats").collect()
    )
    fresh = sorted(
        ((r.term, r.tbucket), (r.df, r.max_tf, r.min_dl))
        for r in spark.read.parquet(idx2 + "/termstats").collect()
    )
    assert merged == fresh
    text_index_compact(spark, idx)
    stats = {}
    got = text_index_probe_bm25_maxscore(
        spark, idx, TERMS, k=2, stats_out=stats
    )
    assert stats["fallback"] is None
    assert _rows(got) == _rows(text_index_probe_bm25(spark, idx, TERMS, k=2))


def test_maxscore_append_onto_absent_termstats_stays_absent(spark, tmp_path):
    """An index whose termstats died (delete invalidates — df can
    shrink) does NOT resurrect it on append: there is no live table to
    extend, so the merge is skipped and the probe keeps falling back
    until compact rebuilds from the reconciled survivors."""
    from parkour_spark import fs as pfs

    idx = str(tmp_path / "idx")
    text_index_build(_skewed_corpus(spark), idx, n_buckets=4)
    text_index_delete(spark, _docs(spark, [(1, "")]).select("doc_id"), idx)
    assert not pfs.exists(spark, idx + "/termstats")
    text_index_append(_docs(spark, [(1000, "rareterm fresh rows")]), idx)
    assert not pfs.exists(spark, idx + "/termstats")
    stats = {}
    got = text_index_probe_bm25_maxscore(
        spark, idx, TERMS, k=2, stats_out=stats
    )
    assert stats["fallback"] == "no_termstats"
    assert _rows(got) == _rows(text_index_probe_bm25(spark, idx, TERMS, k=2))


def test_append_sweeps_crashed_termstats_staging(spark, tmp_path):
    """A staging sibling left by a crashed append is garbage (the
    crash left termstats/ absent); the next append sweeps it and the
    live table still ends exact."""
    from parkour_spark import fs as pfs

    idx = str(tmp_path / "idx")
    corpus = _skewed_corpus(spark)
    text_index_build(corpus, idx, n_buckets=4)
    junk = idx + "/termstats.__next-deadbeef__"
    pfs.mkdirs(spark, junk)
    text_index_append(_docs(spark, [(1000, "rareterm appended")]), idx)
    assert not pfs.glob_paths(spark, idx + "/termstats.__next-*__")
    assert pfs.exists(spark, idx + "/termstats")


def test_maxscore_falls_back_after_default_delete(spark, tmp_path):
    idx = str(tmp_path / "idx")
    text_index_build(_skewed_corpus(spark), idx, n_buckets=4)
    text_index_delete(spark, _docs(spark, [(1, "")]).select("doc_id"), idx)
    stats = {}
    got = text_index_probe_bm25_maxscore(
        spark, idx, TERMS, k=2, stats_out=stats
    )
    # the default delete INVALIDATES termstats (r12: a pending ledger
    # by itself is served, not fallen back from — see
    # test_r12_delete_termstats for the maintained path), so absence
    # is the trigger; the pin is identity + fallback
    assert stats["fallback"] == "no_termstats"
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
