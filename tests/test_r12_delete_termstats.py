"""r12 extra wave: the MaxScore termstats table survives DELETE when
the caller opts in (`text_index_delete(..., maintain_termstats=True)`)
— the last lifecycle leg where early termination used to die — and
both MaxScore probes now SERVE a pending tombstone ledger (slice
anti-join) instead of falling back.

The exactness contract under test (textindex module docstring): a
present termstats table carries survivor-exact df and still-valid
max_tf/min_dl bounds, so maxscore-probe(delete(B)) ≡
plain-probe(build(A∖B)) row for row, with a real skip."""

from pyspark.sql import functions as F

from parkour_spark.operators.textindex import (
    text_index_append,
    text_index_build,
    text_index_delete,
    text_index_probe_bm25,
    text_index_probe_bm25_maxscore,
    text_index_probe_bm25_multi,
    text_index_probe_bm25_multi_maxscore,
)

TERMS = ("rare", "shared", "common")


def _corpus(spark, n=40):
    rows = []
    for i in range(n):
        body = f"common words shared body {i} filler tail {i % 4}"
        if i % 5 == 0:
            body += " rare token"
        rows.append((i, body))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _dels(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id long")


def test_maintained_delete_serves_maxscore_exactly(spark, tmp_path):
    """delete(B, maintain) keeps the probe exact vs a survivor build,
    with no fallback and a provable row skip — under the default the
    same probe falls back until compact."""
    docs = _corpus(spark)
    idx = str(tmp_path / "idx")
    text_index_build(docs, idx, n_buckets=4)
    text_index_delete(
        spark, _dels(spark, range(0, 40, 3)), idx, maintain_termstats=True
    )
    surv = str(tmp_path / "surv")
    text_index_build(docs.where(F.col("doc_id") % 3 != 0), surv, n_buckets=4)
    st: dict = {}
    got = _rows(
        text_index_probe_bm25_maxscore(spark, idx, TERMS, k=3, stats_out=st)
    )
    assert st["fallback"] is None, st
    assert st["rows_skipped_lower_bound"] > 0, st
    assert got == _rows(text_index_probe_bm25(spark, surv, TERMS, k=3))
    # and the plain probe on the deleted index agrees too (read repair)
    assert got == _rows(text_index_probe_bm25(spark, idx, TERMS, k=3))


def test_default_delete_still_invalidates(spark, tmp_path):
    docs = _corpus(spark)
    idx = str(tmp_path / "idx")
    text_index_build(docs, idx, n_buckets=4)
    text_index_delete(spark, _dels(spark, range(0, 40, 3)), idx)
    st: dict = {}
    got = _rows(
        text_index_probe_bm25_maxscore(spark, idx, TERMS, k=3, stats_out=st)
    )
    assert st["fallback"] == "no_termstats", st
    assert got == _rows(text_index_probe_bm25(spark, idx, TERMS, k=3))


def test_multi_maxscore_serves_pending_ledger(spark, tmp_path):
    """The batched probe no longer falls back on a pending ledger:
    batch results ≡ the plain batched probe on the same deleted index,
    per-query skips intact."""
    docs = _corpus(spark)
    idx = str(tmp_path / "idx")
    text_index_build(docs, idx, n_buckets=4)
    text_index_delete(
        spark, _dels(spark, range(0, 40, 3)), idx, maintain_termstats=True
    )
    batch = [(0, list(TERMS)), (1, ["rare"]), (2, ["zznope"])]
    st: dict = {}
    got = _rows(
        text_index_probe_bm25_multi_maxscore(
            spark, idx, batch, k=3, stats_out=st
        )
    )
    assert st["fallback"] is None, st
    assert st["per_query"][0]["rows_skipped_lower_bound"] > 0, st
    assert got == _rows(
        text_index_probe_bm25_multi(spark, idx, batch, k=3)
    )


def test_decrement_df_matches_survivor_build(spark, tmp_path):
    """Terms whose every doc is retired VANISH from the table, and an
    overlapping re-delete decrements only the newly retired ids — the
    maintained df column equals a fresh survivor build's, key for key
    (max_tf/min_dl are bounds, not compared)."""
    docs = _corpus(spark)
    idx = str(tmp_path / "idx")
    text_index_build(docs, idx, n_buckets=4)
    text_index_delete(
        spark, _dels(spark, range(0, 40, 5)), idx, maintain_termstats=True
    )
    ts = spark.read.parquet(idx + "/termstats")
    assert ts.where(F.col("term") == "rare").count() == 0
    # docs 0 and 5 are already on the ledger; only 7 is new
    text_index_delete(
        spark, _dels(spark, [0, 5, 7]), idx, maintain_termstats=True
    )
    got = {
        r["term"]: r["df"]
        for r in spark.read.parquet(idx + "/termstats").collect()
    }
    surv = str(tmp_path / "surv")
    text_index_build(
        docs.where((F.col("doc_id") % 5 != 0) & (F.col("doc_id") != 7)),
        surv,
        n_buckets=4,
    )
    want = {
        r["term"]: r["df"]
        for r in spark.read.parquet(surv + "/termstats").collect()
    }
    assert got == want


def test_append_after_maintained_delete_keeps_table_exact(spark, tmp_path):
    """Composition: maintained delete then append of fresh ids — the
    append stager merges over the decremented table, so df stays
    survivor-exact and the probe still matches a from-scratch build of
    the final membership."""
    docs = _corpus(spark, n=30)
    extra = spark.createDataFrame(
        [(100 + i, f"shared common appended body {i}") for i in range(6)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    text_index_build(docs, idx, n_buckets=4)
    text_index_delete(
        spark, _dels(spark, range(0, 30, 3)), idx, maintain_termstats=True
    )
    text_index_append(extra, idx, n_buckets=4)
    final = str(tmp_path / "final")
    text_index_build(
        docs.where(F.col("doc_id") % 3 != 0).unionByName(extra),
        final,
        n_buckets=4,
    )
    st: dict = {}
    got = _rows(
        text_index_probe_bm25_maxscore(spark, idx, TERMS, k=3, stats_out=st)
    )
    assert st["fallback"] is None, st
    assert got == _rows(text_index_probe_bm25(spark, final, TERMS, k=3))
    got_df = {
        r["term"]: r["df"]
        for r in spark.read.parquet(idx + "/termstats").collect()
    }
    want_df = {
        r["term"]: r["df"]
        for r in spark.read.parquet(final + "/termstats").collect()
    }
    assert got_df == want_df


def test_crash_orderings_leave_table_absent_never_stale(spark, tmp_path):
    """The staged-rename guarantee for the delete leg: a leftover
    staging sibling is garbage (swept by the next mutation, invisible
    to readers), and a simulated crash after invalidation leaves the
    probe falling back — exact — rather than serving a stale df."""
    from parkour_spark import fs as pfs
    from parkour_spark.operators.textindex import (
        _invalidate_termstats,
        _stage_decremented_termstats,
    )

    docs = _corpus(spark)
    idx = str(tmp_path / "idx")
    text_index_build(docs, idx, n_buckets=4)
    # simulate: stage + invalidate, then crash before ledger/rename
    staging = _stage_decremented_termstats(
        spark, idx, _dels(spark, [0, 5]), "doc_id"
    )
    assert staging is not None and pfs.exists(spark, staging)
    _invalidate_termstats(spark, idx)
    st: dict = {}
    got = _rows(
        text_index_probe_bm25_maxscore(spark, idx, TERMS, k=3, stats_out=st)
    )
    assert st["fallback"] == "no_termstats", st
    assert got == _rows(text_index_probe_bm25(spark, idx, TERMS, k=3))
    # the next (maintained) delete sweeps the leftover and heals via
    # its own protocol: stager finds no live table → returns None, so
    # the table stays absent (never reconstructed from a torn state)
    text_index_delete(
        spark, _dels(spark, [0, 5]), idx, maintain_termstats=True
    )
    assert not pfs.glob_paths(spark, idx + "/termstats.__next-*__")
    assert not pfs.exists(spark, idx + "/termstats")
