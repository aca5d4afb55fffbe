"""Exact-substring overlap spans (dedup.substring_overlap_spans):
planted-overlap recall, span verbatim-ness, and plan shape."""

import re

import pytest
from pyspark.sql import functions as F

from parkour_spark.operators.dedup import substring_overlap_spans

SHARED = (
    "the quick brown fox jumps over the lazy dog while carrying a basket "
    "of fresh apples to the market before sunrise"
)


def _norm(s):
    return re.sub(r"\s+", " ", s.lower().strip())


@pytest.fixture(scope="module")
def planted(spark):
    docs = [
        (1, "unique preamble alpha beta " + SHARED + " unique suffix one"),
        (2, "totally different opening words " + SHARED + " and another ending"),
        (3, "no overlap in this document at all just many filler words and "
            "more filler words padding out the text to a realistic length"),
        (4, "short unrelated doc"),
    ]
    return docs, spark.createDataFrame(docs, ["doc_id", "text"])


def test_planted_long_overlap_found_and_verbatim(planted):
    docs, df = planted
    spans = substring_overlap_spans(df, min_span=40).collect()
    hits = [r for r in spans if (r.id_a, r.id_b) == (1, 2)]
    assert hits, "planted 100+ char overlap not detected"
    n1, n2 = _norm(docs[0][1]), _norm(docs[1][1])
    for r in hits:
        # every flagged span must be VERBATIM shared text at the
        # reported offsets in both normalized docs
        sub_a = n1[r.a_start - 1 : r.a_end]
        sub_b = n2[r.b_start - 1 : r.b_start - 1 + r.span_len]
        assert sub_a == sub_b and len(sub_a) == r.span_len
    # the longest hit must cover most of the planted region (winnowing
    # trims <= k+w chars at each boundary)
    best = max(hits, key=lambda r: r.span_len)
    assert best.span_len >= len(SHARED) - 2 * 16


def test_unrelated_docs_produce_no_spans(planted):
    _, df = planted
    spans = substring_overlap_spans(df, min_span=40).collect()
    pairs = {(r.id_a, r.id_b) for r in spans}
    assert pairs == {(1, 2)}


def test_three_way_overlap_all_pairs(spark):
    mid = "shared middle segment that is comfortably longer than the minimum span"
    df = spark.createDataFrame(
        [(i, f"intro number {i} distinct words here " + mid + f" outro {i}")
         for i in range(1, 4)],
        ["doc_id", "text"],
    )
    spans = substring_overlap_spans(df, min_span=40, max_df=50).collect()
    assert {(r.id_a, r.id_b) for r in spans} == {(1, 2), (1, 3), (2, 3)}


def test_boilerplate_df_cap_drops_common_fps(spark):
    """A substring shared by MORE than max_df docs is boilerplate: its
    fps are dropped and no pair explosion happens."""
    boiler = "this exact boilerplate footer appears in every single document of the corpus"
    df = spark.createDataFrame(
        [(i, f"doc {i} individual content words " + boiler) for i in range(30)],
        ["doc_id", "text"],
    )
    spans = substring_overlap_spans(df, min_span=40, max_df=5).collect()
    assert spans == []


def test_no_cartesian_in_plan(spark):
    df = spark.createDataFrame([(1, "a b c"), (2, "d e f")], ["doc_id", "text"])
    plan = substring_overlap_spans(df)._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_apply_cuts_exactly_the_merged_spans(spark, planted=None):
    """substring_dedup_apply must equal a driver-side reference cut:
    merge b-side intervals, splice them out of the normalized text."""
    import hashlib

    from parkour_spark.operators.dedup import substring_dedup_apply

    docs = [
        (1, "unique preamble alpha " + SHARED + " unique suffix one"),
        (2, "totally different opening text " + SHARED + " and another end"),
        (3, "no overlap here at all just random words and more random filler"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    spans_df = substring_overlap_spans(df, min_span=30)
    got = {r.doc_id: r for r in substring_dedup_apply(df, spans_df).collect()}

    spans = spans_df.collect()
    n2 = _norm(docs[1][1])
    ivs = sorted((r.b_start, r.b_start + r.span_len - 1) for r in spans if r.id_b == 2)
    merged = []
    for s, e in ivs:
        if merged and s <= merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], max(merged[-1][1], e))
        else:
            merged.append((s, e))
    clean, pos = "", 1
    for s, e in merged:
        clean += n2[pos - 1 : s - 1]
        pos = e + 1
    clean += n2[pos - 1 :]
    assert got[2].clean_md5 == hashlib.md5(clean.encode()).hexdigest()
    assert got[2].clean_len == len(clean)
    assert got[2].removed_chars == sum(e - s + 1 for s, e in merged)
    # docs that are only ever the a-side (or unflagged) pass through
    for d in (1, 3):
        nd = _norm(docs[d - 1][1])
        assert got[d].clean_md5 == hashlib.md5(nd.encode()).hexdigest()
        assert got[d].removed_chars == 0 and got[d].n_spans == 0


def test_apply_keeps_first_occurrence(spark):
    """After apply, the shared text survives in exactly one doc (the
    lowest id): re-running span detection on cleaned docs finds
    nothing. The detect→apply→detect fixpoint is the dedup contract."""
    from parkour_spark.operators.dedup import substring_dedup_apply

    docs = [(i, f"opening {i} words " + SHARED + f" closing {i}") for i in (1, 2, 3)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    spans_df = substring_overlap_spans(df, min_span=40)
    cleaned = substring_dedup_apply(df, spans_df).collect()
    kept = {r.doc_id: r.removed_chars for r in cleaned}
    assert kept[1] == 0 and kept[2] > 0 and kept[3] > 0


def test_span_plan_shuffle_budget(spark):
    """The span detector's plan must hold its shuffle budget: the widen
    repartition (no-op at scale), the fp-bucket groupBy, and ONE window
    exchange for (id_a, id_b, delta) — run-segmentation's lag and
    running-sum windows must share a single sort."""
    df = spark.createDataFrame([(1, "a b c d e f g"), (2, "b c d e f g h")],
                               ["doc_id", "text"])
    plan = (
        substring_overlap_spans(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") <= 3, plan


def test_delta_probes_corpus_only(spark):
    """Ingest shape: batch docs flag spans only against CORPUS docs
    (never batch-batch or corpus-corpus here), offsets verbatim on both
    sides' normalized text."""
    from parkour_spark.operators.dedup import substring_spans_delta

    corpus = [
        (1, "corpus doc one preamble " + SHARED + " corpus tail"),
        (2, "another corpus doc with words " + SHARED + " different tail"),
        (3, "unrelated corpus doc full of plain filler words only here"),
    ]
    batch = [
        (101, "new crawl page intro " + SHARED + " new page outro"),
        (102, "fresh unrelated page about completely other topics entirely"),
    ]
    cdf = spark.createDataFrame(corpus, ["doc_id", "text"])
    bdf = spark.createDataFrame(batch, ["doc_id", "text"])
    spans = substring_spans_delta(bdf, cdf, min_span=40).collect()
    assert {r.id_new for r in spans} == {101}
    assert {r.id_old for r in spans} <= {1, 2}
    assert {r.id_old for r in spans} == {1, 2}
    nb = _norm(batch[0][1])
    nc = {i: _norm(t) for i, t in corpus}
    for r in spans:
        assert (
            nb[r.new_start - 1 : r.new_end]
            == nc[r.id_old][r.old_start - 1 : r.old_start - 1 + r.span_len]
        )


def test_delta_persisted_index_path_equivalent(spark, tmp_path):
    """The production ingest shape: substring_fp_index is built once,
    PERSISTED (parquet round-trip), and passed to substring_spans_delta
    — results must be identical to the inline corpus_df path, and the
    probe must not re-scan corpus text. Also: omitting both corpus and
    index must fail loudly."""
    import pytest as _pytest

    from parkour_spark.operators.dedup import (
        substring_fp_index,
        substring_spans_delta,
    )

    corpus = [
        (1, "corpus doc one preamble " + SHARED + " corpus tail"),
        (2, "another corpus doc with words " + SHARED + " different tail"),
        (3, "unrelated corpus doc full of plain filler words only here"),
    ]
    batch = [(101, "new crawl page intro " + SHARED + " new page outro")]
    cdf = spark.createDataFrame(corpus, ["doc_id", "text"])
    bdf = spark.createDataFrame(batch, ["doc_id", "text"])

    p = str(tmp_path / "fp_index.parquet")
    substring_fp_index(cdf).write.parquet(p)
    idx = spark.read.parquet(p)

    via_index = substring_spans_delta(bdf, index=idx, min_span=40)
    via_corpus = substring_spans_delta(bdf, cdf, min_span=40)
    key = lambda r: (r.id_new, r.id_old, r.new_start)  # noqa: E731
    assert sorted(via_index.collect(), key=key) == sorted(
        via_corpus.collect(), key=key
    )
    with _pytest.raises(ValueError, match="corpus_df or index"):
        substring_spans_delta(bdf)


def test_pathological_self_repetitive_doc_bucket_dropped(spark):
    """df caps docs, not POSITIONS: one doc repeating the same substring
    thousands of times would explode a single fp bucket into a
    straggler (occupancy² pair fan-out in one task). The 4·max_df
    occupancy guard must drop such buckets — and leave normal docs'
    spans intact."""
    pathological = "repeat this exact boilerplate phrase " * 500
    docs = [
        (1, pathological),
        (2, pathological + " trailing difference"),
        (3, "ordinary document one with planted " + SHARED + " overlap"),
        (4, "ordinary document two also having " + SHARED + " inside"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    spans = substring_overlap_spans(df, min_span=40, max_df=50).collect()
    pairs = {(r.id_a, r.id_b) for r in spans}
    # the self-repetitive twins' shared fps exceed the occupancy cap ->
    # dropped; the ordinary planted pair must still be found
    assert (3, 4) in pairs
    assert not any(1 in p or 2 in p for p in pairs)
