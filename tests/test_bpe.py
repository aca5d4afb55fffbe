"""BPE training semantics (operators/bpe.py): greedy merge edge cases,
deterministic tie-breaking, and the encoder-side segmentation — all on
hand-built vocabularies with known-correct answers."""

import pytest
from pyspark.sql import functions as F

from parkour_spark.operators.bpe import bpe_segment, bpe_train, vocab_from_words


def _words(spark, rows):
    return spark.createDataFrame(rows, "word string, wc long")


def test_run_merge_is_greedy_left_to_right(spark):
    # "aaa" with merge (a,a) must segment as [aa, a], never [a, aa]
    v = vocab_from_words(_words(spark, [("aaa", 1)]))
    seg = bpe_segment(v, [("a", "a")]).collect()[0]
    assert seg["s"] == "<aa><a>"
    assert seg["n_tokens"] == 2


def test_no_cross_symbol_false_match(spark):
    # pair (a, b) must not fire across the symbols ["ba", "b"]
    v = vocab_from_words(_words(spark, [("x", 1)])).withColumn(
        "s", F.lit("<ba><b>")
    )
    seg = bpe_segment(v, [("a", "b")]).collect()[0]
    assert seg["s"] == "<ba><b>"


def test_most_frequent_pair_wins(spark):
    # "ab" appears 5 times, "cd" 3 times -> first merge is (a, b)
    m = bpe_train(_words(spark, [("ab", 5), ("cd", 3)]), n_merges=1).collect()
    assert (m[0]["lhs"], m[0]["rhs"], m[0]["pair_count"]) == ("a", "b", 5)


def test_tie_breaks_lexicographically(spark):
    # equal counts -> lexicographically smallest (lhs, rhs) pair
    m = bpe_train(_words(spark, [("zy", 2), ("ab", 2)]), n_merges=1).collect()
    assert (m[0]["lhs"], m[0]["rhs"]) == ("a", "b")


def test_merged_symbol_participates_in_later_rounds(spark):
    # classic cascade: "abc"xN -> merge1 (a,b), merge2 (ab, c)
    m = bpe_train(_words(spark, [("abc", 4)]), n_merges=2).collect()
    assert (m[0]["lhs"], m[0]["rhs"]) == ("a", "b")
    assert (m[1]["lhs"], m[1]["rhs"]) == ("ab", "c")


def test_segmentation_token_count_decreases(spark):
    words = _words(spark, [("hello", 3), ("help", 2), ("yell", 1)])
    merges = [(r["lhs"], r["rhs"]) for r in bpe_train(words, n_merges=3).collect()]
    seg = bpe_segment(vocab_from_words(words), merges)
    rows = {r["word"]: r for r in seg.collect()}
    # every word's token count <= its char count, and the total shrank
    for w, r in rows.items():
        assert r["n_tokens"] <= len(w)
    assert sum(r["n_tokens"] for r in rows.values()) < sum(
        len(w) for w in rows
    )


def test_stops_when_no_pairs_left(spark):
    # single-char words have no pairs: training returns an empty table
    m = bpe_train(_words(spark, [("a", 5), ("b", 3)]), n_merges=3)
    assert m.count() == 0


# ------------------------------------------------------------------
# r10: batch-greedy trainer (bpe_train_batched)
# ------------------------------------------------------------------


def test_batched_with_batch_one_equals_sequential_greedy(spark):
    """batch=1 degenerates to exact sequential greedy: each round's top
    slice is a single pair with nothing to conflict with — so the
    merge trajectory must equal bpe_train's, merge for merge."""
    from parkour_spark.operators.bpe import bpe_train_batched

    words = _words(
        spark,
        [("banana", 6), ("bandana", 4), ("ananas", 3), ("cabana", 2)],
    )
    seq = [
        (r["step"], r["lhs"], r["rhs"], r["pair_count"])
        for r in bpe_train(words, n_merges=5).collect()
    ]
    bat = [
        (r["step"], r["lhs"], r["rhs"], r["pair_count"])
        for r in bpe_train_batched(words, n_rounds=5, batch=1).collect()
    ]
    assert bat == seq


def test_batched_round_selection_is_symbol_disjoint(spark):
    """Every round's selected pairs are pairwise symbol-disjoint (the
    property that keeps round-start counts valid for the whole batch),
    and rank 1 — the true greedy choice — is always selected."""
    from parkour_spark.operators.bpe import bpe_train_batched

    words = _words(
        spark,
        [("banana", 6), ("bandana", 4), ("ananas", 3), ("cabana", 2),
         ("cabal", 2), ("dadada", 5)],
    )
    rows = bpe_train_batched(words, n_rounds=3, batch=5).collect()
    assert rows
    by_round = {}
    for r in rows:
        by_round.setdefault(r["round"], []).append(r)
    for rnd, sel in by_round.items():
        assert min(s["rk"] for s in sel) == 1, rnd
        for i, a in enumerate(sel):
            for b in sel[i + 1:]:
                assert not ({a["lhs"], a["rhs"]} & {b["lhs"], b["rhs"]}), (
                    rnd, a, b,
                )


def test_batched_learns_multiple_merges_per_round(spark):
    """The scale property: on a corpus with several independent hot
    pairs, one round learns several merges — rounds (the serial cost)
    grow sub-linearly in merges learned."""
    from parkour_spark.operators.bpe import bpe_train_batched

    words = _words(
        spark, [("ab", 9), ("cd", 8), ("ef", 7), ("gh", 6)]
    )
    rows = bpe_train_batched(words, n_rounds=1, batch=8).collect()
    # (a,b),(c,d),(e,f),(g,h) are pairwise disjoint — one round, 4 merges
    assert len(rows) == 4
    assert {r["round"] for r in rows} == {1}


def test_batched_segmentation_compresses_monotonically(spark):
    """Applying each successive round's merges never increases the
    total token count (merges only ever join symbols)."""
    from parkour_spark.operators.bpe import (
        bpe_segment,
        bpe_train_batched,
    )

    words = _words(
        spark,
        [("banana", 6), ("bandana", 4), ("ananas", 3), ("cabana", 2)],
    )
    rows = bpe_train_batched(words, n_rounds=3, batch=4).collect()
    merges = [(r["lhs"], r["rhs"]) for r in sorted(rows, key=lambda r: r["step"])]
    v = vocab_from_words(words)
    prev = None
    for upto in range(len(merges) + 1):
        seg = bpe_segment(v, merges[:upto])
        total = sum(
            r["wc"] * r["n_tokens"] for r in seg.collect()
        )
        if prev is not None:
            assert total <= prev, upto
        prev = total


def test_batched_checkpoint_every_round_identical_merges(spark):
    """localCheckpoint lineage truncation (r11 plan-depth bound) must
    not change the learned trajectory: checkpointing every round and
    never checkpointing yield the identical merge table."""
    from parkour_spark.operators.bpe import bpe_train_batched

    words = spark.createDataFrame(
        [("banana", 10), ("bandana", 6), ("analog", 4), ("nanny", 3)],
        "word string, wc long",
    )
    a = bpe_train_batched(words, n_rounds=3, batch=4, checkpoint_every=1)
    b = bpe_train_batched(words, n_rounds=3, batch=4, checkpoint_every=0)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    assert a.count() > 0
