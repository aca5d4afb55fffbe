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
