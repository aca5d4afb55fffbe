"""Gopher quality rules (corpus.gopher_quality): per-rule planted docs,
scaled-integer threshold boundaries, and zero-shuffle plan shape."""

import pytest
from pyspark.sql import functions as F

from parkour_spark.operators.corpus import gopher_quality

GOOD = (
    "the quick brown fox jumps over the lazy dog and runs to the river "
    "with great speed because it must have been chased by hounds that "
    "kept barking all day long near the old farm house by the meadow "
    "where children often play games during warm summer afternoons and "
    "everyone in the village agreed that the harvest would be plentiful"
)


def _one(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    return gopher_quality(df, **kw).collect()[0]


def test_good_doc_passes(spark):
    r = _one(spark, GOOD)
    assert r.passes, r
    assert r.n_words >= 50 and r.n_stop_hits >= 2


def test_word_count_band(spark):
    r = _one(spark, "too short to pass the word count rule")
    assert not r.ok_words and not r.passes


def test_mean_word_length_boundaries(spark):
    # mean exactly 3 (inclusive): 60 three-char words, ok_mean_len holds
    r = _one(spark, " ".join(["the"] * 30 + ["and"] * 30))
    assert r.ok_mean_len
    # mean < 3: sixty 2-char words fails (120 chars < 3·60)
    r = _one(spark, " ".join(["to"] * 30 + ["of"] * 30))
    assert not r.ok_mean_len
    # mean > 10 fails
    r = _one(spark, " ".join(["extraordinarily"] * 60))
    assert not r.ok_mean_len


def test_symbol_ratio(spark):
    base = GOOD.split()
    # 50 words + 6 hashes appended as separate symbols: 10·6 > 56 words+6
    spammy = " ".join(base[:50]) + " # # # # # #"
    r = _one(spark, spammy)
    assert not r.ok_symbols
    assert r.n_symbols == 6


def test_ellipsis_counted_in_triplets(spark):
    r = _one(spark, GOOD + " wait...... hmm")
    assert r.n_symbols == 2  # six dots = two '...' occurrences


def test_alpha_word_fraction(spark):
    words = GOOD.split()[:48] + ["123", "456", "789", "000"] * 4
    r = _one(spark, " ".join(words))  # 16/64 non-alpha → 75% < 80%
    assert not r.ok_alpha


def test_stop_set_rule(spark):
    # long doc, right lengths, but only one distinct stop word
    r = _one(spark, " ".join(["the"] + ["word"] * 59))
    assert r.n_stop_hits == 1 and not r.ok_stop


def test_bullet_and_ellipsis_lines(spark):
    lines = ["- bullet item number %d here" % i for i in range(10)]
    r = _one(spark, "\n".join(lines))
    assert not r.ok_bullets  # 10/10 lines bulleted > 90%
    lines = [GOOD, "trailing thought...", "another trailing one...", GOOD]
    r = _one(spark, "\n".join(lines))
    assert not r.ok_ellipsis  # 2/4 = 50% > 30%


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(1, GOOD)], ["doc_id", "text"])
    plan = gopher_quality(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# token_entropy_micronats
# ---------------------------------------------------------------------------


def test_token_entropy_hand_computed(spark):
    import math

    from parkour_spark.functions.text import token_entropy_micronats, tokens
    from pyspark.sql import functions as F

    rows = [
        (1, "a a a a"),          # H = 0 (one symbol)
        (2, "a b c d"),          # H = ln 4, uniform
        (3, "a a b"),            # H = (2/3)ln(3/2) + (1/3)ln 3
        (4, ""),                 # empty → 0
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: r.e
        for r in df.select(
            "doc_id",
            token_entropy_micronats(tokens(F.lower(F.col("text")))).alias("e"),
        ).collect()
    }
    assert out[1] == 0
    assert out[4] == 0
    # uniform over 4: four terms of round(1e6 * (1/4) * ln 4)
    assert out[2] == 4 * round(1e6 * 0.25 * math.log(4))
    expect3 = round(1e6 * 2 / 3 * math.log(3 / 2)) + round(1e6 * 1 / 3 * math.log(3))
    assert out[3] == expect3


def test_token_entropy_zero_shuffle_plan(spark):
    from parkour_spark.functions.text import token_entropy_micronats, tokens
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, "a b a c")], ["doc_id", "text"])
    q = df.select(
        "doc_id", token_entropy_micronats(tokens(F.col("text"))).alias("e")
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Generate" not in plan
