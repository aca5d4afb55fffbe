"""Distributed BPE (byte-pair-encoding) tokenizer training.

The classic training-data-pipeline op Spark lacks natively: learn the
top-k merge rules from a corpus. Scale shape:

- The corpus is scanned ONCE into the (word, count) vocabulary — the
  sufficient statistic for BPE. Everything after runs on the
  vocab-sized table (Heaps' law: ≪ corpus), distributed — the
  vocabulary is never collected.
- Each word's working state is its symbol string with sentinel-wrapped
  symbols: "hello" → "<h><e><l><l><o>". Merging pair (l, r) is then a
  plain `replace('<l><r>', '<lr>')` — and because string replace in
  both Spark and ANSI SQL substitutes non-overlapping occurrences
  left-to-right, it reproduces greedy BPE merge semantics EXACTLY
  (including runs: "<a><a><a>" + (a,a) → "<aa><a>"), which is what
  makes the whole trajectory engine-exact and oracle-replayable.
  The sentinels also stop cross-symbol false matches: pair (a, b)
  cannot fire inside ["ba", "b"] because its pattern "<a><b>" requires
  'a' to start a symbol.
- One iteration = one vocab-sized pair-count shuffle (partial agg
  first) + a 1-row deterministic argmax (max count, then
  lexicographically smallest pair) + a broadcast-scalar merge applied
  scan-side. k merges = k such rounds; each round's vocab persists and
  the previous round unpersists (bounded cache).

The only driver traffic is the 1-row argmax per round (the same
small-by-construction class as k-means' k×d stats).

Reference parity: beyond-reference (the reference's text handling
stops at tokenize/word-count; SURVEY §2 LLM-pipeline family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# symbols are wrapped "<sym>"; '<'/'>' must not occur inside raw tokens
# (callers tokenize to alphanumerics first — see functions.text.tokens)
_L, _R = "<", ">"


def vocab_from_words(words: DataFrame, word_col: str = "word",
                     count_col: str = "wc") -> DataFrame:
    """(word, count) → (word, wc, s) with s the sentinel-wrapped initial
    character-symbol string."""
    return words.select(
        F.col(word_col).alias("word"),
        F.col(count_col).cast("long").alias("wc"),
        F.regexp_replace(word_col, "(.)", f"{_L}$1{_R}").alias("s"),
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts weighted by word frequency: one
    explode + one partial-agg'd shuffle of vocab-sized data."""
    syms = F.split(F.regexp_replace("s", f"^{_L}|{_R}$", ""), f"{_R}{_L}")
    pairs = F.arrays_zip(
        F.slice(syms, 1, F.size(syms) - 1).alias("l"),
        F.slice(syms, 2, F.size(syms) - 1).alias("r"),
    )
    return (
        vocab.select("wc", F.explode(pairs).alias("p"))
        .select("wc", F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .groupBy("l", "r")
        .agg(F.sum("wc").alias("c"))
    )


def bpe_train(words: DataFrame, n_merges: int = 3,
              word_col: str = "word", count_col: str = "wc") -> DataFrame:
    """Learn `n_merges` BPE merge rules from a (word, count) vocabulary.
    Returns (step, lhs, rhs, pair_count) — the merge table, in learned
    order. Deterministic: ties broken by lexicographically smallest
    (lhs, rhs)."""
    spark = words.sparkSession
    vocab = vocab_from_words(words, word_col, count_col).persist()
    vocab.count()
    merges = []
    for step in range(1, n_merges + 1):
        best = (
            _pair_counts(vocab)
            .orderBy(F.col("c").desc(), F.col("l"), F.col("r"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        l, r, c = best[0]["l"], best[0]["r"], best[0]["c"]
        merges.append((step, l, r, int(c)))
        nxt = vocab.withColumn(
            "s",
            F.expr(
                "replace(s, {}, {})".format(
                    _sql_str(f"{_L}{l}{_R}{_L}{r}{_R}"), _sql_str(f"{_L}{l}{r}{_R}")
                )
            ),
        ).persist()
        nxt.count()
        vocab.unpersist()
        vocab = nxt
    vocab.unpersist()
    return spark.createDataFrame(
        merges, "step int, lhs string, rhs string, pair_count long"
    )


def bpe_segment(vocab: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Apply an ordered merge list to a (word, wc, s) vocab: the
    tokenization any BPE encoder would produce. Adds `n_tokens` (symbol
    count after all merges) — scan-side replaces only, zero shuffles."""
    out = vocab
    for l, r in merges:
        out = out.withColumn(
            "s",
            F.expr(
                "replace(s, {}, {})".format(
                    _sql_str(f"{_L}{l}{_R}{_L}{r}{_R}"), _sql_str(f"{_L}{l}{r}{_R}")
                )
            ),
        )
    return out.withColumn(
        "n_tokens", F.size(F.split(F.regexp_replace("s", f"^{_L}|{_R}$", ""), f"{_R}{_L}"))
    )


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"
