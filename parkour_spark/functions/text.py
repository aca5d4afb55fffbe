"""Text-analysis functions: tokenize, language-ID, quality, fingerprints.

Beyond-reference surface (SURVEY §7.6): the reference's map tasks call
arbitrary JVM string functions (e.g. the word-count tokenizer,
examples/parkour/example/word_count.clj:9-13); this module provides the
training-data-pipeline equivalents as *pure Column expressions* — JVM-side,
whole-stage-codegen'd, no Python in the hot path.

Cross-engine determinism: fingerprints use md5 (identical in Spark and
DuckDB) so every operator here is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# A small English stopword list for the language-ID heuristic. Fixed and
# ordered so Spark and the SQL oracle agree exactly.
EN_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are",
    "was", "for", "on", "with", "as", "at", "by", "it", "be", "this",
)

WHITESPACE = r"\s+"


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (the canonical reference map op),
    empty-token-free."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.trim(c), WHITESPACE), lambda t: t != "")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def char_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.length(c)


def avg_token_len(text: Column | str) -> Column:
    """Mean token length — a standard quality signal."""
    t = tokens(text)
    return F.aggregate(t, F.lit(0).cast("double"), lambda acc, x: acc + F.length(x)) / F.size(t)


def stopword_ratio(text: Column | str) -> Column:
    """Fraction of tokens in the fixed English stopword list."""
    t = tokens(F.lower(F.col(text) if isinstance(text, str) else text))
    n_stop = F.size(F.filter(t, lambda x: x.isin(*EN_STOPWORDS)))
    return n_stop.cast("double") / F.size(t)


def langid_en(text: Column | str, threshold: float = 0.05) -> Column:
    """Heuristic language ID: stopword-ratio >= threshold → 'en' else
    'unk'. (Real n-gram models plug in the same Column slot.)"""
    return F.when(stopword_ratio(text) >= threshold, F.lit("en")).otherwise(F.lit("unk"))


def quality_score(text: Column | str) -> Column:
    """Composite quality score in [0,1]:
    0.4 * bounded-length + 0.3 * stopword presence + 0.3 * mean-token-len
    band. Deterministic arithmetic only (oracle-expressible)."""
    c = F.col(text) if isinstance(text, str) else text
    len_term = F.least(F.length(c).cast("double") / F.lit(500.0), F.lit(1.0))
    stop_term = F.least(stopword_ratio(c) * 10.0, F.lit(1.0))
    atl = avg_token_len(c)
    atl_term = F.when((atl >= 3.0) & (atl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.0))
    return F.round(0.4 * len_term + 0.3 * stop_term + 0.3 * atl_term, 4)


def fingerprint(text: Column | str) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.
    md5 is bit-identical across Spark and DuckDB → oracle-checkable; at
    scale it's a JVM-native codegen'd expression."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), WHITESPACE, " "))


def shingles(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles (for MinHash/Jaccard dedup): array of
    space-joined n-token windows. Pure Column expression via transform
    over a token-index sequence."""
    t = tokens(F.lower(F.col(text) if isinstance(text, str) else text))
    k = F.size(t)
    idx = F.sequence(F.lit(0), F.greatest(k - n, F.lit(0)))
    return F.when(
        k >= n,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(t, i + 1, n))),
    ).otherwise(F.array(F.concat_ws(" ", t)))
