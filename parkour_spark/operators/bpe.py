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
    merges = []
    # Per-round persists are LAZY (r12): each round's 1-row argmax
    # collect is the only consumer of the running vocab, and computing
    # it populates the round's cache as a side effect — the former
    # eager count() doubled the job count for zero extra information.
    # The PREVIOUS round's blocks unpersist only after that collect so
    # the new cache never recomputes upstream of a cold cache
    # (consumption is strictly sequential here — the concurrent-stage
    # hazard that forces eager materialization in the dedup family
    # does not apply to a driver loop).
    prev = None
    for step in range(1, n_merges + 1):
        best = (
            _pair_counts(vocab)
            .orderBy(F.col("c").desc(), F.col("l"), F.col("r"))
            .limit(1)
            .collect()
        )
        if prev is not None:
            prev.unpersist()
            prev = None
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
        prev, vocab = vocab, nxt
    vocab.unpersist()
    if prev is not None:
        prev.unpersist()
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


def bpe_train_batched(
    words: DataFrame,
    n_rounds: int = 3,
    batch: int = 8,
    word_col: str = "word",
    count_col: str = "wc",
    checkpoint_every: int = 8,
) -> DataFrame:
    """BATCH-GREEDY BPE training — the scale path for large merge
    counts (r9 verdict #5: `bpe_train`'s one-merge-per-round driver
    loop is right for the gated small n but not a 30k-merge production
    trainer; at one corpus-scan-sized round per merge, 30k merges is
    30k rounds). Each round here learns UP TO `batch` merges from ONE
    pair-count pass, so the round count — the number of vocab-sized
    shuffles and the only driver round-trips — is ~n_merges/batch
    instead of n_merges.

    Batch selection rule (deterministic AND engine-replayable): rank
    the round's pairs by (count DESC, lhs, rhs), keep the top `batch`,
    and select a pair iff no higher-ranked pair of that top slice
    shares a symbol with it OR produces one of its symbols (merged
    u.lhs+u.rhs equal to the pair's lhs/rhs — applying u first would
    CREATE occurrences of the pattern and stale its count). The
    selected set's merges therefore neither consume nor create each
    other's occurrences, so all counts measured at the round start
    stay valid for every selected pair, and the round's replaces are
    applied in rank order (sentinel-string `replace` — the same left-to-right
    non-overlapping semantics in Spark and ANSI SQL that make
    `bpe_train` engine-exact, so the whole batched trajectory replays
    in DuckDB as unrolled CTEs: top-slice, NOT-EXISTS conflict filter,
    recursive-CTE replace chain).

    Semantics vs sequential greedy: within a round, later merges are
    chosen WITHOUT recounting after earlier ones — the standard
    batch-greedy trade (pair counts are exact as of the round start).
    Rule-of-thumb: sequential `bpe_train` for exact-greedy small
    vocabularies; this for production merge counts.

    Returns (step, round, rk, lhs, rhs, pair_count): `step` is the
    global merge index in applied order, `rk` the rank within the
    round's selection, `pair_count` the round-start count. Driver
    traffic per round is `batch` rows; the vocabulary itself is never
    collected.

    Plan-depth bound (r11, r10 verdict #7): each round chains up to
    `batch` scan-side `replace` projections onto the running vocab;
    persist caches the BLOCKS but Catalyst still re-analyzes the full
    chained lineage every round, so analysis time would grow with
    TOTAL merges learned. Every `checkpoint_every` rounds the vocab is
    localCheckpoint'ed (eager), truncating the logical plan to a scan
    of the materialized blocks — per-round analysis cost stays bounded
    by batch × checkpoint_every expressions regardless of n_rounds
    (values unchanged: the replaces are already applied when the
    checkpoint lands)."""
    spark = words.sparkSession
    vocab = vocab_from_words(words, word_col, count_col).persist()
    out, step = [], 0
    # Lazy per-round persists, same protocol as bpe_train (r12): the
    # round's top-slice collect populates the cache; the previous
    # round's blocks free right after it.
    prev = None
    for rnd in range(1, n_rounds + 1):
        top = (
            _pair_counts(vocab)
            .orderBy(F.col("c").desc(), F.col("l"), F.col("r"))
            .limit(batch)
            .collect()
        )
        if prev is not None:
            prev.unpersist()
            prev = None
        sel = []
        for i, t in enumerate(top):
            t_syms = {t["l"], t["r"]}
            if any(
                u["l"] in t_syms
                or u["r"] in t_syms
                # the PRODUCED symbol matters too (r10 review): if a
                # higher-ranked pair merges into one of t's source
                # symbols (u.l+u.r == t.l or t.r), applying u first
                # CREATES occurrences of t's pattern, so t's
                # round-start count would be stale — exclude it
                or (u["l"] + u["r"]) in t_syms
                for u in top[:i]
            ):
                continue  # conflicts with a higher-ranked top-slice pair
            sel.append(t)
        if not sel:
            break
        nxt = vocab
        for rk, t in enumerate(sel, 1):
            step += 1
            out.append((step, rnd, rk, t["l"], t["r"], int(t["c"])))
            nxt = nxt.withColumn(
                "s",
                F.expr(
                    "replace(s, {}, {})".format(
                        _sql_str(f"{_L}{t['l']}{_R}{_L}{t['r']}{_R}"),
                        _sql_str(f"{_L}{t['l']}{t['r']}{_R}"),
                    )
                ),
            )
        if checkpoint_every and rnd % checkpoint_every == 0:
            # the checkpoint is a materialization barrier, so the old
            # vocab's cache has been fully consumed here — free it now
            nxt = nxt.localCheckpoint(eager=True)  # truncate lineage
            vocab.unpersist()
        else:
            nxt = nxt.persist()
            prev = vocab
        vocab = nxt
    vocab.unpersist()
    if prev is not None:
        prev.unpersist()
    return spark.createDataFrame(
        out,
        "step int, round int, rk int, lhs string, rhs string, pair_count long",
    )
