"""Probabilistic record linkage — Fellegi & Sunter (JASA 1969), the
standard model behind every MDM/entity-resolution engine (Splink,
Zingg, dedupe.io): candidate pairs from BLOCKING, per-field agreement
comparisons, and a log-likelihood-ratio match weight

    W(pair) = Σ_fields  agree ? ln(m/u) : ln((1−m)/(1−u))

where m = P(field agrees | true match) and u = P(field agrees |
non-match). Pairs classify as match / possible (clerical review) /
non-match by two thresholds on W.

Beyond-reference surface (SURVEY §7.6 MDM family, beside
cdc.golden_record — survivorship needs linked clusters first; this is
the operator that produces them).

Spark-first + oracle-exact design:
- WEIGHTS ARE INTEGER MICRO-NATS, precomputed driver-side from (m, u)
  and inlined as literals: the per-pair score is an exact int64 sum of
  per-field constants, so the whole scorer replays bit-for-bit in SQL
  (the same integer-micro-unit discipline as the LM scores / kappa /
  G² operators). One float never enters the aggregate.
- BLOCKING IS THE SCALE KNOB: `blocked_pairs` equi-joins on a blocking
  key (sorted-neighborhood / LSH from the dedup module compose the
  same way), so candidate volume is Σ_b |A_b|·|B_b| — never |A|·|B|.
  The scorer itself is a scan-side fold over the candidate table: zero
  additional shuffles, plan shape identical at 100 TB.
- NULL field values score 0 (the Fellegi–Sunter "comparison not made"
  convention — absence of evidence moves the weight neither way).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F


def fs_weights_micro(m: float, u: float) -> tuple[int, int]:
    """(agreement, disagreement) weights in integer micro-nats for one
    field: round(1e6·ln(m/u)) and round(1e6·ln((1−m)/(1−u))).
    Validates 0 < u, m < 1 and m > u (a field whose agreement is no
    likelier under a match carries no linkage signal — almost always a
    mis-estimated parameter, so it raises rather than silently
    inverting the evidence)."""
    if not (0.0 < m < 1.0 and 0.0 < u < 1.0):
        raise ValueError(f"m/u must be in (0, 1), got m={m} u={u}")
    if m <= u:
        raise ValueError(
            f"m={m} <= u={u}: agreement must be likelier under a match"
        )
    return (
        int(round(1e6 * math.log(m / u))),
        int(round(1e6 * math.log((1.0 - m) / (1.0 - u)))),
    )


def blocked_pairs(
    a: DataFrame,
    b: DataFrame,
    block_col: str,
    id_col: str = "id",
    max_block: int | None = 1000,
) -> DataFrame:
    """Candidate pairs by exact blocking: a ⋈ b on `block_col`, every
    non-id column carried with `_a`/`_b` suffixes. `max_block` drops
    blocking keys whose A-side exceeds the cap (the df-cap discipline
    every candidate generator in this engine carries — a degenerate
    block like an empty-string key would otherwise go quadratic; a
    dropped hot key belongs to a second, finer blocking pass). Pass
    None to disable. Self-linkage (a is b) dedups by id order
    upstream of the scorer if desired — this generator stays
    cross-product-per-block by contract."""
    av = a.select(
        F.col(id_col).alias("id_a"),
        F.col(block_col).alias("__blk"),
        *[
            F.col(c).alias(f"{c}_a")
            for c in a.columns
            if c not in (id_col, block_col)
        ],
    )
    if max_block is not None:
        ok = (
            av.groupBy("__blk")
            .count()
            .where(F.col("count") <= max_block)
            .select("__blk")
        )
        av = av.join(ok, "__blk")
    bv = b.select(
        F.col(id_col).alias("id_b"),
        F.col(block_col).alias("__blk"),
        *[
            F.col(c).alias(f"{c}_b")
            for c in b.columns
            if c not in (id_col, block_col)
        ],
    )
    return av.join(bv, "__blk").drop("__blk")


def fs_score(
    pairs: DataFrame,
    fields: dict[str, tuple[float, float]],
    match_threshold_micro: int,
    non_match_threshold_micro: int,
    agree: dict[str, Column] | None = None,
    tf_weights: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Score candidate pairs with the Fellegi–Sunter log-likelihood
    ratio and classify by thresholds. `fields` maps a field name to its
    (m, u) probabilities; agreement for field f defaults to the
    null-safe equality `f_a <=> f_b` over `blocked_pairs`' suffixed
    columns, overridable per field via `agree` (e.g. a normalized or
    fuzzy comparator Column). A NULL on either side contributes 0
    (comparison not made). Output = input columns +

      (score_micro, decision ∈ {'match', 'possible', 'non_match'})

    with score_micro an exact int64 sum of inlined integer constants —
    the engine-exact property that lets a SQL oracle replay every pair
    bit-for-bit. Thresholds are in the same micro-nat units
    (`fs_weights_micro` converts from probabilities).

    `tf_weights` maps a field to its per-VALUE agreement-weight table
    (`fs_tf_weights`): for those fields, AGREEMENT scores the value's
    own weight — rare-value agreement counts for more — joined in via
    broadcast on the agreeing side's value (one broadcast hash join
    per TF field, nothing row-sized shuffles); an agreeing value
    absent from the reference table falls back to the field's global
    agreement weight. Disagreement keeps the field's global
    disagreement weight (term frequency conditions on the AGREEMENT
    event only)."""
    if match_threshold_micro <= non_match_threshold_micro:
        raise ValueError(
            "match threshold must exceed the non-match threshold"
        )
    agree = agree or {}
    tf_weights = tf_weights or {}
    scored = pairs
    total = F.lit(0).cast("long")
    for f, (m, u) in fields.items():
        wa, wd = fs_weights_micro(m, u)
        cmp_ab = agree.get(f, F.col(f"{f}_a").eqNullSafe(F.col(f"{f}_b")))
        both = F.col(f"{f}_a").isNotNull() & F.col(f"{f}_b").isNotNull()
        if f in tf_weights:
            w = tf_weights[f].select(
                F.col("value").alias(f"__tfv_{f}"),
                F.col("w_micro").alias(f"__tfw_{f}"),
            )
            scored = scored.join(
                F.broadcast(w),
                scored[f"{f}_a"] == w[f"__tfv_{f}"],
                "left",
            ).drop(f"__tfv_{f}")
            agree_w = F.coalesce(F.col(f"__tfw_{f}"), F.lit(wa))
        else:
            agree_w = F.lit(wa)
        term = F.when(~both, F.lit(0)).when(
            cmp_ab, agree_w
        ).otherwise(F.lit(wd))
        total = total + term.cast("long")
    scored = scored.withColumn("score_micro", total).drop(
        *[f"__tfw_{f}" for f in tf_weights]
    )
    return scored.withColumn(
        "decision",
        F.when(
            F.col("score_micro") >= match_threshold_micro, F.lit("match")
        )
        .when(
            F.col("score_micro") <= non_match_threshold_micro,
            F.lit("non_match"),
        )
        .otherwise(F.lit("possible")),
    )


def fs_tf_weights(
    records: DataFrame, field: str, m: float
) -> DataFrame:
    """Per-VALUE agreement weights — the term-frequency adjustment that
    is Splink's headline refinement of plain Fellegi–Sunter: agreeing
    on "John Smith" is weak evidence, agreeing on a one-of-a-kind name
    is near-conclusive. Under the non-match hypothesis two random
    records agree on value v with probability p_v = cnt_v / n (its
    term frequency), so the per-value Bayes factor for agreement ON v
    is m / p_v and

        w_micro(v) = round(1e6 · ln(m · n / cnt_v))

    Returns (value, w_micro): a value-domain-sized table that
    BROADCASTS into the scorer (fs_score's tf_weights) — computed once
    per reference corpus from one partial-agg count, like every other
    broadcast artifact here. NULLs are excluded (no agreement can
    happen on them). F.log rounded to integer micro-nats is the
    cross-engine-exact discipline the NB classifier established
    (classify.nb_train)."""
    if not (0.0 < m < 1.0):
        raise ValueError(f"m must be in (0, 1), got {m}")
    nn = records.where(F.col(field).isNotNull())
    counts = nn.groupBy(F.col(field).alias("value")).count()
    total = nn.agg(F.count(F.lit(1)).alias("__n"))
    return counts.crossJoin(F.broadcast(total)).select(
        "value",
        F.round(
            F.log(
                F.lit(float(m))
                * F.col("__n").cast("double")
                / F.col("count")
            )
            * 1e6
        )
        .cast("long")
        .alias("w_micro"),
    )


def blocking_quality(
    cand: DataFrame,
    truth: DataFrame,
    n_a: int,
    n_b: int,
) -> DataFrame:
    """The two numbers every blocking scheme is tuned by (standard
    record-linkage evaluation, e.g. Christen's *Data Matching*):

      pair completeness  PC = |cand ∩ truth| / |truth|
          — the RECALL of blocking: what fraction of true matches
            survive into the candidate set (a missed block is a match
            the scorer never sees);
      reduction ratio    RR = 1 − |cand| / (n_a · n_b)
          — how much of the quadratic comparison space blocking
            eliminated.

    `cand` and `truth` are (id_a, id_b) pair tables; `n_a`/`n_b` the
    full table sizes. One-row exact report (counts + basis points —
    floor(10⁴·x), integer-exact): (n_candidates, n_true, n_found,
    pc_bp, rr_bp). The PC join is truth-sized (truth is small by
    definition — a labeled evaluation set); candidate counting is one
    partial agg. Tuning loop: raise PC with a second, finer blocking
    pass; raise RR with tighter keys — this report prices the trade."""
    c = cand.select("id_a", "id_b").distinct()
    t = truth.select("id_a", "id_b").distinct()
    found = c.join(t, ["id_a", "id_b"], "left_semi")
    n_cand = c.count()
    n_true = t.count()
    n_found = found.count()
    total = n_a * n_b
    spark = cand.sparkSession
    return spark.createDataFrame(
        [
            (
                n_cand,
                n_true,
                n_found,
                (10000 * n_found) // n_true if n_true else None,
                (10000 * (total - n_cand)) // total if total else None,
            )
        ],
        "n_candidates long, n_true long, n_found long, pc_bp long, rr_bp long",
    )
