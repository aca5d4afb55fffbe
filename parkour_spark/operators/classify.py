"""Distributed text classification: multinomial Naive Bayes over hashed
unigrams — the fastText-style quality/domain classifier step of a
training-data pipeline (CCNet / LLaMA-data "learned filter" slot),
trained AND applied entirely in DataFrame ops.

Beyond-reference surface (SURVEY §7 build-plan step 6): the reference
(damballa/parkour) has no ML surface; this is the additive
LLM-training-data op, expressed Spark-first. The closest reference
analog is the arbitrary-reduce task surface
(src/clojure/parkour/mapreduce.clj:107-123) such a trainer would have
been hand-written against.

Design (100 TB):
- TRAIN is two partial-agg scans: one token explode to (label, bucket)
  counts — the hashing trick bounds the feature space at n_buckets, so
  the count table is labels × n_buckets no matter the corpus size —
  and one doc-count scan for the priors. The vocabulary never drives a
  shuffle (same discipline as corpus.dsir_importance /
  hashed_doc_vectors).
- The MODEL is small by construction (labels × n_buckets rows) and
  BROADCASTS into scoring; the corpus is never joined shuffle-side.
- SCORE is one token explode collapsed scan-side to per-doc bucket
  counts, one broadcast join fanning each doc out to `labels` rows
  (that fanout IS the Naive Bayes scoring cost), one (doc, label)
  partial aggregate, and one doc-keyed argmax window.

Float determinism: log-likelihoods are integer MICRO-NATS
(round(1e6 * ln(p)) per cell, BEFORE any additive aggregate), so every
per-doc score is an exact integer sum of per-(bucket, label) integers —
order-independent and bit-identical across engines, the same
micro-unit discipline as corpus.dsir_importance and
corpus.bigram_lm_scores. The argmax is taken under the total order
(score desc, label asc), so predictions are deterministic too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from parkour_spark.functions.sampling import hash_bucket
from parkour_spark.functions.text import tokens
from parkour_spark.operators.sort import explode_fast


def nb_train(
    docs: DataFrame,
    label_col: str,
    text_col: str = "text",
    n_buckets: int = 256,
    alpha: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """Train a multinomial Naive Bayes model over hashed unigrams.

    Returns (model, priors):
    - model: (label, bucket, cnt, ll_micro) — the FULL label × bucket
      grid (zero-count cells carry the smoothing floor, so scoring
      never needs an outer join), ll_micro = round(1e6 * ln((cnt +
      alpha) / (n_label_tokens + alpha * n_buckets))).
    - priors: (label, n_docs, prior_micro) with prior_micro =
      round(1e6 * ln(n_docs_label / n_docs_total)).

    Both outputs are labels-bounded — broadcast them everywhere.
    """
    toks = tokens(F.lower(F.trim(F.col(text_col))))
    staged = docs.select(F.col(label_col).alias("label"), toks.alias("__t"))
    occ = explode_fast(staged, "__t", "__tok", keep=["label"]).select(
        "label", hash_bucket(F.col("__tok"), n_buckets).alias("bucket")
    )
    counts = occ.groupBy("label", "bucket").agg(F.count("*").alias("cnt"))
    label_tot = counts.groupBy("label").agg(F.sum("cnt").alias("__n_tok"))
    # The label universe comes from the DOC-count frame, not the token
    # counts: a label whose training docs are ALL empty contributes no
    # token rows, but it still has a prior and must hold a full
    # smoothing-floor row set in the grid (ll = ln(alpha / (0 + alpha *
    # n_buckets)) per cell) or nb_score never considers it for tokened
    # docs. Regression: r11 verdict "What's wrong #1", falsifying
    # example [('L1', []), ('L1', []), ('L0', ['alpha'])] — pinned in
    # tests/test_property.py::test_nb_zero_token_label_kept.
    by_label = docs.groupBy(F.col(label_col).alias("label")).agg(
        F.count("*").alias("n_docs")
    )
    label_base = (
        by_label.select("label")
        .join(label_tot, "label", "left")
        .na.fill({"__n_tok": 0})
    )
    # full grid generated scan-side from the tiny per-label totals row
    grid = label_base.select(
        "label",
        "__n_tok",
        F.explode(F.sequence(F.lit(0), F.lit(n_buckets - 1))).alias("bucket"),
    ).select("label", "__n_tok", F.col("bucket").cast("long").alias("bucket"))
    model = (
        grid.join(counts, ["label", "bucket"], "left")
        .na.fill({"cnt": 0})
        .select(
            "label",
            "bucket",
            F.col("cnt").cast("long").alias("cnt"),
            F.round(
                F.log(
                    (F.col("cnt") + alpha).cast("double")
                    / (F.col("__n_tok") + alpha * n_buckets)
                )
                * 1e6
            )
            .cast("long")
            .alias("ll_micro"),
        )
    )
    total = by_label.agg(F.sum("n_docs").alias("__n"))
    priors = by_label.crossJoin(F.broadcast(total)).select(
        "label",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.round(F.log(F.col("n_docs").cast("double") / F.col("__n")) * 1e6)
        .cast("long")
        .alias("prior_micro"),
    )
    return model, priors


def nb_score(
    docs: DataFrame,
    model: DataFrame,
    priors: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
) -> DataFrame:
    """Score every document against a trained model; returns
    (id_col, pred_label, score_micro) — the argmax label under the
    total order (score desc, label asc) and its integer micro-nat
    log-posterior.

    n_buckets must match the value used at train time (the bucket
    space is part of the model).

    SCALE: the token explode collapses scan-side to per-doc BUCKET
    counts (≤ min(n_tokens, n_buckets) rows per doc) before the
    broadcast model join; the only corpus-keyed exchanges are the
    (doc, bucket) partial agg, the (doc, label) partial agg, and the
    doc-keyed argmax window — priors attach by broadcast join, never a
    corpus-keyed join. Zero-token docs are kept: they are found
    scan-side (size(tokens) == 0) and score on the prior alone."""
    toks = tokens(F.lower(F.trim(F.col(text_col))))
    staged = docs.select(F.col(id_col), toks.alias("__t"))
    occ = explode_fast(staged, "__t", "__tok", keep=[id_col]).select(
        F.col(id_col), hash_bucket(F.col("__tok"), n_buckets).alias("bucket")
    )
    doc_buckets = occ.groupBy(id_col, "bucket").agg(F.count("*").alias("c"))
    per = (
        doc_buckets.join(F.broadcast(model), "bucket")
        .groupBy(id_col, "label")
        .agg(F.sum(F.col("c") * F.col("ll_micro")).alias("__s"))
    )
    # The model grid is FULL, so every doc with ≥1 token already holds a
    # row for every label in `per` — priors attach by broadcast join (no
    # corpus-keyed exchange). Only zero-token docs are missing; they are
    # found scan-side (size(tokens) == 0 — no shuffle, no anti-join) and
    # score on the prior alone.
    pri = F.broadcast(priors.select("label", "prior_micro"))
    scored_t = per.join(pri, "label").select(
        id_col,
        "label",
        (F.col("prior_micro") + F.col("__s")).cast("long").alias(
            "score_micro"
        ),
    )
    tokenless = (
        docs.where(F.size(toks) == 0)
        .select(id_col)
        .crossJoin(pri)
        .select(
            id_col,
            "label",
            F.col("prior_micro").cast("long").alias("score_micro"),
        )
    )
    scored = scored_t.unionByName(tokenless)
    w = Window.partitionBy(id_col).orderBy(
        F.col("score_micro").desc(), F.col("label").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            id_col,
            F.col("label").alias("pred_label"),
            "score_micro",
        )
    )
