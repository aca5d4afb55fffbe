"""CDC / upsert / slowly-changing-dimension operators — MERGE INTO
emulated with pure DataFrame algebra (no Delta/Iceberg dependency):
anti-join + union for upserts, window-derived validity intervals for
SCD2 history.

SCALE:
- `merge_upsert` is one shuffled anti-join (or broadcast, when the
  update batch is small — the common CDC case, hinted automatically)
  plus a union: the target is scanned once, never rewritten row-by-row.
  With a table format (Delta/Iceberg) the same logical plan becomes a
  metadata-level MERGE; this operator is the format-agnostic fallback
  and the correctness oracle for it.
- `scd2_from_events` builds the entire history in ONE window pass
  (partition by key, order by change time): valid_from = change ts,
  valid_to = next change ts, is_current = no successor. No self-join,
  no per-key iteration.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    broadcast_updates: bool = True,
) -> DataFrame:
    """MERGE INTO target USING updates: matched target rows are replaced
    by their update, unmatched updates are inserted, everything else
    passes through. Schemas must align by name.

    The plan is target ANTI-JOIN updates (drop rows being replaced)
    UNION ALL updates — one scan of each side. `broadcast_updates`
    hints the (typically small) CDC batch to keep the big target
    unshuffled.

    The batch must hold ONE row per key (standard CDC contract — SQL
    MERGE errors on multi-match too); compact a multi-version batch to
    its latest row per key first (e.g. max-ts row via a window)."""
    u = F.broadcast(updates) if broadcast_updates else updates
    keep = target.join(u.select(*keys), list(keys), "left_anti")
    return keep.unionByName(updates)


def scd2_from_events(
    changes: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a change stream:
    one row per version with [valid_from, valid_to) and is_current —
    the lead() window pattern, single shuffle on the business key."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col, *order_tiebreak)
    nxt = F.lead(ts_col).over(w)
    return changes.select(
        *key_cols,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    content_col: str,
) -> DataFrame:
    """Classify every id across two corpus snapshots: added / removed /
    changed / unchanged, comparing md5 content fingerprints (never the
    payloads — at 100 TB the diff join carries two hashes per id, not
    two documents). One full outer join on the id; the natural feeder
    for incremental pipelines (changed ∪ added rows go to
    dedup.ngram_jaccard_delta, removed ids to index cleanup).

    Presence is tracked by an explicit per-side marker, NOT by
    fingerprint nullness: a row whose content is NULL has md5(NULL) =
    NULL, and inferring presence from the fingerprint would misclassify
    it as added/removed. Fingerprints compare with null-safe equality so
    NULL content on both sides reads as unchanged."""
    o = old.select(
        F.col(id_col),
        F.md5(F.col(content_col)).alias("__fp_old"),
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        F.col(id_col),
        F.md5(F.col(content_col)).alias("__fp_new"),
        F.lit(True).alias("__in_new"),
    )
    j = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("__in_old").isNull(), "added")
        .when(F.col("__in_new").isNull(), "removed")
        .when(F.col("__fp_old").eqNullSafe(F.col("__fp_new")), "unchanged")
        .otherwise("changed")
    )
    return j.select(F.col(id_col), status.alias("status"))


def pit_enrich(
    facts: DataFrame,
    dim: DataFrame,
    key_cols: Sequence[str],
    fact_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Point-in-time (PIT) enrichment against an SCD2 dimension: each
    fact joins the dimension VERSION in force at its own timestamp —
    valid_from ≤ ts < valid_to, with a NULL valid_to meaning open —
    the temporal-correctness join behind feature stores and
    leakage-free training joins ("no attribute from the future").
    LEFT join: facts predating every version keep NULL dimension
    columns rather than silently dropping.

    The explicit [from, to) predicate (rather than an as-of carry) is
    deliberate: it stays correct when version history has GAPS (key
    deleted then re-created) where last-version-forward would extend a
    dead version. For gap-free tiled histories the asof.asof_join
    union-sort shape computes the same answer with no version fanout.

    SCALE: an equi-join on the business key bounds fanout at each
    key's VERSION COUNT (small by SCD nature — versions are change
    events, not rows); the range predicate filters inside the join.
    One shuffle per side on the key.

    Dimension attribute columns keep their original names; a fact
    column sharing a name with a dim attribute would silently produce
    duplicate output columns (ambiguous downstream selects), so name
    collisions raise instead (r6 ADVICE) — rename or pre-select on
    either side."""
    f = facts.alias("f")
    d = dim.alias("d")
    on = [F.col(f"f.{k}") == F.col(f"d.{k}") for k in key_cols]
    in_force = (F.col(f"f.{fact_ts}") >= F.col(f"d.{valid_from}")) & (
        F.col(f"d.{valid_to}").isNull()
        | (F.col(f"f.{fact_ts}") < F.col(f"d.{valid_to}"))
    )
    cond = on[0]
    for c in on[1:]:
        cond = cond & c
    dim_cols = [c for c in dim.columns if c not in key_cols]
    clash = sorted(set(dim_cols) & set(facts.columns))
    if clash:
        raise ValueError(
            f"pit_enrich: dim attribute column(s) {clash} collide with "
            "fact columns — the output would carry duplicate names; "
            "rename or pre-select on either side"
        )
    return f.join(d, cond & in_force, "left").select(
        "f.*", *[F.col(f"d.{c}").alias(c) for c in dim_cols]
    )


def golden_record(
    df: DataFrame,
    entity_col: str,
    order_col: str,
    tiebreak_col: str,
    fields: list[str],
) -> DataFrame:
    """Survivorship / golden-record merge — the MDM step after entity
    resolution: one row per entity whose every field carries that
    entity's BEST value independently (latest non-null by
    (`order_col`, `tiebreak_col`) — a field missing on the newest
    record falls back to the newest record that HAS it, which is
    exactly what row-level "keep latest" gets wrong). Returns
    (entity, n_records, <field>_golden ...).

    Determinism: per field the winner is max over the orderable struct
    (is_not_null, order, tiebreak, value) — lexicographic, so the
    non-null flag dominates, then recency, then the unique tiebreak;
    no ties remain, and the struct max is a plain aggregate both
    engines sort identically. `order_col` and `tiebreak_col` must be
    NON-NULL (engines disagree on NULL placement inside struct
    comparisons — coalesce them to a sentinel first if they can be
    missing) and (order, tiebreak) must be unique per entity.

    SCALE: ONE partial-agg shuffle to per-entity rows (k fields = k
    struct-max aggregates in the same pass); no window, no self-join,
    no per-entity sort."""
    aggs = [F.count("*").cast("long").alias("n_records")]
    for f in fields:
        aggs.append(
            F.max(
                F.struct(
                    F.col(f).isNotNull().alias("h"),
                    F.col(order_col).alias("o"),
                    F.col(tiebreak_col).alias("k"),
                    F.col(f).alias("v"),
                )
            )["v"].alias(f"{f}_golden")
        )
    return df.groupBy(F.col(entity_col).alias("entity")).agg(*aggs)
