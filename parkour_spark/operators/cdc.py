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
