"""Unified commit contract for PERSISTED index/state artifacts.

Every long-lived artifact this engine writes beside the data — the
MinHash document index (sigs/ + bands/ + meta/), the IVF inverted-list
quantizer (_ivf_meta), the substring fingerprint index (occ/ + lists/ +
meta/), and the durable streaming snapshots (v{N}/ dirs) — needs the
same three guarantees, previously hand-rolled per artifact (r8 verdict
#3):

1. **Atomic publish** (`publish_dir` / `publish_swap`): data is written
   to a sibling temp directory and RENAMED into place, so a crash
   mid-write can never leave a committed-looking partial directory
   under the final name. Rename is an O(1) metadata op on HDFS/local
   (fs.rename); _SUCCESS travels inside the directory contents.
2. **Parameter guard** (`write_params` / `check_params`): the build
   parameters that define the stored BYTES (hash family, band layout,
   quantizer centroids, fingerprint window) are recorded at build time
   as a 1-row JSON parquet; append/delete/probe validate their own
   parameters against the record and raise on mismatch instead of
   silently reading/writing garbage. A MISSING record (pre-guard
   artifact) skips the check; a PRESENT-but-unreadable record raises —
   corruption must not disable the guard it exists for.
3. **Committed-version discovery** (`committed_versions` /
   `latest_version`): versioned artifacts (v{N} snapshot dirs) are
   discovered by glob + _SUCCESS marker, so readers only ever see
   fully-committed versions and a torn write is invisible.

Spark-first rationale: all of this is driver-side Hadoop FS metadata
work (parkour_spark.fs) — it runs identically on local disk, HDFS, and
object stores, and never moves data through the driver.
"""

from __future__ import annotations

import json
import os
import re
import uuid
from typing import Callable

from pyspark.sql import SparkSession

from parkour_spark import fs as pfs

PARAMS_SCHEMA = "params string"


def write_params(spark: SparkSession, path: str, params: dict) -> None:
    """Record an artifact's build parameters as a 1-row JSON parquet at
    `path` (e.g. `<index>/meta`). JSON keeps the record kind-agnostic —
    ints, strings, and float lists (quantizer centroids) round-trip
    exactly (json emits repr-precision doubles).

    The row rides as a JVM literal over range(1) rather than a Python
    local relation (r12): a createDataFrame-backed write schedules
    Python workers for its one row and measured ~20× slower (~4s vs
    0.2s) — a fixed tax every meta/stats record paid on every build,
    append, delete, and compact."""
    from pyspark.sql import functions as F

    (
        spark.range(1)
        .select(
            F.lit(json.dumps(params, sort_keys=True)).alias("params")
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(path)
    )


def read_params(spark: SparkSession, path: str) -> dict | None:
    """The stored parameter record, or None if the artifact predates
    the guard (nothing recorded). An unreadable record RAISES — see
    check_params.

    The record is read DRIVER-SIDE with pyarrow when the filesystem is
    one pyarrow mounts (local/file/hdfs/s3/gs) — r13, guide §5 "the
    driver should do almost no data work" inverted: this 1-row read IS
    driver-sized work, and `spark.read.parquet(...).collect()` was
    spinning a full Spark job (scheduler + scan task + collect) per
    probe call for it, several times per serving probe across the six
    index families. Hadoop-connector schemes pyarrow rejects (s3a://,
    viewfs://, abfs://...) fall back to the Spark read. NO caching at
    any layer — every call re-reads the bytes (the no-memo rule); this
    removes job overhead, not work."""
    if not pfs.exists(spark, path):
        return None
    rec = _read_params_arrow(spark, path)
    if rec is None:
        row = spark.read.parquet(path).collect()[0]
        rec = row["params"]
    return json.loads(rec)


def _read_params_arrow(spark: SparkSession, path: str) -> str | None:
    """Driver-side read of the 1-row params record; None → caller falls
    back to the Spark read (unmountable scheme / unexpected layout).
    A readable-but-empty record still raises like the Spark path would
    (the guard must not be disabled by corruption)."""
    rows = read_tiny_rows_arrow(spark, path, columns=["params"])
    if rows is None:
        return None
    if not rows:
        raise ValueError(f"params record at {path} holds no rows")
    return rows[0]["params"]


def read_tiny_rows_arrow(
    spark: SparkSession, path: str, columns: list | None = None
) -> list | None:
    """Rows (as dicts) of a TINY parquet table, read driver-side with
    pyarrow — for the 1-row/handful-row control records (params, index
    stats) whose `spark.read...collect()` was a full Spark job of
    scheduler overhead per probe call (r13). Returns None when the
    scheme isn't one pyarrow mounts or the read fails — callers fall
    back to the Spark read. Every call re-reads the bytes; nothing is
    cached (the no-memo rule): this removes per-job overhead, not
    work. Only for bounded-size control tables — data tables keep
    going through Spark."""
    from urllib.parse import urlparse

    try:
        files = [
            p
            for p in pfs.glob_paths(spark, os.path.join(path, "*.parquet"))
            if urlparse(p).scheme in ("", "file", "hdfs", "s3", "gs")
        ]
        if not files:
            return None
        import pyarrow.parquet as pq

        from parkour_spark.operators.indexcommon import _pa_fs_path

        rows = []
        for f in sorted(files):
            fs, p = _pa_fs_path(f)
            rows.extend(
                pq.read_table(
                    fs.open_input_file(p), columns=columns
                ).to_pylist()
            )
        return rows
    except Exception:
        return None  # fall back to the Spark read (which may raise)


def check_params(
    spark: SparkSession,
    path: str,
    called: dict,
    kind: str = "artifact",
    skip: frozenset | set = frozenset(),
) -> None:
    """Raise if the caller's parameters disagree with the persisted
    build record. `skip` names fields the caller does not apply (e.g.
    max_bucket at probe time — the cap is a build-time property).
    Missing record → skipped (legacy artifact, nothing to check);
    corrupt record → the read raises (never silently skipped)."""
    stored = read_params(spark, path)
    if stored is None:
        return
    bad = {
        k: (stored.get(k), v)
        for k, v in called.items()
        if k not in skip and stored.get(k) != v
    }
    if bad:
        detail = ", ".join(
            f"{k}: built with {b!r} but called with {c!r}"
            for k, (b, c) in sorted(bad.items())
        )
        raise ValueError(f"{kind} parameter mismatch — {detail}")


def publish_dir(
    spark: SparkSession, final_path: str, write_fn: Callable[[str], None]
) -> str:
    """Atomic publish of a NEW directory: `write_fn(tmp)` writes the
    full contents to a sibling temp dir, which is then renamed to
    `final_path`. A crash inside write_fn leaves only the temp dir —
    the final name never exists partially written. `final_path` must
    not already exist (versioned dirs get fresh names; for swap-in-
    place artifacts use publish_swap)."""
    tmp = _tmp_sibling(final_path)
    try:
        write_fn(tmp)
        if pfs.exists(spark, final_path):
            raise FileExistsError(
                f"publish_dir target already exists: {final_path}"
            )
        if not pfs.rename(spark, tmp, final_path):
            raise IOError(f"rename {tmp} -> {final_path} failed")
    finally:
        if pfs.exists(spark, tmp):
            pfs.delete(spark, tmp)
    return final_path


def publish_swap(
    spark: SparkSession, final_path: str, write_fn: Callable[[str], None]
) -> str:
    """Replace an EXISTING artifact directory with freshly-written
    contents: write to a temp sibling (all the expensive work — a crash
    here leaves the old version untouched), then rename-old-aside →
    rename-new-in → delete-old. The unavailability window is two
    metadata ops, not the whole write — the property the old in-place
    mode("overwrite") rewrites lacked.

    Failure safety (r9 ADVICE — the earlier delete-old-then-rename
    order destroyed BOTH copies when the rename failed, because the
    finally-cleanup also removed the temp): a committed copy of the
    data now exists at every point of the protocol. write_fn failure →
    partial temp deleted, old artifact untouched. rename-old-aside
    failure → temp deleted, old artifact untouched. rename-new-in
    failure → old artifact renamed back into place (or, if even that
    restore fails, left at its aside name) and the fully-written temp
    is LEFT ON DISK for recovery — never deleted on a failed swap."""
    tmp = _tmp_sibling(final_path)
    try:
        write_fn(tmp)
    except BaseException:
        if pfs.exists(spark, tmp):
            pfs.delete(spark, tmp)  # partial write; old copy untouched
        raise
    old = None
    if pfs.exists(spark, final_path):
        old = f"{final_path.rstrip('/')}.__retired-{uuid.uuid4().hex}__"
        if not pfs.rename(spark, final_path, old):
            pfs.delete(spark, tmp)  # old copy still committed in place
            raise IOError(
                f"rename {final_path} -> {old} failed; artifact unchanged"
            )
    if not pfs.rename(spark, tmp, final_path):
        restored = old is not None and pfs.rename(spark, old, final_path)
        where = (
            "previous version restored"
            if restored
            else f"previous version left at {old}"
            if old is not None
            else "no previous version existed"
        )
        raise IOError(
            f"rename {tmp} -> {final_path} failed; {where}; new "
            f"contents left at {tmp} for recovery"
        )
    if old is not None:
        pfs.delete(spark, old)
    return final_path


def _tmp_sibling(final_path: str) -> str:
    base = final_path.rstrip("/")
    return f"{base}.__publish-{uuid.uuid4().hex}__"


_VERSION_RE = re.compile(r"/v(\d+)$")


def committed_versions(
    spark: SparkSession, base: str
) -> list[tuple[int, str]]:
    """All fully-committed versioned directories `base/v{N}`, sorted by
    N ascending. Committed = the directory carries Spark's _SUCCESS
    marker; torn writes (no marker) and publish temp dirs are invisible
    to readers by construction."""
    out = []
    for p in pfs.glob_paths(spark, os.path.join(base, "v*")):
        m = _VERSION_RE.search(p)
        if m and pfs.exists(spark, os.path.join(p, "_SUCCESS")):
            out.append((int(m.group(1)), p))
    return sorted(out)


def latest_version(
    spark: SparkSession, base: str
) -> tuple[int, str] | None:
    snaps = committed_versions(spark, base)
    return snaps[-1] if snaps else None


def publish_version(
    spark: SparkSession,
    base: str,
    write_fn: Callable[[str], None],
    version: int | None = None,
) -> tuple[int, str]:
    """Publish the next version of a versioned artifact: pick
    max(committed)+1 (or the explicit `version`), write via publish_dir
    (temp + rename), return (n, path). Readers using latest_version see
    either the old or the new version, never a partial one."""
    if version is None:
        cur = latest_version(spark, base)
        version = (cur[0] + 1) if cur else 1
    path = publish_dir(
        spark, os.path.join(base, f"v{version}"), write_fn
    )
    return version, path


def prune_versions(
    spark: SparkSession, base: str, keep: int = 2
) -> list[str]:
    """Drop all but the newest `keep` committed versions (bounded
    storage for swap-style artifacts that version every mutation).
    Returns the deleted paths."""
    snaps = committed_versions(spark, base)
    dead = [p for _, p in snaps[:-keep]] if keep > 0 else [p for _, p in snaps]
    for p in dead:
        pfs.delete(spark, p)
    return dead


def ids_remaining(
    spark: SparkSession, data_path: str, id_col: str, ids, limit: int = 100
) -> list:
    """Right-to-be-forgotten AUDIT for PHYSICAL absence: scan the
    artifact table under `data_path` and return (up to `limit`) ids
    from `ids` that STILL appear — the verification pass a compliance
    flow runs after `ivf_index_delete` / `ivfpq_index_delete` (physical
    deletes) and after the COMPACTION that reconciles a tombstone
    ledger (r11: the text/minhash/substring deletes are O(|B|) ledger
    appends — immediately after those, audit PROBE VISIBILITY with
    `operators.indexcommon.ids_probe_visible` instead; this physical
    audit is the post-compaction check).

    Why it exists as a separate full scan: the delete legs are
    batch-∝ by design (they prune to the partitions/rows the batch
    addresses), so a caller error that mis-addresses a row — the
    classic case is `ivf_index_delete` handed a STALE VECTOR for an
    id, which prunes to the wrong cell and silently deletes nothing —
    is invisible to the delete itself. This audit pays one honest
    full scan (semi-join against the broadcast id set, nothing else
    moves) and returns the lingering ids, so "deleted" can be a
    verified claim instead of an assumed one. Empty list ⇒ clean."""
    from pyspark.sql import DataFrame, functions as F

    if isinstance(ids, DataFrame):
        ids_df = ids.select(F.col(ids.columns[0]).alias(id_col))
    else:
        ids_df = spark.createDataFrame(
            [(i,) for i in ids], f"{id_col} long"
        )
    stored = read_parquet_or_none(spark, data_path)
    if stored is None:
        return []  # emptied table: nothing can linger
    hits = (
        stored.join(F.broadcast(ids_df), id_col, "left_semi")
        .select(id_col)
        .distinct()
        .limit(limit)
        .collect()
    )
    return sorted(r[id_col] for r in hits)


def read_parquet_or_none(spark: SparkSession, path: str):
    """`spark.read.parquet(path)`, or None when the path holds NO data
    files — the state of a partitioned index tree after every row was
    deleted (right-to-be-forgotten everything) or a build over a
    zero-row corpus: partitioned writes of empty frames leave no part
    files, so a plain read fails schema inference. Callers treat None
    as the empty index (probes return empty results, rewrites skip)
    instead of crashing (r10, hypothesis-found on the text index)."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException as exc:
        if "UNABLE_TO_INFER_SCHEMA" in str(exc) or "PATH_NOT_FOUND" in str(
            exc
        ):
            return None
        raise
