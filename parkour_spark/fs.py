"""Filesystem utilities — the reference's fs namespace analog
(/root/reference/src/clojure/parkour/fs.clj:30-326), mapped onto the
Hadoop FileSystem API that Spark already carries.

Going through Hadoop's FS (not Python's os/glob) means every helper
works identically on local paths, HDFS, and object stores (s3a/gs/abfs)
— the same property the reference got from Hadoop Path/FileSystem. The
JVM gateway calls are driver-side metadata operations (no data moves).
"""

from __future__ import annotations

import contextlib
import uuid
from typing import Iterator

from pyspark.sql import SparkSession


def _jfs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(hconf), jpath, jvm


def glob_paths(spark: SparkSession, pattern: str) -> list[str]:
    """Expand a glob pattern (reference `path-glob`, fs.clj:100-118) —
    `*`, `?`, `[abc]`, `{a,b}` per Hadoop glob semantics, any scheme."""
    fs, jpath, _ = _jfs(spark, pattern)
    statuses = fs.globStatus(jpath)
    if statuses is None:
        return []
    return [str(s.getPath()) for s in statuses]


def list_status(spark: SparkSession, path: str) -> list[dict]:
    """Directory listing with sizes (reference `path-list` class of ops,
    fs.clj): one driver-side metadata call per entry, any scheme.
    Returns [{path, len, is_dir}] sorted by path."""
    fs, jpath, _ = _jfs(spark, path)
    out = [
        {
            "path": str(s.getPath()),
            "len": int(s.getLen()),
            "is_dir": bool(s.isDirectory()),
        }
        for s in fs.listStatus(jpath)
    ]
    return sorted(out, key=lambda e: e["path"])


def exists(spark: SparkSession, path: str) -> bool:
    fs, jpath, _ = _jfs(spark, path)
    return bool(fs.exists(jpath))


def content_size(spark: SparkSession, path: str) -> int:
    """Total bytes under `path` (file or directory tree)."""
    fs, jpath, _ = _jfs(spark, path)
    return int(fs.getContentSummary(jpath).getLength())


def delete(spark: SparkSession, path: str, recursive: bool = True) -> bool:
    fs, jpath, _ = _jfs(spark, path)
    return bool(fs.delete(jpath, recursive))


def mkdirs(spark: SparkSession, path: str) -> bool:
    fs, jpath, _ = _jfs(spark, path)
    return bool(fs.mkdirs(jpath))


def rename(spark: SparkSession, src: str, dst: str) -> bool:
    """Atomic metadata rename (reference `path-move!` class of ops) —
    same-filesystem only, O(1) on HDFS/local, O(copy) on some object
    stores (use sparingly there)."""
    fs, jsrc, jvm = _jfs(spark, src)
    return bool(fs.rename(jsrc, jvm.org.apache.hadoop.fs.Path(dst)))


@contextlib.contextmanager
def temp_dir(spark: SparkSession, base: str | None = None) -> Iterator[str]:
    """Scoped scratch directory (reference `with-temp-dir` semantics,
    fs.clj:219-247): yields a unique path, deletes it on exit. `base`
    defaults to a `.parkour-tmp` dir beside Spark's warehouse — pass an
    HDFS/S3 base for cluster-visible scratch space."""
    if base is None:
        base = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        base = base.removeprefix("file:") + "/.parkour-tmp"
    path = f"{base}/{uuid.uuid4().hex}"
    mkdirs(spark, path)
    try:
        yield path
    finally:
        delete(spark, path, recursive=True)
