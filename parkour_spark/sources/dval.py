"""File-backed distributed values — the reference's dcpath/load-dval/
copy-dval family (/root/reference/src/clojure/parkour/io/dval.clj:30-48,
137-153): ship a driver-local file to every executor once, and give task
code a cheap handle to read it.

Spark-first mapping: `SparkContext.addFile` is the distributed-cache
analog — the file is transferred once per executor (not per task), and
`SparkFiles.get(name)` resolves the executor-local path inside any task.
For small values prefer `plans.pipeline.broadcast_value` (pickled
broadcast); file dvals are for the side inputs that are naturally files
at real scale — vocabularies, stopword lists, model weights — where you
want OS-level caching and lazy/streamed reads instead of a deserialized
driver object.

SCALE: addFile distributes via the driver's file server with torrent-ish
fan-out per executor; a 1000-executor cluster fetches the file 1000
times total, never once per task. Task-side `read_dval_file` resolves
paths lazily so the file is only opened by tasks that use it.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark import SparkFiles
from pyspark.sql import SparkSession


def dcpath(spark: SparkSession, local_path: str) -> str:
    """Register a driver-local file for distribution to every executor
    (reference `dcpath`, dval.clj:30-48). Returns the file's basename —
    the task-side handle to pass to `read_dval_file`/`load_dval`."""
    spark.sparkContext.addFile(local_path)
    return os.path.basename(local_path)


def read_dval_file(name: str, mode: str = "r"):
    """Task-side (also works driver-side): open a file previously shipped
    with `dcpath`. Returns the open file object; caller closes."""
    return open(SparkFiles.get(name), mode)


# Per-PROCESS parse cache for load_dval: a cache captured in the loader
# closure would be pickled per task and arrive empty, re-parsing per
# task. A module-global lives once per Python worker process, so each
# executor worker parses the file exactly once however many tasks run.
_DVAL_CACHE: dict[str, object] = {}


def load_dval(spark: SparkSession, local_path: str, parse: Callable[[str], object]):
    """Reference `load-dval` (dval.clj:137-153): ship the file AND return
    a lazy task-side loader. The loader parses the executor-local copy on
    first use per worker process — the file transfers once per executor,
    the parsed object is built where it is used (never pickled through
    the closure).

    `parse` takes the executor-local path and returns the value. The
    returned zero-arg callable is safe to capture in UDF closures (it
    holds only the file name and the parse function)."""
    name = dcpath(spark, local_path)

    def get():
        if name not in _DVAL_CACHE:
            _DVAL_CACHE[name] = parse(SparkFiles.get(name))
        return _DVAL_CACHE[name]

    return get
