"""Similarity search over embedding columns: brute-force top-k cosine and
an LSH-bucketed approximate variant.

Beyond-reference surface (SURVEY §7.6). Spark-first design:

- Brute force: queries (small) are broadcast-joined against the corpus;
  cosine is a pure Column expression (functions.vector) — JVM-side,
  codegen'd; top-k per query via ranked window. At 100 TB this is one
  scan of the corpus, no corpus shuffle: the window partitions by
  query_id, whose cardinality = |queries|, and only (query, candidate,
  score) tuples shuffle.
- LSH path: random-hyperplane signatures bucket the corpus once
  (scan-side compute, written bucketed); queries probe matching buckets
  via equi-join on the signature — the corpus scan is replaced by a
  bucket-pruned join. Recall is tunable by n_planes / n_probes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from parkour_spark.functions.vector import cosine, dot
from parkour_spark.operators.sort import widen_scan


def _vec_sql(vec: list[float]) -> str:
    # Exponent notation with 17 significant digits: parses directly as a
    # DOUBLE literal (plain decimals parse as DECIMAL and would need a
    # cast layer that costs real analysis time at ~1k elements) and
    # round-trips every double exactly.
    return "array(" + ",".join(f"{float(x):.17e}" for x in vec) + ")"


def _centroid_array(centroids: list[tuple[int, list[float]]]) -> Column:
    """Literal array<struct<cid,v>> of centroids as ONE parsed SQL
    expression. Building it from per-float F.lit calls costs a py4j
    round-trip per element (~2000 calls ≈ seconds of driver time per
    query); a single F.expr string is one parse. The array is foldable,
    so Catalyst constant-folds it and it rides along in the serialized
    plan exactly like a broadcast."""
    structs = ",".join(
        f"named_struct('cid',{int(cid)},'v',{_vec_sql(vec)})" for cid, vec in centroids
    )
    return F.expr(f"array({structs})")


def _planes_array(planes: list[list[float]]) -> Column:
    """Literal array<array<double>> of hyperplanes, one parsed expression
    (same py4j-cost rationale as _centroid_array)."""
    return F.expr("array(" + ",".join(_vec_sql(p) for p in planes) + ")")


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Exact top-k cosine neighbors per query. Result: (query_id, vec_id,
    rank, cos). Broadcast the (small) query set; never shuffles the
    corpus."""
    q = queries.select(F.col(query_id), F.col(query_vec))
    joined = widen_scan(corpus).crossJoin(F.broadcast(q))
    scored = joined.select(
        F.col(query_id),
        F.col(corpus_id),
        F.round(cosine(corpus_vec, query_vec), 4).alias("cos"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cos").desc(), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def hyperplane_signature(
    df: DataFrame, planes: list[list[float]], vec_col: str = "embedding", out_col: str = "bucket"
) -> DataFrame:
    """Random-hyperplane LSH signature: bit_i = sign(v · plane_i), packed
    into a long. Planes are driver-provided constants (seeded NumPy),
    inlined as array literals — scan-side compute, no shuffle."""
    planes_arr = _planes_array(planes)
    bits = F.transform(
        planes_arr,
        lambda p: F.when(dot(F.col(vec_col), p) >= 0, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long"),
    )
    sig = F.aggregate(bits, F.lit(0).cast("long"), lambda acc, b: acc * 2 + b)
    return df.withColumn(out_col, sig)


def ivf_assign(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]] | Column,
    vec_col: str = "embedding",
    out_col: str = "cell",
) -> DataFrame:
    """Assign each vector to its nearest centroid (max cosine, ties to
    the lowest centroid id).

    `centroids` is a driver-side list of (cid, vector) — the coarse
    quantizer. It is inlined as a literal array of structs, so assignment
    is a single scan-side expression: no join, no shuffle, and at cluster
    scale the centroid table rides along in the serialized plan exactly
    like a broadcast. One cosine per (row, centroid), computed once:
    scores = transform(centroids), argmax via array_max on (cos, -cid)
    struct ordering."""
    cent_arr = centroids if isinstance(centroids, Column) else _centroid_array(centroids)
    scores = F.transform(
        cent_arr,
        lambda c: F.struct(
            cosine(F.col(vec_col), c["v"]).alias("cos"), (-c["cid"]).alias("ncid")
        ),
    )
    return df.withColumn(out_col, -F.array_max(scores)["ncid"])


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    k: int = 10,
    nprobe: int = 4,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """IVF approximate top-k: corpus vectors are assigned to inverted
    lists (cells) once; each query probes only its `nprobe` nearest
    cells, exact cosine re-ranks within the probed lists.

    SCALE: the corpus pass is scan-side assignment (no shuffle) — in a
    persistent deployment the assigned corpus is written partitioned/
    bucketed by cell so a query batch touches only the probed cells'
    files (partition pruning). The probe join is an equi-join on cell
    with the (tiny) query-probe side broadcast; only probed-cell rows
    flow into the ranking window, whose partition key is query_id.
    Centroids here are caller-provided (deterministic seeds in the
    oracle-checked query; k-means output in a real deployment — same
    plan either way)."""
    cent_arr = _centroid_array(centroids)  # parsed once, shared by both sides
    c = ivf_assign(widen_scan(corpus), cent_arr, corpus_vec, "cell")
    scores = F.transform(
        cent_arr,
        lambda cc: F.struct(
            cosine(F.col(query_vec), cc["v"]).alias("cos"), (-cc["cid"]).alias("ncid")
        ),
    )
    # top-nprobe cells per query: sort (cos, ncid) ascending, reverse →
    # cos desc with ties to the lowest cid, take nprobe, explode
    probes = queries.select(
        F.col(query_id),
        F.col(query_vec),
        F.explode(
            F.transform(
                F.slice(F.reverse(F.array_sort(scores)), 1, nprobe),
                lambda s: -s["ncid"],
            )
        ).alias("cell"),
    )
    joined = c.join(F.broadcast(probes), "cell")
    scored = joined.select(
        F.col(query_id),
        F.col(corpus_id),
        F.round(cosine(corpus_vec, query_vec), 4).alias("cos"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cos").desc(), F.col(corpus_id))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: both sides signed with the same hyperplanes,
    candidates = same bucket, then exact cosine re-rank within bucket.
    SCALE: corpus bucketed once (reusable across query batches); the join
    is equi on bucket — bucket-pruned instead of full-scan."""
    c = hyperplane_signature(corpus, planes, corpus_vec, "bucket")
    q = hyperplane_signature(
        queries.select(query_id, F.col(query_vec)), planes, query_vec, "bucket"
    )
    joined = c.join(F.broadcast(q), "bucket")
    scored = joined.select(
        F.col(query_id),
        F.col(corpus_id),
        F.round(cosine(corpus_vec, query_vec), 4).alias("cos"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cos").desc(), F.col(corpus_id))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
