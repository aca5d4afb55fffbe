"""Connected components over a pair list — the step that turns near-dup
PAIRS (minhash/simhash/embedding operators) into dedup GROUPS with a
canonical survivor per group (min id).

Spark-first iterative shape:
- Min-label propagation: every node starts labeled with itself; each
  round a node takes the min of its own label and its neighbors'
  labels. Converges in O(component diameter) rounds — near-dup
  clusters are shallow (diameter a few hops), so a handful of rounds.
- Each round is one equi-join + one aggregation; lineage is truncated
  with localCheckpoint every round (an iterative self-join otherwise
  compounds the plan). At cluster scale swap localCheckpoint for a
  reliable checkpoint dir; for billion-edge graphs use the
  large-star/small-star alternation (Kiveris et al., "Connected
  Components in MapReduce and Beyond") — same join primitive, fewer
  rounds.
- Convergence is detected from the label-sum, which strictly decreases
  while any label changes (labels only move down) — one tiny scalar
  action per round instead of a changed-row join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "id",
    src: str = "id_a",
    dst: str = "id_b",
    max_iters: int = 20,
) -> DataFrame:
    """(node, component) where component = min node id reachable.
    Isolated nodes are their own component."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    # Labels propagate in the id's NATIVE orderable type (string doc ids
    # are as valid as longs for corpus dedup; the old cast-to-long made
    # every string comp NULL and broke convergence silently — r2 advice).
    labels = nodes.select(
        F.col(node_col).alias("n"), F.col(node_col).alias("comp")
    ).localCheckpoint()
    for _ in range(max_iters):
        nb_min = (
            sym.join(labels, sym.b == labels.n)
            .groupBy("a")
            .agg(F.min("comp").alias("nb_min"))
        )
        nxt = (
            labels.join(nb_min, labels.n == nb_min.a, "left")
            .select(
                "n",
                F.col("comp").alias("__old"),
                F.least(F.col("comp"), F.coalesce("nb_min", "comp")).alias("comp"),
            )
            .localCheckpoint()
        )
        # Convergence = no label moved this round. Checked type-
        # generically against the checkpointed frame (one tiny action
        # with an early-out limit), instead of the old label-sum trick
        # that only worked for integral ids.
        changed = nxt.where(F.col("comp") != F.col("__old")).limit(1).count()
        labels = nxt.drop("__old")
        if changed == 0:
            break
    sym.unpersist()
    return labels.select(F.col("n"), F.col("comp").alias("component"))


def dedup_survivors(
    nodes: DataFrame,
    pairs: DataFrame,
    node_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """(doc_id, component, is_survivor): group near-dup pairs into
    components and keep the min doc_id of each — the standard
    keep-one-per-cluster dedup policy."""
    cc = connected_components(nodes, pairs, node_col, src, dst)
    return cc.select(
        F.col("n").alias(node_col),
        "component",
        (F.col("n") == F.col("component")).alias("is_survivor"),
    )
