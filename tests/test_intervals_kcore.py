"""Interval merging, k-core peeling, sorted-neighborhood blocking —
semantic tests on hand-built inputs with known answers."""

import pytest
from pyspark.sql import functions as F

from parkour_spark.operators.intervals import coverage_stats, merge_intervals


def _iv(spark, rows):
    return spark.createDataFrame(rows, "user_id long, start_s long, end_s long")


def test_merge_intervals_overlap_touch_and_gap(spark):
    df = _iv(
        spark,
        [
            (1, 0, 10), (1, 5, 20),      # overlap -> [0, 20]
            (1, 20, 30),                 # touching endpoint merges
            (1, 40, 50),                 # gap -> new run
            (2, 0, 5),                   # other key untouched
        ],
    )
    runs = {
        (r["user_id"], r["start_s"], r["end_s"]): r["n_merged"]
        for r in merge_intervals(df).collect()
    }
    assert runs == {(1, 0, 30): 3, (1, 40, 50): 1, (2, 0, 5): 1}


def test_merge_intervals_contained_span(spark):
    # an interval fully inside an earlier one must not split the run
    df = _iv(spark, [(1, 0, 100), (1, 10, 20), (1, 90, 150)])
    out = merge_intervals(df).collect()
    assert len(out) == 1
    assert (out[0]["start_s"], out[0]["end_s"]) == (0, 150)


def test_coverage_stats_exact(spark):
    df = _iv(spark, [(1, 0, 10), (1, 20, 25)])
    s = coverage_stats(merge_intervals(df)).collect()[0]
    assert (s["n_runs"], s["covered_s"], s["longest_s"]) == (2, 15, 10)


def test_kcore_peels_tails_keeps_clique(spark):
    from parkour_spark.operators.graph import kcore

    # K4 (each degree 3) + a tail 3-5-6 hanging off node 3
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    tail = [(3, 5), (5, 6)]
    edges = spark.createDataFrame(k4 + tail, "id_a long, id_b long")
    core = {r["node"]: r["degree"] for r in kcore(edges, k=3, iters=4).collect()}
    assert core == {0: 3, 1: 3, 2: 3, 3: 3}
    # k=2: the tail still peels (5 and 6 never reach degree 2)
    core2 = {r["node"] for r in kcore(edges, k=2, iters=4).collect()}
    assert core2 == {0, 1, 2, 3}


def test_kcore_registered_iters_converged(spark):
    # the registered fixed depth must be converged, not truncated:
    # one more round changes nothing
    from parkour_spark.operators import dedup as D
    from parkour_spark.operators.graph import kcore
    from parkour_spark.dataset import load_table
    from parkour_spark.queries import _KCORE_ITERS, _KCORE_K

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    pairs = D.minhash_dedup_pairs(docs, threshold=0.8)
    a = sorted(
        (r["node"], r["degree"])
        for r in kcore(pairs, k=_KCORE_K, iters=_KCORE_ITERS).collect()
    )
    b = sorted(
        (r["node"], r["degree"])
        for r in kcore(pairs, k=_KCORE_K, iters=_KCORE_ITERS + 1).collect()
    )
    assert a == b and len(a) > 0


def test_sorted_neighborhood_finds_adjacent_exact_dups(spark):
    from parkour_spark.operators.dedup import sorted_neighborhood_pairs

    # identical keys sort adjacent regardless of block -> always paired
    rows = [(1, "aaaa"), (2, "aaaa"), (3, "bbbb"), (4, "zzzz")]
    docs = spark.createDataFrame(rows, "doc_id long, fp string")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in sorted_neighborhood_pairs(
            docs, "fp", window=3, block_chars=2, id_col="doc_id"
        ).collect()
    }
    assert (1, 2) in pairs
    # different blocks never pair ('aa' vs 'bb' vs 'zz' prefixes)
    assert (2, 3) not in pairs and (3, 4) not in pairs


def test_label_propagation_splits_weak_bridge(spark):
    """Barbell: two 4-cliques joined by ONE bridge edge. Connected
    components merges everything; LPA keeps two communities because the
    bridge carries one vote against three in-clique votes."""
    from parkour_spark.operators.graph import connected_components, label_propagation

    edges = []
    for base in (0, 10):
        ids = [base + i for i in range(4)]
        edges += [(a, b) for a in ids for b in ids if a < b]
    edges.append((3, 10))  # bridge
    e = spark.createDataFrame(edges, "id_a long, id_b long")
    nodes = spark.createDataFrame([(i,) for i in range(4)] + [(10 + i,) for i in range(4)],
                                  "id long")
    lpa = {r["id"]: r["label"] for r in label_propagation(nodes, e, rounds=4).collect()}
    left = {lpa[i] for i in range(4)}
    right = {lpa[10 + i] for i in range(4)}
    assert len(left) == 1 and len(right) == 1
    assert left != right
    cc = {r["component"] for r in connected_components(nodes, e, node_col="id").collect()}
    assert len(cc) == 1  # reachability merges the barbell


def test_label_propagation_isolated_and_deterministic(spark):
    from parkour_spark.operators.graph import label_propagation

    e = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    nodes = spark.createDataFrame([(1,), (2,), (99,)], "id long")
    out = {r["id"]: r["label"] for r in label_propagation(nodes, e).collect()}
    assert out[99] == 99             # isolated keeps its own label
    # a bare pair must CONVERGE to one community (the self-vote kills
    # synchronous LPA's bipartite oscillation) with the smaller label
    assert out[1] == out[2] == 1
    again = {r["id"]: r["label"]
             for r in label_propagation(nodes.repartition(3), e.repartition(2)).collect()}
    assert again == out


def test_fill_time_gaps_dense_spine_with_zeros(spark):
    from parkour_spark.operators.intervals import fill_time_gaps

    agg = spark.createDataFrame(
        [("a", 0, 5), ("a", 7200, 2), ("b", 3600, 1)],
        "k string, bucket long, n long",
    )
    out = fill_time_gaps(agg, "bucket", ["k"], {"n": "zero"}, 3600)
    rows = {(r["k"], r["bucket"]): r["n"] for r in out.collect()}
    # global span 0..7200 for BOTH keys, hourly
    assert set(rows) == {(k, b) for k in ("a", "b") for b in (0, 3600, 7200)}
    assert rows[("a", 3600)] == 0 and rows[("b", 0)] == 0
    assert rows[("a", 0)] == 5 and rows[("b", 3600)] == 1


def test_snapshot_diff_classifies_exactly(spark):
    from parkour_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], "id long, body string"
    )
    new = spark.createDataFrame(
        [(2, "y"), (3, "z2"), (4, "w")], "id long, body string"
    )
    got = {r["id"]: r["status"]
           for r in snapshot_diff(old, new, "id", "body").collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}
