"""Round-6 operators: blocked fuzzy join (entity resolution) and
deterministic A-ES weighted sampling."""

import hashlib
import math

from pyspark.sql import functions as F

from parkour_spark.operators.corpus import weighted_sample
from parkour_spark.operators.joins import fuzzy_join


def _hb(key, buckets):
    return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16) % buckets


# ---------------------------------------------------------------- fuzzy join

def test_fuzzy_join_finds_planted_corruptions(spark):
    reg_names = ["blue widget", "small gizmo", "hot plate", "cold anvil"]
    # one char dropped mid-string: true match is 1 deletion away
    dirty = [(i, n[:4] + n[5:]) for i, n in enumerate(reg_names)]
    reg = spark.createDataFrame([(n,) for n in reg_names], ["rname"])
    df = spark.createDataFrame(dirty, ["did", "dname"])
    got = fuzzy_join(df, reg, ("did", "dname"), ("rname", "rname"), max_dist=1)
    pairs = {(r.l_id, r.r_val): r.dist for r in got.collect()}
    for i, n in enumerate(reg_names):
        assert pairs.get((i, n)) == 1, f"planted match missed for {n!r}"


def test_fuzzy_join_rejects_distant_strings(spark):
    reg = spark.createDataFrame([("completely different",)], ["rname"])
    df = spark.createDataFrame([(1, "blue widget")], ["did", "dname"])
    got = fuzzy_join(df, reg, ("did", "dname"), ("rname", "rname"), max_dist=2)
    assert got.collect() == []


def test_fuzzy_join_no_cartesian_and_block_cap(spark):
    """Plan must be an equi-join on block keys (never a nested loop),
    and a block shared by more than max_block registry rows is dropped
    (boilerplate gram), so the pair count stays bounded."""
    reg = spark.createDataFrame(
        [(f"shared prefix exactly {i}",) for i in range(40)], ["rname"]
    )
    df = spark.createDataFrame([(1, "shared prefix exactly 7x")], ["did", "dname"])
    out = fuzzy_join(df, reg, ("did", "dname"), ("rname", "rname"),
                     max_dist=3, max_block=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
    # every block here holds 40 registry rows > cap 5 -> no candidates
    assert out.collect() == []


def test_fuzzy_join_pair_deduped_across_probes(spark):
    """A pair sharing BOTH probe keys must surface once, not twice."""
    reg = spark.createDataFrame([("blue widget",)], ["rname"])
    df = spark.createDataFrame([(1, "blue widget")], ["did", "dname"])
    rows = fuzzy_join(df, reg, ("did", "dname"), ("rname", "rname"),
                      max_dist=0).collect()
    assert len(rows) == 1 and rows[0].dist == 0


# ---------------------------------------------------------- weighted sample

def _aes_reference(rows, k, grouped=True):
    """Driver-side replica of the A-ES selection."""
    def pri(i, w):
        u = (_hb(i, 1024) + 0.5) / 1024.0
        return math.log(u) / w

    out = {}
    groups = {}
    for g, i, w in rows:
        groups.setdefault(g if grouped else None, []).append((i, w))
    for g, members in groups.items():
        ranked = sorted(members, key=lambda t: (-pri(t[0], t[1]), t[0]))
        out[g] = [i for i, _ in ranked[:k]]
    return out


def test_weighted_sample_matches_reference_replica(spark):
    rows = [(f"g{j % 3}", j, (j % 7) + 1) for j in range(60)]
    df = spark.createDataFrame(rows, ["grp", "rid", "wt"])
    got = weighted_sample(df, "rid", "wt", 4, group_col="grp").collect()
    want = _aes_reference(rows, 4)
    for g, ids in want.items():
        sel = sorted((r.rank, r.rid) for r in got if r.grp == g)
        assert [rid for _, rid in sel] == ids, g


def test_weighted_sample_partition_layout_invariant(spark):
    rows = [(f"g{j % 2}", j, j + 1) for j in range(40)]
    df = spark.createDataFrame(rows, ["grp", "rid", "wt"])
    a = sorted(map(tuple, weighted_sample(df, "rid", "wt", 3, "grp")
                   .select("grp", "rid", "rank").collect()))
    b = sorted(map(tuple, weighted_sample(df.repartition(13, "rid"),
                                          "rid", "wt", 3, "grp")
                   .select("grp", "rid", "rank").collect()))
    assert a == b


def test_weighted_sample_global_topk(spark):
    """Global (ungrouped) path: TakeOrdered shape, exact k rows, and
    the selection matches the driver replica."""
    rows = [(None, j, 100 if j == 5 else 1) for j in range(30)]
    df = spark.createDataFrame([(j, w) for _, j, w in rows], ["rid", "wt"])
    got = weighted_sample(df, "rid", "wt", 5)
    sel = sorted((r.rank, r.rid) for r in got.collect())
    want = _aes_reference(rows, 5, grouped=False)[None]
    assert [rid for _, rid in sel] == want
    assert len(sel) == 5
    # the 100x-weight row must be sampled (p_miss ~ (tiny))
    assert 5 in {rid for _, rid in sel}


def test_weighted_sample_zero_weight_excluded(spark):
    df = spark.createDataFrame([(1, 0), (2, 5), (3, 0)], ["rid", "wt"])
    got = weighted_sample(df, "rid", "wt", 3)
    assert {r.rid for r in got.collect()} == {2}


# ------------------------------------------------------------------- DSIR

def test_dsir_target_like_docs_score_higher(spark):
    from parkour_spark.operators.corpus import dsir_importance

    docs = spark.createDataFrame(
        [
            (1, "alpha alpha beta alpha alpha"),     # target-like
            (2, "gamma delta epsilon zeta eta"),     # raw-only vocabulary
            (3, "alpha beta alpha gamma alpha"),     # mixed
        ],
        ["doc_id", "text"],
    )
    target = spark.createDataFrame(
        [(101, "alpha beta alpha alpha")], ["doc_id", "text"]
    )
    got = {r.doc_id: r for r in dsir_importance(docs, target).collect()}
    # per-token normalization not needed here: equal lengths
    assert got[1].logweight_micro > got[3].logweight_micro > got[2].logweight_micro
    assert got[1].n_toks == 5


def test_dsir_scoring_join_is_broadcast(spark):
    from parkour_spark.operators.corpus import dsir_importance

    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    plan = (
        dsir_importance(docs, docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the per-doc scoring join against the 4096-row log-ratio table
    # must broadcast — the raw corpus must not shuffle on bucket
    assert "BroadcastHashJoin" in plan


# --------------------------------------------------------- JL projection

def test_jl_projection_matches_numpy_replica(spark):
    import numpy as np

    from parkour_spark.operators.similarity import jl_matrix, random_projection

    vecs = [(i, [float((i * 7 + d * 3) % 11) - 5.0 for d in range(12)])
            for i in range(6)]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    m = jl_matrix(12, 4)
    got = {r.vec_id: list(r.proj)
           for r in random_projection(df, m).collect()}
    M = np.array(m, dtype=float)
    for i, v in vecs:
        want = (M @ np.array(v)) / np.sqrt(4.0)
        assert np.allclose(got[i], want, atol=1e-12), i


def test_jl_projection_preserves_pairwise_distance(spark):
    """JL contract: squared pairwise distances preserved within the
    lemma's distortion at out_dim=32 (deterministic matrix + fixed
    inputs => a fixed, replayable assertion, not a flaky sample)."""
    import numpy as np

    from parkour_spark.operators.similarity import jl_matrix, random_projection

    rng_free = [
        (i, [float(((i + 1) * (d + 3) * 2654435761) % 1000) / 500.0 - 1.0
             for d in range(64)])
        for i in range(8)
    ]
    df = spark.createDataFrame(rng_free, ["vec_id", "embedding"])
    got = {r.vec_id: np.array(r.proj)
           for r in random_projection(df, jl_matrix(64, 32)).collect()}
    orig = {i: np.array(v) for i, v in rng_free}
    for a in range(8):
        for b in range(a + 1, 8):
            d0 = float(np.sum((orig[a] - orig[b]) ** 2))
            d1 = float(np.sum((got[a] - got[b]) ** 2))
            assert 0.4 * d0 <= d1 <= 1.9 * d0, (a, b, d0, d1)


def test_jl_projection_plan_is_scan_side(spark):
    from parkour_spark.operators.similarity import jl_matrix, random_projection

    df = spark.createDataFrame([(1, [1.0, 2.0])], ["vec_id", "embedding"])
    plan = (
        random_projection(df, jl_matrix(2, 2))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


# ------------------------------------------------------- multi-probe LSH

def test_lsh_multiprobe_recovers_flipped_bit_neighbors(spark):
    """A query whose signature differs from its true neighbor's by ONE
    plane sign must miss at probe_bits=0 and hit at probe_bits=1."""
    from parkour_spark.operators.similarity import lsh_topk

    planes = [[1.0, 0.0], [0.0, 1.0]]
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.05]), (2, [-1.0, -1.0])], ["vec_id", "embedding"]
    )
    # query is near vec 1 but its y-component sign flips plane 2
    queries = spark.createDataFrame(
        [(100, [1.0, -0.05])], ["query_id", "query_vec"]
    )
    single = lsh_topk(corpus, queries, planes, k=5)
    multi = lsh_topk(corpus, queries, planes, k=5, probe_bits=1)
    assert not [r for r in single.collect() if r.vec_id == 1]
    hits = [r for r in multi.collect() if r.vec_id == 1]
    assert hits and hits[0].rank == 1
    # and multi-probe candidates are a superset: pairs stay unique
    assert len(multi.collect()) == len({(r.query_id, r.vec_id)
                                        for r in multi.collect()})
