"""Round-6 additions, batch 2: hard-negative mining, per-source quota
caps, mergeable Misra-Gries heavy hitters, distributed least-squares
moments, and small-file compaction."""

import math

import pytest
from pyspark.sql import functions as F

from parkour_spark.operators.corpus import quota_cap
from parkour_spark.operators.layout import compact_small_files
from parkour_spark.operators.regress import fit_linear, moment_matrix, predict
from parkour_spark.operators.similarity import hard_negatives
from parkour_spark.operators.sketch import mg_heavy_hitters, mg_summaries


# ------------------------------------------------------- hard negatives

def _emb_corpus(spark):
    # 2-d vectors: angle encodes similarity exactly
    rows = [
        (0, [1.0, 0.0], "a"),
        (1, [0.99, 0.14], "a"),   # same label: must be filtered
        (2, [0.95, 0.31], "b"),   # nearest valid negative
        (3, [0.7, 0.71], "b"),
        (4, [0.0, 1.0], "c"),
        (5, [-1.0, 0.0], "c"),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"])


def test_hard_negatives_excludes_positive_and_same_label(spark):
    corpus = _emb_corpus(spark)
    q = spark.createDataFrame(
        [(0, [1.0, 0.0], "a", 0)],
        ["query_id", "query_vec", "query_label", "positive_id"],
    )
    got = hard_negatives(corpus, q, k=10).collect()
    ids = [r.vec_id for r in got]
    assert 0 not in ids and 1 not in ids  # positive + same-label gone
    assert ids == [2, 3, 4, 5]  # ranked by cosine desc
    assert [r.rank for r in got] == [1, 2, 3, 4]
    assert got[0].cos == pytest.approx(0.95, abs=1e-2)


def test_hard_negatives_without_positive_column(spark):
    corpus = _emb_corpus(spark)
    q = spark.createDataFrame(
        [(0, [1.0, 0.0], "a")], ["query_id", "query_vec", "query_label"]
    )
    got = hard_negatives(corpus, q, k=2, positive_id=None).collect()
    assert [r.vec_id for r in got] == [2, 3]


# ------------------------------------------------------------ quota cap

def test_quota_cap_keeps_top_n_with_deterministic_ties(spark):
    rows = [("s1", i, 100 if i < 4 else i) for i in range(10)] + [
        ("s2", 100 + i, i) for i in range(3)
    ]
    df = spark.createDataFrame(rows, ["source", "doc_id", "score"])
    got = quota_cap(df, "source", "score", "doc_id", n=3).collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r.source, []).append(r.doc_id)
    # s1: four rows tie at score 100 -> lowest doc_ids win
    assert sorted(by_src["s1"]) == [0, 1, 2]
    # s2 has only 3 rows: all kept
    assert sorted(by_src["s2"]) == [100, 101, 102]


def test_quota_cap_single_shuffle(spark):
    df = spark.range(100).select(
        (F.col("id") % 5).alias("g"), F.col("id").alias("doc_id"),
        (F.col("id") * 7 % 13).alias("score"),
    )
    out = quota_cap(df, "g", "score", "doc_id", n=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1


# ---------------------------------------------------------- Misra-Gries

def test_mg_summary_guarantee_on_skewed_stream(spark):
    # 1000 rows: 'hot' x400, 'warm' x100, 500 distinct cold keys
    vals = ["hot"] * 400 + ["warm"] * 100 + [f"cold{i}" for i in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], ["k"]).repartition(4)
    k = 16
    rows = mg_summaries(df, "k", k=k).collect()
    n = sum(r.cnt_lb for r in rows if r.key is None)
    assert n == 1000
    lb = {}
    for r in rows:
        if r.key is not None:
            lb[r.key] = lb.get(r.key, 0) + r.cnt_lb
    true = {"hot": 400, "warm": 100}
    for key_v, t in true.items():
        # mergeable-MG bound: true - lb <= n/(k+1)
        assert t - lb.get(key_v, 0) <= math.ceil(n / (k + 1))
    # per-partition summaries stay bounded
    import collections
    per_part = collections.Counter()
    # (cannot see partition ids post-collect; bound the total instead)
    assert len(lb) <= (k + 1) * 4


def test_mg_heavy_hitters_equals_exact_groupby(spark):
    vals = (["a"] * 50 + ["b"] * 30 + ["c"] * 10
            + [f"z{i}" for i in range(200)])
    df = spark.createDataFrame([(v,) for v in vals], ["k"]).repartition(4)
    got = {(r.k, r.n) for r in mg_heavy_hitters(df, "k", k=64, threshold=25).collect()}
    assert got == {("a", 50), ("b", 30)}


def test_mg_heavy_hitters_rejects_undersized_k(spark):
    df = spark.createDataFrame([(str(i % 3),) for i in range(300)], ["k"])
    with pytest.raises(ValueError, match="threshold"):
        # n=300, k=2 -> n/(k+1)=100 >= threshold 50: guarantee broken
        mg_heavy_hitters(df, "k", k=2, threshold=50)


# -------------------------------------------------- least-squares moments

def test_moment_matrix_exact_integer_sums(spark):
    data = [(1, 3), (2, 5), (3, 7), (4, 9)]  # y = 2x + 1 exactly
    df = spark.createDataFrame(data, ["x", "y"])
    cells = {(r.i, r.j): r.s for r in moment_matrix(df, ["x"], "y").collect()}
    assert cells[(0, 0)] == 4          # n
    assert cells[(0, 1)] == 10         # sum x
    assert cells[(1, 1)] == 30         # sum x^2
    assert cells[(0, -1)] == 24        # sum y
    assert cells[(1, -1)] == 70        # sum x*y


def test_moment_matrix_single_aggregate_no_extra_shuffle(spark):
    df = spark.range(1000).select(
        F.col("id").alias("x"), (F.col("id") * 3).alias("y")
    )
    out = moment_matrix(df, ["x"], "y")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # global agg = one partial + one single-partition exchange
    assert plan.count("Exchange") <= 1


def test_fit_linear_matches_numpy_lstsq(spark):
    import numpy as np

    rows = [(i, 17 + 3 * i + (i % 5) - 2) for i in range(50)]
    df = spark.createDataFrame(rows, ["x", "y"])
    coef = fit_linear(df, ["x"], "y")
    x = np.array([[1.0, float(r[0])] for r in rows])
    y = np.array([float(r[1]) for r in rows])
    want, *_ = np.linalg.lstsq(x, y, rcond=None)
    assert coef == pytest.approx(list(want), rel=1e-9)


def test_predict_is_scan_side_and_exact_on_linear_data(spark):
    df = spark.createDataFrame([(i, 2 * i + 1) for i in range(10)], ["x", "y"])
    coef = fit_linear(df, ["x"], "y")
    out = predict(df, ["x"], coef)
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()
    for r in out.collect():
        assert r.pred == pytest.approx(r.y, abs=1e-8)


# ------------------------------------------------------------- compaction

def stats_src_bytes(spark, path):
    from parkour_spark.fs import content_size

    return content_size(spark, path)


def test_compact_small_files_merges_and_preserves_rows(spark, tmp_path):
    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compact")
    spark.range(10_000).repartition(20).write.parquet(src)
    stats = compact_small_files(spark, src, dst, target_bytes=1 << 30)
    assert stats["files_before"] == 20
    assert stats["files_after"] == 1
    assert stats["rows"] == 10_000
    got = {r.id for r in spark.read.parquet(dst).collect()}
    assert got == set(range(10_000))


def test_compact_preserving_range_order(spark, tmp_path):
    src = str(tmp_path / "frag2")
    dst = str(tmp_path / "compact2")
    spark.range(9_000).repartition(18).write.parquet(src)
    stats = compact_small_files(
        spark, src, dst, target_bytes=stats_src_bytes(spark, src) // 3 + 1,
        preserve_order_col="id",
    )
    # ~3 output files whose id ranges are disjoint (footer min/max)
    assert stats["rows"] == 9_000
    assert stats["files_after"] < stats["files_before"]
    import pyarrow.parquet as pq
    import glob, os
    spans = []
    for p in sorted(glob.glob(os.path.join(dst, "*.parquet"))):
        md = pq.ParquetFile(p).metadata
        if not md.num_rows:
            continue
        st = md.row_group(0).column(0).statistics
        spans.append((st.min, st.max))
    spans.sort()
    for (alo, ahi), (blo, bhi) in zip(spans, spans[1:]):
        assert ahi < blo  # disjoint, ordered ranges


# ------------------------------------------------------- shard manifest

def test_shard_manifest_matches_python_replica_and_is_layout_stable(spark):
    import hashlib

    from parkour_spark.operators.corpus import shard_manifest

    rows = [(i, f"doc {i} has some tokens here x{i}") for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.shard: (r.n_docs, r.n_tokens, r.content_fp)
           for r in shard_manifest(df, n_shards=4).collect()}
    want = {}
    for i, txt in rows:
        shard = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 4
        fp = int(hashlib.md5(f"{i}:{txt}".encode()).hexdigest()[:15], 16)
        nd, nt, x = want.get(shard, (0, 0, 0))
        want[shard] = (nd + 1, nt + len(txt.split()), x ^ fp)
    assert got == want
    # content-addressed: any partition layout produces the same manifest
    got2 = {r.shard: (r.n_docs, r.n_tokens, r.content_fp)
            for r in shard_manifest(df.repartition(7), n_shards=4).collect()}
    assert got2 == got


# ----------------------------------------------------- grouped centroids

def test_grouped_centroids_exact_sums_and_mean_reconstruction(spark):
    import math

    from parkour_spark.operators.kmeans import grouped_centroids

    rows = [
        ("a", [1.0, 2.0]), ("a", [3.0, 4.0]),
        ("b", [-1.25, 0.5]),
    ]
    df = spark.createDataFrame(rows, ["label", "embedding"])
    got = {(r.grp, r.pos): (r.sum_micro, r.n)
           for r in grouped_centroids(df, "label", "embedding").collect()}
    want = {}
    for lbl, v in rows:
        for p, x in enumerate(v):
            s, n = want.get((lbl, p), (0, 0))
            want[(lbl, p)] = (s + math.floor(x * 1e6), n + 1)
    assert got == want
    # centroid reconstruction: sum_micro/(n*1e6) ~= mean within 1e-6
    s, n = got[("a", 0)]
    assert abs(s / (n * 1e6) - 2.0) <= 1e-6


# ------------------------------------------------------ persisted IVF index

def test_ivf_probe_persisted_equals_inline_and_prunes_partitions(spark, tmp_path):
    import math

    from parkour_spark.operators.similarity import (
        ivf_index_build, ivf_probe_topk, ivf_topk,
    )

    # 3 well-separated clusters near the axes of R^2
    def ring(cx, cy, n, base):
        return [
            (base + i, [cx + 0.01 * i, cy + 0.005 * i]) for i in range(n)
        ]

    corpus_rows = ring(1.0, 0.0, 5, 0) + ring(0.0, 1.0, 5, 10) + ring(-1.0, -1.0, 5, 20)
    corpus = spark.createDataFrame(corpus_rows, ["vec_id", "embedding"])
    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [-1.0, -1.0])]
    queries = spark.createDataFrame(
        [(100, [0.9, 0.1]), (101, [0.1, 0.9])], ["query_id", "query_vec"]
    )
    idx = str(tmp_path / "ivfidx")
    ivf_index_build(corpus, cents, idx)

    got = ivf_probe_topk(spark, idx, queries, cents, k=3, nprobe=1)
    want = ivf_topk(corpus, queries, cents, k=3, nprobe=1)
    as_set = lambda df: {(r.query_id, r.vec_id, r.rank, r.cos) for r in df.collect()}
    assert as_set(got) == as_set(want)

    # partition pruning: with nprobe=1 both queries probe 2 of 3 cells;
    # the probed-cell filter must reach the scan as a PartitionFilter
    # (directory-level pruning, not a post-scan row filter)
    plan = got._jdf.queryExecution().executedPlan().toString()
    m = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert m and "cell" in m[0] and " IN " in m[0].upper().replace("IN(", "IN (")
    # and the pruned scan reports fewer partitions than the full index
    import re as _re

    def n_parts(p):
        mm = _re.search(r"(\d+) parts", p)
        return int(mm.group(1)) if mm else None

    full_plan = (
        spark.read.parquet(idx)._jdf.queryExecution().executedPlan().toString()
    )
    np_, nf = n_parts(plan), n_parts(full_plan)
    if np_ is not None and nf is not None:
        assert np_ < nf


# ------------------------------------------------------------ token drift

def test_token_drift_zero_on_identical_slices(spark):
    from parkour_spark.operators.corpus import token_drift

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma doc{i % 3}") for i in range(12)],
        ["doc_id", "text"],
    )
    r = token_drift(docs, docs).collect()[0]
    assert r.n_toks_a == r.n_toks_b == 48
    assert r.kl_ab_nano == 0 and r.kl_ba_nano == 0 and r.tv_nano == 0


def test_token_drift_detects_shift_and_matches_replica(spark):
    import hashlib
    import math

    from parkour_spark.operators.corpus import token_drift

    a_rows = [(i, "common words here") for i in range(10)]
    b_rows = [(i, "common words here") for i in range(5)] + [
        (i, "novel vocabulary appears") for i in range(5, 10)
    ]
    da = spark.createDataFrame(a_rows, ["doc_id", "text"])
    db = spark.createDataFrame(b_rows, ["doc_id", "text"])
    got = token_drift(da, db, n_buckets=64).collect()[0]
    assert got.kl_ab_nano > 0 and got.kl_ba_nano > 0 and got.tv_nano > 0

    # python replica
    V = 64

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % V

    def counts(rows):
        c = {}
        for _, t in rows:
            for tok in t.lower().split():
                b = bucket(tok)
                c[b] = c.get(b, 0) + 1
        return c

    ca, cb = counts(a_rows), counts(b_rows)
    na, nb = sum(ca.values()), sum(cb.values())
    obs = set(ca) | set(cb)
    kab = kba = tv = 0
    for b in obs:
        p = (ca.get(b, 0) + 1) / (na + V)
        q = (cb.get(b, 0) + 1) / (nb + V)
        kab += round(p * math.log(p / q) * 1e9)
        kba += round(q * math.log(q / p) * 1e9)
        tv += round(abs(p - q) * 0.5 * 1e9)
    p0, q0 = 1.0 / (na + V), 1.0 / (nb + V)
    miss = V - len(obs)
    kab += miss * round(p0 * math.log(p0 / q0) * 1e9)
    kba += miss * round(q0 * math.log(q0 / p0) * 1e9)
    tv += miss * round(abs(p0 - q0) * 0.5 * 1e9)
    assert (got.kl_ab_nano, got.kl_ba_nano, got.tv_nano) == (kab, kba, tv)
    assert got.n_buckets_obs == len(obs)


# ------------------------------------------ persisted MinHash band index

def _dup_docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (0, base),
        (1, base + " with a tiny tail change"),
        (2, "completely different content about distributed query engines"),
        (3, "another unrelated document mentioning spark catalyst tungsten"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_minhash_index_probe_finds_cross_dups_signature_only(spark, tmp_path):
    """A batch doc that near-copies an indexed corpus doc surfaces with
    high signature agreement; novel batch docs surface nothing."""
    from parkour_spark.operators.dedup import minhash_index_build, minhash_probe_delta

    corpus = _dup_docs(spark)
    minhash_index_build(corpus, str(tmp_path / "idx"))
    batch = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog again and again today"),
            (101, "a brand new never seen before piece of text entirely"),
        ],
        ["doc_id", "text"],
    )
    got = minhash_probe_delta(
        spark, batch, str(tmp_path / "idx"), threshold=0.8
    ).collect()
    pairs = {(r.id_new, r.id_old): r for r in got}
    assert (100, 0) in pairs
    r = pairs[(100, 0)]
    assert r.sig_matches == 12 and r.est_jaccard == 1.0  # verbatim copy
    assert all(p[0] != 101 for p in pairs)  # novel doc matches nothing


def test_minhash_index_build_drops_overfull_buckets(spark, tmp_path):
    """max_bucket=1 at build time: every band bucket shared by the two
    identical corpus docs is dropped, so even a verbatim probe finds no
    candidates — the cap is enforced at BUILD, not probe."""
    from parkour_spark.operators.dedup import minhash_index_build, minhash_probe_delta

    base = "repeated corpus document text that appears twice verbatim here"
    corpus = spark.createDataFrame([(0, base), (1, base)], ["doc_id", "text"])
    minhash_index_build(corpus, str(tmp_path / "idx"), max_bucket=1)
    batch = spark.createDataFrame([(100, base)], ["doc_id", "text"])
    got = minhash_probe_delta(spark, batch, str(tmp_path / "idx")).collect()
    assert got == []


def test_minhash_probe_no_shuffle_on_index_sigs_scan(spark, tmp_path):
    """The signature-verify join must reach the big sigs table as a
    BroadcastHashJoin — a SortMergeJoin there would shuffle the whole
    index per ingest batch."""
    from parkour_spark.operators.dedup import minhash_index_build, minhash_probe_delta

    corpus = _dup_docs(spark)
    minhash_index_build(corpus, str(tmp_path / "idx"))
    batch = spark.createDataFrame([(100, "the quick brown fox")], ["doc_id", "text"])
    plan = minhash_probe_delta(
        spark, batch, str(tmp_path / "idx")
    )._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan


# --------------------------------------------------- c-TF-IDF labeling

def test_class_top_terms_surfaces_distinctive_not_common_terms(spark):
    """A term shared by every class scores low (ln(1 + A/f) shrinks as
    f grows); a class-exclusive term tops its class."""
    from parkour_spark.operators.corpus import class_top_terms

    rows = [
        (0, "shared shared quantum physics entangle", "sci"),
        (1, "shared shared quantum relativity", "sci"),
        (2, "shared shared recipe butter flour", "cook"),
        (3, "shared shared recipe oven flour", "cook"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = class_top_terms(df, class_col="source", k=2).collect()
    top = {r.source: [] for r in got}
    for r in sorted(got, key=lambda r: (r.source, r.rank)):
        top[r.source].append(r.term)
    # the class-exclusive term outranks the everywhere-term in BOTH
    # classes: ln(1 + A/f) shrinks with global frequency f
    assert top["sci"][0] == "quantum"
    assert top["cook"][0] in ("recipe", "flour")
    assert top["sci"][0] != "shared" and top["cook"][0] != "shared"


def test_class_top_terms_single_corpus_shuffle(spark):
    """Vocabulary stats must NOT re-shuffle the corpus: the plan reads
    the token explode once (single Exchange feeding the (class, term)
    aggregate; f(t) and A derive from that aggregate)."""
    from parkour_spark.operators.corpus import class_top_terms

    df = spark.createDataFrame(
        [(0, "a b c", "x"), (1, "b c d", "y")], ["doc_id", "text", "source"]
    )
    plan = class_top_terms(df)._jdf.queryExecution().executedPlan().toString()
    # both consumers (the 1-row A aggregate and the scoring pass) read
    # the CACHED counts table — neither re-tokenizes the corpus.
    # (InMemoryRelation.toString embeds its child plan, so counting raw
    # scan strings over-counts; the cache hits are the real signal.)
    assert plan.count("InMemoryTableScan") >= 2


# ----------------------------------------------------- rank-sum AUC

def test_auc_rank_sum_perfect_and_chance_and_ties(spark):
    from parkour_spark.operators.validate import auc_rank_sum

    # perfect separation
    df = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1), (4, 1)], ["s", "y"]
    )
    r = auc_rank_sum(df, "s", "y").collect()[0]
    assert (r.n_pos, r.n_neg, r.auc) == (2, 2, 1.0)
    # all tied → exactly 0.5 via midrank credit
    df = spark.createDataFrame([(7, 0), (7, 1), (7, 0), (7, 1)], ["s", "y"])
    assert auc_rank_sum(df, "s", "y").collect()[0].auc == 0.5
    # hand-computed mixed case: scores 1,2,2,3 labels 0,1,0,1
    # pairs (pos>neg): (2>1)=1, (3>1)=1, (3>2)=1; ties: (2==2)=0.5
    # U = 3.5 of 4 → AUC = 0.875
    df = spark.createDataFrame([(1, 0), (2, 1), (2, 0), (3, 1)], ["s", "y"])
    r = auc_rank_sum(df, "s", "y").collect()[0]
    assert r.u2 == 7 and r.auc == 0.875


def test_auc_rank_sum_inverted_scores_give_complement(spark):
    from parkour_spark.operators.validate import auc_rank_sum

    rows = [(i, 1 if i >= 6 else 0) for i in range(10)]
    df = spark.createDataFrame(rows, ["s", "y"])
    a = auc_rank_sum(df, "s", "y").collect()[0].auc
    inv = df.select((-F.col("s")).alias("s"), "y")
    b = auc_rank_sum(inv, "s", "y").collect()[0].auc
    assert a == 1.0 and b == 0.0


def test_quality_bp_is_integer_numerator_of_quality_score(spark):
    from parkour_spark.functions.text import quality_bp, quality_score

    df = spark.createDataFrame(
        [(0, "the quick brown fox is here today"), (1, "x"), (2, "")],
        ["i", "text"],
    )
    got = df.select(
        quality_bp("text").alias("bp"), quality_score("text").alias("q")
    ).collect()
    for r in got:
        assert isinstance(r.bp, int) and 0 <= r.bp <= 10000
        assert r.q == r.bp / 10000.0


# --------------------------------------- calibration bins + Cohen's kappa

def test_calibration_bins_exact_counts_and_edges(spark):
    from parkour_spark.operators.validate import calibration_bins

    rows = [
        (0.05, 1), (0.05, 0),          # bin 0
        (0.95, 1), (1.0, 1),           # bin 9 (closed top edge)
        (-0.2, 0),                     # clamps into bin 0
        (0.55, 1),                     # bin 5
    ]
    df = spark.createDataFrame(rows, ["s", "y"])
    got = {r.bin: r for r in calibration_bins(df, "s", "y", bins=10).collect()}
    assert got[0].n == 3 and got[0].n_pos == 1
    assert got[9].n == 2 and got[9].n_pos == 2 and got[9].pos_rate == 1.0
    assert got[5].n == 1 and got[5].mean_score == 0.55
    assert set(got) == {0, 5, 9}


def test_kappa_perfect_chance_and_known_value(spark):
    from parkour_spark.operators.validate import kappa_agreement

    # perfect agreement → kappa 1
    df = spark.createDataFrame([(1, 1), (0, 0), (1, 1)], ["p", "t"])
    assert kappa_agreement(df, "p", "t").collect()[0].kappa == 1.0
    # independence at 50/50 marginals → kappa 0
    df = spark.createDataFrame(
        [(1, 1), (1, 0), (0, 1), (0, 0)], ["p", "t"]
    )
    r = kappa_agreement(df, "p", "t").collect()[0]
    assert r.kappa == 0.0 and r.po == 0.5 and r.pe == 0.5
    # textbook: tp=20 fp=5 fn=10 tn=15 → po=.7, pe=.5, kappa=.4
    rows = [(1, 1)] * 20 + [(1, 0)] * 5 + [(0, 1)] * 10 + [(0, 0)] * 15
    r = kappa_agreement(spark.createDataFrame(rows, ["p", "t"]).repartition(8),
                        "p", "t").collect()[0]
    assert (r.tp, r.fp, r.fn, r.tn) == (20, 5, 10, 15)
    assert r.po == 0.7 and r.pe == 0.5 and r.kappa == 0.4


# ------------------------------------------------- HLL set algebra

def test_hll_merge_equals_registers_of_concatenation(spark):
    """Mergeability: max-merge of two sketches == the sketch of the
    concatenated input (the property that makes HLL shard-safe)."""
    from parkour_spark.operators.sketch import hll_merge, hll_registers

    a = spark.range(0, 400).select(F.col("id").alias("k"))
    b = spark.range(300, 700).select(F.col("id").alias("k"))
    merged = hll_merge(hll_registers(a, "k"), hll_registers(b, "k"))
    direct = hll_registers(a.unionByName(b), "k")
    assert sorted((r.bucket, r.rho) for r in merged.collect()) == sorted(
        (r.bucket, r.rho) for r in direct.collect()
    )


def test_hll_intersect_disjoint_near_zero_overlapping_near_truth(spark):
    from parkour_spark.operators.sketch import hll_intersect_estimate

    a = spark.range(0, 2000).select(F.col("id").alias("k"))
    b = spark.range(1000, 3000).select(F.col("id").alias("k"))  # 1000 shared
    r = hll_intersect_estimate(a, b, "k").collect()[0]
    assert abs(r.est_intersect - 1000) <= 0.2 * r.est_union
    disj = spark.range(50000, 52000).select(F.col("id").alias("k"))
    r2 = hll_intersect_estimate(a, disj, "k").collect()[0]
    assert abs(r2.est_intersect) <= 0.2 * r2.est_union


# ---------------------------------------------- two-sample KS statistic

def test_ks_statistic_identical_zero_disjoint_one(spark):
    from parkour_spark.operators.validate import ks_statistic

    a = spark.range(0, 100).select(F.col("id").alias("x"))
    r = ks_statistic(a, a, "x").collect()[0]
    assert r.ks == 0.0 and r.n_a == 100 and r.n_b == 100
    b = spark.range(1000, 1100).select(F.col("id").alias("x"))
    assert ks_statistic(a, b, "x").collect()[0].ks == 1.0


def test_ks_statistic_matches_scipy_free_replica(spark):
    """Hand replica over unsorted duplicated data with ties across
    sides — the supremum and its exact integer numerator must match."""
    from parkour_spark.operators.validate import ks_statistic

    xs_a = [1, 3, 3, 5, 9, 9, 9, 2]
    xs_b = [2, 3, 4, 4, 10, 1]
    da = spark.createDataFrame([(x,) for x in xs_a], ["x"])
    db = spark.createDataFrame([(x,) for x in xs_b], ["x"])
    got = ks_statistic(da, db, "x").collect()[0]
    na, nb = len(xs_a), len(xs_b)
    best = 0
    for x in sorted(set(xs_a) | set(xs_b)):
        ca = sum(1 for v in xs_a if v <= x)
        cb = sum(1 for v in xs_b if v <= x)
        best = max(best, abs(ca * nb - cb * na))
    assert (got.n_a, got.n_b, got.ks_num) == (na, nb, best)
    assert got.ks == round(best / (na * nb), 6)


# ------------------------------------------------ Poisson bootstrap CI

def test_bootstrap_ci_constant_column_is_degenerate_and_exact(spark):
    """All values equal c → every replicate mean is exactly c → the CI
    collapses to [c, c]."""
    from parkour_spark.operators.validate import bootstrap_ci

    df = spark.range(0, 500).select(
        F.col("id"), F.lit(42.5).alias("x")
    )
    r = bootstrap_ci(df, "x", "id", b=50).collect()[0]
    assert (r.point_mean, r.ci_lo, r.ci_hi) == (42.5, 42.5, 42.5)
    assert r.n == 500 and r.b == 50


def test_bootstrap_ci_brackets_mean_and_is_layout_invariant(spark):
    """The CI brackets the sample mean, and the whole artifact is
    identical under a different partition layout (weights are derived
    from ids, not drawn from partition-seeded RNG)."""
    from parkour_spark.operators.validate import bootstrap_ci

    df = spark.range(0, 2000).select(
        F.col("id"), (F.col("id") % 100).cast("double").alias("x")
    )
    r1 = bootstrap_ci(df, "x", "id", b=40).collect()[0]
    r2 = bootstrap_ci(df.repartition(13), "x", "id", b=40).collect()[0]
    assert r1 == r2
    assert r1.ci_lo <= r1.point_mean <= r1.ci_hi
    assert r1.ci_lo < r1.ci_hi  # non-degenerate on varying data
