"""Round-8 operators: Cohen's kappa, calibration bins + ECE,
importance-weight ESS, Zipf slope."""

import math

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------------
# Cohen's kappa
# ------------------------------------------------------------------

def test_kappa_perfect_agreement_is_one(spark):
    from parkour_spark.operators.validate import cohens_kappa

    rows = [("a", "a")] * 30 + [("b", "b")] * 20
    df = spark.createDataFrame(rows, "x string, y string")
    r = cohens_kappa(df, "x", "y").collect()[0]
    assert r["n"] == 50 and r["agree"] == 50
    assert r["kappa_micro"] == 1000000 and r["kappa"] == 1.0


def test_kappa_hand_computed_with_disagreement(spark):
    from parkour_spark.operators.validate import cohens_kappa

    # classic 2x2: cells aa=20, ab=5, ba=10, bb=15
    rows = (
        [("a", "a")] * 20 + [("a", "b")] * 5
        + [("b", "a")] * 10 + [("b", "b")] * 15
    )
    df = spark.createDataFrame(rows, "x string, y string")
    r = cohens_kappa(df, "x", "y").collect()[0]
    n, agree = 50, 35
    s = 25 * 30 + 25 * 20  # row_a*col_a + row_b*col_b
    want = round((agree * n - s) / (n * n - s) * 1e6)
    assert (r["n"], r["agree"], r["s_chance"]) == (n, agree, s)
    assert r["kappa_micro"] == want


def test_kappa_null_category_counts(spark):
    from parkour_spark.operators.validate import cohens_kappa

    # NULL agrees with NULL (it is a category, not a missing cell)
    rows = [(None, None)] * 10 + [("a", "a")] * 10 + [("a", None)] * 5
    df = spark.createDataFrame(rows, "x string, y string")
    r = cohens_kappa(df, "x", "y").collect()[0]
    assert r["n"] == 25 and r["agree"] == 20
    # margins: row(None)=10,row(a)=15; col(None)=15,col(a)=10
    assert r["s_chance"] == 10 * 15 + 15 * 10


def test_kappa_degenerate_single_category_is_null(spark):
    from parkour_spark.operators.validate import cohens_kappa

    df = spark.createDataFrame([("a", "a")] * 9, "x string, y string")
    r = cohens_kappa(df, "x", "y").collect()[0]
    assert r["kappa_micro"] is None and r["kappa"] is None


# ------------------------------------------------------------------
# Calibration bins + ECE
# ------------------------------------------------------------------

def test_ece_perfectly_calibrated_vs_off(spark):
    """ECE rides the EXISTING calibration_bins cells (same bin
    arithmetic, same micro-unit sums)."""
    from parkour_spark.operators.validate import (
        expected_calibration_error,
    )

    # scores .75: 4 rows, 3 positive -> |4*750000 - 3*1e6| = 0
    good = [(0.75, 1)] * 3 + [(0.75, 0)]
    r = expected_calibration_error(
        spark.createDataFrame(good, "score double, label int"),
        "score", "label",
    ).collect()[0]
    assert r["ece_micro"] == 0 and r["n"] == 4 and r["n_bins_used"] == 1

    # all-confident, all-wrong: ECE = 0.95 exactly; NULL scores excluded
    bad = [(0.95, 0)] * 10 + [(None, 1)]
    r = expected_calibration_error(
        spark.createDataFrame(bad, "score double, label int"),
        "score", "label",
    ).collect()[0]
    assert r["ece_micro"] == 950000 and r["n"] == 10


# ------------------------------------------------------------------
# Importance-weight ESS
# ------------------------------------------------------------------

def test_ess_equal_weights_equals_n(spark):
    from parkour_spark.operators.validate import importance_ess

    df = spark.createDataFrame(
        [("g", 2.5)] * 40, "grp string, w double"
    )
    r = importance_ess(df, "w", "grp").collect()[0]
    assert r["n"] == 40
    assert r["ess_milli"] == 40000  # ESS == n
    assert r["ess_ratio_micro"] == 1000000


def test_ess_collapsed_weights_near_one(spark):
    from parkour_spark.operators.validate import importance_ess

    rows = [("g", 1000.0)] + [("g", 0.001)] * 99
    df = spark.createDataFrame(rows, "grp string, w double")
    r = importance_ess(df, "w", "grp").collect()[0]
    s1 = 1000000 + 99  # milli
    s2 = 1000000**2 + 99
    assert r["s1_milli"] == s1 and r["s2_milli2"] == s2
    assert r["ess_milli"] == round(1000.0 * s1 * s1 / s2)
    assert r["ess_milli"] < 1100  # collapsed: ~1 effective row


# ------------------------------------------------------------------
# Zipf slope
# ------------------------------------------------------------------

def test_zipf_slope_matches_hand_fit(spark):
    from parkour_spark.operators.corpus import zipf_slope

    # construct exact counts: term_r appears c_r times
    counts = {"aa": 64, "bb": 32, "cc": 16, "dd": 8, "ee": 4}
    text = " ".join(t for t, c in counts.items() for _ in range(c))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = zipf_slope(df, top_n=5).collect()[0]
    ranked = sorted(counts.values(), reverse=True)
    pts = [
        (round(math.log(i + 1) * 1e6), round(math.log(c) * 1e6))
        for i, c in enumerate(ranked)
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    det = n * sxx - sx * sx
    assert (r["n_terms"], r["sx"], r["sy"], r["sxx"], r["sxy"]) == (
        n, sx, sy, sxx, sxy,
    )
    assert r["slope_micro"] == round((n * sxy - sx * sy) / det * 1e6)
    assert r["intercept_micro"] == round((sy * sxx - sx * sxy) / det)
    # counts halve per rank step; ln2/ln spacing is not linear in
    # ln(rank), but the fitted slope must be steeply negative
    assert r["slope_micro"] < -1000000


# ------------------------------------------------------------------
# Persisted-state covariance maintainer (r7 verdict #5 variant)
# ------------------------------------------------------------------

def _vec_df(spark, seed, n=24, d=4):
    import numpy as np

    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d))
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>",
    )


def test_covariance_snapshots_equal_batch(spark, tmp_path):
    from parkour_spark.operators.pca import covariance_cells
    from parkour_spark.streaming.windows import (
        streaming_covariance_snapshots,
    )

    df = _vec_df(spark, 11)
    src = str(tmp_path / "src")
    df.repartition(3).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    got = streaming_covariance_snapshots(
        spark, src, schema, str(tmp_path / "state")
    )
    want = {(r.i, r.j): r.s for r in covariance_cells(df).collect()}
    assert {(r.i, r.j): r.s for r in got.collect()} == want


def test_covariance_snapshots_resume_after_restart(spark, tmp_path):
    """Second run on the same state_base resumes from the committed
    snapshot + checkpoint offsets: new files fold IN, old files are
    not re-read, and the final grid equals the batch over everything."""
    import shutil

    from parkour_spark.operators.pca import covariance_cells
    from parkour_spark.streaming.windows import (
        streaming_covariance_snapshots,
    )

    a, b = _vec_df(spark, 1), _vec_df(spark, 2)
    src, state = str(tmp_path / "src"), str(tmp_path / "state")
    a.coalesce(1).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    streaming_covariance_snapshots(spark, src, schema, state)

    # wave 2 arrives; delete wave-1 data files to PROVE they are not
    # re-read (offsets + snapshot carry their contribution)
    wave1 = [f for f in __import__("os").listdir(src) if f.endswith(".parquet")]
    b.coalesce(1).write.mode("append").parquet(src)
    for f in wave1:
        shutil.os.remove(f"{src}/{f}")
    got = streaming_covariance_snapshots(spark, src, schema, state)
    want = {
        (r.i, r.j): r.s
        for r in covariance_cells(a.unionByName(b)).collect()
    }
    assert {(r.i, r.j): r.s for r in got.collect()} == want


def test_ece_empty_and_all_null_scores(spark):
    from parkour_spark.operators.validate import (
        expected_calibration_error,
    )

    df = spark.createDataFrame(
        [(None, 1), (None, 0)], "score double, label int"
    )
    r = expected_calibration_error(df, "score", "label").collect()[0]
    assert r["n"] == 0 and r["n_bins_used"] == 0
    assert r["ece_micro"] is None and r["ece"] is None


# ------------------------------------------------------------------
# Incremental connected components (delta ≡ full recompute)
# ------------------------------------------------------------------

def test_cc_delta_equals_full_recompute(spark):
    from parkour_spark.operators.graph import (
        cc_delta_update,
        connected_components,
    )

    old_nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 5, 7]], "id long")
    old_edges = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    comps = connected_components(old_nodes, old_edges)
    comps = comps.select(F.col("n").alias("id"), "component")

    new_nodes = spark.createDataFrame([(10,), (11,), (12,)], "id long")
    # 10 joins the {1,2,3} component; 11 bridges old singletons 5 and 7;
    # 12 stays isolated
    new_edges = spark.createDataFrame(
        [(10, 3), (11, 7), (11, 5)], "id_a long, id_b long"
    )
    got = {
        (r.n, r.component)
        for r in cc_delta_update(comps, new_nodes, new_edges).collect()
    }
    all_nodes = old_nodes.unionByName(new_nodes)
    all_edges = old_edges.unionByName(new_edges)
    want = {
        (r.n, r.component)
        for r in connected_components(all_nodes, all_edges).collect()
    }
    assert got == want
    assert (10, 1) in got and (11, 5) in got and (12, 12) in got


def test_cc_delta_untouched_components_pass_through(spark):
    from parkour_spark.operators.graph import cc_delta_update

    comps = spark.createDataFrame(
        [(1, 1), (2, 1), (9, 9)], "id long, component long"
    )
    got = {
        (r.n, r.component)
        for r in cc_delta_update(
            comps,
            spark.createDataFrame([(20,)], "id long"),
            spark.createDataFrame([], "id_a long, id_b long"),
        ).collect()
    }
    assert got == {(1, 1), (2, 1), (9, 9), (20, 20)}


def test_cc_delta_merges_two_old_components_via_new_node(spark):
    """A batch node can BRIDGE two existing components; both collapse
    to the global min id, exactly as a full recompute would."""
    from parkour_spark.operators.graph import cc_delta_update

    comps = spark.createDataFrame(
        [(3, 3), (4, 3), (6, 6), (8, 6)], "id long, component long"
    )
    got = {
        (r.n, r.component)
        for r in cc_delta_update(
            comps,
            spark.createDataFrame([(50,)], "id long"),
            spark.createDataFrame([(50, 4), (50, 8)], "id_a long, id_b long"),
        ).collect()
    }
    assert got == {(3, 3), (4, 3), (6, 3), (8, 3), (50, 3)}


def test_cc_delta_never_shuffles_the_component_table(spark):
    """The corpus-sized table flows only through broadcast joins —
    a SortMergeJoin anywhere means the delta degraded to a corpus
    shuffle."""
    from parkour_spark.operators.graph import cc_delta_update

    comps = spark.createDataFrame(
        [(i, i - i % 2) for i in range(100)], "id long, component long"
    )
    out = cc_delta_update(
        comps,
        spark.createDataFrame([(1000,)], "id long"),
        spark.createDataFrame([(1000, 3)], "id_a long, id_b long"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan


# ------------------------------------------------------------------
# Filter attrition report
# ------------------------------------------------------------------

def test_filter_attrition_hand_case(spark):
    from parkour_spark.operators.validate import filter_attrition

    rows = [
        (1, 10, "en"), (2, 300, "en"), (3, 300, "fr"),
        (4, 300, "en"), (5, 50000, "en"), (6, 300, None),
    ]
    df = spark.createDataFrame(rows, "id long, n long, lang string")
    got = {
        r.stage: (r.stage_idx, r.n_pass, r.n_surviving, r.retained_bp)
        for r in filter_attrition(
            df,
            [
                ("len_ok", (F.col("n") >= 100) & (F.col("n") <= 20000)),
                ("lang_en", F.col("lang") == "en"),  # NULL counts False
            ],
        ).collect()
    }
    assert got == {
        "input": (0, 6, 6, 10000),
        "len_ok": (1, 4, 4, 6666),       # rows 2,3,4,6
        "lang_en": (2, 4, 2, 3333),      # alone: 1,2,4,5; cumulative: 2,4
    }


def test_filter_attrition_requires_stages(spark):
    from parkour_spark.operators.validate import filter_attrition

    with pytest.raises(ValueError):
        filter_attrition(spark.range(3), [])


# ------------------------------------------------------------------
# IVF index append + quantizer guard
# ------------------------------------------------------------------

def test_ivf_append_equals_combined_build(spark, tmp_path):
    import numpy as np

    from parkour_spark.operators.similarity import (
        ivf_index_append,
        ivf_index_build,
        ivf_probe_topk,
    )

    rng = np.random.default_rng(3)
    x = rng.normal(size=(60, 6))
    df = spark.createDataFrame(
        [(i, [float(v) for v in r]) for i, r in enumerate(x)],
        "vec_id long, embedding array<float>",
    )
    cents = [(i, [float(v) for v in x[i]]) for i in range(4)]
    queries = df.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    a = str(tmp_path / "combined")
    ivf_index_build(df, cents, a)
    b = str(tmp_path / "delta")
    ivf_index_build(df.where(F.col("vec_id") < 40), cents, b)
    ivf_index_append(df.where(F.col("vec_id") >= 40), cents, b)

    ra = {(r.query_id, r.vec_id, r.rank, r.cos)
          for r in ivf_probe_topk(spark, a, queries, cents, k=5).collect()}
    rb = {(r.query_id, r.vec_id, r.rank, r.cos)
          for r in ivf_probe_topk(spark, b, queries, cents, k=5).collect()}
    assert ra == rb and len(ra) >= 10


def test_ivf_quantizer_mismatch_raises(spark, tmp_path):
    import numpy as np

    import pytest as _pytest

    from parkour_spark.operators.similarity import (
        ivf_index_append,
        ivf_index_build,
        ivf_probe_topk,
    )

    rng = np.random.default_rng(4)
    x = rng.normal(size=(20, 4))
    df = spark.createDataFrame(
        [(i, [float(v) for v in r]) for i, r in enumerate(x)],
        "vec_id long, embedding array<float>",
    )
    cents = [(i, [float(v) for v in x[i]]) for i in range(3)]
    other = [(i, [float(v) + 0.5 for v in x[i]]) for i in range(3)]
    idx = str(tmp_path / "idx")
    ivf_index_build(df, cents, idx)
    batch = df.where(F.col("vec_id") >= 18)
    with _pytest.raises(ValueError, match="quantizer mismatch"):
        ivf_index_append(batch, other, idx)
    q = df.limit(1).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    with _pytest.raises(ValueError, match="quantizer mismatch"):
        ivf_probe_topk(spark, idx, q, other, k=3).collect()
    # matching quantizer still appends + probes fine
    ivf_index_append(batch, cents, idx)
    assert ivf_probe_topk(spark, idx, q, cents, k=3).count() > 0


# ------------------------------------------------------------------
# Streaming component maintainer
# ------------------------------------------------------------------

def test_streaming_components_equal_batch_cc(spark, tmp_path):
    from parkour_spark.operators.graph import connected_components
    from parkour_spark.streaming.windows import (
        streaming_component_maintainer,
    )

    edges = [(1, 2), (2, 3), (5, 6), (7, 8), (3, 7), (9, 10)]
    edf = spark.createDataFrame(edges, "id_a long, id_b long")
    src = str(tmp_path / "edges")
    edf.repartition(3).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    got = {
        (r.id, r.component)
        for r in streaming_component_maintainer(
            spark, src, schema, str(tmp_path / "state")
        ).collect()
    }
    nodes = edf.select(F.col("id_a").alias("id")).union(
        edf.select("id_b")
    ).distinct()
    want = {
        (r.n, r.component)
        for r in connected_components(nodes, edf).collect()
    }
    assert got == want
    # the bridge (3,7) merges {1,2,3} with {7,8} and (from batch order,
    # whichever) {5,6} stays separate
    comp_of = dict(got)
    assert comp_of[8] == 1 and comp_of[5] == 5 and comp_of[9] == 9


# ------------------------------------------------------------------
# Dunning G^2 collocations
# ------------------------------------------------------------------

def test_llr_collocations_hand_case(spark):
    """3-bigram toy corpus: 'a b' twice, 'b a' once -> hand-computed
    G^2 per pair, glued pair ranks first."""
    import math as m

    from parkour_spark.operators.corpus import llr_collocations

    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "b a")], "doc_id long, text string"
    )
    got = llr_collocations(df, min_count=1, top_n=10).collect()
    rows = {(r.w1, r.w2): (r.c12, r.llr_micro) for r in got}

    def g2(k11, r1, c1, n):
        k12, k21, k22 = r1 - k11, c1 - k11, n - r1 - c1 + k11
        r2, c2 = n - r1, n - c1
        tot = 0
        for k, rt, ct in [(k11, r1, c1), (k12, r1, c2),
                          (k21, r2, c1), (k22, r2, c2)]:
            if k > 0:
                tot += round(2.0 * k * m.log((k * n) / (rt * ct)) * 1e6)
        return tot

    # cells: (a,b)=2, (b,a)=1; R(a)=2, R(b)=1; C(b)=2, C(a)=1; N=3
    assert rows[("a", "b")] == (2, g2(2, 2, 2, 3))
    assert rows[("b", "a")] == (1, g2(1, 1, 1, 3))
    assert got[0].w1 == "a"  # the doubly-observed pair ranks first


def test_llr_zero_for_independent_fourway(spark):
    """Perfectly independent 2x2 (all four bigrams equally likely):
    every cell's observed == expected, G^2 == 0 for each pair."""
    from parkour_spark.operators.corpus import llr_collocations

    text = "a a a b b a b b"
    # bigrams: aa ab ab bb ba ab bb ... build explicitly instead:
    docs = [(i, t) for i, t in enumerate(["a a", "a b", "b a", "b b"])]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = llr_collocations(df, min_count=1, top_n=10).collect()
    assert {r.llr_micro for r in got} == {0}


# ------------------------------------------------------------------
# Golden-record survivorship
# ------------------------------------------------------------------

def test_golden_record_per_field_nonnull_latest(spark):
    from parkour_spark.operators.cdc import golden_record

    rows = [
        # entity 1: newest row (t=3) has NULL email -> email falls back
        # to t=2's; phone comes from t=3
        (1, 1, "a@x", "111"),
        (1, 2, "b@x", None),
        (1, 3, None, "333"),
        # entity 2: single all-null field stays NULL
        (2, 1, None, "999"),
    ]
    df = spark.createDataFrame(
        rows, "ent long, ts long, email string, phone string"
    )
    got = {
        r.entity: (r.n_records, r.email_golden, r.phone_golden)
        for r in golden_record(
            df, "ent", "ts", "ts", ["email", "phone"]
        ).collect()
    }
    assert got == {1: (3, "b@x", "333"), 2: (1, None, "999")}


def test_golden_record_tiebreak_is_total(spark):
    from parkour_spark.operators.cdc import golden_record

    rows = [(1, 5, 10, "lo"), (1, 5, 20, "hi")]  # same ts, key breaks
    df = spark.createDataFrame(rows, "ent long, ts long, k long, v string")
    r = golden_record(df, "ent", "ts", "k", ["v"]).collect()[0]
    assert r.v_golden == "hi"


def test_cc_delta_from_empty_components(spark):
    """Bootstrap case: an empty component table + a first batch of
    edges behaves exactly like plain CC (every endpoint is 'new')."""
    from parkour_spark.operators.graph import cc_delta_update

    comps = spark.createDataFrame([], "id long, component long")
    got = {
        (r.n, r.component)
        for r in cc_delta_update(
            comps,
            spark.createDataFrame([(9,)], "id long"),
            spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long"),
        ).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (9, 9)}


# ------------------------------------------------------------------
# Corpus version diff
# ------------------------------------------------------------------

def test_corpus_diff_all_statuses(spark):
    from parkour_spark.operators.corpus import corpus_diff

    old = spark.createDataFrame(
        [(1, "a", "s1"), (2, "b", "s1"), (3, "c", "s2")],
        "doc_id long, text string, source string",
    )
    new = spark.createDataFrame(
        [(1, "a", "s1"), (2, "B", "s1"), (4, "d", "s2")],
        "doc_id long, text string, source string",
    )
    got = {(r.group, r.status): r.n_docs
           for r in corpus_diff(old, new).collect()}
    assert got == {
        ("s1", "unchanged"): 1,
        ("s1", "changed"): 1,
        ("s2", "removed"): 1,
        ("s2", "added"): 1,
    }


def test_corpus_diff_ungrouped(spark):
    from parkour_spark.operators.corpus import corpus_diff

    old = spark.createDataFrame(
        [(1, "a", "s")], "doc_id long, text string, source string"
    )
    got = {(r.group, r.status): r.n_docs
           for r in corpus_diff(old, old, group_col=None).collect()}
    assert got == {("all", "unchanged"): 1}
