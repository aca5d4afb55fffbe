"""Property-based tests (hypothesis): operators checked against
independent driver-side Python reference implementations on randomized
inputs — the complement of the fixed-fixture golden tests and the
DuckDB oracle gate (SURVEY §5 extension).

Each property uses one deterministic Spark session and small generated
relations; `deadline=None` because Spark job latency is not the property
under test.
"""

import bisect

from hypothesis import HealthCheck, example, given, settings, strategies as st
from pyspark.sql import functions as F

from parkour_spark.operators.asof import asof_join, range_join
from parkour_spark.operators.dedup import exact_dedup
from parkour_spark.operators.joins import salted_join

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

keys = st.integers(min_value=0, max_value=3)
times = st.integers(min_value=0, max_value=50)


@given(
    left=st.lists(st.tuples(keys, times), min_size=1, max_size=25),
    right=st.lists(st.tuples(keys, times), min_size=1, max_size=25),
)
@settings(**_SETTINGS)
def test_asof_backward_matches_reference(spark, left, right):
    """asof_join(backward) == latest right time <= left time, per key."""
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], ["k", "t", "lid"]
    )
    rdf = spark.createDataFrame(
        [(k, t, float(t) + k) for (k, t) in right], ["k", "rt", "rv"]
    )
    got = {
        r["lid"]: r["rv"]
        for r in asof_join(ldf, rdf, ["k"], "t", "rt", ["rv"]).collect()
    }

    by_key: dict[int, list[tuple[int, float]]] = {}
    for k, t in right:
        by_key.setdefault(k, []).append((t, float(t) + k))
    for k in by_key:
        # equal right times: the window's last-write wins; make the
        # reference agree by keeping the max value per (k, t)
        dedup: dict[int, float] = {}
        for t, v in sorted(by_key[k]):
            dedup[t] = max(dedup.get(t, v), v)
        by_key[k] = sorted(dedup.items())

    for i, (k, t) in enumerate(left):
        cands = by_key.get(k, [])
        pos = bisect.bisect_right([c[0] for c in cands], t) - 1
        expect = cands[pos][1] if pos >= 0 else None
        assert got[i] == expect, (i, k, t, got[i], expect)


@given(
    vals=st.lists(st.floats(min_value=0, max_value=100, allow_nan=False), min_size=1, max_size=20),
    intervals=st.lists(
        st.tuples(st.floats(min_value=0, max_value=90, allow_nan=False),
                  st.floats(min_value=0.5, max_value=20, allow_nan=False)),
        min_size=1, max_size=8,
    ),
)
@settings(**_SETTINGS)
def test_range_join_matches_reference(spark, vals, intervals):
    """range_join == brute-force [lo, hi) containment."""
    ldf = spark.createDataFrame(list(enumerate(vals)), ["lid", "v"])
    rdf = spark.createDataFrame(
        [(i, lo, lo + w) for i, (lo, w) in enumerate(intervals)], ["rid", "lo", "hi"]
    )
    got = sorted(
        (r["lid"], r["rid"])
        for r in range_join(ldf, rdf, "v", "lo", "hi").select("lid", "rid").collect()
    )
    expect = sorted(
        (li, ri)
        for li, v in enumerate(vals)
        for ri, (lo, w) in enumerate(intervals)
        if lo <= v < lo + w
    )
    assert got == expect


@given(
    left=st.lists(st.tuples(keys, st.integers(0, 9)), min_size=0, max_size=25),
    right=st.lists(st.tuples(keys, st.integers(0, 9)), min_size=0, max_size=25),
    num_salts=st.sampled_from([1, 3, 8]),
)
@settings(**_SETTINGS)
def test_salted_join_equals_plain_join(spark, left, right, num_salts):
    if not left or not right:
        return
    ldf = spark.createDataFrame(left, ["k", "lv"])
    rdf = spark.createDataFrame(right, ["k", "rv"])
    plain = sorted(map(tuple, ldf.join(rdf, "k").select("k", "lv", "rv").collect()))
    salted = sorted(
        map(
            tuple,
            salted_join(ldf, rdf, "k", num_salts=num_salts, hot_keys="all")
            .select("k", "lv", "rv")
            .collect(),
        )
    )
    assert salted == plain


@given(
    texts=st.lists(
        st.text(alphabet="ab \t", min_size=0, max_size=12), min_size=1, max_size=20
    )
)
@settings(**_SETTINGS)
def test_exact_dedup_partitions_by_normalized_text(spark, texts):
    """exact_dedup groups exactly the docs whose normalized text is
    equal; keep_id is the minimum id of each group."""
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    rows = exact_dedup(df, "text", "doc_id").collect()

    def norm(s: str) -> str:
        # mirror fingerprint() exactly: trim strips SPACES only (Spark
        # and DuckDB agree), then any whitespace run becomes one space
        import re

        return re.sub(r"\s+", " ", s.strip(" ").lower())

    groups: dict[str, list[int]] = {}
    for i, s in enumerate(texts):
        groups.setdefault(norm(s), []).append(i)
    assert sorted((r["keep_id"], r["n_dups"]) for r in rows) == sorted(
        (min(ids), len(ids)) for ids in groups.values()
    )


@given(
    left=st.lists(st.tuples(keys, times), min_size=1, max_size=20),
    right=st.lists(st.tuples(keys, times), min_size=1, max_size=20),
)
@settings(**_SETTINGS)
def test_asof_forward_ties_match_pandas_merge_asof(spark, left, right):
    """asof_join(forward, tiebreak) cross-checked against pandas
    merge_asof — an independent reference implementation — including
    duplicate right timestamps, where both pick the min-tiebreak row."""
    import pandas as pd

    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], ["k", "t", "lid"]
    )
    # distinct rv per row so ties are observable: rv encodes rid
    rdf = spark.createDataFrame(
        [(k, t, i * 100 + t, i) for i, (k, t) in enumerate(right)],
        ["k", "rt", "rv", "rid"],
    )
    got = {
        r["lid"]: r["rv"]
        for r in asof_join(
            ldf, rdf, ["k"], "t", "rt", ["rv"], direction="forward", tiebreak="rid"
        ).collect()
    }
    lpd = pd.DataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], columns=["k", "t", "lid"]
    ).sort_values(["t", "lid"], kind="stable")
    rpd = pd.DataFrame(
        [(k, t, i * 100 + t, i) for i, (k, t) in enumerate(right)],
        columns=["k", "rt", "rv", "rid"],
    ).sort_values(["rt", "rid"], kind="stable")
    merged = pd.merge_asof(
        lpd, rpd, left_on="t", right_on="rt", by="k", direction="forward"
    )
    for _, row in merged.iterrows():
        expect = None if pd.isna(row["rv"]) else int(row["rv"])
        assert got[row["lid"]] == expect, (row["lid"], got[row["lid"]], expect)


words = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
docs_strategy = st.lists(
    st.lists(words, min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=10,
)


@given(texts=docs_strategy)
@settings(**_SETTINGS)
def test_line_dedup_matches_reference(spark, texts):
    """line_dedup == python reference: non-overlapping 3-token lines,
    keep only the globally-first (doc, idx) occurrence of each line."""
    from parkour_spark.operators.corpus import line_dedup

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_lines"], r["n_kept"]) for r in
           line_dedup(df, line_tokens=3).collect()}

    first: dict[str, tuple] = {}
    lines_per_doc: dict[int, list] = {}
    for i, t in rows:
        toks = t.split()
        segs = [" ".join(toks[j:j + 3]) for j in range(0, max(len(toks), 1), 3)]
        lines_per_doc[i] = segs
        for j, seg in enumerate(segs):
            first.setdefault(seg, (i, j))
    exp = {
        i: (len(segs), sum(1 for j, seg in enumerate(segs) if first[seg] == (i, j)))
        for i, segs in lines_per_doc.items()
    }
    assert got == exp


@given(texts=docs_strategy)
@settings(**_SETTINGS)
def test_repetition_stats_match_reference(spark, texts):
    """Column-fold repetition stats == python reference on random docs."""
    from collections import Counter

    from parkour_spark.functions.text import (
        distinct_token_ratio_bp,
        max_token_run,
        top_bigram_share_bp,
        tokens,
    )

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    toked = df.select("doc_id", tokens(F.lower(F.col("text"))).alias("t"))
    got = {
        r["doc_id"]: (r["d"], r["r"], r["b"])
        for r in toked.select(
            "doc_id",
            distinct_token_ratio_bp(F.col("t")).alias("d"),
            max_token_run(F.col("t")).alias("r"),
            top_bigram_share_bp(F.col("t")).alias("b"),
        ).collect()
    }
    for i, t in enumerate(texts):
        toks = t.split()
        d = 10000 * len(set(toks)) // len(toks) if toks else 10000
        r, best, prev = 0, 0, None
        for x in toks:
            r = r + 1 if x == prev else 1
            best = max(best, r)
            prev = x
        bgs = Counter(zip(toks, toks[1:]))
        b = 10000 * max(bgs.values()) // (len(toks) - 1) if bgs else 0
        assert got[i] == (d, best, b), (i, t, got[i], (d, best, b))


# --- substring spans: the verbatim invariant on randomized corpora ---------

span_words = st.sampled_from(
    ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
     "hotel", "india", "juliet"]
)
span_docs = st.lists(
    st.lists(span_words, min_size=3, max_size=25).map(" ".join),
    min_size=2,
    max_size=6,
)


@given(texts=span_docs, shared=st.lists(span_words, min_size=8, max_size=14))
@settings(**_SETTINGS)
def test_substring_spans_verbatim_invariant(spark, texts, shared):
    """EVERY reported span must be verbatim-shared text at the reported
    offsets in BOTH docs' normalized text — the invariant that makes
    the apply half's cut safe — and a planted ≥40-char overlap between
    the first two docs must be detected. Runs over randomized corpora
    (random docs can also share runs by chance; those must satisfy the
    invariant too)."""
    import re

    from parkour_spark.operators.dedup import substring_overlap_spans

    ins = " ".join(shared)
    texts = list(texts)
    texts[0] = texts[0] + " " + ins + " tail zero"
    texts[1] = "head one " + texts[1] + " " + ins
    rows = [(i + 1, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = substring_overlap_spans(df, min_span=40, max_df=50).collect()
    norm = {i: re.sub(r"\s+", " ", t.lower().strip()) for i, t in rows}
    for r in spans:
        a, b = norm[r.id_a], norm[r.id_b]
        assert a[r.a_start - 1 : r.a_end] == b[r.b_start - 1 : r.b_start - 1 + r.span_len]
        assert r.span_len >= 40
    if len(ins) >= 40 + 2 * 16:
        assert any((r.id_a, r.id_b) == (1, 2) for r in spans), "planted overlap missed"


# ---------------------------------------------------------------- round 6

@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),       # group
            st.integers(min_value=0, max_value=10_000),  # id
            st.integers(min_value=1, max_value=500),     # weight > 0
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[1],
    ),
    k=st.integers(min_value=1, max_value=6),
)
@settings(**_SETTINGS)
def test_weighted_sample_matches_aes_reference(spark, rows, k):
    """weighted_sample == driver-side A-ES replica on random inputs:
    same selected ids, same ranks, per group."""
    import hashlib
    import math

    from parkour_spark.operators.corpus import weighted_sample

    df = spark.createDataFrame(rows, ["grp", "rid", "wt"])
    got = {
        (r.grp, r.rank): r.rid
        for r in weighted_sample(df, "rid", "wt", k, group_col="grp").collect()
    }

    def pri(i, w):
        u = (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 1024
             + 0.5) / 1024.0
        return math.log(u) / w

    want = {}
    groups: dict[int, list] = {}
    for g, i, w in rows:
        groups.setdefault(g, []).append((i, w))
    for g, members in groups.items():
        ranked = sorted(members, key=lambda t: (-pri(t[0], t[1]), t[0]))
        for rank, (i, _) in enumerate(ranked[:k], start=1):
            want[(g, rank)] = i
    assert got == want


_words = st.text(alphabet="abcdef ", min_size=3, max_size=16)


@given(names=st.lists(_words, min_size=1, max_size=15, unique=True))
@settings(**_SETTINGS)
def test_fuzzy_join_sound_and_exact_complete(spark, names):
    """Soundness: every returned pair is truly within max_dist (checked
    against Python Levenshtein). Completeness at dist 0: identical
    strings ALWAYS share their min-gram block, so every left string
    present in the registry must match itself."""
    from parkour_spark.operators.joins import fuzzy_join

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    reg = spark.createDataFrame([(n,) for n in names], ["rname"])
    left = spark.createDataFrame(list(enumerate(names)), ["did", "dname"])
    got = fuzzy_join(left, reg, ("did", "dname"), ("rname", "rname"),
                     max_dist=2).collect()
    for r in got:
        assert lev(r.l_val, r.r_val) <= 2, (r.l_val, r.r_val)
    self_hits = {(r.l_id, r.r_val) for r in got if r.dist == 0}
    for i, n in enumerate(names):
        assert (i, n) in self_hits, n


@given(
    hot=st.lists(st.integers(min_value=20, max_value=60), min_size=0, max_size=3),
    cold=st.integers(min_value=0, max_value=80),
    threshold=st.integers(min_value=8, max_value=30),
)
@settings(**_SETTINGS)
def test_mg_heavy_hitters_equals_exact_on_random_skew(spark, hot, cold, threshold):
    """mg_heavy_hitters == GROUP BY HAVING count >= T whenever the MG
    precondition holds, on randomized skew shapes (hot keys of random
    multiplicity + a random cold tail)."""
    from parkour_spark.operators.sketch import mg_heavy_hitters

    vals = [f"h{i}" for i, m in enumerate(hot) for _ in range(m)]
    vals += [f"c{i}" for i in range(cold)]
    if not vals:
        return
    df = spark.createDataFrame([(v,) for v in vals], ["k"]).repartition(3)
    n = len(vals)
    k = 64
    if threshold <= n // (k + 1):  # precondition the operator enforces
        return
    got = {(r.k, r.n) for r in
           mg_heavy_hitters(df, "k", k=k, threshold=threshold).collect()}
    import collections
    cnt = collections.Counter(vals)
    want = {(kk, c) for kk, c in cnt.items() if c >= threshold}
    assert got == want


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 9)), min_size=1, max_size=30
    ),
    n=st.integers(min_value=1, max_value=4),
)
@settings(**_SETTINGS)
def test_quota_cap_matches_reference(spark, rows, n):
    """quota_cap == per-group sort by (score desc, id) truncated to n."""
    from parkour_spark.operators.corpus import quota_cap

    data = [(f"g{g}", i, s) for i, (g, s) in enumerate(rows)]
    df = spark.createDataFrame(data, ["src", "doc_id", "score"])
    got = {(r.src, r.doc_id) for r in
           quota_cap(df, "src", "score", "doc_id", n=n).collect()}
    by_g: dict[str, list] = {}
    for g, i, s in data:
        by_g.setdefault(g, []).append((-s, i))
    want = set()
    for g, lst in by_g.items():
        for negs, i in sorted(lst)[:n]:
            want.add((g, i))
    assert got == want


@given(
    rows=st.lists(
        st.tuples(st.integers(min_value=0, max_value=20),
                  st.booleans()),
        min_size=2, max_size=60,
    ).filter(lambda r: any(y for _, y in r) and any(not y for _, y in r)),
)
@settings(**_SETTINGS)
def test_auc_rank_sum_matches_pairwise_reference(spark, rows):
    """AUC == (wins + 0.5·ties) / (n_pos·n_neg) over ALL pos/neg pairs —
    the O(n²) definition the rank-sum identity must reproduce exactly."""
    from parkour_spark.operators.validate import auc_rank_sum

    df = spark.createDataFrame(
        [(s, 1 if y else 0) for s, y in rows], ["s", "y"]
    )
    got = auc_rank_sum(df, "s", "y").collect()[0]
    pos = [s for s, y in rows if y]
    neg = [s for s, y in rows if not y]
    u2 = sum(2 if p > n else (1 if p == n else 0) for p in pos for n in neg)
    assert got.u2 == u2
    # HALF-UP at the 6th decimal, matching Spark round / DuckDB round —
    # Python's banker's round() differs exactly on .5 ties (hypothesis
    # found u2=65, n=128: 0.5078125 → 0.507813 half-up vs 0.507812)
    import math

    expect = math.floor(u2 / (2.0 * len(pos) * len(neg)) * 1e6 + 0.5) / 1e6
    assert got.auc == expect


@given(
    xs_a=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=50),
    xs_b=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=50),
)
@settings(**_SETTINGS)
def test_ks_statistic_matches_reference(spark, xs_a, xs_b):
    from parkour_spark.operators.validate import ks_statistic

    da = spark.createDataFrame([(x,) for x in xs_a], ["x"])
    db = spark.createDataFrame([(x,) for x in xs_b], ["x"])
    got = ks_statistic(da, db, "x").collect()[0]
    na, nb = len(xs_a), len(xs_b)
    best = max(
        abs(sum(1 for v in xs_a if v <= x) * nb
            - sum(1 for v in xs_b if v <= x) * na)
        for x in set(xs_a) | set(xs_b)
    )
    assert (got.n_a, got.n_b, got.ks_num) == (na, nb, best)


@given(
    rows=st.lists(st.tuples(st.booleans(), st.booleans()),
                  min_size=2, max_size=60)
    .filter(lambda r: len({(p, t) for p, t in r}) > 1),
)
@settings(**_SETTINGS)
def test_kappa_matches_reference(spark, rows):
    from parkour_spark.operators.validate import kappa_agreement

    df = spark.createDataFrame(
        [(1 if p else 0, 1 if t else 0) for p, t in rows], ["p", "t"]
    )
    got = kappa_agreement(df, "p", "t").collect()[0]
    tp = sum(1 for p, t in rows if p and t)
    fp = sum(1 for p, t in rows if p and not t)
    fn = sum(1 for p, t in rows if not p and t)
    tn = sum(1 for p, t in rows if not p and not t)
    n = float(len(rows))
    po = (tp + tn) / n
    pe = ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)) / (n * n)
    assert (got.tp, got.fp, got.fn, got.tn) == (tp, fp, fn, tn)
    assert got.po == round(po, 6)
    if pe != 1.0:
        assert abs(got.kappa - (po - pe) / (1 - pe)) < 1e-6


# ---------------------------------------------------------------------------
# prefix-filter exactness: random corpora, reference Jaccard replica
# ---------------------------------------------------------------------------

_WORDS = ["alpha", "beta", "gamma", "delta", "zeta", "omega", "kappa", "tau"]


@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=6),
        min_size=2,
        max_size=10,
    ),
    tnum=st.sampled_from([1, 2, 3]),
)
@settings(**_SETTINGS)
def test_prefix_filter_matches_bruteforce_jaccard(spark, docs, tnum):
    """prefix_filter_pairs (ngram_n=1, threshold tnum/4) == brute-force
    token-set Jaccard over all pairs — the completeness lemma checked
    on randomized corpora, including all-identical and disjoint docs."""
    from parkour_spark.operators.dedup import prefix_filter_pairs

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)], ["doc_id", "text"]
    )
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in prefix_filter_pairs(
            df, threshold_num=tnum, threshold_den=4, ngram_n=1
        ).collect()
    }
    sets = [set(ws) for ws in docs]
    expect = {}
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            j = inter / union
            if j >= tnum / 4:
                expect[(a, b)] = round(j, 4)
    assert got == expect, (got, expect)


# ---------------------------------------------------------------------------
# mad_profile vs a driver-side reference
# ---------------------------------------------------------------------------


@given(
    vals=st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=40),
    k=st.sampled_from([1, 3]),
)
@settings(**_SETTINGS)
def test_mad_profile_matches_reference(spark, vals, k):
    """mad_profile == lower-median/lower-MAD reference replica."""
    from parkour_spark.operators.validate import mad_profile

    df = spark.createDataFrame([("g", v) for v in vals], ["g", "x"])
    r = mad_profile(df, "x", "g", k=k).collect()[0]

    def lower_median(xs):
        xs = sorted(xs)
        return xs[(len(xs) + 1) // 2 - 1]

    med = lower_median(vals)
    mad = lower_median([abs(v - med) for v in vals])
    n_out = sum(1 for v in vals if abs(v - med) > k * mad)
    assert (r.n, r.median, r.mad, r.n_outliers) == (len(vals), med, mad, n_out)


# ---------------------------------------------------------------------------
# token_budget_sample vs a driver-side replica
# ---------------------------------------------------------------------------


@given(
    sizes=st.lists(st.integers(min_value=1, max_value=12), min_size=1, max_size=20),
    budget=st.integers(min_value=1, max_value=60),
)
@settings(**_SETTINGS)
def test_token_budget_matches_reference(spark, sizes, budget):
    """token_budget_sample == greedy prefix of the md5 order, replayed
    driver-side with hashlib."""
    import hashlib

    from parkour_spark.operators.corpus import token_budget_sample

    rows = [("s", i, "w " * sz) for i, sz in enumerate(sizes)]
    df = spark.createDataFrame(rows, ["source", "doc_id", "text"])
    got = sorted(
        (r.doc_id, r.cum_tokens)
        for r in token_budget_sample(df, budget, seed="budget-v1").collect()
    )
    order = sorted(
        range(len(sizes)),
        key=lambda i: (hashlib.md5(f"budget-v1:{i}".encode()).hexdigest(), i),
    )
    expect, run = [], 0
    for i in order:
        run += sizes[i]
        if run > budget:
            break
        expect.append((i, run))
    assert got == sorted(expect), (got, expect)


_words = st.sampled_from(["alpha", "beta", "gamma", "delta", "kappa", "zz"])
_labels = st.sampled_from(["L0", "L1"])


@given(
    docs=st.lists(
        st.tuples(_labels, st.lists(_words, min_size=0, max_size=6)),
        min_size=2,
        max_size=15,
    ).filter(lambda d: len({l for l, _ in d}) == 2),
)
@example(docs=[("L1", []), ("L1", []), ("L0", ["alpha"])])
@settings(**_SETTINGS)
def test_nb_scores_match_pure_python_replica(spark, docs):
    """nb_train + nb_score == an independent driver-side NB replica
    (same hashed buckets, same per-cell micro-nat rounding, same
    (score desc, label asc) argmax) on randomized tiny corpora —
    including zero-token docs, which must score on the prior alone."""
    import hashlib
    import math

    from parkour_spark.operators.classify import nb_score, nb_train

    n_b = 16
    rows = [(i, lab, " ".join(toks)) for i, (lab, toks) in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "label", "text"])
    model, priors = nb_train(df, "label", text_col="text", n_buckets=n_b)
    got = {
        r.doc_id: (r.pred_label, r.score_micro)
        for r in nb_score(df, model, priors, n_buckets=n_b).collect()
    }

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % n_b

    labels = sorted({lab for _, (lab, _) in zip(range(len(docs)), docs)})
    cnt = {lab: {} for lab in labels}
    ndocs = {lab: 0 for lab in labels}
    for lab, toks in docs:
        ndocs[lab] += 1
        for t in toks:
            b = bucket(t)
            cnt[lab][b] = cnt[lab].get(b, 0) + 1
    ntok = {lab: sum(cnt[lab].values()) for lab in labels}
    total = sum(ndocs.values())
    prior = {
        lab: round(math.log(ndocs[lab] / total) * 1e6) for lab in labels
    }
    cell = {
        (lab, b): round(
            math.log((cnt[lab].get(b, 0) + 1) / (ntok[lab] + n_b)) * 1e6
        )
        for lab in labels
        for b in range(n_b)
    }
    for i, (lab, toks) in enumerate(docs):
        scores = {}
        for L in labels:
            s = prior[L]
            for t in toks:
                s += cell[(L, bucket(t))]
            scores[L] = s
        best = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert got[i] == (best[0], best[1]), (i, docs)


@given(
    lists=st.lists(
        st.lists(
            st.integers(min_value=0, max_value=30), min_size=1, max_size=12,
            unique=True,
        ),
        min_size=1,
        max_size=4,
    ),
)
@settings(**_SETTINGS)
def test_rrf_fuse_matches_reference(spark, lists):
    """rrf_fuse == the textbook RRF formula computed driver-side, with
    the (score desc, id asc) tie order, over randomized rank lists."""
    from parkour_spark.operators.similarity import rrf_fuse

    rankings = {}
    ref = {}
    for si, ids in enumerate(lists):
        rankings[f"s{si}"] = spark.createDataFrame(
            [(d, r + 1) for r, d in enumerate(ids)], ["doc_id", "rank"]
        )
        for r, d in enumerate(ids):
            ref[d] = ref.get(d, 0) + round(1e9 / (60 + r + 1))
    order = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = {
        r.doc_id: (r.rrf_nano, r.fused_rank)
        for r in rrf_fuse(rankings, topk=10).collect()
    }
    assert len(got) == len(order)
    for rank, (d, score) in enumerate(order, start=1):
        assert got[d] == (score, rank)


@given(
    xs_a=st.lists(st.floats(min_value=0.0, max_value=9.99, allow_nan=False),
                  min_size=1, max_size=40),
    xs_b=st.lists(st.floats(min_value=0.0, max_value=9.99, allow_nan=False),
                  min_size=1, max_size=40),
)
@settings(**_SETTINGS)
def test_psi_stat_matches_reference(spark, xs_a, xs_b):
    """psi_stat == the hand-rolled smoothed PSI over the same clamped
    equi-width buckets (full spine, HALF-UP micro terms)."""
    import math

    from parkour_spark.operators.validate import psi_stat

    nb, lo, hi = 5, 0.0, 10.0
    da = spark.createDataFrame([(float(x),) for x in xs_a], "x double")
    db = spark.createDataFrame([(float(x),) for x in xs_b], "x double")
    got = psi_stat(da, db, "x", lo, hi, nb).collect()[0]

    def buckets(xs):
        out = [0] * nb
        for x in xs:
            b = int(math.floor((x - lo) * nb / (hi - lo)))
            out[max(0, min(nb - 1, b))] += 1
        return out

    ca, cb = buckets(xs_a), buckets(xs_b)
    na, nbt = len(xs_a), len(xs_b)
    want = 0
    for b in range(nb):
        pa = (ca[b] + 1) / (na + nb)
        pb = (cb[b] + 1) / (nbt + nb)
        # terms are >= 0, so floor(x + 0.5) is HALF-UP == both engines
        want += math.floor((pa - pb) * math.log(pa / pb) * 1e6 + 0.5)
    assert (got["n_a"], got["n_b"], got["psi_micro"]) == (na, nbt, want)
    assert got["psi_micro"] >= 0  # PSI is a sum of non-negative terms


@given(
    rows=st.lists(
        st.tuples(st.integers(min_value=0, max_value=20), st.booleans()),
        min_size=2, max_size=40,
    ),
    k=st.integers(min_value=1, max_value=10),
)
@settings(**_SETTINGS)
def test_ndcg_matches_reference(spark, rows, k):
    """ndcg_at_k == the definition computed over the explicit sorted
    order (score desc, id asc), with integer micro gains."""
    import math

    from hypothesis import assume

    from parkour_spark.operators.validate import ndcg_at_k

    assume(any(y for _, y in rows))
    df = spark.createDataFrame(
        [(i, s, y) for i, (s, y) in enumerate(rows)], "id long, s long, y boolean"
    )
    got = ndcg_at_k(df, "s", "y", "id", k=k).collect()[0]
    order = sorted(range(len(rows)), key=lambda i: (-rows[i][0], i))
    g = lambda r: math.floor(1e6 / math.log2(r + 1) + 0.5)  # noqa: E731
    dcg = sum(
        g(r + 1) for r, i in enumerate(order) if r < k and rows[i][1]
    )
    npos = sum(1 for _, y in rows if y)
    idcg = sum(g(r) for r in range(1, min(k, npos) + 1))
    assert got["dcg_micro"] == dcg
    assert got["idcg_micro"] == idcg
    assert 0.0 <= got["ndcg"] <= 1.0


@given(
    rows=st.lists(
        st.tuples(st.integers(min_value=0, max_value=3),
                  st.integers(min_value=0, max_value=3)),
        min_size=1, max_size=60,
    ),
)
@settings(**_SETTINGS)
def test_mutual_information_matches_reference(spark, rows):
    """mutual_information == the definition over observed cells with
    per-cell HALF-UP micro-nat rounding; MI(X, X) sanity included via
    generated duplicates."""
    import math
    from collections import Counter

    from parkour_spark.operators.validate import mutual_information

    df = spark.createDataFrame(
        [(str(x), str(y)) for x, y in rows], "x string, y string"
    )
    got = mutual_information(df, "x", "y").collect()[0]
    n = len(rows)
    cxy = Counter(rows)
    cx = Counter(x for x, _ in rows)
    cy = Counter(y for _, y in rows)
    want = 0
    for (x, y), c in cxy.items():
        t = (c / n) * math.log((c * n) / (cx[x] * cy[y])) * 1e6
        # terms can be negative: HALF-AWAY-FROM-ZERO like both engines
        want += math.floor(abs(t) + 0.5) * (1 if t >= 0 else -1)
    assert (got["n"], got["n_cells"], got["mi_micro"]) == (n, len(cxy), want)


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=14),
            st.integers(min_value=0, max_value=14),
        ),
        min_size=0,
        max_size=12,
    ),
    batch_cut=st.integers(min_value=0, max_value=14),
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_cc_delta_equals_full_on_random_graphs(spark, edges, batch_cut):
    """delta(CC(A), B) == CC(A ∪ B) for RANDOM edge sets and an
    arbitrary old/new node split: edges whose endpoints are both <
    batch_cut belong to the old graph, everything else arrives as the
    batch — including batch edges that BRIDGE old components and
    batch-only nodes the old table never saw."""
    from parkour_spark.operators.graph import (
        cc_delta_update,
        connected_components,
    )

    all_nodes = sorted(
        {n for e in edges for n in e} | set(range(0, 15, 5))
    )
    nodes_df = spark.createDataFrame([(n,) for n in all_nodes], "id long")
    old_nodes = [n for n in all_nodes if n < batch_cut]
    new_nodes = [n for n in all_nodes if n >= batch_cut]
    old_edges = [e for e in edges if e[0] < batch_cut and e[1] < batch_cut]
    new_edges = [e for e in edges if e not in old_edges]

    def df_edges(es):
        return spark.createDataFrame(
            es or [], "id_a long, id_b long"
        ) if es else spark.createDataFrame([], "id_a long, id_b long")

    comps = connected_components(
        spark.createDataFrame([(n,) for n in old_nodes] or [(None,)],
                              "id long").where(F.col("id").isNotNull()),
        df_edges(old_edges),
    ).select(F.col("n").alias("id"), "component")
    got = {
        (r.n, r.component)
        for r in cc_delta_update(
            comps,
            spark.createDataFrame([(n,) for n in new_nodes] or [(None,)],
                                  "id long").where(F.col("id").isNotNull()),
            df_edges(new_edges),
        ).collect()
    }
    want = {
        (r.n, r.component)
        for r in connected_components(nodes_df, df_edges(edges)).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# r9 codec properties: pure-Python references are the codecs themselves,
# so the properties are roundtrip identities over randomized inputs —
# the complement of the fixed-golden tests in test_jpegcodec/test_gifcodec.
# ---------------------------------------------------------------------------


@given(
    data=st.binary(min_size=0, max_size=4096),
    mcs=st.integers(min_value=2, max_value=8),
)
@settings(**_SETTINGS)
def test_prop_gif_lzw_roundtrip(data, mcs):
    """LZW decode(encode(x)) == x for any byte string whose symbols fit
    the code size — across code widths, dict growth, and resets."""
    from parkour_spark.operators.gifcodec import lzw_decode, lzw_encode

    limit = 1 << mcs
    clipped = bytes(b % limit for b in data)
    assert lzw_decode(lzw_encode(clipped, mcs), mcs) == clipped


@given(
    h=st.integers(min_value=1, max_value=21),
    w=st.integers(min_value=1, max_value=21),
    n=st.integers(min_value=1, max_value=4),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(**_SETTINGS)
def test_prop_gif_frames_lossless(h, w, n, seed):
    import numpy as np

    from parkour_spark.operators.gifcodec import encode_gif, gif_frame

    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    frames = [
        rng.integers(0, 256, (h, w), dtype=np.uint8) for _ in range(n)
    ]
    g = encode_gif(frames, pal)
    for k, fr in enumerate(frames):
        assert (gif_frame(g, k) == pal[fr]).all()


@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    gray=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(**_SETTINGS)
def test_prop_jpeg_q100_near_lossless(h, w, gray, seed):
    """At q100 every quant entry is 1, so the only loss is DCT float
    rounding + chroma transform — bounded by a couple of levels for ANY
    image, including adversarial noise (the regime where the decoder's
    dequantization bug of r9 was invisible; this property pins the
    fixed behavior across arbitrary shapes incl. non-multiple-of-8)."""
    import numpy as np

    from parkour_spark.operators.jpegcodec import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=100))
    ref = img[..., None] if gray else img
    assert dec.shape == ref.shape
    err = np.abs(dec.astype(int) - ref.astype(int))
    assert err.max() <= (2 if gray else 4)
