"""Mergeable frequency/membership sketches: count-min and bloom.

At 100 TB, exact per-key state (distinct shuffles, full key dictionaries)
is the scaling cliff; sketches replace it with FIXED-size summaries that
merge associatively, so they ride Spark's partial aggregation: each task
folds its partition into a w×d (or m-bit) table, the shuffle moves only
sketch cells, and the merged sketch answers point queries with bounded
error and zero false negatives.

Everything is engine-exact by construction: bucket = md5-based
`hash_bucket` (bit-identical in DuckDB — see functions/sampling.py), and
counts are integers, so the whole sketch — not just the final answer —
can be hash-compared against an oracle that replays the identical
arithmetic in SQL.

Reference parity: the reference's aggregation layer stops at exact
grouped reduces (parkour graph.clj combine/reduce); sketches are a
beyond-reference addition sized for the 100 TB tier.

Count-min (Cormode & Muthukrishnan 2005):
  cell(seed, bucket) = Σ count of keys with hash_seed(key) ≡ bucket.
  estimate(key) = min over seeds of its d cells — always ≥ true count.
Heavy hitters use the one-sided error: any key with true count ≥ T has
ALL its cells ≥ T, so candidate keys can be restricted to those whose
seed-0 bucket qualifies (bucket pruning, no false negatives), and the
min-over-seeds estimate then prunes most collision survivors; the exact
verify join removes the rest. The full key dictionary is never
collected anywhere — candidates flow as a semi-join.

Bloom prefilter (runtime join filter):
  The classic big-big join killer is shuffling 100 TB of fact rows of
  which <1% survive the join. A bloom filter over the dim keys is
  broadcastable even when the dim itself is NOT (m bit-positions ≪ dim
  rows), and membership tests run scan-side as k broadcast semi-joins
  against the ≤m-row bit table — the fact side sheds non-matching rows
  BEFORE its shuffle. False positives are harmless (the real join
  removes them); false negatives are impossible (every dim key set all
  its k bits).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from parkour_spark.functions.sampling import hash_bucket


def _seeded_bucket(key: Column, seed: Column | int, buckets: int) -> Column:
    """Bucket of (seed || ':' || key) — independent-enough hash per seed,
    replayable in ANSI SQL via the same md5 prefix arithmetic."""
    s = F.lit(seed) if isinstance(seed, int) else seed
    return hash_bucket(F.concat_ws(":", s.cast("string"), key.cast("string")), buckets)


def cms_build(df: DataFrame, key: str, width: int = 1024, depth: int = 3) -> DataFrame:
    """Count-min sketch of `key` frequencies: (seed, bucket, cnt) with
    seed ∈ [0,depth), bucket ∈ [0,width). ONE shuffle of at most
    width×depth×partitions partial cells (partial agg folds each
    partition first); output is width×depth rows regardless of input
    size — the fixed-size summary that makes this the 100 TB path."""
    k = F.col(key)
    seeds = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("seed")
    return (
        df.select(k.alias("__k"), seeds)
        .select("seed", _seeded_bucket(F.col("__k"), F.col("seed"), width).alias("bucket"))
        .groupBy("seed", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(cms: DataFrame, keys: DataFrame, key: str, width: int = 1024,
                 depth: int = 3) -> DataFrame:
    """Point-query the sketch for each row of `keys`: estimate =
    min over seeds of cell counts (0 if a cell is absent). The sketch
    broadcasts (≤ width×depth rows); keys never shuffle."""
    k = F.col(key)
    expanded = keys.select(
        k.alias(key),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("seed"),
    ).withColumn("bucket", _seeded_bucket(F.col(key), F.col("seed"), width))
    joined = expanded.join(F.broadcast(cms), ["seed", "bucket"], "left")
    return joined.groupBy(key).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("estimate")
    )


def cms_heavy_hitters(df: DataFrame, key: str, width: int = 1024, depth: int = 3,
                      threshold: int = 100) -> DataFrame:
    """Keys with true count ≥ threshold, found WITHOUT a full distinct:
    (1) build the sketch; (2) candidate keys = those whose seed-0 cell
    qualifies (one-sided: no true heavy hitter is lost) via a broadcast
    semi-join against the ≤width qualifying buckets; (3) sketch
    estimate = min over seeds; (4) exact verify count over the
    candidate-restricted rows only. Returns (key, estimate, n) with
    estimate ≥ n ≥ threshold."""
    cms = cms_build(df, key, width, depth).persist()
    hot0 = cms.where((F.col("seed") == 0) & (F.col("cnt") >= threshold)).select("bucket")
    cand_rows = df.withColumn(
        "__b0", _seeded_bucket(F.col(key), F.lit(0), width)
    ).join(F.broadcast(hot0), F.col("__b0") == hot0.bucket, "left_semi")
    exact = cand_rows.groupBy(key).agg(F.count("*").alias("n")).where(
        F.col("n") >= threshold
    )
    est = cms_estimate(cms, exact.select(key), key, width, depth)
    return exact.join(F.broadcast(est), key).select(key, "estimate", "n")


def mg_summaries(df: DataFrame, key: str, k: int = 256) -> DataFrame:
    """Per-partition mergeable Misra–Gries(k) summaries (Agarwal et al.
    2012, "Mergeable Summaries"): each partition folds to at most k
    (key, lower-bound count) rows plus one (NULL, n_partition) row
    carrying the partition's item count. For every key,
    true_count − lb ≤ n/(k+1), so any key with true count > n/(k+1) is
    guaranteed present in the merged summary — the deterministic
    counterpart to the CMS's probabilistic bound.

    Arrow path: each batch is reduced with vectorized value_counts, then
    merged into the running summary with the mergeable-MG rule (add
    counts; if more than k keys remain, subtract the (k+1)-th largest
    count from all and drop non-positives) — per-batch dict/numpy work,
    never per-row Python."""
    import pandas as pd

    def fold(batches):
        counters: dict[str, int] = {}
        n = 0
        for pdf in batches:
            vc = pdf["key"].value_counts()
            n += int(vc.sum())
            for key_v, cnt in vc.items():
                counters[key_v] = counters.get(key_v, 0) + int(cnt)
            if len(counters) > k:
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {
                    kk: v - cut for kk, v in counters.items() if v - cut > 0
                }
        keys = list(counters) + [None]
        cnts = list(counters.values()) + [n]
        yield pd.DataFrame({"key": keys, "cnt_lb": cnts})

    return df.select(F.col(key).cast("string").alias("key")).mapInPandas(
        fold, "key string, cnt_lb long"
    )


def mg_heavy_hitters(
    df: DataFrame, key: str, k: int = 256, threshold: int = 100
) -> DataFrame:
    """Exact heavy hitters — keys with true count ≥ threshold — without
    ever shuffling the full key dictionary:

    (1) per-partition Misra–Gries(k) summaries (mg_summaries) collapse
        each partition to ≤ k+1 rows;
    (2) the driver merges them with the same mergeable-MG rule — the
        collect is ≤ (k+1) × partitions rows, small by construction;
    (3) the merged candidate keys broadcast back as a semi-join filter,
        and an exact count over the surviving rows applies the
        threshold.

    The MG guarantee (miss ⇒ count ≤ n/(k+1)) makes step 3's output
    EXACTLY equal to `GROUP BY key HAVING count(*) ≥ threshold` when
    threshold > n/(k+1); the operator verifies that precondition from
    the summaries' own n and fails loudly instead of silently dropping
    true heavy hitters when k is undersized. Output: (key, n), exact.

    SCALE: the full-dictionary groupBy this replaces shuffles one row
    per distinct key (billions at web scale); here the only full-width
    shuffle carries candidate rows only, and candidates are ≤ k + the
    collision-free survivors of the threshold."""
    rows = mg_summaries(df, key, k).collect()
    n_total = sum(r.cnt_lb for r in rows if r.key is None)
    merged: dict[str, int] = {}
    for r in rows:
        if r.key is not None:
            merged[r.key] = merged.get(r.key, 0) + r.cnt_lb
    if len(merged) > k:
        cut = sorted(merged.values(), reverse=True)[k]
        merged = {kk: v - cut for kk, v in merged.items() if v - cut > 0}
    if threshold <= n_total // (k + 1):
        raise ValueError(
            f"mg_heavy_hitters: threshold {threshold} <= n/(k+1) = "
            f"{n_total // (k + 1)} — the MG(k={k}) guarantee cannot rule "
            f"out missed heavy hitters; raise k or threshold"
        )
    base = df.select(F.col(key).cast("string").alias(key))
    if not merged:  # nothing can reach any threshold ≥ 1
        return base.where(F.lit(False)).groupBy(key).agg(
            F.count("*").alias("n")
        )
    cand = F.array(*[F.lit(kk) for kk in sorted(merged)])
    return (
        base.where(F.array_contains(cand, F.col(key)))
        .groupBy(key)
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= threshold)
    )


def bloom_bits(df: DataFrame, key: str, m: int = 1 << 16, k: int = 3) -> DataFrame:
    """Distinct bit positions set by hashing each key k ways into
    [0, m) — the bloom filter as a ≤m-row table (broadcastable even
    when df is not). One partial-agg-safe distinct of at most m rows."""
    c = F.col(key)
    seeds = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("seed")
    return (
        df.select(c.alias("__k"), seeds)
        .select(_seeded_bucket(F.col("__k"), F.col("seed"), m).alias("pos"),
                F.col("seed"))
        .distinct()
    )


def bloom_prefilter(fact: DataFrame, bits: DataFrame, key: str,
                    m: int = 1 << 16, k: int = 3) -> DataFrame:
    """Drop fact rows that cannot join (some bloom bit unset) via k
    broadcast semi-joins — scan-side, before any fact shuffle. Output ⊇
    the true-matching rows (false positives pass; the caller's real
    join removes them)."""
    out = fact
    for seed in range(k):
        pos_s = bits.where(F.col("seed") == seed).select("pos")
        out = out.withColumn("__pos", _seeded_bucket(F.col(key), F.lit(seed), m)).join(
            F.broadcast(pos_s), F.col("__pos") == pos_s.pos, "left_semi"
        )
    return out.drop("__pos")


def _hll_bucket_rho(key: str, m: int) -> tuple[Column, Column]:
    """The engine-exact (bucket, rho) expressions shared by the global
    and grouped register builders: bucket from the first 8 md5 hex
    chars, rho from string ops on the next 16 (leading '0' hex digits
    × 4 + a per-digit CASE) — replayable bit-for-bit in ANSI SQL."""
    h = F.md5(F.col(key).cast("string"))
    bucket = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % m
    w = F.substring(h, 9, 16)  # 16 hex chars = 64 bits
    lz = F.length(F.regexp_extract(w, "^(0*)", 1))
    first = F.substr(w, lz + 1, F.lit(1))  # '' when all 16 digits are 0
    extra = (
        F.when(first == "1", 3)
        .when(first.isin("2", "3"), 2)
        .when(first.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    rho = F.when(first == "", 65).otherwise(lz * 4 + extra + 1)
    return bucket, rho


def hll_registers(df: DataFrame, key: str, p: int = 8) -> DataFrame:
    """HyperLogLog registers (Flajolet et al. 2007) over `key`: m = 2**p
    rows (bucket, rho), rho = max over the bucket's keys of
    1 + leading-zero-bits of a 64-bit md5-derived value (0 for buckets
    that saw no key). max() is associative, so the registers ride
    Spark's partial aggregation exactly like count-min cells: each task
    folds its partition into ≤m cells and only cells shuffle — the
    constant-size answer to COUNT(DISTINCT) at 100 TB, and registers
    from disjoint corpora merge by element-wise max.

    Engine-exact by construction: bucket = first 8 md5 hex chars mod m
    (hash_bucket arithmetic), and rho is computed by STRING ops on the
    next 16 hex chars (leading '0' hex digits × 4 + a per-digit CASE),
    so DuckDB replays the identical registers bit-for-bit — no reliance
    on matching any engine's builtin HLL layout (Spark's
    approx_count_distinct sketch and DuckDB's are mutually opaque)."""
    m = 1 << p
    bucket, rho = _hll_bucket_rho(key, m)
    regs = (
        df.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )
    full = df.sparkSession.range(m).select(F.col("id").alias("bucket"))
    return full.join(regs, "bucket", "left").select(
        "bucket", F.coalesce("rho", F.lit(0)).alias("rho")
    )


def hll_estimate(regs: DataFrame, p: int = 8) -> DataFrame:
    """One-row cardinality estimate from HLL registers: the harmonic
    sum is accumulated EXACTLY — each term 2**(64-rho) is an exact
    double (a power of two) cast to decimal(38,0), so the sum is
    integer-exact and addition-order-independent; only the final
    alpha·m²·2⁶⁴/S division happens in floating point, identically in
    any engine. Small-range (linear-counting) correction applied when
    raw ≤ 2.5m and empty buckets exist. Output: (m, n_zero_buckets,
    registers_fp, estimate) with registers_fp = md5 over the full
    register sequence — the whole sketch is hash-comparable, not just
    the estimate."""
    m = 1 << p
    alpha_mm = (0.7213 / (1 + 1.079 / m)) * m * m
    term = F.pow(F.lit(2.0), 64 - F.col("rho")).cast("decimal(38,0)")
    agg = regs.agg(
        F.sum(term).alias("__S"),
        F.sum(F.when(F.col("rho") == 0, 1).otherwise(0)).alias("n_zero_buckets"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("bucket", "rho"))),
                    lambda s: s["rho"].cast("string"),
                ),
                ",",
            )
        ).alias("registers_fp"),
    )
    raw = F.lit(alpha_mm) * F.pow(F.lit(2.0), 64) / F.col("__S").cast("double")
    est = F.when(
        (raw <= 2.5 * m) & (F.col("n_zero_buckets") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("n_zero_buckets")),
    ).otherwise(raw)
    return agg.select(
        F.lit(m).alias("m"),
        "n_zero_buckets",
        "registers_fp",
        F.round(est, 2).alias("estimate"),
    )


def hll_registers_by(
    df: DataFrame, group_col: str, key: str, p: int = 8
) -> DataFrame:
    """Per-group HLL registers: (grp, bucket, rho), dense — m = 2**p
    rows per observed group. The COUNT(DISTINCT key) GROUP BY grp
    killer at 100 TB is the per-group distinct shuffle (one row per
    (group, key) pair); here each task folds its partition into ≤
    groups × m cells and ONLY CELLS SHUFFLE — per-group distinct
    counts at a fixed per-group cost, and registers for the same group
    from disjoint corpora merge by element-wise max.

    Assumes group cardinality is bounded (dimension-like: event types,
    languages, sources — the cases where per-group distincts are
    asked); the dense frame is groups × m rows."""
    m = 1 << p
    bucket, rho = _hll_bucket_rho(key, m)
    regs = (
        df.select(F.col(group_col).alias("grp"), bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    groups = df.select(F.col(group_col).alias("grp")).distinct()
    full = groups.crossJoin(
        df.sparkSession.range(m).select(F.col("id").alias("bucket"))
    )
    return full.join(regs, ["grp", "bucket"], "left").select(
        "grp", "bucket", F.coalesce("rho", F.lit(0)).alias("rho")
    )


def hll_estimate_by(regs: DataFrame, p: int = 8) -> DataFrame:
    """Per-group cardinality estimates from grouped registers — the same
    exact decimal(38,0) harmonic sum, registers_fp, and small-range
    correction as hll_estimate, one output row per group."""
    m = 1 << p
    alpha_mm = (0.7213 / (1 + 1.079 / m)) * m * m
    term = F.pow(F.lit(2.0), 64 - F.col("rho")).cast("decimal(38,0)")
    agg = regs.groupBy("grp").agg(
        F.sum(term).alias("__S"),
        F.sum(F.when(F.col("rho") == 0, 1).otherwise(0)).alias("n_zero_buckets"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("bucket", "rho"))),
                    lambda s: s["rho"].cast("string"),
                ),
                ",",
            )
        ).alias("registers_fp"),
    )
    raw = F.lit(alpha_mm) * F.pow(F.lit(2.0), 64) / F.col("__S").cast("double")
    est = F.when(
        (raw <= 2.5 * m) & (F.col("n_zero_buckets") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("n_zero_buckets")),
    ).otherwise(raw)
    return agg.select(
        "grp",
        F.lit(m).alias("m"),
        "n_zero_buckets",
        "registers_fp",
        F.round(est, 2).alias("estimate"),
    )


def hll_merge(regs_a: DataFrame, regs_b: DataFrame) -> DataFrame:
    """Union sketch: element-wise register max — the merge property
    that makes HLL composable (shards, corpora, snapshots). Both
    inputs must be dense same-m register frames (hll_registers)."""
    a = regs_a.select("bucket", F.col("rho").alias("__ra"))
    b = regs_b.select("bucket", F.col("rho").alias("__rb"))
    return a.join(b, "bucket").select(
        "bucket", F.greatest("__ra", "__rb").alias("rho")
    )


def hll_intersect_estimate(
    df_a: DataFrame, df_b: DataFrame, key: str, p: int = 8
) -> DataFrame:
    """Sketch set algebra — audience overlap WITHOUT a distinct-join:
    |A∩B| ≈ est(A) + est(B) − est(A∪B), the inclusion–exclusion
    estimator over mergeable HLL sketches (union = element-wise max,
    exact on sketches; the subtraction is where the approximation
    compounds — error grows with |A∪B|/|A∩B|, the standard IE-on-HLL
    caveat, so small overlaps of huge sets need bigger m or a theta
    sketch). Each side costs one scan into m = 2**p register cells;
    nothing keyed ever shuffles or joins — the COUNT(DISTINCT a JOIN b)
    at 100 TB becomes three constant-size estimates.

    One row: est_a, est_b, est_union, est_intersect (round 2)."""
    ra = hll_registers(df_a, key, p)
    rb = hll_registers(df_b, key, p)
    ea = hll_estimate(ra, p).select(F.col("estimate").alias("est_a"))
    eb = hll_estimate(rb, p).select(F.col("estimate").alias("est_b"))
    eu = hll_estimate(hll_merge(ra, rb), p).select(
        F.col("estimate").alias("est_union")
    )
    return (
        ea.crossJoin(eb)
        .crossJoin(eu)
        .select(
            "est_a",
            "est_b",
            "est_union",
            F.round(
                F.col("est_a") + F.col("est_b") - F.col("est_union"), 2
            ).alias("est_intersect"),
        )
    )
