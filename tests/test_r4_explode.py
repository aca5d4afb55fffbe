"""Round-4 fix: the InferFiltersFromGenerate re-evaluation trap.

Plain `explode(arr)` makes the optimizer infer `size(arr) > 0` and
predicate pushdown substitutes the FULL array expression below every
upstream projection; subexpression elimination cannot reach inside
lambda functions, so the tokenize feeding a shingle `transform` is
re-evaluated once PER ARRAY ELEMENT inside that Filter (measured 20x
on the sf1 shingle corpus: 29.6s -> 1.4s). `operators.sort.explode_fast`
(explode_outer + output-attribute null guard) must (a) keep plain
explode's row semantics exactly and (b) produce a plan whose Filters
never contain the tokenize expression.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from parkour_spark.operators.dedup import _feature_sets
from parkour_spark.operators.sort import explode_fast


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_explode_fast_parity_nulls_and_empties(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, None), (3, ""), (4, "x"), (5, "a b c d e")],
        "doc_id long, text string",
    )
    ts = _feature_sets(df, "text", "doc_id", 3)
    plain = ts.select("doc_id", F.explode("toks").alias("tok"))
    fast = explode_fast(ts, "toks", "tok", keep=["doc_id"])
    assert plain.columns == fast.columns
    assert _rows(plain) == _rows(fast)


def test_explode_fast_posexplode_parity(spark):
    df = spark.createDataFrame(
        [(1, "abcdefghij" * 30), (2, None), (3, "short")],
        "doc_id long, text string",
    )
    from parkour_spark.operators.corpus import chunk_documents

    out = chunk_documents(df, size=100, stride=80)
    assert out.columns == ["doc_id", "chunk_idx", "chunk_md5"]
    rows = _rows(out)
    # doc 1: 300 chars -> ceil((300-100)/80)+1 = 4 chunks; doc 2 dropped;
    # doc 3: 1 chunk
    assert len([r for r in rows if r[0] == 1]) == 4
    assert len([r for r in rows if r[0] == 2]) == 0
    assert len([r for r in rows if r[0] == 3]) == 1


def test_no_tokenize_inside_filters(spark):
    """The executed plan of a shingle explode must not carry the
    tokenize/shingle expression inside any Filter node — that is the
    per-element re-evaluation signature."""
    df = spark.createDataFrame([(1, "a b c d e f g")], "doc_id long, text string")
    ts = _feature_sets(df, "text", "doc_id", 3)
    ex = explode_fast(ts, "toks", "tok", keep=["doc_id"])
    plan = ex._jdf.queryExecution().optimizedPlan().toString()
    for line in plan.splitlines():
        if "Filter" in line:
            assert "split(" not in line, line
            assert "transform(" not in line, line
