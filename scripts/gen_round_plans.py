"""Per-round (pre-checkpoint) plan dumps for the iterative graph
operators (r13, VERDICT r12 #7): the entry plans cannot show the round
shape — checkpoints truncate lineage — so the committed evidence for
round-shape claims is the explain of ONE round body, taken from the
SAME helper the loop executes (_cc_round / _lpa_round /
_bigstar_round).

Usage: python scripts/gen_round_plans.py [--plans-tag r13]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from parkour_spark.operators.graph import (  # noqa: E402
    _bigstar_round,
    _cc_round,
    _lpa_round,
)
from parkour_spark.session import build_session  # noqa: E402


def _explain(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans-tag", default="r13")
    args = ap.parse_args()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plans_dir = os.path.join(here, "plans", args.plans_tag)
    os.makedirs(plans_dir, exist_ok=True)
    spark = build_session("parkour_spark_round_plans")
    # Plan shapes are input-size-invariant; a tiny in-memory graph in
    # the loop's own frame layout is enough. The labels/sym frames are
    # localCheckpoint()ed exactly as the loops see them, so the round
    # plan starts from checkpointed blocks like a real mid-loop round.
    nodes = spark.createDataFrame([(i,) for i in range(8)], "id long")
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4), (5, 6)], "id_a long, id_b long"
    )
    labels = nodes.select(
        F.col("id").alias("n"), F.col("id").alias("comp")
    ).localCheckpoint()
    sym = (
        edges.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
        .union(edges.select(F.col("id_b").alias("a"), F.col("id_a").alias("b")))
        .distinct()
        .localCheckpoint()
    )
    lpa_labels = nodes.select(
        F.col("id").alias("n"), F.col("id").alias("lbl")
    ).localCheckpoint()
    e = (
        edges.select(
            F.greatest("id_a", "id_b").alias("a"),
            F.least("id_a", "id_b").alias("b"),
        )
        .distinct()
        .localCheckpoint()
    )
    dumps = {
        "cc_round": _cc_round(labels, sym),
        "lpa_round": _lpa_round(lpa_labels, sym),
        "bigstar_round": _bigstar_round(e),
    }
    for name, df in dumps.items():
        path = os.path.join(plans_dir, f"{name}_single.txt")
        with open(path, "w") as f:
            f.write(_explain(df))
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
