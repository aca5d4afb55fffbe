"""parkour_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference MapReduce library
(damballa/parkour), re-expressed Spark-first, plus the LLM-training-data
pipeline operator family (dedup, similarity search, text analysis,
multimodal columns).

Layout:
- session     — tuned SparkSession factory (conf layer analog)
- dataset     — unified read/write handles (dseq/dsink analog)
- shapes      — the 9 tuple shapes as DataFrame views
- plans       — staged pipeline / job-graph API (parkour.graph analog)
- operators   — joins, aggs, sorts, set ops, dedup, similarity
- functions   — text-analysis & vector Column expressions
- sources     — readers incl. mux union; sinks incl. dux multi-output
- streaming   — Structured Streaming surface (additive; reference is batch-only)
"""

from parkour_spark.dataset import Dataset, load_table, load_tables
from parkour_spark.session import build_session

__all__ = ["Dataset", "build_session", "load_table", "load_tables"]
__version__ = "0.1.0"
