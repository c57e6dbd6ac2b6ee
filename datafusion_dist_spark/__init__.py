"""datafusion_dist_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
``systemxlabs/datafusion-dist`` (a distributed streaming execution layer
for Apache DataFusion), re-expressed Spark-first:

- the *query surface* (scans, joins, aggregates, windows, sorts, limits,
  set ops, scalar functions) is declared through the DataFrame / SQL API
  and optimized by Catalyst (reference: DataFusion does this inside the
  library dependency, ``/root/reference/Cargo.toml:25-36``);
- the *distributed runtime* (stage cutting, task scheduling, shuffle,
  retries, heartbeats — the reference's ``dist/src/``) is Spark's
  built-in DAGScheduler; this package adds only the thin façade the
  reference's FlightSQL app provides: SQL in → streamed Arrow batches
  out, plus a queryable job registry (reference:
  ``integration-tests/app/src/main.rs:267-308``,
  ``integration-tests/app/src/table.rs:14-61``);
- beyond reference parity, first-class large-scale training-data
  pipeline operators: dedup (exact / MinHash-LSH / SimHash / n-gram
  Jaccard / embedding-cosine), similarity search, multimodal column
  plumbing, and text analysis — all designed for 100 TB-scale Spark
  execution.
"""

from datafusion_dist_spark.engine import DistEngine
from datafusion_dist_spark.session import build_session

__all__ = ["DistEngine", "build_session"]

__version__ = "0.1.0"
