"""pagerank_spark — a from-scratch PySpark-native link-graph analytics engine.

Re-expresses the capabilities of the reference FPGA PageRank accelerator
(/root/reference, see SURVEY.md) as idiomatic PySpark: DataFrame/SQL logical
plans optimized by Catalyst, vectorized Arrow/pandas UDF kernels for the
gather-scatter hot path, and driver-side superstep iteration with
checkpoint/resume.

Layout
------
- ``session``    : SparkSession bootstrap tuned for graph workloads.
- ``sources``    : deterministic synthetic transcripts, graph generators,
                   testdata loaders.
- ``operators``  : relational building blocks (id assignment, edge
                   derivation, degrees, CSR blocks, skew salting, dedup,
                   similarity search, text analysis, multimodal plumbing).
- ``functions``  : scalar/column helper expressions (fixed-point math,
                   text metrics, vector math).
- ``algos``      : graph algorithms (PageRank damped + reference-exact
                   fixed point, connected components, label propagation,
                   triangle counting).
- ``plans``      : superstep driver, checkpoint/resume, lineage + metrics.
- ``streaming``  : Structured Streaming ingestion (events -> edges).
"""

__version__ = "0.1.0"
