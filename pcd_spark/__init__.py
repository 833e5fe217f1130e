"""pcd_spark — a from-scratch PySpark-native link-graph analytics engine.

Capability surface defined by the reference crispq95/ParallelCommunityDetection
(checkout is a stub: /root/reference/README.md:1) as characterized by
BASELINE.json (north_rule / input_hint) and SURVEY.md. Everything here is
idiomatic PySpark: DataFrames + Arrow-vectorized pandas UDFs, no per-row
Python, no RDD API.

Layout
------
session     SparkSession factory with the engine's tuned defaults
storage     checkpoint/manifest adapter (Iceberg emulated locally as
            Parquet + JSON manifest; prod swap is config-only)
corpus      synthetic source-code corpus generator + K8 edge derivation
graph/      partitioning discipline, PageRank, connected components,
            label propagation, triangle count, CSR kernels, superstep driver
relational/ the queries()/oracle_sql() operator surface (SURVEY §2 B–H)
streaming/  Structured Streaming slice (SURVEY §2 I)
oracle/     pinned numpy LPA oracle (the reference semantics for tests)
"""

__version__ = "0.1.0"
