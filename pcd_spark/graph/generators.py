"""Deterministic distributed graph generators for benchmarks.

networkx BA generation is driver-side and sequential — fine for correctness
fixtures (1k vertices), hopeless for throughput benchmarks (10^7+ edges).
``powerlaw_edges`` generates a Chung-Lu-flavored skewed multigraph entirely
in Spark expressions: endpoint = floor(n * u^alpha) with u derived from
xxhash64 of the edge id — deterministic at any parallelism, no rand(),
power-law-ish degree marginals (alpha > 1 concentrates mass on low vids →
hub vertices, the skew case the engine must survive).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TWO63 = float(2**63)


def _uniform(col):
    """xxhash64 -> (0, 1) uniform, deterministic."""
    return (F.xxhash64(col) / F.lit(TWO63) + 1.0) / 2.0


def powerlaw_edges(
    spark: SparkSession,
    n_vertices: int,
    n_edges: int,
    alpha: float = 2.5,
    seed: int = 42,
    num_parts: int | None = None,
) -> DataFrame:
    """Skewed random edge table (src, dst), self-loops removed."""
    p = num_parts or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ids = spark.range(0, n_edges, 1, p)
    u1 = _uniform(F.concat(F.lit(f"s{seed}a"), F.col("id")))
    u2 = _uniform(F.concat(F.lit(f"s{seed}b"), F.col("id")))
    src = F.floor(F.lit(n_vertices) * F.pow(u1, F.lit(alpha))).cast("long")
    dst = F.floor(F.lit(n_vertices) * F.pow(u2, F.lit(alpha))).cast("long")
    return (
        ids.select(src.alias("src"), dst.alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )
