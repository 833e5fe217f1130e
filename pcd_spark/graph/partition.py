"""Partitioning discipline (SURVEY.md §2 H4/K1/K2 preamble, §4.2).

One rule for the whole engine: every graph DataFrame carries an explicit,
deterministic hash-partition id ``part = pmod(xxhash64(key), P)`` and is
``repartition(P, "part")``-ed on it. Edges are partitioned by ``src`` once
and persisted; per-superstep vertex state is re-imposed onto the same
partitioner after every aggregation, so the edge side of the superstep join
never re-shuffles (BASELINE.json:6 "explicitly hash/range-partitioned").

No ``rand()`` anywhere — salt and partition ids derive from xxhash64 so every
run is reproducible at any parallelism (SURVEY §4.2 "deterministic everything").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def default_num_parts(df: DataFrame) -> int:
    return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))


#: shuffle-partition sizing target for adaptive_num_parts — a superstep's
#: per-partition work should dominate its ~10ms task-scheduling overhead
_TARGET_EDGES_PER_PART = 50_000


def adaptive_num_parts(edges: DataFrame, floor: int = 4) -> int:
    """Size superstep parallelism to the graph: one COUNT of the edge table,
    then clamp(edges/50k, floor, spark.sql.shuffle.partitions).

    Why: the iterative engines pin their reduce width explicitly (AQE is
    disabled inside supersteps by design — superstep.py), so a 10k-edge
    DERIVED graph otherwise inherits the session's full width and pays
    32 partitions × 3 shuffles × N supersteps of pure task overhead
    (measured 9.5 s → 3.8 s on the x10 dedup-cluster graph by right-sizing).
    This is the K7 default when no num_parts is given; the cap is the
    session's shuffle width, so at 100 TB (where shuffle.partitions is
    sized to the cluster) behavior is unchanged — the count's one extra
    pass over the edge derivation is amortized over every superstep.
    """
    m = edges.count()
    p_max = default_num_parts(edges)
    return max(floor, min(p_max, int(m // _TARGET_EDGES_PER_PART) + 1))


def part_expr(col: str, num_parts: int):
    """Deterministic partition id for a long key column."""
    return F.pmod(F.xxhash64(F.col(col)), F.lit(num_parts)).cast("int")


def partition_edges(
    edges: DataFrame,
    num_parts: int | None = None,
    key: str = "src",
) -> DataFrame:
    """Attach ``part`` and co-locate rows by it.

    ``repartition(num_parts, "part")`` hash-shuffles on the *part column
    value*, so all rows of one logical block land in one task — the Spark
    equivalent of an MPI rank's CSR block (SURVEY §3.3).
    """
    p = num_parts or default_num_parts(edges)
    return edges.withColumn("part", part_expr(key, p)).repartition(p, "part")


def partition_state(
    state: DataFrame,
    num_parts: int,
    key: str = "vid",
) -> DataFrame:
    """Re-impose the shared partitioner on vertex state after an agg."""
    return state.withColumn("part", part_expr(key, num_parts)).repartition(
        num_parts, "part"
    )


def degrees(edges: DataFrame, directed: bool = False) -> DataFrame:
    """K1: per-vertex degree. For directed graphs returns in/out/total.

    One shuffle per direction; map-side partial aggregation is automatic
    (hash-agg partials), so hubs don't funnel raw edges to one reducer here.
    """
    out_d = edges.groupBy(F.col("src").alias("vid")).agg(
        F.count("*").alias("out_deg")
    )
    in_d = edges.groupBy(F.col("dst").alias("vid")).agg(
        F.count("*").alias("in_deg")
    )
    d = (
        out_d.join(in_d, "vid", "full_outer")
        .select(
            "vid",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
        )
        .withColumn("deg", F.col("out_deg") + F.col("in_deg"))
    )
    if directed:
        return d
    # undirected canonical edges: total degree = out + in
    return d.select("vid", "deg")
