"""K10 — k-core extraction (extension beyond the SURVEY §2 core).

The k-core is the maximal subgraph in which every vertex has degree >= k
[PUB: Seidman 1983, "Network structure and minimum degree"]. Standard
iterative peeling: repeatedly drop vertices with degree < k (recomputing
degrees on the surviving subgraph) until stable — the order of removal
does not affect the fixpoint, so synchronous supersteps compute exactly
the sequential result.

Superstep shape (reuses the K7 driver — resumable, observe-fused
convergence): state = (vid, deg) over currently-surviving vertices; each
step semi-joins the persisted symmetric edge list against the active set
on BOTH endpoints (two O(V) semi-joins into the O(E) edge blocks — the
same shuffle-hash discipline as CC) and re-aggregates degrees. The
convergence delta is "did any surviving vertex's degree change": a removal
with surviving neighbors always changes their degrees, and a removal whose
neighbors all left in the same step cannot enable further removals, so
delta == 0 is exactly the peeling fixpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pcd_spark.graph.edges import symmetrize
from pcd_spark.graph.partition import adaptive_num_parts
from pcd_spark.graph.superstep import run_supersteps
from pcd_spark.storage import CheckpointStore


def k_core(
    edges: DataFrame,
    k: int,
    max_iter: int = 100,
    num_parts: int | None = None,
    store: CheckpointStore | None = None,
    checkpoint_every: int = 10,
    stats_out: dict | None = None,
) -> DataFrame:
    """Vertices of the k-core with their within-core degree:
    (vid: long, core_deg: long). Empty result when no k-core exists."""
    if k < 1:
        raise ValueError("k must be >= 1")
    # persist the (possibly derived) input once: referenced by the
    # adaptive sizing count and the graph-normal-form build below
    edges = edges.persist()
    p = num_parts or adaptive_num_parts(edges)

    sym = symmetrize(edges).repartition(p, "src").persist()
    sym.count()

    deg0 = sym.groupBy(F.col("src").alias("vid")).agg(
        F.count("*").alias("deg")
    )
    init = deg0.select("vid", "deg", F.lit(1.0).alias("_delta"))

    def step(state: DataFrame, _i: int) -> DataFrame:
        act = state.filter(F.col("deg") >= k).select("vid")
        surviving = sym.join(
            act.withColumnRenamed("vid", "src").hint("shuffle_hash"),
            "src",
            "leftsemi",
        ).join(
            act.withColumnRenamed("vid", "dst").hint("shuffle_hash"),
            "dst",
            "leftsemi",
        )
        nd = (
            surviving.repartition(p, "src")
            .groupBy(F.col("src").alias("vid"))
            .agg(F.count("*").alias("deg"))
        )
        return nd.join(
            state.select("vid", F.col("deg").alias("_old")).hint(
                "shuffle_hash"
            ),
            "vid",
        ).select(
            "vid",
            "deg",
            (F.col("deg") != F.col("_old")).cast("double").alias("_delta"),
        )

    final, iters, metrics = run_supersteps(
        init, step, tol=0.5, max_iter=max_iter,
        store=store, checkpoint_every=checkpoint_every,
    )
    if stats_out is not None:
        stats_out["iterations"] = iters
        stats_out["metrics"] = metrics
    edges.unpersist()
    return final.filter(F.col("deg") >= k).select(
        "vid", F.col("deg").alias("core_deg")
    )
