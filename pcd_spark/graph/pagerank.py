"""K3 — PageRank (SURVEY.md §2 K3; Brin & Page 1998).

Semantics (matches ``networkx.pagerank`` to allclose 1e-6, BASELINE.json:6):
  damping d=0.85, uniform teleport, dangling mass redistributed uniformly,
  init rank = 1/N, edge weights normalized per source, convergence when
  sum(|rank_i - rank_{i-1}|) < tol.

Physical shape per superstep (SURVEY §3.3 / §4.3):
  - transition table (edges ⋈ out-degree, prob pre-divided) built ONCE,
    hash-partitioned on src, persisted — static across all iterations;
  - ranks join it on src, contributions aggregated by dst (ONE data shuffle;
    map-side partial sums absorb hub fan-in);
  - dangling-mass subtree is built only if dangling vertices exist (checked
    once up front), as a 1-row broadcast cross-join — stays lazy;
  - state lineage truncated every superstep by the driver (superstep.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pcd_spark.graph.edges import vertices_of
from pcd_spark.graph.partition import default_num_parts, part_expr
from pcd_spark.graph.superstep import run_supersteps
from pcd_spark.storage import CheckpointStore


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    tol: float = 1e-8,
    max_iter: int = 200,
    weight_col: str | None = None,
    num_parts: int | None = None,
    store: CheckpointStore | None = None,
    checkpoint_every: int = 10,
) -> DataFrame:
    """PageRank over a directed edge table (src, dst[, weight]).

    Returns DataFrame(vid: long, rank: double), sum(rank) == 1.
    Stopping rule: L1 delta < tol; the fixed-point error is bounded by
    delta * d/(1-d) ≈ 5.7*tol, so the default 1e-8 comfortably meets the
    1e-6 allclose bar.
    """
    p = num_parts or default_num_parts(edges)

    verts = vertices_of(edges).persist()
    n = verts.count()
    if n == 0:
        raise ValueError("pagerank: edge table is empty (no vertices)")

    w = F.col(weight_col) if weight_col else F.lit(1.0)
    out_s = edges.groupBy("src").agg(F.sum(w).alias("out_s"))
    trans = (
        edges.join(out_s, "src")
        .select("src", "dst", (w / F.col("out_s")).alias("p"))
        .withColumn("part", part_expr("src", p))
        .repartition(p, "part")
        .persist()
    )
    trans.count()  # materialize the static side once

    # dangling vertices: no out-edges (C6 left anti); subtree built only if any
    danglers = verts.join(
        edges.select(F.col("src").alias("vid")).distinct(), "vid", "left_anti"
    ).persist()
    has_danglers = danglers.count() > 0

    teleport = (1.0 - damping) / n
    init = verts.select("vid", F.lit(1.0 / n).alias("rank"))

    def step(state: DataFrame, _i: int) -> DataFrame:
        ranks = state.select("vid", "rank")
        contribs = (
            trans.join(ranks.withColumnRenamed("vid", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("p") * F.col("rank")).alias("contrib"))
            .withColumnRenamed("dst", "vid")
        )
        base = verts.join(contribs, "vid", "left")
        if has_danglers:
            dm = (
                ranks.join(danglers, "vid", "left_semi")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dmass"))
            )
            base = base.crossJoin(F.broadcast(dm))
            extra = F.col("dmass") / n
        else:
            extra = F.lit(0.0)
        return base.select(
            "vid",
            (
                F.lit(teleport)
                + F.lit(damping) * (F.coalesce("contrib", F.lit(0.0)) + extra)
            ).alias("rank"),
        )

    def delta_fn(new: DataFrame, old: DataFrame) -> DataFrame:
        return new.join(old.select("vid", F.col("rank").alias("o")), "vid").agg(
            F.sum(F.abs(F.col("rank") - F.col("o"))).alias("delta")
        )

    final, _iters, _metrics = run_supersteps(
        init, step, delta_fn, tol=tol, max_iter=max_iter,
        store=store, checkpoint_every=checkpoint_every,
    )
    out = final.select("vid", "rank")
    trans.unpersist()
    danglers.unpersist()
    verts.unpersist()
    return out
