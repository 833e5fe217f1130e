"""K4 — connected components (SURVEY.md §2 K4).

Semantics: undirected; component id = MIN vertex id in the component —
exact, deterministic (BASELINE.json:14 "exact ... component ids").

Algorithm: hash-min label propagation [PUB: Rastogi et al. 2013] accelerated
with pointer jumping (path halving) so convergence is O(log diameter), not
O(diameter) — the path_100 fixture finishes in ~7 supersteps instead of 100.
Each superstep:
  1. gather:  label'[v] = min(label[v], min over neighbors' labels)  (1 shuffle)
  2. jump:    label''[v] = label'[label'[v]]                          (1 shuffle)
The changed-count `_delta` rides inside the new state (superstep.py rule 2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pcd_spark.graph.edges import symmetrize, vertices_of
from pcd_spark.graph.partition import adaptive_num_parts
from pcd_spark.graph.superstep import run_supersteps
from pcd_spark.storage import CheckpointStore


def connected_components(
    edges: DataFrame,
    max_iter: int = 50,
    num_parts: int | None = None,
    store: CheckpointStore | None = None,
    checkpoint_every: int = 5,
    stats_out: dict | None = None,
) -> DataFrame:
    """Returns DataFrame(vid: long, component: long) — exact min-vid ids."""
    # persist the (possibly derived) input once: referenced by the adaptive
    # sizing count and the symmetrize below
    edges = edges.persist()
    p = num_parts or adaptive_num_parts(edges)

    sym = symmetrize(edges).repartition(p, "src").persist()
    sym.count()
    verts = vertices_of(sym).persist()

    init = verts.select(
        "vid", F.col("vid").alias("label"), F.lit(1.0).alias("_delta")
    )

    def step(state: DataFrame, _i: int) -> DataFrame:
        labels = state.select("vid", "label")
        # 1. hash-min gather over neighborhoods (D7)
        nbr_min = (
            sym.hint("shuffle_hash")
            .join(labels.withColumnRenamed("vid", "src"), "src")
            .select(F.col("dst").alias("vid"), "label")
            .repartition(p, "vid")
            .groupBy("vid")
            .agg(F.min("label").alias("nmin"))
        )
        l1 = labels.join(nbr_min.hint("shuffle_hash"), "vid", "left").select(
            "vid",
            F.col("label").alias("old"),
            F.least("label", F.coalesce("nmin", "label")).alias("label"),
        )
        # 2. pointer jump: label <- label(label)
        parent = l1.select(
            F.col("vid").alias("label"), F.col("label").alias("plabel")
        )
        l2 = l1.join(parent.hint("shuffle_hash"), "label", "left")
        newl = F.coalesce("plabel", "label")
        return l2.select(
            "vid",
            newl.alias("label"),
            (newl != F.col("old")).cast("double").alias("_delta"),
        )

    final, iters, metrics = run_supersteps(
        init, step, tol=0.5, max_iter=max_iter,
        store=store, checkpoint_every=checkpoint_every,
    )
    if stats_out is not None:
        stats_out["iterations"] = iters
        stats_out["metrics"] = metrics
    out = final.select("vid", F.col("label").alias("component"))
    sym.unpersist()
    verts.unpersist()
    edges.unpersist()
    return out
