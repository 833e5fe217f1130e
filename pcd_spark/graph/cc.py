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
from pcd_spark.graph.superstep import drop_views, fresh_view, run_supersteps
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

    # The whole superstep is ONE spark.sql() over temp views — single parse +
    # single analysis per iteration instead of ~12 eagerly-analyzed
    # transformations (see superstep.fresh_view; same conversion as
    # pagerank/lpa). Physical plan unchanged: (1) hash-min gather (D7) with
    # one wide REPARTITION(p, vid) shuffle and a partition-local MIN, (2)
    # pointer-jump self-join on l1 (ReuseExchange dedupes the identical l1
    # subtree either way), SHUFFLE_HASH joins, zero-extra-join convergence.
    spark = edges.sparkSession
    sym_view = fresh_view(sym, "pcd_cc_sym")
    state_view = fresh_view(init, "pcd_cc_state")

    def resume_fix(state: DataFrame) -> DataFrame:
        # Incremental ingestion (I6/I7) may have GROWN the graph since the
        # checkpoint: re-anchor on the CURRENT vertex universe. Checkpointed
        # labels are min-so-far over the OLD edge set — a valid upper bound
        # for hash-min propagation, which converges to the true component
        # minimum from ANY vertex-id upper bound — and new vertices start
        # at their own vid, exactly like a cold init. Identical state when
        # nothing changed (kill/resume identity tests stay green).
        return (
            verts.join(state.select("vid", "label"), "vid", "left")
            .select(
                "vid",
                F.coalesce("label", "vid").alias("label"),
                F.lit(1.0).alias("_delta"),
            )
        )

    def step(state: DataFrame, _i: int) -> DataFrame:
        state.createOrReplaceTempView(state_view)
        return spark.sql(f"""
            WITH l1 AS (
              SELECT /*+ SHUFFLE_HASH(nm) */ s.vid, s.label AS old,
                     LEAST(s.label, COALESCE(nm.nmin, s.label)) AS label
              FROM {state_view} s
              LEFT JOIN (
                SELECT vid, MIN(label) AS nmin
                FROM (SELECT /*+ REPARTITION({p}, vid), SHUFFLE_HASH(e) */
                             e.dst AS vid, r.label
                      FROM {sym_view} e
                      JOIN {state_view} r ON e.src = r.vid) m
                GROUP BY vid) nm
              ON s.vid = nm.vid)
            SELECT /*+ SHUFFLE_HASH(b) */ a.vid,
                   COALESCE(b.label, a.label) AS label,
                   CAST(COALESCE(b.label, a.label) <> a.old AS DOUBLE)
                     AS _delta
            FROM l1 a
            LEFT JOIN l1 b ON a.label = b.vid""")

    final, iters, metrics = run_supersteps(
        init, step, tol=0.5, max_iter=max_iter,
        store=store, checkpoint_every=checkpoint_every,
        resume_fix=resume_fix,
    )
    if stats_out is not None:
        stats_out["iterations"] = iters
        stats_out["metrics"] = metrics
    out = final.select("vid", F.col("label").alias("component"))
    drop_views(spark, sym_view, state_view)
    sym.unpersist()
    verts.unpersist()
    edges.unpersist()
    return out
