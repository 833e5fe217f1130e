"""K12 — single/multi-source shortest paths (extension beyond SURVEY §2 core).

Pregel-style parallel BFS / Bellman-Ford relaxation [PUB: Malewicz et al.
2010 "Pregel"; Bellman 1958]: state = (vid, dist), each superstep relaxes
``dist[v] = min(dist[v], min over in-neighbors u of dist[u] + w(u,v))``
until no distance improves. Non-negative weights required (min-relaxation
fixpoint = Dijkstra distances); unweighted edges get w = 1 → hop counts.

Frontier optimization: a vertex whose distance did NOT change in the last
superstep re-generates exactly the messages it already sent, which the min
has already absorbed — so only the changed frontier (the rows with
``_delta > 0``, which the K7 driver keeps in the state) joins the edge
blocks. On a long path the per-step join is O(frontier·deg), not O(E):
path_100 runs 99 supersteps but each touches ~1 vertex's out-edges.

Superstep shape: C1 frontier⋈edges gather → D1 min-by-dst → C4 left join
back into state; `_delta` = "distance improved" rides the same select
(superstep.py rule 2). Resumable via the shared K7 CheckpointStore.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pcd_spark.graph.partition import adaptive_num_parts
from pcd_spark.graph.superstep import run_supersteps
from pcd_spark.storage import CheckpointStore


def shortest_paths(
    edges: DataFrame,
    sources: Sequence[int],
    weight_col: str | None = None,
    directed: bool = False,
    max_iter: int = 200,
    num_parts: int | None = None,
    store: CheckpointStore | None = None,
    checkpoint_every: int = 10,
    stats_out: dict | None = None,
) -> DataFrame:
    """Returns DataFrame(vid: long, dist: double) — exact shortest-path
    distance from the NEAREST source, reached vertices only (unreachable
    vertices are absent, matching networkx *_path_length semantics).
    Unweighted edges count hops; `weight_col` must be non-negative.
    """
    if not sources:
        raise ValueError("at least one source vertex required")
    # persist the (possibly derived) input once: referenced by the
    # adaptive sizing count and the graph-normal-form build below
    edges = edges.persist()
    p = num_parts or adaptive_num_parts(edges)

    w = (
        F.col(weight_col).cast("double")
        if weight_col
        else F.lit(1.0)
    )
    e = edges.filter(F.col("src") != F.col("dst")).select(
        "src", "dst", w.alias("w")
    )
    if not directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
        )
    # parallel edges collapse to their cheapest copy (D1 min) — the only
    # one a shortest path can use; also makes the relax join skew-lighter.
    e = (
        e.groupBy("src", "dst")
        .agg(F.min("w").alias("w"))
        .repartition(p, "src")
        .persist()
    )
    _gtok = f"edges={e.count()}"

    verts = (
        e.select(F.col("src").alias("vid"))
        .unionByName(e.select(F.col("dst").alias("vid")))
        .distinct()
    )
    src_list = [int(s) for s in sources]
    is_src = F.col("vid").isin(src_list)
    init = verts.select(
        "vid",
        F.when(is_src, F.lit(0.0)).otherwise(F.lit(None).cast("double")).alias(
            "dist"
        ),
        # seed the frontier: sources changed "this" step, everyone else idle
        F.when(is_src, F.lit(1.0)).otherwise(F.lit(0.0)).alias("_delta"),
    )

    def step(state: DataFrame, _i: int) -> DataFrame:
        frontier = state.filter(F.col("_delta") > 0).select(
            F.col("vid").alias("src"), "dist"
        )
        relax = (
            e.hint("shuffle_hash")
            .join(frontier, "src")
            .select(F.col("dst").alias("vid"), (F.col("dist") + F.col("w")).alias("cand"))
            .repartition(p, "vid")
            .groupBy("vid")
            .agg(F.min("cand").alias("nmin"))
        )
        nd = F.least("dist", "nmin")  # least() skips nulls on either side
        return state.select("vid", "dist").join(
            relax.hint("shuffle_hash"), "vid", "left"
        ).select(
            "vid",
            nd.alias("dist"),
            F.when(nd.eqNullSafe(F.col("dist")), F.lit(0.0))
            .otherwise(F.lit(1.0))
            .alias("_delta"),
        )

    final, iters, metrics = run_supersteps(
        init, step, tol=0.5, max_iter=max_iter,
        store=store, checkpoint_every=checkpoint_every, graph_token=_gtok,
    )
    if stats_out is not None:
        stats_out["iterations"] = iters
        stats_out["metrics"] = metrics
    e.unpersist()
    edges.unpersist()
    return final.filter(F.col("dist").isNotNull()).select("vid", "dist")
