"""K18 — deterministic random-walk corpus (round 2 ext.).

DeepWalk/node2vec-style first-order walks [PUB: Perozzi et al. 2014
DeepWalk; Grover & Leskovec 2016 node2vec]: the standard way a link graph
becomes embedding-training data. Every vertex starts `walks_per_vertex`
walks of length `walk_length`; at each step the walker moves to the
neighbor minimizing

    (xxhash64(start_vid, walk, step, candidate, seed), candidate)

— a pinned hash-random rule (engine-wide no-rand() discipline,
SURVEY §4.2): walks are uniform-ish like a seeded RNG but exactly
reproducible at ANY parallelism, resumable, and auditable. Ties (hash
collisions) break to the smallest candidate vid. Dead ends (directed
vertices without out-edges) terminate the walk early.

Physical shape per step (one wide shuffle, same K7 discipline as LPA):
frontier (one row per live walk) shuffle-hash-joins the persisted
src-partitioned adjacency -> candidate rows (Σ deg(cur) over live walks),
repartitioned once on the walk key and min(struct)-aggregated
partition-locally. The walk state carries the path as a bounded
array<long> (<= walk_length+1), exploded to (start_vid, walk, step, vid)
rows at the end — paths never shuffle during the loop, only
(walk-key, cur) frontiers do.

Note the argmin here is min(struct(hash, vid)) — a SortAggregate, not the
encoded-long HashAggregate trick LPA uses: the hash is full-range so it
cannot be score-encoded. Group sizes are deg(cur), and the sort runs
inside the single wide shuffle's stage, so this is bounded by the same
wedge discipline as K6, not a scale hazard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pcd_spark.graph.edges import symmetrize, vertices_of
from pcd_spark.graph.partition import adaptive_num_parts
from pcd_spark.graph.superstep import reset_plan_stats


def random_walks(
    edges: DataFrame,
    walk_length: int = 10,
    walks_per_vertex: int = 1,
    seed: int = 7,
    directed: bool = False,
    num_parts: int | None = None,
) -> DataFrame:
    """Returns DataFrame(start_vid: long, walk: int, step: int, vid: long):
    step 0 is the start vertex; a walk shorter than walk_length hit a
    dead end. Deterministic for a given (edges, walk_length,
    walks_per_vertex, seed) at any partitioning."""
    if walk_length < 1:
        raise ValueError("walk_length must be >= 1")
    edges = edges.persist()
    p = num_parts or adaptive_num_parts(edges)

    adj = (edges.select("src", "dst") if directed else symmetrize(edges))
    adj = adj.dropDuplicates(["src", "dst"]).repartition(p, "src").persist()
    adj.count()

    # every vertex starts walks — including directed dead-end starts, which
    # contribute a length-0 walk (their own vertex), DeepWalk semantics
    verts = vertices_of(adj)
    ck = (
        verts.select(
            F.col("vid").alias("start_vid"),
            F.explode(
                F.sequence(F.lit(0), F.lit(walks_per_vertex - 1))
            ).alias("walk"),
        )
        .select(
            "start_vid",
            F.col("walk").cast("int").alias("walk"),
            F.col("start_vid").alias("cur"),
            F.array(F.col("start_vid")).alias("path"),
        )
        .localCheckpoint(eager=True)
    )
    state = reset_plan_stats(ck)

    for step in range(1, walk_length + 1):
        live = state.filter(F.col("cur").isNotNull())
        done = state.filter(F.col("cur").isNull())
        cand = adj.hint("shuffle_hash").join(
            live.select("start_vid", "walk", F.col("cur").alias("src")), "src"
        )
        h = F.xxhash64("start_vid", "walk", F.lit(step), "dst", F.lit(seed))
        best = (
            cand.select("start_vid", "walk", h.alias("h"), "dst")
            .repartition(p, "start_vid", "walk")
            .groupBy("start_vid", "walk")
            .agg(F.min(F.struct("h", F.col("dst").alias("d"))).alias("m"))
            .select("start_vid", "walk", F.col("m.d").alias("nxt"))
        )
        moved = live.join(best.hint("shuffle_hash"), ["start_vid", "walk"], "left").select(
            "start_vid",
            "walk",
            F.col("nxt").alias("cur"),
            F.when(
                F.col("nxt").isNotNull(),
                F.array_append("path", F.col("nxt")),
            )
            .otherwise(F.col("path"))
            .alias("path"),
        )
        new_ck = moved.unionByName(done).localCheckpoint(eager=True)
        ck.unpersist()  # release the PREVIOUS checkpoint's blocks
        ck = new_ck
        state = reset_plan_stats(ck)

    out = state.select(
        "start_vid",
        "walk",
        F.posexplode("path").alias("step", "vid"),
    )
    adj.unpersist()
    edges.unpersist()
    return out
