"""K53 — overlapping communities via 3-clique percolation (CPM).

[PUB: Palla, Derényi, Farkas & Vicsek 2005, "Uncovering the overlapping
community structure of complex networks in nature and society", Nature
435:814] — the standard OVERLAPPING community model the engine's partition
methods (K5 LPA, K13 Louvain, K50 Leiden) cannot express: a vertex may
belong to several communities. For k=3, a community is a maximal set of
triangles connected through shared EDGES (adjacent = share k-1 = 2
vertices); a vertex belongs to every community whose triangles contain it.

Spark shape (every stage is an existing engine primitive):
  1. triangle enumeration — K6's oriented-wedge join (each triangle once,
     closing edges broadcast when they fit): `triangles.triangle_list`;
  2. triangle ids — xxhash64 over the sorted triple, with the K8-style
     collision AUDIT (count distinct ids == count triangles, else raise —
     at 2^64 the birthday bound needs ~5·10^9 triangles for a 50% collision,
     and the audit converts the residual risk into a loud failure);
  3. triangle adjacency — explode each triangle into its 3 canonical edges,
     self-equi-join on the edge key: cost Σ_e m_e² where m_e = triangles on
     edge e. That term is INHERENT to CPM (it is the size of the adjacency
     relation itself); on dense cliques it is the dominant cost and the
     documented scale boundary — at 10^12 edges CPM runs on filtered or
     degree-capped cohorts, the K23/K43/K52 pattern;
  4. community = K4 connected components over the triangle-id graph
     (triangles sharing an edge with nothing stay singleton communities);
  5. labels — each community labeled by its lexicographically smallest
     member triangle (min over struct(t1,t2,t3): distinct communities can
     share their minimum VERTEX when they overlap, but never a triangle,
     so the triple is the collision-free canonical label).

Exactness: nx.community.k_clique_communities(G, 3) parity (exact member
sets) in tests/test_round3_ops.py; fully SQL-expressible on a bounded
cohort (triangle CTE + recursive reachability over shared-edge adjacency),
so the k53 query row is DuckDB-hash-verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pcd_spark.graph.cc import connected_components
from pcd_spark.graph.triangles import triangle_list


def clique_percolation(
    edges: DataFrame,
    max_iter: int = 50,
    num_parts: int | None = None,
    stats_out: dict | None = None,
) -> DataFrame:
    """3-clique percolation communities — (vid: long, c_t1: long,
    c_t2: long, c_t3: long): one row per (vertex, community) MEMBERSHIP
    (overlapping — a vertex may appear in several communities), where
    (c_t1, c_t2, c_t3) is the community's smallest member triangle.
    Vertices in no triangle belong to no community and emit no row."""
    tris = triangle_list(edges)
    n_tri = tris.count()
    if stats_out is not None:
        stats_out["triangles"] = n_tri
    if n_tri == 0:
        return tris.sparkSession.createDataFrame(
            [], "vid long, c_t1 long, c_t2 long, c_t3 long"
        )
    tid = tris.select(
        "t1", "t2", "t3", F.xxhash64("t1", "t2", "t3").alias("id")
    ).persist()
    n_ids = tid.agg(F.countDistinct("id").alias("n")).first()["n"]
    if n_ids != n_tri:
        tid.unpersist()
        raise RuntimeError(
            f"clique_percolation: xxhash64 triangle-id collision "
            f"({n_tri} triangles -> {n_ids} ids); re-run with a remapped "
            "vertex domain"
        )
    te = tid.select(
        "id",
        F.explode(
            F.array(
                F.struct(F.col("t1").alias("lo"), F.col("t2").alias("hi")),
                F.struct(F.col("t1").alias("lo"), F.col("t3").alias("hi")),
                F.struct(F.col("t2").alias("lo"), F.col("t3").alias("hi")),
            )
        ).alias("e"),
    ).select(F.col("e.lo").alias("lo"), F.col("e.hi").alias("hi"), "id")
    adj = (
        te.withColumnRenamed("id", "src")
        .join(te.withColumnRenamed("id", "dst"), ["lo", "hi"])
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    comp = connected_components(adj, max_iter=max_iter, num_parts=num_parts)
    full = tid.join(
        comp.withColumnRenamed("vid", "id"), "id", "left"
    ).select(
        "t1", "t2", "t3",
        F.coalesce("component", F.col("id")).alias("component"),
    )
    label = full.groupBy("component").agg(
        F.min(F.struct("t1", "t2", "t3")).alias("m")
    )
    members = full.select(
        "component", F.explode(F.array("t1", "t2", "t3")).alias("vid")
    ).distinct()
    out = (
        members.join(label, "component")
        .select(
            "vid",
            F.col("m.t1").alias("c_t1"),
            F.col("m.t2").alias("c_t2"),
            F.col("m.t3").alias("c_t3"),
        )
        .localCheckpoint(eager=True)
    )
    if stats_out is not None:
        stats_out["communities"] = label.count()
    tid.unpersist()
    return out
