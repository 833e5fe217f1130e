"""K20 — strongly connected components (round 2 ext.).

Coloring algorithm [PUB: Orzan 2004 (distributed SCC coloring); Slota,
Rajamanickam & Madduri 2014 FW-BW-coloring hybrid]: per phase
  1. FORWARD max-propagation to fixpoint: color(v) = max vid that reaches v
     (root of color c is c itself);
  2. BACKWARD reachability from each root, restricted to its own color:
     marked vertices form root c's SCC (v is in it iff v reaches c AND c
     reaches v — the second half is exactly color(v) == c);
  3. emit every completed SCC labeled by its MIN member vid (engine-wide
     CC convention), remove those vertices, repeat on the residue.
Every phase removes at least every color-root SCC, so phases ≤ longest
root-chain in the condensation DAG — in practice a handful; each inner
fixpoint is a K7 superstep loop with the standard one-wide-shuffle step.

K4 (undirected CC) stays the fast path for symmetric graphs; this is the
directed primitive — for a code-dependency graph, SCCs ARE the cyclic
import groups, the thing you must collapse before any topological pass.

Exactness: pinned vs networkx.strongly_connected_components (pure-Python,
exact) in tests/test_graph_algos.py, including singleton SCCs for every
vertex of a DAG and whole-graph SCCs for cycles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pcd_spark.graph.edges import vertices_of
from pcd_spark.graph.partition import adaptive_num_parts
from pcd_spark.graph.superstep import drop_views, fresh_view, run_supersteps


def strongly_connected_components(
    edges: DataFrame,
    max_phases: int = 50,
    max_iter: int = 100,
    num_parts: int | None = None,
    stats_out: dict | None = None,
) -> DataFrame:
    """Returns DataFrame(vid: long, component: long) over a DIRECTED edge
    table — component = min vid of the vertex's SCC. Every vertex of the
    input appears exactly once (singletons included)."""
    edges = edges.persist()
    p = num_parts or adaptive_num_parts(edges)
    spark = edges.sparkSession

    # self-loops are SCC-irrelevant; parallel edges collapse
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .repartition(p, "src")
        .persist()
    )
    # vertex universe from the ORIGINAL edges: a vertex whose only edges are
    # self-loops still is (its own) SCC and must appear in the output — it
    # becomes a color root with no same-color in-edges in phase 1
    verts = vertices_of(edges).persist()

    done_parts: list[DataFrame] = []
    phases = 0
    for _phase in range(max_phases):
        if verts.limit(1).count() == 0:
            break
        phases += 1

        # ---- 1. forward coloring to fixpoint: color = max reaching vid ----
        # Both inner fixpoints run as ONE spark.sql() per superstep over
        # temp views (superstep.fresh_view) — single parse/analysis instead
        # of ~8 eagerly-analyzed transformations. SCC's cost on small
        # residue graphs is pure per-superstep fixed cost ×
        # (fwd + bwd iterations summed over phases), so this is the same
        # ~4× driver-time win measured for K3/K4/K5/K15/K32
        # (k33_condensation_levels: 15.9 s -> see bench — the SCC stage
        # dominated it at sf0.1 with a 1147-vertex thinned graph).
        init = verts.select(
            "vid", F.col("vid").alias("color"), F.lit(1.0).alias("_delta")
        )

        e_view = fresh_view(e, "pcd_scc_e")
        fwd_state = fresh_view(init, "pcd_scc_fwd")
        fwd_cmax = f"""
            SELECT dst AS vid, MAX(color) AS cmax
            FROM (SELECT /*+ REPARTITION({p}, dst), SHUFFLE_HASH(e) */
                         e.dst, r.color
                  FROM {e_view} e JOIN {fwd_state} r ON e.src = r.vid) m
            GROUP BY dst"""
        fwd_sql = f"""
            SELECT vid, GREATEST(color, COALESCE(cmax, color)) AS color,
                   CAST(GREATEST(color, COALESCE(cmax, color)) <> color
                        AS DOUBLE) AS _delta
            FROM (SELECT /*+ SHUFFLE_HASH(nm) */ s.vid, s.color, nm.cmax
                  FROM {fwd_state} s
                  LEFT JOIN ({fwd_cmax}) nm ON s.vid = nm.vid)"""

        def fwd_step(state: DataFrame, _i: int) -> DataFrame:
            state.createOrReplaceTempView(fwd_state)
            return spark.sql(fwd_sql)

        colored, _, _ = run_supersteps(
            init, fwd_step, tol=0.5, max_iter=max_iter, disable_aqe=True
        )
        colored = colored.select("vid", "color").persist()
        colored.count()

        # color-homogeneous reversed edges for the backward sweep
        ce = (
            e.join(colored.withColumnRenamed("vid", "src")
                   .withColumnRenamed("color", "c_src"), "src")
            .join(colored.withColumnRenamed("vid", "dst")
                  .withColumnRenamed("color", "c_dst"), "dst")
            .filter(F.col("c_src") == F.col("c_dst"))
            # reversed: marks flow dst -> src (v reaches root ⇐ v→w reaches)
            .select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            .repartition(p, "src")
            .persist()
        )

        # ---- 2. backward reachability from each color root ----
        binit = colored.select(
            "vid",
            (F.col("vid") == F.col("color")).alias("mark"),
            F.lit(1.0).alias("_delta"),
        )

        ce_view = fresh_view(ce, "pcd_scc_ce")
        bwd_state = fresh_view(binit, "pcd_scc_bwd")
        bwd_reach = f"""
            SELECT dst AS vid, TRUE AS m2
            FROM (SELECT /*+ REPARTITION({p}, dst), SHUFFLE_HASH(e) */ e.dst
                  FROM {ce_view} e
                  JOIN {bwd_state} r ON e.src = r.vid AND r.mark) m
            GROUP BY dst"""
        bwd_sql = f"""
            SELECT vid, (mark OR COALESCE(m2, FALSE)) AS mark,
                   CAST((mark OR COALESCE(m2, FALSE)) <> mark AS DOUBLE)
                     AS _delta
            FROM (SELECT /*+ SHUFFLE_HASH(nm) */ s.vid, s.mark, nm.m2
                  FROM {bwd_state} s
                  LEFT JOIN ({bwd_reach}) nm ON s.vid = nm.vid)"""

        def bwd_step(state: DataFrame, _i: int) -> DataFrame:
            state.createOrReplaceTempView(bwd_state)
            return spark.sql(bwd_sql)

        marked, _, _ = run_supersteps(
            binit, bwd_step, tol=0.5, max_iter=max_iter, disable_aqe=True
        )

        # ---- 3. emit completed SCCs (min-vid labels), shrink the residue ----
        members = (
            marked.filter(F.col("mark"))
            .select("vid")
            .join(colored, "vid")
            .persist()
        )
        comp = members.groupBy("color").agg(F.min("vid").alias("component"))
        scc = (
            members.join(comp, "color")
            .select("vid", "component")
            .localCheckpoint(eager=True)
        )
        done_parts.append(scc)

        gone = members.select("vid")
        new_verts = verts.join(gone, "vid", "left_anti").persist()
        new_e = (
            e.join(gone.withColumnRenamed("vid", "src"), "src", "left_anti")
            .join(gone.withColumnRenamed("vid", "dst"), "dst", "left_anti")
            .select("src", "dst")
            .repartition(p, "src")
            .persist()
        )
        new_verts.count()
        new_e.count()
        drop_views(spark, e_view, fwd_state, ce_view, bwd_state)
        verts.unpersist()
        e.unpersist()
        colored.unpersist()
        ce.unpersist()
        members.unpersist()
        verts, e = new_verts, new_e

    if verts.limit(1).count() > 0:
        raise RuntimeError(f"scc: residue not empty after {max_phases} phases")

    if stats_out is not None:
        stats_out["phases"] = phases

    if not done_parts:  # empty input graph
        return verts.select("vid", F.col("vid").alias("component"))
    out = done_parts[0]
    for part in done_parts[1:]:
        out = out.unionByName(part)
    verts.unpersist()
    e.unpersist()
    edges.unpersist()
    return out
