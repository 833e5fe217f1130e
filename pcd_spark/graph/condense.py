"""K33 — SCC condensation DAG + topological (longest-path) levels.

The condensation of a directed graph contracts every strongly connected
component (K20) to one super-vertex; the result is a DAG [PUB: standard —
e.g. Cormen et al., Introduction to Algorithms §22.5]. On a code-dependency
graph the condensation is the build/evaluation order: each cyclic import
group becomes one node, and its topological LEVEL — the longest path from
any source component — is the earliest parallel build wave that can compile
it. Level is the canonical deterministic topological statistic (a plain
topological ORDER is not unique, so it can't be oracle-compared).

Spark shape:
- condensation edges: two hash joins of the O(E) edge table against the
  O(V) component assignment (shuffle_hash — the component table is too big
  to broadcast at 10^12 scale but tiny next to edges), then DISTINCT on
  (csrc, cdst). Everything downstream runs on the condensation, which is
  strictly smaller than the input graph — often by orders of magnitude.
- levels: max-plus fixpoint level(c) = 1 + max over in-edges of level(pred)
  (sources stay 0), run as a K7 superstep program — one wide shuffle per
  step, convergence delta fused into the checkpoint job. The fixpoint is
  reached after exactly longest-path-length steps; hitting max_iter with a
  nonzero delta means either a deeper DAG than the budget or a cycle (an
  SCC bug upstream), so it RAISES rather than returning a partial layering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pcd_spark.graph.partition import adaptive_num_parts
from pcd_spark.graph.scc import strongly_connected_components
from pcd_spark.graph.superstep import drop_views, fresh_view, run_supersteps


def condensation(
    edges: DataFrame,
    components: DataFrame | None = None,
) -> DataFrame:
    """Distinct inter-component edges (csrc: long, cdst: long) of the SCC
    condensation. `components` (vid, component) is computed via K20 when
    not supplied."""
    comp = components if components is not None else (
        strongly_connected_components(edges)
    )
    comp = comp.select("vid", "component")
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    ce = (
        e.join(
            comp.select(
                F.col("vid").alias("src"), F.col("component").alias("csrc")
            ).hint("shuffle_hash"),
            "src",
        )
        .join(
            comp.select(
                F.col("vid").alias("dst"), F.col("component").alias("cdst")
            ).hint("shuffle_hash"),
            "dst",
        )
        .select("csrc", "cdst")
        .filter(F.col("csrc") != F.col("cdst"))
        .distinct()
    )
    return ce


def topological_levels(
    edges: DataFrame,
    components: DataFrame | None = None,
    max_iter: int = 200,
    num_parts: int | None = None,
    stats_out: dict | None = None,
) -> DataFrame:
    """Per-vertex condensation layering: (vid: long, component: long,
    level: int) where level = longest path (in condensation edges) from any
    source component to the vertex's component. Sources are level 0; every
    vertex of the input appears exactly once."""
    edges = edges.persist()
    comp = (
        components if components is not None
        else strongly_connected_components(edges)
    ).persist()
    comp.count()

    ce = condensation(edges, components=comp).persist()
    p = num_parts or adaptive_num_parts(ce)
    ce = ce.repartition(p, "csrc").persist()
    ce.count()

    init = (
        comp.select("component")
        .distinct()
        .withColumn("level", F.lit(0))
        .withColumn("_delta", F.lit(1.0))
    )

    # one spark.sql() per superstep (superstep.fresh_view discipline — the
    # same ~4x fixed-cost cut as K3/K4/K5/K15/K32/K20; the condensation is
    # tiny so this loop is pure per-superstep driver cost)
    spark = edges.sparkSession
    ce_view = fresh_view(ce, "pcd_lvl_ce")
    state_view = fresh_view(init, "pcd_lvl_state")
    cand_sql = f"""
        SELECT e.cdst AS component, MAX(s.level) + 1 AS _cand
        FROM {ce_view} e JOIN {state_view} s ON s.component = e.csrc
        GROUP BY e.cdst"""
    step_sql = f"""
        SELECT component, GREATEST(level, COALESCE(_cand, 0)) AS level,
               CAST(COALESCE(_cand, 0) > level AS DOUBLE) AS _delta
        FROM (SELECT /*+ SHUFFLE_HASH(c) */ s.component, s.level, c._cand
              FROM {state_view} s
              LEFT JOIN ({cand_sql}) c ON s.component = c.component)"""

    def step(state: DataFrame, _i: int) -> DataFrame:
        state.createOrReplaceTempView(state_view)
        return spark.sql(step_sql)

    final, iters, metrics = run_supersteps(
        init, step, tol=0.5, max_iter=max_iter
    )
    drop_views(spark, ce_view, state_view)
    if metrics and metrics[-1][1] >= 0.5 and iters >= max_iter:
        raise RuntimeError(
            f"topological_levels: no fixpoint after {max_iter} supersteps "
            f"(last delta {metrics[-1][1]}); the condensation is deeper than "
            "the budget or contains a cycle (upstream SCC bug)"
        )
    if stats_out is not None:
        stats_out["iterations"] = iters
        stats_out["metrics"] = metrics

    out = comp.join(
        final.select("component", "level").hint("shuffle_hash"), "component"
    ).select("vid", "component", F.col("level").cast("int").alias("level"))
    out = out.localCheckpoint(eager=True)
    for df in (ce, comp, edges):
        df.unpersist()
    return out
