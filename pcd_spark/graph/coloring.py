"""K30 — greedy graph coloring, deterministic Jones-Plassmann (round 2 ext.).

Jones & Plassmann 1993 ["A parallel graph coloring heuristic", SIAM J. Sci.
Comput.]: give every vertex a static random priority; a vertex colors itself
once every UNCOLORED neighbor has lower priority, choosing the smallest
color absent from its already-colored neighborhood (greedy mex). Priorities
here are `xxhash64(vid, seed)` — the engine's hash-random discipline — so
the whole run is a pure function of the graph and reproducible at any
parallelism. Rounds needed = length of the longest decreasing-priority
path, O(log n / log log n) expected on bounded-degree graphs.

Guarantees (tested): proper coloring (no monochromatic edge — invariant of
the JP schedule: two adjacent vertices are never colored in the same round
because one has the higher priority); color(v) <= deg(v) (0-based mex over
<= deg(v) neighbors); deterministic across partition counts.

Per superstep: the uncolored frontier joins the edge table twice (priority
comparison against uncolored neighbors; mex against colored neighbors) and
reduces with one hash-agg per side — the mex is a sort_array + fold
(`F.aggregate`), fully JVM-side. Frontier shrinks every round (the global
priority max among uncolored always colors), so cost tracks the surviving
subgraph like K29's MIS rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pcd_spark.graph.edges import symmetrize
from pcd_spark.graph.partition import adaptive_num_parts
from pcd_spark.graph.superstep import run_supersteps
from pcd_spark.storage import CheckpointStore


def greedy_coloring(
    edges: DataFrame,
    seed: int = 42,
    max_iter: int = 500,
    num_parts: int | None = None,
    store: CheckpointStore | None = None,
    checkpoint_every: int = 10,
    stats_out: dict | None = None,
) -> DataFrame:
    """Deterministic proper coloring: (vid: long, color: int), colors
    0-based, color(v) <= deg(v). Isolated vertices are not represented
    (graph-normal-form convention shared by the whole K suite)."""
    edges = edges.persist()
    p = num_parts or adaptive_num_parts(edges)

    sym = symmetrize(edges).repartition(p, "src").persist()
    _gtok = f"edges={sym.count()}"

    init = (
        sym.select(F.col("src").alias("vid"))
        .distinct()
        .select(
            "vid",
            F.xxhash64(F.col("vid"), F.lit(seed)).alias("prio"),
            F.lit(None).cast("int").alias("color"),
            F.lit(1.0).alias("_delta"),
        )
    )

    # smallest non-negative int absent from the (deduped, ascending) list:
    # fold left — every time the next element equals the accumulator the
    # accumulator advances by one; gaps freeze it
    def _mex(sorted_colors):
        return F.aggregate(
            sorted_colors,
            F.lit(0),
            lambda acc, c: F.when(c == acc, acc + 1).otherwise(acc),
        )

    def step(state: DataFrame, _i: int) -> DataFrame:
        unc = state.filter(F.col("color").isNull()).select("vid", "prio")
        # does v still have an uncolored neighbor with higher (prio, vid)?
        blocked = (
            sym.join(
                unc.select(F.col("vid").alias("src"), F.col("prio").alias("sp"))
                .hint("shuffle_hash"),
                "src",
            )
            .join(
                unc.select(F.col("vid").alias("dst"), F.col("prio").alias("dp"))
                .hint("shuffle_hash"),
                "dst",
            )
            .filter(
                F.struct(F.col("dp"), F.col("dst"))
                > F.struct(F.col("sp"), F.col("src"))
            )
            .select(F.col("src").alias("vid"))
            .distinct()
        )
        ready = unc.join(blocked, "vid", "left_anti").select("vid")
        # mex over the colors already fixed in v's neighborhood
        nbr_colors = (
            sym.join(
                ready.withColumnRenamed("vid", "src").hint("shuffle_hash"),
                "src",
                "leftsemi",
            )
            .join(
                state.filter(F.col("color").isNotNull())
                .select(F.col("vid").alias("dst"), "color")
                .hint("shuffle_hash"),
                "dst",
            )
            .groupBy("src")
            .agg(F.sort_array(F.collect_set("color")).alias("cs"))
        )
        newly = ready.join(
            nbr_colors.withColumnRenamed("src", "vid"), "vid", "left"
        ).select(
            "vid",
            F.coalesce(_mex(F.col("cs")), F.lit(0)).alias("nc"),
        )
        return (
            state.join(newly.hint("shuffle_hash"), "vid", "left")
            .select(
                "vid",
                "prio",
                F.coalesce(F.col("color"), F.col("nc")).alias("color"),
                (F.col("color").isNull() & F.col("nc").isNull())
                .cast("double")
                .alias("_delta"),
            )
        )

    final, iters, metrics = run_supersteps(
        init, step, tol=0.5, max_iter=max_iter,
        store=store, checkpoint_every=checkpoint_every, graph_token=_gtok,
    )
    if stats_out is not None:
        stats_out["iterations"] = iters
        stats_out["metrics"] = metrics
    edges.unpersist()
    return final.select("vid", "color")
