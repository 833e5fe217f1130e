"""K3 — PageRank (SURVEY.md §2 K3; Brin & Page 1998).

Semantics (matches the pinned numpy oracle / networkx to allclose 1e-6,
BASELINE.json:6): damping d=0.85, uniform teleport, dangling mass spread
uniformly, init rank = 1/N, per-source weight normalization, stop when
sum(|rank_i - rank_{i-1}|) < tol.

Physical shape per superstep (measured + tuned in this sandbox):
  - transition table (per-edge prob pre-divided) built ONCE, shuffle-hash-
    partitioned on src, persisted — static across all iterations;
  - gather join uses a SHUFFLE_HASH hint: the sort in sort-merge join is
    pure waste when the big side is pre-partitioned and reused (measured
    ~2x per-superstep win at 10^7 edges);
  - ONE wide data shuffle per superstep: explicit repartition(p, dst) then
    partition-local aggregation (AQE would coalesce a plain groupBy exchange
    down to a handful of reduce tasks, capping parallelism);
  - new rank and |Δ| are computed in the SAME select by left-joining the
    contributions back onto the previous state (old rank already in hand),
    so convergence costs zero extra joins (superstep.py rule 2);
  - dangling mass: a boolean flag rides in the vertex state; the mass is
    summed in the SAME driver round-trip as the convergence delta
    (run_supersteps extra_aggs) and enters the next superstep as a literal —
    no per-superstep join, no broadcast, no extra job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pcd_spark.graph.edges import vertices_of
from pcd_spark.graph.partition import adaptive_num_parts
from pcd_spark.graph.superstep import drop_views, fresh_view, run_supersteps
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
    stats_out: dict | None = None,
    sources: list[int] | None = None,
) -> DataFrame:
    """PageRank over a directed edge table (src, dst[, weight]).

    Returns DataFrame(vid: long, rank: double), sum(rank) == 1.
    Stopping rule: L1 delta < tol; fixed-point error <= delta * d/(1-d)
    ≈ 5.7*tol, so the default 1e-8 comfortably meets the 1e-6 bar.

    K14 personalized mode (`sources=[...]`): teleport AND dangling mass
    redistribute uniformly over the source set instead of all vertices —
    networkx `pagerank(personalization=...)` semantics, where the dangling
    distribution defaults to the personalization vector. The reset weight is
    a static per-vertex state column, so the per-superstep plan is identical
    to the uniform case (same joins, same single wide shuffle); only two
    literals become column references. Vertices unreachable from the
    sources converge to rank 0.
    """
    # persist the input FIRST: callers routinely pass a derived edge table
    # (a multi-join at the query layer), and this function references it four
    # times (adaptive sizing count, vertex universe, out-weight agg, dangler
    # anti-join) — one cached materialization instead of four derivations
    edges = edges.persist()
    p = num_parts or adaptive_num_parts(edges)

    verts = vertices_of(edges).persist()
    n = verts.count()
    if n == 0:
        raise ValueError("pagerank: edge table is empty (no vertices)")

    w = F.col(weight_col) if weight_col else F.lit(1.0)
    out_s = edges.groupBy("src").agg(F.sum(w).alias("out_s"))
    trans = (
        edges.join(out_s, "src")
        .select("src", "dst", (w / F.col("out_s")).alias("p"))
        .repartition(p, "src")  # aligned with the per-superstep gather join
        .persist()
    )
    trans.count()  # materialize the static side once

    # dangling vertices: no out-edges (C6 left anti). A boolean flag rides in
    # the state; per-superstep dangling MASS is summed in the same driver
    # round-trip as the convergence delta (run_supersteps extra_aggs) and
    # enters the next step as a literal — no per-superstep join/broadcast.
    danglers = verts.join(
        edges.select(F.col("src").alias("vid")).distinct(), "vid", "left_anti"
    )
    has_danglers = danglers.count() > 0

    teleport = (1.0 - damping) / n
    personalized = sources is not None
    src_df = None
    if personalized:
        src_set = sorted({int(v) for v in sources})
        if not src_set:
            raise ValueError("pagerank: sources must be non-empty when given")
        # reset weights join once at init (broadcast: source sets are small
        # by nature — a query's seed vertices, not the graph) and then ride
        # the state as a static column; no per-superstep join
        src_df = edges.sparkSession.createDataFrame(
            [(v,) for v in src_set], "vid long"
        ).select("vid", F.lit(1.0 / len(src_set)).alias("reset"))

    def _with_static_cols(df: DataFrame) -> DataFrame:
        cols = ["vid"]
        if personalized:
            df = df.join(F.broadcast(src_df), "vid", "left")
            cols.append(F.coalesce("reset", F.lit(0.0)).alias("reset"))
        if has_danglers:
            df = df.join(
                danglers.select("vid", F.lit(True).alias("dang")), "vid", "left"
            )
            cols.append(F.coalesce("dang", F.lit(False)).alias("dang"))
        return df.select(*cols)

    static_cols = (["reset"] if personalized else []) + (
        ["dang"] if has_danglers else []
    )
    init = _with_static_cols(verts).select(
        "vid", F.lit(1.0 / n).alias("rank"), *static_cols,
        F.lit(1.0).alias("_delta"),
    )
    extras: dict = {}

    # The superstep is built as ONE spark.sql() over temp views — a single
    # parse + single analysis per iteration instead of ~10 eagerly-analyzed
    # DataFrame transformations (measured: plan-build 0.30-0.48 s → 0.06-0.10
    # s per superstep on this box; see superstep.fresh_view). The PHYSICAL
    # plan is unchanged and still the tuned shape:
    #   - ONE wide shuffle: the REPARTITION(p, dst) hint pins the reduce
    #     width, then the SUM runs partition-locally (HashPartitioning(dst)
    #     satisfies the clustering; a bare GROUP BY exchange would be
    #     AQE-coalesced to a handful of tasks);
    #   - SHUFFLE_HASH hints: the sort in sort-merge join is pure waste when
    #     the big side is pre-partitioned and reused;
    #   - old rank rides along (state is the vertex universe), so new rank
    #     and |Δ| come out of the SAME select — zero-extra-join convergence.
    spark = edges.sparkSession
    trans_view = fresh_view(trans, "pcd_pr_trans")
    state_view = fresh_view(init, "pcd_pr_state")
    statics_outer = "".join(f", `{c}`" for c in static_cols)
    statics_inner = "".join(f", s.`{c}`" for c in static_cols)
    reset_term = (
        f"{1.0 - damping!r} * s.`reset`" if personalized else f"{teleport!r}"
    )

    def step(state: DataFrame, _i: int) -> DataFrame:
        state.createOrReplaceTempView(state_view)
        if has_danglers:
            # dangling mass of the PREVIOUS state, summed by the driver in
            # the same round-trip as the convergence delta — a literal here,
            # spread uniformly (1/n) or by the reset vector (personalized)
            dmass = float(extras.get("dmass") or 0.0)
            extra = (
                f"{dmass!r} * s.`reset`" if personalized else f"{dmass / n!r}"
            )
        else:
            extra = "0.0"
        return spark.sql(f"""
            SELECT vid, nrank AS `rank`{statics_outer},
                   ABS(nrank - old) AS _delta
            FROM (
              SELECT /*+ SHUFFLE_HASH(c) */ s.vid, s.`rank` AS old
                     {statics_inner},
                     {reset_term} + {damping!r}
                       * (COALESCE(c.contrib, 0.0) + {extra}) AS nrank
              FROM {state_view} s
              LEFT JOIN (
                SELECT dst AS vid, SUM(pc) AS contrib
                FROM (SELECT /*+ REPARTITION({p}, dst), SHUFFLE_HASH(t) */
                             t.dst, t.p * r.`rank` AS pc
                      FROM {trans_view} t
                      JOIN {state_view} r ON t.src = r.vid) x
                GROUP BY dst) c
              ON s.vid = c.vid)""")

    def resume_fix(state: DataFrame) -> DataFrame:
        # Two checkpoint-compatibility cases:
        # (a) incremental ingestion (I6/I7) GREW the graph since the
        #     checkpoint: re-anchor the state on the CURRENT vertex
        #     universe, warm-starting new vertices at 1/n and re-deriving
        #     the static cols (dangler flags / reset weights change with
        #     the edge set). The PageRank update is an L1-contraction with
        #     a unique fixpoint, so a warm start converges to exactly the
        #     answer a cold start on the grown graph would reach — resuming
        #     is pure saved work, never a different result.
        # (b) a checkpoint written by a pre-'dang'/'reset' engine version
        #     lacks the static columns, or the edge set changed without new
        #     vertices (stale dangler flags).
        # One shape covers all of it: keep the checkpointed ranks, re-anchor
        # on the current universe, re-derive the static cols. One-time cost
        # at resume; identical state when nothing changed (kill/resume
        # byte-identity is pinned in tests/test_checkpoint.py).
        anchored = verts.join(state.select("vid", "rank"), "vid", "left").select(
            "vid", F.coalesce("rank", F.lit(1.0 / n)).alias("rank")
        )
        # New vertices inject 1/n mass each, but the update CONSERVES total
        # mass — an excess would decay only geometrically (rate = damping),
        # leaving a ~excess*damping^iters bias at any finite tol. Renormalize
        # once at resume so warm and cold starts share the exact fixpoint
        # trajectory; skipped when mass is already 1 so unchanged-graph
        # kill/resume stays byte-identical (tests/test_checkpoint.py).
        tot = anchored.agg(F.sum("rank")).first()[0] or 1.0
        if abs(tot - 1.0) > 1e-9:
            anchored = anchored.select(
                "vid", (F.col("rank") / F.lit(float(tot))).alias("rank")
            )
        return (
            anchored.join(_with_static_cols(verts), "vid")
            .select("vid", "rank", *static_cols, F.lit(1.0).alias("_delta"))
        )

    _secs: list[float] = []
    extra_aggs = (
        {"dmass": F.sum(F.when(F.col("dang"), F.col("rank")).otherwise(F.lit(0.0)))}
        if has_danglers
        else None
    )
    final, iters, metrics = run_supersteps(
        init, step, tol=tol, max_iter=max_iter,
        store=store, checkpoint_every=checkpoint_every, step_secs=_secs,
        extra_aggs=extra_aggs, extras_out=extras, resume_fix=resume_fix,
        disable_aqe=True,
    )
    if stats_out is not None:
        stats_out["iterations"] = iters
        stats_out["metrics"] = metrics
        stats_out["step_secs"] = _secs
    out = final.select("vid", "rank")
    drop_views(spark, trans_view, state_view)
    trans.unpersist()
    verts.unpersist()
    edges.unpersist()
    return out
