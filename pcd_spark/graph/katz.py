"""K32 — Katz centrality (SURVEY.md §2 K32; Katz 1953).

Semantics match networkx.katz_centrality exactly: iterate
x' = alpha * A^T x + beta from x = 0 until sum(|x' - x|) < n * tol, then
L2-normalize. Converges iff alpha < 1 / lambda_max(A); the caller picks
alpha (the networkx contract — no spectral estimate is hidden here, and the
max_iter guard raises on divergence instead of returning garbage).

Physical shape per superstep: identical to PageRank's tuned kernel — the
edge table is shuffle-hash-partitioned on src once and persisted; ONE wide
REPARTITION(p, dst) shuffle per step with a partition-local SUM; the whole
step is a single spark.sql() over temp views (single parse/analysis, see
superstep.fresh_view); new value and |delta| come out of the same select
(zero-extra-join convergence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pcd_spark.graph.edges import vertices_of
from pcd_spark.graph.partition import adaptive_num_parts
from pcd_spark.graph.superstep import drop_views, fresh_view, run_supersteps
from pcd_spark.storage import CheckpointStore


def katz_centrality(
    edges: DataFrame,
    alpha: float | None = 0.1,
    beta: float = 1.0,
    tol: float = 1e-6,
    max_iter: int = 1000,
    weight_col: str | None = None,
    num_parts: int | None = None,
    store: CheckpointStore | None = None,
    checkpoint_every: int = 10,
    stats_out: dict | None = None,
) -> DataFrame:
    """Returns DataFrame(vid: long, katz: double), L2-normalized.

    Directed semantics (x_v sums over IN-edges u->v); symmetrize first for
    an undirected graph, exactly as networkx does internally. Raises if the
    iteration has not met the n*tol bound within max_iter (alpha too close
    to / beyond the spectral radius) — a silently unconverged centrality is
    worse than no answer.
    """
    edges = edges.persist()
    p = num_parts or adaptive_num_parts(edges)

    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    ed = (
        edges.select("src", "dst", w.alias("w"))
        .repartition(p, "src")
        .persist()
    )
    _gtok = f"edges={ed.count()}"
    verts = vertices_of(edges).persist()
    n = verts.count()
    if n == 0:
        raise ValueError("katz_centrality: edge table is empty")

    if alpha is None:
        # auto mode: lambda_max(A) <= max in-degree (unweighted), so
        # alpha = 0.5 / (dmax + 1) always converges — one O(E) agg at
        # setup, deterministic given the data at any scale factor
        dmax = int(
            ed.groupBy("dst").agg(F.count("*").alias("d"))
            .agg(F.max("d").alias("m")).first()["m"] or 1
        )
        alpha = 0.5 / (dmax + 1)
        if stats_out is not None:
            stats_out["auto_alpha"] = alpha

    init = verts.select(
        "vid", F.lit(0.0).alias("x"), F.lit(1.0).alias("_delta")
    )

    spark = edges.sparkSession
    ed_view = fresh_view(ed, "pcd_katz_edges")
    state_view = fresh_view(init, "pcd_katz_state")
    step_sql = f"""
        SELECT vid, nx AS x, ABS(nx - old) AS _delta
        FROM (
          SELECT /*+ SHUFFLE_HASH(c) */ s.vid, s.x AS old,
                 {alpha!r} * COALESCE(c.contrib, 0.0) + {beta!r} AS nx
          FROM {state_view} s
          LEFT JOIN (
            SELECT dst AS vid, SUM(xc) AS contrib
            FROM (SELECT /*+ REPARTITION({p}, dst), SHUFFLE_HASH(e) */
                         e.dst, e.w * r.x AS xc
                  FROM {ed_view} e
                  JOIN {state_view} r ON e.src = r.vid) m
            GROUP BY dst) c
          ON s.vid = c.vid)"""

    def step(state: DataFrame, _i: int) -> DataFrame:
        state.createOrReplaceTempView(state_view)
        return spark.sql(step_sql)

    final, iters, metrics = run_supersteps(
        init, step, tol=n * tol, max_iter=max_iter,
        store=store, checkpoint_every=checkpoint_every, disable_aqe=True,
        graph_token=_gtok,
    )
    drop_views(spark, ed_view, state_view)
    if metrics and metrics[-1][1] >= n * tol:
        ed.unpersist(); verts.unpersist(); edges.unpersist()
        raise RuntimeError(
            f"katz_centrality: no convergence in {iters} supersteps "
            f"(last delta {metrics[-1][1]:.3g} >= {n * tol:.3g}); alpha="
            f"{alpha} likely >= 1/lambda_max — lower alpha or raise max_iter"
        )
    if stats_out is not None:
        stats_out["iterations"] = iters
        stats_out["metrics"] = metrics
    # L2 normalization: one scalar agg, then a stateless per-row divide
    s = final.agg(F.sum(F.col("x") * F.col("x")).alias("ss")).first()["ss"]
    norm = float(s) ** 0.5 or 1.0
    out = final.select("vid", (F.col("x") / F.lit(norm)).alias("katz"))
    ed.unpersist()
    verts.unpersist()
    edges.unpersist()
    return out
