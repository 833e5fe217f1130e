"""K15 — HITS hubs & authorities (round 2 ext.; Kleinberg 1999 JACM).

Power iteration on the directed edge table: per superstep
    auth_new[v] = Σ_{u→v} hub[u]        (gather over IN-edges)
    hub_new[u]  = Σ_{u→v} auth_new[v]   (gather over OUT-edges, NEW auth —
                                         Kleinberg's I/O order, same as
                                         networkx.hits)
converging to the principal eigenvectors of AᵀA (authorities) and AAᵀ
(hubs). Output is L1-normalized (each sums to 1, networkx
`normalized=True` semantics). Power iteration is scale-invariant, so any
per-step normalization schedule yields the same normalized fixed point —
verified against networkx.hits to allclose 1e-6 in tests/test_graph_algos.py.

Physical shape per superstep (K7 one-job discipline preserved):
  - TWO wide shuffles — inherent to HITS: the hub half-step consumes the
    SAME step's new authority scores, so messages flow dst-ward then
    src-ward within one plan (edges persisted once, partitioned on src;
    both aggs pin reduce width with explicit repartition).
  - normalization without an extra job: per-step L1 sums ride the
    convergence Allreduce (run_supersteps extra_aggs) and enter the NEXT
    superstep as literals — the state carries RAW (unnormalized) scores
    whose magnitude stays O(λ) because each step divides by the previous
    step's sum. Exact normalization happens once at the end.
  - convergence delta therefore lags one step: step i measures
    Σ|a_{i-1}/s_{i-1} - a_{i-2}/s_{i-2}| (both sums are known literals),
    costing at most one extra superstep vs an in-step check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pcd_spark.graph.edges import vertices_of
from pcd_spark.graph.partition import adaptive_num_parts
from pcd_spark.graph.superstep import drop_views, fresh_view, run_supersteps
from pcd_spark.storage import CheckpointStore


def hits(
    edges: DataFrame,
    tol: float = 1e-10,
    max_iter: int = 200,
    num_parts: int | None = None,
    store: CheckpointStore | None = None,
    checkpoint_every: int = 10,
    stats_out: dict | None = None,
) -> DataFrame:
    """HITS over a directed edge table (src, dst).

    Returns DataFrame(vid: long, authority: double, hub: double), each
    column L1-normalized to sum 1. Stopping rule: lagged L1 delta of the
    normalized authority vector < tol.
    """
    # persist the (possibly derived) input once: referenced by the
    # adaptive sizing count and the graph-normal-form build below
    edges = edges.persist()
    p = num_parts or adaptive_num_parts(edges)

    verts = vertices_of(edges).persist()
    n = verts.count()
    if n == 0:
        raise ValueError("hits: edge table is empty (no vertices)")

    e = (
        edges.select("src", "dst")
        .dropDuplicates(["src", "dst"])
        .repartition(p, "src")
        .persist()
    )
    _m = e.count()
    _gtok = f"edges={_m}"
    if _m == 0:
        raise ValueError("hits: edge table is empty")
    # second copy partitioned on dst: the hub half-step joins edges against
    # the fresh authority scores ON dst every superstep — without this the
    # O(E) edge table re-exchanges dst-ward once per superstep (measured
    # ~30% of HITS step time at sf0.1). Partition once, reuse every step —
    # the same discipline as the superstep engine's src-partitioned blocks.
    e_dst = e.repartition(p, "dst").persist()
    e_dst.count()

    # state: raw scores from the last step + the PREVIOUS normalized vectors
    # (for the lagged delta); sums arrive via extras as literals
    init = verts.select(
        "vid",
        F.lit(1.0 / n).alias("a_raw"),
        F.lit(1.0 / n).alias("h_raw"),
        F.lit(1.0 / n).alias("a_prev"),
        F.lit(1.0).alias("_delta"),
    )
    extras: dict = {"sa": 1.0, "sh": 1.0}

    # The superstep is ONE spark.sql() over temp views — single parse +
    # single analysis per iteration instead of ~15 eagerly-analyzed
    # transformations (see superstep.fresh_view; same conversion as
    # pagerank/lpa/cc). Physical plan unchanged: auth half-step shuffles
    # dst-ward (REPARTITION(p, dst), partition-local SUM), hub half-step
    # consumes the fresh authorities via the dst-partitioned edge copy
    # (zero exchanges on the join) then shuffles src-ward, and the final
    # three-way merge runs SHUFFLE_HASH with the lagged delta in the same
    # select.
    spark = edges.sparkSession
    e_view = fresh_view(e, "pcd_hits_e")
    ed_view = fresh_view(e_dst, "pcd_hits_edst")
    state_view = fresh_view(init, "pcd_hits_state")

    def step(state: DataFrame, i: int) -> DataFrame:
        sa = float(extras.get("sa") or 1.0)
        sh = float(extras.get("sh") or 1.0)
        # the lagged delta compares steps i-1 and i-2; at i=1 both are the
        # init vector (identically 0) — mask so the loop can't declare
        # convergence before any real half-step lands
        delta_expr = "1.0" if i == 1 else "ABS(c.a_n - c.a_prev)"
        state.createOrReplaceTempView(state_view)
        return spark.sql(f"""
            WITH cur AS (
              SELECT vid, a_raw / {sa!r} AS a_n, h_raw / {sh!r} AS h_n,
                     a_prev
              FROM {state_view}),
            anew AS (
              SELECT dst AS vid, SUM(h_n) AS a_new
              FROM (SELECT /*+ REPARTITION({p}, dst), SHUFFLE_HASH(e) */
                           e.dst, c.h_n
                    FROM {e_view} e JOIN cur c ON e.src = c.vid) m
              GROUP BY dst),
            hnew AS (
              SELECT src AS vid, SUM(a_new) AS h_new
              FROM (SELECT /*+ REPARTITION({p}, src), SHUFFLE_HASH(ed) */
                           ed.src, a.a_new
                    FROM {ed_view} ed JOIN anew a ON ed.dst = a.vid) m
              GROUP BY src)
            SELECT /*+ SHUFFLE_HASH(a), SHUFFLE_HASH(h) */ c.vid,
                   COALESCE(a.a_new, 0.0) AS a_raw,
                   COALESCE(h.h_new, 0.0) AS h_raw,
                   c.a_n AS a_prev,
                   {delta_expr} AS _delta
            FROM cur c
            LEFT JOIN anew a ON c.vid = a.vid
            LEFT JOIN hnew h ON c.vid = h.vid""")

    _secs: list[float] = []
    final, iters, metrics = run_supersteps(
        init, step, tol=tol, max_iter=max_iter,
        store=store, checkpoint_every=checkpoint_every, step_secs=_secs,
        graph_token=_gtok,
        extra_aggs={"sa": F.sum("a_raw"), "sh": F.sum("h_raw")},
        extras_out=extras,
        disable_aqe=True,
    )
    if stats_out is not None:
        stats_out["iterations"] = iters
        stats_out["metrics"] = metrics
        stats_out["step_secs"] = _secs

    sa = float(extras.get("sa") or 1.0)
    sh = float(extras.get("sh") or 1.0)
    out = final.select(
        "vid",
        (F.col("a_raw") / F.lit(sa)).alias("authority"),
        (F.col("h_raw") / F.lit(sh)).alias("hub"),
    )
    drop_views(spark, e_view, ed_view, state_view)
    e.unpersist()
    e_dst.unpersist()
    verts.unpersist()
    edges.unpersist()
    return out
