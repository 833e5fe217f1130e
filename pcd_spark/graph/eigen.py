"""K25 — eigenvector centrality by power iteration (round 2 ext.).

x_{t+1} = A x_t / ||A x_t||_2 on the symmetrized adjacency [PUB: Bonacich
1987; same iteration networkx.eigenvector_centrality runs]. Converges to
the principal eigenvector for connected non-bipartite components; the
deterministic uniform start vector makes runs reproducible. On BIPARTITE
graphs the spectrum contains -lambda_max and plain power iteration
oscillates (networkx has the same failure mode) — callers on bipartite
structures (e.g. the customer-supplier graph) should use K15 HITS, whose
A^T A iteration squares the spectrum away; this module is for the
triangle-bearing graphs where eigenvector centrality is well-posed.

Physical shape per superstep (the K15 discipline):

- ONE wide shuffle: scores join the src-partitioned persisted edge blocks,
  SUM by dst with a pinned reduce width.
- normalization costs no extra job: the L2 norm (sum of squares) rides the
  fused convergence Allreduce (run_supersteps extra_aggs) and enters the
  NEXT superstep as a literal — state carries RAW scores, divided by the
  previous step's norm each iteration, exact normalization once at the end.
- convergence is networkx's rule one step lagged: L1 delta of the
  normalized vector < n*tol.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pcd_spark.graph.edges import symmetrize, vertices_of
from pcd_spark.graph.partition import adaptive_num_parts
from pcd_spark.graph.superstep import run_supersteps
from pcd_spark.storage import CheckpointStore


def eigenvector_centrality(
    edges: DataFrame,
    tol: float = 1e-8,
    max_iter: int = 200,
    num_parts: int | None = None,
    store: CheckpointStore | None = None,
    checkpoint_every: int = 10,
    stats_out: dict | None = None,
) -> DataFrame:
    """Returns DataFrame(vid: long, centrality: double), L2-normalized to 1
    (networkx convention). Stopping rule: L1 delta of the normalized vector
    < n * tol, one step lagged (the norm is only known after the step that
    produced it)."""
    edges = edges.persist()
    p = num_parts or adaptive_num_parts(edges)
    sym = symmetrize(edges).repartition(p, "src").persist()
    _gtok = f"edges={sym.count()}"

    verts = vertices_of(sym).persist()
    n = verts.count()
    if n == 0:
        raise ValueError("eigenvector_centrality: empty edge table")

    import math

    x0 = 1.0 / math.sqrt(n)  # uniform start, already L2-normalized
    init = verts.select(
        "vid",
        F.lit(x0).alias("x_raw"),
        F.lit(x0).alias("x_prev"),
        F.lit(1.0).alias("_delta"),
    )
    extras: dict = {"ss": 1.0}

    def step(state: DataFrame, i: int) -> DataFrame:
        norm = math.sqrt(float(extras.get("ss") or 1.0)) or 1.0
        cur = state.select(
            "vid", (F.col("x_raw") / F.lit(norm)).alias("x_n"), "x_prev"
        )
        nxt = (
            sym.hint("shuffle_hash")
            .join(cur.select(F.col("vid").alias("src"), "x_n"), "src")
            .select(F.col("dst").alias("vid"), "x_n")
            .repartition(p, "vid")
            .groupBy("vid")
            .agg(F.sum("x_n").alias("x_new"))
        )
        return (
            cur.join(nxt.hint("shuffle_hash"), "vid", "left")
            .select(
                "vid",
                F.coalesce("x_new", F.lit(0.0)).alias("x_raw"),
                F.col("x_n").alias("x_prev"),
                (
                    F.lit(float(n))
                    if i == 1
                    else F.abs(F.col("x_n") - F.col("x_prev"))
                ).alias("_delta"),
            )
        )

    final, iters, metrics = run_supersteps(
        init, step, tol=n * tol, max_iter=max_iter,
        store=store, checkpoint_every=checkpoint_every, graph_token=_gtok,
        extra_aggs={"ss": F.sum(F.col("x_raw") * F.col("x_raw"))},
        extras_out=extras,
        disable_aqe=True,
    )
    if stats_out is not None:
        stats_out["iterations"] = iters
        stats_out["metrics"] = metrics

    import math as _m

    norm = _m.sqrt(float(extras.get("ss") or 1.0)) or 1.0
    out = final.select(
        "vid", (F.col("x_raw") / F.lit(norm)).alias("centrality")
    )
    verts.unpersist()
    edges.unpersist()
    return out
