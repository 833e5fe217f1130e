"""K24 — k-truss decomposition by support peeling.

The k-truss [PUB: Cohen 2008, "Trusses: cohesive subgraphs for social
network analysis"; Wang & Cheng VLDB 2012 truss decomposition] is the
maximal subgraph whose every edge participates in >= k-2 triangles WITHIN
the subgraph — the standard cohesive-community primitive one step stronger
than K10's k-core (degree peeling) because it peels on triangle support.

Peeling is order-independent (same argument as k-core: dropping an edge
can only lower other edges' support, never raise it), so synchronous
rounds reach exactly the sequential fixpoint:

    repeat: support(e) = triangles containing e (on surviving edges);
            drop every edge with support < k-2
    until no edge drops.

Spark shape per round — one wedge enumeration, the K6 discipline:

- edges are oriented ONCE by (degree, vid) on the input graph; any
  subset of an acyclic orientation is still acyclic and still enumerates
  each surviving triangle exactly once, so rounds reuse the original
  orientation instead of recomputing degrees (the O(sqrt m) fan-out bound
  degrades only as far as the subgraph's own degrees, which peeling
  shrinks).
- per-edge support: wedge self-join (C7) + closing join (C1, broadcast
  under the K6 cap), then each triangle (a,b,c) explodes into its three
  oriented edge keys and a hash-agg counts per key.
- the surviving edge set is localCheckpoint'ed each round (superstep.py
  rule 1: the next round references it three times).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pcd_spark.graph.edges import canonical_undirected
from pcd_spark.graph.triangles import _BCAST_CLOSING_MAX_E, _oriented


def _edge_support(
    o: DataFrame, n_o: int, include_zeros: bool = False
) -> DataFrame:
    """Per-oriented-edge triangle support: (u, v, sup).

    include_zeros=True additionally emits sup=0 rows for edges in NO
    triangle, by unioning a weight-0 copy of the edge table into the SAME
    hash agg — strictly cheaper than the alternative (an O(E)-to-O(E)
    shuffle join of supports back onto the edge table), since the union
    adds E rows to an agg input that is already 3x the triangle count and
    map-side combined. Truss peeling doesn't need them (support < k-2
    includes 0 implicitly via the inner rejoin); K38's similarity does."""
    a = o.select(F.col("u").alias("a"), F.col("v").alias("b"))
    b = o.select(F.col("u").alias("a"), F.col("v").alias("c"))
    wedges = a.join(b, "a").filter(F.col("b") != F.col("c"))
    closing = o.select(F.col("u").alias("b"), F.col("v").alias("c"))
    closing = (
        F.broadcast(closing)
        if n_o <= _BCAST_CLOSING_MAX_E
        else closing.hint("shuffle_hash")
    )
    tris = wedges.join(closing, ["b", "c"])
    # the triangle's three edges, all present in the oriented table:
    # (a,b), (a,c) (wedge legs) and (b,c) (closing edge)
    pairs = tris.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
                F.struct(F.col("a").alias("u"), F.col("c").alias("v")),
                F.struct(F.col("b").alias("u"), F.col("c").alias("v")),
            )
        ).alias("e")
    ).select("e.u", "e.v")
    if not include_zeros:
        return pairs.groupBy("u", "v").agg(F.count("*").alias("sup"))
    weighted = pairs.select("u", "v", F.lit(1).alias("w")).unionByName(
        o.select("u", "v", F.lit(0).alias("w"))
    )
    return weighted.groupBy("u", "v").agg(
        F.sum("w").cast("long").alias("sup")
    )


def k_truss(
    edges: DataFrame,
    k: int,
    max_iter: int = 100,
    stats_out: dict | None = None,
) -> DataFrame:
    """Edges of the k-truss in canonical undirected form, with their
    within-truss support: (src, dst, sup), src < dst. Empty when no
    k-truss exists. k >= 2 (the 2-truss is the whole graph minus nothing:
    support >= 0 always holds)."""
    if k < 2:
        raise ValueError("k must be >= 2")
    e = edges.persist()
    canon = canonical_undirected(e).persist()
    canon.count()
    cur = _oriented(canon).localCheckpoint(eager=True)
    n_cur = cur.count()
    e.unpersist()

    rounds = 0
    sup = None
    converged = n_cur == 0
    for rounds in range(1, max_iter + 1):
        sup = _edge_support(cur, n_cur)
        keep = (
            cur.join(sup.hint("shuffle_hash"), ["u", "v"], "left")
            .filter(F.coalesce("sup", F.lit(0)) >= k - 2)
            .select("u", "v")
        )
        nxt = keep.localCheckpoint(eager=True)
        n_nxt = nxt.count()
        cur.unpersist()
        cur = nxt
        if n_nxt == n_cur:
            n_cur = n_nxt
            converged = True
            break
        n_cur = n_nxt
        if n_cur == 0:
            converged = True
            break
    if not converged:
        # peeling cascades can need up to O(E) rounds on adversarial chains;
        # returning here would include edges with support < k-2 with no
        # signal (ADVICE r2). Refuse instead of lying.
        cur.unpersist()
        canon.unpersist()
        raise RuntimeError(
            f"k_truss: peeling not at fixpoint after max_iter={max_iter} "
            f"rounds ({n_cur} edges still shrinking) — raise max_iter; the "
            "cascade depth can reach O(E) on chain-like graphs"
        )

    # final support over the fixpoint edge set (recomputed so the reported
    # numbers describe the OUTPUT subgraph, not the pre-peel one)
    out = (
        cur.join(_edge_support(cur, n_cur).hint("shuffle_hash"), ["u", "v"], "left")
        .select(
            F.least("u", "v").alias("src"),
            F.greatest("u", "v").alias("dst"),
            F.coalesce("sup", F.lit(0)).alias("sup"),
        )
    )
    if stats_out is not None:
        stats_out["rounds"] = rounds
        stats_out["edges"] = n_cur
        stats_out["converged"] = converged
    canon.unpersist()
    return out
