"""K23 — betweenness centrality via Brandes' algorithm, sampled sources.

Brandes 2001 ["A faster algorithm for betweenness centrality", J. Math.
Sociol.]: bc(v) = Σ_{s≠v≠t} σ_st(v)/σ_st, computed per source s as a
forward BFS that counts shortest paths (σ) plus a backward sweep that
accumulates pair dependencies δ_s(v) = Σ_{w: succ} σ_v/σ_w · (1 + δ_s(w)).
Exact betweenness needs every vertex as a source — O(V·E), hopeless at
10^12 — so the production form is source SAMPLING [PUB: Brandes & Pich
2007 "Centrality estimation in large networks"]: run S sources, scale by
V/S. This module computes the EXACT partial sums for a given source set
(so the oracle can pin it exactly); the estimator scaling is the caller's
one multiplication.

Spark shape — both phases are K7 superstep programs over state keyed by
(s, vid), i.e. all S sources advance in the same wide joins:

- forward: level-synchronous BFS; level-t σ values are final after step t
  (all shortest paths enter from level t-1), so σ needs no fixpoint —
  newly-settled frontier ⋈ src-partitioned edges → SUM σ by (s, dst) →
  left-join into state. Work per step = O(S · frontier-out-degree);
  Σ over steps = O(S·E). Frontier-only messaging is the same optimization
  as K12 (sssp.py).
- backward: levels strictly descend, so step i processes contributions
  FROM dist == L_max-i+1 INTO dist == L_max-i: movers ⋈ dst-keyed edges →
  SUM (1+δ_w)/σ_w by (s, v) → δ_v = σ_v · sum. Each edge participates in
  exactly one step per source ⇒ Σ over steps = O(S·E). Runs exactly L_max
  steps (tol = -1; no early exit — lower levels always remain).

Per-vertex output: bc(v) = Σ_{s ∈ sources, s ≠ v} δ_s(v). For undirected
graphs each unordered pair is counted from both ends when both endpoints
are sampled; with sources = ALL vertices this equals exactly 2× the
textbook (networkx) betweenness — pinned in tests.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pcd_spark.graph.partition import adaptive_num_parts
from pcd_spark.graph.superstep import run_supersteps


def betweenness_centrality(
    edges: DataFrame,
    sources: Sequence[int] | None = None,
    n_samples: int | None = None,
    directed: bool = False,
    max_iter: int = 200,
    num_parts: int | None = None,
    sample_salt: int = 0xBC,
    stats_out: dict | None = None,
    exact_vertex_limit: int = 20_000,
    mode: str = "vertex",
) -> DataFrame:
    """Returns DataFrame(vid: long, betweenness: double) — exact Brandes
    pair-dependency sums over the given `sources` (every vertex with an
    edge when sources is None and n_samples is None).

    mode="edge" (K43) returns DataFrame(u, v, betweenness) instead: the
    per-EDGE dependency sums (Brandes 2008 edge variant) over the same
    sources — the scores Girvan-Newman community detection peels and the
    weak-tie signal of link analysis. Same two BFS phases; the edge scores
    fall out of the final state with two extra equi joins (see below).

    n_samples: deterministic hash-sample of that many sources
    (xxhash64-ordered — no rand(), reproducible at any parallelism).
    To estimate full betweenness from a sample, multiply by V/S
    (Brandes-Pich); this function returns the raw sums so tests can pin
    them exactly.

    Guard rails (each raises rather than returning silently wrong/
    driver-killing results):
    - exact mode (no sources, no n_samples) is O(V·E) AND collects every
      vertex id to the driver — refused above `exact_vertex_limit`
      vertices with a pointer to n_samples.
    - explicit `sources` absent from the graph would contribute zero while
      still inflating a caller's Brandes-Pich V/S scaling — refused.
    - a forward BFS that hits max_iter before the frontier empties means
      sigma/dist are INCOMPLETE and the backward sweep would return
      silently corrupted sums (not an approximation) — refused, and
      stats_out['converged'] records the check.
    """
    if mode not in ("vertex", "edge"):
        raise ValueError(f"betweenness: unknown mode {mode!r}")
    edges = edges.persist()
    p = num_parts or adaptive_num_parts(edges)

    e = edges.filter(F.col("src") != F.col("dst")).select("src", "dst")
    if not directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    e = e.distinct().repartition(p, "src").persist()
    e.count()
    # backward phase joins ON dst every step — partition once, reuse
    # (the HITS e_dst discipline)
    e_dst = e.repartition(p, "dst").persist()

    # BOTH endpoints: a directed sink has no out-edges but is still a BFS
    # target whose settling feeds the backward dependencies
    verts = (
        e.select(F.col("src").alias("vid"))
        .unionByName(e.select(F.col("dst").alias("vid")))
        .distinct()
    )
    if sources is not None:
        src_list = sorted(int(s) for s in sources)
        present = {
            r["vid"]
            for r in verts.join(
                F.broadcast(
                    e.sparkSession.createDataFrame(
                        [(s,) for s in src_list], "vid long"
                    )
                ),
                "vid",
                "leftsemi",
            ).collect()
        }
        missing = [s for s in src_list if s not in present]
        if missing:
            e.unpersist()
            e_dst.unpersist()
            edges.unpersist()
            raise ValueError(
                f"betweenness: sources not in the graph: {missing[:10]}"
                f"{'...' if len(missing) > 10 else ''} — a missing source "
                "contributes zero dependency while still counting toward a "
                "Brandes-Pich V/S estimator; pass only existing vertices"
            )
    elif n_samples is not None:
        src_list = [
            r["vid"]
            for r in verts.orderBy(
                F.xxhash64("vid", F.lit(sample_salt)), "vid"
            )
            .limit(n_samples)
            .collect()
        ]
    else:
        n_verts = verts.count()
        if n_verts > exact_vertex_limit:
            e.unpersist()
            e_dst.unpersist()
            edges.unpersist()
            raise ValueError(
                f"betweenness: exact mode on {n_verts} vertices would run "
                f"O(V·E) supersteps AND collect {n_verts} vertex ids to the "
                "driver — pass n_samples=<S> (Brandes-Pich sampling, scale "
                "the result by V/S) or raise exact_vertex_limit explicitly"
            )
        src_list = [r["vid"] for r in verts.collect()]
    if not src_list:
        raise ValueError("betweenness: no source vertices")

    srcs = e.sparkSession.createDataFrame(
        [(int(s),) for s in src_list], "s long"
    )
    # state: one row per (source, vertex); dist/sigma null until settled
    init = verts.crossJoin(F.broadcast(srcs)).select(
        "s",
        "vid",
        F.when(F.col("vid") == F.col("s"), F.lit(0)).alias("dist"),
        F.when(F.col("vid") == F.col("s"), F.lit(1.0)).alias("sigma"),
        F.when(F.col("vid") == F.col("s"), F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("_delta"),
    )

    def fwd(state: DataFrame, i: int) -> DataFrame:
        frontier = state.filter(F.col("_delta") > 0).select(
            "s", F.col("vid").alias("src"), "sigma"
        )
        msgs = (
            e.hint("shuffle_hash")
            .join(frontier, "src")
            .select("s", F.col("dst").alias("vid"), "sigma")
            .repartition(p, "vid")
            .groupBy("s", "vid")
            .agg(F.sum("sigma").alias("msig"))
        )
        settled = F.col("dist").isNotNull()
        return state.select("s", "vid", "dist", "sigma").join(
            msgs.hint("shuffle_hash"), ["s", "vid"], "left"
        ).select(
            "s",
            "vid",
            F.when(settled, F.col("dist")).otherwise(
                F.when(F.col("msig").isNotNull(), F.lit(i))
            ).alias("dist"),
            F.when(settled, F.col("sigma")).otherwise(F.col("msig")).alias(
                "sigma"
            ),
            F.when(~settled & F.col("msig").isNotNull(), F.lit(1.0))
            .otherwise(F.lit(0.0))
            .alias("_delta"),
        )

    fstate, lmax_plus1, fmetrics = run_supersteps(
        init, fwd, tol=0.5, max_iter=max_iter
    )
    if fmetrics and fmetrics[-1][1] >= 0.5:
        # max_iter exhausted while the frontier was still settling vertices:
        # sigma/dist are incomplete, lmax is wrong, and the backward sweep
        # would return silently corrupted dependency sums — not a sampled
        # approximation. Refuse (ADVICE r2, medium).
        e.unpersist()
        e_dst.unpersist()
        edges.unpersist()
        raise RuntimeError(
            f"betweenness: forward BFS still settling vertices at max_iter="
            f"{max_iter} (last step settled {fmetrics[-1][1]:.0f}); the BFS "
            "depth exceeds max_iter — raise max_iter above the graph's "
            "eccentricity from the chosen sources"
        )
    if stats_out is not None:
        stats_out["converged"] = True
    # the loop runs one no-change step past the last settling step
    lmax = lmax_plus1 - 1

    binit = fstate.filter(F.col("dist").isNotNull()).select(
        "s", "vid", "dist", "sigma",
        F.lit(0.0).alias("delta"),
        F.lit(1.0).alias("_delta"),
    )

    def bwd(state: DataFrame, i: int) -> DataFrame:
        lvl = lmax - i + 1  # contributions FROM this level INTO lvl-1
        movers = state.filter(F.col("dist") == lvl).select(
            "s",
            F.col("vid").alias("dst"),
            ((F.lit(1.0) + F.col("delta")) / F.col("sigma")).alias("contrib"),
        )
        msgs = (
            e_dst.hint("shuffle_hash")
            .join(movers, "dst")
            .select("s", F.col("src").alias("vid"), "contrib")
            .repartition(p, "vid")
            .groupBy("s", "vid")
            .agg(F.sum("contrib").alias("csum"))
        )
        upd = (
            F.col("csum").isNotNull() & (F.col("dist") == lvl - 1)
        )
        return state.select("s", "vid", "dist", "sigma", "delta").join(
            msgs.hint("shuffle_hash"), ["s", "vid"], "left"
        ).select(
            "s",
            "vid",
            "dist",
            "sigma",
            F.when(upd, F.col("sigma") * F.col("csum")).otherwise(
                F.col("delta")
            ).alias("delta"),
            F.when(upd, F.lit(1.0)).otherwise(F.lit(0.0)).alias("_delta"),
        )

    if lmax >= 1:
        bstate, _, _ = run_supersteps(
            binit, bwd, tol=-1.0, max_iter=lmax
        )
    else:
        bstate = binit

    if mode == "edge":
        # K43: Brandes' edge form [PUB: Brandes 2008 "On variants of
        # shortest-path betweenness"]: a DAG edge (u,v) (dist_v = dist_u+1
        # from source s) carries dependency sigma_u * (1+delta_v)/sigma_v —
        # exactly the per-edge term the vertex backward sweep SUMS into u.
        # The final state already holds (dist, sigma, delta) per (s, vid),
        # so the edge scores are two equi hash joins of the directed edge
        # table against it (src-keyed and (s,dst)-keyed — the same |S|xE
        # row class as ONE forward superstep) + one hash agg. For the
        # undirected case each DAG direction occurs under different
        # sources; grouping on the canonical unordered pair folds them.
        su = bstate.select(
            "s",
            F.col("vid").alias("src"),
            F.col("dist").alias("d_src"),
            F.col("sigma").alias("sig_src"),
        )
        sv = bstate.select(
            "s",
            F.col("vid").alias("dst"),
            F.col("dist").alias("d_dst"),
            F.col("sigma").alias("sig_dst"),
            F.col("delta").alias("delta_dst"),
        )
        pair = (
            [F.least("src", "dst").alias("u"),
             F.greatest("src", "dst").alias("v")]
            if not directed
            else [F.col("src").alias("u"), F.col("dst").alias("v")]
        )
        out = (
            e.join(su.hint("shuffle_hash"), "src")
            .join(sv.hint("shuffle_hash"), ["s", "dst"])
            .filter(F.col("d_dst") == F.col("d_src") + 1)
            .select(
                *pair,
                (
                    F.col("sig_src")
                    * (F.lit(1.0) + F.col("delta_dst"))
                    / F.col("sig_dst")
                ).alias("dep"),
            )
            .groupBy("u", "v")
            .agg(F.sum("dep").alias("betweenness"))
            # materialize BEFORE the unpersists below: unlike vertex mode
            # (whose result hangs off the checkpointed bstate only), this
            # plan references the persisted `e` — returning it lazily
            # would re-derive the whole upstream edge table at collection
            # time (the bipartite_projection lesson, ADVICE r2)
            .localCheckpoint()
        )
    else:
        out = (
            bstate.filter(F.col("vid") != F.col("s"))
            .groupBy("vid")
            .agg(F.sum("delta").alias("betweenness"))
        )
    if stats_out is not None:
        stats_out["sources"] = src_list
        stats_out["levels"] = lmax
    e.unpersist()
    e_dst.unpersist()
    edges.unpersist()
    return out
