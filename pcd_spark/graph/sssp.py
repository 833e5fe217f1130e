"""K12 — single/multi-source shortest paths (extension beyond SURVEY §2 core).

Pregel-style parallel BFS / Bellman-Ford relaxation [PUB: Malewicz et al.
2010 "Pregel"; Bellman 1958]: state = (vid, dist), each superstep relaxes
``dist[v] = min(dist[v], min over in-neighbors u of dist[u] + w(u,v))``
until no distance improves. Non-negative weights required (min-relaxation
fixpoint = Dijkstra distances); unweighted edges get w = 1 → hop counts.

Frontier optimization: a vertex whose distance did NOT change in the last
superstep re-generates exactly the messages it already sent, which the min
has already absorbed — so only the changed frontier (the rows with
``_delta > 0``, which the K7 driver keeps in the state) joins the edge
blocks. On a long path the per-step join is O(frontier·deg), not O(E):
path_100 runs 99 supersteps but each touches ~1 vertex's out-edges.

Superstep shape: C1 frontier⋈edges gather → D1 min-by-dst → C4 left join
back into state; `_delta` = "distance improved" rides the same select
(superstep.py rule 2). Resumable via the shared K7 CheckpointStore.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pcd_spark.graph.partition import adaptive_num_parts
from pcd_spark.graph.superstep import run_supersteps
from pcd_spark.storage import CheckpointStore


def _cohort_digest(vids: Sequence[int]) -> str:
    """Short stable digest of a sorted source/landmark list, folded into
    the checkpoint graph_token: resuming the same store (the CLI uses a
    fixed run_id) with a DIFFERENT cohort on the same graph must trip the
    token-guard ValueError instead of silently resuming the old cohort's
    state and returning wrong distances."""
    import hashlib

    return hashlib.sha256(
        ",".join(str(int(v)) for v in sorted(vids)).encode()
    ).hexdigest()[:12]


def shortest_paths(
    edges: DataFrame,
    sources: Sequence[int],
    weight_col: str | None = None,
    directed: bool = False,
    max_iter: int = 200,
    num_parts: int | None = None,
    store: CheckpointStore | None = None,
    checkpoint_every: int = 10,
    stats_out: dict | None = None,
) -> DataFrame:
    """Returns DataFrame(vid: long, dist: double) — exact shortest-path
    distance from the NEAREST source, reached vertices only (unreachable
    vertices are absent, matching networkx *_path_length semantics).
    Unweighted edges count hops; `weight_col` must be non-negative.
    """
    if not sources:
        raise ValueError("at least one source vertex required")
    # persist the (possibly derived) input once: referenced by the
    # adaptive sizing count and the graph-normal-form build below
    edges = edges.persist()
    p = num_parts or adaptive_num_parts(edges)

    w = (
        F.col(weight_col).cast("double")
        if weight_col
        else F.lit(1.0)
    )
    e = edges.filter(F.col("src") != F.col("dst")).select(
        "src", "dst", w.alias("w")
    )
    if not directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
        )
    # parallel edges collapse to their cheapest copy (D1 min) — the only
    # one a shortest path can use; also makes the relax join skew-lighter.
    e = (
        e.groupBy("src", "dst")
        .agg(F.min("w").alias("w"))
        .repartition(p, "src")
        .persist()
    )
    # one job primes the cache AND validates the documented non-negativity
    # precondition (a negative weight silently breaks the min-relaxation
    # fixpoint = Dijkstra equivalence — fail loudly instead)
    _st = e.agg(F.count("*").alias("n"), F.min("w").alias("minw")).first()
    if weight_col is not None and _st["minw"] is not None and _st["minw"] < 0:
        e.unpersist()
        edges.unpersist()
        raise ValueError(
            f"shortest_paths requires non-negative weights; min({weight_col}) "
            f"= {_st['minw']}"
        )
    _gtok = f"edges={_st['n']};srcs={_cohort_digest(sources)}"

    verts = (
        e.select(F.col("src").alias("vid"))
        .unionByName(e.select(F.col("dst").alias("vid")))
        .distinct()
    )
    src_list = [int(s) for s in sources]
    is_src = F.col("vid").isin(src_list)
    init = verts.select(
        "vid",
        F.when(is_src, F.lit(0.0)).otherwise(F.lit(None).cast("double")).alias(
            "dist"
        ),
        # seed the frontier: sources changed "this" step, everyone else idle
        F.when(is_src, F.lit(1.0)).otherwise(F.lit(0.0)).alias("_delta"),
    )

    def step(state: DataFrame, _i: int) -> DataFrame:
        frontier = state.filter(F.col("_delta") > 0).select(
            F.col("vid").alias("src"), "dist"
        )
        relax = (
            e.hint("shuffle_hash")
            .join(frontier, "src")
            .select(F.col("dst").alias("vid"), (F.col("dist") + F.col("w")).alias("cand"))
            .repartition(p, "vid")
            .groupBy("vid")
            .agg(F.min("cand").alias("nmin"))
        )
        nd = F.least("dist", "nmin")  # least() skips nulls on either side
        return state.select("vid", "dist").join(
            relax.hint("shuffle_hash"), "vid", "left"
        ).select(
            "vid",
            nd.alias("dist"),
            F.when(nd.eqNullSafe(F.col("dist")), F.lit(0.0))
            .otherwise(F.lit(1.0))
            .alias("_delta"),
        )

    final, iters, metrics = run_supersteps(
        init, step, tol=0.5, max_iter=max_iter,
        store=store, checkpoint_every=checkpoint_every, graph_token=_gtok,
    )
    if stats_out is not None:
        stats_out["iterations"] = iters
        stats_out["metrics"] = metrics
    e.unpersist()
    edges.unpersist()
    return final.filter(F.col("dist").isNotNull()).select("vid", "dist")


def landmark_distances(
    edges: DataFrame,
    landmarks: Sequence[int],
    weight_col: str | None = None,
    directed: bool = False,
    max_iter: int = 200,
    num_parts: int | None = None,
    store: CheckpointStore | None = None,
    checkpoint_every: int = 10,
    stats_out: dict | None = None,
) -> DataFrame:
    """PER-LANDMARK shortest-path distances: DataFrame(lm: long, vid: long,
    dist: double), one row per (landmark, reached vertex) — the substrate
    for K55 closeness centrality and for landmark/ALT distance estimation
    [PUB: Goldberg & Harrelson 2005 "A*: landmark triangle inequality";
    Potamias et al. 2009 "Fast shortest path distance estimation in large
    networks"].

    Differs from `shortest_paths` (dist to the NEAREST source) by keying the
    superstep state on (lm, vid): ALL landmarks advance in the SAME
    superstep sequence — L BFS runs cost the fixed superstep overhead once,
    not L times, and each relax step is one (frontier x edges) join batched
    across landmarks. State holds only REACHED (lm, vid) pairs (frontier
    discovery via full-outer merge), so memory is O(sum over landmarks of
    vertices reached), never the dense V x L grid before it is warranted.
    At 10^12 edges the landmark set is the knob: |L| in the tens keeps
    state ~|L| x V, the standard landmark-embedding budget."""
    if not landmarks:
        raise ValueError("at least one landmark vertex required")
    edges = edges.persist()
    p = num_parts or adaptive_num_parts(edges)

    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    e = edges.filter(F.col("src") != F.col("dst")).select("src", "dst", w.alias("w"))
    if not directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
        )
    e = (
        e.groupBy("src", "dst")
        .agg(F.min("w").alias("w"))
        .repartition(p, "src")
        .persist()
    )
    # same single-job cache-prime + non-negativity validation as
    # shortest_paths (the min-relaxation fixpoint argument is shared)
    _st = e.agg(F.count("*").alias("n"), F.min("w").alias("minw")).first()
    if weight_col is not None and _st["minw"] is not None and _st["minw"] < 0:
        e.unpersist()
        edges.unpersist()
        raise ValueError(
            f"landmark_distances requires non-negative weights; "
            f"min({weight_col}) = {_st['minw']}"
        )
    _gtok = f"lmedges={_st['n']};lms={_cohort_digest(landmarks)}"

    lm_list = sorted({int(s) for s in landmarks})
    spark = edges.sparkSession
    # seed: one (lm, lm, 0) row per landmark — state stays reached-only
    init = spark.createDataFrame(
        [(lm, lm, 0.0, 1.0) for lm in lm_list],
        "lm long, vid long, dist double, _delta double",
    ).repartition(p, "vid")

    def step(state: DataFrame, _i: int) -> DataFrame:
        frontier = state.filter(F.col("_delta") > 0).select(
            "lm", F.col("vid").alias("src"), "dist"
        )
        relax = (
            e.hint("shuffle_hash")
            .join(frontier, "src")
            .select(
                "lm",
                F.col("dst").alias("vid"),
                (F.col("dist") + F.col("w")).alias("cand"),
            )
            .repartition(p, "vid")
            .groupBy("lm", "vid")
            .agg(F.min("cand").alias("nmin"))
        )
        nd = F.least("dist", "nmin")
        # full outer: newly discovered (lm, vid) pairs enter the state here
        return state.select("lm", "vid", "dist").join(
            relax.hint("shuffle_hash"), ["lm", "vid"], "full"
        ).select(
            "lm",
            "vid",
            nd.alias("dist"),
            F.when(nd.eqNullSafe(F.col("dist")), F.lit(0.0))
            .otherwise(F.lit(1.0))
            .alias("_delta"),
        )

    final, iters, metrics = run_supersteps(
        init, step, tol=0.5, max_iter=max_iter,
        store=store, checkpoint_every=checkpoint_every, graph_token=_gtok,
    )
    if stats_out is not None:
        stats_out["iterations"] = iters
        stats_out["metrics"] = metrics
    e.unpersist()
    edges.unpersist()
    return final.select("lm", "vid", "dist")


def closeness_centrality(
    edges: DataFrame,
    sources: Sequence[int],
    directed: bool = False,
    max_iter: int = 200,
    num_parts: int | None = None,
    stats_out: dict | None = None,
) -> DataFrame:
    """K55 — exact closeness centrality for a source cohort, Wasserman-Faust
    normalized for disconnected graphs [PUB: Bavelas 1950; Wasserman & Faust
    1994 eq. 5.22; networkx closeness_centrality(wf_improved=True)
    semantics]: c(s) = ((r-1)/sum_dist) * ((r-1)/(n-1)) where r = vertices
    reachable from s (incl. s), n = |V|. Returns DataFrame(vid, closeness).

    Exact closeness needs distances from s to EVERYONE, so at 10^12 edges it
    runs on a sampled/landmark cohort BY DESIGN (the K22/K23 pattern:
    centrality-by-cohort is the scale form; HyperBall covers the all-vertex
    approximate regime). One batched landmark-BFS run covers the whole
    cohort; the closeness reduction is a single (lm) hash-agg over its
    O(|cohort| x V) output."""
    ld = landmark_distances(
        edges,
        sources,
        directed=directed,
        max_iter=max_iter,
        num_parts=num_parts,
        stats_out=stats_out,
    )
    sym = edges.select("src").unionByName(edges.select(F.col("dst").alias("src")))
    n = sym.distinct().count()  # one scalar job, O(1) driver state
    agg = ld.groupBy("lm").agg(
        F.count("*").alias("r"), F.sum("dist").alias("sd")
    )
    wf = (
        (F.col("r") - 1)
        / F.col("sd")
        * (F.col("r") - 1)
        / F.lit(float(n - 1))
    )
    return agg.select(
        F.col("lm").alias("vid"),
        F.round(F.when(F.col("sd") > 0, wf).otherwise(F.lit(0.0)), 6).alias(
            "closeness"
        ),
    )
