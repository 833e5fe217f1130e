"""K13 — distributed Louvain community detection (extension beyond SURVEY §2).

The reference's own problem domain [REF README.md:1] is parallel community
detection; Louvain [PUB: Blondel et al. 2008, "Fast unfolding of communities
in large networks"] is the standard modularity-maximizing algorithm next to
the LPA family the engine already ships (K5). Structure:

  level:  LOCAL-MOVE phase — every vertex greedily joins the neighbor
          community with the best modularity gain — then GRAPH COARSENING:
          communities collapse into supervertices, edge weights sum, and the
          next level runs on the (much smaller) coarse graph. Repeat until a
          level's modularity gain < min_gain.

Determinism (everything here is exactly reproducible, no rand()):
  - moves are SYNCHRONOUS with a class schedule: in sub-round t only
    vertices with pmod(xxhash64(vid, cycle), n_classes) == t % n_classes may
    move, where cycle = t // n_classes. Synchronous unconstrained moves
    oscillate (two adjacent vertices can swap communities forever); class
    scheduling breaks the symmetry deterministically — the standard fix in
    distributed Louvain [PUB: Que et al. 2015, "Scalable Community Detection
    with the Louvain Algorithm", IPDPS]. RE-KEYING the class assignment by
    the cycle number matters for quality: a FIXED assignment permanently
    co-schedules the same vertex pairs, which reproducibly stranded karate
    at Q≈0.33; reshuffling per cycle reaches the karate optimum Q=0.4198
    with n_classes=2 (measured; see tests/test_louvain.py).
  - gain ties break to the SMALLEST candidate community id;
  - with integer (or unit) edge weights every score term is an integer-
    valued double below 2^53, so cross-partition summation order cannot
    perturb results.

Internal representation: the symmetric adjacency A as an edge DataFrame
(src, dst, w) holding BOTH directions of every undirected edge and
self-loops with DOUBLED weight (A_uu = 2*loop-weight). Under this
convention k_i = Σ_j A_ij, Σ_i k_i = ΣA = 2m, and coarsening is literally
A'_cd = Σ_{i∈c,j∈d} A_ij — no per-case bookkeeping.

Modularity gain of moving i into community c (standard local-move form):

    score(i→c) = k_{i,in}(c) − k_i · Σ_tot(c \\ i) / 2m        (×1/m = ΔQ)

evaluated for every neighbor community and for staying put; i moves iff the
best challenger strictly beats staying (by >1e-12).

Scale shape per move-round: one O(E) shuffle to histogram neighbor
communities per vertex (same key discipline as the K5 scatter), one
O(V)-keyed join against the per-community degree table, one O(cand) argmax
aggregation. Coarsening is one groupBy over the edge table. Levels shrink
geometrically — the classic Louvain property — so total cost is dominated
by level 0, which is LPA-shaped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pcd_spark.graph.partition import adaptive_num_parts

_EPS = 1e-12


def _sym_adj(edges: DataFrame, weight_col: str | None) -> DataFrame:
    """Symmetric adjacency (src, dst, w) from a raw edge table: duplicate
    (u,v)/(v,u) pairs and repeated edges collapse with summed weight via the
    canonical form; both directions emitted; self-loop weight doubled
    (A_uu convention, module docstring)."""
    w = (
        F.col(weight_col).cast("double")
        if weight_col
        else F.lit(1.0)
    )
    lo = F.least("src", "dst").alias("a")
    hi = F.greatest("src", "dst").alias("b")
    canon = (
        edges.select(lo, hi, w.alias("w"))
        .groupBy("a", "b")
        .agg(F.sum("w").alias("w"))
    )
    fwd = canon.select(
        F.col("a").alias("src"),
        F.col("b").alias("dst"),
        F.when(F.col("a") == F.col("b"), 2.0 * F.col("w"))
        .otherwise(F.col("w"))
        .alias("w"),
    )
    rev = canon.filter(F.col("a") != F.col("b")).select(
        F.col("b").alias("src"), F.col("a").alias("dst"), F.col("w")
    )
    return fwd.unionByName(rev)


def _move_round(
    state: DataFrame,
    adj: DataFrame,
    k: DataFrame,
    total: float,
    active: int,
    n_classes: int,
    cycle: int,
) -> DataFrame:
    """One synchronous local-move sub-round over `state` (vid, comm, _delta).
    Only vertices whose activation class — pmod(xxhash64(vid, cycle),
    n_classes) — equals `active` may move; the class assignment is reshuffled
    every full cycle (deterministically, keyed by the cycle number) so no
    vertex pair is permanently co-scheduled. Returns the same schema with
    `_delta` = accumulated move-count contribution."""
    lab = state.select("vid", "comm")
    # per-community total degree Σ_tot under the CURRENT assignment — O(V) agg
    sigma = (
        lab.join(k, "vid")
        .groupBy("comm")
        .agg(F.sum("k").alias("sigma"))
    )
    # neighbor-community weights k_{i,in}(c): O(E) histogram, keyed like the
    # K5 scatter (src == the deciding vertex)
    k_in = (
        adj.filter(F.col("src") != F.col("dst"))
        .join(
            lab.select(F.col("vid").alias("dst"), F.col("comm").alias("cand")),
            "dst",
        )
        .groupBy("src", "cand")
        .agg(F.sum("w").alias("k_in"))
    )
    # staying put is always a candidate, even with zero same-community
    # neighbors
    own = lab.select(
        F.col("vid").alias("src"),
        F.col("comm").alias("cand"),
        F.lit(0.0).alias("k_in"),
    )
    cand = (
        k_in.unionByName(own)
        .groupBy("src", "cand")
        .agg(F.sum("k_in").alias("k_in"))
    )
    # score(i→c) = k_in − k_i·Σ_tot(c∖i)/2m ; Σ_tot excludes i itself when c
    # is i's current community
    scored = (
        cand.join(sigma.withColumnRenamed("comm", "cand"), "cand")
        .join(k.withColumnRenamed("vid", "src"), "src")
        .join(lab.select(F.col("vid").alias("src"), "comm"), "src")
        .select(
            "src",
            "cand",
            "comm",
            (
                F.col("k_in")
                - F.col("k")
                * (
                    F.col("sigma")
                    - F.when(F.col("cand") == F.col("comm"), F.col("k")).otherwise(
                        0.0
                    )
                )
                / F.lit(total)
            ).alias("score"),
        )
    )
    own_score = scored.filter(F.col("cand") == F.col("comm")).select(
        "src", F.col("score").alias("own_score")
    )
    best = (
        scored.filter(F.col("cand") != F.col("comm"))
        .join(own_score, "src")
        .filter(F.col("score") > F.col("own_score") + F.lit(_EPS))
        .groupBy("src")
        .agg(F.min(F.struct((-F.col("score")).alias("ns"), F.col("cand"))).alias("m"))
        .select(F.col("src").alias("vid"), F.col("m.cand").alias("new_comm"))
    )
    gate = F.pmod(F.xxhash64("vid", F.lit(cycle)), F.lit(n_classes)) == F.lit(
        active
    )
    moved = F.col("new_comm").isNotNull() & gate
    return state.join(best, "vid", "left").select(
        "vid",
        F.when(moved, F.col("new_comm")).otherwise(F.col("comm")).alias("comm"),
        (F.col("_delta") + moved.cast("double")).alias("_delta"),
    )


def _local_move_phase(
    adj: DataFrame,
    total: float,
    num_parts: int,
    max_rounds: int,
    n_classes: int = 2,
    stats: dict | None = None,
    init: DataFrame | None = None,
) -> DataFrame:
    """Iterate class-scheduled move rounds until a full cycle over all
    n_classes activation classes makes no move (or max_rounds). Same
    execution discipline as the K7
    driver — every round is ONE Spark job: the move-count Allreduce rides an
    observe() on the plan the eager localCheckpoint materializes, and the
    checkpoint truncates lineage so round plans stay constant-size. (A round
    plan references its input state ~8 times — sigma, histogram, candidate
    and score joins — so an UNtruncated chain recomputes exponentially;
    measured: paired rounds without per-round materialization took minutes
    on a 20-vertex graph, truncated rounds take ~1 s.)

    `init` (vid, comm) seeds the starting assignment instead of singletons —
    the Leiden aggregate-level requirement (K50): the coarse graph's local
    move must START from the previous level's macro partition, not from
    scratch [PUB: Traag/Waltman/van Eck 2019, "From Louvain to Leiden"]."""
    from pyspark.sql import Observation

    from pcd_spark.graph.superstep import reset_plan_stats

    k = (
        adj.groupBy(F.col("src").alias("vid"))
        .agg(F.sum("w").alias("k"))
        .repartition(num_parts, "vid")
        .persist()
    )
    start = (
        k.select("vid", F.col("vid").alias("comm"))
        if init is None
        else k.select("vid").join(init.select("vid", "comm"), "vid")
    )
    ck = start.select(
        "vid", "comm", F.lit(0.0).alias("_delta")
    ).localCheckpoint(eager=True)
    state = reset_plan_stats(ck)

    quiet = 0
    rounds = 0
    for rnd in range(max_rounds):
        obs = Observation(f"louvain_round_{rnd}")
        new_ck = (
            _move_round(
                state.select("vid", "comm", F.lit(0.0).alias("_delta")),
                adj, k, total,
                active=rnd % n_classes,
                n_classes=n_classes,
                cycle=rnd // n_classes,
            )
            .observe(obs, F.coalesce(F.sum("_delta"), F.lit(0.0)).alias("_d"))
            .localCheckpoint(eager=True)
        )
        moved = float(obs.get["_d"] or 0.0)
        ck.unpersist()
        ck = new_ck
        state = reset_plan_stats(ck)
        rounds = rnd + 1
        # converged only when EVERY activation class passes without a move
        quiet = quiet + 1 if moved == 0.0 else 0
        if quiet >= n_classes:
            break
    if stats is not None:
        stats["rounds"] = rounds
    out = state.select("vid", "comm")
    k.unpersist()
    return out


def _level_modularity(adj: DataFrame, comm: DataFrame, total: float) -> float:
    """Q = Σ_c [A_in(c)/2m − (Σ_tot(c)/2m)²] over the doubled-self-loop
    symmetric adjacency (A_in counts internal directed entries, so it equals
    2·L_c + doubled loops — exactly the 2m-normalized Newman form)."""
    lab_s = comm.select(F.col("vid").alias("src"), F.col("comm").alias("cs"))
    lab_d = comm.select(F.col("vid").alias("dst"), F.col("comm").alias("cd"))
    a_in = (
        adj.join(lab_s, "src")
        .join(lab_d, "dst")
        .filter(F.col("cs") == F.col("cd"))
        .groupBy(F.col("cs").alias("comm"))
        .agg(F.sum("w").alias("a_in"))
    )
    sigma = (
        adj.groupBy(F.col("src").alias("vid"))
        .agg(F.sum("w").alias("k"))
        .join(comm, "vid")
        .groupBy("comm")
        .agg(F.sum("k").alias("sigma"))
    )
    row = (
        sigma.join(a_in, "comm", "left")
        .select(
            (
                F.coalesce("a_in", F.lit(0.0)) / F.lit(total)
                - F.pow(F.col("sigma") / F.lit(total), 2)
            ).alias("q_c")
        )
        .agg(F.coalesce(F.sum("q_c"), F.lit(0.0)).alias("q"))
        .first()
    )
    return float(row["q"])


def louvain(
    edges: DataFrame,
    weight_col: str | None = None,
    max_levels: int = 10,
    max_rounds: int = 40,
    min_gain: float = 1e-9,
    num_parts: int | None = None,
    n_classes: int = 2,
    canonical_labels: bool = True,
    stats_out: dict | None = None,
) -> DataFrame:
    """Louvain communities over an undirected(-ized) edge table.

    Returns DataFrame(vid: long, label: long); with canonical_labels each
    community is labeled by its smallest member vid (CC-style ids, stable
    across level bookkeeping). stats_out collects per-level modularity.
    """
    # persist the (possibly derived) input once: referenced by the
    # adaptive sizing count and the graph-normal-form build below
    edges = edges.persist()
    p = num_parts or adaptive_num_parts(edges)
    adj = _sym_adj(edges, weight_col).repartition(p, "src").persist()
    total = float(adj.agg(F.sum("w")).first()[0] or 0.0)  # = 2m
    if total <= 0:
        raise ValueError("louvain: edge table is empty")

    # global assignment orig-vid -> current coarse community; level-0 coarse
    # ids ARE original vids, and every coarsening keeps community ids from
    # the previous level's vid space, so labels stay in the original domain
    from pcd_spark.graph.superstep import reset_plan_stats

    assign = adj.select(F.col("src").alias("vid")).distinct().select(
        "vid", F.col("vid").alias("comm")
    )
    assign = reset_plan_stats(assign.localCheckpoint(eager=True))

    levels: list[dict] = []
    q_prev: float | None = None
    for level in range(max_levels):
        lstats: dict = {}
        comm = _local_move_phase(
            adj, total, p, max_rounds, n_classes=n_classes, stats=lstats
        )
        q = _level_modularity(adj, comm, total)
        n_comms = comm.select("comm").distinct().count()
        n_verts = comm.count()
        levels.append(
            {
                "level": level, "q": q, "vertices": n_verts,
                "communities": n_comms, "rounds": lstats.get("rounds", 0),
            }
        )
        if q_prev is not None and q - q_prev < min_gain:
            break
        # fold this level's moves into the global assignment
        assign = reset_plan_stats(
            assign.join(
                comm.select(F.col("vid").alias("comm"), F.col("comm").alias("nc")),
                "comm",
            )
            .select("vid", F.col("nc").alias("comm"))
            .localCheckpoint(eager=True)
        )
        q_prev = q
        if n_comms == n_verts:
            break  # nothing merged: coarsening would be the identity
        # coarsen: A'_cd = Σ A_ij over members — one groupBy, weights sum;
        # intra-community mass lands on the diagonal automatically
        cs = comm.select(F.col("vid").alias("src"), F.col("comm").alias("nsrc"))
        cd = comm.select(F.col("vid").alias("dst"), F.col("comm").alias("ndst"))
        new_adj = (
            adj.join(cs, "src")
            .join(cd, "dst")
            .groupBy(F.col("nsrc").alias("src"), F.col("ndst").alias("dst"))
            .agg(F.sum("w").alias("w"))
            .repartition(p, "src")
            .persist()
        )
        new_adj.count()
        adj.unpersist()
        adj = new_adj

    adj.unpersist()
    edges.unpersist()
    if stats_out is not None:
        stats_out["levels"] = levels
        stats_out["q"] = levels[-1]["q"] if levels else 0.0
    out = assign.select("vid", F.col("comm").alias("label"))
    if canonical_labels:
        rep = out.groupBy("label").agg(F.min("vid").alias("rep"))
        out = out.join(rep, "label").select("vid", F.col("rep").alias("label"))
    return out
