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
    small_graph_cutoff: int = 2_000_000,
    stats_out: dict | None = None,
) -> DataFrame:
    """Louvain communities over an undirected(-ized) edge table.

    Returns DataFrame(vid: long, label: long); with canonical_labels each
    community is labeled by its smallest member vid (CC-style ids, stable
    across level bookkeeping). stats_out collects per-level modularity.

    Graphs — or, mid-run, COARSE LEVELS — at or below `small_graph_cutoff`
    undirected edges run the identical rule on the driver (result-identical
    for integer-valued weights; see the Small-graph collapse note below),
    so the superstep fixed cost is only paid while the edge table doesn't
    fit one task. Set small_graph_cutoff=0 to force the distributed path.

    The 2M default (round 5) follows onion's measured crossover: the
    local-move ladder is ROUND-count-bound (~100 class-scheduled rounds of
    fixed stage latency at sf0.1), an order of magnitude past the ~10
    supersteps the generic 200k rule assumes — measured sf0.1: 58.8 s on
    the driver vs ~156 s distributed, labels identical. Driver memory:
    up to cutoff edge Rows collect into a dict (~hundreds of MB at 2M);
    small-driver callers should scale the cutoff down (~60k edges/GB).
    """
    spark = edges.sparkSession
    # persist the (possibly derived) input once: referenced by the
    # adaptive sizing count and the graph-normal-form build below
    edges = edges.persist()
    p = num_parts or adaptive_num_parts(edges)
    adj = _sym_adj(edges, weight_col).repartition(p, "src").persist()
    total = float(adj.agg(F.sum("w")).first()[0] or 0.0)  # = 2m
    if total <= 0:
        raise ValueError("louvain: edge table is empty")
    n_dir = adj.count()
    int_ok = small_graph_cutoff > 0 and _integer_weighted(adj)

    levels: list[dict] = []

    def _finish_driver(coarse_adj, start_level, q_prev):
        ed = {
            (r["src"], r["dst"]): r["w"] for r in coarse_adj.collect()
        }
        return _louvain_driver_levels(
            spark, ed, total, max_levels, max_rounds, min_gain,
            n_classes, levels, start_level=start_level, q_prev=q_prev,
        )

    if int_ok and n_dir // 2 <= small_graph_cutoff:
        lab = _finish_driver(adj, 0, None)
        adj.unpersist()
        edges.unpersist()
        if stats_out is not None:
            stats_out["levels"] = levels
            stats_out["q"] = levels[-1]["q"] if levels else 0.0
        if canonical_labels:
            rep: dict = {}
            for v, l in lab.items():
                rep[l] = v if l not in rep else min(rep[l], v)
            items = [(int(v), int(rep[l])) for v, l in lab.items()]
        else:
            items = [(int(v), int(l)) for v, l in lab.items()]
        return spark.createDataFrame(sorted(items), "vid long, label long")

    # global assignment orig-vid -> current coarse community; level-0 coarse
    # ids ARE original vids, and every coarsening keeps community ids from
    # the previous level's vid space, so labels stay in the original domain
    from pcd_spark.graph.superstep import reset_plan_stats

    assign = adj.select(F.col("src").alias("vid")).distinct().select(
        "vid", F.col("vid").alias("comm")
    )
    assign = reset_plan_stats(assign.localCheckpoint(eager=True))

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
        n_new = new_adj.count()
        adj.unpersist()
        adj = new_adj
        if int_ok and n_new // 2 <= small_graph_cutoff:
            # the coarse graph fits one task: finish on the driver (only
            # the SMALL coarse graph is collected — the orig-vid assign map
            # stays distributed and is folded with one join)
            lab = _finish_driver(adj, level + 1, q_prev)
            map_df = spark.createDataFrame(
                [(int(c), int(l)) for c, l in lab.items()],
                "comm long, nc long",
            )
            assign = assign.join(F.broadcast(map_df), "comm").select(
                "vid", F.col("nc").alias("comm")
            )
            break

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


# ---------------------------------------------------------------------------
# Small-graph collapse (round 3): graphs / coarse levels at or below
# `small_graph_cutoff` undirected edges run the SAME class-scheduled rule on
# the driver. Result-identical by construction for INTEGER-VALUED weights
# (the default unit weights and every co-occurrence multiplicity): all
# k/sigma/k_in quantities are then integers below 2^53, so Python floats and
# JVM doubles agree exactly under any summation order, and the single
# non-exact expression — score = k_in − k·sigma/2m — is the same two-op
# IEEE sequence (one exact product < 2^53, one correctly-rounded divide) on
# both paths. Activation gates are Spark's own xxhash64 values (one O(V·C)
# job per level — the K18 extract-hashes-from-Spark discipline), so the
# move schedule is bit-identical too. Graphs with non-integer weights stay
# on the distributed path. Equality across both paths is pinned in
# tests/test_louvain.py / tests/test_leiden.py, and the sf0.01 golden
# hashes (k13/k50) were verified UNCHANGED when the collapse landed.
# ---------------------------------------------------------------------------


def _integer_weighted(adj: DataFrame) -> bool:
    """True iff every weight is integer-valued (and exactly representable):
    the precondition for the driver collapse's exactness argument."""
    bad = adj.filter(
        (F.col("w") != F.round("w")) | (F.abs("w") >= F.lit(2.0 ** 52))
    ).limit(1).count()
    return bad == 0


def _collect_gates(spark, vids: list[int], n_classes: int, cycles: int):
    """pmod(xxhash64(vid, cycle), n_classes) for every (vid, cycle) — from
    Spark itself, so driver and distributed schedules are bit-identical."""
    df = spark.createDataFrame([(int(v),) for v in vids], "vid long")
    row_gates = df.select(
        "vid",
        *[
            F.pmod(F.xxhash64("vid", F.lit(c)), F.lit(n_classes))
            .cast("int")
            .alias(f"c{c}")
            for c in range(cycles)
        ],
    ).collect()
    return {
        r["vid"]: [r[f"c{c}"] for c in range(cycles)] for r in row_gates
    }


def _local_move_py(
    nbrs: dict,
    k: dict,
    total: float,
    gates: dict,
    max_rounds: int,
    n_classes: int,
    stats: dict | None = None,
    init: dict | None = None,
) -> dict:
    """Driver mirror of _local_move_phase — vectorized (round 5).

    Dispatches to the numpy round loop below; the pure-Python reference
    loop is kept as _local_move_py_ref and pinned bit-equal in
    tests/test_round5_guards.py. Bit-equality argument (the same one that
    justifies the collapse itself): the mirror only runs on INTEGER-valued
    weights, so every sum (kin histograms, sigma totals) is reorder-exact
    in float64, and both forms evaluate the identical score expression
    `kin - k*sigma/total` on identical operands — the comparisons and the
    (max score, smallest community) tie rule therefore agree exactly.
    Measured at sf0.1 level 0 (20k vertices, 2.4M directed entries, 40
    rounds): 46 s loop -> ~2 s vectorized."""
    try:
        import numpy as np  # noqa: F401
    except ImportError:  # pragma: no cover - numpy is baked into this env
        return _local_move_py_ref(
            nbrs, k, total, gates, max_rounds, n_classes, stats, init
        )
    return _local_move_np(
        nbrs, k, total, gates, max_rounds, n_classes, stats, init
    )


def _local_move_np(
    nbrs: dict,
    k: dict,
    total: float,
    gates: dict,
    max_rounds: int,
    n_classes: int,
    stats: dict | None = None,
    init: dict | None = None,
) -> dict:
    """Numpy form of the reference loop: per round, one flat gather of
    active-vertex neighbor labels, one (vertex, label) group-sum for the
    kin histograms, one vectorized score compare, one lexsort argmax for
    the (max score, smallest community) rule, then a synchronous batched
    apply — exactly the ref loop's decision set each round (pinned)."""
    import numpy as np

    verts = sorted(k)  # order-preserving: smallest index == smallest vid
    V = len(verts)
    vidx = {v: i for i, v in enumerate(verts)}
    kv = np.array([float(k[v]) for v in verts])

    esrc = np.fromiter(
        (vidx[v] for v in verts for _ in nbrs.get(v, ())),
        dtype=np.int64,
    )
    edst = np.fromiter(
        (vidx[n] for v in verts for n, _ in nbrs.get(v, ())),
        dtype=np.int64,
    )
    ew = np.fromiter(
        (float(w) for v in verts for _, w in nbrs.get(v, ())),
        dtype=np.float64,
    )

    init_vals = (
        [init[v] for v in verts] if init is not None else list(verts)
    )
    # label universe: a vertex only ever moves to a NEIGHBOR's current
    # community, so the label set never leaves the initial one. np.unique
    # sorts ascending -> smallest dense index == smallest raw label, which
    # preserves the tie rule.
    all_labels, comm = np.unique(np.asarray(init_vals, dtype=np.int64),
                                 return_inverse=True)
    L = len(all_labels)
    sigma = np.zeros(L)
    np.add.at(sigma, comm, kv)

    cycles = (max_rounds + n_classes - 1) // n_classes
    gate_arr = np.array([gates[v][:cycles] for v in verts], dtype=np.int64)

    quiet = 0
    rounds = 0
    for rnd in range(max_rounds):
        active = rnd % n_classes
        cycle = rnd // n_classes
        em = (gate_arr[:, cycle] == active)[esrc]
        s_i, l_i, w_i = esrc[em], comm[edst[em]], ew[em]
        key = s_i * L + l_i
        uk, inv = np.unique(key, return_inverse=True)
        kin = np.bincount(inv, weights=w_i)
        g_s, g_l = uk // L, uk % L
        own = comm[g_s]
        own_kin = np.zeros(V)
        m_own = g_l == own
        own_kin[g_s[m_own]] = kin[m_own]
        # own_score per vertex (0.0 when the own community is absent from
        # the neighbor histogram — kin.get(own_c, 0.0) in the ref loop)
        os_v = own_kin - kv * (sigma[comm] - kv) / total
        sc = kin - kv[g_s] * sigma[g_l] / total
        cand = (~m_own) & (sc > os_v[g_s] + _EPS)
        cs, csc, cl = g_s[cand], sc[cand], g_l[cand]
        if len(cs):
            order = np.lexsort((cl, -csc, cs))
            cs_o = cs[order]
            first = np.ones(len(cs_o), dtype=bool)
            first[1:] = cs_o[1:] != cs_o[:-1]
            mv_v = cs_o[first]
            mv_l = cl[order][first]
        else:
            mv_v = mv_l = np.empty(0, dtype=np.int64)
        if len(mv_v):
            np.add.at(sigma, comm[mv_v], -kv[mv_v])
            np.add.at(sigma, mv_l, kv[mv_v])
            comm[mv_v] = mv_l
        rounds = rnd + 1
        quiet = quiet + 1 if len(mv_v) == 0 else 0
        if quiet >= n_classes:
            break
    if stats is not None:
        stats["rounds"] = rounds
    return {v: int(all_labels[comm[i]]) for i, v in enumerate(verts)}


def _local_move_py_ref(
    nbrs: dict,
    k: dict,
    total: float,
    gates: dict,
    max_rounds: int,
    n_classes: int,
    stats: dict | None = None,
    init: dict | None = None,
) -> dict:
    """Pure-Python reference of the driver mirror: synchronous class-gated
    rounds, decisions from the pre-round state, ties to the smallest
    candidate community, quiet for a full cycle => converged."""
    comm = dict(init) if init is not None else {v: v for v in k}
    sigma: dict = {}
    for v, kv in k.items():
        c = comm[v]
        sigma[c] = sigma.get(c, 0.0) + kv
    quiet = 0
    rounds = 0
    for rnd in range(max_rounds):
        active = rnd % n_classes
        cycle = rnd // n_classes
        decisions = {}
        for v, kv in k.items():
            if gates[v][cycle] != active:
                continue
            kin: dict = {}
            for n, w in nbrs.get(v, ()):
                cn = comm[n]
                kin[cn] = kin.get(cn, 0.0) + w
            own_c = comm[v]
            own_score = (
                kin.get(own_c, 0.0) - kv * (sigma[own_c] - kv) / total
            )
            best = None
            for c, kc in kin.items():
                if c == own_c:
                    continue
                s = kc - kv * sigma[c] / total
                if s > own_score + _EPS:
                    key = (-s, c)
                    if best is None or key < best:
                        best = key
            if best is not None:
                decisions[v] = best[1]
        for v, c in decisions.items():
            kv = k[v]
            sigma[comm[v]] -= kv
            sigma[c] = sigma.get(c, 0.0) + kv
            comm[v] = c
        rounds = rnd + 1
        quiet = quiet + 1 if not decisions else 0
        if quiet >= n_classes:
            break
    if stats is not None:
        stats["rounds"] = rounds
    return comm


def _coarsen_py(edges: dict, comm: dict) -> dict:
    """A'_cd = Σ A_ij over the directed doubled-loop representation — the
    exact mirror of the distributed coarsening groupBy."""
    out: dict = {}
    for (i, j), w in edges.items():
        key = (comm[i], comm[j])
        out[key] = out.get(key, 0.0) + w
    return out


def _modularity_py(edges: dict, k: dict, comm: dict, total: float) -> float:
    """Q over the doubled-loop representation, summed in sorted community
    order (a FIXED order: the only non-integer sums in the collapse)."""
    a_in: dict = {}
    for (i, j), w in edges.items():
        if comm[i] == comm[j]:
            a_in[comm[i]] = a_in.get(comm[i], 0.0) + w
    sigma: dict = {}
    for v, kv in k.items():
        c = comm[v]
        sigma[c] = sigma.get(c, 0.0) + kv
    q = 0.0
    for c in sorted(sigma):
        q += a_in.get(c, 0.0) / total - (sigma[c] / total) ** 2
    return q


def _adj_maps(edge_items):
    """(nbrs excluding loops, k incl. loops) from directed (i,j)->w items."""
    nbrs: dict = {}
    k: dict = {}
    for (i, j), w in edge_items:
        k[i] = k.get(i, 0.0) + w
        if i != j:
            nbrs.setdefault(i, []).append((j, w))
        if j not in k:
            k[j] = k.get(j, 0.0)
    return nbrs, k


def _louvain_driver_levels(
    spark,
    edges: dict,
    total: float,
    max_levels: int,
    max_rounds: int,
    min_gain: float,
    n_classes: int,
    levels_out: list,
    start_level: int = 0,
    q_prev: float | None = None,
) -> dict:
    """Run the remaining Louvain levels on the driver over the directed
    doubled-loop edge dict (the graph at `start_level` — ORIGINAL graph for
    a full collapse, the current coarse graph for a mid-run switch; only
    that small graph is ever collected, never the original assign map).
    Returns start-level vid -> final label."""
    cycles = (max_rounds + n_classes - 1) // n_classes
    _, k0 = _adj_maps(edges.items())
    assign = {v: v for v in k0}
    for level in range(start_level, max_levels):
        nbrs, k = _adj_maps(edges.items())
        gates = _collect_gates(spark, list(k), n_classes, cycles)
        lstats: dict = {}
        comm = _local_move_py(
            nbrs, k, total, gates, max_rounds, n_classes, stats=lstats
        )
        q = _modularity_py(edges, k, comm, total)
        n_comms = len(set(comm.values()))
        n_verts = len(k)
        levels_out.append(
            {
                "level": level, "q": q, "vertices": n_verts,
                "communities": n_comms, "rounds": lstats.get("rounds", 0),
                "driver": True,
            }
        )
        if q_prev is not None and q - q_prev < min_gain:
            break
        for ov in assign:
            assign[ov] = comm[assign[ov]]
        q_prev = q
        if n_comms == n_verts:
            break
        edges = _coarsen_py(edges, comm)
    return assign
