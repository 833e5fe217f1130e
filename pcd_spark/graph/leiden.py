"""K50 — distributed Leiden community detection (extension beyond SURVEY §2).

Leiden [PUB: Traag, Waltman & van Eck 2019, "From Louvain to Leiden:
guaranteeing well-connected communities", Sci. Rep. 9:5233] fixes Louvain's
(K13) one real defect: Louvain can emit INTERNALLY DISCONNECTED communities
(a bridge vertex moves away and the community it leaves behind splits, but
the label does not). Leiden adds a REFINEMENT phase between the local-move
and the coarsening:

  1. LOCAL MOVE   — exactly K13's class-scheduled synchronous local move
                    (shared code: ``louvain._local_move_phase``), seeded at
                    aggregate levels with the previous level's macro
                    partition (the paper's P_init requirement);
  2. REFINEMENT   — inside every macro community, restart from singletons;
                    only vertices that are STILL SINGLETONS may merge into a
                    neighboring sub-community of the same macro community
                    (positive modularity gain, best-gain, smallest-id tie).
                    Because multi-member sub-communities only ever GROW by
                    absorbing adjacent vertices and never lose members, every
                    sub-community is connected BY CONSTRUCTION;
  3. COARSENING   — collapse the REFINED partition (not the macro one), and
                    start the next level's local move from the induced macro
                    assignment.

The returned communities are therefore unions of connected sub-communities
that the next levels only merge along real edges — the paper's connectivity
guarantee. (The paper's extra "well-connectedness" γ-cut test on merge
candidates is a randomized-selection refinement; this implementation is the
deterministic greedy variant, which preserves the connectivity guarantee —
the property tests in tests/test_leiden.py check it directly.)

Determinism: identical discipline to K13 — synchronous moves gated by
pmod(xxhash64(vid, cycle), n_classes) activation classes re-keyed per cycle,
smallest-community-id tie-breaks, integer-valued scores below 2^53 so
cross-partition reduce order cannot perturb anything. No rand() anywhere.

Scale shape: refinement is the same one-O(E)-shuffle histogram as the local
move, but over the macro-internal edge subset only (at 100 TB the macro cut
edges — usually the majority after level 0 — never enter the refinement
shuffle). Coarsening stays one groupBy. Levels shrink geometrically as in
K13.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pcd_spark.graph.louvain import (
    _EPS,
    _level_modularity,
    _local_move_phase,
    _sym_adj,
)
from pcd_spark.graph.partition import adaptive_num_parts


def _refine_round(
    state: DataFrame,
    adj_c: DataFrame,
    k: DataFrame,
    total: float,
    active: int,
    n_classes: int,
    cycle: int,
) -> DataFrame:
    """One synchronous refinement sub-round over `state` (vid, comm, _delta).

    Only vertices in SINGLETON sub-communities whose activation class —
    pmod(xxhash64(vid, cycle), n_classes) — equals `active` may merge, and
    only into a sub-community adjacent via a same-macro edge (adj_c is
    pre-filtered to macro-internal edges). A singleton's own score is exactly
    0 (k_in(own)=0, Σ_tot(own∖i)=0), so the move condition reduces to
    score(i→c) = k_in(c) − k_i·Σ_tot(c)/2m > ε, tie → smallest sub id."""
    lab = state.select("vid", "comm")
    sizes = lab.groupBy("comm").agg(F.count(F.lit(1)).alias("_n"))
    single = sizes.filter(F.col("_n") == 1).select(
        "comm", F.lit(1).alias("_single")
    )
    sigma = (
        lab.join(k, "vid")
        .groupBy("comm")
        .agg(F.sum("k").alias("sigma"))
    )
    k_in = (
        adj_c.join(
            lab.select(F.col("vid").alias("dst"), F.col("comm").alias("cand")),
            "dst",
        )
        .groupBy("src", "cand")
        .agg(F.sum("w").alias("k_in"))
    )
    best = (
        k_in.join(
            lab.select(F.col("vid").alias("src"), F.col("comm").alias("own")),
            "src",
        )
        .filter(F.col("cand") != F.col("own"))
        .join(sigma.withColumnRenamed("comm", "cand"), "cand")
        .join(k.withColumnRenamed("vid", "src"), "src")
        .select(
            "src",
            "cand",
            (
                F.col("k_in") - F.col("k") * F.col("sigma") / F.lit(total)
            ).alias("score"),
        )
        .filter(F.col("score") > F.lit(_EPS))
        .groupBy("src")
        .agg(F.min(F.struct((-F.col("score")).alias("ns"), F.col("cand"))).alias("m"))
        .select(F.col("src").alias("vid"), F.col("m.cand").alias("new_comm"))
    )
    gate = F.pmod(F.xxhash64("vid", F.lit(cycle)), F.lit(n_classes)) == F.lit(
        active
    )
    moved = (
        F.col("new_comm").isNotNull() & gate & F.col("_single").isNotNull()
    )
    return (
        state.join(single, "comm", "left")
        .join(best, "vid", "left")
        .select(
            "vid",
            F.when(moved, F.col("new_comm")).otherwise(F.col("comm")).alias(
                "comm"
            ),
            (F.col("_delta") + moved.cast("double")).alias("_delta"),
        )
    )


def _refine_phase(
    adj: DataFrame,
    macro: DataFrame,
    total: float,
    num_parts: int,
    max_rounds: int,
    n_classes: int = 2,
    stats: dict | None = None,
) -> DataFrame:
    """Refine a macro partition into connected sub-communities: restart from
    singletons and iterate singleton-merge rounds (class-scheduled) until a
    full cycle makes no merge, or max_rounds. Same one-job-per-round
    execution discipline as K13's local-move phase (observe() Allreduce
    riding the eager localCheckpoint; see louvain._local_move_phase)."""
    from pyspark.sql import Observation

    from pcd_spark.graph.superstep import reset_plan_stats

    k = (
        adj.groupBy(F.col("src").alias("vid"))
        .agg(F.sum("w").alias("k"))
        .repartition(num_parts, "vid")
        .persist()
    )
    ms = macro.select(F.col("vid").alias("src"), F.col("comm").alias("_ms"))
    md = macro.select(F.col("vid").alias("dst"), F.col("comm").alias("_md"))
    # merge candidates come only from inside the macro community: keep only
    # macro-internal, non-loop edges (the cut edges never enter the shuffle)
    adj_c = (
        adj.filter(F.col("src") != F.col("dst"))
        .join(ms, "src")
        .join(md, "dst")
        .filter(F.col("_ms") == F.col("_md"))
        .select("src", "dst", "w")
        .repartition(num_parts, "src")
        .persist()
    )
    ck = k.select(
        "vid", F.col("vid").alias("comm"), F.lit(0.0).alias("_delta")
    ).localCheckpoint(eager=True)
    state = reset_plan_stats(ck)

    quiet = 0
    rounds = 0
    for rnd in range(max_rounds):
        obs = Observation(f"leiden_refine_{rnd}")
        new_ck = (
            _refine_round(
                state.select("vid", "comm", F.lit(0.0).alias("_delta")),
                adj_c, k, total,
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
        quiet = quiet + 1 if moved == 0.0 else 0
        if quiet >= n_classes:
            break
    if stats is not None:
        stats["refine_rounds"] = rounds
    out = state.select("vid", "comm")
    k.unpersist()
    adj_c.unpersist()
    return out


def leiden(
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
    """Leiden communities over an undirected(-ized) edge table.

    Returns DataFrame(vid: long, label: long); with canonical_labels each
    community is labeled by its smallest member vid. stats_out collects
    per-level modularity, community/sub-community counts and round counts.
    Guarantee (tested): every returned community induces a CONNECTED
    subgraph — the property Louvain (K13) lacks.

    Graphs — or, mid-run, coarse levels — at or below `small_graph_cutoff`
    undirected edges run the identical rule on the driver (result-identical
    for integer-valued weights; see the collapse note at module end). Set
    small_graph_cutoff=0 to force the distributed path.

    The 2M default follows K51 onion's measured crossover argument
    (kcore.py): the generic 200k class rule assumes ~10 supersteps, but
    Leiden's local-move + refinement + coarse ladder runs HUNDREDS of
    class-scheduled rounds whose per-round cost is fixed stage latency,
    not data — measured at sf0.1 (20k vertices, 598k undirected edges):
    122 distributed rounds = 277 s vs 84.6 s on the driver with the q and
    label output bit-identical (q = 0.08364764166997574 both paths). At
    10^12 edges the distributed levels do the mass coarsening and the
    SAME rule collapses the round-heavy coarse tail — onion's division of
    labor. DRIVER-MEMORY NOTE: the collapse collects up to cutoff edge
    Rows into a Python dict (a few hundred MB at 2M, sized for this
    repo's 32g driver); small-driver callers should pass ~60k edges per
    driver-GB.
    """
    from pcd_spark.graph.louvain import _integer_weighted
    from pcd_spark.graph.superstep import reset_plan_stats

    spark = edges.sparkSession
    edges = edges.persist()
    p = num_parts or adaptive_num_parts(edges)
    adj = _sym_adj(edges, weight_col).repartition(p, "src").persist()
    total = float(adj.agg(F.sum("w")).first()[0] or 0.0)  # = 2m
    if total <= 0:
        raise ValueError("leiden: edge table is empty")
    n_dir = adj.count()
    int_ok = small_graph_cutoff > 0 and _integer_weighted(adj)

    def _finish_driver(coarse_adj, start_level, q_prev, init):
        ed = {(r["src"], r["dst"]): r["w"] for r in coarse_adj.collect()}
        lvls: list[dict] = []
        lab = _leiden_driver_levels(
            spark, ed, total, max_levels, max_rounds, min_gain,
            n_classes, lvls, start_level=start_level, q_prev=q_prev,
            init=init,
        )
        return lab, lvls

    if int_ok and n_dir // 2 <= small_graph_cutoff:
        lab, lvls = _finish_driver(adj, 0, None, None)
        adj.unpersist()
        edges.unpersist()
        if stats_out is not None:
            stats_out["levels"] = lvls
            acc = [lv for lv in lvls if lv.get("accepted")]
            stats_out["q"] = acc[-1]["q"] if acc else 0.0
        if canonical_labels:
            rep: dict = {}
            for v, l in lab.items():
                rep[l] = v if l not in rep else min(rep[l], v)
            items = [(int(v), int(rep[l])) for v, l in lab.items()]
        else:
            items = [(int(v), int(l)) for v, l in lab.items()]
        return spark.createDataFrame(sorted(items), "vid long, label long")

    # assign: orig vid -> current coarse vertex (REFINED-sub id space);
    # labels: orig vid -> macro community of the last ACCEPTED level.
    # Level-0 coarse ids ARE original vids and both refinement and local-move
    # community ids are member vids, so labels stay in the original domain.
    assign = adj.select(F.col("src").alias("vid")).distinct().select(
        "vid", F.col("vid").alias("comm")
    )
    assign = reset_plan_stats(assign.localCheckpoint(eager=True))
    labels = assign

    init_next: DataFrame | None = None
    levels: list[dict] = []
    q_prev: float | None = None
    for level in range(max_levels):
        lstats: dict = {}
        comm = _local_move_phase(
            adj, total, p, max_rounds,
            n_classes=n_classes, stats=lstats, init=init_next,
        )
        q = _level_modularity(adj, comm, total)
        n_comms = comm.select("comm").distinct().count()
        n_verts = comm.count()
        if q_prev is not None and q - q_prev < min_gain:
            levels.append(
                {
                    "level": level, "q": q, "vertices": n_verts,
                    "communities": n_comms,
                    "rounds": lstats.get("rounds", 0), "accepted": False,
                }
            )
            break
        # accept this level: fold the macro labels for the output
        labels = reset_plan_stats(
            assign.join(
                comm.select(
                    F.col("vid").alias("comm"), F.col("comm").alias("nc")
                ),
                "comm",
            )
            .select("vid", F.col("nc").alias("comm"))
            .localCheckpoint(eager=True)
        )
        q_prev = q
        if n_comms == n_verts:
            levels.append(
                {
                    "level": level, "q": q, "vertices": n_verts,
                    "communities": n_comms,
                    "rounds": lstats.get("rounds", 0), "accepted": True,
                }
            )
            break  # nothing merged: coarsening would be the identity
        refined = _refine_phase(
            adj, comm, total, p, max_rounds, n_classes=n_classes, stats=lstats
        )
        n_sub = refined.select("comm").distinct().count()
        levels.append(
            {
                "level": level, "q": q, "vertices": n_verts,
                "communities": n_comms, "sub_communities": n_sub,
                "rounds": lstats.get("rounds", 0),
                "refine_rounds": lstats.get("refine_rounds", 0),
                "accepted": True,
            }
        )
        if n_sub == n_verts:
            break  # refinement merged nothing: the coarse graph == this one
        # fold the refined partition into the orig->coarse-vertex map
        assign = reset_plan_stats(
            assign.join(
                refined.select(
                    F.col("vid").alias("comm"), F.col("comm").alias("nc")
                ),
                "comm",
            )
            .select("vid", F.col("nc").alias("comm"))
            .localCheckpoint(eager=True)
        )
        # next level starts from the macro partition induced on the refined
        # supervertices (the Leiden P_init): refined-sub id -> macro id
        init_next = reset_plan_stats(
            refined.join(
                comm.withColumnRenamed("comm", "_macro"), "vid"
            )
            .select(F.col("comm").alias("vid"), F.col("_macro").alias("comm"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # coarsen on the REFINED partition (not the macro one)
        cs = refined.select(F.col("vid").alias("src"), F.col("comm").alias("nsrc"))
        cd = refined.select(F.col("vid").alias("dst"), F.col("comm").alias("ndst"))
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
            # the coarse graph fits one task: finish on the driver (only the
            # small coarse graph and its macro init are collected — the
            # orig-vid assign/labels maps stay distributed)
            init_map = {
                r["vid"]: r["comm"] for r in init_next.collect()
            }
            lab, lvls = _finish_driver(adj, level + 1, q_prev, init_map)
            levels.extend(lvls)
            if lab is not None:
                map_df = spark.createDataFrame(
                    [(int(c), int(l)) for c, l in lab.items()],
                    "comm long, nc long",
                )
                labels = assign.join(F.broadcast(map_df), "comm").select(
                    "vid", F.col("nc").alias("comm")
                )
            break

    adj.unpersist()
    edges.unpersist()
    if stats_out is not None:
        stats_out["levels"] = levels
        accepted = [lv for lv in levels if lv.get("accepted")]
        stats_out["q"] = accepted[-1]["q"] if accepted else 0.0
    out = labels.select("vid", F.col("comm").alias("label"))
    if canonical_labels:
        rep = out.groupBy("label").agg(F.min("vid").alias("rep"))
        out = out.join(rep, "label").select("vid", F.col("rep").alias("label"))
    return out


# ---------------------------------------------------------------------------
# Small-graph collapse (round 3) — the K13 driver mirror extended with the
# refinement phase. Same exactness argument (louvain.py: integer-valued
# weights => every sum is reorder-exact; gates are Spark's own xxhash64
# values), same activation: whole graph at or below small_graph_cutoff
# undirected edges, or mid-run once coarsening shrinks below it. Dual-path
# equality pinned in tests/test_leiden.py; the k50 sf0.01 golden hash was
# verified UNCHANGED when the collapse landed.
# ---------------------------------------------------------------------------


def _refine_py(
    nbrs: dict,
    k: dict,
    total: float,
    macro: dict,
    gates: dict,
    max_rounds: int,
    n_classes: int,
    stats: dict | None = None,
) -> dict:
    """Driver mirror of _refine_round's loop: singleton-only merges into
    same-macro neighbor sub-communities, score > EPS, smallest-sub ties,
    synchronous application, quiet-cycle convergence."""
    sub = {v: v for v in k}
    size = {v: 1 for v in k}
    sigma = {v: kv for v, kv in k.items()}
    quiet = 0
    rounds = 0
    for rnd in range(max_rounds):
        active = rnd % n_classes
        cycle = rnd // n_classes
        decisions = {}
        for v, kv in k.items():
            if gates[v][cycle] != active or size[sub[v]] != 1:
                continue
            mv = macro[v]
            kin: dict = {}
            for n, w in nbrs.get(v, ()):
                if macro[n] != mv:
                    continue
                c = sub[n]
                kin[c] = kin.get(c, 0.0) + w
            own = sub[v]
            best = None
            for c, kc in kin.items():
                if c == own:
                    continue
                s = kc - kv * sigma[c] / total
                if s > _EPS:
                    key = (-s, c)
                    if best is None or key < best:
                        best = key
            if best is not None:
                decisions[v] = best[1]
        for v, c in decisions.items():
            old = sub[v]
            kv = k[v]
            size[old] -= 1
            sigma[old] -= kv
            size[c] = size.get(c, 0) + 1
            sigma[c] = sigma.get(c, 0.0) + kv
            sub[v] = c
        rounds = rnd + 1
        quiet = quiet + 1 if not decisions else 0
        if quiet >= n_classes:
            break
    if stats is not None:
        stats["refine_rounds"] = rounds
    return sub


def _leiden_driver_levels(
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
    init: dict | None = None,
) -> dict | None:
    """Run the remaining Leiden levels on the driver over the directed
    doubled-loop edge dict. Returns start-vid -> macro label of the last
    ACCEPTED level, or None if no driver level was accepted (mid-run switch
    whose first level fails the gain bar — the caller keeps its own last
    accepted labels)."""
    from pcd_spark.graph.louvain import (
        _adj_maps,
        _coarsen_py,
        _collect_gates,
        _local_move_py,
        _modularity_py,
    )

    cycles = (max_rounds + n_classes - 1) // n_classes
    _, k0 = _adj_maps(edges.items())
    assign = {v: v for v in k0}
    labels = dict(assign) if init is None else None
    init_map = init
    for level in range(start_level, max_levels):
        nbrs, k = _adj_maps(edges.items())
        gates = _collect_gates(spark, list(k), n_classes, cycles)
        lstats: dict = {}
        comm = _local_move_py(
            nbrs, k, total, gates, max_rounds, n_classes,
            stats=lstats, init=init_map,
        )
        q = _modularity_py(edges, k, comm, total)
        n_comms = len(set(comm.values()))
        n_verts = len(k)
        if q_prev is not None and q - q_prev < min_gain:
            levels_out.append(
                {
                    "level": level, "q": q, "vertices": n_verts,
                    "communities": n_comms,
                    "rounds": lstats.get("rounds", 0),
                    "accepted": False, "driver": True,
                }
            )
            break
        labels = {ov: comm[assign[ov]] for ov in assign}
        q_prev = q
        if n_comms == n_verts:
            levels_out.append(
                {
                    "level": level, "q": q, "vertices": n_verts,
                    "communities": n_comms,
                    "rounds": lstats.get("rounds", 0),
                    "accepted": True, "driver": True,
                }
            )
            break
        sub = _refine_py(
            nbrs, k, total, comm, gates, max_rounds, n_classes, stats=lstats
        )
        n_sub = len(set(sub.values()))
        levels_out.append(
            {
                "level": level, "q": q, "vertices": n_verts,
                "communities": n_comms, "sub_communities": n_sub,
                "rounds": lstats.get("rounds", 0),
                "refine_rounds": lstats.get("refine_rounds", 0),
                "accepted": True, "driver": True,
            }
        )
        if n_sub == n_verts:
            break
        assign = {ov: sub[assign[ov]] for ov in assign}
        init_map = {sub[v]: comm[v] for v in k}
        edges = _coarsen_py(edges, sub)
    return labels
