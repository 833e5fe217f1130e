"""K47 — densest subgraph via (1+ε)-greedy peeling.

Bahmani, Kumar & Vassilvitskii, VLDB 2012 ("Densest subgraph in streaming
and MapReduce"): repeatedly delete EVERY vertex whose degree is at most
2(1+ε) times the current average density ρ = |E|/|V|; the best prefix of
this peeling order is a 2(1+ε)-approximation of the maximum-density
subgraph, and the round count is O(log₁₊ε V) because each round removes a
constant fraction of the surviving vertices — THE property that makes the
algorithm MapReduce/Spark-native where Charikar's one-vertex-at-a-time
greedy (2-approx) would need |V| sequential rounds.

Implementation shape: the peeling loop records only each vertex's REMOVAL
ROUND (like K33's condensation levels) — no per-round snapshot is ever
materialized. Afterwards, one pass derives each round's surviving vertex
and edge counts (an edge dies at min(removal_round of endpoints)), the
best round is an O(rounds) driver-side argmax (bounded data: ≤ ~40
scalars even at 10^12 vertices), and the densest set is one filter. Per
round: two frontier semi-joins + one degree hash-agg + one O(1) scalar
agg — the K10 k-core exchange pattern with a data-dependent threshold.

Density convention: ρ = |E|/|V| (half the average degree), matching
Goldberg 1984 / Charikar 2000. Exactness: the returned set's density is
pinned ≥ OPT/(2(1+ε)) against a brute-force exact densest subgraph on
small graphs, and the peeling is fully deterministic (no hash-randomness
— thresholds are pure functions of the data), so the sf0.01 output is
golden-hashed. See tests/test_round3_ops.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pcd_spark.graph.edges import symmetrize
from pcd_spark.graph.partition import adaptive_num_parts


def densest_subgraph(
    edges: DataFrame,
    eps: float = 0.1,
    max_iter: int = 200,
    num_parts: int | None = None,
    small_graph_cutoff: int = 200_000,
    stats_out: dict | None = None,
) -> DataFrame:
    """(vid: long, peel_round: int, in_densest: boolean) for every
    non-isolated vertex. `in_densest` marks the 2(1+ε)-approximate
    densest subgraph; `peel_round` is the round the greedy peel removed
    the vertex (the density ordering — useful on its own as a
    core-decomposition-like signal). stats_out gains: rounds, density
    (of the returned set), best_round.

    Graphs at or below `small_graph_cutoff` edges peel on the driver —
    BIT-IDENTICAL, because the rule is a deterministic pure function of
    the graph (integer degree vs an IEEE-double threshold computed from
    integer counts: the same arithmetic on the driver and in the JVM),
    with no hash-randomness anywhere; equality across both paths is
    pinned in tests/test_round3_ops.py and the sf0.01 golden hash was
    verified unchanged when the path was introduced. Set
    small_graph_cutoff=0 to force the distributed path."""
    if eps <= 0:
        raise ValueError("eps must be > 0")
    edges = edges.persist()
    p = num_parts or adaptive_num_parts(edges)
    sym = symmetrize(edges).repartition(p, "src").persist()
    n_sym = sym.count()

    if n_sym // 2 <= small_graph_cutoff:
        pairs = [
            (r["src"], r["dst"])
            for r in sym.filter(F.col("src") < F.col("dst")).collect()
        ]
        res = _peel_local(pairs, eps, max_iter, stats_out)
        spark = edges.sparkSession
        sym.unpersist()
        edges.unpersist()
        return spark.createDataFrame(
            res, "vid long, peel_round int, in_densest boolean"
        )

    # state: (vid, rr) — rr = removal round, set once, never revisited
    removed = None  # accumulated (vid, rr)
    alive = (
        sym.select(F.col("src").alias("vid")).distinct()
        .localCheckpoint(eager=True)
    )
    r = 0
    while r < max_iter:
        r += 1
        live = sym.join(
            alive.withColumnRenamed("vid", "src").hint("shuffle_hash"),
            "src",
            "leftsemi",
        ).join(
            alive.withColumnRenamed("vid", "dst").hint("shuffle_hash"),
            "dst",
            "leftsemi",
        )
        deg = live.groupBy(F.col("src").alias("vid")).agg(
            F.count("*").alias("deg")
        )
        tot = deg.agg(
            F.coalesce(F.sum("deg"), F.lit(0)).alias("e2"),
            F.count("*").alias("nv"),
        ).first()
        n_alive_with_edges = tot["nv"]
        if n_alive_with_edges == 0:
            # stragglers with no live edges peel in this round
            tail = alive.select("vid", F.lit(r).alias("rr"))
            removed = tail if removed is None else removed.unionByName(tail)
            break
        rho = (tot["e2"] / 2.0) / n_alive_with_edges
        thr = 2.0 * (1.0 + eps) * rho
        # vertices alive but edgeless peel now too (deg 0 <= thr always)
        doomed = (
            alive.join(deg, "vid", "left")
            .filter(F.coalesce("deg", F.lit(0)) <= thr)
            .select("vid", F.lit(r).alias("rr"))
        )
        removed = doomed if removed is None else removed.unionByName(doomed)
        alive = (
            alive.join(doomed.select("vid"), "vid", "leftanti")
            .localCheckpoint(eager=True)
        )
        # lineage/width discipline: removed is reused every later round
        removed = removed.localCheckpoint(eager=True)
    else:
        raise RuntimeError(
            f"densest_subgraph: peeling did not finish in max_iter={max_iter}"
            " rounds; raise max_iter (each round removes a constant fraction,"
            " so this indicates eps too small for the graph)"
        )

    rrv = removed  # (vid, rr) for EVERY vertex
    # per-round survivor counts: V_r = #vertices with rr >= r,
    # E_r = #edges with min(rr_u, rr_v) >= r; both via one groupBy + a
    # bounded driver-side suffix-sum (<= rounds entries)
    vhist = {
        row["rr"]: row["c"]
        for row in rrv.groupBy("rr").agg(F.count("*").alias("c")).collect()
    }
    e1 = edges.filter(F.col("src") != F.col("dst")).select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    ).dropDuplicates(["src", "dst"])
    edeath = (
        e1.join(rrv.withColumnRenamed("vid", "src")
                .withColumnRenamed("rr", "ru"), "src")
        .join(rrv.withColumnRenamed("vid", "dst")
              .withColumnRenamed("rr", "rv"), "dst")
        .select(F.least("ru", "rv").alias("dr"))
        .groupBy("dr")
        .agg(F.count("*").alias("c"))
    )
    ehist = {row["dr"]: row["c"] for row in edeath.collect()}
    rounds = max(vhist)
    best_r, best_d = 1, -1.0
    v_suf = e_suf = 0
    for rr in range(rounds, 0, -1):
        v_suf += vhist.get(rr, 0)
        e_suf += ehist.get(rr, 0)
        d = e_suf / v_suf if v_suf else 0.0
        # ties prefer the LARGER subgraph (smaller rr), so >= on the
        # downward sweep
        if d >= best_d:
            best_d, best_r = d, rr
    if stats_out is not None:
        stats_out["rounds"] = rounds
        stats_out["best_round"] = best_r
        stats_out["density"] = best_d
    out = rrv.select(
        "vid",
        F.col("rr").cast("int").alias("peel_round"),
        (F.col("rr") >= best_r).alias("in_densest"),
    ).localCheckpoint(eager=True)
    sym.unpersist()
    edges.unpersist()
    return out


def _peel_local(pairs, eps: float, max_iter: int, stats_out: dict | None):
    """Driver-side mirror of the distributed peel — the SAME rule
    (delete every vertex with deg <= 2(1+eps)·|E|/|V| per round, all at
    once), so results are identical by determinism."""
    adj: dict[int, set[int]] = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    rr: dict[int, int] = {}
    alive = set(adj)
    n_edges = len(pairs)
    r = 0
    while alive:
        r += 1
        if r > max_iter:
            raise RuntimeError(
                f"densest_subgraph: peeling did not finish in max_iter="
                f"{max_iter} rounds; raise max_iter"
            )
        if n_edges == 0:
            for v in alive:
                rr[v] = r
            alive = set()
            break
        rho = n_edges / len(alive)
        thr = 2.0 * (1.0 + eps) * rho
        doomed = [v for v in alive if len(adj[v] & alive) <= thr]
        for v in doomed:
            rr[v] = r
        dset = set(doomed)
        n_edges -= sum(
            1 for u, v in pairs
            if (u in dset or v in dset) and u in alive and v in alive
        )
        alive -= dset
    rounds = r
    # suffix sweep for the best density prefix (same tie rule: ties
    # prefer the larger subgraph)
    vhist: dict[int, int] = {}
    for v, rv in rr.items():
        vhist[rv] = vhist.get(rv, 0) + 1
    ehist: dict[int, int] = {}
    for u, v in pairs:
        d = min(rr[u], rr[v])
        ehist[d] = ehist.get(d, 0) + 1
    best_r, best_d = 1, -1.0
    v_suf = e_suf = 0
    for rv in range(rounds, 0, -1):
        v_suf += vhist.get(rv, 0)
        e_suf += ehist.get(rv, 0)
        d = e_suf / v_suf if v_suf else 0.0
        if d >= best_d:
            best_d, best_r = d, rv
    if stats_out is not None:
        stats_out["rounds"] = rounds
        stats_out["best_round"] = best_r
        stats_out["density"] = best_d
        stats_out["path"] = "driver-peel"
    return [(v, rr[v], rr[v] >= best_r) for v in sorted(rr)]
