"""K45 — deterministic greedy maximal matching (heavy-edge capable).

Distributed locally-minimal-edge matching [PUB: Israeli & Itai 1986, "A fast
and simple randomized parallel algorithm for maximal matching"; Preis 1999
locally-heaviest-edge ½-approx], derandomized the engine's standard way: the
edge priority is `struct(-weight, xxhash64(src, dst, seed), src, dst)` — a
pure function of the edge, so the result is identical at any parallelism and
partition count (the K18/K29/K30/C10 hash-random discipline).

Round r: every undecided vertex points at the minimum-priority live edge
incident to it (heaviest weight first, hash tiebreak); an edge whose BOTH
endpoints point at it joins the matching and both endpoints settle; a vertex
with no live incident edge left settles unmatched. The globally min-priority
live edge is always chosen by both of its endpoints, so every round matches
at least one edge; with hash-random tiebreaks a constant fraction of live
edges drops per round in expectation (O(log V) rounds typical).

Why the engine carries it: matching IS the coarsening primitive of multilevel
graph methods — METIS-style heavy-edge matching contracts matched pairs into
supervertices between Louvain/partitioning levels [PUB: Karypis & Kumar
1998], and the locally-heaviest rule is a ½-approximation of maximum-weight
matching (Preis), so `total matched weight >= max_weight_matching / 2` is a
checkable property (pinned vs networkx in tests/test_round3_ops.py).

Per superstep: two leftsemi joins restrict edges to the undecided frontier
(cost O(live edges), shrinking geometrically), one min-struct hash-agg picks
each vertex's edge (map-side combinable), and the mutual-choice check is a
count==2 hash-agg over chosen edges — no window, no collect, nothing keyed
wider than a vertex id. Scale shape at 10^12 edges: identical to MIS/LPA —
the frontier join is the engine's bread-and-butter superstep exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pcd_spark.graph.partition import adaptive_num_parts
from pcd_spark.graph.superstep import run_supersteps
from pcd_spark.storage import CheckpointStore

_UNDECIDED, _MATCHED, _UNMATCHED = 0, 1, 2


def maximal_matching(
    edges: DataFrame,
    weight_col: str | None = None,
    seed: int = 42,
    max_iter: int = 200,
    num_parts: int | None = None,
    store: CheckpointStore | None = None,
    checkpoint_every: int = 10,
    small_graph_cutoff: int = 200_000,
    stats_out: dict | None = None,
) -> DataFrame:
    """Deterministic maximal matching: (vid: long, matched: boolean,
    partner: long|null). `partner` is symmetric (partner[partner[v]] == v)
    and each vertex appears exactly once. With `weight_col` the rule is
    locally-HEAVIEST edge (ties by hash), i.e. Preis's ½-approximation of
    maximum-weight matching; without it, all weights are 1 and the result
    is a plain maximal matching (>= ½ of maximum cardinality). Isolated
    vertices (no edges at all) are not represented (graph-normal-form
    convention shared by the whole K suite).

    Graphs at or below `small_graph_cutoff` edges run sequential greedy on
    the driver instead of distributed rounds — RESULT-IDENTICAL, because
    the locally-minimal parallel algorithm computes exactly the greedy
    matching of the fixed priority order [PUB: Blelloch, Fineman & Shun,
    SPAA 2012, "Greedy sequential maximal independent set and matching are
    parallel on average"]; equality is pinned across both paths in
    tests/test_round3_ops.py. The O(superstep) fixed cost only pays for
    itself when the edge table doesn't fit one task; 200k edges is ~3 MB.
    Set small_graph_cutoff=0 to force the distributed path."""
    edges = edges.persist()
    p = num_parts or adaptive_num_parts(edges)

    w = (
        F.col(weight_col).cast("double")
        if weight_col
        else F.lit(1.0)
    )
    # canonical undirected WITH weight: (min,max) once, parallel edges keep
    # their max weight (deterministic, and the right semantics for
    # heavy-edge coarsening — the strongest tie wins)
    ce = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            w.alias("w"),
        )
        .groupBy("src", "dst")
        .agg(F.max("w").alias("w"))
        .select(
            "src",
            "dst",
            F.struct(
                (-F.col("w")).alias("nw"),
                F.xxhash64(F.col("src"), F.col("dst"), F.lit(seed)).alias("h"),
                F.col("src").alias("u"),
                F.col("dst").alias("v"),
            ).alias("e"),
        )
        .repartition(p, "src")
        .persist()
    )
    n_edges = ce.count()
    _gtok = f"edges={n_edges}"

    if n_edges <= small_graph_cutoff:
        rows = ce.select("e.nw", "e.h", "e.u", "e.v").collect()
        rows.sort(key=lambda r: (r["nw"], r["h"], r["u"], r["v"]))
        partner: dict[int, int] = {}
        verts: set[int] = set()
        for r in rows:
            u, v = r["u"], r["v"]
            verts.add(u)
            verts.add(v)
            if u not in partner and v not in partner:
                partner[u] = v
                partner[v] = u
        out_rows = [
            (vid, vid in partner, partner.get(vid)) for vid in sorted(verts)
        ]
        if stats_out is not None:
            stats_out["iterations"] = 0
            stats_out["path"] = "greedy-sequential"
        ce.unpersist()
        edges.unpersist()
        spark = edges.sparkSession
        return spark.createDataFrame(
            out_rows, "vid long, matched boolean, partner long"
        )

    init = (
        ce.select(F.col("src").alias("vid"))
        .unionByName(ce.select(F.col("dst").alias("vid")))
        .distinct()
        .select(
            "vid",
            F.lit(_UNDECIDED).alias("status"),
            F.lit(None).cast("long").alias("partner"),
            F.lit(1.0).alias("_delta"),
        )
    )

    def step(state: DataFrame, i: int) -> DataFrame:
        und = state.filter(F.col("status") == _UNDECIDED).select("vid")
        live = ce.join(
            und.withColumnRenamed("vid", "src").hint("shuffle_hash"),
            "src",
            "leftsemi",
        ).join(
            und.withColumnRenamed("vid", "dst").hint("shuffle_hash"),
            "dst",
            "leftsemi",
        )
        inc = live.select(F.col("src").alias("vid"), "e").unionByName(
            live.select(F.col("dst").alias("vid"), "e")
        )
        best = inc.groupBy("vid").agg(F.min("e").alias("be"))
        # an edge chosen by BOTH endpoints joins the matching (an edge has
        # exactly two endpoints, so count==2 is the mutual-choice test)
        pairs = (
            best.groupBy(F.col("be.u").alias("u"), F.col("be.v").alias("v"))
            .agg(F.count("*").alias("c"))
            .filter(F.col("c") == 2)
        )
        upd = (
            pairs.select(
                F.col("u").alias("vid"),
                F.lit(_MATCHED).alias("ns"),
                F.col("v").alias("np"),
            )
            .unionByName(
                pairs.select(
                    F.col("v").alias("vid"),
                    F.lit(_MATCHED).alias("ns"),
                    F.col("u").alias("np"),
                )
            )
            .unionByName(
                # undecided vertices with no live incident edge settle
                # unmatched (all their neighbors are already decided)
                und.join(best, "vid", "leftanti").select(
                    "vid",
                    F.lit(_UNMATCHED).alias("ns"),
                    F.lit(None).cast("long").alias("np"),
                )
            )
        )
        st2 = F.when(
            (F.col("status") == _UNDECIDED) & F.col("ns").isNotNull(),
            F.col("ns"),
        ).otherwise(F.col("status"))
        return state.join(upd.hint("shuffle_hash"), "vid", "left").select(
            "vid",
            st2.alias("status"),
            F.coalesce("partner", "np").alias("partner"),
            F.when(st2 == _UNDECIDED, 1.0).otherwise(0.0).alias("_delta"),
        )

    final, iters, metrics = run_supersteps(
        init, step, tol=0.5, max_iter=max_iter,
        store=store, checkpoint_every=checkpoint_every, graph_token=_gtok,
    )
    if stats_out is not None:
        stats_out["iterations"] = iters
        stats_out["metrics"] = metrics
    out = final.select(
        "vid", (F.col("status") == _MATCHED).alias("matched"), "partner"
    ).localCheckpoint(eager=True)
    ce.unpersist()
    edges.unpersist()
    return out


def coarsen_graph(
    edges: DataFrame,
    matching: DataFrame,
    weight_col: str | None = None,
) -> DataFrame:
    """K46 — contract a matching into a coarse graph (the multilevel
    coarsening step [PUB: Karypis & Kumar 1998 §3; Hendrickson & Leland
    1995]): each matched pair becomes one supervertex named min(vid,
    partner), unmatched vertices carry over, parallel coarse edges merge
    with SUMMED weight, and intra-pair edges vanish (they are the
    contracted matching edges). Output: (src, dst, weight) canonical
    undirected with src < dst; total weight is conserved minus exactly the
    contracted edges' weight — the checkable conservation law pinned in
    tests/test_round3_ops.py.

    Scale shape: the vertex->supervertex map is one projection of the
    matching result (no join needed to build it), applied to the edge
    table via two hash equi-joins on the endpoints, then ONE hash agg on
    the coarse key pair — the same cost as a single LPA superstep. Applied
    log(V) times this is the full METIS-style coarsening ladder, each
    level roughly halving V while the engine's algorithms (Louvain, LPA,
    partitioning) run on the shrunken graph and project back."""
    vmap = matching.select(
        "vid",
        F.when(
            F.col("partner").isNotNull(), F.least("vid", "partner")
        ).otherwise(F.col("vid")).alias("sv"),
    )
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    e = edges.filter(F.col("src") != F.col("dst")).select(
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
        w.alias("w"),
    )
    return (
        # left joins + coalesce: a vertex absent from the matching table
        # (e.g. edges added after the matching ran) maps to itself rather
        # than silently dropping its edges
        e.join(vmap.withColumnRenamed("vid", "src")
               .withColumnRenamed("sv", "ssv"), "src", "left")
        .join(vmap.withColumnRenamed("vid", "dst")
              .withColumnRenamed("sv", "dsv"), "dst", "left")
        .select(
            F.coalesce("ssv", F.col("src")).alias("ssv"),
            F.coalesce("dsv", F.col("dst")).alias("dsv"),
            "w",
        )
        .filter(F.col("ssv") != F.col("dsv"))
        .select(
            F.least("ssv", "dsv").alias("src"),
            F.greatest("ssv", "dsv").alias("dst"),
            "w",
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("weight"))
    )
