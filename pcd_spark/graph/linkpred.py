"""K16/K17 — link prediction & degree assortativity (round 2 ext.).

K16 link prediction [PUB: Liben-Nowell & Kleinberg 2003; Adamic & Adar
2003]: for every non-adjacent pair (u, v) sharing >= 1 neighbor,
    common_neighbors = |N(u) ∩ N(v)|
    jaccard          = |N(u) ∩ N(v)| / |N(u) ∪ N(v)|
    adamic_adar      = Σ_{w ∈ N(u) ∩ N(v)} 1 / ln(deg(w))
(wedge centers have deg >= 2 by construction, so ln(deg) > 0).

Scale shape: candidate pairs come from a wedge self-join keyed on the
CENTER vertex — the same equi-key discipline as K6's wedge enumeration, so
cost is Σ_w deg(w)², never |V|². That sum is dominated by hub centers;
`max_center_degree` caps it (standard practice in production link
prediction — a w connected to everyone certifies nothing about u~v
anyway, exactly the inverse-log intuition behind Adamic-Adar). The
default is exact; the cap changes results only by dropping
hub-certified candidates, documented per call site.

K17 degree assortativity [PUB: Newman 2002 "Assortative mixing in
networks"]: Pearson correlation of the degrees at the two ends of each
edge, each undirected edge counted in both directions (networkx
degree_assortativity_coefficient semantics). Closed form: one O(V)
degree table joined onto the edge list twice (vid-keyed), then a single
global aggregation of the five Pearson sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pcd_spark.graph.edges import canonical_undirected


def _sym_deg(edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    canon = canonical_undirected(edges)
    sym = canon.unionByName(
        canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy(F.col("src").alias("vid")).agg(F.count("*").alias("deg"))
    return sym, deg


def link_prediction(
    edges: DataFrame,
    max_center_degree: int | None = None,
    round_to: int = 8,
) -> DataFrame:
    """Returns (u, v, common_neighbors, jaccard, adamic_adar) for all
    non-adjacent pairs with >= 1 common neighbor, u < v canonical."""
    sym, deg = _sym_deg(edges)
    sym = sym.persist()
    deg = deg.persist()

    # adjacency w -> nbr, center-degree attached once (vid-keyed join)
    adj = sym.join(deg.withColumnRenamed("vid", "src"), "src").select(
        F.col("src").alias("w"), F.col("dst").alias("nbr"), F.col("deg").alias("dw")
    )
    if max_center_degree is not None:
        adj = adj.filter(F.col("dw") <= max_center_degree)

    a = adj.select("w", F.col("nbr").alias("u"), "dw")
    b = adj.select("w", F.col("nbr").alias("v"))
    pairs = (
        a.join(b, "w")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(
            F.count("*").alias("common_neighbors"),
            F.sum(1.0 / F.log(F.col("dw"))).alias("aa"),
        )
    )
    # drop pairs that are already edges (canonical u < v matches sym rows)
    cand = pairs.join(
        sym.select(F.col("src").alias("u"), F.col("dst").alias("v")),
        ["u", "v"],
        "left_anti",
    )
    du = deg.select(F.col("vid").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("vid").alias("v"), F.col("deg").alias("dv"))
    out = (
        cand.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            "common_neighbors",
            F.round(
                F.col("common_neighbors")
                / (F.col("du") + F.col("dv") - F.col("common_neighbors")),
                round_to,
            ).alias("jaccard"),
            F.round("aa", round_to).alias("adamic_adar"),
        )
    )
    return out


def degree_assortativity(edges: DataFrame, round_to: int | None = None):
    """Scalar Newman degree-assortativity r of the undirected graph; returns
    a 1-row DataFrame(r: double). r is NaN-free: degenerate graphs (all
    degrees equal -> zero variance) return r = 0.0 by convention."""
    sym, deg = _sym_deg(edges)
    pairs = (
        sym.join(
            deg.select(F.col("vid").alias("src"), F.col("deg").alias("x")), "src"
        )
        .join(deg.select(F.col("vid").alias("dst"), F.col("deg").alias("y")), "dst")
        .select(F.col("x").cast("double").alias("x"), F.col("y").cast("double").alias("y"))
    )
    s = pairs.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.col("sxy") / F.col("n") - (F.col("sx") / F.col("n")) * (
        F.col("sy") / F.col("n")
    )
    varx = F.col("sxx") / F.col("n") - F.pow(F.col("sx") / F.col("n"), 2)
    vary = F.col("syy") / F.col("n") - F.pow(F.col("sy") / F.col("n"), 2)
    r = F.when(
        (varx > 1e-15) & (vary > 1e-15), num / F.sqrt(varx * vary)
    ).otherwise(F.lit(0.0))
    if round_to is not None:
        r = F.round(r, round_to)
    return s.select(r.alias("r"))


def simrank(
    edges: DataFrame,
    c: float = 0.6,
    max_iter: int = 25,
    eps: float = 0.0,
    num_parts: int | None = None,
    stats_out: dict | None = None,
) -> DataFrame:
    """K58 — SimRank structural similarity [PUB: Jeh & Widom KDD 2002
    "SimRank: a measure of structural-context similarity"]: the RECURSIVE
    member of the vertex-similarity family (K16's CN/Jaccard/Adamic-Adar
    are one-hop local scores): two vertices are similar when their
    neighbors are similar —

        S(u,v) = c / (|N(u)||N(v)|) * sum_{a in N(u), b in N(v)} S(a,b),
        S(u,u) = 1.

    Fixed-iteration synchronous evaluation from S_0 = I (the standard
    power-method form; error after k rounds is <= c^k, so max_iter=25 at
    c=0.6 is < 3e-6 from the fixpoint). Returns DataFrame(u, v, s) for
    pairs with s > 0, u < v (the diagonal is identically 1 and omitted).

    `eps` > 0 enables the standard THRESHOLD SIEVE: off-diagonal scores
    below eps are dropped at the end of each round, bounding the state to
    meaningfully-similar pairs instead of the dense O(V^2) limit (per-pair
    error <= eps * c/(1-c) on top of the c^k truncation). The sieve is a
    deterministic rule, so the numpy mirror in tests applies the identical
    sieve and parity stays exact.

    Scale note: SimRank state is inherently O(V^2)-dense in the limit —
    at 10^12 edges it runs on ego/cohort SUBGRAPHS by design, the same
    bounded-cohort pattern as K52's structural holes and K23's sampled
    betweenness (production systems use random-walk approximations for
    the global form; this is the exact evaluator those are checked
    against). Per round the plan is two equi joins (state pair ->
    neighbor pair) + one (u,v) hash-agg — map-side-combinable, no
    cartesian; state rows carry only (u, v, s).
    """
    from pcd_spark.graph.edges import symmetrize
    from pcd_spark.graph.partition import adaptive_num_parts

    sym = symmetrize(edges)
    p = num_parts or adaptive_num_parts(sym)
    adj = sym.repartition(p, "src").persist()
    deg = (
        adj.groupBy(F.col("src").alias("vid"))
        .agg(F.count("*").alias("deg"))
        .persist()
    )
    verts = deg.select("vid")
    # S_0 = identity, kept as the sparse off-diagonal state + implicit diag
    state = None  # off-diagonal rows (u, v, s) with u < v; None = empty
    diag = verts.select(
        F.col("vid").alias("u"), F.col("vid").alias("v"), F.lit(1.0).alias("s")
    )

    def full(st):
        # diagonal + both orientations of the off-diagonal rows
        if st is None:
            return diag
        return diag.unionByName(st).unionByName(
            st.select(F.col("v").alias("u"), F.col("u").alias("v"), "s")
        )

    it = 0
    for it in range(1, max_iter + 1):
        msgs = (
            full(state)
            .join(adj.select(F.col("src").alias("u"), F.col("dst").alias("nu")), "u")
            .join(adj.select(F.col("src").alias("v"), F.col("dst").alias("nv")), "v")
            .select(F.col("nu").alias("u2"), F.col("nv").alias("v2"), "s")
            .filter(F.col("u2") < F.col("v2"))
            .repartition(p, "u2", "v2")
            .groupBy("u2", "v2")
            .agg(F.sum("s").alias("acc"))
        )
        nxt = (
            msgs.join(deg.select(F.col("vid").alias("u2"), F.col("deg").alias("du")), "u2")
            .join(deg.select(F.col("vid").alias("v2"), F.col("deg").alias("dv")), "v2")
            .select(
                F.col("u2").alias("u"),
                F.col("v2").alias("v"),
                (F.lit(float(c)) * F.col("acc") / (F.col("du") * F.col("dv"))).alias("s"),
            )
        )
        if eps > 0:
            nxt = nxt.filter(F.col("s") >= eps)
        state = nxt.localCheckpoint(eager=True)
    adj.unpersist()
    deg.unpersist()
    if stats_out is not None:
        stats_out["iterations"] = it
    if state is None:
        return diag.filter(F.lit(False)).select("u", "v", "s")
    return state.select("u", "v", "s")
