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
