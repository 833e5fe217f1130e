"""K26/K28 — bipartite one-mode projection & butterfly counting (round 2 ext.).

K26 bipartite projection [PUB: Newman 2001 "Scientific collaboration
networks"; Zhou et al. 2007 one-mode projections]: given a bipartite edge
table (center, side), emit the weighted one-mode graph on the `side`
vertices — an edge (u, v, weight) for every pair of side vertices sharing
>= 1 center, weight = number of shared centers. This is the co-citation /
co-purchase / co-authorship construction, the standard way a bipartite
corpus (doc-term, customer-product, repo-dependency) becomes a unipartite
link graph the K-suite can run on.

K28 butterfly counting [PUB: Wang et al. VLDB 2014 "Rectangle counting";
Sanei-Mehri et al. KDD 2018 "Butterfly counting in bipartite networks"]:
a butterfly is a 2x2 biclique (u1, u2 | w1, w2) — the bipartite analogue
of the triangle (bipartite graphs have none) and the base motif of
bipartite clustering coefficients. Per-pair butterflies are C(shared, 2)
over the projection weights, so K28 is one arithmetic column + one
explode-agg on top of K26 — no second join.

Scale shape: the pair join is keyed on the CENTER vertex (the K6/K16
equi-key discipline — never an all-pairs cross). Cost is sum_c deg(c)^2,
dominated by hub centers; always project THROUGH the low-degree side when
the choice exists (e.g. customers as centers, suppliers as sides: millions
of low-degree customers beat thousands of high-degree suppliers). For
adversarial hubs `max_center_degree` caps the fan-out (a center connected
to everything certifies co-membership of nothing — the same inverse-weight
intuition as K16's Adamic-Adar); the default is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bipartite_projection(
    edges: DataFrame,
    max_center_degree: int | None = None,
    min_weight: int = 1,
) -> DataFrame:
    """Weighted one-mode projection onto the `dst` side of a bipartite edge
    table (src = center, dst = side). Returns (u, v, weight) with u < v,
    weight = number of distinct shared centers. To project onto the src
    side, pass edges with the columns swapped.

    Exact for max_center_degree=None; with a cap, pairs certified only by
    centers of degree > cap are dropped (documented per call site).
    """
    # persist the deduped bipartite edges: both sides of the center-keyed
    # pair join (and the optional degree filter) reference them — callers
    # routinely pass a DERIVED table (e.g. the lineitem ⋈ orders customer-
    # supplier graph), and an unpersisted plan re-runs that derivation once
    # per branch (measured: 7 exchanges -> 4 at sf0.1, same output)
    e = edges.select("src", "dst").distinct().persist()
    e.count()
    if max_center_degree is not None:
        cdeg = e.groupBy("src").agg(F.count("*").alias("_cd"))
        e = (
            e.join(
                cdeg.filter(F.col("_cd") <= max_center_degree).select("src"),
                "src",
                "leftsemi",
            )
        )
    a = e.select(F.col("src").alias("c"), F.col("dst").alias("u"))
    b = e.select(F.col("src").alias("c"), F.col("dst").alias("v"))
    pairs = (
        a.join(b, "c")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("weight"))
    )
    if min_weight > 1:
        pairs = pairs.filter(F.col("weight") >= min_weight)
    # materialize the projection NOW so the input cache can be released —
    # returning a lazy plan over a persisted `e` leaks the cached blocks for
    # the session lifetime (ADVICE r2: every k26/k28/k31 driver invocation
    # stacked another copy). localCheckpoint blocks are freed by the
    # ContextCleaner once the caller drops the result, unlike a persist
    # nobody can reach.
    pairs = pairs.localCheckpoint(eager=True)
    e.unpersist()
    return pairs


def butterfly_counts(
    edges: DataFrame, max_center_degree: int | None = None
) -> DataFrame:
    """Per-vertex butterfly counts on the `dst` side: (vid, butterflies)
    where butterflies(v) = number of 2x2 bicliques containing v, i.e.
    sum over co-neighbors u of C(shared_centers(u, v), 2). Vertices in no
    butterfly are omitted. Total butterflies = sum(butterflies) / 2
    (each butterfly contains exactly two dst-side vertices).
    """
    proj = bipartite_projection(edges, max_center_degree=max_center_degree)
    per_pair = proj.filter(F.col("weight") >= 2).select(
        "u",
        "v",
        (F.col("weight") * (F.col("weight") - 1) / 2).cast("long").alias("bf"),
    )
    return (
        per_pair.select(
            F.explode(F.array("u", "v")).alias("vid"), "bf"
        )
        .groupBy("vid")
        .agg(F.sum("bf").alias("butterflies"))
    )


def butterfly_total(edges: DataFrame, max_center_degree: int | None = None) -> int:
    """Global butterfly count of the bipartite graph."""
    row = (
        bipartite_projection(edges, max_center_degree=max_center_degree)
        .agg(
            F.sum(
                (F.col("weight") * (F.col("weight") - 1) / 2).cast("long")
            ).alias("t")
        )
        .first()
    )
    return int(row["t"] or 0)
