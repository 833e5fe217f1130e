"""K19 — neighbor feature aggregation (round 2 ext.).

One GraphSAGE-style message-passing layer [PUB: Hamilton et al. 2017
GraphSAGE; Kipf & Welling 2017 GCN]: per vertex, the elementwise
mean/sum/min/max of its neighbors' feature vectors — how a link graph
turns per-node embeddings into training features (and the building block
of distributed GNN inference: stack L calls for an L-hop receptive field).

Physical shape (the same explode→hash-agg discipline as v5 k-means'
update step): features join onto the src side of the symmetrized edges
(vid-keyed), posexplode to (dst, pos, val) IN THE SAME STAGE as the
partial aggregation — the shuffle carries k·dim partial rows per map
partition, never whole vectors per edge — then one partition-local
array re-assembly (sort_array over (pos, val) structs, all JVM-side).
No Python in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pcd_spark.graph.edges import symmetrize

_AGGS = {"mean": F.avg, "sum": F.sum, "min": F.min, "max": F.max}


def neighbor_feature_agg(
    edges: DataFrame,
    features: DataFrame,
    id_col: str = "vid",
    vec_col: str = "emb",
    agg: str = "mean",
    directed: bool = False,
    round_to: int | None = None,
) -> DataFrame:
    """Returns (vid, n_neighbors: long, agg_emb: array<double>) for every
    vertex with >= 1 neighbor that HAS features. For directed graphs the
    aggregation is over in-neighbors of dst (messages flow src -> dst).
    Neighbors without a feature row contribute nothing (inner join) —
    mirror semantics in any oracle."""
    if agg not in _AGGS:
        raise ValueError(f"agg must be one of {sorted(_AGGS)}")
    fn = _AGGS[agg]
    feats = features.select(
        F.col(id_col).alias("src"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    adj = edges.select("src", "dst") if directed else symmetrize(edges)
    adj = adj.dropDuplicates(["src", "dst"])
    msgs = adj.join(feats, "src").select(
        F.col("dst").alias("vid"), F.posexplode("_v").alias("pos", "val")
    )
    per_dim = msgs.groupBy("vid", "pos").agg(
        fn("val").alias("v"), F.count("*").alias("c")
    )
    v = F.round("v", round_to) if round_to is not None else F.col("v")
    packed = (
        per_dim.select("vid", F.struct("pos", v.alias("v")).alias("pv"), "c")
        .groupBy("vid")
        .agg(
            F.max("c").alias("n_neighbors"),
            F.transform(
                F.array_sort(F.collect_list("pv")), lambda s: s["v"]
            ).alias("agg_emb"),
        )
    )
    return packed.select("vid", "n_neighbors", "agg_emb")
