"""K44 — local community detection: personalized-PageRank sweep
(PageRank-Nibble) [PUB: Andersen, Chung & Lang, FOCS 2006; Leskovec et al.
2009 use exactly this sweep to draw NCP plots].

The practical community-detection query at web scale: nobody runs global
Louvain over 10^12 edges to answer "what is the community around THIS
repo/user/page" — one seeds a personalized PageRank, orders vertices by
degree-normalized rank, and returns the prefix with the best (lowest)
conductance. ACL06 prove sweep prefixes of an approximate PPR vector find
a set whose conductance is near-optimal around the seed.

Scale shape (what is distributed and what deliberately is not):
  1. the PPR itself is the engine's K14 superstep path — one wide shuffle
     per iteration, all the checkpoint/resume machinery applies;
  2. degrees are ONE hash agg (K1);
  3. the candidate pool is the top `max_candidates` vertices by
     rank/degree — a bounded top-k (TakeOrderedAndProject, no global
     sort), because ACL06's sweep only ever needs the high-score head;
  4. the candidate-induced edges are TWO broadcast semi-joins of the
     canonical edge table against the O(max_candidates) candidate set —
     edge-table-sized scans, candidate-sized output;
  5. the prefix sweep itself runs driver-side over O(max_candidates)
     rows + O(induced edges) — bounded data, same O(k·dim)/O(P)
     discipline as the k-means centroids and global_rank offsets. A
     distributed sweep would shuffle the edge table once per prefix for
     no benefit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pcd_spark.graph.edges import canonical_undirected
from pcd_spark.graph.pagerank import pagerank


def local_community(
    edges: DataFrame,
    seed: int,
    damping: float = 0.85,
    tol: float = 1e-10,
    max_candidates: int = 500,
    stats_out: dict | None = None,
) -> DataFrame:
    """Returns DataFrame(vid, position, ppr, phi_prefix, in_community) for
    the sweep-ordered candidate prefix around `seed`: `in_community` marks
    the best-conductance prefix; `phi_prefix` is the conductance of the
    prefix ENDING at that row (rounded 8 dp). Deterministic: sweep order
    is (rank/degree DESC, vid ASC).

    The graph is treated as undirected (canonical form + both directions),
    matching the conductance semantics of K31.
    """
    canon = canonical_undirected(edges).persist()
    sym = canon.unionByName(
        canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy(F.col("src").alias("vid")).agg(
        F.count("*").alias("deg")
    )

    ppr = pagerank(sym, damping=damping, tol=tol, sources=[int(seed)])
    scored = (
        ppr.join(deg, "vid")
        .filter(F.col("rank") > 0)
        .select("vid", "deg", (F.col("rank") / F.col("deg")).alias("score"),
                F.col("rank").alias("ppr"))
    )
    # bounded top-k head (TakeOrderedAndProject) — the only rows the ACL06
    # sweep can ever select from
    cand = scored.orderBy(F.desc("score"), F.asc("vid")).limit(
        int(max_candidates)
    )
    cand_rows = cand.collect()  # O(max_candidates) driver data, by design

    cand_df = edges.sparkSession.createDataFrame(
        [(int(r["vid"]),) for r in cand_rows], "vid long"
    )
    induced = (
        canon.join(
            F.broadcast(cand_df.withColumnRenamed("vid", "src")), "src",
            "leftsemi",
        )
        .join(
            F.broadcast(cand_df.withColumnRenamed("vid", "dst")), "dst",
            "leftsemi",
        )
        .select("src", "dst")
        .collect()
    )
    two_m = sym.count()  # = 2m of the full graph
    canon.unpersist()

    # driver-side incremental sweep over bounded data:
    # vol(S_k) = vol(S_{k-1}) + deg(v_k)
    # cut(S_k) = cut(S_{k-1}) + deg(v_k) - 2 * |edges(v_k, S_{k-1})|
    order = [int(r["vid"]) for r in cand_rows]
    pos = {v: i for i, v in enumerate(order)}
    nbrs_in_cand: dict = {v: [] for v in order}
    for e in induced:
        u, w = int(e["src"]), int(e["dst"])
        nbrs_in_cand[u].append(w)
        nbrs_in_cand[w].append(u)
    degs = {int(r["vid"]): int(r["deg"]) for r in cand_rows}
    vol = cut = 0
    phis: list = []
    in_set: set = set()
    for v in order:
        internal = sum(1 for w in nbrs_in_cand[v] if w in in_set)
        vol += degs[v]
        cut += degs[v] - 2 * internal
        in_set.add(v)
        # denom == 0 means S is the whole (non-isolated) graph — NOT a
        # community; unlike K31 (which scores a given labeling and maps
        # this to 0.0) the sweep MINIMIZES phi, so the degenerate prefix
        # must rank worst, not best
        denom = min(vol, two_m - vol)
        phis.append(cut / denom if denom > 0 else float("inf"))
    best_k = min(range(len(order)), key=lambda i: (phis[i], i)) if order else -1
    if stats_out is not None:
        stats_out["seed"] = int(seed)
        stats_out["candidates"] = len(order)
        stats_out["best_prefix"] = best_k + 1
        stats_out["best_phi"] = phis[best_k] if order else None

    rows = [
        (
            order[i],
            i + 1,
            round(float(cand_rows[i]["ppr"]), 10),
            round(float(phis[i]), 8),
            i <= best_k,
        )
        for i in range(len(order))
    ]
    return edges.sparkSession.createDataFrame(
        rows,
        "vid long, position int, ppr double, phi_prefix double, "
        "in_community boolean",
    )
