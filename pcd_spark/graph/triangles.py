"""K6 — triangle counting (SURVEY.md §2 K6; Suri & Vassilvitskii 2011).

Degree-ordered orientation kills hub blowup: orient each undirected edge
from the lower-(degree, vid) endpoint to the higher one. Every triangle has
exactly one wedge a→b, a→c with (b→c) oriented, so each is enumerated once.
Wedge fan-out per vertex is bounded by its *oriented out-degree* = O(sqrt(m))
on any graph — the classic trick that makes this survive power-law skew.

Composition: C7 self-join (wedges) → C1 closing join → D1 counts.
All JVM-side; zero Python in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pcd_spark.graph.edges import canonical_undirected, vertices_of


# degree tables up to this many vertices are broadcast into the orientation
# joins (deg is O(V) — two ints per vertex; ~16 MB at this cap). Above it,
# fall back to shuffle joins: at 10^12 vertices a broadcast would be absurd.
_BCAST_DEG_MAX_V = 2_000_000

# oriented edge tables up to this many rows are broadcast into the closing
# join. The wedge side is O(Σ out-deg²) — 82M rows on the sf0.1 co-occurrence
# graph vs 1.2M closing edges — and the default SortMergeJoin SORTS the wedge
# side (measured: 27 s of the 25-30 s k6 total). Broadcasting the closing
# side keeps wedges pipelined in their generating stage: zero exchange, zero
# sort of the big side. Above the cap, a shuffle_hash hint still avoids the
# wedge sort (hash table builds on the small closing partitions).
_BCAST_CLOSING_MAX_E = 5_000_000


def _oriented(canon: DataFrame, broadcast_degrees: bool | None = None) -> DataFrame:
    """Orient canonical undirected edges low→high by (degree, vid).

    `canon` must already be the canonical_undirected normal form (the caller
    persists it — it is referenced by the degree agg AND both orientation
    joins). The O(V) degree table is broadcast when small (None = auto by a
    cheap count over the persisted deg), turning the two orientation joins
    into map-side hash joins with zero shuffle of the O(E) edge side."""
    both = canon.unionByName(
        canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = (
        both.groupBy(F.col("src").alias("vid"))
        .agg(F.count("*").alias("deg"))
        .persist()
    )
    n_v = deg.count()
    if broadcast_degrees is None:
        broadcast_degrees = n_v <= _BCAST_DEG_MAX_V
    d = F.broadcast(deg) if broadcast_degrees else deg
    e = (
        canon.join(d.withColumnRenamed("vid", "src").withColumnRenamed("deg", "ds"), "src")
        .join(d.withColumnRenamed("vid", "dst").withColumnRenamed("deg", "dd"), "dst")
    )
    keep = (F.col("ds") < F.col("dd")) | (
        (F.col("ds") == F.col("dd")) & (F.col("src") < F.col("dst"))
    )
    return e.select(
        F.when(keep, F.col("src")).otherwise(F.col("dst")).alias("u"),
        F.when(keep, F.col("dst")).otherwise(F.col("src")).alias("v"),
    )


def triangle_counts(
    edges: DataFrame, broadcast_degrees: bool | None = None
) -> DataFrame:
    """Exact per-vertex triangle counts (vid: long, tri: long); vertices in
    no triangle get 0. Global count = sum(tri)/3 (each triangle touches 3).

    The input is persisted before anything else: callers routinely pass a
    DERIVED edge table (e.g. the lineitem co-occurrence join), and this
    algorithm references it three times (canonical form, degree table,
    vertex universe) — unpersisted, round 1 re-ran the whole derivation each
    time, which was most of its 79 s bench cost."""
    e = edges.persist()
    canon = canonical_undirected(e).persist()
    canon.count()
    o = _oriented(canon, broadcast_degrees).persist()
    n_o = o.count()

    # Ordered wedges (a→b, a→c), b≠c; the closing edge b→c exists in exactly
    # one orientation, so joining on (b, c) counts each triangle once — at
    # its lowest-(degree, vid) apex.
    a = o.select(F.col("u").alias("a"), F.col("v").alias("b"))
    b = o.select(F.col("u").alias("a"), F.col("v").alias("c"))
    wedges = a.join(b, "a").filter(F.col("b") != F.col("c"))
    closing = o.select(F.col("u").alias("b"), F.col("v").alias("c"))
    # never sort the O(deg²) wedge side: broadcast the closing edges when
    # they fit, else hash-join them (see _BCAST_CLOSING_MAX_E)
    closing = (
        F.broadcast(closing)
        if n_o <= _BCAST_CLOSING_MAX_E
        else closing.hint("shuffle_hash")
    )
    tris = wedges.join(closing, ["b", "c"])  # rows (a, b, c) = one triangle

    per_vertex = (
        tris.select(F.explode(F.array("a", "b", "c")).alias("vid"))
        .groupBy("vid")
        .agg(F.count("*").alias("tri"))
    )
    out = (
        vertices_of(e)  # reads the persisted input, not the raw lineage
        .join(per_vertex, "vid", "left")
        .select("vid", F.coalesce("tri", F.lit(0)).alias("tri"))
    )
    return out


def triangle_total(edges: DataFrame) -> int:
    """Global triangle count."""
    row = triangle_counts(edges).agg((F.sum("tri") / 3).cast("long").alias("t")).first()
    return int(row["t"] or 0)


def triangle_list(
    edges: DataFrame, broadcast_degrees: bool | None = None
) -> DataFrame:
    """Every triangle exactly once as its SORTED vertex triple
    (t1 < t2 < t3) — the enumeration K53 clique percolation consumes.
    Same oriented-wedge plan as triangle_counts (each triangle emitted at
    its lowest-(degree, vid) apex, closing edges broadcast when they fit);
    the sort is an array_sort over three elements, overflow-safe for
    signed hashed vids (no arithmetic trick)."""
    e = edges.persist()
    canon = canonical_undirected(e).persist()
    canon.count()
    o = _oriented(canon, broadcast_degrees).persist()
    n_o = o.count()
    a = o.select(F.col("u").alias("a"), F.col("v").alias("b"))
    b = o.select(F.col("u").alias("a"), F.col("v").alias("c"))
    wedges = a.join(b, "a").filter(F.col("b") != F.col("c"))
    closing = o.select(F.col("u").alias("b"), F.col("v").alias("c"))
    closing = (
        F.broadcast(closing)
        if n_o <= _BCAST_CLOSING_MAX_E
        else closing.hint("shuffle_hash")
    )
    srt = F.array_sort(F.array("a", "b", "c"))
    out = (
        wedges.join(closing, ["b", "c"])
        .select(
            srt.getItem(0).alias("t1"),
            srt.getItem(1).alias("t2"),
            srt.getItem(2).alias("t3"),
        )
        .localCheckpoint(eager=True)
    )
    o.unpersist()
    canon.unpersist()
    e.unpersist()
    return out


def approx_triangle_total(
    edges: DataFrame,
    p_num: int = 1,
    p_den: int = 4,
    seed: int = 42,
) -> dict:
    """K48 — DOULION approximate GLOBAL triangle count [PUB: Tsourakakis,
    Kang, Miller & Faloutsos, KDD 2009 "DOULION: counting triangles in
    massive graphs with a coin"]: keep each canonical edge with
    probability p = p_num/p_den, count triangles EXACTLY on the sparsified
    graph, return T_sparse / p³ — an unbiased estimator whose variance
    vanishes on triangle-rich graphs while the expensive oriented-wedge
    join runs on a p²-smaller wedge set (p=1/4 → 16× fewer wedges, the
    regime where exact K6 at 10^12 edges stops being affordable).

    The coin is the engine's hash-random discipline: an edge survives iff
    `pmod(xxhash64(src, dst, seed), p_den) < p_num` — a pure function of
    the edge, so the estimate is ONE number at any parallelism/partition
    count (pinned by golden hash), reproducible across reruns, and the
    sample composes with resume. p_num == p_den degenerates to the exact
    count (identity pinned in tests).

    Returns {"estimate": float, "sampled_triangles": int,
    "sampled_edges": int, "p": float}.
    """
    if not (0 < p_num <= p_den):
        raise ValueError("need 0 < p_num <= p_den")
    canon = canonical_undirected(edges)
    if p_num < p_den:
        canon = canon.filter(
            F.pmod(
                F.xxhash64(F.col("src"), F.col("dst"), F.lit(seed)),
                F.lit(p_den),
            )
            < p_num
        )
    canon = canon.persist()
    n_e = canon.count()
    tri = triangle_counts(canon)
    t_sparse = int(tri.agg((F.sum("tri") / 3).cast("long")).first()[0] or 0)
    canon.unpersist()
    p = p_num / p_den
    return {
        "estimate": t_sparse / (p ** 3),
        "sampled_triangles": t_sparse,
        "sampled_edges": n_e,
        "p": p,
    }
