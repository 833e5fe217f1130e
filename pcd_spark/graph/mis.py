"""K29 — maximal independent set, deterministic Luby (round 2 ext.).

Luby's parallel MIS [PUB: Luby 1986, "A simple parallel algorithm for the
maximal independent set problem"], derandomized the engine's standard way:
the per-round random priority is `xxhash64(vid, round, seed)` — a pure
function of (vertex, round), so the result is identical at any parallelism
and any partition count, with no RNG state to coordinate (the same
hash-random discipline as K18's walks and C10's salting).

Round r: an undecided vertex joins the MIS iff its (priority, vid) pair is
strictly smaller than every undecided neighbor's; its neighbors become
excluded. The global minimum always wins its neighborhood, so every round
decides >= 1 vertex and in expectation a constant fraction of edges drops
(Luby's analysis); termination <= |V| rounds, typically O(log V).

MIS is the classic symmetry-breaking primitive — scheduling sets of
non-adjacent vertices that may act simultaneously (graph coloring,
asynchronous local moves, landmark selection). Louvain's activation
classes (louvain.py) solve the same problem statically; MIS solves it
adaptively on the actual graph.

Per superstep: one edge-side join keyed on each endpoint against the
undecided frontier + one min-struct hash-agg — cost O(edges between
undecided vertices), shrinking geometrically. Exactness is property-pinned
(independence + maximality are checkable predicates, no oracle needed)
plus partition-count invariance; see tests/test_bipartite.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pcd_spark.graph.edges import symmetrize
from pcd_spark.graph.partition import adaptive_num_parts
from pcd_spark.graph.superstep import run_supersteps
from pcd_spark.storage import CheckpointStore

_UNDECIDED, _IN_MIS, _EXCLUDED = 0, 1, 2


def maximal_independent_set(
    edges: DataFrame,
    seed: int = 42,
    max_iter: int = 200,
    num_parts: int | None = None,
    store: CheckpointStore | None = None,
    checkpoint_every: int = 10,
    stats_out: dict | None = None,
) -> DataFrame:
    """Deterministic MIS membership for every vertex: (vid: long,
    in_mis: boolean). Isolated vertices (no edges) are not represented
    (graph-normal-form convention shared by the whole K suite)."""
    edges = edges.persist()
    p = num_parts or adaptive_num_parts(edges)

    sym = symmetrize(edges).repartition(p, "src").persist()
    _gtok = f"edges={sym.count()}"

    init = (
        sym.select(F.col("src").alias("vid"))
        .distinct()
        .select("vid", F.lit(_UNDECIDED).alias("status"),
                F.lit(1.0).alias("_delta"))
    )

    def step(state: DataFrame, i: int) -> DataFrame:
        und = state.filter(F.col("status") == _UNDECIDED).select("vid")
        pr = und.select(
            "vid",
            F.xxhash64(F.col("vid"), F.lit(i), F.lit(seed)).alias("prio"),
        )
        # edges whose BOTH endpoints are still undecided (everything else
        # is settled); frontier joins shrink geometrically with the rounds
        live = sym.join(
            pr.select(F.col("vid").alias("src"), F.col("prio").alias("sp"))
            .hint("shuffle_hash"),
            "src",
        ).join(
            pr.select(F.col("vid").alias("dst"), F.col("prio").alias("dp"))
            .hint("shuffle_hash"),
            "dst",
        )
        nmin = live.groupBy("src").agg(
            F.min(F.struct(F.col("dp"), F.col("dst"))).alias("nm")
        )
        winners = (
            pr.join(nmin.withColumnRenamed("src", "vid"), "vid", "left")
            .filter(
                F.col("nm").isNull()
                | (F.struct(F.col("prio"), F.col("vid")) < F.col("nm"))
            )
            .select("vid")
        )
        excluded = (
            sym.join(
                winners.withColumnRenamed("vid", "src").hint("shuffle_hash"),
                "src",
                "leftsemi",
            )
            .select(F.col("dst").alias("vid"))
            .distinct()
        )
        marked = winners.select("vid", F.lit(_IN_MIS).alias("ns")).unionByName(
            excluded.select("vid", F.lit(_EXCLUDED).alias("ns"))
        )
        return (
            state.join(marked.hint("shuffle_hash"), "vid", "left")
            .select(
                "vid",
                F.when(
                    (F.col("status") == _UNDECIDED) & F.col("ns").isNotNull(),
                    F.col("ns"),
                )
                .otherwise(F.col("status"))
                .alias("status"),
                # converged when nothing is undecided anymore
                (
                    F.when(
                        (F.col("status") == _UNDECIDED) & F.col("ns").isNull(),
                        1.0,
                    ).otherwise(0.0)
                ).alias("_delta"),
            )
        )

    final, iters, metrics = run_supersteps(
        init, step, tol=0.5, max_iter=max_iter,
        store=store, checkpoint_every=checkpoint_every, graph_token=_gtok,
    )
    if stats_out is not None:
        stats_out["iterations"] = iters
        stats_out["metrics"] = metrics
    edges.unpersist()
    return final.select("vid", (F.col("status") == _IN_MIS).alias("in_mis"))
