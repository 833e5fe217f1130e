"""K54 — time-respecting (temporal) reachability with earliest arrival.

Interaction graphs carry a timestamp per edge; information can only flow
along paths whose edge times are NON-DECREASING [PUB: Kempe, Kleinberg &
Kumar 2000 "Connectivity and inference problems for temporal networks";
Holme & Saramäki 2012 "Temporal networks", Phys. Rep. 519]. Static
reachability over-counts badly here: a 2019 edge cannot forward something
that arrives in 2024.

Algorithm: earliest-arrival BFS. State per (root, vid) is the earliest time
the root's influence can arrive at vid within the hop budget. Dominance
rule (the classic one): arriving EARLIER at v can never hurt later
reachability — every edge usable from a later arrival (t >= arr_late) is
usable from an earlier one (t >= arr_early) — so keeping only MIN(arrival)
per (root, vid) per round is exact, and the frontier stays O(reached).

Each hop is one equi-join (frontier x interactions on the meeting vertex)
with the time predicate `t >= arr` as a post-join filter, then a
(root, vid) min hash-agg — the D1/C1 shapes the engine already scales:
map-side-combinable, no cartesian, interactions pre-partitioned on src.
Hop-bounded (max_hops) by design: temporal influence radii are the
standard bounded-horizon query; an unbounded variant converges anyway
because arrivals only decrease, monotone over a finite lattice.

At 10^12 interaction rows the plan survives: the interactions table is
hash-partitioned on src once, each hop shuffles only the frontier (root,
vid, arr) triples, and the per-hop state merge is a shuffle-hash full
outer on (root, vid) — state is O(roots x reached), the cohort knob the
centrality family (K22/K23/K55) already documents.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pcd_spark.graph.partition import adaptive_num_parts


def temporal_reachability(
    interactions: DataFrame,
    sources: Sequence[int],
    max_hops: int = 3,
    directed: bool = False,
    num_parts: int | None = None,
    stats_out: dict | None = None,
) -> DataFrame:
    """Earliest-arrival temporal reachability from a source cohort.

    interactions: DataFrame(src: long, dst: long, t: long) — t is the
    interaction time as epoch seconds (caller casts timestamps; keeping it
    integral makes the min-agg exact and engine-portable).
    Returns DataFrame(root: long, vid: long, arrival: long) — one row per
    vertex reachable from `root` over a time-respecting path of <= max_hops
    hops, with the earliest possible arrival time. Roots are seeded with
    arrival = -1 (every real epoch-seconds interaction time satisfies
    t >= -1, so hop 1 may use any incident interaction); the seed rows stay
    in the output with arrival -1 — callers that only want genuinely
    reached vertices filter `vid != root`.
    """
    if not sources:
        raise ValueError("at least one source vertex required")
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    e = interactions.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
        F.col("t").cast("long").alias("t"),
    )
    if not directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "t")
        )
    p = num_parts or adaptive_num_parts(e)
    # parallel interactions between the same pair collapse to the earliest
    # usable copy per (src, dst, t) — keep ALL distinct times (a later copy
    # can matter when the frontier arrives between two times), but dedup
    # exact repeats so the relax join is skew-lighter.
    e = e.distinct().repartition(p, "src").persist()
    # one job primes the cache AND validates the arrival-seed precondition:
    # roots are seeded with arrival = -1, so every interaction time must be
    # a non-negative epoch — a dataset with pre-1970 (negative) timestamps
    # would silently fail the `t >= arrival` first-hop filter. Fail loudly
    # instead (the shortest_paths cache-prime + validate pattern).
    _mint = e.agg(F.min("t").alias("mint")).first()["mint"]
    if _mint is not None and _mint < 0:
        e.unpersist()
        raise ValueError(
            "temporal_reachability requires non-negative interaction "
            f"times (roots seed at arrival = -1); min(t) = {_mint}. "
            "Shift timestamps to a non-negative epoch before calling."
        )

    src_list = sorted({int(s) for s in sources})
    spark = interactions.sparkSession
    # arrival = -1 seeds: every real interaction time (epoch >= 0) satisfies
    # t >= arrival on the first hop
    state = spark.createDataFrame(
        [(r, r, -1) for r in src_list], "root long, vid long, arrival long"
    ).repartition(p, "vid")
    frontier = state

    hops = 0
    for h in range(max_hops):
        msgs = (
            e.hint("shuffle_hash")
            .join(frontier.select("root", F.col("vid").alias("src"), "arrival"), "src")
            .filter(F.col("t") >= F.col("arrival"))
            .select("root", F.col("dst").alias("vid"), F.col("t").alias("cand"))
            .repartition(p, "vid")
            .groupBy("root", "vid")
            .agg(F.min("cand").alias("cand"))
        )
        merged = (
            state.join(msgs.hint("shuffle_hash"), ["root", "vid"], "full")
            .select(
                "root",
                "vid",
                F.least("arrival", "cand").alias("arrival"),
                F.col("arrival").alias("_old"),
            )
            .localCheckpoint(eager=True)
        )
        # next frontier = rows whose arrival improved (incl. new discoveries)
        frontier = merged.filter(
            ~F.col("arrival").eqNullSafe(F.col("_old"))
        ).select("root", "vid", "arrival")
        n_changed = frontier.count()
        state = merged.select("root", "vid", "arrival")
        hops = h + 1
        if n_changed == 0:
            break
    # the final state is an eager localCheckpoint — the edge cache can go
    # (ADVICE-r2 leak class: a persist with no matching unpersist survives
    # the session)
    e.unpersist()
    if stats_out is not None:
        stats_out["hops"] = hops
    return state
