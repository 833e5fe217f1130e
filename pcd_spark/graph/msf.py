"""K49: minimum spanning forest via distributed Borůvka.

[PUB: Borůvka 1926; Chazelle/Karger-Klein-Tarjan literature; the
map-reduce formulation follows Lattanzi et al., "Filtering: a method for
solving graph problems in MapReduce", SPAA 2011.] Reference locus:
SURVEY.md §2 K49 (the reference checkout has no code — README.md:1).

Determinism contract: edges are totally ordered by (weight, src, dst) on
the CANONICAL (src < dst) form, which makes the minimum spanning forest
UNIQUE (standard perturbation argument: Kruskal over any total order
consistent with the weights yields the one forest that is minimal for
every cut). Both execution paths compute that same forest:

- driver Kruskal (union-find over the collected edge list) below
  `small_graph_cutoff` edges — the same collapse discipline as
  matching/densest-subgraph: a superstep round costs ~1 s of fixed
  overhead, so graphs that fit one task (200k edges ≈ 3 MB) should not
  pay O(log V) of them;
- distributed Borůvka above it: every component picks its minimum
  incident cross edge (ONE map-side-combinable struct-min hash agg — the
  engine's D6 argmax discipline), the chosen edges join the forest, and
  the components they connect contract via pointer jumping (the chosen
  pointer graph has out-degree 1 and, because the edge order is total,
  its only cycles are mutual 2-cycles — broken deterministically toward
  the smaller component id). Components at least halve per round, so
  O(log V) rounds; each round shuffles only (comp, best-edge) pairs and
  the O(V) relabel join.

Scale shape at 10^12 edges: the edge table is scanned once per round but
never re-shuffled (the struct-min agg combines map-side; only the O(C)
candidate minima cross the wire), comp relabels are hash equi-joins on
vid, and lineage is truncated per round (localCheckpoint) so plan depth
stays O(1) — the same discipline the superstep engine pins for
PageRank/CC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pcd_spark.graph.partition import adaptive_num_parts

_FOREST_SCHEMA = "src long, dst long, weight double"


def _kruskal_driver(rows: list) -> list[tuple[int, int, float]]:
    """Sequential Kruskal over the total order (w, src, dst) — the unique
    MSF of the tiebroken edge set. Driver-side twin of the Borůvka path."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    out: list[tuple[int, int, float]] = []
    for w, u, v in sorted((r["w"], r["src"], r["dst"]) for r in rows):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
            out.append((u, v, w))
    return out


def minimum_spanning_forest(
    edges: DataFrame,
    weight_col: str | None = None,
    max_iter: int = 64,
    num_parts: int | None = None,
    small_graph_cutoff: int = 200_000,
    stats_out: dict | None = None,
) -> DataFrame:
    """Returns DataFrame(src: long, dst: long, weight: double) — the unique
    minimum spanning forest of the undirected graph under the total edge
    order (weight, src, dst) on canonical (src < dst) edges. Without
    `weight_col` all weights are 1.0 and the result is A spanning forest
    (the lexicographically smallest one). Parallel edges keep their
    minimum weight; self-loops are dropped; isolated vertices are not
    represented (graph-normal-form convention shared by the K suite).

    Raises RuntimeError if `max_iter` Borůvka rounds do not reach the
    fixpoint (components at least halve per round, so 64 covers any
    vertex count that fits in a long — exhaustion means a bug, and a
    silently partial forest must never be returned)."""
    spark = edges.sparkSession
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    ce = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            w.alias("w"),
        )
        .groupBy("src", "dst")
        .agg(F.min("w").alias("w"))
        .persist()
    )
    n_edges = ce.count()
    if stats_out is not None:
        stats_out["n_edges"] = n_edges

    if n_edges <= small_graph_cutoff:
        forest = _kruskal_driver(ce.collect())
        ce.unpersist()
        if stats_out is not None:
            stats_out["rounds"] = 0
            stats_out["path"] = "driver-kruskal"
            stats_out["forest_edges"] = len(forest)
        if not forest:
            return spark.createDataFrame([], _FOREST_SCHEMA)
        return spark.createDataFrame(forest, _FOREST_SCHEMA)

    p = num_parts or adaptive_num_parts(ce)
    ce = ce.repartition(p, "src")

    # comp: current component id per vertex (init: itself)
    comp = (
        ce.select(F.col("src").alias("vid"))
        .unionByName(ce.select(F.col("dst").alias("vid")))
        .distinct()
        .select("vid", F.col("vid").alias("comp"))
        .localCheckpoint(eager=True)
    )

    forest_parts: list[DataFrame] = []
    rounds = 0
    converged = False
    for _ in range(max_iter):
        ec = (
            ce.join(
                comp.select(F.col("vid").alias("src"), F.col("comp").alias("cs")),
                "src",
            )
            .join(
                comp.select(F.col("vid").alias("dst"), F.col("comp").alias("cd")),
                "dst",
            )
            .filter(F.col("cs") != F.col("cd"))
        )
        # minimum incident cross edge per component: struct-min over the
        # total order (w, src, dst); cs/cd ride AFTER the identifying
        # fields so they never influence the ordering
        e_struct = F.struct("w", "src", "dst", "cs", "cd").alias("e")
        cand = ec.select(F.col("cs").alias("c"), e_struct).unionAll(
            ec.select(F.col("cd").alias("c"), e_struct)
        )
        sel = cand.groupBy("c").agg(F.min("e").alias("e")).persist()
        if sel.isEmpty():
            sel.unpersist()
            converged = True
            break
        rounds += 1
        forest_parts.append(
            sel.select("e.src", "e.dst", F.col("e.w").alias("weight"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # contraction: each component points at the other side of its
        # chosen edge; total edge order => only mutual 2-cycles, broken
        # toward the smaller id, then pointer-jump to the roots
        par = sel.select(
            "c",
            F.when(F.col("e.cs") == F.col("c"), F.col("e.cd"))
            .otherwise(F.col("e.cs"))
            .alias("par"),
        )
        a, b = par.alias("a"), par.alias("b")
        par = (
            a.join(b, F.col("a.par") == F.col("b.c"), "left")
            .select(
                F.col("a.c").alias("c"),
                F.when(
                    (F.col("b.par") == F.col("a.c"))
                    & (F.col("a.c") < F.col("a.par")),
                    F.col("a.c"),
                )
                .otherwise(F.col("a.par"))
                .alias("par"),
            )
            .localCheckpoint(eager=True)
        )
        sel.unpersist()
        while True:
            a, b = par.alias("a"), par.alias("b")
            nxt = a.join(b, F.col("a.par") == F.col("b.c"), "left").select(
                F.col("a.c").alias("c"),
                F.coalesce("b.par", "a.par").alias("par"),
                (F.coalesce("b.par", "a.par") != F.col("a.par")).alias("_ch"),
            )
            nxt = nxt.localCheckpoint(eager=True)
            changed = nxt.filter("_ch").isEmpty() is False
            par = nxt.drop("_ch")
            if not changed:
                break
        comp = (
            comp.join(
                par.select(F.col("c").alias("comp"), "par"), "comp", "left"
            )
            .select("vid", F.coalesce("par", "comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
    else:
        converged = False
    if not converged:
        raise RuntimeError(
            f"minimum_spanning_forest: no fixpoint after {max_iter} Borůvka "
            "rounds — components halve per round, so this indicates a bug "
            "or a vertex-id domain wider than long"
        )
    ce.unpersist()
    if stats_out is not None:
        stats_out["rounds"] = rounds
        stats_out["path"] = "boruvka"
    if not forest_parts:
        return spark.createDataFrame([], _FOREST_SCHEMA)
    out = forest_parts[0]
    for part in forest_parts[1:]:
        out = out.unionByName(part)
    # a chosen edge can be selected by both endpoint components in the
    # same round (mutual minimum) AND re-chosen never after contraction —
    # but distinct() per round already deduped; across rounds edges are
    # distinct by construction (contracted endpoints never re-cross)
    if stats_out is not None:
        stats_out["forest_edges"] = out.count()
    return out
