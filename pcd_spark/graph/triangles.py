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


def _oriented(edges: DataFrame) -> DataFrame:
    """Orient canonical undirected edges low→high by (degree, vid)."""
    canon = canonical_undirected(edges)
    both = canon.unionByName(
        canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = both.groupBy(F.col("src").alias("vid")).agg(F.count("*").alias("deg"))
    e = (
        canon.join(deg.withColumnRenamed("vid", "src").withColumnRenamed("deg", "ds"), "src")
        .join(deg.withColumnRenamed("vid", "dst").withColumnRenamed("deg", "dd"), "dst")
    )
    keep = (F.col("ds") < F.col("dd")) | (
        (F.col("ds") == F.col("dd")) & (F.col("src") < F.col("dst"))
    )
    return e.select(
        F.when(keep, F.col("src")).otherwise(F.col("dst")).alias("u"),
        F.when(keep, F.col("dst")).otherwise(F.col("src")).alias("v"),
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Exact per-vertex triangle counts (vid: long, tri: long); vertices in
    no triangle get 0. Global count = sum(tri)/3 (each triangle touches 3)."""
    o = _oriented(edges).persist()
    o.count()

    # Ordered wedges (a→b, a→c), b≠c; the closing edge b→c exists in exactly
    # one orientation, so joining on (b, c) counts each triangle once — at
    # its lowest-(degree, vid) apex.
    a = o.select(F.col("u").alias("a"), F.col("v").alias("b"))
    b = o.select(F.col("u").alias("a"), F.col("v").alias("c"))
    wedges = a.join(b, "a").filter(F.col("b") != F.col("c"))
    closing = o.select(F.col("u").alias("b"), F.col("v").alias("c"))
    tris = wedges.join(closing, ["b", "c"])  # rows (a, b, c) = one triangle

    per_vertex = (
        tris.select(F.explode(F.array("a", "b", "c")).alias("vid"))
        .groupBy("vid")
        .agg(F.count("*").alias("tri"))
    )
    out = (
        vertices_of(edges)
        .join(per_vertex, "vid", "left")
        .select("vid", F.coalesce("tri", F.lit(0)).alias("tri"))
    )
    return out


def triangle_total(edges: DataFrame) -> int:
    """Global triangle count."""
    row = triangle_counts(edges).agg((F.sum("tri") / 3).cast("long").alias("t")).first()
    return int(row["t"] or 0)
