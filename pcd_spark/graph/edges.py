"""Edge-table sources and normal forms (SURVEY.md §2 A3, G1, D3).

The universal algorithm input is ``(src:long, dst:long[, weight:double])``.
SNAP-format text ("u v" per line, ``#`` comments) recreates "the reference's
own SNAP-style validation graphs" (BASELINE.json:6); the stub reference
(/root/reference/README.md:1) ships none, so fixtures are synthesized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_snap_edges(spark: SparkSession, path: str) -> DataFrame:
    """A3: parse a SNAP edge list. Whole pipeline stays in JVM codegen —
    text scan → filter → split → cast; no Python."""
    lines = spark.read.text(path)
    toks = (
        lines.filter(~F.col("value").startswith("#"))
        .filter(F.trim("value") != "")
        .select(F.split(F.trim("value"), r"\s+").alias("t"))
    )
    return toks.select(
        F.col("t")[0].cast("long").alias("src"),
        F.col("t")[1].cast("long").alias("dst"),
    )


def read_snap_temporal_edges(spark: SparkSession, path: str) -> DataFrame:
    """A3 variant: parse a SNAP TEMPORAL edge list (`u v t` lines — the
    snap.stanford.edu temporal-network format, e.g. CollegeMsg /
    email-Eu-core-temporal / sx-stackoverflow). Same all-JVM pipeline as
    read_snap_edges; `t` is the interaction's epoch-seconds timestamp,
    feeding K54 temporal_reachability directly."""
    lines = spark.read.text(path)
    toks = (
        lines.filter(~F.col("value").startswith("#"))
        .filter(F.trim("value") != "")
        .select(F.split(F.trim("value"), r"\s+").alias("t"))
    )
    return toks.select(
        F.col("t")[0].cast("long").alias("src"),
        F.col("t")[1].cast("long").alias("dst"),
        F.col("t")[2].cast("long").alias("t"),
    )


def canonical_undirected(edges: DataFrame) -> DataFrame:
    """D3 normal form for undirected algorithms: drop self-loops, store each
    edge once as (min, max), dedup. One shuffle (the distinct)."""
    e = edges.filter(F.col("src") != F.col("dst"))
    return e.select(
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
    ).dropDuplicates(["src", "dst"])


def symmetrize(edges: DataFrame) -> DataFrame:
    """G1: canonical undirected → both directions (u→v and v→u), so
    per-`src` grouping sees the full neighborhood of every vertex."""
    c = canonical_undirected(edges)
    return c.unionByName(
        c.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def vertices_of(edges: DataFrame) -> DataFrame:
    """C5-style vertex universe: every id appearing as src or dst."""
    return (
        edges.select(F.col("src").alias("vid"))
        .unionByName(edges.select(F.col("dst").alias("vid")))
        .distinct()
    )


def read_csv_edges(
    spark: SparkSession,
    path: str,
    weight: bool = False,
    header: bool = False,
    delimiter: str = ",",
) -> DataFrame:
    """A3b: CSV/TSV edge list with an ENFORCED schema — the reader never
    infers (schema inference is a full extra pass over the data, absurd at
    100 TB) and never silently coerces: mode=FAILFAST makes a malformed
    row fail the job instead of becoming a null vertex id that corrupts
    the graph downstream."""
    schema = "src long, dst long" + (", weight double" if weight else "")
    return spark.read.csv(
        path,
        schema=schema,
        header=header,
        sep=delimiter,
        mode="FAILFAST",
    )
