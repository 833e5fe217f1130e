"""K5 — synchronous label propagation (SURVEY.md §2 K5; Raghavan et al. 2007).

Pinned deterministic rule (== pcd_spark.oracle.lpa_numpy, the test oracle):
  init label = vid; each superstep every vertex with >=1 neighbor takes the
  most frequent label among its neighbors' PREVIOUS labels, ties -> smallest
  label; isolated vertices keep theirs; stop on no change or max_iter.

Physical shape per superstep:
  gather: symmetrized edges (partitioned on src once, persisted) SHUFFLE_HASH-
  join labels -> count by (dst, label) — the first shuffle's map-side partial
  histograms absorb hub fan-in — -> deterministic argmax via
  min(struct(-cnt, label)) (D6; never F.mode — its tie order is undefined)
  -> left-join back onto previous labels, where the changed-flag `_delta` is
  computed in the same select (zero-extra-join convergence, superstep.py).

Optional two-phase salting (C10) for extreme hub skew; results identical to
unsalted (tests/test_csr_kernels.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pcd_spark.graph.edges import symmetrize, vertices_of
from pcd_spark.graph.partition import default_num_parts
from pcd_spark.graph.superstep import run_supersteps
from pcd_spark.storage import CheckpointStore


def argmax_label(counts: DataFrame, vid_col: str = "vid") -> DataFrame:
    """D6: per-vertex deterministic argmax over (label, cnt) rows: highest
    cnt wins, ties -> smallest label — one hash agg via min(struct)."""
    return (
        counts.groupBy(vid_col)
        .agg(F.min(F.struct((-F.col("cnt")).alias("nc"), F.col("label"))).alias("m"))
        .select(vid_col, F.col("m.label").alias("new_label"))
    )


def label_propagation(
    edges: DataFrame,
    max_iter: int = 30,
    num_parts: int | None = None,
    salt_buckets: int = 0,
    store: CheckpointStore | None = None,
    checkpoint_every: int = 5,
    stats_out: dict | None = None,
) -> DataFrame:
    """Returns DataFrame(vid: long, label: long) under the pinned rule."""
    p = num_parts or default_num_parts(edges)

    sym = symmetrize(edges)
    if salt_buckets > 0:
        # deterministic salt from the source vertex: spreads a hub dst's
        # incoming messages across salt_buckets phase-1 reducers
        sym = sym.withColumn(
            "salt",
            F.pmod(F.xxhash64("src", F.lit(7)), F.lit(salt_buckets)).cast("int"),
        )
    sym = sym.repartition(p, "src").persist()
    sym.count()
    verts = vertices_of(sym).persist()

    init = verts.select(
        "vid", F.col("vid").alias("label"), F.lit(1.0).alias("_delta")
    )

    def step(state: DataFrame, _i: int) -> DataFrame:
        labels = state.select("vid", "label")
        msgs = sym.hint("shuffle_hash").join(
            labels.withColumnRenamed("vid", "src"), "src"
        )
        if salt_buckets > 0:
            partial = msgs.groupBy("dst", "salt", "label").agg(
                F.count("*").alias("cnt")
            )
            counts = partial.groupBy("dst", "label").agg(F.sum("cnt").alias("cnt"))
        else:
            counts = msgs.groupBy("dst", "label").agg(F.count("*").alias("cnt"))
        best = argmax_label(counts.withColumnRenamed("dst", "vid"))
        new_label = F.coalesce("new_label", "label")
        return (
            state.select("vid", "label")
            .join(best, "vid", "left")
            .select(
                "vid",
                new_label.alias("label"),
                (new_label != F.col("label")).cast("double").alias("_delta"),
            )
        )

    final, iters, metrics = run_supersteps(
        init, step, tol=0.5, max_iter=max_iter,
        store=store, checkpoint_every=checkpoint_every,
    )
    if stats_out is not None:
        stats_out["iterations"] = iters
        stats_out["metrics"] = metrics
    out = final.select("vid", "label")
    sym.unpersist()
    verts.unpersist()
    return out
