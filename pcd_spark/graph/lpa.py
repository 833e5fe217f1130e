"""K5 — synchronous label propagation (SURVEY.md §2 K5; Raghavan et al. 2007).

Pinned deterministic rule (== pcd_spark.oracle.lpa_numpy, the test oracle):
  init label = vid; each superstep every vertex with >=1 neighbor takes the
  most frequent label among its neighbors' PREVIOUS labels, ties -> smallest
  label; isolated vertices keep theirs; stop on no change or max_iter.

Physical shape: gather = edges ⋈ labels on src (narrow on persisted edge
side) → count by (dst, label) — the first shuffle's map-side partials are the
per-partition label histograms — → deterministic argmax via
max(struct(cnt, -label)) (D6; never F.mode — its tie order is undefined).
Optional salting (C10) splits hub vertices' histograms across reducers first;
see salt.py. Exactness is asserted against the numpy oracle in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pcd_spark.graph.edges import symmetrize, vertices_of
from pcd_spark.graph.partition import default_num_parts
from pcd_spark.graph.superstep import run_supersteps
from pcd_spark.storage import CheckpointStore


def argmax_label(counts: DataFrame, vid_col: str = "vid") -> DataFrame:
    """D6: per-vertex deterministic argmax over (label, cnt) rows:
    highest cnt wins, ties -> smallest label. Encoded as a single max over
    struct(cnt, -label) so it stays one hash aggregation."""
    return (
        counts.groupBy(vid_col)
        .agg(F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("neg"))).alias("m"))
        .select(vid_col, (-F.col("m.neg")).alias("new_label"))
    )


def label_propagation(
    edges: DataFrame,
    max_iter: int = 30,
    num_parts: int | None = None,
    salt_buckets: int = 0,
    store: CheckpointStore | None = None,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Returns DataFrame(vid: long, label: long) under the pinned rule.

    salt_buckets > 0 enables the two-phase salted histogram for hub skew
    (BASELINE.json:6 "salting for hub-vertex skew"): partial counts by
    (dst, salt, label) then final by (dst, label). Results are identical
    to the unsalted path (asserted in tests/test_salt.py).
    """
    p = num_parts or default_num_parts(edges)

    sym = symmetrize(edges)
    sym = sym.withColumn("part", F.pmod(F.xxhash64("src"), F.lit(p)).cast("int"))
    if salt_buckets > 0:
        # deterministic salt from the *source* vertex: spreads a hub dst's
        # incoming messages across salt_buckets reducers in phase 1.
        sym = sym.withColumn(
            "salt", F.pmod(F.xxhash64("src", F.lit(7)), F.lit(salt_buckets)).cast("int")
        )
    sym = sym.repartition(p, "part").persist()
    sym.count()
    verts = vertices_of(sym).persist()

    init = verts.select("vid", F.col("vid").alias("label"))

    def step(state: DataFrame, _i: int) -> DataFrame:
        labels = state.select("vid", "label")
        msgs = sym.join(labels.withColumnRenamed("vid", "src"), "src")
        if salt_buckets > 0:
            partial = msgs.groupBy("dst", "salt", "label").agg(
                F.count("*").alias("cnt")
            )
            counts = partial.groupBy("dst", "label").agg(F.sum("cnt").alias("cnt"))
        else:
            counts = msgs.groupBy("dst", "label").agg(F.count("*").alias("cnt"))
        best = argmax_label(counts.withColumnRenamed("dst", "vid"))
        return (
            state.select("vid", "label")
            .join(best, "vid", "left")
            .select("vid", F.coalesce("new_label", "label").alias("label"))
        )

    def delta_fn(new: DataFrame, old: DataFrame) -> DataFrame:
        return new.join(old.select("vid", F.col("label").alias("o")), "vid").agg(
            F.coalesce(
                F.sum((F.col("label") != F.col("o")).cast("double")), F.lit(0.0)
            ).alias("delta")
        )

    final, _iters, _metrics = run_supersteps(
        init, step, delta_fn, tol=0.5, max_iter=max_iter,
        store=store, checkpoint_every=checkpoint_every,
    )
    out = final.select("vid", "label")
    sym.unpersist()
    verts.unpersist()
    return out
