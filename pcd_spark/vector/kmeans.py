"""V5 — distributed Lloyd's k-means over an embedding column.

The missing fourth member of the similarity family (v1 exact top-k, v2/v3
sign-LSH, v4 IVF): IVF's coarse quantizer (v4) uses FIXED deterministic
cells; k-means LEARNS the cells — the standard embedding-clustering step in
training-data curation (cluster-balanced sampling, near-dup pruning,
domain discovery) and the trainer for a real IVF index.

Scale shape per iteration (exactly two narrow shuffles, no driver data):
  - ASSIGN: centroids (k x dim doubles — kilobytes even at k=65536/dim=1k)
    ship to executors inside an Arrow-vectorized pandas UDF closure; each
    batch computes argmin ||x-c||^2 as one numpy matmul. No shuffle.
  - UPDATE: per-cluster mean via posexplode -> SUM/COUNT keyed by
    (cluster, dim-position). The explode happens in the same stage as the
    partial aggregation, so the shuffle carries k*dim partial-sum rows per
    map partition (map-side combine), NOT the points. The k*dim aggregated
    rows (not the data) collect to the driver, which is where the next
    iteration's centroid literal must live anyway.
Iteration count is small and fixed (<= max_iter); each iteration is ONE
Spark job. 100 TB of vectors stream through both stages; only O(k*dim)
state ever leaves the executors.

Determinism: init = vectors of the k smallest ids (or caller-pinned
init_ids); distance ties break to the LOWEST cluster index (numpy argmin
rule, pinned in the oracle too); empty clusters keep their previous
centroid. Floating-point caveat: per-cluster sums reduce in partition
order, so centroids are deterministic only to fp-addition reordering —
tests compare centroids at atol 1e-9 and assignments exactly on
well-separated data (pcd_spark/oracle/kmeans_numpy.py is the pinned
reference).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType


def _assign_udf(centroids: np.ndarray):
    """Arrow-vectorized nearest-centroid: argmin_c ||x||^2 - 2x.c + ||c||^2
    (the ||x||^2 term is constant per row — dropped). One matmul per batch."""
    cT = centroids.T.copy()  # (dim, k)
    half_norms = 0.5 * (centroids * centroids).sum(axis=1)  # (k,)

    @F.pandas_udf(IntegerType())
    def nearest(batch: pd.Series) -> pd.Series:
        x = np.stack(batch.to_numpy())  # (rows, dim)
        scores = x @ cT - half_norms  # maximize x.c - ||c||^2/2
        # argmax ties -> lowest index == argmin distance ties -> lowest
        return pd.Series(np.argmax(scores, axis=1).astype(np.int32))

    return nearest


def kmeans(
    df: DataFrame,
    k: int = 8,
    vec_col: str = "emb",
    id_col: str = "vec_id",
    max_iter: int = 20,
    tol: float = 1e-9,
    init_ids: list[int] | None = None,
    stats_out: dict | None = None,
) -> DataFrame:
    """Lloyd's k-means. Returns DataFrame(id_col, cluster: int).

    Deterministic init: the vectors of the k smallest ids (or `init_ids`
    verbatim, in the given order). Stops when the max centroid L2 shift
    falls below `tol` or after max_iter. stats_out collects iterations,
    per-iteration max shift, and final inertia.
    """
    pts = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).persist()
    n = pts.count()
    if n < k:
        raise ValueError(f"kmeans: k={k} exceeds row count {n}")

    if init_ids is None:
        seed_rows = pts.orderBy("_id").limit(k).collect()
        seed_rows.sort(key=lambda r: r["_id"])
    else:
        if len(init_ids) != k:
            raise ValueError("kmeans: len(init_ids) must equal k")
        picked = {
            r["_id"]: r
            for r in pts.filter(F.col("_id").isin(list(init_ids))).collect()
        }
        seed_rows = [picked[i] for i in init_ids]
    centroids = np.stack([np.asarray(r["_v"], dtype=float) for r in seed_rows])

    shifts: list[float] = []
    iters = 0
    for it in range(max_iter):
        assigned = pts.select(
            "_v", _assign_udf(centroids)(F.col("_v")).alias("cluster")
        )
        # per-(cluster, dim) partial sums: explode and hash-agg in ONE stage
        # (map-side combine), shuffle width = k*dim rows per map partition
        agg = (
            assigned.select(
                "cluster", F.posexplode("_v").alias("pos", "val")
            )
            .groupBy("cluster", "pos")
            .agg(F.sum("val").alias("s"), F.count("*").alias("cnt"))
            .collect()
        )
        new_centroids = centroids.copy()  # empty cluster keeps its centroid
        for row in agg:
            new_centroids[row["cluster"], row["pos"]] = row["s"] / row["cnt"]
        shift = float(np.sqrt(((new_centroids - centroids) ** 2).sum(axis=1)).max())
        shifts.append(shift)
        centroids = new_centroids
        iters = it + 1
        if shift < tol:
            break

    out = pts.select(
        "_id", _assign_udf(centroids)(F.col("_v")).alias("cluster")
    )
    if stats_out is not None:
        cT = centroids.T.copy()

        @F.pandas_udf("double")
        def sqdist(batch: pd.Series) -> pd.Series:
            x = np.stack(batch.to_numpy())
            d = (x * x).sum(axis=1)[:, None] - 2.0 * (x @ cT) + (
                (centroids * centroids).sum(axis=1)
            )
            return pd.Series(d.min(axis=1))

        stats_out["iterations"] = iters
        stats_out["shifts"] = shifts
        stats_out["centroids"] = centroids
        stats_out["inertia"] = float(
            pts.select(sqdist(F.col("_v")).alias("d")).agg(F.sum("d")).first()[0]
        )
    result = out.withColumnRenamed("_id", id_col)
    result = result.localCheckpoint(eager=True)  # pin before unpersisting input
    pts.unpersist()
    return result
