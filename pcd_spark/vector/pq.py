"""V6 — product quantization with ADC scoring (round 2 ext.).

Product quantization [PUB: Jégou, Douze & Schmid 2011, "Product
quantization for nearest neighbor search", IEEE TPAMI]: split each vector
into m subvectors, learn a small k-means codebook per subspace (the V5
trainer, deterministic init), and store each vector as m small codes.
Asymmetric distance computation (ADC): a query builds one (m x k) lookup
table of exact subspace distances to every centroid; a candidate's
approximate distance is the sum of m table lookups — no decode.

This is the memory side of the production ANN stack (IVF-PQ): V4's IVF
prunes WHICH vectors are scored, PQ compresses HOW each is scored —
64 floats (256 B) become m=4 bytes here, a 64x shrink that is what lets
10^12-vector indexes fit in cluster RAM at all.

Scale shape: training runs m independent V5 k-means passes (each two
narrow shuffles per iteration, O(k*dsub) driver state); encoding is one
Arrow-vectorized pass (argmin per subspace, a matmul per batch); scoring
ships only the (P x m x k) LUT tensor — kilobytes — inside the UDF
closure, streams the codes column (never the vectors), and reduces with
the V1 window top-k. Exactness of the pipeline given the codebooks is
pinned against a pure-numpy mirror; retrieval quality is pinned as
recall@k against V1's exact top-k.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, IntegerType

from pcd_spark.vector.kmeans import kmeans


def train_pq(
    df: DataFrame,
    m: int = 4,
    k: int = 16,
    vec_col: str = "emb",
    id_col: str = "vec_id",
    max_iter: int = 6,
) -> np.ndarray:
    """Learn per-subspace codebooks. Returns (m, k, dim/m) centroids.
    dim must be divisible by m; deterministic (V5's pinned init rule)."""
    first = df.select(F.size(F.col(vec_col)).alias("d")).first()
    dim = int(first["d"])
    if dim % m:
        raise ValueError(f"pq: dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = []
    for j in range(m):
        sub = df.select(
            F.col(id_col).alias("vec_id"),
            F.slice(F.col(vec_col), j * dsub + 1, dsub)
            .cast("array<double>")
            .alias("emb"),
        )
        stats: dict = {}
        kmeans(sub, k=k, vec_col="emb", id_col="vec_id",
               max_iter=max_iter, stats_out=stats)
        books.append(stats["centroids"])
    return np.stack(books)  # (m, k, dsub)


def _encode_udf(codebooks: np.ndarray):
    m, k, dsub = codebooks.shape
    cT = np.stack([codebooks[j].T for j in range(m)])  # (m, dsub, k)
    half = 0.5 * (codebooks * codebooks).sum(axis=2)  # (m, k)

    @F.pandas_udf(ArrayType(IntegerType()))
    def encode(batch: pd.Series) -> pd.Series:
        x = np.stack(batch.to_numpy())  # (rows, m*dsub)
        xs = x.reshape(len(x), m, dsub)
        codes = np.empty((len(x), m), dtype=np.int32)
        for j in range(m):
            # argmax x.c - ||c||^2/2 == argmin distance, ties -> lowest
            codes[:, j] = np.argmax(xs[:, j] @ cT[j] - half[j], axis=1)
        return pd.Series(list(codes))

    return encode


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "emb",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id_col, codes: array<int>) — m codes per vector."""
    return df.select(
        F.col(id_col),
        _encode_udf(codebooks)(F.col(vec_col).cast("array<double>")).alias(
            "codes"
        ),
    )


def pq_topk(
    df: DataFrame,
    probes: list[tuple[int, list[float]]],
    codebooks: np.ndarray,
    topk: int = 3,
    vec_col: str = "emb",
    id_col: str = "vec_id",
    round_to: int = 6,
) -> DataFrame:
    """ADC top-k: (probe_id, cand_id, approx_dist), smallest approximate
    squared L2 first, ties -> smallest cand_id; a probe never matches
    itself. `probes` is a small driver-side list [(probe_id, vector)]."""
    m, k, dsub = codebooks.shape
    pids = np.array([p for p, _ in probes], dtype=np.int64)
    qs = np.stack([np.asarray(v, dtype=float) for _, v in probes])
    # exact subspace distances query -> every centroid: (P, m, k)
    luts = np.empty((len(probes), m, k))
    for j in range(m):
        qj = qs[:, j * dsub:(j + 1) * dsub]  # (P, dsub)
        diff = qj[:, None, :] - codebooks[j][None, :, :]  # (P, k, dsub)
        luts[:, j, :] = (diff * diff).sum(axis=2)
    pid_index = {int(p): i for i, p in enumerate(pids)}
    jidx = np.arange(m)

    @F.pandas_udf(DoubleType())
    def adc(codes: pd.Series, probe: pd.Series) -> pd.Series:
        c = np.stack(codes.to_numpy())  # (rows, m)
        pi = probe.map(pid_index).to_numpy()  # (rows,)
        d = luts[pi[:, None], jidx[None, :], c].sum(axis=1)
        return pd.Series(d)

    codes = pq_encode(df, codebooks, vec_col=vec_col, id_col=id_col)
    probe_df = codes.sparkSession.createDataFrame(
        [(int(p),) for p in pids], "probe_id long"
    )
    scored = (
        codes.join(F.broadcast(probe_df), F.col("probe_id") != F.col(id_col))
        .select(
            "probe_id",
            F.col(id_col).alias("cand_id"),
            F.round(adc(F.col("codes"), F.col("probe_id")), round_to).alias(
                "approx_dist"
            ),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.asc("approx_dist"), F.asc("cand_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= topk)
        .drop("rn")
    )
