"""Pinned numpy Lloyd's k-means oracle (scipy/sklearn-free).

Rules identical to pcd_spark.vector.kmeans: init = vectors of the k
smallest ids (or init order given), nearest-centroid ties -> lowest cluster
index, empty clusters keep their previous centroid, stop when max centroid
L2 shift < tol or max_iter.
"""

from __future__ import annotations

import numpy as np


def kmeans_numpy(
    ids: np.ndarray,
    x: np.ndarray,
    k: int,
    max_iter: int = 20,
    tol: float = 1e-9,
    init_ids: list[int] | None = None,
) -> tuple[np.ndarray, np.ndarray, float]:
    """Returns (assignments aligned with `ids`, centroids (k,dim), inertia)."""
    ids = np.asarray(ids)
    x = np.asarray(x, dtype=float)
    order = np.argsort(ids)
    seed_ids = (
        [ids[i] for i in order[:k]] if init_ids is None else list(init_ids)
    )
    pos = {int(v): i for i, v in enumerate(ids)}
    centroids = np.stack([x[pos[int(v)]] for v in seed_ids])

    def assign(c):
        d = (x * x).sum(axis=1)[:, None] - 2.0 * (x @ c.T) + (c * c).sum(axis=1)
        return d.argmin(axis=1)  # ties -> lowest index

    for _ in range(max_iter):
        a = assign(centroids)
        new_c = centroids.copy()
        for j in range(k):
            members = x[a == j]
            if len(members):
                new_c[j] = members.mean(axis=0)
        shift = float(np.sqrt(((new_c - centroids) ** 2).sum(axis=1)).max())
        centroids = new_c
        if shift < tol:
            break
    a = assign(centroids)
    d = (x * x).sum(axis=1)[:, None] - 2.0 * (x @ centroids.T) + (
        centroids * centroids
    ).sum(axis=1)
    return a, centroids, float(d.min(axis=1).sum())
