"""Pinned numpy HITS oracle (Kleinberg 1999; networkx-semantics, scipy-free).

Rule (identical to pcd_spark.graph.hits up to power-iteration scale
invariance): init a = h = 1/N; per iteration a ← Aᵀh then h ← A·a (the NEW
a, Kleinberg's I/O order); L1-normalize both; stop when Σ|a - a_prev| < tol
or max_iter. Output (authority, hub) each L1-normalized to sum 1 —
networkx `hits(normalized=True)` computes the same principal eigenvectors
of AᵀA / AAᵀ, so results agree wherever the eigengap lets the iteration
converge.
"""

from __future__ import annotations

import numpy as np


def hits_numpy(
    edges: list[tuple[int, int]],
    tol: float = 1e-12,
    max_iter: int = 1000,
) -> tuple[dict[int, float], dict[int, float]]:
    """Returns ({vid: authority}, {vid: hub}) over the vertex universe."""
    vids = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {v: i for i, v in enumerate(vids)}
    n = len(vids)
    A = np.zeros((n, n))
    for u, v in set(edges):
        A[idx[u], idx[v]] = 1.0
    a = np.full(n, 1.0 / n)
    h = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        a_prev = a
        a_raw = A.T @ h
        h_raw = A @ a_raw
        a = a_raw / a_raw.sum()
        h = h_raw / h_raw.sum()
        if np.abs(a - a_prev).sum() < tol:
            break
    return (
        {v: float(a[idx[v]]) for v in vids},
        {v: float(h[idx[v]]) for v in vids},
    )
