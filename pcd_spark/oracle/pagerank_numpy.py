"""Pinned numpy PageRank oracle (networkx semantics, scipy-free).

networkx 3.x's ``nx.pagerank`` requires scipy (absent in this sandbox), so
tests pin this dense power iteration instead. Semantics are identical to
networkx/_pagerank_scipy and to the classic formulation [PUB: Brin & Page
1998]: row-stochastic transition from out-weights, dangling mass spread
uniformly, uniform teleport, L1 stopping rule err < n * tol.
"""

from __future__ import annotations

import numpy as np


def pagerank_numpy(
    n: int,
    edges: np.ndarray,
    damping: float = 0.85,
    tol: float = 1e-12,
    max_iter: int = 1000,
    weights: np.ndarray | None = None,
    sources: list[int] | None = None,
) -> np.ndarray:
    """edges: (m,2) directed src,dst. Returns rank vector of length n.

    `sources` switches to PERSONALIZED semantics (networkx
    ``pagerank(personalization=...)`` with its default
    dangling=personalization): teleport and dangling mass both redistribute
    uniformly over the source set instead of all n vertices.
    """
    e = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
    w = np.ones(len(e)) if weights is None else np.asarray(weights, dtype=float)
    out_s = np.zeros(n)
    np.add.at(out_s, e[:, 0], w)
    dangling = out_s == 0.0
    p = w / out_s[e[:, 0]]  # transition prob per edge

    reset = np.full(n, 1.0 / n)
    if sources is not None:
        srcs = sorted({int(v) for v in sources})
        reset = np.zeros(n)
        reset[srcs] = 1.0 / len(srcs)

    x = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        contrib = np.zeros(n)
        np.add.at(contrib, e[:, 1], x[e[:, 0]] * p)
        dmass = x[dangling].sum()
        x_new = (1.0 - damping) * reset + damping * (contrib + dmass * reset)
        if np.abs(x_new - x).sum() < n * tol:
            return x_new
        x = x_new
    raise RuntimeError(f"pagerank_numpy failed to converge in {max_iter}")
