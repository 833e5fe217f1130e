"""Pinned numpy synchronous label propagation — the test oracle for K5.

Rule (SURVEY.md §2 K5, exactness note §2 end):
  - undirected graph, init label[v] = v
  - each superstep, synchronously for every vertex with >= 1 neighbor:
      new_label[v] = the label with the highest count among v's neighbors'
      *previous-iteration* labels; ties broken toward the SMALLEST label
  - isolated vertices keep their label
  - stop when no label changed, or after max_iter supersteps

networkx's LPA is randomized and unusable as an exact oracle; this ~40-line
function is the reference semantics the Spark engine must match exactly
(BASELINE.json:14 "exact community labels").
"""

from __future__ import annotations

import numpy as np


def lpa_numpy(
    n: int,
    edges: np.ndarray,
    max_iter: int = 30,
) -> tuple[np.ndarray, int]:
    """Run pinned synchronous LPA.

    n: vertex count (vertices are 0..n-1)
    edges: (m, 2) int array of undirected edges (each pair once; self-loops
           and duplicates are dropped, matching the engine's edge dedup D3)
    Returns (labels, iterations_run).
    """
    e = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
    e = e[e[:, 0] != e[:, 1]]
    # symmetrize + dedup (canonical form, G1+D3)
    lo = np.minimum(e[:, 0], e[:, 1])
    hi = np.maximum(e[:, 0], e[:, 1])
    e = np.unique(np.stack([lo, hi], axis=1), axis=0)
    src = np.concatenate([e[:, 0], e[:, 1]])
    dst = np.concatenate([e[:, 1], e[:, 0]])

    # CSR adjacency
    order = np.argsort(src, kind="stable")
    src, dst = src[order], dst[order]
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, src + 1, 1)
    indptr = np.cumsum(indptr)

    labels = np.arange(n, dtype=np.int64)
    for it in range(1, max_iter + 1):
        new = labels.copy()
        for v in range(n):
            nbrs = dst[indptr[v] : indptr[v + 1]]
            if nbrs.size == 0:
                continue
            nl = labels[nbrs]
            uniq, cnt = np.unique(nl, return_counts=True)  # uniq sorted asc
            new[v] = uniq[np.argmax(cnt)]  # first max = smallest label
        if np.array_equal(new, labels):
            return labels, it - 1
        labels = new
    return labels, max_iter
