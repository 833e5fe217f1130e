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
    weights: np.ndarray | None = None,
) -> tuple[np.ndarray, int]:
    """Run pinned synchronous LPA.

    n: vertex count (vertices are 0..n-1)
    edges: (m, 2) int array of undirected edges (each pair once; self-loops
           are dropped; duplicate pairs dedup unweighted / SUM their weights
           when weighted, matching the engine's canonical form D3)
    weights: optional (m,) per-edge vote weights — a neighbor's label counts
             with the edge weight instead of 1 (K5 weighted form); same tie
             rule (highest total, ties -> smallest label)
    Returns (labels, iterations_run).
    """
    e = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
    keep = e[:, 0] != e[:, 1]
    e = e[keep]
    # symmetrize + canonical form (G1+D3): dedup unweighted, sum weighted
    lo = np.minimum(e[:, 0], e[:, 1])
    hi = np.maximum(e[:, 0], e[:, 1])
    pairs = np.stack([lo, hi], axis=1)
    if weights is None:
        e = np.unique(pairs, axis=0)
        w = np.ones(len(e), dtype=np.float64)
    else:
        wv = np.asarray(weights, dtype=np.float64)[keep]
        e, inv = np.unique(pairs, axis=0, return_inverse=True)
        w = np.zeros(len(e), dtype=np.float64)
        np.add.at(w, inv, wv)
    src = np.concatenate([e[:, 0], e[:, 1]])
    dst = np.concatenate([e[:, 1], e[:, 0]])
    ww = np.concatenate([w, w])

    # CSR adjacency
    order = np.argsort(src, kind="stable")
    src, dst, ww = src[order], dst[order], ww[order]
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, src + 1, 1)
    indptr = np.cumsum(indptr)

    labels = np.arange(n, dtype=np.int64)
    for it in range(1, max_iter + 1):
        new = labels.copy()
        for v in range(n):
            lo_i, hi_i = indptr[v], indptr[v + 1]
            nbrs = dst[lo_i:hi_i]
            if nbrs.size == 0:
                continue
            nl = labels[nbrs]
            uniq, inv = np.unique(nl, return_inverse=True)  # uniq sorted asc
            tot = np.zeros(len(uniq), dtype=np.float64)
            np.add.at(tot, inv, ww[lo_i:hi_i])
            new[v] = uniq[np.argmax(tot)]  # first max = smallest label
        if np.array_equal(new, labels):
            return labels, it - 1
        labels = new
    return labels, max_iter
