"""V6 product quantization: pure-numpy mirror exactness + recall on
clustered data.

The driver's synthetic embeddings are near-uniform, where ALL pairwise
distances concentrate and no 2^(m*log2 k)-bit code can separate ranks —
recall there is a property of the data, not the index (documented in the
v6 query docstring). Quality is therefore pinned where the metric is
meaningful: a deterministic clustered fixture, where the true neighbors
share a cluster and PQ must find them.
"""

from __future__ import annotations

import numpy as np
import pytest

from pcd_spark.vector.pq import pq_encode, pq_topk, train_pq


@pytest.fixture(scope="module")
def clustered(spark):
    """500 vectors in 10 well-separated Gaussian clusters, dim 32."""
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(10, 32)) * 10.0
    vecs = []
    for i in range(500):
        c = i % 10
        vecs.append((i, (centers[c] + rng.normal(size=32) * 0.5).tolist()))
    df = spark.createDataFrame(vecs, "vec_id long, emb array<double>")
    X = {i: np.asarray(v) for i, v in vecs}
    return df, X


def test_pq_codes_and_adc_match_numpy(spark, clustered):
    df, X = clustered
    books = train_pq(df, m=4, k=8, max_iter=5)
    m, k, dsub = books.shape
    codes = {r["vec_id"]: list(r["codes"]) for r in pq_encode(df, books).collect()}
    for vid in list(X)[:50]:
        xs = X[vid].reshape(m, dsub)
        want = [
            int(np.argmin(((xs[j][None, :] - books[j]) ** 2).sum(axis=1)))
            for j in range(m)
        ]
        assert codes[vid] == want, vid
    # ADC scores: engine == numpy lookup-sum, for one probe
    probe_id, pv = 0, X[0]
    res = {
        r["cand_id"]: r["approx_dist"]
        for r in pq_topk(df, [(probe_id, pv.tolist())], books, topk=10).collect()
    }
    luts = np.stack([
        ((pv.reshape(m, dsub)[j][None, :] - books[j]) ** 2).sum(axis=1)
        for j in range(m)
    ])  # (m, k)
    for cand, got in res.items():
        want = float(sum(luts[j, codes[cand][j]] for j in range(m)))
        assert abs(got - round(want, 6)) < 1e-9, (cand, got, want)


def test_pq_retrieves_probe_cluster(spark, clustered):
    """Quality pin at the resolution PQ actually has: same-cluster vectors
    quantize to (near-)identical codes, so the index cannot order WITHIN a
    cluster (ties break by cand_id, deterministically) — but every top-5
    candidate must come from the probe's own cluster, exactly the true
    top-5's cluster. This is the honest statement of PQ recall: perfect at
    cluster granularity, id-level order surrendered to the compression."""
    df, X = clustered
    books = train_pq(df, m=4, k=16, max_iter=6)
    probes = [(i, X[i].tolist()) for i in range(3)]
    res = pq_topk(df, probes, books, topk=5).collect()
    got: dict[int, list] = {}
    for r in res:
        got.setdefault(r["probe_id"], []).append(r["cand_id"])
    for pid, _ in probes:
        assert len(got[pid]) == 5
        assert all(c % 10 == pid % 10 for c in got[pid]), (pid, got[pid])


def test_pq_rejects_indivisible_dim(spark):
    df = spark.createDataFrame([(0, [1.0, 2.0, 3.0])], "vec_id long, emb array<double>")
    with pytest.raises(ValueError):
        train_pq(df, m=2, k=1)


def test_ivfpq_retrieves_cluster_with_inner_ranking(spark, clustered):
    """V7 IVF-PQ: candidates must come from the probe's own cluster (the
    IVF prune) AND — unlike raw-vector PQ, whose same-cluster codes tie —
    residual encoding must discriminate WITHIN the cluster: pinned as
    id-level recall@5 >= 0.4 against the exact top-5 (measured 0.53-0.6 on
    this fixture) and at least two distinct approximate distances."""
    from pcd_spark.vector import ivfpq_topk

    df, X = clustered
    probes = [(i, X[i].tolist()) for i in range(3)]
    res = ivfpq_topk(df, probes, ncells=10, m=4, k=16, nprobe=2, topk=5).collect()
    got: dict[int, list] = {}
    dists: dict[int, set] = {}
    for r in res:
        got.setdefault(r["probe_id"], []).append(r["cand_id"])
        dists.setdefault(r["probe_id"], set()).add(r["approx_dist"])
    hits = tot = 0
    for pid, pv in probes:
        assert all(c % 10 == pid % 10 for c in got[pid]), (pid, got[pid])
        assert len(dists[pid]) >= 2, (pid, dists[pid])
        d = sorted(
            (float(((X[c] - np.asarray(pv)) ** 2).sum()), c)
            for c in X if c != pid
        )
        hits += len({c for _, c in d[:5]} & set(got[pid]))
        tot += 5
    assert hits / tot >= 0.4, hits / tot
