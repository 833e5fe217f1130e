"""V5 k-means golden tests: engine vs the pinned numpy Lloyd's oracle.

Determinism caveat pinned here too: Spark sums per-cluster coordinates in
partition order, so centroids match the oracle to fp-reordering tolerance
(atol 1e-9 after <=20 iterations on well-separated data), and assignments
match EXACTLY because the test data keeps points far from decision
boundaries relative to that error.
"""

from __future__ import annotations

import numpy as np
import pytest

from pcd_spark.oracle import kmeans_numpy
from pcd_spark.vector import kmeans


def _blob_data(n_per: int = 40, k: int = 4, dim: int = 8):
    """Deterministic well-separated blobs: centers on coordinate axes at
    distance 10, points jittered by a fixed LCG (no np.random state leaks)."""
    rng = np.random.default_rng(20260817)
    centers = np.zeros((k, dim))
    for j in range(k):
        centers[j, j] = 10.0
    pts, ids = [], []
    for j in range(k):
        pts.append(centers[j] + rng.normal(0, 0.5, size=(n_per, dim)))
        ids.extend(range(j * n_per, (j + 1) * n_per))
    return np.array(ids), np.vstack(pts)


@pytest.fixture(scope="module")
def blobs(spark):
    ids, x = _blob_data()
    df = spark.createDataFrame(
        [(int(i), [float(v) for v in row]) for i, row in zip(ids, x)],
        "vec_id long, emb array<double>",
    )
    return ids, x, df


def test_kmeans_matches_numpy_oracle(spark, blobs):
    ids, x, df = blobs
    stats: dict = {}
    got = {
        r["vec_id"]: r["cluster"]
        for r in kmeans(df, k=4, stats_out=stats).collect()
    }
    a, centroids, inertia = kmeans_numpy(ids, x, k=4)
    want = {int(i): int(c) for i, c in zip(ids, a)}
    assert got == want
    np.testing.assert_allclose(stats["centroids"], centroids, atol=1e-9)
    assert abs(stats["inertia"] - inertia) < 1e-6 * max(1.0, inertia)
    # NOTE: no blob-purity claim here — the default init picks the 4 smallest
    # ids, which all sit in blob 0, so Lloyd's converges to a legitimate local
    # optimum that splits blob 0. Purity is asserted in the explicit-init test
    # below, where the seeds are one-per-blob.


def test_kmeans_explicit_init_and_determinism(spark, blobs):
    ids, x, df = blobs
    init = [0, 40, 80, 120]  # one seed per blob
    got1 = {
        r["vec_id"]: r["cluster"]
        for r in kmeans(df, k=4, init_ids=init).collect()
    }
    got2 = {
        r["vec_id"]: r["cluster"]
        for r in kmeans(df.repartition(7), k=4, init_ids=init).collect()
    }
    assert got1 == got2  # partition-count invariant on separated data
    a, _, _ = kmeans_numpy(ids, x, k=4, init_ids=init)
    assert got1 == {int(i): int(c) for i, c in zip(ids, a)}
    # seeds landed in their own blobs -> cluster j == blob j
    assert all(got1[j * 40] == j for j in range(4))


def test_kmeans_empty_cluster_keeps_centroid(spark):
    # k=3 with two far blobs and seeds {0,1,2} all in blob A: one seed
    # centroid goes empty after round 1 and must persist verbatim
    rows = [(i, [float(i % 2), 0.0]) for i in range(6)]  # blob A near origin
    rows += [(10 + i, [100.0 + (i % 2), 50.0]) for i in range(6)]  # blob B
    df = spark.createDataFrame(rows, "vec_id long, emb array<double>")
    ids = np.array([r[0] for r in rows])
    x = np.array([r[1] for r in rows])
    stats: dict = {}
    got = {
        r["vec_id"]: r["cluster"]
        for r in kmeans(df, k=3, stats_out=stats).collect()
    }
    a, centroids, _ = kmeans_numpy(ids, x, k=3)
    assert got == {int(i): int(c) for i, c in zip(ids, a)}
    np.testing.assert_allclose(stats["centroids"], centroids, atol=1e-9)


def test_kmeans_validates_k(spark):
    df = spark.createDataFrame(
        [(0, [0.0]), (1, [1.0])], "vec_id long, emb array<double>"
    )
    with pytest.raises(ValueError, match="exceeds row count"):
        kmeans(df, k=5)
