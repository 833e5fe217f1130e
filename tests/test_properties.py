"""Property-based + invariance tests (SURVEY.md §5.3.3).

Fast hypothesis properties run against the pinned numpy oracles (no JVM in
the loop); Spark-side invariances (partition count, edge order, relabeling)
run on seeded graphs with a handful of parametrized cases.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from pcd_spark.graph import connected_components, pagerank, triangle_counts
from pcd_spark.oracle import lpa_numpy, pagerank_numpy
from tests.conftest import edges_df


# ---------- hypothesis over the numpy oracles (fast, exhaustive-ish) --------

edge_lists = st.lists(
    st.tuples(st.integers(0, 19), st.integers(0, 19)),
    min_size=1,
    max_size=60,
)


@settings(max_examples=60, deadline=None)
@given(edges=edge_lists)
def test_lpa_oracle_invariant_under_edge_order(edges):
    e = np.array(edges)
    a, _ = lpa_numpy(20, e, max_iter=15)
    rng = np.random.RandomState(0)
    b, _ = lpa_numpy(20, e[rng.permutation(len(e))], max_iter=15)
    assert np.array_equal(a, b)


@settings(max_examples=40, deadline=None)
@given(edges=edge_lists)
def test_pagerank_oracle_sums_to_one(edges):
    e = np.array([(u, v) for u, v in edges if u != v])
    if len(e) == 0:
        return
    r = pagerank_numpy(20, e, tol=1e-12)
    assert abs(r.sum() - 1.0) < 1e-9


@settings(max_examples=40, deadline=None)
@given(edges=edge_lists, shift=st.integers(1, 100))
def test_lpa_oracle_equivariant_under_vid_shift(edges, shift):
    """Relabeling vertices by +shift relabels communities by +shift."""
    e = np.array(edges)
    a, _ = lpa_numpy(20, e, max_iter=15)
    b, _ = lpa_numpy(20 + shift, e + shift, max_iter=15)
    assert np.array_equal(a + shift, b[shift:])


# ---------- Spark-side invariances ------------------------------------------

@pytest.mark.parametrize("parts", [1, 4, 16])
def test_cc_partition_count_invariant(spark, graphs, parts):
    g = graphs["er_200"]
    got = {
        r["vid"]: r["component"]
        for r in connected_components(
            edges_df(spark, g["edges"]), num_parts=parts
        ).collect()
    }
    base = {
        r["vid"]: r["component"]
        for r in connected_components(edges_df(spark, g["edges"]), num_parts=4).collect()
    }
    assert got == base


def test_pagerank_edge_order_invariant(spark, graphs):
    g = graphs["karate"]
    e1 = g["edges"]
    e2 = list(reversed(e1))
    df1 = edges_df(spark, e1)
    df2 = edges_df(spark, e2)
    for df in (df1, df2):
        pass
    a = {r["vid"]: r["rank"] for r in pagerank(
        df1.unionByName(df1.selectExpr("dst as src", "src as dst")), tol=1e-10
    ).collect()}
    b = {r["vid"]: r["rank"] for r in pagerank(
        df2.unionByName(df2.selectExpr("dst as src", "src as dst")), tol=1e-10
    ).collect()}
    for v in a:
        assert abs(a[v] - b[v]) < 1e-12


def test_triangles_orientation_invariant(spark, graphs):
    """Canonicalization makes triangle counts independent of how each
    undirected edge was stored (u,v) vs (v,u)."""
    g = graphs["er_200"]
    flipped = [(v, u) if (u + v) % 2 else (u, v) for u, v in g["edges"]]
    a = {r["vid"]: r["tri"] for r in triangle_counts(edges_df(spark, g["edges"])).collect()}
    b = {r["vid"]: r["tri"] for r in triangle_counts(edges_df(spark, flipped)).collect()}
    assert a == b
