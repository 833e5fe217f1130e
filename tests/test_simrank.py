"""K58 SimRank — engine vs an independent numpy 0/1-adjacency mirror.

Gotcha pinned here: nx.karate_club_graph() carries edge WEIGHTS, and
nx.simrank_similarity builds its adjacency via nx.to_numpy_array, which
fills weights — so nx's numbers on karate are a weighted variant. The
engine implements the Jeh-Widom 2002 UNWEIGHTED definition (neighbor
sets); it matches the pure dict-definition evaluator exactly, and matches
nx on weight-free graphs.
"""

from __future__ import annotations

import networkx as nx
import numpy as np
import pytest

from pcd_spark.graph import simrank


def _mirror(edges, c, iters, eps=0.0):
    """Independent numpy evaluator over the 0/1 adjacency, identical
    sum-then-divide op order and identical sieve rule."""
    ids = sorted({x for e in edges for x in e})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    A = np.zeros((n, n))
    for u, v in edges:
        A[idx[u], idx[v]] = A[idx[v], idx[u]] = 1.0
    deg = A.sum(0)
    S = np.eye(n)
    off = ~np.eye(n, dtype=bool)
    for _ in range(iters):
        S = c * (A.T @ S @ A) / np.outer(deg, deg)
        if eps > 0:
            S[off & (S < eps)] = 0.0
        np.fill_diagonal(S, 1.0)
    return {
        (u, v): S[idx[u], idx[v]]
        for i, u in enumerate(ids)
        for v in ids[i + 1 :]
        if S[idx[u], idx[v]] > 0
    }


def _df(spark, edges):
    return spark.createDataFrame(
        [(int(u), int(v)) for u, v in edges], "src long, dst long"
    )


@pytest.mark.parametrize("name", ["karate", "er_200", "cycle_9"])
def test_simrank_matches_numpy_mirror(spark, graphs, name):
    edges = graphs[name]["edges"]
    got = {(r.u, r.v): r.s for r in simrank(_df(spark, edges), c=0.6, max_iter=8).collect()}
    exp = _mirror(edges, 0.6, 8)
    assert set(got) == set(exp)
    assert max(abs(got[k] - exp[k]) for k in exp) < 1e-9


def test_simrank_sieve_matches_mirror_with_same_sieve(spark, graphs):
    edges = graphs["karate"]["edges"]
    eps = 0.05
    exp = _mirror(edges, 0.6, 8, eps=eps)
    # robustness guard: no mirror score sits within float-noise of the
    # sieve threshold, so distributed-sum ulp wobble cannot flip a keep
    assert all(abs(s - eps) > 1e-9 for s in exp.values())
    got = {
        (r.u, r.v): r.s
        for r in simrank(_df(spark, edges), c=0.6, max_iter=8, eps=eps).collect()
    }
    assert set(got) == set(exp)
    assert max(abs(got[k] - exp[k]) for k in exp) < 1e-9
    assert len(got) < len(_mirror(edges, 0.6, 8)), "sieve must prune something"


def test_simrank_matches_networkx_on_weightless_graph(spark, graphs):
    # strip karate's weights: nx and the engine must then agree
    G = nx.Graph(nx.karate_club_graph().edges())
    nxs = nx.simrank_similarity(G, importance_factor=0.6,
                                max_iterations=300, tolerance=1e-9)
    got = {
        (r.u, r.v): r.s
        for r in simrank(_df(spark, list(G.edges())), c=0.6, max_iter=40).collect()
    }
    m = max(abs(got[(u, v)] - nxs[u][v]) for (u, v) in got)
    assert m < 1e-6


def test_simrank_range_and_component_isolation(spark, graphs):
    edges = graphs["two_cliques_split"]["edges"]
    got = {(r.u, r.v): r.s for r in simrank(_df(spark, edges), c=0.6, max_iter=6).collect()}
    # off-diagonal scores live in (0, c]
    assert all(0 < s <= 0.6 + 1e-12 for s in got.values())
    # no similarity across disconnected components (cliques are 0-9, 10-19)
    assert all((u < 10) == (v < 10) for (u, v) in got)


def test_k58_query_matches_mirror_on_sf_tables(spark, sf_dir):
    import duckdb

    from pcd_spark.relational import REGISTRY

    con = duckdb.connect()
    edges = con.sql(
        f"""SELECT DISTINCT o_custkey AS src, 100000 + l_suppkey AS dst
            FROM read_parquet('{sf_dir}/lineitem.parquet') l
            JOIN read_parquet('{sf_dir}/orders.parquet') o
              ON l.l_orderkey = o.o_orderkey
            WHERE o_custkey < 10"""
    ).fetchall()
    exp = _mirror(edges, 0.6, 10, eps=1e-4)
    ranked = sorted(
        ((round(s, 6), u, v) for (u, v), s in exp.items()),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:200]
    got = [
        (r["s"], r["u"], r["v"])
        for r in REGISTRY["k58_simrank"]["spark"](spark, sf_dir).collect()
    ]
    assert got == ranked
