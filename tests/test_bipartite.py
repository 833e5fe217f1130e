"""K26 bipartite projection, K27 coreness, K28 butterfly counting.

Oracles: brute-force pure-python enumeration for projection/butterflies
(independent of the Spark plan), networkx core_number for coreness, and a
K10 cross-check (core number == largest k whose k-core contains the vertex).
"""

from __future__ import annotations

import itertools
import random

import networkx as nx
import pytest

from pcd_spark.graph import (
    bipartite_projection,
    butterfly_counts,
    butterfly_total,
    coreness,
    k_core,
)
from tests.conftest import edges_df


def _bip_fixture(seed: int = 7, n_left: int = 12, n_right: int = 8, p: float = 0.4):
    """Deterministic random bipartite edge list: left ids 0..n_left-1 are
    centers (src), right ids 100..100+n_right-1 are sides (dst)."""
    rng = random.Random(seed)
    edges = [
        (u, 100 + w)
        for u in range(n_left)
        for w in range(n_right)
        if rng.random() < p
    ]
    return edges


def _brute_projection(edges):
    """side-pair -> number of shared centers, via raw set intersection."""
    nbrs: dict[int, set[int]] = {}
    for c, s in edges:
        nbrs.setdefault(s, set()).add(c)
    out = {}
    for u, v in itertools.combinations(sorted(nbrs), 2):
        shared = len(nbrs[u] & nbrs[v])
        if shared:
            out[(u, v)] = shared
    return out


def test_projection_matches_bruteforce(spark):
    edges = _bip_fixture()
    got = {
        (r["u"], r["v"]): r["weight"]
        for r in bipartite_projection(edges_df(spark, edges)).collect()
    }
    assert got == _brute_projection(edges)


def test_projection_min_weight_filters(spark):
    edges = _bip_fixture()
    want = {k: w for k, w in _brute_projection(edges).items() if w >= 3}
    got = {
        (r["u"], r["v"]): r["weight"]
        for r in bipartite_projection(
            edges_df(spark, edges), min_weight=3
        ).collect()
    }
    assert got == want


def test_projection_center_degree_cap(spark):
    """Capped projection == exact projection on the graph with hub centers
    (degree > cap) removed — the documented semantics."""
    edges = _bip_fixture(seed=11)
    cap = 3
    deg: dict[int, int] = {}
    for c, _ in edges:
        deg[c] = deg.get(c, 0) + 1
    kept = [(c, s) for c, s in edges if deg[c] <= cap]
    got = {
        (r["u"], r["v"]): r["weight"]
        for r in bipartite_projection(
            edges_df(spark, edges), max_center_degree=cap
        ).collect()
    }
    assert got == _brute_projection(kept)


def _brute_butterflies(edges):
    """vid -> number of 2x2 bicliques containing vid (dst side)."""
    nbrs: dict[int, set[int]] = {}
    for c, s in edges:
        nbrs.setdefault(s, set()).add(c)
    per: dict[int, int] = {}
    for u, v in itertools.combinations(sorted(nbrs), 2):
        shared = len(nbrs[u] & nbrs[v])
        bf = shared * (shared - 1) // 2
        if bf:
            per[u] = per.get(u, 0) + bf
            per[v] = per.get(v, 0) + bf
    return per


def test_butterflies_match_bruteforce(spark):
    edges = _bip_fixture(seed=3)
    df = edges_df(spark, edges)
    want = _brute_butterflies(edges)
    got = {
        r["vid"]: r["butterflies"] for r in butterfly_counts(df).collect()
    }
    assert got == want
    # each butterfly contains exactly 2 dst-side vertices
    assert butterfly_total(df) * 2 == sum(want.values())


def test_butterflies_known_biclique(spark):
    """K(2,2) is exactly one butterfly; K(3,3) has C(3,2)^2 = 9."""
    k22 = [(0, 100), (0, 101), (1, 100), (1, 101)]
    assert butterfly_total(edges_df(spark, k22)) == 1
    k33 = [(u, 100 + w) for u in range(3) for w in range(3)]
    assert butterfly_total(edges_df(spark, k33)) == 9


# ---------- K27: coreness (full core decomposition) ---------------------------


@pytest.mark.parametrize(
    "name", ["karate", "two_cliques", "path_100", "cycle_9", "er_200", "star_1001"]
)
def test_coreness_matches_networkx(spark, graphs, name):
    g = graphs[name]
    got = {
        r["vid"]: r["core"]
        for r in coreness(edges_df(spark, g["edges"])).collect()
    }
    G = nx.Graph()
    G.add_edges_from(g["edges"])
    want = nx.core_number(G)
    assert got == want


def test_coreness_consistent_with_kcore(spark, graphs):
    """core(v) == max k such that v is in the k-core (K10 cross-check)."""
    g = graphs["karate"]
    df = edges_df(spark, g["edges"])
    core = {r["vid"]: r["core"] for r in coreness(df).collect()}
    for k in (2, 4):
        members = {r["vid"] for r in k_core(df, k=k).collect()}
        assert members == {v for v, c in core.items() if c >= k}


# ---------- K29: maximal independent set --------------------------------------


@pytest.mark.parametrize("name", ["karate", "er_200", "star_1001", "path_100"])
def test_mis_independent_and_maximal(spark, graphs, name):
    from pcd_spark.graph import maximal_independent_set

    g = graphs[name]
    rows = maximal_independent_set(edges_df(spark, g["edges"])).collect()
    mis = {r["vid"] for r in rows if r["in_mis"]}
    out = {r["vid"] for r in rows if not r["in_mis"]}
    adj: dict[int, set[int]] = {}
    for u, v in g["edges"]:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    # every vertex decided, exactly once
    assert mis | out == set(adj) and not (mis & out)
    # independence: no edge inside the set
    assert all(not (adj[u] & mis) for u in mis)
    # maximality: every outside vertex has a neighbor inside
    assert all(adj[u] & mis for u in out)


def test_mis_partition_invariant(spark, graphs):
    from pcd_spark.graph import maximal_independent_set

    g = graphs["er_200"]
    e = edges_df(spark, g["edges"])
    a = {r["vid"]: r["in_mis"]
         for r in maximal_independent_set(e, num_parts=1).collect()}
    b = {r["vid"]: r["in_mis"]
         for r in maximal_independent_set(e, num_parts=16).collect()}
    assert a == b


# ---------- K30: greedy coloring (Jones-Plassmann) ----------------------------


@pytest.mark.parametrize("name", ["karate", "er_200", "two_cliques", "star_1001"])
def test_coloring_proper_and_bounded(spark, graphs, name):
    from pcd_spark.graph import greedy_coloring

    g = graphs[name]
    col = {
        r["vid"]: r["color"]
        for r in greedy_coloring(edges_df(spark, g["edges"])).collect()
    }
    deg: dict[int, int] = {}
    for u, v in g["edges"]:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    # proper: no monochromatic edge; greedy bound: color(v) <= deg(v)
    assert all(col[u] != col[v] for u, v in g["edges"])
    assert all(c <= deg[v] for v, c in col.items())
    # a clique needs exactly its size in colors (two_cliques -> >= 10)
    if name == "two_cliques":
        assert len(set(col.values())) >= 10


def test_coloring_partition_invariant(spark, graphs):
    from pcd_spark.graph import greedy_coloring

    g = graphs["er_200"]
    e = edges_df(spark, g["edges"])
    a = {r["vid"]: r["color"]
         for r in greedy_coloring(e, num_parts=1).collect()}
    b = {r["vid"]: r["color"]
         for r in greedy_coloring(e, num_parts=16).collect()}
    assert a == b


# ---------- K31: conductance ---------------------------------------------------


@pytest.mark.parametrize("name", ["karate", "er_200", "two_cliques"])
def test_conductance_matches_networkx(spark, graphs, name):
    """phi per community vs nx.algorithms.cuts.conductance on a 2-block
    labeling (vid parity), which exercises cut/volume on every vertex."""
    from pcd_spark.graph import conductance_terms

    g = graphs[name]
    e = edges_df(spark, g["edges"])
    labels = spark.createDataFrame(
        [(v, v % 2) for v in range(g["n"])], "vid long, label long"
    )
    got = {
        r["community"]: (r["cut_edges"], r["volume"], r["phi"])
        for r in conductance_terms(e, labels).collect()
    }
    G = nx.Graph()
    G.add_edges_from(g["edges"])
    for c in (0, 1):
        S = {v for v in G.nodes if v % 2 == c}
        want_phi = nx.algorithms.cuts.conductance(G, S)
        cut, vol, phi = got[c]
        assert cut == nx.algorithms.cuts.cut_size(G, S)
        assert vol == nx.algorithms.cuts.volume(G, S)
        assert abs(phi - want_phi) < 1e-8, (name, c, phi, want_phi)


def test_conductance_whole_graph_is_zero(spark, graphs):
    """A community equal to the whole graph has cut 0 and denominator 0 ->
    pinned phi = 0.0."""
    from pcd_spark.graph import conductance_terms

    g = graphs["karate"]
    e = edges_df(spark, g["edges"])
    labels = spark.createDataFrame(
        [(v, 7) for v in range(g["n"])], "vid long, label long"
    )
    rows = conductance_terms(e, labels).collect()
    assert len(rows) == 1 and rows[0]["cut_edges"] == 0 and rows[0]["phi"] == 0.0
