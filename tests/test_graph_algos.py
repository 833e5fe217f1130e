"""Golden tests for the graph suite vs pinned oracles (SURVEY.md §5.3.2).

PageRank -> networkx (allclose 1e-6, BASELINE.json:6)
CC       -> networkx connected_components, exact min-vid ids
LPA      -> pinned numpy oracle, exact labels
Triangles-> networkx triangles, exact per-vertex
"""

from __future__ import annotations

import math

import networkx as nx
import numpy as np
import pytest

from pcd_spark.graph import (
    pagerank,
    connected_components,
    label_propagation,
    triangle_counts,
    read_snap_edges,
)
from pcd_spark.oracle import lpa_numpy, pagerank_numpy
from tests.conftest import edges_df


def _nx_graph(g, directed: bool):
    G = nx.DiGraph() if directed else nx.Graph()
    G.add_nodes_from(range(g["n"]))
    G.add_edges_from(g["edges"])
    return G


# ---------- PageRank ---------------------------------------------------------

@pytest.mark.parametrize("name", ["karate", "directed_toy", "er_200", "two_cliques"])
def test_pagerank_matches_networkx(spark, graphs, name):
    g = graphs[name]
    df = edges_df(spark, g["edges"])
    if not g["directed"]:
        # undirected pagerank == directed on symmetrized edges (nx semantics)
        rev = df.selectExpr("dst as src", "src as dst")
        df = df.unionByName(rev)
    got = {r["vid"]: r["rank"] for r in pagerank(df, tol=1e-8).collect()}
    dir_edges = (
        g["edges"]
        if g["directed"]
        else g["edges"] + [(v, u) for u, v in g["edges"]]
    )
    want = pagerank_numpy(g["n"], np.array(dir_edges), tol=1e-14)
    # engine only emits vertices with >=1 edge
    np.testing.assert_allclose(
        [got[v] for v in sorted(got)], [want[v] for v in sorted(got)], atol=1e-6
    )
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_sum_is_one_with_dangling(spark, graphs):
    g = graphs["directed_toy"]
    got = pagerank(edges_df(spark, g["edges"]), tol=1e-10).collect()
    assert abs(sum(r["rank"] for r in got) - 1.0) < 1e-9


# ---------- K14: personalized PageRank ---------------------------------------

@pytest.mark.parametrize(
    "name,sources",
    [
        ("karate", [0]),
        ("karate", [0, 33]),
        ("directed_toy", [0]),     # dangling mass -> reset vector
        ("directed_toy", [2, 5]),
    ],
)
def test_personalized_pagerank_matches_networkx(spark, graphs, name, sources):
    g = graphs[name]
    df = edges_df(spark, g["edges"])
    if not g["directed"]:
        df = df.unionByName(df.selectExpr("dst as src", "src as dst"))
    got = {
        r["vid"]: r["rank"]
        for r in pagerank(df, tol=1e-10, sources=sources).collect()
    }
    dir_edges = (
        g["edges"]
        if g["directed"]
        else g["edges"] + [(v, u) for u, v in g["edges"]]
    )
    want = pagerank_numpy(
        g["n"], np.array(dir_edges), tol=1e-14, sources=sources
    )
    np.testing.assert_allclose(
        [got[v] for v in sorted(got)], [want[v] for v in sorted(got)], atol=1e-6
    )
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_personalized_pagerank_unreachable_gets_zero(spark, graphs):
    # two disconnected cliques; sources in the first -> the second converges
    # to rank 0 (teleport never lands there, no incoming mass)
    g = graphs["two_cliques_split"]
    df = edges_df(spark, g["edges"])
    df = df.unionByName(df.selectExpr("dst as src", "src as dst"))
    got = {
        r["vid"]: r["rank"]
        for r in pagerank(df, tol=1e-12, sources=[0, 1]).collect()
    }
    assert all(got[v] < 1e-9 for v in range(10, 20))
    assert abs(sum(got[v] for v in range(10)) - 1.0) < 1e-9


# ---------- Connected components ---------------------------------------------

@pytest.mark.parametrize("name", ["path_100", "er_200", "two_cliques_split", "two_cliques"])
def test_cc_exact_min_vid(spark, graphs, name):
    g = graphs[name]
    got = {
        r["vid"]: r["component"]
        for r in connected_components(edges_df(spark, g["edges"])).collect()
    }
    G = _nx_graph(g, False)
    want = {}
    for comp in nx.connected_components(G):
        m = min(comp)
        for v in comp:
            want[v] = m
    # engine only sees vertices with >=1 edge; isolated vertices are the
    # caller's concern (vertex dictionary outer-join)
    want = {v: c for v, c in want.items() if G.degree(v) > 0}
    assert got == want


# ---------- Label propagation -------------------------------------------------

@pytest.mark.parametrize("name", ["karate", "two_cliques", "cycle_9", "er_200"])
def test_lpa_matches_pinned_numpy_oracle(spark, graphs, name):
    g = graphs[name]
    got = {
        r["vid"]: r["label"]
        for r in label_propagation(edges_df(spark, g["edges"]), max_iter=30).collect()
    }
    labels, _ = lpa_numpy(g["n"], np.array(g["edges"]), max_iter=30)
    G = _nx_graph(g, False)
    want = {v: int(labels[v]) for v in range(g["n"]) if G.degree(v) > 0}
    assert got == want


def test_lpa_two_cliques_yields_two_communities(spark, graphs):
    g = graphs["two_cliques"]
    got = label_propagation(edges_df(spark, g["edges"]), max_iter=30).collect()
    comm = {}
    for r in got:
        comm.setdefault(r["label"], set()).add(r["vid"])
    assert len(comm) == 2
    sizes = sorted(len(s) for s in comm.values())
    assert sizes == [10, 10]


# ---------- Triangles ----------------------------------------------------------

@pytest.mark.parametrize("name", ["karate", "er_200", "two_cliques"])
def test_triangles_match_networkx(spark, graphs, name):
    g = graphs[name]
    got = {r["vid"]: r["tri"] for r in triangle_counts(edges_df(spark, g["edges"])).collect()}
    want = nx.triangles(_nx_graph(g, False))
    want = {v: c for v, c in want.items() if v in got}
    assert got == want


def test_triangles_degree_broadcast_plan_and_fallback(spark, graphs):
    """VERDICT r1 #5 regression: the O(V) degree table must be BROADCAST into
    the orientation joins when small (two map-side hash joins, zero shuffle
    of the O(E) edge side), and the shuffle-join fallback above the vertex
    cap must produce identical counts (at 10^12 vertices a broadcast would
    be absurd — the cap is the scale guard, not an optimization toggle)."""
    from pcd_spark.graph.edges import canonical_undirected
    from pcd_spark.graph.triangles import _oriented, triangle_counts

    g = graphs["karate"]
    e = edges_df(spark, g["edges"])
    canon = canonical_undirected(e).persist()
    plan = _oriented(canon, None)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2, plan
    # (no inverse plan assertion for broadcast_degrees=False: Catalyst's
    # size-based auto-broadcast still fires on a fixture-sized degree table,
    # which is correct behavior — the flag only withholds the explicit hint
    # that forces the broadcast when stats are absent at 10^12-vertex scale)

    got_b = {r["vid"]: r["tri"] for r in triangle_counts(e, True).collect()}
    got_s = {r["vid"]: r["tri"] for r in triangle_counts(e, False).collect()}
    assert got_b == got_s


# ---------- Modularity (K9) ---------------------------------------------------

@pytest.mark.parametrize("name", ["karate", "er_200", "two_cliques"])
def test_modularity_matches_networkx(spark, graphs, name):
    """K9 vs networkx.community.modularity on (a) exact CC communities and
    (b) an arbitrary vid%3 partition — same Newman formula, 1e-9."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from pcd_spark.graph import modularity

    g = graphs[name]
    e = edges_df(spark, g["edges"])
    G = _nx_graph(g, False)
    G.remove_nodes_from(list(nx.isolates(G)))  # inner-join semantics

    cc = connected_components(e)
    labels_cc = cc.select("vid", F.col("component").alias("label"))
    comm = defaultdict(set)
    for r in labels_cc.collect():
        comm[r["label"]].add(r["vid"])
    want = nx.community.modularity(G, comm.values())
    assert abs(modularity(e, labels_cc) - want) < 1e-9

    labels_mod = cc.select("vid", (F.col("vid") % 3).alias("label"))
    comm3 = defaultdict(set)
    for r in labels_mod.collect():
        comm3[r["label"]].add(r["vid"])
    want3 = nx.community.modularity(G, [c for c in comm3.values() if c])
    assert abs(modularity(e, labels_mod) - want3) < 1e-9


# ---------- Local clustering coefficient (K11) ---------------------------------

@pytest.mark.parametrize("name", ["karate", "er_200", "two_cliques"])
def test_local_clustering_matches_networkx(spark, graphs, name):
    from pcd_spark.graph import local_clustering

    g = graphs[name]
    got = {
        r["vid"]: r["lcc"]
        for r in local_clustering(edges_df(spark, g["edges"])).collect()
    }
    want = nx.clustering(_nx_graph(g, False))
    assert set(got) == {v for v in want if _nx_graph(g, False).degree(v) > 0}
    for v, c in got.items():
        assert abs(c - want[v]) < 1e-7, (v, c, want[v])


# ---------- shortest paths (K12) -----------------------------------------------

@pytest.mark.parametrize("name,src", [("karate", 0), ("path_100", 0), ("er_200", 7)])
def test_sssp_hops_match_networkx(spark, graphs, name, src):
    from pcd_spark.graph import shortest_paths

    g = graphs[name]
    got = {
        r["vid"]: r["dist"]
        for r in shortest_paths(edges_df(spark, g["edges"]), [src]).collect()
    }
    want = nx.single_source_shortest_path_length(_nx_graph(g, False), src)
    # engine's vertex universe excludes isolated vertices; nx includes src
    want = {v: float(d) for v, d in want.items()}
    assert got == {v: d for v, d in want.items() if v in got}
    assert set(want) - set(got) <= {src}  # src absent only if isolated


def test_sssp_directed_matches_networkx(spark, graphs):
    from pcd_spark.graph import shortest_paths

    g = graphs["directed_toy"]
    got = {
        r["vid"]: r["dist"]
        for r in shortest_paths(
            edges_df(spark, g["edges"]), [0], directed=True
        ).collect()
    }
    want = nx.single_source_shortest_path_length(_nx_graph(g, True), 0)
    assert got == {v: float(d) for v, d in want.items()}


def test_sssp_weighted_matches_dijkstra(spark, graphs):
    """Weighted relaxation vs nx Dijkstra on karate with deterministic
    pseudo-random non-negative weights."""
    from pcd_spark.graph import shortest_paths

    g = graphs["karate"]
    wedges = [
        (u, v, 1.0 + ((u * 31 + v * 17) % 10) / 4.0) for u, v in g["edges"]
    ]
    df = spark.createDataFrame(wedges, "src long, dst long, weight double")
    got = {
        r["vid"]: r["dist"]
        for r in shortest_paths(df, [0], weight_col="weight").collect()
    }
    G = nx.Graph()
    G.add_weighted_edges_from(wedges)
    want = nx.single_source_dijkstra_path_length(G, 0)
    assert set(got) == set(want)
    for v in got:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])


def test_sssp_multi_source(spark, graphs):
    from pcd_spark.graph import shortest_paths

    g = graphs["two_cliques"]  # bridge 9-10; sources in both cliques
    got = {
        r["vid"]: r["dist"]
        for r in shortest_paths(edges_df(spark, g["edges"]), [0, 19]).collect()
    }
    want = nx.multi_source_dijkstra_path_length(_nx_graph(g, False), {0, 19})
    assert got == {v: float(d) for v, d in want.items()}


def test_sssp_unreachable_absent(spark, graphs):
    from pcd_spark.graph import shortest_paths

    g = graphs["two_cliques_split"]  # two disconnected K10s
    got = {
        r["vid"]
        for r in shortest_paths(edges_df(spark, g["edges"]), [0]).collect()
    }
    assert got == set(range(10))


# ---------- k-core (K10) -------------------------------------------------------

@pytest.mark.parametrize("name,k", [("karate", 2), ("karate", 4), ("er_200", 3), ("two_cliques", 3)])
def test_kcore_matches_networkx(spark, graphs, name, k):
    """K10 vs nx.k_core: exact vertex set AND within-core degrees."""
    from pcd_spark.graph import k_core

    g = graphs[name]
    got = {
        r["vid"]: r["core_deg"]
        for r in k_core(edges_df(spark, g["edges"]), k=k).collect()
    }
    C = nx.k_core(_nx_graph(g, False), k)
    want = {v: d for v, d in C.degree()}
    assert got == want


def test_kcore_empty_when_k_exceeds_graph(spark, graphs):
    from pcd_spark.graph import k_core

    g = graphs["karate"]
    assert k_core(edges_df(spark, g["edges"]), k=50).count() == 0


# ---------- SNAP reader ---------------------------------------------------------

def test_snap_reader_roundtrip(spark, graphs, snap_dir):
    df = read_snap_edges(spark, f"{snap_dir}/karate.txt")
    got = sorted((r["src"], r["dst"]) for r in df.collect())
    assert got == sorted(graphs["karate"]["edges"])


def test_lpa_struct_fallback_equals_encoded(spark, graphs, monkeypatch):
    """The encoded-argmax fast path and the struct-min overflow fallback are
    the same pinned rule; force the fallback (pretend the encoding would
    overflow) and require identical labels on a hub-skewed graph."""
    import pcd_spark.graph.lpa as lpa_mod
    from pcd_spark.graph import label_propagation
    from tests.conftest import edges_df

    e = edges_df(spark, graphs["ba_1000"]["edges"])
    s1: dict = {}
    fast = {r["vid"]: r["label"]
            for r in label_propagation(e, max_iter=10, stats_out=s1).collect()}
    assert s1["encoded_argmax"] is True

    monkeypatch.setattr(lpa_mod, "_ENC_LIMIT", 0)
    s2: dict = {}
    slow = {r["vid"]: r["label"]
            for r in label_propagation(e, max_iter=10, stats_out=s2).collect()}
    assert s2["encoded_argmax"] is False
    assert fast == slow


def test_lpa_encoded_argmax_handles_negative_vids(spark, monkeypatch):
    """Regression (round-1 ADVICE high): the prod vid path is signed
    xxhash64(repo, path), so labels are routinely negative. The encoded
    argmax must offset-encode — the unfixed code labeled every vertex of the
    triangle {-3, -2, 5} with the nonexistent vertex 3."""
    import pcd_spark.graph.lpa as lpa_mod
    from pcd_spark.graph import label_propagation
    from pcd_spark.graph.csr import label_propagation_csr
    from tests.conftest import edges_df

    edges = [(-3, -2), (-2, 5), (-3, 5), (5, 7), (7, 11), (7, -9)]
    vids = {-9, -3, -2, 5, 7, 11}
    e = edges_df(spark, edges)

    s1: dict = {}
    fast = {r["vid"]: r["label"]
            for r in label_propagation(e, max_iter=15, stats_out=s1).collect()}
    assert s1["encoded_argmax"] is True
    assert set(fast) == vids
    assert set(fast.values()) <= vids  # labels must be real vertices

    # ground truth: the always-correct struct-min fallback
    monkeypatch.setattr(lpa_mod, "_ENC_LIMIT", 0)
    slow = {r["vid"]: r["label"]
            for r in label_propagation(e, max_iter=15).collect()}
    monkeypatch.undo()
    assert fast == slow

    csr = {r["vid"]: r["label"]
           for r in label_propagation_csr(e, max_iter=15, num_parts=3).collect()}
    assert csr == slow


def test_cc_giant_component_label_skew(spark):
    """VERDICT r1 #9: the pointer-jump join keys on `label`; once a giant
    component collapses, nearly every row carries ONE label — maximal join
    skew. AQE skew-join splitting (on in the engine session) must carry it.
    Fixture: a 20k-vertex path (exercises pointer jumping across many
    supersteps while the min label spreads) + 50 hub stars fused to it.
    The expected result is a single component labeled 0 plus an isolated
    2-cycle, all exact."""
    from pcd_spark.graph import connected_components
    from tests.conftest import edges_df

    n = 20_000
    edges = [(i, i + 1) for i in range(n - 1)]
    # hubs: 50 stars of 40 leaves each, centers riveted onto the path
    leaf = n
    for h in range(50):
        c = h * (n // 50)
        for _ in range(40):
            edges.append((c, leaf))
            leaf += 1
    edges.append((leaf, leaf + 1))  # separate 2-vertex component

    got = connected_components(edges_df(spark, edges), max_iter=60).collect()
    comp = {r["vid"]: r["component"] for r in got}
    assert comp[leaf] == leaf and comp[leaf + 1] == leaf
    rest = {v: c for v, c in comp.items() if v < leaf}
    assert set(rest.values()) == {0}
    assert len(rest) == n + 50 * 40


# ---------- K15: HITS ---------------------------------------------------------

@pytest.mark.parametrize("name", ["directed_toy", "karate", "two_cliques"])
def test_hits_matches_numpy_oracle(spark, graphs, name):
    """Engine vs the pinned numpy power-iteration oracle (Kleinberg I/O
    order, L1 normalization). The oracle mirrors networkx.hits semantics —
    both converge to the principal eigenvectors of AtA / AAt."""
    from pcd_spark.graph import hits
    from pcd_spark.oracle import hits_numpy

    g = graphs[name]
    edge_list = (
        g["edges"]
        if g["directed"]
        else g["edges"] + [(v, u) for u, v in g["edges"]]
    )
    want_a, want_h = hits_numpy(edge_list, tol=1e-14)
    stats: dict = {}
    got = {
        r["vid"]: (r["authority"], r["hub"])
        for r in hits(
            edges_df(spark, edge_list), tol=1e-12, max_iter=300,
            stats_out=stats,
        ).collect()
    }
    assert set(got) == set(want_a)
    np.testing.assert_allclose(
        [got[v][0] for v in sorted(got)],
        [want_a[v] for v in sorted(got)], atol=1e-6,
    )
    np.testing.assert_allclose(
        [got[v][1] for v in sorted(got)],
        [want_h[v] for v in sorted(got)], atol=1e-6,
    )
    assert abs(sum(a for a, _ in got.values()) - 1.0) < 1e-9
    assert abs(sum(h for _, h in got.values()) - 1.0) < 1e-9
    assert stats["iterations"] >= 2  # the lagged delta can't stop at step 1


def test_hits_bipartite_roles(spark):
    """On a directed bipartite graph sources are pure hubs (authority 0)
    and sinks pure authorities (hub 0)."""
    from pcd_spark.graph import hits

    e = edges_df(spark, [(0, 10), (0, 11), (1, 10), (2, 11), (2, 12)])
    got = {r["vid"]: (r["authority"], r["hub"]) for r in hits(e).collect()}
    for src in (0, 1, 2):
        assert got[src][0] == 0.0
    for snk in (10, 11, 12):
        assert got[snk][1] == 0.0
    # vertex 10 draws from hubs 0 and 1; 12 only from 2 -> 10 outranks 12
    assert got[10][0] > got[12][0]


# ---------- K16: link prediction ---------------------------------------------

@pytest.mark.parametrize("name", ["karate", "two_cliques", "er_200"])
def test_link_prediction_matches_networkx(spark, graphs, name):
    from pcd_spark.graph import link_prediction

    g = graphs[name]
    G = _nx_graph(g, False)
    want: dict = {}
    for u, v, j in nx.jaccard_coefficient(G):
        want.setdefault((min(u, v), max(u, v)), {})["j"] = j
    for u, v, a in nx.adamic_adar_index(G):
        want[(min(u, v), max(u, v))]["a"] = a
    want = {k: d for k, d in want.items() if d["j"] > 0}  # >=1 common nbr
    got = {
        (r["u"], r["v"]): r
        for r in link_prediction(edges_df(spark, g["edges"])).collect()
    }
    assert set(got) == set(want)
    for k, d in want.items():
        assert abs(got[k]["jaccard"] - d["j"]) < 1e-7
        assert abs(got[k]["adamic_adar"] - d["a"]) < 1e-7


def test_link_prediction_center_degree_cap(spark):
    """The hub-center cap drops exactly the candidates certified ONLY by
    over-connected centers (star center connects everyone; capping it
    leaves the triangle-certified pair)."""
    from pcd_spark.graph import link_prediction

    # star 0-(1..5) plus a path 1-6-2: pair (1,2) certified by 0 AND 6
    edges = [(0, i) for i in range(1, 6)] + [(1, 6), (6, 2)]
    df = edges_df(spark, edges)
    full = {(r["u"], r["v"]): r["common_neighbors"]
            for r in link_prediction(df).collect()}
    capped = {(r["u"], r["v"]): r["common_neighbors"]
              for r in link_prediction(df, max_center_degree=2).collect()}
    assert full[(1, 2)] == 2
    # star-center-0-only candidates vanish; (1,2) keeps center 6 (deg 2),
    # (0,6) keeps centers 1 and 2 (deg 2 each, adjacent to both 0 and 6)
    assert capped == {(1, 2): 1, (0, 6): 2}


# ---------- K17: degree assortativity -----------------------------------------

@pytest.mark.parametrize("name", ["karate", "star_1001", "er_200", "ba_1000"])
def test_assortativity_matches_networkx(spark, graphs, name):
    from pcd_spark.graph import degree_assortativity

    g = graphs[name]
    r_got = degree_assortativity(edges_df(spark, g["edges"])).first()["r"]
    r_want = nx.degree_assortativity_coefficient(_nx_graph(g, False))
    assert abs(r_got - r_want) < 1e-9


def test_assortativity_degenerate_graph_is_zero(spark):
    """All-equal degrees (a cycle) have zero degree variance; the engine
    pins r = 0.0 where the textbook formula is 0/0."""
    from pcd_spark.graph import degree_assortativity

    e = edges_df(spark, [(i, (i + 1) % 6) for i in range(6)])
    assert degree_assortativity(e).first()["r"] == 0.0


# ---------- K18: deterministic random walks -----------------------------------

def _walk_paths(rows):
    paths: dict = {}
    for r in rows:
        paths.setdefault((r["start_vid"], r["walk"]), {})[r["step"]] = r["vid"]
    return {
        k: [p[i] for i in sorted(p)] for k, p in paths.items()
    }


def test_random_walks_structure_and_determinism(spark):
    from pcd_spark.graph import random_walks

    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5), (3, 5)]
    e = edges_df(spark, edges)
    rows = random_walks(e, walk_length=5, walks_per_vertex=2, seed=3).collect()
    sym = set(edges) | {(b, a) for a, b in edges}
    paths = _walk_paths(rows)
    assert len(paths) == 6 * 2  # every vertex starts 2 walks
    for (s, _w), seq in paths.items():
        assert seq[0] == s
        assert len(seq) == 6  # undirected connected graph: never dead-ends
        for a, b in zip(seq, seq[1:]):
            assert (a, b) in sym
    # partition-count invariance (no-rand() discipline)
    rows2 = random_walks(
        e.repartition(5), walk_length=5, walks_per_vertex=2, seed=3
    ).collect()
    assert sorted(map(tuple, rows2)) == sorted(map(tuple, rows))
    # a different seed must actually change some walk (non-degenerate rule)
    rows3 = random_walks(e, walk_length=5, walks_per_vertex=2, seed=4).collect()
    assert sorted(map(tuple, rows3)) != sorted(map(tuple, rows))


def test_random_walks_match_hash_simulation(spark):
    """Exact oracle: simulate the pinned rule in Python, driving it with
    xxhash64 values extracted FROM SPARK (the rule is argmin
    (xxhash64(start, walk, step, cand, seed), cand) over neighbors)."""
    from pcd_spark.graph import random_walks

    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5), (3, 5)]
    sym = set(edges) | {(b, a) for a, b in edges}
    adj: dict = {}
    for a, b in sym:
        adj.setdefault(a, []).append(b)
    L, seed = 5, 3
    paths = _walk_paths(
        random_walks(
            edges_df(spark, edges), walk_length=L, walks_per_vertex=1,
            seed=seed,
        ).collect()
    )
    from pyspark.sql import functions as F

    lookups = [
        (s, 0, step, d)
        for s in adj
        for step in range(1, L + 1)
        for nbrs in adj.values()
        for d in nbrs
    ]
    ldf = spark.createDataFrame(
        lookups, "start_vid long, walk int, step int, dst long"
    ).select(
        "*",
        F.xxhash64("start_vid", "walk", "step", "dst", F.lit(seed)).alias("h"),
    )
    H = {
        (r["start_vid"], r["walk"], r["step"], r["dst"]): r["h"]
        for r in ldf.collect()
    }
    for s in adj:
        cur, seq = s, [s]
        for step in range(1, L + 1):
            cur = min(adj[cur], key=lambda d: (H[(s, 0, step, d)], d))
            seq.append(cur)
        assert paths[(s, 0)] == seq


def test_random_walks_directed_dead_end(spark):
    from pcd_spark.graph import random_walks

    e = edges_df(spark, [(0, 1), (1, 2)])
    paths = _walk_paths(random_walks(e, walk_length=4, directed=True).collect())
    assert paths[(0, 0)] == [0, 1, 2]  # stops at the sink
    assert paths[(2, 0)] == [2]  # sink start -> length-0 walk


# ---------- K19: neighbor feature aggregation ---------------------------------

def test_neighbor_feature_agg_matches_numpy(spark):
    from pcd_spark.graph.features import neighbor_feature_agg

    edges = [(0, 1), (1, 2), (0, 2), (2, 3)]
    vecs = {0: [1.0, 2.0], 1: [3.0, -1.0], 2: [0.5, 0.5], 3: [10.0, 0.0]}
    e = edges_df(spark, edges)
    f = spark.createDataFrame(
        [(k, v) for k, v in vecs.items()], "vid long, emb array<double>"
    )
    sym = set(edges) | {(b, a) for a, b in edges}
    adj: dict = {}
    for a, b in sym:
        adj.setdefault(a, []).append(b)
    for agg, red in [("mean", lambda xs: sum(xs) / len(xs)),
                     ("sum", sum), ("max", max), ("min", min)]:
        got = {
            r["vid"]: (r["n_neighbors"], list(r["agg_emb"]))
            for r in neighbor_feature_agg(e, f, agg=agg).collect()
        }
        for v, nbrs in adj.items():
            want = [red([vecs[u][d] for u in nbrs]) for d in range(2)]
            assert got[v][0] == len(nbrs)
            assert all(abs(a - b) < 1e-12 for a, b in zip(got[v][1], want)), (
                agg, v, got[v], want)


def test_neighbor_feature_agg_directed_and_missing_features(spark):
    from pcd_spark.graph.features import neighbor_feature_agg

    # directed: messages flow src -> dst only; vertex 9 has no feature row
    # and contributes nothing; vertex 1's only in-neighbor is featureless 9,
    # so 1 is absent from the output
    e = edges_df(spark, [(0, 2), (9, 2), (9, 1)])
    f = spark.createDataFrame(
        [(0, [2.0]), (2, [5.0])], "vid long, emb array<double>"
    )
    got = {
        r["vid"]: (r["n_neighbors"], list(r["agg_emb"]))
        for r in neighbor_feature_agg(e, f, agg="mean", directed=True).collect()
    }
    assert got == {2: (1, [2.0])}


# ---------- K20: strongly connected components ---------------------------------

@pytest.mark.parametrize(
    "name,edge_list",
    [
        ("cycle2_tail", [(0, 1), (1, 0), (1, 2)]),
        ("two_cycles_bridged",
         [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 3)]),
        ("dag_all_singletons", [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)]),
        ("selfloop_vertex", [(5, 5), (0, 1), (1, 0)]),
    ],
)
def test_scc_matches_networkx(spark, name, edge_list):
    from pcd_spark.graph import strongly_connected_components

    G = nx.DiGraph(edge_list)
    want = {}
    for comp in nx.strongly_connected_components(G):
        m = min(comp)
        for v in comp:
            want[v] = m
    got = {
        r["vid"]: r["component"]
        for r in strongly_connected_components(edges_df(spark, edge_list)).collect()
    }
    assert got == want


def test_scc_directed_toy_and_phases(spark, graphs):
    from pcd_spark.graph import strongly_connected_components

    g = graphs["directed_toy"]
    G = nx.DiGraph(g["edges"])
    want = {}
    for comp in nx.strongly_connected_components(G):
        m = min(comp)
        for v in comp:
            want[v] = m
    stats: dict = {}
    got = {
        r["vid"]: r["component"]
        for r in strongly_connected_components(
            edges_df(spark, g["edges"]), stats_out=stats
        ).collect()
    }
    assert got == want
    assert stats["phases"] >= 1


def test_scc_pseudo_random_multiphase(spark):
    """A graph whose condensation forces >1 coloring phase — the residue
    loop (remove completed SCCs, recolor) must terminate with exact ids."""
    import hashlib

    from pcd_spark.graph import strongly_connected_components

    edges = []
    for u in range(80):
        for k in range(2):
            v = int(hashlib.md5(f"{u}.{k}".encode()).hexdigest(), 16) % 80
            if v != u:
                edges.append((u, v))
    edges = sorted(set(edges))
    G = nx.DiGraph(edges)
    want = {}
    for comp in nx.strongly_connected_components(G):
        m = min(comp)
        for v in comp:
            want[v] = m
    stats: dict = {}
    got = {
        r["vid"]: r["component"]
        for r in strongly_connected_components(
            edges_df(spark, edges), stats_out=stats
        ).collect()
    }
    assert got == want
    assert stats["phases"] == 2  # pinned: this fixture needs the residue pass


# ---- K21 HyperBall ---------------------------------------------------------


@pytest.mark.parametrize("name", ["er_200", "two_cliques", "cycle_9"])
def test_hyperball_nf_tracks_exact_bfs(spark, graphs, name):
    """N(t) estimates must track the exact BFS neighborhood function within
    HLL error (m=64 -> per-vertex RSE ~13%; the SUM over vertices is pinned
    empirically at 10% on these deterministic fixtures), and converge in
    exactly diameter+1 supersteps (registers are monotone; the first
    superstep after every ball is complete is the no-change fixpoint)."""
    from pcd_spark.graph import hyperball

    g = graphs[name]
    G = nx.Graph(g["edges"])
    stats: dict = {}
    hyperball(edges_df(spark, g["edges"]), m=64, stats_out=stats).count()

    sp = dict(nx.all_pairs_shortest_path_length(G))
    nodes = list(G.nodes())
    for t, est in stats["nf"]:
        exact = sum(
            1 for u in nodes for v in nodes if sp[u].get(v, 1 << 30) <= t
        )
        assert abs(est / exact - 1) < 0.10, (name, t, est, exact)
    assert stats["iterations"] == nx.diameter(G) + 1


def test_hyperball_ball_estimates_component_size(spark, graphs):
    """At convergence every vertex's ball is its whole component: on the
    split two-clique graph each estimate must sit within HLL tolerance of
    10, and the two components must not bleed into each other."""
    from pcd_spark.graph import hyperball

    g = graphs["two_cliques_split"]
    stats: dict = {}
    rows = hyperball(
        edges_df(spark, g["edges"]), m=64, stats_out=stats
    ).collect()
    assert len(rows) == 20
    for r in rows:
        assert abs(r["ball_est"] - 10) / 10 < 0.25, dict(r)
    # complete graphs have diameter 1 -> ball complete after step 1
    assert stats["iterations"] == 2
    assert stats["effective_diameter"] == 1


def test_hyperball_deterministic_and_monotone(spark, graphs):
    """Fixed hash salt -> bit-identical runs; N(t) is non-decreasing."""
    from pcd_spark.graph import hyperball

    g = graphs["cycle_9"]
    s1, s2 = {}, {}
    r1 = sorted(
        (r["vid"], r["ball_est"])
        for r in hyperball(edges_df(spark, g["edges"]), stats_out=s1).collect()
    )
    r2 = sorted(
        (r["vid"], r["ball_est"])
        for r in hyperball(edges_df(spark, g["edges"]), stats_out=s2).collect()
    )
    assert r1 == r2
    # the SUM over vertices is float and partial-agg order varies run-to-run
    # by a ULP; the underlying registers are bit-identical (r1 == r2 above)
    assert [t for t, _ in s1["nf"]] == [t for t, _ in s2["nf"]]
    assert [v for _, v in s1["nf"]] == pytest.approx(
        [v for _, v in s2["nf"]], rel=1e-9
    )
    # monotone up to summation jitter: once registers stop changing, N(t)
    # is the SAME per-vertex estimates re-summed in a different partial-agg
    # order, which can dip by a ULP
    nf = [v for _, v in s1["nf"]]
    for a, b in zip(nf, nf[1:]):
        assert b >= a * (1 - 1e-9), nf


@pytest.mark.parametrize("name", ["er_200", "two_cliques", "path_100"])
def test_harmonic_centrality_tracks_networkx(spark, graphs, name):
    """K22: per-vertex estimates within HLL tolerance of exact
    nx.harmonic_centrality (m=64 -> RSE ~13%/vertex; pinned at 20%/vertex
    and 10% on the sum over these deterministic fixtures)."""
    from pcd_spark.graph import harmonic_centrality

    g = graphs[name]
    G = nx.Graph(g["edges"])
    got = {
        r["vid"]: r["harmonic"]
        for r in harmonic_centrality(edges_df(spark, g["edges"]), m=64).collect()
    }
    want = nx.harmonic_centrality(G)
    assert set(got) == {v for v in G.nodes() if G.degree(v) > 0}
    for v, h in got.items():
        assert abs(h / want[v] - 1) < 0.20, (name, v, h, want[v])
    s_got, s_want = sum(got.values()), sum(want[v] for v in got)
    assert abs(s_got / s_want - 1) < 0.10


def test_harmonic_centrality_ranks_hub_first(spark, graphs):
    """The star center must rank first by a wide margin — the property a
    centrality consumer actually relies on."""
    from pcd_spark.graph import harmonic_centrality

    g = graphs["star_1001"]
    rows = harmonic_centrality(edges_df(spark, g["edges"]), m=64).collect()
    ranked = sorted(rows, key=lambda r: -r["harmonic"])
    assert ranked[0]["vid"] == 0
    assert ranked[0]["harmonic"] > 1.5 * ranked[1]["harmonic"]


# ---- K23 betweenness centrality ---------------------------------------------


@pytest.mark.parametrize("name", ["karate", "two_cliques", "cycle_9"])
def test_betweenness_full_sources_matches_networkx(spark, graphs, name):
    """With every vertex as a source the raw pair-dependency sums equal
    exactly 2x networkx betweenness (undirected pairs counted from both
    endpoints) — float-exact Brandes, not an approximation."""
    from pcd_spark.graph import betweenness_centrality

    g = graphs[name]
    G = nx.Graph(g["edges"])
    got = {
        r["vid"]: r["betweenness"]
        for r in betweenness_centrality(edges_df(spark, g["edges"])).collect()
    }
    want = nx.betweenness_centrality(G, normalized=False)
    for v in got:
        assert abs(got[v] - 2.0 * want[v]) < 1e-6, (name, v, got[v], want[v])


def test_betweenness_directed_matches_networkx(spark, graphs):
    """Directed semantics (each ordered pair once) incl. dangling sinks,
    which must still settle in the forward BFS and feed dependencies."""
    from pcd_spark.graph import betweenness_centrality

    g = graphs["directed_toy"]
    G = nx.DiGraph(g["edges"])
    got = {
        r["vid"]: r["betweenness"]
        for r in betweenness_centrality(
            edges_df(spark, g["edges"]), directed=True
        ).collect()
    }
    want = nx.betweenness_centrality(G, normalized=False)
    for v in got:
        assert abs(got[v] - want[v]) < 1e-6, (v, got[v], want[v])


def test_betweenness_sampled_sources_exact_partial_sums(spark, graphs):
    """A sampled-source run returns the EXACT Brandes partial sums for the
    sample (the Brandes-Pich estimator is caller-side scaling) — compared
    against an independent pure-python Brandes accumulator."""
    import collections

    from pcd_spark.graph import betweenness_centrality

    g = graphs["er_200"]
    G = nx.Graph(g["edges"])
    S = [0, 7, 13, 42]
    got = {
        r["vid"]: r["betweenness"]
        for r in betweenness_centrality(
            edges_df(spark, g["edges"]), sources=S
        ).collect()
    }
    acc: dict = collections.defaultdict(float)
    for s in S:
        dist = {s: 0}
        sigma = {s: 1.0}
        order = [s]
        dq = collections.deque([s])
        while dq:
            u = dq.popleft()
            for w in G[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    sigma[w] = 0.0
                    dq.append(w)
                    order.append(w)
                if dist[w] == dist[u] + 1:
                    sigma[w] += sigma[u]
        delta: dict = collections.defaultdict(float)
        for w in reversed(order):
            for u in G[w]:
                if dist.get(u, -2) == dist[w] - 1:
                    delta[u] += sigma[u] / sigma[w] * (1 + delta[w])
            if w != s:
                acc[w] += delta[w]
    for v in got:
        assert abs(got[v] - acc[v]) < 1e-6, (v, got[v], acc[v])


def test_betweenness_hash_sampling_deterministic(spark, graphs):
    """n_samples picks the same xxhash64-ordered sources every run."""
    from pcd_spark.graph import betweenness_centrality

    g = graphs["two_cliques"]
    s1, s2 = {}, {}
    r1 = sorted(
        (r["vid"], round(r["betweenness"], 9))
        for r in betweenness_centrality(
            edges_df(spark, g["edges"]), n_samples=3, stats_out=s1
        ).collect()
    )
    r2 = sorted(
        (r["vid"], round(r["betweenness"], 9))
        for r in betweenness_centrality(
            edges_df(spark, g["edges"]), n_samples=3, stats_out=s2
        ).collect()
    )
    assert s1["sources"] == s2["sources"] and len(s1["sources"]) == 3
    assert r1 == r2


# ---- K24 k-truss -------------------------------------------------------------


@pytest.mark.parametrize(
    "name,k", [("karate", 3), ("karate", 4), ("karate", 5), ("er_200", 4)]
)
def test_ktruss_matches_networkx(spark, graphs, name, k):
    """Edge set of the k-truss must equal nx.k_truss exactly — peeling is
    order-independent, so synchronous rounds hit the sequential fixpoint."""
    from pcd_spark.graph import k_truss

    g = graphs[name]
    G = nx.Graph(g["edges"])
    got = sorted(
        (r["src"], r["dst"])
        for r in k_truss(edges_df(spark, g["edges"]), k).collect()
    )
    want = sorted((min(u, v), max(u, v)) for u, v in nx.k_truss(G, k).edges())
    assert got == want


def test_ktruss_bridge_removed_and_support_exact(spark, graphs):
    """Two 10-cliques joined by one bridge: any k >= 3 truss drops the
    bridge (it closes no triangle) and keeps both cliques, where every
    edge's within-truss support is exactly n-2 = 8."""
    from pcd_spark.graph import k_truss

    g = graphs["two_cliques"]
    stats: dict = {}
    rows = k_truss(edges_df(spark, g["edges"]), k=5, stats_out=stats).collect()
    got = {(r["src"], r["dst"]): r["sup"] for r in rows}
    assert (9, 10) not in got          # the bridge
    assert len(got) == 90              # 2 x C(10,2)
    assert all(s == 8 for s in got.values())


def test_ktruss_empty_when_no_triangles(spark, graphs):
    from pcd_spark.graph import k_truss

    g = graphs["path_100"]
    assert k_truss(edges_df(spark, g["edges"]), k=3).count() == 0


# ---- K5 weighted voting ------------------------------------------------------


@pytest.mark.parametrize("name", ["karate", "er_200", "two_cliques"])
def test_weighted_lpa_matches_pinned_numpy_oracle(spark, graphs, name):
    """Weighted votes (integer weights so float ties are exact) must match
    the weighted numpy oracle label-for-label."""
    g = graphs[name]
    wedges = [(u, v, float((u + v) % 3 + 1)) for u, v in g["edges"]]
    df = spark.createDataFrame(wedges, "src long, dst long, weight double")
    got = {
        r["vid"]: r["label"]
        for r in label_propagation(df, max_iter=30, weight_col="weight").collect()
    }
    labels, _ = lpa_numpy(
        g["n"],
        np.array(g["edges"]),
        max_iter=30,
        weights=np.array([w for _, _, w in wedges]),
    )
    G = _nx_graph(g, False)
    want = {v: int(labels[v]) for v in range(g["n"]) if G.degree(v) > 0}
    assert got == want


def test_weighted_lpa_heavy_edge_overrides_majority(spark):
    """A star center with one weight-10 edge to leaf 3 and weight-1 edges to
    leaves 1,2,4: unweighted voting gives the center label 1 (smallest among
    equals); weighted voting must give it leaf 3's label."""
    rows = [(0, 1, 1.0), (0, 2, 1.0), (0, 3, 10.0), (0, 4, 1.0)]
    df = spark.createDataFrame(rows, "src long, dst long, weight double")
    got_w = {
        r["vid"]: r["label"]
        for r in label_propagation(df, max_iter=1, weight_col="weight").collect()
    }
    got_u = {
        r["vid"]: r["label"]
        for r in label_propagation(df, max_iter=1).collect()
    }
    assert got_w[0] == 3
    assert got_u[0] == 1


def test_weighted_lpa_uniform_weights_equal_unweighted(spark, graphs):
    """weight=1 everywhere must reproduce the unweighted result exactly
    (the struct-min fallback and the encoded hot path agree)."""
    g = graphs["karate"]
    df = spark.createDataFrame(
        [(u, v, 1.0) for u, v in g["edges"]], "src long, dst long, weight double"
    )
    got_w = {
        r["vid"]: r["label"]
        for r in label_propagation(df, max_iter=30, weight_col="weight").collect()
    }
    got_u = {
        r["vid"]: r["label"]
        for r in label_propagation(df.select("src", "dst"), max_iter=30).collect()
    }
    assert got_w == got_u


# ---- K25 eigenvector centrality ----------------------------------------------


@pytest.mark.parametrize("name", ["karate", "er_200"])
def test_eigenvector_centrality_matches_networkx(spark, graphs, name):
    """Power iteration to the principal eigenvector, L2-normalized —
    allclose 1e-6 vs networkx on non-bipartite fixtures."""
    from pcd_spark.graph import eigenvector_centrality

    g = graphs[name]
    G = nx.Graph(g["edges"])
    got = {
        r["vid"]: r["centrality"]
        for r in eigenvector_centrality(
            edges_df(spark, g["edges"]), tol=1e-10
        ).collect()
    }
    want = nx.eigenvector_centrality(G, max_iter=2000, tol=1e-12)
    assert set(got) == {v for v in G.nodes() if G.degree(v) > 0}
    for v in got:
        assert abs(got[v] - want[v]) < 1e-6, (name, v, got[v], want[v])


def test_eigenvector_centrality_wheel_hub_first(spark):
    """Wheel graph (non-bipartite): the hub must dominate, and the rim must
    be symmetric (equal centralities)."""
    from pcd_spark.graph import eigenvector_centrality

    W = nx.wheel_graph(12)  # vertex 0 = hub
    e = spark.createDataFrame(
        [(int(u), int(v)) for u, v in W.edges()], "src long, dst long"
    )
    got = {r["vid"]: r["centrality"] for r in
           eigenvector_centrality(e, tol=1e-12).collect()}
    assert got[0] == max(got.values())
    rim = [got[v] for v in range(1, 12)]
    assert max(rim) - min(rim) < 1e-9


# ---- guard rails (ADVICE r2): refuse instead of silently-wrong --------------


def test_betweenness_missing_source_raises(spark, graphs):
    """An explicit source absent from the graph contributes zero dependency
    while inflating a caller's Brandes-Pich V/S scaling — must raise, not
    silently drop (ADVICE r2)."""
    from pcd_spark.graph import betweenness_centrality

    e = edges_df(spark, graphs["two_cliques"]["edges"])
    with pytest.raises(ValueError, match="sources not in the graph"):
        betweenness_centrality(e, sources=[0, 99999])


def test_betweenness_exact_mode_vertex_guard(spark, graphs):
    """Exact mode (no sources, no n_samples) collects every vertex id to the
    driver and runs O(V·E); above the limit it must raise with a pointer to
    n_samples rather than OOM the driver (VERDICT r2 'What's wrong' #2)."""
    from pcd_spark.graph import betweenness_centrality

    e = edges_df(spark, graphs["er_200"]["edges"])
    with pytest.raises(ValueError, match="n_samples"):
        betweenness_centrality(e, exact_vertex_limit=10)


def test_betweenness_forward_nonconvergence_raises(spark):
    """BFS depth > max_iter means sigma/dist are INCOMPLETE and the backward
    sweep would return corrupted sums — must raise (ADVICE r2, medium)."""
    from pcd_spark.graph import betweenness_centrality

    path = edges_df(spark, [(i, i + 1) for i in range(8)])  # depth 8 from 0
    with pytest.raises(RuntimeError, match="forward BFS"):
        betweenness_centrality(path, sources=[0], max_iter=3)
    # and the same graph converges fine when max_iter covers the depth
    stats: dict = {}
    betweenness_centrality(path, sources=[0], max_iter=20, stats_out=stats)
    assert stats["converged"] is True


def test_ktruss_peel_exhaustion_raises(spark):
    """Peeling cascades can need many rounds; exhausting max_iter mid-cascade
    would return edges with support < k-2 — must raise (ADVICE r2)."""
    from pcd_spark.graph import k_truss

    # two triangles sharing edge (1,2): k=4 peel takes >= 2 rounds
    # (round 1 removes the support-1 edges, round 2 removes 1-2)
    edges = [(0, 1), (1, 2), (0, 2), (1, 3), (2, 3)]
    e = edges_df(spark, edges)
    with pytest.raises(RuntimeError, match="fixpoint"):
        k_truss(e, k=4, max_iter=1)
    stats: dict = {}
    out = k_truss(e, k=4, max_iter=50, stats_out=stats)
    assert out.count() == 0 and stats["converged"] is True


# ---- K32 Katz centrality ------------------------------------------------------


@pytest.mark.parametrize("name", ["karate", "er_200"])
def test_katz_centrality_matches_networkx(spark, graphs, name):
    """Affine fixpoint x = alpha*A^T x + beta, L2-normalized — allclose
    1e-6 vs networkx at the same alpha/beta."""
    from pcd_spark.graph import katz_centrality
    from pcd_spark.graph.edges import symmetrize

    g = graphs[name]
    G = nx.Graph(g["edges"])
    got = {
        r["vid"]: r["katz"]
        for r in katz_centrality(
            symmetrize(edges_df(spark, g["edges"])), alpha=0.05, tol=1e-12
        ).collect()
    }
    want = nx.katz_centrality(G, alpha=0.05, max_iter=5000, tol=1e-14)
    assert set(got) == {v for v in G.nodes() if G.degree(v) > 0}
    for v in got:
        assert abs(got[v] - want[v]) < 1e-6, (name, v, got[v], want[v])


def test_katz_divergence_raises(spark, graphs):
    """alpha beyond the spectral radius must RAISE, not return a partial
    fixpoint (same guard discipline as betweenness/k-truss, ADVICE r2)."""
    from pcd_spark.graph import katz_centrality
    from pcd_spark.graph.edges import symmetrize

    e = symmetrize(edges_df(spark, graphs["karate"]["edges"]))
    with pytest.raises(RuntimeError, match="no convergence"):
        katz_centrality(e, alpha=0.9, tol=1e-10, max_iter=30)


# ---------- SCAN structural similarity (K38) -----------------------------------

@pytest.mark.parametrize("name", ["karate", "er_200", "two_cliques"])
def test_scan_similarity_matches_bruteforce(spark, graphs, name):
    """K38 vs a brute-force python oracle: for every undirected edge (u,v),
    sigma = (|N(u) ∩ N(v)| + 2) / sqrt((deg(u)+1)(deg(v)+1)) over closed
    neighborhoods (Xu et al. 2007) — float-exact to the 6-dp rounding, and
    the edge set must be exactly the canonical edge set."""
    from pcd_spark.graph import scan_similarity

    g = _nx_graph(graphs[name], False)
    got = {
        (r["src"], r["dst"]): (r["n_common"], r["sigma"])
        for r in scan_similarity(edges_df(spark, graphs[name]["edges"])).collect()
    }
    want = {}
    for u, v in g.edges():
        lo, hi = min(u, v), max(u, v)
        common = len(set(g[u]) & set(g[v]))
        sigma = (common + 2) / math.sqrt((g.degree(u) + 1) * (g.degree(v) + 1))
        want[(lo, hi)] = (common, round(sigma, 6))
    assert set(got) == set(want)
    for e, (c, s) in want.items():
        assert got[e][0] == c, (e, got[e], c)
        assert abs(got[e][1] - s) <= 1e-6, (e, got[e], s)
