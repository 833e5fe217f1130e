"""K50 Leiden golden tests (SURVEY.md §2 K50).

Leiden has no deterministic public oracle (leidenalg / networkx variants are
seeded-random), so exactness is pinned structurally, mirroring K13's test
strategy plus the one property that DEFINES Leiden over Louvain:

  - CONNECTIVITY GUARANTEE: every returned community induces a connected
    subgraph — checked on karate, random GNP graphs, and a bridge graph
    built to tempt the Louvain disconnect;
  - graphs with unambiguous community structure (cliques) recovered EXACTLY;
  - 4-vertex weighted graph achieves the BRUTE-FORCE maximum modularity;
  - reported Q equals networkx's modularity of the returned partition to
    1e-9 (coarsening/refinement bookkeeping invariant);
  - karate quality >= 0.40 and >= Louvain's quality - 1e-9 on the same
    graph (refinement must not cost modularity);
  - determinism across runs and partition counts.
"""

from __future__ import annotations

import networkx as nx
import pytest

from pcd_spark.graph import leiden, louvain
from pcd_spark.graph.quality import modularity
from tests.conftest import edges_df


def _communities(rows) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r["label"], set()).add(r["vid"])
    return out


def _assert_all_connected(G: nx.Graph, comms: dict[int, set[int]]):
    for label, members in comms.items():
        sub = G.subgraph(members)
        assert nx.is_connected(sub), (
            f"community {label} ({sorted(members)}) is disconnected"
        )


def test_leiden_two_cliques_exact(spark, graphs):
    g = graphs["two_cliques"]
    rows = leiden(edges_df(spark, g["edges"])).collect()
    assert _communities(rows) == {0: set(range(10)), 10: set(range(10, 20))}


def test_leiden_ring_of_cliques_exact(spark):
    G = nx.ring_of_cliques(4, 5)
    edges = sorted((min(u, v), max(u, v)) for u, v in G.edges())
    rows = leiden(edges_df(spark, edges)).collect()
    want = {min(c): set(c) for c in (range(i * 5, i * 5 + 5) for i in range(4))}
    assert _communities(rows) == want


def test_leiden_karate_quality_connectivity_determinism(spark, graphs):
    g = graphs["karate"]
    df = edges_df(spark, g["edges"])
    stats: dict = {}
    rows = leiden(df, stats_out=stats).collect()
    labels = {r["vid"]: r["label"] for r in rows}
    assert sorted(labels) == list(range(34))
    comms = _communities(rows)
    G = nx.karate_club_graph()
    _assert_all_connected(G, comms)
    q_nx = nx.community.modularity(G, list(comms.values()), weight=None)
    assert q_nx >= 0.40
    # reported Q == networkx's Q of the same partition == K9 modularity()
    assert abs(stats["q"] - q_nx) < 1e-9
    assert abs(modularity(df, leiden(df)) - q_nx) < 1e-9
    # refinement must not cost modularity vs Louvain on the same graph
    q_louvain = nx.community.modularity(
        G, list(_communities(louvain(df).collect()).values()), weight=None
    )
    assert q_nx >= q_louvain - 1e-9
    # deterministic across runs and partition counts
    again = {r["vid"]: r["label"] for r in leiden(df, num_parts=1).collect()}
    assert again == labels


@pytest.mark.parametrize("seed", [7, 23])
def test_leiden_connectivity_guarantee_random(spark, seed):
    # moderately sparse GNP graphs are where Louvain's disconnected
    # communities actually show up in practice [Traag et al. 2019 §2]
    G = nx.gnp_random_graph(60, 0.08, seed=seed)
    G.remove_nodes_from(list(nx.isolates(G)))
    edges = sorted((min(u, v), max(u, v)) for u, v in G.edges())
    rows = leiden(edges_df(spark, edges)).collect()
    comms = _communities(rows)
    assert set().union(*comms.values()) == set(G.nodes())
    _assert_all_connected(G, comms)


def test_leiden_connectivity_guarantee_bridge(spark):
    # two cliques joined ONLY through a middle vertex that both also pull on:
    # if the middle vertex moves to one side, the other side must not keep a
    # label that spans the (now cut) bridge — the canonical Louvain hazard
    edges = []
    for base in (0, 10):
        edges += [
            (base + i, base + j) for i in range(5) for j in range(i + 1, 5)
        ]
    hub = 20
    edges += [(i, hub) for i in (0, 1, 10, 11)]
    rows = leiden(edges_df(spark, edges)).collect()
    comms = _communities(rows)
    G = nx.Graph(edges)
    _assert_all_connected(G, comms)


def test_leiden_weighted_hits_bruteforce_optimum(spark):
    from tests.test_louvain import _brute_force_best_q

    wedges = [(0, 1, 10.0), (1, 2, 1.0), (2, 3, 10.0)]
    df = spark.createDataFrame(wedges, "src long, dst long, weight double")
    stats: dict = {}
    rows = leiden(df, weight_col="weight", stats_out=stats).collect()
    assert _communities(rows) == {0: {0, 1}, 2: {2, 3}}
    G = nx.Graph()
    for u, v, w in wedges:
        G.add_edge(u, v, weight=w)
    assert abs(stats["q"] - _brute_force_best_q(G)) < 1e-9


def test_leiden_coarsens_on_refined_partition(spark):
    # 8 cliques of 4 in a ring: level 0 must find the cliques, refinement
    # keeps them (each clique is internally connected), and the coarse level
    # runs on the 8-supervertex ring seeded with the macro partition
    G = nx.ring_of_cliques(8, 4)
    edges = sorted((min(u, v), max(u, v)) for u, v in G.edges())
    stats: dict = {}
    rows = leiden(edges_df(spark, edges), stats_out=stats).collect()
    assert len(stats["levels"]) >= 2
    l0 = stats["levels"][0]
    # refinement can only split macro communities, never merge across them
    assert l0["sub_communities"] >= l0["communities"]
    assert stats["levels"][1]["vertices"] == l0["sub_communities"]
    comm = _communities(rows)
    for c in comm.values():
        for base in range(0, 32, 4):
            clique = set(range(base, base + 4))
            assert clique <= c or not (clique & c)
    _assert_all_connected(G, comm)


def test_leiden_handles_negative_vids(spark, graphs):
    # prod vids are signed xxhash64(repo, path) (K8 default), so labels are
    # routinely negative — the K5 encoded-argmax bug class (round-1 ADVICE).
    # The hash-keyed class schedule changes under relabeling, so the exact
    # partition may legitimately differ; what must hold: every vertex
    # labeled, labels are member vids, communities connected, quality keeps
    # the karate bar.
    g = graphs["karate"]
    edges = [((u - 17) * 3, (v - 17) * 3) for u, v in g["edges"]]
    rows = leiden(edges_df(spark, edges)).collect()
    comms = _communities(rows)
    verts = {(i - 17) * 3 for i in range(34)}
    assert set().union(*comms.values()) == verts
    assert all(lab in members for lab, members in comms.items())
    G = nx.Graph(edges)
    _assert_all_connected(G, comms)
    q = nx.community.modularity(G, list(comms.values()), weight=None)
    assert q >= 0.40


def test_leiden_driver_and_distributed_paths_agree(spark, graphs):
    """The small-graph collapse must be RESULT-IDENTICAL to the distributed
    path (same Spark-extracted gates, integer-exact arithmetic, tie-breaks)
    — including the refinement phase and the aggregate-level P_init."""
    for edges in [
        graphs["karate"]["edges"],
        [((u - 17) * 3, (v - 17) * 3) for u, v in graphs["karate"]["edges"]],
    ]:
        df = edges_df(spark, edges)
        fast = {(r["vid"], r["label"]) for r in leiden(df).collect()}
        dist = {
            (r["vid"], r["label"])
            for r in leiden(df, small_graph_cutoff=0).collect()
        }
        assert fast == dist


def test_leiden_dual_path_weighted_integer(spark):
    wedges = [(0, 1, 10.0), (1, 2, 1.0), (2, 3, 10.0)]
    df = spark.createDataFrame(wedges, "src long, dst long, weight double")
    a = {(r["vid"], r["label"]) for r in leiden(df, weight_col="weight").collect()}
    b = {
        (r["vid"], r["label"])
        for r in leiden(df, weight_col="weight", small_graph_cutoff=0).collect()
    }
    assert a == b
