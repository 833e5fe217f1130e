"""K13 Louvain golden tests (SURVEY.md §2 K13).

Louvain has no deterministic public oracle (networkx's implementation is
seeded-random and order-dependent), so exactness is pinned structurally:
  - graphs with unambiguous community structure (cliques) must be recovered
    EXACTLY;
  - on a 4-vertex weighted graph the result must achieve the BRUTE-FORCE
    maximum modularity over all 15 partitions;
  - the modularity the engine reports must equal networkx's modularity of
    the returned partition (and quality.modularity, K9) to 1e-9 — the
    coarsening bookkeeping invariant;
  - karate-club partition quality >= 0.40 (published Louvain result is
    ~0.4188; the theoretical optimum is 0.4198);
  - determinism: identical labels across runs and partition counts.
"""

from __future__ import annotations

from itertools import combinations

import networkx as nx
import pytest

from pcd_spark.graph import louvain
from pcd_spark.graph.quality import modularity
from tests.conftest import edges_df


def _communities(rows) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r["label"], set()).add(r["vid"])
    return out


def test_louvain_two_cliques_exact(spark, graphs):
    g = graphs["two_cliques"]
    rows = louvain(edges_df(spark, g["edges"])).collect()
    comm = _communities(rows)
    assert comm == {0: set(range(10)), 10: set(range(10, 20))}


def test_louvain_ring_of_cliques_exact(spark):
    # classic Louvain sanity graph: 4 cliques of 5 joined in a ring must
    # resolve to one community per clique
    G = nx.ring_of_cliques(4, 5)
    edges = sorted((min(u, v), max(u, v)) for u, v in G.edges())
    rows = louvain(edges_df(spark, edges)).collect()
    comm = _communities(rows)
    want = {min(c): set(c) for c in (range(i * 5, i * 5 + 5) for i in range(4))}
    assert comm == want


def test_louvain_karate_quality_reporting_determinism(spark, graphs):
    g = graphs["karate"]
    df = edges_df(spark, g["edges"])
    stats: dict = {}
    rows = louvain(df, stats_out=stats).collect()
    labels = {r["vid"]: r["label"] for r in rows}
    # valid partition over every non-isolated vertex (karate has none isolated)
    assert sorted(labels) == list(range(34))
    parts = list(_communities(rows).values())
    G = nx.karate_club_graph()
    # weight=None: karate_club_graph carries interaction-count edge weights,
    # but the engine ran the UNWEIGHTED graph — default weight="weight"
    # would silently score a different objective
    q_nx = nx.community.modularity(G, parts, weight=None)
    # published Louvain karate result is ~0.4188 (optimum 0.4198)
    assert q_nx >= 0.40
    # reported Q == networkx's Q of the same partition == K9 modularity()
    assert abs(stats["q"] - q_nx) < 1e-9
    assert abs(modularity(df, louvain(df)) - q_nx) < 1e-9
    # deterministic across runs and partition counts
    again = {r["vid"]: r["label"] for r in louvain(df, num_parts=1).collect()}
    assert again == labels


def _brute_force_best_q(G: nx.Graph) -> float:
    verts = list(G.nodes())

    def partitions(items):
        if not items:
            yield []
            return
        first, rest = items[0], items[1:]
        for smaller in partitions(rest):
            for i, block in enumerate(smaller):
                yield smaller[:i] + [block + [first]] + smaller[i + 1:]
            yield smaller + [[first]]

    return max(
        nx.community.modularity(G, [set(b) for b in p], weight="weight")
        for p in partitions(verts)
    )


def test_louvain_weighted_hits_bruteforce_optimum(spark):
    # path 0-1-2-3: heavy ends, weak middle -> optimum is {0,1},{2,3};
    # unweighted the optimum is different, so this pins weight handling
    wedges = [(0, 1, 10.0), (1, 2, 1.0), (2, 3, 10.0)]
    df = spark.createDataFrame(wedges, "src long, dst long, weight double")
    stats: dict = {}
    rows = louvain(df, weight_col="weight", stats_out=stats).collect()
    assert _communities(rows) == {0: {0, 1}, 2: {2, 3}}
    G = nx.Graph()
    for u, v, w in wedges:
        G.add_edge(u, v, weight=w)
    assert abs(stats["q"] - _brute_force_best_q(G)) < 1e-9


def test_louvain_coarsens_hierarchically(spark):
    # 8 cliques of 4 in a ring: level 0 finds the cliques, the coarse level
    # must then run on the 8-supervertex ring — stats must show >1 level and
    # geometric shrink
    G = nx.ring_of_cliques(8, 4)
    edges = sorted((min(u, v), max(u, v)) for u, v in G.edges())
    stats: dict = {}
    rows = louvain(edges_df(spark, edges), stats_out=stats).collect()
    assert len(stats["levels"]) >= 2
    l0, l1 = stats["levels"][0], stats["levels"][1]
    assert l1["vertices"] == l0["communities"] < l0["vertices"]
    # every community is a union of whole cliques (no clique is split)
    comm = _communities(rows)
    for c in comm.values():
        for base in range(0, 32, 4):
            clique = set(range(base, base + 4))
            assert clique <= c or not (clique & c)


def test_louvain_handles_negative_vids(spark, graphs):
    # prod vids are signed xxhash64(repo, path) (K8 default) — same
    # regression class as K5's encoded argmax (round-1 ADVICE). The
    # hash-keyed move schedule changes under relabeling, so assert partition
    # validity + canonical min-member labels + karate quality, not equality.
    g = graphs["karate"]
    edges = [((u - 17) * 3, (v - 17) * 3) for u, v in g["edges"]]
    rows = louvain(edges_df(spark, edges)).collect()
    comm = _communities(rows)
    verts = {(i - 17) * 3 for i in range(34)}
    assert set().union(*comm.values()) == verts
    assert all(lab == min(members) for lab, members in comm.items())
    G = nx.Graph(edges)
    q = nx.community.modularity(G, list(comm.values()), weight=None)
    assert q >= 0.40


@pytest.mark.parametrize(
    "name", ["karate", "two_cliques"], ids=["karate", "two_cliques"]
)
def test_louvain_driver_and_distributed_paths_agree(spark, graphs, name):
    """The small-graph collapse must be RESULT-IDENTICAL to the distributed
    path: same class schedule (gates extracted from Spark's xxhash64), same
    integer-exact arithmetic, same tie-breaks. Also pinned on a weighted
    integer graph and signed vids below."""
    g = graphs[name]
    df = edges_df(spark, g["edges"])
    fast = {(r["vid"], r["label"]) for r in louvain(df).collect()}
    dist = {
        (r["vid"], r["label"])
        for r in louvain(df, small_graph_cutoff=0).collect()
    }
    assert fast == dist


def test_louvain_dual_path_weighted_and_signed(spark):
    wedges = [(0, 1, 10.0), (1, 2, 1.0), (2, 3, 10.0)]
    df = spark.createDataFrame(wedges, "src long, dst long, weight double")
    a = {(r["vid"], r["label"]) for r in louvain(df, weight_col="weight").collect()}
    b = {
        (r["vid"], r["label"])
        for r in louvain(df, weight_col="weight", small_graph_cutoff=0).collect()
    }
    assert a == b
    sedges = [((u - 2) * 5, (v - 2) * 5) for u, v in [(0, 1), (1, 2), (2, 3), (3, 4)]]
    sdf = spark.createDataFrame(sedges, "src long, dst long")
    a = {(r["vid"], r["label"]) for r in louvain(sdf).collect()}
    b = {(r["vid"], r["label"]) for r in louvain(sdf, small_graph_cutoff=0).collect()}
    assert a == b


def test_louvain_noninteger_weights_stay_distributed(spark):
    # non-integer weights void the collapse's exactness argument — the
    # driver path must refuse and the distributed path must run (observable
    # only via correctness here; the gate itself is _integer_weighted)
    from pcd_spark.graph.louvain import _integer_weighted, _sym_adj

    wedges = [(0, 1, 0.5), (1, 2, 0.25), (2, 3, 0.5)]
    df = spark.createDataFrame(wedges, "src long, dst long, weight double")
    assert not _integer_weighted(_sym_adj(df, "weight"))
    rows = louvain(df, weight_col="weight").collect()
    comm = _communities(rows)
    assert comm == {0: {0, 1}, 2: {2, 3}}
