"""K54 temporal reachability + K55 closeness / landmark distances.

Oracles: networkx shortest-path/closeness for the static side; a pure-Python
earliest-arrival BFS mirror (same dominance rule, independently coded) for
the temporal side; plus hand-computed cases and structural properties.
"""

from __future__ import annotations

import random

import networkx as nx
import pytest

from pcd_spark.graph import (
    closeness_centrality,
    landmark_distances,
    temporal_reachability,
)


def edges_df(spark, edges):
    return spark.createDataFrame(
        [(int(u), int(v)) for u, v in edges], "src long, dst long"
    )


# ------------------------------------------------------------------ static


@pytest.mark.parametrize(
    "name,lms",
    [("karate", [0, 33, 5]), ("er_200", [0, 7, 19]), ("two_cliques_split", [0, 10])],
)
def test_landmark_distances_match_networkx(spark, graphs, name, lms):
    g = graphs[name]
    G = nx.Graph(g["edges"])
    got = {
        (r.lm, r.vid): r.dist
        for r in landmark_distances(edges_df(spark, g["edges"]), lms).collect()
    }
    exp = {
        (lm, v): float(d)
        for lm in lms
        for v, d in nx.single_source_shortest_path_length(G, lm).items()
    }
    assert got == exp


def test_landmark_distances_weighted_matches_dijkstra(spark, graphs):
    g = graphs["karate"]
    rng = random.Random(7)
    wedges = [(u, v, 1.0 + rng.randrange(5)) for u, v in g["edges"]]
    df = spark.createDataFrame(wedges, "src long, dst long, w double")
    G = nx.Graph()
    for u, v, w in wedges:
        G.add_edge(u, v, weight=w)
    got = {
        (r.lm, r.vid): r.dist
        for r in landmark_distances(df, [0, 33], weight_col="w").collect()
    }
    for lm in (0, 33):
        exp = nx.single_source_dijkstra_path_length(G, lm)
        for v, d in exp.items():
            assert got[(lm, v)] == pytest.approx(float(d), abs=1e-9)


@pytest.mark.parametrize(
    "name", ["karate", "er_200", "two_cliques_split", "path_100"]
)
def test_closeness_matches_networkx_wf(spark, graphs, name):
    g = graphs[name]
    G = nx.Graph(g["edges"])
    lms = sorted(G.nodes())[:4]
    got = {
        r.vid: r.closeness
        for r in closeness_centrality(edges_df(spark, g["edges"]), lms).collect()
    }
    exp = nx.closeness_centrality(G)  # wf_improved=True is the nx default
    assert set(got) == set(lms)
    for v in lms:
        assert got[v] == pytest.approx(exp[v], abs=5e-7)


# ---------------------------------------------------------------- temporal


def _earliest_arrival_mirror(inter, sources, max_hops, directed=False):
    """Independent pure-Python earliest-arrival BFS (hop-bounded)."""
    adj: dict[int, list[tuple[int, int]]] = {}
    for u, v, t in inter:
        adj.setdefault(u, []).append((v, t))
        if not directed:
            adj.setdefault(v, []).append((u, t))
    out = {}
    for root in sources:
        arr = {root: -1}
        for _ in range(max_hops):
            nxt = dict(arr)
            for v, a in arr.items():
                for w, t in adj.get(v, []):
                    if t >= a and (w not in nxt or t < nxt[w]):
                        nxt[w] = t
            if nxt == arr:
                break
            arr = nxt
        for v, a in arr.items():
            out[(root, v)] = a
    return out


def _inter_df(spark, rows):
    return spark.createDataFrame(
        [(int(u), int(v), int(t)) for u, v, t in rows], "src long, dst long, t long"
    )


def test_temporal_hand_case_blocked_by_time(spark):
    # 1-2@10, 2-3@{5,20}, 3-4@15: 3 is reached at 20, so 3-4@15 is unusable
    inter = [(1, 2, 10), (2, 3, 5), (2, 3, 20), (3, 4, 15)]
    got = {
        (r.root, r.vid): r.arrival
        for r in temporal_reachability(_inter_df(spark, inter), [1], max_hops=3).collect()
    }
    assert got == {(1, 1): -1, (1, 2): 10, (1, 3): 20}


def test_temporal_later_copy_can_matter(spark):
    # reaching 2 at t=12 makes the t=5 copy of 2-3 unusable but t=20 usable;
    # a dedup that kept only MIN(t) per edge would wrongly lose vertex 3
    inter = [(1, 2, 12), (2, 3, 5), (2, 3, 20)]
    got = {
        (r.root, r.vid): r.arrival
        for r in temporal_reachability(_inter_df(spark, inter), [1], max_hops=2).collect()
    }
    assert got[(1, 3)] == 20


def test_temporal_equal_times_equals_hop_bounded_bfs(spark, graphs):
    # all interactions at one time: time-respecting == plain BFS within H hops
    g = graphs["karate"]
    inter = [(u, v, 100) for u, v in g["edges"]]
    H = 2
    got = {
        r.vid
        for r in temporal_reachability(_inter_df(spark, inter), [0], max_hops=H).collect()
    }
    G = nx.Graph(g["edges"])
    exp = {v for v, d in nx.single_source_shortest_path_length(G, 0).items() if d <= H}
    assert got == exp


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_temporal_matches_pure_python_mirror(spark, seed):
    rng = random.Random(seed)
    n = 25
    inter = [
        (rng.randrange(n), rng.randrange(n), rng.randrange(50))
        for _ in range(80)
    ]
    inter = [(u, v, t) for u, v, t in inter if u != v]
    sources = [0, 1]
    got = {
        (r.root, r.vid): r.arrival
        for r in temporal_reachability(
            _inter_df(spark, inter), sources, max_hops=4
        ).collect()
    }
    assert got == _earliest_arrival_mirror(inter, sources, max_hops=4)


def test_temporal_directed_respects_direction(spark):
    inter = [(1, 2, 5), (3, 2, 7)]  # directed: 2 cannot reach 3
    got = {
        (r.root, r.vid)
        for r in temporal_reachability(
            _inter_df(spark, inter), [1], max_hops=3, directed=True
        ).collect()
    }
    assert got == {(1, 1), (1, 2)}


def test_temporal_rejects_bad_args(spark):
    df = _inter_df(spark, [(1, 2, 3)])
    with pytest.raises(ValueError):
        temporal_reachability(df, [], max_hops=2)
    with pytest.raises(ValueError):
        temporal_reachability(df, [1], max_hops=0)


# ------------------------------------------------------------------ k56


def test_k56_double_sweep_matches_networkx_mirror(spark, sf_dir):
    """The registry row must equal an nx mirror of the exact algorithm
    (BFS from min vertex, farthest tie->min vid, BFS again), and satisfy
    the double-sweep law ecc(far1) >= ecc(root)."""
    import duckdb

    from pcd_spark.relational import REGISTRY

    con = duckdb.connect()
    edges = con.sql(
        f"""SELECT DISTINCT o_custkey AS src, 100000 + l_suppkey AS dst
            FROM read_parquet('{sf_dir}/lineitem.parquet') l
            JOIN read_parquet('{sf_dir}/orders.parquet') o
              ON l.l_orderkey = o.o_orderkey
            WHERE o_custkey < 500"""
    ).fetchall()
    G = nx.Graph(edges)
    root = min(u for u, _ in edges)

    def far(start):
        d = nx.single_source_shortest_path_length(G, start)
        return min((v for v in d), key=lambda v: (-d[v], v)), max(d.values())

    f1, ecc1 = far(root)
    f2, diam_lb = far(f1)
    row = REGISTRY["k56_double_sweep"]["spark"](spark, sf_dir).collect()[0]
    assert (row["root"], row["sweep1_far"], row["ecc1"],
            row["sweep2_far"], row["diam_lb"]) == (root, f1, ecc1, f2, diam_lb)
    assert row["diam_lb"] >= row["ecc1"]


# ------------------------------------------------------------------ k57


def test_k57_landmark_estimate_matches_mirror_and_bounds(spark, sf_dir):
    """The registry row set must equal the nx mirror (min over landmarks of
    d(u,lm)+d(lm,v) on the same bounded graph, same probe cohort), and
    every estimate must be a valid upper bound on the true distance."""
    import duckdb

    from pcd_spark.relational import REGISTRY

    con = duckdb.connect()
    edges = con.sql(
        f"""SELECT DISTINCT o_custkey AS src, 100000 + l_suppkey AS dst
            FROM read_parquet('{sf_dir}/lineitem.parquet') l
            JOIN read_parquet('{sf_dir}/orders.parquet') o
              ON l.l_orderkey = o.o_orderkey
            WHERE o_custkey < 500"""
    ).fetchall()
    G = nx.Graph(edges)
    lms = sorted({u for u, _ in edges})[:4]
    d = {lm: nx.single_source_shortest_path_length(G, lm) for lm in lms}
    reached = sorted({v for lm in lms for v in d[lm] if v < 30})
    exp = {}
    for i, u in enumerate(reached):
        for v in reached[i + 1 :]:
            ests = [d[lm][u] + d[lm][v] for lm in lms if u in d[lm] and v in d[lm]]
            if ests:
                exp[(u, v)] = min(ests)
    got = {
        (r["u"], r["v"]): r["est_dist"]
        for r in REGISTRY["k57_landmark_estimate"]["spark"](spark, sf_dir).collect()
    }
    assert got == exp
    for (u, v), est in got.items():
        assert est >= nx.shortest_path_length(G, u, v)


# ------------------------------------------------- partition invariance


def test_landmark_and_temporal_partition_invariant(spark, graphs):
    """House rule: results never depend on the partition count (the one
    knob a cluster retune is guaranteed to turn)."""
    g = graphs["er_200"]
    df = edges_df(spark, g["edges"])
    a = {(r.lm, r.vid): r.dist
         for r in landmark_distances(df, [0, 7], num_parts=2).collect()}
    b = {(r.lm, r.vid): r.dist
         for r in landmark_distances(df, [0, 7], num_parts=7).collect()}
    assert a == b

    inter = [(u, v, (u * 7 + v) % 13) for u, v in g["edges"]]
    idf = spark.createDataFrame(inter, "src long, dst long, t long")
    ta = {(r.root, r.vid): r.arrival
          for r in temporal_reachability(idf, [0], max_hops=3, num_parts=2).collect()}
    tb = {(r.root, r.vid): r.arrival
          for r in temporal_reachability(idf, [0], max_hops=3, num_parts=7).collect()}
    assert ta == tb


def test_negative_weights_raise(spark):
    df = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, -0.5)], "src long, dst long, w double"
    )
    from pcd_spark.graph import shortest_paths

    with pytest.raises(ValueError, match="non-negative"):
        shortest_paths(df, [0], weight_col="w")
    with pytest.raises(ValueError, match="non-negative"):
        landmark_distances(df, [0], weight_col="w")


def test_temporal_negative_times_raise(spark):
    """ADVICE r3: roots seed at arrival = -1, so a pre-1970 (negative)
    epoch would silently fail the first-hop `t >= arrival` filter —
    the engine must refuse instead of dropping usable edges."""
    df = _inter_df(spark, [(0, 1, 5), (1, 2, -3)])
    with pytest.raises(ValueError, match="non-negative interaction"):
        temporal_reachability(df, [0], max_hops=2)


def test_landmark_cohort_change_trips_checkpoint_guard(spark, graphs, tmp_path):
    """ADVICE r3: the checkpoint graph_token folds in a digest of the
    landmark/source cohort — resuming the same store (fixed run_id, the
    CLI pattern) with a DIFFERENT cohort on the same graph must raise,
    not silently resume the old cohort's state."""
    from pcd_spark.graph import shortest_paths
    from pcd_spark.storage import CheckpointStore

    g = graphs["er_200"]
    df = edges_df(spark, g["edges"])

    store = CheckpointStore(str(tmp_path / "lm"), "landmarks", run_id="submit")
    landmark_distances(df, [0, 7], store=store, checkpoint_every=1)
    with pytest.raises(ValueError, match="graph"):
        landmark_distances(df, [0, 8], store=store, checkpoint_every=1)
    # identical cohort resumes fine (token matches)
    landmark_distances(df, [0, 7], store=store, checkpoint_every=1)

    store2 = CheckpointStore(str(tmp_path / "sp"), "sssp", run_id="submit")
    shortest_paths(df, [0], store=store2, checkpoint_every=1)
    with pytest.raises(ValueError, match="graph"):
        shortest_paths(df, [3], store=store2, checkpoint_every=1)
