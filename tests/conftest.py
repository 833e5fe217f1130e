from __future__ import annotations

import os
import sys

import networkx as nx
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pcd_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # small parallelism for test latency; engine behavior is
    # partition-count-invariant (asserted in test_properties.py)
    s = get_spark("pcd-tests", cores=4, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


# ---- deterministic graph fixtures (FIXTURES.md §3) -------------------------


def _edges_of(g: nx.Graph) -> list[tuple[int, int]]:
    return sorted((min(u, v), max(u, v)) for u, v in g.edges())


@pytest.fixture(scope="session")
def graphs() -> dict[str, dict]:
    """name -> {edges: [(u,v)...], n: int, directed: bool}"""
    out: dict[str, dict] = {}

    karate = nx.karate_club_graph()
    out["karate"] = {"edges": _edges_of(karate), "n": 34, "directed": False}

    # two K10 cliques + one bridge (0..9, 10..19; bridge 9-10)
    tc = nx.disjoint_union(nx.complete_graph(10), nx.complete_graph(10))
    tc.add_edge(9, 10)
    out["two_cliques"] = {"edges": _edges_of(tc), "n": 20, "directed": False}
    tcs = nx.disjoint_union(nx.complete_graph(10), nx.complete_graph(10))
    out["two_cliques_split"] = {"edges": _edges_of(tcs), "n": 20, "directed": False}

    out["path_100"] = {
        "edges": [(i, i + 1) for i in range(99)], "n": 100, "directed": False,
    }
    out["cycle_9"] = {
        "edges": [(i, (i + 1) % 9) for i in range(9)], "n": 9, "directed": False,
    }
    out["star_1001"] = {
        "edges": [(0, i) for i in range(1, 1001)], "n": 1001, "directed": False,
    }

    ba = nx.barabasi_albert_graph(1000, 3, seed=42)
    out["ba_1000"] = {"edges": _edges_of(ba), "n": 1000, "directed": False}

    er = nx.erdos_renyi_graph(200, 0.05, seed=42)
    out["er_200"] = {"edges": _edges_of(er), "n": 200, "directed": False}

    # 12-vertex directed toy: 2 dangling vertices (10, 11), one 2-cycle (0,1)
    d = [
        (0, 1), (1, 0), (1, 2), (2, 3), (3, 0), (3, 4), (4, 5), (5, 6),
        (6, 4), (2, 7), (7, 8), (8, 9), (9, 7), (0, 10), (5, 11),
    ]
    out["directed_toy"] = {"edges": d, "n": 12, "directed": True}
    return out


@pytest.fixture(scope="session")
def snap_dir(graphs, tmp_path_factory) -> str:
    """Write each fixture graph as a SNAP-format edge-list text file (A3)."""
    root = tmp_path_factory.mktemp("snap")
    for name, g in graphs.items():
        with open(root / f"{name}.txt", "w") as f:
            f.write(f"# {name}: {g['n']} vertices, {len(g['edges'])} edges\n")
            for u, v in g["edges"]:
                f.write(f"{u}\t{v}\n")
    return str(root)


def edges_df(spark, edge_list):
    return spark.createDataFrame(
        [(int(u), int(v)) for u, v in edge_list], "src long, dst long"
    )
