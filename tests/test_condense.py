"""K33 condensation + topological levels vs networkx (SURVEY.md §2 K33).

Oracle: nx.condensation (SCC contraction) + longest-path DP over the
condensation's topological order. The engine labels a component by the min
vid of its SCC (K20 convention), so the nx oracle maps each condensation
node to min(members) before comparing.
"""

from __future__ import annotations

import networkx as nx
import pytest

from pcd_spark.graph import condensation, topological_levels
from tests.conftest import edges_df


def _nx_oracle(edges):
    dg = nx.DiGraph()
    dg.add_edges_from(edges)
    cond = nx.condensation(dg)
    lvl = {n: 0 for n in cond}
    for n in nx.topological_sort(cond):
        for m in cond.successors(n):
            lvl[m] = max(lvl[m], lvl[n] + 1)
    out = {}
    for n, data in cond.nodes(data=True):
        comp = min(data["members"])
        for v in data["members"]:
            out[v] = (comp, lvl[n])
    cedges = {
        (min(cond.nodes[a]["members"]), min(cond.nodes[b]["members"]))
        for a, b in cond.edges()
    }
    return out, cedges


CASES = {
    # chained 2-cycles with bridges: 3 SCCs in a path, levels 0/1/2
    "chained_cycles": [
        (0, 1), (1, 0), (1, 2), (2, 3), (3, 2), (3, 4), (4, 5), (5, 4),
    ],
    # one big cycle: single SCC, level 0, empty condensation
    "one_cycle": [(i, (i + 1) % 7) for i in range(7)],
    # pure DAG (no nontrivial SCC): levels = longest-path depth
    "dag": [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (0, 4), (5, 4)],
    # random directed graph: mixed SCC sizes
    "gnp": sorted(
        nx.gnp_random_graph(30, 0.08, seed=7, directed=True).edges()
    ),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_topological_levels_match_networkx(spark, name):
    edges = CASES[name]
    df = edges_df(spark, edges)
    got = {
        r["vid"]: (r["component"], r["level"])
        for r in topological_levels(df).collect()
    }
    want, _ = _nx_oracle(edges)
    assert got == want


def test_condensation_edges_match_networkx(spark):
    edges = CASES["gnp"]
    df = edges_df(spark, edges)
    got = {
        (r["csrc"], r["cdst"]) for r in condensation(df).collect()
    }
    _, want = _nx_oracle(edges)
    assert got == want


def test_every_vertex_appears_once(spark):
    edges = CASES["chained_cycles"]
    rows = topological_levels(edges_df(spark, edges)).collect()
    vids = [r["vid"] for r in rows]
    assert sorted(vids) == sorted({u for e in edges for u in e})
    assert len(vids) == len(set(vids))


def test_cycle_in_supplied_components_raises(spark):
    # a WRONG component assignment (identity on a directed cycle) makes the
    # "condensation" cyclic; the level fixpoint must refuse, not loop to a
    # silently wrong layering
    edges = CASES["one_cycle"]
    df = edges_df(spark, edges)
    ident = df.sparkSession.createDataFrame(
        [(v, v) for v in range(7)], "vid long, component long"
    )
    with pytest.raises(RuntimeError, match="no fixpoint"):
        topological_levels(df, components=ident, max_iter=5)
