"""Round-5 guard tests (VERDICT r4 task #6 + ADVICE r4 sweep).

Each test pins a contract that previously failed silently: k59's positive-
weight precondition, k60's <3-distinct-events drop rule, v18/ivfpq's
nprobe-vs-#cells bound, the k61 cached-plan leak fix, and the legacy
(pre-cohort-digest) checkpoint graph_token acceptance path.
"""
from __future__ import annotations

import pytest


def edges_df(spark, edge_list):
    return spark.createDataFrame(
        [(int(u), int(v)) for u, v in edge_list], "src long, dst long"
    )


# ---------------------------------------------------------------- k59


class TestDisparityBackboneGuards:
    def test_rejects_nonpositive_weights(self, spark):
        from pcd_spark.relational.graph_queries import disparity_backbone

        bad = spark.createDataFrame(
            [(1, 2, 3.0), (1, 3, 0.0)], "src long, dst long, w double"
        )
        with pytest.raises(ValueError, match="positive edge weights"):
            disparity_backbone(bad)

        neg = spark.createDataFrame(
            [(1, 2, -1.0)], "src long, dst long, w double"
        )
        with pytest.raises(ValueError, match="positive edge weights"):
            disparity_backbone(neg)

    def test_star_hub_backbone_matches_null_model(self, spark):
        # a hub with one dominant edge: alpha = (1 - w/s)^(k-1) from the
        # hub side; leaves have k=1 -> alpha 1.0 (never significant), so
        # significance must come from the hub endpoint alone
        from pcd_spark.relational.graph_queries import disparity_backbone

        rows = [(0, i, 1.0) for i in range(1, 8)] + [(0, 8, 100.0)]
        pairs = spark.createDataFrame(rows, "src long, dst long, w double")
        got = {
            (r["src"], r["dst"]): (r["alpha_src"], r["alpha_dst"])
            for r in disparity_backbone(pairs).collect()
        }
        s, k = 107.0, 8
        alpha_dominant = round((1 - 100.0 / s) ** (k - 1), 6)
        assert (0, 8) in got
        assert got[(0, 8)][0] == pytest.approx(alpha_dominant, abs=1e-9)
        # the seven weight-1 edges: hub-side alpha (1 - 1/107)^7 ~ 0.936,
        # leaf-side 1.0 -> not significant, excluded
        assert len(got) == 1


# ---------------------------------------------------------------- k60


class TestEdgeBurstinessContract:
    def test_drops_pairs_with_fewer_than_three_distinct_events(self, spark):
        # documented contract: <3 distinct event times -> no row (a single
        # gap has sigma_pop == 0 and would claim B = -1 from one sample)
        from pcd_spark.relational.graph_queries import edge_burstiness

        rows = (
            [(1, 2, 10), (1, 2, 20)]  # 2 events -> dropped
            + [(3, 4, 10), (3, 4, 20), (3, 4, 30)]  # periodic -> B = -1
            + [(5, 6, t) for t in [0, 1, 2, 3, 1000]]  # bursty -> B > 0
            + [(7, 8, 42)]  # 1 event -> dropped
        )
        inter = spark.createDataFrame(rows, "src long, dst long, t long")
        got = {
            (r["src"], r["dst"]): r for r in edge_burstiness(inter).collect()
        }
        assert (1, 2) not in got
        assert (7, 8) not in got
        assert got[(3, 4)]["burstiness"] == pytest.approx(-1.0)
        assert got[(3, 4)]["n_events"] == 3
        assert got[(5, 6)]["burstiness"] > 0.0
        assert got[(5, 6)]["n_events"] == 5


# ---------------------------------------------------------------- v18 / v7


class TestNprobeBounds:
    def test_v18_rejects_nprobe_above_cell_count(self, spark, sf_dir):
        from pcd_spark.relational.textops import _IVF_CELLS, v18

        with pytest.raises(ValueError, match="nprobes must be within"):
            v18(spark, sf_dir, nprobes=(1, _IVF_CELLS + 1))
        with pytest.raises(ValueError, match="nprobes must be within"):
            v18(spark, sf_dir, nprobes=(0, 2))
        with pytest.raises(ValueError, match="nprobes must be within"):
            v18(spark, sf_dir, nprobes=())

    def test_ivfpq_rejects_nprobe_above_ncells(self, spark):
        from pcd_spark.vector.pq import ivfpq_topk

        df = spark.createDataFrame(
            [(i, [float(i), float(i + 1)]) for i in range(8)],
            "vec_id long, emb array<double>",
        )
        # raises at entry, before any kmeans/codebook job runs
        with pytest.raises(ValueError, match="nprobe must be within"):
            ivfpq_topk(df, [(0, [0.0, 1.0])], ncells=4, nprobe=5)
        with pytest.raises(ValueError, match="nprobe must be within"):
            ivfpq_topk(df, [(0, [0.0, 1.0])], ncells=4, nprobe=0)


# ---------------------------------------------------------------- k61


class TestK61CacheLeak:
    def test_no_cached_plan_survives_the_query(self, spark, sf_dir):
        """The r4 verdict found k61 persist()ing its weighted edge table
        into the session CacheManager with no unpersist — blocks leaked
        for the session lifetime (preflight runs 182 queries in ONE
        session). The fix swaps persist for an eager localCheckpoint
        (ContextCleaner-owned). Contract: after the query completes, the
        CacheManager holds nothing new."""
        from pcd_spark.relational import REGISTRY

        spark.catalog.clearCache()
        cm = spark._jsparkSession.sharedState().cacheManager()
        assert cm.isEmpty()
        REGISTRY["k61_weighted_clustering"]["spark"](spark, sf_dir).collect()
        assert cm.isEmpty(), "k61 left a DataFrame in the CacheManager"


# ---------------------------------------------------------------- tokens


class TestLegacyGraphTokenMigration:
    def test_pre_cohort_digest_store_resumes(self, spark, graphs, tmp_path):
        """ADVICE r4: folding the source-cohort digest into graph_token
        must NOT brick every store written before the change. A stored
        token that equals the new token's leading edges=N segment (i.e.
        lacks the srcs=/lms= suffix) is a legacy store on the SAME graph
        and resumes; a full-format token with a different digest still
        raises (pinned in test_temporal_closeness)."""
        import glob
        import json
        import os

        from pcd_spark.graph import shortest_paths
        from pcd_spark.storage import CheckpointStore

        g = graphs["er_200"]
        df = edges_df(spark, g["edges"])
        base = str(tmp_path / "legacy")

        s1 = CheckpointStore(base, "sssp", run_id="old")
        want = {
            r["vid"]: r["dist"]
            for r in shortest_paths(
                df, [0], store=s1, checkpoint_every=1
            ).collect()
        }
        # rewrite every manifest's token to the pre-digest format
        for path in glob.glob(os.path.join(s1.dir, "manifest-*.json")):
            with open(path) as f:
                m = json.load(f)
            assert ";srcs=" in m["graph_token"]
            m["graph_token"] = m["graph_token"].split(";", 1)[0]
            with open(path, "w") as f:
                json.dump(m, f, sort_keys=True)

        s2 = CheckpointStore(base, "sssp", run_id="old")
        got = {
            r["vid"]: r["dist"]
            for r in shortest_paths(
                df, [0], store=s2, checkpoint_every=1
            ).collect()
        }
        assert got == want


# ---------------------------------------------------------------- louvain np


class TestLocalMoveVectorized:
    def test_numpy_form_bit_equals_reference_loop(self, spark):
        """Round 5 vectorized the Leiden/Louvain driver-mirror local move.
        The numpy form must reproduce the pure-Python reference loop's
        label assignment EXACTLY — same rounds, same labels — on graphs
        with hubs, ties, and weighted multi-edges, under the real Spark
        xxhash64 gates and a non-trivial init partition (the aggregate-
        level P_init path)."""
        import networkx as nx

        from pcd_spark.graph.louvain import (
            _adj_maps,
            _collect_gates,
            _local_move_np,
            _local_move_py_ref,
        )

        max_rounds, n_classes = 20, 2
        cycles = (max_rounds + n_classes - 1) // n_classes

        cases = []
        g1 = nx.barabasi_albert_graph(300, 3, seed=7)
        cases.append(("ba", {(u, v): 1.0 for u, v in g1.edges()}, None))
        g2 = nx.gnm_random_graph(200, 800, seed=11)
        # integer multiplicities (the co-occurrence weight shape)
        w2 = {(u, v): float((u * 7 + v) % 5 + 1) for u, v in g2.edges()}
        cases.append(("er-weighted", w2, None))
        # init partition: vertices pre-grouped by decade (macro-seeded)
        init2 = {v: (v // 10) * 10 for v in g2.nodes()}
        cases.append(("er-init", w2, init2))

        for name, und, init in cases:
            edges = {}
            for (u, v), w in und.items():
                edges[(u, v)] = edges.get((u, v), 0.0) + w
                edges[(v, u)] = edges.get((v, u), 0.0) + w
            nbrs, k = _adj_maps(edges.items())
            total = sum(edges.values())
            gates = _collect_gates(spark, list(k), n_classes, cycles)
            st_a: dict = {}
            st_b: dict = {}
            ref = _local_move_py_ref(
                nbrs, k, total, gates, max_rounds, n_classes,
                stats=st_a, init=init,
            )
            vec = _local_move_np(
                nbrs, k, total, gates, max_rounds, n_classes,
                stats=st_b, init=init,
            )
            assert st_a["rounds"] == st_b["rounds"], name
            assert {v: int(l) for v, l in ref.items()} == vec, name
