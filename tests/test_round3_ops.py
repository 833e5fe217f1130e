"""Oracles for the round-3 continuation operators (c12-c14, h11-h12, d15,
k40-k42, v10).

The SQL-oracled entries (c12/c13/c14/h11/h12/d15/k40/k41) are hash-matched
against DuckDB by the test_relational_parity sweep; this file pins the parts
SQL cannot see: the Misra-Gries never-drops-a-hitter guarantee at tiny
capacities, weighted PageRank vs the weighted numpy oracle, rich-club vs
networkx, partition agreement vs a pure-numpy ARI/NMI mirror, and the MMR
greedy vs a numpy mirror.
"""

from __future__ import annotations

import math

import networkx as nx
import numpy as np
import pandas as pd
import pytest

from pcd_spark.graph import pagerank
from pcd_spark.graph.quality import partition_agreement, rich_club
from pcd_spark.oracle import pagerank_numpy
from pcd_spark.relational.textops import _mg_candidates


def edges_df(spark, edges, weights=None):
    if weights is None:
        return spark.createDataFrame(
            [(int(u), int(v)) for u, v in edges], "src long, dst long"
        )
    return spark.createDataFrame(
        [(int(u), int(v), float(w)) for (u, v), w in zip(edges, weights)],
        "src long, dst long, weight double",
    )


# ---- D15 Misra-Gries candidate stage ----------------------------------------


def _run_kernel(words, local_bar, capacity):
    out = list(_mg_candidates(local_bar, capacity)(
        iter([pd.DataFrame({"word": words})])
    ))
    return set(out[0]["word"])


def test_mg_candidates_keep_every_true_heavy_hitter_at_tiny_capacity():
    """Adversarial stream: 5000 unique words + heavy words, capacity 16 —
    the decrement path fires constantly, yet every word whose count can
    reach the bar must survive (the guarantee d15's exactness rests on)."""
    rng = np.random.RandomState(7)
    words = [f"u{i}" for i in range(5000)]
    words += ["heavy_a"] * 900 + ["heavy_b"] * 500 + ["mid"] * 120
    order = rng.permutation(len(words))
    stream = [words[i] for i in order]
    n_p = len(stream)
    local_bar = 400.0  # true bar: heavy_a and heavy_b qualify, mid doesn't
    got = _run_kernel(stream, local_bar, capacity=16)
    assert "heavy_a" in got and "heavy_b" in got
    # the candidate set is bounded by the capacity, not the vocabulary
    assert len(got) <= 16


def test_mg_candidates_exact_when_capacity_exceeds_vocab():
    got = _run_kernel(["a"] * 10 + ["b"] * 3 + ["c"], 5.0, capacity=100)
    assert got == {"a"}


# ---- K40 partition agreement -------------------------------------------------


def _ari_nmi_numpy(a, b):
    a, b = np.asarray(a), np.asarray(b)
    n = len(a)
    ua, ub = np.unique(a), np.unique(b)
    cont = np.zeros((len(ua), len(ub)))
    for i, x in enumerate(ua):
        for j, y in enumerate(ub):
            cont[i, j] = np.sum((a == x) & (b == y))
    ai, bj = cont.sum(1), cont.sum(0)
    c2 = lambda x: (x * (x - 1) / 2.0).sum()  # noqa: E731
    sij, sa, sb = c2(cont), c2(ai), c2(bj)
    npairs = n * (n - 1) / 2.0
    exp = sa * sb / npairs
    den = (sa + sb) / 2.0 - exp
    ari = (sij - exp) / den if den else 1.0
    nz = cont > 0
    mi = (cont[nz] / n * np.log(n * cont[nz]
          / np.outer(ai, bj)[nz])).sum()
    ha = -(ai / n * np.log(ai / n)).sum()
    hb = -(bj / n * np.log(bj / n)).sum()
    nmi = mi / math.sqrt(ha * hb) if ha > 0 and hb > 0 else 1.0
    return ari, nmi


def test_partition_agreement_identity_is_one(spark):
    pairs = spark.createDataFrame(
        [(i % 7, i % 7) for i in range(100)], "a int, b int"
    )
    row = partition_agreement(pairs).first()
    assert row["n_items"] == 100
    assert row["ari"] == pytest.approx(1.0)
    assert row["nmi"] == pytest.approx(1.0)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_partition_agreement_matches_numpy_mirror(spark, seed):
    rng = np.random.RandomState(seed)
    a = rng.randint(0, 6, 400)
    b = (a + (rng.rand(400) < 0.3) * rng.randint(1, 6, 400)) % 6  # correlated
    pairs = spark.createDataFrame(
        [(int(x), int(y)) for x, y in zip(a, b)], "a int, b int"
    )
    row = partition_agreement(pairs, round_to=None).first()
    ari, nmi = _ari_nmi_numpy(a, b)
    assert row["ari"] == pytest.approx(ari, abs=1e-9)
    assert row["nmi"] == pytest.approx(nmi, abs=1e-9)
    # correlated labelings must land strictly between chance and identity
    assert 0.05 < row["ari"] < 1.0


def test_partition_agreement_scores_lpa_against_ground_truth(spark, graphs):
    """The operator's actual use: score a community detection against the
    known partition. Two disjoint cliques: LPA labels vs the true side."""
    from pcd_spark.graph import label_propagation

    g = graphs["two_cliques_split"]
    labels = label_propagation(edges_df(spark, g["edges"]), max_iter=10)
    truth = spark.createDataFrame(
        [(i, i // 10) for i in range(g["n"])], "vid long, truth int"
    )
    pairs = labels.join(truth, "vid").select(
        labels["label"].alias("a"), truth["truth"].alias("b")
    )
    row = partition_agreement(pairs).first()
    assert row["ari"] == pytest.approx(1.0)
    assert row["nmi"] == pytest.approx(1.0)


# ---- K41 rich club -----------------------------------------------------------


@pytest.mark.parametrize("name", ["ba_1000", "er_200", "karate"])
def test_rich_club_matches_networkx(spark, graphs, name):
    g = graphs[name]
    G = nx.Graph(g["edges"])
    want = nx.rich_club_coefficient(G, normalized=False)
    ks = (2, 4, 8, 16)
    got = {
        r["k"]: r
        for r in rich_club(
            edges_df(spark, g["edges"]), ks=ks, round_to=None
        ).collect()
    }
    for k in ks:
        if k in want:
            assert got[k]["phi"] == pytest.approx(want[k], abs=1e-12), (
                name, k,
            )
        else:  # fewer than 2 vertices above k: nx omits, we emit NULL
            assert got[k]["phi"] is None or got[k]["n_k"] < 2


# ---- K42 weighted PageRank ----------------------------------------------------


@pytest.mark.parametrize("name", ["er_200", "directed_toy"])
def test_weighted_pagerank_matches_numpy_oracle(spark, graphs, name):
    g = graphs[name]
    edges = g["edges"]
    if not g["directed"]:
        edges = edges + [(v, u) for u, v in edges]
    # deterministic integer weights 1..5
    w = [(u * 7 + v * 13) % 5 + 1 for u, v in edges]
    df = edges_df(spark, edges, weights=w)
    got = {
        r["vid"]: r["rank"]
        for r in pagerank(df, tol=1e-10, weight_col="weight").collect()
    }
    want = pagerank_numpy(
        g["n"], np.array(edges), tol=1e-14, weights=np.array(w, dtype=float)
    )
    assert len(got) == g["n"]
    for vid, rank in got.items():
        assert rank == pytest.approx(want[vid], abs=1e-8), vid
    # weights must actually matter: unweighted ranks differ
    unw = pagerank_numpy(g["n"], np.array(edges), tol=1e-14)
    assert not np.allclose(want, unw)


# ---- V10 MMR re-ranking ---------------------------------------------------------


def test_mmr_rerank_matches_numpy_mirror(spark, sf_dir):
    from pcd_spark.relational import REGISTRY

    got = (
        REGISTRY["v10_mmr_rerank"]["spark"](spark, sf_dir)
        .orderBy("probe_id", "rank")
        .collect()
    )
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = {int(r.vec_id): np.asarray(list(r.embedding), dtype=np.float64)
            for r in emb.itertuples()}
    lam, topk_in, topk_out = 0.7, 20, 5

    def cos(x, y):
        # mirror v10's 9-dp rounded rank key (ulp-stable cross-impl order)
        return round(float(x @ y / (np.linalg.norm(x) * np.linalg.norm(y))), 9)

    want = []
    for probe in sorted(v for v in vecs if v < 5):
        p = vecs[probe]
        scored = sorted(
            ((cos(p, vecs[c]), -c) for c in vecs if c != probe),
            reverse=True,
        )[:topk_in]
        cand = [(-negc, s) for s, negc in scored]
        ids = [c for c, _ in cand]
        rel = np.array([s for _, s in cand])
        mat = np.stack([vecs[c] for c in ids])
        norm = np.linalg.norm(mat, axis=1)
        sims = (mat @ mat.T) / np.outer(norm, norm)
        chosen, avail = [], list(range(len(ids)))
        while avail and len(chosen) < topk_out:
            red = (
                sims[np.ix_(avail, chosen)].max(axis=1)
                if chosen
                else np.zeros(len(avail))
            )
            score = lam * rel[avail] - (1 - lam) * red
            best = int(np.argmax(score))
            pick = avail.pop(best)
            chosen.append(pick)
            want.append(
                (probe, len(chosen), ids[pick], round(float(score[best]), 6))
            )

    assert len(got) == len(want)
    for r, (probe, rank, cid, score) in zip(got, want):
        assert (r["probe_id"], r["rank"], r["cand_id"]) == (probe, rank, cid)
        assert r["mmr_score"] == pytest.approx(score, abs=1e-6)


# ---- D15 partition invariance --------------------------------------------------


def test_d15_exact_output_is_partition_invariant(spark, sf_dir):
    """The MG candidate SET legitimately varies with partitioning (each
    partition prunes against its own local bar); the exact recount must
    erase that — identical final rows at 1 partition and at 13."""
    from pcd_spark.relational import REGISTRY
    from pcd_spark.relational import textops

    base = sorted(
        map(tuple, REGISTRY["d15_heavy_hitters"]["spark"](spark, sf_dir).collect())
    )
    # force pathological partitionings through the same public query by
    # widening/narrowing the session default parallelism is not possible
    # per-call, so replay the pipeline body at two explicit widths
    import math

    from pyspark.sql import functions as F

    d = textops.load(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    n_total = int(
        d.select(F.sum(F.size(F.split(F.trim("text"), r"\s+")))).first()[0]
    )
    t_bar = math.ceil(textops._D15_PHI * n_total)
    for parts in (1, 13):
        words = d.select(
            F.explode(F.split(F.trim("text"), r"\s+")).alias("word")
        ).repartition(parts)
        cand = words.mapInPandas(
            textops._mg_candidates(t_bar / parts, 64), "word string"
        ).distinct()
        got = sorted(
            map(
                tuple,
                words.join(F.broadcast(cand), "word", "left_semi")
                .groupBy("word")
                .agg(F.count("*").cast("long").alias("cnt"))
                .filter(F.col("cnt") >= t_bar)
                .collect(),
            )
        )
        assert got == base, f"parts={parts}"


# ---- K43 edge betweenness -------------------------------------------------------


@pytest.mark.parametrize("name", ["karate", "two_cliques", "cycle_9"])
def test_edge_betweenness_matches_networkx(spark, graphs, name):
    """Full-source edge sums must be exactly 2x networkx (undirected
    (s,t)/(t,s) both counted, same convention as the vertex K23 test)."""
    from pcd_spark.graph import betweenness_centrality

    g = graphs[name]
    got = {
        (r["u"], r["v"]): r["betweenness"]
        for r in betweenness_centrality(
            edges_df(spark, g["edges"]), mode="edge"
        ).collect()
    }
    G = nx.Graph(g["edges"])
    want = nx.edge_betweenness_centrality(G, normalized=False)
    assert len(got) == len(want)
    for (u, v), w in want.items():
        key = (min(u, v), max(u, v))
        assert got[key] == pytest.approx(2.0 * w, abs=1e-9), (name, key)


def test_edge_betweenness_directed_matches_networkx(spark, graphs):
    from pcd_spark.graph import betweenness_centrality

    g = graphs["directed_toy"]
    got = {
        (r["u"], r["v"]): r["betweenness"]
        for r in betweenness_centrality(
            edges_df(spark, g["edges"]), directed=True, mode="edge"
        ).collect()
    }
    G = nx.DiGraph(g["edges"])
    want = nx.edge_betweenness_centrality(G, normalized=False)
    for (u, v), w in want.items():
        assert got.get((u, v), 0.0) == pytest.approx(w, abs=1e-9), (u, v)


def test_edge_betweenness_girvan_newman_peel(spark, graphs):
    """The operator's actual use: the top edge on two bridged cliques must
    be the bridge (the Girvan-Newman first peel)."""
    from pcd_spark.graph import betweenness_centrality

    g = graphs["two_cliques"]
    rows = betweenness_centrality(
        edges_df(spark, g["edges"]), mode="edge"
    ).collect()
    top = max(rows, key=lambda r: r["betweenness"])
    assert (top["u"], top["v"]) == (9, 10)


def test_betweenness_rejects_unknown_mode(spark, graphs):
    from pcd_spark.graph import betweenness_centrality

    with pytest.raises(ValueError, match="unknown mode"):
        betweenness_centrality(
            edges_df(spark, graphs["cycle_9"]["edges"]), mode="edgy"
        )


def test_mg_candidates_refuse_when_capacity_cannot_certify():
    """When local_bar <= n_p/(capacity+1) the MG summary cannot guarantee
    a candidate superset (a qualifying word may have been trimmed away) —
    the kernel must raise, never silently return an incomplete set."""
    stream = [f"w{i}" for i in range(200)] + ["hit"] * 11
    with pytest.raises(RuntimeError, match="cannot certify"):
        list(_mg_candidates(10.0, 16)(
            iter([pd.DataFrame({"word": stream})])
        ))


def test_partition_agreement_raises_on_degenerate_input(spark):
    with pytest.raises(ValueError, match="labeled items"):
        partition_agreement(
            spark.createDataFrame([], "a int, b int")
        ).first()
    with pytest.raises(ValueError, match="labeled items"):
        partition_agreement(
            spark.createDataFrame([(1, 1)], "a int, b int")
        ).first()


# ---- K44 local community (PageRank-Nibble) ---------------------------------------


def test_local_community_recovers_clique_exactly(spark, graphs):
    from pcd_spark.graph import local_community

    g = graphs["two_cliques"]  # K10 + K10 bridged 9-10
    stats: dict = {}
    out = local_community(
        edges_df(spark, g["edges"]), seed=0, stats_out=stats
    ).collect()
    comm = sorted(r["vid"] for r in out if r["in_community"])
    assert comm == list(range(10))
    # phi of the recovered clique: 1 cut edge / vol 91
    assert stats["best_phi"] == pytest.approx(1 / 91)


def test_local_community_matches_pure_python_mirror(spark, graphs):
    """Full mirror on karate: PPR via the pinned numpy oracle, the same
    rank/degree order, the same incremental sweep — positions, phi values,
    and the chosen prefix must agree exactly."""
    from pcd_spark.graph import local_community

    g = graphs["karate"]
    seed, maxc = 33, 20
    out = (
        local_community(
            edges_df(spark, g["edges"]), seed=seed, max_candidates=maxc
        )
        .orderBy("position")
        .collect()
    )

    # mirror
    edges = g["edges"]
    dir_edges = edges + [(v, u) for u, v in edges]
    ppr = pagerank_numpy(
        g["n"], np.array(dir_edges), tol=1e-14, sources=[seed]
    )
    deg = np.zeros(g["n"], dtype=int)
    for u, v in dir_edges:
        deg[u] += 1
    order = sorted(
        (v for v in range(g["n"]) if ppr[v] > 0),
        key=lambda v: (-(ppr[v] / deg[v]), v),
    )[:maxc]
    nbr = {v: set() for v in range(g["n"])}
    for u, v in edges:
        nbr[u].add(v)
        nbr[v].add(u)
    two_m = len(dir_edges)
    vol = cut = 0
    in_set: set = set()
    phis = []
    for v in order:
        internal = len(nbr[v] & in_set)
        vol += deg[v]
        cut += deg[v] - 2 * internal
        in_set.add(v)
        denom = min(vol, two_m - vol)
        phis.append(cut / denom if denom > 0 else float("inf"))
    best_k = min(range(len(order)), key=lambda i: (phis[i], i))

    assert [r["vid"] for r in out] == order
    for r, phi in zip(out, phis):
        assert r["phi_prefix"] == pytest.approx(phi, abs=1e-8)
    got_comm = [r["vid"] for r in out if r["in_community"]]
    assert got_comm == order[: best_k + 1]


# ---- X26 segment dedup rewrite ----------------------------------------------


def test_x26_drops_shared_segment_from_higher_doc_and_keeps_tail(spark, tmp_path):
    """Constructed corpus: a 12-word segment shared verbatim by docs 1 and 2
    must survive only in doc 1 (keep-first), doc 2's unique material and
    sub-segment tail must survive untouched, and a doc shorter than one
    segment passes through byte-identical."""
    from pcd_spark.relational.textops import x26

    seg = " ".join(f"dup{i}" for i in range(12))      # the shared segment
    uniq1 = " ".join(f"one{i}" for i in range(12))
    uniq2 = " ".join(f"two{i}" for i in range(12))
    docs = [
        (1, f"{seg} {uniq1}"),                        # keeper of `seg`
        (2, f"{uniq2} {seg} tail words"),             # loses `seg`, keeps tail
        (3, "short doc only"),                        # < 12 words: pass-through
    ]
    sf = str(tmp_path)
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        f"{sf}/documents.parquet"
    )
    out = {r["doc_id"]: r for r in x26(spark, sf).collect()}
    assert out[1]["kept_text"] == f"{seg} {uniq1}"
    assert out[1]["n_segments"] == 2 and out[1]["n_dropped"] == 0
    assert out[2]["kept_text"] == f"{uniq2} tail words"
    assert out[2]["n_segments"] == 2 and out[2]["n_dropped"] == 1
    assert out[3]["kept_text"] == "short doc only"
    assert out[3]["n_segments"] == 0 and out[3]["n_dropped"] == 0


# ---- K45 maximal matching ----------------------------------------------------


@pytest.mark.parametrize("name", ["karate", "path_100", "star_1001", "ba_1000"])
def test_matching_is_valid_maximal_and_half_approx(spark, graphs, name):
    """Matching (partner symmetric, each vertex once), maximality (no edge
    with both endpoints unmatched), and the greedy ½-approximation bound
    vs networkx's maximum-cardinality matching."""
    from pcd_spark.graph import maximal_matching

    g = graphs[name]
    rows = maximal_matching(edges_df(spark, g["edges"])).collect()
    partner = {r["vid"]: r["partner"] for r in rows}
    matched = {r["vid"] for r in rows if r["matched"]}
    assert len(rows) == len(partner)  # each vertex exactly once
    for v in matched:
        assert partner[partner[v]] == v and partner[v] != v
    unmatched = set(partner) - matched
    for u, v in g["edges"]:
        assert not (u in unmatched and v in unmatched), f"not maximal: {u}-{v}"
    G = nx.Graph(g["edges"])
    mx = nx.max_weight_matching(G, maxcardinality=True)
    assert len(matched) // 2 >= math.ceil(len(mx) / 2)


def test_heavy_matching_is_half_approx_of_max_weight(spark):
    """Weighted mode (Preis's locally-heaviest rule): matched weight must be
    >= half the maximum-weight matching, checked on a hash-weighted BA
    graph against networkx's exact blossom solver."""
    from pcd_spark.graph import maximal_matching

    ba = nx.barabasi_albert_graph(120, 2, seed=7)
    edges = [(u, v) for u, v in ba.edges()]
    wts = [float(1 + ((u * 31 + v * 17) % 10)) for u, v in edges]
    rows = maximal_matching(
        edges_df(spark, edges, weights=wts), weight_col="weight"
    ).collect()
    partner = {r["vid"]: r["partner"] for r in rows}
    wmap = {(min(u, v), max(u, v)): w for (u, v), w in zip(edges, wts)}
    got = sum(
        wmap[(min(v, p), max(v, p))]
        for v, p in partner.items() if p is not None and v < p
    )
    for u, v in ba.edges():
        ba[u][v]["weight"] = wmap[(min(u, v), max(u, v))]
    opt = nx.max_weight_matching(ba)
    optw = sum(ba[u][v]["weight"] for u, v in opt)
    assert got >= optw / 2, (got, optw)


def test_matching_is_partition_invariant(spark, graphs):
    """Hash priorities, not partitioning, decide the matching: identical
    output at 2 and 16 input partitions."""
    from pcd_spark.graph import maximal_matching

    e = edges_df(spark, graphs["ba_1000"]["edges"])
    a = sorted(map(tuple, maximal_matching(
        e.repartition(2), small_graph_cutoff=0).collect()))
    b = sorted(map(tuple, maximal_matching(
        e.repartition(16), small_graph_cutoff=0).collect()))
    assert a == b


# ---- V13 Matryoshka screen + re-rank -----------------------------------------


def test_v13_recall_vs_exact_numpy(spark, sf_dir):
    """The two-stage result must recover >= 80% of the exact full-dim
    top-10 per probe ON AVERAGE at the pinned operating point (measured
    0.88 at sf0.01; untrained random embeddings are the worst case for a
    prefix screen), and every returned cosine must equal the numpy exact
    cosine for that pair."""
    from pcd_spark.relational.textops import v13

    rows = v13(spark, "/root/testdata/sf0.01").collect()
    import duckdb

    d = duckdb.sql(
        "select vec_id, embedding from "
        "'/root/testdata/sf0.01/embeddings.parquet' order by vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in d])
    E = np.array([r[1] for r in d], dtype=np.float64)
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    idx = {int(v): i for i, v in enumerate(ids)}
    recs = []
    for p in range(5):
        full = En @ En[idx[p]]
        full[idx[p]] = -9.0
        exact10 = set(int(v) for v in ids[np.argsort(-np.round(full, 6))][:10])
        got = [r for r in rows if r["probe_id"] == p]
        assert len(got) == 10
        for r in got:
            want = round(float(En[idx[p]] @ En[idx[r["cand_id"]]]), 6)
            assert math.isclose(r["cosine"], want, abs_tol=2e-6)
        recs.append(len({r["cand_id"] for r in got} & exact10) / 10)
    assert sum(recs) / len(recs) >= 0.8, recs


# ---- K46 coarsening -----------------------------------------------------------


def test_coarsen_conserves_weight_and_halves_vertices(spark, graphs):
    """Contraction law: total coarse weight == total fine weight minus the
    contracted matching edges' weight; coarse |V| == fine |V| - |matched
    pairs|; no self-loops survive."""
    from pcd_spark.graph import coarsen_graph, maximal_matching

    edges = graphs["ba_1000"]["edges"]
    wts = [float(1 + ((u * 13 + v * 7) % 5)) for u, v in edges]
    e = edges_df(spark, edges, weights=wts)
    m = maximal_matching(e, weight_col="weight")
    c = coarsen_graph(e, m, weight_col="weight")
    rows = c.collect()
    assert all(r["src"] < r["dst"] for r in rows)
    partner = {r["vid"]: r["partner"] for r in m.collect()}
    matched_pairs = {(min(v, p), max(v, p)) for v, p in partner.items() if p is not None}
    wmap = {(min(u, v), max(u, v)): w for (u, v), w in zip(edges, wts)}
    contracted_w = sum(wmap.get(pr, 0.0) for pr in matched_pairs)
    total_fine = sum(wmap.values())
    total_coarse = sum(r["weight"] for r in rows)
    assert math.isclose(total_coarse, total_fine - contracted_w, rel_tol=1e-9)
    fine_v = len(partner)
    coarse_v = len({r["src"] for r in rows} | {r["dst"] for r in rows})
    assert coarse_v <= fine_v - len(matched_pairs)


def test_coarsen_hand_case(spark):
    """Square 1-2-3-4-1 with heavy edges (1,2) and (3,4): matching takes
    both, the coarse graph is a single supervertex pair {1,2}-{3,4} with
    weight = the two light edges' sum."""
    from pcd_spark.graph import coarsen_graph, maximal_matching

    e = edges_df(
        spark, [(1, 2), (2, 3), (3, 4), (4, 1)], weights=[9.0, 1.0, 9.0, 1.0]
    )
    m = maximal_matching(e, weight_col="weight")
    rows = coarsen_graph(e, m, weight_col="weight").collect()
    assert len(rows) == 1
    assert (rows[0]["src"], rows[0]["dst"], rows[0]["weight"]) == (1, 3, 2.0)


# ---- X27 temperature mixing ---------------------------------------------------


def test_x27_rates_follow_temperature_rule_on_skewed_corpus(spark, tmp_path):
    """Skewed corpus (one source 100 docs, one 10, one 1, all 20-word
    docs): rates must match the closed-form τ=0.5 rule exactly, order
    inversely to source size, and the realized kept fraction must be
    within binomial noise of the rate."""
    from pcd_spark.relational.textops import x27, _X27_BUDGET

    text = " ".join(f"w{i}" for i in range(20))
    docs = [(i, text, "en", "big", len(text)) for i in range(100)]
    docs += [(100 + i, text, "en", "mid", len(text)) for i in range(10)]
    docs += [(110, text, "en", "tiny", len(text))]
    sf = str(tmp_path)
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{sf}/documents.parquet")
    rows = x27(spark, sf).collect()
    rate = {}
    for r in rows:
        rate.setdefault(r["source"], r["rate"])
    stok = {"big": 2000.0, "mid": 200.0, "tiny": 20.0}
    z = sum(math.sqrt(v) for v in stok.values())
    tot = sum(stok.values())
    for s, v in stok.items():
        want = round(min(1.0, _X27_BUDGET * tot * (math.sqrt(v) / z) / v), 6)
        assert math.isclose(rate[s], want, abs_tol=1e-9), (s, rate[s], want)
    # mid and tiny clip at 1.0 (a filter cannot upsample; the boosted
    # budget share simply keeps everything), big is genuinely damped
    assert rate["big"] < rate["mid"] == rate["tiny"] == 1.0
    kept_big = sum(1 for r in rows if r["source"] == "big" and r["kept"])
    assert abs(kept_big / 100 - rate["big"]) < 0.15  # 100 Bernoulli(rate) draws


@pytest.mark.parametrize("name", ["karate", "ba_1000", "path_100"])
def test_matching_driver_and_distributed_paths_agree(spark, graphs, name):
    """The Blelloch-Fineman-Shun equivalence the small-graph path rests
    on: sequential greedy in priority order == distributed locally-minimal
    rounds, bit-for-bit."""
    from pcd_spark.graph import maximal_matching

    e = edges_df(spark, graphs[name]["edges"])
    a = sorted(map(tuple, maximal_matching(e).collect()))
    b = sorted(map(tuple,
                   maximal_matching(e, small_graph_cutoff=0).collect()))
    assert a == b


# ---- K47 densest subgraph ------------------------------------------------------


def _exact_densest_density(n, edges):
    """Brute-force max over all vertex subsets (n <= 16)."""
    adj = [(1 << u) | (1 << v) for u, v in edges]
    best = 0.0
    for mask in range(3, 1 << n):
        nv = bin(mask).count("1")
        if nv < 2:
            continue
        ne = sum(1 for a in adj if a & mask == a)
        best = max(best, ne / nv)
    return best


def test_densest_finds_planted_clique_exactly(spark):
    """K8 clique + pendant path: the returned set must be exactly the
    clique, density 28/8."""
    from pcd_spark.graph import densest_subgraph

    import itertools

    k8 = list(itertools.combinations(range(8), 2))
    path = [(8 + i, 8 + i + 1) for i in range(5)] + [(0, 8)]
    stats = {}
    rows = densest_subgraph(
        edges_df(spark, k8 + path), stats_out=stats
    ).collect()
    assert sorted(r["vid"] for r in rows if r["in_densest"]) == list(range(8))
    assert stats["density"] == pytest.approx(3.5)


@pytest.mark.parametrize("seed", [1, 5, 9])
def test_densest_meets_approximation_bound(spark, seed):
    """Bahmani guarantee: returned density >= OPT / (2(1+eps)), OPT by
    brute force over all subsets of a 13-vertex random graph; and the
    reported density must equal the returned set's recomputed density."""
    from pcd_spark.graph import densest_subgraph

    n = 13
    rng = np.random.RandomState(seed)
    edges = [(u, v) for u in range(n) for v in range(u + 1, n)
             if rng.rand() < 0.35]
    eps = 0.1
    stats = {}
    rows = densest_subgraph(
        edges_df(spark, edges), eps=eps, stats_out=stats
    ).collect()
    got = {r["vid"] for r in rows if r["in_densest"]}
    ne = sum(1 for u, v in edges if u in got and v in got)
    dens = ne / len(got)
    assert dens == pytest.approx(stats["density"])
    opt = _exact_densest_density(n, edges)
    assert dens >= opt / (2 * (1 + eps)) - 1e-12, (dens, opt)


def test_densest_is_partition_invariant(spark, graphs):
    from pcd_spark.graph import densest_subgraph

    e = edges_df(spark, graphs["ba_1000"]["edges"])
    a = sorted(map(tuple, densest_subgraph(
        e.repartition(2), small_graph_cutoff=0).collect()))
    b = sorted(map(tuple, densest_subgraph(
        e.repartition(16), small_graph_cutoff=0).collect()))
    assert a == b


def test_densest_driver_and_distributed_paths_agree(spark, graphs):
    """The small-graph driver peel must be bit-identical to the
    distributed rounds (deterministic rule, no hash-randomness)."""
    from pcd_spark.graph import densest_subgraph

    for name in ("karate", "ba_1000", "cycle_9"):
        e = edges_df(spark, graphs[name]["edges"])
        a = sorted(map(tuple, densest_subgraph(e).collect()))
        b = sorted(map(tuple, densest_subgraph(
            e, small_graph_cutoff=0).collect()))
        assert a == b, name


# ---- V14 SemDeDup --------------------------------------------------------------


def test_v14_flags_match_numpy_mirror_given_clusters(spark):
    """Given the cluster assignment the op itself produced, the keep/drop
    flags must equal the numpy within-cluster pairwise rule exactly."""
    from pcd_spark.relational.textops import v14, _V14_THETA

    sf = "/root/testdata/sf0.001"
    rows = v14(spark, sf).collect()
    emb = pd.read_parquet(f"{sf}/embeddings.parquet")
    vecs = {int(r.vec_id): np.asarray(list(r.embedding), dtype=np.float64)
            for r in emb.itertuples()}
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], []).append(r["vec_id"])
    want_dup = set()
    for mem in by_cluster.values():
        mem = sorted(mem)
        for i, v2 in enumerate(mem):
            for v1 in mem[:i]:
                a, b = vecs[v1], vecs[v2]
                c = round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6)
                if c >= _V14_THETA:
                    want_dup.add(v2)
                    break
    got_dup = {r["vec_id"] for r in rows if not r["kept"]}
    assert got_dup == want_dup


def test_v14_drops_planted_identical_vector(spark, tmp_path):
    """Two byte-identical vectors: the higher vec_id must be dropped, the
    lower kept, everything else kept (all other cosines are far below the
    threshold by construction)."""
    from pcd_spark.relational.textops import v14

    rng = np.random.RandomState(3)
    n, dim = 40, 16
    V = rng.randn(n, dim)
    V[17] = V[4]  # planted duplicate
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, [float(x) for x in V[i]], int(i % 3)) for i in range(n)],
        "vec_id long, embedding array<float>, label int",
    ).write.parquet(f"{sf}/embeddings.parquet")
    out = {r["vec_id"]: r["kept"] for r in v14(spark, sf).collect()}
    assert out[4] is True
    assert out[17] is False


def test_coarsen_maps_unmatched_outsider_vertices_to_themselves(spark):
    """An edge touching a vertex the matching never saw (grown graph)
    must survive contraction mapped to itself, not vanish."""
    from pcd_spark.graph import coarsen_graph, maximal_matching

    e = edges_df(spark, [(1, 2)])
    m = maximal_matching(e)
    grown = edges_df(spark, [(1, 2), (2, 9)])  # 9 unknown to the matching
    rows = {(r["src"], r["dst"]): r["weight"]
            for r in coarsen_graph(grown, m).collect()}
    assert rows == {(1, 9): 1.0}


# ---- K48 DOULION approximate triangles ------------------------------------------


def test_doulion_identity_at_p_one_and_bounded_error_at_quarter(spark, graphs):
    """p=1 must equal the exact count; p=1/4 on the fixed hash coin must
    land within 20% of exact on these seeds (deterministic sample, so the
    pin is stable), and the estimate must be invariant to input
    partitioning."""
    from pcd_spark.graph import approx_triangle_total

    g = nx.barabasi_albert_graph(2000, 8, seed=5)
    exact = sum(nx.triangles(g).values()) // 3
    e = edges_df(spark, list(g.edges()))
    rx = approx_triangle_total(e, p_num=1, p_den=1)
    assert rx["sampled_triangles"] == exact
    assert rx["estimate"] == float(exact)
    r1 = approx_triangle_total(e.repartition(2))
    r2 = approx_triangle_total(e.repartition(16))
    assert r1 == r2
    assert abs(r1["estimate"] - exact) / exact < 0.2
    with pytest.raises(ValueError):
        approx_triangle_total(e, p_num=0)


# ---- K49: minimum spanning forest ------------------------------------------


def _msf_edge_set(df):
    return sorted((r["src"], r["dst"], r["weight"]) for r in df.collect())


class TestMinimumSpanningForest:
    def _rand_weighted(self, spark, n=40, m=160, seed=3):
        """Distinct weights (hash-derived) => unique MSF, exact nx oracle."""
        import networkx as nx

        g = nx.gnm_random_graph(n, m, seed=seed)
        rows = [
            (u, v, float(((u * 73856093) ^ (v * 19349663) ^ seed) % 100000) + 0.5)
            for u, v in ((min(a, b), max(a, b)) for a, b in g.edges())
        ]
        # hash weights can collide; the (w,src,dst) total order still makes
        # the forest unique, but for the EXACT nx comparison force distinct
        seen, uniq = set(), []
        for u, v, w in rows:
            while w in seen:
                w += 0.25
            seen.add(w)
            uniq.append((u, v, w))
        return uniq

    def test_exact_vs_networkx_distinct_weights(self, spark):
        import networkx as nx

        from pcd_spark.graph import minimum_spanning_forest

        rows = self._rand_weighted(spark)
        e = spark.createDataFrame(rows, "src long, dst long, weight double")
        got = _msf_edge_set(minimum_spanning_forest(e, weight_col="weight"))
        g = nx.Graph()
        g.add_weighted_edges_from(rows)
        want = sorted(
            (min(u, v), max(u, v), d["weight"])
            for u, v, d in nx.minimum_spanning_edges(g, data=True)
        )
        assert got == want

    def test_distributed_equals_driver_kruskal(self, spark):
        from pcd_spark.graph import minimum_spanning_forest

        rows = self._rand_weighted(spark, n=60, m=240, seed=9)
        # duplicate weights on purpose: total order must still be unique
        rows += [(0, 1, 7.0), (1, 2, 7.0), (2, 3, 7.0)]
        e = spark.createDataFrame(rows, "src long, dst long, weight double")
        st_d: dict = {}
        st_b: dict = {}
        drv = minimum_spanning_forest(e, weight_col="weight", stats_out=st_d)
        dist = minimum_spanning_forest(
            e, weight_col="weight", small_graph_cutoff=0, stats_out=st_b
        )
        assert st_d["path"] == "driver-kruskal" and st_b["path"] == "boruvka"
        assert _msf_edge_set(drv) == _msf_edge_set(dist)
        assert st_b["rounds"] >= 1

    def test_forest_properties_duplicate_weights(self, spark, graphs):
        """All weights equal: forest must span, be acyclic, and have
        |V| - #components edges; total weight matches nx (MSF weight is
        unique even when the forest is not)."""
        import networkx as nx

        from pcd_spark.graph import minimum_spanning_forest

        for name in ("karate", "two_cliques", "two_cliques_split"):
            spec = graphs[name]
            e = spark.createDataFrame(
                spec["edges"], "src long, dst long"
            )
            f = _msf_edge_set(minimum_spanning_forest(e))
            g = nx.Graph(spec["edges"])
            n_comp = nx.number_connected_components(g)
            assert len(f) == g.number_of_nodes() - n_comp, name
            fg = nx.Graph((u, v) for u, v, _ in f)
            fg.add_nodes_from(g.nodes)
            assert nx.number_connected_components(fg) == n_comp, name
            assert not nx.cycle_basis(fg), name

    def test_bridge_always_in_forest(self, spark, graphs):
        from pcd_spark.graph import minimum_spanning_forest

        e = spark.createDataFrame(
            graphs["two_cliques"]["edges"], "src long, dst long"
        )
        f = _msf_edge_set(minimum_spanning_forest(e))
        assert (9, 10, 1.0) in f  # the only bridge

    def test_empty_and_trivial(self, spark):
        from pcd_spark.graph import minimum_spanning_forest

        empty = spark.createDataFrame([], "src long, dst long, weight double")
        assert minimum_spanning_forest(empty, weight_col="weight").count() == 0
        one = spark.createDataFrame([(5, 9, 2.0), (9, 5, 9.0), (5, 5, 1.0)],
                                    "src long, dst long, weight double")
        # parallel edge keeps min weight; self-loop dropped
        assert _msf_edge_set(minimum_spanning_forest(one, weight_col="weight")) == [
            (5, 9, 2.0)
        ]


# ---- K51 onion decomposition -------------------------------------------------


class TestOnionLayers:
    @pytest.mark.parametrize(
        "make",
        [
            lambda: nx.karate_club_graph(),
            lambda: nx.gnp_random_graph(80, 0.06, seed=11),
            lambda: nx.ring_of_cliques(5, 4),
            lambda: nx.barbell_graph(6, 3),
        ],
        ids=["karate", "gnp", "ring_of_cliques", "barbell"],
    )
    def test_matches_networkx_exactly(self, spark, make):
        from pcd_spark.graph import onion_layers

        G = make()
        G.remove_nodes_from(list(nx.isolates(G)))
        edges = sorted((min(u, v), max(u, v)) for u, v in G.edges())
        got = {
            r["vid"]: r["layer"]
            for r in onion_layers(edges_df(spark, edges)).collect()
        }
        assert got == nx.onion_layers(G)

    def test_driver_and_distributed_paths_agree(self, spark):
        from pcd_spark.graph import onion_layers

        G = nx.gnp_random_graph(60, 0.08, seed=3)
        G.remove_nodes_from(list(nx.isolates(G)))
        edges = sorted((min(u, v), max(u, v)) for u, v in G.edges())
        df = edges_df(spark, edges)
        fast = {
            (r["vid"], r["layer"]) for r in onion_layers(df).collect()
        }
        dist_stats: dict = {}
        dist = {
            (r["vid"], r["layer"])
            for r in onion_layers(
                df, small_graph_cutoff=0, stats_out=dist_stats
            ).collect()
        }
        assert fast == dist
        assert dist_stats["layers"] == max(l for _, l in dist)

    def test_layers_refine_coreness(self, spark):
        # every vertex of coreness k peels before any vertex of coreness
        # k' > k — the decomposition is a refinement of K27
        from pcd_spark.graph import onion_layers

        G = nx.gnp_random_graph(70, 0.1, seed=9)
        G.remove_nodes_from(list(nx.isolates(G)))
        edges = sorted((min(u, v), max(u, v)) for u, v in G.edges())
        layer = {
            r["vid"]: r["layer"]
            for r in onion_layers(edges_df(spark, edges)).collect()
        }
        core = nx.core_number(G)
        for u in G:
            for v in G:
                if core[u] < core[v]:
                    assert layer[u] < layer[v]

    def test_layer_batching_is_exact_across_batch_sizes(self, spark):
        # the no-op lemma (empty peel => every later sub-layer empty) makes
        # the B-unrolled batch exact for ANY B; pin B=1 (the round-3
        # one-job-per-layer form), a small B that straddles core rises, and
        # the default against each other and networkx
        from pcd_spark.graph import onion_layers

        G = nx.karate_club_graph()
        edges = sorted((min(u, v), max(u, v)) for u, v in G.edges())
        df = edges_df(spark, edges)
        want = nx.onion_layers(G)
        stats_by_b = {}
        for b in (1, 2, 6):
            st: dict = {}
            got = {
                r["vid"]: r["layer"]
                for r in onion_layers(
                    df, small_graph_cutoff=0, layer_batch=b, stats_out=st
                ).collect()
            }
            assert got == want, f"layer_batch={b}"
            stats_by_b[b] = st
        # same real-layer count every time; bigger batches take fewer jobs
        layer_counts = {st["layers"] for st in stats_by_b.values()}
        assert len(layer_counts) == 1
        assert stats_by_b[6]["jobs"] < stats_by_b[1]["jobs"]
        assert stats_by_b[1]["jobs"] == stats_by_b[1]["layers"]

    def test_tail_collapse_matches_distributed_and_networkx(self, spark):
        # start distributed (initial edges above the cutoff), collapse the
        # deep-core tail once the remaining subgraph fits the cutoff; the
        # combined result must equal networkx and the pure-distributed run
        from pcd_spark.graph import onion_layers

        # BA(m=2) is 2-degenerate: the peel sheds edges gradually across
        # many layers, so the remaining-edge count actually crosses the
        # cutoff mid-run (a GNP graph keeps most edges in its deep core
        # until the end and would finish distributed without collapsing)
        G = nx.barabasi_albert_graph(500, 2, seed=7)
        G.remove_nodes_from(list(nx.isolates(G)))
        edges = sorted((min(u, v), max(u, v)) for u, v in G.edges())
        assert len(edges) > 900
        df = edges_df(spark, edges)
        st: dict = {}
        got = {
            r["vid"]: r["layer"]
            for r in onion_layers(
                df, small_graph_cutoff=len(edges) // 3, stats_out=st
            ).collect()
        }
        assert "tail_collapsed_at" in st  # the collapse actually fired
        assert st["tail_collapsed_at"] <= len(edges) // 3
        assert got == nx.onion_layers(G)
        dist = {
            r["vid"]: r["layer"]
            for r in onion_layers(df, small_graph_cutoff=0).collect()
        }
        assert got == dist

    def test_chain_needs_linear_layers_and_raises_on_exhaustion(self, spark):
        from pcd_spark.graph import onion_layers

        path = [(i, i + 1) for i in range(30)]
        df = edges_df(spark, path)
        with pytest.raises(RuntimeError, match="onion_layers"):
            onion_layers(df, small_graph_cutoff=0, max_iter=3)
        # and with the default budget it matches networkx
        G = nx.path_graph(31)
        got = {
            r["vid"]: r["layer"] for r in onion_layers(df).collect()
        }
        assert got == nx.onion_layers(G)


# ---- K52 Burt constraint -----------------------------------------------------


class TestBurtConstraint:
    @pytest.mark.parametrize(
        "make",
        [
            lambda: nx.karate_club_graph(),
            lambda: nx.gnp_random_graph(50, 0.1, seed=5),
        ],
        ids=["karate", "gnp"],
    )
    def test_matches_networkx(self, spark, make):
        from pcd_spark.graph.quality import burt_constraint

        G = make()
        G.remove_nodes_from(list(nx.isolates(G)))
        edges = sorted((min(u, v), max(u, v)) for u, v in G.edges())
        got = {
            r["vid"]: r["constraint_score"]
            for r in burt_constraint(
                edges_df(spark, edges), round_to=None
            ).collect()
        }
        want = nx.constraint(G)
        assert set(got) == set(want)
        for v in want:
            assert got[v] == pytest.approx(want[v], abs=1e-9)

    def test_star_center_unconstrained_leaf_fully_constrained(self, spark):
        # star K1,5: leaves depend entirely on the hub (constraint
        # (1 + 0)^2 = 1 each... leaf's only neighbor is the hub: p=1,
        # indirect 0 -> c=1); the hub spreads over 5 disconnected leaves:
        # c = 5 * (1/5)^2 = 0.2 — the canonical structural-hole picture
        from pcd_spark.graph.quality import burt_constraint

        edges = [(0, i) for i in range(1, 6)]
        got = {
            r["vid"]: r["constraint_score"]
            for r in burt_constraint(edges_df(spark, edges)).collect()
        }
        assert got[0] == pytest.approx(0.2, abs=1e-9)
        for leaf in range(1, 6):
            assert got[leaf] == pytest.approx(1.0, abs=1e-9)


# ---- K53 clique percolation ---------------------------------------------------


class TestCliquePercolation:
    @staticmethod
    def _comms(rows) -> set[frozenset[int]]:
        out: dict[tuple, set[int]] = {}
        for r in rows:
            out.setdefault((r["c_t1"], r["c_t2"], r["c_t3"]), set()).add(
                r["vid"]
            )
        return {frozenset(v) for v in out.values()}

    @pytest.mark.parametrize(
        "make",
        [
            lambda: nx.karate_club_graph(),
            lambda: nx.gnp_random_graph(40, 0.15, seed=13),
            lambda: nx.ring_of_cliques(4, 5),
        ],
        ids=["karate", "gnp", "ring_of_cliques"],
    )
    def test_matches_networkx_member_sets(self, spark, make):
        from pcd_spark.graph import clique_percolation

        G = make()
        edges = sorted((min(u, v), max(u, v)) for u, v in G.edges())
        got = self._comms(
            clique_percolation(edges_df(spark, edges)).collect()
        )
        want = {
            frozenset(c) for c in nx.community.k_clique_communities(G, 3)
        }
        assert got == want

    def test_overlap_edge_share_merges_vertex_share_does_not(self, spark):
        from pcd_spark.graph import clique_percolation

        # triangles (0,1,2) and (1,2,3) share edge 1-2 -> ONE community
        # {0,1,2,3}; triangle (3,4,5) shares only vertex 3 -> its own
        # community. Vertex 3 belongs to BOTH (the overlap LPA/Louvain
        # cannot express).
        edges = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (3, 4), (3, 5), (4, 5)]
        stats: dict = {}
        rows = clique_percolation(
            edges_df(spark, edges), stats_out=stats
        ).collect()
        assert self._comms(rows) == {
            frozenset({0, 1, 2, 3}),
            frozenset({3, 4, 5}),
        }
        assert stats["triangles"] == 3
        assert stats["communities"] == 2
        assert sum(1 for r in rows if r["vid"] == 3) == 2  # overlapping

    def test_triangle_free_graph_has_no_communities(self, spark):
        from pcd_spark.graph import clique_percolation

        rows = clique_percolation(
            edges_df(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])  # 4-cycle
        ).collect()
        assert rows == []

    def test_triangle_list_matches_networkx(self, spark):
        from pcd_spark.graph import triangle_list

        G = nx.gnp_random_graph(30, 0.2, seed=21)
        edges = sorted((min(u, v), max(u, v)) for u, v in G.edges())
        got = {
            (r["t1"], r["t2"], r["t3"])
            for r in triangle_list(edges_df(spark, edges)).collect()
        }
        want = {
            tuple(sorted(c))
            for c in nx.enumerate_all_cliques(G)
            if len(c) == 3
        }
        assert got == want
