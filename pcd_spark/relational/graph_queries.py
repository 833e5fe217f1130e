"""Graph-algorithm queries over the driver's relational tables.

The graph suite's queries() entries derive graphs from the sf tables so the
driver can run them at any scale factor:

  - bipartite customer–supplier graph: src = o_custkey,
    dst = 100000 + l_suppkey, from lineitem ⋈ orders (distinct pairs)
  - part co-occurrence graph: undirected edge between two parts appearing in
    the same order (has triangles; the bipartite graph provably has none)

SQL oracles: degrees and triangles are fully ANSI-SQL-expressible (CTE
mirror of the oriented-wedge algorithm); connected components gets an exact
recursive-CTE oracle on a bounded subgraph. PageRank/LPA are iterative-
to-convergence and not SQL-expressible — rows-only check (the pinned numpy
oracles cover their exactness in pytest instead; SURVEY §5.3).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pcd_spark.graph import (
    pagerank,
    connected_components,
    label_propagation,
    triangle_counts,
)
from pcd_spark.relational.queries import load

REGISTRY: dict = {}


def g(name: str, sql: str | None):
    def deco(fn):
        REGISTRY[name] = {"spark": fn, "sql": sql}
        return fn
    return deco


SUPPLIER_OFFSET = 100000


def cust_supp_edges(spark, sf):
    li, o = load(spark, sf, "lineitem"), load(spark, sf, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.lit(SUPPLIER_OFFSET) + F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )


_CS_EDGES_SQL = f"""
  SELECT DISTINCT o_custkey AS src, {SUPPLIER_OFFSET} + l_suppkey AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
"""


def part_cooccurrence_edges(spark, sf):
    """Undirected canonical edges between parts co-ordered in one order."""
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("dst"))
    return (
        a.join(b, "k")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


_PART_EDGES_SQL = """
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
  JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
"""


@g(
    "k1_degrees",
    f"""WITH edges AS ({_CS_EDGES_SQL}),
        sym AS (SELECT src, dst FROM edges
                UNION ALL SELECT dst AS src, src AS dst FROM edges)
        SELECT src AS vid, COUNT(*) AS deg FROM sym GROUP BY src""",
)
def k1(spark, sf):
    e = cust_supp_edges(spark, sf)
    sym = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return sym.groupBy(F.col("src").alias("vid")).agg(F.count("*").alias("deg"))


@g(
    "k6_triangles",
    f"""WITH canon AS ({_PART_EDGES_SQL}),
        both_dir AS (SELECT src, dst FROM canon
                     UNION ALL SELECT dst, src FROM canon),
        deg AS (SELECT src AS vid, COUNT(*) AS d FROM both_dir GROUP BY src),
        oriented AS (
          SELECT CASE WHEN (ds.d, c.src) < (dd.d, c.dst) THEN c.src ELSE c.dst END AS u,
                 CASE WHEN (ds.d, c.src) < (dd.d, c.dst) THEN c.dst ELSE c.src END AS v
          FROM canon c
          JOIN deg ds ON ds.vid = c.src
          JOIN deg dd ON dd.vid = c.dst),
        tris AS (
          SELECT w1.u AS a, w1.v AS b, w2.v AS c
          FROM oriented w1 JOIN oriented w2 ON w1.u = w2.u AND w1.v <> w2.v
          JOIN oriented e ON e.u = w1.v AND e.v = w2.v),
        per_v AS (
          SELECT vid, COUNT(*) AS tri FROM (
            SELECT a AS vid FROM tris UNION ALL
            SELECT b FROM tris UNION ALL SELECT c FROM tris)
          GROUP BY vid),
        verts AS (SELECT DISTINCT src AS vid FROM both_dir)
        SELECT verts.vid, COALESCE(per_v.tri, 0) AS tri
        FROM verts LEFT JOIN per_v ON verts.vid = per_v.vid""",
)
def k6(spark, sf):
    return triangle_counts(part_cooccurrence_edges(spark, sf))


@g(
    "k4_connected_components",
    f"""WITH RECURSIVE
        edges AS (SELECT src, dst FROM ({_CS_EDGES_SQL}) WHERE src < 500),
        sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
        verts AS (SELECT DISTINCT src AS vid FROM sym),
        reach(v, u) AS (
          SELECT vid, vid FROM verts
          UNION
          SELECT r.v, e.dst FROM reach r JOIN sym e ON e.src = r.u)
        SELECT v AS vid, MIN(u) AS component FROM reach GROUP BY v""",
)
def k4(spark, sf):
    e = cust_supp_edges(spark, sf).filter(F.col("src") < 500)
    return connected_components(e).select("vid", "component")


@g("k3_pagerank_top20", None)  # iterative; exactness covered by numpy oracle in pytest
def k3(spark, sf):
    e = cust_supp_edges(spark, sf)
    sym = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    pr = pagerank(sym, tol=1e-8)
    return (
        pr.select("vid", F.round("rank", 8).alias("rank"))
        .orderBy(F.desc("rank"), F.asc("vid"))
        .limit(20)
    )


@g("k5_lpa_community_sizes", None)  # iterative; exactness covered in pytest
# + sf0.01 golden value-hash pinned in tests/test_golden_hashes.py
def k5(spark, sf):
    e = cust_supp_edges(spark, sf)
    labels = label_propagation(e, max_iter=20)
    return (
        labels.groupBy("label")
        .agg(F.count("*").alias("size"))
        .orderBy(F.desc("size"), F.asc("label"))
        .limit(50)
    )


@g("k8_corpus_pipeline", None)  # corpus is synthesized, not an sf table
def k8(spark, sf):
    """Full K8 slice: synth corpus -> sha -> edges -> PageRank -> top files."""
    from pcd_spark.corpus import synth_corpus, derive_edges

    corpus = synth_corpus(spark, repos=20, files_per_repo=50, seed=42)
    verts, edges = derive_edges(corpus)
    pr = pagerank(edges, weight_col="weight", tol=1e-8)
    return (
        pr.join(verts, "vid")
        .select("repo", "path", F.round("rank", 8).alias("rank"))
        .orderBy(F.desc("rank"), F.asc("repo"), F.asc("path"))
        .limit(25)
    )


_LABELS_SQL = f"""
  SELECT c_custkey AS vid, c_nationkey AS community FROM customer
  UNION ALL
  SELECT {SUPPLIER_OFFSET} + s_suppkey AS vid, s_nationkey AS community
  FROM supplier
"""


@g(
    "k9_modularity",
    f"""WITH edges AS ({_CS_EDGES_SQL}),
        m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS m FROM edges),
        sym AS (SELECT src, dst FROM edges
                UNION ALL SELECT dst, src FROM edges),
        deg AS (SELECT src AS vid, COUNT(*) AS deg FROM sym GROUP BY src),
        lab AS ({_LABELS_SQL}),
        dc AS (SELECT l.community, CAST(SUM(d.deg) AS BIGINT) AS degree_sum
               FROM deg d JOIN lab l ON d.vid = l.vid GROUP BY l.community),
        lc AS (SELECT la.community, COUNT(*) AS intra_edges
               FROM edges e JOIN lab la ON e.src = la.vid
                            JOIN lab lb ON e.dst = lb.vid
               WHERE la.community = lb.community GROUP BY la.community)
        SELECT dc.community,
               COALESCE(lc.intra_edges, 0) AS intra_edges,
               dc.degree_sum,
               ROUND(COALESCE(lc.intra_edges, 0) / m.m
                     - POW(dc.degree_sum / (2 * m.m), 2), 8) AS q_c
        FROM dc LEFT JOIN lc ON dc.community = lc.community
        CROSS JOIN m""",
)
def k9(spark, sf):
    """K9: Newman modularity of the NATION partition over the
    customer-supplier graph — per-community contributions q_c; the scalar
    Q = sum(q_c) is what a community-detection run reports for its labels
    (LPA/CC output plugs into the same modularity_terms). Closed-form, so
    fully SQL-oracled, unlike the iterative k3/k5."""
    from pcd_spark.graph.quality import modularity_terms

    cust = load(spark, sf, "customer").select(
        F.col("c_custkey").alias("vid"), F.col("c_nationkey").alias("label")
    )
    supp = load(spark, sf, "supplier").select(
        (F.lit(SUPPLIER_OFFSET) + F.col("s_suppkey")).alias("vid"),
        F.col("s_nationkey").alias("label"),
    )
    labels = cust.unionByName(supp)
    return modularity_terms(cust_supp_edges(spark, sf), labels)


@g("k10_kcore", None)  # iterative peeling; exactness pinned vs networkx in pytest
# + sf0.01 golden value-hash pinned in tests/test_golden_hashes.py
def k10(spark, sf):
    """K10: 3-core of the part co-occurrence graph (the triangle-bearing
    one) — vertices surviving iterative degree-<3 peeling, with their
    within-core degree."""
    from pcd_spark.graph import k_core

    return k_core(part_cooccurrence_edges(spark, sf), k=3)


@g(
    "k12_bfs_distances",
    f"""WITH RECURSIVE
        edges AS (SELECT src, dst FROM ({_CS_EDGES_SQL}) WHERE src < 500),
        sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
        root AS (SELECT MIN(src) AS v FROM edges),
        -- UNION-distinct explores (vid, dist) pairs; the dist < 40 bound is
        -- what terminates cycles, and is far above this graph's diameter
        -- (the engine's own superstep count confirms convergence well
        -- before 40 at every sf)
        bfs(vid, dist) AS (
          SELECT v, 0 FROM root
          UNION
          SELECT e.dst, b.dist + 1 FROM bfs b JOIN sym e ON e.src = b.vid
          WHERE b.dist < 40)
        SELECT vid, CAST(MIN(dist) AS DOUBLE) AS dist
        FROM bfs GROUP BY vid""",
)
def k12(spark, sf):
    """K12: multi-superstep BFS hop distances on the bounded
    customer-supplier graph, from its minimum vertex id."""
    from pcd_spark.graph import shortest_paths

    e = cust_supp_edges(spark, sf).filter(F.col("src") < 500)
    root = e.agg(F.min("src").alias("m")).first()["m"]
    return shortest_paths(e, [int(root)])


@g(
    "k11_clustering_coefficient",
    f"""WITH canon AS ({_PART_EDGES_SQL}),
        both_dir AS (SELECT src, dst FROM canon
                     UNION ALL SELECT dst, src FROM canon),
        deg AS (SELECT src AS vid, COUNT(*) AS d FROM both_dir GROUP BY src),
        oriented AS (
          SELECT CASE WHEN (ds.d, c.src) < (dd.d, c.dst) THEN c.src ELSE c.dst END AS u,
                 CASE WHEN (ds.d, c.src) < (dd.d, c.dst) THEN c.dst ELSE c.src END AS v
          FROM canon c
          JOIN deg ds ON ds.vid = c.src
          JOIN deg dd ON dd.vid = c.dst),
        tris AS (
          SELECT w1.u AS a, w1.v AS b, w2.v AS c
          FROM oriented w1 JOIN oriented w2 ON w1.u = w2.u AND w1.v <> w2.v
          JOIN oriented e ON e.u = w1.v AND e.v = w2.v),
        per_v AS (
          SELECT vid, COUNT(*) AS tri FROM (
            SELECT a AS vid FROM tris UNION ALL
            SELECT b FROM tris UNION ALL SELECT c FROM tris)
          GROUP BY vid)
        SELECT deg.vid, COALESCE(per_v.tri, 0) AS tri, deg.d AS deg,
               ROUND(CASE WHEN deg.d >= 2
                          THEN 2.0 * COALESCE(per_v.tri, 0)
                               / (deg.d * (deg.d - 1))
                          ELSE 0 END, 8) AS lcc
        FROM deg LEFT JOIN per_v ON deg.vid = per_v.vid""",
)
def k11(spark, sf):
    """K11: Watts-Strogatz local clustering coefficient over the part
    co-occurrence graph — K6 triangles / K1 wedge counts per vertex."""
    from pcd_spark.graph import local_clustering

    return local_clustering(part_cooccurrence_edges(spark, sf))


@g("k14_ppr_top20", None)  # iterative; exactness pinned by the numpy oracle
def k14(spark, sf):
    """K14: personalized PageRank from a fixed seed set (customers 1-3) over
    the customer-supplier graph — "which suppliers matter to THESE
    customers", the standard seed-centric ranking next to K3's global one.
    Exactness vs pagerank_numpy(sources=...) in tests/test_graph_algos.py."""
    e = cust_supp_edges(spark, sf)
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    pr = pagerank(sym, tol=1e-8, sources=[1, 2, 3])
    return (
        pr.filter(F.col("rank") > 1e-12)
        .select("vid", F.round("rank", 8).alias("rank"))
        .orderBy(F.desc("rank"), F.asc("vid"))
        .limit(20)
    )


@g("k13_louvain_communities", None)  # iterative; structurally pinned in pytest
def k13(spark, sf):
    """K13: Louvain modularity-maximizing communities over the part
    co-occurrence graph (the one with real cluster structure); community
    sizes + per-community modularity contribution via K9's closed form, so
    the output reports both WHO clusters together and HOW GOOD the
    clustering is. Exactness is pinned structurally in tests/test_louvain.py
    (clique recovery, brute-force optimum, coarsening invariants)."""
    from pcd_spark.graph import louvain
    from pcd_spark.graph.quality import modularity_terms

    e = part_cooccurrence_edges(spark, sf)
    labels = louvain(e)
    terms = modularity_terms(e, labels)
    return (
        labels.groupBy("label")
        .agg(F.count("*").alias("size"))
        .join(terms.withColumnRenamed("community", "label"), "label")
        .select("label", "size", "intra_edges", "degree_sum", "q_c")
        .orderBy(F.desc("size"), F.asc("label"))
        .limit(50)
    )


@g("k15_hits", None)  # iterative power method; exactness pinned vs numpy oracle
def k15(spark, sf):
    """K15: HITS hubs & authorities over the directed customer->supplier
    graph — customers are pure hubs, suppliers pure authorities (bipartite),
    so the ranking answers "which suppliers aggregate the most well-connected
    customers". Exactness vs pcd_spark/oracle/hits_numpy.py in
    tests/test_graph_algos.py."""
    from pcd_spark.graph import hits

    h = hits(cust_supp_edges(spark, sf), tol=1e-8, max_iter=60)
    return (
        h.select(
            "vid",
            F.round("authority", 8).alias("authority"),
            F.round("hub", 8).alias("hub"),
        )
        .orderBy(F.desc("authority"), F.asc("vid"))
        .limit(50)
    )


@g(
    "k16_link_prediction",
    f"""WITH edges AS (SELECT src, dst FROM ({_CS_EDGES_SQL}) WHERE src < 300),
        sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
        deg AS (SELECT src AS vid, COUNT(*) AS deg FROM sym GROUP BY src),
        adj AS (SELECT s.src AS w, s.dst AS nbr, d.deg AS dw
                FROM sym s JOIN deg d ON d.vid = s.src),
        pairs AS (
          SELECT a.nbr AS u, b.nbr AS v, COUNT(*) AS common_neighbors,
                 SUM(1.0 / LN(a.dw)) AS aa
          FROM adj a JOIN adj b ON a.w = b.w AND a.nbr < b.nbr
          GROUP BY a.nbr, b.nbr),
        cand AS (SELECT p.* FROM pairs p
                 ANTI JOIN sym s ON s.src = p.u AND s.dst = p.v)
        SELECT u, v, common_neighbors,
               ROUND(1.0 * common_neighbors
                     / (du.deg + dv.deg - common_neighbors), 8) AS jaccard,
               ROUND(aa, 8) AS adamic_adar
        FROM cand JOIN deg du ON du.vid = u JOIN deg dv ON dv.vid = v""",
)
def k16(spark, sf):
    """K16: common-neighbor / Jaccard / Adamic-Adar link prediction on the
    bounded customer-supplier graph (same src < 300 slice as k4 — the wedge
    fan-out is quadratic in center degree, and the oracle must mirror the
    exact candidate set)."""
    from pcd_spark.graph import link_prediction

    e = cust_supp_edges(spark, sf).filter(F.col("src") < 300)
    return link_prediction(e)


@g(
    "k17_assortativity",
    f"""WITH edges AS ({_CS_EDGES_SQL}),
        sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
        deg AS (SELECT src AS vid, COUNT(*) AS deg FROM sym GROUP BY src)
        SELECT ROUND(CORR(1.0 * dx.deg, 1.0 * dy.deg), 8) AS r
        FROM sym s JOIN deg dx ON dx.vid = s.src
                   JOIN deg dy ON dy.vid = s.dst""",
)
def k17(spark, sf):
    """K17: Newman degree assortativity of the customer-supplier graph.
    Closed-form Pearson r over edge-endpoint degree pairs (each undirected
    edge in both directions); CORR's sample-vs-population normalization
    cancels in r, so the DuckDB aggregate is the exact oracle."""
    from pcd_spark.graph import degree_assortativity

    return degree_assortativity(cust_supp_edges(spark, sf), round_to=8)


@g("k18_random_walks", None)  # hash-random rule; DuckDB has no xxhash64
# + sf0.01 golden value-hash pinned in tests/test_golden_hashes.py
def k18(spark, sf):
    """K18: deterministic DeepWalk corpus over the bounded customer-supplier
    graph (same src < 300 slice as k4). No SQL oracle — the next-hop rule is
    argmin xxhash64(...), which DuckDB cannot evaluate; exactness is pinned
    in tests/test_graph_algos.py against a simulation driven by hash values
    extracted from Spark itself, plus structure/determinism properties."""
    from pcd_spark.graph import random_walks

    e = cust_supp_edges(spark, sf).filter(F.col("src") < 300)
    return random_walks(e, walk_length=4, walks_per_vertex=1, seed=7)


_EMB_STAR_SQL = """
  emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
  b AS (SELECT vec_id, emb,
               (CASE WHEN emb[1] >= 0 THEN 8 ELSE 0 END
              + CASE WHEN emb[2] >= 0 THEN 4 ELSE 0 END
              + CASE WHEN emb[3] >= 0 THEN 2 ELSE 0 END
              + CASE WHEN emb[4] >= 0 THEN 1 ELSE 0 END) AS bucket
        FROM emb),
  bmin AS (SELECT bucket, MIN(vec_id) AS src FROM b GROUP BY bucket),
  star AS (SELECT m.src, b.vec_id AS dst FROM b JOIN bmin m USING (bucket)
           WHERE m.src <> b.vec_id)
"""


@g(
    "k19_neighbor_features",
    f"""WITH {_EMB_STAR_SQL},
        sym AS (SELECT src, dst FROM star UNION SELECT dst, src FROM star),
        x AS (SELECT s.dst AS vid, u.pos, u.val
              FROM sym s JOIN emb e ON e.vec_id = s.src,
                   UNNEST(list_transform(generate_series(1, len(e.emb)),
                          i -> struct_pack(pos := i - 1, val := e.emb[i])))
                   AS t(u)),
        per_dim AS (SELECT vid, pos, ROUND(AVG(val), 8) AS v,
                           COUNT(*) AS c
                    FROM x GROUP BY vid, pos)
        SELECT vid, MAX(c) AS n_neighbors,
               ARRAY_TO_STRING(
                 LIST_TRANSFORM(LIST(v ORDER BY pos),
                                u -> CAST(ROUND(u * 1000000) AS BIGINT)),
                 ',') AS agg_emb
        FROM per_dim GROUP BY vid""",
)
def k19(spark, sf):
    """K19: one GraphSAGE-style layer — per-vertex mean of neighbor
    embeddings over the sign-LSH star graph (v2's bucketing turned into
    bucket-min star edges, the x10 pattern). The full pipeline a training
    job runs: build a similarity graph from embeddings, then aggregate
    neighbor features along it."""
    from pcd_spark.graph.features import neighbor_feature_agg

    e = load(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    bucket = (
        F.when(F.col("emb")[0] >= 0, 8).otherwise(0)
        + F.when(F.col("emb")[1] >= 0, 4).otherwise(0)
        + F.when(F.col("emb")[2] >= 0, 2).otherwise(0)
        + F.when(F.col("emb")[3] >= 0, 1).otherwise(0)
    )
    b = e.select("vec_id", "emb", bucket.alias("bucket"))
    bmin = b.groupBy("bucket").agg(F.min("vec_id").alias("src"))
    star = (
        b.join(bmin, "bucket")
        .filter(F.col("src") != F.col("vec_id"))
        .select("src", F.col("vec_id").alias("dst"))
    )
    agg = neighbor_feature_agg(
        star, e, id_col="vec_id", vec_col="emb", agg="mean", round_to=8
    )
    # Driver-canonicalizer hazard: array<double> cells are unhashable in the
    # harness's pandas sort (the round-1 d8 failure mode). Scalarize to exact
    # integer micro-units joined as a string — lossless at the 8-dp rounding
    # already applied, and engine-portable (no float-to-string formatting).
    return agg.withColumn(
        "agg_emb",
        F.concat_ws(
            ",",
            F.transform(
                "agg_emb",
                lambda v: F.round(v * 1e6).cast("long").cast("string"),
            ),
        ),
    )


_DIRECTED_FLOW_SQL = f"""
  SELECT DISTINCT o_custkey AS src, {SUPPLIER_OFFSET} + l_suppkey AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_custkey < 150
  UNION
  SELECT DISTINCT {SUPPLIER_OFFSET} + l_suppkey AS src, o_custkey AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_custkey < 150 AND l_returnflag = 'R'
"""


def directed_flow_edges(spark, sf):
    """Bounded directed graph WITH cycles: customer -> supplier for every
    order line; supplier -> customer where the line was returned ('R') —
    so a customer and a supplier linked by both an order and a return form
    a 2-cycle, and chains of them form larger SCCs."""
    li, o = load(spark, sf, "lineitem"), load(spark, sf, "orders")
    j = li.join(o, li.l_orderkey == o.o_orderkey).filter(F.col("o_custkey") < 150)
    fwd = j.select(
        F.col("o_custkey").alias("src"),
        (F.lit(SUPPLIER_OFFSET) + F.col("l_suppkey")).alias("dst"),
    )
    back = j.filter(F.col("l_returnflag") == "R").select(
        (F.lit(SUPPLIER_OFFSET) + F.col("l_suppkey")).alias("src"),
        F.col("o_custkey").alias("dst"),
    )
    return fwd.unionByName(back).distinct()


@g(
    "k20_scc",
    f"""WITH RECURSIVE
        edges AS ({_DIRECTED_FLOW_SQL}),
        verts AS (SELECT src AS vid FROM edges
                  UNION SELECT dst FROM edges),
        reach(v, u) AS (
          SELECT vid, vid FROM verts
          UNION
          SELECT r.v, e.dst FROM reach r JOIN edges e ON e.src = r.u)
        SELECT r1.v AS vid, MIN(r1.u) AS component
        FROM reach r1 JOIN reach r2 ON r1.v = r2.u AND r1.u = r2.v
        GROUP BY r1.v""",
)
def k20(spark, sf):
    """K20: strongly connected components of the directed order/return flow
    graph — SCC = a set of customers+suppliers locked in a cycle of orders
    and returns (on a code-dependency graph: the cyclic import groups).
    Oracle: recursive-CTE transitive closure; component = MIN u with
    reach(v,u) AND reach(u,v) — exactly mutual reachability."""
    from pcd_spark.graph import strongly_connected_components

    return strongly_connected_components(directed_flow_edges(spark, sf))


@g("k21_hyperball", None)  # HLL estimates are engine-specific; pytest pins
def k21(spark, sf):
    """K21: HyperBall approximate ball sizes |B(v, diameter)| on the bounded
    customer-supplier graph (same subgraph as K12's BFS). The per-vertex
    estimate at convergence approximates the vertex's connected-component
    size; rounding keeps the rows-only driver check deterministic (fixed
    xxhash64 salt -> bit-identical registers every run). Exactness (NF
    relative error vs exact BFS, convergence at diameter+1) is pinned in
    tests/test_graph_algos.py."""
    from pcd_spark.graph import hyperball

    e = cust_supp_edges(spark, sf).filter(F.col("src") < 500)
    return hyperball(e, m=64).select(
        "vid", F.round("ball_est", 4).alias("ball_est")
    )


@g("k22_harmonic_centrality", None)  # HLL estimates; nx-pinned in pytest
def k22(spark, sf):
    """K22: HyperBall harmonic centrality top-20 on the bounded
    customer-supplier graph — the practical web-scale centrality (Boldi &
    Vigna 2014): betweenness needs all-pairs paths, harmonic needs only the
    per-superstep ball-size deltas K21 already computes. Deterministic
    (fixed hash salt) -> stable rows-only driver check; exactness vs
    nx.harmonic_centrality is pinned in tests/test_graph_algos.py."""
    from pcd_spark.graph import harmonic_centrality

    e = cust_supp_edges(spark, sf).filter(F.col("src") < 500)
    return (
        harmonic_centrality(e, m=64)
        .select("vid", F.round("harmonic", 4).alias("harmonic"))
        .orderBy(F.desc("harmonic"), F.asc("vid"))
        .limit(20)
    )


@g("k23_betweenness", None)  # iterative 2-phase Brandes; nx-pinned in pytest
def k23(spark, sf):
    """K23: sampled-source Brandes betweenness on the bounded
    customer-supplier graph — 8 deterministically hash-sampled sources
    (Brandes-Pich estimator; raw pair-dependency sums, scale by V/S for
    the full-graph estimate). Exactness of the partial sums is pinned
    against networkx / a pure-python Brandes accumulator in
    tests/test_graph_algos.py; sampling is xxhash64-ordered so the
    rows-only driver check is stable."""
    from pcd_spark.graph import betweenness_centrality

    e = cust_supp_edges(spark, sf).filter(F.col("src") < 300)
    return (
        betweenness_centrality(e, n_samples=8)
        .select("vid", F.round("betweenness", 6).alias("betweenness"))
        .filter(F.col("betweenness") > 0)
        .orderBy(F.desc("betweenness"), F.asc("vid"))
        .limit(50)
    )


@g("k24_ktruss", None)  # iterative support peeling; nx-pinned in pytest
# + sf0.01 golden value-hash pinned in tests/test_golden_hashes.py
def k24(spark, sf):
    """K24: 4-truss of the bounded part co-occurrence graph — the cohesive
    cores where every co-purchase edge sits in >= 2 surviving triangles
    (one step stronger than K10's k-core). Both endpoints bounded to
    partkey < 2000 (the k16 discipline: each peel round re-enumerates
    wedges, so the QUERY pins a fixed-size subgraph to keep its cost flat
    across scale factors — unbounded truss at sf0.1 is ~10 full K6 passes;
    callers wanting the full graph use pcd_spark.graph.k_truss directly).
    Output: per-truss-edge support, densest edges first. Exactness vs
    networkx.k_truss is pinned in tests/test_graph_algos.py; peeling is
    order-independent so the rows-only driver check is deterministic."""
    from pcd_spark.graph import k_truss

    e = part_cooccurrence_edges(spark, sf).filter(
        (F.col("src") < 2000) & (F.col("dst") < 2000)
    )
    return (
        k_truss(e, k=4)
        .orderBy(F.desc("sup"), F.asc("src"), F.asc("dst"))
        .limit(100)
    )


@g("k25_eigenvector", None)  # iterative power method; nx-pinned in pytest
def k25(spark, sf):
    """K25: eigenvector centrality top-50 on the bounded part co-occurrence
    graph (non-bipartite — it has triangles — so the power method is
    well-posed; the bipartite customer-supplier graph belongs to K15 HITS
    instead, see graph/eigen.py). Deterministic uniform start; exactness vs
    networkx.eigenvector_centrality is pinned in tests/test_graph_algos.py."""
    from pcd_spark.graph import eigenvector_centrality

    e = part_cooccurrence_edges(spark, sf).filter(
        (F.col("src") < 2000) & (F.col("dst") < 2000)
    )
    return (
        eigenvector_centrality(e, tol=1e-9)
        .select("vid", F.round("centrality", 7).alias("centrality"))
        .orderBy(F.desc("centrality"), F.asc("vid"))
        .limit(50)
    )


_PROJ_PAIRS_SQL = f"""
  edges AS ({_CS_EDGES_SQL}),
  pairs AS (SELECT a.dst AS u, b.dst AS v, COUNT(*) AS weight
            FROM edges a JOIN edges b
              ON a.src = b.src AND a.dst < b.dst
            GROUP BY a.dst, b.dst)
"""


@g(
    "k26_bipartite_projection",
    f"""WITH {_PROJ_PAIRS_SQL}
        SELECT u, v, weight FROM pairs WHERE weight >= 2""",
)
def k26(spark, sf):
    """K26: weighted one-mode projection of the bipartite customer-supplier
    graph onto SUPPLIERS — edge (u, v, weight) for supplier pairs sharing
    >= 2 customers. Centers are the CUSTOMERS (the many-but-low-degree
    side), so the pair join fans out per customer basket, never per
    supplier hub — the choice that keeps sum_c deg(c)^2 linear-ish at
    10^12 corpus scale. This is how a bipartite corpus becomes a
    unipartite graph the K-suite runs on (co-purchase / co-citation)."""
    from pcd_spark.graph import bipartite_projection

    return bipartite_projection(cust_supp_edges(spark, sf), min_weight=2)


@g(
    "k28_butterflies",
    f"""WITH {_PROJ_PAIRS_SQL},
        per_pair AS (SELECT u, v,
                            CAST(weight * (weight - 1) / 2 AS BIGINT) AS bf
                     FROM pairs WHERE weight >= 2)
        SELECT vid, CAST(SUM(bf) AS BIGINT) AS butterflies FROM (
          SELECT u AS vid, bf FROM per_pair
          UNION ALL SELECT v AS vid, bf FROM per_pair)
        GROUP BY vid""",
)
def k28(spark, sf):
    """K28: per-supplier butterfly (2x2 biclique) counts on the bipartite
    customer-supplier graph — the bipartite analogue of K6's triangles
    (this graph provably has none) and the base motif of bipartite
    clustering. One arithmetic column + explode-agg over K26's projection
    weights: butterflies(v) = sum_u C(shared_customers(u, v), 2)."""
    from pcd_spark.graph import butterfly_counts

    return butterfly_counts(cust_supp_edges(spark, sf))


@g("k32_katz", None)  # iterative affine fixpoint; nx-pinned in pytest
def k32(spark, sf):
    """K32 (round 3): Katz centrality top-50 on the bounded part
    co-occurrence graph — the walk-counting centrality family member
    between K3's PageRank (stochastic) and K25's eigenvector (spectral):
    every walk into v counts, damped alpha^length, plus a constant beta
    everyone gets. Auto-alpha = 0.5/(max_degree+1) <= 0.5/lambda_max, so
    convergence holds at every scale factor (dense co-occurrence cliques
    push lambda_max past 100 here; the engine RAISES on non-convergence
    rather than returning a partial fixpoint). Exactness vs
    networkx.katz_centrality is pinned in tests/test_graph_algos.py."""
    from pcd_spark.graph import katz_centrality
    from pcd_spark.graph.edges import symmetrize

    e = part_cooccurrence_edges(spark, sf).filter(
        (F.col("src") < 2000) & (F.col("dst") < 2000)
    )
    return (
        katz_centrality(symmetrize(e), alpha=None, tol=1e-10)
        .select("vid", F.round("katz", 7).alias("katz"))
        .orderBy(F.desc("katz"), F.asc("vid"))
        .limit(50)
    )


@g("k27_coreness", None)  # iterative h-index fixpoint; nx-pinned in pytest
# + sf0.01 golden value-hash pinned in tests/test_golden_hashes.py
def k27(spark, sf):
    """K27: full core decomposition of the part co-occurrence graph — the
    core number of EVERY vertex in one run (K10 answers membership for a
    single k). Iterated neighborhood h-index [PUB: Lü et al. 2016], which
    provably converges to the exact peeling result with no removal order
    to coordinate; exactness vs networkx.core_number is pinned in
    tests/test_bipartite.py. Output ordered densest-core first."""
    from pcd_spark.graph import coreness

    return (
        coreness(part_cooccurrence_edges(spark, sf))
        .orderBy(F.desc("core"), F.asc("vid"))
    )


@g("k29_mis", None)  # iterative symmetry-breaking; property-pinned in pytest
# + sf0.01 golden value-hash pinned in tests/test_golden_hashes.py
def k29(spark, sf):
    """K29: deterministic Luby maximal independent set on the bounded part
    co-occurrence graph — the symmetry-breaking primitive (schedule sets of
    non-adjacent vertices). Hash-random priorities make it reproducible at
    any parallelism; independence + maximality + partition-invariance are
    property-pinned in tests/test_bipartite.py (rows-only driver check:
    the per-round priority is xxhash64, which DuckDB cannot evaluate)."""
    from pcd_spark.graph import maximal_independent_set

    e = part_cooccurrence_edges(spark, sf).filter(
        (F.col("src") < 2000) & (F.col("dst") < 2000)
    )
    return maximal_independent_set(e).orderBy("vid")


@g("k30_coloring", None)  # iterative JP schedule; property-pinned in pytest
# + sf0.01 golden value-hash pinned in tests/test_golden_hashes.py
def k30(spark, sf):
    """K30: deterministic Jones-Plassmann greedy coloring of the bounded
    part co-occurrence graph — proper coloring (no monochromatic edge),
    color(v) <= deg(v), reproducible at any parallelism via hash
    priorities. Property-pinned in tests/test_bipartite.py (rows-only
    driver check: the priority is xxhash64, not SQL-expressible)."""
    from pcd_spark.graph import greedy_coloring

    e = part_cooccurrence_edges(spark, sf).filter(
        (F.col("src") < 2000) & (F.col("dst") < 2000)
    )
    return greedy_coloring(e).orderBy("vid")


@g(
    "k31_conductance",
    f"""WITH edges AS ({_CS_EDGES_SQL}),
        lab AS ({_LABELS_SQL}),
        lb AS (SELECT la.community AS ca, lb2.community AS cb
               FROM edges e JOIN lab la ON e.src = la.vid
                            JOIN lab lb2 ON e.dst = lb2.vid),
        m AS (SELECT COUNT(*) AS m FROM lb),
        vol AS (SELECT community, COUNT(*) AS volume FROM (
                  SELECT ca AS community FROM lb
                  UNION ALL SELECT cb FROM lb)
                GROUP BY community),
        cut AS (SELECT community, COUNT(*) AS cut_edges FROM (
                  SELECT ca AS community FROM lb WHERE ca <> cb
                  UNION ALL SELECT cb FROM lb WHERE ca <> cb)
                GROUP BY community)
        SELECT v.community, COALESCE(c.cut_edges, 0) AS cut_edges, v.volume,
               ROUND(CASE WHEN LEAST(v.volume, 2 * m.m - v.volume) > 0
                     THEN COALESCE(c.cut_edges, 0) * 1.0
                          / LEAST(v.volume, 2 * m.m - v.volume)
                     ELSE 0.0 END, 8) AS phi
        FROM vol v LEFT JOIN cut c ON v.community = c.community
        CROSS JOIN m""",
)
def k31(spark, sf):
    """K31: per-community conductance of the NATION partition over the
    customer-supplier graph — the boundary-leak complement to k9's
    modularity (same labels, same inner-join semantics), closed-form and
    fully SQL-oracled. phi(S) = cut(S) / min(vol(S), 2m - vol(S))."""
    from pcd_spark.graph import conductance_terms

    cust = load(spark, sf, "customer").select(
        F.col("c_custkey").alias("vid"), F.col("c_nationkey").alias("label")
    )
    supp = load(spark, sf, "supplier").select(
        (F.lit(SUPPLIER_OFFSET) + F.col("s_suppkey")).alias("vid"),
        F.col("s_nationkey").alias("label"),
    )
    labels = cust.unionByName(supp)
    return conductance_terms(cust_supp_edges(spark, sf), labels)


# K33: condensation levels run on a THINNED directed flow graph (back
# edges only for high-quantity returns) — the full flow graph at sf0.01
# collapses into one giant SCC, a 2-node condensation that would exercise
# nothing. Thinning keeps a mix: one large SCC, many singletons, 3 levels.
_THIN_FLOW_SQL = f"""
  SELECT DISTINCT o_custkey AS src, {SUPPLIER_OFFSET} + l_suppkey AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_custkey < 150
  UNION
  SELECT DISTINCT {SUPPLIER_OFFSET} + l_suppkey AS src, o_custkey AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_custkey < 150 AND l_returnflag = 'R' AND l_quantity > 47
"""


def thin_flow_edges(spark, sf):
    li, o = load(spark, sf, "lineitem"), load(spark, sf, "orders")
    j = li.join(o, li.l_orderkey == o.o_orderkey).filter(
        F.col("o_custkey") < 150
    )
    fwd = j.select(
        F.col("o_custkey").alias("src"),
        (F.lit(SUPPLIER_OFFSET) + F.col("l_suppkey")).alias("dst"),
    )
    back = j.filter(
        (F.col("l_returnflag") == "R") & (F.col("l_quantity") > 47)
    ).select(
        (F.lit(SUPPLIER_OFFSET) + F.col("l_suppkey")).alias("src"),
        F.col("o_custkey").alias("dst"),
    )
    return fwd.unionByName(back).distinct()


@g(
    "k33_condensation_levels",
    f"""WITH RECURSIVE
        edges AS ({_THIN_FLOW_SQL}),
        verts AS (SELECT src AS vid FROM edges
                  UNION SELECT dst FROM edges),
        reach(v, u) AS (
          SELECT vid, vid FROM verts
          UNION
          SELECT r.v, e.dst FROM reach r JOIN edges e ON e.src = r.u),
        scc AS (
          SELECT r1.v AS vid, MIN(r1.u) AS component
          FROM reach r1 JOIN reach r2 ON r1.v = r2.u AND r1.u = r2.v
          GROUP BY r1.v),
        cedges AS (
          SELECT DISTINCT s1.component AS csrc, s2.component AS cdst
          FROM edges e JOIN scc s1 ON s1.vid = e.src
                       JOIN scc s2 ON s2.vid = e.dst
          WHERE s1.component <> s2.component),
        paths(c, d) AS (
          SELECT component, 0 FROM (SELECT DISTINCT component FROM scc)
          UNION ALL
          SELECT ce.cdst, p.d + 1 FROM paths p JOIN cedges ce ON ce.csrc = p.c),
        lvl AS (SELECT c AS component, MAX(d) AS level FROM paths GROUP BY c)
        SELECT s.vid, s.component, CAST(l.level AS INT) AS level
        FROM scc s JOIN lvl l ON l.component = s.component""",
)
def k33(spark, sf):
    """K33: SCC condensation + topological levels of the thinned order/
    return flow graph — on a code-dependency graph this is the parallel
    build schedule: each cyclic import group (SCC) is one node, its level
    is the earliest build wave that can run it. Oracle: k20's mutual-
    reachability CTE for the SCCs, then a second recursive CTE walking the
    condensation for longest-path depth (terminates because the
    condensation is a DAG)."""
    from pcd_spark.graph import topological_levels

    return topological_levels(thin_flow_edges(spark, sf))


@g(
    "k34_two_hop_reach",
    f"""WITH canon AS ({_PART_EDGES_SQL}),
        sym AS (SELECT src, dst FROM canon
                UNION ALL SELECT dst AS src, src AS dst FROM canon),
        cand AS (SELECT DISTINCT a.src AS vid, b.dst AS nbr2
                 FROM sym a JOIN sym b ON a.dst = b.src
                 WHERE a.src % 20 = 0 AND b.dst <> a.src),
        fof AS (SELECT c.vid, c.nbr2 FROM cand c
                WHERE NOT EXISTS (SELECT 1 FROM sym s
                                  WHERE s.src = c.vid AND s.dst = c.nbr2))
        SELECT vid, COUNT(*) AS n_two_hop FROM fof GROUP BY vid""",
)
def k34(spark, sf):
    """K34: strict two-hop reach of a probe cohort — for each probe
    vertex, how many DISTINCT vertices are exactly two hops away
    (reachable via a neighbor, not a neighbor themselves, not self). On a
    dependency graph this is the blast radius one level out for the
    modules under review; on a social graph the friend-of-friend
    candidate pool (the recall set link prediction k16 then scores). The
    probe set is a deterministic 1-in-20 vid cohort (`vid % 20 = 0`) —
    the same bounded-query-set discipline as k12's multi-source BFS and
    k23's sampled Brandes, because all-pairs 2-hop is Σdeg² intermediates
    and the co-occurrence hubs make that the whole suite's bill (measured
    127 s at sf0.1 for exact-all-vertices vs ~5 s probe-bounded; an
    all-vertex run is just probes = full vid set).

    Spark shape: probe filter FIRST (scan-side, prunes the wedge fan-out
    by 20×), then one self equi-join on the shared endpoint, a distinct
    to collapse multi-path pairs, and a left-anti equi-join to subtract
    direct edges. All joins are equi-keyed, so at 100 TB AQE's skew split
    handles hub mid-vertices; the k19-style degree-cap prefilter is the
    documented mitigation when hub fan-out itself binds.
    """
    e = part_cooccurrence_edges(spark, sf)
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)  # reused: wedge join x2 + anti join
    a = sym.filter(F.col("src") % 20 == 0).select(
        F.col("src").alias("vid"), F.col("dst").alias("mid")
    )
    b = sym.select(F.col("src").alias("mid"), F.col("dst").alias("nbr2"))
    cand = (
        a.join(b, "mid")
        .filter(F.col("nbr2") != F.col("vid"))
        .select("vid", "nbr2")
        .distinct()
    )
    fof = cand.join(
        sym.select(F.col("src").alias("vid"), F.col("dst").alias("nbr2")),
        ["vid", "nbr2"],
        "left_anti",
    )
    return fof.groupBy("vid").agg(F.count("*").alias("n_two_hop"))


@g(
    "k35_transitivity",
    f"""WITH canon AS ({_PART_EDGES_SQL}),
        both_dir AS (SELECT src, dst FROM canon
                     UNION ALL SELECT dst, src FROM canon),
        deg AS (SELECT src AS vid, COUNT(*) AS d FROM both_dir GROUP BY src),
        oriented AS (
          SELECT CASE WHEN (ds.d, c.src) < (dd.d, c.dst) THEN c.src ELSE c.dst END AS u,
                 CASE WHEN (ds.d, c.src) < (dd.d, c.dst) THEN c.dst ELSE c.src END AS v
          FROM canon c
          JOIN deg ds ON ds.vid = c.src
          JOIN deg dd ON dd.vid = c.dst),
        tris AS (
          SELECT w1.u AS a, w1.v AS b, w2.v AS c
          FROM oriented w1 JOIN oriented w2 ON w1.u = w2.u AND w1.v <> w2.v
          JOIN oriented e ON e.u = w1.v AND e.v = w2.v),
        per_v AS (
          SELECT vid, COUNT(*) AS tri FROM (
            SELECT a AS vid FROM tris UNION ALL
            SELECT b FROM tris UNION ALL SELECT c FROM tris)
          GROUP BY vid),
        full_t AS (
          SELECT d.vid, COALESCE(per_v.tri, 0) AS tri,
                 CAST(d.d * (d.d - 1) / 2 AS BIGINT) AS wedges
          FROM deg d LEFT JOIN per_v ON per_v.vid = d.vid)
        SELECT CAST(SUM(tri) / 3 AS BIGINT) AS n_triangles,
               CAST(SUM(wedges) AS BIGINT) AS n_wedges,
               ROUND(1.0 * SUM(tri) / SUM(wedges), 6) AS transitivity
        FROM full_t""",
)
def k35(spark, sf):
    """K35: global transitivity = 3·triangles / wedges — THE one-number
    clustering summary (Watts-Strogatz's global counterpart to K11's local
    coefficients) every graph-health dashboard reports; Σ_v tri(v) = 3T and
    wedges = Σ_v C(deg(v), 2), so both numerators come from per-vertex
    tables the engine already produces.

    Spark shape: K6's degree-oriented triangle pipeline (wedge fan-out
    bounded by oriented out-degree = O(sqrt m)) + one vid equi-join of the
    per-vertex tri and degree tables + ONE global hash agg — no cartesian,
    no scalar collect. Per-row wedge counts are computed in integer space
    (d·(d−1) is even, exact) so the oracle sum is bit-identical."""
    canon = part_cooccurrence_edges(spark, sf)
    tri = triangle_counts(canon)  # vid, tri — sums to exactly 3T
    sym = canon.unionByName(
        canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy(F.col("src").alias("vid")).agg(F.count("*").alias("d"))
    per_v = tri.join(deg, "vid").select(
        "tri",
        (F.col("d") * (F.col("d") - 1) / 2).cast("long").alias("wedges"),
    )
    return per_v.agg(
        (F.sum("tri") / 3).cast("long").alias("n_triangles"),
        F.sum("wedges").alias("n_wedges"),
        F.round(F.sum("tri") / F.sum("wedges"), 6).alias("transitivity"),
    )


_PRECEDENCE_EDGES_SQL = """
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey
   AND a.l_linenumber < b.l_linenumber
   AND a.l_partkey <> b.l_partkey
"""


def part_precedence_edges(spark, sf):
    """DIRECTED part graph: edge u→v when u appears on an earlier line than
    v within the same order (distinct across orders). Unlike the canonical
    co-occurrence graph this has genuine partial reciprocity — (u,v) and
    (v,u) both exist exactly when two orders list the pair in opposite line
    order — which is what K36 measures."""
    li = load(spark, sf, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey"
    )
    a = li.select(
        F.col("l_orderkey").alias("k"),
        F.col("l_linenumber").alias("ln_a"),
        F.col("l_partkey").alias("src"),
    )
    b = li.select(
        F.col("l_orderkey").alias("k"),
        F.col("l_linenumber").alias("ln_b"),
        F.col("l_partkey").alias("dst"),
    )
    return (
        a.join(b, "k")
        .filter((F.col("ln_a") < F.col("ln_b")) & (F.col("src") != F.col("dst")))
        .select("src", "dst")
        .distinct()
    )


@g(
    "k36_reciprocity",
    f"""WITH e AS ({_PRECEDENCE_EDGES_SQL}),
        pairs AS (
          SELECT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi,
                 MAX(CASE WHEN src < dst THEN 1 ELSE 0 END) AS fwd,
                 MAX(CASE WHEN src > dst THEN 1 ELSE 0 END) AS rev
          FROM e GROUP BY LEAST(src, dst), GREATEST(src, dst))
        SELECT CAST(SUM(fwd) + SUM(rev) AS BIGINT) AS n_edges,
               CAST(SUM(CASE WHEN fwd = 1 AND rev = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_mutual_pairs,
               ROUND(2.0 * SUM(CASE WHEN fwd = 1 AND rev = 1 THEN 1 ELSE 0 END)
                     / (SUM(fwd) + SUM(rev)), 6) AS reciprocity
        FROM pairs""",
)
def k36(spark, sf):
    """K36 (round 3): edge reciprocity r = |mutual directed edges| / |E| —
    the first-look directionality statistic of any web/link graph (the web
    is ~25% reciprocal, social follower graphs much higher; Newman 2003).
    Runs on the directed part-precedence graph so both directions genuinely
    occur.

    Spark shape: NO self-join of the edge table — each directed edge maps
    to its canonical unordered pair plus a direction bit, ONE hash groupBy
    on (lo, hi) marks which directions exist, ONE global agg folds the
    counts. One shuffle keyed by the pair, map-side combined; at 10^12
    edges this is strictly cheaper than the textbook e ⋈ e^T formulation,
    which shuffles the edge table twice and materializes the intersection."""
    e = part_precedence_edges(spark, sf)
    pairs = (
        e.select(
            F.least("src", "dst").alias("lo"),
            F.greatest("src", "dst").alias("hi"),
            (F.col("src") < F.col("dst")).cast("int").alias("is_fwd"),
        )
        .groupBy("lo", "hi")
        .agg(
            F.max("is_fwd").alias("fwd"),
            F.max(1 - F.col("is_fwd")).alias("rev"),
        )
    )
    mutual = ((F.col("fwd") == 1) & (F.col("rev") == 1)).cast("int")
    return pairs.agg(
        (F.sum("fwd") + F.sum("rev")).cast("long").alias("n_edges"),
        F.sum(mutual).cast("long").alias("n_mutual_pairs"),
        F.round(2.0 * F.sum(mutual) / (F.sum("fwd") + F.sum("rev")), 6).alias(
            "reciprocity"
        ),
    )


_K37_KMIN = 4  # tail cutoff for the power-law MLE (deg >= kmin)


@g(
    "k37_degree_distribution",
    f"""WITH edges AS ({_CS_EDGES_SQL}),
        sym AS (SELECT src, dst FROM edges
                UNION ALL SELECT dst AS src, src AS dst FROM edges),
        deg AS (SELECT src AS vid, COUNT(*) AS deg FROM sym GROUP BY src),
        hist AS (
          SELECT CAST(FLOOR(LOG2(deg)) AS BIGINT) AS bin,
                 COUNT(*) AS n_vertices,
                 MIN(deg) AS min_deg, MAX(deg) AS max_deg
          FROM deg GROUP BY 1),
        tail AS (
          SELECT COUNT(*) AS n_tail,
                 SUM(LN(deg / ({_K37_KMIN} - 0.5))) AS sum_ln
          FROM deg WHERE deg >= {_K37_KMIN})
        SELECT h.bin, h.n_vertices, h.min_deg, h.max_deg,
               ROUND(1.0 + t.n_tail / t.sum_ln, 6) AS alpha_tail
        FROM hist h CROSS JOIN tail t""",
)
def k37(spark, sf):
    """K37 (round 3): log2-binned degree histogram + continuous power-law
    tail exponent (Clauset–Shalizi–Newman 2009 MLE with the ½-offset
    discrete correction, fixed kmin) on the symmetrized customer–supplier
    graph — the canonical first diagnostic of a web-scale graph (is the
    degree distribution heavy-tailed? where does the hub tail start?),
    and the input to every skew-handling decision (C10 salting threshold,
    AQE skew-join hints).

    Spark shape: degrees are ONE hash agg (K1); the histogram is a second
    O(V)-input hash agg on ~60 bins; the MLE is a 1-row global agg whose
    scalar is collected (O(1) driver data) and attached as a literal — no
    sort, no window, no join. alpha is rounded to 6 dp so libm
    summation-order skew (~1e-12 relative at 10^7 vertices) can never flip
    the cross-engine hash."""
    e = cust_supp_edges(spark, sf)
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy(F.col("src").alias("vid")).agg(F.count("*").alias("deg"))
    hist = deg.groupBy(
        F.floor(F.log2("deg")).cast("long").alias("bin")
    ).agg(
        F.count("*").alias("n_vertices"),
        F.min("deg").alias("min_deg"),
        F.max("deg").alias("max_deg"),
    )
    # the MLE is ONE scalar row — collect it (O(1) driver data, the k-means
    # centroid discipline) and attach as a literal; joining it back would
    # plan a BroadcastNestedLoopJoin (Catalyst constant-folds any literal
    # join key), carving an exception into the sweep's no-BNLJ invariant
    t = (
        deg.filter(F.col("deg") >= _K37_KMIN)
        .agg(
            F.count("*").alias("n_tail"),
            F.sum(F.log(F.col("deg") / (_K37_KMIN - 0.5))).alias("sum_ln"),
        )
        .first()
    )
    return hist.select(
        "bin",
        "n_vertices",
        "min_deg",
        "max_deg",
        F.round(F.lit(1.0 + t["n_tail"] / t["sum_ln"]), 6).alias("alpha_tail"),
    )


@g(
    "k38_scan_similarity",
    f"""WITH canon AS ({_PART_EDGES_SQL}),
        both_dir AS (SELECT src, dst FROM canon
                     UNION ALL SELECT dst AS src, src AS dst FROM canon),
        deg AS (SELECT src AS vid, COUNT(*) AS deg FROM both_dir GROUP BY src),
        common AS (
          SELECT c.src, c.dst, COUNT(*) AS n_common
          FROM canon c
          JOIN both_dir a ON a.src = c.src
          JOIN both_dir b ON b.src = c.dst AND b.dst = a.dst
          GROUP BY c.src, c.dst)
        SELECT c.src, c.dst,
               COALESCE(m.n_common, 0) AS n_common,
               ROUND((COALESCE(m.n_common, 0) + 2)
                     / SQRT((ds.deg + 1.0) * (dd.deg + 1.0)), 6) AS sigma
        FROM canon c
        LEFT JOIN common m ON m.src = c.src AND m.dst = c.dst
        JOIN deg ds ON ds.vid = c.src
        JOIN deg dd ON dd.vid = c.dst""",
)
def k38(spark, sf):
    """K38 (round 3): SCAN structural similarity per edge (Xu et al., KDD
    2007) on the part co-occurrence graph — the edge weight SCAN-family
    community detection thresholds, reduced to K24's degree-oriented
    per-edge triangle support joined to K1 degrees (see
    pcd_spark.graph.quality.scan_similarity for the shape argument)."""
    from pcd_spark.graph.quality import scan_similarity

    return scan_similarity(part_cooccurrence_edges(spark, sf))


@g(
    "k39_triad_motifs",
    f"""WITH e AS ({_PRECEDENCE_EDGES_SQL}),
        cyc AS (
          SELECT COUNT(*) AS n_cyclic
          FROM e e1 JOIN e e2 ON e2.src = e1.dst
                    JOIN e e3 ON e3.src = e2.dst AND e3.dst = e1.src
          WHERE e1.src < e1.dst AND e1.src < e2.dst),
        tr AS (
          SELECT COUNT(*) AS n_transitive
          FROM e e1 JOIN e e2 ON e2.src = e1.dst AND e2.dst <> e1.src
                    JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst)
        SELECT c.n_cyclic, t.n_transitive,
               ROUND(CAST(t.n_transitive AS DOUBLE)
                     / (c.n_cyclic + t.n_transitive), 6) AS frac_transitive
        FROM cyc c CROSS JOIN tr t""",
)
def k39(spark, sf):
    """K39 (round 3): directed triangle motif census — cyclic (u→v→w→u)
    vs transitive (u→v→w plus the shortcut u→w) triangle counts and the
    transitive fraction, the smallest-motif signature that separates
    hierarchy-like graphs (dependency/citation DAG-ish: almost all
    transitive) from flow-like graphs [PUB: Milo et al., "Network motifs",
    Science 2002; Holland & Leinhardt's triad census restricted to the two
    3-edge triangle classes]. Runs on the directed part-precedence graph
    (K36's), whose mix of one-way and mutual pairs exercises both classes.

    Spark shape: two chained equi-joins over the directed edge table — a
    two-hop wedge (src-keyed) closed by one more equi-join — then ONE
    global agg; the same cost class as K6 with the closing join keyed on
    (src, dst). Cycles are canonicalized scan-side (e1.src smallest) so
    each cyclic triangle is counted once instead of once per rotation —
    cheaper than counting 3x and dividing, because the filter prunes 2/3
    of the wedge fan-out BEFORE the closing join. Transitive triads are
    counted once for free (their three roles are distinguishable). At
    10^12 edges the wedge join is the binding stage; the K6 degree-
    orientation refinement and AQE skew-split apply unchanged."""
    # persisted: the derived edge table (a lineitem self-join + DISTINCT)
    # is scanned by BOTH census jobs — cache one materialization, release
    # after the two O(1) scalars are on the driver
    e = part_precedence_edges(spark, sf).persist()
    e1 = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3c = e.select(F.col("src").alias("c"), F.col("dst").alias("a"))
    cyc = (
        e1.filter(F.col("a") < F.col("b"))
        .join(e2, "b")
        .filter(F.col("a") < F.col("c"))
        .join(e3c, ["c", "a"])
        .agg(F.count("*").alias("n_cyclic"))
    )
    e3t = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tr = (
        e1.join(e2, "b")
        .filter(F.col("c") != F.col("a"))
        .join(e3t, ["a", "c"])
        .agg(F.count("*").alias("n_transitive"))
    )
    nc, nt = cyc.first()["n_cyclic"], tr.first()["n_transitive"]
    e.unpersist()
    # two 1-row scalars (the k37 discipline): collected O(1) and emitted as
    # literals — a join of two single-row aggs would plan a BNLJ
    return spark.range(1).select(
        F.lit(nc).cast("long").alias("n_cyclic"),
        F.lit(nt).cast("long").alias("n_transitive"),
        F.round(F.lit(float(nt) / (nc + nt)), 6).alias("frac_transitive"),
    )


@g(
    "k40_partition_agreement",
    """WITH c AS (SELECT c_nationkey AS a, c_mktsegment AS b FROM customer),
        cont AS (SELECT a, b, COUNT(*) AS nij FROM c GROUP BY a, b),
        am AS (SELECT a, SUM(nij) AS ai FROM cont GROUP BY a),
        bm AS (SELECT b, SUM(nij) AS bj FROM cont GROUP BY b),
        tot AS (SELECT CAST(SUM(nij) AS DOUBLE) AS n FROM cont),
        sij AS (SELECT SUM(nij * (nij - 1) / 2.0) AS s FROM cont),
        sa AS (SELECT SUM(ai * (ai - 1) / 2.0) AS s FROM am),
        sb AS (SELECT SUM(bj * (bj - 1) / 2.0) AS s FROM bm),
        mi AS (SELECT SUM((nij / t.n) * LN(t.n * nij / (1.0 * ai * bj))) AS v
               FROM cont JOIN am USING (a) JOIN bm USING (b) CROSS JOIN tot t),
        ha AS (SELECT -SUM((ai / t.n) * LN(ai / t.n)) AS h
               FROM am CROSS JOIN tot t),
        hb AS (SELECT -SUM((bj / t.n) * LN(bj / t.n)) AS h
               FROM bm CROSS JOIN tot t)
        SELECT CAST(t.n AS BIGINT) AS n_items,
               ROUND((sij.s - sa.s * sb.s / (t.n * (t.n - 1) / 2.0))
                     / ((sa.s + sb.s) / 2.0
                        - sa.s * sb.s / (t.n * (t.n - 1) / 2.0)), 6) AS ari,
               ROUND(mi.v / SQRT(ha.h * hb.h), 6) AS nmi
        FROM tot t, sij, sa, sb, mi, ha, hb""",
)
def k40(spark, sf):
    """K40 (round 3): partition-agreement scores (adjusted Rand index +
    normalized mutual information) between two labelings of the same item
    set — THE evaluation operator of a community-detection engine (compare
    LPA vs Louvain, detected vs ground truth, run-over-run drift). Runs
    here on two independent customer partitions (nation vs market segment,
    agreement ~ 0 — chance level, which is exactly what ARI's adjustment
    is for); the same function scores graph labelings in pytest (LPA vs
    CC ground truth on caveman graphs). Full math + scale shape:
    pcd_spark.graph.quality.partition_agreement."""
    from pcd_spark.graph.quality import partition_agreement

    c = load(spark, sf, "customer").select(
        F.col("c_nationkey").alias("a"), F.col("c_mktsegment").alias("b")
    )
    return partition_agreement(c)


@g(
    "k41_rich_club",
    f"""WITH canon AS ({_PART_EDGES_SQL}),
        sym AS (SELECT src, dst FROM canon
                UNION ALL SELECT dst AS src, src AS dst FROM canon),
        deg AS (SELECT src AS vid, COUNT(*) AS deg FROM sym GROUP BY src),
        ed AS (SELECT LEAST(ds.deg, dd.deg) AS min_deg
               FROM canon JOIN deg ds ON ds.vid = canon.src
                          JOIN deg dd ON dd.vid = canon.dst),
        ks AS (SELECT UNNEST([48, 80, 112, 144]) AS k),
        ek AS (SELECT k, (SELECT COUNT(*) FROM ed WHERE min_deg > k) AS e_k
               FROM ks),
        nk AS (SELECT k, (SELECT COUNT(*) FROM deg WHERE deg > k) AS n_k
               FROM ks)
        SELECT ks.k, nk.n_k, ek.e_k,
               CASE WHEN nk.n_k >= 2
                    THEN ROUND(2.0 * ek.e_k / (nk.n_k * (nk.n_k - 1)), 6)
                    ELSE NULL END AS phi
        FROM ks JOIN ek USING (k) JOIN nk USING (k)""",
)
def k41(spark, sf):
    """K41 (round 3): rich-club coefficient phi(k) at degree thresholds
    {48,80,112,144} (chosen to straddle the co-occurrence graph's degree
    range, min ~40 / max ~220 across scale factors, so the four rows
    genuinely split; a threshold above max degree exercises the n_k < 2
    -> NULL path identically on both engines) on the part co-occurrence
    graph — do hubs preferentially
    interconnect? Full math + scale shape (one conditional-sum agg for ALL
    thresholds, no per-k jobs): pcd_spark.graph.quality.rich_club."""
    from pcd_spark.graph.quality import rich_club

    return rich_club(part_cooccurrence_edges(spark, sf), ks=(48, 80, 112, 144))


def weighted_pagerank_top20(spark, sf, tol: float = 1e-8):
    """K42 body with the convergence tolerance exposed. The registry pins
    tol=1e-8 (the golden-hashed research-grade fixpoint, ~117 supersteps on
    this bipartite graph — the damping-limited rate bound
    ln(1e-8)/ln(0.85) ≈ 113, inherent, not a plan defect); bench.py runs
    tol=1e-6 (~58 supersteps) as the documented production operating
    point so the per-superstep cost is visible in the driver artifact
    without paying the doubled iteration count every round."""
    li, o = load(spark, sf, "lineitem"), load(spark, sf, "orders")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            "o_orderkey",
            F.col("o_custkey").alias("src"),
            (F.lit(SUPPLIER_OFFSET) + F.col("l_suppkey")).alias("dst"),
        )
        .distinct()  # one vote per (order, customer, supplier) triple
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("weight"))
    )
    sym = pairs.unionByName(
        pairs.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
    )
    pr = pagerank(sym, tol=tol, weight_col="weight")
    return (
        pr.select("vid", F.round("rank", 8).alias("rank"))
        .orderBy(F.desc("rank"), F.asc("vid"))
        .limit(20)
    )


@g("k42_weighted_pagerank", None)  # iterative; numpy-weighted oracle + golden
def k42(spark, sf):
    """K42 (round 3): WEIGHTED PageRank top-20 — edge weight = number of
    orders linking the customer to the supplier (interaction multiplicity),
    so a customer's rank mass flows proportionally to relationship
    strength, not uniformly (K3). On a dependency graph the weight is
    import multiplicity — the form the north-star pipeline actually wants.

    Spark shape: identical superstep plan to K3 (the engine's weight_col
    just swaps two literals for column references — same joins, same ONE
    wide shuffle per superstep); the weighted edge table adds one hash agg
    (pair multiplicity) before symmetrization. Exactness: numpy weighted-
    PageRank oracle + sf0.01 golden value-hash in pytest."""
    return weighted_pagerank_top20(spark, sf, tol=1e-8)


@g("k43_edge_betweenness", None)  # iterative 2-phase Brandes; nx-pinned
def k43(spark, sf):
    """K43 (round 3): sampled-source EDGE betweenness on the bounded
    customer-supplier graph (k23's cohort) — the per-edge dependency sums
    Girvan-Newman community detection peels and the weak-tie/bridge signal
    of link analysis [PUB: Girvan & Newman 2002; Brandes 2008]. Same
    machinery as K23 (mode="edge"): the two BFS phases are shared, the
    edge scores fall out of the final state via two equi hash joins (the
    |S|xE cost class of one forward superstep). Exactness pinned vs
    nx.edge_betweenness_centrality in tests/test_round3_ops.py; the
    deterministic hash-sampled sources make the rows-only driver check
    stable, and the sf0.01 golden value-hash is pinned in
    tests/test_golden_hashes.py."""
    from pcd_spark.graph import betweenness_centrality

    e = cust_supp_edges(spark, sf).filter(F.col("src") < 300)
    return (
        betweenness_centrality(e, n_samples=8, mode="edge")
        .select("u", "v", F.round("betweenness", 6).alias("betweenness"))
        .filter(F.col("betweenness") > 0)
        .orderBy(F.desc("betweenness"), F.asc("u"), F.asc("v"))
        .limit(50)
    )


@g("k44_local_community", None)  # iterative PPR + bounded sweep; mirror-pinned
def k44(spark, sf):
    """K44 (round 3): local community detection around a seed — the
    PageRank-Nibble sweep [PUB: Andersen, Chung & Lang 2006]: personalized
    PageRank from the seed, candidates ordered by rank/degree, prefix with
    the minimum conductance returned. THE practical community query at
    10^12 edges (global Louvain is an offline batch; "the community around
    THIS repo" is an online seeded expansion). Seed = the lowest customer
    vid on the symmetrized customer-supplier graph. Exactness pinned
    against a pure-python PPR+sweep mirror and structure-recovery tests in
    tests/test_round3_ops.py; sf0.01 golden value-hash pinned. Full scale
    shape (what is distributed, what is deliberately bounded-driver-side):
    pcd_spark/graph/nibble.py."""
    from pcd_spark.graph import local_community

    e = cust_supp_edges(spark, sf)
    seed = e.agg(F.min("src")).first()[0]
    return (
        local_community(e, seed=int(seed), max_candidates=100)
        .select(
            "vid", "position", "in_community",
            F.round("ppr", 8).alias("ppr"),
            F.round("phi_prefix", 6).alias("phi_prefix"),
        )
        .orderBy("position")
    )


@g("k45_heavy_matching", None)  # iterative hash-priority fixpoint;
# property-pinned in pytest + sf0.01 golden value-hash
def k45(spark, sf):
    """K45: deterministic heavy-edge maximal matching on the bounded part
    co-occurrence graph, weighted by co-occurrence multiplicity — the
    METIS-style coarsening primitive (matched pairs contract into
    supervertices between multilevel passes) and a ½-approximation of
    maximum-weight matching [PUB: Preis 1999; Karypis & Kumar 1998].
    Matching/maximality/½-approx properties and the networkx comparison
    are pinned in tests/test_round3_ops.py (rows-only driver check: the
    tiebreak priority is xxhash64, which DuckDB cannot evaluate)."""
    from pcd_spark.graph import maximal_matching

    li = load(spark, sf, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("dst"))
    e = (
        a.join(b, "k")
        .filter(F.col("src") < F.col("dst"))
        .filter((F.col("src") < 2000) & (F.col("dst") < 2000))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("weight"))
    )
    return maximal_matching(e, weight_col="weight").orderBy("vid")


@g("k46_coarsen", None)  # matching-dependent contraction; property-pinned
# in pytest + sf0.01 golden value-hash
def k46(spark, sf):
    """K46: one multilevel coarsening step — contract K45's heavy-edge
    matching on the bounded weighted part co-occurrence graph into
    supervertices; parallel coarse edges merge with summed weight, the
    contracted matching edges vanish [PUB: Karypis & Kumar 1998 §3].
    Weight conservation (total coarse weight == total fine weight minus
    contracted-edge weight) and the ~halving of |V| are pinned in
    tests/test_round3_ops.py (rows-only driver check: depends on the
    xxhash64 matching)."""
    from pcd_spark.graph import coarsen_graph, maximal_matching

    li = load(spark, sf, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("dst"))
    e = (
        a.join(b, "k")
        .filter(F.col("src") < F.col("dst"))
        .filter((F.col("src") < 2000) & (F.col("dst") < 2000))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("weight"))
        .localCheckpoint(eager=True)  # reused: matching + contraction
    )
    m = maximal_matching(e, weight_col="weight")
    return coarsen_graph(e, m, weight_col="weight").orderBy("src", "dst")


@g("k47_densest_subgraph", None)  # data-dependent-threshold peeling;
# brute-force-pinned in pytest + sf0.01 golden value-hash
def k47(spark, sf):
    """K47: 2(1+ε)-approximate densest subgraph of the bounded part
    co-occurrence graph by greedy peeling [PUB: Bahmani, Kumar &
    Vassilvitskii, VLDB 2012; Charikar 2000] — the dense-cluster
    extraction primitive (spam/bot rings, community cores). Approximation
    bound pinned vs a brute-force exact densest subgraph and the planted-
    clique recovery case in tests/test_round3_ops.py (rows-only driver
    check: the peeling threshold is a data-dependent scalar per round,
    not expressible in one SQL pass)."""
    from pcd_spark.graph import densest_subgraph

    e = part_cooccurrence_edges(spark, sf).filter(
        (F.col("src") < 2000) & (F.col("dst") < 2000)
    )
    return densest_subgraph(e).orderBy("vid")


@g("k48_doulion_triangles", None)  # hash-coin sample: xxhash64 not in SQL;
# identity/error-band pinned in pytest + sf0.01 golden value-hash
def k48(spark, sf):
    """K48: DOULION approximate global triangle count on the part
    co-occurrence graph at p=1/4 [PUB: Tsourakakis et al. KDD 2009] —
    the 10^12-edge scale path where even K6's oriented-wedge join stops
    being affordable: the wedge set shrinks by p², the estimator
    T_sparse/p³ is unbiased, and the hash coin makes the estimate ONE
    reproducible number at any parallelism. K6 is the exactness
    baseline; identity at p=1 and the error band are pinned in
    tests/test_round3_ops.py."""
    from pcd_spark.graph import approx_triangle_total

    r = approx_triangle_total(part_cooccurrence_edges(spark, sf))
    return spark.createDataFrame(
        [(float(r["estimate"]), int(r["sampled_triangles"]),
          int(r["sampled_edges"]), float(r["p"]))],
        "estimate double, sampled_triangles long, sampled_edges long, p double",
    )


@g("k8b_incremental_edges", None)  # hashed vids (xxhash64) not in SQL;
# incremental == cold-recompute equality pinned in tests/test_corpus.py
def k8b(spark, sf):
    """K8b: incremental edge derivation from a snapshot delta. The synth
    corpus is split into base (first commit per file) and delta (later
    commits, ~5% of files); the durable DerivedGraph state built on the
    base is updated from ONLY the delta (corpus.derive_edges_incremental)
    — the 100 TB story where a daily append never rescans old content.
    Output is the updated edge list named back to (repo, path), which
    pytest pins EQUAL to a cold derive_graph of the full corpus
    (tests/test_corpus.py::test_incremental_derivation_on_synth_corpus)."""
    from pyspark.sql import Window as W

    from pcd_spark.corpus import (
        derive_edges_incremental,
        derive_graph,
        synth_corpus,
    )

    corpus = synth_corpus(spark, repos=20, files_per_repo=50, seed=42)
    w = W.partitionBy("repo", "path").orderBy(F.asc("commit"))
    tagged = corpus.withColumn("rn", F.row_number().over(w))
    prev = derive_graph(tagged.filter("rn = 1").drop("rn"))
    cur = derive_edges_incremental(prev, tagged.filter("rn > 1").drop("rn"))
    sv = cur.verts.select(
        F.col("vid").alias("src"),
        F.col("repo").alias("src_repo"),
        F.col("path").alias("src_path"),
    )
    dv = cur.verts.select(
        F.col("vid").alias("dst"),
        F.col("repo").alias("dst_repo"),
        F.col("path").alias("dst_path"),
    )
    return (
        cur.edges.join(sv, "src").join(dv, "dst")
        .select("src_repo", "src_path", "dst_repo", "dst_path", "weight")
        .orderBy("src_repo", "src_path", "dst_repo", "dst_path")
    )


@g("k49_msf", None)  # union-find / Borůvka fixpoint not one-SQL-pass;
# nx-exact + dual-path equality pinned in tests/test_round3_ops.py
def k49(spark, sf):
    """K49: minimum spanning forest of the bounded weighted part
    co-occurrence graph [PUB: Borůvka 1926; Lattanzi et al. SPAA 2011] —
    the backbone-extraction primitive (lightest connecting structure of a
    similarity/co-occurrence graph). Weight = 1/co-occurrence count, so
    the forest keeps the STRONGEST ties; the (weight, src, dst) total
    order makes it unique at any parallelism. Exactness vs networkx on
    distinct weights, dual-path (driver Kruskal == distributed Borůvka)
    equality, and forest properties are pinned in
    tests/test_round3_ops.py."""
    from pcd_spark.graph import minimum_spanning_forest

    li = load(spark, sf, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("dst"))
    e = (
        a.join(b, "k")
        .filter(F.col("src") < F.col("dst"))
        .filter((F.col("src") < 2000) & (F.col("dst") < 2000))
        .groupBy("src", "dst")
        .agg((F.lit(1.0) / F.count("*")).alias("weight"))
    )
    return (
        minimum_spanning_forest(e, weight_col="weight")
        .select("src", "dst", F.round("weight", 6).alias("weight"))
        .orderBy("src", "dst")
    )


@g("k50_leiden_communities", None)  # iterative; connectivity guarantee +
# structural exactness pinned in tests/test_leiden.py
def k50(spark, sf):
    """K50: Leiden communities over the part co-occurrence graph — K13's
    report shape (sizes + per-community modularity contribution via K9's
    closed form) plus the guarantee Louvain lacks: every community is
    connected [PUB: Traag/Waltman/van Eck 2019]. Exactness is pinned
    structurally in tests/test_leiden.py (clique recovery, brute-force
    optimum, connectivity property on random graphs, Q-vs-networkx 1e-9)."""
    from pcd_spark.graph import leiden
    from pcd_spark.graph.quality import modularity_terms

    e = part_cooccurrence_edges(spark, sf)
    labels = leiden(e)
    terms = modularity_terms(e, labels)
    return (
        labels.groupBy("label")
        .agg(F.count("*").alias("size"))
        .join(terms.withColumnRenamed("community", "label"), "label")
        .select("label", "size", "intra_edges", "degree_sum", "q_c")
        .orderBy(F.desc("size"), F.asc("label"))
        .limit(50)
    )


@g("k51_onion_layers", None)  # iterative peel; nx.onion_layers-pinned +
# dual-path equality + sf0.01 golden hash
def k51(spark, sf):
    """K51: onion decomposition of the part co-occurrence graph — each
    vertex's peel layer (finer than K27 coreness: same-core vertices split
    by how deep in the core they sit; the layer-size histogram is the
    "onion spectrum" structure fingerprint). Exactness vs nx.onion_layers
    + driver/distributed dual-path equality in tests/test_round3_ops.py."""
    from pcd_spark.graph import onion_layers

    return onion_layers(part_cooccurrence_edges(spark, sf)).orderBy("vid")


@g(
    "k52_burt_constraint",
    f"""WITH canon AS ({_PART_EDGES_SQL}),
        bounded AS (SELECT src, dst FROM canon
                    WHERE src < 2000 AND dst < 2000),
        sym AS (SELECT src, dst FROM bounded
                UNION ALL SELECT dst AS src, src AS dst FROM bounded),
        deg AS (SELECT src AS vid, COUNT(*) AS deg FROM sym GROUP BY src),
        p AS (SELECT s.src AS i, s.dst AS j, 1.0 / d.deg AS p
              FROM sym s JOIN deg d ON d.vid = s.src),
        ind AS (SELECT p1.i AS i, p2.j AS j, SUM(p1.p * p2.p) AS ind
                FROM p p1 JOIN p p2 ON p1.j = p2.i
                WHERE p1.i <> p2.j
                GROUP BY p1.i, p2.j),
        lc AS (SELECT p.i AS i,
                      POWER(p.p + COALESCE(ind.ind, 0), 2) AS l
               FROM p LEFT JOIN ind ON ind.i = p.i AND ind.j = p.j)
        SELECT i AS vid, ROUND(SUM(l), 6) AS constraint_score
        FROM lc GROUP BY i ORDER BY vid""",
)
def k52(spark, sf):
    """K52: Burt's structural-holes constraint on the bounded part
    co-occurrence cohort (same `< 2000` bound as K49 — structural-holes
    metrics are inherently O(Σ deg²) two-path counts, so at scale they run
    on degree-capped/ego cohorts by design; see
    pcd_spark.graph.quality.burt_constraint). Low score = broker vertices
    bridging otherwise-disconnected neighborhoods. Full SQL mirror →
    DuckDB hash row; nx.constraint parity in pytest."""
    from pcd_spark.graph.quality import burt_constraint

    e = part_cooccurrence_edges(spark, sf).filter(
        (F.col("src") < 2000) & (F.col("dst") < 2000)
    )
    return burt_constraint(e).orderBy("vid")


@g(
    "k53_clique_percolation",
    """WITH RECURSIVE
        canon AS (
          SELECT src, dst FROM (
            SELECT a.l_partkey AS src, b.l_partkey AS dst
            FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
            JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2 HAVING COUNT(*) >= 2)
          WHERE SUBSTRING(MD5(CAST(src AS VARCHAR) || ':' ||
                              CAST(dst AS VARCHAR)), 1, 1) < 'c'),
        both_dir AS (SELECT src, dst FROM canon
                     UNION ALL SELECT dst, src FROM canon),
        deg AS (SELECT src AS vid, COUNT(*) AS d FROM both_dir GROUP BY src),
        oriented AS (
          SELECT CASE WHEN (ds.d, c.src) < (dd.d, c.dst) THEN c.src ELSE c.dst END AS u,
                 CASE WHEN (ds.d, c.src) < (dd.d, c.dst) THEN c.dst ELSE c.src END AS v
          FROM canon c
          JOIN deg ds ON ds.vid = c.src
          JOIN deg dd ON dd.vid = c.dst),
        tris AS (
          SELECT w1.u AS a, w1.v AS b, w2.v AS c
          FROM oriented w1 JOIN oriented w2 ON w1.u = w2.u AND w1.v <> w2.v
          JOIN oriented e ON e.u = w1.v AND e.v = w2.v),
        tid AS (
          SELECT t1, t2, t3,
                 LPAD(CAST(t1 AS VARCHAR), 8, '0') || ':' ||
                 LPAD(CAST(t2 AS VARCHAR), 8, '0') || ':' ||
                 LPAD(CAST(t3 AS VARCHAR), 8, '0') AS id
          FROM (SELECT LEAST(a, b, c) AS t1,
                       a + b + c - LEAST(a, b, c) - GREATEST(a, b, c) AS t2,
                       GREATEST(a, b, c) AS t3
                FROM tris)),
        tedge AS (SELECT id, t1 AS lo, t2 AS hi FROM tid
                  UNION ALL SELECT id, t1, t3 FROM tid
                  UNION ALL SELECT id, t2, t3 FROM tid),
        adj AS (SELECT DISTINCT x.id AS a, y.id AS b
                FROM tedge x JOIN tedge y
                  ON x.lo = y.lo AND x.hi = y.hi AND x.id <> y.id),
        reach(v, u) AS (
          SELECT id, id FROM tid
          UNION
          SELECT r.v, a.b FROM reach r JOIN adj a ON a.a = r.u),
        comp AS (SELECT v AS id, MIN(u) AS cid FROM reach GROUP BY v),
        memb AS (SELECT DISTINCT cid, vid
                 FROM (SELECT c.cid, UNNEST([t.t1, t.t2, t.t3]) AS vid
                       FROM comp c JOIN tid t ON t.id = c.id))
        SELECT vid,
               CAST(SPLIT_PART(cid, ':', 1) AS BIGINT) AS c_t1,
               CAST(SPLIT_PART(cid, ':', 2) AS BIGINT) AS c_t2,
               CAST(SPLIT_PART(cid, ':', 3) AS BIGINT) AS c_t3
        FROM memb
        ORDER BY vid, c_t1, c_t2, c_t3""",
)
def k53(spark, sf):
    """K53: overlapping communities via 3-clique percolation [PUB: Palla et
    al. 2005] on the REPEATED-co-occurrence backbone (pairs co-ordered >= 2
    times — the K49 strongest-ties idea) thinned by the deterministic
    md5-hex edge sample (x15's engine-portable hash rule, keep < 'c' = 3/4).
    Both filters are the honest CPM scale story: the Σ m_e² triangle-
    adjacency term and the recursive-closure oracle are quadratic IN THE
    COMMUNITY SIZE, so CPM runs on sparsified cohorts by design (the raw
    co-occurrence graph is order-clique-dense: 126k triangles at sf0.001 =
    a 10^10-row closure; the backbone has ~1.3k). One row per (vertex,
    community) membership — vertices CAN appear in several communities, the
    overlap K5/K13/K50 cannot express. Engine: K6 triangle enumeration →
    shared-edge adjacency → K4 connected components; oracle: the same
    construction in ANSI SQL with recursive-CTE reachability.
    nx.k_clique_communities member-set parity in tests/test_round3_ops.py."""
    from pcd_spark.graph import clique_percolation

    li = load(spark, sf, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("dst"))
    e = (
        a.join(b, "k")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= 2)
        .filter(
            F.substring(
                F.md5(
                    F.concat_ws(":", F.col("src").cast("string"),
                                F.col("dst").cast("string"))
                ), 1, 1
            ) < "c"
        )
        .select("src", "dst")
    )
    return clique_percolation(e).orderBy("vid", "c_t1", "c_t2", "c_t3")


_TEMPORAL_INTER_SQL = f"""
  SELECT DISTINCT o_custkey AS src, {SUPPLIER_OFFSET} + l_suppkey AS dst,
                  CAST(epoch(o_orderdate) AS BIGINT) AS t
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_custkey < 300
"""


@g(
    "k54_temporal_reachability",
    f"""WITH inter AS ({_TEMPORAL_INTER_SQL}),
        sym AS (SELECT src, dst, t FROM inter
                UNION SELECT dst, src, t FROM inter),
        roots AS (SELECT DISTINCT src AS root FROM inter
                  ORDER BY root LIMIT 3),
        s0 AS (SELECT root, root AS vid, CAST(-1 AS BIGINT) AS arrival
               FROM roots),
        -- hop h: full-state x interactions with the time-respecting
        -- predicate, then the MIN-arrival dominance merge (exactly the
        -- engine's earliest-arrival rule; full-state vs frontier-only
        -- emission is provably equivalent, see pcd_spark/graph/temporal.py)
        m1 AS (SELECT s.root, e.dst AS vid, MIN(e.t) AS arrival
               FROM s0 s JOIN sym e ON e.src = s.vid AND e.t >= s.arrival
               GROUP BY s.root, e.dst),
        s1 AS (SELECT root, vid, MIN(arrival) AS arrival FROM
               (SELECT * FROM s0 UNION ALL SELECT * FROM m1)
               GROUP BY root, vid),
        m2 AS (SELECT s.root, e.dst AS vid, MIN(e.t) AS arrival
               FROM s1 s JOIN sym e ON e.src = s.vid AND e.t >= s.arrival
               GROUP BY s.root, e.dst),
        s2 AS (SELECT root, vid, MIN(arrival) AS arrival FROM
               (SELECT * FROM s1 UNION ALL SELECT * FROM m2)
               GROUP BY root, vid),
        m3 AS (SELECT s.root, e.dst AS vid, MIN(e.t) AS arrival
               FROM s2 s JOIN sym e ON e.src = s.vid AND e.t >= s.arrival
               GROUP BY s.root, e.dst),
        s3 AS (SELECT root, vid, MIN(arrival) AS arrival FROM
               (SELECT * FROM s2 UNION ALL SELECT * FROM m3)
               GROUP BY root, vid)
        SELECT root, vid, arrival FROM s3 WHERE vid <> root
        ORDER BY root, vid""",
)
def k54(spark, sf):
    """K54: time-respecting reachability with earliest arrival [PUB: Kempe
    et al. 2000; Holme & Saramäki 2012] on the timestamped customer-supplier
    interaction graph (an interaction = an order line, timed by
    o_orderdate). Static reachability over-counts temporal influence: a
    path c1-s1-c2 only transmits if s1 serves c2 AT OR AFTER serving c1 —
    exactly the constraint supply-chain / contagion queries need. Bounded
    cohort (custkey < 300, 3 smallest roots, <= 3 hops) keeps the oracle
    CTE small; the engine (pcd_spark/graph/temporal.py) is frontier-only
    and cohort-scales like K22/K23/K55. Epoch-seconds arrivals keep the
    min-agg integral and engine-portable."""
    from pcd_spark.graph import temporal_reachability

    li, o = load(spark, sf, "lineitem"), load(spark, sf, "orders")
    inter = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("o_custkey") < 300)
        .select(
            F.col("o_custkey").alias("src"),
            (F.lit(SUPPLIER_OFFSET) + F.col("l_suppkey")).alias("dst"),
            # NTZ -> TZ (session tz is pinned UTC, session.py) -> epoch long:
            # matches DuckDB's naive-UTC epoch() exactly
            F.col("o_orderdate").cast("timestamp").cast("long").alias("t"),
        )
        .distinct()
    )
    roots = [
        r["src"]
        for r in inter.select("src").distinct().orderBy("src").limit(3).collect()
    ]
    res = temporal_reachability(inter, roots, max_hops=3, directed=False)
    return (
        res.filter(F.col("vid") != F.col("root"))
        .select("root", "vid", "arrival")
        .orderBy("root", "vid")
    )


@g(
    "k55_closeness",
    f"""WITH RECURSIVE
        edges AS (SELECT src, dst FROM ({_CS_EDGES_SQL}) WHERE src < 500),
        sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
        lms AS (SELECT DISTINCT src AS lm FROM edges ORDER BY lm LIMIT 4),
        bfs(lm, vid, dist) AS (
          SELECT lm, lm, 0 FROM lms
          UNION
          SELECT b.lm, e.dst, b.dist + 1
          FROM bfs b JOIN sym e ON e.src = b.vid
          WHERE b.dist < 40),
        d AS (SELECT lm, vid, MIN(dist) AS dist FROM bfs GROUP BY lm, vid),
        agg AS (SELECT lm, COUNT(*) AS r, SUM(CAST(dist AS DOUBLE)) AS sd
                FROM d GROUP BY lm),
        n AS (SELECT COUNT(DISTINCT src) AS n FROM sym)
        SELECT lm AS vid,
               ROUND(CASE WHEN sd > 0
                          THEN (r - 1) / sd * (r - 1) / (n.n - 1)
                          ELSE 0.0 END, 6) AS closeness
        FROM agg CROSS JOIN n ORDER BY vid""",
)
def k55(spark, sf):
    """K55: exact closeness centrality (Wasserman-Faust normalization,
    networkx wf_improved semantics) for the 4 smallest vertices of the
    bounded customer-supplier graph (k12's `src < 500` subgraph). The
    engine runs ONE batched landmark-BFS for the whole cohort
    (pcd_spark/graph/sssp.py landmark_distances: all landmarks advance in
    the same superstep sequence, state keyed (lm, vid), reached-only), then
    a single (lm) hash-agg — the centrality-by-cohort scale pattern
    (K22/K23). Oracle: recursive-CTE multi-landmark BFS + the identical
    left-associated WF arithmetic, rounded 6 on both engines."""
    from pcd_spark.graph import closeness_centrality

    e = cust_supp_edges(spark, sf).filter(F.col("src") < 500)
    lms = [
        r["src"]
        for r in e.select("src").distinct().orderBy("src").limit(4).collect()
    ]
    return closeness_centrality(e, lms).orderBy("vid")


@g(
    "k56_double_sweep",
    f"""WITH RECURSIVE
        edges AS (SELECT src, dst FROM ({_CS_EDGES_SQL}) WHERE src < 500),
        sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
        root AS (SELECT MIN(src) AS v FROM edges),
        b1(vid, dist) AS (
          SELECT v, 0 FROM root
          UNION
          SELECT e.dst, b.dist + 1 FROM b1 b JOIN sym e ON e.src = b.vid
          WHERE b.dist < 40),
        d1 AS (SELECT vid, MIN(dist) AS dist FROM b1 GROUP BY vid),
        far1 AS (SELECT vid, dist FROM d1
                 ORDER BY dist DESC, vid ASC LIMIT 1),
        b2(vid, dist) AS (
          SELECT vid, 0 FROM far1
          UNION
          SELECT e.dst, b.dist + 1 FROM b2 b JOIN sym e ON e.src = b.vid
          WHERE b.dist < 40),
        d2 AS (SELECT vid, MIN(dist) AS dist FROM b2 GROUP BY vid),
        far2 AS (SELECT vid, dist FROM d2
                 ORDER BY dist DESC, vid ASC LIMIT 1)
        SELECT r.v AS root, f1.vid AS sweep1_far,
               CAST(f1.dist AS BIGINT) AS ecc1,
               f2.vid AS sweep2_far, CAST(f2.dist AS BIGINT) AS diam_lb
        FROM root r CROSS JOIN far1 f1 CROSS JOIN far2 f2""",
)
def k56(spark, sf):
    """K56: double-sweep diameter lower bound [PUB: Magnien, Latapy &
    Habib 2009 "Fast computation of empirically tight bounds for the
    diameter of massive graphs"; the iFUB starting step]: BFS from an
    arbitrary root, hop to the farthest vertex found, BFS again — the
    second eccentricity is a lower bound on the diameter that is
    empirically tight (often exact) on real graphs, at the cost of TWO
    BFS runs instead of all-pairs. Complements K21's HyperBall effective
    diameter (approximate, all-vertex) with an exact bound; both of the
    sweeps are the engine's frontier-only shortest_paths. Deterministic
    tie-break: max dist then min vid, both engines."""
    from pcd_spark.graph import shortest_paths

    e = cust_supp_edges(spark, sf).filter(F.col("src") < 500)
    root = int(e.agg(F.min("src").alias("m")).first()["m"])
    d1 = shortest_paths(e, [root])
    f1 = d1.orderBy(F.desc("dist"), F.asc("vid")).limit(1).collect()[0]
    d2 = shortest_paths(e, [int(f1["vid"])])
    f2 = d2.orderBy(F.desc("dist"), F.asc("vid")).limit(1).collect()[0]
    return spark.createDataFrame(
        [(root, int(f1["vid"]), int(f1["dist"]), int(f2["vid"]), int(f2["dist"]))],
        "root long, sweep1_far long, ecc1 long, sweep2_far long, diam_lb long",
    )


@g(
    "k57_landmark_estimate",
    f"""WITH RECURSIVE
        edges AS (SELECT src, dst FROM ({_CS_EDGES_SQL}) WHERE src < 500),
        sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
        lms AS (SELECT DISTINCT src AS lm FROM edges ORDER BY lm LIMIT 4),
        bfs(lm, vid, dist) AS (
          SELECT lm, lm, 0 FROM lms
          UNION
          SELECT b.lm, e.dst, b.dist + 1
          FROM bfs b JOIN sym e ON e.src = b.vid
          WHERE b.dist < 40),
        d AS (SELECT lm, vid, MIN(dist) AS dist FROM bfs GROUP BY lm, vid),
        probes AS (SELECT DISTINCT vid FROM d WHERE vid < 30)
        SELECT a.vid AS u, b.vid AS v,
               CAST(MIN(da.dist + db.dist) AS BIGINT) AS est_dist
        FROM probes a JOIN probes b ON a.vid < b.vid
        JOIN d da ON da.vid = a.vid
        JOIN d db ON db.vid = b.vid AND db.lm = da.lm
        GROUP BY a.vid, b.vid
        ORDER BY u, v""",
)
def k57(spark, sf):
    """K57: landmark-based distance estimation [PUB: Potamias, Bonchi,
    Castillo & Gionis CIKM 2009; Goldberg & Harrelson 2005 (ALT)] — the
    constant-time distance-query scheme the K55 landmark substrate exists
    for at 10^12 edges: precompute d(·, lm) for a small landmark set ONCE
    (one batched landmark-BFS), then answer any pairwise distance query as
    the triangle-inequality upper bound min over lm of d(u,lm)+d(lm,v) —
    an O(|L|) lookup join instead of a per-query BFS. Exact whenever some
    landmark sits on a shortest u-v path; always an upper bound (pinned in
    pytest vs nx truth). Probe cohort: all pairs of the sub-30 customers.
    Plan: the landmark vectors equi-join on lm and hash-agg min — no BFS
    at query time."""
    from pcd_spark.graph import landmark_distances

    e = cust_supp_edges(spark, sf).filter(F.col("src") < 500)
    lms = [
        r["src"]
        for r in e.select("src").distinct().orderBy("src").limit(4).collect()
    ]
    ld = landmark_distances(e, lms).localCheckpoint(eager=True)
    da = ld.filter(F.col("vid") < 30).select(
        "lm", F.col("vid").alias("u"), F.col("dist").alias("d1")
    )
    db = ld.filter(F.col("vid") < 30).select(
        "lm", F.col("vid").alias("v"), F.col("dist").alias("d2")
    )
    return (
        da.join(db, "lm")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.min(F.col("d1") + F.col("d2")).cast("long").alias("est_dist"))
        .orderBy("u", "v")
    )


@g("k58_simrank", None)  # iterative-to-convergence; numpy-mirror-pinned
# (tests/test_simrank.py engine parity 1e-9 + the sf-table mirror in
# tests/test_temporal_closeness.py) — rows-only by design, like k3/k5
def k58(spark, sf):
    """K58: SimRank structural similarity [PUB: Jeh & Widom KDD 2002] on
    the bounded customer-supplier cohort (custkey < 10 — SimRank state is
    inherently O(V^2)-dense, so at 10^12 edges it runs on ego/cohort
    subgraphs BY DESIGN, the K52/K23 bounded-cohort pattern). The
    recursive member of the K16 similarity family: customers are similar
    when the suppliers they use are similar, and vice versa — exactly the
    'two files are related because the modules they import are related'
    recursion a dependency-graph analysis wants. Fixed 10-iteration
    evaluation (c=0.6 -> < 6e-3 from the fixpoint), threshold sieve
    eps=1e-4 (deterministic rule, mirrored exactly in the pytest oracle);
    scores ROUND'd 6 for presentation, ordered s desc then (u, v)."""
    from pcd_spark.graph import simrank

    e = cust_supp_edges(spark, sf).filter(F.col("src") < 10)
    res = simrank(e, c=0.6, max_iter=10, eps=1e-4)
    return res.select(
        "u", "v", F.round("s", 6).alias("s")
    ).orderBy(F.desc("s"), "u", "v").limit(200)


_WEIGHTED_PAIR_SQL = f"""
  SELECT src, dst, CAST(COUNT(*) AS DOUBLE) AS w FROM (
    SELECT DISTINCT o_orderkey, o_custkey AS src,
                    {SUPPLIER_OFFSET} + l_suppkey AS dst
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
  GROUP BY src, dst
"""


@g(
    "k59_disparity_backbone",
    f"""WITH pairs AS ({_WEIGHTED_PAIR_SQL}),
        sym AS (SELECT src, dst, w FROM pairs
                UNION ALL SELECT dst, src, w FROM pairs),
        vstat AS (SELECT src AS vid, SUM(w) AS s, COUNT(*) AS k
                  FROM sym GROUP BY src),
        alpha AS (
          SELECT e.src, e.dst,
                 ROUND(POWER(1.0 - e.w / v.s, v.k - 1), 6) AS a
          FROM sym e JOIN vstat v ON e.src = v.vid)
        SELECT f.src, f.dst, CAST(p.w AS BIGINT) AS weight,
               f.a AS alpha_src, b.a AS alpha_dst
        FROM alpha f
        JOIN alpha b ON f.src = b.dst AND f.dst = b.src
        JOIN pairs p ON f.src = p.src AND f.dst = p.dst
        WHERE f.src < f.dst AND LEAST(f.a, b.a) < 0.05
        ORDER BY f.src, f.dst""",
)
def k59(spark, sf):
    """K59 (round 4): disparity-filter multiscale backbone [PUB: Serrano,
    Boguna & Vespignani PNAS 2009] on the weighted customer-supplier
    interaction graph (K42's multiplicity weights). The null model: a
    vertex of degree k spreads its strength s uniformly at random; an
    incident edge of weight w is SIGNIFICANT when its share would be that
    extreme with probability alpha = (1 - w/s)^(k-1) below the cutoff
    (0.05). Keeping edges significant from EITHER endpoint extracts the
    multiscale backbone — the principled sparsifier a 10^12-edge link
    graph runs before expensive downstream algorithms (vs naive global
    weight thresholding, which erases every low-strength vertex's
    neighborhood wholesale).

    Spark shape: one hash-agg for per-vertex (strength, degree), one
    vid-keyed join back to the symmetric edges (the K1 exchange pattern),
    one src<dst self-pairing to expose both endpoints' alphas — NO
    iteration, NO windows; at 10^12 edges this is two shuffles over the
    edge table. alpha is ROUND'd 6 BEFORE the threshold compare on both
    engines so a boundary edge cannot flip on fold-order ulp skew (the
    v1/v8 discipline); k=1 vertices give alpha=(1-1)^0=1, never
    significant — the null model has no surprise with one edge."""
    li, o = load(spark, sf, "lineitem"), load(spark, sf, "orders")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            "o_orderkey",
            F.col("o_custkey").alias("src"),
            (F.lit(SUPPLIER_OFFSET) + F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("w"))
    )
    return disparity_backbone(pairs).orderBy("src", "dst")


def disparity_backbone(pairs, cutoff: float = 0.05):
    """Serrano et al. 2009 disparity-filter core over a canonical weighted
    edge table (src < dst, columns src/dst/w). Returns (src, dst, weight,
    alpha_src, alpha_dst) for edges significant from either endpoint,
    unordered. Validates w > 0 on entry (shortest_paths discipline,
    ADVICE r5): a zero/negative weight makes a vertex strength s <= 0
    possible, and w/s then divides by zero inside the null model —
    fail loudly instead. The eager localCheckpoint both materializes the
    validated table and stops the THREE downstream references (symmetrize,
    alpha join, weight join-back) from recomputing the upstream agg."""
    pairs = pairs.localCheckpoint(eager=True)
    minw = pairs.agg(F.min("w")).first()[0]
    if minw is not None and minw <= 0:
        raise ValueError(
            f"disparity_backbone requires positive edge weights; "
            f"min(w) = {minw}"
        )
    sym = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    vstat = sym.groupBy(F.col("src").alias("vid")).agg(
        F.sum("w").alias("s"), F.count("*").alias("k")
    )
    alpha = sym.join(vstat, sym.src == vstat.vid).select(
        "src",
        "dst",
        F.round(
            F.pow(F.lit(1.0) - F.col("w") / F.col("s"), F.col("k") - 1), 6
        ).alias("a"),
    )
    fwd = alpha.select("src", "dst", F.col("a").alias("alpha_src"))
    bwd = alpha.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"),
        F.col("a").alias("alpha_dst"),
    )
    return (
        fwd.join(bwd, ["src", "dst"])
        .filter(F.col("src") < F.col("dst"))
        .filter(F.least("alpha_src", "alpha_dst") < F.lit(cutoff))
        .join(pairs.select("src", "dst", F.col("w").cast("long").alias("weight")),
              ["src", "dst"])
        .select("src", "dst", "weight", "alpha_src", "alpha_dst")
    )


@g(
    "k60_edge_burstiness",
    f"""WITH inter AS (
          SELECT DISTINCT o_custkey AS src,
                 {SUPPLIER_OFFSET} + l_suppkey AS dst,
                 CAST(epoch(o_orderdate) AS BIGINT) AS t
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        gaps AS (
          SELECT src, dst,
                 t - LAG(t) OVER (PARTITION BY src, dst ORDER BY t) AS gap
          FROM inter),
        stats AS (
          SELECT src, dst, COUNT(gap) AS n_gaps,
                 AVG(gap) AS mu, STDDEV_POP(gap) AS sigma
          FROM gaps WHERE gap IS NOT NULL GROUP BY src, dst)
        SELECT src, dst, CAST(n_gaps + 1 AS BIGINT) AS n_events,
               ROUND((sigma - mu) / (sigma + mu), 6) AS burstiness
        FROM stats WHERE n_gaps >= 2 AND mu > 0
        ORDER BY burstiness DESC, src, dst LIMIT 200""",
)
def k60(spark, sf):
    """K60 (round 4): temporal edge burstiness [PUB: Goh & Barabasi EPL
    2008, B = (sigma - mu)/(sigma + mu) over inter-event times] on the
    timestamped interaction graph (K54's substrate). B -> 1 means bursty
    trains (a crawler hammering a host, a hot dependency in a migration),
    B ~ 0 Poisson, B -> -1 periodic (cron-like) — the temporal-shape
    feature a link-graph pipeline wants next to K54's reachability:
    WHICH recurring edges carry clustered activity.

    Spark shape: one (src, dst)-keyed window (lag over event time — the
    partition key IS the shuffle key, E5's rule) + one hash-agg for the
    (mu, sigma) moments; pairs need >= 3 distinct events (>= 2 gaps) for a
    defined sigma, and mu > 0 is guaranteed by DISTINCT event times.
    ROUND'd 6 AFTER the ratio (single-expression moments, the d12
    discipline); presentation order by burstiness then pair."""
    li, o = load(spark, sf, "lineitem"), load(spark, sf, "orders")
    inter = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.lit(SUPPLIER_OFFSET) + F.col("l_suppkey")).alias("dst"),
            F.unix_timestamp(F.col("o_orderdate").cast("timestamp")).alias("t"),
        )
        .distinct()
    )
    return edge_burstiness(inter).orderBy(
        F.desc("burstiness"), "src", "dst"
    ).limit(200)


def edge_burstiness(inter):
    """Goh-Barabasi burstiness core over a DISTINCT (src, dst, t) event
    table. Returns (src, dst, n_events, burstiness), unordered.

    DOCUMENTED CONTRACT (guard-tested, ADVICE r5): a pair with fewer than
    3 distinct event times is DROPPED, not emitted with a null/degenerate
    score — 2 events give a single gap, sigma_pop is 0 by construction and
    B = -1 would claim "perfectly periodic" from one observation. mu > 0
    is guaranteed when the input really is distinct times; the filter also
    drops duplicate-timestamp degeneracies (mu = 0) defensively."""
    from pyspark.sql import Window

    w = Window.partitionBy("src", "dst").orderBy("t")
    gaps = inter.select(
        "src", "dst", (F.col("t") - F.lag("t").over(w)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    stats = gaps.groupBy("src", "dst").agg(
        F.count("gap").alias("n_gaps"),
        F.avg("gap").alias("mu"),
        F.stddev_pop("gap").alias("sigma"),
    )
    return stats.filter((F.col("n_gaps") >= 2) & (F.col("mu") > 0)).select(
        "src",
        "dst",
        (F.col("n_gaps") + 1).cast("long").alias("n_events"),
        F.round(
            (F.col("sigma") - F.col("mu")) / (F.col("sigma") + F.col("mu")),
            6,
        ).alias("burstiness"),
    )


@g(
    "k61_weighted_clustering",
    """WITH we AS (
         SELECT a.l_partkey AS src, b.l_partkey AS dst,
                CAST(COUNT(*) AS DOUBLE) AS w
         FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
         JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
           ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         GROUP BY 1, 2),
       mw AS (SELECT MAX(w) AS m FROM we),
       canon AS (SELECT src, dst, w / m AS nw FROM we, mw),
       both_dir AS (SELECT src, dst, nw FROM canon
                    UNION ALL SELECT dst, src, nw FROM canon),
       deg AS (SELECT src AS vid, COUNT(*) AS d FROM both_dir GROUP BY src),
       oriented AS (
         SELECT CASE WHEN (ds.d, c.src) < (dd.d, c.dst)
                     THEN c.src ELSE c.dst END AS u,
                CASE WHEN (ds.d, c.src) < (dd.d, c.dst)
                     THEN c.dst ELSE c.src END AS v,
                c.nw
         FROM canon c
         JOIN deg ds ON ds.vid = c.src
         JOIN deg dd ON dd.vid = c.dst),
       tris AS (
         SELECT w1.u AS a, w1.v AS b, w2.v AS c,
                POWER(w1.nw * w2.nw * e.nw, 1.0/3.0) AS t
         FROM oriented w1
         JOIN oriented w2 ON w1.u = w2.u AND w1.v <> w2.v
         JOIN oriented e ON e.u = w1.v AND e.v = w2.v),
       per_v AS (
         SELECT vid, SUM(t) AS s FROM (
           SELECT a AS vid, t FROM tris UNION ALL
           SELECT b, t FROM tris UNION ALL SELECT c, t FROM tris)
         GROUP BY vid)
       SELECT deg.vid, deg.d AS deg,
              ROUND(CASE WHEN deg.d >= 2
                         THEN 2.0 * COALESCE(per_v.s, 0)
                              / (deg.d * (deg.d - 1))
                         ELSE 0 END, 6) AS wclust
       FROM deg LEFT JOIN per_v ON deg.vid = per_v.vid
       ORDER BY deg.vid""",
)
def k61(spark, sf):
    """K61 (round 4): WEIGHTED local clustering coefficient [PUB: Onnela,
    Saramaki, Kertesz & Kivela PRE 71:065103 2005; the nx.clustering
    (weight=...) definition] on the part co-occurrence graph with
    co-order multiplicity weights: c_w(i) = 2/(k_i(k_i-1)) *
    sum over closed neighbor pairs of (w_ij * w_ih * w_jh)^(1/3), weights
    normalized by the GLOBAL max. K11 asks "do my neighbors know each
    other"; K61 asks "do they know each other THROUGH STRONG ties" — on
    a dependency graph, whether a module's imports are strongly
    co-used together (cohesive cluster) or incidentally adjacent. The
    unweighted K11 value is the w==const special case, pinned as a law.

    Spark shape: K6's degree-ordered triangle orientation carrying the
    normalized weight through both wedge arms and the closing edge —
    exactly one extra double per row vs K11, same join graph, same
    hub-blowup protection; the global max weight is the k37-precedent
    O(1) collected scalar attached as a literal. Cube-root applied to
    the PRODUCT (one POWER call, same association on both engines);
    ROUND 6 after the final division."""
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("dst"))
    # eager localCheckpoint, not persist: the returned plan still references
    # we (via canon), so an in-function persist could never be unpersisted —
    # it leaked cached blocks for the session lifetime (x14/bipartite
    # precedent; ContextCleaner frees checkpoint blocks when the caller
    # drops the result).
    we = (
        a.join(b, "k")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("w"))
        .localCheckpoint(eager=True)
    )
    max_w = we.agg(F.max("w")).first()[0]  # O(1) scalar, k37 precedent
    canon = we.select("src", "dst", (F.col("w") / F.lit(max_w)).alias("nw"))
    both = canon.select("src", "dst", "nw").unionByName(
        canon.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "nw"
        )
    )
    deg = both.groupBy(F.col("src").alias("vid")).agg(F.count("*").alias("d"))
    ds = deg.select(F.col("vid").alias("src"), F.col("d").alias("d_src"))
    dd = deg.select(F.col("vid").alias("dst"), F.col("d").alias("d_dst"))
    lower = F.struct("d_src", "src") < F.struct("d_dst", "dst")
    oriented = (
        canon.join(ds, "src")
        .join(dd, "dst")
        .select(
            F.when(lower, F.col("src")).otherwise(F.col("dst")).alias("u"),
            F.when(lower, F.col("dst")).otherwise(F.col("src")).alias("v"),
            "nw",
        )
    )
    w1 = oriented.select(F.col("u"), F.col("v").alias("b"), F.col("nw").alias("nw1"))
    w2 = oriented.select(F.col("u"), F.col("v").alias("c"), F.col("nw").alias("nw2"))
    close = oriented.select(
        F.col("u").alias("b"), F.col("v").alias("c"), F.col("nw").alias("nw3")
    )
    tris = (
        w1.join(w2, "u")
        .filter(F.col("b") != F.col("c"))
        .join(close, ["b", "c"])
        .select(
            "u", "b", "c",
            F.pow(F.col("nw1") * F.col("nw2") * F.col("nw3"), 1.0 / 3.0).alias("t"),
        )
    )
    per_v = (
        tris.select(F.col("u").alias("vid"), "t")
        .unionByName(tris.select(F.col("b").alias("vid"), "t"))
        .unionByName(tris.select(F.col("c").alias("vid"), "t"))
        .groupBy("vid")
        .agg(F.sum("t").alias("s"))
    )
    out = (
        deg.join(per_v, "vid", "left")
        .select(
            "vid",
            F.col("d").alias("deg"),
            F.round(
                F.when(
                    F.col("d") >= 2,
                    F.lit(2.0) * F.coalesce("s", F.lit(0.0))
                    / (F.col("d") * (F.col("d") - 1)),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("wclust"),
        )
        .orderBy("vid")
    )
    return out
