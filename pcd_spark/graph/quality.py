"""K9 — community quality metrics (extension beyond the SURVEY §2 core).

Newman-Girvan modularity of a labeling over an undirected graph
[PUB: Newman & Girvan 2004, "Finding and evaluating community structure"]:

    Q = sum over communities c of [ L_c / m  -  (d_c / 2m)^2 ]

where m = number of undirected edges, L_c = edges with both endpoints in c,
d_c = sum of degrees of c's members. Every community-detection pipeline
reports this to score its partitions (LPA/CC output plugs straight in as
`labels`).

Scale shape: closed-form — two vid-keyed equi-joins of the O(V) label table
against the edge list plus two hash aggregations; no iteration, no Python.
The label join keys on vid, so at 10^12-file scale it reuses the same
hash-partitioning discipline as a superstep gather; the per-community
aggregation state is O(#communities). Vertices absent from `labels` (or
labeled but isolated) contribute 0 and are dropped by the inner joins —
identical semantics in the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pcd_spark.graph.edges import canonical_undirected
from pcd_spark.graph.triangles import triangle_counts


def modularity_terms(
    edges: DataFrame,
    labels: DataFrame,
    label_col: str = "label",
    round_to: int | None = 8,
) -> DataFrame:
    """Per-community modularity contributions over the canonical undirected
    form of `edges`. Returns (community, intra_edges, degree_sum, q_c) with
    Q = sum(q_c). `labels` must be (vid, <label_col>). round_to rounds q_c
    for hash-stable oracle comparison; None keeps full double precision
    (the scalar modularity() path)."""
    canon = canonical_undirected(edges).persist()
    m = canon.count()
    if m == 0:
        return canon.select(
            F.col("src").alias("community"),
            F.lit(0).alias("intra_edges"),
            F.lit(0).alias("degree_sum"),
            F.lit(0.0).alias("q_c"),
        )
    lab = labels.select("vid", F.col(label_col).alias("community"))

    both = canon.unionByName(
        canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = both.groupBy(F.col("src").alias("vid")).agg(
        F.count("*").alias("deg")
    )
    d_c = (
        deg.join(lab, "vid")
        .groupBy("community")
        .agg(F.sum("deg").alias("degree_sum"))
    )
    l_c = (
        canon.join(
            lab.select(F.col("vid").alias("src"), F.col("community").alias("ca")),
            "src",
        )
        .join(
            lab.select(F.col("vid").alias("dst"), F.col("community").alias("cb")),
            "dst",
        )
        .filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("community"))
        .agg(F.count("*").alias("intra_edges"))
    )
    md = float(m)
    q = F.coalesce("intra_edges", F.lit(0)) / F.lit(md) - F.pow(
        F.col("degree_sum") / F.lit(2.0 * md), 2
    )
    if round_to is not None:
        q = F.round(q, round_to)
    return d_c.join(l_c, "community", "left").select(
        "community",
        F.coalesce("intra_edges", F.lit(0)).alias("intra_edges"),
        "degree_sum",
        q.alias("q_c"),
    )


def modularity(
    edges: DataFrame, labels: DataFrame, label_col: str = "label"
) -> float:
    """Scalar Newman modularity Q of `labels` over `edges`."""
    row = (
        modularity_terms(edges, labels, label_col, round_to=None)
        .agg(F.coalesce(F.sum("q_c"), F.lit(0.0)).alias("q"))
        .first()
    )
    return float(row["q"])


def local_clustering(edges: DataFrame) -> DataFrame:
    """K11: per-vertex local clustering coefficient
    lcc(v) = 2*tri(v) / (deg(v)*(deg(v)-1)), 0 when deg < 2
    [PUB: Watts & Strogatz 1998]. Pure composition: K6 triangle counts
    joined to K1 degrees — inherits K6's degree-ordered orientation (hub-
    safe wedge fan-out), adds one vid-keyed join + one codegen'd expression.
    Returns (vid, tri, deg, lcc) with lcc rounded to 8 for oracle-stable
    comparison."""
    e = edges.persist()
    tri = triangle_counts(e)
    canon = canonical_undirected(e)
    both = canon.unionByName(
        canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = both.groupBy(F.col("src").alias("vid")).agg(
        F.count("*").alias("deg")
    )
    return tri.join(deg, "vid").select(
        "vid",
        "tri",
        "deg",
        F.round(
            F.when(
                F.col("deg") >= 2,
                2.0 * F.col("tri") / (F.col("deg") * (F.col("deg") - 1)),
            ).otherwise(F.lit(0.0)),
            8,
        ).alias("lcc"),
    )


def conductance_terms(
    edges: DataFrame,
    labels: DataFrame,
    label_col: str = "label",
    round_to: int | None = 8,
) -> DataFrame:
    """K31: per-community conductance over the canonical undirected form of
    `edges` [PUB: Kannan, Vempala & Vetta 2004; Leskovec et al. 2009 "NCP
    plots"] — the boundary-quality complement to modularity (K9): a
    community can score high Q yet leak badly; conductance measures the
    leak directly.

        phi(S) = cut(S) / min(vol(S), 2m - vol(S))

    cut(S) = edges with exactly one endpoint in S, vol(S) = sum of degrees
    of S's members. Pinned semantics (mirrored exactly in the SQL oracle):
    only edges with BOTH endpoints labeled participate (inner-join rule,
    same as modularity_terms); degrees and m are computed over that labeled
    subgraph; phi = 0.0 when the denominator is 0 (a community that is the
    whole graph, or all-isolated members).

    Returns (community, cut_edges, volume, phi). Closed-form: two vid-keyed
    label joins + two hash-aggs — no iteration, O(#communities) agg state.
    """
    canon = canonical_undirected(edges)
    lab = labels.select("vid", F.col(label_col).alias("community"))
    lb = (
        canon.join(
            lab.select(F.col("vid").alias("src"), F.col("community").alias("ca")),
            "src",
        )
        .join(
            lab.select(F.col("vid").alias("dst"), F.col("community").alias("cb")),
            "dst",
        )
        .persist()
    )
    m = lb.count()
    # volume: degrees within the labeled subgraph, summed per community
    vol = (
        lb.select(F.col("ca").alias("community"))
        .unionByName(lb.select(F.col("cb").alias("community")))
        .groupBy("community")
        .agg(F.count("*").alias("volume"))
    )
    cut = (
        lb.filter(F.col("ca") != F.col("cb"))
        .select(F.explode(F.array("ca", "cb")).alias("community"))
        .groupBy("community")
        .agg(F.count("*").alias("cut_edges"))
    )
    denom = F.least(F.col("volume"), F.lit(2 * m) - F.col("volume"))
    phi = F.when(
        denom > 0,
        F.coalesce("cut_edges", F.lit(0)).cast("double") / denom,
    ).otherwise(0.0)
    if round_to is not None:
        phi = F.round(phi, round_to)
    out = vol.join(cut, "community", "left").select(
        "community",
        F.coalesce("cut_edges", F.lit(0)).alias("cut_edges"),
        "volume",
        phi.alias("phi"),
    )
    # O(#communities) rows — materialize so the labeled-edge cache `lb`
    # can be released instead of leaking for the session (ADVICE r2)
    out = out.localCheckpoint(eager=True)
    lb.unpersist()
    return out


def scan_similarity(edges: DataFrame, round_to: int | None = 6) -> DataFrame:
    """K38: SCAN structural similarity per undirected edge

        sigma(u,v) = |G(u) ∩ G(v)| / sqrt(|G(u)| * |G(v)|)

    over CLOSED neighborhoods G(x) = N(x) ∪ {x} [PUB: Xu, Yuruk, Feng &
    Schweiger, "SCAN: a structural clustering algorithm for networks",
    KDD 2007]. For an edge (u,v): |G(u) ∩ G(v)| = common(u,v) + 2 (the
    shared neighbors plus u and v themselves) and |G(x)| = deg(x) + 1, so
    the whole statistic reduces to per-edge triangle support (K24's
    degree-oriented _edge_support — wedge fan-out bounded by oriented
    out-degree, hub-safe) joined to K1 degrees: no new shuffle shape.
    Thresholding sigma >= eps plus a mu-core peel is full SCAN clustering;
    this similarity table is the reusable operator (it doubles as the
    edge-density signal hub/outlier detection reads).

    Returns (src, dst, n_common, sigma) with src < dst canonical and sigma
    rounded to `round_to` for cross-engine hash stability.
    """
    from pcd_spark.graph.triangles import _BCAST_DEG_MAX_V, _oriented
    from pcd_spark.graph.truss import _edge_support

    canon = canonical_undirected(edges).persist()
    n_e = canon.count()
    both = canon.unionByName(
        canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = both.groupBy(F.col("src").alias("vid")).agg(F.count("*").alias("deg"))
    # V <= 2E, so the O(V) degree table broadcasts whenever the edge count
    # is within the orientation-join bound — both per-endpoint joins become
    # map-side hash joins with zero shuffle of the O(E) edge side (the
    # _oriented discipline)
    if 2 * n_e <= _BCAST_DEG_MAX_V:
        deg = F.broadcast(deg)
    # include_zeros folds the no-triangle edges into the support hash agg
    # itself — every canonical edge comes back with its support, so no
    # O(E)-to-O(E) join of supports onto the edge table is ever planned
    sup = _edge_support(_oriented(canon), n_e, include_zeros=True).select(
        F.least("u", "v").alias("src"),
        F.greatest("u", "v").alias("dst"),
        "sup",
    )
    out = sup.join(
        deg.withColumnRenamed("vid", "src").withColumnRenamed("deg", "ds"),
        "src",
    ).join(
        deg.withColumnRenamed("vid", "dst").withColumnRenamed("deg", "dd"),
        "dst",
    )
    n_common = F.col("sup")
    sigma = (n_common + 2) / F.sqrt((F.col("ds") + 1.0) * (F.col("dd") + 1.0))
    if round_to is not None:
        sigma = F.round(sigma, round_to)
    res = out.select(
        "src", "dst", n_common.alias("n_common"), sigma.alias("sigma")
    )
    # O(E)-rows result; materialize so the canonical-edge cache is released
    # instead of leaking for the session (the conductance_terms discipline)
    res = res.localCheckpoint(eager=True)
    canon.unpersist()
    return res


def partition_agreement(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    round_to: int | None = 6,
) -> DataFrame:
    """K40: agreement between two partitions of the same item set —
    adjusted Rand index [PUB: Hubert & Arabie 1985] and sqrt-normalized
    mutual information [PUB: Strehl & Ghosh 2002], the two standard scores
    for comparing community-detection outputs (LPA vs Louvain, run k vs
    run k+1, detected vs ground truth).

    `pairs` is DataFrame(item labeled a_col by partition A, b_col by B),
    one row per item. Returns one row (n_items, ari, nmi).

    Scale shape: ONE hash aggregation over the item table builds the
    contingency table (map-side combined; its size is |A-labels| x
    |B-labels|, data-scale-free); margins are two aggs OVER the
    contingency table (never over items); the MI term joins contingency
    to both margin tables — broadcast, since margins are label-domain-
    sized. All pair-count/entropy sums then reduce to O(1) scalars,
    collected and emitted as one literal row (the k37 discipline: joining
    1-row aggs would plan a BNLJ). No sort, no window, nothing O(items)
    after the first agg."""
    cont = (
        pairs.groupBy(F.col(a_col).alias("_a"), F.col(b_col).alias("_b"))
        .agg(F.count("*").alias("nij"))
        .persist()
    )
    am = cont.groupBy("_a").agg(F.sum("nij").alias("ai"))
    bm = cont.groupBy("_b").agg(F.sum("nij").alias("bj"))

    def _pairs2(c):
        # cast BEFORE the multiply: c*(c-1) in int64 wraps silently past
        # ~3.04e9 items per cell/margin — double trades exactness above
        # 2^53 for never-overflows, and the 6-dp rounding absorbs the
        # relative 1e-16 (the DuckDB oracle promotes via its /2.0 too)
        d = c.cast("double")
        return F.sum(d * (d - F.lit(1.0)) / F.lit(2.0))

    s_ij = cont.agg(
        _pairs2(F.col("nij")).alias("s"), F.sum("nij").alias("n")
    ).first()
    if s_ij["n"] is None or int(s_ij["n"]) < 2:
        cont.unpersist()
        raise ValueError(
            "partition_agreement: need >= 2 labeled items "
            f"(got {0 if s_ij['n'] is None else int(s_ij['n'])}) — "
            "an empty/degenerate join upstream?"
        )
    n = float(s_ij["n"])
    sij = float(s_ij["s"])
    sa = float(am.agg(_pairs2(F.col("ai")).alias("s")).first()["s"])
    sb = float(bm.agg(_pairs2(F.col("bj")).alias("s")).first()["s"])
    mi = float(
        cont.join(F.broadcast(am), "_a")
        .join(F.broadcast(bm), "_b")
        .agg(
            F.sum(
                (F.col("nij") / n)
                * F.log(n * F.col("nij") / (F.col("ai") * F.col("bj")))
            ).alias("mi")
        )
        .first()["mi"]
    )
    ha = float(
        am.agg((-F.sum((F.col("ai") / n) * F.log(F.col("ai") / n))).alias("h"))
        .first()["h"]
    )
    hb = float(
        bm.agg((-F.sum((F.col("bj") / n) * F.log(F.col("bj") / n))).alias("h"))
        .first()["h"]
    )
    cont.unpersist()
    npairs = n * (n - 1) / 2.0
    expected = sa * sb / npairs
    denom = (sa + sb) / 2.0 - expected
    ari = (sij - expected) / denom if denom != 0.0 else 1.0
    nmi = mi / (ha * hb) ** 0.5 if ha > 0.0 and hb > 0.0 else 1.0
    spark = pairs.sparkSession
    # round via F.round, not Python round(): Python rounds half-to-even,
    # Spark/DuckDB ROUND half-away-from-zero — the repo-wide cross-engine
    # tie discipline (a score landing exactly on a 5 at the 7th decimal
    # must hash identically on both engines)
    ari_c, nmi_c = F.lit(ari).cast("double"), F.lit(nmi).cast("double")
    if round_to is not None:
        ari_c = F.round(ari_c, round_to)
        nmi_c = F.round(nmi_c, round_to)
    return spark.range(1).select(
        F.lit(int(n)).cast("long").alias("n_items"),
        ari_c.alias("ari"),
        nmi_c.alias("nmi"),
    )


def rich_club(
    edges: DataFrame,
    ks: tuple = (4, 8, 16, 32),
    round_to: int | None = 6,
) -> DataFrame:
    """K41: rich-club coefficient phi(k) = 2*E_k / (N_k*(N_k-1)) over an
    undirected canonical edge table, for each degree threshold k in `ks`
    [PUB: Zhou & Mondragon 2004; Colizza et al., Nature Physics 2006] —
    do high-degree hubs link to each other more than chance? The classic
    core-structure diagnostic of internet/citation/dependency graphs.

    Scale shape: degrees are ONE hash agg (K1); each edge picks up
    min(deg_src, deg_dst) via two vid-keyed equi-joins (the k6 pattern —
    degree table broadcast below the same cap, shuffled join above); then
    EVERY threshold is a conditional SUM in ONE O(E)-input aggregation —
    no per-k job, no k x E fan-out join (a thresholds-table join would
    either BNLJ or replicate the edge table |ks| times). The single agg
    row is O(1), collected, and expanded to |ks| literal rows."""
    canon = canonical_undirected(edges).persist()
    sym = canon.unionByName(
        canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy(F.col("src").alias("vid")).agg(
        F.count("*").alias("deg")
    )
    ed = (
        canon.join(deg.withColumnRenamed("vid", "src"), "src")
        .withColumnRenamed("deg", "ds")
        .join(
            deg.withColumnRenamed("vid", "dst").withColumnRenamed("deg", "dd"),
            "dst",
        )
        .select(F.least("ds", "dd").alias("min_deg"))
    )
    e_aggs = ed.agg(
        *[
            F.sum((F.col("min_deg") > k).cast("long")).alias(f"e{k}")
            for k in ks
        ]
    ).first()
    n_aggs = deg.agg(
        *[F.sum((F.col("deg") > k).cast("long")).alias(f"n{k}") for k in ks]
    ).first()
    canon.unpersist()
    rows = []
    for k in ks:
        nk, ek = int(n_aggs[f"n{k}"] or 0), int(e_aggs[f"e{k}"] or 0)
        phi = 2.0 * ek / (nk * (nk - 1)) if nk >= 2 else None
        if phi is not None and round_to is not None:
            phi = round(phi, round_to)
        rows.append((k, nk, ek, phi))
    spark = edges.sparkSession
    return spark.createDataFrame(
        rows, "k int, n_k bigint, e_k bigint, phi double"
    )


def burt_constraint(edges: DataFrame, round_to: int | None = 6) -> DataFrame:
    """K52: Burt's structural-holes constraint per vertex —
    (vid: long, constraint_score: double) [PUB: Burt 2004, "Structural
    holes and good ideas", AJS 110(2); nx.constraint is the reference
    formulation]. Low constraint = the vertex brokers between otherwise
    disconnected neighbors (a structural hole — in a dependency graph, a
    module whose removal disconnects supply chains; in a co-occurrence
    graph, a bridging concept).

        p_ij  = A_ij / Σ_k A_ik            (unweighted: 1/deg(i))
        c(i)  = Σ_{j∈N(i)} ( p_ij + Σ_q p_iq·p_qj )²

    Spark shape: deg is one hash-agg; the indirect term Σ_q p_iq·p_qj is a
    single self-equi-join of the normalized edge table on the middle vertex
    q followed by a (i,j)-keyed hash-agg — O(Σ_q deg(q)²) intermediate rows,
    the inherent size of the two-path set. That is the scale boundary of
    every structural-holes metric: at 10^12 edges you run it on a
    degree-capped or ego-sampled subgraph (the K23/K43 bounded-cohort
    pattern), never the raw hub graph — a single 10^7-degree hub alone would
    emit 10^14 two-paths. No skew mitigation can remove that term; capping
    IS the algorithm at scale. Fully SQL-expressible → DuckDB-oracled
    (hash row), plus nx.constraint parity in pytest.

    round_to: round the final score (both engines) so cross-engine float
    summation-order noise cannot flip the 6th decimal; None disables."""
    sym = edges.filter(F.col("src") != F.col("dst")).select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    both = sym.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        sym.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    deg = both.groupBy(F.col("src").alias("vid")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    p = both.join(deg.withColumnRenamed("vid", "src"), "src").select(
        F.col("src").alias("i"),
        F.col("dst").alias("j"),
        (F.lit(1.0) / F.col("deg")).alias("p"),
    )
    # indirect mass through every middle vertex q: one self-join on q
    ind = (
        p.select(F.col("i"), F.col("j").alias("q"), F.col("p").alias("piq"))
        .join(
            p.select(F.col("i").alias("q"), F.col("j"), F.col("p").alias("pqj")),
            "q",
        )
        .filter(F.col("i") != F.col("j"))
        .groupBy("i", "j")
        .agg(F.sum(F.col("piq") * F.col("pqj")).alias("ind"))
    )
    lc = p.join(ind, ["i", "j"], "left").select(
        "i",
        F.pow(F.col("p") + F.coalesce(F.col("ind"), F.lit(0.0)), 2).alias("l"),
    )
    out = lc.groupBy(F.col("i").alias("vid")).agg(
        F.sum("l").alias("constraint_score")
    )
    if round_to is not None:
        out = out.select(
            "vid", F.round("constraint_score", round_to).alias("constraint_score")
        )
    return out
