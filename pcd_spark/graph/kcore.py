"""K10 — k-core extraction; K27 — full core decomposition (round 2 ext.);
K51 — onion decomposition (round 3 ext.).

The k-core is the maximal subgraph in which every vertex has degree >= k
[PUB: Seidman 1983, "Network structure and minimum degree"]. Standard
iterative peeling: repeatedly drop vertices with degree < k (recomputing
degrees on the surviving subgraph) until stable — the order of removal
does not affect the fixpoint, so synchronous supersteps compute exactly
the sequential result.

Superstep shape (reuses the K7 driver — resumable, observe-fused
convergence): state = (vid, deg) over currently-surviving vertices; each
step semi-joins the persisted symmetric edge list against the active set
on BOTH endpoints (two O(V) semi-joins into the O(E) edge blocks — the
same shuffle-hash discipline as CC) and re-aggregates degrees. The
convergence delta is "did any surviving vertex's degree change": a removal
with surviving neighbors always changes their degrees, and a removal whose
neighbors all left in the same step cannot enable further removals, so
delta == 0 is exactly the peeling fixpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pcd_spark.graph.edges import symmetrize
from pcd_spark.graph.partition import adaptive_num_parts
from pcd_spark.graph.superstep import run_supersteps
from pcd_spark.storage import CheckpointStore


def k_core(
    edges: DataFrame,
    k: int,
    max_iter: int = 100,
    num_parts: int | None = None,
    store: CheckpointStore | None = None,
    checkpoint_every: int = 10,
    stats_out: dict | None = None,
) -> DataFrame:
    """Vertices of the k-core with their within-core degree:
    (vid: long, core_deg: long). Empty result when no k-core exists."""
    if k < 1:
        raise ValueError("k must be >= 1")
    # persist the (possibly derived) input once: referenced by the
    # adaptive sizing count and the graph-normal-form build below
    edges = edges.persist()
    p = num_parts or adaptive_num_parts(edges)

    sym = symmetrize(edges).repartition(p, "src").persist()
    _gtok = f"edges={sym.count()}"

    deg0 = sym.groupBy(F.col("src").alias("vid")).agg(
        F.count("*").alias("deg")
    )
    init = deg0.select("vid", "deg", F.lit(1.0).alias("_delta"))

    def step(state: DataFrame, _i: int) -> DataFrame:
        act = state.filter(F.col("deg") >= k).select("vid")
        surviving = sym.join(
            act.withColumnRenamed("vid", "src").hint("shuffle_hash"),
            "src",
            "leftsemi",
        ).join(
            act.withColumnRenamed("vid", "dst").hint("shuffle_hash"),
            "dst",
            "leftsemi",
        )
        nd = (
            surviving.repartition(p, "src")
            .groupBy(F.col("src").alias("vid"))
            .agg(F.count("*").alias("deg"))
        )
        return nd.join(
            state.select("vid", F.col("deg").alias("_old")).hint(
                "shuffle_hash"
            ),
            "vid",
        ).select(
            "vid",
            "deg",
            (F.col("deg") != F.col("_old")).cast("double").alias("_delta"),
        )

    final, iters, metrics = run_supersteps(
        init, step, tol=0.5, max_iter=max_iter,
        store=store, checkpoint_every=checkpoint_every, graph_token=_gtok,
    )
    if stats_out is not None:
        stats_out["iterations"] = iters
        stats_out["metrics"] = metrics
    edges.unpersist()
    return final.filter(F.col("deg") >= k).select(
        "vid", F.col("deg").alias("core_deg")
    )


def coreness(
    edges: DataFrame,
    max_iter: int = 100,
    num_parts: int | None = None,
    store: CheckpointStore | None = None,
    checkpoint_every: int = 10,
    stats_out: dict | None = None,
) -> DataFrame:
    """K27: core number of EVERY vertex — (vid: long, core: long) — in one
    run, where K10 answers membership for a single k.

    Algorithm: iterated neighborhood h-index [PUB: Lü, Zhou, Zhang &
    Stanley 2016, "The H-index of a network node and its relation to
    degree and coreness", Nat. Commun. 7:10168]. State h(v) starts at
    deg(v); each superstep replaces it with the h-index of the neighbors'
    current values (the largest h such that >= h neighbors have value
    >= h). The sequence is monotonically non-increasing and provably
    converges to the core number on every finite graph — synchronous
    supersteps therefore reproduce the sequential peeling result exactly,
    with no vertex-removal ordering to coordinate across partitions.

    Plan shape per superstep: ONE vid-keyed shuffle. The h-index needs the
    neighbor multiset ranked, so the reduction is a per-vid window
    (row_number over nh desc) + hash-agg max(least(rank, nh)) — heavier
    than a plain sum but still fully JVM-side codegen, and the window key
    is the superstep partition key, so ranking rides the same exchange as
    the aggregation. Skew note: a hub's neighborhood ranks on one reducer;
    values are bounded by its degree, and AQE skew-split applies — same
    exposure as CC's pointer-jump, documented there.
    """
    from pyspark.sql import Window

    edges = edges.persist()
    p = num_parts or adaptive_num_parts(edges)

    sym = symmetrize(edges).repartition(p, "src").persist()
    _gtok = f"edges={sym.count()}"

    init = (
        sym.groupBy(F.col("src").alias("vid"))
        .agg(F.count("*").cast("long").alias("h"))
        .select("vid", "h", F.lit(1.0).alias("_delta"))
    )

    w = Window.partitionBy("vid").orderBy(F.desc("nh"), F.asc("dst"))

    def step(state: DataFrame, _i: int) -> DataFrame:
        nbr_h = sym.join(
            state.select(F.col("vid").alias("dst"), F.col("h").alias("nh"))
            .hint("shuffle_hash"),
            "dst",
        ).select(F.col("src").alias("vid"), "dst", "nh")
        hnew = (
            nbr_h.repartition(p, "vid")
            .withColumn("rk", F.row_number().over(w))
            .groupBy("vid")
            .agg(F.max(F.least(F.col("rk"), F.col("nh"))).alias("h2"))
        )
        return hnew.join(
            state.select("vid", F.col("h").alias("_old")).hint("shuffle_hash"),
            "vid",
        ).select(
            "vid",
            F.col("h2").cast("long").alias("h"),
            (F.col("h2") != F.col("_old")).cast("double").alias("_delta"),
        )

    final, iters, metrics = run_supersteps(
        init, step, tol=0.5, max_iter=max_iter,
        store=store, checkpoint_every=checkpoint_every, graph_token=_gtok,
    )
    if stats_out is not None:
        stats_out["iterations"] = iters
        stats_out["metrics"] = metrics
    edges.unpersist()
    return final.select("vid", F.col("h").alias("core"))


def onion_layers(
    edges: DataFrame,
    max_iter: int = 10_000,
    num_parts: int | None = None,
    small_graph_cutoff: int = 2_000_000,
    layer_batch: int = 6,
    stats_out: dict | None = None,
) -> DataFrame:
    """K51: onion decomposition — (vid: long, layer: int) for every
    non-isolated vertex [PUB: Hébert-Dufresne, Grochow & Allard 2016,
    "Multi-scale structure and topological anomaly detection via a new
    network statistic: The onion decomposition", Sci. Rep. 6:31708].

    The onion layer refines coreness (K27): peel the graph layer by layer,
    where layer L removes EVERY remaining vertex whose remaining degree is
    <= the current core threshold (the running max of the minimum remaining
    degree). Vertices in the same k-core get DIFFERENT layers depending on
    how deep inside the core they sit — the per-layer size histogram is the
    network's "onion spectrum" (anomaly/structure fingerprint).

    The batch-removal rule is synchronous by definition (networkx's
    sequential loop fixes each layer from a degree snapshot before any
    removal), so distributed supersteps reproduce the sequential result
    exactly; exactness vs nx.onion_layers and dual-path equality are pinned
    in tests/test_round3_ops.py.

    Round-4 cost model (all three measured in this sandbox): the
    decomposition is LAYER-COUNT-bound — the sf0.1 co-occurrence graph
    (1.3M edges) needs 144 layers, a 200k-edge power-law graph 269 — and
    each distributed layer costs ~3 stages of fixed latency regardless of
    how little it peels. Three mechanisms attack that, in order of
    leverage:

    1. DRIVER PEEL for graphs <= `small_graph_cutoff` edges (default 2M —
       deliberately 10x the generic 200k class-scheduled rule: the generic
       cutoff assumes ~10 supersteps, onion runs ~100s of rounds, so the
       crossover sits an order of magnitude higher; the O(E) Python peel
       runs 1.3M edges in ~2 s vs 65 s for the round-3 distributed form).
       Result-identical — the rule is a deterministic pure function of
       integer degrees; equality is pinned in tests. Set
       small_graph_cutoff=0 to force the distributed path.
       DRIVER-MEMORY NOTE: the collapse collects up to `small_graph_cutoff`
       edge Rows and builds a Python adjacency dict on the driver — at the
       2M default that is a few hundred MB transient, sized for this repo's
       32g driver. Library callers on small drivers (<4g) should pass
       small_graph_cutoff≈200_000 (the generic class rule) or scale it to
       ~edges_per_GB ≈ 60k × driver-memory-GB.
    2. TAIL COLLAPSE in the distributed path: the remaining-subgraph edge
       count (sum of live degrees / 2 — free on the batch Observation)
       falls monotonically, and once it is <= the cutoff the rest of the
       peel — exactly the layer-count-heavy deep-core tail, since early
       layers strip whole low-degree classes — finishes on the driver in
       one collect. At 10^12 edges this is the operative mechanism: the
       distributed rounds do the O(E) mass removal, the driver does the
       O(layers) sequential remainder on a bounded subgraph.
    3. LAYER BATCHING: `layer_batch` consecutive layers are unrolled into
       ONE job at a frozen core threshold, paying the per-job fixed cost
       (driver round-trip, observe, eager localCheckpoint) once per batch.
       EXACT by a no-op lemma: the only way the frozen threshold can be
       stale is when the min remaining degree has risen ABOVE it (exactly
       the event that raises `core`), and then the peel set `deg <= core`
       is EMPTY — an empty peel changes no degree, so every later
       sub-layer in the batch is empty too. A batch therefore advances
       exactly min(layer_batch, cascade length at this core) real layers
       and never needs rollback; the per-sub-layer peel counts ride the
       batch's single Observation, and the driver re-raises `core`
       between batches exactly as the sequential rule does. (Measured:
       batching alone is a ~5-10% win — per-layer STAGE latency, which it
       cannot remove, dominates the job-submission cost it does remove —
       hence mechanisms 1 and 2 above carry the headline number.)

    Plan shape per sub-layer: one peeled-batch semi-join into the persisted
    symmetric edge blocks + one decrement hash-agg + one vid-keyed left
    join (incremental degree maintenance — total degree work across all
    layers is O(E), not O(E·layers)). Layer count is graph-dependent: tens
    on power-law graphs (each layer strips a whole degree class), but O(V)
    on adversarial chains — max_iter exhaustion raises rather than
    returning a partial decomposition."""
    edges = edges.persist()
    p = num_parts or adaptive_num_parts(edges)
    sym = symmetrize(edges).repartition(p, "src").persist()
    n_sym = sym.count()

    if n_sym // 2 <= small_graph_cutoff:
        pairs = [
            (r["src"], r["dst"])
            for r in sym.filter(F.col("src") < F.col("dst")).collect()
        ]
        res = _onion_local(pairs, stats_out)
        spark = edges.sparkSession
        sym.unpersist()
        edges.unpersist()
        return spark.createDataFrame(res, "vid long, layer int")

    # ONE job per layer, the K7 superstep discipline: state (vid, deg,
    # layer) carries assigned (layer > 0, deg frozen) and remaining
    # (layer == 0) rows in a single table; the next layer's min-remaining-
    # degree and remaining-count Allreduce RIDES the eager localCheckpoint
    # via observe() instead of costing a separate scalar job. (Measured at
    # sf0.1, 1.3M edges: the three-jobs-per-layer form took 152 s; this
    # form is the same rule with the scalar and the assigned-set fused in.)
    from pyspark.sql import Observation

    from pcd_spark.graph.superstep import reset_plan_stats

    if layer_batch < 1:
        raise ValueError("layer_batch must be >= 1")

    def _watch(df: DataFrame, tag: str, peel_layers: list[int]):
        obs = Observation(tag)
        ck = df.observe(
            obs,
            F.min(F.when(F.col("layer") == 0, F.col("deg"))).alias("mdeg"),
            F.sum((F.col("layer") == 0).cast("long")).alias("nv"),
            # live-degree sum = 2 x remaining-subgraph edges (the state
            # invariant: a live vertex's deg counts only live neighbors)
            # — the tail-collapse trigger rides the same Observation
            F.sum(F.when(F.col("layer") == 0, F.col("deg"))).alias("sdeg"),
            *[
                F.sum((F.col("layer") == lv).cast("long")).alias(f"n{lv}")
                for lv in peel_layers
            ],
        ).localCheckpoint(eager=True)
        got = obs.get
        peels = [int(got[f"n{lv}"] or 0) for lv in peel_layers]
        return (
            reset_plan_stats(ck),
            got["mdeg"],
            int(got["nv"] or 0),
            int(got["sdeg"] or 0),
            peels,
        )

    state, mdeg, nv, sdeg, _ = _watch(
        sym.groupBy(F.col("src").alias("vid"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .select("vid", "deg", F.lit(0).alias("layer")),
        "onion_init",
        [],
    )
    core = 1
    layer = 0
    jobs = 0
    while layer < max_iter:
        if nv == 0:
            break
        if 0 < sdeg // 2 <= small_graph_cutoff or (
            small_graph_cutoff > 0 and sdeg == 0
        ):
            # TAIL COLLAPSE: the remaining subgraph fits one task's
            # working set — finish the (layer-count-heavy) deep-core peel
            # on the driver. Same rule, same result: the live state's deg
            # IS the remaining-subgraph degree, so collecting the live
            # internal edges + live vertex set reproduces it exactly.
            alive = state.filter(F.col("layer") == 0)
            vids = [r["vid"] for r in alive.select("vid").collect()]
            a_src = alive.select(F.col("vid").alias("src"))
            a_dst = alive.select(F.col("vid").alias("dst"))
            pairs = [
                (r["src"], r["dst"])
                for r in sym.join(a_src.hint("shuffle_hash"), "src", "leftsemi")
                .join(a_dst.hint("shuffle_hash"), "dst", "leftsemi")
                .filter(F.col("src") < F.col("dst"))
                .select("src", "dst")
                .collect()
            ]
            tail_stats: dict = {}
            tail = _onion_local(
                pairs, tail_stats, vids=vids, core0=core, layer0=layer
            )
            jobs += 1
            layer = tail_stats["layers"]
            core = tail_stats["max_core"]
            spark = edges.sparkSession
            out = (
                state.filter(F.col("layer") > 0)
                .select("vid", F.col("layer").cast("int").alias("layer"))
                .unionByName(
                    spark.createDataFrame(
                        tail or [], "vid long, layer int"
                    )
                )
                .localCheckpoint(eager=True)
            )
            if stats_out is not None:
                stats_out["layers"] = layer
                stats_out["max_core"] = core
                stats_out["jobs"] = jobs
                stats_out["tail_collapsed_at"] = sdeg // 2
            sym.unpersist()
            edges.unpersist()
            return out
        core = max(core, int(mdeg))
        bsz = min(layer_batch, max_iter - layer)
        sub_layers = list(range(layer + 1, layer + bsz + 1))
        cur = state
        batch_cached: list[DataFrame] = []
        for lv in sub_layers:
            upd = cur.select(
                "vid",
                "deg",
                F.when(
                    (F.col("layer") == 0) & (F.col("deg") <= F.lit(core)),
                    F.lit(lv),
                )
                .otherwise(F.col("layer"))
                .alias("layer"),
            )
            # LAZY localCheckpoint: `upd` is a diamond (read by the
            # decrement semi-join AND the final merge join). Without a
            # boundary each consumer re-executes the whole unrolled
            # prefix, compounding ~2x per sub-layer; a plain persist()
            # shares the blocks but leaves the planner staring at B
            # nested InMemoryRelations (measured: B=4 SLOWER than B=1
            # either way on a 200k-edge graph — planning cost, not
            # compute). The lazy checkpoint rewrites the plan to a
            # LogicalRDD leaf immediately while deferring computation to
            # the batch's single action, so both consumers share blocks
            # AND every sub-layer plan stays shallow.
            upd = upd.localCheckpoint(eager=False)
            batch_cached.append(upd)
            # INCREMENTAL degree maintenance: a remaining vertex's new
            # degree is deg − |peeled neighbors this sub-layer| — one
            # semi-join + hash-agg over only the edges INCIDENT TO THE
            # PEELED BATCH, so total degree work across all layers is
            # O(E), not O(E·layers) (the recompute-from-scratch form
            # rescanned the 1.3M-edge table ~60 times at sf0.1).
            # Vertices decremented to 0 peel next sub-layer (the nx rule).
            peeled = upd.filter(F.col("layer") == F.lit(lv)).select("vid")
            dec = (
                sym.join(
                    peeled.withColumnRenamed("vid", "src").hint(
                        "shuffle_hash"
                    ),
                    "src",
                    "leftsemi",
                )
                .groupBy(F.col("dst").alias("vid"))
                .agg(F.count(F.lit(1)).alias("_dec"))
            )
            cur = upd.join(dec.hint("shuffle_hash"), "vid", "left").select(
                "vid",
                F.when(
                    F.col("layer") == 0,
                    F.col("deg") - F.coalesce("_dec", F.lit(0)),
                )
                .otherwise(F.col("deg"))
                .alias("deg"),
                "layer",
            )
        old = state
        state, mdeg, nv, sdeg, peels = _watch(
            cur, f"onion_{layer}", sub_layers
        )
        old.unpersist()
        for df in batch_cached:
            df.unpersist()
        jobs += 1
        # no-op lemma: empty sub-layers form a suffix (an empty peel leaves
        # every degree — hence the next peel set — unchanged), so the batch
        # advanced exactly `sum(n > 0)` real layers; `core >= mdeg` at
        # entry guarantees the FIRST sub-layer peels the min-degree vertex,
        # so progress (advanced >= 1) and termination are unconditional.
        # RuntimeError, not assert: these two invariants are the layer
        # accounting's only correctness guard, and assert is stripped under
        # `python -O` — a future edit breaking the frozen-core invariant
        # must fail loudly, not silently mislabel layers (ADVICE r4).
        advanced = sum(1 for n in peels if n > 0)
        if advanced < 1:
            raise RuntimeError("onion batch made no progress")
        if not all(n > 0 for n in peels[:advanced]):
            raise RuntimeError(
                "onion no-op lemma violated: empty sub-layer before a "
                "non-empty one"
            )
        layer += advanced
    else:
        if nv != 0:
            raise RuntimeError(
                f"onion_layers: peeling not finished after max_iter="
                f"{max_iter} layers — chain-like graphs need O(V) layers; "
                "raise max_iter"
            )
    if stats_out is not None:
        stats_out["layers"] = layer
        stats_out["max_core"] = core
        stats_out["jobs"] = jobs
    out = state.select(
        "vid", F.col("layer").cast("int").alias("layer")
    ).localCheckpoint(eager=True)
    sym.unpersist()
    edges.unpersist()
    return out


def _onion_local(
    pairs,
    stats_out: dict | None,
    vids=None,
    core0: int = 1,
    layer0: int = 0,
):
    """Driver-side onion peel — the same batch rule as the distributed path
    (and as networkx's sequential loop, whose per-layer membership is fixed
    from a snapshot before any removal).

    `vids`/`core0`/`layer0` support the tail collapse: an explicit live
    vertex universe (a live vertex can be isolated WITHIN the remaining
    subgraph — all neighbors already peeled — and must still get a layer),
    the core threshold carried in from the distributed phase, and the
    layer offset of the layers already assigned."""
    from collections import defaultdict

    nbrs: dict[int, set[int]] = defaultdict(set)
    for u, v in pairs:
        if u != v:
            nbrs[u].add(v)
            nbrs[v].add(u)
    if vids is not None:
        deg = {int(v): len(nbrs.get(int(v), ())) for v in vids}
    else:
        deg = {v: len(ns) for v, ns in nbrs.items()}
    core = core0
    layer = layer0
    out: list[tuple[int, int]] = []
    while deg:
        layer += 1
        core = max(core, min(deg.values()))
        batch = [v for v, d in deg.items() if d <= core]
        for v in batch:
            out.append((v, layer))
        doomed = set(batch)
        for v in batch:
            for n in nbrs[v]:
                if n in deg and n not in doomed:
                    deg[n] -= 1
            del deg[v]
    if stats_out is not None:
        stats_out["layers"] = layer
        stats_out["max_core"] = core
    return sorted(out)
