"""K21 — HyperBall: approximate neighborhood function + effective diameter.

HyperBall [PUB: Boldi & Vigna 2013, "In-Core Computation of Geometric
Centralities with HyperBall"; Flajolet et al. 2007 HyperLogLog] is THE
web-scale distance-distribution algorithm — it computed the effective
diameter of the Facebook graph (721M vertices). Each vertex carries a
HyperLogLog counter of the vertices within distance t; superstep t+1
unions every vertex's counter with its neighbors' counters (HLL union =
elementwise register max), so after t supersteps counter(v) estimates
|B(v, t)|, the ball of radius t. Summing over v gives the neighborhood
function N(t); the effective diameter is the smallest t with
N(t) >= ratio * N(inf).

Spark-first shape (no Python in the plan):

- registers: an ``array<int>`` column of m = 2^b registers. Register index
  and rank come from ``xxhash64(vid)`` — pure JVM expressions: index =
  pmod(h, m); rank = (number of trailing zeros of h >> b) + 1, computed as
  ``log2(w & -w)`` (isolating the lowest set bit; exact in doubles because
  it is a power of two).
- HLL union is a hash aggregation with m codegen'd ``MAX(regs[i])``
  columns (same discipline as x9 simhash's 48 SUMs): map-side combine
  collapses each partition to one partial row per vertex BEFORE the
  shuffle, so shuffle volume is O(V_distinct * m) per superstep, never
  O(E * m).
- the per-distance neighborhood function rides the fused convergence
  Allreduce (run_supersteps extra_aggs + extras_log) — estimating N(t)
  costs zero extra Spark jobs.
- memory/shuffle knob: m trades accuracy (RSE ~ 1.04/sqrt(m)) for state
  width; m=64 (default) is 1.04/8 ~ 13% per-vertex, much tighter on the
  SUM over vertices. At 10^12 vertices, m=64 ints is ~256 B/vertex of
  state — the O(V) state vs O(E) edges asymmetry the superstep engine
  already exploits.

Convergence is exact: registers are monotone non-decreasing and bounded,
and a superstep where NO register changes is the fixpoint (delta = count
of vertices whose sketch changed).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pcd_spark.graph.edges import symmetrize
from pcd_spark.graph.partition import adaptive_num_parts
from pcd_spark.graph.superstep import run_supersteps
from pcd_spark.storage import CheckpointStore


def _alpha(m: int) -> float:
    """HLL bias-correction constant [Flajolet et al. 2007, fig. 3]."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _hll_estimate(regs, m: int):
    """HLL cardinality estimate of one register array (JVM expression).

    Standard estimator with the small-range (linear counting) correction;
    the 64-bit-hash variant needs no large-range correction.
    """
    inv_sum = F.aggregate(
        regs,
        F.lit(0.0),
        lambda acc, x: acc + F.pow(F.lit(2.0), -x.cast("double")),
    )
    raw = F.lit(_alpha(m) * m * m) / inv_sum
    zeros = F.size(F.filter(regs, lambda x: x == F.lit(0)))
    return F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > F.lit(0)),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)


def _init_regs(vid, m: int, b: int, salt: int):
    """Registers of the singleton HLL {vid}: one register set to the rank.

    rank = trailing-zero count of the hash suffix + 1 — a geometric(1/2)
    variable, the HLL register update for a single element. ``w & -w``
    isolates the lowest set bit; log2 of a power of two is exact.
    """
    h = F.xxhash64(vid, F.lit(salt))
    idx = F.pmod(h, F.lit(m)).cast("int")
    w = F.shiftrightunsigned(h, b)
    rank = (
        F.when(w == F.lit(0), F.lit(64 - b + 1))
        .otherwise(F.round(F.log2(w.bitwiseAND(-w))).cast("int") + F.lit(1))
    )
    return F.array(
        *[F.when(F.lit(i) == idx, rank).otherwise(F.lit(0)) for i in range(m)]
    )


def _hyperball_core(
    edges: DataFrame,
    m: int,
    max_iter: int,
    harmonic: bool,
    num_parts: int | None,
    store: CheckpointStore | None,
    checkpoint_every: int,
    salt: int,
) -> tuple[DataFrame, list, int]:
    """Shared HyperBall loop. Returns (final_state, nf_log, iterations).

    State: (vid, regs[, est, harm], _delta). With harmonic=True each
    superstep also carries the running estimate and the harmonic
    accumulator harm += (|B(v,t)| - |B(v,t-1)|) / t — Boldi & Vigna's
    per-step geometric-centrality update, one extra double column and two
    JVM expressions, no extra shuffle."""
    if m & (m - 1) or m < 16:
        raise ValueError("m must be a power of two >= 16")
    b = int(math.log2(m))

    edges = edges.persist()
    p = num_parts or adaptive_num_parts(edges)
    sym = symmetrize(edges).repartition(p, "src").persist()
    _gtok = f"edges={sym.count()}"

    verts = sym.select(F.col("src").alias("vid")).distinct()
    init_cols = [
        F.col("vid"),
        _init_regs(F.col("vid"), m, b, salt).alias("regs"),
    ]
    if harmonic:
        init_cols += [
            _hll_estimate(_init_regs(F.col("vid"), m, b, salt), m).alias(
                "est"
            ),
            F.lit(0.0).alias("harm"),
        ]
    init = verts.select(*init_cols, F.lit(1.0).alias("_delta"))

    max_cols = [F.max(F.col("regs")[i]).alias(f"r{i}") for i in range(m)]
    rebuilt = F.array(*[F.col(f"r{i}") for i in range(m)]).alias("regs")

    def step(state: DataFrame, i: int) -> DataFrame:
        carry = ["est", "harm"] if harmonic else []
        prev = state.select("vid", "regs", *carry)
        # neighbor sketches flow along edges; self-union keeps monotonicity
        msgs = sym.join(
            prev.select(F.col("vid").alias("src"), "regs").hint(
                "shuffle_hash"
            ),
            "src",
        ).select(F.col("dst").alias("vid"), "regs")
        merged = (
            msgs.unionByName(prev.select("vid", "regs"))
            .repartition(p, "vid")
            .groupBy("vid")
            .agg(*max_cols)
            .select("vid", rebuilt)
        )
        joined = merged.join(
            prev.select(
                "vid", F.col("regs").alias("_old"), *carry
            ).hint("shuffle_hash"),
            "vid",
        )
        out_cols = [F.col("vid"), F.col("regs")]
        if harmonic:
            new_est = _hll_estimate(F.col("regs"), m)
            # registers are monotone so the raw estimate is too; the
            # linear-counting -> raw switch can dip by estimator jitter,
            # hence the clamp to keep harm non-decreasing
            out_cols += [
                new_est.alias("est"),
                (
                    F.col("harm")
                    + F.greatest(new_est - F.col("est"), F.lit(0.0))
                    / F.lit(float(i))
                ).alias("harm"),
            ]
        return joined.select(
            *out_cols,
            (F.col("regs") != F.col("_old")).cast("double").alias("_delta"),
        )

    nf_log: list = []
    final, iters, _metrics = run_supersteps(
        init,
        step,
        tol=0.5,
        max_iter=max_iter,
        store=store,
        checkpoint_every=checkpoint_every,
        graph_token=_gtok,
        extra_aggs={"nf": F.sum(_hll_estimate(F.col("regs"), m))},
        extras_out={},
        extras_log=nf_log,
    )
    edges.unpersist()
    return final, [(int(t), float(v["nf"])) for t, v in nf_log], iters


def hyperball(
    edges: DataFrame,
    m: int = 64,
    max_iter: int = 64,
    eff_diameter_ratio: float = 0.9,
    num_parts: int | None = None,
    store: CheckpointStore | None = None,
    checkpoint_every: int = 10,
    salt: int = 0x9B,
    stats_out: dict | None = None,
) -> DataFrame:
    """Approximate per-vertex ball sizes at convergence.

    Returns (vid: long, ball_est: double) — |B(v, diameter)| estimates,
    i.e. the (approximate) size of v's connected component. stats_out (if
    given) receives:

    - ``nf``: [(t, N(t)), ...] — the neighborhood function, t=0..T
    - ``effective_diameter``: smallest t with N(t) >= ratio * N(T)
    - ``iterations``: supersteps run

    The undirected ball is used (edges are symmetrized), matching K12's
    BFS distance semantics.
    """
    final, nf, iters = _hyperball_core(
        edges, m, max_iter, False, num_parts, store, checkpoint_every, salt
    )
    if stats_out is not None:
        n_final = nf[-1][1]
        eff = next(
            (t for t, v in nf if v >= eff_diameter_ratio * n_final),
            nf[-1][0],
        )
        stats_out["nf"] = nf
        stats_out["effective_diameter"] = eff
        stats_out["iterations"] = iters
    return final.select(
        "vid", _hll_estimate(F.col("regs"), m).alias("ball_est")
    )


def harmonic_centrality(
    edges: DataFrame,
    m: int = 64,
    max_iter: int = 64,
    num_parts: int | None = None,
    store: CheckpointStore | None = None,
    checkpoint_every: int = 10,
    salt: int = 0x9B,
    stats_out: dict | None = None,
) -> DataFrame:
    """K22 — approximate harmonic centrality H(v) = sum_{u != v} 1/d(u,v)
    [PUB: Boldi & Vigna 2014, "Axioms for centrality"; computed exactly as
    in HyperBall: H(v) = sum_t (|B(v,t)| - |B(v,t-1)|) / t].

    Returns (vid: long, harmonic: double). Same cost shape as hyperball():
    the accumulator is one double column riding the existing superstep —
    this is THE practical centrality at web scale (betweenness needs
    all-pairs paths; harmonic needs only ball sizes)."""
    final, nf, iters = _hyperball_core(
        edges, m, max_iter, True, num_parts, store, checkpoint_every, salt
    )
    if stats_out is not None:
        stats_out["nf"] = nf
        stats_out["iterations"] = iters
    return final.select("vid", F.col("harm").alias("harmonic"))


def neighborhood_function(
    edges: DataFrame, m: int = 64, max_iter: int = 64, **kw
) -> list[tuple[int, float]]:
    """The neighborhood function N(t) = sum_v |B(v, t)| estimates, t=0..T."""
    stats: dict = {}
    hyperball(edges, m=m, max_iter=max_iter, stats_out=stats, **kw).count()
    return stats["nf"]
