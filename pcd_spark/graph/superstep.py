"""K7 — generic resumable superstep driver (SURVEY.md §2 K7, §3.3, §4.3).

The MPI loop (local compute → Alltoallv → Allreduce) becomes:

    new   = step_fn(state, i)          # lazy plan; carries a `_delta` column
    new   = truncate(new)              # localCheckpoint: materialize + cut lineage
    delta = sum(new._delta)            # agg over the ALREADY-materialized state
    every k iters: durable checkpoint  # snapshot + manifest (resume point)

Two hard-won design rules (measured in this sandbox):

1. Lineage is truncated EVERY superstep. A superstep plan references the
   previous state 2-3×, so an untruncated chain grows exponentially —
   measured 1.8s → 59s per iteration within 6 supersteps. Vertex state is
   O(V) (small next to O(E) edges), so per-superstep truncation is cheap;
   Pregel-style systems do exactly this.

2. The convergence metric rides INSIDE the new state as a `_delta` column
   (per-row contribution: |Δrank| or changed-flag), computed in the same
   select that builds the new state — the old value is already present from
   the superstep join. The Allreduce itself is an `observe()` (CollectMetrics)
   node on that same plan: the metrics accumulate DURING the job that
   materializes the localCheckpoint, so a superstep is exactly ONE Spark
   job — round 1 ran a second agg job over the cached state per superstep,
   and that extra driver round-trip + stage was the dominant term of the
   F ≈ 2.4 s/superstep fixed cost that broke the ≥0.8 scaling bar.
"""

from __future__ import annotations

import itertools
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pcd_spark.storage import CheckpointStore

StepFn = Callable[[DataFrame, int], DataFrame]  # returns state cols + `_delta`

_VIEW_SEQ = itertools.count()


def fresh_view(df: DataFrame, prefix: str) -> str:
    """Register `df` under a collision-free session temp-view name and return
    it. Why SQL-step algorithms exist at all: in classic PySpark every
    DataFrame transformation EAGERLY re-analyzes its whole logical subtree
    JVM-side, so a superstep built as a ~10-op chain pays ~10 analyzer passes
    of growing size plus the py4j chatter — measured 0.24-0.48 s of pure
    driver time per superstep on this box, the dominant term of the
    fixed-cost F that caps small-graph throughput and the N→4N scaling
    intercept. Building the same plan as ONE spark.sql() string over temp
    views is a single parse + single analysis: measured 0.06-0.10 s.
    The caller re-registers the per-iteration state with
    createOrReplaceTempView (cheap catalog update) and drops views when done.
    """
    name = f"{prefix}_{next(_VIEW_SEQ)}"
    df.createOrReplaceTempView(name)
    return name


def drop_views(spark, *names: str) -> None:
    for n in names:
        try:
            spark.catalog.dropTempView(n)
        except Exception:
            pass


def reset_plan_stats(ck: DataFrame) -> DataFrame:
    """Wrap an (already materialized) localCheckpoint in a FRESH logical plan
    with default statistics — zero-copy over the same InternalRow RDD.

    Why this exists: `localCheckpoint` truncates LINEAGE but PRESERVES the
    originating plan's estimated statistics on its LogicalRDD. Catalyst's
    size estimate of a join is the PRODUCT of its children's sizeInBytes
    (BigInt), so an iterative algorithm whose per-step plan joins the state
    j times compounds sizeInBytes ~(prev^j) per step — the bit-LENGTH of the
    stat grows j^step and join-strategy selection ends up burning minutes in
    BigInteger.multiply on numbers with millions of bits (measured: Louvain
    move rounds went 1 s → 14 s → 112 s on a 34-vertex graph; jstack showed
    SizeInBytesOnlyStatsPlanVisitor under BigInteger.multiplyToomCook3).
    PageRank/LPA historically dodged it because their explicit shuffle_hash
    hints mean join selection never materializes those stats — this reset
    makes every K7 algorithm immune instead of hint-lucky. Same trick as
    GraphFrames' AggregateMessages.getCachedDataFrame (public upstream
    workaround for the same iterative-plan pathology).

    Classic (non-Connect) py4j API; the caller keeps `ck` around and
    unpersists it once the NEXT state is materialized — unpersisting the
    wrapper would not release the checkpoint blocks."""
    qe = ck._jdf.queryExecution()
    spark = ck.sparkSession
    jdf = spark._jsparkSession.internalCreateDataFrame(
        qe.toRdd(), qe.analyzed().schema(), False
    )
    return DataFrame(jdf, spark)


def run_supersteps(
    init_state: DataFrame,
    step_fn: StepFn,
    tol: float,
    max_iter: int,
    store: CheckpointStore | None = None,
    checkpoint_every: int = 5,
    resume: bool = True,
    step_secs: list[float] | None = None,
    extra_aggs: dict | None = None,
    extras_out: dict | None = None,
    resume_fix: Callable[[DataFrame], DataFrame] | None = None,
    disable_aqe: bool = False,
    extras_log: list | None = None,
    graph_token: str | None = None,
) -> tuple[DataFrame, int, list[tuple[int, float]]]:
    """Run step_fn until sum(_delta) < tol or max_iter. Returns
    (final_state_with_delta, iterations_run, [(iteration, delta), ...]).
    step_secs, if given, collects per-superstep wall seconds (diagnostics).

    extra_aggs: {name: Column} aggregations evaluated over the CURRENT state
    in the SAME driver round-trip as the convergence delta, results placed in
    extras_out before the next step_fn call. This is how per-superstep global
    scalars (e.g. PageRank dangling mass) ride the existing Allreduce instead
    of costing their own job + broadcast per superstep (measured ~0.3-0.5s of
    fixed per-superstep cost — the scaling killer at high parallelism).

    extras_log: if given, appends (iteration, {name: value}) for EVERY
    evaluation of extra_aggs — the seed over the initial/resumed state and
    one entry per superstep. This is how per-distance series (HyperBall's
    neighborhood function N(t)) ride the fused Allreduce instead of costing
    an extra agg job per superstep; extras_out only keeps the latest."""
    import time as _time

    from pyspark.sql import Observation

    state = init_state
    start_iter = 0
    metrics: list[tuple[int, float]] = []

    if store is not None and resume:
        m = store.latest()
        if m is not None:
            # graph-token guard: a checkpoint carries a fingerprint of the
            # graph it was computed on; a trajectory-dependent algorithm
            # (no resume_fix to re-anchor) must NOT silently continue onto
            # a different graph — its state references the old vertex set.
            # Old manifests (token None) pass through for compatibility.
            if (
                graph_token is not None
                and getattr(m, "graph_token", None) is not None
                and m.graph_token != graph_token
                and resume_fix is None
                # legacy-format acceptance (ADVICE r4): stores written
                # before the cohort digest was folded into the token carry
                # only the leading "edges=N" segment — accept them when
                # that segment matches (same graph; the cohort cannot be
                # cross-checked on a pre-digest store, which is exactly the
                # old behavior those stores were written under).
                and m.graph_token != graph_token.split(";", 1)[0]
            ):
                raise ValueError(
                    f"run_supersteps: checkpoint iter={m.iteration} was "
                    f"written for graph [{m.graph_token}] but this run is "
                    f"on graph [{graph_token}] — state cannot be re-"
                    "anchored for this algorithm; rerun with resume=False "
                    "or a fresh run_id. (If the stored token matches but "
                    "lacks the trailing srcs=/lms= cohort segment, it is a "
                    "pre-cohort-digest store and is accepted as legacy; a "
                    "mismatched cohort digest on the SAME graph means the "
                    "store was written for a different source/landmark set "
                    "— delete the store or use a fresh run_id.)"
                )
            state = store.read_state(init_state.sparkSession, m.iteration)
            if resume_fix is not None:
                # schema-compatibility hook: a checkpoint written by an older
                # engine version may lack derived state columns (e.g. the
                # PageRank 'dang' flag) — the algorithm re-derives them here
                state = resume_fix(state)
            start_iter = m.iteration
            metrics = store.metrics_lineage()

    ck = state.localCheckpoint(eager=True)
    state = reset_plan_stats(ck)

    def _agg_state(df: DataFrame) -> float:
        aggs = [F.coalesce(F.sum("_delta"), F.lit(0.0)).alias("_d")]
        for k, v in (extra_aggs or {}).items():
            aggs.append(v.alias(k))
        row = df.agg(*aggs).first()
        if extra_aggs and extras_out is not None:
            for k in extra_aggs:
                extras_out[k] = row[k]
        if extra_aggs and extras_log is not None:
            extras_log.append((start_iter, {k: row[k] for k in extra_aggs}))
        return float(row["_d"])

    if extra_aggs:
        _agg_state(state)  # seed extras from the initial/resumed state

    agg_cols = [F.coalesce(F.sum("_delta"), F.lit(0.0)).alias("_d")]
    for k, v in (extra_aggs or {}).items():
        agg_cols.append(v.alias(k))

    # disable_aqe: a superstep plan already pins its reduce width with an
    # explicit repartition and its join strategies with hints — AQE can only
    # add per-stage driver re-planning round-trips (measured ~0.1-0.2 s of
    # fixed cost per superstep). Algorithms that WANT runtime skew handling
    # (CC's pointer-jump join keys on the giant component's label) leave it
    # on. Session setting restored on exit.
    conf = init_state.sparkSession.conf
    aqe_key = "spark.sql.adaptive.enabled"
    prev_aqe = conf.get(aqe_key)
    if disable_aqe:
        conf.set(aqe_key, "false")

    it = start_iter
    try:
        for it in range(start_iter + 1, max_iter + 1):
            _t0 = _time.time()
            # observe() fuses the convergence Allreduce into the checkpoint
            # materialization job — one job, one driver round-trip per superstep
            obs = Observation(f"pcd_step_{it}")
            new_ck = (
                step_fn(state, it).observe(obs, *agg_cols).localCheckpoint(eager=True)
            )
            row = obs.get
            delta = float(row["_d"] or 0.0)
            if extra_aggs and extras_out is not None:
                for k in extra_aggs:
                    extras_out[k] = row[k]
            if extra_aggs and extras_log is not None:
                extras_log.append((it, {k: row[k] for k in extra_aggs}))
            metrics.append((it, delta))
            if step_secs is not None:
                step_secs.append(round(_time.time() - _t0, 3))

            if store is not None and (
                it % checkpoint_every == 0 or delta < tol or it == max_iter
            ):
                durable = store.checkpoint(
                    it, new_ck, delta, graph_token=graph_token
                ).localCheckpoint(eager=True)
                new_ck.unpersist()
                new_ck = durable
            ck.unpersist()
            ck = new_ck
            state = reset_plan_stats(ck)
            if delta < tol:
                break
    finally:
        if disable_aqe:
            conf.set(aqe_key, prev_aqe)
    return state, it, metrics
