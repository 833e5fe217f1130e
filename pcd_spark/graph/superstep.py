"""K7 — generic resumable superstep driver (SURVEY.md §2 K7, §3.3, §4.3).

The MPI loop (local compute → Alltoallv → Allreduce) becomes:

    new   = step_fn(state, i)          # lazy plan: join + ONE agg shuffle
    new   = truncate(new)              # localCheckpoint: materialize + cut lineage
    delta = delta_fn(new, state)       # cheap join of two materialized states
    every k iters: durable checkpoint  # snapshot + manifest (resume point)

Lineage is truncated EVERY superstep, not every k: a superstep plan
references the previous state 2-3× (gather, keep-old fallback, delta), so an
untruncated chain grows *exponentially* — measured on this sandbox as
1.8s → 59s per iteration within 6 supersteps. Vertex state is small relative
to edges (O(V) vs O(E)), so per-superstep truncation is cheap and is what
Pregel-style systems do. The durable Parquet checkpoint every k supersteps
adds resumability on top (BASELINE.json:6 "resumes mid-iteration").
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from pcd_spark.storage import CheckpointStore

StepFn = Callable[[DataFrame, int], DataFrame]
DeltaFn = Callable[[DataFrame, DataFrame], DataFrame]  # (new, old) -> 1-row 'delta'


def run_supersteps(
    init_state: DataFrame,
    step_fn: StepFn,
    delta_fn: DeltaFn,
    tol: float,
    max_iter: int,
    store: CheckpointStore | None = None,
    checkpoint_every: int = 5,
    resume: bool = True,
) -> tuple[DataFrame, int, list[tuple[int, float]]]:
    """Run step_fn until delta < tol or max_iter. Returns
    (final_state, iterations_run, [(iteration, delta), ...])."""
    state = init_state
    start_iter = 0
    metrics: list[tuple[int, float]] = []

    if store is not None and resume:
        m = store.latest()
        if m is not None:
            state = store.read_state(init_state.sparkSession, m.iteration)
            start_iter = m.iteration
            metrics = store.metrics_lineage()

    state = state.localCheckpoint(eager=True)

    it = start_iter
    for it in range(start_iter + 1, max_iter + 1):
        new = step_fn(state, it).localCheckpoint(eager=True)
        delta = float(delta_fn(new, state).first()["delta"])
        metrics.append((it, delta))

        if store is not None and (
            it % checkpoint_every == 0 or delta < tol or it == max_iter
        ):
            new = store.checkpoint(it, new, delta).localCheckpoint(eager=True)
        state.unpersist()
        state = new
        if delta < tol:
            break
    return state, it, metrics
