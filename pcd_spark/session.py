"""SparkSession factory with the engine's tuned defaults.

Reference parity: the MPI pipeline's `mpirun -np N` becomes a SparkSession
at a given parallelism (local[N] in this sandbox, executors in prod via
``spark-submit --py-files``). See SURVEY.md §3, §6.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults sized for the sandbox (local[N], single JVM). In prod these are
# supplied by spark-submit; nothing here is load-bearing for correctness.
_ENGINE_CONFS = {
    # AQE: runtime coalescing + skew-join splitting — first line of defense
    # for hub skew (SURVEY §4.1); our salted two-phase agg covers the rest.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow transfer for every pandas UDF (the only Python in the hot path).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "100000",
    # Iterative plans get deep; keep the planner honest.
    "spark.sql.constraintPropagation.enabled": "false",
    # Don't let tiny test tables auto-broadcast *away* join coverage in
    # tests that pin a strategy; engine code passes explicit hints instead.
    "spark.sql.autoBroadcastJoinThreshold": "10m",
    "spark.sql.session.timeZone": "UTC",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"),
    "spark.ui.enabled": "false",
}


def get_spark(
    app_name: str = "pcd_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    cores: int N -> local[N]; "*" -> local[*]; None -> $SPARK_GRAFT_CPUS or 32.
    shuffle_partitions: default = parallelism (good for local; prod sets its own).
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = f"local[{cores}]"
    n = os.cpu_count() or 32 if cores == "*" else int(cores)
    if shuffle_partitions is None:
        shuffle_partitions = max(n, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(n))
    )
    for k, v in _ENGINE_CONFS.items():
        builder = builder.config(k, v)
    for k, v in (extra_confs or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
