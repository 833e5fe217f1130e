"""Checkpoint / lineage storage adapter (SURVEY.md §2 A4, §4.2, §7.1).

BASELINE.json:6 requires "per-partition lineage and convergence metrics
checkpointed to Iceberg so any run resumes mid-iteration". No Iceberg runtime
jar exists in this sandbox (SURVEY §0.4), so the adapter emulates the needed
Iceberg semantics locally:

  - snapshot per iteration  → one Parquet dir per checkpointed superstep
  - manifest + lineage      → JSON manifest per snapshot (atomic rename commit)
  - snapshot log            → manifests are append-only; `latest()` reads them

In prod the same call sites write ``df.writeTo(table).overwritePartitions()``
against a real catalog; only this module changes (config-only swap).

The checkpoint cycle is also the engine's lineage-truncation mechanism for
iterative loops (write → re-read breaks the 50-iteration plan chain,
SURVEY §4.3) — durability and planner health in one mechanism.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_PREFIX = "manifest-iter"


@dataclass
class Manifest:
    run_id: str
    algo: str
    iteration: int
    partition_rows: dict[str, int]  # partition id -> row count (lineage)
    state_sha: str | None
    delta_metric: float
    ts: str
    #: cheap fingerprint of the INPUT GRAPH the state was computed on
    #: (e.g. "edges=N"); resume compares it so a trajectory-dependent
    #: algorithm cannot silently continue a checkpoint onto a different
    #: graph. None on manifests written before the field existed.
    graph_token: str | None = None

    def to_json(self) -> str:
        return json.dumps(self.__dict__, sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "Manifest":
        return Manifest(**json.loads(s))


def _state_sha(df: DataFrame) -> str:
    """Order-insensitive integrity hash: xor-free sum of per-row sha prefixes.

    Distributed (one agg, no collect of rows): per row take the first 16 hex
    chars of sha2 over the concatenated columns, sum as decimal — stable
    across partitionings and row order.
    """
    row_h = F.conv(
        F.substring(F.sha2(F.concat_ws("\x1f", *df.columns), 256), 1, 15),
        16,
        10,
    ).cast("decimal(38,0)")
    v = df.select(F.sum(row_h).alias("h")).first()["h"]
    return hashlib.sha256(str(v).encode()).hexdigest()


class CheckpointStore:
    """One store per (run_id, algo). Layout:

    base/run_id/algo/iter=NNNNN/          state parquet (snapshot)
    base/run_id/algo/manifest-iterNNNNN.json   committed manifest
    """

    def __init__(
        self,
        base_dir: str,
        algo: str,
        run_id: str | None = None,
        integrity: bool = True,
    ):
        self.base = base_dir
        self.algo = algo
        self.run_id = run_id or uuid.uuid4().hex[:12]
        self.integrity = integrity
        self.dir = os.path.join(self.base, self.run_id, self.algo)
        os.makedirs(self.dir, exist_ok=True)

    # -- write path ---------------------------------------------------------

    def checkpoint(
        self,
        iteration: int,
        state: DataFrame,
        delta_metric: float,
        graph_token: str | None = None,
    ) -> DataFrame:
        """Snapshot state, commit manifest, return the re-read DataFrame
        (lineage truncated). Atomic: manifest rename is the commit point —
        a partial parquet dir without a manifest is invisible to resume."""
        path = os.path.join(self.dir, f"iter={iteration:05d}")
        state.write.mode("overwrite").parquet(path)
        reread = state.sparkSession.read.parquet(path)

        part_col = "part" if "part" in state.columns else None
        if part_col:
            rows = {
                str(r[part_col]): r["n"]
                for r in reread.groupBy(part_col).agg(F.count("*").alias("n")).collect()
            }
        else:
            rows = {"0": reread.count()}

        m = Manifest(
            run_id=self.run_id,
            algo=self.algo,
            iteration=iteration,
            partition_rows=rows,
            state_sha=_state_sha(reread) if self.integrity else None,
            delta_metric=float(delta_metric),
            ts=time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            graph_token=graph_token,
        )
        tmp = os.path.join(self.dir, f".tmp-{iteration:05d}.json")
        final = os.path.join(self.dir, f"{MANIFEST_PREFIX}{iteration:05d}.json")
        with open(tmp, "w") as f:
            f.write(m.to_json())
        os.replace(tmp, final)  # atomic commit
        return reread

    # -- read / resume path --------------------------------------------------

    def manifests(self) -> list[Manifest]:
        out = []
        for name in sorted(os.listdir(self.dir)):
            if name.startswith(MANIFEST_PREFIX) and name.endswith(".json"):
                with open(os.path.join(self.dir, name)) as f:
                    out.append(Manifest.from_json(f.read()))
        return out

    def latest(self) -> Manifest | None:
        ms = self.manifests()
        return ms[-1] if ms else None

    def read_state(self, spark: SparkSession, iteration: int) -> DataFrame:
        return spark.read.parquet(
            os.path.join(self.dir, f"iter={iteration:05d}")
        )

    def metrics_lineage(self) -> list[tuple[int, float]]:
        return [(m.iteration, m.delta_metric) for m in self.manifests()]


class CorpusTable:
    """A2: snapshot-consistent corpus table adapter (SURVEY §0.4, §7.1).

    Local emulation of the Iceberg semantics the engine needs: immutable
    partitioned-Parquet snapshots + an append-only JSON snapshot log; readers
    always see exactly one committed snapshot. In prod the same four methods
    delegate to a real Iceberg catalog (`spark.read.format("iceberg")`,
    `df.writeTo(...).createOrReplace()`) — call sites don't change.
    """

    def __init__(self, base_dir: str, partition_by: str = "lang"):
        self.base = base_dir
        self.partition_by = partition_by
        os.makedirs(base_dir, exist_ok=True)

    def _log_path(self) -> str:
        return os.path.join(self.base, "snapshot-log.json")

    def snapshots(self) -> list[dict]:
        if not os.path.exists(self._log_path()):
            return []
        with open(self._log_path()) as f:
            return json.load(f)

    def commit(self, df: DataFrame, note: str = "") -> int:
        """Write a new immutable snapshot; returns its id. The data write
        happens BEFORE the log append (the commit point) — a crashed write
        leaves an orphan dir, never a torn table."""
        snaps = self.snapshots()
        sid = (snaps[-1]["id"] + 1) if snaps else 0
        path = os.path.join(self.base, f"snap-{sid:05d}")
        df.write.mode("overwrite").partitionBy(self.partition_by).parquet(path)
        rows = df.sparkSession.read.parquet(path).count()
        snaps.append(
            {
                "id": sid,
                "path": path,
                "rows": rows,
                "note": note,
                "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            }
        )
        tmp = self._log_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(snaps, f)
        os.replace(tmp, self._log_path())
        return sid

    def read(self, spark: SparkSession, snapshot_id: int | None = None) -> DataFrame:
        snaps = self.snapshots()
        if not snaps:
            raise FileNotFoundError(f"no committed snapshot in {self.base}")
        if snapshot_id is None:
            snap = snaps[-1]
        else:
            # by id, not position: ids stay stable across A14 expiration
            hit = [s for s in snaps if s["id"] == snapshot_id]
            if not hit:
                raise FileNotFoundError(
                    f"snapshot {snapshot_id} not in {self.base} (expired or "
                    f"never committed; live ids: {[s['id'] for s in snaps]})"
                )
            snap = hit[0]
        return spark.read.parquet(snap["path"])

    def read_appended(
        self,
        spark: SparkSession,
        start_snapshot_id: int,
        end_snapshot_id: int | None = None,
        key_cols: tuple[str, ...] = ("repo", "path", "commit"),
    ) -> DataFrame:
        """A13 — incremental read: rows present in `end` but not in
        `start`, keyed by `key_cols` (Iceberg's
        `option("start-snapshot-id", ...)` incremental-scan semantics; in
        prod this method delegates to that reader and the engine code
        does not change). This is the seam that makes 10^12-file
        reprocessing INCREMENTAL: derive edges / fingerprints / quality
        for only the appended files, then append to the durable graph and
        resume the algorithms from checkpoint (the A6/I7 streaming demo
        shows the same loop at micro-batch granularity; this is the
        batch-snapshot form).

        Scale shape: ONE left-anti hash join keyed by the identity
        columns — the old snapshot side carries only `key_cols` (column
        pruning reaches the scan), never its payload."""
        end = self.read(spark, end_snapshot_id)
        old = self.read(spark, start_snapshot_id).select(*key_cols)
        return end.join(old, on=list(key_cols), how="left_anti")


class BucketedStore:
    """A8: bucketed managed tables — shuffle-free co-located joins.

    `bucketBy(n, key)` pre-hash-partitions a table ON DISK into n buckets
    (Spark's persistent analogue of the engine's in-memory
    `repartition(P, part)` discipline, partition.py). When two tables share
    bucket count + key, Catalyst plans their equi-join with ZERO Exchange on
    either side — at 10^12-row scale that removes the dominant cost of every
    edges-join-state pattern run more than once. This is the storage layout
    a production deployment would use for the canonical edge table and any
    per-vertex dimension it repeatedly joins.

    Managed-table mechanics (bucket metadata lives in the session catalog,
    so plain `.parquet()` paths can't carry it): tables live in a dedicated
    database whose LOCATION the store pins explicitly (no dependence on the
    session's warehouse dir); write with `saveAsTable`, read with
    `spark.table`. Plan-level evidence (no Exchange under the join) is
    pinned in tests/test_storage_bucketed.py.
    """

    def __init__(self, location: str, database: str = "pcd_buckets"):
        self.location = location
        self.database = database

    def _ensure_db(self, spark: SparkSession) -> None:
        spark.sql(
            f"CREATE DATABASE IF NOT EXISTS {self.database} "
            f"LOCATION '{self.location}'"
        )

    def write(
        self,
        df: DataFrame,
        table: str,
        bucket_key: str,
        n_buckets: int,
        sort: bool = True,
    ) -> str:
        """Write df as a bucketed (and bucket-sorted) managed parquet table;
        returns the fully qualified table name."""
        spark = df.sparkSession
        self._ensure_db(spark)
        fq = f"{self.database}.{table}"
        w = df.write.format("parquet").mode("overwrite").bucketBy(
            n_buckets, bucket_key
        )
        if sort:
            w = w.sortBy(bucket_key)
        w.saveAsTable(fq)
        return fq

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.table(f"{self.database}.{table}")

    def drop(self, spark: SparkSession, table: str) -> None:
        spark.sql(f"DROP TABLE IF EXISTS {self.database}.{table}")


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: str | tuple[str, ...],
    dynamic: bool = True,
) -> None:
    """A9: partitioned result sink with DYNAMIC partition overwrite — the
    incremental-backfill write at scale: recomputing one day/lang/shard
    rewrites ONLY the partitions present in `df`, leaving every other
    partition's files byte-untouched (static overwrite mode would truncate
    the whole table first — at a 100 TB table that is the difference between
    rewriting one partition and rewriting the corpus).

    The session-level `partitionOverwriteMode` is set per-write via the
    DataFrameWriter option so the session default is not mutated. Readers
    get partition pruning for free: a filter on the partition column reaches
    the scan as a PartitionFilter (directory-level pruning — non-matching
    partitions are never even listed), pinned in tests/test_storage.py.
    """
    cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    (
        df.write.mode("overwrite")
        .option(
            "partitionOverwriteMode", "dynamic" if dynamic else "static"
        )
        .partitionBy(*cols)
        .parquet(path)
    )


def read_evolved(spark, path: str) -> DataFrame:
    """A10: schema-evolution parquet read — one logical table whose parquet
    files were written under DIFFERENT schema versions (a corpus that
    gained columns over time: new quality scores, new provenance fields).

    `mergeSchema` makes the scan reconcile footers into the UNION schema;
    rows from files predating a column read it as NULL — the read-side
    complement of G4's `unionByName(allowMissingColumns=True)` (which
    handles the same drift when the snapshots are separate frames) and of
    A9's partitioned layout (where each backfill batch may carry the newer
    schema).

    Scale note: plain reads take the schema from ONE random footer (cheap,
    but silently DROPS newer columns when it samples an old file — the
    production incident this operator exists to prevent); mergeSchema
    instead reconciles footers in a parallel job at read-planning time.
    Footers only — never data — but on 10^6+ files it is a real planning
    cost, so production tables should pin the contract schema explicitly
    (`spark.read.schema(s)`, which also null-fills missing columns and is
    O(0) planning) and keep mergeSchema for exploration; both forms are
    exercised in tests/test_storage_bucketed.py.
    """
    return spark.read.option("mergeSchema", "true").parquet(path)


def compact_parquet(
    spark,
    in_path: str,
    out_path: str,
    target_mb: int = 128,
    even: bool = True,
) -> dict:
    """A11: small-file compaction — rewrite a parquet directory into files
    sized for the scan path. The small-files problem is THE operational
    failure mode of an incrementally-written 100 TB lake: streaming sinks
    (A7), per-micro-batch foreachBatch merges (I7) and dynamic partition
    overwrites (A9) each land one-file-per-task-per-trigger, and a table of
    10^7 kilobyte files costs more in listing, footer reads and task
    scheduling than in data (each scan task pays ~fixed overhead; Spark
    packs splits up to `spark.sql.files.maxPartitionBytes`, but packing
    cannot recover per-FILE footer/open costs).

    Sizing: the output file count is ceil(on-disk bytes / target_mb), from
    the filesystem listing the driver already has (O(files) metadata, no
    data pass). `even=True` round-robins rows across output files
    (`repartition(n)` — ONE full shuffle of the data, every output file
    within a row of equal row count; right when the input is skewed, e.g.
    one straggler file per trigger plus dust). `even=False` uses
    `coalesce(n)` — NO shuffle (input splits are glued into n tasks), at
    the price of output files as uneven as the input distribution;
    right when the input is uniform dust and the table is huge.

    Returns {files_in, bytes_in, files_out, target_files} so callers and
    tests can assert the compaction actually happened. Row-for-row content
    is preserved (asserted in tests/test_storage_bucketed.py); ordering is not (a
    parquet directory carries no order contract).
    """
    import math
    import os

    sizes = []
    for root, _dirs, files in os.walk(in_path):
        for f in files:
            if f.endswith(".parquet"):
                sizes.append(os.path.getsize(os.path.join(root, f)))
    if not sizes:
        raise ValueError(f"no parquet files under {in_path}")
    bytes_in = sum(sizes)
    n_out = max(1, math.ceil(bytes_in / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(in_path)
    out = df.repartition(n_out) if even else df.coalesce(n_out)
    out.write.mode("overwrite").parquet(out_path)
    files_out = sum(
        1
        for root, _d, fs in os.walk(out_path)
        for f in fs
        if f.endswith(".parquet")
    )
    return {
        "files_in": len(sizes),
        "bytes_in": bytes_in,
        "files_out": files_out,
        "target_files": n_out,
    }


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = 16,
) -> dict:
    """A12 — Z-order (Morton) clustered parquet write: the multi-column
    data-skipping layout [PUB: Morton 1966; the technique behind Delta
    Lake's OPTIMIZE ZORDER BY and Databricks' liquid clustering]. A sort
    on (a, b) skips scans filtered on `a` but not on `b`; interleaving the
    bits of both columns' quantized values gives every file a SMALL
    min/max span on EVERY z-ordered column, so parquet footer stats prune
    files for predicates on any of them.

    Mechanics: each column is affinely quantized to `bits` bits against
    its global min/max (ONE agg — deterministic, no sampling), the
    quantized ints are bit-interleaved into the Morton key with
    shiftleft/bitwiseOR expressions (pure JVM codegen — no UDF), and the
    data is range-partitioned + sorted on that key into `n_files` files.
    At 100 TB the same plan holds: the min/max agg is map-side combined,
    the range partitioner samples the z-key (Spark's built-in machinery),
    and each output task writes one locality-tight file.

    Returns {"files": n, "avg_span_fraction": {col: f}} where f is the
    mean over files of (file min/max span / global span) — the expected
    fraction of the domain a file covers on that column; an unsorted
    write scores ~1.0 per column, a single-column sort scores ~1/n on
    that column and ~1.0 elsewhere, z-order scores well below 1 on ALL
    z-ordered columns (asserted in tests/test_storage_bucketed.py).
    """
    if not (1 <= len(cols) <= 4):
        raise ValueError("zorder_write: 1-4 cluster columns")
    mm = df.agg(
        *[F.min(c).cast("double").alias(f"mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"mx_{c}") for c in cols],
    ).first()
    top = (1 << bits) - 1
    qs = []
    for c in cols:
        mn, mx = mm[f"mn_{c}"], mm[f"mx_{c}"]
        if mn is None or mx is None:
            raise ValueError(f"zorder_write: column {c} is all-NULL")
        span = (mx - mn) or 1.0
        qs.append(
            F.least(
                F.lit(top),
                F.floor(
                    (F.col(c).cast("double") - F.lit(mn))
                    / F.lit(span)
                    * F.lit(float(top + 1))
                ).cast("long"),
            )
        )
    # Morton interleave: output bit (i*len(cols)+j) = bit i of column j
    zkey = F.lit(0).cast("long")
    for i in range(bits):
        for j, q in enumerate(qs):
            bit = F.shiftright(q, i).bitwiseAND(F.lit(1))
            zkey = zkey.bitwiseOR(
                F.shiftleft(bit, i * len(cols) + j)
            )
    (
        df.withColumn("_z", zkey)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
    # data-skipping score from the written files' actual min/max spans —
    # ONE job grouped by input_file_name (O(files) result rows), not a
    # per-file driver loop
    spark = df.sparkSession
    rows = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("_f"))
        .agg(
            *[F.min(c).cast("double").alias(f"mn_{c}") for c in cols],
            *[F.max(c).cast("double").alias(f"mx_{c}") for c in cols],
        )
        .collect()
    )
    spans = {
        c: [
            (r[f"mx_{c}"] - r[f"mn_{c}"])
            / ((mm[f"mx_{c}"] - mm[f"mn_{c}"]) or 1.0)
            for r in rows
        ]
        for c in cols
    }
    return {
        "files": len(rows),
        "avg_span_fraction": {
            c: sum(v) / len(v) if v else 1.0 for c, v in spans.items()
        },
    }


class DerivedGraphStore:
    """K8b durable state store: versioned, atomically-committed persistence
    of a `corpus.DerivedGraph` (verts/edges/imports/files — all narrow, no
    content column).

    Same commit discipline as CorpusTable: the four Parquet dirs of a
    version are fully written BEFORE the version-log append (the commit
    point, an atomic rename) — a crash mid-save leaves an orphan dir,
    never a torn state. `load()` always sees exactly one committed
    version, so a streaming updater (ingest.start_corpus_ingestion) and a
    concurrent reader (an algorithm resuming from checkpoint on the grown
    graph) never race.

    In prod each member table is an Iceberg table and `save` is one
    transaction; only this adapter changes.
    """

    _MEMBERS = ("verts", "edges", "imports", "files")
    _SCHEMAS = {
        "verts": "vid long, repo string, path string",
        "edges": "src long, dst long, weight double",
        "imports": "repo string, path string, module string",
        "files": "repo string, path string, commit string",
    }

    def __init__(self, base_dir: str):
        self.base = base_dir
        os.makedirs(base_dir, exist_ok=True)

    def _log_path(self) -> str:
        return os.path.join(self.base, "version-log.json")

    def versions(self) -> list[dict]:
        if not os.path.exists(self._log_path()):
            return []
        with open(self._log_path()) as f:
            return json.load(f)

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1]["id"] if vs else None

    def empty(self, spark: SparkSession):
        """Bootstrap state: derive_edges_incremental(empty, batch) equals
        derive_graph(batch), so the first micro-batch needs no special
        casing."""
        from pcd_spark.corpus import DerivedGraph

        return DerivedGraph(
            **{
                m: spark.createDataFrame([], self._SCHEMAS[m])
                for m in self._MEMBERS
            }
        )

    def save(self, graph, note: str = "") -> int:
        vs = self.versions()
        vid = (vs[-1]["id"] + 1) if vs else 0
        vdir = os.path.join(self.base, f"v-{vid:05d}")
        rows = {}
        for m in self._MEMBERS:
            path = os.path.join(vdir, m)
            getattr(graph, m).write.mode("overwrite").parquet(path)
        spark = graph.verts.sparkSession
        for m in self._MEMBERS:
            rows[m] = spark.read.parquet(os.path.join(vdir, m)).count()
        vs.append(
            {
                "id": vid,
                "path": vdir,
                "rows": rows,
                "note": note,
                "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            }
        )
        tmp = self._log_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(vs, f)
        os.replace(tmp, self._log_path())
        return vid

    def load(self, spark: SparkSession, version: int | None = None):
        from pcd_spark.corpus import DerivedGraph

        vs = self.versions()
        if not vs:
            raise FileNotFoundError(f"no committed version in {self.base}")
        if version is None:
            v = vs[-1]
        else:
            # by id, not position: ids stay stable across A14 expiration
            hit = [x for x in vs if x["id"] == version]
            if not hit:
                raise FileNotFoundError(
                    f"version {version} not in {self.base} (expired or never "
                    f"committed; live ids: {[x['id'] for x in vs]})"
                )
            v = hit[0]
        return DerivedGraph(
            **{
                m: spark.read.parquet(os.path.join(v["path"], m))
                for m in self._MEMBERS
            }
        )


def _expire_log_entries(
    log_path: str, entries: list[dict], keep_last: int, kind: str
) -> list[dict]:
    """A14 shared core: drop all but the newest `keep_last` entries from an
    append-only JSON log, delete their data dirs, and commit the shortened
    log atomically (rename AFTER the deletes would risk a log that points
    at removed dirs on crash — so the log commits FIRST, and a crash
    mid-delete leaves only unreferenced orphan dirs, same invariant as the
    write path). Returns the expired entries."""
    import shutil

    if keep_last < 1:
        raise ValueError(f"expire: keep_last must be >= 1, got {keep_last}")
    if len(entries) <= keep_last:
        return []
    expired, kept = entries[:-keep_last], entries[-keep_last:]
    tmp = log_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(kept, f)
    os.replace(tmp, log_path)
    for e in expired:
        shutil.rmtree(e["path"], ignore_errors=True)
    return expired


def expire_corpus_snapshots(table: CorpusTable, keep_last: int = 2) -> list[dict]:
    """A14: snapshot expiration for CorpusTable (Iceberg's
    `expireSnapshots` / VACUUM semantics, emulated on the local adapter).
    Keeps the newest `keep_last` snapshots readable; older snapshot ids
    raise on read afterwards. Incremental reads (`read_appended`) across
    an expired start snapshot fail loudly rather than returning a wrong
    delta — the version log is the source of truth."""
    return _expire_log_entries(
        table._log_path(), table.snapshots(), keep_last, "snapshot"
    )


def expire_graph_versions(store: "DerivedGraphStore", keep_last: int = 2) -> list[dict]:
    """A14: version expiration for DerivedGraphStore — the streaming
    updater (I12) writes one version per effective micro-batch, so an
    unbounded log is the same operational failure mode A11 compaction
    addresses for small files."""
    return _expire_log_entries(
        store._log_path(), store.versions(), keep_last, "version"
    )
