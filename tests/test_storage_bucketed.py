"""A8 — bucketed managed tables: shuffle-free co-located joins.

Two assertions: (1) values from the bucketed join are exactly the plain-join
values; (2) the physical plan has NO Exchange on either side of the join —
the on-disk bucket layout replaces the per-query shuffle, which is the point
of bucketing the canonical edge table at 10^12 scale.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pcd_spark.storage import BucketedStore


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    st = BucketedStore(str(tmp_path_factory.mktemp("pcd_buckets")))
    yield st
    for t in ("edges_b", "ranks_b"):
        st.drop(spark, t)
    spark.sql(f"DROP DATABASE IF EXISTS {st.database}")


def _fixture_frames(spark):
    edges = spark.createDataFrame(
        [(i % 50, (i * 7) % 50) for i in range(1000)], "src long, dst long"
    )
    ranks = spark.createDataFrame(
        [(v, float(v) / 50.0) for v in range(50)], "src long, rank double"
    )
    return edges, ranks


def test_bucketed_join_values_and_plan(spark, store):
    edges, ranks = _fixture_frames(spark)
    store.write(edges, "edges_b", "src", 8)
    store.write(ranks, "ranks_b", "src", 8)

    eb = store.read(spark, "edges_b")
    rb = store.read(spark, "ranks_b")

    # broadcast would hide the bucket test (ranks is tiny here; at scale a
    # per-vertex table is NOT broadcastable — that's the case bucketing serves)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = eb.join(rb, "src").groupBy("src").agg(
            F.round(F.sum("rank"), 6).alias("total")
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        got = {(r["src"], r["total"]) for r in j.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"

    want = {
        (r["src"], r["total"])
        for r in edges.join(ranks, "src")
        .groupBy("src")
        .agg(F.round(F.sum("rank"), 6).alias("total"))
        .collect()
    }
    assert got == want


def test_bucket_pruning_scan_metadata(spark, store):
    # equality filter on the bucket key prunes the scan to 1 of 8 buckets.
    # autoBucketedScan must be pinned off here: for a bare filter (no join/
    # agg needing the distribution) the planner otherwise falls back to a
    # plain file scan and the pruning opportunity is invisible in the plan.
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        eb = store.read(spark, "edges_b")
        plan = (
            eb.filter(F.col("src") == 7)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set(key, prev)
    assert "SelectedBucketsCount: 1 out of 8" in plan, plan


# ---------- A9: dynamic partition overwrite + partition pruning ---------------

def test_dynamic_partition_overwrite_touches_only_written_partitions(
    spark, tmp_path
):
    """Rewriting one partition must leave other partitions' FILES untouched
    (same paths, same mtimes) — the incremental-backfill contract. Static
    mode would truncate the table; dynamic rewrites only partitions present
    in the incoming frame."""
    import glob
    import os

    from pcd_spark.storage import write_partitioned

    path = str(tmp_path / "ptab")
    df = spark.createDataFrame(
        [(1, "en", "a"), (2, "en", "b"), (3, "de", "c")],
        "id long, lang string, text string",
    )
    write_partitioned(df, path, "lang")
    de_files = {
        f: os.path.getmtime(f) for f in glob.glob(f"{path}/lang=de/*.parquet")
    }
    assert de_files

    upd = spark.createDataFrame(
        [(9, "en", "z")], "id long, lang string, text string"
    )
    write_partitioned(upd, path, "lang")

    # de partition byte-untouched; en partition replaced by the new row
    assert {
        f: os.path.getmtime(f) for f in glob.glob(f"{path}/lang=de/*.parquet")
    } == de_files
    got = {(r["id"], r["lang"]) for r in spark.read.parquet(path).collect()}
    assert got == {(9, "en"), (3, "de")}


def test_partition_filter_reaches_scan(spark, tmp_path):
    """A filter on the partition column must prune at the DIRECTORY level:
    the physical scan shows it under PartitionFilters (not PushedFilters),
    and the pruned read returns only the matching partition."""
    from pcd_spark.storage import write_partitioned

    path = str(tmp_path / "ptab2")
    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "de", "t") for i in range(10)],
        "id long, lang string, text string",
    )
    write_partitioned(df, path, "lang")
    rd = spark.read.parquet(path).filter("lang = 'en'").select("id")
    plan = rd._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan.split(
        "PartitionFilters", 1
    )[1].split("]", 1)[0], plan
    assert rd.count() == 5


def test_read_evolved_merges_schema_versions(spark, tmp_path):
    """A10: files written under an older schema must surface the union
    schema with NULLs for the missing column — and the plain (sampled-
    footer) read must NOT be relied on for this (it may or may not see
    the new column depending on which footer it samples)."""
    from pcd_spark.storage import read_evolved

    path = str(tmp_path / "evolved")
    v1 = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, payload string"
    )
    v1.write.parquet(path + "/batch=1")
    v2 = spark.createDataFrame(
        [(3, "c", 0.9), (4, "d", 0.1)],
        "id long, payload string, quality double",
    )
    v2.write.parquet(path + "/batch=2")

    df = read_evolved(spark, path)
    assert sorted(df.columns) == ["batch", "id", "payload", "quality"]
    rows = {r["id"]: r for r in df.collect()}
    assert len(rows) == 4
    assert rows[1]["quality"] is None and rows[2]["quality"] is None
    assert rows[3]["quality"] == 0.9 and rows[4]["quality"] == 0.1

    # the explicit-contract form: pinned schema, zero footer reconciliation
    pinned = (
        spark.read.schema("id long, payload string, quality double")
        .parquet(path + "/batch=1", path + "/batch=2")
    )
    assert pinned.filter(F.col("quality").isNull()).count() == 2


def test_compact_parquet_reduces_file_count_and_keeps_rows(spark, tmp_path):
    """A11: 32 dust files -> a handful of target-sized files, content
    row-for-row identical, and the even (repartition) path balances output
    file sizes."""
    from pcd_spark.storage import compact_parquet

    src = str(tmp_path / "dust")
    df = spark.createDataFrame(
        [(i, f"row-{i}" * 20) for i in range(4000)], "id long, payload string"
    )
    df.repartition(32).write.parquet(src)  # 32 small files
    out = str(tmp_path / "compacted")
    # pick a tiny target so the sizing math produces >1 output file
    import os

    bytes_in = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _d, fs in os.walk(src)
        for f in fs
        if f.endswith(".parquet")
    )
    target_mb = max(1, int(bytes_in / (4 * 1024 * 1024)) + 1)
    stats = compact_parquet(spark, src, out, target_mb=target_mb)
    assert stats["files_in"] == 32
    assert stats["files_out"] == stats["target_files"] < 32
    a = sorted(spark.read.parquet(src).collect())
    b = sorted(spark.read.parquet(out).collect())
    assert a == b
    # uneven inputs still compact through the no-shuffle path
    out2 = str(tmp_path / "coalesced")
    stats2 = compact_parquet(spark, src, out2, target_mb=target_mb, even=False)
    assert stats2["files_out"] <= stats["files_out"]
    assert sorted(spark.read.parquet(out2).collect()) == a


def test_compact_parquet_raises_on_empty_dir(spark, tmp_path):
    import pytest as _pytest

    from pcd_spark.storage import compact_parquet

    empty = tmp_path / "empty"
    empty.mkdir()
    with _pytest.raises(ValueError):
        compact_parquet(spark, str(empty), str(tmp_path / "x"))


# ---- A12 z-order clustered write ---------------------------------------------


def test_zorder_write_tightens_every_clustered_column(spark, sf_dir, tmp_path):
    """Data-skipping law: after z-order on (l_orderkey, l_partkey), the
    average per-file min/max span must shrink well below the ~1.0 of an
    unsorted write on BOTH columns simultaneously (a plain sort can only
    do one); content must round-trip exactly."""
    from pcd_spark.storage import zorder_write

    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    # unsorted baseline spans
    base = str(tmp_path / "plain")
    df.repartition(8).write.parquet(base)
    stats = zorder_write(
        df, str(tmp_path / "z"), ["l_orderkey", "l_partkey"], n_files=16
    )
    assert stats["files"] >= 8
    # the skipping law is on the PRODUCT: the expected fraction of files a
    # point-range query on BOTH columns touches. Unsorted ~1.0; a single-
    # column sort ~1/files on one dim x ~1.0 on the other; z-order shrinks
    # BOTH dims at once, so the product collapses.
    sp = stats["avg_span_fraction"]
    assert sp["l_orderkey"] < 0.75 and sp["l_partkey"] < 0.75, stats
    assert sp["l_orderkey"] * sp["l_partkey"] < 0.2, stats
    import pyspark.sql.functions as F

    a = spark.read.parquet(str(tmp_path / "z"))
    assert a.count() == df.count()
    s1 = a.agg(F.sum("l_quantity")).first()[0]
    s2 = df.agg(F.sum("l_quantity")).first()[0]
    assert s1 == s2


def test_zorder_write_rejects_bad_inputs(spark):
    from pcd_spark.storage import zorder_write

    df = spark.range(10).select(
        "id", F.lit(None).cast("long").alias("x")
    )
    with pytest.raises(ValueError):
        zorder_write(df, "/tmp/never", [])
    with pytest.raises(ValueError):
        zorder_write(df, "/tmp/never", ["x"])  # all-NULL column


# ---- A13 incremental snapshot read ---------------------------------------------


def test_corpus_table_incremental_read_returns_exactly_the_delta(spark, tmp_path):
    """Two commits: the incremental read between them must return exactly
    the appended rows (by identity key), with full payload columns."""
    from pcd_spark.storage import CorpusTable

    t = CorpusTable(str(tmp_path / "tbl"), partition_by="lang")
    base = [("r1", "a.py", "c1", "py", "x = 1"),
            ("r1", "b.py", "c1", "py", "y = 2")]
    extra = [("r2", "c.py", "c2", "py", "z = 3"),
             ("r1", "a.py", "c9", "py", "x = 10")]  # new commit of a.py
    schema = "repo string, path string, commit string, lang string, content string"
    s0 = t.commit(spark.createDataFrame(base, schema), note="base")
    s1 = t.commit(spark.createDataFrame(base + extra, schema), note="append")
    got = sorted(
        (r["repo"], r["path"], r["commit"], r["content"])
        for r in t.read_appended(spark, s0, s1).collect()
    )
    assert got == [("r1", "a.py", "c9", "x = 10"), ("r2", "c.py", "c2", "z = 3")]
    # full read still sees the complete end snapshot
    assert t.read(spark, s1).count() == 4


def test_snapshot_delta_incremental_graph_then_pagerank_resume(spark, tmp_path):
    """End-to-end A13 + K8b demo — the batch-snapshot twin of the streaming
    incremental-graph test: commit a corpus snapshot, derive the graph, run
    PageRank to a durable checkpoint; commit an APPENDED snapshot, read
    exactly the delta (A13), update the graph INCREMENTALLY (K8b — only the
    delta's content is scanned), and resume PageRank from the checkpoint
    onto the grown graph. The resumed run must converge to exactly what a
    cold start on the grown graph computes (L1-contraction, unique
    fixpoint)."""
    from pcd_spark.corpus import (
        CORPUS_SCHEMA,
        derive_edges_incremental,
        derive_graph,
    )
    from pcd_spark.graph import pagerank
    from pcd_spark.storage import CheckpointStore, CorpusTable

    t = CorpusTable(str(tmp_path / "corpus"), partition_by="lang")
    base = [
        ("r1", "app.py", "c10", "python", "import util\nimport helper\n"),
        ("r1", "helper.py", "c10", "python", "import util\n"),
        ("r1", "util.py", "c10", "python", "x = 1\n"),
        ("r2", "main.py", "c10", "python", "import app\n"),
        ("r2", "app.py", "c10", "python", "import main\n"),
    ]
    extra = [
        # new repo wiring into both old repos
        ("r3", "glue.py", "c20", "python", "import util\nimport main\n"),
        ("r3", "util.py", "c20", "python", "import glue\n"),
        # re-commit: r2/main.py now also imports the new glue module
        ("r2", "main.py", "c20", "python", "import app\nimport glue\n"),
    ]
    s0 = t.commit(spark.createDataFrame(base, CORPUS_SCHEMA), note="base")
    s1 = t.commit(
        spark.createDataFrame(base + extra, CORPUS_SCHEMA), note="append"
    )

    prev = derive_graph(t.read(spark, s0))
    ck = CheckpointStore(str(tmp_path / "prck"), "pagerank", run_id="snap")
    stats1: dict = {}
    pagerank(
        prev.edges, tol=1e-10, max_iter=25,
        store=ck, checkpoint_every=5, stats_out=stats1,
    ).collect()
    assert ck.latest() is not None

    # A13: exactly the appended rows, then K8b incremental update
    delta = t.read_appended(spark, s0, s1)
    assert delta.count() == len(extra)
    grown = derive_edges_incremental(prev, delta)
    # sanity: incremental == cold derivation on the end snapshot
    cold_graph = derive_graph(t.read(spark, s1))
    assert sorted(map(tuple, grown.edges.collect())) == sorted(
        map(tuple, cold_graph.edges.collect())
    )

    ck2 = CheckpointStore(str(tmp_path / "prck"), "pagerank", run_id="snap")
    resumed_from = ck2.latest().iteration
    stats2: dict = {}
    warm = {
        r["vid"]: r["rank"]
        for r in pagerank(
            grown.edges, tol=1e-10, max_iter=160,
            store=ck2, checkpoint_every=5, stats_out=stats2,
        ).collect()
    }
    assert stats2["iterations"] > resumed_from  # it actually resumed
    cold = {
        r["vid"]: r["rank"]
        for r in pagerank(grown.edges, tol=1e-10, max_iter=160).collect()
    }
    assert set(warm) == set(cold)
    assert abs(sum(warm.values()) - 1.0) < 1e-9
    for v in cold:
        assert abs(warm[v] - cold[v]) < 1e-8, (v, warm[v], cold[v])


# ---- A14: snapshot / version expiration -----------------------------------


def test_corpus_snapshot_expiration(spark, tmp_path):
    """Expire old snapshots: ids stay stable, the kept tail reads fine,
    expired reads (and deltas anchored on them) raise loudly, and the
    expired data dirs are actually gone."""
    import os

    import pytest as _pt

    from pcd_spark.corpus import CORPUS_SCHEMA
    from pcd_spark.storage import CorpusTable, expire_corpus_snapshots

    t = CorpusTable(str(tmp_path / "tbl"), partition_by="lang")
    rows = [("r", "a.py", "c1", "python", "x = 1\n")]
    sids, dirs = [], []
    for i in range(4):
        rows.append(("r", f"f{i}.py", f"c{i+2}", "python", f"v = {i}\n"))
        sids.append(t.commit(spark.createDataFrame(rows, CORPUS_SCHEMA)))
        dirs.append(t.snapshots()[-1]["path"])

    expired = expire_corpus_snapshots(t, keep_last=2)
    assert [e["id"] for e in expired] == sids[:2]
    assert [s["id"] for s in t.snapshots()] == sids[2:]  # ids stable
    assert not os.path.exists(dirs[0]) and not os.path.exists(dirs[1])
    # latest + surviving explicit id still read
    assert t.read(spark).count() == 5
    assert t.read(spark, sids[2]).count() == 4
    # expired id: loud failure, also through read_appended's anchor
    with _pt.raises(FileNotFoundError):
        t.read(spark, sids[0])
    with _pt.raises(FileNotFoundError):
        t.read_appended(spark, sids[1], sids[3]).count()
    # delta across the surviving pair still exact
    got = t.read_appended(spark, sids[2], sids[3]).collect()
    assert [(r["repo"], r["path"]) for r in got] == [("r", "f3.py")]
    with _pt.raises(ValueError):
        expire_corpus_snapshots(t, keep_last=0)


def test_graph_version_expiration(spark, tmp_path):
    import os

    import pytest as _pt

    from pcd_spark.corpus import CORPUS_SCHEMA, derive_graph
    from pcd_spark.storage import DerivedGraphStore, expire_graph_versions

    store = DerivedGraphStore(str(tmp_path / "state"))
    for i in range(3):
        g = derive_graph(
            spark.createDataFrame(
                [("r", f"f{j}.py", "c1", "python", "import os\n")
                 for j in range(i + 1)],
                CORPUS_SCHEMA,
            )
        )
        store.save(g, note=f"v{i}")
    d0 = store.versions()[0]["path"]
    expired = expire_graph_versions(store, keep_last=1)
    assert [e["id"] for e in expired] == [0, 1]
    assert store.latest_version() == 2
    assert not os.path.exists(d0)
    assert store.load(spark).verts.count() == 3
    with _pt.raises(FileNotFoundError):
        store.load(spark, version=0)
