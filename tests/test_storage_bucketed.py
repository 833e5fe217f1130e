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
