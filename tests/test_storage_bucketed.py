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
