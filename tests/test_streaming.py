"""Streaming slice tests (SURVEY.md §2 I, §5.3.6).

Strategy: file-source micro-batches + availableNow trigger; every windowed
aggregate is compared against its batch equivalent; late-data handling is
exercised with a hand-injected row older than the watermark delivered in a
later micro-batch (maxFilesPerTrigger=1 forces batch boundaries).
"""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from pcd_spark.streaming import (
    stream_events,
    tumbling_counts,
    sliding_counts,
    session_windows,
    start_edge_ingestion,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _mk_events(spark, rows):
    return spark.createDataFrame(
        [
            (i, T0 + dt.timedelta(minutes=m), uid, et, float(v), "{}")
            for i, (m, uid, et, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )


def _drop_file(df, src_dir: str, name: str) -> None:
    """Write df as ONE parquet file directly under src_dir (the file-stream
    source lists plain files, not .parquet output directories)."""
    import glob, shutil, tempfile

    tmp = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/out")
    part = glob.glob(f"{tmp}/out/part-*.parquet")[0]
    shutil.move(part, os.path.join(src_dir, name))
    shutil.rmtree(tmp)


@pytest.fixture()
def stream_dirs(tmp_path):
    src = tmp_path / "src"
    ckpt = tmp_path / "ckpt"
    out = tmp_path / "out"
    src.mkdir()
    return str(src), str(ckpt), str(out)


def _run_to_memory(df, name, ckpt, output_mode="append"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return df.sparkSession.sql(f"select * from {name}")


def test_tumbling_window_equals_batch(spark, stream_dirs):
    src, ckpt, _ = stream_dirs
    rows = [(m, m % 3, "click" if m % 2 else "view", m) for m in range(0, 30)]
    batch_df = _mk_events(spark, rows)
    _drop_file(batch_df, src, "b0.parquet")

    got = _run_to_memory(
        tumbling_counts(stream_events(spark, src)), "tumbling_t", ckpt,
        output_mode="complete",
    ).collect()
    want = (
        batch_df.groupBy(F.window("ts", "5 minutes").alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type", "n", "total",
        )
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert len(got) > 0


def test_sliding_window_equals_batch(spark, stream_dirs):
    src, ckpt, _ = stream_dirs
    rows = [(m, 1, "view", 1) for m in range(0, 25)]
    batch_df = _mk_events(spark, rows)
    _drop_file(batch_df, src, "b0.parquet")
    got = _run_to_memory(
        sliding_counts(stream_events(spark, src)), "sliding_t", ckpt,
        output_mode="complete",
    ).collect()
    want = (
        batch_df.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("win"))
        .agg(F.count("*").alias("n"))
        .select(F.col("win.start").alias("win_start"), F.col("win.end").alias("win_end"), "n")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_session_window_gap(spark, stream_dirs):
    src, ckpt, _ = stream_dirs
    # user 1: bursts at minutes 0-2 and 20-21 -> 2 sessions (gap 5m)
    rows = [(0, 1, "v", 1), (2, 1, "v", 1), (20, 1, "v", 1), (21, 1, "v", 1)]
    _drop_file(_mk_events(spark, rows), src, "b0.parquet")
    got = _run_to_memory(
        session_windows(stream_events(spark, src)), "session_t", ckpt,
        output_mode="complete",
    ).collect()
    sessions = [(r["sess_start"], r["n_events"]) for r in got]
    assert len(sessions) == 2
    assert sorted(n for _, n in sessions) == [2, 2]


def test_late_rows_dropped_by_watermark(spark, stream_dirs):
    src, ckpt, _ = stream_dirs
    import time as _t

    # batch 0: events up to minute 60 -> watermark will advance to 50
    _drop_file(_mk_events(spark, [(m, 1, "v", 1) for m in (0, 1, 2, 60)]), src, "b0.parquet")
    _t.sleep(1.1)  # distinct mtimes: file order == intended batch order
    # batch 1: fresh row; during it watermark=50 evicts+emits window [0,5)
    _drop_file(_mk_events(spark, [(61, 1, "v", 1)]), src, "b1.parquet")
    _t.sleep(1.1)
    # batch 2: a LATE row (minute 1) arriving after its window was evicted —
    # Spark guarantees it is dropped (append mode never re-emits a window)
    _drop_file(_mk_events(spark, [(1, 1, "v", 100)]), src, "b2.parquet")
    got = _run_to_memory(
        tumbling_counts(stream_events(spark, src, max_files_per_trigger=1)),
        "late_t",
        ckpt,
    ).collect()
    w0 = [r for r in got if r["win_start"] == T0]
    assert len(w0) == 1, f"window [0,5) must be emitted exactly once, got {w0}"
    assert w0[0]["n"] == 3 and w0[0]["total"] == 3.0  # late value=100 dropped


def test_edge_ingestion_foreachbatch_exactly_once(spark, stream_dirs, tmp_path):
    src, ckpt, out = stream_dirs
    edges1 = spark.createDataFrame(
        [(1, 2, T0), (2, 3, T0), (1, 2, T0)], "src long, dst long, ts timestamp"
    )
    edges2 = spark.createDataFrame(
        [(1, 2, T0 + dt.timedelta(minutes=1)), (3, 4, T0 + dt.timedelta(minutes=1))],
        "src long, dst long, ts timestamp",
    )
    _drop_file(edges1, src, "e0.parquet")
    import time as _t
    _t.sleep(1.1)
    _drop_file(edges2, src, "e1.parquet")

    stream = (
        spark.readStream.schema("src long, dst long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_edge_ingestion(stream, out, ckpt)
    q.awaitTermination(120)

    table = spark.read.parquet(out)
    rows = sorted((r["src"], r["dst"]) for r in table.collect())
    assert rows == [(1, 2), (2, 3), (3, 4)]  # duplicates collapsed exactly-once


def test_stateful_user_totals_across_batches(spark, stream_dirs):
    # J6: state must carry across micro-batches — two files, one per batch;
    # the LAST emitted row per user equals the all-data batch aggregate.
    src, ckpt, _ = stream_dirs
    import time as _t

    from pcd_spark.streaming import stateful_user_totals

    _drop_file(_mk_events(spark, [(0, 1, "v", 10), (1, 2, "v", 5)]), src, "b0.parquet")
    _t.sleep(1.1)
    _drop_file(_mk_events(spark, [(2, 1, "v", 7)]), src, "b1.parquet")

    got = _run_to_memory(
        stateful_user_totals(stream_events(spark, src, max_files_per_trigger=1)),
        "stateful_t", ckpt, output_mode="update",
    ).collect()
    latest = {}
    for r in got:  # memory sink appends update rows; later rows overwrite
        prev = latest.get(r["user_id"])
        if prev is None or r["n"] >= prev[0]:
            latest[r["user_id"]] = (r["n"], r["total"])
    assert latest[1] == (2, 17.0), latest
    assert latest[2] == (1, 5.0), latest


def test_approx_distinct_users_tracks_exact(spark, stream_dirs):
    """I8: the streaming HLL distinct-user counts must land within the rsd
    envelope of the exact batch counts on every window (rsd=2%; pinned at
    5% here), with event totals exactly equal."""
    from pcd_spark.streaming.ingest import approx_distinct_users

    src, ckpt, _ = stream_dirs
    rows = [(m, (m * 7) % 11, "click" if m % 2 else "view", m)
            for m in range(0, 30)]
    batch_df = _mk_events(spark, rows)
    _drop_file(batch_df, src, "b0.parquet")

    got = _run_to_memory(
        approx_distinct_users(stream_events(spark, src)), "i8_t", ckpt,
        output_mode="complete",
    ).collect()
    want = {
        r["win_start"]: (r["n_users"], r["n_events"])
        for r in batch_df.groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
        .select(F.col("w.start").alias("win_start"), "n_users", "n_events")
        .collect()
    }
    assert len(got) == len(want) > 0
    for r in got:
        exact_users, exact_events = want[r["win_start"]]
        assert r["n_events"] == exact_events
        assert abs(r["approx_users"] - exact_users) <= max(
            1, 0.05 * exact_users
        ), (r["win_start"], r["approx_users"], exact_users)


def test_incremental_ingestion_then_pagerank_resume(spark, stream_dirs, tmp_path):
    """End-to-end incremental-graph demo (SURVEY §2 I7 promise): edge
    micro-batches arrive via the streaming front door (A6 source -> I6
    watermark dedup -> I7 foreachBatch merge), PageRank checkpoints durably,
    MORE edges arrive (including brand-new vertices), and PageRank RESUMES
    from the last durable checkpoint onto the grown graph — converging to
    exactly what a cold start on the grown graph computes, because the
    update is an L1-contraction with a unique fixpoint."""
    from pcd_spark.graph import pagerank
    from pcd_spark.storage import CheckpointStore

    src, ckpt, out = stream_dirs

    # micro-batch 1: a 4-vertex cycle with a dangler feeding it
    batch1 = spark.createDataFrame(
        [(0, 1, T0), (1, 2, T0), (2, 3, T0), (3, 0, T0), (9, 0, T0)],
        "src long, dst long, ts timestamp",
    )
    _drop_file(batch1, src, "b1.parquet")
    q = start_edge_ingestion(
        spark.readStream.schema("src long, dst long, ts timestamp").parquet(src),
        out, ckpt,
    )
    q.awaitTermination(120)

    base = str(tmp_path / "prck")
    s1 = CheckpointStore(base, "pagerank", run_id="incr")
    stats1: dict = {}
    pagerank(
        spark.read.parquet(out), tol=1e-12, max_iter=40,
        store=s1, checkpoint_every=5, stats_out=stats1,
    ).collect()
    assert s1.latest() is not None

    # micro-batch 2: new edges, including NEW vertices 4 and 5; vertex 9
    # stops being a dangler's only role (it gains an in-edge)
    batch2 = spark.createDataFrame(
        [
            (4, 0, T0 + dt.timedelta(minutes=1)),
            (0, 4, T0 + dt.timedelta(minutes=1)),
            (2, 5, T0 + dt.timedelta(minutes=1)),
            (5, 9, T0 + dt.timedelta(minutes=1)),
        ],
        "src long, dst long, ts timestamp",
    )
    _drop_file(batch2, src, "b2.parquet")
    q = start_edge_ingestion(
        spark.readStream.schema("src long, dst long, ts timestamp").parquet(src),
        out, ckpt,
    )
    q.awaitTermination(120)

    grown = spark.read.parquet(out)
    assert grown.count() == 9  # 5 + 4, exactly-once

    # resume from the durable checkpoint onto the GROWN graph
    s2 = CheckpointStore(base, "pagerank", run_id="incr")
    resumed_from = s2.latest().iteration
    stats2: dict = {}
    warm = {
        r["vid"]: r["rank"]
        for r in pagerank(
            grown, tol=1e-12, max_iter=200,
            store=s2, checkpoint_every=5, stats_out=stats2,
        ).collect()
    }
    # it actually resumed (iteration counter continued past the checkpoint)
    assert stats2["iterations"] > resumed_from

    # cold start on the grown graph = same fixpoint
    cold = {
        r["vid"]: r["rank"] for r in pagerank(grown, tol=1e-12, max_iter=200).collect()
    }
    assert set(warm) == set(cold) == {0, 1, 2, 3, 4, 5, 9}
    assert abs(sum(warm.values()) - 1.0) < 1e-9
    for v in cold:
        assert abs(warm[v] - cold[v]) < 1e-8, (v, warm[v], cold[v])


def test_incremental_ingestion_then_cc_resume(spark, stream_dirs, tmp_path):
    """Incremental near-dup-style clustering refresh: connected components
    RESUMES from a durable checkpoint after new edges (and new vertices)
    arrive through the streaming front door, and lands on exactly the
    cold-start components of the grown graph — hash-min propagation
    converges to the component minimum from any vertex-id upper bound, so
    the old labels are a valid warm start even across merges."""
    from pcd_spark.graph import connected_components
    from pcd_spark.storage import CheckpointStore

    src, ckpt, out = stream_dirs

    batch1 = spark.createDataFrame(
        [(0, 1, T0), (2, 3, T0), (10, 11, T0)],
        "src long, dst long, ts timestamp",
    )
    _drop_file(batch1, src, "b1.parquet")
    q = start_edge_ingestion(
        spark.readStream.schema("src long, dst long, ts timestamp").parquet(src),
        out, ckpt,
    )
    q.awaitTermination(120)

    base = str(tmp_path / "ccck")
    s1 = CheckpointStore(base, "cc", run_id="incr")
    first = {
        r["vid"]: r["component"]
        for r in connected_components(
            spark.read.parquet(out), store=s1, checkpoint_every=1
        ).collect()
    }
    assert first == {0: 0, 1: 0, 2: 2, 3: 2, 10: 10, 11: 10}

    # batch 2 MERGES components {0,1} and {2,3} via 1-2, adds vertex 99
    batch2 = spark.createDataFrame(
        [(1, 2, T0 + dt.timedelta(minutes=1)),
         (99, 10, T0 + dt.timedelta(minutes=1))],
        "src long, dst long, ts timestamp",
    )
    _drop_file(batch2, src, "b2.parquet")
    q = start_edge_ingestion(
        spark.readStream.schema("src long, dst long, ts timestamp").parquet(src),
        out, ckpt,
    )
    q.awaitTermination(120)

    s2 = CheckpointStore(base, "cc", run_id="incr")
    assert s2.latest() is not None
    warm = {
        r["vid"]: r["component"]
        for r in connected_components(
            spark.read.parquet(out), store=s2, checkpoint_every=1
        ).collect()
    }
    assert warm == {0: 0, 1: 0, 2: 0, 3: 0, 10: 10, 11: 10, 99: 10}


def test_stream_stream_interval_join_equals_batch(spark, stream_dirs):
    """I9: stream-stream interval join — clicks x purchases within 30 min,
    same user, both sides watermarked. Compared against the identical batch
    join over the full event set (the streaming inner join must emit exactly
    the batch pairs once all data has arrived)."""
    from pcd_spark.streaming import click_purchase_join, stream_events

    src, ckpt, _ = stream_dirs
    # user 1: click @0, purchases @5 and @25 (both in [0, 30)) and @35 (out)
    # user 2: click @10, purchase @9 (before click -> out), @40 (in [10,40))
    # user 3: purchase only -> never joins
    rows = [
        (0, 1, "click", 0.0), (5, 1, "purchase", 10.0),
        (25, 1, "purchase", 20.0), (35, 1, "purchase", 40.0),
        (9, 2, "purchase", 5.0), (10, 2, "click", 0.0),
        (40, 2, "purchase", 7.0), (15, 3, "purchase", 3.0),
        # watermark movers: late rows far ahead so all prior state flushes
        (600, 1, "click", 0.0), (600, 1, "purchase", 1.0),
    ]
    batch_df = _mk_events(spark, rows)
    _drop_file(batch_df, src, "b0.parquet")

    ev = stream_events(spark, src)
    joined = click_purchase_join(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )
    got = {
        (r["click_id"], r["user_id"], r["amount"])
        for r in _run_to_memory(joined, "ssj_t", ckpt).collect()
    }

    clicks = batch_df.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    purch = batch_df.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("amount"),
    )
    want = {
        (r["click_id"], r["c_user"], r["amount"])
        for r in clicks.join(
            purch,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("click_ts"))
            & (
                F.col("p_ts")
                < F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")
            ),
        ).collect()
    }
    assert got == want
    assert len(want) >= 3  # the fixture actually exercises in/out boundaries


def test_stream_static_enrichment_equals_batch(spark, stream_dirs):
    """I10: stream-static join — events enriched with a static dimension.
    Stateless (no watermark, no join state); the streamed result must be
    exactly the batch join, and users missing from the dim drop out (inner
    semantics)."""
    from pcd_spark.streaming import enrich_with_dimension, stream_events

    src, ckpt, _ = stream_dirs
    rows = [
        (0, 1, "click", 1.0), (5, 2, "view", 2.0),
        (9, 1, "purchase", 3.5), (12, 99, "click", 4.0),  # 99 not in dim
    ]
    batch_df = _mk_events(spark, rows)
    _drop_file(batch_df, src, "b0.parquet")
    dim = spark.createDataFrame(
        [(1, "BUILDING"), (2, "MACHINERY"), (3, "AUTOMOBILE")],
        "c_custkey long, c_mktsegment string",
    )

    enriched = enrich_with_dimension(stream_events(spark, src), dim)
    got = {
        (r["event_id"], r["user_id"], r["c_mktsegment"], r["value"])
        for r in _run_to_memory(enriched, "ssd_t", ckpt).collect()
    }
    want = {
        (r["event_id"], r["user_id"], r["c_mktsegment"], r["value"])
        for r in batch_df.join(
            dim.select(
                F.col("c_custkey").alias("user_id"), "c_mktsegment"
            ),
            "user_id",
        ).collect()
    }
    assert got == want
    assert len(want) == 3  # the dim-missing user is dropped


def test_stream_stream_left_outer_emits_nulls_after_watermark(spark, stream_dirs):
    """I11: left-outer stream-stream join — the abandonment (null) row for
    an unmatched click must appear ONLY once the watermark passes
    click_ts + horizon (before that the engine cannot know no purchase is
    still coming), and matched pairs must equal the batch left-join matches.
    Run A: watermark stops short of the boundary -> no null rows, matches
    emit promptly. Run B: same data plus a late mover file that advances
    both side watermarks (min-policy) past the boundary, dribbled one file
    per micro-batch -> exactly the abandoned click emits with NULL purchase
    columns."""
    from pcd_spark.streaming import click_purchase_left_join, stream_events

    src, ckpt, _ = stream_dirs
    # user 1: click @0 matched by purchase @5; user 2: click @10, no
    # purchase ever -> must become a NULL row once wm > 10 + 30
    rows1 = [
        (0, 1, "click", 0.0), (5, 1, "purchase", 10.0),
        (10, 2, "click", 0.0),
        (20, 3, "purchase", 3.0),  # wm after run A = 20 - 10 = 10 < 40
    ]
    _drop_file(_mk_events(spark, rows1), src, "b0.parquet")

    def _run(tag):
        ev = stream_events(spark, src, max_files_per_trigger=1)
        joined = click_purchase_left_join(
            ev.filter(F.col("event_type") == "click"),
            ev.filter(F.col("event_type") == "purchase"),
        )
        return _run_to_memory(joined, f"ssj_left_{tag}", f"{ckpt}/{tag}").collect()

    got1 = {(r["click_id"], r["user_id"], r["amount"]) for r in _run("a")}
    assert (0, 1, 10.0) in got1  # the matched pair emits promptly
    assert not any(amt is None for _, _, amt in got1), got1  # no early nulls

    # movers: push BOTH side watermarks (min-policy) past 10 + 30 = 40;
    # fresh checkpoint (a memory-sink query cannot recover), same files
    # dribbled one per micro-batch so the mover lands in a later batch
    rows2 = [(600, 99, "click", 0.0), (600, 99, "purchase", 5.0)]
    _drop_file(_mk_events(spark, rows2), src, "b1.parquet")
    got2 = {(r["click_id"], r["user_id"], r["amount"]) for r in _run("b")}
    nulls = {(c, u) for c, u, amt in got2 if amt is None}
    assert (2, 2) in nulls, got2  # the abandoned click surfaced as a NULL row
    assert (0, 1) not in nulls  # matched clicks never also emit a null row
    assert (0, 1, 10.0) in got2  # matches unchanged by the outer semantics


def test_corpus_ingestion_incremental_graph_maintenance(spark, stream_dirs, tmp_path):
    """I12: corpus micro-batches stream in; the durable DerivedGraph state
    is maintained incrementally (K8b) and, after every batch, equals a cold
    derive_graph over everything seen. Replay with a fresh stream
    checkpoint (forced reprocessing) is a no-op by the commit-monotone
    take rule — no new state version."""
    from pcd_spark.corpus import CORPUS_SCHEMA, derive_graph
    from pcd_spark.storage import DerivedGraphStore
    from pcd_spark.streaming.ingest import start_corpus_ingestion

    src, ckpt, _ = stream_dirs
    state = str(tmp_path / "graph_state")

    b1 = [
        ("r1", "app.py", "c10", "python", "import util\n"),
        ("r1", "util.py", "c10", "python", "x = 1\n"),
        ("r2", "main.py", "c10", "python", "import util\n"),
    ]
    b2 = [
        ("r3", "new.py", "c20", "python", "import util\nimport main\n"),
        ("r2", "main.py", "c20", "python", "import util\nimport app\n"),
        ("r2", "util.py", "c20", "python", "y = 2\n"),  # shadows r2's import
    ]
    _drop_file(spark.createDataFrame(b1, CORPUS_SCHEMA), src, "b1.parquet")
    stream = spark.readStream.schema(CORPUS_SCHEMA).parquet(src)
    start_corpus_ingestion(stream, state, ckpt).awaitTermination(120)

    store = DerivedGraphStore(state)
    assert store.latest_version() == 0
    got1 = store.load(spark)
    want1 = derive_graph(spark.createDataFrame(b1, CORPUS_SCHEMA))
    assert sorted(map(tuple, got1.edges.collect())) == sorted(
        map(tuple, want1.edges.collect())
    )

    _drop_file(spark.createDataFrame(b2, CORPUS_SCHEMA), src, "b2.parquet")
    stream = spark.readStream.schema(CORPUS_SCHEMA).parquet(src)
    start_corpus_ingestion(stream, state, ckpt).awaitTermination(120)

    assert store.latest_version() == 1
    got2 = store.load(spark)
    want2 = derive_graph(spark.createDataFrame(b1 + b2, CORPUS_SCHEMA))
    assert sorted(map(tuple, got2.edges.collect())) == sorted(
        map(tuple, want2.edges.collect())
    )
    assert sorted(map(tuple, got2.files.collect())) == sorted(
        map(tuple, want2.files.collect())
    )
    # the shadow actually landed: r2/main.py's 'util' now resolves same-repo
    vm = {(r["repo"], r["path"]): r["vid"] for r in got2.verts.collect()}
    e = {(r["src"], r["dst"]) for r in got2.edges.collect()}
    assert (vm[("r2", "main.py")], vm[("r2", "util.py")]) in e
    assert (vm[("r2", "main.py")], vm[("r1", "util.py")]) not in e

    # replay everything with a FRESH streaming checkpoint: both files are
    # reprocessed, but the take rule filters every row -> no new version
    start_corpus_ingestion(
        spark.readStream.schema(CORPUS_SCHEMA).parquet(src),
        state,
        str(tmp_path / "ckpt_replay"),
    ).awaitTermination(120)
    assert store.latest_version() == 1
