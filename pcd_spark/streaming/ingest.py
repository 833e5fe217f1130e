"""Structured Streaming slice (SURVEY.md §2 I1–I7).

Scope (bounded, per SURVEY §1.2): event analytics over the `events` schema
and incremental edge ingestion feeding the graph engine. Every operator is
a plain DataFrame transformation, so each has a batch-equivalent used by the
tests (and by DuckDB oracles where applicable): a streaming query with
watermark W over tumbling/sliding/session windows produces exactly the batch
aggregation restricted to rows not dropped as late.

The edge-ingestion sink (I7) is the streaming front door of the engine:
micro-batches of (src, dst) append to the canonical edge table with
exactly-once dedup, after which any K-series algorithm can run incrementally
on the refreshed table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
EDGE_STREAM_SCHEMA = "src long, dst long, ts timestamp"


def stream_events(
    spark: SparkSession, src_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """I-source: file-based event stream (parquet drops into src_dir).
    In prod this is Kafka/Kinesis; the transformation surface is identical."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(src_dir)


def tumbling_counts(
    events: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """I1+I2: watermarked tumbling-window counts per event_type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n",
            "total",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """I3: overlapping windows — each row lands in window//slide windows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("win"))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "n",
        )
    )


def session_windows(
    events: DataFrame, gap: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """I4: per-user sessions closed by a `gap` of inactivity."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("total"))
        .select(
            F.col("win.start").alias("sess_start"),
            F.col("win.end").alias("sess_end"),
            "user_id",
            "n_events",
            "total",
        )
    )


def dedup_edges_within_watermark(
    edge_stream: DataFrame, watermark: str = "30 minutes"
) -> DataFrame:
    """I6: exactly-once edge ingestion — duplicate (src, dst) arriving within
    the watermark horizon are dropped with bounded state."""
    return edge_stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["src", "dst"]
    )


def start_edge_ingestion(
    edge_stream: DataFrame,
    edge_table_path: str,
    checkpoint_path: str,
    trigger_available_now: bool = True,
):
    """I7: foreachBatch merge into the canonical edge table.

    Each micro-batch is deduped within itself AND against the existing table
    (left anti join) before appending — idempotent under replay because the
    batch dedup runs against the post-previous-batch table state.
    """

    def merge(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        fresh = batch.select("src", "dst").dropDuplicates(["src", "dst"])
        try:
            existing = spark.read.parquet(edge_table_path).select("src", "dst")
            fresh = fresh.join(existing, ["src", "dst"], "left_anti")
        except Exception:
            pass  # first batch: table doesn't exist yet
        fresh.write.mode("append").parquet(edge_table_path)

    writer = (
        dedup_edges_within_watermark(edge_stream)
        .writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_corpus_ingestion(
    corpus_stream: DataFrame,
    state_dir: str,
    checkpoint_path: str,
    trigger_available_now: bool = True,
):
    """I12: streaming corpus appends → incremental K8b graph maintenance.

    Each micro-batch of corpus rows (repo, path, commit, lang, content)
    updates the durable DerivedGraph state (DerivedGraphStore at
    `state_dir`) via derive_edges_incremental — only the batch's content
    is ever scanned; the standing 100 TB corpus is represented by the
    narrow state tables. After any batch, the current edge table
    (`DerivedGraphStore(state_dir).load(spark).edges`) feeds any K-series
    algorithm, resuming from its own checkpoint (the A6/I7 loop at corpus
    granularity instead of edge granularity).

    Idempotent under replay BY THE TAKE RULE, not by sink bookkeeping: a
    replayed batch's rows all have commit <= the ledger's commit for their
    file, so derive_edges_incremental reports 0 files_updated and the save
    is skipped — state version history stays clean across micro-batch
    retries."""

    def update(batch: DataFrame, batch_id: int) -> None:
        from pcd_spark.corpus import derive_edges_incremental
        from pcd_spark.storage import DerivedGraphStore

        spark = batch.sparkSession
        store = DerivedGraphStore(state_dir)
        prev = (
            store.load(spark)
            if store.latest_version() is not None
            else store.empty(spark)
        )
        stats: dict = {}
        new = derive_edges_incremental(prev, batch, stats_out=stats)
        if stats["files_updated"] > 0:
            store.save(new, note=f"batch={batch_id}")

    writer = (
        corpus_stream.writeStream.foreachBatch(update)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """J6: custom stateful operator via applyInPandasWithState — per-user
    running (event count, value total) maintained across micro-batches in
    explicit GroupState (the Arrow-batched replacement for per-row
    mapGroupsWithState). Emits one updated row per user per batch; the
    latest row per user equals the batch groupBy sum over everything seen.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n": [n], "total": [round(total, 4)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        "user_id long, n long, total double",
        "n long, total double",
        "update",
        GroupStateTimeout.NoTimeout,
    )


def approx_distinct_users(
    events: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """I8: watermarked per-window DISTINCT-USER counts via HLL.

    Exact COUNT(DISTINCT) is unsupported in streaming aggregations (it
    would need unbounded per-window sets in the state store); the standard
    production form is approx_count_distinct — O(registers) state per
    window, mergeable across triggers, rsd 2% here. The batch twin
    (`i8_distinct_users_batch`) computes the EXACT count with a DuckDB
    oracle; the streaming test pins approx-vs-exact tolerance."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"))
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.count("*").alias("n_events"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "approx_users",
            "n_events",
        )
    )


def click_purchase_join(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """I9: stream-stream interval join — each click row joins the purchases
    by the SAME user whose event time lands in [click.ts, click.ts+horizon).

    State-boundedness is the whole design: both sides carry a watermark and
    the join condition bounds purchase.ts relative to click.ts, so Spark can
    evict a buffered click once the purchase-side watermark passes
    click.ts + horizon, and a buffered purchase once the click-side
    watermark passes purchase.ts — state is O(rate x horizon), never the
    stream history. An unbounded (no time-bound) stream-stream inner join
    would be refused by the planner for exactly this reason.

    Batch twin with DuckDB oracle: relational.queries.i9b (adds the
    per-click COUNT/SUM rollup, which streaming would do as a second
    watermarked agg or in the sink)."""
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("amount"),
    ).withWatermark("p_ts", watermark)
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("click_ts"))
        & (F.col("p_ts") < F.col("click_ts") + F.expr(f"INTERVAL {horizon}")),
        "inner",
    ).select("click_id", F.col("c_user").alias("user_id"), "click_ts", "p_ts", "amount")


def click_purchase_left_join(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """I11: stream-stream LEFT OUTER interval join — I9's funnel join with
    the abandonment rows kept: EVERY click emits, and a click with no
    same-user purchase in [click.ts, click.ts + horizon) emits once with
    NULL purchase columns.

    The semantics only exist because of the watermark: the engine cannot
    know a click is unmatched until no matching purchase can still arrive,
    i.e. until the purchase-side watermark passes click.ts + horizon — at
    which point the buffered click is evicted AND emitted with nulls in the
    same state cleanup. So null emission is watermark-DRIVEN (late by up to
    one micro-batch, never early), and state stays O(rate x horizon) exactly
    as in the inner form. This is the conversion-funnel drop-off query: the
    null rows ARE the abandoned clicks, computed incrementally instead of by
    an end-of-day batch anti-join.

    Batch twin with DuckDB oracle: relational.queries.i9b already counts
    zero-purchase clicks (LEFT JOIN + COUNT, n_purchases = 0 rows); the
    streaming-specific part pinned in tests is WHEN the null row may appear
    (only after the watermark passes the horizon boundary).
    """
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("amount"),
    ).withWatermark("p_ts", watermark)
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("click_ts"))
        & (F.col("p_ts") < F.col("click_ts") + F.expr(f"INTERVAL {horizon}")),
        "leftOuter",
    ).select("click_id", F.col("c_user").alias("user_id"), "click_ts", "p_ts", "amount")


def enrich_with_dimension(
    events: DataFrame,
    dim: DataFrame,
    key: str = "user_id",
    dim_key: str = "c_custkey",
    dim_cols: tuple = ("c_mktsegment",),
) -> DataFrame:
    """I10: stream-static join — enrich each streaming event with columns
    from a STATIC dimension table (user/customer attributes).

    This is the stateless streaming join: only the stream side is
    unbounded, so no watermark and no join state are needed — each
    micro-batch hash/broadcast-joins against the static side, which Spark
    re-resolves per batch (a dim refresh is picked up without restarting
    the query). The 100-TB-corpus shape: the dim is per-entity metadata
    (O(users), broadcastable or bucket-joinable), the stream is the
    unbounded fact side; contrast I9, where BOTH sides are unbounded and
    the time bound is what bounds state.

    Batch twin with DuckDB oracle: relational.queries.i10b (same join +
    per-segment rollup).

    The dimension key is renamed to a PRIVATE name and the join written as
    an explicit cross-lineage predicate (then dropped) instead of
    ``events.join(d, key)``: when the caller derives both sides from the
    same source (self-enrichment), the name-based equi-join can resolve
    both key references to one attribute id — the analyzer's "trivially
    true equals predicate" warning class, which silently turns the join
    into a cross product filter. The distinct-name form cannot alias."""
    _dk = "__pcd_dim_key"
    d = dim.select(
        F.col(dim_key).alias(_dk),
        *[F.col(c) for c in dim_cols],
    )
    return events.join(d, events[key] == d[_dk], "inner").drop(_dk)
