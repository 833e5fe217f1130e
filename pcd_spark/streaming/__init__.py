from pcd_spark.streaming.ingest import (  # noqa: F401
    stream_events,
    tumbling_counts,
    sliding_counts,
    session_windows,
    dedup_edges_within_watermark,
    start_edge_ingestion,
    stateful_user_totals,
    click_purchase_join,
    click_purchase_left_join,
    enrich_with_dimension,
)
