"""Structured Streaming operators (driver extension scope — the
reference is purely batch-relational, SURVEY §2.9).

Each operator has a batch twin in operators/sessions.py or
operators/dedup.py; the streaming variants add watermarks and state
so the same semantics run incrementally. ``availableNow`` runs turn
any of them into a verifiable batch job over the testdata."""

from mfdb_hafro_etl_spark.streaming.jobs import (
    auto_sink_dir,
    auto_state_partitions,
    dedup_ingest_handler,
    events_source_bytes,
    finalize_session_updates,
    ivf_ingest_handler,
    read_events_stream,
    run_available_now,
    staging_dir,
    stream_dedup,
    stream_dedup_ingest,
    stream_enriched_window_agg,
    stream_interval_join,
    stream_ivf_ingest,
    stream_sessionize,
    stream_tumbling_agg,
)

__all__ = [
    "auto_sink_dir",
    "auto_state_partitions",
    "dedup_ingest_handler",
    "events_source_bytes",
    "finalize_session_updates",
    "ivf_ingest_handler",
    "read_events_stream",
    "run_available_now",
    "staging_dir",
    "stream_dedup",
    "stream_dedup_ingest",
    "stream_enriched_window_agg",
    "stream_interval_join",
    "stream_ivf_ingest",
    "stream_sessionize",
    "stream_tumbling_agg",
]
