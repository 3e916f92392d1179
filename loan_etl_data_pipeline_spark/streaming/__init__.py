"""Structured Streaming surface (SURVEY.md §2 A.9 ST1–ST4, §7 M5)."""

from loan_etl_data_pipeline_spark.streaming.ingest import (
    stream_etl,
    streaming_dedup,
    streaming_event_counts,
    streaming_running_totals,
    streaming_sessionize,
)

__all__ = ["stream_etl", "streaming_dedup", "streaming_event_counts", "streaming_running_totals", "streaming_sessionize"]
