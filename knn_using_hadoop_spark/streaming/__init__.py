"""Structured Streaming operators over the events stream."""

from knn_using_hadoop_spark.streaming.events import (
    run_stream_to_memory,
    streaming_event_counts,
)

__all__ = ["streaming_event_counts", "run_stream_to_memory"]
