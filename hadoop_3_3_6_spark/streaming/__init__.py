from hadoop_3_3_6_spark.streaming.windows import (
    run_stream_to_batch,
    streaming_dedup_events,
    streaming_session_counts,
    streaming_tumbling_counts,
)

__all__ = [
    "run_stream_to_batch",
    "streaming_dedup_events",
    "streaming_session_counts",
    "streaming_tumbling_counts",
]
