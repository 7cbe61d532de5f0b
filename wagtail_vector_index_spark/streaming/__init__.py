from wagtail_vector_index_spark.streaming.maintenance import (
    incremental_index_stream,
    windowed_event_counts,
)

__all__ = ["incremental_index_stream", "windowed_event_counts"]
