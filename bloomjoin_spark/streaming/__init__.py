from .sketch_stream import (
    StreamingSketchCollector,
    bloom_join_stream,
    events_stream,
    windowed_counts,
)

__all__ = [
    "StreamingSketchCollector",
    "bloom_join_stream",
    "events_stream",
    "windowed_counts",
]
