from .sketch_stream import (
    StreamingSketchCollector,
    events_stream,
    windowed_counts,
)

__all__ = ["StreamingSketchCollector", "events_stream", "windowed_counts"]
