from .sketch_stream import (
    StreamingSketchCollector,
    bloom_join_stream,
    decontaminate_stream,
    dedup_stream,
    incremental_dedup_stream,
    documents_stream,
    events_stream,
    session_counts,
    topk_stream,
    windowed_counts,
)

__all__ = [
    "StreamingSketchCollector",
    "bloom_join_stream",
    "decontaminate_stream",
    "dedup_stream",
    "incremental_dedup_stream",
    "documents_stream",
    "events_stream",
    "session_counts",
    "topk_stream",
    "windowed_counts",
]
