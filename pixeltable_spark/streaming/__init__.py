from .incremental import (
    incremental_ingest,
    stream_from_directory,
    windowed_event_counts,
    sessionize_stream,
    run_stream_to_memory,
)

__all__ = [
    "incremental_ingest", "stream_from_directory", "windowed_event_counts",
    "sessionize_stream", "run_stream_to_memory",
]
