from .incremental import (
    incremental_ingest,
    stream_from_directory,
    windowed_event_counts,
    sessionize_stream,
    run_stream_to_memory,
    curation_stream,
    heartbeat_replay_dir,
    stream_stream_join,
)
from .stateful import (
    approx_distinct_stream,
    stream_dedup_stateful,
    stateful_running_uda,
    funnel_stream,
    sessionize_stream_stateful,
)

__all__ = [
    "incremental_ingest", "stream_from_directory", "windowed_event_counts",
    "sessionize_stream", "run_stream_to_memory", "curation_stream",
    "approx_distinct_stream", "stream_dedup_stateful", "stateful_running_uda", "funnel_stream",
    "sessionize_stream_stateful", "stream_stream_join",
    "heartbeat_replay_dir",
]
