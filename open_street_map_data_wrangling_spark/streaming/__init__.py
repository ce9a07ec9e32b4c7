from .jobs import (
    EVENTS_STREAM_SCHEMA,
    deduped_events,
    events_file_stream,
    run_to_memory,
    sessionized_counts,
    tumbling_counts,
    user_running_counts,
)

__all__ = [
    "EVENTS_STREAM_SCHEMA",
    "deduped_events",
    "events_file_stream",
    "run_to_memory",
    "sessionized_counts",
    "tumbling_counts",
    "user_running_counts",
]
