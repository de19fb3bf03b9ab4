from .stateful import final_rows, running_user_stats
from .windows import (
    read_events_stream,
    session_aggregate,
    sliding_avg,
    stream_to_upsert,
    tumbling_counts,
)

__all__ = [
    "read_events_stream",
    "tumbling_counts",
    "sliding_avg",
    "session_aggregate",
    "stream_to_upsert",
    "running_user_stats",
    "final_rows",
]
