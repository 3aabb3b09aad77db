from .jobs import (  # noqa: F401
    replay_dir,
    events_stream,
    tumbling_counts,
    session_windows,
    stream_dedup,
    stream_static_join,
    run_to_memory,
)
