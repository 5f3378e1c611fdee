from .log_stream import (  # noqa: F401
    read_log_stream,
    session_window_counts,
    windowed_event_counts,
    write_staging_stream,
)
