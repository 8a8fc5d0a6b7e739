from .windows import (  # noqa: F401
    session_metrics,
    sliding_metrics,
    stream_events_json,
    tumbling_metrics,
)
