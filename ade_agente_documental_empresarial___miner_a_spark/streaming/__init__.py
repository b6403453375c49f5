from .chat_stream import (  # noqa: F401
    stream_events,
    tumbling_metrics,
    session_metrics,
    stateful_session_state,
)
