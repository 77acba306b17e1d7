from .events import streaming_event_counts, windowed_event_counts  # noqa: F401
