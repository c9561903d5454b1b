from .events import tumbling_counts, tumbling_counts_stream, sessionize_stream  # noqa: F401
