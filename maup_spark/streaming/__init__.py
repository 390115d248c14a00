from .assign_stream import streaming_assign_counts, streaming_points
from .sessions import sessionize_batch, streaming_sessionize

__all__ = [
    "sessionize_batch",
    "streaming_assign_counts",
    "streaming_points",
    "streaming_sessionize",
]
