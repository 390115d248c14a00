from .assign_stream import streaming_assign_counts, streaming_points

__all__ = ["streaming_assign_counts", "streaming_points"]
